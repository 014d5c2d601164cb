"""Pipeline unit tests mirroring the reference's test_suite.py:

TestKeyManagement (22-86), TestEncryptedStorage (89-180),
TestBatchOperations (183-256), TestCLI (259-293), TestSecurity (296-338)
— against the tiny test-512 preset so everything runs in seconds.
"""

import hashlib
import json
import os
import time

import numpy as np
import pytest

from fhe_icp_tpu.batch import BatchConfig, BatchProcessor
from fhe_icp_tpu.keymgr import FHEKeyManager
from fhe_icp_tpu.models.embedder import HashingEmbedder
from fhe_icp_tpu.store import EncryptedDocument, EncryptedDocumentStore

# ct x ct compare needs multiplication headroom: 3 limbs (see params.py).
PRESET = "test-512-mult"


@pytest.fixture(autouse=True)
def master_password(monkeypatch):
    monkeypatch.setenv("FHE_MASTER_PASSWORD", "test-password-123")


def make_doc(doc_id="doc1", dim=128, level=2, n=512, meta=None):
    rng = np.random.default_rng(abs(hash(doc_id)) % (2 ** 31))
    return EncryptedDocument(
        doc_id=doc_id,
        content_hash=hashlib.sha256(doc_id.encode()).hexdigest(),
        timestamp=time.time(),
        ct_data=rng.integers(0, 2 ** 31, size=(4, level, n),
                             dtype=np.int64).astype(np.uint32),
        ct_level=level, dim=dim, scale=1000, metadata=meta or {},
    )


# -- key management (reference test_suite.py:22-86, 296-338) ---------------


class TestKeyManagement:
    def test_generate_and_list(self, tmp_path):
        km = FHEKeyManager(str(tmp_path / "keys"), preset=PRESET)
        key_id = km.generate_keys("k1", seed=7)
        assert key_id == "k1"
        assert km.list_keys() == ["k1"]
        assert km.get_current_key() == "k1"

    def test_key_files_0600(self, tmp_path):
        km = FHEKeyManager(str(tmp_path / "keys"), preset=PRESET)
        km.generate_keys("k1", seed=7)
        sk = tmp_path / "keys" / "k1.sk.enc"
        assert sk.exists()
        assert oct(sk.stat().st_mode)[-3:] == "600"

    def test_load_roundtrip_decrypts(self, tmp_path):
        km = FHEKeyManager(str(tmp_path / "keys"), preset=PRESET)
        km.generate_keys("k1", seed=7)
        rt = km.load_keyset("k1")
        m = np.arange(rt.ctx.n, dtype=np.int32) % 101 - 50
        out = np.asarray(rt.decrypt(rt.encrypt(m, seed=3)))
        assert (out == m).all()

    def test_wrong_password_rejected(self, tmp_path, monkeypatch):
        km = FHEKeyManager(str(tmp_path / "keys"), preset=PRESET)
        km.generate_keys("k1", seed=7)
        monkeypatch.setenv("FHE_MASTER_PASSWORD", "wrong")
        km2 = FHEKeyManager(str(tmp_path / "keys"), preset=PRESET)
        with pytest.raises(ValueError, match="password"):
            km2.load_keyset("k1")

    def test_rotation_grace(self, tmp_path):
        km = FHEKeyManager(str(tmp_path / "keys"), preset=PRESET)
        km.generate_keys("k1", seed=7)
        new_id = km.rotate_keys(grace_period_days=3)
        assert new_id != "k1"
        assert km.get_current_key() == new_id
        info = km.key_info("k1")
        assert info["status"] == "rotated"
        assert info["grace_until"] > time.time()


# -- encrypted storage (reference test_suite.py:89-180) --------------------


class TestEncryptedStorage:
    def test_save_load_roundtrip(self, tmp_path):
        store = EncryptedDocumentStore(str(tmp_path / "docs"))
        doc = make_doc("a", meta={"lang": "en"})
        store.save(doc)
        back = store.load("a")
        assert back.doc_id == "a"
        assert (back.ct_data == doc.ct_data).all()
        assert back.metadata == {"lang": "en"}

    def test_validation_rejects_bad_dim(self):
        doc = make_doc("a")
        doc.dim = 100
        with pytest.raises(ValueError, match="dim"):
            doc.validate()

    def test_metadata_search(self, tmp_path):
        store = EncryptedDocumentStore(str(tmp_path / "docs"))
        store.save(make_doc("a", meta={"lang": "en"}))
        store.save(make_doc("b", meta={"lang": "de"}))
        store.save(make_doc("c", meta={"lang": "en"}))
        assert store.search_by_metadata(lang="en") == ["a", "c"]

    def test_delete_and_stats(self, tmp_path):
        store = EncryptedDocumentStore(str(tmp_path / "docs"))
        store.save(make_doc("a"))
        store.save(make_doc("b"))
        assert store.delete("a") is True
        assert store.delete("a") is False
        stats = store.get_stats()
        assert stats["document_count"] == 1
        assert stats["total_size_bytes"] > 0

    def test_corruption_detected(self, tmp_path):
        store = EncryptedDocumentStore(str(tmp_path / "docs"))
        store.save(make_doc("a"))
        store.save(make_doc("b"))
        path = store._doc_path("a")
        raw = bytearray(path.read_bytes())
        raw[100] ^= 0xFF
        path.write_bytes(bytes(raw))
        valid, invalid = store.validate_all()
        assert valid == ["b"] and invalid == ["a"]

    def test_index_survives_restart(self, tmp_path):
        EncryptedDocumentStore(str(tmp_path / "docs")).save(make_doc("a"))
        store2 = EncryptedDocumentStore(str(tmp_path / "docs"))
        assert store2.list_documents() == ["a"]


# -- batch operations (reference test_suite.py:183-256) --------------------


@pytest.fixture(scope="module")
def processor(tmp_path_factory):
    os.environ["FHE_MASTER_PASSWORD"] = "test-password-123"
    base = tmp_path_factory.mktemp("bp")
    return BatchProcessor(
        config=BatchConfig(batch_size=4, show_progress=False),
        storage_dir=str(base / "docs"), key_dir=str(base / "keys"),
        preset=PRESET, target_dim=128, embedder=HashingEmbedder(),
        validate_model=True)


TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "a fast brown fox leaps over a lazy dog",
    "quantum computing uses superposition and entanglement",
    "encrypted search over homomorphic ciphertexts",
    "the lazy dog sleeps while the brown fox jumps",
]


class TestBatchOperations:
    def test_encrypt_documents(self, processor):
        ids = processor.encrypt_documents(TEXTS)
        assert len(ids) == len(TEXTS)
        assert sorted(processor.storage.list_documents()) == sorted(ids)
        doc = processor.storage.load(ids[0])
        assert doc.ct_data.dtype == np.uint32
        assert doc.ct_data.shape[0] == 4          # fwd + rev ciphertexts

    def test_compare_similar_vs_different(self, processor):
        ids = processor.encrypt_documents(TEXTS)
        sim = processor.compare_encrypted(ids[0], ids[1])   # fox vs fox
        diff = processor.compare_encrypted(ids[0], ids[2])  # fox vs quantum
        assert sim > diff
        assert sim > 0.3
        assert diff < 0.4

    def test_self_similarity_is_one(self, processor):
        ids = processor.encrypt_documents([TEXTS[0]])
        score = processor.compare_encrypted(ids[0], ids[0])
        assert abs(score - 1.0) < 0.01

    def test_search_ranks_similar_first(self, processor):
        ids = processor.encrypt_documents(TEXTS)
        results = processor.search_similar(
            "brown fox jumping over dogs", top_k=3, min_similarity=-1.0)
        assert len(results) == 3
        # The top hit must be one of the fox documents (TEXTS 0, 1, 4),
        # not the quantum/FHE ones, and scores must come back descending.
        fox_ids = {ids[0], ids[1], ids[4]}
        assert results[0][0] in fox_ids
        scores = [s for _, s in results]
        assert scores == sorted(scores, reverse=True)

    def test_search_large_store_uses_arena_path(self, processor):
        """>= 64 docs routes through the MXU + C++-arena index; results
        must stay consistent with the small-store path."""
        texts = [f"document number {i} about topic {i % 7}" for i in range(70)]
        texts[0] = "the amazing brown fox chronicle"
        processor.encrypt_documents(texts, doc_ids=[f"m{i}" for i in range(70)])
        results = processor.search_similar("amazing brown fox story",
                                           top_k=5, min_similarity=-1.0)
        assert len(results) == 5
        assert results[0][0] == "m0"
        if hasattr(processor, "_op_cache"):
            # Cache hit on a second call with the same store contents.
            sig = processor._op_cache[0]
            processor.search_similar("another query", top_k=2,
                                     min_similarity=-1.0)
            assert processor._op_cache[0] == sig

    def test_resume_skips_already_encrypted(self, processor):
        ids = [f"r{i}" for i in range(3)]
        texts = [f"resume test document {i}" for i in range(3)]
        first = processor.encrypt_documents(texts, doc_ids=ids)
        before = {d: processor.storage.index[d]["sha256"] for d in ids}
        again = processor.encrypt_documents(texts, doc_ids=ids, resume=True)
        assert sorted(again) == sorted(ids)
        after = {d: processor.storage.index[d]["sha256"] for d in ids}
        assert before == after            # untouched, not re-encrypted
        # Changed content re-encrypts under resume.
        texts[1] = "resume test document 1 CHANGED"
        processor.encrypt_documents(texts, doc_ids=ids, resume=True)
        assert processor.storage.index["r1"]["sha256"] != before["r1"]
        assert processor.storage.index["r0"]["sha256"] == before["r0"]

    def test_memory_stats(self, processor):
        stats = processor.get_memory_stats()
        assert stats["current_mb"] > 0
        assert stats["limit_mb"] == processor.config.max_memory_mb

    def test_batch_config_validation(self):
        with pytest.raises(ValueError):
            BatchConfig(batch_size=0)
        with pytest.raises(ValueError):
            BatchConfig(max_memory_mb=10)


# -- reducer persistence (reference ships pca_reducer_128.pkl:
#    dimension_reduction.py:219-220) ----------------------------------------


class TestReducerPersistence:
    def _proc(self, base, **kw):
        return BatchProcessor(
            config=BatchConfig(batch_size=4, show_progress=False),
            storage_dir=str(base / "docs"), key_dir=str(base / "keys"),
            preset=PRESET, target_dim=16, embedder=HashingEmbedder(),
            validate_model=False, **kw)

    def test_pca_fit_persist_and_reload(self, tmp_path):
        corpus = [f"document number {i} about topic {i % 5} with words "
                  f"{'alpha beta' * (i % 3 + 1)}" for i in range(20)]
        p1 = self._proc(tmp_path)
        ids = p1.encrypt_documents(corpus)
        assert len(ids) == 20
        # Corpus >= target_dim -> PCA, persisted beside the store.
        assert p1.reducer.method == "pca"
        rp = tmp_path / "docs" / "reducer.npz"
        assert rp.exists()

        # A NEW process on the same store loads the SAME projection and
        # can compare its fresh documents against the old ones.
        p2 = self._proc(tmp_path)
        assert p2.reducer.method == "pca"
        np.testing.assert_array_equal(p2.reducer.components_,
                                      p1.reducer.components_)
        new_id = p2.encrypt_documents([corpus[0]], doc_ids=["again0"])[0]
        sim = p2.compare_encrypted(ids[0], new_id)
        assert abs(sim - 1.0) < 0.05      # identical text, same projection

    def test_small_first_corpus_falls_back_to_random(self, tmp_path):
        p = self._proc(tmp_path)
        p.encrypt_documents(["one tiny document", "and a second one"])
        assert p.reducer.method == "random"
        assert (tmp_path / "docs" / "reducer.npz").exists()


# -- CLI (reference test_suite.py:259-293) ---------------------------------


class TestCLI:
    def run_cli(self, tmp_path, *args):
        from fhe_icp_tpu.cli import main
        return main(["--storage-dir", str(tmp_path / "docs"),
                     "--key-dir", str(tmp_path / "keys"),
                     "--preset", PRESET, *args])

    def test_keys_generate_and_list(self, tmp_path, capsys):
        assert self.run_cli(tmp_path, "keys", "generate",
                            "--key-id", "k1") == 0
        assert self.run_cli(tmp_path, "keys", "list") == 0
        out = capsys.readouterr().out
        assert "k1 (current)" in out

    def test_estimate(self, tmp_path, capsys):
        assert self.run_cli(tmp_path, "estimate", "--num-docs", "10") == 0
        est = json.loads(capsys.readouterr().out)
        assert est["documents"] == 10
        assert est["fits_memory_limit"] is True

    def test_validate_empty_store(self, tmp_path, capsys):
        assert self.run_cli(tmp_path, "validate") == 0
        assert "Valid documents: 0" in capsys.readouterr().out

    def test_compare_missing_doc_clean_error(self, tmp_path, capsys):
        self.run_cli(tmp_path, "keys", "generate")
        rc = self.run_cli(tmp_path, "compare", "nope1", "nope2")
        assert rc == 1
        assert "not found" in capsys.readouterr().err

    def test_encrypt_tags_and_size(self, tmp_path, capsys):
        """--tags lands in metadata['tags'] and the confirmation shows the
        stored size (reference fhe_cli.py:88-91, 104, 326)."""
        self.run_cli(tmp_path, "keys", "generate")
        rc = self.run_cli(tmp_path, "encrypt", "tagged document text",
                          "--id", "tdoc", "--tags", "alpha", "beta",
                          "--metadata", '{"k": "v"}')
        assert rc == 0
        out = capsys.readouterr().out
        assert "Encrypted document: tdoc" in out
        assert "Size: " in out and " bytes" in out
        store = EncryptedDocumentStore(str(tmp_path / "docs"))
        doc = store.load("tdoc")
        assert doc.metadata["tags"] == ["alpha", "beta"]
        assert doc.metadata["k"] == "v"

    def test_keys_list_shows_size(self, tmp_path, capsys):
        """`keys list` displays artifact size (reference fhe_cli.py:64)."""
        self.run_cli(tmp_path, "keys", "generate", "--key-id", "ksz")
        capsys.readouterr()
        assert self.run_cli(tmp_path, "keys", "list") == 0
        out = capsys.readouterr().out
        assert "Size: " in out and " MB" in out

    def test_validate_deep_batched_store(self, tmp_path, capsys):
        """--deep over a multi-doc store: one healthy sweep, batched
        (level-grouped chunks, not one dispatch per document)."""
        self.run_cli(tmp_path, "keys", "generate")
        batch = tmp_path / "docs.txt"
        batch.write_text("first document\nsecond document\nthird one\n")
        assert self.run_cli(tmp_path, "encrypt-batch", str(batch)) == 0
        capsys.readouterr()
        rc = self.run_cli(tmp_path, "validate", "--deep")
        out = capsys.readouterr().out
        assert rc == 0
        assert "Noise check: 3 healthy, 0 low-budget" in out
