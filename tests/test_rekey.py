"""Security regression tests: fresh encryption randomness + key rotation.

Covers the two round-1 security holes:

1. Encryption randomness must be FRESH at every entry point — deriving
   it from doc ids reuses (a, e) when changed content is re-encrypted
   under the same id, and c0 - c0' = m - m' leaks the plaintext
   difference.  (The reference's Concrete backend samples fresh per
   execute — /root/reference/fhe_similarity.py:151.)

2. After `keys rotate`, stored ciphertexts remain under the OLD key;
   compare/search must hard-error on the mismatch instead of decrypting
   garbage, and `rekey_store` must migrate the store homomorphically
   (keyswitch old_s -> new_s, no decryption) so scores are preserved
   exactly.  This beats the reference's grace-period scheme
   (/root/reference/key_management.py:243-268), which never migrates.
"""

import numpy as np
import pytest

from fhe_icp_tpu.batch import BatchConfig, BatchProcessor
from fhe_icp_tpu.keymgr import FHEKeyManager
from fhe_icp_tpu.models.embedder import HashingEmbedder

PRESET = "test-512-mult"


@pytest.fixture(autouse=True)
def master_password(monkeypatch):
    monkeypatch.setenv("FHE_MASTER_PASSWORD", "test-password-123")


def make_processor(base):
    return BatchProcessor(
        config=BatchConfig(batch_size=4, show_progress=False),
        storage_dir=str(base / "docs"), key_dir=str(base / "keys"),
        preset=PRESET, target_dim=128, embedder=HashingEmbedder(),
        validate_model=False)


# -- fresh randomness --------------------------------------------------------


class TestFreshRandomness:
    def test_two_encryptions_differ(self, tmp_path):
        km = FHEKeyManager(str(tmp_path / "keys"), preset=PRESET)
        km.generate_keys("k1", seed=7)
        rt = km.load_keyset("k1")
        m = np.arange(rt.ctx.n, dtype=np.int32) % 101 - 50
        c1a = np.asarray(rt.encrypt(m).data)[1]
        c1b = np.asarray(rt.encrypt(m).data)[1]
        assert not (c1a == c1b).all(), "encryption randomness was reused"
        # Deterministic path still available for tests.
        d1 = np.asarray(rt.encrypt(m, seed=3).data)
        d2 = np.asarray(rt.encrypt(m, seed=3).data)
        assert (d1 == d2).all()

    def test_reencrypt_changed_content_fresh_a(self, tmp_path):
        """The resume path re-encrypts CHANGED content under the same doc
        id; the new ciphertext must not share its `a` polynomial with the
        old one (identical (a, e) with m != m' leaks m - m')."""
        proc = make_processor(tmp_path)
        proc.encrypt_documents(["original content"], doc_ids=["d1"])
        a_old = proc.storage.load("d1").ct_data[1].copy()
        proc.encrypt_documents(["CHANGED content"], doc_ids=["d1"],
                               resume=True)
        a_new = proc.storage.load("d1").ct_data[1]
        assert not (a_old == a_new).all(), "(a, e) reuse across messages"

    def test_predict_encrypted_calls_do_not_share_randomness(self, tmp_path):
        from fhe_icp_tpu.models.similarity import FHESimilarityModel
        from fhe_icp_tpu.ops.params import CryptoParams
        from fhe_icp_tpu.ops.runtime import FheRuntime
        params = CryptoParams("rng-512", n=512, n_limbs=2,
                              allow_insecure=True)
        rt = FheRuntime(params)
        rt.generate_keys(seed=0)
        model = FHESimilarityModel(input_dim=128, preset=PRESET)
        model.train(n_samples=200)
        model.compile(runtime=rt)
        x = np.ones((1, 128)) * 0.05
        seen = []
        orig = rt.encrypt_vector

        def spy(vec, seed=None, rev=False):
            ct = orig(vec, seed=seed, rev=rev)
            seen.append(np.asarray(ct.data)[..., 1, :, :].copy())
            return ct

        rt.encrypt_vector = spy
        model.predict_encrypted(x)
        model.predict_encrypted(x)
        assert len(seen) == 2
        assert not (seen[0] == seen[1]).all()


# -- homomorphic re-keying ----------------------------------------------------


class TestRekey:
    def test_rekey_unit_roundtrip(self, tmp_path):
        """encrypt under k1 -> arith.rekey -> decrypts correctly under k2
        (and NOT under k1)."""
        import jax

        from fhe_icp_tpu.ops import arith
        from fhe_icp_tpu.ops.cipher import rekey_keygen
        from fhe_icp_tpu.ops.params import CryptoParams
        from fhe_icp_tpu.ops.runtime import FheRuntime

        params = CryptoParams("rk-512", n=512, n_limbs=3,
                              allow_insecure=True)
        rt1 = FheRuntime(params, rlk_levels=[])
        rt1.generate_keys(seed=1)
        rt2 = FheRuntime(params, rlk_levels=[])
        rt2.generate_keys(seed=2)
        ctx = rt1.ctx
        m = (np.arange(ctx.n, dtype=np.int32) * 7) % 257 - 128
        ct = rt1.encrypt(m, seed=9)
        ksks = jax.jit(lambda k: rekey_keygen(
            ctx, k, rt1.keys.sk, rt2.keys.sk))(jax.random.PRNGKey(5))
        ct2 = arith.rekey(ctx, ksks[ctx.n_limbs], ct)
        assert (np.asarray(rt2.decrypt(ct2)) == m).all()
        assert not (np.asarray(rt1.decrypt(ct2)) == m).all()

    def test_rotation_migration_preserves_scores(self, tmp_path):
        proc = make_processor(tmp_path)
        texts = ["the quick brown fox", "a fast brown fox",
                 "quantum entanglement"]
        ids = proc.encrypt_documents(texts, doc_ids=["a", "b", "c"])
        score_before = proc.compare_encrypted("a", "b")
        old_key = proc.key_id

        proc.key_manager.rotate_keys(grace_period_days=3)
        proc2 = make_processor(tmp_path)
        assert proc2.key_id != old_key

        # Un-migrated docs must raise, not decrypt garbage.
        with pytest.raises(ValueError, match="encrypted under key"):
            proc2.compare_encrypted("a", "b")
        with pytest.raises(ValueError, match="encrypted under key"):
            proc2.search_similar("brown fox", top_k=2, min_similarity=-1.0)

        n = proc2.rekey_store(old_key)
        assert n == len(ids)
        # rekey_store ran on proc2, so ITS store index must carry the new
        # key id (proc's in-memory index is a stale pre-migration view).
        assert proc2.storage.index["a"]["key_id"] == proc2.key_id
        score_after = proc2.compare_encrypted("a", "b")
        # Keyswitch noise is additive and well inside the budget: the
        # decrypted integer dot product — hence the score — is EXACT.
        assert score_after == pytest.approx(score_before, abs=1e-12)

    def test_cli_rotate_migrates_store(self, tmp_path, capsys):
        from fhe_icp_tpu.cli import main

        def run(*args):
            return main(["--storage-dir", str(tmp_path / "docs"),
                         "--key-dir", str(tmp_path / "keys"),
                         "--preset", PRESET, *args])

        assert run("keys", "generate", "--key-id", "k1") == 0
        assert run("encrypt", "hello rotated world", "--id", "d1") == 0
        capsys.readouterr()
        assert run("keys", "rotate") == 0
        out = capsys.readouterr().out
        assert "Re-keyed 1 stored documents" in out
        # Store now opens cleanly under the new key; self-similarity of a
        # migrated doc still lands in the top band.
        assert run("compare", "d1", "d1") == 0
        out = capsys.readouterr().out
        assert "Interpretation: Very similar" in out
