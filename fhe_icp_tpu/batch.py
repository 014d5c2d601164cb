"""BatchProcessor: embed -> reduce -> quantize -> encrypt -> store, plus
encrypted compare and search.

Re-implements /root/reference/batch_operations.py:26-295 with the
simulation removed: `encrypt_documents` stores real RLWE ciphertexts
(the reference stores plaintext under the name `encrypted_embedding` —
batch_operations.py:176-178), `compare_encrypted` runs a genuine
ciphertext x ciphertext inner product (tensor product + relinearization)
and `search_similar` is one batched ciphertext-matvec over the whole
store instead of a per-document Python loop (batch_operations.py:268-279).

Each document is stored as TWO ciphertexts: the ascending ("fwd") and
reversed ("rev") coefficient encodings of its quantized embedding, so
any pair of documents can be compared fully under encryption (the inner
product of doc A's fwd encoding with doc B's rev encoding lands in one
coefficient of their product polynomial).
"""

from __future__ import annotations

import gc
import hashlib
import logging
import time
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

from .keymgr import FHEKeyManager
from .models.embedder import make_embedder
from .ops import fastdot, pack
from .models.reduction import DimensionReducer
from .models.similarity import FHESimilarityModel
from .ops.cipher import Ciphertext
from .store import EncryptedDocument, EncryptedDocumentStore
from .utils.quantize import DEFAULT_SCALE, dequantize_score, \
    prepare_embedding_for_fhe

logger = logging.getLogger(__name__)


@dataclass
class BatchConfig:
    """Reference parity: batch_operations.py:26-40."""

    batch_size: int = 10
    max_memory_mb: int = 4000
    checkpoint_interval: int = 50
    show_progress: bool = True
    force_gc: bool = True

    def __post_init__(self):
        if self.batch_size < 1:
            raise ValueError("batch_size must be >= 1")
        if self.max_memory_mb < 100:
            raise ValueError("max_memory_mb must be >= 100")


class BatchProcessor:
    def __init__(self, config: Optional[BatchConfig] = None,
                 storage_dir: str = "./encrypted_docs",
                 key_dir: str = "~/.fhe_keys",
                 preset: str = "pairwise-4096",
                 target_dim: int = 128,
                 reducer: Optional[DimensionReducer] = None,
                 embedder=None,
                 validate_model: bool = True):
        self.config = config or BatchConfig()
        self.embedder = embedder or make_embedder()
        self.key_manager = FHEKeyManager(key_dir, preset=preset)
        self.storage = EncryptedDocumentStore(storage_dir)
        self.target_dim = target_dim
        self.scale = DEFAULT_SCALE
        self.reducer = reducer
        if self.reducer is None and self._reducer_path.exists():
            # Every process that opens a store must reduce with the SAME
            # projection its documents were encrypted under (the
            # reference ships a fitted pca_reducer_128.pkl for the same
            # reason — /root/reference/dimension_reduction.py:219-220).
            self.reducer = DimensionReducer.load(self._reducer_path)
            logger.info("loaded persisted %s reducer from %s",
                        self.reducer.method, self._reducer_path)

        # Load (or lazily create) keys + runtime.
        if self.key_manager.get_current_key() is None:
            self.key_manager.generate_keys()
        self.runtime = self.key_manager.load_keyset()
        self.key_id = self.key_manager.get_current_key()

        # Similarity model (reference _init_model, batch_operations.py:78-108).
        self.fhe_model = FHESimilarityModel(input_dim=target_dim,
                                            preset=preset)
        self.fhe_model.train()
        self.fhe_model.compile(runtime=self.runtime)
        if validate_model:
            self._self_validate()

        try:
            import psutil
            self._proc = psutil.Process()
            self.initial_memory_mb = self._proc.memory_info().rss / 1e6
        except Exception:
            self._proc = None
            self.initial_memory_mb = 0.0

    def _self_validate(self) -> None:
        """Identical embeddings must score ~1.0 under real encryption
        (reference batch_operations.py:96-103, tolerance ±0.2).

        The whole check — encrypt both encodings, degree-2 encrypted
        dot, exact decode — runs as ONE jitted program: on remote-
        compile TPU tunnels every separate graph costs ~30 s to build,
        and a four-graph version dominated cold BatchProcessor init
        (measured ~145 s total; benchmarks/coldstart.py).
        """
        import jax
        import jax.numpy as jnp
        from .ops import dot as fhe_dot
        from .ops.cipher import encrypt_sym
        from .ops.encoding import encode_fwd, encode_rev
        from .ops.runtime import fresh_prng_key

        rng = np.random.default_rng(0)
        e = rng.standard_normal(self.target_dim)
        q, _ = prepare_embedding_for_fhe(e, self.scale)
        ctx, sk = self.runtime.ctx, self.runtime.keys.sk
        d = self.target_dim

        @jax.jit
        def fused(k1, k2, vec):
            ct_f = encrypt_sym(ctx, sk, k1, encode_fwd(vec, ctx.n))
            ct_r = encrypt_sym(ctx, sk, k2, encode_rev(vec, ctx.n))
            return fhe_dot.decrypt_dot(
                ctx, sk, fhe_dot.dot_ct_ct_deg2(ctx, ct_f, ct_r), d)

        raw = int(fused(fresh_prng_key(), fresh_prng_key(),
                        jnp.asarray(q, dtype=jnp.int32)))
        sim = dequantize_score(raw, self.scale)
        if abs(sim - 1.0) > 0.2:
            logger.warning("model self-validation: identical-pair "
                           "similarity %.4f outside 1.0±0.2", sim)
        else:
            logger.info("self-validation OK: identical-pair sim=%.4f", sim)

    # -- memory management (reference batch_operations.py:110-118) ---------
    def _memory_mb(self) -> float:
        return self._proc.memory_info().rss / 1e6 if self._proc else 0.0

    def _check_memory(self) -> None:
        used = self._memory_mb()
        if used > self.config.max_memory_mb:
            logger.warning("memory %.0f MB over limit %d MB; forcing gc",
                           used, self.config.max_memory_mb)
            gc.collect()

    # -- ingestion ---------------------------------------------------------
    # First-ingestion corpora at least this large get a PCA reducer
    # (the reference's production choice: 87.49% similarity preservation
    # vs 78.47% for random projection —
    # /root/reference/SESSION_REPORT.md:61-64); smaller first corpora
    # fall back to the seeded random projection.  At most REDUCER_FIT_MAX
    # embeddings feed the fit (memory bound).
    REDUCER_FIT_MAX = 512

    @property
    def _reducer_path(self):
        return self.storage.dir / "reducer.npz"

    def _fit_reducer(self, embs: np.ndarray) -> None:
        """Fit + persist the store's reducer on the first ingested corpus.

        The fitted reducer is saved beside the store and reloaded by
        every later process.  It is fitted exactly ONCE per store: a
        refit would silently break comparability with already-encrypted
        documents, so upgrading an existing store's projection requires
        re-ingesting the plaintext corpus.
        """
        n = int(embs.shape[0])
        method = "pca" if n >= self.target_dim else "random"
        self.reducer = DimensionReducer(self.target_dim, method=method)
        self.reducer.fit(embs)
        detail = ""
        if n >= 3:
            sp = self.reducer.similarity_preservation(embs)
            detail = f", similarity preservation {sp:.4f}"
        try:
            self.reducer.save(self._reducer_path)
            where = f"; persisted to {self._reducer_path}"
        except OSError as e:
            where = f"; persist FAILED ({e})"
        logger.info("fitted %s reducer on %d embeddings%s%s",
                    method, n, detail, where)

    def _ensure_reducer(self, embs: np.ndarray) -> DimensionReducer:
        if self.reducer is None:
            # Query-before-ingest on an empty store: fit (and persist)
            # on whatever is at hand — the seeded random projection when
            # below the PCA sample floor.
            self._fit_reducer(embs)
        return self.reducer

    def _embed_reduce(self, texts: List[str]) -> np.ndarray:
        embs = self.embedder.get_embeddings_batch(
            texts, batch_size=min(8, len(texts)))
        return self._ensure_reducer(embs).transform(embs)

    def encrypt_documents(self, texts: List[str],
                          doc_ids: Optional[List[str]] = None,
                          metadata: Optional[List[Dict]] = None,
                          resume: bool = False) -> List[str]:
        """Embed, reduce, quantize, RLWE-encrypt and store texts.

        With resume=True, documents whose id is already in the store with
        a matching content hash are skipped — interrupted bulk ingestions
        restart from where they left off (SURVEY.md §5 checkpoint/resume).
        """
        if doc_ids is None:
            doc_ids = [f"doc_{hashlib.sha256(t.encode()).hexdigest()[:12]}"
                       for t in texts]
        if metadata is None:
            metadata = [{} for _ in texts]
        assert len(doc_ids) == len(texts) == len(metadata)

        if resume:
            keep = []
            skipped = 0
            for i, doc_id in enumerate(doc_ids):
                entry = self.storage.index.get(doc_id)
                if entry is not None:
                    try:
                        doc = self.storage.load(doc_id)
                        if doc.content_hash == hashlib.sha256(
                                texts[i].encode()).hexdigest():
                            skipped += 1
                            continue
                    except Exception:
                        pass            # corrupt/missing -> re-encrypt
                keep.append(i)
            if skipped:
                logger.info("resume: skipping %d already-encrypted docs",
                            skipped)
            done_pre = [doc_ids[i] for i in range(len(doc_ids))
                        if i not in set(keep)]
            texts = [texts[i] for i in keep]
            metadata = [metadata[i] for i in keep]
            doc_ids = [doc_ids[i] for i in keep]
            if not texts:
                return done_pre
        else:
            done_pre = []

        # First ingestion into a fresh store: fit the reducer on the
        # call's leading corpus BEFORE any encryption — PCA when the
        # corpus is large enough, random projection otherwise (see
        # _fit_reducer).  The fit embeddings are reduced once and reused
        # by the loop below, so nothing is embedded twice.
        pre_reduced: Dict[int, np.ndarray] = {}
        if self.reducer is None and texts:
            k = min(len(texts), self.REDUCER_FIT_MAX)
            embs = self.embedder.get_embeddings_batch(
                texts[:k], batch_size=min(8, k))
            self._fit_reducer(embs)
            red = self.reducer.transform(embs)
            pre_reduced = {i: red[i] for i in range(k)}

        iterator = range(0, len(texts), self.config.batch_size)
        if self.config.show_progress:
            try:
                from tqdm import tqdm
                iterator = tqdm(list(iterator), desc="encrypt")
            except ImportError:
                pass

        done: List[str] = []
        for start in iterator:
            self._check_memory()
            batch = texts[start: start + self.config.batch_size]
            ids = doc_ids[start: start + self.config.batch_size]
            metas = metadata[start: start + self.config.batch_size]
            idxs = list(range(start, start + len(batch)))
            if all(i in pre_reduced for i in idxs):
                reduced = np.stack([pre_reduced[i] for i in idxs])
            elif any(i in pre_reduced for i in idxs):
                # Batch straddles the pre-reduced prefix: embed the tail.
                missing = [i for i in idxs if i not in pre_reduced]
                tail = self._embed_reduce([texts[i] for i in missing])
                rows = dict(zip(missing, tail))
                reduced = np.stack([
                    pre_reduced.get(i, rows.get(i)) for i in idxs])
            else:
                reduced = self._embed_reduce(batch)
            quantized = np.stack([
                prepare_embedding_for_fhe(r, self.scale)[0] for r in reduced])
            # seed=None -> fresh OS entropy per encryption.  Deriving the
            # seed from doc ids (as an earlier revision did) reuses (a, e)
            # when CHANGED content is re-encrypted under the same ids —
            # c0 - c0' = m - m' leaks the plaintext difference.
            ct_fwd = self.runtime.encrypt_vector(quantized)
            ct_rev = self.runtime.encrypt_vector(quantized, rev=True)
            fwd_np = np.asarray(ct_fwd.data)
            rev_np = np.asarray(ct_rev.data)
            now = time.time()
            for i, (doc_id, text, meta) in enumerate(zip(ids, batch, metas)):
                # fwd + rev stacked along poly axis: (4, L, N).
                data = np.concatenate([fwd_np[i], rev_np[i]], axis=0)
                doc = EncryptedDocument(
                    doc_id=doc_id,
                    content_hash=hashlib.sha256(text.encode()).hexdigest(),
                    timestamp=now,
                    ct_data=data,
                    ct_level=ct_fwd.level,
                    dim=self.target_dim,
                    scale=self.scale,
                    key_id=self.key_id or "",
                    metadata=meta,
                )
                self.storage.save(doc, flush=False)
                done.append(doc_id)
            self.storage.flush_index()              # one index write/batch
            if (self.config.force_gc
                    and len(done) % self.config.checkpoint_interval == 0):
                gc.collect()
        logger.info("encrypted %d documents", len(done))
        return done_pre + done

    # -- key-id enforcement + homomorphic re-keying -------------------------
    def _check_key(self, doc_id: str, doc_key_id: str) -> None:
        """Hard-error on a key mismatch instead of decrypting garbage.

        Decrypting a ciphertext with the wrong secret key yields random
        scores with no error signal; the reference avoids this by loading
        models per key_id (/root/reference/key_management.py:203-241).
        Here mismatched documents are rejected and `rekey_store` migrates
        them homomorphically.
        """
        if doc_key_id and self.key_id and doc_key_id != self.key_id:
            raise ValueError(
                f"document {doc_id!r} is encrypted under key "
                f"{doc_key_id!r} but the current key is {self.key_id!r}; "
                f"run rekey_store({doc_key_id!r}) to migrate it "
                f"(or `keys rotate`, which migrates automatically)")

    def rekey_store(self, old_key_id: str) -> int:
        """Re-encrypt every stored doc from old_key_id to the current key
        WITHOUT decrypting (arith.rekey keyswitch).  Returns #migrated."""
        n = rekey_documents(self.storage, self.key_manager, old_key_id,
                            self.key_id)
        self._op_cache = None            # packed operand cache is stale
        return n

    # -- encrypted compare (REAL ct x ct, unlike the reference) ------------
    def _split_ct(self, doc: EncryptedDocument) -> Tuple[Ciphertext, Ciphertext]:
        import jax.numpy as jnp
        data = jnp.asarray(doc.ct_data)
        fwd = Ciphertext(data[:2], doc.ct_level, True)
        rev = Ciphertext(data[2:], doc.ct_level, True)
        return fwd, rev

    def compare_encrypted(self, doc_id1: str, doc_id2: str) -> float:
        d1 = self.storage.load(doc_id1)
        d2 = self.storage.load(doc_id2)
        assert d1.dim == d2.dim
        self._check_key(doc_id1, d1.key_id)
        self._check_key(doc_id2, d2.key_id)
        fwd1, _ = self._split_ct(d1)
        _, rev2 = self._split_ct(d2)
        # Immediate decrypt: the degree-2 product decodes bit-identically
        # and skips the relinearization keyswitch (ops/dot.dot_ct_ct_deg2).
        score_ct = self.runtime.dot_ct_ct(fwd1, rev2, relinearize=False)
        raw = int(self.runtime.decrypt_dot(score_ct, d1.dim))
        return dequantize_score(raw, d1.scale)

    # -- encrypted search: one batched ciphertext-matvec -------------------
    def search_similar(self, query_text: str, top_k: int = 5,
                       min_similarity: float = 0.5
                       ) -> List[Tuple[str, float]]:
        import jax.numpy as jnp
        doc_ids = self.storage.list_documents()
        if not doc_ids:
            return []
        q_emb = self.embedder.get_embedding(query_text)
        q_red = self._ensure_reducer(q_emb[None]).transform(q_emb)[0]
        q_int, _ = prepare_embedding_for_fhe(q_red, self.scale)

        first = self.storage.load(doc_ids[0])
        dim, level = first.dim, first.ct_level
        if len(doc_ids) >= 64:
            # MXU fast path: slot-packed digit-matmul scoring (ops/pack.py)
            # over the packed arena index (C++ codec, zero-copy load).
            # S = N/dim documents share one ciphertext (packed
            # homomorphically from the stored per-doc ciphertexts), so
            # per-document HBM traffic drops S-fold and the matmul output
            # fills the full 128-lane MXU width.
            ctx, sk = self.runtime.ctx, self.runtime.keys.sk
            doc_ids, doc_op, n_docs, corr = self._search_operands(level)
            q_op = pack.make_packed_query_operand(
                ctx, sk, jnp.asarray(q_int), dim, doc_op.level)
            raw = np.asarray(pack.packed_scores(ctx, doc_op, q_op, corr),
                             dtype=np.int64).reshape(-1)[:n_docs]
        else:
            docs = [self.storage.load(d) for d in doc_ids]
            for d in docs:
                self._check_key(d.doc_id, d.key_id)
            batch = np.stack([d.ct_data[:2] for d in docs])  # (B, 2, L, N)
            cts = Ciphertext(jnp.asarray(batch), level, True)
            raw = np.asarray(
                self.runtime.decrypt_dot(self.runtime.matvec(cts, q_int), dim),
                dtype=np.int64)
        sims = raw / float(self.scale * self.scale)
        order = np.argsort(-sims)
        out = [(doc_ids[i], float(sims[i])) for i in order
               if sims[i] >= min_similarity][:top_k]
        return out

    def _search_operands(self, level: int):
        """(doc_ids, packed MXU DocOperand, n_docs, pt_corr) for the whole
        store, cached per store-content signature; backed by the packed
        C++ arena when the native codec is available, per-document loads
        otherwise.

        The per-doc fwd ciphertexts are slot-packed homomorphically
        (pack.pack_ciphertexts — noise-free monomial multiplies + adds)
        and then modulus-switched down to 2 limbs (scoring needs far
        less noise headroom than a fresh ciphertext carries), so the
        cached operand is S = N/dim * L/2 times smaller than the store.
        """
        import jax
        import jax.numpy as jnp
        from .ops import arith
        ids = self.storage.list_documents()
        for doc_id in ids:
            self._check_key(doc_id, self.storage.index[doc_id].get("key_id", ""))
        sig = (tuple(ids), tuple(sorted(
            (d, e["sha256"]) for d, e in self.storage.index.items())))
        cached = getattr(self, "_op_cache", None)
        if cached is not None and cached[0] == sig:
            return cached[1], cached[2], cached[3], cached[4]
        try:
            from . import native  # noqa: F401 — probe toolchain
            arena_ids, view = None, None
            try:
                arena_ids, view = self.storage.load_arena()
            except Exception:
                pass
            if arena_ids != ids:
                arena_ids, _ = self.storage.export_arena()
                arena_ids, view = self.storage.load_arena()
            batch = np.asarray(view[:, :2])                 # fwd ciphertexts
        except Exception:
            arena_ids = ids
            batch = np.stack([self.storage.load(d).ct_data[:2] for d in ids])
        ctx = self.runtime.ctx

        def build(b):
            ct = Ciphertext(
                pack.pack_ciphertexts(ctx, b, self.target_dim, level),
                level, True)
            return arith.mod_switch_to(ctx, ct, min(2, level))

        ct = jax.jit(build)(jnp.asarray(batch))
        # On TPU the fused scoring kernel consumes whole row blocks; pad
        # the operand once at build time (zero ciphertexts score 0 and
        # are sliced off by the [:n_docs] consumers) so the kernel never
        # re-pads — an extra full operand copy — on every search.  The
        # CPU/XLA path has no block constraint, so padding there would
        # only add work.
        if jax.default_backend() == "tpu":
            from .ops.pack_pallas import PAD_GROUPS
            pad_groups = PAD_GROUPS
        else:
            pad_groups = 1
        doc_op = pack.make_packed_doc_operand(ctx, ct.data, ct.level,
                                              pad_groups_to=pad_groups)
        self._op_cache = (sig, arena_ids, doc_op, len(arena_ids), ct.pt_corr)
        return arena_ids, doc_op, len(arena_ids), ct.pt_corr

    # -- stats (reference batch_operations.py:286-295) ---------------------
    def get_memory_stats(self) -> Dict:
        current = self._memory_mb()
        return {
            "initial_mb": self.initial_memory_mb,
            "current_mb": current,
            "used_mb": current - self.initial_memory_mb,
            "limit_mb": self.config.max_memory_mb,
        }


def rekey_documents(storage: EncryptedDocumentStore,
                    key_manager: FHEKeyManager, old_key_id: str,
                    new_key_id: Optional[str] = None,
                    batch_size: int = 64) -> int:
    """Homomorphically migrate every doc under old_key_id to new_key_id.

    Each stored ciphertext (fwd + rev pair) is keyswitched old_s -> new_s
    (arith.rekey) — the plaintext is never exposed; only additive
    keyswitch noise is paid.  Used by `keys rotate` (CLI) and
    BatchProcessor.rekey_store.  Returns the number of migrated docs.
    """
    import jax
    import jax.numpy as jnp

    from .ops import arith

    new_key_id = new_key_id or key_manager.get_current_key()
    ids = [d for d in storage.list_documents()
           if storage.index[d].get("key_id") == old_key_id]
    if not ids:
        return 0
    ksks = key_manager.load_rekey_key(old_key_id, new_key_id)
    ctx = key_manager.load_keyset(new_key_id).ctx
    jitted: Dict[int, object] = {}

    def rekey_batch(data, level):
        fn = jitted.get(level)
        if fn is None:
            ksk = ksks.get(level)
            if ksk is None:
                raise ValueError(f"no rekey key for level {level} "
                                 f"(available: {sorted(ksks)})")
            fn = jax.jit(lambda x: arith.rekey(
                ctx, ksk, Ciphertext(x, level, True)).data)
            jitted[level] = fn
        return fn(data)

    done = 0
    for start in range(0, len(ids), batch_size):
        chunk = [storage.load(d) for d in ids[start: start + batch_size]]
        by_level: Dict[int, list] = {}
        for doc in chunk:
            by_level.setdefault(doc.ct_level, []).append(doc)
        for level, group in by_level.items():
            data = jnp.asarray(np.stack([d.ct_data for d in group]))
            b = data.shape[0]                       # (B, 2k, L, N)
            k2 = data.shape[1]
            pairs = data.reshape(b * (k2 // 2), 2, level, ctx.n)
            out = np.asarray(rekey_batch(pairs, level),
                             dtype=np.uint32).reshape(b, k2, level, ctx.n)
            for i, doc in enumerate(group):
                doc.ct_data = out[i]
                doc.key_id = new_key_id
                storage.save(doc, flush=False)
                done += 1
        storage.flush_index()                       # one index write/batch
    logger.info("re-keyed %d documents %s -> %s", done, old_key_id,
                new_key_id)
    return done
