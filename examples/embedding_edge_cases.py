#!/usr/bin/env python3
"""Embedding edge cases on the TPU-native pipeline.

Parity with /root/reference/embedding_edge_cases.py:13-85 (empty text,
over-length truncation, special characters, batch speedup, dtype
footprint, FHE normalization) — but the final quantization step here
feeds a REAL RLWE encryption + exact encrypted self-similarity, which
the reference only prints about.
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from fhe_icp_tpu.models.embedder import make_embedder
from fhe_icp_tpu.utils.quantize import prepare_embedding_for_fhe


def main() -> None:
    embedder = make_embedder(max_length=100)
    print("Embedding edge cases\n")

    print("1. Empty text:")
    emb = embedder.get_embedding("")
    print(f"   handled, shape {emb.shape}, norm {np.linalg.norm(emb):.3f}")

    print("\n2. Very long text (>100 tokens):")
    long_text = " ".join(["This is a very long sentence."] * 50)
    emb = embedder.get_embedding(long_text)
    print(f"   {len(long_text)} chars -> shape {emb.shape} "
          f"(truncated to max_length, as the reference does)")

    print("\n3. Special characters:")
    for text in ["Hello! How are you? \U0001F60A",
                 "Price: $99.99 (20% off)",
                 "Email: test@example.com",
                 "C++ vs Python: which is better?"]:
        emb = embedder.get_embedding(text)
        print(f"   {text!r} -> shape {emb.shape}")

    print("\n4. Batch vs single processing:")
    texts = [f"This is test document number {i}." for i in range(20)]
    t0 = time.time()
    for t in texts:
        embedder.get_embedding(t)
    single_s = time.time() - t0
    t0 = time.time()
    embedder.get_embeddings_batch(texts, batch_size=8)
    batch_s = time.time() - t0
    print(f"   single {single_s:.2f}s, batch {batch_s:.2f}s, "
          f"speedup {single_s / max(batch_s, 1e-9):.1f}x")

    print("\n5. Memory footprint per dtype:")
    emb32 = embedder.get_embedding("Test").astype(np.float32)
    emb16 = emb32.astype(np.float16)
    print(f"   float32 {emb32.nbytes} B, float16 {emb16.nbytes} B "
          f"({(1 - emb16.nbytes / emb32.nbytes) * 100:.0f}% saved)")

    print("\n6. Quantization contract + REAL encryption:")
    emb = embedder.get_embedding("Normalize this embedding for FHE.")
    q, meta = prepare_embedding_for_fhe(emb, scale=1000)
    print(f"   normalized, scaled x1000, int range "
          f"[{q.min()}, {q.max()}], norm metadata {meta['original_norm']:.3f}")

    from fhe_icp_tpu.ops.runtime import FheRuntime
    rt = FheRuntime("test-512-mult")       # small ring: fast demo keygen
    rt.generate_keys(seed=0)
    d = min(128, q.shape[-1])
    qd = q[:d].astype(np.int32)
    ct_a = rt.encrypt_vector(qd, seed=1)
    ct_b = rt.encrypt_vector(qd, seed=2, rev=True)
    raw = int(rt.decrypt_dot(rt.dot_ct_ct(ct_a, ct_b), d))
    want = int(qd.astype(np.int64) @ qd.astype(np.int64))
    print(f"   encrypted self-dot == clear self-dot: {raw == want} "
          f"(raw {raw}, over the first {d} of {q.shape[-1]} dims)")

    print("\nAll edge cases handled.")


if __name__ == "__main__":
    main()
