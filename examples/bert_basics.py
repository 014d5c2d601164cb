#!/usr/bin/env python3
"""BERT-embeddings walkthrough on the TPU-native stack.

Parity with /root/reference/bert_basics.py and bert_setup.py (concept
explainer + tokenizer smoke test), but the pipeline stages are shown
LIVE: tokenize -> embed -> reduce -> quantize -> encrypt.
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from fhe_icp_tpu.models.embedder import make_embedder
from fhe_icp_tpu.models.reduction import DimensionReducer
from fhe_icp_tpu.utils.quantize import prepare_embedding_for_fhe


def main() -> None:
    print("Text -> encrypted-vector pipeline, stage by stage\n")
    embedder = make_embedder()
    text = "Hello world"

    print(f"1. Tokenize: {text!r}")
    tokens = getattr(embedder, "tokenize", None)
    if tokens:
        print(f"   tokens: {embedder.tokenize(text)}")
    else:
        print("   (hashing embedder active: words hash straight to "
              "feature indices — no BERT weights cached on this machine)")

    print("\n2. Embed:")
    emb = embedder.get_embedding(text)
    print(f"   {text!r} -> {emb.shape[-1]}-dim vector, "
          f"norm {np.linalg.norm(emb):.3f}")

    print("\n3. Similar texts have similar vectors:")
    pairs = [("the quick brown fox", "a fast brown fox"),
             ("the quick brown fox", "quantum computing and qubits")]
    for a, b in pairs:
        ea, eb = embedder.get_embedding(a), embedder.get_embedding(b)
        cos = float(ea @ eb / (np.linalg.norm(ea) * np.linalg.norm(eb)))
        print(f"   cos({a!r}, {b!r}) = {cos:.3f}")

    print("\n4. Reduce (768 -> 128) and quantize (x1000, int32):")
    red = DimensionReducer(target_dim=min(128, emb.shape[-1]),
                           method="random")
    red.fit(np.stack([embedder.get_embedding(a) for a, _ in pairs]))
    r = red.transform(emb[None])[0]
    q, meta = prepare_embedding_for_fhe(r, scale=1000)
    print(f"   reduced {emb.shape[-1]} -> {r.shape[-1]}, quantized range "
          f"[{q.min()}, {q.max()}]")

    print("\n5. Encrypt (real RLWE) and round-trip:")
    from fhe_icp_tpu.ops.runtime import FheRuntime
    rt = FheRuntime("test-512")
    rt.generate_keys(seed=0)
    d = q.shape[-1]
    ct = rt.encrypt_vector(q.astype(np.int32), seed=1)
    back = np.asarray(rt.decrypt(ct))[: d]
    print(f"   ciphertext polys {tuple(ct.data.shape)}, decrypt == "
          f"quantized input: {bool((back == q[:d]).all())}")


if __name__ == "__main__":
    main()
