"""Embedding property analysis: similarity matrix + quantization effects.

Reference parity: /root/reference/embedding_analysis.py (6-document
similarity matrix, saved embeddings) and embedding_edge_cases.py (empty
text, truncation, unicode, scaling) — merged into one runnable analysis.

Run: python examples/embedding_analysis.py
"""

import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import numpy as np

from fhe_icp_tpu.models.embedder import make_embedder
from fhe_icp_tpu.utils.quantize import prepare_embedding_for_fhe

DOCS = [
    "The quick brown fox jumps over the lazy dog",
    "A fast brown fox leaps over a sleepy dog",
    "Quantum computers use superposition and entanglement",
    "Qubits exploit quantum superposition for computation",
    "The stock market rallied on strong earnings",
    "Equities climbed after upbeat corporate results",
]


def main() -> None:
    emb = make_embedder()
    print(f"embedder: {type(emb).__name__} (dim={emb.dim})\n")

    vecs = emb.get_embeddings_batch(DOCS)
    norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sim = norm @ norm.T

    print("similarity matrix (pairs 0-1, 2-3, 4-5 are paraphrases):")
    for i, row in enumerate(sim):
        print("  " + " ".join(f"{v:5.2f}" for v in row) + f"   [{DOCS[i][:38]}…]")
    para = np.mean([sim[0, 1], sim[2, 3], sim[4, 5]])
    cross = np.mean([sim[0, 2], sim[0, 4], sim[2, 5]])
    print(f"\nmean paraphrase similarity: {para:.3f}; cross-topic: {cross:.3f}\n")

    print("quantization contract (scale=1000 int32):")
    q, meta = prepare_embedding_for_fhe(vecs[0])
    deq = q / (1000 * np.linalg.norm(q / 1000))
    err = np.abs(norm[0] - deq).max()
    print(f"  range [{meta['quantized_min']}, {meta['quantized_max']}], "
          f"max dequantization error {err:.5f}\n")

    print("edge cases:")
    print(f"  empty text -> zero vector: "
          f"{np.allclose(emb.get_embedding(''), 0)}")
    long = "word " * 1000
    print(f"  5000-char text truncates to max_length={emb.max_length}: "
          f"embedding finite = {np.isfinite(emb.get_embedding(long)).all()}")
    uni = emb.get_embedding("naïve café — résumé 🦊")
    print(f"  unicode handled: finite = {np.isfinite(uni).all()}")
    same = emb.get_embedding(DOCS[0])
    again = emb.get_embedding(DOCS[0])
    print(f"  deterministic: {np.array_equal(same, again)}")


if __name__ == "__main__":
    main()
