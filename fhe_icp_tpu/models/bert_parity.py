"""One-command BERT embedding-parity verification.

The reference's production embedder is torch `bert-base-uncased` with
attention-mask-correct mean pooling (/root/reference/bert_embeddings.py:
53-101).  This build's production embedder is the SAME model in Flax
(models/embedder.FlaxBertEmbedder).  This machine is air-gapped — no HF
hub egress and no cached weights — so real-weight execution cannot run
here; instead this module makes the parity claim VERIFIABLE by anyone
with the weights, in one command:

    python -m fhe_icp_tpu.models.bert_parity

It loads `bert-base-uncased` into BOTH frameworks from the same local
checkpoint, embeds the fixed sentence battery below with the reference's
exact pooling semantics on each side, and asserts:

* framework parity — max elementwise |flax - torch| over the pooled
  embeddings < 1e-3 and pairwise-cosine-matrix agreement < 1e-5 (both
  frameworks run the same weights; any divergence is a porting bug in
  our pooling/masking, exactly what the reference's
  bert_embeddings.py:82-96 semantics demand);
* pipeline quality — PCA 768->128 similarity preservation on the
  battery, reported next to the reference's measured 87.49% (PCA) /
  78.47% (random projection) split (/root/reference/SESSION_REPORT.md:
  61-64).

The fixed input battery is pinned by checksum (SENTENCES_SHA256) so
reported numbers are comparable across machines, and the output records
a fingerprint of the weight files actually used.  The torch<->flax
comparison harness itself is exercised in CI with tiny random injected
weights (tests/test_bert_parity.py), so the only unverified-on-this-
machine step is the download.
"""

from __future__ import annotations

import hashlib
import json
import sys
from typing import List

import numpy as np

# Fixed battery: pairs of near-duplicates, paraphrases, and unrelated
# topics — enough spread for a meaningful similarity-preservation
# correlation, small enough to run in seconds on CPU.
SENTENCES: List[str] = [
    "The quick brown fox jumps over the lazy dog.",
    "A fast brown fox leaps over a lazy dog.",
    "The lazy dog sleeps while the brown fox jumps.",
    "Quantum computing uses superposition and entanglement.",
    "Entanglement and superposition power quantum computers.",
    "Homomorphic encryption allows computing on encrypted data.",
    "Fully homomorphic encryption evaluates circuits over ciphertexts.",
    "The stock market fell sharply amid inflation fears.",
    "Investors sold equities as inflation worries deepened.",
    "She planted tomatoes and basil in the garden this spring.",
    "Basil and tomatoes were planted in her spring garden.",
    "The committee approved the budget after a long debate.",
    "After lengthy discussion, the panel passed the spending plan.",
    "Photosynthesis converts sunlight into chemical energy in plants.",
    "Neural networks learn hierarchical representations from data.",
    "The recipe calls for two cups of flour and one egg.",
]

SENTENCES_SHA256 = hashlib.sha256(
    "\n".join(SENTENCES).encode()).hexdigest()


def _torch_mean_pooled(model_name: str, texts: List[str],
                       max_length: int = 100) -> np.ndarray:
    """The reference's exact path: torch forward + attention-mask-correct
    mean pooling (/root/reference/bert_embeddings.py:77-96)."""
    import os

    import torch
    from transformers import AutoTokenizer, BertModel

    tok = AutoTokenizer.from_pretrained(model_name)
    flax_ckpt = os.path.join(model_name, "flax_model.msgpack")
    if (os.path.isdir(model_name) and os.path.exists(flax_ckpt)
            and not any(os.path.exists(os.path.join(model_name, f))
                        for f in ("pytorch_model.bin", "model.safetensors"))):
        # Flax-only checkpoint (the injected-weights test saves one):
        # convert weights manually — `from_pretrained(from_flax=True)`
        # initializes on the meta device and the converter leaves
        # non-weight buffers there, breaking the forward.  Weight
        # identity across frameworks is the point of the parity check.
        from transformers import BertConfig
        from transformers.modeling_flax_pytorch_utils import \
            load_flax_checkpoint_in_pytorch_model
        model = BertModel(BertConfig.from_pretrained(model_name))
        load_flax_checkpoint_in_pytorch_model(model, flax_ckpt)
    else:
        model = BertModel.from_pretrained(model_name)
    model.eval()
    enc = tok(texts, padding=True, truncation=True, max_length=max_length,
              return_tensors="pt")
    with torch.no_grad():
        out = model(**enc)
    hidden = out.last_hidden_state                      # (B, T, H)
    mask = enc["attention_mask"].unsqueeze(-1).float()
    pooled = (hidden * mask).sum(1) / mask.sum(1).clamp(min=1e-9)
    return pooled.numpy().astype(np.float32)


def _weights_fingerprint(model_name: str) -> str:
    """SHA-256 over the resolved checkpoint file(s), best-effort."""
    try:
        from transformers.utils import cached_file
        h = hashlib.sha256()
        for cand in ("flax_model.msgpack", "model.safetensors",
                     "pytorch_model.bin"):
            try:
                path = cached_file(model_name, cand)
            except Exception:
                continue
            if path:
                with open(path, "rb") as f:
                    for chunk in iter(lambda: f.read(1 << 20), b""):
                        h.update(chunk)
        return h.hexdigest()
    except Exception:
        return "unavailable"


def _cos_matrix(x: np.ndarray) -> np.ndarray:
    n = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-9)
    return n @ n.T


def run_parity(model_name: str = "bert-base-uncased") -> dict:
    """Run the full parity battery.  Requires weights on disk (or
    FHE_ALLOW_DOWNLOAD=1 on a connected machine)."""
    from .embedder import FlaxBertEmbedder
    from .reduction import DimensionReducer

    flax_emb = FlaxBertEmbedder(model_name).get_embeddings_batch(SENTENCES)
    torch_emb = _torch_mean_pooled(model_name, SENTENCES)
    return evaluate(flax_emb, torch_emb,
                    fingerprint=_weights_fingerprint(model_name))


def evaluate(flax_emb: np.ndarray, torch_emb: np.ndarray,
             fingerprint: str = "injected") -> dict:
    """Compare two embedding matrices of the battery (framework parity +
    PCA quality).  Split out from run_parity so the harness itself is
    testable with injected weights (tests/test_bert_parity.py)."""
    from .reduction import DimensionReducer

    max_abs = float(np.max(np.abs(flax_emb - torch_emb)))
    cos_flax = _cos_matrix(flax_emb)
    cos_torch = _cos_matrix(torch_emb)
    cos_gap = float(np.max(np.abs(cos_flax - cos_torch)))

    dim = min(128, flax_emb.shape[0], flax_emb.shape[1])
    pca = DimensionReducer(dim, method="pca").fit(flax_emb)
    rnd = DimensionReducer(dim, method="random").fit(flax_emb)
    return {
        "sentences_sha256": SENTENCES_SHA256,
        "weights_fingerprint_sha256": fingerprint,
        "max_abs_embedding_diff": max_abs,
        "max_abs_cosine_diff": cos_gap,
        "framework_parity_ok": bool(max_abs < 1e-3 and cos_gap < 1e-5),
        "pca_dim": dim,
        "pca_similarity_preservation":
            round(pca.similarity_preservation(flax_emb), 4),
        "random_similarity_preservation":
            round(rnd.similarity_preservation(flax_emb), 4),
        "reference_baseline": {"pca": 0.8749, "random": 0.7847,
                               "source":
                               "/root/reference/SESSION_REPORT.md:61-64"},
    }


def main() -> int:
    try:
        report = run_parity()
    except Exception as e:
        print(json.dumps({
            "error": f"{type(e).__name__}: {e}",
            "hint": "bert-base-uncased weights not on disk; pre-populate "
                    "the HF cache (or set FHE_ALLOW_DOWNLOAD=1 on a "
                    "connected machine) and re-run",
            "sentences_sha256": SENTENCES_SHA256,
        }))
        return 2
    print(json.dumps(report, indent=2))
    return 0 if report["framework_parity_ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
