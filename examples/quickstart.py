"""End-to-end quickstart: keys → encrypt → compare → search, in-process.

Reference parity: /root/reference/session4_quickstart.py.
Run: FHE_MASTER_PASSWORD=demo python examples/quickstart.py
"""

import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import os
import tempfile

os.environ.setdefault("FHE_MASTER_PASSWORD", "quickstart-demo")

from fhe_icp_tpu.batch import BatchConfig, BatchProcessor  # noqa: E402

DOCS = {
    "fox1": "the quick brown fox jumps over the lazy dog",
    "fox2": "a fast brown fox leaps over a lazy dog",
    "quantum": "quantum computing uses superposition and entanglement",
    "finance": "the stock market rallied on strong earnings today",
}


def main() -> None:
    with tempfile.TemporaryDirectory() as tmp:
        print("1) init (generates real RLWE keys + trains the model)…")
        bp = BatchProcessor(
            config=BatchConfig(show_progress=False),
            storage_dir=f"{tmp}/docs", key_dir=f"{tmp}/keys",
            preset="test-512-mult")     # demo ring; use pairwise-4096 in prod

        print("2) encrypting documents (real RLWE ciphertexts)…")
        bp.encrypt_documents(list(DOCS.values()), doc_ids=list(DOCS))

        print("3) encrypted compare:")
        for a, b in [("fox1", "fox2"), ("fox1", "quantum")]:
            print(f"   {a} vs {b}: {bp.compare_encrypted(a, b):+.4f}")

        print("4) encrypted search for 'brown foxes jumping':")
        for doc_id, score in bp.search_similar(
                "brown foxes jumping", top_k=3, min_similarity=-1):
            print(f"   {doc_id}: {score:+.4f}")


if __name__ == "__main__":
    main()
