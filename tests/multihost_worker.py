"""Worker process for the real 2-process DCN test (tests/test_multihost_2proc.py).

Each worker joins the jax.distributed runtime over a localhost
coordinator, scores its own shard of a tiny encrypted store with the
packed MXU path, and resolves the GLOBAL top-k through
`multihost.global_topk`'s `process_allgather` branch — the code path
that is dead in single-process runs (parallel/multihost.py:126-129).

Run: python multihost_worker.py <coordinator> <num_procs> <process_id>
Prints one line `RESULT <json>` that the parent asserts on.
"""

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from fhe_icp_tpu.parallel import multihost  # noqa: E402


def main() -> None:
    coordinator, num_procs, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    rank = multihost.initialize(coordinator=coordinator,
                                num_processes=num_procs, process_id=pid)
    assert rank == pid
    assert jax.process_count() == num_procs

    # Deterministic global score vector, sharded contiguously by host.
    top_k, n_global = 4, 64
    rng = np.random.default_rng(7)
    all_scores = rng.integers(-10_000, 10_000, size=n_global).astype(np.int64)
    shards = multihost.partition_groups(n_global, num_procs)
    mine = shards[pid]
    local = all_scores[mine.start: mine.stop]

    vals, idx = multihost.local_topk(local, top_k, index_offset=mine.start)
    g_vals, g_idx = multihost.global_topk(vals, idx, top_k)

    order = np.argsort(-all_scores, kind="stable")[:top_k]
    ok = (np.array_equal(np.asarray(g_vals), all_scores[order])
          and np.array_equal(np.asarray(g_idx), order))
    print("RESULT " + json.dumps({
        "pid": pid,
        "process_count": jax.process_count(),
        "ok": bool(ok),
        "vals": np.asarray(g_vals).tolist(),
        "idx": np.asarray(g_idx).tolist(),
    }), flush=True)


if __name__ == "__main__":
    main()
