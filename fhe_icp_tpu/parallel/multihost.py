"""Multi-host execution: DCN-side orchestration for the sharded store.

BASELINE.json config 5: 100k encrypted documents partitioned across
N >= 2 hosts, per-host scoring over ICI-local chips, and a global top-k
whose cross-host traffic is O(k) — not O(n).

Layering (SURVEY.md §2.3 "Communication backend"):
  * WITHIN a host/slice, `parallel.search` programs run under pjit over
    the local mesh; XLA emits ICI collectives.
  * ACROSS hosts, this module owns the pieces that ride DCN: document
    partitioning, per-host top-k results, and the O(k) merge.  These
    are deliberately HOST-LEVEL Python (numpy) — cross-host merging of k
    scalars per host is microseconds of work; putting it inside the
    device program would only add dispatch latency.

With `jax.distributed` initialized (multi-process JAX), the same
single-controller program spans hosts and `global_topk` merges each
process's local winners via `multihost_utils`.  Without it (one
process), everything degrades to the local path — which is how the
8-virtual-device CPU mesh tests exercise this module end to end.

The reference is strictly single-process (SURVEY.md §2.3); all of this
is new design territory.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)


def initialize(coordinator: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> int:
    """Join the multi-host JAX runtime (DCN). Returns this process's id.

    No-op returning 0 when running single-process (the common test and
    single-host-benchmark case).  With arguments (or the standard
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID env
    vars), wires up jax.distributed so every host sees the global device
    set and pjit programs span the pod slice.
    """
    import jax
    if num_processes in (None, 1) and coordinator is None:
        return 0
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    logger.info("joined distributed runtime: process %d/%d",
                jax.process_index(), jax.process_count())
    return jax.process_index()


@dataclass(frozen=True)
class HostShard:
    """The contiguous slice of packed ciphertext groups a host owns."""

    host: int
    start: int                 # first packed group index (inclusive)
    stop: int                  # last packed group index (exclusive)

    @property
    def groups(self) -> int:
        return self.stop - self.start


def partition_groups(n_groups: int, n_hosts: int) -> List[HostShard]:
    """Contiguous, balanced partition of packed groups across hosts.

    Contiguity keeps each host's arena slice one mmap range (the C++
    codec serves it zero-copy); balance keeps per-host scoring time
    uniform so the O(k) merge is never stalled by a straggler.
    """
    base, extra = divmod(n_groups, n_hosts)
    shards, start = [], 0
    for h in range(n_hosts):
        size = base + (1 if h < extra else 0)
        shards.append(HostShard(h, start, start + size))
        start += size
    return shards


def shard_slice(packed_digits, shard: HostShard):
    """This host's slice of a PackedDocOperand's (L, G*4, 2N) digits."""
    return packed_digits[:, 4 * shard.start: 4 * shard.stop]


def local_topk(scores: np.ndarray, k: int,
               index_offset: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """Top-k of this host's scores -> (values desc, GLOBAL doc indices)."""
    k = min(k, scores.shape[0])
    part = np.argpartition(-scores, k - 1)[:k]
    order = part[np.argsort(-scores[part], kind="stable")]
    return scores[order], order + index_offset


def merge_topk(per_host: Sequence[Tuple[np.ndarray, np.ndarray]],
               k: int) -> Tuple[np.ndarray, np.ndarray]:
    """Merge per-host (values, indices) top-k lists into the global top-k.

    Input lists are descending; output is the exact global top-k.  The
    data volume crossing DCN is sum of k scalars per host — independent
    of store size.
    """
    vals = np.concatenate([v for v, _ in per_host])
    idxs = np.concatenate([i for _, i in per_host])
    order = np.argsort(-vals, kind="stable")[:k]
    return vals[order], idxs[order]


def global_topk(local_vals: np.ndarray, local_idx: np.ndarray,
                k: int) -> Tuple[np.ndarray, np.ndarray]:
    """All-gather each process's local top-k over DCN and merge.

    Single-process: returns the local result.  Multi-process: one
    process_allgather of 2k scalars per host, then the exact merge.
    """
    import jax
    if jax.process_count() == 1:
        return local_vals[:k], local_idx[:k]
    from jax.experimental import multihost_utils
    vals = multihost_utils.process_allgather(local_vals)   # (P, k)
    idxs = multihost_utils.process_allgather(local_idx)
    return merge_topk(list(zip(vals, idxs)), k)


def search_host_shard(ctx, mesh, doc_digits, query_digits, d: int,
                      shard: HostShard, slots: int, n_docs_global: int,
                      top_k: int = 5):
    """Score one host's shard and return its O(k) contribution.

    doc_digits: this host's (L, G_local*4, 2N) packed operand slice;
    the returned indices are GLOBAL document ids (shard offset applied,
    padding slots filtered).
    """
    from .search import make_sharded_packed_search
    step = make_sharded_packed_search(ctx, mesh, d=d, top_k=top_k)
    flat, _, _ = step(doc_digits, query_digits)
    scores = np.asarray(flat, dtype=np.int64)
    offset = shard.start * slots
    valid = min(scores.shape[0], max(0, n_docs_global - offset))
    vals, idx = local_topk(scores[:valid], top_k, index_offset=offset)
    return global_topk(vals, idx, top_k)
