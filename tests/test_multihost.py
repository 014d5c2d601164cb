"""Multi-host orchestration (parallel/multihost.py).

Single-process unit tests of the DCN-side pieces: partitioning, local
and merged top-k exactness, and a full host-shard search against the
int64 oracle on the 8-virtual-device CPU mesh (each "host" scores its
shard on a 1-device mesh; the merge is the O(k) DCN path).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fhe_icp_tpu.ops import pack
from fhe_icp_tpu.ops.runtime import FheRuntime
from fhe_icp_tpu.parallel import multihost as mh
from fhe_icp_tpu.parallel.mesh import make_mesh
from fhe_icp_tpu.parallel.search import packed_operand_sharding

RNG = np.random.default_rng(41)


def test_partition_groups_balanced_contiguous():
    shards = mh.partition_groups(10, 3)
    assert [s.groups for s in shards] == [4, 3, 3]
    assert shards[0].start == 0 and shards[-1].stop == 10
    for a, b in zip(shards, shards[1:]):
        assert a.stop == b.start


def test_local_and_merge_topk_exact():
    scores = RNG.integers(-10**6, 10**6, size=1000).astype(np.int64)
    k = 7
    # split across 3 "hosts", merge, compare to the global oracle
    parts = np.array_split(scores, 3)
    per_host, off = [], 0
    for p in parts:
        per_host.append(mh.local_topk(p, k, index_offset=off))
        off += p.shape[0]
    vals, idx = mh.merge_topk(per_host, k)
    order = np.argsort(-scores, kind="stable")[:k]
    assert (vals == scores[order]).all()
    assert (scores[idx] == scores[order]).all()


def test_global_topk_single_process_passthrough():
    vals = np.asarray([9, 5, 1], dtype=np.int64)
    idx = np.asarray([4, 0, 2], dtype=np.int64)
    v, i = mh.global_topk(vals, idx, 2)
    assert (v == vals[:2]).all() and (i == idx[:2]).all()


def test_search_host_shard_matches_oracle():
    """Two simulated hosts, each a 1-device mesh over its arena slice."""
    rt = FheRuntime("test-512", rlk_levels=[])
    rt.generate_keys(seed=3)
    ctx, sk = rt.ctx, rt.keys.sk
    d, k = 128, 5
    slots = pack.slots_per_ct(ctx.n, d)            # 4
    n_docs, n_hosts = 29, 2                        # ragged tail on purpose
    groups = -(-n_docs // slots)                   # 8 groups

    docs = RNG.integers(-1000, 1001, size=(n_docs, d)).astype(np.int32)
    query = RNG.integers(-1000, 1001, size=(d,)).astype(np.int32)
    cts = rt.encrypt_vector(docs, seed=5)
    packed = pack.pack_ciphertexts(ctx, cts.data, d, cts.level)
    doc_op = pack.make_packed_doc_operand(ctx, packed, cts.level)
    q_op = pack.make_packed_query_operand(ctx, sk, jnp.asarray(query), d,
                                          cts.level)

    shards = mh.partition_groups(groups, n_hosts)
    mesh = make_mesh(1, shape=(1, 1))
    per_host = []
    for sh in shards:
        local = jax.device_put(mh.shard_slice(doc_op.digits, sh),
                               packed_operand_sharding(mesh))
        vals, idx = mh.search_host_shard(
            ctx, mesh, local, q_op.digits, d, sh, slots, n_docs, top_k=k)
        per_host.append((vals, idx))
    vals, idx = mh.merge_topk(per_host, k)

    truth = docs.astype(np.int64) @ query.astype(np.int64)
    order = np.argsort(-truth, kind="stable")[:k]
    assert (vals == truth[order]).all()
    assert (truth[idx] == truth[order]).all()
