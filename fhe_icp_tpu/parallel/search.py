"""Sharded encrypted search: batched scoring + distributed top-k over a mesh.

BASELINE.json configs 3/5: one clear query against an encrypted document
store.  Two implementations:

* `make_sharded_search` — NTT-domain matvec + single-coefficient decode,
  sharded batch-over-dp / limbs-over-tp.  The pointwise multiply needs no
  communication; the RNS decode contracts the limb (tp) axis (XLA inserts
  the gather/psum over ICI); top-k merges across dp.
* `make_sharded_fastdot_search` — the MXU digit-matmul fast path
  (ops/fastdot.py) sharded batch-over-dp: each chip scores its shard of
  the store with one int8 matmul against the replicated query operand,
  then per-shard top-k results merge with one tiny all-gather — cross-
  chip traffic is O(k), not O(n).

Replaces the reference's per-document Python predict loop
(/root/reference/batch_operations.py:263-284) with one pjit'd program.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops import dot as fhe_dot
from ..ops import fastdot, pack
from ..ops.cipher import Ciphertext
from ..ops.context import CryptoContext
from .mesh import DP_AXIS, batch_sharding, replicated


def make_sharded_search(ctx: CryptoContext, sk, mesh, d: int, level: int,
                        top_k: int = 5):
    """Build a jitted sharded search step (NTT-domain reference path).

    Returns fn(cts_data (B, 2, L, N) u32, query (d,) i32) ->
    (scores (B,) i32, topk_vals (k,) i32, topk_idx (k,) i32).
    """
    bs = batch_sharding(mesh)
    rep = replicated(mesh)

    def step(cts_data, query):
        cts = Ciphertext(cts_data, level, True)
        prod = fhe_dot.matvec_ct_pt(ctx, cts, query)
        scores = fhe_dot.decrypt_dot(ctx, sk, prod, d)     # (B,) int32
        vals, idx = jax.lax.top_k(scores, top_k)
        return scores, vals, idx

    return jax.jit(step, in_shardings=(bs, rep),
                   out_shardings=(rep, rep, rep))


def doc_operand_sharding(mesh) -> jax.sharding.NamedSharding:
    """DocOperand digits (L, 4, B, 2N): shard the batch axis over dp."""
    return jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(None, None, DP_AXIS, None))


def make_sharded_fastdot_search(ctx: CryptoContext, mesh, top_k: int = 5,
                                pt_corr: int = 1):
    """Build the MXU fast-path sharded search step.

    Returns fn(doc_digits (L, 4, B, 2N) i8, query_digits (L, 4, 2N) i8)
    -> (scores (B,) i32, topk_vals (k,) i32, topk_idx (k,) i32).

    Documents shard over dp; the query operand is replicated.  Each chip
    computes its shard's scores locally; the final top-k runs on the
    all-gathered (B,) score vector — O(B) int32, tiny next to the
    ciphertexts, and XLA keeps the matmul fully local.
    """
    ds = doc_operand_sharding(mesh)
    rep = replicated(mesh)

    def step(doc_digits, query_digits, level: int):
        docs = fastdot.DocOperand(doc_digits, level)
        q = fastdot.QueryOperand(query_digits, level, 0)
        scores = fastdot.scores(ctx, docs, q, pt_corr)     # (B,) int32
        vals, idx = jax.lax.top_k(scores, top_k)
        return scores, vals, idx

    return jax.jit(partial(step, level=ctx.n_limbs),
                   in_shardings=(ds, rep), out_shardings=(rep, rep, rep))


def packed_operand_sharding(mesh) -> jax.sharding.NamedSharding:
    """PackedDocOperand digits (L, G*4, 2N): shard group rows over dp.

    Rows are group-major (digit planes of one packed ciphertext stay
    adjacent), so shards remain group-aligned whenever G divides the dp
    axis and every reshape inside the scoring program stays shard-local
    — XLA never all-gathers the store.
    """
    return jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(None, DP_AXIS, None))


def topk_hierarchical(flat, k: int, seg: int = 4096):
    """EXACT top-k of a long vector without a full sort.

    lax.top_k over a flat (n,) vector lowers to a full O(n log n) sort
    on TPU — at 100k scores that sort costs more than the scoring matmul
    itself.  Splitting into segments, batch-top-k'ing each (one pass),
    and merging the s*k survivors is exact (any global top-k element is
    a top-k element of its segment) and turns the cost into O(n) + a
    tiny sort.
    """
    n = flat.shape[0]
    if n <= 2 * seg:
        return jax.lax.top_k(flat, min(k, n))
    s = -(-n // seg)
    pad = s * seg - n
    fp = flat
    if pad:
        fp = jnp.concatenate(
            [flat, jnp.full((pad,), jnp.iinfo(flat.dtype).min, flat.dtype)])
    kk = min(k, seg)
    v, i = jax.lax.top_k(fp.reshape(s, seg), kk)       # (s, kk) batched
    # Clamp synthesized global indices in-range: a padding slot carries
    # iinfo.min but an index past n; if the caller's data also contains
    # iinfo.min entries (e.g. masked shards) a pad slot can win a tie in
    # the merge, and the returned index must still be a valid position.
    gi = jnp.minimum(
        (i + (jnp.arange(s) * seg)[:, None]).reshape(-1), n - 1)
    fv, fpos = jax.lax.top_k(v.reshape(-1), k)
    return fv, gi[fpos]


def make_sharded_packed_search(ctx: CryptoContext, mesh, d: int,
                               top_k: int = 5, pt_corr: int = 1,
                               n_docs: int | None = None):
    """Slot-packed MXU search sharded over the document (group) axis.

    Returns fn(doc_digits (L, G*4, 2N) i8 — PackedDocOperand.digits,
    group-major rows — query_digits (L, 2N, 4S) i8 matmul layout)
    -> (scores (G*S,) i32, topk_vals (k,) i32, topk_idx (k,) i32).

    Each packed ciphertext holds S = N/d documents (ops/pack.py), so a
    shard of G/n_dp groups scores S times more documents per byte than
    the per-doc path; the per-chip matmul output is 4S = 128 columns —
    the full MXU lane width.

    Ranking is DISTRIBUTED: each shard top-ks its own scores, then only
    (k values + k global indices) per shard cross the interconnect and a
    tiny (n_dp*k)-element merge runs replicated — O(k) collective
    traffic, never an O(B) sort of the gathered score vector (which
    would replicate B-element sorts on every device: measured 2-8x
    slowdowns at D=8 on the virtual mesh, and the exact pattern the
    benchmarks/README.md traffic model forbids at v5p scale).  The full
    score vector is still returned (one linear all-gather) for gating
    and API parity.  `n_docs` bounds the ranking to the first n_docs
    scores when the operand carries zero-ciphertext padding.
    """
    slots = pack.slots_per_ct(ctx.n, d)
    n_dp = mesh.shape[DP_AXIS]
    level = ctx.n_limbs

    # The fused Pallas scoring kernel (ops/pack_pallas.py) runs per
    # shard inside shard_map on TPU; CPU backends use the XLA
    # matmul+fold path (Pallas-on-CPU is interpreter-only).
    impl = "auto"
    P = jax.sharding.PartitionSpec

    def local_step(doc_digits, query_digits):
        # Shapes here are PER-SHARD: (L, (G/n_dp)*4, 2N) and (L, 2N, 4S).
        docs = pack.PackedDocOperand(doc_digits, level)
        q = pack.PackedQueryOperand(query_digits, level, d, slots)
        scores = pack.packed_scores(ctx, docs, q, pt_corr, impl=impl)
        flat = scores.reshape(-1)                      # (B/n_dp,)
        shard = jax.lax.axis_index(DP_AXIS)
        base = shard * flat.shape[0]
        ranked = flat
        if n_docs is not None and n_docs < n_dp * flat.shape[0]:
            # Global index >= n_docs -> zero-ciphertext pad, mask out.
            ranked = jnp.where(base + jnp.arange(flat.shape[0]) < n_docs,
                               flat, jnp.iinfo(jnp.int32).min)
        k = min(top_k, flat.shape[0])
        l_vals, l_idx = topk_hierarchical(ranked, k)   # per-shard top-k
        vals_all = jax.lax.all_gather(l_vals, DP_AXIS)         # (n_dp, k)
        idx_all = jax.lax.all_gather(l_idx + base, DP_AXIS)    # (n_dp, k)
        # The merge may return up to n_dp * k candidates: when top_k
        # exceeds the per-shard score count (small store, many devices)
        # the global answer spans shards, so the final k must not be
        # capped at the per-shard k.
        k_merge = min(top_k, n_dp * k)
        m_vals, m_pos = jax.lax.top_k(vals_all.reshape(-1), k_merge)
        m_idx = idx_all.reshape(-1)[m_pos]
        return flat, m_vals, m_idx

    step = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P(None, DP_AXIS, None), P(None, None, None)),
        out_specs=(P(DP_AXIS), P(), P()),
        check_vma=False)
    return jax.jit(step)
