"""Pipeline parallelism (PP): stage the scoring op chain across chips.

SURVEY.md §2.3 maps classical PP to this domain as "stage the op chain
across chips for streaming document batches".  The other axes (dp/tp/sp)
carry the throughput story; PP is the remaining classical strategy, and
this module implements it honestly as a GPipe-style microbatch pipeline
over a `pp` mesh axis:

  stage 0 (device 0)   int8 digit MATMUL of microbatch m vs the query
  stage 1 (device 1)   separable digit FOLD of microbatch m-1
                       (pack.fold_separable — same math, same oracle)

Steady state, step t: device 0 multiplies microbatch t while device 1
folds microbatch t-1 — both stages busy every step, intermediates flow
stage-to-stage over ICI via `jax.lax.ppermute`, and the bubble is the
classic (P-1)/(M+P-1) fraction.  Stage dispatch uses `jax.lax.cond` on
`axis_index`, so each device really executes only its own stage's
compute (SPMD with per-device control flow, not a masked select).

The scan carries one in-flight partials buffer — at no point does the
full (L, R, 4S) partials tensor exist anywhere, which is PP's memory
argument applied to this workload.

For THIS op chain PP is still dominated by data parallelism (the chain
is two fused kernels deep; dp shards with zero cross-chip traffic), so
the production search paths use dp/tp — see PARITY.md §2.3.  The module
exists to cover the strategy with a real, oracle-gated implementation,
not to replace dp.

The reference has no distributed execution of any kind (SURVEY.md §2.3).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops import pack
from ..ops.cipher import rns_decode_centered
from ..ops.context import CryptoContext

PP_AXIS = "pp"
N_STAGES = 2


def make_pp_mesh(n_devices: int = N_STAGES) -> jax.sharding.Mesh:
    """A 1-D pipeline mesh over the first n_devices devices."""
    auto = jax.sharding.AxisType.Auto
    return jax.make_mesh((n_devices,), (PP_AXIS,),
                         devices=jax.devices()[:n_devices],
                         axis_types=(auto,))


def make_pipelined_scores(ctx: CryptoContext, mesh, level: int, slots: int,
                          n_micro: int):
    """Build a jitted 2-stage pipelined packed-scoring step.

    Returns fn(a_digits (L, R, 2N) i8, v_digits (L, 2N, 4S) i8) ->
    (G, S) i32 exact scores, with R = G*4 rows split into `n_micro`
    equal microbatches.  Bit-identical to pack.packed_scores (gated in
    tests/test_pipeline_parallel.py).
    """
    l, s = level, slots
    n_pp = mesh.shape[PP_AXIS]
    assert n_pp == N_STAGES, "this pipeline has exactly 2 stages"

    def shard_body(a, v):
        la, rows, _ = a.shape
        assert rows % (4 * n_micro) == 0, (rows, n_micro)
        rbm = rows // n_micro                       # rows per microbatch
        idx = jax.lax.axis_index(PP_AXIS)
        part_shape = (la, rbm, 4 * s)

        def stage0(t):
            """Matmul for microbatch t (clamped during the flush step)."""
            mb = jnp.minimum(t, n_micro - 1)
            a_mb = jax.lax.dynamic_slice_in_dim(a, mb * rbm, rbm, axis=1)
            return jax.lax.dot_general(
                a_mb, v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32)

        def stage1(buf):
            return pack.fold_separable(ctx, buf, l, s)   # (L, rbm//4, S)

        def step(buf, t):
            part = jax.lax.cond(
                idx == 0, stage0,
                lambda _t: jnp.zeros(part_shape, jnp.int32), t)
            res = jax.lax.cond(
                idx == 1, stage1,
                lambda _b: jnp.zeros((la, rbm // 4, s), jnp.uint32), buf)
            # Hand the fresh partials to the next stage over ICI.
            buf_next = jax.lax.ppermute(part, PP_AXIS, [(0, 1)])
            return buf_next, res

        buf0 = jnp.zeros(part_shape, jnp.int32)
        _, outs = jax.lax.scan(step, buf0, jnp.arange(n_micro + 1))
        # outs[t] is microbatch t-1's residues, nonzero only on device 1;
        # psum broadcasts them (device 0 contributes zeros).
        res = jax.lax.psum(outs[1:], PP_AXIS)       # (M, L, rbm//4, S)
        return jnp.concatenate(list(res), axis=1)   # (L, G, S)

    rep = jax.sharding.PartitionSpec()
    body = jax.shard_map(shard_body, mesh=mesh, in_specs=(rep, rep),
                         out_specs=rep, check_vma=False)

    def fn(a_digits, v_digits, pt_corr: int = 1):
        acc = body(a_digits, v_digits)
        res = jnp.moveaxis(acc, 0, -1)[..., None]   # (G, S, L, 1)
        return rns_decode_centered(ctx, res, l, pt_corr)[..., 0]

    return jax.jit(fn, static_argnums=2)
