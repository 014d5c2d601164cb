"""Ring-dimension-sharded negacyclic NTT (sequence parallelism for FHE).

Large rings (N=16384+, BASELINE config 4) are partitioned across chips:
each device holds N/D contiguous coefficient rows.  The transform is the
four-step (Bailey) decomposition N = N1 x N2:

    view x as M[i1, i2]  (i = i1*N2 + i2, rows i1 sharded over 'sp')
    1. twist by psi^i                        (local)
    2. all_to_all: rows-sharded -> cols-sharded      [ICI]
    3. size-N1 cyclic NTT over columns       (local, reuses ntt._cyclic_fwd)
    4. twiddle by w^(i2 * brv_N1(k1))        (local)
    5. all_to_all: cols-sharded -> rows-sharded      [ICI]
    6. size-N2 cyclic NTT over rows          (local)

Output layout: slot (k1r, k2r) holds frequency brv(k1r) + N1*brv(k2r) —
self-consistent between fwd/inv and for pointwise products, exactly like
the single-chip plan's bit-reversed order.  The inverse mirrors the
sequence with inverse tables.  Communication = two all_to_alls of N/D
coefficients per direction — the ring-attention-shaped pattern of this
domain (SURVEY.md §2.3), expressed as XLA collectives over ICI.

Tested bit-exact against the convolution oracle on the 8-virtual-device
CPU mesh (tests/test_ntt_dist.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import primes as pr
from ..ops.modmath import shoup_mul
from ..ops.ntt import NttPlan, _cyclic_fwd, _cyclic_inv, build_plan

SP_AXIS = "sp"


def _brv(x: int, bits: int) -> int:
    return int(format(x, f"0{bits}b")[::-1], 2)


@dataclass(frozen=True)
class DistNttPlan:
    """Host-precomputed tables for a sharded (N1 x N2) negacyclic NTT.

    All big tables are (L, N1, N2) in the natural (i1, i2) matrix layout;
    the caller shards axis 1 (i1) or axis 2 (i2) as the step requires.
    """

    n: int
    n1: int
    n2: int
    primes: Tuple[int, ...]
    plan1: NttPlan            # size-N1 cyclic tables (column transform)
    plan2: NttPlan            # size-N2 cyclic tables (row transform)
    psi: jnp.ndarray          # (L, N1, N2) twist psi^i
    psi_sh: jnp.ndarray
    psi_inv_n: jnp.ndarray    # (L, N1, N2) psi^{-i} * N^{-1}
    psi_inv_n_sh: jnp.ndarray
    tw: jnp.ndarray           # (L, N1, N2) omega^(i2 * brv(k1)), axes (k1, i2)
    tw_sh: jnp.ndarray
    tw_inv: jnp.ndarray
    tw_inv_sh: jnp.ndarray
    p_col: jnp.ndarray        # (L, 1, 1)


def build_dist_plan(n: int, prime_list: Tuple[int, ...],
                    n1: int | None = None) -> DistNttPlan:
    assert n & (n - 1) == 0
    n1 = n1 or 1 << ((n.bit_length() - 1) // 2)
    n2 = n // n1
    log_n1 = n1.bit_length() - 1
    plan1 = build_plan(n1, prime_list)
    plan2 = build_plan(n2, prime_list)

    psi_r, psi_sh_r, pin_r, pin_sh_r = [], [], [], []
    tw_r, tw_sh_r, twi_r, twi_sh_r = [], [], [], []
    for p in prime_list:
        psi = pr.root_of_unity(p, 2 * n)
        w = psi * psi % p
        psi_inv = pow(psi, p - 2, p)
        w_inv = pow(w, p - 2, p)
        n_inv = pow(n, p - 2, p)

        ps = np.empty((n1, n2), dtype=np.uint32)
        pin = np.empty((n1, n2), dtype=np.uint32)
        for i1 in range(n1):
            base = pow(psi, i1 * n2, p)
            base_inv = pow(psi_inv, i1 * n2, p) * n_inv % p
            row = base
            row_inv = base_inv
            for i2 in range(n2):
                ps[i1, i2] = row
                pin[i1, i2] = row_inv
                row = row * psi % p
                row_inv = row_inv * psi_inv % p
        psi_r.append(ps)
        psi_sh_r.append(np.vectorize(lambda t: pr.shoup(int(t), p))(ps)
                        .astype(np.uint32))
        pin_r.append(pin)
        pin_sh_r.append(np.vectorize(lambda t: pr.shoup(int(t), p))(pin)
                        .astype(np.uint32))

        tw = np.empty((n1, n2), dtype=np.uint32)
        twi = np.empty((n1, n2), dtype=np.uint32)
        for k1r in range(n1):
            k1 = _brv(k1r, log_n1)
            wk = pow(w, k1, p)
            wk_inv = pow(w_inv, k1, p)
            cur, cur_inv = 1, 1
            for i2 in range(n2):
                tw[k1r, i2] = cur
                twi[k1r, i2] = cur_inv
                cur = cur * wk % p
                cur_inv = cur_inv * wk_inv % p
        tw_r.append(tw)
        tw_sh_r.append(np.vectorize(lambda t: pr.shoup(int(t), p))(tw)
                       .astype(np.uint32))
        twi_r.append(twi)
        twi_sh_r.append(np.vectorize(lambda t: pr.shoup(int(t), p))(twi)
                        .astype(np.uint32))

    j = lambda rows: jnp.asarray(np.stack(rows))
    return DistNttPlan(
        n=n, n1=n1, n2=n2, primes=tuple(prime_list),
        plan1=plan1, plan2=plan2,
        psi=j(psi_r), psi_sh=j(psi_sh_r),
        psi_inv_n=j(pin_r), psi_inv_n_sh=j(pin_sh_r),
        tw=j(tw_r), tw_sh=j(tw_sh_r),
        tw_inv=j(twi_r), tw_inv_sh=j(twi_sh_r),
        p_col=jnp.asarray(np.asarray(prime_list, np.uint32)[:, None, None]),
    )


# ---------------------------------------------------------------------------
# Per-shard bodies (called inside shard_map; x: (L, N1/D, N2) etc.)
# ---------------------------------------------------------------------------


def _col_ntt(plan: DistNttPlan, x, inverse: bool):
    """Cyclic transform over axis 1 of (L, N1, n2_shard).

    The cyclic kernels require layout (..., L, N_transform) — limb axis
    immediately left of the transform axis — so permute to
    (n2_shard, L, N1) and back.
    """
    l = x.shape[0]
    xt = jnp.transpose(x, (2, 0, 1))
    out = (_cyclic_inv(plan.plan1, xt, l) if inverse
           else _cyclic_fwd(plan.plan1, xt, l))
    return jnp.transpose(out, (1, 2, 0))


def _row_ntt(plan: DistNttPlan, x, inverse: bool):
    """Cyclic transform over axis 2 of (L, n1_shard, N2)."""
    l = x.shape[0]
    xt = jnp.transpose(x, (1, 0, 2))      # (n1_shard, L, N2)
    out = (_cyclic_inv(plan.plan2, xt, l) if inverse
           else _cyclic_fwd(plan.plan2, xt, l))
    return jnp.transpose(out, (1, 0, 2))


def _xla_a2a(x, split_axis, concat_axis, n_dev):
    return jax.lax.all_to_all(x, SP_AXIS, split_axis=split_axis,
                              concat_axis=concat_axis, tiled=True)


def _pallas_a2a(x, split_axis, concat_axis, n_dev):
    from .ici import pallas_all_to_all
    return pallas_all_to_all(x, SP_AXIS, split_axis, concat_axis, n_dev)


def dist_ntt_fwd_shard(plan: DistNttPlan, a2a, n_dev, x, psi, psi_sh,
                       tw, tw_sh):
    """Forward shard body.  x: (L, N1/D, N2) rows-shard; tables sharded
    to match each step's layout (twist: rows-shard; twiddle: cols-shard)."""
    p = plan.p_col
    x = shoup_mul(x, psi, psi_sh, p)                       # twist (local)
    x = a2a(x, 2, 1, n_dev)                                # -> (L,N1,N2/D)
    x = _col_ntt(plan, x, inverse=False)
    x = shoup_mul(x, tw, tw_sh, p)                         # twiddle (local)
    x = a2a(x, 1, 2, n_dev)                                # -> (L,N1/D,N2)
    return _row_ntt(plan, x, inverse=False)


def dist_ntt_inv_shard(plan: DistNttPlan, a2a, n_dev, y, psi_inv_n,
                       psi_inv_n_sh, tw_inv, tw_inv_sh):
    """Inverse shard body (mirror of the forward sequence)."""
    p = plan.p_col
    y = _row_ntt(plan, y, inverse=True)
    y = a2a(y, 2, 1, n_dev)                                # -> (L,N1,N2/D)
    y = shoup_mul(y, tw_inv, tw_inv_sh, p)
    y = _col_ntt(plan, y, inverse=True)
    y = a2a(y, 1, 2, n_dev)                                # -> (L,N1/D,N2)
    return shoup_mul(y, psi_inv_n, psi_inv_n_sh, p)


def make_dist_ntt(plan: DistNttPlan, mesh, exchange: str = "xla"):
    """jitted (fwd, inv) over mesh axis 'sp'.

    Operands are (L, N1, N2) matrices sharded on axis 1 (i1 rows).
    exchange: "xla" (lax.all_to_all collective) or "pallas" (hand-written
    remote-DMA kernel, parallel/ici.py).
    """
    row_spec = jax.sharding.PartitionSpec(None, SP_AXIS, None)
    col_spec = jax.sharding.PartitionSpec(None, None, SP_AXIS)
    shmap = partial(jax.shard_map, mesh=mesh, check_vma=False)
    n_dev = mesh.shape[SP_AXIS]
    a2a = {"xla": _xla_a2a, "pallas": _pallas_a2a}[exchange]

    fwd = shmap(partial(dist_ntt_fwd_shard, plan, a2a, n_dev),
                in_specs=(row_spec, row_spec, row_spec, col_spec, col_spec),
                out_specs=row_spec)
    inv = shmap(partial(dist_ntt_inv_shard, plan, a2a, n_dev),
                in_specs=(row_spec, row_spec, row_spec, col_spec, col_spec),
                out_specs=row_spec)

    def fwd_fn(x):
        return fwd(x, plan.psi, plan.psi_sh, plan.tw, plan.tw_sh)

    def inv_fn(y):
        return inv(y, plan.psi_inv_n, plan.psi_inv_n_sh,
                   plan.tw_inv, plan.tw_inv_sh)

    return jax.jit(fwd_fn), jax.jit(inv_fn)
