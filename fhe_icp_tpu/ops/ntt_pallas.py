"""Fused single-pass Pallas TPU kernel for the negacyclic NTT/INTT.

The jnp NTT (ops/ntt.py) materializes intermediates between butterfly
stages, so XLA streams the batch through HBM several times per
transform.  This kernel keeps a block of polynomials resident in VMEM
for ALL log2(N) stages — one HBM read and one write per transform — and
restructures the stages so every butterfly is a SUBLANE operation:

* A polynomial is viewed as an (NR, 128) tile, NR = N/128, coefficient
  i at (i // 128, i % 128).  The first log2(NR) decimation-in-frequency
  stages have stride m >= 128: pairs live in different ROWS, so each
  stage is a free leading-dim reshape + vectorized butterfly.
* One in-VMEM transpose (TR*NR, 128) -> (128, TR*NR) then moves the
  remaining 7 stages (stride m < 128, pairs within a row) onto the
  SUBLANE axis, fully vectorized across TR*NR lanes.
* The psi twist (negacyclic wrap) fuses into the same kernel.

Stage order, twiddle indexing, and modular arithmetic (Shoup multiply,
lazy-free add/sub) are IDENTICAL to ops/ntt.py — the kernel is bit-exact
against it (tests/test_ntt_pallas.py) and against the big-int oracle.

The reference has no NTT of its own (polynomial multiplication lives in
Concrete's native runtime — /root/reference/requirements.txt:5-7); this
kernel is the hand-written path of its TPU-native replacement
(SURVEY.md §7.2 step 3, BASELINE.json "NTT limb-mults/s").

Measured reality (v5e, pairwise-4096, 512x3 limb-NTTs, chained-readback
timing): forward 0.697 ms/step (TR=16) vs 0.705 ms for the round-3
radix-2 jnp path.  The round-4 diagnosis revised the earlier "VPU
multiply bound" reading: the JNP path was HBM-bound (~11 memory passes)
while THIS kernel — despite touching HBM only twice — is bound by
Mosaic's lowering of the in-VMEM transposes and small-stride sublane
butterflies, and the two bottlenecks coincidentally tied.  ops/ntt.py
now fuses stage triples into radix-8 passes and remains the default;
benchmarks/ntt_roofline.json (round 5) RETIRES this kernel with the
full accounting: the XLA path measures ~1.2x of its pass-count x
HBM-spec floor while this kernel, despite touching HBM once, measures
~1.8x the XLA path — Mosaic's in-VMEM transpose + sublane butterfly
lowering costs more than the passes it saves.  Kept as the validated
bit-exact Pallas reference implementation only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .modmath import add_mod, shoup_mul, sub_mod
from .ntt import NttPlan

LANE = 128
_TR = 16                      # polynomial rows per kernel instance


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


_TABLE_CACHE: dict = {}


def _packed_tables(plan: NttPlan):
    """Host-packed per-limb twiddle tables for the two kernel phases.

    Returns dict of numpy arrays:
      ph1_tw/ph1_sh: (L, N - min(N, 128))  stages with m >= 128, concat
      ph2_tw/ph2_sh: (L, 128)              stages with m < 128 (127 + pad)
      (same for inverse: i1_*, i2_* with loop-execution-order packing)
      psi_tw/psi_sh, ipsi_tw/ipsi_sh: (L, N)
    """
    cache_key = (plan.n, plan.primes)
    if cache_key in _TABLE_CACHE:
        return _TABLE_CACHE[cache_key]
    n, log_n = plan.n, plan.log_n
    nr = max(1, n // LANE)
    k1 = max(0, log_n - 7)          # number of phase-1 (row) stages

    def cat(tabs, idxs):
        if not idxs:
            return np.zeros((tabs[0].shape[0], 0), dtype=np.uint32)
        return np.concatenate(
            [np.asarray(tabs[s]).reshape(tabs[s].shape[0], -1) for s in idxs],
            axis=1)

    fw1 = list(range(k1))                    # m = N/2 .. 128
    fw2 = list(range(k1, log_n))             # m = 64 .. 1
    inv2 = list(range(log_n - 1, k1 - 1, -1))   # m = 1 .. 64
    inv1 = list(range(k1 - 1, -1, -1))          # m = 128 .. N/2

    def pad128(a):
        pad = (-a.shape[1]) % LANE
        if pad:
            a = np.concatenate(
                [a, np.zeros((a.shape[0], pad), dtype=np.uint32)], axis=1)
        return a

    out = {
        "ph1_tw": cat(plan.fw_tw, fw1), "ph1_sh": cat(plan.fw_sh, fw1),
        "ph2_tw": pad128(cat(plan.fw_tw, fw2)),
        "ph2_sh": pad128(cat(plan.fw_sh, fw2)),
        "i2_tw": pad128(cat(plan.inv_tw, inv2)),
        "i2_sh": pad128(cat(plan.inv_sh, inv2)),
        "i1_tw": cat(plan.inv_tw, inv1), "i1_sh": cat(plan.inv_sh, inv1),
        "psi_tw": np.asarray(plan.psi), "psi_sh": np.asarray(plan.psi_sh),
        "ipsi_tw": np.asarray(plan.psi_inv_n),
        "ipsi_sh": np.asarray(plan.psi_inv_n_sh),
        "p": np.asarray(plan.p).reshape(-1, 1),
        "k1": k1, "nr": nr,
    }
    _TABLE_CACHE[cache_key] = out
    return out


def _phase1_fwd(x, tw_ref, sh_ref, p, tr, nr, n, k1):
    """Row stages m = N/2 .. 128 on x: (TR, NR, 128)."""
    off = 0
    for s in range(k1):
        b, m_r = 1 << s, nr >> (s + 1)
        m = m_r * LANE
        xx = x.reshape(tr, b, 2, m_r, LANE)
        u, v = xx[:, :, 0], xx[:, :, 1]
        tw = tw_ref[0, 0, off: off + m].reshape(m_r, LANE)
        sh = sh_ref[0, 0, off: off + m].reshape(m_r, LANE)
        hi = shoup_mul(sub_mod(u, v, p), tw, sh, p)
        x = jnp.stack([add_mod(u, v, p), hi], axis=2).reshape(tr, nr, LANE)
        off += m
    return x


def _phase2_fwd(y, tw_ref, sh_ref, p, lanes, k2_hi):
    """Sublane stages m = 2^{k2_hi-1} .. 1 on y: (<=128, lanes)."""
    rows = y.shape[0]
    off = 0
    for s in range(k2_hi):
        m = 1 << (k2_hi - 1 - s)
        b = rows // (2 * m)
        yy = y.reshape(b, 2, m, lanes)
        u, v = yy[:, 0], yy[:, 1]
        tw = tw_ref[0, 0, off: off + m].reshape(1, m, 1)
        sh = sh_ref[0, 0, off: off + m].reshape(1, m, 1)
        hi = shoup_mul(sub_mod(u, v, p), tw, sh, p)
        y = jnp.stack([add_mod(u, v, p), hi], axis=1).reshape(rows, lanes)
        off += m
    return y


def _fwd_kernel(p_ref, psit_ref, psis_ref, t1_ref, s1_ref, t2_ref, s2_ref,
                x_ref, o_ref, *, tr, nr, n, k1):
    p = p_ref[pl.program_id(1), 0]
    x = shoup_mul(x_ref[0], psit_ref[0, 0], psis_ref[0, 0], p)  # twist (TR, N)
    x = x.reshape(tr, nr, LANE)
    x = _phase1_fwd(x, t1_ref, s1_ref, p, tr, nr, n, k1)
    rows = min(LANE, n)
    y = jnp.transpose(x.reshape(tr * nr, LANE))              # (128, TR*NR)
    y = _phase2_fwd(y, t2_ref, s2_ref, p, tr * nr, min(7, n.bit_length() - 1))
    x = jnp.transpose(y).reshape(tr, n)
    o_ref[0] = x


def _inv_kernel(p_ref, psit_ref, psis_ref, t1_ref, s1_ref, t2_ref, s2_ref,
                x_ref, o_ref, *, tr, nr, n, k1):
    p = p_ref[pl.program_id(1), 0]
    log_n = n.bit_length() - 1
    k2 = min(7, log_n)
    x = x_ref[0]                                             # (TR, N)
    # Phase A: sublane stages m = 1 .. 64 on the transposed view.
    y = jnp.transpose(x.reshape(tr * nr, LANE))              # (128, TR*NR)
    off = 0
    lanes = tr * nr
    for s in range(k2):                                      # m = 1, 2, .., 64
        m = 1 << s
        b = LANE // (2 * m)
        yy = y.reshape(b, 2, m, lanes)
        u = yy[:, 0]
        t = shoup_mul(yy[:, 1], t2_ref[0, 0, off: off + m].reshape(1, m, 1),
                      s2_ref[0, 0, off: off + m].reshape(1, m, 1), p)
        y = jnp.stack([add_mod(u, t, p), sub_mod(u, t, p)],
                      axis=1).reshape(LANE, lanes)
        off += m
    x = jnp.transpose(y).reshape(tr, nr, LANE)
    # Phase B: row stages m = 128 .. N/2.
    off = 0
    for i in range(k1):                                      # s = k1-1-i
        s = k1 - 1 - i
        b, m_r = 1 << s, nr >> (s + 1)
        m = m_r * LANE
        xx = x.reshape(tr, b, 2, m_r, LANE)
        u = xx[:, :, 0]
        t = shoup_mul(xx[:, :, 1], t1_ref[0, 0, off: off + m].reshape(m_r, LANE),
                      s1_ref[0, 0, off: off + m].reshape(m_r, LANE), p)
        x = jnp.stack([add_mod(u, t, p), sub_mod(u, t, p)],
                      axis=2).reshape(tr, nr, LANE)
        off += m
    x = x.reshape(tr, n)
    o_ref[0] = shoup_mul(x, psit_ref[0, 0], psis_ref[0, 0], p)  # un-twist
    return


def _call(plan: NttPlan, x, forward: bool):
    """x: (..., L, N) uint32 -> same shape, bit-exact vs ops/ntt.py."""
    tabs = _packed_tables(plan)
    n, nr, k1 = plan.n, tabs["nr"], tabs["k1"]
    l = x.shape[-2]
    assert x.shape[-1] == n
    lead = x.shape[:-2]
    b = int(np.prod(lead)) if lead else 1

    # (B, L, N) -> (L, B, N): limb-major so kernel blocks are (1, TR, N)
    # with well-tiled (TR, N) last dims.
    xt = jnp.moveaxis(x.reshape(b, l, n), 0, 1)
    tr = _TR
    pad = (-b) % tr
    if pad:
        xt = jnp.concatenate(
            [xt, jnp.zeros((l, pad, n), dtype=xt.dtype)], axis=1)
    bp = b + pad

    if forward:
        kern = functools.partial(_fwd_kernel, tr=tr, nr=nr, n=n, k1=k1)
        names = ("psi_tw", "psi_sh", "ph1_tw", "ph1_sh", "ph2_tw", "ph2_sh")
    else:
        kern = functools.partial(_inv_kernel, tr=tr, nr=nr, n=n, k1=k1)
        names = ("ipsi_tw", "ipsi_sh", "i1_tw", "i1_sh", "i2_tw", "i2_sh")

    # Tables get a singleton middle axis so every block's last two dims
    # are (1, W) with W a multiple of 128 — the TPU lowering constraint.
    tables = [jnp.asarray(tabs[nm][:l])[:, None, :] for nm in names]
    p_col = jnp.asarray(tabs["p"][:l])

    limb_row = lambda i, j: (j, 0, 0)
    grid = (bp // tr, l)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # p: whole (L, 1) array
        ] + [
            pl.BlockSpec((1, 1, t.shape[2]), limb_row,
                         memory_space=pltpu.VMEM) for t in tables
        ] + [
            pl.BlockSpec((1, tr, n), lambda i, j: (j, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tr, n), lambda i, j: (j, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((l, bp, n), jnp.uint32),
        interpret=_interpret(),
    )(p_col, *tables, xt)

    out = out[:, :b] if pad else out
    return jnp.moveaxis(out, 0, 1).reshape(lead + (l, n))


def ntt_fwd_pallas(plan: NttPlan, x):
    """Coefficient domain (natural) -> NTT domain (bit-reversed); fused."""
    return _call(plan, x, forward=True)


def ntt_inv_pallas(plan: NttPlan, x):
    """NTT domain (bit-reversed) -> coefficient domain (natural); fused."""
    return _call(plan, x, forward=False)
