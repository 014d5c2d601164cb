"""Negacyclic NTT/INTT over RNS limbs, vectorized for TPU.

Algorithm
---------
Negacyclic convolution (mod X^N + 1) is computed as: twist by powers of
psi (a 2N-th root of unity), then a *cyclic* NTT.  The cyclic transform
is a reshape-based butterfly pair:

* forward  = decimation-in-frequency (Gentleman-Sande), natural input ->
  bit-reversed output;
* inverse  = decimation-in-time (Cooley-Tukey), bit-reversed input ->
  natural output.

Pointwise products happen in bit-reversed order, so no bit-reversal
permutation is ever materialized.  Every pass is a contiguous reshape
plus vectorized butterflies — no gathers, XLA-friendly, and the same
code is bit-exact on CPU and TPU.  Consecutive stages are fused into
RADIX-8 passes (three butterfly levels per HBM round trip; radix-4/2
tails on remainders): at production batch sizes the transform is
HBM-bandwidth-bound, not VPU-bound, so the pass count is the dominant
lever — benchmarks/ntt_roofline.json measures the result AT ~1.2x of
its pass-count x HBM-spec floor (N=4096 fwd 0.25 ms/1024 limb
transforms, 135 GB/s; radix-4 was 0.33, radix-2 ~0.7).

Data layout: polynomials are `(..., L, N)` uint32, one row per RNS limb;
all twiddle tables carry a leading L axis.  Per-limb twiddle products
use Shoup multiplication (see modmath.shoup_mul).

The reference has no NTT of its own — polynomial multiplication lives in
Concrete's native runtime (/root/reference/requirements.txt:7).  This
module is the TPU-native replacement.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

from . import primes as pr
from .modmath import add_mod, shoup_mul, sub_mod


@dataclass(frozen=True)
class NttPlan:
    """Precomputed tables for a fixed (N, primes) pair.

    All arrays are uint32.  Twiddles per forward/inverse stage `s` have
    shape (L, 1, N >> (s+1)) so they broadcast against data reshaped to
    (..., L, B, 2, m).
    """

    n: int
    primes: Tuple[int, ...]
    p: jnp.ndarray                      # (L, 1)
    fw_tw: Tuple[jnp.ndarray, ...]      # per stage (L, 1, m)
    fw_sh: Tuple[jnp.ndarray, ...]
    inv_tw: Tuple[jnp.ndarray, ...]
    inv_sh: Tuple[jnp.ndarray, ...]
    psi: jnp.ndarray                    # (L, N) twist psi^i
    psi_sh: jnp.ndarray
    psi_inv_n: jnp.ndarray              # (L, N) psi^{-i} * N^{-1}
    psi_inv_n_sh: jnp.ndarray

    @property
    def log_n(self) -> int:
        return self.n.bit_length() - 1


def _u32(a) -> np.ndarray:
    return np.asarray(a, dtype=np.uint32)


def build_plan(n: int, prime_list: Tuple[int, ...]) -> NttPlan:
    """Build twiddle tables host-side with exact big-int arithmetic."""
    assert n & (n - 1) == 0, "N must be a power of two"
    log_n = n.bit_length() - 1
    fw_tw: List[np.ndarray] = [[] for _ in range(log_n)]
    fw_sh: List[np.ndarray] = [[] for _ in range(log_n)]
    inv_tw: List[np.ndarray] = [[] for _ in range(log_n)]
    inv_sh: List[np.ndarray] = [[] for _ in range(log_n)]
    psi_rows, psi_sh_rows, psi_inv_rows, psi_inv_sh_rows = [], [], [], []

    for p in prime_list:
        psi = pr.root_of_unity(p, 2 * n)       # psi^n = -1 mod p
        w = psi * psi % p                      # n-th root for the cyclic part
        w_inv = pow(w, p - 2, p)
        n_inv = pow(n, p - 2, p)
        psi_inv = pow(psi, p - 2, p)

        for s in range(log_n):
            m = n >> (s + 1)
            step = 1 << s
            tws = [pow(w, i * step, p) for i in range(m)]
            itws = [pow(w_inv, i * step, p) for i in range(m)]
            fw_tw[s].append(_u32(tws))
            fw_sh[s].append(_u32([pr.shoup(t, p) for t in tws]))
            inv_tw[s].append(_u32(itws))
            inv_sh[s].append(_u32([pr.shoup(t, p) for t in itws]))

        psi_pow = [pow(psi, i, p) for i in range(n)]
        psi_inv_n = [pow(psi_inv, i, p) * n_inv % p for i in range(n)]
        psi_rows.append(_u32(psi_pow))
        psi_sh_rows.append(_u32([pr.shoup(t, p) for t in psi_pow]))
        psi_inv_rows.append(_u32(psi_inv_n))
        psi_inv_sh_rows.append(_u32([pr.shoup(t, p) for t in psi_inv_n]))

    def stack_stage(rows_per_stage):
        return tuple(
            jnp.asarray(np.stack(rows)[:, None, :]) for rows in rows_per_stage
        )

    return NttPlan(
        n=n,
        primes=tuple(prime_list),
        p=jnp.asarray(_u32(prime_list)[:, None]),
        fw_tw=stack_stage(fw_tw),
        fw_sh=stack_stage(fw_sh),
        inv_tw=stack_stage(inv_tw),
        inv_sh=stack_stage(inv_sh),
        psi=jnp.asarray(np.stack(psi_rows)),
        psi_sh=jnp.asarray(np.stack(psi_sh_rows)),
        psi_inv_n=jnp.asarray(np.stack(psi_inv_rows)),
        psi_inv_n_sh=jnp.asarray(np.stack(psi_inv_sh_rows)),
    )


def _radix8() -> bool:
    """Radix-8 merging: ON for TPU (measured faster at every ring size
    in same-day on-chip comparisons — N=4096 fwd 0.33 -> 0.25 ms,
    N=16384 fwd 3.5 -> 2.1 ms), OFF on CPU backends (XLA:CPU
    vectorizes the 8-slice fused butterflies ~2.8x SLOWER than the
    radix-4 pairs — clean-run config 6: fwd 137 vs 48 ms, spread 4%).
    Override with FHE_NTT_RADIX8=0/1.  Both orderings are exact and
    bit-identical (tests/test_ntt.py::test_radix8_radix4_bitexact)."""
    env = os.environ.get("FHE_NTT_RADIX8")
    if env is not None:
        return env == "1"
    import jax
    return jax.default_backend() == "tpu"


def _limbs(plan: NttPlan, x) -> int:
    l = x.shape[-2]
    assert l <= plan.p.shape[0], "more limbs than plan primes"
    return l


def _cyclic_fwd(plan: NttPlan, x, l: int):
    """DIF stages, radix-8/4 merged: 3 (then 2) butterfly stages per
    HBM pass.

    The transform is HBM-bound on TPU — each merged group is one full
    read+write of the batch (XLA does not fuse across the inter-stage
    reshapes), and benchmarks/ntt_roofline.py measures the radix-4 path
    AT its pass-count x HBM-spec floor — so the remaining lever is the
    pass count itself.  Merging three consecutive stages into one
    elementwise pass performs the identical multiplies in the identical
    order (bit-exact, same oracle tests): log2(N)=12 runs as exactly 4
    radix-8 passes; remainders fall back to one radix-4 and/or one
    radix-2 tail.
    """
    lead = x.shape[:-1]
    n = plan.n
    p = plan.p[:l, :, None]
    log_n = plan.log_n
    s = 0
    use_r8 = _radix8()
    while s + 2 < log_n and use_r8:
        m = n >> (s + 3)                      # third stage's half-length
        b = 1 << s
        x = x.reshape(lead + (b, 2, 2, 2, m))
        e = [[[x[..., i, j, k, :] for k in range(2)] for j in range(2)]
             for i in range(2)]
        t1 = plan.fw_tw[s][:l].reshape(l, 1, 2, 2, m)
        h1 = plan.fw_sh[s][:l].reshape(l, 1, 2, 2, m)
        t2 = plan.fw_tw[s + 1][:l].reshape(l, 1, 2, m)
        h2 = plan.fw_sh[s + 1][:l].reshape(l, 1, 2, m)
        t3, h3 = plan.fw_tw[s + 2][:l], plan.fw_sh[s + 2][:l]
        # Stage s: pairs (e[0][j][k], e[1][j][k]) at stride 4m.
        A = [[add_mod(e[0][j][k], e[1][j][k], p) for k in range(2)]
             for j in range(2)]
        B = [[shoup_mul(sub_mod(e[0][j][k], e[1][j][k], p),
                        t1[:, :, j, k], h1[:, :, j, k], p)
              for k in range(2)] for j in range(2)]
        # Stage s+1: within each 4m block, pairs over j at stride 2m.
        def stage2(blk):
            lo = [add_mod(blk[0][k], blk[1][k], p) for k in range(2)]
            hi = [shoup_mul(sub_mod(blk[0][k], blk[1][k], p),
                            t2[:, :, k], h2[:, :, k], p) for k in range(2)]
            return lo, hi
        P, Q = stage2(A)
        R, S = stage2(B)
        # Stage s+2: within each 2m block, pairs over k at stride m.
        def stage3(blk):
            return (add_mod(blk[0], blk[1], p),
                    shoup_mul(sub_mod(blk[0], blk[1], p), t3, h3, p))
        out = [[stage3(P), stage3(Q)], [stage3(R), stage3(S)]]
        x = jnp.stack([
            jnp.stack([jnp.stack(out[i][j], axis=-2) for j in range(2)],
                      axis=-3)
            for i in range(2)], axis=-4)
        s += 3
    while s + 1 < log_n:
        m = n >> (s + 2)                      # second stage's half-length
        b = 1 << s
        x = x.reshape(lead + (b, 2, 2, m))
        # Stage s: pairs (axis -3) at stride 2m, twiddles len 2m split in
        # halves; stage s+1: pairs within each result (axis -2), len m.
        a, bb = x[..., 0, 0, :], x[..., 0, 1, :]
        c, d = x[..., 1, 0, :], x[..., 1, 1, :]
        t1 = plan.fw_tw[s][:l].reshape(l, 1, 2, m)
        h1 = plan.fw_sh[s][:l].reshape(l, 1, 2, m)
        t2, h2 = plan.fw_tw[s + 1][:l], plan.fw_sh[s + 1][:l]
        y0a, y0b = add_mod(a, c, p), add_mod(bb, d, p)
        y1a = shoup_mul(sub_mod(a, c, p), t1[:, :, 0], h1[:, :, 0], p)
        y1b = shoup_mul(sub_mod(bb, d, p), t1[:, :, 1], h1[:, :, 1], p)
        x = jnp.stack([
            jnp.stack([add_mod(y0a, y0b, p),
                       shoup_mul(sub_mod(y0a, y0b, p), t2, h2, p)], axis=-2),
            jnp.stack([add_mod(y1a, y1b, p),
                       shoup_mul(sub_mod(y1a, y1b, p), t2, h2, p)], axis=-2),
        ], axis=-3)
        s += 2
    if s < log_n:                             # radix-2 tail (odd log_n)
        m = n >> (s + 1)
        b = 1 << s
        x = x.reshape(lead + (b, 2, m))
        u, v = x[..., 0, :], x[..., 1, :]
        hi = shoup_mul(sub_mod(u, v, p), plan.fw_tw[s][:l], plan.fw_sh[s][:l], p)
        x = jnp.stack([add_mod(u, v, p), hi], axis=-2)
    return x.reshape(lead + (n,))


def _cyclic_inv(plan: NttPlan, x, l: int):
    """DIT stages, radix-8/4 merged (see _cyclic_fwd): stages run
    s = log_n-1 .. 0 descending; a radix-2 or radix-4 head consumes
    log2(N) mod 3 stages, then radix-8 groups (s, s-1, s-2) follow —
    identical multiplies in identical order as the radix-2 loop."""
    lead = x.shape[:-1]
    n = plan.n
    p = plan.p[:l, :, None]
    s = plan.log_n - 1
    use_r8 = _radix8()
    rem = plan.log_n % 3 if use_r8 else plan.log_n % 2
    if rem == 1:                              # radix-2 head
        m = n >> (s + 1)
        b = 1 << s
        x = x.reshape(lead + (b, 2, m))
        t = shoup_mul(x[..., 1, :], plan.inv_tw[s][:l], plan.inv_sh[s][:l], p)
        x = jnp.stack([add_mod(x[..., 0, :], t, p), sub_mod(x[..., 0, :], t, p)],
                      axis=-2)
        s -= 1
    elif rem == 2:                            # radix-4 head (s, s-1)
        m = n >> (s + 1)
        b = 1 << (s - 1)
        x = x.reshape(lead + (b, 2, 2, m))
        u1, v1 = x[..., 0, 0, :], x[..., 0, 1, :]
        u2, v2 = x[..., 1, 0, :], x[..., 1, 1, :]
        t1, h1 = plan.inv_tw[s][:l], plan.inv_sh[s][:l]
        t2 = plan.inv_tw[s - 1][:l].reshape(l, 1, 2, m)
        h2 = plan.inv_sh[s - 1][:l].reshape(l, 1, 2, m)
        w1 = shoup_mul(v1, t1, h1, p)
        w2 = shoup_mul(v2, t1, h1, p)
        y1a, y1b = add_mod(u1, w1, p), sub_mod(u1, w1, p)
        y2a, y2b = add_mod(u2, w2, p), sub_mod(u2, w2, p)
        z2a = shoup_mul(y2a, t2[:, :, 0], h2[:, :, 0], p)
        z2b = shoup_mul(y2b, t2[:, :, 1], h2[:, :, 1], p)
        x = jnp.stack([
            jnp.stack([add_mod(y1a, z2a, p), add_mod(y1b, z2b, p)], axis=-2),
            jnp.stack([sub_mod(y1a, z2a, p), sub_mod(y1b, z2b, p)], axis=-2),
        ], axis=-3)
        s -= 2
    while s >= 2 and use_r8:
        # Stages (s fine, s-1 middle, s-2 coarse) in one pass.
        m = n >> (s + 1)
        b = 1 << (s - 2)
        x = x.reshape(lead + (b, 2, 2, 2, m))
        e = [[[x[..., i, j, k, :] for k in range(2)] for j in range(2)]
             for i in range(2)]
        t1, h1 = plan.inv_tw[s][:l], plan.inv_sh[s][:l]
        t2 = plan.inv_tw[s - 1][:l].reshape(l, 1, 2, m)
        h2 = plan.inv_sh[s - 1][:l].reshape(l, 1, 2, m)
        t3 = plan.inv_tw[s - 2][:l].reshape(l, 1, 2, 2, m)
        h3 = plan.inv_sh[s - 2][:l].reshape(l, 1, 2, 2, m)
        # Stage s: pairs over k at stride m.
        y = [[None] * 2 for _ in range(2)]
        for i in range(2):
            for j in range(2):
                w = shoup_mul(e[i][j][1], t1, h1, p)
                y[i][j] = [add_mod(e[i][j][0], w, p),
                           sub_mod(e[i][j][0], w, p)]
        # Stage s-1: pairs over j at stride 2m, twiddle t2[k].
        z = [[[None] * 2 for _ in range(2)] for _ in range(2)]
        for i in range(2):
            for k in range(2):
                w = shoup_mul(y[i][1][k], t2[:, :, k], h2[:, :, k], p)
                z[i][0][k] = add_mod(y[i][0][k], w, p)
                z[i][1][k] = sub_mod(y[i][0][k], w, p)
        # Stage s-2: pairs over i at stride 4m, twiddle t3[j, k].
        out = [[[None] * 2 for _ in range(2)] for _ in range(2)]
        for j in range(2):
            for k in range(2):
                w = shoup_mul(z[1][j][k], t3[:, :, j, k], h3[:, :, j, k], p)
                out[0][j][k] = add_mod(z[0][j][k], w, p)
                out[1][j][k] = sub_mod(z[0][j][k], w, p)
        x = jnp.stack([
            jnp.stack([jnp.stack(out[i][j], axis=-2) for j in range(2)],
                      axis=-3)
            for i in range(2)], axis=-4)
        s -= 3
    while s >= 1:                             # radix-4 (big rings)
        m = n >> (s + 1)
        b = 1 << (s - 1)
        x = x.reshape(lead + (b, 2, 2, m))
        u1, v1 = x[..., 0, 0, :], x[..., 0, 1, :]
        u2, v2 = x[..., 1, 0, :], x[..., 1, 1, :]
        t1, h1 = plan.inv_tw[s][:l], plan.inv_sh[s][:l]
        t2 = plan.inv_tw[s - 1][:l].reshape(l, 1, 2, m)
        h2 = plan.inv_sh[s - 1][:l].reshape(l, 1, 2, m)
        w1 = shoup_mul(v1, t1, h1, p)
        w2 = shoup_mul(v2, t1, h1, p)
        y1a, y1b = add_mod(u1, w1, p), sub_mod(u1, w1, p)
        y2a, y2b = add_mod(u2, w2, p), sub_mod(u2, w2, p)
        z2a = shoup_mul(y2a, t2[:, :, 0], h2[:, :, 0], p)
        z2b = shoup_mul(y2b, t2[:, :, 1], h2[:, :, 1], p)
        x = jnp.stack([
            jnp.stack([add_mod(y1a, z2a, p), add_mod(y1b, z2b, p)], axis=-2),
            jnp.stack([sub_mod(y1a, z2a, p), sub_mod(y1b, z2b, p)], axis=-2),
        ], axis=-3)
        s -= 2
    return x.reshape(lead + (n,))


def _flatten_lead(x):
    """Collapse leading batch dims to one: XLA's TPU backend runs the
    per-stage butterfly fusions ~4.5x slower on rank>3 arrays (measured:
    (32,32,3,4096) INTT 5.9 ms vs 1.3 ms reshaped to (1024,3,4096))."""
    lead = x.shape[:-2]
    if len(lead) <= 1:
        return x, None
    return x.reshape((-1,) + x.shape[-2:]), lead


# Per-chunk byte budget for large batches.  Measured on a v5e (N=4096):
# a (512, 2, N) = 17 MB transform runs at 0.082 us/limb-transform —
# XLA keeps ALL butterfly stages VMEM-resident — while (1024, 2, N) =
# 34 MB drops to 0.40 and (2048, 3, N) = 100 MB to 0.94: past the VMEM
# budget every stage becomes an HBM round trip.  Chunking keeps each
# chunk's whole transform on-chip; the only HBM traffic is one read +
# one write of the batch.
_CHUNK_BYTES = 16 << 20
# ...but the effect needs MANY rows per chunk to amortize the chunk
# boundary: at N=16384 x 12 limbs a 16 MB chunk holds only 21 rows and
# chunking measures 2-3x SLOWER than the plain transform (6.6/11.6 ms
# vs 3.5/3.3 ms fwd/inv on the config-4 batch).  Only chunk when a
# chunk still holds a substantial row count.
_MIN_CHUNK_ROWS = 128


def _map_chunked(fn, x):
    """Apply fn over VMEM-sized row chunks of x: (B, l, N).

    Chunks are UNROLLED static slices, not lax.map: a sequential
    while-loop body serializes chunk I/O with compute (measured 1.65
    us/limb-transform vs 0.9 unchunked), while unrolled independent
    subgraphs let XLA overlap one chunk's HBM traffic with another's
    butterflies.
    """
    if x.ndim < 3:
        return fn(x)
    b = x.shape[0]
    row_bytes = x.shape[-2] * x.shape[-1] * 4
    rows = max(1, _CHUNK_BYTES // row_bytes)
    if b <= rows or rows < _MIN_CHUNK_ROWS:
        return fn(x)
    outs = [fn(x[i: i + rows]) for i in range(0, b, rows)]
    return jnp.concatenate(outs, axis=0)


def ntt_fwd(plan: NttPlan, x):
    """Coefficient domain (natural order) -> NTT domain (bit-reversed).

    x: (..., L, N) uint32, residues in [0, p_l).
    """
    x, lead = _flatten_lead(x)
    l = _limbs(plan, x)
    p = plan.p[:l]

    def run(xx):
        twisted = shoup_mul(xx, plan.psi[:l], plan.psi_sh[:l], p)
        return _cyclic_fwd(plan, twisted, l)

    out = _map_chunked(run, x)
    return out if lead is None else out.reshape(lead + out.shape[-2:])


def ntt_inv(plan: NttPlan, x):
    """NTT domain (bit-reversed) -> coefficient domain (natural order)."""
    x, lead = _flatten_lead(x)
    l = _limbs(plan, x)
    p = plan.p[:l]

    def run(xx):
        raw = _cyclic_inv(plan, xx, l)
        return shoup_mul(raw, plan.psi_inv_n[:l], plan.psi_inv_n_sh[:l], p)

    out = _map_chunked(run, x)
    return out if lead is None else out.reshape(lead + out.shape[-2:])
