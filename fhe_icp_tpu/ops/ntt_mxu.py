"""Experimental four-step NTT with int8 MXU matmul sub-transforms.

The round-3 verdict prescribed measuring the one road past the VPU
u32-multiply cost of the butterfly NTT: a four-step (Bailey)
decomposition N = N1 x N2 whose size-N1 and size-N2 sub-transforms are
dense DFT-matrix multiplies, evaluated EXACTLY on the MXU by splitting
both operands into balanced base-256 int8 digits (the ops/fastdot.py
machinery): a partial sum over a length-N1 contraction is bounded by
N1 * 127^2 < 2^31, so the int8 x int8 -> int32 matmul is exact, and the
16 digit-pair partials fold back mod p with a bucket-combine that
stays in int32 (see _fold_buckets).

Math (cyclic DFT, per limb prime p, w = primitive N-th root):
  j = N2*j1 + j2,  k = k1 + N1*k2
  X[k] = sum_{j2} w^{j2*k1} * [ sum_{j1} (w^{N2})^{j1*k1} x[N2*j1+j2] ]
                   * (w^{N1})^{j2*k2}
Step 1: A = W1 @ M        (M[j1, j2] = x[N2*j1 + j2]; W1 N1 x N1 DFT)
Step 2: B = A .* T        (T[k1, j2] = w^{k1*j2} twiddles)
Step 3: C = W2T @ B^T-ish (N2-point DFT over j2)
Output: C[k2, k1] = X[k1 + N1*k2] -> natural-order reshape.

Negacyclic: twist by psi^j first (same as ops/ntt.py).  Output is in
NATURAL order (ops/ntt.py is bit-reversed); the two conventions are
relabelings of NTT-domain algebra — this module exists for the measured
comparison, not as a drop-in (see benchmarks config 6).

MEASURED CONCLUSION (v5e, see config 6 "mxu_fourstep" fields): the MXU
happily absorbs the matmul FLOPs, but each output coefficient still
needs ~2x the VPU modular-fold work (4 Barrett + 3 Montgomery per
sub-transform, twice) of the butterfly path's ~7 Shoup multiplies —
and the butterfly path's real bottleneck at production shapes is VMEM
residency (ops/ntt._map_chunked), not multiplies.  The four-step loses;
kept as a validated exact alternative and for the record.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import primes as pr
from .context import CryptoContext
from .fastdot import N_DIGITS, balanced_digits, center_residues
from .modmath import U32, add_mod, barrett_reduce, mont_mul, neg_mod, \
    shoup_mul
from .ntt import NttPlan

_TAB_CACHE: dict = {}


def _tables(plan: NttPlan, l: int, n1: int):
    """Per-limb four-step constants (numpy, cached).

    Returns dict with int8 digit planes of W1 (N1-DFT) and W2T (N2-DFT,
    transposed), Shoup twiddle/twist tables, and Montgomery 2^{16m}
    fold constants.
    """
    n = plan.n
    n2 = n // n1
    key = (plan.primes[:l], n, n1)
    hit = _TAB_CACHE.get(key)
    if hit is not None:
        return hit
    w1d = np.empty((l, N_DIGITS, n1, n1), dtype=np.int8)
    w2d = np.empty((l, N_DIGITS, n2, n2), dtype=np.int8)
    tw = np.empty((l, n1, n2), dtype=np.uint32)
    tw_sh = np.empty_like(tw)
    psi_t = np.empty((l, n), dtype=np.uint32)
    psi_sh = np.empty_like(psi_t)
    fold_c = np.empty((l, 2 * N_DIGITS - 1), dtype=np.uint32)  # mont(2^{8s})

    def digits_of(mat, p):
        c = np.where(mat > p // 2, mat.astype(np.int64) - p,
                     mat.astype(np.int64))
        out = []
        for _ in range(N_DIGITS):
            d = ((c + 128) % 256) - 128
            out.append(d.astype(np.int8))
            c = (c - d) >> 8
        return np.stack(out)

    for li, p in enumerate(plan.primes[:l]):
        psi = pr.root_of_unity(p, 2 * n)
        w = psi * psi % p
        j = np.arange(n, dtype=object)
        psi_row = np.array([pow(psi, int(e), p) for e in range(n)],
                           dtype=np.uint64)
        psi_t[li] = psi_row.astype(np.uint32)
        psi_sh[li] = np.array([pr.shoup(int(v), p) for v in psi_row],
                              dtype=np.uint32)
        wn2 = pow(w, n2, p)
        wn1 = pow(w, n1, p)
        idx1 = np.arange(n1)
        idx2 = np.arange(n2)
        w1 = np.array([[pow(wn2, int(a * b) % (n // n2), p)
                        for b in idx1] for a in idx1], dtype=np.uint64)
        w2 = np.array([[pow(wn1, int(a * b) % (n // n1), p)
                        for b in idx2] for a in idx2], dtype=np.uint64)
        w1d[li] = digits_of(w1, p)                    # [k1, j1]
        w2d[li] = digits_of(w2.T, p)                  # transposed: [k2, j2]
        t = np.array([[pow(w, int(a * b) % n, p) for b in idx2]
                      for a in idx1], dtype=np.uint64)
        tw[li] = t.astype(np.uint32)
        tw_sh[li] = np.array(
            [[pr.shoup(int(v), p) for v in row] for row in t],
            dtype=np.uint32)
        for s in range(2 * N_DIGITS - 1):
            fold_c[li, s] = (1 << (8 * s)) * (1 << 32) % p
    out = {
        "w1_dig": w1d.reshape(l, N_DIGITS * n1, n1),
        "w2t_dig": w2d.reshape(l, N_DIGITS * n2, n2),
        "tw": tw, "tw_sh": tw_sh,
        "psi": psi_t, "psi_sh": psi_sh,
        "fold_c": fold_c, "n1": n1, "n2": n2,
    }
    _TAB_CACHE[key] = out
    return out


# Bucket groups for the digit fold: bucket s = i+j holds
# sum_{i+j=s} P[i,j] with |P| <= Nmat*128^2 and multiplicity
# m_s = [1,2,3,4,3,2,1][s].  A group (s, s+1) combines as
# C_s + 256*C_{s+1}, bound (m_s + 256*m_{s+1})*Nmat*128^2; at Nmat=128
# the pair (2,3) reaches exactly 2^31 — NOT int32-safe — so it stays
# split.  All listed groups are < 2^31 with margin for Nmat <= 128.
_FOLD_GROUPS = ((0, 1), (2,), (3,), (4, 5), (6,))


def _fold_buckets(part, nmat, p, pinv, mu, fold_c):
    """(L, 4*Nmat, 4, cols) int32 digit partials -> (L, Nmat, cols) u32.

    part[l, i*Nmat + r, j, c] is the product of W-digit i row r with
    data-digit j.  Exact int32 bucket combine per _FOLD_GROUPS, then one
    Barrett reduction + Montgomery multiply by mont(2^{8s}) per group —
    5 reductions + 4 multiplies per output per sub-transform, the VPU
    cost that ultimately decides this path's fate vs Shoup butterflies.
    """
    l = part.shape[0]
    cols = part.shape[-1]
    p5 = part.reshape(l, N_DIGITS, nmat, N_DIGITS, cols)
    buckets = {}
    for i in range(N_DIGITS):
        for j in range(N_DIGITS):
            s = i + j
            t = p5[:, i, :, j, :]
            buckets[s] = t if s not in buckets else buckets[s] + t
    acc = None
    for group in _FOLD_GROUPS:
        c = buckets[group[0]]
        if len(group) == 2:
            c = c + buckets[group[1]] * jnp.int32(256)
        neg = c < 0
        mag = jnp.where(neg, -c, c).astype(U32)
        r = barrett_reduce(mag, p, mu)
        r = jnp.where(neg, neg_mod(r, p), r)
        if group[0]:
            r = mont_mul(r, fold_c[:, group[0]][:, None, None], p, pinv)
        acc = r if acc is None else add_mod(acc, r, p)
    return acc


def ntt_fwd_mxu(ctx: CryptoContext, x, n1: int = 128):
    """Negacyclic forward NTT via MXU matmuls; NATURAL-order output.

    x: (B, L, N) u32 residues.  Returns (B, L, N) u32 with
    out[b, l, k] = sum_j psi^j x[b,l,j] w^{jk} mod p_l.
    """
    plan = ctx.plan
    l = x.shape[-2]
    n = plan.n
    tabs = _tables(plan, l, n1)
    n2 = tabs["n2"]
    b = x.shape[0]
    p = ctx.lp(l).reshape(l, 1, 1)
    pinv = ctx.lpinv(l).reshape(l, 1, 1)
    mu = ctx.mu_p[:l].reshape(l, 1, 1)
    fold_c = jnp.asarray(tabs["fold_c"])

    # Twist (psi^j) with Shoup, then view as (B, L, N1, N2).
    tw0 = shoup_mul(x, jnp.asarray(tabs["psi"]),
                    jnp.asarray(tabs["psi_sh"]), ctx.lp(l))
    m = tw0.reshape(b, l, n1, n2)

    # Step 1: A = W1 @ M per limb.  lhs (L, 4*N1, N1) i8 constant;
    # rhs digits (L, N1, B*4*N2).
    md = balanced_digits(center_residues(m, p[None]))       # (B,L,N1,N2,4)
    rhs = jnp.transpose(md, (1, 2, 0, 4, 3)).reshape(l, n1, b * N_DIGITS * n2)
    part = jax.lax.dot_general(
        jnp.asarray(tabs["w1_dig"]), rhs,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)       # (L, 4N1, B*4*N2)
    part = part.reshape(l, N_DIGITS * n1, b, N_DIGITS, n2)
    part = jnp.transpose(part, (0, 1, 3, 2, 4)).reshape(
        l, N_DIGITS * n1, N_DIGITS, b * n2)
    a = _fold_buckets(part, n1, p, pinv, mu, fold_c)        # (L, N1, B*N2)
    a = a.reshape(l, n1, b, n2)

    # Step 2: twiddle w^{k1*j2}.
    bmat = shoup_mul(a, jnp.asarray(tabs["tw"])[:, :, None, :],
                     jnp.asarray(tabs["tw_sh"])[:, :, None, :],
                     p[..., None])                          # (L, N1, B, N2)

    # Step 3: C = W2T @ B over j2.  rhs digits (L, N2, B*4*N1).
    bd = balanced_digits(center_residues(
        jnp.transpose(bmat, (0, 3, 2, 1)), p[..., None]))   # (L,N2,B,N1,4)
    rhs2 = jnp.transpose(bd, (0, 1, 2, 4, 3)).reshape(
        l, n2, b * N_DIGITS * n1)
    part2 = jax.lax.dot_general(
        jnp.asarray(tabs["w2t_dig"]), rhs2,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)       # (L, 4N2, B*4*N1)
    part2 = part2.reshape(l, N_DIGITS * n2, b, N_DIGITS, n1)
    part2 = jnp.transpose(part2, (0, 1, 3, 2, 4)).reshape(
        l, N_DIGITS * n2, N_DIGITS, b * n1)
    c = _fold_buckets(part2, n2, p, pinv, mu, fold_c)       # (L, N2, B*N1)
    # C[k2, k1] = X[k1 + N1*k2]: (L, N2, B, N1) -> (B, L, N2*N1) = natural.
    return jnp.transpose(c.reshape(l, n2, b, n1),
                         (2, 0, 1, 3)).reshape(b, l, n)
