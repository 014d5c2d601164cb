"""MXU fast path for encrypted dot-product scoring (search/compare).

The score of one stored ciphertext (c0, c1) against a clear query q is

    score = coeff_{d-1}( INTT( (c0 + c1*s) . q_ntt ) )
          = sum_k c0[k]*v[k] + c1[k]*vs[k]          (mod p, per limb)

with v = q_ntt . w and vs = v . s_ntt folded host-side per query, where w
is the single-coefficient INTT row (cipher.coeff_weights).  That turns
scoring a whole encrypted store into ONE integer matrix-vector product
per limb — which this module evaluates EXACTLY on the MXU:

* residues are centered to (-p/2, p/2] and decomposed into 4 balanced
  base-256 digits (each in [-128, 127], int8);
* an int8 x int8 -> int32 `dot_general` contracts the 2N axis: every
  digit-pair partial sum is < 2^31 (128*128*2N for N <= 16384*4), so the
  MXU accumulation is bit-exact;
* partials are folded back mod p with Montgomery multiplies by 2^{8s},
  then the (B, L) score residues go through the exact RNS decoder.

This replaces the reference's per-document Python predict loop
(/root/reference/batch_operations.py:263-284) with one MXU matmul whose
arithmetic cost per document is ~16 int8 MACs per ciphertext byte; HBM
bandwidth, not compute, is the bound.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dataclass_field

import jax
import jax.numpy as jnp
import numpy as np

from .cipher import SecretKey, coeff_weights, rns_decode_centered
from .context import CryptoContext
from .encoding import encode_rev
from .modmath import U32, add_mod, barrett_reduce, mont_mul, neg_mod
from .ntt import ntt_fwd

N_DIGITS = 4


def center_residues(x, p):
    """u32 residues in [0, p) -> centered int32 in (-p/2, p/2]."""
    half = p >> 1
    return jnp.where(x > half, x - p, x).astype(jnp.int32)


def balanced_digits(x):
    """int32 (|x| < 2^30) -> (..., 4) int8 balanced base-256 digits.

    x == sum_i d_i * 256^i with d_i in [-128, 127].
    """
    digits = []
    c = x
    for _ in range(N_DIGITS):
        d = ((c + 128) & 255) - 128
        digits.append(d.astype(jnp.int8))
        c = (c - d) >> 8
    return jnp.stack(digits, axis=-1)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class DocOperand:
    """Digit-plane layout of a batch of stored ciphertexts: (L, 4, B, 2N)."""

    digits: jnp.ndarray
    level: int = dataclass_field(metadata=dict(static=True))

    @property
    def batch(self) -> int:
        return self.digits.shape[2]


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class QueryOperand:
    """Folded query vectors as digit planes: (L, 4, 2N)."""

    digits: jnp.ndarray
    level: int = dataclass_field(metadata=dict(static=True))
    d: int = dataclass_field(metadata=dict(static=True))


def make_doc_operand(ctx: CryptoContext, ct_data, level: int) -> DocOperand:
    """(B, 2, L, N) u32 ciphertexts -> MXU-ready digit planes.

    Computed once at ingestion; same byte volume as the raw ciphertext.
    """
    p = ctx.p[:level, :]                              # (L, 1)
    a = jnp.moveaxis(ct_data, 1, -2)                  # (B, L, 2, N)
    a = a.reshape(a.shape[:-2] + (2 * ctx.n,))        # (B, L, 2N)
    dig = balanced_digits(center_residues(a, p))      # (B, L, 2N, 4)
    return DocOperand(jnp.transpose(dig, (1, 3, 0, 2)), level)


def make_query_operand(ctx: CryptoContext, sk: SecretKey, q_int,
                       d: int, level: int) -> QueryOperand:
    """Fold query, INTT row, and secret key into digit planes.

    v  = NTT(encode_rev(q)) . w_{d-1}   (per limb)
    vs = v . s_ntt
    """
    l = level
    p, pinv = ctx.lp(l), ctx.lpinv(l)
    q_res = jnp.broadcast_to(
        encode_rev(q_int, ctx.n).astype(jnp.int32)[..., None, :],
        (l, ctx.n))
    q_res = jnp.where(q_res >= 0, q_res.astype(U32),
                      q_res.astype(U32) + p)
    q_ntt = ntt_fwd(ctx.plan, q_res)                  # (L, N)
    w = jnp.asarray(coeff_weights(ctx, d - 1, l))     # (L, N) Montgomery
    v = mont_mul(q_ntt, w, p, pinv)                   # q.w, normal domain
    vs = mont_mul(v, sk.s_ntt_mont[:l], p, pinv)      # q.w.s
    vv = jnp.concatenate([v, vs], axis=-1)            # (L, 2N)
    dig = balanced_digits(center_residues(vv, p))     # (L, 2N, 4)
    return QueryOperand(jnp.transpose(dig, (0, 2, 1)), l, d)


def fold_digit_products(ctx: CryptoContext, part, l: int, k_len: int):
    """Fold digit-pair matmul partials back into residues mod p.

    part: (L, 4, M, 4) int32 — partial sums for digit pair (i, j) of M
    outputs.  Returns (L, M) uint32 residues of
    sum_{i,j} part[i, j] * 2^{8(i+j)} mod p_limb.

    Digit pairs group by shift s = i + j, then fold mod p:
    r = sum_s partial_s * 2^{8s} (Montgomery constant per limb).  Each
    pair partial is bounded by 128*128*K (K = contraction length); the
    group size is capped so the int32 group sum cannot overflow even in
    the adversarial all-|128|-digit case (matters from N=16384 up).
    """
    max_group = max(1, ((1 << 31) - 1) // (128 * 128 * k_len))
    p = ctx.p[:l, :]                                  # (L, 1)
    pinv = ctx.p_neg_inv[:l, :]
    mu = ctx.mu_p[:l, :]
    acc = None

    def fold(ps, s):
        neg = ps < 0
        mag = jnp.where(neg, -ps, ps).astype(U32)
        r = barrett_reduce(mag, p, mu)
        r = jnp.where(neg, neg_mod(r, p), r)
        c = jnp.asarray(_shift_consts(ctx, l)[s])[:, None]   # (L, 1)
        return mont_mul(r, c, p, pinv)

    for s in range(2 * N_DIGITS - 1):
        pairs = [part[:, i, :, s - i]                 # (L, M)
                 for i in range(max(0, s - N_DIGITS + 1),
                                min(N_DIGITS, s + 1))]
        for g0 in range(0, len(pairs), max_group):
            ps = pairs[g0]
            for t in pairs[g0 + 1: g0 + max_group]:
                ps = ps + t
            r = fold(ps, s)
            acc = r if acc is None else add_mod(acc, r, p)
    return acc


def scores(ctx: CryptoContext, docs: DocOperand, query: QueryOperand,
           pt_corr: int = 1):
    """(B,) int32 exact dot-product scores of every doc against the query."""
    l = docs.level
    assert query.level == l
    A = docs.digits                                   # (L, 4, B, 2N)
    V = query.digits                                  # (L, 4, 2N)
    la, bb = A.shape[0], A.shape[2]
    # One int8 matmul: contract 2N, batch L -> (L, 4B, 4) int32, exact.
    part = jax.lax.dot_general(
        A.reshape(la, 4 * bb, -1), jnp.swapaxes(V, 1, 2),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)
    part = part.reshape(la, 4, bb, 4)                 # (L, i, B, j)
    acc = fold_digit_products(ctx, part, l, A.shape[-1])
    res = jnp.transpose(acc)[..., None]               # (B, L, 1)
    return rns_decode_centered(ctx, res, l, pt_corr)[..., 0]


def _shift_consts(ctx: CryptoContext, l: int):
    """Per-shift Montgomery constants 2^{8s} * 2^32 mod p, shape (7, l)."""
    key = ("fastdot_shift", l)
    cached = ctx.cache.get(key)
    if cached is None:
        cached = np.asarray(
            [[(1 << (8 * s)) * (1 << 32) % p for p in ctx.primes[:l]]
             for s in range(2 * N_DIGITS - 1)], dtype=np.uint32)
        ctx.cache[key] = cached
    return cached
