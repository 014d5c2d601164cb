"""Slot-packed encrypted scoring: many documents per ciphertext.

A 128-dim embedding occupies 128 coefficients of an N=4096 ring — 1/32nd
of the polynomial.  This module packs S = N/d documents into ONE
ciphertext, in disjoint coefficient blocks: slot s holds document s at
coefficients [s*d, (s+1)*d).  Against a query in the reversed encoding
(ops/encoding.py), the negacyclic product places document s's exact
inner product at coefficient s*d + d - 1, with zero cross-slot
contamination: a contribution from slot s' != s would need coefficient
indices i - j = d*(s - s') with i, j in [0, d) (impossible), and the
negacyclic wraparound terms would need i - j = d*(s - s' + S)
(equally impossible).

Packing multiplies search/scoring throughput by S (32 at N=4096,
d=128): per-document HBM traffic drops S-fold and the digit matmul's
output width grows from 4 to 4S columns — at S=32 that is exactly the
MXU's 128-lane width.

Packing is HOMOMORPHIC: stored per-document ciphertexts (ascending
encoding — runtime.encrypt_vector) are combined as

    ct_packed = sum_s ct_s * X^{s*d}

where multiplying by the monomial X^{s*d} is a pointwise NTT-domain
multiply that permutes-and-signs coefficients WITHOUT growing noise
(|X^k * e| = |e|); the sum adds S fresh noises — negligible against the
budget.  No storage-format change is needed, and deletions simply drop
out at the next arena rebuild.

The reference scores documents one at a time through a Concrete circuit
(/root/reference/batch_operations.py:263-284, fhe_similarity.py:151);
it has no packing concept — ciphertext amortization like this is the
core TPU-first design win of this framework.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dataclass_field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .cipher import SecretKey, rns_decode_centered
from .context import CryptoContext
from .encoding import encode_rev
from .fastdot import (DocOperand, balanced_digits, center_residues,
                      fold_digit_products)
from .modmath import U32, add_mod, mont_mul
from .ntt import ntt_fwd


def slots_per_ct(n: int, d: int) -> int:
    """Number of d-dim documents one degree-N ciphertext holds."""
    assert n % d == 0, f"slot width {d} must divide ring degree {n}"
    return n // d


def encode_packed(vecs, n: int):
    """(..., S, d) int32 -> (..., N) poly with doc s at X^{s*d + i}."""
    s, d = vecs.shape[-2], vecs.shape[-1]
    assert s * d <= n
    flat = vecs.reshape(vecs.shape[:-2] + (s * d,)).astype(jnp.int32)
    pad = [(0, 0)] * (flat.ndim - 1) + [(0, n - s * d)]
    return jnp.pad(flat, pad)


# ---------------------------------------------------------------------------
# Homomorphic packing
# ---------------------------------------------------------------------------


def _monomial_table(ctx: CryptoContext, d: int, slots: int, l: int):
    """(S, L, N) uint32: NTT(X^{s*d}) in Montgomery form, cached.

    Built analytically host-side (safe to call inside a jit trace): with
    this NTT's bit-reversed layout, slot m of NTT(X^k) is
    psi^k * w^{k * bitrev(m)}  (twist then cyclic transform of a one-hot).
    """
    key = ("pack_mono", d, slots, l)
    cached = ctx.cache.get(key)
    if cached is not None:
        return cached
    from . import primes as pr
    n, log_n = ctx.n, ctx.n.bit_length() - 1
    brv = np.zeros(n, dtype=np.int64)
    for m in range(n):
        brv[m] = int(format(m, f"0{log_n}b")[::-1], 2)
    out = np.empty((slots, l, n), dtype=np.uint32)
    for li, p in enumerate(ctx.primes[:l]):
        psi = pr.root_of_unity(p, 2 * n)
        w = psi * psi % p
        tbl = np.empty(n, dtype=np.uint64)           # w^j for j in [0, n)
        acc = 1
        for j in range(n):
            tbl[j] = acc
            acc = acc * w % p
        r_mod_p = (1 << 32) % p
        for s in range(slots):
            k = s * d
            lead = pow(psi, k, p) * r_mod_p % p      # Montgomery form
            out[s, li] = (tbl[(k * brv) % n] * lead % p).astype(np.uint32)
    ctx.cache[key] = out
    return out


def pack_ciphertexts(ctx: CryptoContext, cts_data, d: int, level: int):
    """(B, 2, L, N) u32 per-doc ciphertexts -> (G, 2, L, N) packed.

    G = ceil(B / S); the tail group is padded with zero ciphertexts
    (which decrypt to 0 — exact).  Documents must be in the ascending
    (fwd) encoding.  Noise grows only additively (sum of <= S fresh
    noises): monomial multiplication is noise-free.
    """
    slots = slots_per_ct(ctx.n, d)
    b = cts_data.shape[0]
    g = -(-b // slots)
    pad = g * slots - b
    if pad:
        cts_data = jnp.concatenate(
            [cts_data, jnp.zeros((pad,) + cts_data.shape[1:], cts_data.dtype)])
    grouped = cts_data.reshape(g, slots, 2, level, ctx.n)
    mono = jnp.asarray(_monomial_table(ctx, d, slots, level))  # (S, L, N)
    p, pinv = ctx.lp(level), ctx.lpinv(level)
    shifted = mont_mul(grouped, mono[None, :, None, :, :], p, pinv)
    acc = shifted[:, 0]
    for s in range(1, slots):
        acc = add_mod(acc, shifted[:, s], p)
    return acc


# ---------------------------------------------------------------------------
# Packed query operand + scoring
# ---------------------------------------------------------------------------


def packed_coeff_weights(ctx: CryptoContext, d: int, slots: int, l: int):
    """(L, N, S) uint32 Montgomery: per-slot single-coefficient INTT rows.

    Column s is cipher.coeff_weights for output coefficient s*d + d - 1,
    built vectorized (one modular pow table per limb instead of N pows
    per row).
    """
    key = ("pack_coeff_w", d, slots, l)
    cached = ctx.cache.get(key)
    if cached is not None:
        return cached
    from . import primes as pr
    n, log_n = ctx.n, ctx.n.bit_length() - 1
    # bitrev permutation of 0..N-1.
    brv = np.zeros(n, dtype=np.int64)
    for m in range(n):
        brv[m] = int(format(m, f"0{log_n}b")[::-1], 2)
    j_s = np.arange(slots, dtype=np.int64) * d + (d - 1)       # (S,)
    out = np.empty((l, n, slots), dtype=np.uint32)
    for li, p in enumerate(ctx.primes[:l]):
        psi = pr.root_of_unity(p, 2 * n)
        w_inv = pow(psi * psi % p, p - 2, p)
        n_inv = pow(n, p - 2, p)
        # pow table w_inv^k for k in [0, n).
        tbl = np.empty(n, dtype=np.uint64)
        acc = 1
        for k in range(n):
            tbl[k] = acc
            acc = acc * w_inv % p
        lead = np.array([pow(psi, -(int(j) % (2 * n)), p) * n_inv % p
                         for j in j_s], dtype=np.uint64)       # (S,)
        exp = (j_s[None, :] * brv[:, None]) % n                # (N, S)
        rows = tbl[exp] * lead[None, :] % p                    # (N, S) u64
        out[li] = (rows * ((1 << 32) % p) % p).astype(np.uint32)
    ctx.cache[key] = out
    return out


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class PackedDocOperand:
    """Digit planes of packed ciphertexts: (L, G*4, 2N), group-major.

    Row g*4 + i is digit plane i of packed group g.  Two constraints
    shape this layout:
    * the group index is OUTERMOST among the merged matmul rows, so
      sharding rows over a device mesh keeps every reshape inside
      packed_scores shard-local (no all-gather of the store) — shards
      stay group-aligned whenever G divides evenly;
    * the trailing dims (G*4, 2N) are both large, so the int8 (32, 128)
      tiling pads NOTHING — a separate digit axis of extent 4 would be
      sublane-padded 8x in HBM (measured: 3.2x slower scoring).
    """

    digits: jnp.ndarray
    level: int = dataclass_field(metadata=dict(static=True))
    # Real (pre-pad) group count, carried from build time so top-k
    # consumers can mask the zero-scoring pad groups out of rankings
    # without every call site re-deriving it (a forgotten mask lets a
    # pad slot's 0 outrank real negative scores).  None = no padding.
    n_groups: Optional[int] = dataclass_field(
        default=None, metadata=dict(static=True))

    @property
    def groups(self) -> int:
        return self.digits.shape[1] // 4

    def real_docs(self, slots: int) -> int:
        """Upper bound on real documents: pre-pad groups x slots."""
        return (self.n_groups if self.n_groups is not None
                else self.groups) * slots


def make_packed_doc_operand(ctx: CryptoContext, ct_data, level: int,
                            pad_groups_to: int = 1) -> PackedDocOperand:
    """(G, 2, L, N) u32 packed ciphertexts -> MXU-ready digit planes.

    `pad_groups_to` rounds the group count up with zero ciphertexts
    (which score exactly 0) at operand-build time, so the fused scoring
    kernel's 64-group row blocks need no per-call padding copy — the
    right choice for long-lived stores (build once, score many).  The
    pre-pad group count rides the operand as `n_groups`; any top-k over
    the scores must mask rankings to the real documents (pass n_docs to
    parallel.search.make_sharded_packed_search, or slice [:n_docs]) or
    pad slots' zero scores outrank real negative ones.
    """
    real_g = ct_data.shape[0]
    if pad_groups_to > 1 and ct_data.shape[0] % pad_groups_to:
        extra = pad_groups_to - ct_data.shape[0] % pad_groups_to
        ct_data = jnp.concatenate(
            [ct_data,
             jnp.zeros((extra,) + ct_data.shape[1:], ct_data.dtype)])
    p = ctx.p[:level, :]                              # (L, 1)
    g = ct_data.shape[0]
    a = jnp.moveaxis(ct_data, 1, -2)                  # (G, L, 2, N)
    a = a.reshape(a.shape[:-2] + (2 * ctx.n,))        # (G, L, 2N)
    dig = balanced_digits(center_residues(a, p))      # (G, L, 2N, 4)
    dig = jnp.transpose(dig, (1, 0, 3, 2))            # (L, G, 4, 2N)
    return PackedDocOperand(dig.reshape(dig.shape[0], g * 4, -1), level,
                            real_g if g != real_g else None)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class PackedQueryOperand:
    """Folded per-slot query digit planes in MATMUL layout: (L, 2N, 4S).

    Column c = j*S + s is query-digit j of slot s — exactly the right
    operand layout for the scoring dot_general / Pallas kernel, so the
    per-step transpose of the (tiny but hot) query operand disappears;
    it is paid once at operand build instead.
    """

    digits: jnp.ndarray
    level: int = dataclass_field(metadata=dict(static=True))
    d: int = dataclass_field(metadata=dict(static=True))
    slots: int = dataclass_field(metadata=dict(static=True))


def make_packed_query_operand(ctx: CryptoContext, sk: SecretKey, q_int,
                              d: int, level: int) -> PackedQueryOperand:
    """Fold query, per-slot INTT rows, and secret key into digit planes.

    v[:, :, s]  = NTT(encode_rev(q)) . w_{s*d+d-1}   (per limb)
    vs[:, :, s] = v[:, :, s] . s_ntt
    """
    l = level
    slots = slots_per_ct(ctx.n, d)
    p3 = ctx.p[:l, :, None]
    pinv3 = ctx.p_neg_inv[:l, :, None]
    q_res = jnp.broadcast_to(
        encode_rev(q_int, ctx.n).astype(jnp.int32)[..., None, :], (l, ctx.n))
    q_res = jnp.where(q_res >= 0, q_res.astype(U32),
                      q_res.astype(U32) + ctx.lp(l))
    q_ntt = ntt_fwd(ctx.plan, q_res)                           # (L, N)
    w = jnp.asarray(packed_coeff_weights(ctx, d, slots, l))    # (L, N, S) mont
    v = mont_mul(q_ntt[:, :, None], w, p3, pinv3)              # (L, N, S)
    vs = mont_mul(v, sk.s_ntt_mont[:l][:, :, None], p3, pinv3)
    vv = jnp.concatenate([v, vs], axis=1)                      # (L, 2N, S)
    cen = center_residues(vv, p3)
    dig = balanced_digits(cen)                                 # (L, 2N, S, 4)
    vmat = jnp.transpose(dig, (0, 1, 3, 2)).reshape(           # (L, 2N, 4S)
        l, 2 * ctx.n, 4 * slots)
    return PackedQueryOperand(vmat, l, d, slots)


def fold_separable(ctx: CryptoContext, part, l: int, slots: int):
    """(L, G*4, 4S) int32 digit-pair partials -> (L, G, S) u32 residues.

    Exploits the separable weight 2^{8(i+j)} = 2^{8i} * 2^{8j}: fold the
    query-digit axis j (column blocks) first, then the doc-digit axis i
    (row stride 4) — 8 strided slices and zero materialized transposes,
    vs 16 pair slices over a transposed copy for the pair-grouped fold
    (fastdot.fold_digit_products).  Measured on chip this cuts the
    scoring step from 0.39 ms to 0.29 ms at G=2048 (the transpose alone
    was ~25% of the step).  Exact: every partial is individually
    Barrett-reduced (|part| <= 128*128*2N < 2^31 for N <= 16384*4), so
    no grouping bound is needed.
    """
    from .fastdot import N_DIGITS, _shift_consts
    from .modmath import barrett_reduce, neg_mod

    p = ctx.p[:l].reshape(l, 1, 1)
    pinv = ctx.p_neg_inv[:l].reshape(l, 1, 1)
    mu = ctx.mu_p[:l].reshape(l, 1, 1)
    consts = _shift_consts(ctx, l)                    # (7, L) u32 Montgomery

    def reduce_signed(x):
        neg = x < 0
        mag = jnp.where(neg, -x, x).astype(U32)
        r = barrett_reduce(mag, p, mu)
        return jnp.where(neg, neg_mod(r, p), r)

    inner = None                                      # (L, G*4, S)
    for j in range(N_DIGITS):
        r = reduce_signed(part[:, :, j * slots:(j + 1) * slots])
        if j:
            r = mont_mul(r, jnp.asarray(consts[j]).reshape(l, 1, 1), p, pinv)
        inner = r if inner is None else add_mod(inner, r, p)
    inner = inner.reshape(l, -1, 4, slots)            # (L, G, i, S)
    acc = None
    for i in range(N_DIGITS):
        r = inner[:, :, i, :]
        if i:
            r = mont_mul(r, jnp.asarray(consts[i]).reshape(l, 1, 1), p, pinv)
        acc = r if acc is None else add_mod(acc, r, p)
    return acc                                        # (L, G, S)


def packed_scores(ctx: CryptoContext, docs: PackedDocOperand,
                  query: PackedQueryOperand, pt_corr: int = 1,
                  impl: str = "auto"):
    """(G, S) int32 exact per-slot scores of packed docs vs the query.

    One int8 matmul per limb with 4S output columns (128 at S=32 — full
    MXU lane width), contracting the 2N ciphertext axis, then the
    separable digit fold + exact RNS decode.  Every reshape keeps the
    group axis G outermost, so sharding G over a mesh leaves the whole
    computation shard-local up to the final tiny score vector.

    impl: "fused" runs matmul+fold as one Pallas kernel (ops/
    pack_pallas.py — partials never touch HBM; the doc operand streams
    once); "xla" uses plain dot_general + fold_separable; "auto" picks
    fused on TPU backends and xla elsewhere (Pallas-on-CPU is
    interpreter-only).  Both are bit-exact and oracle-gated.
    """
    l = docs.level
    assert query.level == l
    A = docs.digits                                   # (L, G*4, 2N)
    vmat = query.digits                               # (L, 2N, 4S)
    la, g, s = A.shape[0], docs.groups, query.slots
    if impl == "auto":
        impl = "fused" if jax.default_backend() == "tpu" else "xla"
    if impl == "fused":
        from . import pack_pallas
        acc = pack_pallas.packed_score_residues(ctx, A, vmat, l, s)
    else:
        part = jax.lax.dot_general(
            A, vmat,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)         # (L, G*4, 4S) exact
        acc = fold_separable(ctx, part, l, s)         # (L, G, S)
    res = jnp.moveaxis(acc, 0, -1)[..., None]         # (G, S, L, 1)
    return rns_decode_centered(ctx, res, l, pt_corr)[..., 0]   # (G, S)
