"""Homomorphic operations: add/sub/neg, ct*pt, ct*ct, relinearize, modswitch.

All ops are pointwise in the NTT domain except relinearization digit
extraction and modulus switching, which round-trip through coefficients.
Everything broadcasts over leading batch dimensions.

This is the op set the reference gets opaquely from Concrete's circuit
runtime (the weighted-sum circuit built by `LinearRegression.compile()` —
/root/reference/fhe_similarity.py:108-140); here each op is an explicit
TPU primitive.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .cipher import Ciphertext, centered_residues
from .context import CryptoContext
from .modmath import (add_mod, barrett_reduce, mont_mul, neg_mod, sub_mod,
                      to_mont)
from .ntt import build_plan, ntt_fwd, ntt_inv


def _check(a: Ciphertext, b: Ciphertext):
    assert a.level == b.level, "level mismatch"
    assert a.is_ntt and b.is_ntt, "ops require NTT-domain ciphertexts"
    assert a.pt_corr == b.pt_corr, "plaintext-scale (pt_corr) mismatch"


def add(ctx: CryptoContext, a: Ciphertext, b: Ciphertext) -> Ciphertext:
    _check(a, b)
    return Ciphertext(add_mod(a.data, b.data, ctx.lp(a.level)), a.level, True,
                      a.pt_corr)


def sub(ctx: CryptoContext, a: Ciphertext, b: Ciphertext) -> Ciphertext:
    _check(a, b)
    return Ciphertext(sub_mod(a.data, b.data, ctx.lp(a.level)), a.level, True,
                      a.pt_corr)


def neg(ctx: CryptoContext, a: Ciphertext) -> Ciphertext:
    return Ciphertext(neg_mod(a.data, ctx.lp(a.level)), a.level, True,
                      a.pt_corr)


# ---------------------------------------------------------------------------
# Plaintext operands
# ---------------------------------------------------------------------------


def plain_to_eval(ctx: CryptoContext, pt, l: int):
    """int32 poly (..., N), |pt| < t/2, -> NTT-domain Montgomery operand.

    The result multiplies pointwise against NTT-domain ciphertext polys.
    """
    res = centered_residues(ctx, pt, l)
    return to_mont(ntt_fwd(ctx.plan, res), ctx.lp(l), ctx.lpinv(l), ctx.lr2(l))


def mul_plain(ctx: CryptoContext, a: Ciphertext, pt_eval) -> Ciphertext:
    """ct * pt with pt already in eval (NTT+Montgomery) form."""
    l = a.level
    out = mont_mul(a.data, pt_eval[..., None, :, :], ctx.lp(l), ctx.lpinv(l))
    return Ciphertext(out, l, True, a.pt_corr)


def add_plain(ctx: CryptoContext, a: Ciphertext, pt) -> Ciphertext:
    """ct + pt for an int32 plaintext poly (added to c0 only)."""
    assert a.pt_corr == 1, "add_plain on a scaled ciphertext would misalign"
    l = a.level
    pt_ntt = ntt_fwd(ctx.plan, centered_residues(ctx, pt, l))
    c0 = add_mod(a.data[..., 0, :, :], pt_ntt, ctx.lp(l))
    return Ciphertext(a.data.at[..., 0, :, :].set(c0), l, True)


# ---------------------------------------------------------------------------
# Ciphertext multiplication + relinearization
# ---------------------------------------------------------------------------


def mul_ct(ctx: CryptoContext, a: Ciphertext, b: Ciphertext) -> Ciphertext:
    """Tensor product: (a0,a1)*(b0,b1) -> degree-2 ciphertext (3 polys)."""
    _check(a, b)
    assert a.k == 2 and b.k == 2
    l = a.level
    p, pinv = ctx.lp(l), ctx.lpinv(l)
    bm = to_mont(b.data, p, pinv, ctx.lr2(l))
    a0, a1 = a.data[..., 0, :, :], a.data[..., 1, :, :]
    b0, b1 = bm[..., 0, :, :], bm[..., 1, :, :]
    c0 = mont_mul(a0, b0, p, pinv)
    c1 = add_mod(mont_mul(a0, b1, p, pinv), mont_mul(a1, b0, p, pinv), p)
    c2 = mont_mul(a1, b1, p, pinv)
    return Ciphertext(jnp.stack([c0, c1, c2], axis=-3), l, True,
                      a.pt_corr * b.pt_corr % ctx.t)


def _flatten_batch(x):
    """(..., l, N) -> ((B, l, N), lead): XLA's TPU backend runs
    elementwise fusions ~4-5x slower on rank>3 arrays (measured for the
    NTT in ntt.py:158-165 and for the keyswitch chain on-chip:
    benchmarks/diag_relin_profile.py found the rank-5 hybrid keyswitch
    at 67 ms/step vs ~17 ms for its transforms alone), so every
    keyswitch entry point flattens leading batch dims once."""
    lead = x.shape[:-2]
    if len(lead) <= 1:
        return x, None
    return x.reshape((-1,) + x.shape[-2:]), lead


# Below this many switched polys per call the keyswitch is launch-
# latency-bound (every stage's operand fits VMEM; each XLA fusion costs
# ~20 us of launch overhead through the dispatch path), so the variants
# with the FEWEST separate NTT calls win; at or above it the op is
# HBM-bandwidth-bound and the transform-count-minimizing variants win.
_REUSE_MIN_BATCH = 32


def _digit_plan(ctx: CryptoContext, l: int, j: int):
    """NTT plan over the extended chain MINUS limb j (cached per (l, j)).

    hybrid_keyswitch_apply's full-limb digit j only needs forward
    transforms at the extended limbs other than j (limb j's transform is
    the input slice); this plan carries exactly those primes, in chain
    order, special prime last.
    """
    key = ("hybrid_digit_plan", l, j)
    plan = ctx.cache.get(key)
    if plan is None:
        import jax
        ext = ctx.hybrid(l).plan.primes
        with jax.ensure_compile_time_eval():
            plan = build_plan(ctx.n, tuple(
                p for i, p in enumerate(ext) if i != j))
        ctx.cache[key] = plan
    return plan


def gadget_keyswitch_apply(ctx: CryptoContext, ksk, c_ntt, l: int):
    """Accumulate sum_j digit_j(c) * ksk[j] -> (d0, d1) NTT-domain polys.

    c_ntt: (..., l, N) NTT-domain poly whose key component is being
    switched; ksk: (l, 2, l, N) Montgomery keyswitch key
    (cipher.gadget_keyswitch_key).  The CRT-idempotent gadget digits are
    the coefficient-domain limbs of c, each broadcast/reduced to all
    limbs and re-NTT'd.
    """
    c_ntt, lead = _flatten_batch(c_ntt)
    p, pinv, mu = ctx.lp(l), ctx.lpinv(l), ctx.mu_p[:l]
    c_coeff = ntt_inv(ctx.plan, c_ntt)
    acc0 = acc1 = None
    for j in range(l):
        d_j = c_coeff[..., j, :][..., None, :]        # (..., 1, N) u32 < p_j
        d_res = barrett_reduce(d_j, p, mu)            # (..., l, N)
        d_ntt = ntt_fwd(ctx.plan, d_res)
        t0 = mont_mul(d_ntt, ksk[j, 0], p, pinv)
        t1 = mont_mul(d_ntt, ksk[j, 1], p, pinv)
        acc0 = t0 if acc0 is None else add_mod(acc0, t0, p)
        acc1 = t1 if acc1 is None else add_mod(acc1, t1, p)
    if lead is not None:
        acc0 = acc0.reshape(lead + acc0.shape[-2:])
        acc1 = acc1.reshape(lead + acc1.shape[-2:])
    return acc0, acc1


def _single_prime_plan(ctx: CryptoContext, prime: int):
    """Cached one-limb NTT plan (for extracting a single limb's
    coefficient form without transforming the whole chain)."""
    key = ("single_prime_plan", prime)
    plan = ctx.cache.get(key)
    if plan is None:
        import jax
        with jax.ensure_compile_time_eval():
            plan = build_plan(ctx.n, (prime,))
        ctx.cache[key] = plan
    return plan


def _div_special(ctx: CryptoContext, ht, x_ntt, l: int):
    """Exact divide-by-P: NTT-domain polys over Q_l*P -> over Q_l.

    Same rounding as mod_switch: subtract delta with delta ≡ x (mod P),
    delta ≡ 0 (mod t), delta centered-small, then multiply by P^{-1}.
    Because hybrid keys encrypt P*target, the division leaves the
    message term intact (no pt_corr change); the keyswitch noise
    shrinks by ~P.

    Transform economy: only the SPECIAL limb leaves the NTT domain —
    the delta correction is computed coefficient-wise from it (the
    centering comparison is the one nonlinear step), transformed
    forward over the l ciphertext limbs, and the subtract + multiply-
    by-P^{-1} stay pointwise in the NTT domain (both commute with the
    linear NTT — bit-identical results).  1 + l limb transforms per
    poly instead of (l+1) + l.
    """
    x_ntt, lead = _flatten_batch(x_ntt)               # (B', l+1, N)
    sp, sp_pinv = ht.p[l, 0], ht.pinv[l, 0]
    p, pinv = ctx.lp(l), ctx.lpinv(l)
    if x_ntt.shape[0] < _REUSE_MIN_BATCH:
        # Launch-latency regime: one combined INTT + one fwd call.
        x = ntt_inv(ht.plan, x_ntt)
        u = mont_mul(x[..., l, :], ht.t_inv_mont_sp[0, 0], sp, sp_pinv)
        rest = x[..., :l, :]
        w = barrett_reduce(u[..., None, :], p, ctx.mu_p[:l])
        w = jnp.where(u[..., None, :] > ht.sp_half[0, 0],
                      sub_mod(w, ht.sp_mod_pi, p), w)
        delta = mont_mul(w, ctx.t_mont_p[:l], p, pinv)
        out = mont_mul(sub_mod(rest, delta, p), ht.inv_sp_mont, p, pinv)
        out = ntt_fwd(ctx.plan, out)
    else:
        sp_plan = _single_prime_plan(ctx, int(ctx.params.special_prime))
        x_sp = ntt_inv(sp_plan, x_ntt[..., l:, :])    # (B', 1, N) coeff
        u = mont_mul(x_sp, ht.t_inv_mont_sp[0, 0], sp, sp_pinv)
        w = barrett_reduce(u, p, ctx.mu_p[:l])        # (B', l, N)
        w = jnp.where(u > ht.sp_half[0, 0], sub_mod(w, ht.sp_mod_pi, p), w)
        # (x - t*w) * P^{-1} distributed: x*P^{-1} - w*(t*P^{-1}) — one
        # combined constant per term, no materialized delta (exact: the
        # Montgomery scalings distribute over sub_mod).
        w_ntt = ntt_fwd(ctx.plan, w)
        out = sub_mod(mont_mul(x_ntt[..., :l, :], ht.inv_sp_mont, p, pinv),
                      mont_mul(w_ntt, ht.t_inv_sp_mont, p, pinv), p)
    return out if lead is None else out.reshape(lead + out.shape[-2:])


def hybrid_keyswitch_apply(ctx: CryptoContext, ksk, c_ntt, l: int):
    """Hybrid (GHS/SEAL) keyswitch: digits over Q_l*P, then divide by P.

    ksk: (n_dig, 2, l+1, N) Montgomery hybrid key
    (cipher.hybrid_keyswitch_key); c_ntt: (..., l, N) NTT-domain poly
    whose key component is being switched.  n_dig = l (full-limb CRT
    digits) or 2l (16-bit sub-digits, re-keying).  Returns (d0, d1)
    NTT-domain polys over Q_l.
    """
    squeeze = c_ntt.ndim == 2                         # single (l, N) poly
    if squeeze:
        c_ntt = c_ntt[None]
    c_ntt, lead = _flatten_batch(c_ntt)               # (B, l, N)
    ht = ctx.hybrid(l)
    pe, pinve = ht.p, ht.pinv
    n_dig = ksk.shape[0]
    d_per = n_dig // l
    n = ctx.n
    c_coeff = ntt_inv(ctx.plan, c_ntt)                # (B, l, N)
    # All digit math runs with the digit axis FOLDED INTO the batch axis
    # — rank 3 — see _flatten_batch for why.
    if d_per == 1 and c_ntt.shape[0] >= _REUSE_MIN_BATCH:
        # Full-limb CRT digits, bandwidth-bound regime.  Digit j IS limb
        # j of c, so its forward NTT at extended limb j is exactly the
        # INPUT slice c_ntt[..., j, :] (the limb-j twiddles would
        # reproduce it bit-exactly); only the other l extended limbs
        # need transforms — l fwd limb-transforms per digit instead of
        # l+1 (measured: 32x32 all-pairs relin 17.6 -> 13.1 ms).
        d_list = []
        for j in range(l):
            others = np.asarray([i for i in range(l + 1) if i != j])
            d_j = c_coeff[..., j, :][..., None, :]    # (B, 1, N)
            d_res = barrett_reduce(d_j, pe[others], ht.mu[others])
            d_o = ntt_fwd(_digit_plan(ctx, l, j), d_res)   # (B, l, N)
            d_list.append(jnp.concatenate(
                [d_o[..., :j, :], c_ntt[..., j:j + 1, :], d_o[..., j:, :]],
                axis=-2))
        d_ntt = jnp.stack(d_list, axis=1)             # (B, l, l+1, N)
    elif d_per == 1:
        # Small batches are LAUNCH-LATENCY-bound, not bandwidth-bound
        # (the whole working set fits VMEM): one combined NTT call over
        # all digits beats l separate smaller calls even though it
        # transforms l extra limbs (measured: single relinearized
        # compare 1.24 ms with per-digit calls vs 0.73 combined).
        d_flat = c_coeff.reshape((-1, 1, n))          # (B*l, 1, N)
        d_res = barrett_reduce(d_flat, pe, ht.mu)     # (B*l, l+1, N)
        d_ntt = ntt_fwd(ht.plan, d_res)
        d_ntt = d_ntt.reshape((-1, n_dig) + d_ntt.shape[-2:])
    else:
        assert d_per == 2, "only 16-bit sub-digits are supported"
        lo = c_coeff & jnp.uint32(0xFFFF)
        hi = c_coeff >> 16
        d = jnp.stack([lo, hi], axis=-2)              # (B, l, 2, N)
        d = d.reshape((-1, 1, n))                     # (B*n_dig, 1, N)
        # Digits < 2^16 < every prime: residues are the values themselves
        # (materialized per extended limb — the NTT twiddles differ).
        d_res = jnp.broadcast_to(d, (d.shape[0], l + 1, n))
        d_ntt = ntt_fwd(ht.plan, d_res)               # (B*n_dig, l+1, N)
        d_ntt = d_ntt.reshape((-1, n_dig) + d_ntt.shape[-2:])
    acc0 = acc1 = None
    for j in range(n_dig):
        t0 = mont_mul(d_ntt[:, j], ksk[j, 0], pe, pinve)
        t1 = mont_mul(d_ntt[:, j], ksk[j, 1], pe, pinve)
        acc0 = t0 if acc0 is None else add_mod(acc0, t0, pe)
        acc1 = t1 if acc1 is None else add_mod(acc1, t1, pe)
    out = _div_special(ctx, ht, jnp.stack([acc0, acc1], axis=-3), l)
    d0, d1 = out[..., 0, :, :], out[..., 1, :, :]
    if squeeze:
        d0, d1 = d0[0], d1[0]
    elif lead is not None:
        d0 = d0.reshape(lead + d0.shape[-2:])
        d1 = d1.reshape(lead + d1.shape[-2:])
    return d0, d1


def keyswitch_apply(ctx: CryptoContext, ksk, c_ntt, l: int):
    """Dispatch on key shape: hybrid ((n, 2, l+1, N)) vs plain gadget
    ((l, 2, l, N)).  All keyswitch consumers (relinearize, rekey,
    Galois) go through here, so both key formats interoperate."""
    if ksk.shape[-2] == l + 1:
        return hybrid_keyswitch_apply(ctx, ksk, c_ntt, l)
    return gadget_keyswitch_apply(ctx, ksk, c_ntt, l)


def relinearize(ctx: CryptoContext, rlk_keys, ct: Ciphertext) -> Ciphertext:
    """Degree-2 -> degree-1 via the CRT-idempotent gadget.

    c2 = sum_j [c2]_{p_j} * E_j; each digit d_j (one coefficient-domain
    limb, broadcast/reduced to all limbs) multiplies the key ciphertext
    encrypting E_j * s^2.
    """
    assert ct.k == 3 and ct.is_ntt
    l = ct.level
    rk = rlk_keys[l]                       # hybrid or gadget key
    p = ctx.lp(l)
    lead = ct.data.shape[:-3]
    data = ct.data.reshape((-1,) + ct.data.shape[-3:])   # (B, 3, l, N)
    d0, d1 = keyswitch_apply(ctx, rk, data[:, 2], l)
    acc0 = add_mod(data[:, 0], d0, p)
    acc1 = add_mod(data[:, 1], d1, p)
    out = jnp.stack([acc0, acc1], axis=-3).reshape(lead + (2, l, ctx.n))
    return Ciphertext(out, l, True, ct.pt_corr)


def rekey(ctx: CryptoContext, ksk, ct: Ciphertext) -> Ciphertext:
    """Switch ct from the OLD secret to the NEW one without decrypting.

    ksk = cipher.rekey_keygen(...)[ct.level]: gadget keyswitch keys
    old_s -> new_s.  Decomposing c1 and accumulating against the key
    ciphertexts yields (d0, d1) with d0 + d1*new_s = c1*old_s + t*e_ks,
    so (c0 + d0, d1) decrypts to the same message under new_s, with
    additive keyswitch noise only.
    """
    assert ct.k == 2 and ct.is_ntt
    l = ct.level
    lead = ct.data.shape[:-3]
    data = ct.data.reshape((-1,) + ct.data.shape[-3:])   # (B, 2, l, N)
    d0, d1 = keyswitch_apply(ctx, ksk, data[:, 1], l)
    c0 = add_mod(data[:, 0], d0, ctx.lp(l))
    out = jnp.stack([c0, d1], axis=-3).reshape(lead + (2, l, ctx.n))
    return Ciphertext(out, l, True, ct.pt_corr)


# ---------------------------------------------------------------------------
# Modulus switching (noise management / ciphertext compression)
# ---------------------------------------------------------------------------


def mod_switch(ctx: CryptoContext, ct: Ciphertext) -> Ciphertext:
    """Drop the last active limb: ct mod q -> ct mod q/p_d.

    c' = (c - delta) / p_d with delta ≡ c (mod p_d), delta ≡ 0 (mod t),
    delta centered-small.  Noise shrinks by ~p_d; the message picks up a
    factor [p_d^{-1}]_t which `rns_decode_centered` undoes via the
    per-level correction table.
    """
    l = ct.level
    assert l >= 2 and ct.k == 2 and ct.is_ntt
    # Static headroom check: the rounding term delta/p_d has coefficients
    # up to ~t*N/2 (ternary secret), plus the message's t/2 — the remaining
    # modulus must dominate both or decryption fails.  With 31-bit limbs
    # and t ~ 2^30 this forbids switching below level 2.
    if ctx.q_at(l - 1) < 4 * ctx.t * ctx.n:
        raise ValueError(
            f"mod_switch to level {l - 1} leaves insufficient noise headroom "
            f"(q'={ctx.q_at(l - 1).bit_length()} bits vs t={ctx.t.bit_length()} "
            f"bits, N={ctx.n})")
    lt = ctx.levels[l]
    lead = ct.data.shape[:-2]                         # (..., k) batch+poly
    flat = ct.data.reshape((-1,) + ct.data.shape[-2:])   # (B*k, l, N)
    # Only the DROPPED limb leaves the NTT domain (same transform
    # economy as arith._div_special): the delta correction is computed
    # coefficient-wise from it, transformed forward over the remaining
    # limbs, and the subtract + multiply-by-p_d^{-1} stay pointwise in
    # the NTT domain — l transforms per poly instead of 2l - 1,
    # bit-identical results.
    pd = ctx.p[l - 1, 0]
    pd_inv = ctx.p_neg_inv[l - 1, 0]
    pd_plan = _single_prime_plan(ctx, int(ctx.primes[l - 1]))
    c_last = ntt_inv(pd_plan, flat[..., l - 1:, :])   # (B*k, 1, N) coeff
    u = mont_mul(c_last, lt.t_inv_mont_pd[0, 0], pd, pd_inv)  # [c*t^{-1}]_{p_d}
    p, pinv = ctx.lp(l - 1), ctx.lpinv(l - 1)
    w = barrett_reduce(u, p, ctx.mu_p[: l - 1])       # (B*k, l-1, N)
    w = jnp.where(u > lt.pd_half[0, 0], sub_mod(w, lt.pd_mod_pi, p), w)
    delta = ntt_fwd(ctx.plan, mont_mul(w, ctx.t_mont_p[: l - 1], p, pinv))
    out = mont_mul(sub_mod(flat[..., : l - 1, :], delta, p),
                   lt.inv_pd_mont, p, pinv)
    out = out.reshape(lead + (l - 1, ctx.n))
    return Ciphertext(out, l - 1, True,
                      ct.pt_corr * ctx.primes[l - 1] % ctx.t)


def mod_switch_to(ctx: CryptoContext, ct: Ciphertext, level: int) -> Ciphertext:
    while ct.level > level:
        ct = mod_switch(ctx, ct)
    return ct
