"""BGV keys, encryption, decryption (RNS, NTT-domain ciphertexts).

Scheme: BGV with plaintext in the least-significant position —
    c0 + c1*s  =  m + t*e   (mod q)
Ciphertexts are stored in the NTT domain (bit-reversed order), so
add / ct*pt / ct*ct are purely pointwise; only decomposition-style ops
(relinearization digits, modulus switching) and decryption round-trip
through the coefficient domain.

Replaces the encrypt/run/decrypt surface the reference obtains from
concrete-python (`model.predict(X, fhe="execute")` —
/root/reference/fhe_similarity.py:142-160); here the primitives are
first-class and batched.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .context import CryptoContext
from .modmath import (U32, add64, add_mod, barrett_reduce, mont_mul, neg_mod,
                      shoup_mul, sub_mod, to_mont, umul32_wide, umulhi32)
from .ntt import ntt_fwd, ntt_inv

# ---------------------------------------------------------------------------
# Ciphertext pytree
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
@dataclass
class Ciphertext:
    """data: (..., k, L, N) uint32 — k polys (2, or 3 pre-relin), L limbs.

    `level` = number of active RNS limbs; `is_ntt` = evaluation domain.
    Leading batch dimensions are allowed and flow through every op.
    """

    data: jnp.ndarray
    level: int
    is_ntt: bool = True
    # BGV modulus switching scales the message by p_drop^{-1} (mod t); the
    # factor compounds multiplicatively under ct*ct.  `pt_corr` is the
    # cumulative correction (a Python int mod t) decrypt must multiply by
    # to recover the true message.  1 for fresh ciphertexts.
    pt_corr: int = 1

    def tree_flatten(self):
        return (self.data,), (self.level, self.is_ntt, self.pt_corr)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0], aux[1], aux[2])

    @property
    def k(self) -> int:
        return self.data.shape[-3]

    @property
    def batch_shape(self):
        return self.data.shape[:-3]


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class SecretKey:
    s: jnp.ndarray             # (N,) int32 ternary coefficients
    s_ntt_mont: jnp.ndarray    # (L, N) uint32, NTT domain, Montgomery form
    s2_ntt_mont: jnp.ndarray   # (L, N) uint32, s^2, NTT domain, Montgomery form


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class PublicKey:
    b_ntt: jnp.ndarray         # (L, N) uint32, NTT domain (normal form)
    a_ntt: jnp.ndarray         # (L, N)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class RelinKey:
    """Per-level relinearization keys using the CRT-idempotent gadget.

    c2 = sum_j [c2]_{p_j} * E_j (mod q_l) where E_j is the CRT idempotent
    (1 mod p_j, 0 mod p_i).  `keys[l]` has shape (l, 2, l, N): digit j maps
    to a ciphertext encrypting E_j * s^2, stored NTT-domain in Montgomery
    form so relin is a single mont_mul + accumulate per digit.
    """

    keys: Dict[int, jnp.ndarray]


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class KeySet:
    sk: SecretKey
    pk: PublicKey
    rlk: RelinKey


# ---------------------------------------------------------------------------
# Sampling (all via jax.random — deterministic under a fixed seed)
# ---------------------------------------------------------------------------


def centered_residues(ctx: CryptoContext, v, l: int):
    """Signed int32 poly (..., N), |v| < p_min, to residues (..., L, N) u32.

    Uses two's-complement wrap: for negative v, (2^32+v) + p ≡ p + v (mod 2^32).
    """
    p = ctx.lp(l)
    vu = v.astype(U32)[..., None, :]
    return jnp.where(v[..., None, :] >= 0, vu, vu + p)


def sample_uniform_primes(key, shape, prime_list, n: int):
    """Uniform residues in [0, p_j) over an explicit prime chain."""
    maxval = jnp.asarray(np.asarray(prime_list, dtype=np.int32)[:, None])
    r = jax.random.randint(key, shape + (len(prime_list), n), 0, maxval,
                           dtype=jnp.int32)
    return r.astype(U32)


def sample_uniform(ctx: CryptoContext, key, shape, l: int):
    """Uniform residues in [0, p_j) — a uniform ring element by CRT."""
    return sample_uniform_primes(key, shape, ctx.primes[:l], ctx.n)


def sample_cbd(ctx: CryptoContext, key, shape):
    """Centered binomial error, sigma = sqrt(k/2) ~ 3.16 for k=20. int32."""
    k = ctx.params.cbd_k
    mask = jnp.uint32((1 << k) - 1)
    bits = jax.random.bits(key, shape + (2, ctx.n), dtype=jnp.uint32)
    pc = jax.lax.population_count(bits & mask).astype(jnp.int32)
    return pc[..., 0, :] - pc[..., 1, :]


def sample_ternary(key, shape):
    return jax.random.randint(key, shape, -1, 2, dtype=jnp.int32)


# ---------------------------------------------------------------------------
# Key generation
# ---------------------------------------------------------------------------


def _payload_residues(ctx, e, m_res, l: int):
    """Residues of t*e + m given error e (int32) and message residues m_res."""
    e_res = centered_residues(ctx, e, l)
    te = mont_mul(e_res, ctx.t_mont_p[:l], ctx.lp(l), ctx.lpinv(l))
    return add_mod(te, m_res, ctx.lp(l)) if m_res is not None else te


def gadget_keyswitch_key(ctx: CryptoContext, key, s_ntt_mont,
                         target_ntt, lv: int):
    """(lv, 2, lv, N) uint32 Montgomery: keyswitch key to secret s.

    Digit j is a symmetric encryption under s of E_j * target, where E_j
    is the CRT idempotent (1 mod p_j, 0 mod p_i) and `target_ntt` is the
    NTT-domain normal-form poly being switched FROM (s^2 for
    relinearization, tau_g(s) for Galois rotations).
    """
    p_lv, pinv_lv, r2_lv = ctx.lp(lv), ctx.lpinv(lv), ctx.lr2(lv)
    s_m = s_ntt_mont[:lv]
    per_digit = []
    for j in range(lv):
        key, ka, ke = jax.random.split(key, 3)
        a_j = sample_uniform(ctx, ka, (), lv)
        e_j = sample_cbd(ctx, ke, ())
        b_j = sub_mod(ntt_fwd(ctx.plan, _payload_residues(ctx, e_j, None, lv)),
                      mont_mul(a_j, s_m, p_lv, pinv_lv), p_lv)
        # Add E_j * target: residues equal target in limb j, zero elsewhere.
        limb_mask = (jnp.arange(lv) == j)[:, None]
        b_j = jnp.where(limb_mask, add_mod(b_j, target_ntt[:lv], p_lv), b_j)
        per_digit.append(jnp.stack([b_j, a_j]))
    rk = jnp.stack(per_digit)                      # (lv, 2, lv, N)
    return to_mont(rk, p_lv, pinv_lv, r2_lv)


def hybrid_keyswitch_key(ctx: CryptoContext, key, sk: SecretKey,
                         target_ntt, lv: int, digit_bits: int = 0):
    """(n_dig, 2, lv+1, N) uint32 Montgomery hybrid keyswitch key.

    GHS/SEAL-style keyswitching with one special prime P (SURVEY.md
    §7.3 #3): keys live over the EXTENDED modulus Q_lv * P (special
    limb LAST) and digit (j, h) is a symmetric encryption under s of

        P * B^h * E_j * target        (B = 2^digit_bits)

    where E_j is the CRT idempotent over Q_lv (1 mod p_j, 0 mod p_i and
    0 mod P).  After digit accumulation, arith.hybrid_keyswitch_apply
    divides by P with exact rounding, shrinking the keyswitch noise by
    ~P ≈ 2^31 vs the plain gadget — this is what makes ct x ct compare
    fit 2-limb parameter sets and keeps re-keyed ciphertexts
    multiplication-grade.

    digit_bits=0 uses one full-limb CRT digit per limb (cheapest; digit
    noise ~ p_max/P ≈ 1 error unit per digit — right for relinearization
    and Galois keys, whose noise lands on an already-noisy product).
    digit_bits=16 splits each limb residue into two 16-bit digits
    (2x work; digit noise ~ 2^16/P ≈ 2^-15 error units — right for
    RE-KEYING, which must stay near fresh quality because it feeds
    future multiplications).  In BOTH modes the floor is the divide-by-P
    rounding (arith._div_special): ~0.5 error units per coefficient
    reaching the phase through s (ternary, ~sqrt(N) spread) — measured
    2 bits of budget at pairwise-4096, asserted in
    tests/test_production_preset.py::test_rekey_exact_and_fresh_quality.

    `target_ntt` is the (lv, N) normal-form NTT-domain poly being
    switched FROM (s^2 for relinearization, tau_g(s) for Galois
    rotations, old_s for re-keying).  `sk` is the ENCRYPTING secret;
    its coefficient form extends it to the special limb.
    """
    ht = ctx.hybrid(lv)
    pe, pinve, r2e = ht.p, ht.pinv, ht.r2
    sp = ctx.params.special_prime

    # Secret over the extended chain (NTT domain, Montgomery form).
    s = sk.s
    su = s.astype(U32)[..., None, :]
    s_res = jnp.where(s[..., None, :] >= 0, su, su + pe)
    s_m = to_mont(ntt_fwd(ht.plan, s_res), pe, pinve, r2e)

    d_per = 1 if digit_bits == 0 else -(-31 // digit_bits)
    per_digit = []
    for j in range(lv):
        p_j = ctx.primes[j]
        for h in range(d_per):
            key, ka, ke = jax.random.split(key, 3)
            a = sample_uniform_primes(ka, (), ht.plan.primes, ctx.n)
            e = sample_cbd(ctx, ke, ())
            eu = e.astype(U32)[..., None, :]
            e_res = jnp.where(e[..., None, :] >= 0, eu, eu + pe)
            te = mont_mul(e_res, ht.t_mont, pe, pinve)
            b = sub_mod(ntt_fwd(ht.plan, te), mont_mul(a, s_m, pe, pinve), pe)
            # Add P * B^h * target at limb j only (0 elsewhere and mod P).
            mult = sp * pow(2, digit_bits * h, p_j) % p_j
            add_j = mont_mul(target_ntt[j], jnp.uint32(mult * (1 << 32) % p_j),
                             jnp.uint32(p_j), ctx.p_neg_inv[j, 0])
            b = b.at[j].set(add_mod(b[j], add_j, jnp.uint32(p_j)))
            per_digit.append(jnp.stack([b, a]))
    rk = jnp.stack(per_digit)                      # (n_dig, 2, lv+1, N)
    return to_mont(rk, pe, pinve, r2e)


def rekey_keygen(ctx: CryptoContext, key, old_sk: SecretKey,
                 new_sk: SecretKey, levels: Optional[list] = None
                 ) -> Dict[int, jnp.ndarray]:
    """Keyswitch keys old_s -> new_s, per level: {lv: (lv, 2, lv, N)}.

    Enables homomorphic store re-keying on rotation: a ciphertext under
    the OLD secret is converted to one under the NEW secret without ever
    decrypting (arith.rekey).  This is strictly stronger than the
    reference's grace-period scheme, which merely keeps old keys
    loadable (/root/reference/key_management.py:243-268) and leaves the
    store bound to the retired key forever.

    The key material is the hybrid keyswitch construction with FINE
    (16-bit) digits: re-keyed ciphertexts gain < 1 error unit of noise,
    so they remain multiplication-grade — compare/search over a
    migrated store behaves exactly like a fresh one.  Like an RLWE
    public key the material is safe to store unencrypted.  Level 1 is
    excluded: keyswitching below level 2 has no noise headroom.
    """
    l = ctx.n_limbs
    levels = list(levels) if levels is not None else list(range(2, l + 1))
    out: Dict[int, jnp.ndarray] = {}
    for lv in levels:
        assert lv >= 2, "rekey below level 2 has no noise headroom"
        key, k_lv = jax.random.split(key)
        old_s_ntt = mont_mul(old_sk.s_ntt_mont[:lv], jnp.uint32(1),
                             ctx.lp(lv), ctx.lpinv(lv))   # normal form
        out[lv] = hybrid_keyswitch_key(ctx, k_lv, new_sk, old_s_ntt, lv,
                                       digit_bits=16)
    return out


def keygen(ctx: CryptoContext, key, rlk_levels: Optional[list] = None) -> KeySet:
    """Generate secret, public, and relinearization keys.

    Mirrors the role of `FHEKeyManager.generate_keys`
    (/root/reference/key_management.py:112-191), but produces real RLWE
    key material instead of an encrypted sklearn config.
    """
    l = ctx.n_limbs
    k_s, k_pk_a, k_pk_e, k_rlk = jax.random.split(key, 4)

    s = sample_ternary(k_s, (ctx.n,))
    s_res = centered_residues(ctx, s, l)
    s_ntt = ntt_fwd(ctx.plan, s_res)
    s_ntt_mont = to_mont(s_ntt, ctx.lp(l), ctx.lpinv(l), ctx.lr2(l))
    # mont_mul of two Montgomery-form operands stays in Montgomery form.
    s2_ntt_mont = mont_mul(s_ntt_mont, s_ntt_mont, ctx.lp(l), ctx.lpinv(l))
    sk = SecretKey(s=s, s_ntt_mont=s_ntt_mont, s2_ntt_mont=s2_ntt_mont)

    # Public key: b = -(a*s) + t*e.
    a_ntt = sample_uniform(ctx, k_pk_a, (), l)
    e = sample_cbd(ctx, k_pk_e, ())
    te_ntt = ntt_fwd(ctx.plan, _payload_residues(ctx, e, None, l))
    as_ntt = mont_mul(a_ntt, s_ntt_mont, ctx.lp(l), ctx.lpinv(l))
    pk = PublicKey(b_ntt=sub_mod(te_ntt, as_ntt, ctx.lp(l)), a_ntt=a_ntt)

    # Relinearization keys per level (hybrid keyswitch keys s^2 -> s).
    levels = rlk_levels if rlk_levels is not None else list(range(2, l + 1))
    rlk_keys: Dict[int, jnp.ndarray] = {}
    for lv in levels:
        k_rlk, k_lv = jax.random.split(k_rlk)
        s2 = mont_mul(s2_ntt_mont[:lv], jnp.uint32(1),
                      ctx.lp(lv), ctx.lpinv(lv))       # normal form
        rlk_keys[lv] = hybrid_keyswitch_key(ctx, k_lv, sk, s2, lv)

    return KeySet(sk=sk, pk=pk, rlk=RelinKey(keys=rlk_keys))


# ---------------------------------------------------------------------------
# Encryption / decryption
# ---------------------------------------------------------------------------


def encrypt_sym(ctx: CryptoContext, sk: SecretKey, key, m) -> Ciphertext:
    """Symmetric encryption of int32 message poly m: (..., N), |m| < t/2."""
    l = ctx.n_limbs
    shape = m.shape[:-1]
    k_a, k_e = jax.random.split(key)
    a_ntt = sample_uniform(ctx, k_a, shape, l)
    e = sample_cbd(ctx, k_e, shape)
    m_res = centered_residues(ctx, m, l)
    pay_ntt = ntt_fwd(ctx.plan, _payload_residues(ctx, e, m_res, l))
    c0 = sub_mod(pay_ntt, mont_mul(a_ntt, sk.s_ntt_mont, ctx.lp(l), ctx.lpinv(l)),
                 ctx.lp(l))
    return Ciphertext(jnp.stack([c0, a_ntt], axis=-3), level=l, is_ntt=True)


def encrypt_pk(ctx: CryptoContext, pk: PublicKey, key, m) -> Ciphertext:
    """Public-key encryption: (c0, c1) = (b*u + t*e0 + m, a*u + t*e1)."""
    l = ctx.n_limbs
    shape = m.shape[:-1]
    k_u, k_e0, k_e1 = jax.random.split(key, 3)
    u = sample_ternary(k_u, shape + (ctx.n,))
    u_ntt_m = to_mont(ntt_fwd(ctx.plan, centered_residues(ctx, u, l)),
                      ctx.lp(l), ctx.lpinv(l), ctx.lr2(l))
    e0 = sample_cbd(ctx, k_e0, shape)
    e1 = sample_cbd(ctx, k_e1, shape)
    m_res = centered_residues(ctx, m, l)
    p, pinv = ctx.lp(l), ctx.lpinv(l)
    c0 = add_mod(mont_mul(pk.b_ntt, u_ntt_m, p, pinv),
                 ntt_fwd(ctx.plan, _payload_residues(ctx, e0, m_res, l)), p)
    c1 = add_mod(mont_mul(pk.a_ntt, u_ntt_m, p, pinv),
                 ntt_fwd(ctx.plan, _payload_residues(ctx, e1, None, l)), p)
    return Ciphertext(jnp.stack([c0, c1], axis=-3), level=l, is_ntt=True)


def _phase(ctx: CryptoContext, sk: SecretKey, ct: Ciphertext):
    """c0 + c1*s (+ c2*s^2), NTT domain, at ct.level."""
    l = ct.level
    p, pinv = ctx.lp(l), ctx.lpinv(l)
    d = ct.data
    x = add_mod(d[..., 0, :, :],
                mont_mul(d[..., 1, :, :], sk.s_ntt_mont[:l], p, pinv), p)
    if ct.k == 3:
        x = add_mod(x, mont_mul(d[..., 2, :, :], sk.s2_ntt_mont[:l], p, pinv), p)
    return x


def rns_decode_centered(ctx: CryptoContext, x, l: int, pt_corr: int = 1):
    """Exact [x]_q mod t (centered) from residues x: (..., L, N) -> int32.

    `pt_corr` (static Python int) undoes the cumulative p_drop^{-1} message
    scaling from modulus switches (see Ciphertext.pt_corr).
    See module docstring of context.py for the Q56 fixed-point analysis.
    """
    lt = ctx.levels[l]
    p = ctx.lp(l)
    y = shoup_mul(x, lt.inv_qhat, lt.inv_qhat_sh, p)       # (..., l, N)

    # v_hat = round(sum_j y_j / p_j) via Q56 fixed point.
    s_hi = jnp.zeros(y.shape[:-2] + (y.shape[-1],), dtype=U32)
    s_lo = jnp.zeros_like(s_hi)
    for j in range(l):
        hi, lo = umul32_wide(y[..., j, :], ctx.v_c[j, 0])
        s_hi, s_lo = add64(s_hi, s_lo, hi, lo)
    v_hat = (s_hi + jnp.uint32(1 << 23)) >> 24

    # m = sum_j (y_j mod t) * (q/p_j) - v_hat * q  (mod t).
    t, tinv, mu_t = ctx.t_u32[0], ctx.t_neg_inv[0], ctx.mu_t[0]
    y_t = barrett_reduce(y, t, mu_t)
    terms = mont_mul(y_t, lt.r_t_mont, t, tinv)
    m = terms[..., 0, :]
    for j in range(1, l):
        m = add_mod(m, terms[..., j, :], t)
    vq = mont_mul(v_hat, lt.q_mod_t_mont[0], t, tinv)
    m = sub_mod(m, vq, t)
    # Undo the cumulative p_drop^{-1} message scaling from modulus switches.
    if pt_corr % ctx.t != 1:
        corr_mont = jnp.uint32(pt_corr % ctx.t * (1 << 32) % ctx.t)
        m = mont_mul(m, corr_mont, t, tinv)

    # Center into (-t/2, t/2] using uint32 wrap + bitcast.
    return jnp.where(m > ctx.t_half[0, 0],
                     jax.lax.bitcast_convert_type(m - t, jnp.int32),
                     jax.lax.bitcast_convert_type(m, jnp.int32))


def decrypt(ctx: CryptoContext, sk: SecretKey, ct: Ciphertext):
    """Decrypt to the centered int32 message poly (..., N)."""
    x_ntt = _phase(ctx, sk, ct)
    x = ntt_inv(ctx.plan, x_ntt)
    return rns_decode_centered(ctx, x, ct.level, ct.pt_corr)


# ---------------------------------------------------------------------------
# Single-coefficient decryption (the dot-product fast path)
# ---------------------------------------------------------------------------


def coeff_weights(ctx: CryptoContext, j: int, l: int):
    """Per-limb row of the INTT matrix for output coefficient j.

    Our NTT-domain vectors are bit-reversed: slot m holds frequency
    bitrev(m).  Coefficient j of ntt_inv(X) is

        out[j] = psi^{-j} * N^{-1} * sum_m X[m] * w^{-j*bitrev(m)}  (mod p)

    so a single coefficient is one length-N modular dot product instead
    of a full O(N log N) INTT — the decisive optimization for encrypted
    dot-product scores, where only coefficient d-1 is consumed.  Weights
    are returned in Montgomery form, cached per (j, l).
    """
    key = ("coeff_w", j, l)
    cached = ctx.cache.get(key)
    if cached is not None:
        return cached
    from . import primes as pr
    n, log_n = ctx.n, ctx.n.bit_length() - 1
    rows = []
    for p in ctx.primes[:l]:
        psi = pr.root_of_unity(p, 2 * n)
        w = psi * psi % p
        n_inv = pow(n, p - 2, p)
        lead = pow(psi, -(j % (2 * n)), p) * n_inv % p
        w_inv = pow(w, p - 2, p)
        row = np.empty(n, dtype=np.uint32)
        for m in range(n):
            f = int(format(m, f"0{log_n}b")[::-1], 2)      # bitrev(m)
            row[m] = lead * pow(w_inv, (j * f) % n, p) % p * (1 << 32) % p
        rows.append(row)
    # Cache as numpy: jnp.asarray inside a jit trace would capture a tracer
    # and poison later traces; numpy constants embed safely in any trace.
    out = np.stack(rows)
    ctx.cache[key] = out
    return out


def tree_sum_mod(x, p):
    """Sum over the last axis mod p via log-depth pairwise add_mod."""
    while x.shape[-1] > 1:
        half = x.shape[-1] // 2
        lo, hi = x[..., :half], x[..., half: 2 * half]
        s = add_mod(lo, hi, p)
        if x.shape[-1] % 2:
            s = s.at[..., :1].set(add_mod(s[..., :1], x[..., -1:], p))
        x = s
    return x


def decrypt_coeff(ctx: CryptoContext, sk: SecretKey, ct: Ciphertext, j: int):
    """Decrypt ONLY coefficient j -> (...,) int32, skipping the full INTT.

    NOTE: leading batch dims are deliberately NOT flattened here.  The
    keyswitch-style rank>3 penalty does not apply to this reduction-
    shaped chain, and a forced reshape of the (often broadcast-built)
    phase operand materializes a copy that breaks the decode fusion —
    measured 8x slower on the 32x32 all-pairs degree-2 decode.
    """
    l = ct.level
    p, pinv = ctx.lp(l), ctx.lpinv(l)
    x = _phase(ctx, sk, ct)                         # (..., l, N) NTT domain
    terms = mont_mul(x, coeff_weights(ctx, j, l), p, pinv)
    res = tree_sum_mod(terms, p)                    # (..., l, 1)
    return rns_decode_centered(ctx, res, l, ct.pt_corr)[..., 0]
