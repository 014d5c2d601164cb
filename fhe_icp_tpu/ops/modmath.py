"""Vectorized uint32 modular arithmetic for TPU.

TPUs have no native 64-bit integer datapath, so every 32x32->64 product is
built from 16-bit digit products on the VPU (uint32 lanes).  All functions
are shape-polymorphic, branch-free, and bit-exact: they compute the same
integers on CPU and TPU and inside Pallas kernels.

Conventions
-----------
* Primes p satisfy 2^30 < p < 2^31 (see `primes.ntt_primes`), so values
  mod p fit uint32 with one bit of headroom: a+b < 2^32 and 2p < 2^32.
* Montgomery domain uses R = 2^32.  `mont_mul(a, b) = a*b*R^{-1} mod p`.
  Keeping *constants* in Montgomery form makes `mont_mul(x, c_mont)`
  compute `x*c mod p` with x in the normal domain.
* `shoup_mul(a, w, w_sh, p)` computes `a*w mod p` for a constant w < p
  with precomputed `w_sh = floor(w*2^32/p)`; `a` may be any uint32
  (Harvey's bound), which permits lazy inputs.

This file replaces the innermost native layer of the reference stack
(Concrete's Rust/C++ modular arithmetic — /root/reference/requirements.txt:5-7);
the reference itself contains no such code.
"""

from __future__ import annotations

import jax.numpy as jnp

U32 = jnp.uint32
# Plain Python int (not a jnp scalar): weak-typed literals fold into ops,
# keeping these functions usable inside Pallas kernels, which reject
# captured device constants.
_MASK16 = 0xFFFF


def umulhi32(a, b):
    """High 32 bits of the 64-bit product of two uint32 arrays."""
    ah, al = a >> 16, a & _MASK16
    bh, bl = b >> 16, b & _MASK16
    ll = al * bl
    lh = al * bh
    hl = ah * bl
    # cross < 2^16 + 2*(2^16-1)^2>>16 < 2^18: no overflow.
    cross = (ll >> 16) + (lh & _MASK16) + (hl & _MASK16)
    return ah * bh + (lh >> 16) + (hl >> 16) + (cross >> 16)


def umul32_wide(a, b):
    """(hi, lo) uint32 pair of the full 64-bit product."""
    return umulhi32(a, b), a * b


def add_mod(a, b, p):
    """(a + b) mod p for a, b in [0, p)."""
    s = a + b
    return jnp.where(s >= p, s - p, s)


def sub_mod(a, b, p):
    """(a - b) mod p for a, b in [0, p)."""
    return jnp.where(a >= b, a - b, a + (p - b))


def neg_mod(a, p):
    """(-a) mod p for a in [0, p)."""
    return jnp.where(a == 0, a, p - a)


def mont_mul(a, b, p, p_neg_inv):
    """Montgomery product a*b*R^{-1} mod p (R = 2^32), inputs < p... < R.

    REDC: t = a*b; m = t_lo * (-p^{-1}) mod R; res = (t + m*p) / R < 2p,
    then one conditional subtract.  t_lo + (m*p)_lo is 0 or exactly 2^32,
    so the carry is simply (t_lo != 0).
    """
    t_lo = a * b
    t_hi = umulhi32(a, b)
    m = t_lo * p_neg_inv
    mp_hi = umulhi32(m, p)
    res = t_hi + mp_hi + (t_lo != 0).astype(U32)
    return jnp.where(res >= p, res - p, res)


def shoup_mul(a, w, w_sh, p):
    """a*w mod p via Shoup's trick; w < p constant, a any uint32."""
    q = umulhi32(a, w_sh)
    r = a * w - q * p
    return jnp.where(r >= p, r - p, r)


def barrett_reduce(x, p, mu):
    """x mod p for any uint32 x, with mu = floor(2^32/p) precomputed."""
    q = umulhi32(x, mu)
    r = x - q * p
    r = jnp.where(r >= p, r - p, r)
    return jnp.where(r >= p, r - p, r)


def to_mont(a, p, p_neg_inv, r2_mod_p):
    """Map a (normal domain) to Montgomery domain: a*R mod p."""
    return mont_mul(a, r2_mod_p, p, p_neg_inv)


def from_mont(a, p, p_neg_inv):
    """Map a (Montgomery domain) back to normal domain: a*R^{-1} mod p."""
    return mont_mul(a, jnp.uint32(1), p, p_neg_inv)


def mul_mod(a, b, p, p_neg_inv, r2_mod_p):
    """Generic a*b mod p for two data arrays (two Montgomery products)."""
    return mont_mul(a, to_mont(b, p, p_neg_inv, r2_mod_p), p, p_neg_inv)


# ---------------------------------------------------------------------------
# 64-bit fixed-point accumulation helpers (used by exact RNS decode).
# ---------------------------------------------------------------------------

def add64(acc_hi, acc_lo, hi, lo):
    """(acc_hi:acc_lo) += (hi:lo) on uint32 pairs, mod 2^64."""
    new_lo = acc_lo + lo
    carry = (new_lo < lo).astype(U32)
    return acc_hi + hi + carry, new_lo
