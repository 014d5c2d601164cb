"""CryptoContext: every precomputed table the BGV kernels need.

Built once, host-side, with exact Python big-int arithmetic; all device
tables are uint32.  A context is immutable and closed over by the jitted
functions in `cipher.py` / `arith.py` (it is never a jit argument).

Exact RNS decode (the heart of decryption)
------------------------------------------
Given RNS residues x_j of x in [0, q), the centered representative
[x]_q mod t is computed without big integers:

    y_j = [x_j * (q/p_j)^{-1}]_{p_j}
    x   = sum_j y_j * (q/p_j) - v*q,   with   sum_j y_j / p_j = x/q + v
    centered(x) = sum_j y_j*(q/p_j) - round(sum_j y_j/p_j) * q

(using *round* instead of floor absorbs the centering step).  The sum of
y_j/p_j is accumulated in Q56 fixed point via uint32 pairs: each term is
y_j * floor(2^56/p_j), a 57-bit product kept as (hi, lo) words.  The
one-sided truncation error is < 2^-20 total, so rounding is exact
whenever |noise| < q*(1/2 - 2^-20) — i.e. everywhere short of outright
decryption failure.  Finally the mod-t value is assembled from
precomputed (q/p_j mod t) and (q mod t).

All per-level variants (after modulus switching) are precomputed for
levels 1..n_limbs; level l uses primes[0:l], dropping from the end.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from . import primes as pr
from .ntt import NttPlan, build_plan
from .params import CryptoParams

U32 = np.uint32


def _col(vals) -> jnp.ndarray:
    """(l, 1) uint32 column."""
    return jnp.asarray(np.asarray(vals, dtype=U32)[:, None])


@dataclass(frozen=True)
class HybridTables:
    """Hybrid-keyswitch tables for one level: primes[0:l] + special P.

    The keyswitch key lives over the EXTENDED chain (l+1 limbs, special
    prime LAST); after digit accumulation the result is divided by P
    with the same exact rounding as modulus switching.  Because the key
    encrypts P * target, the division leaves the message term intact —
    no pt_corr change.
    """

    l: int
    plan: NttPlan                # NTT plan over primes[0:l] + (P,)
    p: jnp.ndarray               # (l+1, 1) extended prime column
    pinv: jnp.ndarray            # (l+1, 1) Montgomery -p^{-1}
    r2: jnp.ndarray              # (l+1, 1) R^2 mod p
    mu: jnp.ndarray              # (l+1, 1) Barrett mu
    t_mont: jnp.ndarray          # (l+1, 1) t*R mod p (payload scaling)
    # --- divide-by-P (drop the special limb) ---
    t_inv_mont_sp: jnp.ndarray   # (1,1) [t^{-1}]_P, mont-of-P
    sp_half: jnp.ndarray         # (1,1) P // 2
    sp_mod_pi: jnp.ndarray       # (l,1) P mod p_i
    inv_sp_mont: jnp.ndarray     # (l,1) [P^{-1}]_{p_i}, mont-of-p_i
    t_inv_sp_mont: jnp.ndarray   # (l,1) [t*P^{-1}]_{p_i}, mont-of-p_i


@dataclass(frozen=True)
class LevelTables:
    """Decode + modswitch tables for one level (active primes[0:l])."""

    l: int
    # --- exact centered mod-t decode ---
    inv_qhat: jnp.ndarray        # (l,1) [(q/p_j)^{-1}]_{p_j}
    inv_qhat_sh: jnp.ndarray     # (l,1) Shoup companion
    r_t_mont: jnp.ndarray        # (l,1) (q/p_j mod t) in Montgomery-of-t form
    q_mod_t_mont: jnp.ndarray    # (1,1) (q mod t) in Montgomery-of-t form
    # --- modswitch: drop prime p_d = primes[l-1], go to level l-1 ---
    # (absent at level 1)
    t_inv_mont_pd: jnp.ndarray | None    # (1,1) [t^{-1}]_{p_d}, mont-of-p_d
    pd_half: jnp.ndarray | None          # (1,1) p_d // 2
    pd_mod_pi: jnp.ndarray | None        # (l-1,1) p_d mod p_i
    inv_pd_mont: jnp.ndarray | None      # (l-1,1) [p_d^{-1}]_{p_i}, mont-of-p_i


class CryptoContext:
    """All device tables for one CryptoParams preset."""

    def __init__(self, params: CryptoParams):
        self.params = params
        self.cache: Dict = {}          # derived device tables (see cipher.py)
        self.n = params.n
        self.t = params.t
        self.n_limbs = params.n_limbs
        prime_list = params.primes
        self.primes: Tuple[int, ...] = prime_list
        self.plan: NttPlan = build_plan(self.n, prime_list)

        # Per-limb Montgomery / Barrett constants, shape (L, 1).
        mc = [pr.mont_constants(p) for p in prime_list]
        self.p = _col([p for p in prime_list])
        self.p_neg_inv = _col([c["p_neg_inv"] for c in mc])
        self.r2 = _col([c["r2_mod_p"] for c in mc])
        self.mu_p = _col([pr.barrett_mu(p) for p in prime_list])
        # t and t*R mod p_j (for scaling errors by t in the p_j domain).
        t = params.t
        self.t_mont_p = _col([t * (1 << 32) % p for p in prime_list])
        # v-estimation constants floor(2^56 / p_j) — level independent.
        self.v_c = _col([(1 << 56) // p for p in prime_list])

        # Plaintext-modulus constants (scalars, stored (1,1) for broadcast).
        tc = pr.mont_constants(t)
        self.t_u32 = _col([t])
        self.t_neg_inv = _col([tc["p_neg_inv"]])
        self.r2_t = _col([tc["r2_mod_p"]])
        self.mu_t = _col([pr.barrett_mu(t)])
        self.t_half = _col([t // 2])

        # Per-level tables.
        self.levels: Dict[int, LevelTables] = {}
        for l in range(1, self.n_limbs + 1):
            active = prime_list[:l]
            q = 1
            for p in active:
                q *= p
            inv_qhat, r_t = [], []
            for p in active:
                qhat = q // p
                inv = pow(qhat % p, -1, p)
                inv_qhat.append(inv)
                r_t.append((qhat % t) * (1 << 32) % t)   # mont-of-t form
            q_mod_t_mont = _col([(q % t) * (1 << 32) % t])

            if l >= 2:
                pd = active[-1]
                rest = active[:-1]
                t_inv_mont_pd = _col([pow(t, -1, pd) * (1 << 32) % pd])
                pd_half = _col([pd // 2])
                pd_mod_pi = _col([pd % p for p in rest])
                inv_pd_mont = _col([pow(pd, -1, p) * (1 << 32) % p for p in rest])
            else:
                t_inv_mont_pd = pd_half = pd_mod_pi = inv_pd_mont = None

            self.levels[l] = LevelTables(
                l=l,
                inv_qhat=_col(inv_qhat),
                inv_qhat_sh=_col([pr.shoup(v, p) for v, p in zip(inv_qhat, active)]),
                r_t_mont=_col(r_t),
                q_mod_t_mont=q_mod_t_mont,
                t_inv_mont_pd=t_inv_mont_pd,
                pd_half=pd_half,
                pd_mod_pi=pd_mod_pi,
                inv_pd_mont=inv_pd_mont,
            )

    # -- hybrid keyswitch tables (lazy per level) ---------------------------
    def hybrid(self, l: int) -> HybridTables:
        """Tables for hybrid keyswitching at level l (primes[0:l] + P)."""
        key = ("hybrid", l)
        cached = self.cache.get(key)
        if cached is not None:
            return cached
        assert 2 <= l <= self.n_limbs
        # The first call may happen inside a jit trace (keygen/relin are
        # jitted); force concrete constant arrays so caching them does
        # not leak tracers into later traces.
        import jax
        with jax.ensure_compile_time_eval():
            tables = self._build_hybrid(l)
        self.cache[key] = tables
        return tables

    def _build_hybrid(self, l: int) -> HybridTables:
        sp = self.params.special_prime
        ext = tuple(self.primes[:l]) + (sp,)
        mc = [pr.mont_constants(p) for p in ext]
        t = self.t
        tables = HybridTables(
            l=l,
            plan=build_plan(self.n, ext),
            p=_col(ext),
            pinv=_col([c["p_neg_inv"] for c in mc]),
            r2=_col([c["r2_mod_p"] for c in mc]),
            mu=_col([pr.barrett_mu(p) for p in ext]),
            t_mont=_col([t * (1 << 32) % p for p in ext]),
            t_inv_mont_sp=_col([pow(t, -1, sp) * (1 << 32) % sp]),
            sp_half=_col([sp // 2]),
            sp_mod_pi=_col([sp % p for p in self.primes[:l]]),
            inv_sp_mont=_col([pow(sp, -1, p) * (1 << 32) % p
                              for p in self.primes[:l]]),
            t_inv_sp_mont=_col([t * pow(sp, -1, p) % p * (1 << 32) % p
                                for p in self.primes[:l]]),
        )
        return tables

    # -- convenience slices for a given level ------------------------------
    def lp(self, l: int) -> jnp.ndarray:
        return self.p[:l]

    def lpinv(self, l: int) -> jnp.ndarray:
        return self.p_neg_inv[:l]

    def lr2(self, l: int) -> jnp.ndarray:
        return self.r2[:l]

    def q_at(self, l: int) -> int:
        q = 1
        for p in self.primes[:l]:
            q *= p
        return q

    def __repr__(self):
        return (f"CryptoContext({self.params.name}: N={self.n}, "
                f"L={self.n_limbs}, log q={self.params.log_q}, t={self.t})")
