"""Noise-budget accounting (exact, host-side diagnostic).

The reference has no analog — Concrete hides noise management entirely.
Budget here = log2(q/2) - log2(max |c0 + c1*s|_centered): bits of
headroom before decryption failure.  Computed with exact Python big-int
CRT over a coefficient subsample; intended for tests, debugging, and the
per-ciphertext validity checks in the document store (SURVEY.md §5
failure-detection parity).
"""

from __future__ import annotations

import numpy as np

from .cipher import Ciphertext, SecretKey, _phase
from .context import CryptoContext
from .ntt import ntt_inv


def phase_centered(ctx: CryptoContext, sk: SecretKey, ct: Ciphertext,
                   max_coeffs: int = 256) -> np.ndarray:
    """Exact centered phase values (object array of Python ints).

    Batched ciphertexts are inspected across EVERY batch element (the
    coefficient subsample is divided among them), so the returned worst
    case covers the whole batch — not just element 0.
    """
    x = np.asarray(ntt_inv(ctx.plan, _phase(ctx, sk, ct)))
    l = ct.level
    primes = ctx.primes[:l]
    q = 1
    for p in primes:
        q *= p
    x = x.reshape(-1, l, ctx.n)                    # flatten batch dims
    b = x.shape[0]
    per = max(1, min(max_coeffs // b, ctx.n))
    idx = np.linspace(0, ctx.n - 1, per).astype(int)
    recon_consts = [(q // p) * pow((q // p) % p, -1, p) % q for p in primes]
    out = []
    for e in range(b):
        for i in idx:
            v = 0
            for j in range(l):
                v = (v + int(x[e, j, i]) * recon_consts[j]) % q
            out.append(v - q if v > q // 2 else v)
    return np.asarray(out, dtype=object)


def noise_budget_bits_batch(ctx: CryptoContext, sk: SecretKey,
                            ct: Ciphertext, coeffs_per_ct: int = 32
                            ) -> np.ndarray:
    """Per-element noise budgets for a batched ciphertext: (B,) int array.

    One device dispatch computes the phase for the WHOLE batch (vs one
    dispatch per document in a naive loop — the round-3 `validate --deep`
    cost model); the exact big-int CRT reconstruction then runs host-side
    over a `coeffs_per_ct`-coefficient subsample of each element.
    """
    x = np.asarray(ntt_inv(ctx.plan, _phase(ctx, sk, ct)))
    l = ct.level
    primes = ctx.primes[:l]
    q = 1
    for p in primes:
        q *= p
    x = x.reshape(-1, l, ctx.n)
    b = x.shape[0]
    per = max(1, min(coeffs_per_ct, ctx.n))
    idx = np.linspace(0, ctx.n - 1, per).astype(int)
    recon = [(q // p) * pow((q // p) % p, -1, p) % q for p in primes]
    q_half_bits = (q // 2).bit_length()
    out = np.empty(b, dtype=np.int64)
    for e in range(b):
        worst = 0
        for i in idx:
            v = 0
            for j in range(l):
                v = (v + int(x[e, j, i]) * recon[j]) % q
            v = abs(v - q) if v > q // 2 else v
            if v > worst:
                worst = v
        out[e] = (q.bit_length() - 1 if worst == 0
                  else q_half_bits - worst.bit_length())
    return out


def noise_budget_bits(ctx: CryptoContext, sk: SecretKey, ct: Ciphertext,
                      max_coeffs: int = 256) -> int:
    """Bits of headroom: floor(log2(q/2 / max|phase|)).

    The centered phase saturates at q/2, so 0 is the floor and means the
    ciphertext is broken (noise has wrapped); healthy ciphertexts report
    a comfortably positive number.
    """
    vals = phase_centered(ctx, sk, ct, max_coeffs)
    worst = max((abs(int(v)) for v in vals), default=0)
    q = 1
    for p in ctx.primes[: ct.level]:
        q *= p
    if worst == 0:
        return q.bit_length() - 1
    return (q // 2).bit_length() - worst.bit_length()
