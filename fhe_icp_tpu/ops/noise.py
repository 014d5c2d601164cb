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
    """Exact centered phase values (object array of Python ints)."""
    x = np.asarray(ntt_inv(ctx.plan, _phase(ctx, sk, ct)))
    l = ct.level
    primes = ctx.primes[:l]
    q = 1
    for p in primes:
        q *= p
    idx = np.linspace(0, ctx.n - 1, min(max_coeffs, ctx.n)).astype(int)
    out = []
    # Reduce leading batch dims: inspect the first batch element only.
    while x.ndim > 2:
        x = x[0]
    recon_consts = [(q // p) * pow((q // p) % p, -1, p) % q for p in primes]
    for i in idx:
        v = 0
        for j in range(l):
            v = (v + int(x[j, i]) * recon_consts[j]) % q
        out.append(v - q if v > q // 2 else v)
    return np.asarray(out, dtype=object)


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
