"""Vector <-> polynomial encodings for encrypted dot products.

The inner product of two length-d vectors is computed with ONE negacyclic
polynomial multiplication and zero rotations:

    A(X) = sum_i a_i X^i          (ascending encoding)
    B(X) = sum_i b_i X^(d-1-i)    (reversed encoding)
    =>  coefficient d-1 of A*B mod (X^N+1)  =  sum_i a_i b_i

since all contributing index pairs satisfy i + (d-1-i) = d-1 < N (no
negacyclic wraparound).  This is how `compare` / `search` scores are
evaluated under encryption, replacing the reference's Concrete circuit
for the quantized weighted sum (/root/reference/fhe_similarity.py:54-58,
batch_operations.py:226).
"""

from __future__ import annotations

import jax.numpy as jnp


def encode_fwd(vec, n: int):
    """(..., d) int32 -> (..., N) poly with a_i at X^i."""
    d = vec.shape[-1]
    assert d <= n
    pad = [(0, 0)] * (vec.ndim - 1) + [(0, n - d)]
    return jnp.pad(vec.astype(jnp.int32), pad)


def encode_rev(vec, n: int):
    """(..., d) int32 -> (..., N) poly with b_i at X^(d-1-i)."""
    return encode_fwd(jnp.flip(vec.astype(jnp.int32), axis=-1), n)


def extract_dot(poly, d: int):
    """Read the inner product from coefficient d-1 of the product poly."""
    return poly[..., d - 1]
