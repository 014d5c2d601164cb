"""Encrypted dot products and batched encrypted matvec.

The flagship operations behind `fhe_cli.py compare` and `search`
(/root/reference/batch_operations.py:206-284):

* `dot_ct_pt`    — encrypted vector . clear vector (ct x pt, one NTT mult)
* `dot_ct_ct`    — encrypted . encrypted (tensor product + relinearize)
* `matvec_ct_pt` — one clear query against a batch of encrypted docs:
  a single batched pointwise multiply in the NTT domain; the reference's
  O(n) per-document predict loop (batch_operations.py:268-279) collapses
  into one fused TPU computation.

Scores are decrypted with the exact RNS decoder; only the single
coefficient carrying the inner product is consumed.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import arith
from .cipher import Ciphertext, decrypt, decrypt_coeff, encrypt_sym
from .context import CryptoContext
from .encoding import encode_fwd, encode_rev, extract_dot


def encrypt_vector(ctx: CryptoContext, sk, key, vec) -> Ciphertext:
    """Encrypt (..., d) int32 vectors in the ascending coefficient encoding."""
    return encrypt_sym(ctx, sk, key, encode_fwd(vec, ctx.n))


def encrypt_vector_rev(ctx: CryptoContext, sk, key, vec) -> Ciphertext:
    """Encrypt in the reversed encoding (right operand of a ct x ct dot)."""
    return encrypt_sym(ctx, sk, key, encode_rev(vec, ctx.n))


def dot_ct_pt(ctx: CryptoContext, ct_a: Ciphertext, b_clear) -> Ciphertext:
    """Ciphertext holding sum_i a_i b_i at coefficient d-1.

    ct_a: encryption of encode_fwd(a); b_clear: (..., d) int32.
    """
    pt = arith.plain_to_eval(ctx, encode_rev(b_clear, ctx.n), ct_a.level)
    return arith.mul_plain(ctx, ct_a, pt)


def dot_ct_ct(ctx: CryptoContext, rlk_keys, ct_a: Ciphertext,
              ct_b_rev: Ciphertext) -> Ciphertext:
    """Fully encrypted inner product: relinearized product ciphertext."""
    prod = arith.mul_ct(ctx, ct_a, ct_b_rev)
    return arith.relinearize(ctx, rlk_keys, prod)


def dot_ct_ct_deg2(ctx: CryptoContext, ct_a: Ciphertext,
                   ct_b_rev: Ciphertext) -> Ciphertext:
    """Encrypted inner product WITHOUT relinearization: degree-2 result.

    Relinearization exists for COMPOSABILITY — storing or further
    processing the product under the standard 2-poly shape.  A consumer
    that decrypts immediately (the CLI `compare` path,
    /root/reference/batch_operations.py:206-238) doesn't need it: the
    decryption phase handles c2*s^2 directly (cipher._phase), the score
    is bit-identical, and the entire hybrid keyswitch (the dominant cost
    of a single compare) drops out.
    """
    return arith.mul_ct(ctx, ct_a, ct_b_rev)


def decrypt_dot(ctx: CryptoContext, sk, ct: Ciphertext, d: int):
    """Decrypt ONLY the inner-product coefficient d-1 -> (...,) int32.

    Uses the single-coefficient decode (one modular dot product against a
    precomputed INTT row) instead of a full INTT — O(N) vs O(N log N).
    """
    return decrypt_coeff(ctx, sk, ct, d - 1)


def matvec_ct_pt(ctx: CryptoContext, cts: Ciphertext, query_clear) -> Ciphertext:
    """Batch of encrypted docs (B leading dim) x one clear query.

    cts.data: (B, k, L, N); query_clear: (d,) int32.  The query is
    NTT-prepared once and broadcast across the batch.
    """
    pt = arith.plain_to_eval(ctx, encode_rev(query_clear, ctx.n), cts.level)
    return arith.mul_plain(ctx, cts, pt)
