"""Sharded encrypted search: batched ciphertext-matvec + top-k over a mesh.

BASELINE.json configs 3/5: one clear query against an encrypted document
store.  The store's ciphertexts (B, 2, L, N) are sharded batch-over-dp
and limbs-over-tp; the pointwise NTT-domain multiply needs no
communication, the exact RNS decode reduces over the limb (tp) axis
(XLA inserts the psum over ICI), and top-k merges across dp.

Replaces the reference's per-document Python predict loop
(/root/reference/batch_operations.py:263-284) with one pjit'd program.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops import dot as fhe_dot
from ..ops.cipher import Ciphertext
from ..ops.context import CryptoContext
from .mesh import batch_sharding, replicated


def make_sharded_search(ctx: CryptoContext, sk, mesh, d: int, level: int,
                        top_k: int = 5):
    """Build a jitted sharded search step.

    Returns fn(cts_data (B, 2, L, N) u32, query (d,) i32) ->
    (scores (B,) i32, topk_vals (k,) i32, topk_idx (k,) i32).
    """
    bs = batch_sharding(mesh)
    rep = replicated(mesh)

    def step(cts_data, query):
        cts = Ciphertext(cts_data, level, True)
        prod = fhe_dot.matvec_ct_pt(ctx, cts, query)
        scores = fhe_dot.decrypt_dot(ctx, sk, prod, d)     # (B,) int32
        vals, idx = jax.lax.top_k(scores, top_k)
        return scores, vals, idx

    return jax.jit(step, in_shardings=(bs, rep),
                   out_shardings=(rep, rep, rep))
