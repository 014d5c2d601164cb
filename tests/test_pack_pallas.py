"""Fused Pallas scoring kernel: bit-exact vs the XLA fold and the oracle.

Runs the kernel (ops/pack_pallas.py) in Pallas interpreter mode on the
CPU backend; on real TPU the same kernel compiles via Mosaic and is
additionally gated by bench.py's `(got == want).all()` check at
production size.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fhe_icp_tpu.ops import pack, pack_pallas
from fhe_icp_tpu.ops.cipher import rns_decode_centered
from fhe_icp_tpu.ops.params import CryptoParams
from fhe_icp_tpu.ops.runtime import FheRuntime


@pytest.fixture(scope="module")
def rt():
    params = CryptoParams("pp-512", n=512, n_limbs=2, allow_insecure=True)
    r = FheRuntime(params)
    r.generate_keys(seed=0)
    return r


def _operands(rt, groups, d=128, seed=0):
    ctx, sk = rt.ctx, rt.keys.sk
    slots = pack.slots_per_ct(ctx.n, d)
    batch = groups * slots
    rng = np.random.default_rng(seed)
    docs = rng.integers(-1000, 1001, size=(batch, d)).astype(np.int32)
    query = rng.integers(-1000, 1001, size=(d,)).astype(np.int32)
    polys = pack.encode_packed(jnp.asarray(docs.reshape(groups, slots, d)),
                               ctx.n)
    ct = rt.encrypt(np.asarray(polys), seed=1)
    doc_op = pack.make_packed_doc_operand(ctx, ct.data, ct.level)
    q_op = pack.make_packed_query_operand(ctx, sk, jnp.asarray(query), d,
                                          ct.level)
    return ctx, doc_op, q_op, docs, query, slots


@pytest.mark.parametrize("groups", [1, 3, 8])
def test_fused_residues_match_xla_fold(rt, groups):
    ctx, doc_op, q_op, docs, query, slots = _operands(rt, groups)
    la = doc_op.digits.shape[0]
    vmat = q_op.digits                        # (L, 2N, 4S) matmul layout
    part = jax.lax.dot_general(
        doc_op.digits, vmat, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)
    want = pack.fold_separable(ctx, part, doc_op.level, slots)
    got = pack_pallas.packed_score_residues(
        ctx, doc_op.digits, vmat, doc_op.level, slots, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_fused_scores_match_oracle(rt):
    ctx, doc_op, q_op, docs, query, slots = _operands(rt, groups=4)
    la = doc_op.digits.shape[0]
    vmat = q_op.digits                        # (L, 2N, 4S) matmul layout
    acc = pack_pallas.packed_score_residues(
        ctx, doc_op.digits, vmat, doc_op.level, slots, interpret=True)
    res = jnp.moveaxis(acc, 0, -1)[..., None]
    scores = rns_decode_centered(ctx, res, doc_op.level, 1)[..., 0]
    got = np.asarray(scores, np.int64).reshape(-1)
    want = docs.astype(np.int64) @ query.astype(np.int64)
    np.testing.assert_array_equal(got, want)
