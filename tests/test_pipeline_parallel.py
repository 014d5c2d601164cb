"""Pipeline parallelism: 2-stage microbatched scoring, bit-exact.

Runs the GPipe-style pipeline (parallel/pipeline.py) on a 2-device pp
mesh (8-virtual-device CPU backend) and gates it against both the int64
oracle and the single-device packed_scores path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fhe_icp_tpu.ops import pack
from fhe_icp_tpu.ops.params import CryptoParams
from fhe_icp_tpu.ops.runtime import FheRuntime
from fhe_icp_tpu.parallel.pipeline import make_pipelined_scores, make_pp_mesh


@pytest.fixture(scope="module")
def rt():
    params = CryptoParams("pp2-512", n=512, n_limbs=2, allow_insecure=True)
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
    la = doc_op.digits.shape[0]
    vmat = q_op.digits                        # (L, 2N, 4S) matmul layout
    return ctx, doc_op, q_op, vmat, docs, query, slots


@pytest.mark.parametrize("groups,n_micro", [(4, 4), (8, 2), (6, 3)])
def test_pipelined_scores_exact(rt, groups, n_micro):
    ctx, doc_op, q_op, vmat, docs, query, slots = _operands(rt, groups)
    mesh = make_pp_mesh(2)
    fn = make_pipelined_scores(ctx, mesh, doc_op.level, slots, n_micro)
    got = np.asarray(fn(doc_op.digits, vmat), np.int64).reshape(-1)
    want = docs.astype(np.int64) @ query.astype(np.int64)
    np.testing.assert_array_equal(got, want)


def test_pipeline_matches_single_device_path(rt):
    ctx, doc_op, q_op, vmat, docs, query, slots = _operands(rt, groups=8,
                                                            seed=3)
    mesh = make_pp_mesh(2)
    fn = make_pipelined_scores(ctx, mesh, doc_op.level, slots, n_micro=4)
    pp = np.asarray(fn(doc_op.digits, vmat))
    ref = np.asarray(pack.packed_scores(ctx, doc_op, q_op, impl="xla"))
    np.testing.assert_array_equal(pp, ref)
