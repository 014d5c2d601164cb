"""Large-ring configuration (BASELINE config 4): N=16384, 12-limb RNS.

Validates the production large-ring preset end to end on CPU (small
batch): exact encrypt/decrypt, encrypted dot products via both the NTT
path and the MXU digit path, and the 128-bit security gate.
"""

import jax
import numpy as np
import pytest

from fhe_icp_tpu.ops import fastdot
from fhe_icp_tpu.ops.params import get_params
from fhe_icp_tpu.ops.runtime import FheRuntime

RNG = np.random.default_rng(29)


@pytest.fixture(scope="module")
def rt():
    r = FheRuntime("ring-16384", rlk_levels=[])   # ct x pt workload
    r.generate_keys(seed=0)
    return r


def test_preset_is_secure():
    p = get_params("ring-16384")
    assert p.n == 16384 and p.n_limbs == 12
    assert p.secure_128, "large-ring preset must pass the security table"


def test_encrypt_decrypt_exact(rt):
    m = np.asarray(RNG.integers(-(rt.ctx.t // 2), rt.ctx.t // 2,
                                size=(rt.ctx.n,), dtype=np.int64),
                   dtype=np.int32)
    out = np.asarray(rt.decrypt(rt.encrypt(m, seed=1)))
    assert (out == m).all()


def test_dot_ct_pt_exact(rt):
    d = 1024                                   # wide vectors in a big ring
    a = RNG.integers(-1000, 1001, size=(d,)).astype(np.int32)
    b = RNG.integers(-1000, 1001, size=(d,)).astype(np.int32)
    ct = rt.encrypt_vector(a, seed=2)
    got = int(rt.decrypt_dot(rt.dot_ct_pt(ct, b), d))
    assert got == int(a.astype(np.int64) @ b.astype(np.int64))


def test_fastdot_matches_large_ring(rt):
    d, batch = 1024, 4
    ctx, sk = rt.ctx, rt.keys.sk
    docs = RNG.integers(-1000, 1001, size=(batch, d)).astype(np.int32)
    q = RNG.integers(-1000, 1001, size=(d,)).astype(np.int32)
    cts = rt.encrypt_vector(docs, seed=3)
    doc_op = fastdot.make_doc_operand(ctx, cts.data, cts.level)
    q_op = fastdot.make_query_operand(ctx, sk, q, d, cts.level)
    got = np.asarray(fastdot.scores(ctx, doc_op, q_op), dtype=np.int64)
    want = docs.astype(np.int64) @ q.astype(np.int64)
    assert (got == want).all()
