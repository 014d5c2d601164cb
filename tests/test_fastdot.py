"""MXU fast-path scoring must be bit-exact vs the reference NTT path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fhe_icp_tpu.ops import fastdot
from fhe_icp_tpu.ops.params import CryptoParams
from fhe_icp_tpu.ops.runtime import FheRuntime

RNG = np.random.default_rng(11)

TEST_PARAMS = CryptoParams("test-512", n=512, n_limbs=3, allow_insecure=True)


@pytest.fixture(scope="module")
def rt():
    r = FheRuntime(TEST_PARAMS)
    r.generate_keys(seed=0)
    return r


def test_balanced_digits_roundtrip():
    x = jnp.asarray(RNG.integers(-(1 << 30), 1 << 30, size=(64,), dtype=np.int64),
                    dtype=jnp.int32)
    d = np.asarray(jax.jit(fastdot.balanced_digits)(x), dtype=np.int64)
    back = sum(d[..., i] * (256 ** i) for i in range(4))
    assert (back == np.asarray(x, dtype=np.int64)).all()
    assert d.min() >= -128 and d.max() <= 127


def test_scores_match_plain_path(rt):
    d, batch = 128, 16
    ctx, sk = rt.ctx, rt.keys.sk
    docs = jnp.asarray(RNG.integers(-1000, 1001, size=(batch, d)),
                       dtype=jnp.int32)
    q = jnp.asarray(RNG.integers(-1000, 1001, size=(d,)), dtype=jnp.int32)
    cts = rt.encrypt_vector(docs, seed=5)

    # Reference path: NTT-domain matvec + single-coefficient decode.
    want = np.asarray(rt.decrypt_dot(rt.matvec(cts, q), d), dtype=np.int64)
    # And the ground truth integers.
    truth = np.asarray(docs, np.int64) @ np.asarray(q, np.int64)
    assert (want == truth).all()

    doc_op = jax.jit(lambda data: fastdot.make_doc_operand(ctx, data, cts.level))(
        cts.data)
    q_op = jax.jit(lambda qq: fastdot.make_query_operand(ctx, sk, qq, d,
                                                         cts.level))(q)
    got = np.asarray(
        jax.jit(lambda a, b: fastdot.scores(ctx, a, b))(doc_op, q_op),
        dtype=np.int64)
    assert (got == truth).all()


def test_scores_large_values(rt):
    """Stress digit decomposition with near-maximal quantized values."""
    d, batch = 128, 8
    ctx, sk = rt.ctx, rt.keys.sk
    docs = jnp.asarray(RNG.choice([-1000, 1000], size=(batch, d)),
                       dtype=jnp.int32)
    q = jnp.asarray(RNG.choice([-1000, 1000], size=(d,)), dtype=jnp.int32)
    cts = rt.encrypt_vector(docs, seed=6)
    doc_op = fastdot.make_doc_operand(ctx, cts.data, cts.level)
    q_op = fastdot.make_query_operand(ctx, sk, q, d, cts.level)
    got = np.asarray(fastdot.scores(ctx, doc_op, q_op), dtype=np.int64)
    truth = np.asarray(docs, np.int64) @ np.asarray(q, np.int64)
    assert (got == truth).all()
