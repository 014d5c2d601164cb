"""Slot-packed scoring: exactness of every packing path.

Covers ops/pack.py: packed encoding round trip, homomorphic packing via
monomial multiplies (vs direct packed encryption), and the packed MXU
digit-matmul scores against an int64 numpy oracle and against the
per-document fastdot path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fhe_icp_tpu.ops import fastdot, pack
from fhe_icp_tpu.ops.cipher import Ciphertext
from fhe_icp_tpu.ops.runtime import FheRuntime


@pytest.fixture(scope="module")
def rt():
    r = FheRuntime("test-512", rlk_levels=[])
    r.generate_keys(seed=7)
    return r


def _docs(rng, b, d, lo=-1000, hi=1001):
    return rng.integers(lo, hi, size=(b, d)).astype(np.int32)


def test_encode_packed_layout():
    n, s, d = 512, 4, 128
    v = np.arange(s * d, dtype=np.int32).reshape(s, d)
    poly = np.asarray(pack.encode_packed(jnp.asarray(v), n))
    for slot in range(s):
        assert (poly[slot * d: (slot + 1) * d] == v[slot]).all()


def test_packed_encrypt_decrypt_roundtrip(rt):
    ctx = rt.ctx
    d = 128
    s = pack.slots_per_ct(ctx.n, d)
    rng = np.random.default_rng(0)
    v = _docs(rng, s, d)
    ct = rt.encrypt(np.asarray(pack.encode_packed(jnp.asarray(v), ctx.n)))
    got = np.asarray(rt.decrypt(ct))
    assert (got[: s * d].reshape(s, d) == v).all()


def test_homomorphic_pack_matches_direct(rt):
    """sum_s ct_s * X^{s*d} decrypts to the directly packed plaintext."""
    ctx = rt.ctx
    d = 128
    s = pack.slots_per_ct(ctx.n, d)
    b = 2 * s + 3                     # two full groups + padded tail
    rng = np.random.default_rng(1)
    docs = _docs(rng, b, d)
    cts = rt.encrypt_vector(docs, seed=3)          # (B, 2, L, N) fwd encoding
    packed = pack.pack_ciphertexts(ctx, cts.data, d, cts.level)
    g = packed.shape[0]
    assert g == 3
    ct_packed = Ciphertext(packed, cts.level, True)
    got = np.asarray(rt.decrypt(ct_packed))        # (G, N)
    padded = np.zeros((g * s, d), dtype=np.int32)
    padded[:b] = docs
    want = padded.reshape(g, s * d)
    assert (got[:, : s * d] == want).all()


@pytest.mark.parametrize("d", [64, 128])
def test_packed_scores_exact(rt, d):
    """Packed MXU scores == int64 oracle == per-doc fastdot scores."""
    ctx, sk = rt.ctx, rt.keys.sk
    s = pack.slots_per_ct(ctx.n, d)
    b = 2 * s
    rng = np.random.default_rng(2)
    docs = _docs(rng, b, d)
    query = _docs(rng, 1, d)[0]

    cts = rt.encrypt_vector(docs, seed=11)
    packed = pack.pack_ciphertexts(ctx, cts.data, d, cts.level)
    doc_op = pack.make_packed_doc_operand(ctx, packed, cts.level)
    q_op = pack.make_packed_query_operand(ctx, sk, jnp.asarray(query), d,
                                          cts.level)
    got = np.asarray(pack.packed_scores(ctx, doc_op, q_op),
                     dtype=np.int64).reshape(-1)[:b]

    want = docs.astype(np.int64) @ query.astype(np.int64)
    assert (got == want).all()

    # Cross-check against the unpacked per-document fast path.
    doc_op1 = fastdot.make_doc_operand(ctx, cts.data, cts.level)
    q_op1 = fastdot.make_query_operand(ctx, sk, jnp.asarray(query), d,
                                       cts.level)
    got1 = np.asarray(fastdot.scores(ctx, doc_op1, q_op1), dtype=np.int64)
    assert (got1 == want).all()


def test_packed_scores_direct_encryption(rt):
    """Directly encrypted packed polys (the bench path) score exactly."""
    ctx, sk = rt.ctx, rt.keys.sk
    d = 128
    s = pack.slots_per_ct(ctx.n, d)
    g = 4
    rng = np.random.default_rng(3)
    docs = _docs(rng, g * s, d)
    query = _docs(rng, 1, d)[0]

    polys = pack.encode_packed(jnp.asarray(docs.reshape(g, s, d)), ctx.n)
    ct = rt.encrypt(np.asarray(polys), seed=5)     # (G, 2, L, N)
    doc_op = pack.make_packed_doc_operand(ctx, ct.data, ct.level)
    q_op = pack.make_packed_query_operand(ctx, sk, jnp.asarray(query), d,
                                          ct.level)
    got = np.asarray(pack.packed_scores(ctx, doc_op, q_op),
                     dtype=np.int64).reshape(-1)
    want = docs.astype(np.int64) @ query.astype(np.int64)
    assert (got == want).all()


def test_packed_query_matches_rowwise_weights(rt):
    """packed_coeff_weights column s == cipher.coeff_weights(s*d+d-1)."""
    from fhe_icp_tpu.ops.cipher import coeff_weights
    ctx = rt.ctx
    d = 128
    s = pack.slots_per_ct(ctx.n, d)
    l = ctx.n_limbs
    w = pack.packed_coeff_weights(ctx, d, s, l)        # (L, N, S)
    for slot in [0, 1, s - 1]:
        row = coeff_weights(ctx, slot * d + d - 1, l)  # (L, N)
        assert (np.asarray(w[:, :, slot]) == np.asarray(row)).all()
