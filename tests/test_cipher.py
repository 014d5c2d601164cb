"""BGV encrypt/decrypt, homomorphic ops, relinearization, modswitch.

Runs on a tiny (insecure, test-only) 512-degree ring through the jitted
FheRuntime; the crypto math is ring-size independent.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fhe_icp_tpu.ops.params import CryptoParams
from fhe_icp_tpu.ops.runtime import FheRuntime

RNG = np.random.default_rng(3)

TEST_PARAMS = CryptoParams("test-512", n=512, n_limbs=3, allow_insecure=True)


@pytest.fixture(scope="module")
def rt():
    r = FheRuntime(TEST_PARAMS)
    r.generate_keys(seed=0)
    return r


def rand_msg(rt, shape=(), hi=1000):
    return jnp.asarray(
        RNG.integers(-hi, hi + 1, size=shape + (rt.ctx.n,)), dtype=jnp.int32)


def naive_negacyclic_int(a, b, t):
    """Integer negacyclic product mod t, centered — plaintext-space oracle."""
    n = len(a)
    out = np.zeros(n, dtype=object)
    for i in range(n):
        ai = int(a[i])
        if ai:
            for j in range(n):
                k = i + j
                if k < n:
                    out[k] += ai * int(b[j])
                else:
                    out[k - n] -= ai * int(b[j])
    return np.asarray([((int(v) + t // 2) % t) - t // 2 for v in out],
                      dtype=np.int64)


def test_encrypt_decrypt_sym(rt):
    m = rand_msg(rt, hi=rt.ctx.t // 2 - 1)
    out = rt.decrypt(rt.encrypt(m, seed=1))
    assert (np.asarray(out) == np.asarray(m)).all()


def test_encrypt_decrypt_pk(rt):
    m = rand_msg(rt, hi=1 << 20)
    out = rt.decrypt(rt.encrypt_public(m, seed=2))
    assert (np.asarray(out) == np.asarray(m)).all()


def test_encrypt_decrypt_batched(rt):
    m = rand_msg(rt, shape=(4,))
    ct = rt.encrypt(m, seed=3)
    assert ct.data.shape == (4, 2, rt.ctx.n_limbs, rt.ctx.n)
    out = rt.decrypt(ct)
    assert (np.asarray(out) == np.asarray(m)).all()


def test_encryption_is_randomized(rt):
    m = rand_msg(rt)
    c1 = rt.encrypt(m, seed=4)
    c2 = rt.encrypt(m, seed=5)
    assert not (np.asarray(c1.data) == np.asarray(c2.data)).all()


def test_homomorphic_add_sub_neg(rt):
    a, b = rand_msg(rt), rand_msg(rt)
    ca, cb = rt.encrypt(a, seed=6), rt.encrypt(b, seed=7)
    assert (np.asarray(rt.decrypt(rt.add(ca, cb))) == np.asarray(a + b)).all()
    assert (np.asarray(rt.decrypt(rt.sub(ca, cb))) == np.asarray(a - b)).all()
    assert (np.asarray(rt.decrypt(rt.neg(ca))) == np.asarray(-a)).all()


def test_mul_ct_relin(rt):
    a, b = rand_msg(rt, hi=30), rand_msg(rt, hi=30)
    ca, cb = rt.encrypt(a, seed=8), rt.encrypt(b, seed=9)
    want = naive_negacyclic_int(np.asarray(a), np.asarray(b), rt.ctx.t)
    prod3 = rt.mul_ct(ca, cb, relinearize=False)
    assert prod3.k == 3
    # Degree-2 decrypt (uses s^2) must already be exact.
    assert (np.asarray(rt.decrypt(prod3), dtype=np.int64) == want).all()
    # And after relinearization back to 2 polys.
    prod2 = rt.mul_ct(ca, cb, relinearize=True)
    assert prod2.k == 2
    assert (np.asarray(rt.decrypt(prod2), dtype=np.int64) == want).all()


def test_mod_switch(rt):
    a = rand_msg(rt)
    ca = rt.encrypt(a, seed=10)
    cs = rt.mod_switch(ca)
    assert cs.level == rt.ctx.n_limbs - 1
    assert (np.asarray(rt.decrypt(cs)) == np.asarray(a)).all()
    # Switching below level 2 would leave q' ~ 2*t — no noise headroom;
    # the op must refuse (parameter physics, not a bug).
    with pytest.raises(ValueError):
        rt.mod_switch(cs)


def test_mod_switch_after_mul(rt):
    """The standard BGV order: multiply + relinearize, THEN switch down.

    (Multiplying two already-switched ciphertexts is parametrically
    impossible at these sizes: post-switch noise is ~t*N, and a product
    squares it past q.  The op tracks pt_corr so decrypt stays exact.)
    """
    a, b = rand_msg(rt, hi=30), rand_msg(rt, hi=30)
    ca, cb = rt.encrypt(a, seed=11), rt.encrypt(b, seed=12)
    want = naive_negacyclic_int(np.asarray(a), np.asarray(b), rt.ctx.t)
    prod = rt.mod_switch(rt.mul_ct(ca, cb, relinearize=True))
    assert prod.level == rt.ctx.n_limbs - 1
    assert prod.pt_corr == rt.ctx.primes[rt.ctx.n_limbs - 1] % rt.ctx.t
    assert (np.asarray(rt.decrypt(prod), dtype=np.int64) == want).all()


def test_pt_corr_add_of_switched(rt):
    """Two switched ciphertexts share a pt_corr; add stays exact."""
    a, b = rand_msg(rt), rand_msg(rt)
    ca = rt.mod_switch(rt.encrypt(a, seed=21))
    cb = rt.mod_switch(rt.encrypt(b, seed=22))
    assert ca.pt_corr == cb.pt_corr != 1
    out = rt.add(ca, cb)
    assert out.pt_corr == ca.pt_corr
    assert (np.asarray(rt.decrypt(out)) == np.asarray(a + b)).all()


def test_dot_ct_pt(rt):
    d = 128
    a = jnp.asarray(RNG.integers(-1000, 1001, size=(d,)), dtype=jnp.int32)
    b = jnp.asarray(RNG.integers(-1000, 1001, size=(d,)), dtype=jnp.int32)
    ct = rt.encrypt_vector(a, seed=13)
    got = int(rt.decrypt_dot(rt.dot_ct_pt(ct, b), d))
    want = int(np.asarray(a, np.int64) @ np.asarray(b, np.int64))
    assert got == want


def test_dot_ct_ct(rt):
    d = 64
    a = jnp.asarray(RNG.integers(-200, 201, size=(d,)), dtype=jnp.int32)
    b = jnp.asarray(RNG.integers(-200, 201, size=(d,)), dtype=jnp.int32)
    ca = rt.encrypt_vector(a, seed=14)
    cb = rt.encrypt_vector(b, seed=15, rev=True)
    got = int(rt.decrypt_dot(rt.dot_ct_ct(ca, cb), d))
    want = int(np.asarray(a, np.int64) @ np.asarray(b, np.int64))
    assert got == want


def test_matvec_ct_pt(rt):
    d, batch = 128, 8
    docs = jnp.asarray(RNG.integers(-1000, 1001, size=(batch, d)),
                       dtype=jnp.int32)
    q = jnp.asarray(RNG.integers(-1000, 1001, size=(d,)), dtype=jnp.int32)
    cts = rt.encrypt_vector(docs, seed=16)
    got = np.asarray(rt.decrypt_dot(rt.matvec(cts, q), d), dtype=np.int64)
    want = np.asarray(docs, np.int64) @ np.asarray(q, np.int64)
    assert (got == want).all()


def test_dot_ct_ct_deg2_matches_relinearized(rt):
    """The degree-2 (unrelinearized) product decrypts bit-identically to
    the relinearized one — the basis of the fast immediate-decrypt
    compare path (ops/dot.dot_ct_ct_deg2, batch.compare_encrypted)."""
    d = 64
    a = jnp.asarray(RNG.integers(-200, 201, size=(d,)), dtype=jnp.int32)
    b = jnp.asarray(RNG.integers(-200, 201, size=(d,)), dtype=jnp.int32)
    ca = rt.encrypt_vector(a, seed=24)
    cb = rt.encrypt_vector(b, seed=25, rev=True)
    want = int(np.asarray(a, np.int64) @ np.asarray(b, np.int64))
    deg2 = rt.dot_ct_ct(ca, cb, relinearize=False)
    assert deg2.k == 3
    assert int(rt.decrypt_dot(deg2, d)) == want
    assert int(rt.decrypt_dot(rt.dot_ct_ct(ca, cb), d)) == want
