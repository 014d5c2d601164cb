"""Known-answer tests for uint32 modular arithmetic vs Python big ints."""

import numpy as np
import jax.numpy as jnp
import pytest

from fhe_icp_tpu.ops import modmath as mm
from fhe_icp_tpu.ops import primes as pr

RNG = np.random.default_rng(42)
P = pr.ntt_primes(3, bits=31)


def u32(x):
    return jnp.asarray(np.asarray(x, dtype=np.uint32))


def test_umulhi32():
    a = RNG.integers(0, 2**32, size=5000, dtype=np.uint32)
    b = RNG.integers(0, 2**32, size=5000, dtype=np.uint32)
    got = np.asarray(mm.umulhi32(u32(a), u32(b)))
    want = (a.astype(object) * b.astype(object)) >> 32
    assert (got.astype(object) == want).all()


@pytest.mark.parametrize("p", P)
def test_mont_mul(p):
    c = pr.mont_constants(p)
    a = RNG.integers(0, p, size=5000, dtype=np.uint32)
    b = RNG.integers(0, p, size=5000, dtype=np.uint32)
    got = np.asarray(mm.mont_mul(u32(a), u32(b), jnp.uint32(p),
                                 jnp.uint32(c["p_neg_inv"])))
    rinv = pow(2**32, -1, p)
    want = np.asarray([int(x) * int(y) * rinv % p for x, y in zip(a, b)],
                      dtype=np.uint32)
    assert (got == want).all()


@pytest.mark.parametrize("p", P)
def test_mont_roundtrip(p):
    c = pr.mont_constants(p)
    a = RNG.integers(0, p, size=1000, dtype=np.uint32)
    am = mm.to_mont(u32(a), jnp.uint32(p), jnp.uint32(c["p_neg_inv"]),
                    jnp.uint32(c["r2_mod_p"]))
    back = np.asarray(mm.from_mont(am, jnp.uint32(p), jnp.uint32(c["p_neg_inv"])))
    assert (back == a).all()


@pytest.mark.parametrize("p", P)
def test_shoup_mul_any_u32_input(p):
    w = RNG.integers(0, p, size=5000, dtype=np.uint32)
    wsh = np.asarray([pr.shoup(int(x), p) for x in w], dtype=np.uint32)
    a = RNG.integers(0, 2**32, size=5000, dtype=np.uint32)  # arbitrary u32
    got = np.asarray(mm.shoup_mul(u32(a), u32(w), u32(wsh), jnp.uint32(p)))
    want = np.asarray([int(x) * int(y) % p for x, y in zip(a, w)],
                      dtype=np.uint32)
    assert (got == want).all()


@pytest.mark.parametrize("p", P)
def test_barrett_reduce(p):
    mu = pr.barrett_mu(p)
    x = RNG.integers(0, 2**32, size=5000, dtype=np.uint32)
    got = np.asarray(mm.barrett_reduce(u32(x), jnp.uint32(p), jnp.uint32(mu)))
    assert (got == x % p).all()


@pytest.mark.parametrize("p", P)
def test_add_sub_neg(p):
    a = RNG.integers(0, p, size=3000, dtype=np.uint32)
    b = RNG.integers(0, p, size=3000, dtype=np.uint32)
    pp = jnp.uint32(p)
    assert (np.asarray(mm.add_mod(u32(a), u32(b), pp)) ==
            (a.astype(np.uint64) + b) % p).all()
    assert (np.asarray(mm.sub_mod(u32(a), u32(b), pp)) ==
            (a.astype(np.int64) - b) % p).all()
    assert (np.asarray(mm.neg_mod(u32(a), pp)) ==
            (-a.astype(np.int64)) % p).all()


def test_mul_mod_generic():
    p = P[0]
    c = pr.mont_constants(p)
    a = RNG.integers(0, p, size=2000, dtype=np.uint32)
    b = RNG.integers(0, p, size=2000, dtype=np.uint32)
    got = np.asarray(mm.mul_mod(u32(a), u32(b), jnp.uint32(p),
                                jnp.uint32(c["p_neg_inv"]),
                                jnp.uint32(c["r2_mod_p"])))
    want = (a.astype(np.uint64) * b % p).astype(np.uint32)
    assert (got == want).all()


def test_primes_properties():
    for p in pr.ntt_primes(14, bits=31):
        assert pr.is_prime(p)
        assert p % (1 << 16) == 1
        assert 2**30 < p < 2**31
