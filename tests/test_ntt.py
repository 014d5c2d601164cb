"""NTT correctness: roundtrip and exact negacyclic convolution.

All device calls are jitted — eager per-primitive dispatch is pathologically
slow on this backend, and production paths are always jitted anyway.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fhe_icp_tpu.ops import modmath as mm
from fhe_icp_tpu.ops import primes as pr
from fhe_icp_tpu.ops.ntt import build_plan, ntt_fwd, ntt_inv

RNG = np.random.default_rng(7)


def naive_negacyclic(a, b, p):
    """Schoolbook negacyclic convolution with Python big ints (oracle)."""
    n = len(a)
    out = [0] * n
    for i in range(n):
        ai = int(a[i])
        if ai == 0:
            continue
        for j in range(n):
            k = i + j
            v = ai * int(b[j])
            if k < n:
                out[k] = (out[k] + v) % p
            else:
                out[k - n] = (out[k - n] - v) % p
    return np.asarray(out, dtype=np.uint32)


def make_roundtrip(plan):
    return jax.jit(lambda x: ntt_inv(plan, ntt_fwd(plan, x)))


@pytest.mark.parametrize("n", [64, 256, 1024])
def test_roundtrip(n):
    primes = pr.ntt_primes(3, bits=31)
    plan = build_plan(n, primes)
    x = np.stack([RNG.integers(0, p, size=n, dtype=np.uint32) for p in primes])
    back = np.asarray(make_roundtrip(plan)(jnp.asarray(x)))
    assert (back == x).all()


def test_roundtrip_batched():
    primes = pr.ntt_primes(2, bits=31)
    plan = build_plan(128, primes)
    x = np.stack([
        np.stack([RNG.integers(0, p, size=128, dtype=np.uint32)
                  for p in primes])
        for _ in range(5)
    ])
    back = np.asarray(make_roundtrip(plan)(jnp.asarray(x)))
    assert (back == x).all()


@pytest.mark.parametrize("n", [64, 128])
def test_negacyclic_convolution(n):
    primes = pr.ntt_primes(2, bits=31)
    plan = build_plan(n, primes)
    a = np.stack([RNG.integers(0, p, size=n, dtype=np.uint32) for p in primes])
    b = np.stack([RNG.integers(0, p, size=n, dtype=np.uint32) for p in primes])
    mc = [pr.mont_constants(p) for p in primes]
    pinv = jnp.asarray(np.asarray([c["p_neg_inv"] for c in mc],
                                  dtype=np.uint32)[:, None])
    r2 = jnp.asarray(np.asarray([c["r2_mod_p"] for c in mc],
                                dtype=np.uint32)[:, None])

    @jax.jit
    def poly_mul(xa, xb):
        fa = ntt_fwd(plan, xa)
        fb = ntt_fwd(plan, xb)
        fc = mm.mont_mul(fa, mm.to_mont(fb, plan.p, pinv, r2), plan.p, pinv)
        return ntt_inv(plan, fc)

    got = np.asarray(poly_mul(jnp.asarray(a), jnp.asarray(b)))
    for li, p in enumerate(primes):
        want = naive_negacyclic(a[li], b[li], p)
        assert (got[li] == want).all(), f"limb {li} mismatch"


def test_partial_limbs():
    """Plans accept data with fewer limbs than the plan was built for."""
    primes = pr.ntt_primes(4, bits=31)
    plan = build_plan(128, primes)
    x = np.stack([RNG.integers(0, p, size=128, dtype=np.uint32)
                  for p in primes[:2]])
    back = np.asarray(make_roundtrip(plan)(jnp.asarray(x)))
    assert (back == x).all()


def test_radix8_radix4_bitexact(monkeypatch):
    """The radix-8 (TPU) and radix-4 (CPU) merge orderings must produce
    BIT-IDENTICAL transforms — the backend gate may never change
    results (ops/ntt._radix8)."""
    import importlib

    from fhe_icp_tpu.ops import ntt as ntt_mod

    primes = pr.ntt_primes(2, bits=31)
    plan = ntt_mod.build_plan(512, primes)
    x = jnp.asarray(RNG.integers(
        0, np.asarray(primes)[:, None], size=(3, 2, 512)
    ).astype(np.uint32))
    outs = {}
    for mode in ("0", "1"):
        monkeypatch.setenv("FHE_NTT_RADIX8", mode)
        outs[mode] = (np.asarray(ntt_mod.ntt_fwd(plan, x)),
                      np.asarray(ntt_mod.ntt_inv(plan, x)))
    assert (outs["0"][0] == outs["1"][0]).all()
    assert (outs["0"][1] == outs["1"][1]).all()
