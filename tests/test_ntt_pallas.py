"""Fused Pallas NTT kernel: bit-exact against the jnp reference NTT.

Runs in Pallas interpret mode on the CPU test mesh; the same kernel
compiles natively on TPU.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fhe_icp_tpu.ops import primes as pr
from fhe_icp_tpu.ops.ntt import build_plan, ntt_fwd, ntt_inv
from fhe_icp_tpu.ops.ntt_pallas import ntt_fwd_pallas, ntt_inv_pallas

RNG = np.random.default_rng(77)


@pytest.fixture(scope="module", params=[512, 4096])
def plan(request):
    n = request.param
    return build_plan(n, pr.ntt_primes(2, bits=31))


def _rand_polys(plan, shape):
    ps = np.asarray(plan.primes, dtype=np.uint32)
    l = len(ps)
    x = RNG.integers(0, 2 ** 31, size=shape + (l, plan.n)).astype(np.uint64)
    x = (x % ps[:, None].astype(np.uint64)).astype(np.uint32)
    return jnp.asarray(x)


@pytest.mark.parametrize("shape", [(), (3,), (2, 5)])
def test_fwd_matches_jnp(plan, shape):
    x = _rand_polys(plan, shape)
    want = np.asarray(ntt_fwd(plan, x))
    got = np.asarray(ntt_fwd_pallas(plan, x))
    assert (got == want).all()


@pytest.mark.parametrize("shape", [(), (3,)])
def test_inv_matches_jnp(plan, shape):
    x = _rand_polys(plan, shape)
    want = np.asarray(ntt_inv(plan, x))
    got = np.asarray(ntt_inv_pallas(plan, x))
    assert (got == want).all()


def test_roundtrip(plan):
    x = _rand_polys(plan, (4,))
    back = np.asarray(ntt_inv_pallas(plan, ntt_fwd_pallas(plan, x)))
    assert (back == np.asarray(x)).all()


def test_single_limb_slice(plan):
    """A 1-limb input uses only the first limb's tables."""
    x = _rand_polys(plan, (2,))[:, :1]
    want = np.asarray(ntt_fwd(plan, x))
    got = np.asarray(ntt_fwd_pallas(plan, x))
    assert (got == want).all()
