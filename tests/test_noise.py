"""Noise-budget accounting: fresh / add / mul / modswitch trajectories.

The reference has no noise visibility at all (Concrete hides it); these
tests pin the budget math that makes parameter choices auditable —
including the failure mode found while building test_pipeline.py: ct x ct
on a 2-limb modulus has NEGATIVE post-mul budget (t^2*e1*e2 > q).
"""

import numpy as np
import pytest

from fhe_icp_tpu.ops.noise import noise_budget_bits, phase_centered
from fhe_icp_tpu.ops.params import CryptoParams
from fhe_icp_tpu.ops.runtime import FheRuntime

RNG = np.random.default_rng(5)


@pytest.fixture(scope="module")
def rt():
    r = FheRuntime(CryptoParams("t3", n=512, n_limbs=3, allow_insecure=True))
    r.generate_keys(seed=0)
    return r


def msg(rt, hi=1000):
    return np.asarray(RNG.integers(-hi, hi + 1, size=(rt.ctx.n,)),
                      dtype=np.int32)


def test_fresh_budget_positive(rt):
    ct = rt.encrypt(msg(rt), seed=1)
    b = noise_budget_bits(rt.ctx, rt.keys.sk, ct)
    assert b > 40                     # q ~ 2^93, fresh noise ~ t*e ~ 2^35


def test_add_costs_one_bit(rt):
    a, b = rt.encrypt(msg(rt), seed=1), rt.encrypt(msg(rt), seed=2)
    b0 = noise_budget_bits(rt.ctx, rt.keys.sk, a)
    b1 = noise_budget_bits(rt.ctx, rt.keys.sk, rt.add(a, b))
    assert b0 - 2 <= b1 <= b0


def test_mul_burns_budget_but_decrypts(rt):
    a, b = rt.encrypt(msg(rt, hi=30), seed=1), rt.encrypt(msg(rt, hi=30),
                                                          seed=2)
    prod = rt.mul_ct(a, b)
    bud = noise_budget_bits(rt.ctx, rt.keys.sk, prod)
    assert 0 < bud < noise_budget_bits(rt.ctx, rt.keys.sk, a)


def test_two_limb_mul_is_broken_and_detected():
    """The pipeline bug this file exists for: 2 limbs can't multiply."""
    rt2 = FheRuntime(CryptoParams("t2", n=512, n_limbs=2,
                                  allow_insecure=True))
    rt2.generate_keys(seed=0)
    m = np.asarray(RNG.integers(-1000, 1001, size=(rt2.ctx.n,)),
                   dtype=np.int32)
    prod = rt2.mul_ct(rt2.encrypt(m, seed=1), rt2.encrypt(m, seed=2))
    # The centered phase saturates at q/2, so 0 is the broken floor.
    assert noise_budget_bits(rt2.ctx, rt2.keys.sk, prod) == 0


def test_mod_switch_reshapes_noise(rt):
    m = msg(rt)
    switched = rt.mod_switch(rt.encrypt(m, seed=3))
    # Budget is measured against the SMALLER q; post-switch noise is
    # ~t*N/2 regardless of the (tiny) fresh noise, so budget drops but
    # stays decryptable.
    assert noise_budget_bits(rt.ctx, rt.keys.sk, switched) > 10
    assert (np.asarray(rt.decrypt(switched)) == m).all()


def test_phase_centered_magnitudes(rt):
    ct = rt.encrypt(msg(rt), seed=4)
    vals = phase_centered(rt.ctx, rt.keys.sk, ct, max_coeffs=64)
    worst = max(abs(int(v)) for v in vals)
    # Fresh phase = m + t*e: |e| <= cbd k=20 -> |phase| < t*(20+1)
    assert worst < rt.ctx.t * 64


def test_budget_batch_matches_per_doc(rt):
    """noise_budget_bits_batch: per-element budgets from one stacked
    dispatch agree with the single-ct function on each element."""
    import jax.numpy as jnp

    from fhe_icp_tpu.ops.cipher import Ciphertext
    from fhe_icp_tpu.ops.noise import noise_budget_bits_batch

    cts = [rt.encrypt(msg(rt), seed=10 + i) for i in range(4)]
    stacked = Ciphertext(jnp.stack([c.data for c in cts]),
                         rt.ctx.n_limbs, True)
    got = noise_budget_bits_batch(rt.ctx, rt.keys.sk, stacked,
                                  coeffs_per_ct=rt.ctx.n)
    want = [noise_budget_bits(rt.ctx, rt.keys.sk, c, max_coeffs=rt.ctx.n)
            for c in cts]
    assert list(got) == want
