"""Subprocess keygen produces bit-identical key material.

The tunnel environments route in-process compiles through a remote
service, so FheRuntime.generate_keys shells keygen out to a clean
subprocess (ops/keygen_worker.py).  This test runs the worker directly
and checks every array against the in-process jit path at the same seed
— the two must agree bit for bit (same threefry PRNG, same graph).
"""

import numpy as np

from fhe_icp_tpu.ops.params import CryptoParams
from fhe_icp_tpu.ops.runtime import FheRuntime


def test_subprocess_keygen_bit_identical():
    params = CryptoParams("kgw-512", n=512, n_limbs=2, allow_insecure=True)
    rt = FheRuntime(params)
    sub = rt._keygen_subprocess(seed=7)
    assert sub is not None, "worker subprocess failed"
    rt.generate_keys(seed=7, on="cpu")     # in-process path (cpu backend)
    ks = rt.keys
    np.testing.assert_array_equal(np.asarray(sub.sk.s), np.asarray(ks.sk.s))
    np.testing.assert_array_equal(np.asarray(sub.sk.s_ntt_mont),
                                  np.asarray(ks.sk.s_ntt_mont))
    np.testing.assert_array_equal(np.asarray(sub.sk.s2_ntt_mont),
                                  np.asarray(ks.sk.s2_ntt_mont))
    np.testing.assert_array_equal(np.asarray(sub.pk.b_ntt),
                                  np.asarray(ks.pk.b_ntt))
    np.testing.assert_array_equal(np.asarray(sub.pk.a_ntt),
                                  np.asarray(ks.pk.a_ntt))
    assert set(sub.rlk.keys) == set(ks.rlk.keys)
    for lv in ks.rlk.keys:
        np.testing.assert_array_equal(np.asarray(sub.rlk.keys[lv]),
                                      np.asarray(ks.rlk.keys[lv]))
