"""Exactness of the experimental MXU four-step NTT (ops/ntt_mxu.py).

Oracle: the bit-exact butterfly transform (ops/ntt.py, itself gated
against big-int convolution oracles) with its bit-reversed output
permuted to natural order — natural[k] = butterfly_out[bitrev(k)]
(the bit-reversal is an involution; see ops/pack._monomial_table's
layout note).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from fhe_icp_tpu.ops.context import CryptoContext
from fhe_icp_tpu.ops.ntt import ntt_fwd
from fhe_icp_tpu.ops.ntt_mxu import ntt_fwd_mxu
from fhe_icp_tpu.ops.params import get_params

RNG = np.random.default_rng(7)


def _bitrev(n):
    log_n = n.bit_length() - 1
    return np.array([int(format(m, f"0{log_n}b")[::-1], 2)
                     for m in range(n)])


@pytest.mark.parametrize("n1", [64, 128])
def test_mxu_fourstep_matches_butterfly(n1):
    ctx = CryptoContext(get_params("pairwise-4096"))
    l, n = ctx.n_limbs, ctx.n
    x = jnp.asarray(RNG.integers(
        0, np.asarray(ctx.primes[:l])[:, None],
        size=(3, l, n)).astype(np.uint32))
    got = np.asarray(ntt_fwd_mxu(ctx, x, n1=n1))
    ref_br = np.asarray(ntt_fwd(ctx.plan, x))
    want = ref_br[..., _bitrev(n)]                  # bit-reversed -> natural
    assert (got == want).all()
