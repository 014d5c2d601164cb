"""Ring-dimension-sharded NTT: roundtrip + negacyclic convolution, 8-way.

Validates the four-step distributed transform (parallel/ntt_dist.py)
bit-exactly on the 8-virtual-device CPU mesh: INTT(NTT(x)) == x, and
pointwise products in the distributed eval layout implement negacyclic
convolution (checked against the big-int schoolbook oracle).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fhe_icp_tpu.ops import primes as pr
from fhe_icp_tpu.ops.modmath import mont_mul, to_mont
from fhe_icp_tpu.parallel.ntt_dist import SP_AXIS, build_dist_plan, \
    make_dist_ntt

RNG = np.random.default_rng(17)


def sp_mesh(n=8):
    auto = jax.sharding.AxisType.Auto
    return jax.make_mesh((n,), (SP_AXIS,), axis_types=(auto,))


def naive_negacyclic(a, b, p):
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


@pytest.mark.parametrize("n,n1", [(256, 16), (1024, 32), (1024, 64)])
def test_roundtrip(n, n1):
    primes = pr.ntt_primes(2, bits=31)
    plan = build_dist_plan(n, primes, n1=n1)
    mesh = sp_mesh()
    fwd, inv = make_dist_ntt(plan, mesh)
    x = np.stack([RNG.integers(0, p, size=n, dtype=np.uint32)
                  for p in primes]).reshape(len(primes), plan.n1, plan.n2)
    spec = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(None, SP_AXIS, None))
    xd = jax.device_put(jnp.asarray(x), spec)
    back = np.asarray(inv(fwd(xd)))
    assert (back == x).all()


def test_negacyclic_convolution_distributed():
    n, n1 = 256, 16
    primes = pr.ntt_primes(2, bits=31)
    plan = build_dist_plan(n, primes, n1=n1)
    mesh = sp_mesh()
    fwd, inv = make_dist_ntt(plan, mesh)

    a = np.stack([RNG.integers(0, p, size=n, dtype=np.uint32)
                  for p in primes])
    b = np.stack([RNG.integers(0, p, size=n, dtype=np.uint32)
                  for p in primes])
    mc = [pr.mont_constants(p) for p in primes]
    pcol = jnp.asarray(np.asarray(primes, np.uint32)[:, None, None])
    pinv = jnp.asarray(np.asarray([c["p_neg_inv"] for c in mc],
                                  np.uint32)[:, None, None])
    r2 = jnp.asarray(np.asarray([c["r2_mod_p"] for c in mc],
                                np.uint32)[:, None, None])

    spec = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(None, SP_AXIS, None))
    am = jax.device_put(jnp.asarray(a.reshape(2, plan.n1, plan.n2)), spec)
    bm = jax.device_put(jnp.asarray(b.reshape(2, plan.n1, plan.n2)), spec)

    @jax.jit
    def poly_mul(xa, xb):
        fa, fb = fwd(xa), fwd(xb)
        fc = mont_mul(fa, to_mont(fb, pcol, pinv, r2), pcol, pinv)
        return inv(fc)

    got = np.asarray(poly_mul(am, bm)).reshape(2, n)
    for li, p in enumerate(primes):
        want = naive_negacyclic(a[li], b[li], p)
        assert (got[li] == want).all(), f"limb {li} mismatch"


def test_matches_single_chip_convolution():
    """Distributed and single-chip NTT orderings differ, but both must
    implement the SAME ring multiplication."""
    from fhe_icp_tpu.ops.ntt import build_plan, ntt_fwd, ntt_inv
    n = 256
    primes = pr.ntt_primes(1, bits=31)
    dplan = build_dist_plan(n, primes, n1=16)
    splan = build_plan(n, primes)
    mesh = sp_mesh()
    fwd, inv = make_dist_ntt(dplan, mesh)

    a = np.stack([RNG.integers(0, p, size=n, dtype=np.uint32)
                  for p in primes])
    b = np.stack([RNG.integers(0, p, size=n, dtype=np.uint32)
                  for p in primes])
    mc = pr.mont_constants(primes[0])
    pc = jnp.asarray(np.uint32(primes[0]).reshape(1, 1, 1))
    pi = jnp.asarray(np.uint32(mc["p_neg_inv"]).reshape(1, 1, 1))
    r2 = jnp.asarray(np.uint32(mc["r2_mod_p"]).reshape(1, 1, 1))

    am = jnp.asarray(a.reshape(1, 16, 16))
    bm = jnp.asarray(b.reshape(1, 16, 16))
    fc = mont_mul(fwd(am), to_mont(fwd(bm), pc, pi, r2), pc, pi)
    dist = np.asarray(inv(fc)).reshape(1, n)

    p2 = splan.p[:1]
    pi2 = jnp.asarray(np.uint32(mc["p_neg_inv"]).reshape(1, 1))
    r22 = jnp.asarray(np.uint32(mc["r2_mod_p"]).reshape(1, 1))
    fa, fb = ntt_fwd(splan, jnp.asarray(a)), ntt_fwd(splan, jnp.asarray(b))
    single = np.asarray(ntt_inv(
        splan, mont_mul(fa, to_mont(fb, p2, pi2, r22), p2, pi2)))
    assert (dist == single).all()


def test_pallas_exchange_matches_xla():
    """The hand-written remote-DMA all-to-all (interpret mode on CPU) and
    the XLA collective produce identical transforms."""
    n, n1 = 256, 16
    primes = pr.ntt_primes(2, bits=31)
    plan = build_dist_plan(n, primes, n1=n1)
    mesh = sp_mesh()
    fwd_x, inv_x = make_dist_ntt(plan, mesh, exchange="xla")
    fwd_p, inv_p = make_dist_ntt(plan, mesh, exchange="pallas")
    x = np.stack([RNG.integers(0, p, size=n, dtype=np.uint32)
                  for p in primes]).reshape(2, plan.n1, plan.n2)
    spec = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(None, SP_AXIS, None))
    xd = jax.device_put(jnp.asarray(x), spec)
    fx = np.asarray(fwd_x(xd))
    fp = np.asarray(fwd_p(xd))
    assert (fx == fp).all()
    assert (np.asarray(inv_p(fwd_p(xd))) == x).all()
