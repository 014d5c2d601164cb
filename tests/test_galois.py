"""Galois automorphisms, rotation keys, CRT slot packing (ops/galois.py).

Oracles: coefficient-domain automorphism (X^i -> X^{i*g mod 2N} with the
negacyclic sign), numpy slot arithmetic mod t.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fhe_icp_tpu.ops import galois
from fhe_icp_tpu.ops.ntt import ntt_fwd, ntt_inv
from fhe_icp_tpu.ops.cipher import centered_residues
from fhe_icp_tpu.ops.runtime import FheRuntime

RNG = np.random.default_rng(5)


@pytest.fixture(scope="module")
def rt():
    r = FheRuntime("test-512-mult")
    r.generate_keys(seed=9)
    return r


@pytest.fixture(scope="module")
def gkeys(rt):
    return galois.rotation_keygen(rt.ctx, rt.keys.sk, jax.random.PRNGKey(3))


def _auto_oracle(p, g, n):
    """tau_g of an int poly: X^i -> X^{i*g mod 2N}, X^N = -1."""
    out = np.zeros_like(p)
    for i in range(n):
        e = (i * g) % (2 * n)
        if e < n:
            out[e] += p[i]
        else:
            out[e - n] -= p[i]
    return out


@pytest.mark.parametrize("g", [5, 25, 1023, 2 * 512 - 1])
def test_ntt_domain_automorphism_matches_oracle(rt, g):
    ctx = rt.ctx
    n, l = ctx.n, ctx.n_limbs
    p = RNG.integers(-1000, 1001, size=(n,)).astype(np.int32)
    res = centered_residues(ctx, jnp.asarray(p), l)
    x_ntt = ntt_fwd(ctx.plan, res)
    y = ntt_inv(ctx.plan, galois.apply_auto_ntt(ctx, x_ntt, g))
    # back to centered ints via limb 0 (values < p0, possibly negated).
    p0 = ctx.primes[0]
    got = np.asarray(y[0], dtype=np.int64)
    got = np.where(got > p0 // 2, got - p0, got)
    want = _auto_oracle(p.astype(np.int64), g, n)
    assert (got == want).all()


def test_apply_galois_decrypts_to_automorphism(rt, gkeys):
    ctx = rt.ctx
    g = galois.rot_element(ctx, 1)
    m = RNG.integers(-500, 501, size=(ctx.n,)).astype(np.int32)
    ct = rt.encrypt(m, seed=21)
    ct_g = galois.apply_galois(ctx, gkeys, ct, g)
    got = np.asarray(rt.decrypt(ct_g), dtype=np.int64)
    want = _auto_oracle(m.astype(np.int64), g, ctx.n)
    assert (got == want).all()


def test_slot_encode_decode_roundtrip(rt):
    ctx = rt.ctx
    vals = RNG.integers(-(ctx.t // 2) + 1, ctx.t // 2,
                        size=(2, ctx.n // 2)).astype(np.int32)
    m = galois.encode_slots(ctx, jnp.asarray(vals))
    back = np.asarray(galois.decode_slots(ctx, m))
    assert (back == vals).all()


def _center_t(x, t):
    r = np.mod(x, t)
    return np.where(r > t // 2, r - t, r)


def test_encrypted_slotwise_multiply(rt):
    ctx = rt.ctx
    a = RNG.integers(-1000, 1001, size=(2, ctx.n // 2)).astype(np.int32)
    b = RNG.integers(-1000, 1001, size=(2, ctx.n // 2)).astype(np.int32)
    ct_a = rt.encrypt(np.asarray(galois.encode_slots(ctx, jnp.asarray(a))),
                      seed=31)
    ct_b = rt.encrypt(np.asarray(galois.encode_slots(ctx, jnp.asarray(b))),
                      seed=32)
    prod = rt.mul_ct(ct_a, ct_b)
    got = np.asarray(galois.decode_slots(ctx, rt.decrypt(prod)),
                     dtype=np.int64)
    want = _center_t(a.astype(np.int64) * b.astype(np.int64), ctx.t)
    assert (got == want).all()


def test_rotate_slots_encrypted(rt, gkeys):
    ctx = rt.ctx
    vals = RNG.integers(-1000, 1001, size=(2, ctx.n // 2)).astype(np.int32)
    ct = rt.encrypt(np.asarray(galois.encode_slots(ctx, jnp.asarray(vals))),
                    seed=41)
    for k in (1, 2):
        ct_k = galois.rotate_slots(ctx, gkeys, ct, k)
        got = np.asarray(galois.decode_slots(ctx, rt.decrypt(ct_k)))
        want = np.roll(vals, -k, axis=1)        # column j gets column j+k
        assert (got == want).all(), f"rotation by {k}"


def test_flip_rows_encrypted(rt, gkeys):
    ctx = rt.ctx
    vals = RNG.integers(-1000, 1001, size=(2, ctx.n // 2)).astype(np.int32)
    ct = rt.encrypt(np.asarray(galois.encode_slots(ctx, jnp.asarray(vals))),
                    seed=43)
    got = np.asarray(galois.decode_slots(
        ctx, rt.decrypt(galois.flip_rows(ctx, gkeys, ct))))
    assert (got == vals[::-1]).all()


def test_dot_ct_ct_slots(rt, gkeys):
    """Fully encrypted rotate-and-sum inner product, replicated in slots."""
    ctx = rt.ctx
    d = ctx.n                                   # use every slot
    a = RNG.integers(-30, 31, size=(2, ctx.n // 2)).astype(np.int32)
    b = RNG.integers(-30, 31, size=(2, ctx.n // 2)).astype(np.int32)
    ct_a = rt.encrypt(np.asarray(galois.encode_slots(ctx, jnp.asarray(a))),
                      seed=51)
    ct_b = rt.encrypt(np.asarray(galois.encode_slots(ctx, jnp.asarray(b))),
                      seed=52)
    out = galois.dot_ct_ct_slots(ctx, rt.keys.rlk.keys, gkeys, ct_a, ct_b)
    got = np.asarray(galois.decode_slots(ctx, rt.decrypt(out)),
                     dtype=np.int64)
    want = int(np.sum(a.astype(np.int64) * b.astype(np.int64)))
    want = _center_t(np.int64(want), ctx.t)
    assert (got == want).all()


def test_rotate_preserves_ciphertext_shape(rt, gkeys):
    """Keyswitch consumers must return EXACTLY the input shape — a
    leading broadcast-1 dim would silently propagate (caught by
    config 8: decode indexing assumed scalar)."""
    ctx = rt.ctx
    vals = RNG.integers(-30, 31, size=(2, ctx.n // 2)).astype(np.int32)
    ct = rt.encrypt(np.asarray(galois.encode_slots(ctx, jnp.asarray(vals))),
                    seed=77)
    out = galois.rotate_slots(ctx, gkeys, ct, 3)
    assert out.data.shape == ct.data.shape
    batched = rt.encrypt(np.asarray(galois.encode_slots(
        ctx, jnp.asarray(np.stack([vals, vals])))), seed=78)
    out_b = galois.rotate_slots(ctx, gkeys, batched, 3)
    assert out_b.data.shape == batched.data.shape


def test_prefix_dot_small_ring(rt, gkeys):
    """sum_slots_prefix: slot [0,0] of the prefix dot equals the full
    inner product when operands live in slots 0..d-1 of row 0."""
    ctx = rt.ctx
    d = 32
    a = np.zeros((2, ctx.n // 2), np.int32)
    b = np.zeros((2, ctx.n // 2), np.int32)
    a[0, :d] = RNG.integers(-50, 51, size=d)
    b[0, :d] = RNG.integers(-50, 51, size=d)
    ct_a = rt.encrypt(np.asarray(galois.encode_slots(ctx, jnp.asarray(a))),
                      seed=61)
    ct_b = rt.encrypt(np.asarray(galois.encode_slots(ctx, jnp.asarray(b))),
                      seed=62)
    out = galois.dot_ct_ct_slots(ctx, rt.keys.rlk.keys, gkeys, ct_a, ct_b,
                                 d=d)
    got = int(np.asarray(galois.decode_slots(ctx, rt.decrypt(out)))[0, 0])
    want = _center_t(np.int64(np.sum(a.astype(np.int64) *
                                     b.astype(np.int64))), ctx.t)
    assert got == int(want)


@pytest.mark.slow
def test_galois_4096_production_floor():
    """The measured N=4096 feasibility floor (params.T_GALOIS): the
    d=128 prefix rotate-and-sum dot decrypts EXACTLY at galois-4096
    with positive noise budget, using fine-digit rotation keys —
    whereas pairwise-4096's T_COMPACT leaves only ~4 post-relin bits
    and the same chain wraps (documented in params.py; benchmarks
    config 8 measures both presets)."""
    from fhe_icp_tpu.ops.noise import noise_budget_bits
    from fhe_icp_tpu.ops.runtime import FheRuntime

    rt4 = FheRuntime("galois-4096")
    rt4.generate_keys(seed=0)
    ctx = rt4.ctx
    d = 128
    rng = np.random.default_rng(4)
    v = rng.standard_normal((2, d))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    q = np.round(v * 1000.0).astype(np.int32)          # scale-1000 contract
    a = np.zeros((2, ctx.n // 2), np.int32)
    b = np.zeros((2, ctx.n // 2), np.int32)
    a[0, :d], b[0, :d] = q[0], q[1]
    sa = rt4.encrypt_slots(a, seed=1)
    sb = rt4.encrypt_slots(b, seed=2)
    rt4.rotation_keys(seed=3)                          # fine 16-bit digits
    out = rt4.dot_ct_ct_slots(sa, sb, d=d)
    got = int(np.asarray(rt4.decrypt_slots(out))[0, 0])
    want = int(_center_t(np.int64(q[0].astype(np.int64)
                                  @ q[1].astype(np.int64)), ctx.t))
    assert got == want
    assert int(noise_budget_bits(ctx, rt4.keys.sk, out, max_coeffs=32)) >= 1
