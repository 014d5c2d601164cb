"""On-chip stage profile of the ct x ct + relinearization path (config 2).

Times each stage of the 32x32 all-pairs pipeline separately with the
on-device fori_loop methodology (see bench.py): per stage, a jitted
XOR-chained loop runs K iterations in ONE dispatch, and the per-step
cost is the slope between two loop lengths.  This pins down where the
65 ms (round-3 artifact) actually goes before any kernel work.

Run on the TPU: python benchmarks/diag_relin_profile.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from fhe_icp_tpu.ops import arith, dot as fhe_dot
    from fhe_icp_tpu.ops.cipher import Ciphertext
    from fhe_icp_tpu.ops.ntt import ntt_fwd, ntt_inv
    from fhe_icp_tpu.ops.modmath import add_mod, mont_mul, barrett_reduce
    from fhe_icp_tpu.ops.runtime import FheRuntime

    b, d = 32, 128
    rt = FheRuntime("pairwise-4096")
    rt.generate_keys(seed=0)
    ctx, ks = rt.ctx, rt.keys
    rng = np.random.default_rng(0)

    def qunit(shape):
        v = rng.standard_normal(shape)
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        return np.round(v * 1000.0).astype(np.int32)

    docs = qunit((b, d))
    ct_fwd = rt.encrypt_vector(docs, seed=5)
    ct_rev = rt.encrypt_vector(docs, seed=6, rev=True)
    lv = ctx.n_limbs
    rk = ks.rlk.keys[lv]

    fwd, rev = ct_fwd.data, ct_rev.data

    def emit(**kw):
        print(json.dumps(kw), flush=True)

    def timed_loop(make_body, k_short=8, k_long=40, reps=3):
        """make_body(tok) -> tok must be jit-safe; measures slope."""
        def run_k(k):
            @jax.jit
            def run(f, r, tok0):
                return jax.lax.fori_loop(
                    0, k, lambda _, tok: make_body(f, r, tok), tok0)
            return run

        rs, rl = run_k(k_short), run_k(k_long)

        def t(fn):
            tok = jnp.uint32(0)
            t0 = time.perf_counter()
            np.asarray(fn(fwd, rev, tok))
            return time.perf_counter() - t0

        t(rs); t(rl)
        s = sorted((t(rl) - t(rs)) / (k_long - k_short) for _ in range(reps))
        return s[reps // 2] * 1e3

    def mix(data, tok):
        return data ^ (tok & jnp.uint32(1))

    # Stage bodies.  Each consumes tok so the loop cannot hoist.
    def full_pipeline(f, r, tok):
        a = Ciphertext(mix(f, tok)[:, None], lv, True)
        bb = Ciphertext(r[None, :], lv, True)
        m = fhe_dot.decrypt_dot(ctx, ks.sk, fhe_dot.dot_ct_ct(
            ctx, ks.rlk.keys, a, bb), d)
        return (m[0, 0] & 1).astype(jnp.uint32)

    def mul_only(f, r, tok):
        a = Ciphertext(mix(f, tok)[:, None], lv, True)
        bb = Ciphertext(r[None, :], lv, True)
        prod = arith.mul_ct(ctx, a, bb)
        return (prod.data[0, 0, 0, 0, 0] & 1).astype(jnp.uint32)

    def mul_deg2_decode(f, r, tok):
        a = Ciphertext(mix(f, tok)[:, None], lv, True)
        bb = Ciphertext(r[None, :], lv, True)
        m = fhe_dot.decrypt_dot(ctx, ks.sk,
                                arith.mul_ct(ctx, a, bb), d)
        return (m[0, 0] & 1).astype(jnp.uint32)

    # Pre-build a degree-2 product once for stage isolation.
    prod0 = jax.jit(lambda f, r: arith.mul_ct(
        ctx, Ciphertext(f[:, None], lv, True),
        Ciphertext(r[None, :], lv, True)).data)(fwd, rev)

    def intt_c2(f, r, tok):
        c2 = prod0[..., 2, :, :] ^ (tok & jnp.uint32(1))
        x = ntt_inv(ctx.plan, c2)
        return (x[0, 0, 0, 0] & 1).astype(jnp.uint32)

    ht = ctx.hybrid(lv)

    def digits_ntt(f, r, tok):
        c2 = prod0[..., 2, :, :] ^ (tok & jnp.uint32(1))
        c_coeff = ntt_inv(ctx.plan, c2)
        d_res = barrett_reduce(c_coeff[..., :, None, :], ht.p, ht.mu)
        d_ntt = ntt_fwd(ht.plan, d_res)
        return (d_ntt[0, 0, 0, 0, 0] & 1).astype(jnp.uint32)

    def keyswitch_only(f, r, tok):
        c2 = prod0[..., 2, :, :] ^ (tok & jnp.uint32(1))
        d0, d1 = arith.hybrid_keyswitch_apply(ctx, rk, c2, lv)
        return (d0[0, 0, 0, 0] & 1).astype(jnp.uint32)

    # Finer stages of the round-5 keyswitch (reuse digit path + NTT-
    # domain divide-by-P), to localize the non-transform overhead.
    import numpy as _np
    from fhe_icp_tpu.ops.arith import (_digit_plan, _div_special,
                                       _flatten_batch)

    def _digits(c2_flat):
        """(B, l, N) NTT-domain -> (B, n_dig, l+1, N) digit operands."""
        ht2 = ctx.hybrid(lv)
        c_coeff = ntt_inv(ctx.plan, c2_flat)
        d_list = []
        for j in range(lv):
            others = _np.asarray([i for i in range(lv + 1) if i != j])
            d_j = c_coeff[..., j, :][..., None, :]
            d_res = barrett_reduce(d_j, ht2.p[others], ht2.mu[others])
            d_o = ntt_fwd(_digit_plan(ctx, lv, j), d_res)
            d_list.append(jnp.concatenate(
                [d_o[..., :j, :], c2_flat[..., j:j + 1, :],
                 d_o[..., j:, :]], axis=-2))
        return jnp.stack(d_list, axis=1)

    def digits_new(f, r, tok):
        c2 = prod0[..., 2, :, :] ^ (tok & jnp.uint32(1))
        c2f, _ = _flatten_batch(c2)
        d = _digits(c2f)
        return (d[0, 0, 0, 0] & 1).astype(jnp.uint32)

    d_ntt0 = jax.jit(lambda c2: _digits(_flatten_batch(c2)[0]))(
        prod0[..., 2, :, :])

    def accumulate_only(f, r, tok):
        ht2 = ctx.hybrid(lv)
        pe, pinve = ht2.p, ht2.pinv
        d = d_ntt0 ^ (tok & jnp.uint32(1))
        acc0 = acc1 = None
        for j in range(rk.shape[0]):
            t0_ = mont_mul(d[:, j], rk[j, 0], pe, pinve)
            t1_ = mont_mul(d[:, j], rk[j, 1], pe, pinve)
            acc0 = t0_ if acc0 is None else add_mod(acc0, t0_, pe)
            acc1 = t1_ if acc1 is None else add_mod(acc1, t1_, pe)
        return (acc0[0, 0, 0] & 1).astype(jnp.uint32)

    acc_stack0 = None

    def _make_acc():
        ht2 = ctx.hybrid(lv)
        pe, pinve = ht2.p, ht2.pinv

        def f_(d):
            acc0 = acc1 = None
            for j in range(rk.shape[0]):
                t0_ = mont_mul(d[:, j], rk[j, 0], pe, pinve)
                t1_ = mont_mul(d[:, j], rk[j, 1], pe, pinve)
                acc0 = t0_ if acc0 is None else add_mod(acc0, t0_, pe)
                acc1 = t1_ if acc1 is None else add_mod(acc1, t1_, pe)
            return jnp.stack([acc0, acc1], axis=-3)
        return jax.jit(f_)

    acc_stack0 = _make_acc()(d_ntt0)

    def div_only(f, r, tok):
        x = acc_stack0 ^ (tok & jnp.uint32(1))
        out = _div_special(ctx, ctx.hybrid(lv), x, lv)
        return (out[0, 0, 0, 0] & 1).astype(jnp.uint32)

    def relin_only(f, r, tok):
        prod = Ciphertext(mix(prod0, tok), lv, True)
        out = arith.relinearize(ctx, ks.rlk.keys, prod)
        return (out.data[0, 0, 0, 0, 0] & 1).astype(jnp.uint32)

    stages = [
        ("full_mul_relin_decode", full_pipeline),
        ("mul_ct_only", mul_only),
        ("mul_deg2_decode", mul_deg2_decode),
        ("intt_c2", intt_c2),
        ("digits_broadcast_ntt", digits_ntt),
        ("digits_reuse_ntt", digits_new),
        ("accumulate_only", accumulate_only),
        ("div_special_only", div_only),
        ("hybrid_keyswitch_full", keyswitch_only),
        ("relin_full", relin_only),
    ]
    for name, body in stages:
        try:
            ms = timed_loop(body)
            emit(stage=name, ms_per_step=round(ms, 3),
                 pairs_per_s=round(b * b / (ms / 1e3), 1))
        except Exception as e:
            emit(stage=name, error=f"{type(e).__name__}: {e}"[:200])


if __name__ == "__main__":
    main()
