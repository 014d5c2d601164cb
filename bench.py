"""Headline benchmark: encrypted dot-products per second on one TPU chip.

Measures the flagship operation behind `compare`/`search` — slot-packed
encrypted scoring (ops/pack.py): S = N/d documents per ciphertext, one
int8 digit matmul per RNS limb with 4S = 128 output columns (full MXU
lane width), followed by the exact per-slot RNS decode — on the
`pairwise-4096` parameter set (N=4096, real 128-bit-secure BGV;
encrypted fresh at 3 x 31-bit limbs, modulus-switched to 2 limbs for
scoring — the standard BGV noise/size trade).

Timing methodology: the TPU here sits behind a remote tunnel whose
dispatch is asynchronous and whose `block_until_ready` can return before
device completion, so naive dispatch-loop timing is unreliable in BOTH
directions.  Each measured step is therefore chained through a data
dependency (the previous step's output XORs into the query operand), and
the run ends with a host readback of the chain's final value — the wall
clock cannot close before every step has truly executed.  The per-step
cost is the slope between two chain lengths (min of 3 runs each), which
cancels the ~30 ms tunnel round-trip.

Prints ONE JSON line:
  {"metric": "encrypted_dot_products_per_s", "value": N, "unit": "ops/s",
   "vs_baseline": R}

Baseline: the reference's FHE similarity predict takes ~0.3 s/sample on
its dev machine (BASELINE.md, SESSION_REPORT.md:84) → ~3.33 dot-products/s.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_DOT_PER_S = 1.0 / 0.3


def main() -> None:
    import jax
    import jax.numpy as jnp

    from fhe_icp_tpu.ops import fastdot, pack
    from fhe_icp_tpu.ops.runtime import FheRuntime

    dim = 128            # embedding dimension (reference contract)
    groups = 2048        # packed ciphertexts scored per step
    c_short, c_long, reps = 8, 64, 3

    rt = FheRuntime("pairwise-4096", rlk_levels=[])
    rt.generate_keys(seed=0)
    ctx, sk = rt.ctx, rt.keys.sk
    slots = pack.slots_per_ct(ctx.n, dim)          # 32 docs / ciphertext
    batch = groups * slots                         # 65,536 docs / step

    # Contract-range data: the pipeline quantizes L2-normalized embeddings
    # at scale=1000 (utils/quantize.py, /root/reference/embedding_utils.py:
    # 42-44), bounding every dot product by ~1000*1000 = 1e6 — well inside
    # T_COMPACT's t/2 ~ 4.26e6 decode range.  (Unnormalized integers in
    # [-1000, 1000] would overflow the plaintext modulus: |dot| up to
    # 1.28e8.)
    rng = np.random.default_rng(0)
    def quantized_unit(shape):
        v = rng.standard_normal(shape)
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        return np.round(v * 1000.0).astype(np.int32)
    docs = quantized_unit((batch, dim))
    query = quantized_unit((dim,))

    polys = pack.encode_packed(
        jnp.asarray(docs.reshape(groups, slots, dim)), ctx.n)
    ct = rt.encrypt(np.asarray(polys), seed=1)
    # Modulus-switch stored ciphertexts to 2 limbs before scoring: the
    # dot product needs far less noise headroom than a fresh ciphertext
    # carries, and the operand shrinks by a third (exactness still gated
    # below; the message scale correction rides Ciphertext.pt_corr).
    from fhe_icp_tpu.ops import arith
    from fhe_icp_tpu.ops.cipher import Ciphertext
    ct = jax.jit(lambda data: arith.mod_switch_to(
        ctx, Ciphertext(data, ctx.n_limbs, True), 2))(ct.data)
    corr = ct.pt_corr
    doc_op = jax.jit(
        lambda data: pack.make_packed_doc_operand(ctx, data, ct.level))(
            ct.data)
    q_op = pack.make_packed_query_operand(ctx, sk, jnp.asarray(query), dim,
                                          ct.level)

    @jax.jit
    def step(dd, qd, tok):
        qd = pack.PackedQueryOperand(qd.digits ^ tok.astype(jnp.int8),
                                     qd.level, qd.d, qd.slots)
        s = pack.packed_scores(ctx, dd, qd, corr)
        return (s[0, 0] & 1).astype(jnp.uint32)

    # Correctness gate: the benchmark only counts if the math is right.
    out = jax.jit(
        lambda a, b: pack.packed_scores(ctx, a, b, corr))(doc_op, q_op)
    got = np.asarray(out, dtype=np.int64).reshape(-1)
    want = docs.astype(np.int64) @ query.astype(np.int64)
    assert (got == want).all(), "packed encrypted matvec mismatch — bench invalid"

    def chain(n_steps: int) -> float:
        best = float("inf")
        for _ in range(reps):
            tok = jnp.uint32(0)
            t0 = time.perf_counter()
            for _ in range(n_steps):
                tok = step(doc_op, q_op, tok)
            np.asarray(tok)                        # force full completion
            best = min(best, time.perf_counter() - t0)
        return best

    chain(2)                                       # warm-up / compile
    dt = (chain(c_long) - chain(c_short)) / (c_long - c_short)
    ops_per_s = batch / dt

    # Roofline accounting on stderr (stdout carries ONLY the JSON line).
    ct_bytes = doc_op.digits.size                  # int8: 1 byte/elem
    eff_gbs = ct_bytes / dt / 1e9
    try:
        from fhe_icp_tpu.utils.profiling import hbm_spec_gbs
        spec = hbm_spec_gbs()
        note = (f" = {eff_gbs / spec:.0%} of {spec:.0f} GB/s HBM spec"
                if spec else "")
        print(f"[roofline] scoring reads {eff_gbs:.0f} GB/s{note}; "
              f"{dt * 1e3:.3f} ms/step, {slots} docs/ciphertext",
              file=sys.stderr)
    except Exception as e:
        print(f"[roofline] unavailable: {e}", file=sys.stderr)
    # Ciphertext-size accounting (live shapes): the 2-limb pairwise-4096
    # preset's fresh ciphertexts are 1/3 smaller than round 1's 3-limb
    # variant (the hybrid-keyswitch redesign), which cuts encrypt-side
    # and scoring-side HBM traffic by the same ratio; slot packing then
    # divides per-DOC bytes by S = N/d.
    now_b = ctx.n_limbs * 2 * 4 * ctx.n            # fresh u32 ct bytes
    old_b = 3 * 2 * 4 * ctx.n                      # round-1 3-limb ct
    per_doc = ct_bytes / (groups * slots)          # packed digit operand
    print(f"[ciphertext] fresh {now_b} B/ct ({1 - now_b / old_b:.0%} vs "
          f"the 3-limb round-1 preset); packed scoring operand "
          f"{per_doc:.0f} B/doc ({slots} docs/ct)", file=sys.stderr)

    print(json.dumps({
        "metric": "encrypted_dot_products_per_s",
        "value": round(ops_per_s, 2),
        "unit": "ops/s",
        "vs_baseline": round(ops_per_s / BASELINE_DOT_PER_S, 1),
    }))


if __name__ == "__main__":
    main()
