"""Headline benchmark: encrypted dot-products per second on one TPU chip.

Measures the flagship operation behind `compare`/`search` — a batched
ciphertext x plaintext inner product (NTT-domain matvec) followed by the
exact RNS decode of the score coefficient — on the `pairwise-4096`
parameter set (N=4096, 3 x 31-bit RNS limbs, real 128-bit-secure BGV).

Prints ONE JSON line:
  {"metric": "encrypted_dot_products_per_s", "value": N, "unit": "ops/s",
   "vs_baseline": R}

Baseline: the reference's FHE similarity predict takes ~0.3 s/sample on
its dev machine (BASELINE.md, SESSION_REPORT.md:84) → ~3.33 dot-products/s.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_DOT_PER_S = 1.0 / 0.3


def main() -> None:
    import jax

    from fhe_icp_tpu.ops import fastdot
    from fhe_icp_tpu.ops.runtime import FheRuntime

    batch = 8192         # documents scored per step
    dim = 128            # embedding dimension (reference contract)
    steps = 32           # timed iterations

    rt = FheRuntime("pairwise-4096")
    rt.generate_keys(seed=0)
    ctx, sk = rt.ctx, rt.keys.sk

    rng = np.random.default_rng(0)
    docs = rng.integers(-1000, 1001, size=(batch, dim)).astype(np.int32)
    query = rng.integers(-1000, 1001, size=(dim,)).astype(np.int32)

    cts = rt.encrypt_vector(docs, seed=1)
    doc_op = jax.jit(
        lambda data: fastdot.make_doc_operand(ctx, data, cts.level))(cts.data)
    q_op = jax.jit(
        lambda q: fastdot.make_query_operand(ctx, sk, q, dim, cts.level))(
            query)
    step = jax.jit(lambda a, b: fastdot.scores(ctx, a, b))

    # Warm-up / compile.
    out = step(doc_op, q_op)
    jax.block_until_ready(out)

    # Correctness gate: the benchmark only counts if the math is right.
    want = docs.astype(np.int64) @ query.astype(np.int64)
    got = np.asarray(out, dtype=np.int64)
    assert (got == want).all(), "encrypted matvec mismatch — bench invalid"

    t0 = time.perf_counter()
    for _ in range(steps):
        out = step(doc_op, q_op)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    ops_per_s = batch * steps / dt

    # Roofline accounting on stderr (stdout carries ONLY the JSON line).
    import sys
    ct_bytes = doc_op.digits.size                    # int8: 1 byte/elem
    eff_gbs = ct_bytes * steps / dt / 1e9
    try:
        from fhe_icp_tpu.utils.profiling import hbm_spec_gbs
        spec = hbm_spec_gbs()
        note = (f" = {eff_gbs / spec:.0%} of {spec:.0f} GB/s HBM spec"
                if spec else "")
        print(f"[roofline] scoring reads {eff_gbs:.0f} GB/s{note}",
              file=sys.stderr)
    except Exception as e:
        print(f"[roofline] unavailable: {e}", file=sys.stderr)

    print(json.dumps({
        "metric": "encrypted_dot_products_per_s",
        "value": round(ops_per_s, 2),
        "unit": "ops/s",
        "vs_baseline": round(ops_per_s / BASELINE_DOT_PER_S, 1),
    }))


if __name__ == "__main__":
    main()
