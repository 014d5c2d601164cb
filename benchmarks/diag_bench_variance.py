"""Diagnostic: where does the cold-process bench lose 20% vs warm probes?

Round-3 mystery (VERDICT.md Weak #1): committed probes measured the
fused scoring kernel at 0.183 ms/step (357M dots/s) while the driver's
fresh-process BENCH_r03.json recorded 0.228 ms (287M).  This script
takes ONE process and measures the same chained-slope step time many
ways to separate the suspects:

  * repetition within a process (does the first measurement read slow?)
  * chain-length choice (8/64 vs longer chains)
  * reps/min-vs-median (tunnel variance)

Run on the TPU: python benchmarks/diag_bench_variance.py
Prints one JSON line per measurement to stdout.
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

    from fhe_icp_tpu.ops import arith, pack
    from fhe_icp_tpu.ops.cipher import Ciphertext
    from fhe_icp_tpu.ops.runtime import FheRuntime

    dim, groups = 128, 2048
    rt = FheRuntime("pairwise-4096", rlk_levels=[])
    rt.generate_keys(seed=0)
    ctx, sk = rt.ctx, rt.keys.sk
    slots = pack.slots_per_ct(ctx.n, dim)
    batch = groups * slots

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

    def chain(n_steps: int) -> float:
        tok = jnp.uint32(0)
        t0 = time.perf_counter()
        for _ in range(n_steps):
            tok = step(doc_op, q_op, tok)
        np.asarray(tok)
        return time.perf_counter() - t0

    def emit(**kw):
        print(json.dumps(kw), flush=True)

    chain(2)  # compile
    t_start = time.perf_counter()

    # 1) raw chain timings, repeated — watch for drift/warmup.
    for rep in range(10):
        t8 = chain(8)
        t64 = chain(64)
        emit(kind="pair", rep=rep, t8_ms=round(t8 * 1e3, 3),
             t64_ms=round(t64 * 1e3, 3),
             slope_ms=round((t64 - t8) / 56 * 1e3, 4),
             wall_s=round(time.perf_counter() - t_start, 1))

    # 2) long chains: per-step cost without slope subtraction.
    for n in (64, 128, 256):
        ts = [chain(n) for _ in range(3)]
        emit(kind="long", n=n,
             per_step_ms=[round(t / n * 1e3, 4) for t in ts])

    # 3) back-to-back slope with min-of-5 (current bench uses min-of-3).
    for trial in range(3):
        best8 = min(chain(8) for _ in range(5))
        best64 = min(chain(64) for _ in range(5))
        emit(kind="min5", trial=trial,
             slope_ms=round((best64 - best8) / 56 * 1e3, 4))


if __name__ == "__main__":
    main()
