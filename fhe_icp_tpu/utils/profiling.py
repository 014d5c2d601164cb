"""Profiling, roofline accounting, and a metrics registry.

SURVEY.md §5 parity: the reference times phases ad hoc with time.time()
and accumulates loose metrics dicts (fhe_similarity.py:100-131).  Here:

* `trace(dir)` — context manager around jax.profiler (view in
  TensorBoard / Perfetto).
* `measure(fn, *args)` — wall-clock a jitted function with proper device
  synchronization (compile excluded), returning ms + derived rates.
* `roofline(...)` — achieved bytes/s and op/s against the declared
  footprint, so every hot kernel can report its distance from
  speed-of-light (e.g. the MXU scoring path measures within ~2% of the
  chip's raw attainable read bandwidth — see bench.py).
* `Metrics` — a tiny append-only registry with JSON export replacing the
  reference's per-object dicts.
"""

from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Callable, Dict, List, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/fhe-trace"):
    """jax.profiler trace scope (TensorBoard/Perfetto viewable)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def measure(fn: Callable, *args, iters: int = 16, warmup: int = 1) -> Dict:
    """Steady-state wall time of a (jitted) function, compile excluded."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return {"ms": dt * 1e3, "s": dt}


def measure_chained(step_fn: Callable, c_short: int = 8, c_long: int = 64,
                    reps: int = 3) -> Dict:
    """Honest per-step time via a dependency chain + host readback.

    `step_fn(token) -> token` must be a jitted function threading a small
    (e.g. uint32) token through each step so steps serialize on-device.
    Some remote-dispatch backends (the axon TPU tunnel) return from
    `block_until_ready` before device completion, making naive loop
    timing unreliable in BOTH directions; reading back the final chain
    token forces true completion, and the slope between two chain
    lengths (min over `reps` runs) cancels the fixed round-trip cost.
    """
    import jax.numpy as jnp
    import numpy as np

    def chain(n: int) -> float:
        best = float("inf")
        for _ in range(reps):
            tok = jnp.uint32(0)
            t0 = time.perf_counter()
            for _ in range(n):
                tok = step_fn(tok)
            np.asarray(tok)                     # force full completion
            best = min(best, time.perf_counter() - t0)
        return best

    chain(2)                                    # warm-up / compile
    dt = (chain(c_long) - chain(c_short)) / (c_long - c_short)
    return {"ms": dt * 1e3, "s": dt}


def measure_ondevice_loop(body: Callable, k_short: int = 8,
                          k_long: int = 40, reps: int = 5) -> Dict:
    """Per-step time of `body(token) -> token` with the loop ON DEVICE.

    Host-side chained dispatch (measure_chained) is rate-limited by the
    tunnel at ~0.3-0.4 ms/step (measured, benchmarks/
    diag_bench_variance.py), which floors and destabilizes sub-
    millisecond steps.  Here ONE dispatch runs `lax.fori_loop(k, body)`;
    the slope between two loop lengths (median of `reps`) cancels the
    dispatch + readback constant and measures pure device time.  `body`
    must thread a small token so iterations serialize.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    def run_k(k):
        @jax.jit
        def run(tok0):
            return jax.lax.fori_loop(0, k, lambda _, t: body(t), tok0)
        return run

    rs, rl = run_k(k_short), run_k(k_long)

    def t(fn) -> float:
        tok = jnp.uint32(0)
        t0 = time.perf_counter()
        np.asarray(fn(tok))                     # force full completion
        return time.perf_counter() - t0

    t(rs); t(rl)                                # compile + warm
    s = sorted((t(rl) - t(rs)) / (k_long - k_short) for _ in range(reps))
    dt = s[reps // 2]
    return {"ms": dt * 1e3, "s": dt,
            "spread": (s[-1] - s[0]) / dt if dt else 0.0}


def roofline(fn: Callable, *args, bytes_accessed: int, ops: int = 0,
             items: int = 0, iters: int = 16) -> Dict:
    """Measure fn and relate it to its declared memory/compute footprint."""
    m = measure(fn, *args, iters=iters)
    dt = m["s"]
    out = {
        "ms": m["ms"],
        "gb_per_s": bytes_accessed / dt / 1e9,
        "bytes_accessed": bytes_accessed,
    }
    if ops:
        out["gops_per_s"] = ops / dt / 1e9
    if items:
        out["items_per_s"] = items / dt
    return out


def keyswitch_footprint(n: int, l: int, n_dig: int, batch: int = 1) -> Dict:
    """Cost model of one hybrid keyswitch: limb-transforms + minimum HBM.

    Per switched polynomial (ops/arith.hybrid_keyswitch_apply): one INTT
    over l limbs; forward digit NTTs — full-limb digits (n_dig == l)
    reuse the input slice for their own limb, so l transforms per digit
    (16-bit sub-digits need all l+1); then divide-by-P on the 2
    accumulated polys = one single-limb special INTT + one l-limb delta
    forward NTT each (the subtract/scale stay in the NTT domain —
    arith._div_special).  The returned dict lets a benchmark report its
    distance from the transform-count bound (the op is NTT-dominated)
    and from the HBM floor (each transform reads+writes its operand at
    least once).
    """
    per_digit = l if n_dig == l else l + 1
    lt = batch * (l + n_dig * per_digit + 2 * (1 + l))
    hbm = 4 * n * 2 * lt                   # u32 read+write per transform
    return {"limb_transforms": lt, "min_hbm_bytes": hbm}


# HBM bandwidth spec by device kind (GB/s).  Measured probes are
# misleading here: a plain VPU read-reduce sustains LESS than the MXU
# int8 matmul path (the widening reduce, not HBM, limits it), so the
# spec sheet is the honest roofline denominator.
HBM_SPEC_GBS = {
    "TPU v4": 1228.0,
    "TPU v5 lite": 819.0,     # v5e
    "TPU v5e": 819.0,
    "TPU v5p": 2765.0,
    "TPU v6 lite": 1640.0,    # v6e / Trillium
}


def hbm_spec_gbs() -> Optional[float]:
    """Spec HBM bandwidth of the current default device, if known."""
    kind = jax.devices()[0].device_kind
    for name, bw in HBM_SPEC_GBS.items():
        if kind.startswith(name):
            return bw
    return None


def attainable_read_bw(nbytes: int = 800_000_000, iters: int = 8) -> float:
    """Empirical GB/s of a device-wide int8 read-reduce.

    NOTE: on TPU this measures the VPU widening-reduce rate, which can be
    well below both HBM spec and what an MXU-streaming kernel achieves;
    treat as a lower bound, and prefer hbm_spec_gbs() as the roofline.
    """
    import jax.numpy as jnp
    import numpy as np
    cols = 131072
    rows = max(8, nbytes // cols)
    x = jnp.asarray(np.zeros((rows, cols), dtype=np.int8))
    f = jax.jit(lambda a: a.astype(jnp.int32).sum())
    r = roofline(f, x, bytes_accessed=rows * cols, iters=iters)
    return r["gb_per_s"]


@dataclass
class Metrics:
    """Append-only metrics registry with JSON export."""

    records: List[Dict] = field(default_factory=list)

    def log(self, name: str, value: Any, **attrs) -> None:
        self.records.append({"name": name, "value": value,
                             "t": time.time(), **attrs})

    def latest(self, name: str) -> Optional[Any]:
        for rec in reversed(self.records):
            if rec["name"] == name:
                return rec["value"]
        return None

    def to_json(self, path: Optional[str] = None) -> str:
        s = json.dumps(self.records, indent=2, default=str)
        if path:
            Path(path).write_text(s)
        return s


METRICS = Metrics()
