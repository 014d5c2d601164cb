"""Environment preflight + memory monitoring.

Re-implements the reference's `debug_utils.py` (11-165): a
`check_environment` probe (RAM / CPU / package versions / device
inventory / env vars, with a curated failure->fix playbook) and a
`@memory_monitor` decorator combining tracemalloc with psutil RSS.
The probes are TPU-aware: they report the JAX backend, device kind,
and HBM instead of OpenSSL/Concrete versions.
"""

from __future__ import annotations

import functools
import logging
import os
import platform
import tracemalloc
from typing import Callable, Dict

logger = logging.getLogger(__name__)

# Curated failure -> fix playbook (reference debug_utils.py:69-95).
KNOWN_ISSUES = {
    "jax backend init hangs": (
        "Another process may hold a single-tenant TPU tunnel; kill the "
        "stale PID (never by pattern), or force JAX_PLATFORMS=cpu."),
    "SIGILL / illegal instruction": (
        "Stale persistent compile cache from a different machine; clear "
        "FHE_JAX_CACHE_DIR or set FHE_JAX_CACHE=0."),
    "hub download errors": (
        "No egress: BERT weights must be pre-cached.  The pipeline falls "
        "back to the deterministic hashing embedder; set "
        "FHE_ALLOW_DOWNLOAD=1 only on connected machines."),
    "decryption garbage": (
        "Noise budget exhausted — check ops.noise.noise_budget_bits; use "
        "a preset with more limbs (e.g. mult-8192) for ct x ct chains."),
    "master password rejected": (
        "FHE_MASTER_PASSWORD mismatch with the salt in the key dir; "
        "remove the key dir to re-initialize (keys are lost)."),
}

RELEVANT_ENV = ("JAX_PLATFORMS", "XLA_FLAGS", "FHE_MASTER_PASSWORD",
                "FHE_JAX_CACHE", "FHE_JAX_CACHE_DIR", "FHE_ALLOW_DOWNLOAD",
                "TRANSFORMERS_CACHE", "OMP_NUM_THREADS")


def check_environment(verbose: bool = True) -> Dict:
    """Probe the runtime environment (reference debug_utils.py:11-133)."""
    info: Dict = {"platform": platform.platform(),
                  "python": platform.python_version()}

    try:
        import psutil
        vm = psutil.virtual_memory()
        info["ram_gb"] = round(vm.total / 1e9, 1)
        info["ram_available_gb"] = round(vm.available / 1e9, 1)
        info["cpu_count"] = psutil.cpu_count()
    except Exception as e:
        info["psutil_error"] = str(e)

    for pkg in ("jax", "jaxlib", "numpy", "flax", "transformers"):
        try:
            info[f"{pkg}_version"] = __import__(pkg).__version__
        except Exception:
            info[f"{pkg}_version"] = None

    try:
        import jax
        info["jax_backend"] = jax.default_backend()
        info["devices"] = [str(d) for d in jax.devices()]
    except Exception as e:
        info["jax_error"] = str(e)

    info["env"] = {k: ("<set>" if k == "FHE_MASTER_PASSWORD" else v)
                   for k in RELEVANT_ENV
                   if (v := os.environ.get(k)) is not None}

    if verbose:
        for k, v in info.items():
            logger.info("%s: %s", k, v)
    return info


def memory_monitor(fn: Callable) -> Callable:
    """Decorator: log tracemalloc peak + RSS delta around a call
    (reference debug_utils.py:136-165)."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        try:
            import psutil
            rss0 = psutil.Process().memory_info().rss
        except Exception:
            rss0 = None
        tracemalloc.start()
        try:
            return fn(*args, **kwargs)
        finally:
            current, peak = tracemalloc.get_traced_memory()
            tracemalloc.stop()
            msg = (f"{fn.__name__}: python alloc current={current / 1e6:.1f}MB "
                   f"peak={peak / 1e6:.1f}MB")
            if rss0 is not None:
                import psutil
                rss1 = psutil.Process().memory_info().rss
                msg += f" rss_delta={(rss1 - rss0) / 1e6:+.1f}MB"
            logger.info(msg)

    return wrapper


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    check_environment()
