# Force the CPU backend with 8 virtual devices, so multi-chip sharding
# tests run anywhere (the reference has no analog; this is the "test
# multi-node without a cluster" mechanism from SURVEY.md §4).
#
# The environment may pre-register an accelerator PJRT plugin via
# sitecustomize and pin JAX_PLATFORMS before this file runs, so a plain
# os.environ.setdefault is not enough: override the env var AND the jax
# config (backend initialization is lazy, so doing it here — before any
# array op — wins).
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: production-parameter-set tests (real ring sizes; minutes "
        "on CPU). Deselect with -m 'not slow' for a quick iteration loop.")
