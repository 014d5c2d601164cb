"""Device mesh construction for multi-chip / multi-host execution.

The reference is strictly single-process (SURVEY.md §2.3: no collectives,
no distributed runtime of any kind); every strategy here is new design:

* `dp` axis — data parallelism over ciphertext batches (documents).
* `tp` axis — tensor parallelism over RNS limbs (limbs are independent
  except at decode/keyswitch, where XLA inserts the psum).

Meshes come from `jax.make_mesh`; ops are sharded with `jax.jit` +
`NamedSharding`, letting XLA emit ICI collectives.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np

DP_AXIS = "dp"
TP_AXIS = "tp"


def make_mesh(n_devices: Optional[int] = None,
              shape: Optional[Tuple[int, int]] = None) -> jax.sharding.Mesh:
    """A (dp, tp) mesh over the first n_devices devices.

    Default factorization: put at most `n_limbs`-ish parallelism on tp;
    with no hint, use all devices on dp (limb counts are small and dp is
    the throughput axis for batch workloads).
    """
    devs = jax.devices()
    n = n_devices or len(devs)
    if shape is None:
        shape = (n, 1)
    assert shape[0] * shape[1] == n, f"mesh shape {shape} != {n} devices"
    # Auto axis types: let XLA's sharding propagation place intermediate
    # shardings (explicit mode rejects e.g. top_k over a dp-sharded array).
    auto = jax.sharding.AxisType.Auto
    return jax.make_mesh(shape, (DP_AXIS, TP_AXIS), devices=devs[:n],
                         axis_types=(auto, auto))


def batch_sharding(mesh: jax.sharding.Mesh) -> jax.sharding.NamedSharding:
    """Ciphertext batches (B, k, L, N): shard B over dp, L over tp."""
    return jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(DP_AXIS, None, TP_AXIS, None))


def replicated(mesh: jax.sharding.Mesh) -> jax.sharding.NamedSharding:
    return jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
