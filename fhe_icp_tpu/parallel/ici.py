"""Hand-written ICI exchange kernels (Pallas remote DMA).

The distributed NTT's transposes are all-to-alls over the 'sp' mesh axis
(parallel/ntt_dist.py).  XLA's collective works, but the latency-critical
stage exchange can also run as a hand-written Pallas kernel: every device
starts D-1 async remote copies (one chunk directly to each peer — the
ICI fabric routes multi-hop), overlaps them, and waits send+receive on
per-peer DMA semaphores.  `pallas_all_to_all` mirrors
`jax.lax.all_to_all(..., tiled=True)` semantics so the two backends are
interchangeable (ntt_dist.make_dist_ntt(exchange="pallas")).

On non-TPU backends the kernel runs in Pallas interpret mode, which is
how the 8-virtual-device CPU tests validate it bit-exactly against the
XLA collective.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _a2a_kernel(x_ref, out_ref, send_sem, recv_sem, *, axis_name: str,
                num_devices: int, chunk: int):
    """All-to-all over leading-axis chunks: out[src] = x_on_src[my].

    x_ref/out_ref: (num_devices * chunk, W).  Chunk j of x is destined
    for device j; chunk s of out receives from device s.
    """
    my = lax.axis_index(axis_name)
    # Local chunk moves locally.
    local = x_ref[pl.ds(my * chunk, chunk), :]
    out_ref[pl.ds(my * chunk, chunk), :] = local

    ops = []
    for s in range(1, num_devices):
        dst = lax.rem(my + jnp.int32(s), jnp.int32(num_devices))
        # Send my chunk destined for `dst`; it lands in the receiver's
        # slot `my` — but `my` is OUR id, which the receiver indexes as
        # (dst_id - s) mod D.  Computing the remote slice with local
        # values is correct because the copy descriptor travels whole.
        op = pltpu.make_async_remote_copy(
            src_ref=x_ref.at[pl.ds(dst * chunk, chunk), :],
            dst_ref=out_ref.at[pl.ds(my * chunk, chunk), :],
            send_sem=send_sem.at[s],
            recv_sem=recv_sem.at[s],
            device_id=dst,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
        op.start()
        ops.append(op)
    for op in ops:
        op.wait()


def _a2a_2d(x, axis_name: str, num_devices: int, interpret: bool):
    """(D*c, W) chunk-wise all-to-all via the Pallas kernel."""
    rows, w = x.shape
    chunk = rows // num_devices
    kernel = functools.partial(_a2a_kernel, axis_name=axis_name,
                               num_devices=num_devices, chunk=chunk)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, w), x.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA((num_devices,)),
                        pltpu.SemaphoreType.DMA((num_devices,))],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, collective_id=0),
        interpret=interpret,
    )(x)


def pallas_all_to_all(x, axis_name: str, split_axis: int, concat_axis: int,
                      num_devices: int, interpret: bool | None = None):
    """Drop-in for jax.lax.all_to_all(..., tiled=True) inside shard_map.

    Splits `split_axis` into num_devices chunks, exchanges chunk j with
    device j, concatenates received chunks along `concat_axis`.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    d = num_devices
    shape = x.shape
    assert shape[split_axis] % d == 0
    # Move split chunks to a new leading axis, flatten everything else.
    cs = shape[split_axis] // d
    xs = jnp.moveaxis(x, split_axis, 0)            # (d*cs, ...rest)
    rest = xs.shape[1:]
    flat = xs.reshape(d * cs, -1)
    out = _a2a_2d(flat, axis_name, d, interpret)
    out = out.reshape((d, cs) + rest)              # (d, cs, ...rest)
    # Restore original axis order under the leading source axis: put the
    # (now cs-sized) split axis back in place...
    out = jnp.moveaxis(out, 1, 1 + split_axis)     # (d, ...orig rank)
    # ...then concatenate the d received blocks along concat_axis.
    return jnp.concatenate([out[i] for i in range(d)], axis=concat_axis)
