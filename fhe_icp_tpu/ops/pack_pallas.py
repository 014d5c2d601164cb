"""Fused Pallas kernel for packed encrypted scoring (the headline hot path).

packed_scores (ops/pack.py) is three XLA ops: an int8 digit matmul, the
separable digit fold, and the RNS decode.  Measured on a v5e chip the
XLA path runs at 0.237 ms/step (69% of HBM spec): the matmul alone
streams the document operand at ~945 GB/s, but XLA materializes the
(L, G*4, 4S) int32 partials to HBM between matmul and fold and the fold
costs a second pass.

This kernel fuses matmul + digit fold per (limb, row-block) grid step:
partials live only in VMEM/registers, the document digits are read from
HBM exactly once, and the only HBM write is the (L, G, S) u32 residue
tensor (0.5 MB vs 8.4 MB of partials).  The tiny exact RNS decode stays
in XLA (one fused pass over 0.5 MB).  Measured: 0.183 ms/step — 732 GB/s
effective, 89% of the v5e HBM spec, 357M encrypted dot-products/s.

Kernel design notes (measured on chip, see round-3 commit history):
* The epilogue runs at FULL 128-lane width: the separable digit weight
  2^{8(i+j)} = 2^{8i} * 2^{8j} is precomputed as a (4, 4S) Montgomery
  tile W[i, j*S+s] = mont(2^{8(i+j)}), so one elementwise mont_mul over
  the whole (RB, 4S) partial block applies BOTH folds' constants; what
  remains is six add_mod reductions (4 lane blocks, then 4 row phases).
  A narrow per-digit epilogue (32-lane ops) costs 2.4x more VPU time.
* Row block 512 (128 groups) pipelines best (re-measured after the
  matmul-layout query operand landed: 512 beats 256 by ~40% on chip —
  0.186 vs 0.312 ms/step in an isolated probe); 1024 overflows the
  16 MB VMEM scoped limit with double buffering.
* Per-limb scalars (p, -p^-1, mu) ride one small SMEM table indexed by
  program_id; Shoup/Montgomery code is shared verbatim with the XLA
  path (ops/modmath.py is uint32-lane-only by design), so the kernel is
  bit-identical to fold_separable and gated by the same oracles
  (tests/test_pack_pallas.py interpret-mode; bench.py's exactness gate
  at production size on real TPU).

Replaces the per-document Concrete predict loop of the reference
(/root/reference/batch_operations.py:263-284) at ciphertext-store scale.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .context import CryptoContext
from .fastdot import N_DIGITS, _shift_consts
from .modmath import U32, add_mod, barrett_reduce, mont_mul, neg_mod

# Rows (doc digit planes) per grid step: 128 groups x 4 digits.  A block
# is RB x 2N int8 = 4 MB at N=4096; two buffers pipeline well under the
# 16 MB VMEM budget with the 1 MB query operand resident.
_ROW_BLOCK = 512

# Public pad granularity for operand builders: group counts that are a
# multiple of PAD_GROUPS stream through the kernel with zero per-call
# padding (each group contributes N_DIGITS digit rows).  On a sharded
# mesh the guarantee holds when the PER-SHARD group count is a multiple,
# i.e. pad to n_devices * PAD_GROUPS (see parallel/search.py).
ROW_BLOCK = _ROW_BLOCK
PAD_GROUPS = _ROW_BLOCK // N_DIGITS


def _fold_kernel(tab_ref, a_ref, v_ref, w_ref, out_ref, *, slots: int):
    """One (limb, row-block) step: int8 matmul + full-lane digit fold.

    tab_ref: (L, 8) u32 SMEM (full array; row = current limb) —
    [p, -p^-1 mod 2^32, floor(2^32/p), 0...].
    a_ref: (1, RB, 2N) int8 doc digit rows (group-major, i innermost).
    v_ref: (1, 2N, 4S) int8 folded query digit columns (j-major).
    w_ref: (1, 4, 4S) u32 Montgomery weight tile mont(2^{8(i+j)}).
    out_ref: (1, RB//4, S) u32 score residues mod p.
    """
    li = pl.program_id(0)
    p = tab_ref[li, 0]
    pinv = tab_ref[li, 1]
    mu = tab_ref[li, 2]
    s = slots

    part = jax.lax.dot_general(
        a_ref[0], v_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)             # (RB, 4S) exact

    neg = part < 0
    mag = jnp.where(neg, -part, part).astype(U32)
    r = barrett_reduce(mag, p, mu)
    r = jnp.where(neg, neg_mod(r, p), r)
    w = jnp.tile(w_ref[0], (part.shape[0] // 4, 1))   # (RB, 4S)
    m = mont_mul(r, w, p, pinv)
    lane = add_mod(add_mod(m[:, :s], m[:, s:2 * s], p),
                   add_mod(m[:, 2 * s:3 * s], m[:, 3 * s:], p), p)
    g3 = lane.reshape(lane.shape[0] // 4, 4, s)
    out_ref[0] = add_mod(add_mod(g3[:, 0], g3[:, 1], p),
                         add_mod(g3[:, 2], g3[:, 3], p), p)


def _limb_tables(ctx: CryptoContext, l: int) -> np.ndarray:
    """(L, 8) u32 per-limb scalar table for the kernel's SMEM block.

    Built from the host-side Python primes (NOT ctx's device arrays,
    which would be tracers inside a jit trace) and cached as numpy so it
    embeds safely as a constant in any trace.
    """
    key = ("pack_pallas_tab", l)
    cached = ctx.cache.get(key)
    if cached is not None:
        return cached
    tab = np.zeros((l, 8), dtype=np.uint32)
    for i, p in enumerate(ctx.primes[:l]):
        tab[i, 0] = p
        tab[i, 1] = (-pow(p, -1, 1 << 32)) % (1 << 32)
        tab[i, 2] = (1 << 32) // p
    ctx.cache[key] = tab
    return tab


def _weight_tile(ctx: CryptoContext, l: int, slots: int) -> np.ndarray:
    """(L, 4, 4S) u32 Montgomery separable-fold weights.

    W[li, i, j*S + s] = 2^{8(i+j)} * 2^32 mod p_li — applying the doc-
    digit (row phase i) and query-digit (column block j) shift constants
    in ONE full-lane multiply.
    """
    key = ("pack_pallas_w", l, slots)
    cached = ctx.cache.get(key)
    if cached is not None:
        return cached
    consts = _shift_consts(ctx, l)                    # (7, L) Montgomery 2^{8s}
    w = np.zeros((l, N_DIGITS, N_DIGITS * slots), dtype=np.uint32)
    for li in range(l):
        for i in range(N_DIGITS):
            for j in range(N_DIGITS):
                w[li, i, j * slots:(j + 1) * slots] = consts[i + j, li]
    ctx.cache[key] = w
    return w


def packed_score_residues(ctx: CryptoContext, a_digits, v_digits, l: int,
                          slots: int, row_block: int = _ROW_BLOCK,
                          interpret: bool = False):
    """(L, G*4, 2N) i8 x (L, 2N, 4S) i8 -> (L, G, S) u32 residues, fused.

    `interpret=True` runs the kernel in the Pallas interpreter (CPU
    exactness tests — tests/test_pack_pallas.py); real runs compile via
    Mosaic on TPU.
    """
    la, r_rows, k = a_digits.shape
    # Mosaic requires block dims divisible by the (8, 128) tile (or equal
    # to the array dim), so ragged row counts (e.g. 100k docs -> G=3125
    # -> 12500 rows) are zero-padded up to the block size.  Zero digit
    # rows produce zero partials -> zero residues, sliced off below; the
    # pad costs one extra copy of A per call — stores that care keep G a
    # multiple of row_block/4 (make_packed_doc_operand pad_groups_to).
    pad = (-r_rows) % row_block
    if pad:
        a_digits = jnp.pad(a_digits, ((0, 0), (0, pad), (0, 0)))
    rr = r_rows + pad
    grid = (la, rr // row_block)
    tab = jnp.asarray(_limb_tables(ctx, l))
    w = jnp.asarray(_weight_tile(ctx, l, slots))

    out = pl.pallas_call(
        functools.partial(_fold_kernel, slots=slots),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),    # full (L, 8) table
            pl.BlockSpec((1, row_block, k), lambda l_, r_: (l_, r_, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, 4 * slots), lambda l_, r_: (l_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N_DIGITS, 4 * slots), lambda l_, r_: (l_, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, row_block // 4, slots),
                               lambda l_, r_: (l_, r_, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((la, rr // 4, slots), jnp.uint32),
        cost_estimate=pl.CostEstimate(
            flops=2 * la * rr * k * 4 * slots,
            bytes_accessed=a_digits.size + v_digits.size
            + la * rr * slots,
            transcendentals=0),
        interpret=interpret,
    )(tab, a_digits, v_digits, w)
    return out[:, : r_rows // 4, :] if pad else out
