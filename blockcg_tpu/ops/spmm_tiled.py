"""Pallas TPU sparse-tile SpMM kernel — T-K1 general-sparsity path.

Reference equivalent: R1 (SURVEY.md §3.1) for *arbitrary* CSR/BSR sparsity
(no stencil structure assumed). The matrix is preprocessed (host-side,
native C++ or numpy — blockcg_tpu/native.py) into dense T x T tiles at
sparse (row_tile, col_tile) coordinates, sorted by row tile. The kernel is
the canonical scalar-prefetch pattern:

  grid = (ntiles,);  scalar-prefetched rt/ct/first arrays drive the
  BlockSpec index maps:   A-tile i | X block at column ct[i] | Y block at
  row rt[i].  Y blocks are revisited (tiles sorted by rt), accumulated in
  VMEM, and flushed to HBM when rt changes; `first` resets the accumulator.

Per tile: one MXU matmul (k,T) @ (T,T)^T. Efficiency scales with tile
density — this is the honest generic fallback; structured operators should
use the stencil kernels (ops/stencil.py, ops/block_stencil.py).

No fused P^H(AP) Gram here (unlike the stencil kernels): the Gram term
would need an extra X row-block read per tile (the output tile is only
complete at its last visit), costing avg-tiles-per-row x (k*T) reads —
more HBM traffic than the separate one-pass gram kernel whenever a
row-tile row holds more than 2 tiles, which sparse matrices always do.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from blockcg_tpu.ops.vma import out_struct

T = 128  # tile side (MXU-native)


def _kernel(rt_ref, ct_ref, first_ref, tile_ref, x_ref, y_ref):
    i = pl.program_id(0)
    # bf16 tile STORAGE halves the padded-tile HBM read (the measured
    # bottleneck at low fill); the upcast happens here in VMEM so the MXU
    # still computes and accumulates in f32 against the full-precision X.
    tile = tile_ref[0].astype(x_ref.dtype)
    contrib = jax.lax.dot_general(
        x_ref[:],                      # (k, T)
        tile,                          # (T, T); Y += X @ A_tile^T
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    @pl.when(first_ref[i] == 1)
    def _():
        y_ref[:] = contrib

    @pl.when(first_ref[i] != 1)
    def _():
        y_ref[:] = y_ref[:] + contrib


@functools.partial(jax.jit, static_argnames=("interpret",))
def tiled_spmm_t(
    tiles: jax.Array,   # (ntiles, T, T) f32
    rt: jax.Array,      # (ntiles,) int32, sorted ascending
    ct: jax.Array,      # (ntiles,) int32
    first: jax.Array,   # (ntiles,) int32
    Xt: jax.Array,      # (k, n) lanes-major
    *,
    interpret: bool = False,
) -> jax.Array:
    ntiles = tiles.shape[0]
    k, n = Xt.shape
    assert tiles.shape[1] == T and n % T == 0, (tiles.shape, n)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((1, T, T), lambda i, rt, ct, first: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, T), lambda i, rt, ct, first: (0, ct[i]),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k, T), lambda i, rt, ct, first: (0, rt[i]),
                               memory_space=pltpu.VMEM),
    )
    flops = 2 * ntiles * k * T * T
    bytes_accessed = (tiles.dtype.itemsize * ntiles * T * T
                      + 4 * ntiles * k * T * 2)
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=out_struct((k, n), Xt.dtype, Xt),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        interpret=interpret,
    )(rt, ct, first, tiles, Xt)
