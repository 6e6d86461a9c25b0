"""shard_map-aware out_shape builder for Pallas kernels.

On a REAL TPU backend, a ``pl.pallas_call`` traced inside
``jax.shard_map(..., check_vma=True)`` must declare how each output varies
across mesh axes (``ShapeDtypeStruct(vma=...)``) — otherwise lowering
raises (first seen on-chip in tests/test_chip_smoke.py::
test_shard_map_single_device_solve_f32; the CPU fake-mesh suite cannot
catch it because ``_pallas_ok`` routes CPU applies to the XLA fallback).

Every kernel output here varies exactly like the kernel's field input
(local SpMM tiles, local Gram partials before their psum), so the helper
copies the field's varying-mesh-axes. Outside shard_map the vma set is
empty and a plain struct is returned — eager/jit behavior unchanged.
"""

from __future__ import annotations

import jax


def out_struct(shape, dtype, like) -> jax.ShapeDtypeStruct:
    """ShapeDtypeStruct for a pallas_call out_shape, inheriting the
    varying-mesh-axes of the traced field input ``like``."""
    vma = getattr(jax.typeof(like), "vma", None)
    if vma:
        return jax.ShapeDtypeStruct(shape, dtype, vma=vma)
    return jax.ShapeDtypeStruct(shape, dtype)
