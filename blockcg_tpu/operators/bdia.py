"""Block-DIA operator: per-site bs x bs blocks on static site offsets.

The TPU-native representation of nearest-neighbor lattice block operators
(the north-star config-4 Dirac-like operator; reference R1 BSR flavor,
SURVEY.md §3.1). Compared to generic BSR it drops the column-index arrays
entirely (offsets are static structure) — ~4 B/nnz of matrix traffic, the
roofline winner — and maps onto the block-stencil Pallas kernel.

Row ordering is spin-major: row = a * ns + s (a = block/spin index,
s = site). Periodic wraps are separate masked diagonals (see
problems/dirac.py), so all structure is static.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from blockcg_tpu.operators.base import MatmatMixin


@dataclasses.dataclass
class BlockDIAOperator(MatmatMixin):
    """blocks: (noff, bs, bs, ns); offsets: static site offsets.

    ``blocks[d, a, b, s]`` couples row (a, s) to column
    (b, (s + offsets[d]) mod ns) — semantics are toroidal, matching the
    stencil kernels. Builders zero slots with no true coupling.
    """

    blocks: jax.Array
    offsets: tuple[int, ...]

    @property
    def bs(self) -> int:
        return self.blocks.shape[1]

    @property
    def ns(self) -> int:
        return self.blocks.shape[3]

    @property
    def n(self) -> int:
        return self.bs * self.ns

    @property
    def shape(self) -> tuple[int, int]:
        return (self.n, self.n)

    @property
    def nnz(self) -> int:
        return getattr(
            self, "_nnz", self.blocks.shape[0] * self.bs * self.bs * self.ns
        )

    @property
    def dtype(self):
        return self.blocks.dtype

    def to_internal(self, Xt: jax.Array) -> jax.Array:
        return Xt.reshape(Xt.shape[0], self.bs, self.ns)

    def from_internal(self, Xv: jax.Array) -> jax.Array:
        return Xv.reshape(Xv.shape[0], self.n)

    def matmat_t(self, Xt: jax.Array) -> jax.Array:
        """Apply to a lanes-major block: flat (k, n) or internal (k, bs, ns)."""
        import os

        from blockcg_tpu.ops import block_stencil

        flat = Xt.ndim == 2
        Xv = self.to_internal(Xt) if flat else Xt
        if (
            jax.default_backend() == "tpu"
            # f32 fields; blocks may be stored bf16 (halves coefficient
            # memory at ~4e-4 operator rounding — measured NOT faster on
            # this chip: the in-kernel converts outweigh the bandwidth
            # saving on the VPU-bound kernel, so bf16 here is a memory
            # option, not a speed one). f64 (emulated) takes the XLA path.
            and self.dtype in (jnp.float32, jnp.bfloat16)
            and Xt.dtype == jnp.float32
            and not os.environ.get("BLOCKCG_NO_PALLAS")
            and block_stencil.available(self.ns, Xt.shape[0], self.bs, self.offsets)
        ):
            Yv = block_stencil.block_stencil_spmm_t(self.blocks, self.offsets, Xv)
        else:
            Yv = self._matmat_v_xla(Xv)
        return self.from_internal(Yv) if flat else Yv

    def _matmat_t_xla(self, Xt: jax.Array) -> jax.Array:
        return self.from_internal(self._matmat_v_xla(self.to_internal(Xt)))

    def _matmat_v_xla(self, Xv: jax.Array) -> jax.Array:
        # Toroidal semantics (match the Pallas kernel): site = (s + o) mod ns.
        k = Xv.shape[0]
        bs, ns = self.bs, self.ns
        Yv = jnp.zeros((k, bs, ns), dtype=Xv.dtype)
        for d, o in enumerate(self.offsets):  # static unroll
            src = Xv if o == 0 else jnp.roll(Xv, -o, axis=2)
            # Y[k, a, i] += sum_b blocks[d, a, b, i] * src[k, b, i]
            Yv = Yv + jnp.einsum(
                "abi,kbi->kai", self.blocks[d], src,
                precision=jax.lax.Precision.HIGHEST,
            )
        return Yv


jax.tree_util.register_dataclass(
    BlockDIAOperator, data_fields=["blocks"], meta_fields=["offsets"]
)
