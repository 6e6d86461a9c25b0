"""Constant-hop Block-DIA operator: site-independent bs x bs blocks on
static site offsets, with per-site 0/1 boundary masks.

The speed-of-light container for translation-invariant lattice block
operators (north-star config 4; reference R1 BSR flavor, SURVEY.md §3.1):
the hop blocks live in the *program* (compile-time scalars — zero matrix
traffic), only boundary masks (4 B/site per masked diagonal) stream from
HBM. Semantics match BlockDIAOperator:

    A[(a, s), (b, (s + offsets[d]) mod ns)] = hops[d][a][b] * mask_d[s]

with ``mask_d = 1`` for unmasked diagonals (mask_slot[d] == -1). Row
ordering is spin-major: row = a * ns + s.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from blockcg_tpu.operators.base import MatmatMixin


@dataclasses.dataclass
class ConstBlockDIAOperator(MatmatMixin):
    """masks: (nmask, ns) 0/1 row gates or None; hops/offsets/mask_slot are
    static structure (hops as nested tuples of Python floats)."""

    masks: jax.Array | None
    hops: tuple  # (noff)(bs)(bs) floats
    offsets: tuple[int, ...]
    mask_slot: tuple[int, ...]
    num_sites: int

    @property
    def bs(self) -> int:
        return len(self.hops[0])

    @property
    def ns(self) -> int:
        return self.num_sites

    @property
    def n(self) -> int:
        return self.bs * self.num_sites

    @property
    def shape(self) -> tuple[int, int]:
        return (self.n, self.n)

    @property
    def nnz(self) -> int:
        return getattr(
            self, "_nnz", len(self.offsets) * self.bs * self.bs * self.num_sites
        )

    @property
    def dtype(self):
        return jnp.float32 if self.masks is None else self.masks.dtype

    def to_internal(self, Xt: jax.Array) -> jax.Array:
        return Xt.reshape(Xt.shape[0], self.bs, self.ns)

    def from_internal(self, Xv: jax.Array) -> jax.Array:
        return Xv.reshape(Xv.shape[0], self.n)

    def matmat_t(self, Xt: jax.Array) -> jax.Array:
        """Apply to a lanes-major block: flat (k, n) or internal (k, bs, ns)."""
        import os

        from blockcg_tpu.ops import const_block_stencil as cbs

        flat = Xt.ndim == 2
        Xv = self.to_internal(Xt) if flat else Xt
        nmask = 0 if self.masks is None else self.masks.shape[0]
        if (
            jax.default_backend() == "tpu"
            and Xt.dtype == jnp.float32
            and (self.masks is None or self.masks.dtype == jnp.float32)
            and not os.environ.get("BLOCKCG_NO_PALLAS")
            and cbs.available(self.ns, Xt.shape[0], self.bs, self.offsets, nmask,
                              groups=cbs.n_groups(self.hops))
        ):
            Yv = cbs.const_block_stencil_spmm_t(
                self.hops, self.offsets, self.mask_slot, self.masks, Xv
            )
        else:
            Yv = self._matmat_v_xla(Xv)
        return self.from_internal(Yv) if flat else Yv

    def _matmat_t_xla(self, Xt: jax.Array) -> jax.Array:
        return self.from_internal(self._matmat_v_xla(self.to_internal(Xt)))

    def _matmat_v_xla(self, Xv: jax.Array) -> jax.Array:
        k = Xv.shape[0]
        bs, ns = self.bs, self.ns
        H = jnp.asarray(self.hops, dtype=Xv.dtype)  # (noff, bs, bs)
        Yv = jnp.zeros((k, bs, ns), dtype=Xv.dtype)
        for d, o in enumerate(self.offsets):  # static unroll
            src = Xv if o == 0 else jnp.roll(Xv, -o, axis=2)
            t = jnp.einsum(
                "ab,kbi->kai", H[d], src, precision=jax.lax.Precision.HIGHEST
            )
            if self.mask_slot[d] >= 0:
                t = t * self.masks[self.mask_slot[d]][None, None, :].astype(Xv.dtype)
            Yv = Yv + t
        return Yv

    def to_block_dia(self):
        """Materialize as a general BlockDIAOperator (tests / oracles)."""
        from blockcg_tpu.operators.bdia import BlockDIAOperator

        import numpy as np

        bs, ns = self.bs, self.ns
        cplx = any(
            isinstance(v, complex) and v.imag != 0.0
            for h in self.hops for row in h for v in row
        )
        if self.masks is None:
            dtype = np.complex64 if cplx else np.float32
        else:
            mdt = np.dtype(self.masks.dtype.name)
            if cplx:
                dtype = np.complex64 if mdt == np.float32 else np.complex128
            else:
                dtype = mdt
        masks_np = None if self.masks is None else np.asarray(jax.device_get(self.masks))
        blocks = np.empty((len(self.offsets), bs, bs, ns), dtype=dtype)
        for d in range(len(self.offsets)):
            h = np.asarray(self.hops[d], dtype=dtype)
            m = (
                np.ones(ns, dtype=dtype)
                if self.mask_slot[d] < 0
                else masks_np[self.mask_slot[d]].astype(dtype)
            )
            blocks[d] = h[:, :, None] * m[None, None, :]
        op = BlockDIAOperator(blocks=jnp.asarray(blocks), offsets=self.offsets)
        object.__setattr__(op, "_nnz", int(np.count_nonzero(blocks)))
        return op


jax.tree_util.register_dataclass(
    ConstBlockDIAOperator,
    data_fields=["masks"],
    meta_fields=["hops", "offsets", "mask_slot", "num_sites"],
)
