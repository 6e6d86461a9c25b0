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
    # True iff every coefficient whose SITE column wraps modulo ns is
    # EXACTLY zero (open-BC builders zero them by construction; periodic
    # builders ride the toroidal wrap with NONZERO slowest-axis hops).
    # Gates the ring kernel's donated (in-place) apply, exactly as
    # DIAOperator.wrap_zero does for the scalar ring kernel.
    wrap_zero: bool = False
    # FOLDED periodic-wrap representation (round 5, VERDICT r4 item 3):
    # each mostly-zero toroidal wrap diagonal merged into its bulk hop
    # partner (complementary site support — verified by the builder), so
    # the ring kernel streams 9 instead of 15/17 dense diagonals.
    # ``blocks_folded``: (noff_folded, bs, bs, ns) merged values;
    # ``fold_offsets``: their bulk offsets; ``fold``: ((idx, L), ...) per
    # folded diagonal (see ops/block_stencil_ring.plan). Optional — only
    # the merged ring path consumes it; every other consumer (XLA
    # fallback, scipy oracle, partitioner, windowed kernels) keeps the
    # plain ``blocks``/``offsets`` semantics.
    blocks_folded: jax.Array | None = None
    fold_offsets: tuple[int, ...] = ()
    fold: tuple[tuple[int, int], ...] = ()

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
        """Flat lanes-major (k, bs*ns) -> merged spin-major (m = bs*k, ns)
        (unpadded sublanes whenever 8 | m — see operators/cbdia.py)."""
        k = Xt.shape[0]
        Xv = Xt.reshape(k, self.bs, self.ns)
        return jnp.swapaxes(Xv, 0, 1).reshape(self.bs * k, self.ns)

    def from_internal(self, Xm: jax.Array) -> jax.Array:
        k = Xm.shape[0] // self.bs
        Xv = Xm.reshape(self.bs, k, self.ns)
        return jnp.swapaxes(Xv, 0, 1).reshape(k, self.n)

    def coeff_expand(self, C):
        return jnp.kron(jnp.eye(self.bs, dtype=C.dtype), C)

    def gram_contract(self, G):
        k = G.shape[0] // self.bs
        return jnp.einsum("aiaj->ij", G.reshape(self.bs, k, self.bs, k))

    def norms2_contract(self, v):
        return v.reshape(self.bs, -1).sum(axis=0)

    def _kernel_ok(self, dtype) -> bool:
        import os

        return (
            jax.default_backend() == "tpu"
            # f32 fields; blocks may be stored bf16 (halves coefficient
            # memory at ~4e-4 operator rounding — measured NOT faster on
            # this chip: the in-kernel converts outweigh the bandwidth
            # saving on the VPU-bound kernel, so bf16 here is a memory
            # option, not a speed one). f64 (emulated) takes the XLA path.
            and self.dtype in (jnp.float32, jnp.bfloat16)
            and dtype == jnp.float32
            and not os.environ.get("BLOCKCG_NO_PALLAS")
        )

    def _use_ring(self, Xm) -> bool:
        """Large-n merged-path dispatch: the rolling-ring block kernel
        (each X block fetched from HBM once, x_reads = 1.0 vs ~3 windowed
        — ops/block_stencil_ring.py). Mirrors DIAOperator._use_ring:
        ``BLOCKCG_NO_RING=1`` disables; ``BLOCKCG_RING_MAX_MB`` is the
        escape valve (unset = unlimited, 0 = ring off)."""
        import os

        from blockcg_tpu.ops import block_stencil_ring

        if os.environ.get("BLOCKCG_NO_RING"):
            return False
        ring_max_mb = int(os.environ.get("BLOCKCG_RING_MAX_MB", "-1"))
        if ring_max_mb >= 0 and (
                Xm.shape[0] * self.ns * Xm.dtype.itemsize
                > ring_max_mb * 2**20):
            return False
        # Small-n guard, mirroring DIAOperator._use_ring: when the windowed
        # plan re-reads X at most twice the field is (near-)VMEM-resident and
        # the windowed kernel wins big (chip L=8 probe: windowed 286 vs ring
        # 79.6 Gnnz/s, CHIP_QUEUE_r4.log:242-243; crossover measured in
        # CHIP_QUEUE_r5.log probe-block-ring-crossover). Ring pays off only
        # once the windowed schedule starts re-streaming X from HBM.
        from blockcg_tpu.ops import block_stencil

        if not os.environ.get("BLOCKCG_FORCE_RING"):
            p = block_stencil.plan_m(
                self.ns, Xm.shape[0], self.bs, self.offsets)
            if p is not None and p.x_reads <= 2.0:
                return False
        if self._use_fold():  # availability must match the dispatch form
            return block_stencil_ring.available(
                self.ns, Xm.shape[0], self.bs, self.fold_offsets,
                itemsize=Xm.dtype.itemsize,
                coeff_itemsize=self.blocks_folded.dtype.itemsize,
                fold=self.fold)
        return block_stencil_ring.available(
            self.ns, Xm.shape[0], self.bs, self.offsets,
            itemsize=Xm.dtype.itemsize,
            coeff_itemsize=self.blocks.dtype.itemsize)

    def _use_fold(self) -> bool:
        """Folded-wrap ring dispatch is OPT-IN (BLOCKCG_FOLD=1): the chip
        measured the plain ring FASTER (48.8 vs 45.2 Gnnz/s at 32^4 k=12,
        52.7 vs 40.8 at k=16 — CHIP_QUEUE_r5.log probe-block-ring-FOLDED)
        because the kernel runs at 0.67 of its own HBM ceiling — it is
        SCHEDULE-bound, so the 1.4x coefficient-traffic cut cannot pay and
        the per-lane source select adds VPU work. Kept for bandwidth-
        starved parts (or a future schedule fix) behind the env valve."""
        import os

        return bool(self.fold) and bool(os.environ.get("BLOCKCG_FOLD"))

    def matmat_t(self, Xt: jax.Array, donate: bool = False) -> jax.Array:
        """Apply to a lanes-major block: merged internal (m, ns), flat
        (k, bs*ns), or the legacy 3D (k, bs, ns) view (used by the
        distributed wrapper's local shards).

        ``donate=True`` asks for the in-place apply (Y aliased onto Xt).
        Honored only on the merged ring path of a ``wrap_zero`` operator
        (the one combination where in-place is race-free — see
        ops/block_stencil_ring.py); elsewhere it is silently a fresh-output
        apply."""
        from blockcg_tpu.ops import block_stencil, block_stencil_ring

        if Xt.ndim == 2 and Xt.shape[-1] == self.ns:  # merged internal
            Xm = Xt
            if self._kernel_ok(Xt.dtype):
                if self._use_ring(Xm):
                    if self._use_fold():
                        return block_stencil_ring.ring_block_spmm_m_t(
                            self.blocks_folded, self.fold_offsets, Xm,
                            fold=self.fold,
                            donate=donate and self.wrap_zero,
                        )
                    return block_stencil_ring.ring_block_spmm_m_t(
                        self.blocks, self.offsets, Xm,
                        donate=donate and self.wrap_zero,
                    )
                if block_stencil.available_m(
                    self.ns, Xm.shape[0], self.bs, self.offsets
                ):
                    return block_stencil.block_stencil_spmm_m_t(
                        self.blocks, self.offsets, Xm
                    )
            return self._matmat_m_xla(Xm)
        flat = Xt.ndim == 2
        Xv = Xt.reshape(Xt.shape[0], self.bs, self.ns) if flat else Xt
        if self._kernel_ok(Xt.dtype) and block_stencil.available(
            self.ns, Xt.shape[0], self.bs, self.offsets
        ):
            Yv = block_stencil.block_stencil_spmm_t(self.blocks, self.offsets, Xv)
        else:
            Yv = self._matmat_v_xla(Xv)
        return Yv.reshape(Yv.shape[0], self.n) if flat else Yv

    def matmat_gram_t(self, Xt: jax.Array, donate: bool = False):
        """Fused (Y = A X, G) on the merged internal view; (Y, None) else.

        ``donate`` as in :meth:`matmat_t` (ring + wrap_zero only)."""
        from blockcg_tpu.ops import block_stencil, block_stencil_ring

        if (
            Xt.ndim == 2 and Xt.shape[-1] == self.ns
            and self._kernel_ok(Xt.dtype)
            and Xt.dtype == jnp.float32 and self.dtype == jnp.float32
        ):
            if self._use_ring(Xt):
                if self._use_fold():
                    Ym, Gm = block_stencil_ring.ring_block_spmm_m_gram_t(
                        self.blocks_folded, self.fold_offsets, Xt,
                        fold=self.fold,
                        donate=donate and self.wrap_zero,
                    )
                else:
                    Ym, Gm = block_stencil_ring.ring_block_spmm_m_gram_t(
                        self.blocks, self.offsets, Xt,
                        donate=donate and self.wrap_zero,
                    )
                return Ym, self.gram_contract(Gm)
            if block_stencil.available_m(self.ns, Xt.shape[0], self.bs,
                                         self.offsets):
                Ym, Gm = block_stencil.block_stencil_spmm_m_gram_t(
                    self.blocks, self.offsets, Xt
                )
                return Ym, self.gram_contract(Gm)
        return self.matmat_t(Xt), None

    def _matmat_m_xla(self, Xm: jax.Array) -> jax.Array:
        m, ns = Xm.shape
        bs = self.bs
        k = m // bs
        Xv = Xm.reshape(bs, k, ns)
        Yv = jnp.zeros((bs, k, ns), dtype=Xm.dtype)
        for d, o in enumerate(self.offsets):  # static unroll
            src = Xv if o == 0 else jnp.roll(Xv, -o, axis=2)
            Yv = Yv + jnp.einsum(
                "abi,bki->aki", self.blocks[d].astype(Xm.dtype), src,
                precision=jax.lax.Precision.HIGHEST,
            )
        return Yv.reshape(m, ns)

    def _matmat_t_xla(self, Xt: jax.Array) -> jax.Array:
        k = Xt.shape[0]
        Yv = self._matmat_v_xla(Xt.reshape(k, self.bs, self.ns))
        return Yv.reshape(k, self.n)

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
    BlockDIAOperator,
    data_fields=["blocks", "blocks_folded"],
    meta_fields=["offsets", "wrap_zero", "fold_offsets", "fold"],
)
