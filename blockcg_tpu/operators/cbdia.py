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
    # Slab-routable diagonals (see detect_slabs): static entries
    # (d, g, nblocks, dst_mul, dst_off, src_shift). These diagonals are
    # excluded from the main stencil kernel (freeing its tile planner from
    # their far windows) and accumulated by the tiny slab kernel instead.
    slabs: tuple = ()

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
        mdt = jnp.float32 if self.masks is None else self.masks.dtype
        if any(
            isinstance(v, complex) and v.imag != 0.0
            for h in self.hops for row in h for v in row
        ):
            return jnp.complex64 if mdt == jnp.float32 else jnp.complex128
        return mdt

    def to_internal(self, Xt: jax.Array) -> jax.Array:
        """Flat lanes-major (k, bs*ns) [spin-major rows a*ns + s] -> merged
        spin-major internal (m, ns), m = bs*k, row = a*k + i.

        The merged layout keeps the sublane dim a multiple of 8 (no DMA
        padding: a (k, bs, ns) view pads bs -> 8 and moves up to 2x the
        useful bytes per field pass for bs=4). One physical transpose per
        solve entry — the hot loop is relayout-free."""
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

    def _main_statics(self):
        """Main-kernel diagonals: all minus the slab-routed ones. Mask
        slots are RE-INDEXED against the used subset (``used`` is the
        static tuple of original slot rows), so slab-routed diagonals'
        masks are not streamed through the main kernel (dead rows would
        cost bandwidth on every tile and shrink the planner's tile)."""
        drop = {e[0] for e in self.slabs}
        keep = [d for d in range(len(self.offsets)) if d not in drop]
        slots = [self.mask_slot[d] for d in keep]
        used = tuple(sorted({sl for sl in slots if sl >= 0}))
        remap = {sl: i for i, sl in enumerate(used)}
        return (
            tuple(self.hops[d] for d in keep),
            tuple(self.offsets[d] for d in keep),
            tuple(remap[sl] if sl >= 0 else -1 for sl in slots),
            used,
        )

    def _main_masks(self, used: tuple):
        """Mask rows streamed by the main kernel (sliced to used slots)."""
        if self.masks is None or not used:
            return None
        if used == tuple(range(self.masks.shape[0])):
            return self.masks  # no gather copy when nothing is dropped
        import numpy as _np

        return self.masks[jnp.asarray(_np.asarray(used))]

    def _is_internal(self, Xt: jax.Array) -> bool:
        return Xt.shape[-1] == self.ns

    def _env_ok(self, dtype, interpret: bool) -> bool:
        """Backend/dtype/mask gating shared by every kernel route."""
        import os

        return (
            (interpret or (jax.default_backend() == "tpu"
                           and not os.environ.get("BLOCKCG_NO_PALLAS")))
            and dtype == jnp.float32
            and (self.masks is None or self.masks.dtype == jnp.float32)
        )

    def _pallas_ok(self, Xm, interpret: bool) -> bool:
        from blockcg_tpu.ops import const_block_stencil as cbs

        hops_m, offs_m, _, used = self._main_statics()
        nmask = len(used) if self.masks is not None else 0
        return self._env_ok(Xm.dtype, interpret) and cbs.available_m(
            self.ns, Xm.shape[0], offs_m, nmask, groups=cbs.n_groups(hops_m)
        )

    def matmat_t(self, Xt: jax.Array, interpret: bool = False) -> jax.Array:
        """Apply to a lanes-major block: flat (k, n) [spin-major rows], the
        merged internal (m, ns) view, or the legacy 3D (k, bs, ns) view."""
        from blockcg_tpu.ops import const_block_stencil as cbs

        if Xt.ndim == 3:  # legacy 3D view: convert through merged
            k = Xt.shape[0]
            Xm = jnp.swapaxes(Xt, 0, 1).reshape(self.bs * k, self.ns)
            Ym = self.matmat_t(Xm, interpret=interpret)
            return jnp.swapaxes(Ym.reshape(self.bs, k, self.ns), 0, 1)
        if not self._is_internal(Xt):
            return self.from_internal(
                self.matmat_t(self.to_internal(Xt), interpret=interpret)
            )
        Xm = Xt
        hops_m, offs_m, mslot_m, used = self._main_statics()
        if self._pallas_ok(Xm, interpret):
            Ym = cbs.const_block_stencil_spmm_m_t(
                hops_m, offs_m, mslot_m, self._main_masks(used), Xm,
                interpret=interpret
            )
            for d, g, nblocks, dst_mul, dst_off, src_shift in self.slabs:
                Ym = cbs.slab_m_accumulate(
                    self.hops[d], g, nblocks, dst_mul, dst_off, src_shift,
                    Xm, Ym, interpret=interpret,
                )
            return Ym
        if Xm.shape[0] == self.bs:
            # k = 1 (CG path): merged (bs, ns) <-> (1, bs, ns) is a free
            # reshape, so the legacy 3D kernel (which pads k to 8 sublanes
            # — same cost as the old layout) still serves single-RHS solves
            # whose m = bs is not 8-aligned.
            nmask = len(used) if self.masks is not None else 0
            if self._env_ok(Xm.dtype, interpret) and cbs.available(
                self.ns, 1, self.bs, offs_m, nmask,
                groups=cbs.n_groups(hops_m)
            ):
                Xv = Xm.reshape(1, self.bs, self.ns)
                Yv = cbs.const_block_stencil_spmm_t(
                    hops_m, offs_m, mslot_m, self._main_masks(used), Xv,
                    interpret=interpret,
                )
                for d, g, nblocks, dst_mul, dst_off, src_shift in self.slabs:
                    Yv = cbs.slab_block_accumulate(
                        self.hops[d], g, nblocks, dst_mul, dst_off,
                        src_shift, Xv, Yv, interpret=interpret,
                    )
                return Yv.reshape(self.bs, self.ns)
        return self._matmat_m_xla(Xm)

    def matmat_gram_t(self, Xt: jax.Array, interpret: bool = False):
        """Fused (Y = A X, G): the merged kernel emits the (m, m) Gram from
        tiles already in VMEM (slab wraps accumulate their correction), and
        it is contracted to the solvers' k x k here. Falls back to
        (matmat_t, None)."""
        from blockcg_tpu.ops import const_block_stencil as cbs

        if not self._is_internal(Xt):
            Ym, G = self.matmat_gram_t(self.to_internal(Xt),
                                       interpret=interpret)
            return self.from_internal(Ym), G
        Xm = Xt
        hops_m, offs_m, mslot_m, used = self._main_statics()
        if not self._pallas_ok(Xm, interpret):
            return self.matmat_t(Xm, interpret=interpret), None
        Ym, Gm = cbs.const_block_stencil_spmm_m_gram_t(
            hops_m, offs_m, mslot_m, self._main_masks(used), Xm,
            interpret=interpret
        )
        for d, g, nblocks, dst_mul, dst_off, src_shift in self.slabs:
            # Slab kernel applies the wrap AND accumulates its Gram
            # correction (only the touched boundary slabs stream from HBM).
            Ym, Gm = cbs.slab_m_accumulate(
                self.hops[d], g, nblocks, dst_mul, dst_off, src_shift,
                Xm, Ym, Gm, with_gram=True, interpret=interpret,
            )
        return Ym, self.gram_contract(Gm)

    def _matmat_t_xla(self, Xt: jax.Array) -> jax.Array:
        return self.from_internal(self._matmat_m_xla(self.to_internal(Xt)))

    def _matmat_m_xla(self, Xm: jax.Array) -> jax.Array:
        m, ns = Xm.shape
        bs = self.bs
        k = m // bs
        Xv = Xm.reshape(bs, k, ns)
        H = jnp.asarray(self.hops, dtype=Xm.dtype)  # (noff, bs, bs)
        Yv = jnp.zeros((bs, k, ns), dtype=Xm.dtype)
        for d, o in enumerate(self.offsets):  # static unroll
            src = Xv if o == 0 else jnp.roll(Xv, -o, axis=2)
            t = jnp.einsum(
                "ab,bki->aki", H[d], src, precision=jax.lax.Precision.HIGHEST
            )
            if self.mask_slot[d] >= 0:
                t = t * self.masks[self.mask_slot[d]][None, None, :].astype(Xm.dtype)
            Yv = Yv + t
        return Yv.reshape(m, ns)

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
    meta_fields=["hops", "offsets", "mask_slot", "num_sites", "slabs"],
)


def detect_slabs(op: ConstBlockDIAOperator, max_frac: float = 0.25):
    """Identify slab-routable diagonals and return an operator that applies
    them through the slab-accumulate kernel.

    A diagonal qualifies when its 0/1 mask support is a union of full
    g-aligned site blocks (g | offset) at a regular stride covering at most
    ``max_frac`` of the sites — e.g. the periodic-wrap diagonals of lattice
    operators, which otherwise pin the main kernel's tile size through
    their far windows (SURVEY.md §8 hard part 3 territory)."""
    import dataclasses as _dc

    import numpy as np

    if op.masks is None:
        return op
    masks_np = np.asarray(jax.device_get(op.masks))
    ns = op.num_sites
    slabs = []
    for d, o in enumerate(op.offsets):
        ms = op.mask_slot[d]
        if ms < 0:
            continue
        m = masks_np[ms]
        if not np.all((m == 0) | (m == 1)):
            continue
        for g in (4096, 2048, 1024, 512, 256):
            if ns % g or o % g:
                continue
            rows = m.reshape(-1, g).sum(axis=1)
            if not np.all((rows == 0) | (rows == g)):
                continue
            blks = np.where(rows == g)[0]
            if len(blks) == 0 or len(blks) * g > max_frac * ns:
                break  # smaller g cannot reduce the covered fraction
            if len(blks) > 1:
                strides = np.diff(blks)
                if not np.all(strides == strides[0]):
                    continue
                mul = int(strides[0])
            else:
                mul = 1
            slabs.append((d, g, len(blks), mul, int(blks[0]), o // g))
            break
    if not slabs:
        return op
    out = _dc.replace(op, slabs=tuple(slabs))
    if hasattr(op, "_nnz"):
        object.__setattr__(out, "_nnz", op._nnz)
    return out
