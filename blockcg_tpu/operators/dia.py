"""DIA (diagonal / banded) operator.

For stencil matrices (the north-star Laplacian configs) DIA is the roofline
winner on TPU: no column indices at all (~4 B/nnz of matrix traffic vs ~8 for
CSR), and the "gather" becomes a static shift, which XLA compiles to pure
contiguous HBM reads. SURVEY.md §7 roofline; T-K1 fast path.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from blockcg_tpu.operators.base import MatmatMixin


@dataclasses.dataclass
class DIAOperator(MatmatMixin):
    """offsets: static tuple of ints; diags: (ndiag, n).

    ``diags[d, i]`` multiplies ``X[i + offsets[d]]`` into ``Y[i]`` (row-major
    convention: diags are stored aligned to the *row* index). Out-of-range
    entries of a diagonal are zero by construction.
    """

    diags: jax.Array
    offsets: tuple[int, ...]
    # True iff every coefficient whose column index wraps modulo n is
    # EXACTLY zero (Dirichlet constructors zero them by construction).
    # Gates the ring kernel's donated (in-place) apply: wrap-crossing
    # lanes read already-overwritten data there, legal only value-masked.
    wrap_zero: bool = False

    @property
    def n(self) -> int:
        return self.diags.shape[1]

    @property
    def shape(self) -> tuple[int, int]:
        return (self.n, self.n)

    @property
    def nnz(self) -> int:
        """Structural nonzeros. Default assumes TRUNCATED diagonals
        (n - |o| entries each — correct for the Dirichlet constructors);
        toroidal operators whose wrap entries are populated should set
        ``_nnz`` (builders do) or throughput metrics undercount."""
        n = self.n
        return getattr(
            self, "_nnz", sum(n - abs(o) for o in self.offsets)
        )

    @property
    def bandwidth(self) -> int:
        return max(abs(o) for o in self.offsets)

    @property
    def dtype(self):
        return self.diags.dtype

    @classmethod
    def from_scipy(cls, a, dtype=jnp.float32) -> "DIAOperator":
        a = a.todia()
        offsets = tuple(int(o) for o in a.offsets)
        n = a.shape[0]
        # scipy DIA aligns data to the *column* index: data[d, j] is A[j-o, j].
        # Re-align to rows: row_diag[d, i] = A[i, i+o] = data[d, i+o].
        diags = np.zeros((len(offsets), n), dtype=np.dtype(jnp.dtype(dtype).name))
        for d, o in enumerate(offsets):
            if o >= 0:
                diags[d, : n - o] = a.data[d, o:n]
            else:
                diags[d, -o:n] = a.data[d, : n + o]
        return cls(diags=jnp.asarray(diags), offsets=offsets)

    def matmat_t(self, Xt: jax.Array, donate: bool = False) -> jax.Array:
        """(k, n) lanes-major apply: ``Yt[:, i] = sum_d c_d[i] * Xt[:, i+o_d]``.

        Dispatch: on TPU this routes to the Pallas stencil kernel (T-K1 fast
        path, ~5x the XLA path: it windows X through VMEM once instead of
        re-reading it per diagonal). The XLA fallback below covers CPU, odd
        shapes, and BLOCKCG_NO_PALLAS=1.

        ``donate=True`` asks for the in-place apply (Y aliased onto Xt).
        Callers may set it ONLY when Xt is dead at the call site (e.g. a
        chained y = A x loop that drops x). It takes effect only on the
        ring path of a ``wrap_zero`` operator (the one combination where
        in-place is race-free — ops/stencil_ring.py); elsewhere it is
        silently ignored, never wrong.
        """
        from blockcg_tpu.ops import stencil, stencil_ring

        if self._pallas_ok(Xt):  # f32-only kernel; f64 takes the XLA path
            if self._use_ring(Xt):
                return stencil_ring.ring_spmm_t(self.diags, self.offsets, Xt,
                                                donate=donate and
                                                self.wrap_zero)
            if stencil.available(self.n, Xt.shape[0], self.offsets):
                return stencil.stencil_spmm_t(self.diags, self.offsets, Xt)
        return self._matmat_t_xla(Xt)

    def _use_ring(self, Xt) -> bool:
        """Large-n dispatch: the rolling-ring kernel (each X block fetched
        once) beats the windowed kernel whenever far offsets force window
        re-reads (x_reads ≈ 3 for 3D at ≥1M rows: 6.2 vs 9.0 Gnnz/s
        measured, CHIP_QUEUE_r3b.log probe-ring). At small n the windowed
        kernel wins instead — the chained solve's working set stays
        VMEM-resident (BASELINE.md round-3), so leave x_reads ≤ 2 alone.
        ``BLOCKCG_NO_RING=1`` disables the ring path (safety valve: its
        in-while-loop compile is slow and its ANY-space operand changes the
        solve's HBM footprint at capacity sizes)."""
        import os

        from blockcg_tpu.ops import stencil, stencil_ring

        if os.environ.get("BLOCKCG_NO_RING"):
            return False
        k = Xt.shape[0]
        # The round-3 512 MB capacity gate is GONE: its premise ("the
        # ring's ANY-space X operand costs ~1 GB extra liveness at
        # capacity") was refuted by XLA's own buffer assignment — the ring
        # arm's temp allocation is 0.25 GB SMALLER than windowed at 8.4M
        # and 16.7M rows, and a ballast bisect put both arms' runtime
        # boundary at the same 6-8 GB of external live state
        # (tools/probe_ring_capacity.py, CHIP_QUEUE_r4.log). The round-3
        # config-5 OOM was the refined-lean DRIVER holding ~7.7 GB at its
        # peak (fixed: Rn dropped before the last inner slice,
        # solvers/refine.py); full-size config 5 now runs the ring inner:
        # 58.5 s vs 73.6 s windowed. BLOCKCG_RING_MAX_MB remains as the
        # probe/escape valve: unset = unlimited, 0 = ring off (the
        # probes' windowed arm), any other value = a field-byte cap.
        ring_max_mb = int(os.environ.get("BLOCKCG_RING_MAX_MB", "-1"))
        if ring_max_mb >= 0 and (
                k * self.n * Xt.dtype.itemsize > ring_max_mb * 2**20):
            return False
        # BLOCKCG_FORCE_RING=1 skips only the small-n preference guard
        # (probe/crossover valve) — availability still decides below.
        if not os.environ.get("BLOCKCG_FORCE_RING"):
            p = stencil.plan(self.n, k, self.offsets)
            if p is not None and p.x_reads <= 2.0:
                return False
        return stencil_ring.available(self.n, k, self.offsets,
                                      Xt.dtype.itemsize)

    def _pallas_ok(self, Xt) -> bool:
        import os

        from blockcg_tpu.ops import stencil, stencil_ring

        ok_dt = (jnp.float32, jnp.bfloat16)
        return (
            jax.default_backend() == "tpu"
            and self.dtype in ok_dt
            and Xt.dtype in ok_dt
            and not os.environ.get("BLOCKCG_NO_PALLAS")
            and (stencil.available(self.n, Xt.shape[0], self.offsets)
                 or stencil_ring.available(self.n, Xt.shape[0], self.offsets,
                                           Xt.dtype.itemsize))
        )

    def matmat_gram_t(self, Xt: jax.Array, donate: bool = False):
        """Fused (Y = A X, G = X^H Y): the stencil kernel emits the k x k
        Gram from tiles already in VMEM (solvers' P^H A P — saves the
        2-pass separate Gram). Falls back to (matmat_t, None).
        ``donate`` as in :meth:`matmat_t` (ring + wrap_zero only)."""
        from blockcg_tpu.ops import stencil, stencil_ring

        if self._pallas_ok(Xt):
            if self._use_ring(Xt):
                return stencil_ring.ring_spmm_gram_t(
                    self.diags, self.offsets, Xt,
                    donate=donate and self.wrap_zero)
            if stencil.available(self.n, Xt.shape[0], self.offsets):
                return stencil.stencil_spmm_gram_t(self.diags, self.offsets,
                                                   Xt)
        return self.matmat_t(Xt), None

    def _matmat_t_xla(self, Xt: jax.Array) -> jax.Array:
        # Toroidal semantics (match the Pallas kernel): col = (i + o) mod n.
        # Constructors zero every coefficient without true wraparound
        # coupling, so this equals the truncated apply for e.g. Laplacians.
        from blockcg_tpu.solvers.common import acc_dtype

        k, n = Xt.shape
        adt = acc_dtype(Xt.dtype)  # bf16 inputs accumulate in f32
        Yt = jnp.zeros((k, n), dtype=adt)
        for d, o in enumerate(self.offsets):  # static unroll, ndiag is tiny
            c = self.diags[d][None, :].astype(adt)
            src = Xt if o == 0 else jnp.roll(Xt, -o, axis=1)
            Yt = Yt + c * src.astype(adt)
        return Yt.astype(Xt.dtype)


jax.tree_util.register_dataclass(
    DIAOperator,
    data_fields=["diags"],
    meta_fields=["offsets", "wrap_zero"],
)
