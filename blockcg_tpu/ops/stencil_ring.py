"""Rolling-ring Pallas stencil SpMM — the large-n fast path (T-K1).

Why this kernel exists (measured, BASELINE.md round-3): the windowed
stencil kernel (ops/stencil.py) serves far offsets (3D z-stride, 4D
t-stride) with their own per-step BlockSpec windows, so every X block is
DMA'd from HBM once as the current tile and once per far offset that
revisits it — x_reads ≈ 3 for a 3D 7-point stencil at ≥1M rows, measured
6.2 Gnnz/s = 63% of the 765 GB/s calibrated bandwidth. At 64³ the chained
solve's 32 MB working set stays VMEM-resident and hides this; at 128³+
(and in every per-shard distributed solve at config-5 scale) it does not.

This kernel instead streams X through a VMEM ring buffer with MANUAL
async DMAs: grid step i computes output block i from ring slots holding X
blocks i−M … i+M (toroidal), fetches block i+M+1 exactly once, and
retires block i−M−1 by overwrite. Every X block crosses HBM exactly once:
x_reads = 1.0 by construction, ceiling 40.6 B/nnz → 18.8 Gnnz/s at the
765 GB/s calibration (≈3x the windowed kernel at large n).

Offset handling: each diagonal offset decomposes as ``o = m·R + r`` with
``|r| ≤ R/2``. Per grid step, offsets sharing an ``m`` whose residual is
nonzero read through a (k, R+2H) window assembled in VMEM from ring slots
m−1, m, m+1 (H = max|r|, one VMEM→VMEM copy per step — VMEM bandwidth,
not HBM); exact multiples (r = 0, the far z/t strides) read their ring
slot directly. Diagonals and the output ride ordinary auto-pipelined
BlockSpecs; only X is manual.

Correctness guards: the grid must be sequential for the ring to be
coherent — ``dimension_semantics=("arbitrary",)`` pins that (a Megacore
split would race the ring); scratch persists across TPU grid steps by
construction. Semantics are toroidal (col = (i+o) mod n), matching
ops/stencil.py.

Reference equivalent: R1 SpMM (SURVEY.md §3.1) — same contract as
ops/stencil.py, different HBM schedule.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from blockcg_tpu.ops.stencil import order_by_plan
from blockcg_tpu.ops.vma import out_struct

# The ring + window + double-buffered out/diags must fit scoped VMEM; the
# kernel passes an explicit vmem_limit (v5e has 128 MiB physical).
_VMEM_BUDGET = 40 * 1024 * 1024
_VMEM_LIMIT = 64 * 1024 * 1024
_R_MAX = 16384


@dataclasses.dataclass(frozen=True)
class RingPlan:
    R: int                      # block length (lanes)
    H: int                      # window halo = max |r| (0 if all r = 0)
    M: int                      # ring reach: slots i-M .. i+M are live
    S: int                      # ring slots = 2M + 2 (1-deep lookahead)
    groups: tuple[tuple[int, tuple[int, ...]], ...]  # (m, (r, ...)) per m
    order: tuple[int, ...]      # diagonal order the kernel expects

    @property
    def x_reads(self) -> float:
        return 1.0


def _decompose(offsets, R):
    """offset -> (m, r) with o = m*R + r, |r| <= R/2."""
    out = []
    for o in offsets:
        m = (o + R // 2) // R if o >= 0 else -((-o + R // 2) // R)
        r = o - m * R
        if abs(r) > R // 2:  # pragma: no cover — arithmetic guard
            raise AssertionError((o, R, m, r))
        out.append((m, r))
    return out


def plan(n: int, k: int, offsets: tuple[int, ...],
         itemsize: int = 4) -> RingPlan | None:
    """Largest R whose ring fits the VMEM budget, with nb > S."""
    if n % 128 != 0 or n < 512:
        return None
    ndiag = len(offsets)
    ksub = max(k, 8)
    best = None
    R = 128
    while R <= min(n, _R_MAX):
        if n % R == 0:
            dec = _decompose(offsets, R)
            H = max((abs(r) for _, r in dec), default=0)
            M = max((abs(m) + (1 if r != 0 else 0) for m, r in dec),
                    default=1)
            M = max(M, 1)
            S = 2 * M + 2
            nb = n // R
            if nb > S and H <= R // 2:
                nwin = 1 if H > 0 else 0
                vmem = (
                    itemsize * ksub * (S * R + nwin * (R + 2 * H))  # ring+win
                    + 2 * 4 * ksub * R          # out blocks (double-buffered)
                    + 2 * 4 * max(ndiag, 8) * R  # diag rows (double-buffered)
                    + 4 * ksub * R               # accumulator
                )
                if vmem <= _VMEM_BUDGET:
                    groups: dict[int, list[int]] = {}
                    for m, r in dec:
                        groups.setdefault(m, []).append(r)
                    gtuple = tuple(sorted(
                        (m, tuple(rs)) for m, rs in groups.items()))
                    order = [m * R + r for m, rs in gtuple for r in rs]
                    best = RingPlan(R, H, M, S, gtuple, tuple(order))
        R *= 2
    return best


def _ring_kernel(p: RingPlan, ndiag, nb, with_gram,
                 diags_ref, x_hbm, *refs):
    y_ref = refs[0]
    g_ref = refs[1] if with_gram else None
    ring = refs[1 + (1 if with_gram else 0)]
    nscr = 2 + (1 if with_gram else 0)
    w_ref = refs[nscr] if p.H > 0 else None
    sems = refs[nscr + (1 if p.H > 0 else 0)]

    k, R = y_ref.shape
    i = pl.program_id(0)

    def fetch(b_signed):
        """Start the DMA of toroidal block ``b_signed`` into its slot."""
        # jnp.int32 wraps: the CPU suite enables x64, where a bare
        # Python-int operand would promote the index math to int64
        b = jax.lax.rem(b_signed + jnp.int32(nb), jnp.int32(nb))
        slot = jax.lax.rem(b_signed + jnp.int32(p.S * nb), jnp.int32(p.S))
        return pltpu.make_async_copy(
            x_hbm.at[:, pl.ds(b * R, R)],
            ring.at[slot],
            sems.at[slot],
        )

    @pl.when(i == 0)
    def _prologue():
        for m in range(-p.M, p.M + 1):
            fetch(m).start()
        for m in range(-p.M, p.M + 1):
            fetch(m).wait()

    @pl.when(i > 0)
    def _steady():
        fetch(i + p.M).wait()

    # Overlap next-block fetch with this step's compute. The last step must
    # NOT issue one: its fetch would still be in flight at kernel end and
    # the TPU runtime aborts on unawaited DMAs (interpret mode does not
    # model this — the bug only reproduced on hardware).
    @pl.when(i + 1 < nb)
    def _lookahead():
        fetch(i + p.M + 1).start()

    def slot_of(m):
        return jax.lax.rem(i + jnp.int32(m + p.S * nb), jnp.int32(p.S))

    # bf16 fields accumulate in f32; stores cast back (ops/stencil.py rule).
    adt = jnp.float32 if y_ref.dtype == jnp.bfloat16 else y_ref.dtype

    def up(x):
        return x.astype(adt) if x.dtype != adt else x

    if p.H > 0:
        H = p.H
        w_ref[:, :H] = ring[slot_of(-1), :, R - H:]
        w_ref[:, H:H + R] = ring[slot_of(0)]
        w_ref[:, H + R:] = ring[slot_of(1), :, :H]

    acc = jnp.zeros((k, R), dtype=adt)
    d = 0
    for m, rs in p.groups:
        for r in rs:
            c = up(diags_ref[d, :].reshape(1, R))
            if m == 0 and p.H > 0:
                acc = acc + c * up(w_ref[:, p.H + r: p.H + r + R])
            elif r == 0:
                acc = acc + c * up(ring[slot_of(m)])
            else:
                # far group with nonzero residual: splice two ring slots
                if r > 0:
                    left = ring[slot_of(m), :, r:]
                    right = ring[slot_of(m + 1), :, :r]
                    win = jnp.concatenate([up(left), up(right)], axis=1)
                else:
                    left = ring[slot_of(m - 1), :, R + r:]
                    right = ring[slot_of(m), :, :R + r]
                    win = jnp.concatenate([up(left), up(right)], axis=1)
                acc = acc + c * win
            d += 1
    y_ref[:] = acc.astype(y_ref.dtype)

    if with_gram:
        xc = up(w_ref[:, p.H: p.H + R] if p.H > 0 else ring[slot_of(0)])
        g = jax.lax.dot_general(
            xc, acc, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )

        @pl.when(i == 0)
        def _():
            g_ref[:, :] = g

        @pl.when(i > 0)
        def _():
            g_ref[:, :] += g


def _ring_impl(diags, offsets, Xt, with_gram, interpret, donate=False):
    ndiag, n = diags.shape
    k = Xt.shape[0]
    p = plan(n, k, offsets, itemsize=Xt.dtype.itemsize)
    if p is None:
        raise ValueError(
            f"no ring-stencil plan for n={n}, k={k}, offsets={offsets}")
    R = p.R
    nb = n // R

    order = order_by_plan(offsets, p.order)
    diags_ord = (diags[jnp.asarray(order)]
                 if order != list(range(ndiag)) else diags)

    in_specs = [
        pl.BlockSpec((ndiag, R), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),  # X stays in HBM; manual DMA
    ]
    y_spec = pl.BlockSpec((k, R), lambda i: (0, i), memory_space=pltpu.VMEM)
    y_shape = out_struct((k, n), Xt.dtype, Xt)
    if with_gram:
        out_specs = (y_spec, pl.BlockSpec((k, k), lambda i: (0, 0),
                                          memory_space=pltpu.VMEM))
        out_shape = (y_shape, out_struct((k, k), jnp.float32, Xt))
    else:
        out_specs, out_shape = y_spec, y_shape

    scratch = [pltpu.VMEM((p.S, k, R), Xt.dtype)]
    if p.H > 0:
        scratch.append(pltpu.VMEM((k, R + 2 * p.H), Xt.dtype))
    scratch.append(pltpu.SemaphoreType.DMA((p.S,)))

    kernel = functools.partial(_ring_kernel, p, ndiag, nb, with_gram)
    flops = 2 * ndiag * k * n + (2 * k * k * n if with_gram else 0)
    bytes_accessed = (Xt.dtype.itemsize * 2 * k * n
                      + diags.dtype.itemsize * ndiag * n)

    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=int(bytes_accessed),
            transcendentals=0,
        ),
        # donate: Y overwrites X in place. Safe by the ring's own DMA
        # ordering: every HBM read of X block j (the lookahead fetch) runs
        # at grid step j-M-1, strictly before the step-j output write —
        # EXCEPT the toroidal wrap fetches at the grid tail (blocks 0..M
        # re-read for steps nb-M-1..nb-1), which see overwritten data.
        # Callers must therefore guarantee every wrap-crossing coefficient
        # is exactly zero (Dirichlet-built operators; DIAOperator.wrap_zero)
        # so the corrupted lanes are value-masked out of the products.
        # Interpret mode materializes outputs separately and CANNOT catch a
        # violation — the on-chip donated-vs-fresh smoke test can.
        input_output_aliases={1: 0} if donate else {},
        interpret=interpret,
    )(diags_ord, Xt)


@functools.partial(jax.jit,
                   static_argnames=("offsets", "interpret", "donate"))
def ring_spmm_t(diags, offsets: tuple[int, ...], Xt, *,
                interpret: bool = False, donate: bool = False):
    """Lanes-major stencil SpMM, each X block fetched from HBM once.

    ``donate=True`` aliases Y onto X (legal only when X is dead at the call
    site AND wrap coefficients are zero — see _ring_impl). The payoff is
    NOT kernel speed: a fresh Pallas output that becomes a ``while_loop``
    carry costs XLA a full extra field copy per iteration (measured
    2x aggregate: 329 vs 659 GB/s, tools/probe_write_alias.py — the
    round-3 'in-place HBM writes' effect, correctly attributed); aliasing
    the output into the dead carry buffer elides that copy."""
    return _ring_impl(diags, offsets, Xt, False, interpret, donate)


@functools.partial(jax.jit,
                   static_argnames=("offsets", "interpret", "donate"))
def ring_spmm_gram_t(diags, offsets: tuple[int, ...], Xt, *,
                     interpret: bool = False, donate: bool = False):
    """Ring SpMM with the k x k Gram fused: ``(Yt, G = X Y^T)``."""
    return _ring_impl(diags, offsets, Xt, True, interpret, donate)


def available(n: int, k: int, offsets: tuple[int, ...],
              itemsize: int = 4) -> bool:
    return plan(n, k, offsets, itemsize) is not None
