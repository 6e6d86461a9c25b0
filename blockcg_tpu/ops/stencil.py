"""Pallas TPU stencil (DIA) SpMM kernel — T-K1 fast path.

Reference equivalent: R1 (SURVEY.md §3.1), specialized to banded/stencil
matrices (all the north-star Laplacian configs). The XLA DIA path re-reads
the RHS block once per diagonal (~`ndiag` HBM passes over X); this kernel
pipelines lanes-major windows of X through VMEM once per output tile and
applies every diagonal from VMEM.

Windowing: grid step i owns output lanes [i*R, (i+1)*R). Each diagonal offset
o is served one of two ways, chosen by the planner:

- near (|o| <= H):   a halo'd window [prev H | cur R | next H] of Xt, built
                     from three BlockSpecs with TOROIDAL (mod-n) index
                     maps; contribution = c_d * W[:, H+o : H+o+R].
- far  (o = m*R):    its own (k, R) BlockSpec window at block index i+m
                     (exactly lane-aligned — no slicing);
                     contribution = c_d * far_window.

Far windows make huge strides (3D z-stride, 4D lattice t-stride) affordable:
VMEM holds one R-tile per far offset instead of a bandwidth-wide halo. HBM
traffic per apply: X read (R + 2H + nfar*R)/R times, diagonals once, Y
written once (see BASELINE.md per-config rooflines).

Semantics are **toroidal**: the column index is ``(i + o_d) mod n`` — halo
and far windows are fetched modulo n. Operators built from matrices without
wraparound coupling (e.g. Dirichlet Laplacians) zero every coefficient whose
neighbor falls outside [0, n), making toroidal and truncated semantics
identical (see problems/laplacian.py, operators/dia.py). Periodic lattice
operators exploit the mod directly: the slowest axis's wrap coupling rides
its main +/-stride diagonal (problems/dirac.py).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget for planning (bytes); the scoped VMEM limit is 16 MB and the
# model below already includes double-buffering factors (validated against
# compile-time OOMs: the realified bs=8 Dirac plan models 12.2 MB and
# allocates ~14.4 MB scoped — keep ~3 MB modeling slack).
_VMEM_BUDGET = 13 * 1024 * 1024


@dataclasses.dataclass(frozen=True)
class StencilPlan:
    R: int  # output tile length (lanes)
    H: int  # near-halo width (lanes); 0 if no near offsets besides the tile
    far: tuple[int, ...]  # far offsets, each a multiple of R
    near: tuple[int, ...]  # near offsets, |o| <= H

    @property
    def x_reads(self) -> float:
        return 1.0 + (2 * self.H + len(self.far) * self.R) / self.R


def plan(
    n: int,
    k: int,
    offsets: tuple[int, ...],
    sublanes: int = 1,
    coeff_rows: int | None = None,
) -> StencilPlan | None:
    """Choose (R, H, near/far split) minimizing X traffic under VMEM.

    ``sublanes`` scales the VMEM estimate for the block-stencil variant
    (fields carry a bs-sized sublane dim padded to 8). ``coeff_rows``
    overrides the number of coefficient rows streamed per tile (the
    const-block variant streams only boundary masks, not full diagonals).
    """
    if n % 128 != 0 or n < 256:
        return None
    ndiag = len(offsets)
    bs = max(sublanes, 1)
    pad8 = -(-bs // 8) * 8  # sublane tile padding of the bs dim
    ksub = max(k, 8) if bs == 1 else max(k, 1) * pad8

    crows = ndiag * bs * bs if coeff_rows is None else coeff_rows
    best: StencilPlan | None = None
    best_traffic = None
    H = 0
    while H <= min(n, 1 << 20):
        R = max(H, 128)
        while R <= n:
            if n % R == 0 and (H == 0 or R % H == 0):
                near = tuple(o for o in offsets if abs(o) <= H)
                far = tuple(o for o in offsets if abs(o) > H and o % R == 0)
                if len(near) + len(far) == ndiag:
                    # VMEM: window + far blocks + out, double-buffered inputs
                    win = ksub * (R + 2 * H)
                    vmem = 4 * (
                        2 * win + win  # in-blocks (x2) + scratch
                        + 2 * len(far) * ksub * R
                        + 2 * ksub * R  # out
                        + 2 * max(crows, 8) * R  # coeff rows (2D, no pad)
                    )
                    if vmem <= _VMEM_BUDGET:
                        traffic = 1.0 + (2 * H + len(far) * R) / R
                        if best_traffic is None or traffic < best_traffic - 1e-9:
                            best, best_traffic = StencilPlan(R, H, far, near), traffic
            R *= 2
        H = 128 if H == 0 else H * 2
    return best


def order_by_plan(offsets, plan_order):
    """Map the planner's (near + far) offset sequence back to diagonal
    indices, duplicate-offset-safe (value-masked operators may carry the
    same offset twice, e.g. the U(1)-gauged realified K1/K2 pair)."""
    remaining = list(range(len(offsets)))
    order = []
    for o in plan_order:
        j = next(i for i in remaining if offsets[i] == o)
        order.append(j)
        remaining.remove(j)
    return order


def _kernel(near, far, H, with_gram, diags_ref, *refs):
    # refs layout: [xprev, xcur, xnext][:nref-? ...], far windows, y_ref,
    # (g_ref if with_gram), (w_ref scratch if H > 0)
    nout = 2 if with_gram else 1
    if H > 0:
        xprev, xcur, xnext = refs[0], refs[1], refs[2]
        far_refs = refs[3 : 3 + len(far)]
        y_ref = refs[3 + len(far)]
        w_ref = refs[3 + len(far) + nout]
        k, R = y_ref.shape
        w_ref[:, :H] = xprev[:]
        w_ref[:, H : H + R] = xcur[:]
        w_ref[:, H + R :] = xnext[:]
    else:
        xcur = refs[0]
        far_refs = refs[1 : 1 + len(far)]
        y_ref = refs[1 + len(far)]
        w_ref = None
        k, R = y_ref.shape

    # bf16 fields accumulate in f32 (VPU converts in-register); f32/f64
    # accumulate in their own dtype. Stores cast back to the field dtype.
    adt = jnp.float32 if y_ref.dtype == jnp.bfloat16 else y_ref.dtype

    def up(x):
        return x.astype(adt) if x.dtype != adt else x

    acc = jnp.zeros((k, R), dtype=adt)
    fi = 0
    for d, o in enumerate(near + far):  # static unroll over diagonals
        c = up(diags_ref[d, :].reshape(1, R))
        if d < len(near):
            if o == 0 and H == 0:
                acc = acc + c * up(xcur[:])
            else:
                acc = acc + c * up(w_ref[:, H + o : H + o + R])
        else:
            acc = acc + c * up(far_refs[fi][:])
            fi += 1
    y_ref[:] = acc.astype(y_ref.dtype)

    if with_gram:
        # Fused Gram G = X Y^T from the tiles already in VMEM (the separate
        # gram kernel would re-read both fields from HBM — 2 extra passes).
        g_ref = refs[(3 if H > 0 else 1) + len(far) + 1]
        xc = up(w_ref[:, H : H + R] if H > 0 else xcur[:])
        g = jax.lax.dot_general(
            xc, acc, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            g_ref[:, :] = g

        @pl.when(i > 0)
        def _():
            g_ref[:, :] += g


def _spmm_impl(diags, offsets, Xt, with_gram, interpret):
    ndiag, n = diags.shape
    k = Xt.shape[0]
    p = plan(n, k, offsets)
    if p is None:
        raise ValueError(f"no stencil kernel plan for n={n}, k={k}, offsets={offsets}")
    R, H = p.R, p.H
    nb = n // R  # output tiles
    nh = n // H if H else 1  # halo-sized blocks

    # Reorder diagonals so the kernel sees near ones first.
    order = order_by_plan(offsets, p.near + p.far)
    diags_ord = diags[jnp.asarray(order)] if order != list(range(ndiag)) else diags

    in_specs = [
        pl.BlockSpec((ndiag, R), lambda i: (0, i), memory_space=pltpu.VMEM)
    ]
    x_args = []
    if H > 0:
        in_specs += [
            pl.BlockSpec(
                (k, H),
                lambda i: (0, (i * (R // H) - 1) % nh),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((k, R), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (k, H),
                lambda i: (0, ((i + 1) * (R // H)) % nh),
                memory_space=pltpu.VMEM,
            ),
        ]
        x_args += [Xt, Xt, Xt]
    else:
        in_specs.append(pl.BlockSpec((k, R), lambda i: (0, i), memory_space=pltpu.VMEM))
        x_args.append(Xt)
    for o in p.far:
        m = o // R
        in_specs.append(
            pl.BlockSpec(
                (k, R),
                functools.partial(lambda m, i: (0, (i + m) % nb), m),
                memory_space=pltpu.VMEM,
            )
        )
        x_args.append(Xt)

    kernel = functools.partial(_kernel, p.near, p.far, H, with_gram)
    flops = 2 * ndiag * k * n + (2 * k * k * n if with_gram else 0)
    bytes_accessed = 4 * (k * n * p.x_reads + ndiag * n + k * n)
    scratch = [pltpu.VMEM((k, R + 2 * H), Xt.dtype)] if H > 0 else []

    from blockcg_tpu.ops.vma import out_struct

    y_spec = pl.BlockSpec((k, R), lambda i: (0, i), memory_space=pltpu.VMEM)
    y_shape = out_struct((k, n), Xt.dtype, Xt)
    if with_gram:
        out_specs = (y_spec, pl.BlockSpec(
            (k, k), lambda i: (0, 0), memory_space=pltpu.VMEM))
        out_shape = (y_shape, out_struct((k, k), jnp.float32, Xt))
    else:
        out_specs, out_shape = y_spec, y_shape

    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=int(bytes_accessed), transcendentals=0
        ),
        interpret=interpret,
    )(diags_ord, *x_args)


@functools.partial(jax.jit, static_argnames=("offsets", "interpret"))
def stencil_spmm_t(
    diags: jax.Array,
    offsets: tuple[int, ...],
    Xt: jax.Array,
    *,
    interpret: bool = False,
) -> jax.Array:
    """Lanes-major stencil SpMM: ``Yt[:, i] = sum_d diags[d, i] * Xt[:, i+o_d]``.

    Args:
      diags: (ndiag, n) row-aligned diagonals (DIAOperator convention).
      offsets: static diagonal offsets.
      Xt: (k, n) lanes-major RHS block.
    """
    return _spmm_impl(diags, offsets, Xt, False, interpret)


@functools.partial(jax.jit, static_argnames=("offsets", "interpret"))
def stencil_spmm_gram_t(
    diags: jax.Array,
    offsets: tuple[int, ...],
    Xt: jax.Array,
    *,
    interpret: bool = False,
):
    """Stencil SpMM with the k x k Gram fused: ``(Yt, G = X Y^T)``.

    G is exactly the solvers' ``P^H (A P)`` coefficient Gram (real f32
    path), accumulated on the MXU from the tiles the SpMM already holds in
    VMEM — the separate gram kernel's 2 HBM field passes are saved."""
    return _spmm_impl(diags, offsets, Xt, True, interpret)


def available(n: int, k: int, offsets: tuple[int, ...]) -> bool:
    return plan(n, k, offsets) is not None
