"""Pallas TPU stencil (DIA) SpMM kernel — T-K1 fast path.

Reference equivalent: R1 (SURVEY.md §3.1), specialized to banded/stencil
matrices (all the north-star Laplacian configs). The XLA DIA path re-reads
the RHS block once per diagonal (~`ndiag` HBM passes over X); this kernel
pipelines a lanes-major window of X through VMEM once per output tile and
applies every diagonal from VMEM:

  grid step i owns output lanes [i*R, (i+1)*R):
    VMEM window W = [prev H lanes | current R lanes | next H lanes] of Xt
    for each diagonal d with offset o:  Yt tile += c_d * W[:, H+o : H+o+R]

where H >= bandwidth. HBM traffic per tile: X read (R + 2H)/R times
(~1+2H/R), diagonals once, Y written once — near the stencil roofline
(SURVEY.md §7, corrected per-config in BASELINE.md).

The halo windows are expressed as extra BlockSpecs on the same input with
clamped index maps — no manual DMA; Pallas double-buffers the pipeline.
Out-of-range halo garbage at the edges is always multiplied by a zero
coefficient: the DIA constructors zero every slot whose neighbor falls
outside [0, n) (see problems/laplacian.py, operators/dia.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget for planning (bytes); real VMEM is ~16 MB more is risky with
# double buffering.
_VMEM_BUDGET = 10 * 1024 * 1024


def plan(n: int, k: int, ndiag: int, bandwidth: int) -> tuple[int, int] | None:
    """Choose (R, H): output tile length and halo width.

    Constraints: H >= bandwidth, H | R, R | n (so halo block index arithmetic
    is exact), and the VMEM working set fits the budget. Returns None when no
    valid plan exists (dispatcher falls back to the XLA path).
    """
    if n % 128 != 0:
        return None
    # halo: smallest multiple of 128 lanes that covers the bandwidth AND
    # divides n (block index arithmetic is exact in H-sized units)
    H = None
    h = max(128, -(-bandwidth // 128) * 128)
    while h <= n:
        if n % h == 0:
            H = h
            break
        h += 128
    if H is None:
        return None

    def vmem_bytes(R):
        window = k * (R + 2 * H)
        # in blocks (double-buffered) + scratch window + out (double) + diags
        return 4 * (2 * window + window + 2 * k * R + 2 * ndiag * R)

    # Largest R = H * 2^j (or H * m) that divides n and fits the budget.
    best = None
    m = 1
    while True:
        R = H * m
        if R > n or n % R != 0:
            break
        if vmem_bytes(R) <= _VMEM_BUDGET:
            best = R
        m *= 2
    if best is None:
        return None
    # Prefer R >= 2*bandwidth so halo re-reads stay <= 2x.
    return best, H


def _kernel(offsets, H, diags_ref, xprev_ref, xcur_ref, xnext_ref, y_ref, w_ref):
    k, R = y_ref.shape
    w_ref[:, :H] = xprev_ref[:]
    w_ref[:, H : H + R] = xcur_ref[:]
    w_ref[:, H + R :] = xnext_ref[:]
    acc = jnp.zeros((k, R), dtype=y_ref.dtype)
    for d, o in enumerate(offsets):  # static unroll over diagonals
        c = diags_ref[d, :].reshape(1, R)
        acc = acc + c * w_ref[:, H + o : H + o + R]
    y_ref[:] = acc


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
      offsets: static diagonal offsets, |o| <= bandwidth.
      Xt: (k, n) lanes-major RHS block.
    """
    ndiag, n = diags.shape
    k = Xt.shape[0]
    bw = max(abs(o) for o in offsets)
    p = plan(n, k, ndiag, bw)
    if p is None:
        raise ValueError(f"no stencil kernel plan for n={n}, k={k}, bw={bw}")
    R, H = p
    nh = n // H  # number of halo-sized blocks

    grid = (n // R,)
    kernel = functools.partial(_kernel, offsets, H)
    flops = 2 * ndiag * k * n
    bytes_accessed = 4 * (k * n * (1 + 2 * H / R) + ndiag * n + k * n)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((ndiag, R), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (k, H),
                lambda i: (0, jnp.maximum(i * (R // H) - 1, 0)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((k, R), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (k, H),
                lambda i: (0, jnp.minimum((i + 1) * (R // H), nh - 1)),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec((k, R), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, n), Xt.dtype),
        scratch_shapes=[pltpu.VMEM((k, R + 2 * H), Xt.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=int(bytes_accessed), transcendentals=0
        ),
        interpret=interpret,
    )(diags, Xt, Xt, Xt)


def available(n: int, k: int, ndiag: int, bandwidth: int) -> bool:
    return plan(n, k, ndiag, bandwidth) is not None
