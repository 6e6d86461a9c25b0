"""Pallas TPU block-stencil SpMM kernel — T-K1 for lattice block operators.

Reference equivalent: R1 (SURVEY.md §3.1) for the BSR 4x4 lattice-Dirac-like
operator (north-star config 4). A nearest-neighbor lattice operator with
bs x bs blocks is a *block stencil*: in spin-major row ordering
(row = a*ns + s, a = spin, s = site),

    Y[:, a, s] = sum_d sum_b blocks[d, a, b, s] * X[:, b, s + o_d]

i.e. per site-offset o_d a pointwise bs x bs block multiply. This kernel
reuses the scalar stencil windowing (near halo + far aligned windows, see
ops/stencil.py) on the site axis. The primary variant
(``block_stencil_spmm_m_t``) takes the merged spin-major (m = bs*k, ns)
field view (unpadded sublanes — see ops/const_block_stencil.py); the
(k, bs, ns) 3D-view kernel remains for the distributed wrapper's local
shards and k = 1 fields.

Halo and far windows are fetched TOROIDALLY (mod ns, matching the scalar
kernel); periodic boundary wraps on non-slowest axes are *extra diagonals*
with masked coefficients (emitted by problems/dirac.py) whose zero entries
kill the unwanted wrapped-window couplings.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from blockcg_tpu.ops.vma import out_struct

from blockcg_tpu.ops.stencil import order_by_plan, plan as _plan


def plan(n_sites: int, k: int, bs: int, offsets: tuple[int, ...]):
    return _plan(n_sites, k, offsets, sublanes=bs)


def _kernel(near, far, H, bs, diags_ref, *refs):
    """Scratch layout: w_ref is (bs, k, (R+2H) + nfar*R) — spin-plane-major,
    so every inner FMA reads a contiguous (k, R) slice. The one-time copies
    below pay the strided spin extraction once per tile instead of once per
    (offset, a, b) term (16*noff times)."""
    nf = len(far)
    if H > 0:
        xprev, xcur, xnext = refs[0], refs[1], refs[2]
        far_refs = refs[3 : 3 + nf]
        y_ref = refs[3 + nf]
        w_ref = refs[4 + nf]
    else:
        xcur = refs[0]
        far_refs = refs[1 : 1 + nf]
        y_ref = refs[1 + nf]
        w_ref = refs[2 + nf]
    k, _, R = y_ref.shape
    W = R + 2 * H  # near-window width inside scratch; far windows follow

    for b in range(bs):
        if H > 0:
            w_ref[b, :, :H] = xprev[:, b, :]
            w_ref[b, :, H : H + R] = xcur[:, b, :]
            w_ref[b, :, H + R : W] = xnext[:, b, :]
        else:
            w_ref[b, :, :R] = xcur[:, b, :]
        for fi in range(nf):
            w_ref[b, :, W + fi * R : W + (fi + 1) * R] = far_refs[fi][:, b, :]

    # Per-spin-plane accumulators (Mosaic has no scatter-add on values).
    acc = [jnp.zeros((k, R), dtype=y_ref.dtype) for _ in range(bs)]
    fi = 0
    for d, o in enumerate(near + far):  # static unroll over site-offsets
        if d < len(near):
            lo = H + o
        else:
            lo = W + fi * R
            fi += 1
        for b in range(bs):
            # Read the (lane-shifted — a cross-lane relayout) window once
            # per (offset, b), not once per (offset, a, b) term: same
            # hoist as the merged kernel below (bs x fewer relayouts).
            wb = w_ref[b, :, lo : lo + R]
            for a in range(bs):
                # diags are 2D-reshaped (noff*bs*bs, R) to avoid sublane pad
                c = diags_ref[(d * bs + a) * bs + b, :].reshape(1, R)
                acc[a] = acc[a] + c * wb
    for a in range(bs):
        y_ref[:, a, :] = acc[a]


@functools.partial(jax.jit, static_argnames=("offsets", "interpret"))
def block_stencil_spmm_t(
    blocks: jax.Array,
    offsets: tuple[int, ...],
    Xt: jax.Array,
    *,
    interpret: bool = False,
) -> jax.Array:
    """Lanes-major block-stencil SpMM.

    Args:
      blocks: (noff, bs, bs, ns) per-site block diagonals.
      offsets: static site offsets.
      Xt: (k, bs, ns) internal field view (preferred — no relayout), or flat
        (k, bs*ns) spin-major rows.

    Returns:
      Yt, shaped like Xt.
    """
    noff, bs, _, ns = blocks.shape
    flat = Xt.ndim == 2
    k = Xt.shape[0]
    p = plan(ns, k, bs, offsets)
    if p is None:
        raise ValueError(
            f"no block-stencil plan for ns={ns}, k={k}, bs={bs}, offsets={offsets}"
        )
    R, H = p.R, p.H
    nb = ns // R
    nh = ns // H if H else 1

    order = order_by_plan(offsets, p.near + p.far)
    blocks_ord = blocks[jnp.asarray(order)] if order != list(range(noff)) else blocks
    diags2d = blocks_ord.reshape(noff * bs * bs, ns)
    Xv = Xt.reshape(k, bs, ns) if flat else Xt

    in_specs = [
        pl.BlockSpec((noff * bs * bs, R), lambda i: (0, i), memory_space=pltpu.VMEM)
    ]
    x_args = []
    if H > 0:
        in_specs += [
            pl.BlockSpec(
                (k, bs, H),
                lambda i: (0, 0, (i * (R // H) - 1) % nh),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((k, bs, R), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (k, bs, H),
                lambda i: (0, 0, ((i + 1) * (R // H)) % nh),
                memory_space=pltpu.VMEM,
            ),
        ]
        x_args += [Xv, Xv, Xv]
    else:
        in_specs.append(
            pl.BlockSpec((k, bs, R), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
        )
        x_args.append(Xv)
    for o in p.far:
        m = o // R
        in_specs.append(
            pl.BlockSpec(
                (k, bs, R),
                functools.partial(lambda m, i: (0, 0, (i + m) % nb), m),
                memory_space=pltpu.VMEM,
            )
        )
        x_args.append(Xv)

    kernel = functools.partial(_kernel, p.near, p.far, H, bs)
    flops = 2 * noff * bs * bs * k * ns
    bytes_accessed = 4 * (
        k * bs * ns * p.x_reads + noff * bs * bs * ns + k * bs * ns
    )
    scratch = [
        pltpu.VMEM((bs, k, (R + 2 * H) + len(p.far) * R), Xt.dtype)
    ]

    Yv = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((k, bs, R), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        out_shape=out_struct((k, bs, ns), Xt.dtype, Xt),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=int(bytes_accessed), transcendentals=0
        ),
        # Mosaic's spill/staging temporaries exceed the 16 MiB scoped
        # default on top of the planner's declared blocks (chip-measured:
        # 20.69 MiB wanted at L=8, noff=15, k=4 — CHIP_QUEUE_r5.log
        # probe-matrix-eo first run). Same headroom fix as fused.py.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
        interpret=interpret,
    )(diags2d, *x_args)
    return Yv.reshape(k, bs * ns) if flat else Yv


def available(n_sites: int, k: int, bs: int, offsets: tuple[int, ...]) -> bool:
    return plan(n_sites, k, bs, offsets) is not None


# ------------------------------------------------- merged-layout kernel --
#
# Merged spin-major fields (m = bs*k rows, see ops/const_block_stencil.py):
# unpadded sublanes whenever 8 | m, so field passes move only useful bytes.
# The per-site FMA loop reads spin-b rows as a contiguous sublane slice
# [b*k, (b+1)*k) of the (m, R) window — no per-spin staging copies at all.


def plan_m(n_sites: int, m: int, bs: int, offsets: tuple[int, ...]):
    if m % 8 != 0:
        return None
    noff = len(offsets)
    return _plan(n_sites, m, offsets, sublanes=1,
                 coeff_rows=noff * bs * bs)


def _m_kernel(near, far, H, bs, k, with_gram, seeded, diags_ref, *refs):
    nf = len(far)
    if seeded:
        s_ref = refs[0]
        refs = refs[1:]
    if H > 0:
        xprev, xcur, xnext = refs[0], refs[1], refs[2]
        far_refs = refs[3 : 3 + nf]
        y_ref = refs[3 + nf]
        g_ref = refs[4 + nf] if with_gram else None
        w_ref = refs[(4 if with_gram else 3) + nf + 1]
    else:
        xcur = refs[0]
        far_refs = refs[1 : 1 + nf]
        y_ref = refs[1 + nf]
        g_ref = refs[2 + nf] if with_gram else None
        w_ref = None
    m, R = y_ref.shape
    W = R + 2 * H

    if H > 0:
        w_ref[:, :H] = xprev[:]
        w_ref[:, H : H + R] = xcur[:]
        w_ref[:, H + R :] = xnext[:]

    fi_of = {}
    fi = 0
    for d in range(len(near), len(near) + nf):
        fi_of[d] = fi
        fi += 1

    acc = [jnp.zeros((k, R), dtype=y_ref.dtype) for _ in range(bs)]
    for d, o in enumerate(near + far):  # static unroll over site-offsets
        # One full-m window read per offset instead of bs separate (k, R)
        # reads. Chip A/B: NEUTRAL (37.6/40.1 -> 37.5/40.1 Gnnz/s at L=16;
        # CHIP_QUEUE_r4.log probe-links-hoisted) — Mosaic was already
        # merging the per-(b) reads — kept because it states the intent
        # (one cross-lane relayout per offset) explicitly. The kernel runs
        # at ~12% of the measured attainable broadcast-FMA rate
        # (probe-links-mxu RESIZED), so its bound is elsewhere in the
        # schedule; see BASELINE.md round-4 matrix-link notes.
        if d < len(near):
            wd = xcur[:] if o == 0 else w_ref[:, H + o : H + o + R]
        else:
            wd = far_refs[fi_of[d]][:, :]
        for b in range(bs):
            wb = wd[b * k : (b + 1) * k, :]
            for a in range(bs):
                c = diags_ref[(d * bs + a) * bs + b, :].reshape(1, R)
                acc[a] = acc[a] + c * wb
    for a in range(bs):
        y_ref[a * k : (a + 1) * k, :] = acc[a]

    if with_gram:
        y = jnp.concatenate(acc, axis=0)
        g = jax.lax.dot_general(
            xcur[:], y, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        i0 = pl.program_id(0)

        @pl.when(i0 == 0)
        def _():
            g_ref[:, :] = g + s_ref[:, :] if seeded else g

        @pl.when(i0 > 0)
        def _():
            g_ref[:, :] += g


def _bsm_impl(blocks, offsets, Xm, with_gram, interpret, seed=None):
    noff, bs, _, ns = blocks.shape
    m = Xm.shape[0]
    k = m // bs
    p = plan_m(ns, m, bs, offsets)
    if p is None:
        raise ValueError(
            f"no merged block-stencil plan for ns={ns}, m={m}, offsets={offsets}"
        )
    R, H = p.R, p.H
    nb = ns // R
    nh = ns // H if H else 1

    order = order_by_plan(offsets, p.near + p.far)
    blocks_ord = blocks[jnp.asarray(order)] if order != list(range(noff)) else blocks
    diags2d = blocks_ord.reshape(noff * bs * bs, ns)

    seeded = seed is not None
    in_specs = [
        pl.BlockSpec((noff * bs * bs, R), lambda i: (0, i),
                     memory_space=pltpu.VMEM)
    ]
    x_args = []
    if seeded:
        in_specs.append(pl.BlockSpec((m, m), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        x_args.append(seed)
    if H > 0:
        in_specs += [
            pl.BlockSpec((m, H), lambda i: (0, (i * (R // H) - 1) % nh),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, R), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, H), lambda i: (0, ((i + 1) * (R // H)) % nh),
                         memory_space=pltpu.VMEM),
        ]
        x_args += [Xm, Xm, Xm]
    else:
        in_specs.append(
            pl.BlockSpec((m, R), lambda i: (0, i), memory_space=pltpu.VMEM)
        )
        x_args.append(Xm)
    for o in p.far:
        mm_ = o // R
        in_specs.append(
            pl.BlockSpec(
                (m, R),
                functools.partial(lambda s, i: (0, (i + s) % nb), mm_),
                memory_space=pltpu.VMEM,
            )
        )
        x_args.append(Xm)

    kernel = functools.partial(_m_kernel, p.near, p.far, H, bs, k, with_gram,
                               seeded)
    flops = 2 * noff * bs * bs * k * ns + (2 * m * m * ns if with_gram else 0)
    bytes_accessed = 4 * (m * ns * p.x_reads + noff * bs * bs * ns + m * ns)
    scratch = [pltpu.VMEM((m, R + 2 * H), Xm.dtype)] if H > 0 else []

    y_spec = pl.BlockSpec((m, R), lambda i: (0, i), memory_space=pltpu.VMEM)
    y_shape = out_struct((m, ns), Xm.dtype, Xm)
    if with_gram:
        out_specs = (y_spec, pl.BlockSpec(
            (m, m), lambda i: (0, 0), memory_space=pltpu.VMEM))
        out_shape = (y_shape, out_struct((m, m), jnp.float32, Xm))
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
        # 48 MiB scoped-vmem headroom over the planner budget — see the
        # 3D-view call above (Mosaic staging temps beyond declared blocks).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
        interpret=interpret,
    )(diags2d, *x_args)


@functools.partial(jax.jit, static_argnames=("offsets", "interpret"))
def block_stencil_spmm_m_t(
    blocks: jax.Array,
    offsets: tuple[int, ...],
    Xm: jax.Array,
    *,
    interpret: bool = False,
) -> jax.Array:
    """Merged-layout block-stencil SpMM: Xm (m = bs*k, ns), row = a*k + i."""
    return _bsm_impl(blocks, offsets, Xm, False, interpret)


@functools.partial(jax.jit, static_argnames=("offsets", "interpret"))
def block_stencil_spmm_m_gram_t(
    blocks: jax.Array,
    offsets: tuple[int, ...],
    Xm: jax.Array,
    *,
    seed: jax.Array | None = None,
    interpret: bool = False,
):
    """Merged-layout block-stencil SpMM with the (m, m) Gram fused.

    ``seed`` (optional, (m, m) f32) is added into G — the benchmark-chain
    dependence hook (same contract as the ring kernel's; it lets a timing
    loop route its carry through the small G instead of the field, so the
    chain pays no XLA while-carry field copy)."""
    return _bsm_impl(blocks, offsets, Xm, True, interpret, seed=seed)


def available_m(n_sites: int, m: int, bs: int, offsets: tuple[int, ...]) -> bool:
    return plan_m(n_sites, m, bs, offsets) is not None
