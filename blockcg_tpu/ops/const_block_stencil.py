"""Pallas TPU constant-hop block-stencil SpMM — T-K1 fast path for lattice
operators with site-independent hopping blocks (north-star config 4;
reference R1, SURVEY.md §3.1).

Design points vs the general block-stencil kernel (ops/block_stencil.py):

1. **MXU spin mixing.** The general kernel is VPU-bound: one scalar FMA per
   nonzero hop entry per offset (~230 terms for the 4D Dirac-like operator)
   saturates the vector unit. Here site offsets are grouped by identical hop
   matrix (a periodic hop and its wraparound diagonal share one — emitted so
   by problems/dirac.py); each group's masked windows sum into one row-block
   of a VMEM operand stack ``stack[(g, b)] = sum_members mask * window``,
   and a single matmul per tile

       Y (bs*kp, R) = W (bs*kp, G*bs*kp) @ stack (G*bs*kp, R)

   does all the spin mixing on the MXU. The weights
   ``W[a*kp+i, (g*bs+b)*kp+j] = (i==j) * H_g[a][b]`` are built at trace time
   from the compile-time hop scalars: hop values never touch HBM (the
   weights block is fetched once), and only 0/1 boundary masks stream
   (4 B/site per masked diagonal).

2. **Merged spin-major (m = bs*k, ns) I/O.** The primary kernel
   (``const_block_stencil_spmm_m_t``) takes the merged field view: row
   a*k + i, unpadded sublanes whenever 8 | m — a (k, bs, ns) view pads
   bs -> 8 sublanes and moves up to 2x the useful bytes per HBM field pass
   (measured 661 vs 998 GB/s logical on the v5e). Solvers keep their state
   merged end-to-end (one transpose per solve, operators/base.py
   ``to_internal``); the legacy 3D-view kernel remains for k = 1 fields
   (m = bs not 8-aligned) and direct callers.

Windowing (near halo + far aligned windows, toroidal semantics) is shared
with the scalar stencil planner (ops/stencil.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from blockcg_tpu.ops.vma import out_struct

from blockcg_tpu.ops.stencil import order_by_plan as _order_by_plan, plan as _plan


def n_groups(hops: tuple) -> int:
    return len(set(hops))


def plan(
    n_sites: int,
    k: int,
    bs: int,
    offsets: tuple[int, ...],
    nmask: int,
    groups: int | None = None,
):
    """Plan windowing, accounting for this kernel's VMEM operand stack.

    The (G*bs*kp, R) stack scratch scales with R; it is modeled through the
    generic planner's coefficient-rows term (which budgets 2*rows*R floats —
    the stack is single-buffered, so half its rows are charged)."""
    kp = -(-k // 8) * 8
    g = groups if groups is not None else len(offsets)  # worst case
    stack_rows = -(-(g * bs * kp) // 2)
    return _plan(
        n_sites, k, offsets, sublanes=bs, coeff_rows=nmask + stack_rows
    )



def _group_offsets(hops: tuple, mask_slot: tuple[int, ...]):
    """Group ordered diagonal indices by identical hop matrix."""
    order: list[tuple] = []
    index: dict[tuple, int] = {}
    members: list[list[tuple[int, int]]] = []
    for d, h in enumerate(hops):
        g = index.get(h)
        if g is None:
            index[h] = g = len(order)
            order.append(h)
            members.append([])
        members[g].append((d, mask_slot[d]))
    return tuple(zip(order, map(tuple, members)))


def _kernel(near, far, H, bs, k, kp, groups, nmask, precision, interpret,
            with_gram, *refs):
    nf = len(far)
    i = 0
    masks_ref = None
    if nmask > 0:
        masks_ref = refs[0]
        i = 1
    wt_ref = refs[i]
    i += 1
    if H > 0:
        xprev, xcur, xnext = refs[i], refs[i + 1], refs[i + 2]
        i += 3
    else:
        xcur = refs[i]
        i += 1
    far_refs = refs[i : i + nf]
    y_ref = refs[i + nf]
    g_ref = refs[i + nf + 1] if with_gram else None
    nout = 2 if with_gram else 1
    w_ref = refs[i + nf + nout]
    s_ref = refs[i + nf + nout + 1]
    R = y_ref.shape[2]

    # Stage ONLY the misaligned near window [prev H | cur R | next H] — the
    # aligned pieces (o = 0, far windows) read their input refs directly,
    # halving the staging copies vs a stage-everything scratch.
    if H > 0:
        for b in range(bs):
            w_ref[b, :, :H] = xprev[:, b, :]
            w_ref[b, :, H : H + R] = xcur[:, b, :]
            w_ref[b, :, H + R :] = xnext[:, b, :]

    fi_of = {}
    fi = 0
    for d in range(len(near), len(near) + nf):
        fi_of[d] = fi
        fi += 1

    def piece_of(d, o, b):
        if d < len(near):
            if o == 0:
                return xcur[:, b, :]
            return w_ref[b, :, H + o : H + o + R]
        return far_refs[fi_of[d]][:, b, :]

    # Dead stack padding rows must be exactly zero (the MXU contracts over
    # every operand row; 0 * garbage(NaN) would poison live outputs). The
    # stack scratch persists across sequential grid steps on TPU, so zero
    # them once; interpret mode gives no such guarantee — zero every step.
    if kp > k:
        zpad = jnp.zeros((kp - k, R), dtype=y_ref.dtype)

        def zero_dead_rows():
            for g in range(len(groups)):
                for b in range(bs):
                    row = (g * bs + b) * kp
                    s_ref[row + k : row + kp, :] = zpad

        if interpret:
            zero_dead_rows()
        else:
            pl.when(pl.program_id(0) == 0)(zero_dead_rows)

    # Operand stack: one (kp, R) row-block per (group, spin-in).
    offs = near + far
    for g, (_, mem) in enumerate(groups):
        for b in range(bs):
            val = None
            for d, ms in mem:
                piece = piece_of(d, offs[d], b)
                if ms >= 0:
                    piece = masks_ref[ms, :].reshape(1, R) * piece
                val = piece if val is None else val + piece
            row = (g * bs + b) * kp
            s_ref[row : row + k, :] = val

    # One MXU matmul per tile: (bs*kp, G*bs*kp) @ (G*bs*kp, R).
    acc = jax.lax.dot_general(
        wt_ref[:],
        s_ref[:],
        (((1,), (0,)), ((), ())),
        precision=precision,
        preferred_element_type=y_ref.dtype,
    )
    for a in range(bs):
        y_ref[:, a, :] = acc[a * kp : a * kp + k, :]

    if with_gram:
        # Fused Gram G = sum_a X_a Y_a^T from tiles already in VMEM (the
        # caller's P^H A P — saves the separate 2-HBM-pass gram kernel).
        g = None
        for a in range(bs):
            t = jax.lax.dot_general(
                xcur[:, a, :], acc[a * kp : a * kp + k, :],
                (((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
            g = t if g is None else g + t
        i0 = pl.program_id(0)

        @pl.when(i0 == 0)
        def _():
            g_ref[:, :] = g

        @pl.when(i0 > 0)
        def _():
            g_ref[:, :] += g


def _cbs_impl(hops, offsets, mask_slot, masks, Xt, with_gram, interpret,
              precision):
    bs = len(hops[0])
    flat = Xt.ndim == 2
    k = Xt.shape[0]
    ns = (Xt.shape[1] // bs) if flat else Xt.shape[2]
    nmask = 0 if masks is None else masks.shape[0]
    p = plan(ns, k, bs, offsets, nmask, groups=n_groups(hops))
    if p is None:
        raise ValueError(
            f"no const-block-stencil plan for ns={ns}, k={k}, bs={bs}, "
            f"offsets={offsets}"
        )
    R, H = p.R, p.H
    nb = ns // R
    nh = ns // H if H else 1
    kp = -(-k // 8) * 8  # pad k to a sublane tile

    order = _order_by_plan(offsets, p.near + p.far)
    hops_ord = tuple(hops[j] for j in order)
    mslot_ord = tuple(mask_slot[j] for j in order)
    groups = _group_offsets(hops_ord, mslot_ord)
    G = len(groups)

    # Weights: block row a, block column (g, b) is H_g[a][b] * I_kp.
    wt = np.zeros((bs * kp, G * bs * kp), dtype=np.float32)
    eye = np.eye(kp, dtype=np.float32)
    for g, (h, _) in enumerate(groups):
        for a in range(bs):
            for b in range(bs):
                if h[a][b] != 0.0:
                    wt[
                        a * kp : (a + 1) * kp,
                        (g * bs + b) * kp : (g * bs + b + 1) * kp,
                    ] = h[a][b] * eye
    wt = jnp.asarray(wt, dtype=Xt.dtype)

    in_specs = []
    args = []
    if nmask > 0:
        in_specs.append(
            pl.BlockSpec((nmask, R), lambda i: (0, i), memory_space=pltpu.VMEM)
        )
        args.append(masks)
    # Weights: constant block (index map pinned to (0, 0) — fetched once).
    in_specs.append(
        pl.BlockSpec(wt.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    )
    args.append(wt)
    Xv = Xt.reshape(k, bs, ns) if flat else Xt
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
        args += [Xv, Xv, Xv]
    else:
        in_specs.append(
            pl.BlockSpec((k, bs, R), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
        )
        args.append(Xv)
    for o in p.far:
        m = o // R
        in_specs.append(
            pl.BlockSpec(
                (k, bs, R),
                functools.partial(lambda m, i: (0, 0, (i + m) % nb), m),
                memory_space=pltpu.VMEM,
            )
        )
        args.append(Xv)

    kernel = functools.partial(
        _kernel, p.near, p.far, H, bs, k, kp, groups, nmask, precision,
        interpret, with_gram,
    )
    noff = len(offsets)
    terms = sum(
        1 for d in range(noff) for a in range(bs) for b in range(bs)
        if hops[d][a][b] != 0.0
    )
    flops = 2 * terms * k * ns + (2 * k * k * bs * ns if with_gram else 0)
    bytes_accessed = 4 * (k * bs * ns * p.x_reads + nmask * ns + k * bs * ns)
    scratch = [
        pltpu.VMEM((bs, k, R + 2 * H if H > 0 else 1), Xt.dtype),
        pltpu.VMEM((G * bs * kp, R), Xt.dtype),
    ]

    y_spec = pl.BlockSpec((k, bs, R), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
    y_shape = out_struct((k, bs, ns), Xt.dtype, Xt)
    if with_gram:
        out_specs = (y_spec, pl.BlockSpec(
            (k, k), lambda i: (0, 0), memory_space=pltpu.VMEM))
        out_shape = (y_shape, out_struct((k, k), jnp.float32, Xt))
    else:
        out_specs, out_shape = y_spec, y_shape

    out = pl.pallas_call(
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
    )(*args)
    if with_gram:
        Yv, Gm = out
        return (Yv.reshape(k, bs * ns) if flat else Yv), Gm
    return out.reshape(k, bs * ns) if flat else out


@functools.partial(
    jax.jit, static_argnames=("hops", "offsets", "mask_slot", "interpret", "precision")
)
def const_block_stencil_spmm_t(
    hops: tuple,
    offsets: tuple[int, ...],
    mask_slot: tuple[int, ...],
    masks: jax.Array | None,
    Xt: jax.Array,
    *,
    interpret: bool = False,
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """Lanes-major constant-hop block-stencil SpMM.

    Args:
      hops: static nested tuple, ``hops[d][a][b]`` — constant bs x bs block
        per site-offset (compile-time scalars).
      offsets: static site offsets (toroidal: column site = (s + o) mod ns).
      mask_slot: static per-offset row into ``masks`` (-1 = unmasked).
      masks: (nmask, ns) 0/1 row-site gates, or None if all slots are -1.
      Xt: (k, bs, ns) internal field view (preferred — no relayout), or flat
        (k, bs*ns) spin-major rows.

    Returns:
      Yt, shaped like Xt.
    """
    return _cbs_impl(hops, offsets, mask_slot, masks, Xt, False, interpret,
                     precision)


@functools.partial(
    jax.jit, static_argnames=("hops", "offsets", "mask_slot", "interpret", "precision")
)
def const_block_stencil_spmm_gram_t(
    hops: tuple,
    offsets: tuple[int, ...],
    mask_slot: tuple[int, ...],
    masks: jax.Array | None,
    Xt: jax.Array,
    *,
    interpret: bool = False,
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
):
    """Const-hop block SpMM with the k x k Gram fused: ``(Yt, G = X Y^T)``
    where the Gram contracts over (spin, site) — exactly the solvers'
    ``P^H (A P)`` (real f32 path). Slab-routed diagonals are NOT included;
    the operator adds their (boundary-sized) Gram correction outside."""
    return _cbs_impl(hops, offsets, mask_slot, masks, Xt, True, interpret,
                     precision)


def available(
    n_sites: int,
    k: int,
    bs: int,
    offsets: tuple[int, ...],
    nmask: int,
    groups: int | None = None,
) -> bool:
    return plan(n_sites, k, bs, offsets, nmask, groups=groups) is not None


# ------------------------------------------------- merged-layout kernel --
#
# Merged spin-major field layout: the (k, bs, ns) internal view pads its
# bs-sized sublane dim to 8 — for bs=4 real operators every HBM pass of
# every field moves 2x the useful bytes (measured 661 vs 998 GB/s logical
# on this chip). The merged layout stores fields as (m, ns) with m = bs*k,
# row = a*k + i (spin-major, RHS-minor): m is a multiple of 8 for all the
# north-star configs, so fields are unpadded. Spin mixing needs no in-kernel
# row extraction at all: whole (m, R) windows sum into one stack row-block
# per hop group and a single MXU matmul
#
#     Y (m, R) = W (m, G*m) @ stack (G*m, R),
#     W[a*k+i, g*m + b*k+j] = (i == j) * H_g[a][b]
#
# applies every hop. Coefficient algebra stays k x k in the solvers via the
# operator codec hooks (coeff_expand = I_bs (x) M, gram_contract = sum of
# diagonal spin blocks — operators/base.py).


def plan_m(
    n_sites: int,
    m: int,
    offsets: tuple[int, ...],
    nmask: int,
    groups: int,
):
    if m % 8 != 0:
        return None
    stack_rows = -(-(groups * m) // 2)  # single-buffered: half charged
    return _plan(n_sites, m, offsets, sublanes=1, coeff_rows=nmask + stack_rows)


def _m_kernel(near, far, H, m, groups, nmask, precision, with_gram, *refs):
    far_unique = tuple(dict.fromkeys(far))  # deduped, order-preserving
    nf = len(far_unique)
    i = 0
    masks_ref = None
    if nmask > 0:
        masks_ref = refs[0]
        i = 1
    wt_ref = refs[i]
    i += 1
    if H > 0:
        xprev, xcur, xnext = refs[i], refs[i + 1], refs[i + 2]
        i += 3
    else:
        xcur = refs[i]
        i += 1
    far_refs = refs[i : i + nf]
    y_ref = refs[i + nf]
    g_ref = refs[i + nf + 1] if with_gram else None
    nout = 2 if with_gram else 1
    w_ref = refs[i + nf + nout] if H > 0 else None
    s_ref = refs[i + nf + nout + (1 if H > 0 else 0)]
    R = y_ref.shape[1]

    if H > 0:
        w_ref[:, :H] = xprev[:]
        w_ref[:, H : H + R] = xcur[:]
        w_ref[:, H + R :] = xnext[:]

    # Duplicate far offsets (value-masked pairs like the U(1) K1/K2
    # diagonals) share ONE window fetch.
    fi_of = {}
    for d in range(len(near), len(near) + len(far)):
        fi_of[d] = far_unique.index(far[d - len(near)])

    def window_of(d, o):
        if d < len(near):
            if o == 0:
                return xcur[:]
            return w_ref[:, H + o : H + o + R]
        return far_refs[fi_of[d]][:]

    offs = near + far
    for g, (_, mem) in enumerate(groups):
        val = None
        for d, ms in mem:
            piece = window_of(d, offs[d])
            if ms >= 0:
                piece = masks_ref[ms, :].reshape(1, R) * piece
            val = piece if val is None else val + piece
        s_ref[g * m : (g + 1) * m, :] = val

    acc = jax.lax.dot_general(
        wt_ref[:],
        s_ref[:],
        (((1,), (0,)), ((), ())),
        precision=precision,
        preferred_element_type=y_ref.dtype,
    )
    y_ref[:, :] = acc

    if with_gram:
        g = jax.lax.dot_general(
            xcur[:], acc, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        i0 = pl.program_id(0)

        @pl.when(i0 == 0)
        def _():
            g_ref[:, :] = g

        @pl.when(i0 > 0)
        def _():
            g_ref[:, :] += g


def _merged_weights(groups, bs, k, dtype):
    m = bs * k
    G = len(groups)
    wt = np.zeros((m, G * m), dtype=np.float32)
    eye = np.eye(k, dtype=np.float32)
    for g, (h, _) in enumerate(groups):
        for a in range(bs):
            for b in range(bs):
                if h[a][b] != 0.0:
                    wt[a * k : (a + 1) * k,
                       g * m + b * k : g * m + (b + 1) * k] = h[a][b] * eye
    return jnp.asarray(wt, dtype=dtype)


def _cbs_m_impl(hops, offsets, mask_slot, masks, Xm, with_gram, interpret,
                precision):
    bs = len(hops[0])
    m, ns = Xm.shape
    k = m // bs
    nmask = 0 if masks is None else masks.shape[0]
    p = plan_m(ns, m, offsets, nmask, groups=n_groups(hops))
    if p is None:
        raise ValueError(
            f"no merged const-block plan for ns={ns}, m={m}, offsets={offsets}"
        )
    R, H = p.R, p.H
    nb = ns // R
    nh = ns // H if H else 1

    order = _order_by_plan(offsets, p.near + p.far)
    hops_ord = tuple(hops[j] for j in order)
    mslot_ord = tuple(mask_slot[j] for j in order)
    groups = _group_offsets(hops_ord, mslot_ord)
    G = len(groups)
    wt = _merged_weights(groups, bs, k, Xm.dtype)

    in_specs = []
    args = []
    if nmask > 0:
        in_specs.append(
            pl.BlockSpec((nmask, R), lambda i: (0, i), memory_space=pltpu.VMEM)
        )
        args.append(masks)
    in_specs.append(
        pl.BlockSpec(wt.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    )
    args.append(wt)
    if H > 0:
        in_specs += [
            pl.BlockSpec(
                (m, H), lambda i: (0, (i * (R // H) - 1) % nh),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((m, R), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (m, H), lambda i: (0, ((i + 1) * (R // H)) % nh),
                memory_space=pltpu.VMEM,
            ),
        ]
        args += [Xm, Xm, Xm]
    else:
        in_specs.append(
            pl.BlockSpec((m, R), lambda i: (0, i), memory_space=pltpu.VMEM)
        )
        args.append(Xm)
    for o in dict.fromkeys(p.far):  # deduped windows (kernel maps shares)
        mm_ = o // R
        in_specs.append(
            pl.BlockSpec(
                (m, R),
                functools.partial(lambda s, i: (0, (i + s) % nb), mm_),
                memory_space=pltpu.VMEM,
            )
        )
        args.append(Xm)

    kernel = functools.partial(
        _m_kernel, p.near, p.far, H, m, groups, nmask, precision, with_gram
    )
    terms = sum(
        1 for d in range(len(offsets)) for a in range(bs) for b in range(bs)
        if hops[d][a][b] != 0.0
    )
    flops = 2 * terms * k * ns + (2 * m * m * ns if with_gram else 0)
    bytes_accessed = 4 * (m * ns * p.x_reads + nmask * ns + m * ns)
    scratch = []
    if H > 0:
        scratch.append(pltpu.VMEM((m, R + 2 * H), Xm.dtype))
    scratch.append(pltpu.VMEM((G * m, R), Xm.dtype))

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
        interpret=interpret,
    )(*args)


@functools.partial(
    jax.jit, static_argnames=("hops", "offsets", "mask_slot", "interpret",
                              "precision")
)
def const_block_stencil_spmm_m_t(
    hops: tuple,
    offsets: tuple[int, ...],
    mask_slot: tuple[int, ...],
    masks: jax.Array | None,
    Xm: jax.Array,
    *,
    interpret: bool = False,
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """Merged-layout const-hop block SpMM: Xm is (m, ns), m = bs*k,
    row = a*k + i. Returns Ym shaped like Xm."""
    return _cbs_m_impl(hops, offsets, mask_slot, masks, Xm, False, interpret,
                       precision)


@functools.partial(
    jax.jit, static_argnames=("hops", "offsets", "mask_slot", "interpret",
                              "precision")
)
def const_block_stencil_spmm_m_gram_t(
    hops: tuple,
    offsets: tuple[int, ...],
    mask_slot: tuple[int, ...],
    masks: jax.Array | None,
    Xm: jax.Array,
    *,
    interpret: bool = False,
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
):
    """Merged-layout SpMM with the (m, m) Gram fused: ``(Ym, G = X Y^T)``.
    Contract G to k x k with the operator's ``gram_contract``."""
    return _cbs_m_impl(hops, offsets, mask_slot, masks, Xm, True, interpret,
                       precision)


def available_m(
    n_sites: int,
    m: int,
    offsets: tuple[int, ...],
    nmask: int,
    groups: int,
) -> bool:
    return plan_m(n_sites, m, offsets, nmask, groups) is not None


# ----------------------------------------------------------- slab kernel --
#
# Wraparound diagonals of periodic lattice operators touch only boundary
# rows — e.g. the z-wrap of the 4D Dirac operator hits 1/L of all sites, in
# full g-aligned blocks at a regular stride. Routed through the main kernel
# they force far-window fetches on EVERY tile (their offsets pin the tile
# size); split out, the main kernel's planner is free to grow R (x_reads
# 7 -> 4 on config 4) and this kernel adds the wrap contribution touching
# only the boundary slabs, accumulating in place via input-output aliasing.


def _slab_kernel(hop, bs, y_in_ref, x_ref, y_ref):
    k = y_ref.shape[0]
    acc = [y_in_ref[:, a, :] for a in range(bs)]
    for b in range(bs):
        w = x_ref[:, b, :]
        for a in range(bs):
            if hop[a][b] != 0.0:
                acc[a] = acc[a] + hop[a][b] * w
    for a in range(bs):
        y_ref[:, a, :] = acc[a]


@functools.partial(
    jax.jit,
    static_argnames=("hop", "g", "nblocks", "dst_mul", "dst_off", "src_shift",
                     "interpret"),
)
def slab_block_accumulate(
    hop: tuple,
    g: int,
    nblocks: int,
    dst_mul: int,
    dst_off: int,
    src_shift: int,
    Xv: jax.Array,
    Yv: jax.Array,
    *,
    interpret: bool = False,
) -> jax.Array:
    """Y[dst slabs] += hop @ X[dst slabs + offset], in place (Y aliased).

    Destination slab j (j < nblocks) covers sites
    [(dst_mul*j + dst_off)*g, ...+g); the source sits ``src_shift`` g-blocks
    away (toroidal). hop is a static bs x bs tuple of scalars."""
    k, bs, ns = Xv.shape
    nb = ns // g

    def dst(j):
        return (dst_mul * j + dst_off) % nb

    return pl.pallas_call(
        functools.partial(_slab_kernel, hop, bs),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((k, bs, g), lambda j: (0, 0, dst(j)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bs, g), lambda j: (0, 0, (dst(j) + src_shift) % nb),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k, bs, g), lambda j: (0, 0, dst(j)),
                               memory_space=pltpu.VMEM),
        out_shape=out_struct(Yv.shape, Yv.dtype, Yv),
        input_output_aliases={0: 0},
        interpret=interpret,
    )(Yv, Xv)


# Merged-layout slab kernels: the wrap contribution is one MXU dot
# dY = W_slab (m, m) @ X_src with W_slab = the single-group merged weights.


def _slab_m_kernel(with_gram, *refs):
    if with_gram:
        wt_ref, y_in_ref, x_src_ref, x_dst_ref, g_in_ref, y_ref, g_ref = refs
    else:
        wt_ref, y_in_ref, x_src_ref, y_ref = refs
    dy = jax.lax.dot_general(
        wt_ref[:], x_src_ref[:], (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=y_ref.dtype,
    )
    y_ref[:, :] = y_in_ref[:] + dy
    if with_gram:
        g = jax.lax.dot_general(
            x_dst_ref[:], dy, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            g_ref[:, :] = g_in_ref[:, :] + g

        @pl.when(j > 0)
        def _():
            g_ref[:, :] += g


def _slab_weights(hop, k, dtype):
    bs = len(hop)
    m = bs * k
    wt = np.zeros((m, m), dtype=np.float32)
    eye = np.eye(k, dtype=np.float32)
    for a in range(bs):
        for b in range(bs):
            if hop[a][b] != 0.0:
                wt[a * k : (a + 1) * k, b * k : (b + 1) * k] = hop[a][b] * eye
    return jnp.asarray(wt, dtype=dtype)


@functools.partial(
    jax.jit,
    static_argnames=("hop", "g", "nblocks", "dst_mul", "dst_off", "src_shift",
                     "with_gram", "interpret"),
)
def slab_m_accumulate(
    hop: tuple,
    g: int,
    nblocks: int,
    dst_mul: int,
    dst_off: int,
    src_shift: int,
    Xm: jax.Array,
    Ym: jax.Array,
    Gm: jax.Array | None = None,
    *,
    with_gram: bool = False,
    interpret: bool = False,
):
    """Merged-layout ``Y[dst slabs] += W_slab @ X[dst + shift]`` (Y aliased);
    with ``with_gram`` also accumulates ``G += X_dst (dY)^T`` on top of Gm."""
    m, ns = Xm.shape
    bs = len(hop)
    nb = ns // g
    wt = _slab_weights(hop, m // bs, Xm.dtype)

    def dst(j):
        return (dst_mul * j + dst_off) % nb

    in_specs = [
        pl.BlockSpec(wt.shape, lambda j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((m, g), lambda j: (0, dst(j)), memory_space=pltpu.VMEM),
        pl.BlockSpec((m, g), lambda j: (0, (dst(j) + src_shift) % nb),
                     memory_space=pltpu.VMEM),
    ]
    args = [wt, Ym, Xm]
    if with_gram:
        in_specs += [
            pl.BlockSpec((m, g), lambda j: (0, dst(j)), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, m), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ]
        args += [Xm, Gm]
        out_specs = (
            pl.BlockSpec((m, g), lambda j: (0, dst(j)), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, m), lambda j: (0, 0), memory_space=pltpu.VMEM),
        )
        out_shape = (
            out_struct(Ym.shape, Ym.dtype, Ym),
            out_struct((m, m), jnp.float32, Ym),
        )
    else:
        out_specs = pl.BlockSpec((m, g), lambda j: (0, dst(j)),
                                 memory_space=pltpu.VMEM)
        out_shape = out_struct(Ym.shape, Ym.dtype, Ym)

    return pl.pallas_call(
        functools.partial(_slab_m_kernel, with_gram),
        grid=(nblocks,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        input_output_aliases={1: 0},
        interpret=interpret,
    )(*args)


@functools.partial(
    jax.jit,
    static_argnames=("hop", "g", "nblocks", "dst_base", "src_base",
                     "with_gram", "interpret"),
)
def slab_m_accumulate_from(
    hop: tuple,
    g: int,
    nblocks: int,
    dst_base: int,
    src_base: int,
    Src: jax.Array,
    Ym: jax.Array,
    Xm: jax.Array | None = None,
    vals: jax.Array | None = None,
    *,
    with_gram: bool = False,
    interpret: bool = False,
):
    """Merged-layout ``Y[g-blocks dst_base + j] += W_slab @ Src[src_base + j]``
    with a separate source array (distributed halo corrections). ``vals``
    (optional, (1, nblocks*g)) scales the correction per destination site —
    the value-carrying masks of gauged crossing diagonals. With
    ``with_gram`` (requires the local field ``Xm``) also returns the (m, m)
    Gram contribution ``sum_dst X_dst (dY)^T`` of the correction — the
    distributed fused matmat+gram path adds its contraction to the local
    kernel's Gram so no field is re-read."""
    m, ns = Ym.shape
    bs = len(hop)
    wt = _slab_weights(hop, m // bs, Ym.dtype)
    has_vals = vals is not None

    def kern(*refs):
        refs = list(refs)
        wt_ref = refs.pop(0)
        y_in_ref = refs.pop(0)
        x_ref = refs.pop(0)
        v_ref = refs.pop(0) if has_vals else None
        xd_ref = refs.pop(0) if with_gram else None
        y_ref = refs.pop(0)
        g_ref = refs.pop(0) if with_gram else None
        dy = jax.lax.dot_general(
            wt_ref[:], x_ref[:], (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=y_ref.dtype,
        )
        if has_vals:
            dy = dy * v_ref[:]  # (1, g) broadcast over rows
        y_ref[:, :] = y_in_ref[:] + dy
        if with_gram:
            gg = jax.lax.dot_general(
                xd_ref[:], dy, (((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
            j = pl.program_id(0)

            @pl.when(j == 0)
            def _():
                g_ref[:, :] = gg

            @pl.when(j > 0)
            def _():
                g_ref[:, :] += gg

    in_specs = [
        pl.BlockSpec(wt.shape, lambda j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((m, g), lambda j: (0, dst_base + j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((m, g), lambda j: (0, src_base + j),
                     memory_space=pltpu.VMEM),
    ]
    args = [wt, Ym, Src]
    if has_vals:
        in_specs.append(
            pl.BlockSpec((1, g), lambda j: (0, j), memory_space=pltpu.VMEM)
        )
        args.append(vals)
    if with_gram:
        in_specs.append(
            pl.BlockSpec((m, g), lambda j: (0, dst_base + j),
                         memory_space=pltpu.VMEM)
        )
        args.append(Xm)
        out_specs = (
            pl.BlockSpec((m, g), lambda j: (0, dst_base + j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, m), lambda j: (0, 0), memory_space=pltpu.VMEM),
        )
        out_shape = (
            out_struct(Ym.shape, Ym.dtype, Ym),
            out_struct((m, m), jnp.float32, Ym),
        )
    else:
        out_specs = pl.BlockSpec((m, g), lambda j: (0, dst_base + j),
                                 memory_space=pltpu.VMEM)
        out_shape = out_struct(Ym.shape, Ym.dtype, Ym)

    return pl.pallas_call(
        kern,
        grid=(nblocks,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        input_output_aliases={1: 0},
        interpret=interpret,
    )(*args)



@functools.partial(
    jax.jit,
    static_argnames=("hop", "g", "nblocks", "dst_base", "src_base", "interpret"),
)
def slab_block_accumulate_from(
    hop: tuple,
    g: int,
    nblocks: int,
    dst_base: int,
    src_base: int,
    Src: jax.Array,
    Yv: jax.Array,
    *,
    interpret: bool = False,
) -> jax.Array:
    """Y[g-blocks dst_base + j] += hop @ Src[g-blocks src_base + j], in place.

    Like ``slab_block_accumulate`` but the source is a SEPARATE array — used
    for the distributed boundary corrections, where the source slab is a
    received halo buffer (parallel/dist_ops.py)."""
    k, bs, _ = Src.shape

    return pl.pallas_call(
        functools.partial(_slab_kernel, hop, bs, g, 1, dst_base),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((k, bs, g), lambda j: (0, 0, dst_base + j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bs, g), lambda j: (0, 0, src_base + j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k, bs, g), lambda j: (0, 0, dst_base + j),
                               memory_space=pltpu.VMEM),
        out_shape=out_struct(Yv.shape, Yv.dtype, Yv),
        input_output_aliases={0: 0},
        interpret=interpret,
    )(Yv, Src)
