"""Rolling-ring Pallas BLOCK-stencil SpMM — large-n matrix-link fast path.

The windowed block-stencil kernel (ops/block_stencil.py) pays the scalar
kernel's HBM schedule: every merged field block is DMA'd once as the
current tile and once per far offset that revisits it (x_reads ~ 3 for the
4D 9/17-point Dirac stencil at streaming sizes). At 32^4 the general
matrix-link kernel measured 31.1 (k=12) / 26.7 (k=16) Gnnz/s — ~42% of its
own HBM model (BASELINE.md round-4 matrix-link notes; the named next
candidate was exactly this kernel).

This kernel streams the merged spin-major field Xm (m = bs*k rows, ns
lanes — see ops/const_block_stencil.py for the layout) through a VMEM ring
buffer with MANUAL async DMAs, exactly as ops/stencil_ring.py does for
scalar fields: grid step i computes output block i from ring slots holding
X blocks i-M .. i+M (toroidal), fetches block i+M+1 once, retires block
i-M-1 by overwrite. x_reads = 1.0 by construction. Coefficients (the
(noff, bs, bs, ns) per-site block diagonals, 2D-reshaped) and the output
ride ordinary auto-pipelined BlockSpecs.

Per-step math is the windowed merged kernel's: for site-offset d and spin
pair (a, b), acc[a] += blocks[d, a, b, :] * window_d[b*k:(b+1)*k, :] — a
(1, R) sublane-broadcast FMA into a (k, R) accumulator (measured 10.6
TFLOP/s attainable at kernel ILP, CHIP_QUEUE_r4.log probe-links-mxu
RESIZED, so the kernel is HBM-bound once x_reads = 1).

Fused Gram + seed: ``ring_block_spmm_m_gram_t`` also returns
G = Xm (A Xm)^T (m x m, f32) and accepts an optional (m, m) f32 ``seed``
added into G. The seed is the measurement hook: chaining a benchmark
loop's dependence through G -> seed keeps Y loop-local, so the chain pays
no XLA while-carry field copy (CLAUDE.md benchmark invariant) and needs no
donation — legal for PERIODIC operators whose toroidal wrap coefficients
are nonzero (where the donated apply is not).

Donation (``donate=True``): Y aliased onto Xm. Race-free by the ring's
prefetch ordering ONLY for wrap_zero operators — the toroidal tail
re-reads (blocks 0..M fetched again for the last M steps) see overwritten
data, so every wrap-crossing coefficient must be exactly zero (open-BC
Dirac builders; BlockDIAOperator.wrap_zero). Same contract as
ops/stencil_ring.py ring_spmm_t.

Reference equivalent: R1 SpMM, BSR flavor (SURVEY.md §3.1) — same contract
as ops/block_stencil.py, different HBM schedule.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from blockcg_tpu.ops.stencil import order_by_plan
from blockcg_tpu.ops.stencil_ring import RingPlan, _decompose, _R_MAX
from blockcg_tpu.ops.vma import out_struct

_VMEM_BUDGET = 40 * 1024 * 1024
_VMEM_LIMIT = 64 * 1024 * 1024


def _fold_wrap_offset(o: int, L: int) -> int:
    """Toroidal wrap partner of bulk hop ``o`` on an axis of extent L:
    +st pairs with -(L-1)st, -st with +(L-1)st — both are o*(1-L)."""
    return o * (1 - L)


def plan(n_sites: int, m: int, bs: int, offsets: tuple[int, ...],
         itemsize: int = 4, coeff_itemsize: int = 4,
         fold: tuple[tuple[int, int], ...] = ()) -> RingPlan | None:
    """Largest R whose ring fits the VMEM budget, with nb > S.

    ``m`` is the merged row count (bs*k); the coefficient stream has
    noff*bs*bs rows per lane. Requires 8 | m (unpadded sublane tiles) and
    bs | m.

    ``fold``: tuple of (diag_index, L) FOLDED periodic wraps (VERDICT r4
    item 3). A folded diagonal's coefficient array carries BOTH the bulk
    hop (sites with axis coordinate < L-1 for o > 0) and its toroidal wrap
    partner (coordinate == L-1, column o*(1-L) away) — their site supports
    are complementary, so one dense stream serves both and the wrap's
    mostly-zero dense diagonal never leaves HBM (periodic 32^4: 15 -> 9
    streamed diagonals, 1344 -> 960 B/site at k=12). The kernel selects
    between the two window reads with a compile-time iota mask on the
    destination coordinate. Ring geometry (H/M/S) is computed over the
    EFFECTIVE offset set (bulk + wrap partners)."""
    if m % 8 != 0 or m % bs != 0:
        return None
    if n_sites % 128 != 0 or n_sites < 512:
        return None
    for d, L in fold:
        st = abs(offsets[d])
        if st == 0 or st * L > n_sites or n_sites % (st * L) != 0:
            return None
    eff_offsets = tuple(offsets) + tuple(
        _fold_wrap_offset(offsets[d], L) for d, L in fold)
    noff = len(offsets)
    cr = noff * bs * bs
    # Mixed coefficient/field dtypes (bf16-stored blocks, f32 fields) make
    # Mosaic's scoped-VMEM stack far exceed this model: the in-kernel
    # bf16->f32 coefficient converts cost extra stack temps the budget
    # below cannot see (measured: the donated 32^4 open-BC apply at R=8192
    # wanted 70.3 MB scoped vs the 64 MB limit and failed to compile,
    # CHIP_QUEUE_r4.log probe-block-ring bf16-blocks EXIT=1, while every
    # same-R uniform-dtype arm ran). Halving the planning budget forces a
    # smaller R with ample stack headroom. Perf note: bf16 blocks measured
    # SLOWER than f32 blocks on this kernel anyway (43.7/47.4 vs 48.8/52.8
    # Gnnz/s at 32^4 periodic) — a capacity option, not a speed path.
    budget = _VMEM_BUDGET if coeff_itemsize == itemsize else _VMEM_BUDGET // 2
    best = None
    R = 128
    while R <= min(n_sites, _R_MAX):
        if n_sites % R == 0:
            dec = _decompose(offsets, R)
            dec_eff = _decompose(eff_offsets, R)
            H = max((abs(r) for _, r in dec_eff), default=0)
            M = max((abs(mm) + (1 if r != 0 else 0) for mm, r in dec_eff),
                    default=1)
            M = max(M, 1)
            S = 2 * M + 2
            nb = n_sites // R
            if nb > S and H <= R // 2:
                nwin = 1 if H > 0 else 0
                vmem = (
                    itemsize * m * (S * R + nwin * (R + 2 * H))  # ring + win
                    + 2 * itemsize * m * R            # out (double-buffered)
                    + 2 * coeff_itemsize * cr * R     # diags (double-buffered)
                    + 4 * m * R                       # f32 accumulators
                    + 3 * 4 * m * m   # gram-fused variant: seed + (m, m)
                                      # Gram out double-buffered, f32
                                      # (advisor r4: keep the model honest
                                      # as m grows; ~48 KB at m=64)
                )
                if vmem <= budget:
                    groups: dict[int, list[int]] = {}
                    for mm, r in dec:
                        groups.setdefault(mm, []).append(r)
                    gtuple = tuple(sorted(
                        (mm, tuple(rs)) for mm, rs in groups.items()))
                    order = [mm * R + r for mm, rs in gtuple for r in rs]
                    best = RingPlan(R, H, M, S, gtuple, tuple(order))
        R *= 2
    return best


def _ring_m_kernel(p: RingPlan, bs, k, nb, with_gram, seeded, terms,
                   diags_ref, *refs):
    if seeded:
        s_ref = refs[0]
        refs = refs[1:]
    x_hbm = refs[0]
    y_ref = refs[1]
    g_ref = refs[2] if with_gram else None
    ring = refs[2 + (1 if with_gram else 0)]
    nscr = 3 + (1 if with_gram else 0)
    w_ref = refs[nscr] if p.H > 0 else None
    sems = refs[nscr + (1 if p.H > 0 else 0)]

    m, R = y_ref.shape
    i = pl.program_id(0)

    def fetch(b_signed):
        # jnp.int32 everywhere: the CPU suite enables x64, where a bare
        # Python-int operand would promote the index math to int64.
        b = jax.lax.rem(b_signed + jnp.int32(nb), jnp.int32(nb))
        slot = jax.lax.rem(b_signed + jnp.int32(p.S * nb), jnp.int32(p.S))
        return pltpu.make_async_copy(
            x_hbm.at[:, pl.ds(b * R, R)],
            ring.at[slot],
            sems.at[slot],
        )

    @pl.when(i == 0)
    def _prologue():
        for mm in range(-p.M, p.M + 1):
            fetch(mm).start()
        for mm in range(-p.M, p.M + 1):
            fetch(mm).wait()

    @pl.when(i > 0)
    def _steady():
        fetch(i + p.M).wait()

    # Overlap the next-block fetch with this step's compute. The LAST step
    # must not issue one: a DMA still in flight at kernel end aborts the
    # program on hardware (interpret mode cannot model this — see
    # ops/stencil_ring.py, the bug class that motivated the on-chip ring
    # smoke tests).
    @pl.when(i + 1 < nb)
    def _lookahead():
        fetch(i + p.M + 1).start()

    def slot_of(mm):
        return jax.lax.rem(i + jnp.int32(mm + p.S * nb), jnp.int32(p.S))

    # bf16 fields accumulate in f32; stores cast back (ops/stencil.py rule).
    adt = jnp.float32 if y_ref.dtype == jnp.bfloat16 else y_ref.dtype

    def up(x):
        return x.astype(adt) if x.dtype != adt else x

    if p.H > 0:
        H = p.H
        w_ref[:, :H] = ring[slot_of(-1), :, R - H:]
        w_ref[:, H:H + R] = ring[slot_of(0)]
        w_ref[:, H + R:] = ring[slot_of(1), :, :H]

    def read_window(mm, r):
        # window for a site-offset, read ONCE per offset (the windowed
        # kernel's hoist) then sliced per spin b
        if mm == 0 and p.H > 0 and abs(r) <= p.H:
            return w_ref[:, p.H + r: p.H + r + R]
        if r == 0:
            return ring[slot_of(mm)]
        if r > 0:
            return jnp.concatenate(
                [ring[slot_of(mm), :, r:],
                 ring[slot_of(mm + 1), :, :r]], axis=1)
        return jnp.concatenate(
            [ring[slot_of(mm - 1), :, R + r:],
             ring[slot_of(mm), :, :R + r]], axis=1)

    acc = [jnp.zeros((k, R), dtype=adt) for _ in range(bs)]
    for d, (mm, r, f4) in enumerate(terms):
        wd = read_window(mm, r)
        if f4 is not None:
            # FOLDED periodic wrap (see plan()): this diagonal's dense
            # coefficient stream carries bulk hop AND toroidal wrap values
            # on complementary destination-site sets. Select the source
            # window per lane by the destination's axis coordinate — a
            # compile-time-structured iota mask, zero extra HBM.
            mm_w, r_w, st, L, phase = f4
            wd_w = read_window(mm_w, r_w)
            lanes = (jax.lax.broadcasted_iota(jnp.int32, (1, R), 1)
                     + i * jnp.int32(R))
            coord = jax.lax.rem(jax.lax.div(lanes, jnp.int32(st)),
                                jnp.int32(L))
            mask = (coord == jnp.int32(phase)).astype(adt)
            wd = up(wd) + mask * (up(wd_w) - up(wd))
        for b in range(bs):
            wb = up(wd[b * k:(b + 1) * k, :])
            for a in range(bs):
                c = up(diags_ref[(d * bs + a) * bs + b, :].reshape(1, R))
                acc[a] = acc[a] + c * wb
    for a in range(bs):
        y_ref[a * k:(a + 1) * k, :] = acc[a].astype(y_ref.dtype)

    if with_gram:
        xc = up(w_ref[:, p.H: p.H + R] if p.H > 0 else ring[slot_of(0)])
        y = jnp.concatenate(acc, axis=0)
        g = jax.lax.dot_general(
            xc, y, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )

        @pl.when(i == 0)
        def _():
            g_ref[:, :] = g + s_ref[:, :] if seeded else g

        @pl.when(i > 0)
        def _():
            g_ref[:, :] += g


def _ring_m_impl(blocks, offsets, Xm, with_gram, interpret, donate,
                 seed=None, fold=()):
    noff, bs, _, ns = blocks.shape
    m = Xm.shape[0]
    k = m // bs
    p = plan(ns, m, bs, offsets, itemsize=Xm.dtype.itemsize,
             coeff_itemsize=blocks.dtype.itemsize, fold=fold)
    if p is None:
        raise ValueError(
            f"no ring block-stencil plan for ns={ns}, m={m}, bs={bs}, "
            f"offsets={offsets}, fold={fold}")
    R = p.R
    nb = ns // R

    order = order_by_plan(offsets, p.order)
    blocks_ord = (blocks[jnp.asarray(order)]
                  if order != list(range(noff)) else blocks)
    diags2d = blocks_ord.reshape(noff * bs * bs, ns)
    cr = noff * bs * bs

    # Static per-diagonal terms in plan (streamed-row) order; folded
    # diagonals carry their wrap partner's decomposition (see plan()).
    fold_by_d = dict(fold)
    terms = []
    for dj in order:
        o = offsets[dj]
        (mm, r), = _decompose((o,), R)
        f4 = None
        if dj in fold_by_d:
            L = fold_by_d[dj]
            (mm_w, r_w), = _decompose((_fold_wrap_offset(o, L),), R)
            f4 = (mm_w, r_w, abs(o), L, L - 1 if o > 0 else 0)
        terms.append((mm, r, f4))
    terms = tuple(terms)

    seeded = seed is not None
    in_specs = [
        pl.BlockSpec((cr, R), lambda i: (0, i), memory_space=pltpu.VMEM),
    ]
    args = [diags2d]
    if seeded:
        in_specs.append(pl.BlockSpec((m, m), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(seed)
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))  # X in HBM; manual
    args.append(Xm)
    x_index = len(args) - 1

    y_spec = pl.BlockSpec((m, R), lambda i: (0, i), memory_space=pltpu.VMEM)
    y_shape = out_struct((m, ns), Xm.dtype, Xm)
    if with_gram:
        out_specs = (y_spec, pl.BlockSpec((m, m), lambda i: (0, 0),
                                          memory_space=pltpu.VMEM))
        out_shape = (y_shape, out_struct((m, m), jnp.float32, Xm))
    else:
        out_specs, out_shape = y_spec, y_shape

    scratch = [pltpu.VMEM((p.S, m, R), Xm.dtype)]
    if p.H > 0:
        scratch.append(pltpu.VMEM((m, R + 2 * p.H), Xm.dtype))
    scratch.append(pltpu.SemaphoreType.DMA((p.S,)))

    kernel = functools.partial(_ring_m_kernel, p, bs, k, nb, with_gram,
                               seeded, terms)
    flops = 2 * cr * k * ns + (2 * m * m * ns if with_gram else 0)
    bytes_accessed = (Xm.dtype.itemsize * 2 * m * ns
                      + blocks.dtype.itemsize * cr * ns)

    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            # the ring is only coherent on a sequential grid (a Megacore
            # split would race it)
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=int(bytes_accessed),
            transcendentals=0,
        ),
        # donate: legal only for wrap_zero operators (see module docstring)
        input_output_aliases={x_index: 0} if donate else {},
        interpret=interpret,
    )(*args)


@functools.partial(jax.jit,
                   static_argnames=("offsets", "interpret", "donate", "fold"))
def ring_block_spmm_m_t(blocks, offsets: tuple[int, ...], Xm, *,
                        interpret: bool = False, donate: bool = False,
                        fold: tuple[tuple[int, int], ...] = ()):
    """Merged-layout block-stencil SpMM, each X block fetched once.

    ``fold``: folded periodic wraps — see :func:`plan`."""
    return _ring_m_impl(blocks, offsets, Xm, False, interpret, donate,
                        fold=fold)


@functools.partial(jax.jit,
                   static_argnames=("offsets", "interpret", "donate", "fold"))
def ring_block_spmm_m_gram_t(blocks, offsets: tuple[int, ...], Xm, *,
                             seed=None, interpret: bool = False,
                             donate: bool = False,
                             fold: tuple[tuple[int, int], ...] = ()):
    """Ring block SpMM with the (m, m) Gram fused: ``(Ym, G = Xm Ym^T)``.

    ``seed`` (optional, (m, m) f32) is added into G — the benchmark-chain
    dependence hook (see module docstring)."""
    return _ring_m_impl(blocks, offsets, Xm, True, interpret, donate,
                        seed=seed, fold=fold)


def available(n_sites: int, m: int, bs: int, offsets: tuple[int, ...],
              itemsize: int = 4, coeff_itemsize: int = 4,
              fold: tuple[tuple[int, int], ...] = ()) -> bool:
    return plan(n_sites, m, bs, offsets, itemsize, coeff_itemsize,
                fold=fold) is not None
