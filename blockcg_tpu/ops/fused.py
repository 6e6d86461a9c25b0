"""Fused per-iteration block-update Pallas kernels (T-K2).

Reference equivalent: R2/R3 composition (SURVEY.md §3.1) — Eigen evaluates
``X += P*(alpha*S)`` etc. lazily in one pass; XLA does not: profiling the
SBCGrQ iteration on the v5e showed the small-k Gram/update chain running at
~150-340 GB/s with one HBM pass per primitive, dominating time-to-tol
(~5.3 of 5.5 ms/iter on config 3). These kernels restore the one-pass
structure and run at measured ~700-830 GB/s:

- ``gram(U, V)``                     G = U V^T (lanes-major: fields are
                                     (k, n) or (k, bs, ns); one read each)
- ``mm_update(M, B, A)``             Y = M @ B [+ A]
- ``mm_update_gram(M, B, A)``        Y = M @ B [+ A], G = Y Y^T — fuses the
                                     SBCGrQ residual-direction update with
                                     the CholQR Gram (whose diagonal also
                                     supplies the equilibration norms, so
                                     CholeskyQR needs NO separate norm pass)
- ``qr_p_update(M2, Q1, rho, P)``    Q = M2 @ Q1 ; Pn = Q + rho @ P — the
                                     fused second-QR-pass + search-direction
                                     update (reads Q1, P once).

All k x k coefficient matrices ride in VMEM blocks pinned to (0, 0) and the
matmuls run on the MXU at HIGHEST (full f32) precision. Fields may be flat
(k, n) or the block operators' native (k, bs, ns) view. Grid is 1-D over
lane tiles; Gram results accumulate into the revisited (k, k) output block.

Callers dispatch through ``available()`` and fall back to the jnp
composition (solvers/common.py) on CPU / f64 / odd shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from blockcg_tpu.ops.vma import out_struct

HIGHEST = jax.lax.Precision.HIGHEST

_VMEM_BUDGET = 10 * 1024 * 1024
# Mosaic's default scoped-vmem limit is 16 MiB; the multi-output kernels
# (px_update at k=64 f32) measured 16.09 MiB of stack at the modeled-legal
# tile (CHIP_QUEUE_r3.log sbcgrq_3d_256 compile OOM) because in-kernel dot
# temporaries sit outside the _pick_tile double-buffer model. Raise the
# per-kernel limit instead of shrinking tiles: v5e has 128 MiB VMEM and
# the large lane tiles are what buys the measured HBM bandwidth.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=48 * 1024 * 1024)
_R_MAX = 16384


def _field_dims(F):
    """(k, bs, lanes) with bs=0 marking a flat 2D field."""
    if F.ndim == 2:
        return F.shape[0], 0, F.shape[1]
    if F.ndim == 3:
        return F.shape[0], F.shape[1], F.shape[2]
    raise ValueError(f"field must be (k, n) or (k, bs, ns), got {F.shape}")


def _require_tile(R, k, bs, lanes):
    if R is None:
        raise ValueError(
            f"no fused-kernel tiling for field (k={k}, bs={bs or None}, "
            f"lanes={lanes}): lanes must be a multiple of 128 and a tile "
            f"must fit VMEM — gate calls with the *_available helpers"
        )
    return R


def _pick_tile(k: int, bs: int, lanes: int, nfields: int,
               itemsize: int = 4) -> int | None:
    """Largest lane tile R dividing ``lanes`` under the VMEM budget.

    ``itemsize``: the FIELD dtype's — bf16 tiles are half the bytes, so
    the bf16 tier runs double-width tiles (fewer per-tile fixed costs;
    round 5). f32 behavior unchanged."""
    if lanes % 128 != 0:
        return None
    sub = max(k, 8) if bs == 0 else k * max(bs, 8)  # padded sublane footprint
    best = None
    R = 128
    while R <= min(lanes, _R_MAX):
        if lanes % R == 0:
            if itemsize * 2 * nfields * sub * R <= _VMEM_BUDGET:
                best = R
        R *= 2
    return best


def _isz(F) -> int:
    return jnp.dtype(F.dtype).itemsize


def _spec(k, bs, R):
    if bs == 0:
        return pl.BlockSpec((k, R), lambda i: (0, i), memory_space=pltpu.VMEM)
    return pl.BlockSpec((k, bs, R), lambda i: (0, 0, i), memory_space=pltpu.VMEM)


def _kk_spec(shape):
    return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)


def _f32(x):
    """bf16 tiles are converted in-register before the MXU dot: these
    kernels are HBM-bandwidth-bound (small k), so the f32 MXU issue rate is
    never the limiter, and f32 multiply keeps the k x k algebra exact."""
    return x.astype(jnp.float32) if x.dtype == jnp.bfloat16 else x


def _mxu_pair(m, x):
    """(coefficient, field) operand pair for the big update dots.

    bf16 FIELDS feed the MXU natively — round 5 finding: these kernels are
    MXU-utilization-bound, not HBM-bound (a k=32 dot uses a quarter of the
    systolic rows; CHIP_QUEUE_r5.log probe-mm2-gram), and the bf16 MXU
    issue rate is 2x f32, so converting bf16 fields UP costs the dot 2x
    for nothing. Accumulation stays f32 (preferred_element_type) per the
    bf16-tier rule; only the k x k coefficient VALUES round to bf16 for
    the multiply (~4e-3 relative — the same order as the bf16 field
    rounding the tier already carries; the k x k ALGEBRA producing them
    remains f32, and refinement drivers measure true residuals in f32).
    ``BLOCKCG_NO_BF16_MXU=1`` restores the f32-convert behavior.

    Returns (coeff, field, precision): Mosaic rejects bf16 operands under
    an fp32 contract-precision hint ("Bad lhs type", first probe run), so
    the bf16 pair rides Precision.DEFAULT — which IS the native bf16
    multiply + f32 accumulate this path wants."""
    import os

    if x.dtype == jnp.bfloat16 and not os.environ.get("BLOCKCG_NO_BF16_MXU"):
        return m.astype(jnp.bfloat16), x, jax.lax.Precision.DEFAULT
    return _f32(m), _f32(x), HIGHEST


def _dot_kk(m, x):
    """(k, k) @ (k, R) on the MXU (bf16 fields natively — see _mxu_pair)."""
    mm, xx, prec = _mxu_pair(m, x)
    return jax.lax.dot_general(
        mm, xx, (((1,), (0,)), ((), ())), precision=prec,
        preferred_element_type=jnp.float32,
    )


def _dot_gram(u, v):
    """(k, R) x (k, R) -> (k, k), contracting lanes.

    bf16 x bf16 rides the MXU natively at 2x issue rate with ZERO numerics
    change: an 8-bit-mantissa product is exactly representable in the f32
    accumulator, so native-bf16 and convert-to-f32-first give bitwise
    identical sums (unlike the update dots, where only the COEFFICIENT
    rounds)."""
    import os

    if (u.dtype == jnp.bfloat16 and v.dtype == jnp.bfloat16
            and not os.environ.get("BLOCKCG_NO_BF16_MXU")):
        return jax.lax.dot_general(
            u, v, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32,
        )
    return jax.lax.dot_general(
        _f32(u), _f32(v), (((1,), (1,)), ((), ())), precision=HIGHEST,
        preferred_element_type=jnp.float32,
    )


def _planes(ref, bs):
    """Iterate (k, R) planes of a field ref value."""
    if bs == 0:
        yield ref[:]
    else:
        for b in range(bs):
            yield ref[:, b, :]


def _env_interpret() -> bool:
    import os

    return bool(os.environ.get("BLOCKCG_FUSED_INTERPRET"))


def _ok(*fields) -> bool:
    import os

    if jax.default_backend() != "tpu" and not _env_interpret():
        return False
    if os.environ.get("BLOCKCG_NO_PALLAS"):
        return False
    # bf16 fields ride the same kernels (f32 in-register compute, bf16
    # stores): the capacity/bandwidth mode for full-size config 5.
    return all(f.dtype in (jnp.float32, jnp.bfloat16) for f in fields)


# ------------------------------------------------------------------ gram --


@functools.partial(jax.jit, static_argnames=("interpret",))
def gram(U: jax.Array, V: jax.Array, seed: jax.Array | None = None, *,
         interpret: bool = False) -> jax.Array:
    """G = U V^T over the field dims: (k, ...) x (k, ...) -> (k, k).

    ``seed`` (optional, (k, k) f32) is added into the accumulator — a
    negligible-traffic additive input whose main client is the bandwidth
    calibrator (bench.py): chaining the loop carry through it creates a
    REAL data dependence inside the kernel, which is the only reliable way
    to stop XLA hoisting the whole loop-invariant Gram out of a timing
    fori_loop (a tuple optimization_barrier does NOT tie its elements
    together — the round-3 calibrator measured an impossible 2.9 TB/s that
    way, CHIP_QUEUE_r3b.log bench-headline 2026-08-18)."""
    interpret = interpret or _env_interpret()
    k, bs, lanes = _field_dims(U)
    R = _require_tile(_pick_tile(k, bs, lanes, 2, _isz(U)), k, bs, lanes)
    nb = lanes // R
    seeded = seed is not None

    def kernel(*refs):
        if seeded:
            s_ref, u_ref, v_ref, o_ref = refs
        else:
            u_ref, v_ref, o_ref = refs
        i = pl.program_id(0)
        g = None
        for u, v in zip(_planes(u_ref, bs), _planes(v_ref, bs)):
            t = _dot_gram(u, v)
            g = t if g is None else g + t

        @pl.when(i == 0)
        def _():
            o_ref[:, :] = g + s_ref[:, :] if seeded else g

        @pl.when(i > 0)
        def _():
            o_ref[:, :] += g

    in_specs = [_spec(k, bs, R), _spec(k, bs, R)]
    args = (U, V)
    if seeded:
        in_specs = [_kk_spec((k, k))] + in_specs
        args = (seed, U, V)
    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=_kk_spec((k, k)),
        out_shape=out_struct((k, k), jnp.float32, U),
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(*args)


def gram_available(U) -> bool:
    k, bs, lanes = _field_dims(U)
    return _ok(U) and _pick_tile(k, bs, lanes, 2, _isz(U)) is not None


# ------------------------------------------------------------- mm_update --


@functools.partial(jax.jit, static_argnames=("interpret", "donate"))
def mm_update(
    M: jax.Array, B: jax.Array, A: jax.Array | None = None, *,
    interpret: bool = False, donate: str | None = None,
) -> jax.Array:
    """Y = M @ B (+ A), fields (k, ...), M (k, k).

    ``donate`` aliases Y onto the named dead operand ("b" or "a"): in-place
    HBM writes stream ~2x faster than fresh-buffer writes (see px_update).
    BCG's X-update donates A (= old X); its P-update donates B (= old P)."""
    interpret = interpret or _env_interpret()
    k, bs, lanes = _field_dims(B)
    nf = 2 if A is None else 3
    R = _require_tile(_pick_tile(k, bs, lanes, nf, _isz(B)), k, bs, lanes)
    nb = lanes // R
    has_a = A is not None

    def kernel(m_ref, b_ref, *rest):
        a_ref = rest[0] if has_a else None
        y_ref = rest[1] if has_a else rest[0]
        m = m_ref[:, :]
        if bs == 0:
            y = _dot_kk(m, b_ref[:])
            y_ref[:] = (y + _f32(a_ref[:]) if has_a else y).astype(y_ref.dtype)
        else:
            for b in range(bs):
                y = _dot_kk(m, b_ref[:, b, :])
                y_ref[:, b, :] = (
                    y + _f32(a_ref[:, b, :]) if has_a else y
                ).astype(y_ref.dtype)

    in_specs = [_kk_spec((k, k)), _spec(k, bs, R)]
    args = [M, B]
    if has_a:
        in_specs.append(_spec(k, bs, R))
        args.append(A)
    if donate == "b":
        aliases = {1: 0}
    elif donate == "a":
        if not has_a:
            raise ValueError("donate='a' requires an A operand")
        aliases = {2: 0}
    elif donate is None:
        aliases = {}
    else:
        raise ValueError(f"donate must be None, 'a' or 'b', got {donate!r}")
    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=_spec(k, bs, R),
        out_shape=out_struct(B.shape, B.dtype, B),
        input_output_aliases=aliases,
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(*args)


def mm_update_available(B, has_a: bool) -> bool:
    k, bs, lanes = _field_dims(B)
    return _ok(B) and _pick_tile(k, bs, lanes, 3 if has_a else 2,
                                 _isz(B)) is not None


# -------------------------------------------------------- mm_update_gram --


@functools.partial(jax.jit, static_argnames=("interpret", "donate"))
def mm_update_gram(
    M: jax.Array, B: jax.Array, A: jax.Array | None = None, *,
    interpret: bool = False, donate: bool = False,
):
    """Y = M @ B (+ A);  G = Y Y^T — one pass over the fields.

    ``donate=True`` aliases Y<->B (the CholeskyQR second pass overwrites
    its input basis): in-place HBM writes stream ~2x faster than
    fresh-buffer writes (see px_update docstring)."""
    interpret = interpret or _env_interpret()
    k, bs, lanes = _field_dims(B)
    nf = 2 if A is None else 3
    R = _require_tile(_pick_tile(k, bs, lanes, nf, _isz(B)), k, bs, lanes)
    nb = lanes // R
    has_a = A is not None

    def kernel(m_ref, b_ref, *rest):
        a_ref = rest[0] if has_a else None
        y_ref = rest[1] if has_a else rest[0]
        g_ref = rest[2] if has_a else rest[1]
        i = pl.program_id(0)
        m = m_ref[:, :]
        g = None
        for bi in range(max(bs, 1)):
            if bs == 0:
                y = _dot_kk(m, b_ref[:])
                if has_a:
                    y = y + _f32(a_ref[:])
                ys = y.astype(y_ref.dtype)
                y_ref[:] = ys
            else:
                y = _dot_kk(m, b_ref[:, bi, :])
                if has_a:
                    y = y + _f32(a_ref[:, bi, :])
                ys = y.astype(y_ref.dtype)
                y_ref[:, bi, :] = ys
            # Gram on the stored value — see mm2_update_gram (bf16: the
            # native-MXU gram of exactly what downstream reads).
            t = _dot_gram(ys, ys)
            g = t if g is None else g + t

        @pl.when(i == 0)
        def _():
            g_ref[:, :] = g

        @pl.when(i > 0)
        def _():
            g_ref[:, :] += g

    in_specs = [_kk_spec((k, k)), _spec(k, bs, R)]
    args = [M, B]
    if has_a:
        in_specs.append(_spec(k, bs, R))
        args.append(A)
    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=(_spec(k, bs, R), _kk_spec((k, k))),
        out_shape=(
            out_struct(B.shape, B.dtype, B),
            out_struct((k, k), jnp.float32, B),
        ),
        input_output_aliases={1: 0} if donate else {},
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(*args)


# -------------------------------------------------------- mm2_update_gram --


@functools.partial(jax.jit, static_argnames=("interpret", "donate"))
def mm2_update_gram(
    M1: jax.Array, B1: jax.Array, M2: jax.Array, B2: jax.Array, *,
    interpret: bool = False, donate: bool = False,
):
    """Y = M1 @ B1 + M2 @ B2 ;  G = Y Y^T — one pass over the fields.

    The SBCGrQ residual-direction update with Q kept IMPLICIT: carrying the
    residual basis as (M_qr, W) with Q = M_qr @ W (never materialized) turns
    V = Q - Z alpha into this two-matmul form and saves the tail kernel the
    Q write — 3 field passes here, 5 in px_update, vs 3 + 6 with an explicit
    Q (VERDICT round-1 item 1: the iteration tail was the structural floor).
    """
    interpret = interpret or _env_interpret()
    k, bs, lanes = _field_dims(B1)
    R = _require_tile(_pick_tile(k, bs, lanes, 3, _isz(B1)), k, bs, lanes)
    nb = lanes // R

    def kernel(m1_ref, m2_ref, b1_ref, b2_ref, y_ref, g_ref):
        i = pl.program_id(0)
        # The two k x k dots are STACKED into one (k, 2k) @ (2k, R) dot —
        # px_update's trick, now measured to matter HERE too: at k=32 a
        # (32, 32) @ (32, R) dot uses 32 of 128 systolic rows and runs at
        # ~2.5 TFLOP/s, and the kernel is MXU-UTILIZATION-bound, not HBM-
        # bound (330 GB/s with two small dots while px's stacked form does
        # 670 over MORE passes; gram cost itself is only ~15% —
        # CHIP_QUEUE_r5.log probe-mm2-gram). Doubling the contraction
        # halves the dominant dot time; the (2k, R) stack is a VMEM copy.
        m12 = jnp.concatenate([_f32(m1_ref[:, :]), _f32(m2_ref[:, :])],
                              axis=1)
        g = None
        for bi in range(max(bs, 1)):
            if bs == 0:
                bb = jnp.concatenate([b1_ref[:], b2_ref[:]], axis=0)
            else:
                bb = jnp.concatenate([b1_ref[:, bi, :],
                                      b2_ref[:, bi, :]], axis=0)
            mm12, bbx, prec = _mxu_pair(m12, bb)
            y = jax.lax.dot_general(
                mm12, bbx, (((1,), (0,)), ((), ())), precision=prec,
                preferred_element_type=jnp.float32,
            )
            # Gram on the STORED value: for bf16 outputs the rounded ys IS
            # what every downstream consumer (next iteration's reads, the
            # CholQR whose Q this G implies) sees, so G = ys ys^T is the
            # consistent definition — and bf16 x bf16 rides the native MXU
            # at 2x with exact f32 accumulation (_dot_gram). For f32 the
            # astype is the identity and nothing changes.
            ys = y.astype(y_ref.dtype)
            if bs == 0:
                y_ref[:] = ys
            else:
                y_ref[:, bi, :] = ys
            t = _dot_gram(ys, ys)
            g = t if g is None else g + t

        @pl.when(i == 0)
        def _():
            g_ref[:, :] = g

        @pl.when(i > 0)
        def _():
            g_ref[:, :] += g

    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[_kk_spec((k, k)), _kk_spec((k, k)), _spec(k, bs, R),
                  _spec(k, bs, R)],
        out_specs=(_spec(k, bs, R), _kk_spec((k, k))),
        out_shape=(
            out_struct(B1.shape, B1.dtype, B1),
            out_struct((k, k), jnp.float32, B1),
        ),
        # donate: Y overwrites B1 in place (in the SBCGrQ body W is dead
        # after V = Mqr W - alpha Z). In-place HBM writes stream ~2x faster
        # than fresh-buffer writes (see px_update docstring).
        input_output_aliases={2: 0} if donate else {},
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(M1, M2, B1, B2)


def mm2_update_gram_available(B1) -> bool:
    k, bs, lanes = _field_dims(B1)
    return _ok(B1) and _pick_tile(k, bs, lanes, 3, _isz(B1)) is not None


# ---------------------------------------------------------- xr_update_gram --


@functools.partial(jax.jit, static_argnames=("interpret", "donate"))
def xr_update_gram(
    alpha: jax.Array, P: jax.Array, X: jax.Array, Z: jax.Array,
    R: jax.Array, *, interpret: bool = False, donate: bool = False,
):
    """Xn = X + alpha @ P ;  Rn = R - alpha @ Z ;  G = Rn Rn^T — one pass.

    The BCG/BCGA iteration's solution+residual updates fused: the two
    k x k applications ride ONE stacked (2k, 2k) @ (2k, R) MXU dot
    ([dX; dRm] = [[alpha, 0], [0, -alpha]] @ [P; Z] — the small-dot
    utilization rule, see _mxu_pair) and the next Gram comes from the
    stored Rn. 6 field passes (read P, Z, X, R; write Xn, Rn) — same
    bytes as the separate mm_update + mm_update_gram but one kernel and
    double the dot contraction.

    ``donate=True`` aliases Xn<->X and Rn<->R (both dead in the solver
    bodies; P and Z stay live for the direction update)."""
    interpret = interpret or _env_interpret()
    k, bs, lanes = _field_dims(P)
    R_tile = _require_tile(_pick_tile(k, bs, lanes, 6, _isz(P)),
                           k, bs, lanes)
    nb = lanes // R_tile

    def kernel(a_ref, p_ref, x_ref, z_ref, r_ref, xn_ref, rn_ref, g_ref):
        i = pl.program_id(0)
        a = _f32(a_ref[:, :])
        z2 = jnp.zeros((k, k), jnp.float32)
        wt = jnp.concatenate([
            jnp.concatenate([a, z2], axis=1),
            jnp.concatenate([z2, -a], axis=1),
        ], axis=0)  # (2k, 2k)
        g = None
        for bi in range(max(bs, 1)):
            if bs == 0:
                pz = jnp.concatenate([p_ref[:], z_ref[:]], axis=0)
            else:
                pz = jnp.concatenate([p_ref[:, bi, :], z_ref[:, bi, :]],
                                     axis=0)
            wtx, pzx, prec = _mxu_pair(wt, pz)
            y = jax.lax.dot_general(
                wtx, pzx, (((1,), (0,)), ((), ())), precision=prec,
                preferred_element_type=jnp.float32,
            )
            if bs == 0:
                xn = (_f32(x_ref[:]) + y[:k]).astype(xn_ref.dtype)
                rn = (_f32(r_ref[:]) + y[k:]).astype(rn_ref.dtype)
                xn_ref[:] = xn
                rn_ref[:] = rn
            else:
                xn = (_f32(x_ref[:, bi, :]) + y[:k]).astype(xn_ref.dtype)
                rn = (_f32(r_ref[:, bi, :]) + y[k:]).astype(rn_ref.dtype)
                xn_ref[:, bi, :] = xn
                rn_ref[:, bi, :] = rn
            # Gram on the STORED residual (see mm2_update_gram)
            t = _dot_gram(rn, rn)
            g = t if g is None else g + t

        @pl.when(i == 0)
        def _():
            g_ref[:, :] = g

        @pl.when(i > 0)
        def _():
            g_ref[:, :] += g

    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[_kk_spec((k, k)), _spec(k, bs, R_tile),
                  _spec(k, bs, R_tile), _spec(k, bs, R_tile),
                  _spec(k, bs, R_tile)],
        out_specs=(_spec(k, bs, R_tile), _spec(k, bs, R_tile),
                   _kk_spec((k, k))),
        out_shape=(
            out_struct(X.shape, X.dtype, X),
            out_struct(R.shape, R.dtype, R),
            out_struct((k, k), jnp.float32, X),
        ),
        input_output_aliases={2: 0, 4: 1} if donate else {},
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(alpha, P, X, Z, R)


def xr_update_gram_available(P) -> bool:
    k, bs, lanes = _field_dims(P)
    return _ok(P) and _pick_tile(k, bs, lanes, 6, _isz(P)) is not None


# -------------------------------------------------------------- px_update --


@functools.partial(jax.jit, static_argnames=("interpret", "donate"))
def px_update(
    M1: jax.Array, W: jax.Array, rho: jax.Array, P: jax.Array,
    C: jax.Array, X: jax.Array, *, interpret: bool = False,
    donate: bool = False,
):
    """Pn = M1 @ W + rho @ P ;  Xn = X + C @ P — one pass, no Q write.

    The implicit-Q SBCGrQ iteration tail (see mm2_update_gram): the final
    CholQR transform folds into the search-direction update, so Q is never
    stored — 5 field passes (read W, P, X; write Pn, Xn).

    ``donate=True`` aliases Pn<->P and Xn<->X (both dead in the SBCGrQ body
    after this call): measured on-chip, a Pallas kernel writing a FRESH HBM
    buffer streams at ~330 GB/s aggregate while the same kernel writing the
    buffer it just read streams at ~660 (in-place keeps HBM pages hot;
    CHIP_QUEUE_r3b.log pallas_copy_ALIASED). XLA inserts a copy if the
    caller still uses the donated operand — correct either way."""
    interpret = interpret or _env_interpret()
    k, bs, lanes = _field_dims(W)
    R = _require_tile(_pick_tile(k, bs, lanes, 5, _isz(W)), k, bs, lanes)
    nb = lanes // R

    def kernel(m1_ref, rho_ref, c_ref, w_ref, p_ref, x_ref, pn_ref, xn_ref):
        # Pn's two k x k dots are STACKED into one (k, 2k) @ (2k, R) dot:
        # the MXU contraction dim doubles (k=32 -> 64 of 128 systolic rows),
        # which matters because this kernel is MXU-bound, not HBM-bound —
        # measured 389 GB/s over its 5 passes vs the 558 GB/s explicit
        # chain (profile_tail, CHIP_QUEUE_r3.log). The (2k, R) stack is a
        # VMEM-to-VMEM copy, ~20x cheaper than the MXU time it saves.
        m1rh = jnp.concatenate([_f32(m1_ref[:, :]), _f32(rho_ref[:, :])],
                               axis=1)
        cc = c_ref[:, :]

        def one(w, p, x):
            wp = jnp.concatenate([w, p], axis=0)
            mmh, wpx, prec = _mxu_pair(m1rh, wp)
            pn = jax.lax.dot_general(
                mmh, wpx, (((1,), (0,)), ((), ())), precision=prec,
                preferred_element_type=jnp.float32,
            )
            ccb, pb, prec2 = _mxu_pair(cc, p)
            xn = _f32(x) + jax.lax.dot_general(
                ccb, pb, (((1,), (0,)), ((), ())), precision=prec2,
                preferred_element_type=jnp.float32,
            )
            return pn, xn

        if bs == 0:
            pn, xn = one(w_ref[:], p_ref[:], x_ref[:])
            pn_ref[:] = pn.astype(pn_ref.dtype)
            xn_ref[:] = xn.astype(xn_ref.dtype)
        else:
            for b in range(bs):
                pn, xn = one(w_ref[:, b, :], p_ref[:, b, :], x_ref[:, b, :])
                pn_ref[:, b, :] = pn.astype(pn_ref.dtype)
                xn_ref[:, b, :] = xn.astype(xn_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[_kk_spec((k, k)), _kk_spec((k, k)), _kk_spec((k, k)),
                  _spec(k, bs, R), _spec(k, bs, R), _spec(k, bs, R)],
        out_specs=(_spec(k, bs, R), _spec(k, bs, R)),
        out_shape=(
            out_struct(P.shape, P.dtype, P),
            out_struct(X.shape, X.dtype, X),
        ),
        input_output_aliases={4: 0, 5: 1} if donate else {},
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(M1, rho, C, W, P, X)


def px_update_available(W) -> bool:
    k, bs, lanes = _field_dims(W)
    return _ok(W) and _pick_tile(k, bs, lanes, 5, _isz(W)) is not None


# ------------------------------------------------------------- cheb_step --


@functools.partial(jax.jit, static_argnames=("interpret", "donate"))
def cheb_step(
    R: jax.Array, Z: jax.Array, D: jax.Array, AZ: jax.Array,
    c1, c2, *, interpret: bool = False, donate: bool = False,
):
    """One Chebyshev semi-iteration step, one pass over the fields:

        D' = c1 D + c2 (R - AZ) ;  Z' = Z + D'

    (operators/cheb.py). Reads 4 fields, writes 2 — the jnp composition
    costs ~3 extra HBM passes."""
    interpret = interpret or _env_interpret()
    if R.dtype != jnp.float32:
        raise TypeError(f"cheb_step is f32-only (got {R.dtype}); gate via "
                        "cheb_step_available")
    k, bs, lanes = _field_dims(R)
    R_tile = _require_tile(_pick_tile(k, bs, lanes, 6), k, bs, lanes)
    nb = lanes // R_tile

    def kernel(c_ref, r_ref, z_ref, d_ref, az_ref, zo_ref, do_ref):
        c1v = c_ref[0, 0]
        c2v = c_ref[0, 1]
        if bs == 0:
            dn = c1v * d_ref[:] + c2v * (r_ref[:] - az_ref[:])
            do_ref[:] = dn
            zo_ref[:] = z_ref[:] + dn
        else:
            for b in range(bs):
                dn = c1v * d_ref[:, b, :] + c2v * (r_ref[:, b, :] - az_ref[:, b, :])
                do_ref[:, b, :] = dn
                zo_ref[:, b, :] = z_ref[:, b, :] + dn

    cvec = jnp.stack([jnp.asarray(c1, jnp.float32),
                      jnp.asarray(c2, jnp.float32)]).reshape(1, 2)
    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[_kk_spec((1, 2)), _spec(k, bs, R_tile), _spec(k, bs, R_tile),
                  _spec(k, bs, R_tile), _spec(k, bs, R_tile)],
        out_specs=(_spec(k, bs, R_tile), _spec(k, bs, R_tile)),
        out_shape=(
            out_struct(R.shape, jnp.float32, R),
            out_struct(R.shape, jnp.float32, R),
        ),
        # donate: Z'<->Z and D'<->D (dead each semi-iteration step).
        input_output_aliases={2: 0, 3: 1} if donate else {},
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(cvec, R, Z, D, AZ)


def cheb_step_available(R) -> bool:
    k, bs, lanes = _field_dims(R)
    return (_ok(R) and R.dtype == jnp.float32
            and _pick_tile(k, bs, lanes, 6) is not None)


# ---------------------------------------------------------- qr_p_update --


@functools.partial(jax.jit, static_argnames=("interpret", "donate"))
def qr_p_update(
    M2: jax.Array, Q1: jax.Array, rho: jax.Array, P: jax.Array, *,
    interpret: bool = False, donate: bool = False,
):
    """Q = M2 @ Q1 ;  Pn = Q + rho @ P — fused (reads Q1, P once).
    ``donate`` aliases Q<->Q1 and Pn<->P (both dead in the shifted-block
    SBCGrQ body; in-place HBM writes stream ~2x faster, see px_update)."""
    interpret = interpret or _env_interpret()
    k, bs, lanes = _field_dims(Q1)
    R = _require_tile(_pick_tile(k, bs, lanes, 4, _isz(Q1)), k, bs, lanes)
    nb = lanes // R

    def kernel(m2_ref, q1_ref, rho_ref, p_ref, q_ref, pn_ref):
        # Contraction-stacked like px_update/mm2 (MXU-utilization bound at
        # small k): [q; rh@p] = [[m2, 0], [0, rh]] @ [q1; p], one dot.
        z = jnp.zeros((k, k), jnp.float32)
        wt = jnp.concatenate([
            jnp.concatenate([_f32(m2_ref[:, :]), z], axis=1),
            jnp.concatenate([z, _f32(rho_ref[:, :])], axis=1),
        ], axis=0)

        def one(q1, p):
            qp = jnp.concatenate([q1, p], axis=0)
            wtx, qpx, prec = _mxu_pair(wt, qp)
            y = jax.lax.dot_general(
                wtx, qpx, (((1,), (0,)), ((), ())), precision=prec,
                preferred_element_type=jnp.float32,
            )
            return y[:k], y[:k] + y[k:]

        if bs == 0:
            q, pn = one(q1_ref[:], p_ref[:])
            q_ref[:] = q.astype(q_ref.dtype)
            pn_ref[:] = pn.astype(pn_ref.dtype)
        else:
            for b in range(bs):
                q, pn = one(q1_ref[:, b, :], p_ref[:, b, :])
                q_ref[:, b, :] = q.astype(q_ref.dtype)
                pn_ref[:, b, :] = pn.astype(pn_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[_kk_spec((k, k)), _spec(k, bs, R), _kk_spec((k, k)),
                  _spec(k, bs, R)],
        out_specs=(_spec(k, bs, R), _spec(k, bs, R)),
        out_shape=(
            out_struct(Q1.shape, Q1.dtype, Q1),
            out_struct(P.shape, P.dtype, P),
        ),
        input_output_aliases={1: 0, 3: 1} if donate else {},
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(M2, Q1, rho, P)


def qr_p_update_available(Q1) -> bool:
    k, bs, lanes = _field_dims(Q1)
    return _ok(Q1) and _pick_tile(k, bs, lanes, 4, _isz(Q1)) is not None


# ---------------------------------------------------------- qr_px_update --


@functools.partial(jax.jit, static_argnames=("interpret", "donate"))
def qr_px_update(
    M2: jax.Array, Q1: jax.Array, rho: jax.Array, P: jax.Array,
    C: jax.Array, X: jax.Array, *, interpret: bool = False, donate: bool = False,
):
    """Q = M2 @ Q1 ;  Pn = Q + rho @ P ;  Xn = X + C @ P — one pass.

    The SBCGrQ iteration tail: the final CholQR pass, the search-direction
    update, and the solution update share the P read (6 field passes vs 7
    for qr_p_update + a separate mm_update)."""
    interpret = interpret or _env_interpret()
    k, bs, lanes = _field_dims(Q1)
    R = _require_tile(_pick_tile(k, bs, lanes, 6, _isz(Q1)), k, bs, lanes)
    nb = lanes // R

    def kernel(m2_ref, rho_ref, c_ref, q1_ref, p_ref, x_ref,
               q_ref, pn_ref, xn_ref):
        # All three k x k dots STACKED into one (3k, 2k) @ (2k, R) dot —
        # the kernels are MXU-utilization-bound at small k (a k=32 dot
        # uses 32 of 128 systolic rows; see mm2_update_gram), so doubling
        # the contraction and tripling the output rows is the cheap win:
        #   [q; rh@p; cc@p] = [[m2, 0], [0, rh], [0, cc]] @ [q1; p]
        z = jnp.zeros((k, k), jnp.float32)
        wt = jnp.concatenate([
            jnp.concatenate([_f32(m2_ref[:, :]), z], axis=1),
            jnp.concatenate([z, _f32(rho_ref[:, :])], axis=1),
            jnp.concatenate([z, _f32(c_ref[:, :])], axis=1),
        ], axis=0)  # (3k, 2k)

        def one(q1, p, x):
            qp = jnp.concatenate([q1, p], axis=0)
            wtx, qpx, prec = _mxu_pair(wt, qp)
            y = jax.lax.dot_general(
                wtx, qpx, (((1,), (0,)), ((), ())), precision=prec,
                preferred_element_type=jnp.float32,
            )
            q = y[:k]
            return q, q + y[k:2 * k], _f32(x) + y[2 * k:]

        if bs == 0:
            q, pn, xn = one(q1_ref[:], p_ref[:], x_ref[:])
            q_ref[:] = q.astype(q_ref.dtype)
            pn_ref[:] = pn.astype(pn_ref.dtype)
            xn_ref[:] = xn.astype(xn_ref.dtype)
        else:
            for b in range(bs):
                q, pn, xn = one(q1_ref[:, b, :], p_ref[:, b, :],
                                x_ref[:, b, :])
                q_ref[:, b, :] = q.astype(q_ref.dtype)
                pn_ref[:, b, :] = pn.astype(pn_ref.dtype)
                xn_ref[:, b, :] = xn.astype(xn_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[_kk_spec((k, k)), _kk_spec((k, k)), _kk_spec((k, k)),
                  _spec(k, bs, R), _spec(k, bs, R), _spec(k, bs, R)],
        out_specs=(_spec(k, bs, R), _spec(k, bs, R), _spec(k, bs, R)),
        out_shape=(
            out_struct(Q1.shape, Q1.dtype, Q1),
            out_struct(P.shape, P.dtype, P),
            out_struct(X.shape, X.dtype, X),
        ),
        input_output_aliases={3: 0, 4: 1, 5: 2} if donate else {},
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(M2, rho, C, Q1, P, X)


def qr_px_update_available(Q1) -> bool:
    k, bs, lanes = _field_dims(Q1)
    return _ok(Q1) and _pick_tile(k, bs, lanes, 6, _isz(Q1)) is not None
