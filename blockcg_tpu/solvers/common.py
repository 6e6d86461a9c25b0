"""Shared solver primitives (L3), distribution-aware via ``axis_name``.

Layout: the hot internal convention is **lanes-major** — an (n, k) block V is
carried as ``Vt = V^T`` of shape (k, n), so the large row dimension sits on
the TPU's 128-lane minor axis (required by the Pallas kernels' VMEM
windowing; see operators/base.py). All helpers here speak (k, n); public
(n, k) wrappers are provided for the API/tests.

Distribution: every reduction over the row dimension n takes an optional
``axis_name``. With ``axis_name=None`` the solver runs single-device. Under
``shard_map`` over a row-sharded mesh axis, the *same solver code* runs on
the local row shard and these helpers insert ``lax.psum`` — this is the
entire distributed story for everything except the SpMM halo (SURVEY.md
§3.4, §4.3: "the n-sized data never moves").

k x k algebra (Cholesky, triangular solves) is replicated on every device —
k <= 64, negligible (SURVEY.md R3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

HIGHEST = lax.Precision.HIGHEST


def psum_if(x, axis_name: str | None):
    return x if axis_name is None else lax.psum(x, axis_name)


def acc_dtype(dt):
    """Accumulation dtype for a field dtype: bf16 fields accumulate in f32
    (the MXU's native bf16-in/f32-out contract); everything else keeps its
    own dtype. k x k solver algebra (Grams, alpha/rho/S) always lives in
    the accumulation dtype — only the large (k, n) fields are stored bf16."""
    return jnp.float32 if dt == jnp.bfloat16 else dt


# Field-algebra codec shims (operators/base.py): a codec is any operator
# exposing coeff_expand / gram_contract / norms2_contract. ``codec=None``
# means flat fields (identity). Contractions run BEFORE psum (k x k rides
# the wire, not m x m); expansions are k x k -> m x m kroneckers (tiny).


def _ce(codec, C):
    return C if codec is None else codec.coeff_expand(C)


def _gc(codec, G):
    return G if codec is None else codec.gram_contract(G)


def _nc(codec, v):
    return v if codec is None else codec.norms2_contract(v)


def mm(a, b):
    """Small k x k times field matmul at full f32 precision (MXU, 6-pass).

    ``b`` is any lanes-major field ``(k, ...)`` — flat (k, n) or the block
    operators' native (k, bs, ns) view (kept 3D end-to-end: reshaping the
    lane dim at an XLA boundary is a physical relayout copy of the block)."""
    return jnp.tensordot(
        a, b, axes=(1, 0), precision=HIGHEST, preferred_element_type=a.dtype
    )


def _field_dims(Ut: jax.Array) -> tuple[int, ...]:
    return tuple(range(1, Ut.ndim))


def gram_t(Ut: jax.Array, Vt: jax.Array, axis_name: str | None = None,
           codec=None) -> jax.Array:
    """Gram block ``U^H V`` (k x k) from lanes-major fields (k, ...).

    Conjugate-correct: for complex Hermitian systems this is the sesquilinear
    Gram; ``jnp.conj`` is a no-op on real dtypes."""
    dims = _field_dims(Ut)
    G = lax.dot_general(
        jnp.conj(Ut), Vt, ((dims, dims), ((), ())), precision=HIGHEST,
        preferred_element_type=acc_dtype(Ut.dtype),
    )
    return psum_if(_gc(codec, G), axis_name)


def vdot_real(u, v, axis_name: str | None = None):
    """Conjugating inner product, real part — exact for the CG-family
    quantities r^H r and p^H A p, which are real for Hermitian A.
    bf16 fields reduce in f32 (the bf16-tier accumulation rule; a bf16
    jnp.vdot both loses the norm and leaks bf16 scalars into while_loop
    carries — the bf16 CG preset crash, CHIP_QUEUE_r3.log)."""
    adt = acc_dtype(u.dtype)
    return psum_if(jnp.real(jnp.vdot(u.astype(adt), v.astype(adt))),
                   axis_name)


def row_norms2_t(Ut: jax.Array, axis_name: str | None = None,
                 codec=None) -> jax.Array:
    """Squared column norms of U (real), from a field (k, ...) -> (k,)."""
    U = Ut.astype(acc_dtype(Ut.dtype))  # bf16 squares/sums lose the norm
    s = jnp.sum(jnp.real(U * jnp.conj(U)), axis=_field_dims(Ut))
    return psum_if(_nc(codec, s), axis_name)


def safe_cholesky(G: jax.Array) -> jax.Array:
    """Cholesky of a k x k SPD Gram with a NaN-triggered jitter fallback.

    Near-converged RHS columns make the Gram nearly singular (SURVEY.md §8
    hard part 4). Both factorizations are computed (k x k — cheap) and the
    jittered one is selected only where the plain one produced NaN.
    """
    L = jnp.linalg.cholesky(G)
    k = G.shape[0]
    eps = jnp.finfo(G.dtype).eps
    jitter = (jnp.real(jnp.trace(G)) / k) * eps * 32.0 + jnp.finfo(
        jnp.real(G).dtype
    ).tiny
    L2 = jnp.linalg.cholesky(G + jitter * jnp.eye(k, dtype=G.dtype))
    bad = jnp.any(jnp.isnan(L))
    return jnp.where(bad, L2, L)


def chol_solve_spd(M: jax.Array, B: jax.Array) -> jax.Array:
    """Solve ``M X = B`` for SPD k x k ``M`` via Cholesky."""
    L = safe_cholesky(M)
    Y = jax.scipy.linalg.solve_triangular(L, B, lower=True)
    return jax.scipy.linalg.solve_triangular(L.conj().T, Y, lower=False)


def chol_inverse_spd(M: jax.Array) -> jax.Array:
    """Explicit inverse of SPD k x k ``M`` (k <= 64: negligible; keeping the
    inverse explicit makes the big (k,k)@(k,n) updates plain MXU matmuls)."""
    return chol_solve_spd(M, jnp.eye(M.shape[0], dtype=M.dtype))


def tri_inverse_upper(R: jax.Array) -> jax.Array:
    """Explicit inverse of upper-triangular k x k ``R``."""
    return jax.scipy.linalg.solve_triangular(
        R, jnp.eye(R.shape[0], dtype=R.dtype), lower=False
    )


def _cholqr_once_t(Vt: jax.Array, axis_name: str | None):
    """One CholeskyQR pass with column equilibration, lanes-major.

    Math: V = Q R (R upper triangular). Lanes-major: Vt = R^T Qt, returns
    (Qt, R). R includes the un-equilibration (triangular x diagonal).
    """
    nrm2 = row_norms2_t(Vt, axis_name)
    d = lax.rsqrt(jnp.maximum(nrm2, jnp.finfo(nrm2.dtype).tiny)).astype(
        acc_dtype(jnp.real(Vt).dtype)
    )
    Vs = (Vt.astype(d.dtype) if jnp.isrealobj(Vt) else Vt) * d.reshape(
        d.shape + (1,) * (Vt.ndim - 1))
    G = gram_t(Vs, Vs, axis_name)
    L = safe_cholesky(G)  # G = L L^H, so R_s = L^H
    Rinv_s = tri_inverse_upper(L.conj().T)
    # Q = Vs R_s^{-1}  ->  Qt = R_s^{-T} Vs_t = Rinv_s^T @ Vs
    Qt = mm(Rinv_s.T, Vs).astype(Vt.dtype)
    R = L.conj().T / d[None, :]  # R_s @ diag(1/d): un-equilibrate the columns
    return Qt, R


def cholqr_t(Vt: jax.Array, passes: int = 2, axis_name: str | None = None):
    """Thin QR via CholeskyQR (T-C3, reference R4 equivalent), lanes-major.

    CholeskyQR2 when ``passes=2`` (recommended in f32): the second pass
    restores orthogonality lost to the squared condition number of the first
    Gram. Distribution: the only cross-device ops are the k x k psums inside
    ``gram_t`` / ``row_norms2_t``.
    """
    Qt, R = _cholqr_once_t(Vt, axis_name)
    for _ in range(passes - 1):
        Qt, R2 = _cholqr_once_t(Qt, axis_name)
        R = mm(R2, R)
    return Qt, R


# ------------------------------------------------ fused-kernel dispatch ----
#
# One-HBM-pass Pallas kernels for the per-iteration block updates (T-K2,
# ops/fused.py); these wrappers fall back to the jnp composition on CPU /
# f64 / shapes the kernels don't tile. ``axis_name`` psums ride on the tiny
# k x k results, outside the kernels.


def f_gram(Ut, Vt, axis_name: str | None = None, codec=None):
    from blockcg_tpu.ops import fused

    if fused.gram_available(Ut):
        return psum_if(_gc(codec, fused.gram(Ut, Vt)), axis_name)
    return gram_t(Ut, Vt, axis_name, codec)


def _donate_ok() -> bool:
    """BLOCKCG_NO_DONATE=1 disables in-place kernel output aliasing — the
    capacity-debugging valve: donation changes XLA buffer assignment, and
    at HBM-limit sizes an inserted satisfying copy can tip a 12 GB
    composition over 16 GB."""
    import os

    return not os.environ.get("BLOCKCG_NO_DONATE")


def f_mm_update(M, Bt, At=None, codec=None, donate: str | None = None):
    """M @ B (+ A) in one pass (M expanded to internal rows via codec).
    ``donate`` aliases the output onto the named dead operand ('a'/'b')."""
    from blockcg_tpu.ops import fused

    M = _ce(codec, M)
    if fused.mm_update_available(Bt, At is not None):
        return fused.mm_update(M, Bt, At,
                               donate=donate if _donate_ok() else None)
    Y = mm(M, Bt)
    Y = Y if At is None else Y + At
    return Y.astype(Bt.dtype)  # bf16 fields: compute f32, store bf16


def f_mm_update_gram(M, Bt, At=None, axis_name: str | None = None,
                     codec=None, donate: bool = False):
    """(Y = M @ B (+ A), G = Y Y^T) in one pass (codec-aware).
    ``donate`` aliases Y onto B when B is dead at the call site (in-place
    HBM writes stream ~2x faster — ops/fused.py px_update docstring)."""
    from blockcg_tpu.ops import fused

    M = _ce(codec, M)
    if fused.mm_update_available(Bt, At is not None):
        Y, G = fused.mm_update_gram(M, Bt, At,
                                    donate=donate and _donate_ok())
        return Y, psum_if(_gc(codec, G), axis_name)
    Y = mm(M, Bt)
    if At is not None:
        Y = Y + At
    Y = Y.astype(Bt.dtype)
    return Y, gram_t(Y, Y, axis_name, codec)


def f_mm2_update_gram(M1, B1t, M2, B2t, axis_name: str | None = None,
                      codec=None, donate: bool = False):
    """(Y = M1 @ B1 + M2 @ B2, G = Y Y^T) in one pass (codec-aware).

    The implicit-Q residual-direction update: V = Q - Z alpha with
    Q = M_qr @ W never materialized (ops/fused.py mm2_update_gram).
    ``donate`` aliases Y onto B1 when B1 is dead at the call site."""
    from blockcg_tpu.ops import fused

    M1, M2 = _ce(codec, M1), _ce(codec, M2)
    if fused.mm2_update_gram_available(B1t):
        Y, G = fused.mm2_update_gram(M1, B1t, M2, B2t,
                                     donate=donate and _donate_ok())
        return Y, psum_if(_gc(codec, G), axis_name)
    Y = (mm(M1, B1t) + mm(M2, B2t)).astype(B1t.dtype)
    return Y, gram_t(Y, Y, axis_name, codec)


def f_xr_update_gram(alpha, Pt, Xt, Zt, Rt, axis_name: str | None = None,
                     codec=None, donate: bool = False):
    """(Xn = X + alpha @ P, Rn = R - alpha @ Z, S' = Rn Rn^T) in one pass
    (codec-aware) — the BCG/BCGA solution+residual updates fused into one
    stacked-dot kernel (ops/fused.py xr_update_gram). ``donate`` aliases
    Xn<->X and Rn<->R (both dead in the solver bodies)."""
    from blockcg_tpu.ops import fused

    A = _ce(codec, alpha)
    if fused.xr_update_gram_available(Pt):
        Xn, Rn, S = fused.xr_update_gram(A, Pt, Xt, Zt, Rt,
                                         donate=donate and _donate_ok())
        return Xn, Rn, psum_if(_gc(codec, S), axis_name)
    Xn = (Xt + mm(A, Pt)).astype(Xt.dtype)
    Rn = (Rt - mm(A, Zt)).astype(Rt.dtype)
    return Xn, Rn, gram_t(Rn, Rn, axis_name, codec)


def f_px_update(M1, Wt, rho, Pt, C, Xt, codec=None, donate: bool = False):
    """(Pn = M1 @ W + rho @ P, Xn = X + C @ P) in one pass — the implicit-Q
    SBCGrQ iteration tail (no Q write; ops/fused.py px_update). ``donate``
    aliases Pn<->P and Xn<->X when both are dead at the call site."""
    from blockcg_tpu.ops import fused

    M1, rho, C = _ce(codec, M1), _ce(codec, rho), _ce(codec, C)
    if fused.px_update_available(Wt):
        return fused.px_update(M1, Wt, rho, Pt, C, Xt,
                               donate=donate and _donate_ok())
    Pn = (mm(M1, Wt) + mm(rho, Pt)).astype(Pt.dtype)
    return Pn, (Xt + mm(C, Pt)).astype(Xt.dtype)


def f_qr_p_update(M2, Q1t, rho, Pt, codec=None, donate: bool = False):
    """(Q = M2 @ Q1, Pn = Q + rho @ P) in one pass (codec-aware).
    ``donate`` aliases Q<->Q1 and Pn<->P when both are dead."""
    from blockcg_tpu.ops import fused

    M2, rho = _ce(codec, M2), _ce(codec, rho)
    if fused.qr_p_update_available(Q1t):
        return fused.qr_p_update(M2, Q1t, rho, Pt,
                                 donate=donate and _donate_ok())
    Qt = mm(M2, Q1t)
    return Qt.astype(Q1t.dtype), (Qt + mm(rho, Pt)).astype(Pt.dtype)


def f_qr_px_update(M2, Q1t, rho, Pt, C, Xt, codec=None,
                   donate: bool = False):
    """(Q = M2 @ Q1, Pn = Q + rho @ P, Xn = X + C @ P) in one pass —
    the fused SBCGrQ iteration tail (reads P once for both updates).
    ``donate`` aliases Q<->Q1, Pn<->P, Xn<->X when all are dead."""
    from blockcg_tpu.ops import fused

    M2, rho, C = _ce(codec, M2), _ce(codec, rho), _ce(codec, C)
    if fused.qr_px_update_available(Q1t):
        return fused.qr_px_update(M2, Q1t, rho, Pt, C, Xt,
                                  donate=donate and _donate_ok())
    Qt = mm(M2, Q1t)
    return (Qt.astype(Q1t.dtype), (Qt + mm(rho, Pt)).astype(Pt.dtype),
            (Xt + mm(C, Pt)).astype(Xt.dtype))


def f_matmat_gram(op, Xt, axis_name: str | None = None):
    """(Z = A X, M = X^H Z) with the Gram fused into the operator apply when
    the operator supports it (stencil kernels emit the k x k from the tiles
    already in VMEM — saves the 2-field-pass separate Gram)."""
    Zt, Mloc = op.matmat_gram_t(Xt)
    if Mloc is None:
        return Zt, f_gram(Xt, Zt, axis_name, codec=op)
    return Zt, psum_if(Mloc, axis_name)


def kk_mm(a, b):
    """Tiny k x k @ k x k product at full precision."""
    return jnp.matmul(a, b, precision=HIGHEST, preferred_element_type=a.dtype)


def qr_factors_from_gram(G, want_cond: bool = False):
    """One equilibrated CholeskyQR pass from a precomputed Gram ``G = V V^T``
    (lanes-major): returns (M1, R1) with ``Q = M1 @ V`` and ``V = Q R1``.

    The equilibration norms are ``diag(G)`` — no separate norm pass. Same
    math as ``_cholqr_once_t`` (which recomputes the Gram from V).

    ``want_cond`` additionally returns the 1-norm condition estimate
    ``kappa_1(G1) = ||G1||_1 ||G1^{-1}||_1`` of the EQUILIBRATED Gram — the
    quantity that bounds one-pass CholeskyQR's orthogonality loss
    (~eps * kappa_1). All k x k work: G1^{-1} = Rinv Rinv^H from the factor
    already in hand."""
    dg = jnp.real(jnp.diagonal(G))
    d = lax.rsqrt(jnp.maximum(dg, jnp.finfo(dg.dtype).tiny))
    G1 = G * d[:, None] * d[None, :]
    L = safe_cholesky(G1)
    Rinv_s = tri_inverse_upper(L.conj().T)
    M1 = Rinv_s.T * d[None, :]
    R1 = L.conj().T / d[None, :]
    if want_cond:
        G1inv = kk_mm(Rinv_s, Rinv_s.conj().T)
        cond1 = (jnp.max(jnp.sum(jnp.abs(G1), axis=0))
                 * jnp.max(jnp.sum(jnp.abs(G1inv), axis=0)))
        return M1, R1, cond1
    return M1, R1


def qr_gram_refine(M1, R1, G):
    """k x k-only second CholeskyQR pass, computed FROM THE GRAM (zero field
    passes): ``H = M1 G M1^H`` is Q1^H Q1 as implied by G; factoring H and
    folding it into the transform repairs the FACTORIZATION error of an
    ill-conditioned or jitter-repaired first pass — the mechanism that makes
    one-pass CholeskyQR of a (near-)rank-deficient block blow up. It cannot
    see the field-level rounding of the Gram accumulation itself; the
    kappa-triggered residual replacement (solvers/sbcgrq.py) covers that."""
    # Lanes-major transform: Q1 = V M1^T (column world), so
    # Q1^H Q1 = conj(M1) G M1^T — NOT M1 G M1^H (differs for complex G).
    H = kk_mm(jnp.conj(M1), kk_mm(G, M1.T))
    H = 0.5 * (H + H.conj().T)
    M2, R2 = qr_factors_from_gram(H)
    return kk_mm(M2, M1), kk_mm(R2, R1)


def qr_ortho_err(M, G):
    """k x k-side orthogonality estimate of the transform M against the
    Gram G of the field it will be applied to: ``H = conj(M) G M^T`` is
    Q^H Q as implied by G, and ``max|H - I|`` tracks the TRUE field-level
    ``||Q^H Q - I||_max`` to the digit (measured: 0.976 vs 0.974 on a
    numerically rank-deficient block; 2.4e-7 on a healthy one). Costs only
    k x k work — the breakdown detector for blocks CholeskyQR cannot
    repair (kappa^2(V) >> 1/eps: near-duplicate RHS columns)."""
    H = kk_mm(jnp.conj(M), kk_mm(G, M.T))
    k = H.shape[0]
    return jnp.max(jnp.abs(H - jnp.eye(k, dtype=H.dtype)))


def qr_passes_from_gram(G, Wt, passes: int, axis_name: str | None = None,
                        codec=None, want_cond: bool = False,
                        want_ortho: bool = False):
    """Run CholeskyQR passes given a precomputed Gram, DEFERRING the final
    orthonormalization so the caller can fuse it (with the P update in
    SBCGrQ, or a plain f_mm_update). Returns (M_last, W_last, rho): apply
    ``mm(M_last, W_last)``-style to finish; ``rho`` is the accumulated R
    factor (V = Q rho). Shared by the SBCGrQ/BCGdQ/shifted-block bodies.
    ``want_cond`` appends the first pass's kappa_1(G1) estimate.

    ``passes=1`` is ADAPTIVE, the TPU default: the k x k Gram-side
    refinement (``qr_gram_refine``, zero field passes) always runs, and a
    REAL second field pass is taken under ``lax.cond`` only when
    kappa_1(G1) exceeds ``0.5 / sqrt(eps)`` — beyond that the Gram-side
    triple product cancels below working precision (the kappa^2 limit of
    CholeskyQR) and only a recomputed field Gram can repair the basis
    (exact rank deficiency: duplicate/zero RHS columns). The predicate is
    replicated across devices (G is post-psum), so under shard_map every
    device takes the same branch."""
    if passes == 1:
        Mi, Ri, cond1 = qr_factors_from_gram(G, want_cond=True)
        rdtype = jnp.real(jnp.empty((), G.dtype)).dtype
        kappa_crit = 0.5 / jnp.sqrt(jnp.finfo(rdtype).eps)

        def two_pass(args):
            Mi, Ri, Wt = args
            Wt2, G2 = f_mm_update_gram(Mi, Wt, None, axis_name, codec,
                                       donate=True)
            Mi2, Ri2 = qr_factors_from_gram(G2)
            oe = qr_ortho_err(Mi2, G2) if want_ortho else None
            return (Mi2, Wt2, kk_mm(Ri2, Ri)) + ((oe,) if want_ortho else ())

        def refine_only(args):
            Mi, Ri, Wt = args
            Mi, Ri = qr_gram_refine(Mi, Ri, G)
            oe = qr_ortho_err(Mi, G) if want_ortho else None
            return (Mi, Wt, Ri) + ((oe,) if want_ortho else ())

        out = lax.cond(
            cond1 > kappa_crit, two_pass, refine_only, (Mi, Ri, Wt)
        )
        Mi, Wt, rho = out[:3]
        extras = ()
        if want_cond:
            extras += (cond1,)
        if want_ortho:
            extras += (out[3],)
        return (Mi, Wt, rho) + extras if extras else (Mi, Wt, rho)

    rho = None
    Mi = None
    cond1 = None
    for p in range(passes):
        if p == 0 and want_cond:
            Mi, Ri, cond1 = qr_factors_from_gram(G, want_cond=True)
        else:
            Mi, Ri = qr_factors_from_gram(G)
        rho = Ri if rho is None else kk_mm(Ri, rho)
        if p < passes - 1:
            Wt, G = f_mm_update_gram(Mi, Wt, None, axis_name, codec,
                                     donate=True)
    extras = ()
    if want_cond:
        extras += (cond1,)
    if want_ortho:
        extras += (qr_ortho_err(Mi, G),)
    return (Mi, Wt, rho) + extras if extras else (Mi, Wt, rho)


def residual_rebase(S, Sn):
    """Unitary change of basis between a drifted and a freshly recomputed
    residual factorization: ``R = Qn Sn = (Qn U^H)(U Sn)`` with
    ``U = Q^H Qn = S Sn^{-1}`` (both Q's orthonormal, same span => U
    unitary). Re-expressing the fresh pair in the OLD basis keeps the
    solver's ``P^T Q = I`` invariant intact through a residual replacement —
    replacing (Q, S) by the raw fresh pair rotates the basis under P and
    diverges (measured: config-3 replace_every=10 blew up to relres ~1e3).

    All k x k: one triangular solve. Regularized so exactly-zero residual
    columns (converged RHS, deflation padding) map through the identity."""
    rdt = jnp.real(jnp.empty((), S.dtype)).dtype
    d = (jnp.finfo(rdt).eps * jnp.max(jnp.abs(jnp.diagonal(Sn)))
         + jnp.finfo(rdt).tiny).astype(S.dtype)
    E = d * jnp.eye(S.shape[0], dtype=S.dtype)
    # U (Sn + dI) = (S + dI); Sn upper triangular with positive diagonal.
    Ut = jax.scipy.linalg.solve_triangular(
        (Sn + E).T, (S + E).T, lower=True
    )
    return Ut.T


def cholqr_fused_t(Vt, passes: int = 2, axis_name: str | None = None,
                   Gv=None, codec=None):
    """Thin QR via CholeskyQR(2) built on the fused one-pass kernels.

    Optionally takes a precomputed ``Gv = V V^T`` (e.g. from the fused
    residual-direction update), saving the initial Gram pass entirely.
    Returns (Qt, R): V = Q R. Used by the hot SBCGrQ loop; the standalone
    ``cholqr_t`` remains for generic callers."""
    if passes < 1:
        raise ValueError("passes must be >= 1")
    G = f_gram(Vt, Vt, axis_name, codec) if Gv is None else Gv
    Mi, Wt, rho = qr_passes_from_gram(G, Vt, passes, axis_name, codec)
    return f_mm_update(Mi, Wt, codec=codec), rho


# ------------------------------------------------------ (n, k) wrappers ----


def block_dot(U, V, axis_name: str | None = None):
    return gram_t(U.T, V.T, axis_name)


def col_norms2(U, axis_name: str | None = None):
    return row_norms2_t(U.T, axis_name)


def cholqr(V, passes: int = 2, axis_name: str | None = None):
    """Thin QR of an (n, k) block: V = Q R. Public wrapper over cholqr_t."""
    Qt, R = cholqr_t(V.T, passes=passes, axis_name=axis_name)
    return Qt.T, R
