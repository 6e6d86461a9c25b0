"""Shared solver primitives (L3), distribution-aware via ``axis_name``.

Design: every reduction over the row dimension n (dot products, Gram
matrices, CholQR) takes an optional ``axis_name``. With ``axis_name=None``
the solver runs single-device. Under ``shard_map`` over a row-sharded mesh
axis, the *same solver code* runs on the local row shard and these helpers
insert ``lax.psum`` — this is the entire distributed story for everything
except the SpMM halo (SURVEY.md §3.4, §4.3: "the n-sized data never moves").

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


def block_dot(U: jax.Array, V: jax.Array, axis_name: str | None = None) -> jax.Array:
    """Gram block ``U^T V`` (k x k), reduced over the (possibly sharded) rows."""
    G = jnp.matmul(U.T, V, precision=HIGHEST, preferred_element_type=U.dtype)
    return psum_if(G, axis_name)


def col_norms2(U: jax.Array, axis_name: str | None = None) -> jax.Array:
    """Squared column norms of an (n, k) block, shape (k,)."""
    s = jnp.sum(U * U, axis=0)
    return psum_if(s, axis_name)


def safe_cholesky(G: jax.Array) -> jax.Array:
    """Cholesky of a k x k SPD Gram with a NaN-triggered jitter fallback.

    Near-converged RHS columns make the Gram nearly singular (SURVEY.md §8
    hard part 4). Both factorizations are computed (k x k — cheap) and the
    jittered one is selected only where the plain one produced NaN.
    """
    L = jnp.linalg.cholesky(G)
    k = G.shape[0]
    eps = jnp.finfo(G.dtype).eps
    jitter = (jnp.trace(G) / k) * eps * 32.0 + jnp.finfo(G.dtype).tiny
    L2 = jnp.linalg.cholesky(G + jitter * jnp.eye(k, dtype=G.dtype))
    bad = jnp.any(jnp.isnan(L))
    return jnp.where(bad, L2, L)


def chol_solve_spd(M: jax.Array, B: jax.Array) -> jax.Array:
    """Solve ``M X = B`` for SPD k x k ``M`` via Cholesky."""
    L = safe_cholesky(M)
    Y = jax.scipy.linalg.solve_triangular(L, B, lower=True)
    return jax.scipy.linalg.solve_triangular(L.T, Y, lower=False)


def chol_inverse_spd(M: jax.Array) -> jax.Array:
    """Explicit inverse of SPD k x k ``M`` (k <= 64: negligible; keeping the
    inverse explicit makes the big (n,k)@(k,k) updates plain MXU matmuls)."""
    return chol_solve_spd(M, jnp.eye(M.shape[0], dtype=M.dtype))


def tri_inverse_upper(R: jax.Array) -> jax.Array:
    """Explicit inverse of upper-triangular k x k ``R``."""
    return jax.scipy.linalg.solve_triangular(
        R, jnp.eye(R.shape[0], dtype=R.dtype), lower=False
    )


def _cholqr_once(V: jax.Array, axis_name: str | None):
    """One CholeskyQR pass with column equilibration.

    Returns (Q, R) with V = Q R, R upper triangular (R includes the
    un-equilibration, so it is triangular x diagonal = triangular).
    """
    nrm2 = col_norms2(V, axis_name)
    d = lax.rsqrt(jnp.maximum(nrm2, jnp.finfo(V.dtype).tiny))
    Vs = V * d[None, :]
    G = block_dot(Vs, Vs, axis_name)
    L = safe_cholesky(G)  # G = L L^T, so R_s = L^T
    Rinv_s = tri_inverse_upper(L.T)
    Q = jnp.matmul(Vs, Rinv_s, precision=HIGHEST, preferred_element_type=V.dtype)
    R = L.T / d[None, :]  # L^T @ diag(1/d): un-equilibrate the columns
    return Q, R


def cholqr(V: jax.Array, passes: int = 2, axis_name: str | None = None):
    """Thin QR of an (n, k) block via CholeskyQR (T-C3, SURVEY.md R4).

    Implements CholeskyQR2 when ``passes=2`` (recommended in f32): the second
    pass restores orthogonality lost to the squared condition number of the
    first Gram. Distribution: the only cross-device ops are the k x k psums
    inside ``block_dot`` / ``col_norms2``.
    """
    Q, R = _cholqr_once(V, axis_name)
    for _ in range(passes - 1):
        Q, R2 = _cholqr_once(Q, axis_name)
        R = jnp.matmul(R2, R, precision=HIGHEST, preferred_element_type=R.dtype)
    return Q, R
