"""Automatic operator-format selection (operators/auto.py)."""

import numpy as np
import jax.numpy as jnp

from blockcg_tpu import solve_sbcgrq
from blockcg_tpu.operators import (
    CSROperator,
    DIAOperator,
    ELLOperator,
    TiledOperator,
    from_scipy_auto,
)
from blockcg_tpu.problems import (
    delaunay_laplacian,
    laplacian_scipy,
    random_block,
    uniform_random_spd,
)


def test_auto_picks_dia_for_stencil():
    a = laplacian_scipy((24, 24))
    op = from_scipy_auto(a, dtype=jnp.float64)
    assert isinstance(op, DIAOperator)
    X = random_block(a.shape[0], 3, seed=0)
    np.testing.assert_allclose(
        np.asarray(op.matmat(jnp.asarray(X))), a @ X, rtol=1e-12, atol=1e-12
    )


def test_auto_picks_rcm_tiled_for_mesh():
    a = delaunay_laplacian(3000, seed=1)
    op = from_scipy_auto(a, dtype=jnp.float64)
    assert isinstance(op, TiledOperator)
    assert getattr(op, "_perm", None) is not None  # RCM applied


def test_auto_picks_gather_for_expander():
    a = uniform_random_spd(4096, degree=8.0, seed=2)
    op = from_scipy_auto(a, dtype=jnp.float64)
    assert isinstance(op, (ELLOperator, CSROperator))


def test_auto_format_agnostic_solve():
    """The documented generic pattern works for every auto choice,
    including the permuted-order tiled case."""
    for a in (laplacian_scipy((16, 16)), delaunay_laplacian(1500, seed=3),
              uniform_random_spd(1024, degree=6.0, seed=4)):
        op = from_scipy_auto(a, dtype=jnp.float64)
        n = a.shape[0]
        B = random_block(n, 4, seed=5)
        Bi = op.to_solver_order(jnp.asarray(B))
        X, info = solve_sbcgrq(op, Bi, tol=1e-9, max_iter=2000)
        assert bool(info.converged.all())
        Xo = np.asarray(op.from_solver_order(X))[:n]
        res = np.linalg.norm(a @ Xo - B, axis=0) / np.linalg.norm(B, axis=0)
        assert res.max() <= 1e-8, type(op).__name__
