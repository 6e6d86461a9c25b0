"""Gauged (site-dependent link) Dirac flavor — exercises the general
per-site block path with a genuinely non-translation-invariant operator."""

import numpy as np
import pytest
import jax.numpy as jnp

import blockcg_tpu as bc
from blockcg_tpu.problems import dirac_gauged
from blockcg_tpu.problems.dirac import bdia_scipy


@pytest.mark.parametrize("dtype,tol", [(jnp.float64, 1e-12),
                                       (jnp.complex128, 1e-12)])
def test_gauged_hermitian_pd(dtype, tol):
    a = bdia_scipy(dirac_gauged(3, m=0.5, dtype=dtype)).toarray()
    assert np.abs(a - a.conj().T).max() < tol
    assert np.linalg.eigvalsh(a).min() >= 0.25 - 1e-9


def test_gauged_differs_from_constant():
    from blockcg_tpu.problems import dirac_bdia

    ag = bdia_scipy(dirac_gauged(3, m=0.5, dtype=jnp.float64))
    ac = bdia_scipy(dirac_bdia(3, m=0.5, dtype=jnp.float64))
    assert abs(ag - ac).max() > 0.1  # links actually vary


def test_gauged_apply_matches_scipy_f32():
    op = dirac_gauged(4, m=0.5, dtype=jnp.float32)
    a = bdia_scipy(op)
    rng = np.random.default_rng(0)
    X = rng.standard_normal((op.n, 5)).astype(np.float32)
    got = np.asarray(op.matmat_t(jnp.asarray(X.T))).T
    want = a @ X
    assert np.abs(got - want).max() / np.abs(want).max() < 1e-5


def test_gauged_solve():
    op = dirac_gauged(4, m=0.5, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    B = jnp.asarray(rng.standard_normal((op.n, 4)), dtype=jnp.float32)
    X, info = bc.solve_sbcgrq(op, B, tol=1e-5, max_iter=300)
    a = bdia_scipy(op)
    R = np.asarray(B, np.float64) - a @ np.asarray(X, np.float64)
    rel = (np.linalg.norm(R, axis=0)
           / np.linalg.norm(np.asarray(B, np.float64), axis=0)).max()
    assert rel < 1e-4


def test_gauged_complex_realified_solve():
    """U(1)-gauged complex Hermitian through the realified real path."""
    from blockcg_tpu.operators import realify

    op = dirac_gauged(3, m=0.5, dtype=jnp.complex64)
    rop = realify(op)
    rng = np.random.default_rng(2)
    B = (rng.standard_normal((op.n, 3))
         + 1j * rng.standard_normal((op.n, 3))).astype(np.complex64)
    X, info = bc.solve_sbcgrq(rop, B, tol=1e-5, max_iter=300)
    a = bdia_scipy(op)
    R = B.astype(np.complex128) - a @ np.asarray(X, np.complex128)
    rel = (np.linalg.norm(R, axis=0) / np.linalg.norm(B, axis=0)).max()
    assert rel < 1e-4


def test_gauged_bf16_blocks():
    """bf16-stored blocks (memory option): ~4e-4 operator rounding."""
    from blockcg_tpu.operators.base import astype

    op = dirac_gauged(4, m=0.5, dtype=jnp.float32)
    op16 = astype(op, jnp.bfloat16)
    assert op16.blocks.dtype == jnp.bfloat16
    rng = np.random.default_rng(5)
    X = rng.standard_normal((op.n, 4)).astype(np.float32)
    y32 = np.asarray(op.matmat_t(jnp.asarray(X.T)))
    y16 = np.asarray(op16.matmat_t(jnp.asarray(X.T)))
    rel = np.abs(y16 - y32).max() / np.abs(y32).max()
    assert rel < 5e-3
    assert rel > 0  # genuinely stored at lower precision
