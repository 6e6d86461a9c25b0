"""Chebyshev-preconditioned SBCGrQ tests (operators/cheb.py, solvers/poly.py)."""

import numpy as np
import jax.numpy as jnp

import blockcg_tpu as bc
from blockcg_tpu.operators.cheb import ChebyshevOperator, estimate_spectrum
from blockcg_tpu.problems import laplacian_dia, laplacian_scipy
from blockcg_tpu.ops import fused


def test_estimate_spectrum_laplacian():
    op = laplacian_dia((32, 32), dtype=jnp.float32)
    lo, hi = estimate_spectrum(op)
    a = laplacian_scipy((32, 32)).toarray()
    ev = np.linalg.eigvalsh(a)
    assert float(hi) >= ev[-1] * 0.999  # hi must BOUND the spectrum
    assert float(hi) <= ev[-1] * 1.2
    # lo may overestimate lambda_min (slow flipped-power convergence) — that
    # is safe: p(t)t = 1 - q(t) > 0 for every t > 0 because q(0) = 1 and q
    # decreases, so M A stays PD and CG handles the sub-lo modes.
    assert 0 < float(lo) < float(hi)


def test_cheb_operator_spd_and_commutes():
    """M A must be symmetric positive definite (M = p(A) commutes with A)."""
    op = laplacian_dia((16, 16), dtype=jnp.float64)
    lo, hi = estimate_spectrum(op)
    pop = ChebyshevOperator(base=op, lo=lo, hi=hi, degree=3)
    n = op.n
    E = jnp.eye(n, dtype=jnp.float64)
    MA = np.asarray(pop.matmat_t(E.T)).T  # dense MA
    assert np.abs(MA - MA.T).max() < 1e-10
    assert np.linalg.eigvalsh(MA).min() > 0


def test_cheb_step_kernel_interpret():
    rng = np.random.default_rng(0)
    shp = (8, 1024)
    R, Z, D, AZ = (jnp.asarray(rng.standard_normal(shp), jnp.float32)
                   for _ in range(4))
    c1, c2 = 0.37, -1.21
    Zo, Do = fused.cheb_step(R, Z, D, AZ, c1, c2, interpret=True)
    Dn = c1 * np.asarray(D) + c2 * (np.asarray(R) - np.asarray(AZ))
    np.testing.assert_allclose(np.asarray(Do), Dn, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(Zo), np.asarray(Z) + Dn,
                               rtol=1e-6, atol=1e-6)


def test_cheb_solve_matches_direct_and_cuts_iterations():
    op = laplacian_dia((64, 64), dtype=jnp.float32)
    rng = np.random.default_rng(1)
    B = jnp.asarray(rng.standard_normal((op.n, 8)), dtype=jnp.float32)
    X, info = bc.solve_sbcgrq_cheb(op, B, degree=4, tol=1e-6, max_iter=500)
    a = laplacian_scipy((64, 64))
    R = np.asarray(B, np.float64) - a @ np.asarray(X, np.float64)
    rel = (np.linalg.norm(R, axis=0)
           / np.linalg.norm(np.asarray(B, np.float64), axis=0)).max()
    assert rel < 1e-6 * 1.1
    assert bool(info.converged.all())
    _, plain = bc.solve_sbcgrq(op, B, tol=1e-6, max_iter=500)
    # Iterations drop substantially (the chain cost amortizes over the
    # polynomial degree); block deflation of sub-lo modes keeps the
    # overestimated lo effective — see solvers/poly.py.
    assert int(info.iterations) < int(plain.iterations) * 0.65
