"""Fused per-iteration kernel tests (T-K2, ops/fused.py) — interpret mode."""

import numpy as np
import pytest
import jax.numpy as jnp

from blockcg_tpu.ops import fused
from blockcg_tpu.solvers.common import (
    cholqr_fused_t,
    cholqr_t,
    qr_factors_from_gram,
    gram_t,
)


def _field(shape, seed):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal(shape), dtype=jnp.float32)


def _kk(k, seed):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((k, k)), dtype=jnp.float32)


@pytest.mark.parametrize("shape", [(8, 1024), (6, 4, 512), (12, 4, 256)])
def test_gram(shape):
    U, V = _field(shape, 0), _field(shape, 1)
    G = fused.gram(U, V, interpret=True)
    k = shape[0]
    want = np.asarray(U, np.float64).reshape(k, -1) @ np.asarray(
        V, np.float64).reshape(k, -1).T
    np.testing.assert_allclose(np.asarray(G), want, rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("shape", [(8, 1024), (6, 4, 512)])
def test_gram_seeded(shape):
    """Additive (k, k) seed input — the bandwidth calibrator's loop-carry
    hook (bench.py calibrate_bw: a real in-kernel data dependence is the
    only reliable anti-hoisting device for timing loops)."""
    U, V = _field(shape, 0), _field(shape, 1)
    k = shape[0]
    S = _kk(k, 7)
    G = fused.gram(U, V, S, interpret=True)
    want = np.asarray(S, np.float64) + np.asarray(
        U, np.float64).reshape(k, -1) @ np.asarray(
        V, np.float64).reshape(k, -1).T
    np.testing.assert_allclose(np.asarray(G), want, rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("shape", [(8, 1024), (6, 4, 512)])
def test_donated_kernels_match_undonated(shape):
    """input_output_aliases (the in-place HBM-write fast path) must be
    semantics-free: donated and fresh-output runs agree bitwise in
    interpret mode."""
    k = shape[0]
    M1, rho, C = _kk(k, 10), _kk(k, 11), _kk(k, 12)
    W, P, X = _field(shape, 13), _field(shape, 14), _field(shape, 15)
    a = fused.px_update(M1, W, rho, P, C, X, interpret=True)
    b = fused.px_update(M1, W, rho, P, C, X, interpret=True, donate=True)
    for u, v in zip(a, b):
        np.testing.assert_array_equal(np.asarray(u), np.asarray(v))
    a = fused.mm2_update_gram(M1, W, rho, P, interpret=True)
    b = fused.mm2_update_gram(M1, W, rho, P, interpret=True, donate=True)
    for u, v in zip(a, b):
        np.testing.assert_array_equal(np.asarray(u), np.asarray(v))
    a = fused.mm_update(M1, W, X, interpret=True)
    b = fused.mm_update(M1, W, X, interpret=True, donate="a")
    c = fused.mm_update(M1, W, X, interpret=True, donate="b")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
    a = fused.qr_px_update(M1, W, rho, P, C, X, interpret=True)
    b = fused.qr_px_update(M1, W, rho, P, C, X, interpret=True, donate=True)
    for u, v in zip(a, b):
        np.testing.assert_array_equal(np.asarray(u), np.asarray(v))


@pytest.mark.parametrize("shape", [(8, 1024), (6, 4, 512)])
@pytest.mark.parametrize("with_a", [False, True])
def test_mm_update(shape, with_a):
    k = shape[0]
    M, B = _kk(k, 2), _field(shape, 3)
    A = _field(shape, 4) if with_a else None
    Y = fused.mm_update(M, B, A, interpret=True)
    want = np.tensordot(np.asarray(M, np.float64), np.asarray(B, np.float64),
                        axes=(1, 0))
    if with_a:
        want = want + np.asarray(A, np.float64)
    np.testing.assert_allclose(np.asarray(Y), want, rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("shape", [(8, 1024), (6, 4, 512)])
@pytest.mark.parametrize("with_a", [False, True])
def test_mm_update_gram(shape, with_a):
    k = shape[0]
    M, B = _kk(k, 5), _field(shape, 6)
    A = _field(shape, 7) if with_a else None
    Y, G = fused.mm_update_gram(M, B, A, interpret=True)
    want = np.tensordot(np.asarray(M, np.float64), np.asarray(B, np.float64),
                        axes=(1, 0))
    if with_a:
        want = want + np.asarray(A, np.float64)
    np.testing.assert_allclose(np.asarray(Y), want, rtol=1e-5, atol=1e-4)
    wantG = want.reshape(k, -1) @ want.reshape(k, -1).T
    np.testing.assert_allclose(np.asarray(G), wantG, rtol=1e-4, atol=1e-2)


@pytest.mark.parametrize("shape", [(8, 1024), (6, 4, 512)])
def test_qr_p_update(shape):
    k = shape[0]
    M2, rho = _kk(k, 8), _kk(k, 9)
    Q1, P = _field(shape, 10), _field(shape, 11)
    Q, Pn = fused.qr_p_update(M2, Q1, rho, P, interpret=True)
    wq = np.tensordot(np.asarray(M2, np.float64), np.asarray(Q1, np.float64),
                      axes=(1, 0))
    wp = wq + np.tensordot(np.asarray(rho, np.float64),
                           np.asarray(P, np.float64), axes=(1, 0))
    np.testing.assert_allclose(np.asarray(Q), wq, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(Pn), wp, rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("shape", [(8, 1024), (6, 4, 512)])
def test_mm2_update_gram(shape):
    """Implicit-Q residual-direction update: Y = M1 B1 + M2 B2, G = Y Y^T."""
    k = shape[0]
    M1, M2 = _kk(k, 30), _kk(k, 31)
    B1, B2 = _field(shape, 32), _field(shape, 33)
    Y, G = fused.mm2_update_gram(M1, B1, M2, B2, interpret=True)
    m1, m2 = np.asarray(M1, np.float64), np.asarray(M2, np.float64)
    b1, b2 = np.asarray(B1, np.float64), np.asarray(B2, np.float64)
    want = np.tensordot(m1, b1, axes=(1, 0)) + np.tensordot(m2, b2, axes=(1, 0))
    np.testing.assert_allclose(np.asarray(Y), want, rtol=1e-5, atol=1e-4)
    wantG = want.reshape(k, -1) @ want.reshape(k, -1).T
    np.testing.assert_allclose(np.asarray(G), wantG, rtol=1e-4, atol=1e-2)


@pytest.mark.parametrize("shape", [(8, 1024), (6, 4, 512)])
def test_px_update(shape):
    """Implicit-Q iteration tail: Pn = M1 W + rho P, Xn = X + C P (no Q write)."""
    k = shape[0]
    M1, rho, C = _kk(k, 40), _kk(k, 41), _kk(k, 42)
    W, P, X = _field(shape, 43), _field(shape, 44), _field(shape, 45)
    Pn, Xn = fused.px_update(M1, W, rho, P, C, X, interpret=True)
    m1, rh, cc = (np.asarray(a, np.float64) for a in (M1, rho, C))
    w, p, x = (np.asarray(a, np.float64) for a in (W, P, X))
    np.testing.assert_allclose(
        np.asarray(Pn),
        np.tensordot(m1, w, axes=(1, 0)) + np.tensordot(rh, p, axes=(1, 0)),
        rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(Xn), x + np.tensordot(cc, p, axes=(1, 0)),
        rtol=1e-5, atol=1e-4)


def test_qr_factors_from_gram_matches_cholqr():
    """qr_factors_from_gram(V V^T) must reproduce _cholqr_once_t's factors."""
    Vt = _field((6, 2048), 12)
    G = gram_t(Vt, Vt)
    M1, R1 = qr_factors_from_gram(G)
    Qt = jnp.tensordot(M1, Vt, axes=(1, 0))
    # V = Q R and Q orthonormal (single f32 pass: modest tolerance)
    rec = np.tensordot(np.asarray(Qt, np.float64), np.asarray(R1, np.float64),
                       axes=(0, 0)).T
    np.testing.assert_allclose(rec, np.asarray(Vt), rtol=1e-3, atol=1e-3)
    QQ = np.asarray(Qt, np.float64) @ np.asarray(Qt, np.float64).T
    assert np.abs(QQ - np.eye(6)).max() < 1e-2


def test_cholqr_fused_matches_cholqr_t():
    """Fallback path of cholqr_fused_t == cholqr_t (same math, CPU)."""
    Vt = _field((6, 2048), 13)
    Q1, R1 = cholqr_fused_t(Vt, passes=2)
    Q2, R2 = cholqr_t(Vt, passes=2)
    np.testing.assert_allclose(np.asarray(Q1), np.asarray(Q2), rtol=2e-4,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(R1), np.asarray(R2), rtol=2e-4,
                               atol=2e-3)


@pytest.mark.parametrize("shape", [(8, 1024), (6, 4, 512)])
def test_qr_px_update(shape):
    k = shape[0]
    M2, rho, C = _kk(k, 20), _kk(k, 21), _kk(k, 22)
    Q1, P, X = _field(shape, 23), _field(shape, 24), _field(shape, 25)
    Q, Pn, Xn = fused.qr_px_update(M2, Q1, rho, P, C, X, interpret=True)
    m2, rh, cc = (np.asarray(a, np.float64) for a in (M2, rho, C))
    q1, p, x = (np.asarray(a, np.float64) for a in (Q1, P, X))
    want_q = np.tensordot(m2, q1, axes=(1, 0))
    np.testing.assert_allclose(np.asarray(Q), want_q, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(Pn), want_q + np.tensordot(rh, p, axes=(1, 0)),
        rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(Xn), x + np.tensordot(cc, p, axes=(1, 0)),
        rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("shape", [(8, 1024), (6, 4, 512)])
def test_fused_xr_update_gram(shape):
    """Xn = X + aP, Rn = R - aZ, S' = Rn Rn^T in one stacked-dot pass
    (the BCG/BCGA tail, round 5) vs the f64 oracle; donated equals fresh."""
    from blockcg_tpu.ops import fused

    k = shape[0]
    rng = np.random.default_rng(41)
    A = jnp.asarray(rng.standard_normal((k, k)), jnp.float32)
    P = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    X = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    Z = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    R = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    Xn, Rn, S = fused.xr_update_gram(A, P, X, Z, R, interpret=True)
    p = np.asarray(P, np.float64).reshape(k, -1)
    x = np.asarray(X, np.float64).reshape(k, -1)
    z = np.asarray(Z, np.float64).reshape(k, -1)
    r = np.asarray(R, np.float64).reshape(k, -1)
    a = np.asarray(A, np.float64)
    wantX = x + a @ p
    wantR = r - a @ z
    np.testing.assert_allclose(np.asarray(Xn, np.float64).reshape(k, -1),
                               wantX, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(Rn, np.float64).reshape(k, -1),
                               wantR, rtol=1e-5, atol=1e-5)
    rn = np.asarray(Rn, np.float64).reshape(k, -1)
    np.testing.assert_allclose(np.asarray(S, np.float64), rn @ rn.T,
                               rtol=1e-5, atol=1e-4)
    Xd, Rd, Sd = fused.xr_update_gram(A, P, X, Z, R, interpret=True,
                                      donate=True)
    np.testing.assert_array_equal(np.asarray(Xd), np.asarray(Xn))
    np.testing.assert_array_equal(np.asarray(Rd), np.asarray(Rn))
