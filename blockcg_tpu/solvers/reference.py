"""f64 numpy reference implementations of the solver family.

These are the test oracles (SURVEY.md §5.2 item 2): straight transcriptions
of the §1.2 recurrences in float64 numpy with Householder thin QR. The
device solvers are validated against these (iteration counts within slack,
residuals <= tol) and both are validated against direct solves.
"""

from __future__ import annotations

import numpy as np


def ref_cg(A, b, tol=1e-10, max_iter=10000):
    """A: (n,n) ndarray or scipy sparse; b: (n,). Returns (x, iters)."""
    x = np.zeros_like(b, dtype=np.float64)
    b = b.astype(np.float64)
    r = b - A @ x
    p = r.copy()
    rho = float(r @ r)
    bnorm = np.linalg.norm(b) or 1.0
    it = 0
    while np.sqrt(rho) > tol * bnorm and it < max_iter:
        z = A @ p
        alpha = rho / float(p @ z)
        x += alpha * p
        r -= alpha * z
        rho_new = float(r @ r)
        beta = rho_new / rho
        rho = rho_new
        p = r + beta * p
        it += 1
    return x, it


def ref_bcg(A, B, tol=1e-10, max_iter=10000):
    """O'Leary block CG, f64. Returns (X, iters)."""
    B = B.astype(np.float64)
    X = np.zeros_like(B)
    R = B - A @ X
    P = R.copy()
    S = R.T @ R
    bnorm = np.linalg.norm(B, axis=0)
    bnorm = np.where(bnorm > 0, bnorm, 1.0)
    it = 0
    while (np.sqrt(np.diag(S)) / bnorm).max() > tol:
        if it >= max_iter:
            break
        Z = A @ P
        M = P.T @ Z
        alpha = np.linalg.solve(M, S)
        X += P @ alpha
        R -= Z @ alpha
        S_new = R.T @ R
        beta = np.linalg.solve(S, S_new)
        P = R + P @ beta
        S = S_new
        it += 1
    return X, it


def ref_sbcgrq(A, B, tol=1e-10, max_iter=10000, return_invariant=False):
    """SBCGrQ per SURVEY.md §1.2, f64 with Householder thin QR.

    If ``return_invariant``, also returns the max over iterations of
    ``||(B - A X) - Q S|| / ||B||`` (should be ~machine eps — the §1.2
    self-consistency check).
    """
    B = B.astype(np.float64)
    X = np.zeros_like(B)
    Q, S = np.linalg.qr(B - A @ X)
    P = Q.copy()
    bnorm = np.linalg.norm(B, axis=0)
    bnorm = np.where(bnorm > 0, bnorm, 1.0)
    Bn = np.linalg.norm(B)
    it = 0
    drift = 0.0
    while (np.linalg.norm(S, axis=0) / bnorm).max() > tol and it < max_iter:
        Z = A @ P
        M = P.T @ Z
        alpha = np.linalg.inv(M)
        X += P @ (alpha @ S)
        Q, rho = np.linalg.qr(Q - Z @ alpha)
        S = rho @ S
        P = Q + P @ rho.T
        it += 1
        if return_invariant:
            drift = max(drift, np.linalg.norm((B - A @ X) - Q @ S) / Bn)
    if return_invariant:
        return X, it, drift
    return X, it
