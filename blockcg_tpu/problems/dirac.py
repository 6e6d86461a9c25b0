"""Lattice-Dirac-like SPD block operator (T-P1, north-star config 4).

A 4x4-blocked SPD operator on a periodic 4D lattice L^4 with nearest-neighbor
hopping — the sparsity/block structure of an even-odd-preconditioned Wilson
``D^H D + m^2`` lattice operator (SURVEY.md §1, R10):

    A[x, x]      = (m^2 + 8) * I_4
    A[x, x+mu]   = -H_mu          (mu = 0..3, periodic)
    A[x, x-mu]   = -H_mu^T

with fixed deterministic symmetric 4x4 hopping matrices ``H_mu`` of unit
spectral norm, so A is symmetric and block-Gershgorin SPD with
``lambda_min >= m^2``. Built directly in block-ELL layout (wb = 9 blocks per
block row, no padding) so the 32^4-site config constructs without scipy.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from blockcg_tpu.operators import BSROperator

BS = 4  # spin-block size
_NDIM = 4


def hopping_matrices(seed: int = 7) -> np.ndarray:
    """Four fixed symmetric 4x4 matrices with unit spectral norm, (4, 4, 4)."""
    rng = np.random.default_rng(seed)
    hs = []
    for _ in range(_NDIM):
        g = rng.standard_normal((BS, BS))
        h = 0.5 * (g + g.T)
        h = h / np.abs(np.linalg.eigvalsh(h)).max()
        hs.append(h)
    return np.stack(hs)


def dirac_bell(L: int, m: float = 0.5, dtype=jnp.float32, seed: int = 7) -> BSROperator:
    """Build the operator as a BSROperator (block-ELL) on an L^4 lattice."""
    np_dtype = np.dtype(jnp.dtype(dtype).name)
    H = hopping_matrices(seed).astype(np_dtype)
    n_sites = L**_NDIM
    wb = 1 + 2 * _NDIM

    idx = np.arange(n_sites)
    strides = [L ** (_NDIM - 1 - ax) for ax in range(_NDIM)]
    coords = [(idx // strides[ax]) % L for ax in range(_NDIM)]

    cols = np.empty((n_sites, wb), dtype=np.int32)
    vals = np.empty((n_sites, wb, BS, BS), dtype=np_dtype)

    cols[:, 0] = idx
    vals[:, 0] = (m * m + 2.0 * _NDIM) * np.eye(BS, dtype=np_dtype)
    slot = 1
    for ax in range(_NDIM):
        up = idx + strides[ax] * (np.where(coords[ax] == L - 1, 1 - L, 1))
        dn = idx + strides[ax] * (np.where(coords[ax] == 0, L - 1, -1))
        cols[:, slot] = up
        vals[:, slot] = -H[ax]
        cols[:, slot + 1] = dn
        vals[:, slot + 1] = -H[ax].T
        slot += 2

    op = BSROperator(vals=jnp.asarray(vals), cols=jnp.asarray(cols))
    object.__setattr__(op, "_nnz", int(np.count_nonzero(vals)))
    return op


def dirac_scipy(L: int, m: float = 0.5, seed: int = 7):
    """scipy CSR export for small L (test comparisons; duplicates summed,
    which handles the L=2 wraparound where +mu and -mu coincide)."""
    import scipy.sparse as sp

    op = dirac_bell(L, m=m, dtype=jnp.float64, seed=seed)
    nbr, wb = op.cols.shape
    vals = np.asarray(op.vals, dtype=np.float64)
    cols = np.asarray(op.cols)
    n = nbr * BS
    # Expand block entries into COO triplets.
    br = np.repeat(np.arange(nbr), wb)  # (nbr*wb,)
    bc = cols.reshape(-1)
    sub_r, sub_c = np.meshgrid(np.arange(BS), np.arange(BS), indexing="ij")
    rows = (br[:, None, None] * BS + sub_r[None]).reshape(-1)
    ccols = (bc[:, None, None] * BS + sub_c[None]).reshape(-1)
    data = vals.reshape(-1)
    return sp.coo_matrix((data, (rows, ccols)), shape=(n, n)).tocsr()
