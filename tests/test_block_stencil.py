"""Block-stencil kernel + BlockDIA operator tests (T-K1 block flavor)."""

import numpy as np
import pytest
import jax.numpy as jnp

from blockcg_tpu.ops.block_stencil import block_stencil_spmm_t, plan
from blockcg_tpu.problems import bdia_scipy, dirac_bdia, dirac_scipy


@pytest.mark.parametrize("bc", ["periodic", "open"])
def test_bdia_xla_matches_scipy(bc):
    L = 4
    op = dirac_bdia(L, m=0.5, bc=bc, dtype=jnp.float64)
    a = bdia_scipy(op)
    rng = np.random.default_rng(0)
    X = rng.standard_normal((op.n, 3))
    got = np.asarray(op._matmat_t_xla(jnp.asarray(X.T))).T
    np.testing.assert_allclose(got, a @ X, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("bc", ["periodic", "open"])
def test_bdia_spd_and_symmetric(bc):
    a = bdia_scipy(dirac_bdia(3, m=0.5, bc=bc, dtype=jnp.float64)).toarray()
    np.testing.assert_allclose(a, a.T, atol=1e-14)
    assert np.linalg.eigvalsh(a).min() >= 0.5**2 - 1e-10


def test_bdia_matches_bsr_form():
    """Spin-major BDIA and site-major BSR describe the same matrix up to the
    row/col permutation perm(a*ns+s) = s*4+a."""
    L = 3
    a_bdia = bdia_scipy(dirac_bdia(L, m=0.5, bc="periodic", dtype=jnp.float64))
    a_bsr = dirac_scipy(L, m=0.5, bc="periodic")
    ns = L**4
    s = np.arange(ns)
    perm = np.concatenate([s * 4 + a for a in range(4)])  # spin-major -> site-major
    got = a_bsr[perm][:, perm]
    diff = (a_bdia - got).toarray()
    assert np.abs(diff).max() < 1e-14


@pytest.mark.parametrize("bc,L,k", [("periodic", 4, 6), ("open", 4, 2), ("periodic", 8, 3)])
def test_block_stencil_kernel_interpret(bc, L, k):
    op = dirac_bdia(L, m=0.5, bc=bc, dtype=jnp.float32)
    a = bdia_scipy(op)
    rng = np.random.default_rng(1)
    X = rng.standard_normal((op.n, k)).astype(np.float32)
    Yt = block_stencil_spmm_t(
        op.blocks, op.offsets, jnp.asarray(X.T), interpret=True
    )
    want = a @ X
    err = np.abs(np.asarray(Yt).T - want).max() / np.abs(want).max()
    assert err < 1e-5


def test_block_stencil_plan_dirac32():
    """The 32^4 periodic config must have a kernel plan with bounded traffic.

    Offset pattern of dirac_bdia(32): slowest axis unmasked (toroidal merge),
    remaining axes carry explicit wrap diagonals.
    """
    L = 32
    strides = [L**3, L**2, L, 1]
    offs = [0, strides[0], -strides[0]]
    for st in strides[1:]:
        offs += [st, -st, -(L - 1) * st, (L - 1) * st]
    p = plan(L**4, 12, 4, tuple(offs))
    assert p is not None
    assert p.x_reads <= 8.0


def test_block_stencil_merged_kernel_matches_scipy():
    """Merged spin-major general kernel vs scipy, through the operator."""
    from blockcg_tpu.problems import dirac_gauged
    from blockcg_tpu.problems.dirac import bdia_scipy
    from blockcg_tpu.ops.block_stencil import block_stencil_spmm_m_t

    op = dirac_gauged(4, m=0.5, dtype=jnp.float32)
    a = bdia_scipy(op)
    rng = np.random.default_rng(17)
    k = 2  # m = 8
    X = rng.standard_normal((op.n, k)).astype(np.float32)
    Xm = op.to_internal(jnp.asarray(X.T))
    assert Xm.shape == (op.bs * k, op.ns)
    Ym = block_stencil_spmm_m_t(op.blocks, op.offsets, Xm, interpret=True)
    Yt = np.asarray(op.from_internal(Ym)).T
    want = a @ X
    assert np.abs(Yt - want).max() / np.abs(want).max() < 1e-5


def test_block_stencil_merged_gram():
    from blockcg_tpu.problems import dirac_gauged
    from blockcg_tpu.ops.block_stencil import (
        block_stencil_spmm_m_gram_t, block_stencil_spmm_m_t,
    )

    op = dirac_gauged(4, m=0.5, dtype=jnp.float32)
    rng = np.random.default_rng(18)
    Xm = jnp.asarray(rng.standard_normal((op.bs * 2, op.ns)), jnp.float32)
    Ym, G = block_stencil_spmm_m_gram_t(op.blocks, op.offsets, Xm,
                                        interpret=True)
    want_y = block_stencil_spmm_m_t(op.blocks, op.offsets, Xm, interpret=True)
    np.testing.assert_allclose(np.asarray(Ym), np.asarray(want_y),
                               rtol=1e-6, atol=1e-6)
    want_g = np.asarray(Xm, np.float64) @ np.asarray(want_y, np.float64).T
    np.testing.assert_allclose(np.asarray(G), want_g, rtol=1e-4, atol=1e-3)
    # seed hook: added into G (benchmark-chain dependence, see kernel doc)
    seed = jnp.asarray(rng.standard_normal((op.bs * 2, op.bs * 2)),
                       jnp.float32)
    _, Gs = block_stencil_spmm_m_gram_t(op.blocks, op.offsets, Xm,
                                        seed=seed, interpret=True)
    np.testing.assert_allclose(np.asarray(Gs), np.asarray(G + seed),
                               rtol=1e-5, atol=1e-4)


def test_block_stencil_duplicate_offsets():
    """Regression: duplicate-offset reorder in both block kernels."""
    from blockcg_tpu.operators.bdia import BlockDIAOperator
    from blockcg_tpu.ops.block_stencil import (
        block_stencil_spmm_m_t, block_stencil_spmm_t,
    )

    rng = np.random.default_rng(53)
    n = 256
    blocks = rng.standard_normal((3, 2, 2, n)).astype(np.float32)
    offsets = (0, 1, 1)
    bop = BlockDIAOperator(blocks=jnp.asarray(blocks), offsets=offsets)
    Xv = jnp.asarray(rng.standard_normal((4, 2, n)), jnp.float32)
    got = block_stencil_spmm_t(bop.blocks, offsets, Xv, interpret=True)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(bop._matmat_v_xla(Xv)),
                               rtol=1e-5, atol=1e-5)
    Xm = jnp.asarray(rng.standard_normal((8, n)), jnp.float32)
    got_m = block_stencil_spmm_m_t(bop.blocks, offsets, Xm, interpret=True)
    np.testing.assert_allclose(np.asarray(got_m),
                               np.asarray(bop._matmat_m_xla(Xm)),
                               rtol=1e-5, atol=1e-5)
