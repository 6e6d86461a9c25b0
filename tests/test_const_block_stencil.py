"""Constant-hop block-stencil kernel + ConstBlockDIA operator tests."""

import numpy as np
import pytest
import jax.numpy as jnp

from blockcg_tpu.ops.const_block_stencil import const_block_stencil_spmm_t, plan
from blockcg_tpu.problems import bdia_scipy, dirac_bdia, dirac_cbdia


@pytest.mark.parametrize("bc", ["periodic", "open"])
def test_cbdia_matches_bdia_matrix(bc):
    """dirac_cbdia and dirac_bdia build the identical matrix."""
    L = 3
    a = bdia_scipy(dirac_cbdia(L, m=0.5, bc=bc, dtype=jnp.float64).to_block_dia())
    b = bdia_scipy(dirac_bdia(L, m=0.5, bc=bc, dtype=jnp.float64))
    assert abs((a - b)).max() < 1e-14


@pytest.mark.parametrize("bc", ["periodic", "open"])
def test_cbdia_xla_matches_scipy(bc):
    L = 4
    op = dirac_cbdia(L, m=0.5, bc=bc, dtype=jnp.float64)
    a = bdia_scipy(op.to_block_dia())
    rng = np.random.default_rng(0)
    X = rng.standard_normal((op.n, 3))
    got = np.asarray(op._matmat_t_xla(jnp.asarray(X.T))).T
    np.testing.assert_allclose(got, a @ X, rtol=1e-12, atol=1e-12)


def test_cbdia_nnz_matches_bdia():
    for bc in ("periodic", "open"):
        assert (
            dirac_cbdia(4, bc=bc).nnz == dirac_bdia(4, bc=bc).nnz
        )


@pytest.mark.parametrize(
    "bc,L,k", [("periodic", 4, 6), ("open", 4, 2), ("periodic", 8, 3)]
)
def test_const_block_stencil_kernel_interpret(bc, L, k):
    op = dirac_cbdia(L, m=0.5, bc=bc, dtype=jnp.float32)
    a = bdia_scipy(op.to_block_dia())
    rng = np.random.default_rng(1)
    X = rng.standard_normal((op.n, k)).astype(np.float32)
    Yt = const_block_stencil_spmm_t(
        op.hops, op.offsets, op.mask_slot, op.masks, jnp.asarray(X.T),
        interpret=True,
    )
    want = a @ X
    err = np.abs(np.asarray(Yt).T - want).max() / np.abs(want).max()
    assert err < 1e-5


def test_const_kernel_no_masks_interpret():
    """All-unmasked path (masks=None): pure-torus operator."""
    from blockcg_tpu.operators.cbdia import ConstBlockDIAOperator

    ns, bs, k = 256, 2, 3
    hops = (
        ((4.0, 0.5), (0.5, 4.0)),
        ((-1.0, 0.25), (0.0, -1.0)),
        ((-1.0, 0.0), (0.25, -1.0)),
    )
    op = ConstBlockDIAOperator(
        masks=None, hops=hops, offsets=(0, 1, -1), mask_slot=(-1, -1, -1),
        num_sites=ns,
    )
    rng = np.random.default_rng(2)
    Xt = jnp.asarray(rng.standard_normal((k, op.n)), dtype=jnp.float32)
    want = op._matmat_t_xla(Xt)
    got = const_block_stencil_spmm_t(
        op.hops, op.offsets, op.mask_slot, None, Xt, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-6, atol=2e-6)


def test_const_plan_dirac32_traffic():
    """32^4 periodic config: plan exists and masks cut coefficient traffic.

    nmask = 12 masked diagonals (axes 1-3) vs 17*16 = 272 coefficient rows
    in the general block kernel.
    """
    L = 32
    strides = [L**3, L**2, L, 1]
    offs = [0, strides[0], -strides[0]]
    for st in strides[1:]:
        offs += [st, -st, -(L - 1) * st, (L - 1) * st]
    # Real symmetric hops dedup to 5 groups (diag + 4 axes); the complex
    # realified operator (bs=8, conj-transposed hops distinct) gives 9.
    p = plan(L**4, 12, 4, tuple(offs), nmask=12, groups=5)
    assert p is not None
    assert p.x_reads <= 8.0
    p8 = plan(L**4, 12, 8, tuple(offs), nmask=12, groups=9)
    assert p8 is not None


def test_cbdia_solve_sbcgrq():
    """End-to-end: SBCGrQ through the const operator (XLA path on CPU)."""
    import blockcg_tpu as bc

    op = dirac_cbdia(4, m=0.5, dtype=jnp.float32)
    rng = np.random.default_rng(3)
    B = jnp.asarray(rng.standard_normal((op.n, 4)), dtype=jnp.float32)
    X, info = bc.solve_sbcgrq(op, B, tol=1e-5, max_iter=200)
    a = bdia_scipy(op.to_block_dia())
    r = np.asarray(B) - a @ np.asarray(X)
    rel = np.linalg.norm(r, axis=0) / np.linalg.norm(np.asarray(B), axis=0)
    assert rel.max() < 1e-4


def test_const_block_stencil_gram_fused():
    from blockcg_tpu.ops.const_block_stencil import (
        const_block_stencil_spmm_gram_t,
    )

    op = dirac_cbdia(4, m=0.5, bc="periodic", dtype=jnp.float32)
    rng = np.random.default_rng(11)
    Xt = jnp.asarray(rng.standard_normal((5, op.n)), dtype=jnp.float32)
    Yt, G = const_block_stencil_spmm_gram_t(
        op.hops, op.offsets, op.mask_slot, op.masks, Xt, interpret=True
    )
    want_y = const_block_stencil_spmm_t(
        op.hops, op.offsets, op.mask_slot, op.masks, Xt, interpret=True
    )
    np.testing.assert_allclose(np.asarray(Yt), np.asarray(want_y),
                               rtol=1e-6, atol=1e-6)
    want_g = np.asarray(Xt, np.float64) @ np.asarray(want_y, np.float64).T
    np.testing.assert_allclose(np.asarray(G), want_g, rtol=1e-4, atol=1e-3)


def test_cbdia_matmat_gram_with_slabs():
    """Operator-level fused gram includes the slab-routed wrap diagonals.

    Flat public input: the operator converts through the merged layout; the
    returned Gram is the k x k contraction (== X Y^T of the flat fields)."""
    from blockcg_tpu.operators.cbdia import detect_slabs

    op = dirac_cbdia(8, m=0.5, bc="periodic", dtype=jnp.float32)
    ops = detect_slabs(op, max_frac=0.6)
    rng = np.random.default_rng(12)
    Xt = jnp.asarray(rng.standard_normal((4, op.n)), dtype=jnp.float32)
    Y, G = ops.matmat_gram_t(Xt, interpret=True)
    want_y = op.matmat_t(Xt, interpret=True)
    np.testing.assert_allclose(np.asarray(Y), np.asarray(want_y),
                               rtol=1e-5, atol=1e-5)
    want_g = np.asarray(Xt, np.float64) @ np.asarray(want_y, np.float64).T
    np.testing.assert_allclose(np.asarray(G), want_g, rtol=1e-4, atol=1e-3)


def test_cbdia_matmat_gram_odd_k_falls_back():
    """m = bs*k not a multiple of 8: fused path unavailable, (Y, None)."""
    op = dirac_cbdia(4, m=0.5, bc="periodic", dtype=jnp.float32)
    rng = np.random.default_rng(13)
    Xt = jnp.asarray(rng.standard_normal((3, op.n)), dtype=jnp.float32)
    Y, G = op.matmat_gram_t(Xt, interpret=True)
    assert G is None
    want_y = op.matmat_t(Xt, interpret=True)
    np.testing.assert_allclose(np.asarray(Y), np.asarray(want_y),
                               rtol=1e-5, atol=1e-5)


def test_cbdia_merged_kernel_matches_scipy():
    """Merged spin-major kernel vs the scipy oracle through the operator."""
    op = dirac_cbdia(4, m=0.5, bc="periodic", dtype=jnp.float32)
    a = bdia_scipy(op.to_block_dia())
    rng = np.random.default_rng(14)
    k = 2  # m = 8
    X = rng.standard_normal((op.n, k)).astype(np.float32)
    Xm = op.to_internal(jnp.asarray(X.T))
    assert Xm.shape == (op.bs * k, op.ns)
    Ym = op.matmat_t(Xm, interpret=True)
    Yt = op.from_internal(Ym)
    want = a @ X
    err = np.abs(np.asarray(Yt).T - want).max() / np.abs(want).max()
    assert err < 1e-5


def test_cbdia_k1_merged_uses_legacy_kernel():
    """k=1 (m=bs not 8-aligned): free reshape routes to the 3D kernel."""
    op = dirac_cbdia(4, m=0.5, bc="periodic", dtype=jnp.float32)
    rng = np.random.default_rng(15)
    Xm = jnp.asarray(rng.standard_normal((op.bs, op.ns)), dtype=jnp.float32)
    got = op.matmat_t(Xm, interpret=True)   # kernel path (interpret)
    want = op._matmat_m_xla(Xm)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
