"""Property/fuzz tests: random structures through the Pallas kernels
(interpret mode) vs dense oracles — exercises planner edge cases
(near/far splits, toroidal wraps, mask patterns) beyond the hand-built
problem generators."""

import numpy as np
import pytest
import jax.numpy as jnp

from blockcg_tpu.ops.stencil import stencil_spmm_t, plan as splan
from blockcg_tpu.ops.const_block_stencil import (
    const_block_stencil_spmm_t,
    plan as cplan,
    n_groups,
)


def _dense_from_diags(n, offsets, diags):
    a = np.zeros((n, n))
    s = np.arange(n)
    for d, o in enumerate(offsets):
        a[s, (s + o) % n] += diags[d]  # toroidal semantics
    return a


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_scalar_stencil(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.choice([256, 512, 1024, 2048]))
    k = int(rng.integers(1, 9))
    noff = int(rng.integers(2, 9))
    offsets = set([0])
    while len(offsets) < noff:
        mag = int(rng.choice([1, 2, 3, 7, 16, 64, n // 4, n // 2]))
        offsets.add(int(rng.choice([-1, 1])) * mag)
    offsets = tuple(sorted(offsets))
    if splan(n, k, offsets) is None:
        pytest.skip(f"no plan for n={n}, offsets={offsets}")
    diags = rng.standard_normal((noff, n)).astype(np.float32)
    a = _dense_from_diags(n, offsets, diags.astype(np.float64))
    X = rng.standard_normal((n, k)).astype(np.float32)
    Yt = stencil_spmm_t(jnp.asarray(diags), offsets, jnp.asarray(X.T),
                        interpret=True)
    want = a @ X
    denom = max(np.abs(want).max(), 1e-30)
    assert np.abs(np.asarray(Yt).T - want).max() / denom < 1e-5


def _dense_from_const_blocks(ns, bs, offsets, hops, mask_slot, masks):
    n = bs * ns
    a = np.zeros((n, n))
    s = np.arange(ns)
    for d, o in enumerate(offsets):
        m = np.ones(ns) if mask_slot[d] < 0 else masks[mask_slot[d]]
        h = np.asarray(hops[d])
        cols = (s + o) % ns
        for i in range(bs):
            for j in range(bs):
                a[i * ns + s, j * ns + cols] += h[i, j] * m
    return a


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_const_block_stencil(seed):
    rng = np.random.default_rng(100 + seed)
    ns = int(rng.choice([256, 512, 1024]))
    bs = int(rng.choice([2, 3, 4]))
    k = int(rng.integers(1, 7))
    noff = int(rng.integers(2, 7))
    offsets = set([0])
    while len(offsets) < noff:
        mag = int(rng.choice([1, 5, 32, ns // 4, ns // 2]))
        offsets.add(int(rng.choice([-1, 1])) * mag)
    offsets = tuple(sorted(offsets))
    hops, mask_slot, masks = [], [], []
    for d in range(len(offsets)):
        h = rng.standard_normal((bs, bs)).astype(np.float32)
        h[rng.random((bs, bs)) < 0.3] = 0.0  # exercise zero-entry skipping
        hops.append(tuple(tuple(float(v) for v in row) for row in h))
        if rng.random() < 0.5:
            mask_slot.append(len(masks))
            masks.append((rng.random(ns) < 0.7).astype(np.float32))
        else:
            mask_slot.append(-1)
    hops = tuple(hops)
    mask_slot = tuple(mask_slot)
    nmask = len(masks)
    if cplan(ns, k, bs, offsets, nmask, groups=n_groups(hops)) is None:
        pytest.skip(f"no plan for ns={ns}, bs={bs}, offsets={offsets}")
    masks_j = jnp.asarray(np.stack(masks)) if masks else None
    X = rng.standard_normal((bs * ns, k)).astype(np.float32)
    Xv = jnp.asarray(X.T).reshape(k, bs, ns)
    Yv = const_block_stencil_spmm_t(hops, offsets, mask_slot, masks_j, Xv,
                                    interpret=True)
    a = _dense_from_const_blocks(ns, bs, offsets, hops, mask_slot, masks)
    want = a @ X
    got = np.asarray(Yv).reshape(k, bs * ns).T
    denom = max(np.abs(want).max(), 1e-30)
    assert np.abs(got - want).max() / denom < 1e-5


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_merged_const_block_stencil(seed):
    """Merged spin-major kernel (+fused gram) with random VALUE masks and
    duplicate offsets vs the dense oracle."""
    from blockcg_tpu.ops.const_block_stencil import (
        available_m, const_block_stencil_spmm_m_gram_t,
        const_block_stencil_spmm_m_t,
    )

    rng = np.random.default_rng(300 + seed)
    ns = int(rng.choice([256, 512, 1024]))
    bs = int(rng.choice([2, 4]))
    kcand = [kk for kk in range(1, 9) if (bs * kk) % 8 == 0]
    k = int(rng.choice(kcand))
    noff = int(rng.integers(2, 7))
    offs_pool = set([0])
    while len(offs_pool) < noff:
        mag = int(rng.choice([1, 5, 32, ns // 4, ns // 2]))
        offs_pool.add(int(rng.choice([-1, 1])) * mag)
    offsets, hops, mask_slot, masks = [], [], [], []
    for o in sorted(offs_pool):
        reps = 2 if (o != 0 and rng.random() < 0.3) else 1  # duplicates
        for _ in range(reps):
            h = rng.standard_normal((bs, bs)).astype(np.float32)
            h[rng.random((bs, bs)) < 0.3] = 0.0
            offsets.append(o)
            hops.append(tuple(tuple(float(v) for v in row) for row in h))
            if rng.random() < 0.7:
                mask_slot.append(len(masks))
                vals = rng.standard_normal(ns).astype(np.float32)
                vals[rng.random(ns) < 0.3] = 0.0  # value masks w/ zeros
                masks.append(vals)
            else:
                mask_slot.append(-1)
    offsets = tuple(offsets)
    hops = tuple(hops)
    mask_slot = tuple(mask_slot)
    nmask = len(masks)
    m = bs * k
    if not available_m(ns, m, offsets, nmask, groups=n_groups(hops)):
        pytest.skip(f"no merged plan for ns={ns}, m={m}, offsets={offsets}")
    masks_j = jnp.asarray(np.stack(masks)) if masks else None
    X = rng.standard_normal((bs * ns, k)).astype(np.float32)
    # merged spin-major rows: row = a*k + i from flat spin-major a*ns + s
    Xm = jnp.asarray(X.T).reshape(k, bs, ns).swapaxes(0, 1).reshape(m, ns)
    Ym = const_block_stencil_spmm_m_t(hops, offsets, mask_slot, masks_j,
                                      Xm, interpret=True)
    Y2, G = const_block_stencil_spmm_m_gram_t(hops, offsets, mask_slot,
                                              masks_j, Xm, interpret=True)
    a = _dense_from_const_blocks(ns, bs, offsets, hops, mask_slot, masks)
    want = a @ X
    got = np.asarray(Ym).reshape(bs, k, ns).swapaxes(0, 1).reshape(
        k, bs * ns).T
    denom = max(np.abs(want).max(), 1e-30)
    assert np.abs(got - want).max() / denom < 1e-5
    np.testing.assert_allclose(np.asarray(Y2), np.asarray(Ym),
                               rtol=1e-6, atol=1e-6)
    want_g = (np.asarray(Xm, np.float64)
              @ np.asarray(Ym, np.float64).T)
    np.testing.assert_allclose(np.asarray(G), want_g, rtol=1e-4,
                               atol=1e-3)


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_merged_general_block_stencil(seed):
    """Merged general (per-site blocks) kernel vs the dense oracle."""
    from blockcg_tpu.ops.block_stencil import (
        available_m, block_stencil_spmm_m_t,
    )
    from blockcg_tpu.operators.bdia import BlockDIAOperator

    rng = np.random.default_rng(400 + seed)
    ns = int(rng.choice([256, 512]))
    bs = int(rng.choice([2, 4]))
    kcand = [kk for kk in range(1, 7) if (bs * kk) % 8 == 0]
    k = int(rng.choice(kcand))
    noff = int(rng.integers(2, 6))
    offsets = set([0])
    while len(offsets) < noff:
        mag = int(rng.choice([1, 5, 32, ns // 4]))
        offsets.add(int(rng.choice([-1, 1])) * mag)
    offsets = tuple(sorted(offsets))
    m = bs * k
    if not available_m(ns, m, bs, offsets):
        pytest.skip(f"no merged plan for ns={ns}, m={m}, offsets={offsets}")
    blocks = rng.standard_normal((len(offsets), bs, bs, ns)).astype(np.float32)
    blocks[rng.random(blocks.shape) < 0.2] = 0.0
    op = BlockDIAOperator(blocks=jnp.asarray(blocks), offsets=offsets)
    X = rng.standard_normal((bs * ns, k)).astype(np.float32)
    Xm = op.to_internal(jnp.asarray(X.T))
    Ym = block_stencil_spmm_m_t(op.blocks, offsets, Xm, interpret=True)
    got = np.asarray(op.from_internal(Ym)).T
    # dense oracle
    n = bs * ns
    a = np.zeros((n, n))
    s = np.arange(ns)
    for d, o in enumerate(offsets):
        cols = (s + o) % ns
        for i in range(bs):
            for j in range(bs):
                a[i * ns + s, j * ns + cols] += blocks[d, i, j].astype(
                    np.float64)
    want = a @ X
    denom = max(np.abs(want).max(), 1e-30)
    assert np.abs(got - want).max() / denom < 1e-5


@pytest.mark.parametrize("seed", range(5))
def test_fuzz_rcm_tiled_roundtrip(seed):
    """Random geometric-graph Laplacians (+ random SPD diagonal noise)
    through the RCM-reordered tile path: order-conversion round-trip and
    interpret-mode kernel agree with scipy; fill metadata is consistent."""
    import scipy.sparse as sp

    from blockcg_tpu.operators import TiledOperator
    from blockcg_tpu.ops.spmm_tiled import tiled_spmm_t
    from blockcg_tpu.problems import rgg_laplacian

    rng = np.random.default_rng(100 + seed)
    n = int(rng.choice([700, 1500, 2048]))
    deg = float(rng.choice([6.0, 12.0, 25.0]))
    a = rgg_laplacian(n, degree=deg, seed=seed)
    a = (a + sp.diags(rng.random(n))).tocsr()  # break value symmetry a bit
    op = TiledOperator.from_scipy(a, dtype=jnp.float32, reorder="rcm")
    assert abs(op.nnz - (a.nnz + (op.n - n))) == 0
    assert 0 < op.fill <= 1
    k = int(rng.integers(1, 6))
    X = rng.standard_normal((n, k)).astype(np.float32)
    Xi = op.to_solver_order(jnp.asarray(X))
    # XLA path round-trip
    got = np.asarray(op.from_solver_order(op.matmat(Xi)), np.float64)
    want = a @ X.astype(np.float64)
    denom = max(np.abs(want).max(), 1e-30)
    assert np.abs(got - want).max() / denom < 1e-5
    # interpret-mode kernel on the internal (permuted) field
    Yt = tiled_spmm_t(op.tiles, op.rt, op.ct, op.first,
                      jnp.asarray(Xi).T, interpret=True)
    got_k = np.asarray(op.from_solver_order(np.asarray(Yt).T), np.float64)
    assert np.abs(got_k - want).max() / denom < 1e-5
