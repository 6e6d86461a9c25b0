"""f32 integration tests designed to run BOTH on the CPU suite and on the
real chip (BLOCKCG_TEST_TPU=1 smoke subset — see conftest.py).

VERDICT round-1 item 7: the smoke subset lacked (a) the tiled-MXU general-
sparsity kernel and (b) any shard_map entry point. Both are f32-only and
chip-compatible: the tiled kernel runs for real on the TPU backend
(interpret mode on CPU), and a 1-device mesh exercises the full shard_map
machinery (specs, check_vma, psum/ppermute lowering) on a single chip.
"""

import numpy as np
import jax
import jax.numpy as jnp

from blockcg_tpu import solve_sbcgrq
from blockcg_tpu.operators import TiledOperator
from blockcg_tpu.parallel import partition_dia, row_mesh, solve_sbcgrq_dist
from blockcg_tpu.problems import laplacian_dia, laplacian_scipy, random_block


def test_tiled_solve_f32():
    """General-sparsity (tiled-MXU) SpMM driving a full f32 solve."""
    a = laplacian_scipy((20, 20))  # n=400 -> padded to 512
    op = TiledOperator.from_scipy(a, dtype=jnp.float32)
    B = np.zeros((op.n, 4), np.float32)
    B[:400] = random_block(400, 4, seed=8)
    X, info = solve_sbcgrq(op, jnp.asarray(B), tol=1e-5, max_iter=400)
    assert bool(info.converged.all())
    res = np.linalg.norm(a @ np.asarray(X)[:400] - B[:400], axis=0)
    res /= np.linalg.norm(B[:400], axis=0)
    assert res.max() <= 5e-5


def test_shard_map_single_device_solve_f32():
    """Full distributed entry point on a 1-device mesh: compiles and solves
    on a single chip (the ring ppermute maps to self; psums are no-ops).
    Compares against the plain single-device solver."""
    shape = (16, 16)
    op = laplacian_dia(shape, dtype=jnp.float32)
    B = jnp.asarray(random_block(op.n, 4, seed=9), jnp.float32)
    mesh = row_mesh(1)
    dop = partition_dia(op, 1)
    X_d, info_d = solve_sbcgrq_dist(dop, B, mesh, tol=1e-5, max_iter=400)
    assert bool(info_d.converged.all())
    a = laplacian_scipy(shape)
    res = np.linalg.norm(a @ np.asarray(X_d) - np.asarray(B), axis=0)
    res /= np.linalg.norm(np.asarray(B), axis=0)
    assert res.max() <= 5e-5
    X_s, info_s = solve_sbcgrq(op, B, tol=1e-5, max_iter=400)
    assert abs(int(info_d.iterations) - int(info_s.iterations)) <= 2


def test_rcm_bf16_tiled_solve_f32():
    """Scattered-sparsity fast path end-to-end in f32: RCM-reordered tile
    operator with bf16 tile storage (the kernel upcasts in VMEM on the
    chip; XLA path on CPU) driving a solve through the order-conversion
    helpers."""
    from blockcg_tpu.problems import delaunay_laplacian

    a = delaunay_laplacian(2000, seed=11)
    op = TiledOperator.from_scipy(a, dtype=jnp.float32, reorder="rcm",
                                  tile_dtype=jnp.bfloat16)
    B = random_block(2000, 8, seed=12).astype(np.float32)
    Bi = op.to_solver_order(jnp.asarray(B))
    X, info = solve_sbcgrq(op, Bi, tol=1e-4, max_iter=600)
    assert bool(info.converged.all())
    Xo = np.asarray(op.from_solver_order(X), np.float64)
    res = np.linalg.norm(a @ Xo - B, axis=0) / np.linalg.norm(B, axis=0)
    assert res.max() <= 1e-3
