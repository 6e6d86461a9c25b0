"""Measure the no-locality SpMM bound (VERDICT r2 item 6).

For sparsity with NO structure (a random regular expander), every SpMM
formulation must fetch k-wide RHS rows at uniformly random positions; the
speed of light is therefore the chip's random lane-gather bandwidth, not
HBM stream bandwidth. This probe MEASURES that bound and the achieved
throughput of each candidate path on an exact d-regular graph:

  gather_bw    raw ``jnp.take`` of nnz random (k,)-rows — the bound:
               bound_nnzs = gather_rows_per_s
  csr          XLA gather + segment-sum SpMM (the shipping fallback)
  ell          fixed-width row gather (d-regular -> zero padding waste)
  rcm          RCM + sparse-tile Pallas kernel — expected to LOSE (an
               expander cannot be densified; reported to prove it)
  onehot128    gather-as-MXU-matmul: per 128-column source block, a dense
               (rows x 128) one-hot-values matmul — O(n^2 k / 128) MXU
               work; reported to show where the dense-crossover sits.

Emits one JSON line per measurement. Run on the real chip (chip queue);
--cpu gives a methodology smoke run.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


class FnOp:
    """Minimal operator shim for bench.measure_apply: a pure fn over
    (arrays, Xt), registered as a pytree so it can be a jit argument."""

    def __init__(self, fn, arrays):
        self.fn = fn
        self.arrays = arrays

    dtype = None  # set per-instance

    def matmat_t(self, xt):
        return self.fn(self.arrays, xt)


import jax as _jax  # noqa: E402

_jax.tree_util.register_pytree_node(
    FnOp,
    lambda o: (tuple(o.arrays), o.fn),
    lambda fn, arrays: FnOp(fn, list(arrays)),
)


def _gather_sum(arrays, xt):
    idx, deg, n = arrays[0], int(arrays[1].shape[0]), xt.shape[1]
    import jax.numpy as jnp

    g = jnp.take(xt, idx, axis=1, indices_are_sorted=False)
    return jnp.sum(g.reshape(xt.shape[0], deg, n), axis=1)


def _dense_bf16(arrays, xt):
    import jax
    import jax.numpy as jnp

    return jax.lax.dot_general(
        xt.astype(jnp.bfloat16), arrays[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16384)
    ap.add_argument("--deg", type=int, default=8)
    ap.add_argument("--k", type=int, default=32)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from bench import measure_apply
    from blockcg_tpu.operators import CSROperator, ELLOperator
    from blockcg_tpu.problems import random_regular_spd

    a = random_regular_spd(args.n, degree=args.deg, seed=0)
    n, nnz, k = a.shape[0], a.nnz, args.k
    rng = np.random.default_rng(1)
    Xt = jnp.asarray(rng.standard_normal((k, n)), dtype=jnp.float32)

    def emit(name, seconds, extra=None):
        rec = {"probe": "gather_bound", "case": name, "n": n, "deg": args.deg,
               "k": k, "nnz": nnz, "seconds": round(seconds, 6),
               "gnnzs": round(nnz / seconds / 1e9, 4)}
        rec.update(extra or {})
        print(json.dumps(rec), flush=True)

    # --- the bound: raw random row-gather of deg*n rows ------------------
    # One take of (k, deg*n) reshaped and summed back to (k, n): the
    # reshape+sum keeps the loop-carried shape AND forces every gather to
    # be live (a sliced output would let XLA dead-code most of them); it is
    # exactly the SpMM's gather+reduce skeleton minus the value multiply.
    deg = args.deg
    idx = jnp.asarray(rng.integers(0, n, deg * n), dtype=jnp.int32)
    gop = FnOp(_gather_sum, [idx, jnp.zeros((deg,), jnp.int8)])
    gop.dtype = jnp.float32
    dt = measure_apply(gop, Xt, lengths=(4, 20, 36))
    print(json.dumps({
        "probe": "gather_bound", "case": "gather_bound", "n": n,
        "deg": deg, "k": k, "gathers": deg * n,
        "seconds": round(dt, 6),
        "bound_gnnzs": round(deg * n / dt / 1e9, 4),
        "gather_gbs": round(deg * n * k * 4 / dt / 1e9, 2),
        "note": "speed of light for no-locality SpMM at this (n, deg, k)",
    }), flush=True)

    # --- CSR XLA gather + segment-sum ----------------------------------
    op_csr = CSROperator.from_scipy(a, dtype=jnp.float32)
    dt = measure_apply(op_csr, Xt, lengths=(4, 20, 36))
    emit("csr_xla", dt)

    # --- ELL row gather (d-regular: no padding waste) -------------------
    op_ell = ELLOperator.from_scipy(a, dtype=jnp.float32)
    dt = measure_apply(op_ell, Xt, lengths=(4, 20, 36))
    emit("ell_xla", dt)

    # --- RCM + sparse tiles: prove it loses on an expander --------------
    try:
        from blockcg_tpu.operators import TiledOperator

        op_t = TiledOperator.from_scipy(a, dtype=jnp.float32, reorder="rcm",
                                        max_pad_bytes=8 << 30)
        fill = nnz / (op_t.ntiles * 128 * 128)
        dt = measure_apply(op_t, op_t.to_solver_order(Xt.T).T,
                           lengths=(4, 20, 36))
        emit("rcm_tiled", dt, {"tile_fill": round(fill, 5),
                               "ntiles": int(op_t.ntiles)})
    except Exception as e:  # noqa: BLE001 — selector may reject outright
        print(json.dumps({"probe": "gather_bound", "case": "rcm_tiled",
                          "rejected": f"{type(e).__name__}: {e}"[:200]}),
              flush=True)

    # --- one-hot MXU gather-as-matmul -----------------------------------
    # Per 128-wide source block b: Y += V_b @ X[:, b*128:(b+1)*128]^T-style,
    # with V_b the dense (n x 128) scatter of A's values. Total MXU work
    # n * n * k / ... = a full dense matmul: included to settle where the
    # crossover sits, not as a contender at this n.
    if n <= 32768:
        dop = FnOp(_dense_bf16, [jnp.asarray(a.toarray(), jnp.bfloat16)])
        dop.dtype = jnp.float32
        dt = measure_apply(dop, Xt, lengths=(4, 20, 36))
        emit("dense_mxu_bf16", dt, {
            "note": "full dense bf16 MXU matmul upper-cost reference"})


if __name__ == "__main__":
    main()
