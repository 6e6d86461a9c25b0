"""Pin the ring-at-capacity OOM mechanism with XLA buffer-assignment numbers
(VERDICT r3 item 2).

The full-size config-5 run (16.7M rows, bf16 kb=32 inner solves) OOM'd when
the ring kernel dispatched and passed on the windowed path; round 3 gated the
ring at 512 MB field bytes on that observation alone. This probe replaces the
observation with numbers: it AOT-compiles (does NOT run) the exact inner
solve both ways and prints ``compiled.memory_analysis()`` — argument, output,
and TEMP allocation sizes — so the extra liveness the ring path costs is a
measured quantity, not a theory. Compile-only, so it can safely probe
compositions that would OOM at run time.

Run on the real chip (the tunnel AOT-compiles for the attached v5e);
``--run`` additionally executes one solve per arm (only at sizes whose peak
the analysis says fits).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fmt_gb(b: float) -> float:
    return round(b / 2**30, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dims", type=int, nargs=3, default=[256, 256, 128],
                    help="3D grid (default 8.4M rows — just above the gate)")
    ap.add_argument("--k", type=int, default=32)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--run", action="store_true",
                    help="also execute one timed solve per arm")
    ap.add_argument("--ballast-gb", type=float, default=0.0,
                    help="allocate this much persistent HBM before running "
                    "(mimics the refined-lean driver's live outer buffers: "
                    "the in-driver ring OOM at full config 5 happens with "
                    "~8-11 GB alive while the standalone solve passes — "
                    "bisect each arm's true runtime boundary)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp

    from blockcg_tpu.problems import laplacian_dia
    from blockcg_tpu.solvers.sbcgrq import _sbcgrq_impl

    dims = tuple(args.dims)
    k = args.k
    dtype = jnp.dtype(args.dtype)
    op = laplacian_dia(dims, dtype=dtype)
    n = op.n
    field_gb = fmt_gb(k * n * dtype.itemsize)
    print(json.dumps({"probe": "ring_capacity", "n": n, "k": k,
                      "dtype": str(dtype), "field_gb": field_gb,
                      "device": str(jax.devices()[0].device_kind)}),
          flush=True)

    ballast = []
    if args.ballast_gb > 0:
        # 0.25 GB bricks, value-fetched so allocation really happens
        nbricks = int(args.ballast_gb / 0.25)
        for i in range(nbricks):
            b = jnp.full((128, 2**20), float(i), jnp.bfloat16)  # 0.25 GB
            ballast.append(b)
        _ = float(jnp.sum(ballast[-1][0, :8]))
        print(json.dumps({"probe": "ring_capacity",
                          "ballast_gb": 0.25 * nbricks}), flush=True)

    Bt = jnp.zeros((k, n), dtype)  # shapes only; lower() never reads values
    X0 = jnp.zeros((k, n), dtype)

    results = {}
    for arm, mb in (("windowed", "0"), ("ring", "1048576")):
        os.environ["BLOCKCG_RING_MAX_MB"] = mb
        jax.clear_caches()  # _use_ring reads the env at TRACE time
        lowered = _sbcgrq_impl.lower(
            op, Bt, X0, 5e-3, 2000, qr_passes=1, replace_every=0,
            axis_name=None, record_history=False,
        )
        hlo = lowered.as_text()
        ring_in_hlo = "ring" in hlo  # ring kernels carry 'ring' in their name
        compiled = lowered.compile()
        ma = compiled.memory_analysis()
        rec = {
            "probe": "ring_capacity", "arm": arm,
            "ring_dispatched": bool(ring_in_hlo),
            "arg_gb": fmt_gb(ma.argument_size_in_bytes),
            "out_gb": fmt_gb(ma.output_size_in_bytes),
            "temp_gb": fmt_gb(ma.temp_size_in_bytes),
            "alias_gb": fmt_gb(ma.alias_size_in_bytes),
            "peak_gb": fmt_gb(ma.argument_size_in_bytes
                              + ma.output_size_in_bytes
                              + ma.temp_size_in_bytes
                              - ma.alias_size_in_bytes),
        }
        results[arm] = rec
        print(json.dumps(rec), flush=True)

        if args.run:
            import time

            try:
                rng = np.random.default_rng(0)
                B = jnp.asarray(
                    rng.standard_normal((k, n)).astype(np.float32),
                    dtype=dtype)
                Xw, info = _sbcgrq_impl(op, B, X0, 5e-3, 2000, qr_passes=1,
                                        replace_every=0, axis_name=None,
                                        record_history=False)
                _ = int(info.iterations)
                best = float("inf")
                for _t in range(3):
                    t0 = time.time()
                    Xw, info = _sbcgrq_impl(op, B, X0, 5e-3, 2000,
                                            qr_passes=1, replace_every=0,
                                            axis_name=None,
                                            record_history=False)
                    _ = int(info.iterations)
                    best = min(best, time.time() - t0)
                print(json.dumps({"probe": "ring_capacity", "arm": arm,
                                  "solve_s": round(best, 4),
                                  "iters": int(info.iterations),
                                  "max_relres":
                                  float(jnp.max(info.relres))}),
                      flush=True)
                del Xw, B
            except Exception as e:  # RESOURCE_EXHAUSTED: record, keep going
                print(json.dumps({"probe": "ring_capacity", "arm": arm,
                                  "run_failed":
                                  type(e).__name__ + ": " + str(e)[:160]}),
                      flush=True)
                try:
                    del Xw  # noqa: F821
                except NameError:
                    pass
                try:
                    del B  # noqa: F821
                except NameError:
                    pass

    if "windowed" in results and "ring" in results:
        print(json.dumps({
            "probe": "ring_capacity", "arm": "verdict",
            "ring_extra_temp_gb": round(results["ring"]["temp_gb"]
                                        - results["windowed"]["temp_gb"], 3),
            "ring_extra_peak_gb": round(results["ring"]["peak_gb"]
                                        - results["windowed"]["peak_gb"], 3),
            "field_gb": field_gb,
        }), flush=True)


if __name__ == "__main__":
    main()
