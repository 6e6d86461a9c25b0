"""TPU-target halo/compute overlap evidence WITHOUT a pod (VERDICT r2 item 5).

SURVEY §8 hard part 3 requires verifying that XLA overlaps the halo
``ppermute`` with the interior SpMM. The CPU backend provably serializes
(bench_comm.py: ``hlo_async_permute: false``), so the question must be
answered against TPU-compiled HLO. This script tries, in order:

1. AOT compile-only for a MULTI-CHIP TPU topology
   (``jax.experimental.topologies.get_topology_desc``) — no chips needed if
   the PJRT plugin supports topology descriptions;
2. the SAME check compiled for the single REAL chip with a forced 8-way
   ``Mesh`` over one device is impossible — instead we lower (unoptimized)
   to confirm the collective structure, which shows intent but not the
   scheduler's decision.

For each path it reports a JSON verdict:
  {"path": ..., "ok": bool, "async_permute": bool|null, "detail": ...}

``async_permute`` is True when the optimized HLO contains
``collective-permute-start`` ... ``collective-permute-done`` with real
compute (the fused interior kernel / custom-call) scheduled BETWEEN them —
the latency-hiding signature. Run on a pod slice, the same check applies to
the actually-executing module (see BASELINE.md pod-day checklist).
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _dist_lowerable(n_dev: int):
    """(fn, args, mesh-free closure) for the distributed DIA apply."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P

    from blockcg_tpu.parallel.api import shard_map
    from blockcg_tpu.parallel.dist_ops import partition_dia
    from blockcg_tpu.problems import laplacian_dia

    shape = (16 * n_dev, 32)
    op = laplacian_dia(shape, dtype=jnp.float32)
    dop = partition_dia(op, n_dev)
    rng = np.random.default_rng(0)
    Xt = jnp.asarray(rng.standard_normal((8, op.n)), dtype=jnp.float32)

    def make(mesh):
        fn = shard_map(
            lambda o, xt: o.matmat_t(xt),
            mesh=mesh,
            in_specs=(dop.in_specs(), P(None, "rows")),
            out_specs=P(None, "rows"),
            check_vma=True,
        )
        return jax.jit(fn), (dop, Xt)

    return make


def _analyze(hlo_text: str) -> dict:
    """Does real compute sit inside a collective-permute start/done window?"""
    lines = hlo_text.splitlines()
    starts = [i for i, l in enumerate(lines)
              if "collective-permute-start" in l]
    dones = [i for i, l in enumerate(lines) if "collective-permute-done" in l]
    if not starts:
        return {"async_permute": False, "detail": "no async collective-permute in HLO"}
    compute_pat = re.compile(r"fusion|custom-call|dot|convolution|reduce")
    windows = []
    for s in starts:
        d = min((j for j in dones if j > s), default=None)
        if d is None:
            continue
        inside = [l.strip()[:100] for l in lines[s + 1 : d]
                  if compute_pat.search(l)]
        windows.append({"span": d - s, "compute_inside": inside[:5],
                        "n_compute": len(inside)})
    ok = any(w["n_compute"] > 0 for w in windows)
    return {"async_permute": ok, "windows": windows[:4],
            "detail": f"{len(starts)} start/done pairs"}


def _run_topology(topo_name: str) -> None:
    """Single topology attempt — run in a SUBPROCESS: the axon plugin's
    compile path rides the remote tunnel, which blocks indefinitely during
    outages (auto-memory axon-tpu-tunnel-quirks)."""
    import jax  # noqa: F401
    from jax.experimental import topologies
    from jax.sharding import Mesh
    import numpy as np

    topo = topologies.get_topology_desc(topo_name)
    devs = np.array(topo.devices[:8]).reshape(8)
    mesh = Mesh(devs, ("rows",))
    make = _dist_lowerable(8)
    jitted, args = make(mesh)
    hlo = jitted.lower(*args).compile().as_text()
    res = {"path": f"topology:{topo_name}", "ok": True}
    res.update(_analyze(hlo))
    print(json.dumps(res), flush=True)


def _run_cpu_mesh() -> None:
    """Fallback evidence: optimized CPU-mesh HLO — proves the program
    structure (interior kernel independent of the halo), not the TPU
    scheduler's decision."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from blockcg_tpu.utils.platform import force_cpu_mesh

    force_cpu_mesh(8, require=True)
    from blockcg_tpu.parallel.api import row_mesh

    make = _dist_lowerable(8)
    jitted, args = make(row_mesh(8))
    hlo = jitted.lower(*args).compile().as_text()
    res = {"path": "cpu-mesh-optimized", "ok": True}
    res.update(_analyze(hlo))
    print(json.dumps(res), flush=True)


def main() -> None:
    import argparse
    import subprocess

    ap = argparse.ArgumentParser()
    ap.add_argument("--one", default=None,
                    help="internal: run a single path in-process")
    ap.add_argument("--timeout", type=int, default=420)
    args = ap.parse_args()

    if args.one is not None:
        if args.one == "cpu":
            _run_cpu_mesh()
        else:
            _run_topology(args.one)
        return

    results = []
    for name in ("v5e:2x4", "v4:2x2x1", "cpu"):
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one", name],
                capture_output=True, text=True, timeout=args.timeout,
            )
            out = [l for l in r.stdout.splitlines() if l.startswith("{")]
            if r.returncode == 0 and out:
                results.append(json.loads(out[-1]))
            else:
                err = (r.stderr.strip().splitlines() or ["failed"])[-1]
                results.append({"path": name, "ok": False,
                                "detail": err[:300]})
        except subprocess.TimeoutExpired:
            results.append({"path": name, "ok": False,
                            "detail": f"timed out after {args.timeout}s "
                            "(remote-compile tunnel down?)"})

    for r in results:
        print(json.dumps(r), flush=True)
    verdict = next((r for r in results
                    if r.get("ok") and "topology" in r.get("path", "")), None)
    if verdict is None:
        print(json.dumps({
            "finding": "blocked",
            "why": "no TPU topology compile available in-sandbox",
            "pod_day": "run this script on the pod slice: the topology "
                       "check applies verbatim to the attached topology",
        }), flush=True)


if __name__ == "__main__":
    main()
