#!/usr/bin/env python
"""Measure the in-place-HBM-write effect and its UNREAD-SINK variant.

Round-3 discovery (BASELINE.md 2026-08-19): a Pallas kernel writing a
fresh HBM buffer streams at ~330 GB/s aggregate; the same kernel writing
the buffer it just read (input_output_aliases) streams at ~660. Round 3
applied this to every fused update kernel but NOT to the SpMM itself,
whose only field input (X = the solver's P) is still live at the call —
so the SpMM output Y cannot alias a buffer the kernel READS.

The design question this probe answers (VERDICT r4 item 1): does aliasing
Y onto a dead-but-UNREAD extra operand (an ANY-space "sink" threaded from
the solver carry — the previous iteration's dead Z) recover the in-place
write rate? Three variants of the same elementwise kernel, at a streaming
size (k=32, n=2^21: 256 MB/field, 2x the 128 MB VMEM):

  fresh    y = c*x, new output buffer                  (expect ~slow)
  inplace  y = c*x, y aliased onto x                   (expect ~fast)
  sink     y = c*x, unread dead z in ANY space,
           y aliased onto z                            (the question)

Timing: chained applies routed through the carry (real data dependence),
per-length minima over rounds, one least-squares slope fit — the
CLAUDE.md methodology. Prints one JSON line.
"""

from __future__ import annotations

import functools
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def make_kernels():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K, N = 32, 1 << 21
    R = 8192
    nb = N // R
    spec = pl.BlockSpec((K, R), lambda i: (0, i), memory_space=pltpu.VMEM)

    def body(x_ref, y_ref):
        y_ref[:] = x_ref[:] * 1.0000001

    def body_sink(x_ref, z_ref, y_ref):
        del z_ref  # dead operand, never read — only its buffer is reused
        y_ref[:] = x_ref[:] * 1.0000001

    @jax.jit
    def fresh(x):
        return pl.pallas_call(
            body, grid=(nb,), in_specs=[spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((K, N), jnp.float32),
        )(x)

    @jax.jit
    def inplace(x):
        return pl.pallas_call(
            body, grid=(nb,), in_specs=[spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((K, N), jnp.float32),
            input_output_aliases={0: 0},
        )(x)

    @jax.jit
    def sink(x, z):
        return pl.pallas_call(
            body_sink, grid=(nb,),
            in_specs=[spec, pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((K, N), jnp.float32),
            input_output_aliases={1: 0},
        )(x, z)

    # sink_vmem: the dead operand rides an ordinary VMEM BlockSpec (so it
    # IS DMA'd in, wasting a read pass) — separates "alias needs the read"
    # from "alias needs the VMEM pipeline".
    @jax.jit
    def sink_vmem(x, z):
        return pl.pallas_call(
            body_sink, grid=(nb,), in_specs=[spec, spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((K, N), jnp.float32),
            input_output_aliases={1: 0},
        )(x, z)

    return (K, N), fresh, inplace, sink, sink_vmem


def measure(step1, step2, K, N, lengths=(8, 136, 264), rounds=3):
    """step1(x)->y chained; step2(x, z)->y chained as (y, x)."""
    import jax
    import jax.numpy as jnp

    two_arg = step2 is not None

    @functools.partial(jax.jit, static_argnames=("m",))
    def loop(x, z, m):
        def it(_, carry):
            a, b = carry
            if two_arg:
                return step2(a, b), a
            return step1(a), a

        a, b = jax.lax.fori_loop(0, m, it, (x, z))
        return a

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((K, N)), dtype=jnp.float32)
    z = x * 0.5
    best: dict[int, float] = {}
    for _ in range(rounds):
        for m in lengths:
            y = loop(x, z, m)
            _ = float(jnp.sum(y))  # warm
            t0 = time.time()
            y = loop(x, z, m)
            _ = float(jnp.sum(y))
            dt = time.time() - t0
            best[m] = min(best.get(m, float("inf")), dt)
    xs = sorted(best)
    xb = sum(xs) / len(xs)
    yb = sum(best[m] for m in xs) / len(xs)
    slope = (sum((m - xb) * (best[m] - yb) for m in xs)
             / sum((m - xb) ** 2 for m in xs))
    return slope


def main():
    import blockcg_tpu  # noqa: F401  — enables the compilation cache
    import jax

    (K, N), fresh, inplace, sink, sink_vmem = make_kernels()
    bytes_pass = 4 * K * N  # one field pass
    out = {"probe": "write_alias", "K": K, "N": N,
           "device": str(jax.devices()[0])}
    for name, s1, s2, passes in (
        ("fresh", fresh, None, 2),        # read x + write y
        ("inplace", inplace, None, 2),    # read x + write x
        ("sink", None, sink, 2),          # read x + write z (unread)
        ("sink_vmem", None, sink_vmem, 3),  # read x + read z + write z
    ):
        dt = measure(s1, s2, K, N)
        gbs = passes * bytes_pass / dt / 1e9
        out[name] = {"ms": round(dt * 1e3, 4),
                     "agg_gbs": round(gbs, 1), "passes": passes}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
