#!/usr/bin/env python3
"""Is the endpoint silicon or emulator? MXU / HBM / VPU slope probes.

DESIGN.md's 2026-08-17 microbenchmarks (0.9 TFLOP/s matmul, 0.45 GB/s
elementwise) concluded "functional emulator ~300-2000x below silicon" —
but they materialized multi-MB outputs through the ~10 MB/s tunnel
(transfer_probe.json), so they measured the tunnel. This probe re-runs
the same three questions transfer-clean: K-slope timing (K vs 2K chained
evaluations inside one jit, distinct inputs, checksum-only d2h) of
  - MXU: 2048^3 bf16 matmul chains        (peak v5e ~ 394 TFLOP/s)
  - HBM: 64 MB f32 elementwise triad      (peak v5e ~ 819 GB/s)
  - VPU: dependent int32 chain (ILP=8)    (latency-bound reference)
Writes docs/hw_probe.json with achieved fraction-of-peak per unit.
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np
import jax
import jax.numpy as jnp


def kslope(name, fn_k, args_builder, work_per_call, unit, peak, out):
    times = {}
    for k in (1, 3):
        fn = jax.jit(fn_k(k), static_argnums=())
        args = args_builder()
        np.asarray(fn(*args))  # compile + run
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            np.asarray(fn(*args))
            best = min(best, time.perf_counter() - t0)
        times[k] = best
    per = (times[3] - times[1]) / 2
    rate = work_per_call / per if per > 0 else float("inf")
    rec = {
        "probe": name, "t1_s": round(times[1], 5), "t3_s": round(times[3], 5),
        "per_call_s": round(per, 6), f"achieved_{unit}": round(rate / 1e12, 4)
        if unit == "tflops" else round(rate / 1e9, 3),
        "peak": peak, "fraction_of_peak": round(rate / (peak * (1e12 if unit == "tflops" else 1e9)), 4),
    }
    out.append(rec)
    print(rec, flush=True)


def main() -> int:
    out = []
    N = 2048

    # MXU: chain matmuls so K evaluations cannot be CSE'd or overlapped
    # away; each adds 2*N^3 flops.
    def mm_k(k):
        def fn(a, b):
            x = a
            for _ in range(k):
                x = jnp.dot(x, b, preferred_element_type=jnp.bfloat16)
                x = x * jnp.bfloat16(0.5)  # keep values bounded
            return jnp.sum(x[:8, :8].astype(jnp.float32))

        return fn

    key = jax.random.PRNGKey(0)
    a = jax.device_put(jax.random.normal(key, (N, N), jnp.bfloat16))
    b = jax.device_put(jax.random.normal(jax.random.PRNGKey(1), (N, N), jnp.bfloat16))
    kslope("mxu matmul 2048^3 bf16", mm_k, lambda: (a, b),
           2 * N ** 3, "tflops", 394, out)

    # HBM: 64 MB triad per evaluation (read 2x64MB, write 64MB -> 192 MB
    # moved); chained so each iteration depends on the last.
    M = 16 * 1024 * 1024  # f32 elements = 64 MB

    def triad_k(k):
        def fn(x, y):
            for _ in range(k):
                x = x * jnp.float32(1.0000001) + y
            return jnp.sum(x[:1024])

        return fn

    x = jax.device_put(jnp.ones((M,), jnp.float32))
    y = jax.device_put(jnp.full((M,), 1e-6, jnp.float32))
    kslope("hbm triad 64MB f32", triad_k, lambda: (x, y),
           3 * M * 4, "gbps", 819, out)

    # VPU: dependent int32 chain on one (8,128) vreg — latency reference.
    def chain_k(k):
        def fn(v):
            def body(i, v):
                return (v * jnp.int32(-1640531527)) ^ (v >> 3)

            for _ in range(k):
                v = jax.lax.fori_loop(0, 1_000_000, body, v)
            return jnp.sum(v)

        return fn

    v = jax.device_put(jnp.ones((8, 128), jnp.int32))
    kslope("vpu dependent chain 3Mops", chain_k, lambda: (v,),
           3_000_000, "gbps", 1.0, out)  # "gbps" = Gop/s here

    # Gather: dependent chain of (128,128) take_along_axis(axis=1) — the
    # primitive the select-extend sweep and decode resolve are built on.
    # Rate unit: G-gathers/s of (128,128) planes (16 vregs each).
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def gather_kernel(x_ref, i_ref, o_ref, *, iters):
        x = x_ref[...]
        idx = i_ref[...]

        def body(_, x):
            g = jnp.take_along_axis(x, idx, axis=1)
            return g ^ jnp.int32(1)  # dependent: next gather reads result

        o_ref[...] = jax.lax.fori_loop(0, iters, body, x)[0:8]

    def gather_k(k):
        calls = [
            pl.pallas_call(
                functools.partial(gather_kernel, iters=10_000),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            )
            for _ in range(k)
        ]

        def fn(x, i):
            tot = jnp.int32(0)
            for j, c in enumerate(calls):
                tot = tot + jnp.sum(c(x + j, i))
            return tot

        return fn

    xg = jax.device_put(jnp.arange(128 * 128, dtype=jnp.int32).reshape(128, 128))
    ig = jax.device_put(
        jnp.asarray(
            np.random.RandomState(0).randint(0, 128, (128, 128)).astype(np.int32)
        )
    )
    kslope("gather chain (128,128) x10K", gather_k, lambda: (xg, ig),
           10_000, "gbps", 1.0, out)  # G-gathers/s

    # Same chain with a plain elementwise op for reference.
    def ew_kernel(x_ref, i_ref, o_ref, *, iters):
        x = x_ref[...]
        idx = i_ref[...]

        def body(_, x):
            return (x + idx) ^ jnp.int32(1)

        o_ref[...] = jax.lax.fori_loop(0, iters, body, x)[0:8]

    def ew_k(k):
        calls = [
            pl.pallas_call(
                functools.partial(ew_kernel, iters=10_000),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            )
            for _ in range(k)
        ]

        def fn(x, i):
            tot = jnp.int32(0)
            for j, c in enumerate(calls):
                tot = tot + jnp.sum(c(x + j, i))
            return tot

        return fn

    kslope("elementwise chain (128,128) x10K", ew_k, lambda: (xg, ig),
           10_000, "gbps", 1.0, out)

    path = REPO / "docs" / "hw_probe.json"
    path.write_text(json.dumps(out, indent=2) + "\n")
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
