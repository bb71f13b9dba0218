#!/usr/bin/env python3
"""Decompose per-dispatch cost on the device endpoint.

device_kernel_times measured ~0.55-0.68 s per kernel dispatch at
bs=32768 x 128 lanes regardless of the kernel's actual op count (sort
0.558, prev 0.582, select 0.677) while the chain-loop calibration showed
a 27 ms dispatch floor with tiny operands. Hypothesis: the endpoint
ships VMEM-spec'd operands through the tunnel per dispatch (functional-
emulator style), so wall time ~ operand bytes, not compute. This probe
times trivial (x+1) dispatches across operand sizes, plus an in-place
heavy-compute variant, to separate: fixed dispatch cost | per-input-byte
cost | per-output-byte cost | per-vreg compute cost.

Writes docs/transfer_probe.json.
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import functools

LANES = 128


def kern_copy(x_ref, o_ref, *, out_rows):
    o_ref[...] = x_ref[0:out_rows, :] + jnp.int32(1)


def kern_compute(x_ref, o_ref, *, iters):
    def body(i, v):
        return (v * jnp.int32(-1640531527)) ^ (v >> 3)

    v = jax.lax.fori_loop(0, iters, body, x_ref[...])
    o_ref[...] = jnp.sum(
        v.reshape(v.shape[0] // 8, 8, LANES), axis=0
    )


def timed(fn, x, iters=3):
    y = fn(x)
    np.asarray(y).ravel()[:1]
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        y = fn(x)
        np.asarray(y).ravel()[:1]
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> int:
    rows_list = [(8, 8), (4096, 8), (32768, 8), (32768, 32768), (8, 32768)]
    out = []
    for in_rows, out_rows in rows_list:
        fn = pl.pallas_call(
            functools.partial(kern_copy, out_rows=min(out_rows, in_rows))
            if out_rows <= in_rows
            else (lambda x_ref, o_ref: o_ref.__setitem__(
                ..., jnp.broadcast_to(x_ref[0:1, :], (out_rows, LANES)))),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((out_rows, LANES), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=126 * 1024 * 1024
            ),
        )
        x = jnp.zeros((in_rows, LANES), jnp.int32)
        t = timed(jax.jit(fn), x)
        rec = {
            "kind": "copy", "in_mb": in_rows * 512 / 1e6,
            "out_mb": out_rows * 512 / 1e6, "t_s": round(t, 4),
        }
        out.append(rec)
        print(rec, flush=True)

    for rows, iters in [(4096, 100), (4096, 2000), (4096, 8000)]:
        fn = pl.pallas_call(
            functools.partial(kern_compute, iters=iters),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, LANES), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=126 * 1024 * 1024
            ),
        )
        x = jnp.zeros((rows, LANES), jnp.int32)
        t = timed(jax.jit(fn), x)
        rec = {
            "kind": "compute", "rows": rows, "iters": iters,
            "vregs": iters * 3 * rows // 8, "t_s": round(t, 4),
        }
        out.append(rec)
        print(rec, flush=True)

    path = REPO / "docs" / "transfer_probe.json"
    path.write_text(json.dumps(out, indent=2) + "\n")
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
