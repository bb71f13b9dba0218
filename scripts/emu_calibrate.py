#!/usr/bin/env python3
"""Calibrate the emulator cost model against kernels of KNOWN op counts.

VERDICT r3 item 3: the ledger's emulator cross-check constants did not
reproduce measured emulator times (30-65x off). Two causes were found and
fixed in round 4:

1. the ledger counted pallas grid bodies ONCE (scripts/op_ledger.py now
   multiplies by the grid size), and
2. the constants themselves were fit to a single point.

This script runs pallas kernels whose jaxpr-level op count and vreg count
are exact by construction (no dynamic loops, no grid), sweeps both axes
independently, least-squares fits

    t  =  c_op * n_ops  +  c_vreg * vreg_ops  (+ t0 dispatch overhead)

and writes docs/emu_model.json with the fit, the per-point residuals, and
the raw measurements. op_ledger.py reads the fitted constants when the
file exists.

Each calibration kernel is a chain of ``iterate`` dependent int32 adds over
a (rows, 128) VMEM array: n_ops = iterate (+ loop/load/store overhead
counted from the jaxpr), vreg_ops = iterate * rows / 8. Points:

- rows = 8   (1 vreg/op): time ~ c_op * n      -> per-op dispatch cost
- rows = 4096 (512 vregs/op): time ~ c_vreg * vregs -> per-vreg cost

Run ON THE DEVICE endpoint (no JAX_PLATFORMS=cpu); syncs with a small
readback after every dispatch (axon queue discipline, DESIGN.md).
"""

from __future__ import annotations

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import functools
import json
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, str(REPO / "scripts"))
from op_ledger import count_jaxpr, _total  # noqa: E402

LANES = 128


def chain_kernel(x_ref, o_ref, *, iterate: int, rows: int):
    # Nonlinear recurrence: a `v + 1` chain strength-reduces to `v + N`
    # (observed: measured time flat in the trip count), so each step must
    # be data-dependent and non-collapsible. Three vector ops per step.
    def body(i, v):
        return (v * jnp.int32(-1640531527)) ^ (v >> 3)

    v = jax.lax.fori_loop(
        0, iterate, body,
        jnp.broadcast_to(x_ref[0:1, :], (rows, LANES))
        + jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0),
    )
    # Constant-size output (8, 128) regardless of rows: keeps the d2h
    # readback out of the compute measurement (transfer scales with rows
    # otherwise and swamps the fit — observed 25-150 ms of pure
    # dispatch+transfer on the tunnel). MUST fold every row into the
    # output: storing v[0:8] alone let the compiler dead-code the other
    # rows' loop work entirely (observed: rows=8192 x 50K iterations ran
    # exactly as fast as rows=8 — 153M "vreg-ops" in 0.4 ms).
    o_ref[...] = jnp.sum(
        v.reshape(rows // SUBLANES, SUBLANES, LANES), axis=0
    )


SUBLANES = 8


def build(rows: int, iterate: int):
    fn = pl.pallas_call(
        functools.partial(chain_kernel, iterate=iterate, rows=rows),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((SUBLANES, LANES), jnp.int32),
    )
    jaxpr = jax.make_jaxpr(fn)(jnp.zeros((SUBLANES, LANES), jnp.int32))
    tally = count_jaxpr(jaxpr)
    return fn, _total(tally), int(tally.get("__n_ops__", 0))


def measure(fn, rows: int, iters: int = 3) -> float:
    x = jnp.zeros((SUBLANES, LANES), jnp.int32)
    y = fn(x)
    np.asarray(y).ravel()[:1]  # warm compile + sync
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        y = fn(x)
        np.asarray(y).ravel()[:1]
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> int:
    points = []
    # op axis: tiny arrays, growing op chains; vreg axis: big arrays.
    # The dispatch floor through the tunnel is ~30-50 ms: points must be
    # big enough that per-op / per-vreg costs rise well above it (the
    # first fit used <=24K-op points and resolved only t0).
    for rows, iterate in [
        (8, 2_000), (8, 100_000), (8, 400_000), (8, 1_600_000),
        (1024, 2_000), (1024, 100_000),
        (8192, 1_000), (8192, 12_000), (8192, 50_000),
    ]:
        print(f"building rows={rows} it={iterate} ...", flush=True)
        fn, vregs, n_ops = build(rows, iterate)
        t = measure(fn, rows)
        points.append(
            {"rows": rows, "iterate": iterate, "vreg_ops": vregs,
             "n_ops": n_ops, "measured_s": round(t, 5)}
        )
        print(f"rows={rows:>5} it={iterate:>7} vregs={vregs:>10,} "
              f"n_ops={n_ops:>9,} t={t:.4f}s", flush=True)

    # Least squares: t = t0 + c_op * n_ops + c_vreg * vregs
    A = np.array([[1.0, p["n_ops"], p["vreg_ops"]] for p in points])
    b = np.array([p["measured_s"] for p in points])
    coef, *_ = np.linalg.lstsq(A, b, rcond=None)
    t0, c_op, c_vreg = (float(c) for c in coef)
    for p in points:
        pred = t0 + c_op * p["n_ops"] + c_vreg * p["vreg_ops"]
        p["predicted_s"] = round(pred, 5)
        p["residual_x"] = round(p["measured_s"] / max(pred, 1e-9), 3)

    out = {
        "model": "t = t0 + c_op * n_ops + c_vreg * vreg_ops",
        "t0_s": t0, "c_op_s": c_op, "c_vreg_s": c_vreg,
        "points": points,
        "note": (
            "fit on static-loop pallas chain kernels (exact op/vreg "
            "counts); production rows with dynamic while loops "
            "under-predict by design (counted at one iteration)"
        ),
    }
    path = REPO / "docs" / "emu_model.json"
    path.write_text(json.dumps(out, indent=2) + "\n")
    print(f"\nfit: t0={t0:.2e}s c_op={c_op:.2e}s c_vreg={c_vreg:.2e}s")
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
