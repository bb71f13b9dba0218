#!/usr/bin/env python3
"""Measure REAL per-kernel device seconds for the sorted-encode pipeline.

The op ledger's static counts miss data-dependent work: the extension
kernels' adaptive chunk-delta sweeps are dynamic loops whose trip counts
depend on the lag distribution of the corpus (`_select_extend_kernel`'s
`sweep`), and the ledger counts them at ONE iteration. This script runs
each production sub-kernel separately ON THE DEVICE with real corpus
data (one 128-lane group of xml blocks) and reports wall seconds per
kernel, so the encode wall-time decomposition is measured, not modeled.

Reference analog: per-phase max-cycles attribution
(snappy/scripts/parse_output_file.py:6-28).

Writes docs/device_kernel_times.json. Run on the device endpoint.
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

from pim_compression_tpu import native
from pim_compression_tpu.ops import pallas_encode as pe
from pim_compression_tpu.ops import pallas_match as pm

LANES = 128


def corpus_group(bs: int):
    """One (bs, 128) i8 group + lens from real xml bytes."""
    plain = native.decompress(
        pathlib.Path("/root/reference/test/xml.snappy").read_bytes()
    )
    need = bs * LANES
    rep = (need + len(plain) - 1) // len(plain)
    buf = np.frombuffer((plain * rep)[:need], np.uint8)
    data = buf.reshape(LANES, bs).T.astype(np.int8)  # (bs, 128)
    lens = np.zeros((8, LANES), np.int32)
    lens[0] = bs
    return jnp.asarray(data), jnp.asarray(lens)


def timed(name: str, fn, *args, iters: int = 3) -> tuple[float, object]:
    t0 = time.perf_counter()
    out = fn(*args)
    first = jax.tree.leaves(out)[0]
    np.asarray(first).ravel()[:1]  # sync through the tunnel
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        first = jax.tree.leaves(out)[0]
        np.asarray(first).ravel()[:1]
        best = min(best, time.perf_counter() - t0)
    print(f"{name:<42} compile {compile_s:7.1f}s   run {best:8.4f}s")
    return best, out


def main() -> int:
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    sel_cap, ext_cap = 16, 48
    data, lens = corpus_group(bs)
    vmem_cap = pltpu.CompilerParams(vmem_limit_bytes=126 * 1024 * 1024)
    rows: list[dict] = []

    def record(name, secs, payload=bs * LANES):
        rows.append(
            {
                "kernel": name,
                "bs": bs,
                "payload_bytes": payload,
                "measured_s": round(secs, 5),
                "gbps": round(payload / secs / 1e9, 5),
            }
        )

    # 1. rung sort (L=4, full density)
    sort_call = pl.pallas_call(
        functools.partial(pm._sort_rung_kernel, bs=bs, rung=4, stride=1),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bs, LANES), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((bs, LANES), jnp.int32),
            pltpu.VMEM((bs, LANES), jnp.int32),
        ],
        compiler_params=vmem_cap,
    )
    s, cand = timed("sort rung L=4", jax.jit(sort_call), data)
    record("sort rung L=4", s)
    cand = jnp.asarray(np.asarray(cand))  # pin on device as a value

    # 2. prev-step composition
    prev_call = pl.pallas_call(
        functools.partial(pm._prev_step_kernel, bs=bs, hbm=False),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bs, LANES), jnp.int32),
        scratch_shapes=[pltpu.VMEM((bs, LANES), jnp.int32)],
        compiler_params=vmem_cap,
    )
    s, cand2 = timed("prev step (2nd-nearest)", jax.jit(prev_call), cand, cand)
    record("prev step", s)
    cand2 = jnp.asarray(np.asarray(cand2))

    # 3. fused select-then-extend over both candidate arrays
    sel_call = pl.pallas_call(
        functools.partial(
            pm._select_extend_kernel, bs=bs, n_cands=2,
            sel_rounds=sel_cap // 4, rounds=ext_cap // 4, hbm=False,
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bs, LANES), jnp.int32),
        scratch_shapes=[pltpu.VMEM((bs, LANES), jnp.int32)],
        compiler_params=vmem_cap,
    )
    s, best = timed(
        f"select-extend 2 cands sel{sel_cap} ext{ext_cap}",
        jax.jit(sel_call), data, lens, cand, cand2,
    )
    record(f"select-extend sel{sel_cap} ext{ext_cap}", s)

    # 3b. the r3 shape (ext 64) for comparison
    sel_call64 = pl.pallas_call(
        functools.partial(
            pm._select_extend_kernel, bs=bs, n_cands=2,
            sel_rounds=sel_cap // 4, rounds=16, hbm=False,
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bs, LANES), jnp.int32),
        scratch_shapes=[pltpu.VMEM((bs, LANES), jnp.int32)],
        compiler_params=vmem_cap,
    )
    s, _ = timed(
        f"select-extend 2 cands sel{sel_cap} ext64 (r3)",
        jax.jit(sel_call64), data, lens, cand, cand2,
    )
    record(f"select-extend sel{sel_cap} ext64", s)

    # 4. emit kernel (greedy + layout + route), fed by the real matcher
    best_np = np.asarray(best)
    mlen = jnp.asarray((best_np >> 16).astype(np.int8))
    mlag = jnp.asarray((best_np & 0xFFFF).astype(np.int16))
    cap = pe.encode_capacity(bs)
    nrows = pe._route_rows(bs, cap)
    emit_call = pl.pallas_call(
        functools.partial(pe._emit_kernel, bs=bs, cap=cap),
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (1, 8, LANES), lambda g: (g, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, cap, LANES), lambda g: (g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 8, LANES), lambda g: (g, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, cap, LANES), jnp.int8),
            jax.ShapeDtypeStruct((1, 8, LANES), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bs, LANES), jnp.int32),  # copy
            pltpu.VMEM((nrows, LANES), jnp.int32),  # W_s
            pltpu.VMEM((bs + pe._chb(bs), LANES), jnp.int32),  # rank
            pltpu.VMEM((nrows, LANES), jnp.int32),  # PAY
            pltpu.VMEM((pe._stg_rows(bs), LANES), jnp.int32),  # STG
            pltpu.VMEM((bs, LANES), jnp.int32),  # meta_s
            pltpu.VMEM((bs, LANES), jnp.int8),  # B8
            pltpu.VMEM((bs, LANES), jnp.int16),  # MLAG16
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=vmem_cap,
    )
    d3 = data[None]
    m3 = mlen[None]
    g3 = mlag[None]
    l3 = lens[None]
    s, _ = timed("emit (greedy+layout+route)", jax.jit(emit_call), d3, m3, g3, l3)
    record("emit greedy+layout+route", s)

    total = sum(r["measured_s"] for r in rows if "ext64" not in r["kernel"])
    print(f"\npipeline total (ext48 path) {total:.3f}s for {bs * LANES / 1e6:.1f} MB"
          f" -> {bs * LANES / total / 1e9:.4f} GB/s (one lane group)")
    out = {"bs": bs, "rows": rows, "pipeline_total_s": round(total, 4)}
    path = REPO / "docs" / "device_kernel_times.json"
    path.write_text(json.dumps(out, indent=2) + "\n")
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
