#!/usr/bin/env python3
"""Attribute decode route-kernel time: resolve phase vs everything else.

K-slope times _route_kernel at resolve_rounds=17 (production) and
resolve_rounds=0 (phases 1-5 + 7 only; output wrong, timing valid) on
real corpus token groups. The difference is the adaptive pointer-jumping
resolve phase (docs/device_kernel_attrib.json measured the whole kernel
at 66.2 ms/group).
"""

from __future__ import annotations

import functools
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

from pim_compression_tpu import native
from pim_compression_tpu.ops import pallas_decode as pd
from pim_compression_tpu.runtime import pipeline as rp

LANES = 128
SUBLANES = 8


def main() -> int:
    bs = 32768
    NG = 5
    plain = native.decompress(
        pathlib.Path("/root/reference/test/xml.snappy").read_bytes()
    )
    need = bs * LANES * NG
    rep = (need + len(plain) - 1) // len(plain)
    plain = (plain * rep)[:need]
    stream = native.compress(plain, block_size=bs)
    info = rp.scan_frames(stream)
    cap = rp.padded_capacity(bs)
    comp_np, clen_np, olen_np = rp.blockize_compressed(stream, info, LANES * NG)

    comp_g = [
        jax.device_put(jnp.asarray(np.ascontiguousarray(
            np.array(comp_np[g * LANES : (g + 1) * LANES]).T.astype(np.int32)
        )[:, None, :]))
        for g in range(NG)
    ]
    clen_g = [jax.device_put(jnp.asarray(clen_np[g*LANES:(g+1)*LANES][None])) for g in range(NG)]
    olen_g = [jax.device_put(jnp.asarray(olen_np[g*LANES:(g+1)*LANES][None])) for g in range(NG)]

    chunk = LANES

    def dfa_call():
        return pl.pallas_call(
            functools.partial(pd._dfa_kernel, chunk=chunk, cap=cap, bias=0,
                              block_size=bs, wide=False),
            grid=(cap // chunk,),
            in_specs=[
                pl.BlockSpec((chunk, 1, LANES), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, LANES), lambda g: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, LANES), lambda g: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((chunk, 1, LANES), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, LANES), lambda g: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((cap, 1, LANES), jnp.int32),
                jax.ShapeDtypeStruct((1, LANES), jnp.int32),
            ],
            scratch_shapes=[pltpu.VMEM((7, 1, LANES), jnp.int32)],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=126 * 1024 * 1024),
        )

    tokens_g = [
        jax.jit(lambda c, cl, ol: dfa_call()(c, cl, ol)[0].transpose(1, 0, 2))(c, cl, ol)
        for c, cl, ol in zip(comp_g, clen_g, olen_g)
    ]
    olen3_g = [
        jax.device_put(jnp.broadcast_to(
            jnp.asarray(olen_np[g*LANES:(g+1)*LANES][None])[:, None, :],
            (1, SUBLANES, LANES)).astype(jnp.int32))
        for g in range(NG)
    ]

    def route_call(rr):
        return pl.pallas_call(
            functools.partial(pd._route_kernel, cap=cap, block_size=bs,
                              resolve_rounds=rr),
            grid=(1,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((1, SUBLANES, LANES), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, bs, LANES), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, SUBLANES, LANES), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((1, bs, LANES), jnp.int8),
                jax.ShapeDtypeStruct((1, SUBLANES, LANES), jnp.int32),
            ],
            scratch_shapes=[
                pltpu.VMEM((cap + pd._pick_chunk(cap), LANES), jnp.int32),
                pltpu.VMEM((max(cap, bs) + pd._pick_chunk(cap), LANES), jnp.int32),
                pltpu.VMEM((bs, LANES), jnp.int32),
                pltpu.VMEM((2 * bs, LANES), jnp.int32),
                pltpu.SemaphoreType.DMA,
            ],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=126 * 1024 * 1024),
        )

    results = []
    for rr in (17, 0):
        times = {}
        for k in (1, 5):
            call = route_call(rr)

            def fn(*tups):
                tot = jnp.int32(0)
                for t, o in tups:
                    out, err = call(t, o)
                    tot = tot + jnp.sum(out.astype(jnp.int32)) + jnp.sum(err)
                return tot

            jf = jax.jit(fn)
            args = list(zip(tokens_g, olen3_g))[:k]
            t0 = time.perf_counter()
            np.asarray(jf(*args))
            comp_s = time.perf_counter() - t0
            best = float("inf")
            for _ in range(4):
                t0 = time.perf_counter()
                np.asarray(jf(*args))
                best = min(best, time.perf_counter() - t0)
            times[k] = best
        per = (times[5] - times[1]) / 4
        print(f"resolve_rounds={rr}: per-call {per*1e3:.2f} ms (compile {comp_s:.1f}s)",
              flush=True)
        results.append({"resolve_rounds": rr, "per_call_s": round(per, 5)})

    (REPO / "docs" / "route_phase_times.json").write_text(
        json.dumps(results, indent=2) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
