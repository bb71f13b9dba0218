#!/usr/bin/env python3
"""Per-kernel device-time attribution by K-slope, on real corpus groups.

``device_pipeline_times.json`` measured the production pipelines at
86 ms (encode) / 72 ms (decode) per 4.2 MB lane group — 9-17x below the
ledger's 1-vreg-op/cycle roof, and nearly EQUAL despite a 2.25x vreg
gap. This script finds where the time goes: each production sub-kernel
is timed by the K-slope method — one jit evaluates the kernel on K
distinct real corpus groups (device-resident; checksums are the only
d2h) for K=1 and K=5, and ``(t5 - t1)/4`` is the per-call device time
with the dispatch floor cancelled. Distinct real groups defeat both
result-memoization and CSE while keeping the data-dependent loop trip
counts (extension sweeps, resolve rounds) at corpus-realistic values.

Also times the XLA glue (the u8->i32 cast + transpose feeding the DFA,
and the encode-side group transpose) the same way — glue is invisible
to the op ledger but not to the wall clock.

Writes docs/device_kernel_attrib.json. Run on the device endpoint.
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
from pim_compression_tpu.ops import pallas_encode as pe
from pim_compression_tpu.ops import pallas_match as pm
from pim_compression_tpu.runtime import pipeline as rp

LANES = 128
SUBLANES = 8
KS = (1, 5)
VMEM_CAP = pltpu.CompilerParams(vmem_limit_bytes=126 * 1024 * 1024)


def checksum(x):
    return jnp.sum(x.astype(jnp.int32))


def kslope(name: str, make_fn, inputs: list, payload: int, rows: list):
    """Time jit(sum of fn over the first K inputs) for K in KS; report slope."""
    times = {}
    for k in KS:
        fn = jax.jit(make_fn(k))
        t0 = time.perf_counter()
        np.asarray(fn(*inputs[:k]))
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            np.asarray(fn(*inputs[:k]))
            best = min(best, time.perf_counter() - t0)
        times[k] = best
    per_call = (times[KS[1]] - times[KS[0]]) / (KS[1] - KS[0])
    gbps = payload / per_call / 1e9 if per_call > 0 else float("inf")
    print(
        f"{name:<34} t1 {times[KS[0]]:7.4f}s  t{KS[1]} {times[KS[1]]:7.4f}s"
        f"  per-call {per_call * 1e3:8.2f} ms  {gbps:7.3f} GB/s"
        f"  (first compile {compile_s:.1f}s)",
        flush=True,
    )
    rows.append(
        {
            "kernel": name,
            "t_k1_s": round(times[KS[0]], 5),
            "t_k5_s": round(times[KS[1]], 5),
            "per_call_s": round(per_call, 5),
            "gbps": round(gbps, 4),
        }
    )
    return per_call


def main() -> int:
    bs = int(os.environ.get("PIM_BS", "32768"))
    NG = KS[1]  # distinct real groups needed
    sel_cap, ext_cap = 16, 48

    plain = native.decompress(
        pathlib.Path("/root/reference/test/xml.snappy").read_bytes()
    )
    need = bs * LANES * NG
    rep = (need + len(plain) - 1) // len(plain)
    plain = (plain * rep)[:need]
    blocks_np, _lens = rp.blockize_plain(plain, bs, LANES * NG)
    stream = native.compress(plain, block_size=bs)
    info = rp.scan_frames(stream)
    cap = rp.padded_capacity(bs)
    comp_np, clen_np, olen_np = rp.blockize_compressed(stream, info, LANES * NG)

    # Per-group device-resident inputs (distinct real data per group).
    data_g = [
        jax.device_put(
            jnp.asarray(
                np.ascontiguousarray(
                    np.array(blocks_np[g * LANES : (g + 1) * LANES]).T
                ).astype(np.int8)
            )
        )
        for g in range(NG)
    ]
    lens_np = np.zeros((SUBLANES, LANES), np.int32)
    lens_np[0] = bs
    lens = jax.device_put(jnp.asarray(lens_np))
    comp_g = [
        jax.device_put(
            jnp.asarray(
                np.ascontiguousarray(
                    np.array(comp_np[g * LANES : (g + 1) * LANES])
                    .T.astype(np.int32)
                )[:, None, :]
            )
        )
        for g in range(NG)
    ]
    clen_g = [
        jax.device_put(jnp.asarray(clen_np[g * LANES : (g + 1) * LANES][None]))
        for g in range(NG)
    ]
    olen_g = [
        jax.device_put(jnp.asarray(olen_np[g * LANES : (g + 1) * LANES][None]))
        for g in range(NG)
    ]

    rows: list[dict] = []
    payload = bs * LANES

    # ---- encode sub-kernels ---------------------------------------------
    def sort_call():
        return pl.pallas_call(
            functools.partial(pm._sort_rung_kernel, bs=bs, rung=4, stride=1),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bs, LANES), jnp.int32),
            scratch_shapes=[
                pltpu.VMEM((bs, LANES), jnp.int32),
                pltpu.VMEM((bs, LANES), jnp.int32),
            ],
            compiler_params=VMEM_CAP,
        )

    kslope(
        "enc sort rung L=4",
        lambda k: lambda *ds: sum(checksum(sort_call()(d)) for d in ds),
        data_g, payload, rows,
    )

    # real candidates per group (device-resident; prep is untimed)
    cand_g = [jax.jit(sort_call())(d) for d in data_g]

    # ---- round-5 flagship: rung-pick extend-fold over the (max_lag,
    # sweep_span) grid, with a census-based cost model (VERDICT r4 #5:
    # close the attribution residual with measured trip counts).
    def sort16_call():
        return pl.pallas_call(
            functools.partial(pm._sort_rung_kernel, bs=bs, rung=16, stride=1),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bs, LANES), jnp.int32),
            scratch_shapes=[
                pltpu.VMEM((bs, LANES), jnp.int32),
                pltpu.VMEM((bs, LANES), jnp.int32),
            ],
            compiler_params=VMEM_CAP,
        )

    kslope(
        "enc sort rung L=16",
        lambda k: lambda *ds: sum(checksum(sort16_call()(d)) for d in ds),
        data_g, payload, rows,
    )
    cand16_g = [jax.jit(sort16_call())(d) for d in data_g]

    def extend_call(span):
        return pl.pallas_call(
            functools.partial(
                pm._extend_fold_kernel, bs=bs, rounds=ext_cap // 4,
                span=span,
            ),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bs, LANES), jnp.int32),
            scratch_shapes=[pltpu.VMEM((bs, LANES), jnp.int32)],
            compiler_params=VMEM_CAP,
        )

    # Census iteration counts from docs/sweep_stats.json (same data: xml
    # groups) — the trip-count model the ledger cannot see.
    census = {}
    try:
        grid = json.loads(
            (REPO / "docs" / "sweep_stats.json").read_text()
        )["grid"]
        for row in grid:
            for span in (4, 8, 16):
                census[(row["max_lag"], span)] = row[f"iters_span{span}"]
    except (OSError, KeyError, ValueError):
        pass

    ext_points = []
    for max_lag, span in ((8192, 8), (0, 8), (4096, 16), (8192, 4)):
        zero = jnp.zeros((bs, LANES), jnp.int32)
        sel_g = []
        for c4, c16 in zip(cand_g, cand16_g):
            if max_lag:
                c4c = jnp.where(c4 <= max_lag, c4, 0)
                c16c = jnp.where(c16 <= max_lag, c16, 0)
            else:
                c4c, c16c = c4, c16
            sel_g.append(
                jax.device_put(jnp.where(c16c > 0, c16c, c4c))
            )
        ext_inputs = list(zip(data_g, sel_g))

        def make_ext(k, span=span):
            def fn(*tups):
                tot = jnp.int32(0)
                for d, s in tups:
                    tot = tot + checksum(
                        extend_call(span)(d, lens, s, zero)
                    )
                return tot

            return fn

        per_call = kslope(
            f"enc extend-fold rung-pick cap{max_lag} span{span}",
            make_ext, ext_inputs, payload, rows,
        )
        if (max_lag, span) in census:
            ext_points.append(
                {
                    "max_lag": max_lag, "span": span,
                    "census_iters": census[(max_lag, span)],
                    "measured_s": round(per_call, 5),
                }
            )

    def prev_call():
        return pl.pallas_call(
            functools.partial(pm._prev_step_kernel, bs=bs, hbm=False),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bs, LANES), jnp.int32),
            scratch_shapes=[pltpu.VMEM((bs, LANES), jnp.int32)],
            compiler_params=VMEM_CAP,
        )

    kslope(
        "enc prev step",
        lambda k: lambda *cs: sum(checksum(prev_call()(c, c)) for c in cs),
        cand_g, payload, rows,
    )
    cand2_g = [jax.jit(prev_call())(c, c) for c in cand_g]

    def sel_call():
        return pl.pallas_call(
            functools.partial(
                pm._select_extend_kernel, bs=bs, n_cands=2,
                sel_rounds=sel_cap // 4, rounds=ext_cap // 4, hbm=False,
            ),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bs, LANES), jnp.int32),
            scratch_shapes=[pltpu.VMEM((bs, LANES), jnp.int32)],
            compiler_params=VMEM_CAP,
        )

    sel_inputs = list(zip(data_g, cand_g, cand2_g))

    def make_sel(k):
        def fn(*tups):
            tot = jnp.int32(0)
            for d, c1, c2 in tups:
                tot = tot + checksum(sel_call()(d, lens, c1, c2))
            return tot

        return fn

    kslope(
        f"enc select-extend sel{sel_cap} ext{ext_cap}",
        make_sel, sel_inputs, payload, rows,
    )
    best_g = [
        jax.jit(sel_call())(d, lens, c1, c2)
        for d, c1, c2 in zip(data_g, cand_g, cand2_g)
    ]

    nrows = pe._route_rows(bs, pe.encode_capacity(bs))
    ecap = pe.encode_capacity(bs)

    def emit_call():
        return pl.pallas_call(
            functools.partial(pe._emit_kernel, bs=bs, cap=ecap),
            grid=(1,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(
                    (1, SUBLANES, LANES), lambda g: (g, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=[
                pl.BlockSpec(
                    (1, ecap, LANES), lambda g: (g, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, SUBLANES, LANES), lambda g: (g, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((1, ecap, LANES), jnp.int8),
                jax.ShapeDtypeStruct((1, SUBLANES, LANES), jnp.int32),
            ],
            scratch_shapes=[
                pltpu.VMEM((bs, LANES), jnp.int32),
                pltpu.VMEM((nrows, LANES), jnp.int32),
                pltpu.VMEM((bs + pe._chb(bs), LANES), jnp.int32),
                pltpu.VMEM((nrows, LANES), jnp.int32),
                pltpu.VMEM((pe._stg_rows(bs), LANES), jnp.int32),
                pltpu.VMEM((bs, LANES), jnp.int32),
                pltpu.VMEM((bs, LANES), jnp.int8),
                pltpu.VMEM((bs, LANES), jnp.int16),
                pltpu.SemaphoreType.DMA,
            ],
            compiler_params=VMEM_CAP,
        )

    emit_inputs = []
    for d, b in zip(data_g, best_g):
        mlen = (b >> 16).astype(jnp.int8)
        mlag = (b & 0xFFFF).astype(jnp.int16)
        emit_inputs.append(
            (d[None], mlen[None], mlag[None], lens[None].astype(jnp.int32))
        )

    def make_emit(k):
        def fn(*tups):
            tot = jnp.int32(0)
            for d3, m3, g3, l3 in tups:
                comp, sizes = emit_call()(d3, m3, g3, l3)
                tot = tot + checksum(comp) + checksum(sizes)
            return tot

        return fn

    kslope("enc emit greedy+layout+route", make_emit, emit_inputs, payload, rows)

    # ---- decode sub-kernels ---------------------------------------------
    chunk = LANES

    def dfa_call():
        return pl.pallas_call(
            functools.partial(
                pd._dfa_kernel, chunk=chunk, cap=cap, bias=0,
                block_size=bs, wide=False,
            ),
            grid=(cap // chunk,),
            in_specs=[
                pl.BlockSpec(
                    (chunk, 1, LANES), lambda g: (g, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, LANES), lambda g: (0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (1, LANES), lambda g: (0, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=[
                pl.BlockSpec(
                    (chunk, 1, LANES), lambda g: (g, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, LANES), lambda g: (0, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((cap, 1, LANES), jnp.int32),
                jax.ShapeDtypeStruct((1, LANES), jnp.int32),
            ],
            scratch_shapes=[pltpu.VMEM((7, 1, LANES), jnp.int32)],
            compiler_params=VMEM_CAP,
        )

    dfa_inputs = list(zip(comp_g, clen_g, olen_g))

    def make_dfa(k):
        def fn(*tups):
            tot = jnp.int32(0)
            for c, cl, ol in tups:
                tokens, err = dfa_call()(c, cl, ol)
                tot = tot + checksum(tokens) + checksum(err)
            return tot

        return fn

    kslope("dec DFA parse", make_dfa, dfa_inputs, payload, rows)

    tokens_g = [
        jax.jit(lambda c, cl, ol: dfa_call()(c, cl, ol)[0].transpose(1, 0, 2))(
            c, cl, ol
        )
        for c, cl, ol in dfa_inputs
    ]
    olen3_g = [
        jax.device_put(
            jnp.broadcast_to(
                jnp.asarray(o)[:, None, :], (1, SUBLANES, LANES)
            ).astype(jnp.int32)
        )
        for o in (olen_np[g * LANES : (g + 1) * LANES][None] for g in range(NG))
    ]

    def route_call():
        return pl.pallas_call(
            functools.partial(
                pd._route_kernel, cap=cap, block_size=bs, resolve_rounds=17
            ),
            grid=(1,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(
                    (1, SUBLANES, LANES), lambda g: (g, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=[
                pl.BlockSpec(
                    (1, bs, LANES), lambda g: (g, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, SUBLANES, LANES), lambda g: (g, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((1, bs, LANES), jnp.int8),
                jax.ShapeDtypeStruct((1, SUBLANES, LANES), jnp.int32),
            ],
            scratch_shapes=[
                pltpu.VMEM((cap + pd._pick_chunk(cap), LANES), jnp.int32),
                pltpu.VMEM(
                    (max(cap, bs) + pd._pick_chunk(cap), LANES), jnp.int32
                ),
                pltpu.VMEM((bs, LANES), jnp.int32),
                pltpu.VMEM((2 * bs, LANES), jnp.int32),
                pltpu.SemaphoreType.DMA,
            ],
            compiler_params=VMEM_CAP,
        )

    route_inputs = list(zip(tokens_g, olen3_g))

    def make_route(k):
        def fn(*tups):
            tot = jnp.int32(0)
            for t, o in tups:
                out, err = route_call()(t, o)
                tot = tot + checksum(out) + checksum(err)
            return tot

        return fn

    kslope("dec route+resolve r=17", make_route, route_inputs, payload, rows)

    # ---- XLA glue --------------------------------------------------------
    comp_rows_g = [
        jax.device_put(
            jnp.asarray(np.array(comp_np[g * LANES : (g + 1) * LANES]))
        )
        for g in range(NG)
    ]

    def make_dec_glue(k):
        def fn(*cs):
            tot = jnp.int32(0)
            for c in cs:
                ct = c.astype(jnp.int32).T.reshape(cap, 1, LANES)
                tot = tot + checksum(ct[0]) + checksum(ct[-1])
            return tot

        return fn

    kslope("dec glue cast+transpose", make_dec_glue, comp_rows_g, payload, rows)

    blocks_rows_g = [
        jax.device_put(
            jnp.asarray(np.array(blocks_np[g * LANES : (g + 1) * LANES]))
        )
        for g in range(NG)
    ]

    def make_enc_glue(k):
        def fn(*bsx):
            tot = jnp.int32(0)
            for b in bsx:
                bt = b.T.reshape(bs, 1, LANES).astype(jnp.int32)
                tot = tot + checksum(bt[0]) + checksum(bt[-1])
            return tot

        return fn

    kslope("enc glue transpose+cast", make_enc_glue, blocks_rows_g, payload, rows)

    by_name = {r["kernel"]: r["per_call_s"] for r in rows}
    # The shipped flagship's sub-kernel sum: rung sorts + the one
    # extend-fold at the default operating point + emit + glue.
    enc_total = sum(
        by_name.get(k, 0.0)
        for k in (
            "enc sort rung L=4",
            "enc sort rung L=16",
            "enc extend-fold rung-pick cap8192 span8",
            "enc emit greedy+layout+route",
            "enc glue transpose+cast",
        )
    )
    dec_total = sum(
        r["per_call_s"] for r in rows if r["kernel"].startswith("dec ")
    )
    # Census-based cost model for the extension kernel: measured_s =
    # base + t_iter * census_iters, least-squares over the grid points.
    model = None
    if len(ext_points) >= 2:
        xs = np.array([p["census_iters"] for p in ext_points], float)
        ys = np.array([p["measured_s"] for p in ext_points], float)
        A = np.stack([np.ones_like(xs), xs], axis=1)
        (base, t_iter), *_ = np.linalg.lstsq(A, ys, rcond=None)
        for p in ext_points:
            pred = base + t_iter * p["census_iters"]
            p["model_s"] = round(float(pred), 5)
            p["model_x"] = round(float(p["measured_s"] / pred), 3)
        model = {
            "base_s": round(float(base), 5),
            "t_iter_ns": round(float(t_iter) * 1e9, 1),
            "points": ext_points,
        }
    out = {
        "bs": bs,
        "rows": rows,
        "flagship": "rung-pick (4,16) ext48 neighbor max_lag=8192 span=8",
        "enc_subkernel_sum_s": round(enc_total, 5),
        "dec_subkernel_sum_s": round(dec_total, 5),
        "extend_cost_model": model,
        "pipeline_slope_ref": "docs/device_pipeline_times.json",
    }
    print(
        f"\nencode sub-kernel sum {enc_total*1e3:.1f} ms/group"
        f" (pipeline slope 86.2);  decode sum {dec_total*1e3:.1f} ms/group"
        f" (pipeline slope 72.2)"
    )
    path = REPO / "docs" / "device_kernel_attrib.json"
    path.write_text(json.dumps(out, indent=2) + "\n")
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
