#!/usr/bin/env python3
"""Perf-evidence ledger: issued vreg-op counts per kernel/config.

The op-count INVENTORY for comparing kernel configs (round 4 demoted it
from wall-time predictor: the endpoint is real silicon behind a slow
tunnel — DESIGN.md — and dynamic-while trip counts this script cannot see
dominate the gather-sweep kernels; measured device times live in
docs/device_pipeline_times.json / device_kernel_attrib.json). It traces
each production kernel to a jaxpr, recurses into ``pallas_call`` bodies,
``scan``/``fori_loop`` (multiplying by static trip counts) and ``cond``
branches (max), and counts every vector primitive weighted by the number
of 4 KB vector registers its output occupies (8 sublanes x 128 lanes x
32 bits; narrower dtypes are counted at i32 width — Mosaic computes i8
data in extended form).

From the counts it reports, per kernel/config:
  - vreg_ops:        total issued vector-register operations
  - ops_per_byte:    vreg_ops / payload bytes (the batch's real bytes)
  - cycles_per_byte: assuming 1 vreg-op/cycle on the v5e VPU — an UPPER
                     BOUND on compute throughput for config-relative
                     comparison (dynamic whiles counted at 1 iteration)
  - proj_v5e_gbps:   940 MHz / cycles_per_byte — kept for config-relative
                     comparison; measured residuals vs the device slope
                     are recorded in docs/device_pipeline_times.json
  - emu_s_per_batch: legacy round-3 cross-check column (vreg_ops x 2.5us);
                     superseded by the measured device times

Reference analog: the DPU build's max-cycles-per-tasklet discipline
(snappy/scripts/parse_output_file.py:6-28) — there the observable is DPU
cycles; here it is vreg issues.

Writes docs/perf_ledger.json and prints a table.
"""

from __future__ import annotations

import json
import math
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

# Primitives that issue no vector-ALU work (metadata / layout bookkeeping
# the Mosaic compiler resolves to register renaming or address arithmetic).
FREE = {
    "reshape", "squeeze", "expand_dims", "bitcast_convert_type",
    "stop_gradient", "copy", "device_put", "sharding_constraint",
    "empty", "eq_to", "split", "pjit_forwarding",
}
# Control/structural primitives handled explicitly by the walker.
STRUCTURAL = {
    "pjit", "closed_call", "core_call", "custom_jvp_call", "custom_vjp_call",
    "scan", "while", "cond", "pallas_call", "run_state", "run_scoped",
    "remat", "checkpoint", "custom_vjp_call_jaxpr",
}
VREG_BYTES = 8 * 128 * 4  # one v5e vector register, counted at i32 width


def _vregs(aval) -> int:
    """Vector registers occupied by a value (0 for scalars/SMEM-like)."""
    shape = getattr(aval, "shape", ())
    if not shape or math.prod(shape) <= 1:
        return 0
    n = math.prod(shape)
    return max(1, math.ceil(n * 4 / VREG_BYTES))  # i32-width accounting


def _subjaxprs(params):
    for v in params.values():
        if hasattr(v, "jaxpr"):  # ClosedJaxpr
            yield v
        elif hasattr(v, "eqns"):  # raw Jaxpr
            yield v
        elif isinstance(v, (tuple, list)):
            for w in v:
                if hasattr(w, "jaxpr") or hasattr(w, "eqns"):
                    yield w


def count_jaxpr(jaxpr, mult: int = 1, tally: dict | None = None) -> dict:
    """Walk a (Closed)Jaxpr, returning {primitive_name: vreg_ops}."""
    tally = tally if tally is not None else {}
    jaxpr = getattr(jaxpr, "jaxpr", jaxpr)
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name in FREE:
            continue
        if name == "scan":
            length = int(eqn.params.get("length", 1))
            count_jaxpr(eqn.params["jaxpr"], mult * length, tally)
        elif name == "while":
            # Trip count is dynamic; production kernels use fori_loop with
            # static bounds (-> scan). A while here means the count below
            # is a lower bound — flag it.
            tally["__dynamic_while__"] = tally.get("__dynamic_while__", 0) + 1
            count_jaxpr(eqn.params["body_jaxpr"], mult, tally)
        elif name == "cond":
            best: dict = {}
            for br in eqn.params["branches"]:
                t: dict = {}
                count_jaxpr(br, mult, t)
                if sum(v for k, v in t.items() if not k.startswith("__")) > \
                   sum(v for k, v in best.items() if not k.startswith("__")):
                    best = t
            for k, v in best.items():
                tally[k] = tally.get(k, 0) + v
        elif name == "pallas_call":
            # The kernel body executes once PER GRID STEP — multiply it
            # out. (Round-3 ledger bug: grid bodies were counted once,
            # undercounting the gridded emit/route and decode-DFA kernels
            # by their grid size — a large part of the round-3
            # emulator-model residual.)
            gm = eqn.params.get("grid_mapping")
            grid = 1
            for d in getattr(gm, "grid", ()) or ():
                grid *= int(d)
            for sub in _subjaxprs(eqn.params):
                count_jaxpr(sub, mult * max(grid, 1), tally)
        elif (
            name in STRUCTURAL
            or name.endswith("_call")
            or any(True for _ in _subjaxprs(eqn.params))
        ):
            for sub in _subjaxprs(eqn.params):
                count_jaxpr(sub, mult, tally)
        else:
            work = sum(_vregs(v.aval) for v in eqn.outvars)
            if name in ("gather", "dynamic_gather", "take_along_axis"):
                # Per-lane dynamic addressing: measured ~uniform per-vreg
                # cost on the VPU crossbar (DESIGN.md measured facts).
                work = max(work, sum(_vregs(v.aval) for v in eqn.invars))
            if work:
                tally[name] = tally.get(name, 0) + work * mult
                tally["__n_ops__"] = tally.get("__n_ops__", 0) + mult
    return tally


def _total(tally: dict) -> int:
    return int(sum(v for k, v in tally.items() if not k.startswith("__")))


# ---------------------------------------------------------------------------
# HBM roofline: static bytes moved between HBM and VMEM per invocation.
# VMEM-mapped pallas operands stream once (the whole array crosses over
# the grid's block partition); ANY-space operands stay HBM-resident and
# only their explicit in-kernel DMA volumes count (x grid steps x
# enclosing static loop trip counts). VERDICT r3 item 7: projections must
# be min(compute roof, bandwidth roof), not compute alone.
# ---------------------------------------------------------------------------

V5E_HBM_GBPS = 819.0  # v5e HBM bandwidth (public spec)


def _aval_bytes(aval) -> int:
    shape = getattr(aval, "shape", ())
    dtype = getattr(aval, "dtype", None)
    if dtype is None or not shape:
        return 0
    return math.prod(shape) * dtype.itemsize


def _dma_bytes(jaxpr, mult: int = 1) -> int:
    """Explicit in-kernel DMA volume: one direction per copy."""
    jaxpr = getattr(jaxpr, "jaxpr", jaxpr)
    total = 0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "dma_start":
            sz = max(
                (_aval_bytes(v.aval) for v in eqn.invars), default=0
            )
            total += sz * mult
        elif name == "scan":
            total += _dma_bytes(
                eqn.params["jaxpr"], mult * int(eqn.params.get("length", 1))
            )
        elif name == "while":
            total += _dma_bytes(eqn.params["body_jaxpr"], mult)
        elif name == "cond":
            total += max(
                (_dma_bytes(br, mult) for br in eqn.params["branches"]),
                default=0,
            )
        else:
            for sub in _subjaxprs(eqn.params):
                total += _dma_bytes(sub, mult)
    return total


def hbm_traffic(jaxpr, mult: int = 1) -> int:
    """Total HBM<->VMEM bytes for one call of ``jaxpr`` (see note above)."""
    jaxpr = getattr(jaxpr, "jaxpr", jaxpr)
    total = 0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "pallas_call":
            gm = eqn.params.get("grid_mapping")
            grid = 1
            for d in getattr(gm, "grid", ()) or ():
                grid *= int(d)
            bms = list(getattr(gm, "block_mappings", ()) or ())
            n_out = len(eqn.outvars)
            opvars = list(eqn.invars)[len(eqn.invars) - (len(bms) - n_out):] \
                + list(eqn.outvars)
            for bm, var in zip(bms, opvars):
                space = str(getattr(bm, "block_aval", "")).lower()
                if "any" in space or "smem" in space:
                    continue  # HBM-resident (DMA counted below) / scalars
                total += _aval_bytes(var.aval) * mult
            total += _dma_bytes(eqn.params["jaxpr"], mult * max(grid, 1))
        elif name == "scan":
            total += hbm_traffic(
                eqn.params["jaxpr"], mult * int(eqn.params.get("length", 1))
            )
        elif name == "while":
            total += hbm_traffic(eqn.params["body_jaxpr"], mult)
        elif name == "cond":
            total += max(
                (hbm_traffic(br, mult) for br in eqn.params["branches"]),
                default=0,
            )
        else:
            for sub in _subjaxprs(eqn.params):
                total += hbm_traffic(sub, mult)
    return total


def _entry_bytes(bs: int, nb: int) -> int:
    return bs * nb


# Emulator cost model, calibrated against tpu_validation.json wall times:
# t ~= n_ops * C_OP + vreg_ops * C_VREG. Fit to the measured sorted-encode
# point (bs=8192: 0.83 s/batch, 154 M vregs, 2.7 M ops); rows flagged
# dynamic_while count one iteration per dynamic loop and so under-predict.
EMU_C_OP = 2.0e-8
EMU_C_VREG = 5.0e-9
EMU_T0 = 0.0
# Prefer the device-fitted constants when the calibration harness has
# run (scripts/emu_calibrate.py -> docs/emu_model.json).
_emu_path = REPO / "docs" / "emu_model.json"
if _emu_path.exists():
    try:
        _emu = json.loads(_emu_path.read_text())
        EMU_C_OP = float(_emu["c_op_s"])
        EMU_C_VREG = float(_emu["c_vreg_s"])
        EMU_T0 = float(_emu.get("t0_s", 0.0))
    except (KeyError, ValueError):
        pass


def ledger_row(name: str, fn, args, payload_bytes: int, top: int = 6) -> dict:
    jaxpr = jax.make_jaxpr(fn)(*args)
    tally = count_jaxpr(jaxpr)
    ops = _total(tally)
    n_ops = int(tally.get("__n_ops__", 0))
    opb = ops * 1.0 / payload_bytes
    # one vreg covers 1024 i32 lanes; cycles/byte on v5e at 1 issue/cycle:
    cpb = ops / payload_bytes
    hbm = hbm_traffic(jaxpr)
    hbm_bpb = hbm / payload_bytes
    compute_gbps = 0.94 / cpb if cpb else None
    hbm_gbps = V5E_HBM_GBPS / hbm_bpb if hbm_bpb else None
    row = {
        "kernel": name,
        "payload_bytes": payload_bytes,
        "vreg_ops": ops,
        "n_ops": n_ops,
        "ops_per_kbyte": round(opb * 1024, 2),
        "cycles_per_byte_v5e": round(cpb, 4),
        "proj_v5e_gbps": round(
            min(x for x in (compute_gbps, hbm_gbps) if x is not None), 2
        )
        if compute_gbps or hbm_gbps
        else None,
        "proj_compute_gbps": round(compute_gbps, 2) if compute_gbps else None,
        # HBM roofline (VERDICT r3 item 7): bytes crossing HBM<->VMEM per
        # payload byte (VMEM-streamed operands + in-kernel DMA volumes)
        # and the bandwidth-bound GB/s at the v5e's 819 GB/s.
        "hbm_bytes_per_byte": round(hbm_bpb, 2),
        "proj_hbm_gbps": round(hbm_gbps, 2) if hbm_gbps else None,
        "emu_s_per_batch": round(
            EMU_T0 + n_ops * EMU_C_OP + ops * EMU_C_VREG, 3
        ),
        "dynamic_while": int(tally.get("__dynamic_while__", 0)),
        "top_ops": dict(
            sorted(
                ((k, v) for k, v in tally.items() if not k.startswith("__")),
                key=lambda kv: -kv[1],
            )[:top]
        ),
    }
    return row


def sub_kernel_rows(bs: int) -> list[dict]:
    """Per-sub-kernel decomposition of the sorted-encode pipeline at ``bs``.

    Answers "where do the ops go" (per 128-block lane group): the rung
    sort (two bitonic passes over the packed words) vs the extension fold
    vs the lag-composition step. Payload = one group's bytes (bs * 128).
    """
    import functools as ft

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from pim_compression_tpu.ops import pallas_match as pm

    data = jnp.zeros((bs, 128), jnp.int8)
    lens = jnp.zeros((8, 128), jnp.int32)
    cand = jnp.zeros((bs, 128), jnp.int32)
    best = jnp.zeros((bs, 128), jnp.int32)
    vmem_cap = pltpu.CompilerParams(vmem_limit_bytes=126 * 1024 * 1024)
    payload = bs * 128

    def sort_call(rung, stride):
        return pl.pallas_call(
            ft.partial(
                pm._sort_rung_kernel, bs=bs, rung=rung, stride=stride,
            ),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bs, 128), jnp.int32),
            scratch_shapes=[
                pltpu.VMEM((bs // stride, 128), jnp.int32),
                pltpu.VMEM(
                    (max(bs // stride, bs if stride == 2 else 0), 128),
                    jnp.int32,
                ),
            ],
            compiler_params=vmem_cap,
        )(data)

    extend = pl.pallas_call(
        ft.partial(pm._extend_fold_kernel, bs=bs),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bs, 128), jnp.int32),
        scratch_shapes=[pltpu.VMEM((bs, 128), jnp.int32)],
        compiler_params=vmem_cap,
    )
    prev_step = pl.pallas_call(
        ft.partial(pm._prev_step_kernel, bs=bs),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bs, 128), jnp.int32),
        scratch_shapes=[pltpu.VMEM((bs, 128), jnp.int32)],
        compiler_params=vmem_cap,
    )
    subs = [
        (f"sub: rung sort L=4 bs={bs}", lambda: sort_call(4, 1)),
        (f"sub: rung sort L=32 stride2 bs={bs}", lambda: sort_call(32, 2)),
        (f"sub: extend fold bs={bs}", lambda: extend(data, lens, cand, best)),
        (f"sub: prev step bs={bs}", lambda: prev_step(cand, cand)),
    ]
    return [ledger_row(name, fn, (), payload) for name, fn in subs]


def main() -> int:
    from pim_compression_tpu.ops import pallas_decode as pd
    from pim_compression_tpu.ops import pallas_encode as pe

    rows = []
    for bs in (8192, 16384, 32768):
        nb = pd.DFA_LANES
        cap = pd.pallas_capacity(bs)
        args = (
            jnp.zeros((nb, cap), jnp.uint8),
            jnp.ones((nb,), jnp.int32),
            jnp.full((nb,), bs, jnp.int32),
        )
        rows.append(
            ledger_row(
                f"decode bs={bs}",
                lambda c, l, o, bs=bs: pd.decode_blocks_pallas(
                    c, l, o, block_size=bs
                ),
                args,
                _entry_bytes(bs, nb),
            )
        )

    enc_cfgs = [
        # Round-4 rung-pick flagship: (4,16) rung-priority selection (the
        # longest rung with a candidate wins, one from-scratch
        # extension) — fewer data-dependent gather sweeps than the select
        # ladder at better xml ratio (spec 0.8050 vs 0.7879); every
        # corpus file below the reference stream.
        dict(block_size=32768, matcher="sorted", rungs=(4, 16), prev_k=1,
             ext_cap=48, neighbor=True, rung_pick=True),
        dict(block_size=16384, matcher="sorted", rungs=(4, 16), prev_k=1,
             ext_cap=48, neighbor=True, rung_pick=True),
        # Earlier round-4 flagship: dense 4-byte rung + prev2 + fused
        # select-then-extend capped at ext_cap=48 + the neighbor fold —
        # xml @32K spec ratio 0.7566 (>= the r3 flagship's 0.7563) with a
        # quarter fewer extension rounds.
        dict(block_size=32768, matcher="sorted", rungs=(4,), prev_k=2,
             sel_cap=16, sel_all=True, ext_cap=48, neighbor=True),
        # Round-3 single-rung frontier: a dense 4-byte rung + prev_k
        # nearest-previous composition + fused select-then-extend. The
        # speed flagship (prev2) runs 1.96 c/B at xml ratio 0.7563 @32K
        # (device-validated; every corpus file below the reference size);
        # prev4 = 2.30 @ 0.7692; prev6 = 2.64 @ 0.7737 (ratio champion).
        dict(block_size=32768, matcher="sorted", rungs=(4,), prev_k=2,
             sel_cap=16, sel_all=True),
        dict(block_size=32768, matcher="sorted", rungs=(4,), prev_k=2,
             sel_cap=8, sel_all=True),
        dict(block_size=32768, matcher="sorted", rungs=(4,), prev_k=4,
             sel_cap=16, sel_all=True),
        dict(block_size=32768, matcher="sorted", rungs=(4,), prev_k=6,
             sel_cap=16, sel_all=True),
        dict(block_size=16384, matcher="sorted", rungs=(4,), prev_k=3,
             sel_cap=16, sel_all=True),
        # Round-3 fused select-extend two-rung flagships (sel_all: one
        # shared word build across every candidate array).
        dict(block_size=32768, matcher="sorted", rungs=(4, 32), prev_k=2,
             stride2_min=32, sel_cap=16, sel_all=True),
        dict(block_size=32768, matcher="sorted", rungs=(4, 32), prev_k=2,
             rung_strides=(1, 8), sel_cap=16, sel_all=True),
        dict(block_size=16384, matcher="sorted", rungs=(4, 32), prev_k=2,
             stride2_min=32, sel_cap=16, sel_all=True),
        dict(block_size=8192, matcher="sorted"),
        dict(block_size=16384, matcher="sorted"),
        dict(block_size=32768, matcher="sorted"),
        dict(block_size=32768, matcher="sorted", rungs=(4, 16, 64)),
        dict(block_size=16384, matcher="sorted", rungs=(4, 16, 64)),
        dict(block_size=32768, matcher="sorted", prev_k=2),
        dict(block_size=32768, matcher="sorted", rungs=(4, 32), prev_k=2,
             stride2_min=32),
        dict(block_size=32768, matcher="sorted", rungs=(4, 32), prev_k=2),
        dict(block_size=32768, matcher="sorted", rungs=(4, 32), prev_k=4),
        dict(block_size=32768, matcher="sorted", rungs=(4, 32), prev_k=4,
             sel_cap=16),
        dict(block_size=32768, matcher="sorted", rungs=(4, 32), prev_k=6,
             sel_cap=16),
        dict(block_size=32768, matcher="sorted", rungs=(4, 32), prev_k=6),
        dict(block_size=32768, matcher="sorted", rungs=(4, 32), prev_k=8),
        dict(block_size=16384, matcher="sorted", rungs=(4, 32), prev_k=2),
        dict(block_size=16384, matcher="sorted", rungs=(4, 32), prev_k=4),
        dict(block_size=32768, matcher="sorted", rungs=(4, 16, 64),
             prev_k=2, stride2_min=16),
        dict(block_size=16384, matcher="sorted", rungs=(4, 16, 64),
             prev_k=2, stride2_min=16),
        dict(block_size=8192, matcher="sweep", window=512,
             coarse_window=4096, granular=True),
        dict(block_size=8192, matcher="sweep", window=2048,
             coarse_window=8192, granular=True),
    ]
    for cfg in enc_cfgs:
        bs = cfg["block_size"]
        if bs > pe.MAX_ENC_BLOCK:
            continue
        nb = pe.BATCH
        args = (
            jnp.zeros((nb, bs), jnp.uint8),
            jnp.full((nb,), bs, jnp.int32),
        )
        label = (
            f"encode bs={bs} {cfg['matcher']}"
            + (
                " rungs=" + ",".join(str(r) for r in cfg["rungs"])
                if cfg.get("rungs")
                else ""
            )
            + (
                f" prev{cfg['prev_k']}"
                if cfg.get("prev_k", 1) > 1
                else ""
            )
            + (
                f" s2@{cfg['stride2_min']}"
                if cfg.get("stride2_min")
                else ""
            )
            + (
                f" sel{cfg['sel_cap']}"
                if cfg.get("sel_cap")
                else ""
            )
            + (" selall" if cfg.get("sel_all") else "")
            + (
                f" ext{cfg['ext_cap']}"
                if cfg.get("ext_cap", 64) != 64
                else ""
            )
            + (" nb" if cfg.get("neighbor") else "")
            + (
                " rs=" + ",".join(str(r) for r in cfg["rung_strides"])
                if cfg.get("rung_strides")
                else ""
            )
            + (
                f" w={cfg.get('window')} c={cfg.get('coarse_window')}"
                if cfg["matcher"] == "sweep"
                else ""
            )
        )
        row = ledger_row(
            label,
            lambda b, l, cfg=cfg: pe.encode_blocks_pallas(b, l, **cfg),
            args,
            _entry_bytes(bs, nb),
        )
        row["config"] = {
            k: (list(v) if isinstance(v, tuple) else v) for k, v in cfg.items()
        }
        rows.append(row)

    # Sub-kernel decomposition at the flagship size (where the ops go
    # within one sorted-encode lane group; all rungs cost within 1% of the
    # L=4 row, so the two rows span the ladder).
    rows.extend(sub_kernel_rows(32768))

    # Join measured emulator wall times (tpu_validation.json) onto the
    # rows: for dyn-while kernels the static count is a lower bound, so
    # the measured time is the honest emulator-side observable.
    val_path = REPO / "tpu_validation.json"
    if val_path.exists():
        vruns = json.loads(val_path.read_text())
        for r in rows:
            kind = "decode" if r["kernel"].startswith("decode") else "encode"
            bs = int(r["kernel"].split("bs=")[1].split()[0])
            cfg = r.get("config", {})
            want_rungs = ",".join(str(x) for x in cfg.get("rungs") or ()) or None
            best = None
            for v in vruns:
                if v.get("bs") != bs:
                    continue
                if kind == "decode" and v.get("decode_timed"):
                    best = v["decode_timed"]
                elif kind == "encode" and v.get("encode_timed"):
                    if (v.get("matcher") or "sweep") != cfg.get("matcher", "sweep"):
                        continue
                    if (v.get("rungs") or None) != want_rungs:
                        continue
                    if int(v.get("prev_k") or 1) != int(cfg.get("prev_k", 1)):
                        continue
                    if int(v.get("stride2_min") or 0) != int(
                        cfg.get("stride2_min", 0)
                    ):
                        continue
                    if int(v.get("sel_cap") or 0) != int(cfg.get("sel_cap", 0)):
                        continue
                    if bool(v.get("sel_all")) != bool(cfg.get("sel_all")):
                        continue
                    if int(v.get("ext_cap") or 64) != int(
                        cfg.get("ext_cap", 64)
                    ):
                        continue
                    if bool(v.get("neighbor")) != bool(cfg.get("neighbor")):
                        continue
                    if (v.get("rung_strides") or None) != (
                        ",".join(str(x) for x in cfg.get("rung_strides") or ())
                        or None
                    ):
                        continue
                    if cfg.get("matcher") == "sweep" and (
                        v.get("window") != cfg.get("window")
                        or v.get("coarse") != cfg.get("coarse_window")
                    ):
                        continue
                    best = v["encode_timed"]
            if best is not None:
                r["measured_emulator_s"] = best

    out = {
        "model": {
            "vreg_bytes": VREG_BYTES,
            "issue_rate": "1 vreg-op/cycle (conservative)",
            "v5e_clock_ghz": 0.94,
            "v5e_hbm_gbps": V5E_HBM_GBPS,
            "emulator_c_op_s": EMU_C_OP,
            "emulator_c_vreg_s": EMU_C_VREG,
            "emulator_t0_s": EMU_T0,
            "emulator_fit": (
                "docs/emu_model.json (device-fitted)"
                if _emu_path.exists()
                else "defaults (calibration not yet run)"
            ),
            "note": (
                "counts from jaxpr walk with static trip-count expansion; "
                "narrow dtypes counted at i32 width; dynamic_while>0 rows "
                "count one body iteration per dynamic loop (lower bound); "
                "emu_s_per_batch cross-checks against tpu_validation.json"
            ),
        },
        "rows": rows,
    }
    path = REPO / "docs" / "perf_ledger.json"
    path.parent.mkdir(exist_ok=True)
    path.write_text(json.dumps(out, indent=2))

    hdr = (
        f"{'kernel':<42}{'vreg_ops':>12}{'n_ops':>10}"
        f"{'cyc/B':>8}{'hbmB/B':>8}{'proj GB/s':>11}{'emu s/batch':>13}"
    )
    print(hdr)
    print("-" * len(hdr))
    for r in rows:
        print(
            f"{r['kernel']:<42}{r['vreg_ops']:>12,}{r['n_ops']:>10,}"
            f"{r['cycles_per_byte_v5e']:>8}"
            f"{r['hbm_bytes_per_byte']:>8}{r['proj_v5e_gbps']:>11}"
            f"{r['emu_s_per_batch']:>13}"
            + ("  [dyn-while]" if r["dynamic_while"] else "")
        )
    print(f"\nwrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
