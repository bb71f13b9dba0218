#!/usr/bin/env python3
"""Census of the extension kernels' sweep iterations on real corpus data.

The encode wall on device is the adaptive chunk-delta gather sweep in the
extension kernels (docs/device_kernel_attrib.json): round k of chunk c
iterates ``(maxd + span + 1) // span`` times, where ``maxd`` is ONE SCALAR
per (round, chunk) — the max chunk distance over all 128x128 live lanes
(pallas_match._span_sweep). The op ledger counts dynamic whiles at one
iteration, so this census is the kernel's real cost model: it replays the
flagship matcher in the NumPy spec and counts the exact per-round maxd the
kernel would see, across the (sweep_span, max_lag) grid that round 5 added.

Round-5 findings this census records (xml @32K, 128-block group):
- span 8 halves iterations vs span 4; span 16 halves again;
- max_lag caps bound maxd directly: 8192 => ~2.2x fewer iterations at a
  0.0125 ratio cost (0.8050 -> 0.7925; reference bar 0.7408);
- lane sparsification (the DESIGN.md round-4 "verify-after-parse" plan)
  does NOT cut the scalar maxd: skipping rounds 0-3 for the ~70% of lanes
  with rung-16 candidates left 97.8K of 99.5K iterations standing, because
  one far-source lane per chunk keeps maxd high. The trusted-extension
  route was dropped for max_lag + span on that evidence (spec functions
  extend_match(trust=...) / verify_copy_prefix remain as the record).

Spec refs: lane_model_encode.match_search_sorted(rung_pick=True, max_lag);
kernels: pallas_match._extend_fold_kernel / _span_sweep.
"""

from __future__ import annotations

import json
import os
import pathlib
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np

from pim_compression_tpu import native
from pim_compression_tpu.ops import lane_model_encode as lm

LANES = 128


def main() -> int:
    bs = int(os.environ.get("PIM_BS", "32768"))
    ext_rounds = 12  # flagship ext_cap=48
    plain = native.decompress(
        pathlib.Path("/root/reference/test/xml.snappy").read_bytes()
    )
    need = bs * LANES
    rep = (need + len(plain) - 1) // len(plain)
    buf = np.frombuffer((plain * rep)[:need], np.uint8)
    data = buf.reshape(LANES, bs).T.astype(np.int32)  # (bs, 128)
    lens = np.full((LANES,), bs, np.int32)

    W4 = lm._pack_word4(data)
    rows = np.arange(bs, dtype=np.int64)[:, None]
    # Flagship candidates: rung-pick over (4, 16).
    h16 = lm._hash_ladder_step(lm._hash_ladder_step(W4, 4), 8)
    c4 = lm.packed_prev_lags(W4, 1)[0]
    c16 = lm.packed_prev_lags(h16, 1)[0]

    def census(sel, span):
        """Total sweep iterations + per-round breakdown + distance stats,
        with the kernel's exact semantics: one scalar maxd per
        (round, chunk) over ALL live lanes."""
        still = sel > 0
        per_round = []
        d_samples = []
        for k in range(ext_rounds):
            qs = (rows - sel + 4 * k) >> 7
            dist = (rows >> 7) - qs
            d_act = np.where(still, dist, -1)
            d_samples.append(d_act[still])
            dd = d_act.reshape(bs // LANES, LANES * LANES).max(axis=1)
            # The kernel's fori_loop floor is ONE iteration even for a
            # chunk with no live lanes (maxd = -1 -> nit = 1): count it.
            per_round.append(
                int(np.maximum((dd + span + 1) // span, 1).sum())
            )
            a = lm._shift_up(W4, 4 * k) if k else W4
            b = np.take_along_axis(
                W4, np.clip(rows - sel + 4 * k, 0, bs - 1), axis=0
            )
            still = still & (a == b)
        d_all = np.concatenate(d_samples)
        d_all = d_all[d_all >= 0]
        stats = {
            "p50": int(np.percentile(d_all, 50)),
            "p90": int(np.percentile(d_all, 90)),
            "p99": int(np.percentile(d_all, 99)),
            "max": int(d_all.max()),
            "mean": round(float(d_all.mean()), 1),
        }
        return sum(per_round), per_round, stats

    def ratio_of(sel):
        bl = lm.extend_match(W4, lens, sel, max_len=48)
        bo = np.where(bl > 0, sel, 0)
        bl, bo = lm.derive_neighbor(bl, bo)
        ml = lm.lazy_defer(bl)
        acc, cp = lm.greedy_parse(ml, lens)
        return 1 - lm.emit_sizes(lens, acc, cp, ml, bo).sum() / (bs * LANES)

    report = {"bs": bs, "nq": bs // LANES, "flagship": "rung-pick (4,16) ext48 neighbor"}
    grid = []
    for cap in (0, 16384, 8192, 4096):
        if cap and cap >= bs:
            continue
        c4c = np.where(c4 <= cap, c4, 0) if cap else c4
        c16c = np.where(c16 <= cap, c16, 0) if cap else c16
        sel = np.where(c16c > 0, c16c, c4c)
        r = ratio_of(sel)
        row = {"max_lag": cap, "ratio": round(float(r), 4)}
        for span in (4, 8, 16):
            total, per_round, stats = census(sel, span)
            row[f"iters_span{span}"] = total
            if span == 8:
                row["per_round_span8"] = per_round
                row["active_lane_chunk_distance"] = stats
        grid.append(row)
        print(row["max_lag"], row["ratio"], row["iters_span4"], row["iters_span8"], row["iters_span16"], flush=True)
    report["grid"] = grid
    # Back-compat headline fields (round-4 schema) for the r4 flagship point.
    full = grid[0]
    report["total_sweep_iters"] = full["iters_span4"]
    report["gathers_total"] = full["iters_span4"] * 4
    report["active_lane_chunk_distance"] = full["active_lane_chunk_distance"]

    print(json.dumps(report, indent=2))
    (REPO / "docs" / "sweep_stats.json").write_text(
        json.dumps(report, indent=2) + "\n"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
