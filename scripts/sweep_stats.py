#!/usr/bin/env python3
"""Count the select-extend kernel's sweep iterations on real corpus data.

device_kernel_attrib.json puts 75.7 of encode's 86.2 ms/group in
_select_extend_kernel. Its inner loop is an adaptive chunk-delta sweep:
round k of chunk c iterates ``max(dist)+2`` times where ``dist`` is the
chunk distance to each still-active lane's source — one (128,128)
take_along_axis + select per iteration. The op ledger counts dynamic
whiles at ONE iteration, so the kernel's real cost is invisible to it.
This script replays the flagship matcher in the NumPy spec and counts
the EXACT per-round active-lane maxd the kernel would see, per chunk —
the total sweep-iteration count explains the measured milliseconds and
scores redesign candidates (distance caps, d-major restructuring,
active-chunk early exit) before any kernel is rewritten.

Spec refs: lane_model_encode.packed_prev_lags / extend_match;
kernel: pallas_match._select_extend_kernel.
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
    sel_rounds, full_rounds = 4, 12  # sel_cap=16, ext_cap=48
    plain = native.decompress(
        pathlib.Path("/root/reference/test/xml.snappy").read_bytes()
    )
    need = bs * LANES
    rep = (need + len(plain) - 1) // len(plain)
    buf = np.frombuffer((plain * rep)[:need], np.uint8)
    data = buf.reshape(LANES, bs).T.astype(np.int32)  # (bs, 128)
    lens = np.full((LANES,), bs, np.int32)

    W4 = lm._pack_word4(data)
    cands = lm.packed_prev_lags(W4, 2)  # flagship: rungs=(4,), prev_k=2
    nq = bs // LANES
    rows = np.arange(bs, dtype=np.int64)[:, None]
    p_chunk = (rows // LANES).astype(np.int64)  # destination chunk per row

    def sweep_iters(cand, nrounds, start=0, still0=None, lenacc0=None):
        """Per-chunk, per-round maxd(active)+2, mirroring the kernel."""
        has = cand > 0
        still = has if still0 is None else still0
        lenacc = np.zeros_like(cand) if lenacc0 is None else lenacc0
        total = 0
        distinct_total = 0
        dist_samples = []
        src0 = rows - cand
        for k in range(start, nrounds):
            src = src0 + 4 * k
            qs = np.clip(src, 0, bs - 1) // LANES
            dist = p_chunk - qs
            # per destination chunk: maxd over active lanes
            d_act = np.where(still, dist, -1)
            maxd = np.full(nq, -1, np.int64)
            np.maximum.at(maxd, p_chunk[:, 0], d_act.max(axis=1))
            total += int((maxd + 2).clip(min=0).sum())
            # distinct active distances per chunk (the max-extraction
            # schedule's iteration count)
            for c in range(nq):
                sl = d_act[c * LANES : (c + 1) * LANES]
                vals = np.unique(sl[sl >= 0])
                distinct_total += len(vals) + 1
            dist_samples.append(d_act[still])
            # word-equality survival (spec: extend_match round)
            a = np.zeros_like(W4)
            idx = rows + 4 * k
            np.copyto(a, np.take_along_axis(
                np.pad(W4, ((0, 4 * nrounds), (0, 0))), np.minimum(idx, bs - 1 + 4 * nrounds), axis=0
            ))
            b = np.take_along_axis(
                np.pad(W4, ((0, 4 * nrounds), (0, 0))),
                np.clip(src + 0, 0, bs - 1 + 4 * nrounds), axis=0,
            )
            weq = still & (a == b) & (idx < lens[None, :])
            lenacc = lenacc + np.where(weq, 4, 0)
            still = weq
        return total, distinct_total, lenacc, still, np.concatenate(dist_samples)

    report = {"bs": bs, "nq": nq}
    # capped passes (both prev candidates)
    tot_iters = 0
    tot_distinct = 0
    sel_len = np.zeros_like(cands[0])
    sel_off = np.zeros_like(cands[0])
    dists = []
    for ci, cand in enumerate(cands):
        t, td, lenacc, _, d = sweep_iters(cand, sel_rounds)
        tot_distinct += td
        cl = lm.extend_match(W4, lens, cand, max_len=16)
        better = cl > sel_len
        sel_len = np.where(better, cl, sel_len)
        sel_off = np.where(better, cand, sel_off)
        tot_iters += t
        dists.append(d)
        print(f"cand {ci}: capped-sweep iters {t:,}")
    # winner full extension, resumed at sel_rounds
    t, td, _, _, d = sweep_iters(
        sel_off, full_rounds, start=sel_rounds,
        still0=sel_len == 4 * sel_rounds, lenacc0=sel_len,
    )
    tot_iters += t
    tot_distinct += td
    dists.append(d)
    print(f"winner full-ext sweep iters {t:,}")

    d_all = np.concatenate(dists)
    d_all = d_all[d_all >= 0]
    report["total_sweep_iters"] = int(tot_iters)
    report["distinct_schedule_iters"] = int(tot_distinct)
    report["distinct_win_x"] = round(tot_iters / max(tot_distinct, 1), 2)
    report["iters_per_chunk"] = round(tot_iters / nq, 1)
    # Each iteration = 1 take_along_axis(128,128) + 1 select ~ 32+ vregs.
    report["gathers_total"] = int(tot_iters)
    qs_hist = {
        "p50": int(np.percentile(d_all, 50)),
        "p90": int(np.percentile(d_all, 90)),
        "p99": int(np.percentile(d_all, 99)),
        "max": int(d_all.max()),
        "mean": round(float(d_all.mean()), 1),
    }
    report["active_lane_chunk_distance"] = qs_hist
    # Redesign scoring: sweep iterations if the per-round sweep only
    # visited distances with at least one active lane (set-of-distances
    # instead of 0..maxd) — an upper-bound win for a bit-tested schedule.
    print(json.dumps(report, indent=2))
    (REPO / "docs" / "sweep_stats.json").write_text(
        json.dumps(report, indent=2) + "\n"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
