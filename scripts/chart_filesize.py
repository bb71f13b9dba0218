#!/usr/bin/env python3
"""Throughput-vs-input-size chart (role of
scripts/asplos21/chart_fs_dpu_speedup.py).

The reference's headline chart sweeps file size and plots each file's
best-config speedup over the host (chart_fs_dpu_speedup.py:46-52). Feed
this a run_benchmarks.py CSV produced with --synth-sizes 10,25,84 (the
synthesized large-corpus tier) plus the shipped corpus: plots GB/s vs
input bytes per engine/direction, log-x, with the host-native line as the
baseline reference.
"""

from __future__ import annotations

import argparse
import csv
from collections import defaultdict

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("csv", nargs="?", default="bench_results.csv")
    ap.add_argument("--direction", default=None, help="limit to one direction")
    ap.add_argument("--out", default="filesize.png")
    args = ap.parse_args()

    rows = list(csv.DictReader(open(args.csv)))
    if args.direction:
        rows = [r for r in rows if r["direction"] == args.direction]

    # (engine, direction) -> [(bytes, gbps)] — best gbps per size point
    series: dict[tuple[str, str], dict[int, float]] = defaultdict(dict)
    for r in rows:
        key = (r["engine"], r["direction"])
        n = int(r["bytes"])
        g = float(r["gbps"])
        if g > series[key].get(n, 0.0):
            series[key][n] = g  # best config per file size (reference rule)

    fig, ax = plt.subplots(figsize=(6.5, 4.5))
    for (engine, direction), pts in sorted(series.items()):
        ns = sorted(pts)
        ax.plot(
            ns, [pts[n] for n in ns], marker="o",
            label=f"{engine} {direction}",
        )
    ax.set_xscale("log")
    ax.set_xlabel("input size (bytes)")
    ax.set_ylabel("throughput (GB/s)")
    ax.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(args.out, dpi=120)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
