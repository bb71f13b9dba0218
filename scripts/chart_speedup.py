#!/usr/bin/env python3
"""Device-vs-host speedup chart (role of scripts/host_speedup.py).

Horizontal bars of each engine's throughput relative to the single-threaded
native host codec (the stand-in for the reference host path), per corpus
file.
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
    ap.add_argument("--direction", default="decompress")
    ap.add_argument("--baseline-engine", default="native")
    ap.add_argument("--out", default="speedup.png")
    args = ap.parse_args()

    rows = [
        r
        for r in csv.DictReader(open(args.csv))
        if r["direction"] == args.direction
    ]
    base = {
        r["file"]: float(r["gbps"])
        for r in rows
        if r["engine"] == args.baseline_engine
    }
    series: dict[str, dict[str, float]] = defaultdict(dict)
    for r in rows:
        if r["engine"] != args.baseline_engine and r["file"] in base:
            series[r["engine"]][r["file"]] = float(r["gbps"]) / base[r["file"]]

    fig, ax = plt.subplots(figsize=(7, 4.5))
    files = sorted({f for s in series.values() for f in s})
    h = 0.8 / max(1, len(series))
    for i, (engine, vals) in enumerate(sorted(series.items())):
        ys = [j + i * h for j in range(len(files))]
        ax.barh(ys, [vals.get(f, 0) for f in files], height=h, label=engine)
    ax.set_yticks([j + 0.4 - h / 2 for j in range(len(files))], files)
    ax.axvline(1.0, color="k", lw=0.8, ls="--")
    ax.set_xlabel(f"speedup over {args.baseline_engine} ({args.direction})")
    ax.legend()
    fig.tight_layout()
    fig.savefig(args.out, dpi=120)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
