#!/usr/bin/env python3
"""Benchmark sweep driver (role of the reference's asplos21/run_tests.py).

The reference rebuilds its binaries per (NR_DPUS, NR_TASKLETS) point and
sweeps the corpus; topology here is a runtime property, so the sweep axes
are engines x block sizes x corpus files. Results land in a CSV consumed by
the chart scripts.

Usage:
    python scripts/run_benchmarks.py [--engines native,xla] [--files xml]
        [--block-sizes 4096,32768] [--iters 3] [--window 512]
        [--coarse-window 0] [--out results.csv]
"""

from __future__ import annotations

import argparse
import csv
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

CORPUS = pathlib.Path("/root/reference/test")


def discover_files(names: list[str] | None) -> list[tuple[str, bytes]]:
    out = []
    for snappy in sorted(CORPUS.glob("*.snappy")):
        name = snappy.stem
        if names and name not in names:
            continue
        txt = CORPUS / f"{name}.txt"
        if txt.exists():
            out.append((name, txt.read_bytes()))
        else:  # xml ships compressed-only; recover the plain text
            from pim_compression_tpu.format import oracle

            out.append((name, oracle.decompress(snappy.read_bytes())))
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--engines", default="native,xla")
    ap.add_argument("--files", default=None)
    ap.add_argument("--block-sizes", default="32768")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--threads", type=int, default=0)
    ap.add_argument("--window", type=int, default=512)
    ap.add_argument("--coarse-window", type=int, default=0)
    ap.add_argument("--out", default="bench_results.csv")
    args = ap.parse_args()

    from pim_compression_tpu import runtime
    from pim_compression_tpu.runtime.profiling import PHASES, PhaseTimer
    from pim_compression_tpu.utils.config import CodecConfig

    engines = args.engines.split(",")
    block_sizes = [int(b) for b in args.block_sizes.split(",")]
    files = discover_files(args.files.split(",") if args.files else None)

    rows = []
    for name, plain in files:
        for engine in engines:
            for bs in block_sizes:
                cfg = CodecConfig(
                    block_size=bs, engine=engine, num_threads=args.threads,
                    match_window=args.window, coarse_window=args.coarse_window,
                )
                # Warm-up (compile) round
                stream = runtime.compress(plain, cfg)
                out = runtime.decompress(stream, cfg)
                assert out == plain, f"round-trip failure: {name}/{engine}/{bs}"

                for direction in ("compress", "decompress"):
                    timer = PhaseTimer()
                    t0 = time.perf_counter()
                    for _ in range(args.iters):
                        if direction == "compress":
                            stream = runtime.compress(plain, cfg, timer)
                        else:
                            runtime.decompress(stream, cfg, timer)
                    wall = (time.perf_counter() - t0) / args.iters
                    row = {
                        "file": name,
                        "engine": engine,
                        "block_size": bs,
                        "direction": direction,
                        "bytes": len(plain),
                        "compressed_bytes": len(stream),
                        "ratio": 1 - len(stream) / len(plain),
                        "wall_s": wall,
                        "gbps": len(plain) / wall / 1e9,
                    }
                    for p in PHASES:
                        row[f"{p}_s"] = timer.seconds.get(p, 0.0) / args.iters
                    rows.append(row)
                    print(
                        f"{name:10s} {engine:7s} bs={bs:<6d} {direction:10s} "
                        f"{row['gbps']:.3f} GB/s ratio={row['ratio']:.3f}"
                    )

    with open(args.out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {len(rows)} rows to {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
