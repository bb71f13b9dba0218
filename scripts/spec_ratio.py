#!/usr/bin/env python3
"""Fast spec-level ratio measurement for sorted-matcher configs.

Runs the NumPy executable spec (match_search_sorted + lazy + greedy parse +
emit-size math, no routing) over corpus files blocked at --bs and prints the
ratio (1 - compressed/original, reference formula dpu_snappy.c:212-219) per
config. Used to pick kernel operating points before paying Pallas compile
times; stream header + 4-byte frame sizes are included so numbers match the
CLI's.

    python scripts/spec_ratio.py --bs 32768 --file xml \
        --config "rungs=4,32 prev_k=2 stride2_min=4 neighbor=1"
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np

from pim_compression_tpu.format.varint import encode_varint32
from pim_compression_tpu.ops import lane_model_encode as lme

REF_TEST = pathlib.Path("/root/reference/test")


def load_plain(name: str) -> bytes:
    txt = REF_TEST / f"{name}.txt"
    if txt.exists():
        return txt.read_bytes()
    from pim_compression_tpu import native

    return native.decompress((REF_TEST / f"{name}.snappy").read_bytes())


def parse_config(s: str) -> dict:
    cfg: dict = {}
    for part in s.split():
        k, v = part.split("=")
        if k in ("rungs", "rung_windows", "rung_strides"):
            cfg[k] = tuple(int(x) for x in v.split(","))
        elif k in ("neighbor", "sel_all"):
            cfg[k] = bool(int(v))
        else:
            cfg[k] = int(v)
    return cfg


def measure(plain: bytes, bs: int, cfg: dict) -> tuple[int, float]:
    nb = -(-len(plain) // bs)
    blocks = np.zeros((nb, bs), np.uint8)
    lens = np.zeros(nb, np.int32)
    raw = np.frombuffer(plain, np.uint8)
    for i in range(nb):
        ch = raw[i * bs : (i + 1) * bs]
        blocks[i, : len(ch)] = ch
        lens[i] = len(ch)
    data = blocks.T.astype(np.int32)
    t0 = time.time()
    best_len, best_off = lme.match_search_sorted(data, lens, **cfg)
    best_len = lme.lazy_defer(best_len)
    accept, is_copy = lme.greedy_parse(best_len, lens)
    sizes = lme.emit_sizes(lens, accept, is_copy, best_len, best_off)
    dt = time.time() - t0
    total = (
        len(encode_varint32(len(plain)))
        + len(encode_varint32(bs))
        + int(sizes.sum())
        + 4 * nb
    )
    return total, dt


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=32768)
    ap.add_argument("--file", action="append", default=None)
    ap.add_argument("--config", action="append", required=True)
    args = ap.parse_args()
    files = args.file or ["xml"]
    for name in files:
        plain = load_plain(name)
        for cs in args.config:
            cfg = parse_config(cs)
            total, dt = measure(plain, args.bs, cfg)
            ratio = 1 - total / len(plain)
            print(
                f"{name:10s} bs={args.bs} [{cs}] -> {total} bytes, "
                f"ratio {ratio:.4f} ({dt:.1f}s)"
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())
