#!/usr/bin/env python3
"""Hardware validation + measurement for the Pallas kernels.

Run on the real TPU the moment it is reachable. Staged so each step syncs
with a small readback (the axon tunnel queues dispatches invisibly —
DESIGN.md) and everything runs under per-step wall-clock accounting:

    python scripts/tpu_validate.py [--bs 4096] [--window 512] [--quick]

Records results to tpu_validation.json.
"""

from __future__ import annotations

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import argparse
import json
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np


def sync(x) -> None:
    np.asarray(x).ravel()[:1]  # force full execution + readback


def save(results: dict) -> None:
    """Append this run to tpu_validation.json (list of run records)."""
    path = REPO / "tpu_validation.json"
    runs: list = []
    if path.exists():
        prev = json.loads(path.read_text())
        runs = prev if isinstance(prev, list) else [prev]
    runs.append(results)
    path.write_text(json.dumps(runs, indent=2) + "\n")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=4096)
    ap.add_argument("--window", type=int, default=512)
    ap.add_argument("--coarse", type=int, default=0)
    ap.add_argument("--granular", action="store_true")
    ap.add_argument("--matcher", choices=["sweep", "sorted"], default="sweep")
    ap.add_argument("--rungs", default=None, help="e.g. 4,16,64")
    ap.add_argument("--prev-k", type=int, choices=list(range(1, 9)), default=1)
    ap.add_argument(
        "--stride2-min", type=int, choices=[0, 8, 16, 32, 64], default=0
    )
    ap.add_argument("--sel-cap", type=int, default=0)
    ap.add_argument("--sel-all", action="store_true")
    ap.add_argument("--rung-strides", default=None, help="e.g. 1,8")
    ap.add_argument("--ext-cap", type=int, default=64)
    ap.add_argument("--neighbor", action="store_true")
    ap.add_argument("--rung-pick", action="store_true")
    ap.add_argument("--sort-window", type=int, default=0)
    ap.add_argument("--max-lag", type=int, default=0)
    ap.add_argument("--sweep-span", type=int, default=4)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--skip-decode", action="store_true")
    ap.add_argument("--skip-encode", action="store_true")
    args = ap.parse_args()

    import jax

    from pim_compression_tpu import native
    from pim_compression_tpu.format import oracle
    from pim_compression_tpu.format.varint import encode_varint32
    from pim_compression_tpu.ops import pallas_decode as pd
    from pim_compression_tpu.ops import pallas_encode as pe

    results: dict = {"device": str(jax.devices()[0]), "bs": args.bs,
        "window": args.window, "coarse": args.coarse,
        "granular": args.granular, "matcher": args.matcher,
        "rungs": args.rungs, "prev_k": args.prev_k,
        "sel_cap": args.sel_cap, "sel_all": args.sel_all,
        "rung_strides": args.rung_strides,
        "stride2_min": args.stride2_min,
        "ext_cap": args.ext_cap, "neighbor": args.neighbor,
        "rung_pick": args.rung_pick, "sort_window": args.sort_window}
    rungs = (
        tuple(int(r) for r in args.rungs.split(",")) if args.rungs else None
    )
    rung_strides = (
        tuple(int(s) for s in args.rung_strides.split(","))
        if args.rung_strides
        else None
    )
    bs = args.bs

    def step(name: str, fn):
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        results[name] = round(dt, 4)
        print(f"[{dt:8.2f}s] {name}")
        return out

    # Workload: xml corpus re-blocked at bs.
    plain = native.decompress(open("/root/reference/test/xml.snappy", "rb").read())
    if args.quick:
        plain = plain[: bs * 1024]
    stream = native.compress(plain, bs)
    info = native.scan_frames(stream)
    nb = len(info["payload_off"])
    nbp = (nb + pd.DFA_LANES - 1) // pd.DFA_LANES * pd.DFA_LANES
    cap = pd.pallas_capacity(bs)
    comp = np.zeros((nbp, cap), np.uint8)
    clen = np.zeros(nbp, np.int32)
    olen = np.zeros(nbp, np.int32)
    raw = np.frombuffer(stream, np.uint8)
    for i in range(nb):
        o, s = int(info["payload_off"][i]), int(info["payload_size"][i])
        comp[i, :s] = raw[o : o + s]
        clen[i] = s
        olen[i] = int(info["out_size"][i])

    print(f"workload: {len(plain)} bytes, {nb} blocks (padded {nbp}) @ bs={bs}")

    # --- decode ---
    if not args.skip_decode:
        comp_d = step("h2d_decode", lambda: jax.device_put(comp))
        clen_d = jax.device_put(clen)
        olen_d = jax.device_put(olen)

        def compile_decode():
            o, e = pd.decode_blocks_pallas(comp_d, clen_d, olen_d, block_size=bs)
            sync(o)
            sync(e)
            return o, e

        out, err = step("decode_compile", compile_decode)
        out_h = np.asarray(out)
        err_h = np.asarray(err)
        got = out_h[:nb].reshape(-1)[: len(plain)].tobytes()
        results["decode_bit_exact"] = got == plain
        results["decode_err_flags"] = int(err_h.sum())
        print("decode bit-exact:", results["decode_bit_exact"], "| err:", err_h.sum())

        def time_decode():
            t0 = time.time()
            for _ in range(args.iters):
                o, e = pd.decode_blocks_pallas(
                    comp_d, clen_d, olen_d, block_size=bs
                )
            sync(o)
            return (time.time() - t0) / args.iters

        dt = step("decode_timed", time_decode)
        results["decode_gbps"] = round(len(plain) / dt / 1e9, 4)
        print(f"decode: {results['decode_gbps']} GB/s")

    if args.skip_encode:
        save(results)
        print(json.dumps(results, indent=2))
        return 0

    # --- encode ---
    blocks = np.zeros((nbp, bs), np.uint8)
    lens = np.zeros(nbp, np.int32)
    praw = np.frombuffer(plain, np.uint8)
    for i in range(nb):
        ch = praw[i * bs : (i + 1) * bs]
        blocks[i, : len(ch)] = ch
        lens[i] = len(ch)
    blocks_d = jax.device_put(blocks)
    lens_d = jax.device_put(lens)

    def run_encode():
        c, s = pe.encode_blocks_pallas(
            blocks_d, lens_d, block_size=bs, window=args.window,
            coarse_window=args.coarse, granular=args.granular,
            matcher=args.matcher, rungs=rungs, prev_k=args.prev_k,
            sel_cap=args.sel_cap, sel_all=args.sel_all,
            rung_strides=rung_strides,
            stride2_min=args.stride2_min,
            ext_cap=args.ext_cap, neighbor=args.neighbor,
            rung_pick=args.rung_pick, sort_window=args.sort_window,
            max_lag=args.max_lag, sweep_span=args.sweep_span,
        )
        sync(c)
        return c, s

    compe, sizes = step("encode_compile", run_encode)
    compe_h, sizes_h = np.asarray(compe), np.asarray(sizes)
    estream = bytearray(encode_varint32(len(plain)) + encode_varint32(bs))
    for i in range(nb):
        estream += int(sizes_h[i]).to_bytes(4, "little")
        estream += compe_h[i, : sizes_h[i]].tobytes()
    results["encode_decodes_ok"] = oracle.decompress(bytes(estream)) == plain
    results["encode_ratio"] = round(1 - len(estream) / len(plain), 4)
    print(
        "encode stream valid:", results["encode_decodes_ok"],
        "| ratio:", results["encode_ratio"],
    )

    def time_encode():
        t0 = time.time()
        for _ in range(args.iters):
            c, s = pe.encode_blocks_pallas(
                blocks_d, lens_d, block_size=bs, window=args.window,
                coarse_window=args.coarse, granular=args.granular,
                matcher=args.matcher, rungs=rungs, prev_k=args.prev_k,
                sel_cap=args.sel_cap, sel_all=args.sel_all,
                rung_strides=rung_strides,
                stride2_min=args.stride2_min,
                ext_cap=args.ext_cap, neighbor=args.neighbor,
                rung_pick=args.rung_pick, sort_window=args.sort_window,
                max_lag=args.max_lag, sweep_span=args.sweep_span,
            )
        sync(c)
        return (time.time() - t0) / args.iters

    dt = step("encode_timed", time_encode)
    results["encode_gbps"] = round(len(plain) / dt / 1e9, 4)
    print(f"encode: {results['encode_gbps']} GB/s")

    save(results)
    print(json.dumps(results, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
