"""Command-line driver (role of the reference CLI, ``dpu_snappy.c:93-236``).

Flag-compatible with the reference binary:

    -d          use the device (TPU) engine        [reference: use DPUs]
    -c          compress (default is decompress)
    -b <size>   decompressed block size (default 32768)
    -i <file>   input file (required)
    -o <file>   output file (default "output.txt")

Extensions: ``--engine {oracle,native,xla,pallas}`` overrides ``-d``,
``--threads`` for the native engine, ``--json`` for structured metrics.
The human output preserves the reference's stdout contract (its benchmark
scripts parse "Compression ratio:" and per-phase lines — SURVEY.md §5.5):
ratio is printed as ``1 - compressed/original`` exactly like
``dpu_snappy.c:212-219``.
"""

from __future__ import annotations

import argparse
import os
import pathlib
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="pim-compression-tpu",
        description="TPU-native block-parallel Snappy codec",
    )
    p.add_argument("-d", action="store_true", help="use the device (TPU) engine")
    p.add_argument("-c", action="store_true", help="compress instead of decompress")
    p.add_argument("-b", type=int, default=None, metavar="SIZE", help="block size")
    p.add_argument("-i", required=True, metavar="IN", help="input file")
    p.add_argument("-o", default="output.txt", metavar="OUT", help="output file")
    p.add_argument(
        "--engine",
        choices=["oracle", "native", "xla", "pallas"],
        default=None,
        help="codec engine (overrides -d; default: native, or pallas with -d)",
    )
    p.add_argument("--threads", type=int, default=0, help="native engine threads")
    p.add_argument(
        "--window", type=int, default=512,
        help="pallas encoder match window (bigger = better ratio, slower)",
    )
    p.add_argument(
        "--coarse-window", type=int, default=0,
        help="pallas encoder long-range match reach beyond --window (0 = off)",
    )
    p.add_argument(
        "--coarse-mode", choices=["sampled", "granular"], default="sampled",
        help="long-range search: every-8th lag at byte resolution, or ALL "
        "lags via the 1/8-resolution phased-granule kernel",
    )
    p.add_argument(
        "--matcher", choices=["sorted", "sweep"], default="sorted",
        help="pallas encoder match finder: 'sorted' = exact whole-block "
        "window via bitonic rung sorts (ignores --window); 'sweep' = "
        "exhaustive shifted-compare sweep bounded by --window",
    )
    p.add_argument(
        "--rungs", default="4,16",
        help="sorted-matcher rung ladder, e.g. 4,16,64; 'full' = "
        "4,8,16,32,64 (default: 4,16 — the round-4 rung-pick flagship)",
    )
    p.add_argument(
        "--prev-k", type=int, choices=list(range(1, 9)), default=1,
        help="sorted-matcher candidates per position on the 4-byte rung: "
        "k also tries the 2nd..k-th-nearest previous occurrences (better "
        "ratio, ~one extra extension pass each; diminishing past 4; "
        "> 1 opts into the select ladder and disables --rung-pick). "
        "Default 1 (rung-pick flagship); 4 balanced; 6 ratio champion",
    )
    p.add_argument(
        "--stride2-min", type=int, choices=[0, 8, 16, 32, 64], default=0,
        help="sorted-matcher half-density threshold: rungs >= this length "
        "sort only even positions (~40%% fewer sort ops on those rungs "
        "at a small ratio cost); 0 = off",
    )
    p.add_argument(
        "--sel-cap", type=int, default=0,
        help="sorted-matcher select-then-extend cap (bytes, multiple of 4 "
        "in [4,64]): prev candidates get only a cheap capped extension and "
        "the winner alone is fully extended; > 0 opts into the select "
        "ladder and disables --rung-pick; 0 = off (default; 16 = the "
        "measured knee of the select ladder)",
    )
    p.add_argument(
        "--sel-all", default=False,
        action=__import__("argparse").BooleanOptionalAction,
        help="sorted-matcher global select-then-extend (needs --sel-cap): "
        "every candidate array (rungs + prev ladder) gets only the capped "
        "extension in one fused kernel; the winner's full extension "
        "resumes from the capped state (default off — pair with "
        "--sel-cap for the round-3 select-ladder flagship)",
    )
    p.add_argument(
        "--rung-strides", default=None,
        help="sorted-matcher per-rung sort densities, e.g. 1,8 (parallel "
        "to --rungs; values 1/2/4/8; overrides --stride2-min)",
    )
    p.add_argument(
        "--rung-pick", default=True,
        action=__import__("argparse").BooleanOptionalAction,
        help="rung-priority selection (the round-4 flagship, default on): "
        "the longest rung with a candidate wins and one from-scratch "
        "extension verifies it - fewer gather sweeps than the select "
        "ladder at better xml ratio. Auto-disabled when --prev-k > 1 or "
        "--sel-cap > 0 (those opt into the select ladder)",
    )
    p.add_argument(
        "--sort-window", type=int, default=0,
        help="sorted-matcher candidate window (bytes, power of two "
        "dividing the block size; 0 = whole block): chunk-local rung "
        "sorts bound the extension sweeps' reach - a device-speed / "
        "ratio tradeoff (xml @32K: 0.788 full, 0.769 @16384, 0.742 "
        "@8192 vs reference 0.741)",
    )
    p.add_argument(
        "--ext-cap", type=int, default=48,
        help="sorted-matcher full-extension cap (bytes, multiple of 4 in "
        "[max(--sel-cap, 4), 64]): longer matches emit as chained copies "
        "of at most this length (default 48 — ratio-neutral with "
        "--neighbor, a quarter fewer extension rounds)",
    )
    p.add_argument(
        "--neighbor", default=True,
        action=__import__("argparse").BooleanOptionalAction,
        help="fold each position's left-neighbor match one byte shorter "
        "after the rung/prev ladder: one elementwise pass, +0.7 xml "
        "ratio points @32K (default on)",
    )
    p.add_argument(
        "--max-lag", type=int, default=-1,
        help="sorted-matcher candidate reach cap (bytes; 0 = whole "
        "block): bounds the extension sweeps' gather distance — the "
        "dominant device encode cost — at a small ratio price (xml @32K "
        "flagship: 0.8050 full / 0.7925 @8192 / 0.7754 @4096; reference "
        "bar 0.7408). Default -1 = auto (8192 up to 32K blocks; full "
        "reach above, where capping costs more ratio)",
    )
    p.add_argument(
        "--sweep-span", type=int, choices=[2, 4, 8, 16, 32], default=8,
        help="extension-sweep span: consecutive source chunks per gather "
        "iteration (span 8 halves flagship sweep iterations vs 4)",
    )
    p.add_argument(
        "--preset", choices=["speed", "balanced", "ratio"], default=None,
        help="measured operating point for the chosen block size (the "
        "reference's per-file best-config table, host_speedup.py:13-21): "
        "sets the matcher knobs; explicitly passed knob flags still "
        "override the preset",
    )
    p.add_argument(
        "--verify", action="store_true",
        help="on-device decode-after-encode verification: every encoded "
        "batch is decoded by the production decoder on the device and "
        "compared against the input before assembly (the reference "
        "harness's cmp check, on-chip)",
    )
    p.add_argument(
        "--debug-block", type=int, default=None, metavar="N",
        help="diagnostic mode: dump block N's per-phase state (spec vs "
        "interpret-mode kernels, first-mismatch report) to "
        "pim_debug_block.npz and exit — the reference's DEBUG build + "
        "dbg_printf analog (snappy/Makefile:6-8); PIM_DEBUG_BLOCK env "
        "works too",
    )
    p.add_argument(
        "--no-triage", action="store_true",
        help="disable the incompressible fast path (host triage that "
        "diverts near-random blocks to raw literal frames with zero "
        "device work)",
    )
    p.add_argument(
        "--strict-engine", action="store_true",
        help="fail instead of falling back to xla when the pallas kernels "
        "do not cover the requested block size",
    )
    p.add_argument(
        "--pipeline-depth", type=int, default=2,
        help="device batches in flight (1 = synchronous phases, exact "
        "per-phase timing breakdown)",
    )
    p.add_argument("--json", action="store_true", help="emit structured metrics")
    p.add_argument(
        "--profile",
        metavar="DIR",
        default=None,
        help="capture a jax.profiler trace of the codec run into DIR "
        "(device-level tracing, the analog of the reference's per-tasklet "
        "cycle counters)",
    )
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    from pim_compression_tpu import runtime
    from pim_compression_tpu.format import constants as C
    from pim_compression_tpu.format.varint import decode_varint32
    from pim_compression_tpu.runtime.profiling import PhaseTimer
    from pim_compression_tpu.utils.config import CodecConfig
    from pim_compression_tpu.utils.errors import SnappyError

    engine = args.engine or ("pallas" if args.d else "native")
    block_size = args.b or C.DEFAULT_BLOCK_SIZE
    # Preset knobs apply only where the flag was left at its parser default
    # (explicit knob flags override the preset, like the reference's
    # best-config table + command line).
    preset_kw: dict = {}
    if args.preset:
        from pim_compression_tpu.utils.config import preset_overrides

        parser = build_parser()
        for field, value in preset_overrides(args.preset, block_size).items():
            # preset field names == argparse dests; a flag left at its
            # parser default takes the preset value
            if getattr(args, field, None) == parser.get_default(field):
                preset_kw[field] = value
        if "rungs" in preset_kw:  # bypass the string parse below
            args.rungs = ",".join(str(r) for r in preset_kw.pop("rungs"))
    try:
        config = CodecConfig(
            block_size=block_size, engine=engine, num_threads=args.threads,
            match_window=args.window, coarse_window=args.coarse_window,
            coarse_mode=args.coarse_mode, pipeline_depth=args.pipeline_depth,
            matcher=args.matcher, strict_engine=args.strict_engine,
            rungs=(
                None
                if args.rungs in (None, "", "full")
                else tuple(int(r) for r in args.rungs.split(","))
            ),
            prev_k=preset_kw.pop("prev_k", args.prev_k),
            sel_cap=(sel_cap := preset_kw.pop("sel_cap", args.sel_cap)),
            # the explicit-flag fallback gates on the RESOLVED sel_cap:
            # `--preset balanced -b 65536 --sel-all` must keep sel_all
            # with the preset's sel_cap=16
            sel_all=preset_kw.pop("sel_all", args.sel_all and sel_cap > 0),
            raw_triage=not args.no_triage,
            verify=args.verify,
            stride2_min=args.stride2_min,
            rung_strides=(
                tuple(int(s) for s in args.rung_strides.split(","))
                if args.rung_strides
                else None
            ),
            ext_cap=args.ext_cap,
            neighbor=args.neighbor,
            sort_window=args.sort_window,
            rung_pick=args.rung_pick,
            max_lag=preset_kw.pop("max_lag", args.max_lag),
            sweep_span=preset_kw.pop("sweep_span", args.sweep_span),
        )
    except ValueError as e:
        print(f"error: {e}", file=sys.stderr)
        return 2

    in_path = pathlib.Path(args.i)
    if not in_path.is_file():
        print(f"error: input file not found: {in_path}", file=sys.stderr)
        return 2
    data = in_path.read_bytes()

    dbg = args.debug_block
    if dbg is None and os.environ.get("PIM_DEBUG_BLOCK"):
        dbg = int(os.environ["PIM_DEBUG_BLOCK"])
    if dbg is not None:
        from pim_compression_tpu.utils import debug as dbg_mod

        if args.c:
            blk = data[dbg * block_size : (dbg + 1) * block_size]
            if not blk:
                print(f"error: block {dbg} out of range", file=sys.stderr)
                return 2
            dbg_mod.debug_encode_block(
                blk, block_size=block_size, rungs=config.rungs,
                prev_k=config.prev_k, sel_cap=config.sel_cap,
                sel_all=config.sel_all, stride2_min=config.stride2_min,
                rung_strides=config.rung_strides,
            )
        else:
            import struct

            _, pos = decode_varint32(data, 0)
            sbs, pos = decode_varint32(data, pos)
            total, _ = decode_varint32(data, 0)
            idx = 0
            while pos < len(data):
                (csz,) = struct.unpack("<I", data[pos : pos + 4])
                if idx == dbg:
                    out_len = min(sbs, total - dbg * sbs)
                    dbg_mod.debug_decode_block(
                        data[pos + 4 : pos + 4 + csz], block_size=sbs,
                        out_len=out_len,
                    )
                    break
                pos += 4 + csz
                idx += 1
            else:
                print(f"error: block {dbg} out of range", file=sys.stderr)
                return 2
        return 0

    timer = PhaseTimer()
    profiler_ctx = None
    if args.profile:
        import jax

        profiler_ctx = jax.profiler.trace(args.profile)
        profiler_ctx.__enter__()
    try:
        if args.c:
            result = runtime.compress(data, config, timer)
            original, compressed = len(data), len(result)
        else:
            result = runtime.decompress(data, config, timer)
            original, compressed = len(result), len(data)
            try:  # report the stream's own block size, not the -b default
                _, pos = decode_varint32(data, 0)
                block_size, _ = decode_varint32(data, pos)
            except ValueError:
                pass
    except (SnappyError, ValueError) as e:
        print(f"error: {e}", file=sys.stderr)
        return 1
    finally:
        if profiler_ctx is not None:
            profiler_ctx.__exit__(None, None, None)
            print(f"profiler trace written to {args.profile}")

    pathlib.Path(args.o).write_bytes(result)

    mode = "compression" if args.c else "decompression"
    print(f"Using {engine} engine for {mode} (block size {block_size})")
    if original:
        # Ratio formula per the reference CLI (dpu_snappy.c:212-219).
        ratio = 1.0 - compressed / original
        print(f"Compression ratio: {ratio:.6f}")
    print(timer.human())
    if args.json:
        print(
            timer.json(
                engine=engine,
                mode=mode,
                block_size=block_size,
                original_bytes=original,
                compressed_bytes=compressed,
            )
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
