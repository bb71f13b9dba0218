#!/usr/bin/env python3
"""Golden-corpus check through a chosen engine, single process.

The reference's `make test` harness cmp's every decompressed corpus file
against its golden twin (snappy/Makefile:54-60); `make test-corpus` does
that via the CLI with the host codec. This driver does the same through
ANY engine — including the pallas kernels on the real TPU — in ONE
process, so the remote Mosaic compile is paid once and reused across
files (there is no cross-process compile cache on the axon endpoint).

    python scripts/corpus_check.py [--engine pallas] [--compress]

Decompression: byte-compare against the golden .txt (or oracle
round-trip for xml, which ships compressed-only). With --compress, also
re-compress every plaintext and require the stream to be oracle-valid
and no larger than the reference's .snappy.
"""

from __future__ import annotations

import argparse
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

CORPUS = pathlib.Path("/root/reference/test")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--engine", default="pallas")
    ap.add_argument("--block-size", type=int, default=32768)
    ap.add_argument("--compress", action="store_true")
    ap.add_argument("--rungs", default=None, help="e.g. 4,32 (sorted matcher)")
    ap.add_argument("--prev-k", type=int, choices=list(range(1, 9)), default=1)
    ap.add_argument(
        "--stride2-min", type=int, choices=[0, 8, 16, 32, 64], default=0
    )
    args = ap.parse_args()

    from pim_compression_tpu import runtime
    from pim_compression_tpu.format import oracle
    from pim_compression_tpu.utils.config import CodecConfig

    cfg = CodecConfig(
        engine=args.engine, block_size=args.block_size, strict_engine=True,
        rungs=(
            tuple(int(r) for r in args.rungs.split(",")) if args.rungs else None
        ),
        prev_k=args.prev_k, stride2_min=args.stride2_min,
    )
    failures = 0
    for snappy in sorted(CORPUS.glob("*.snappy")):
        name = snappy.stem
        stream = snappy.read_bytes()
        out = runtime.decompress(stream, cfg)
        txt = CORPUS / f"{name}.txt"
        want = txt.read_bytes() if txt.exists() else oracle.decompress(stream)
        ok = out == want
        print(f"{'OK' if ok else 'FAIL'} decompress {name} ({len(out)} B)")
        failures += not ok
        if args.compress:
            enc = runtime.compress(want, cfg)
            ok = oracle.decompress(enc) == want
            ok_size = len(enc) <= len(stream)
            print(
                f"{'OK' if ok else 'FAIL'} compress   {name} "
                f"({len(enc)} B vs reference {len(stream)} B"
                f"{'' if ok_size else ' — LARGER'})"
            )
            failures += not ok
    print("corpus check:", "PASS" if not failures else f"{failures} FAILURES")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
