"""Benchmark entry point (driver contract: print ONE JSON line).

Measures end-to-end encode + decode throughput of the device engine on the
corpus (xml, the largest shipped file), verifies bit-exactness against the
oracle, and reports GB/s with ``vs_baseline`` = speedup over the reference's
host path (our bit-identical C++ reimplementation of it, single-threaded —
the reference publishes no absolute numbers, BASELINE.md).

Env knobs: PIM_BENCH_ENGINE (default: best available device engine),
PIM_BENCH_REPEAT (input replication factor, default 1), PIM_BENCH_ITERS.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")


def main() -> int:
    import numpy as np  # noqa: F401

    from pim_compression_tpu import native, runtime
    from pim_compression_tpu.runtime.profiling import PhaseTimer
    from pim_compression_tpu.utils.config import CodecConfig

    corpus = "/root/reference/test/xml.snappy"
    engine = os.environ.get("PIM_BENCH_ENGINE", "xla")
    repeat = int(os.environ.get("PIM_BENCH_REPEAT", "1"))
    iters = int(os.environ.get("PIM_BENCH_ITERS", "2"))

    stream0 = open(corpus, "rb").read()
    plain0 = native.decompress(stream0) if native.available() else None
    if plain0 is None:
        from pim_compression_tpu.format import oracle

        plain0 = oracle.decompress(stream0)
    plain = plain0 * repeat

    cfg = CodecConfig(engine=engine)

    # Warm up (compile), then measure.
    stream = runtime.compress(plain, cfg)
    roundtrip = runtime.decompress(stream, cfg)
    assert roundtrip == plain, "bit-exactness failure"

    enc_s = dec_s = 0.0
    for _ in range(iters):
        t = PhaseTimer()
        stream = runtime.compress(plain, cfg, t)
        enc_s += t.total
        t = PhaseTimer()
        out = runtime.decompress(stream, cfg, t)
        dec_s += t.total
    assert out == plain
    n = len(plain) * iters
    enc_gbps = n / enc_s / 1e9
    dec_gbps = n / dec_s / 1e9
    combined = 2 * n / (enc_s + dec_s) / 1e9

    # Baseline: single-threaded native host codec (the reference host path).
    base_combined = None
    if native.available():
        t0 = time.perf_counter()
        bstream = native.compress(plain, num_threads=1)
        t1 = time.perf_counter()
        bout = native.decompress(bstream, num_threads=1)
        t2 = time.perf_counter()
        assert bout == plain
        base_combined = 2 * len(plain) / (t2 - t0) / 1e9

    print(
        json.dumps(
            {
                "metric": f"encode+decode GB/s ({engine} engine, xml corpus x{repeat})",
                "value": round(combined, 4),
                "unit": "GB/s",
                "vs_baseline": round(combined / base_combined, 3)
                if base_combined
                else None,
            }
        )
    )
    print(
        f"# encode {enc_gbps:.3f} GB/s, decode {dec_gbps:.3f} GB/s, "
        f"host-seq baseline {base_combined:.3f} GB/s"
        if base_combined
        else "",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
