"""Transfer-clean device throughput measurement (lane-group slope).

The attached endpoint is real TPU silicon behind a slow tunnel: ~30-40 ms
fixed dispatch floor and ~10 MB/s device->numpy readback
(docs/transfer_probe.json, docs/hw_probe.json), so any wall-clock number
that ships multi-MB outputs to the host measures the tunnel, not the
kernels. This module times the production pallas pipelines with all big
arrays device-resident — the only host-visible outputs are an int32
checksum and the per-block size/err sidecars (<= 4 KB d2h) — at G=1 and
G=8 lane groups (128 vs 1024 blocks); the slope ``(t_G8 - t_G1) / 7`` is
per-group device seconds with the dispatch floor cancelled.

Used by ``bench.py`` (the driver-facing headline metric) and
``scripts/device_pipeline_times.py`` (the standalone evidence record).

Reference analog: cycles -> seconds conversion discipline
(snappy/scripts/asplos21/run_tests.py:45,61,97) and max-cycles device
attribution (scripts/parse_output_file.py:6-28).
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp

LANES = 128


def _timed(fn, args, iters: int):
    # Sync through the tunnel with a SMALL np.asarray readback each call —
    # block_until_ready does not flush the axon queue; fn must therefore
    # return only small outputs.
    t0 = time.perf_counter()
    out = [np.asarray(x) for x in jax.tree.leaves(fn(*args))]
    first_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = [np.asarray(x) for x in jax.tree.leaves(fn(*args))]
        best = min(best, time.perf_counter() - t0)
    return best, first_s, out


def slope_measure(plain: bytes, cfg, iters: int = 5) -> dict:
    """Measure device encode/decode GB/s for the production pallas
    pipelines at ``cfg`` (a CodecConfig) on real ``plain`` corpus bytes.

    Needs ``len(plain) >= 1024 * cfg.block_size``; uses the first 1024
    blocks. Returns per-pipeline slope seconds and GB/s plus the encode
    ratio observed on the G=8 batch.
    """
    from pim_compression_tpu import native
    from pim_compression_tpu.ops import pallas_decode as pd
    from pim_compression_tpu.ops import pallas_encode as pe
    from pim_compression_tpu.runtime import pipeline as rp

    bs = cfg.block_size
    NB = 8 * LANES
    need = bs * NB
    if len(plain) < need:
        rep = (need + len(plain) - 1) // len(plain)
        plain = (plain * rep)[:need]
    plain = plain[:need]

    blocks_np, lens_np = rp.blockize_plain(plain, bs, NB)
    stream = native.compress(plain, block_size=bs)
    info = rp.scan_frames(stream)
    comp_np, clen_np, olen_np = rp.blockize_compressed(stream, info, NB)

    enc_kwargs = dict(
        block_size=bs, matcher=cfg.matcher, rungs=cfg.rungs,
        prev_k=cfg.prev_k, stride2_min=cfg.stride2_min, sel_cap=cfg.sel_cap,
        sel_all=cfg.sel_all, rung_strides=cfg.rung_strides,
        ext_cap=cfg.ext_cap, neighbor=cfg.neighbor,
        sort_window=cfg.sort_window, rung_pick=cfg.effective_rung_pick,
        max_lag=cfg.effective_max_lag, sweep_span=cfg.sweep_span,
    )

    @jax.jit
    def enc_fn(blocks, lens):
        comp, sizes = pe.encode_blocks_pallas(blocks, lens, **enc_kwargs)
        return jnp.sum(comp.astype(jnp.int32)), sizes

    @jax.jit
    def dec_fn(comp, clen, olen):
        out, err = pd.decode_blocks_pallas(comp, clen, olen, block_size=bs)
        return jnp.sum(out.astype(jnp.int32)), err

    res: dict = {"bs": bs}
    args1 = (
        jax.device_put(jnp.asarray(np.array(blocks_np[:LANES]))),
        jax.device_put(jnp.asarray(lens_np[:LANES])),
    )
    args8 = (
        jax.device_put(jnp.asarray(np.array(blocks_np))),
        jax.device_put(jnp.asarray(lens_np)),
    )
    t1, c1, _ = _timed(enc_fn, args1, iters)
    t8, c8, (_, sz) = _timed(enc_fn, args8, iters)
    per = (t8 - t1) / 7.0
    res["encode"] = {
        "t_g1_s": round(t1, 4), "t_g8_s": round(t8, 4),
        "per_group_s": round(per, 5),
        "device_gbps": round(bs * LANES / per / 1e9, 4),
        "ratio": round(1.0 - float(np.asarray(sz).sum()) / (bs * NB), 4),
        "compile_s": round(c1 + c8, 1),
    }

    argsd1 = (
        jax.device_put(jnp.asarray(np.array(comp_np[:LANES]))),
        jax.device_put(jnp.asarray(clen_np[:LANES])),
        jax.device_put(jnp.asarray(olen_np[:LANES])),
    )
    argsd8 = (
        jax.device_put(jnp.asarray(np.array(comp_np))),
        jax.device_put(jnp.asarray(clen_np)),
        jax.device_put(jnp.asarray(olen_np)),
    )
    t1, c1, _ = _timed(dec_fn, argsd1, iters)
    t8, c8, (_, err) = _timed(dec_fn, argsd8, iters)
    if int(np.asarray(err).sum()) != 0:
        raise RuntimeError("device decode flagged errors during bench")
    per = (t8 - t1) / 7.0
    res["decode"] = {
        "t_g1_s": round(t1, 4), "t_g8_s": round(t8, 4),
        "per_group_s": round(per, 5),
        "device_gbps": round(bs * LANES / per / 1e9, 4),
        "compile_s": round(c1 + c8, 1),
    }
    return res
