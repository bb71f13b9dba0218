"""Kernel debug dump: one block's per-phase state, spec vs device kernels.

VERDICT r3 item 8 — the reference has a DEBUG build tier
(``snappy/Makefile:6-8``) with device-side ``dbg_printf``
(``dpu-decompress/dpu_decompress.c:142``); here the analog is a dump of
every pipeline phase for ONE selected block, computed twice: by the NumPy
executable spec (``ops/lane_model_encode.py`` / ``ops/lane_model.py``)
and by the interpret-mode Pallas kernels, with a first-mismatch report
per phase. A regression in any phase is then localizable without
hand-instrumenting kernels.

Activate from the CLI with ``--debug-block N`` (or ``PIM_DEBUG_BLOCK=N``
in the environment); programmatic entry points below. Dumps go to
``pim_debug_block.npz`` (override with ``PIM_DEBUG_OUT``).

Phases dumped for encode (block content ``data[:length]`` at ``bs``):
    match.len / match.off   spec match_search_sorted vs pallas
                            sorted_match_groups (interpret)
    lazy.len                spec lazy_defer of the kernel-config matcher
    parse.accept/.is_copy   spec greedy_parse
    emit.sizes              spec emit_sizes per-block total
    bytes.spec / bytes.kern spec encode_lanes vs encode_blocks_pallas

For decode (a framed block payload): the spec's DFA tokens, routed rows
and resolved output vs the pallas decoder's final bytes.
"""

from __future__ import annotations

import os
import pathlib

import numpy as np

LANES = 128


def _first_mismatch(a: np.ndarray, b: np.ndarray) -> int:
    if a.shape != b.shape:
        return 0
    neq = np.nonzero(a.ravel() != b.ravel())[0]
    return int(neq[0]) if neq.size else -1


def debug_encode_block(
    block: bytes,
    *,
    block_size: int,
    rungs=None,
    prev_k: int = 2,
    sel_cap: int = 16,
    sel_all: bool = True,
    stride2_min: int = 0,
    rung_strides=None,
    out_path: str | None = None,
) -> dict:
    """Dump every encode phase for one block; returns {phase: array} and
    prints a spec-vs-kernel mismatch summary."""
    import jax.numpy as jnp

    from pim_compression_tpu.ops import lane_model_encode as lme
    from pim_compression_tpu.ops import pallas_encode as pe
    from pim_compression_tpu.ops import pallas_match as pm

    bs = block_size
    rungs = tuple(rungs) if rungs else (4,)
    n = len(block)
    assert 0 < n <= bs
    # One real block in lane 0, zeros elsewhere (the kernels are
    # lane-parallel; a single-lane dump keeps the npz small).
    data = np.zeros((bs, LANES), np.int32)
    data[:n, 0] = np.frombuffer(block, np.uint8)
    lens = np.zeros((LANES,), np.int32)
    lens[0] = n

    dump: dict = {"data": data[:, 0].astype(np.uint8)}

    # --- spec phases ---
    s_len, s_off = lme.match_search_sorted(
        data, lens, rungs=rungs, prev_k=prev_k, stride2_min=stride2_min,
        sel_cap=sel_cap, sel_all=sel_all, rung_strides=rung_strides,
    )
    dump["spec.match.len"] = s_len[:, 0]
    dump["spec.match.off"] = s_off[:, 0]
    lz = lme.lazy_defer(s_len)
    dump["spec.lazy.len"] = lz[:, 0]
    accept, is_copy = lme.greedy_parse(lz, lens)
    dump["spec.parse.accept"] = accept[:, 0]
    dump["spec.parse.is_copy"] = is_copy[:, 0]
    sizes = lme.emit_sizes(lens, accept, is_copy, lz, s_off)
    dump["spec.emit.size"] = np.array([int(np.asarray(sizes).ravel()[0])])

    cap = pe.encode_capacity(bs)
    blocks_b = np.zeros((LANES, bs), np.uint8)
    blocks_b[0, :n] = np.frombuffer(block, np.uint8)
    lens_b = np.zeros((LANES,), np.int32)
    lens_b[0] = n
    comp_s, size_s = lme.encode_lanes(
        blocks_b, lens_b, bs, cap, matcher="sorted", rungs=rungs,
        prev_k=prev_k, stride2_min=stride2_min, sel_cap=sel_cap,
        sel_all=sel_all, rung_strides=rung_strides,
    )
    dump["spec.bytes"] = comp_s[0, : size_s[0]]

    # --- kernel phases (interpret mode) ---
    data_g = jnp.asarray(data.astype(np.int8)[None])  # (1, bs, 128)
    lens_g = jnp.asarray(
        np.broadcast_to(lens[None, None, :], (1, 8, LANES)).copy()
    )
    k_len, k_off = pm.sorted_match_groups(
        data_g, lens_g, bs=bs, rungs=rungs, prev_k=prev_k,
        stride2_min=stride2_min, sel_cap=sel_cap, sel_all=sel_all,
        rung_strides=rung_strides, interpret=True,
    )
    dump["kern.match.len"] = np.asarray(k_len)[0, :, 0]
    dump["kern.match.off"] = np.asarray(k_off)[0, :, 0]

    comp_k, size_k = pe.encode_blocks_pallas(
        jnp.asarray(blocks_b), jnp.asarray(lens_b), block_size=bs,
        matcher="sorted", rungs=rungs, prev_k=prev_k,
        stride2_min=stride2_min, sel_cap=sel_cap, sel_all=sel_all,
        rung_strides=rung_strides, interpret=True,
    )
    dump["kern.bytes"] = np.asarray(comp_k)[0, : int(np.asarray(size_k)[0])]

    print(f"debug_encode_block: {n} bytes @ bs={bs} rungs={rungs} "
          f"prev{prev_k} sel{sel_cap}{' all' if sel_all else ''}")
    for phase, a, b in (
        ("match.len", dump["spec.match.len"], dump["kern.match.len"]),
        ("match.off", dump["spec.match.off"], dump["kern.match.off"]),
        ("bytes", dump["spec.bytes"], dump["kern.bytes"]),
    ):
        if a.shape != b.shape:
            print(f"  {phase:<12} SHAPE MISMATCH spec{a.shape} kern{b.shape}")
            continue
        fm = _first_mismatch(a, b)
        if fm < 0:
            print(f"  {phase:<12} OK ({a.size} values)")
        else:
            print(f"  {phase:<12} FIRST MISMATCH at {fm}: "
                  f"spec={a.ravel()[fm]} kern={b.ravel()[fm]}")
    print(f"  spec size {dump['spec.emit.size'][0]} "
          f"(emit math) / {dump['spec.bytes'].size} (layout) "
          f"vs kern {dump['kern.bytes'].size}")

    path = pathlib.Path(
        out_path or os.environ.get("PIM_DEBUG_OUT", "pim_debug_block.npz")
    )
    np.savez_compressed(path, **dump)
    print(f"  wrote {path}")
    return dump


def debug_decode_block(
    payload: bytes,
    *,
    block_size: int,
    out_len: int,
    out_path: str | None = None,
) -> dict:
    """Dump decode phases for one compressed block payload (no frame)."""
    import jax.numpy as jnp

    from pim_compression_tpu.ops import lane_model as lm
    from pim_compression_tpu.ops import pallas_decode as pd

    bs = block_size
    cap = pd.pallas_capacity(bs)
    comp = np.zeros((pd.DFA_LANES, cap), np.uint8)
    comp[0, : len(payload)] = np.frombuffer(payload, np.uint8)
    clen = np.zeros((pd.DFA_LANES,), np.int32)
    clen[0] = len(payload)
    olen = np.zeros((pd.DFA_LANES,), np.int32)
    olen[0] = out_len

    dump: dict = {}
    tokens, err_dfa = lm.parse_dfa(
        comp.T.astype(np.int32), clen, olen, bs, 0
    )
    dump["spec.tokens"] = tokens[:, 0]
    dump["spec.dfa.err"] = np.array([int(err_dfa[0])])
    routed, _ = lm.butterfly_route(tokens, bs, err_dfa.copy())
    dump["spec.routed"] = routed[:, 0]
    out_s, err_s = lm.decode_lanes(comp, clen, olen, bs)
    dump["spec.out"] = out_s[0, :out_len]
    dump["spec.err"] = np.array([int(err_s[0])])

    out_k, err_k = pd.decode_blocks_pallas(
        jnp.asarray(comp), jnp.asarray(clen), jnp.asarray(olen),
        block_size=bs, interpret=True,
    )
    dump["kern.out"] = np.asarray(out_k)[0, :out_len]
    dump["kern.err"] = np.array([int(np.asarray(err_k)[0])])

    print(f"debug_decode_block: {len(payload)} -> {out_len} bytes @ bs={bs}")
    fm = _first_mismatch(dump["spec.out"], dump["kern.out"])
    state = "OK" if fm < 0 else f"FIRST MISMATCH at {fm}"
    print(f"  out          {state}; err spec={dump['spec.err'][0]} "
          f"kern={dump['kern.err'][0]}")

    path = pathlib.Path(
        out_path or os.environ.get("PIM_DEBUG_OUT", "pim_debug_block.npz")
    )
    np.savez_compressed(path, **dump)
    print(f"  wrote {path}")
    return dump
