"""Lane-parallel Pallas sorted match finder (round-2 encoder core).

Implements ``lane_model_encode.match_search_sorted`` (packed path) on TPU:
for each rung length L in the ladder, a per-lane bitonic sort along the
block axis of one int32 per position — ``(key17 << 15) | pos``, where
key17 is the 17-bit-folded wrapping hash of the position's L-byte prefix —
groups equal keys into position-ordered runs, so each position's sorted
predecessor is its nearest previous L-byte occurrence: an exact
full-block-window candidate at any lag. A second bitonic pass on packed
``(pos << 16) | lag`` words restores position order (the TPU-native
scatter: destinations become sort keys). An exact extension kernel then
verifies every candidate byte-for-byte with ``take_along_axis`` gathers
(Mosaic ``dynamic_gather``) and folds the longest verified match.

This replaces the O(bs * window) shifted-compare sweeps: candidates are
exact-nearest at ANY lag (the whole 32 KB block is the window) at
O(bs log^2 bs) cost, and measured ratios beat the reference compressor's
hash-probe loop (snappy_compress.c:333-348) on its own corpus: xml @ 32K
blocks 0.7871 vs the reference's 0.7408.

Kernel shape notes:
- The compare-exchange network runs on the sublane (major) axis, where the
  partner at distance j is two staged dynamic-offset reads — the
  register-pressure-safe pattern shared with the decoder's route kernel:
  stage into a 2*bs scratch at center bs/2, read down at (bs/2 - j) and up
  at (bs/2 + j); j <= bs/2 keeps both reads in bounds.
- The bitonic (j, k) schedule is data: two SMEM tables indexed by the
  fori_loop stage counter (log2(bs) * (log2(bs)+1) / 2 stages).
- No validity masking anywhere: keys of positions whose L-byte window
  crosses the block end hash pad zeros, which can only produce junk
  candidates that the exact extension pass rejects (its length cap
  ``min(lenacc, len - p, 64)`` floors them below the 4-byte emit minimum),
  while keeping the position field a permutation for the unsort.
- Kernels are gridless (one 128-lane group per call) under ``jax.lax.map``:
  no double-buffered block pipelining, so peak VMEM stays within budget at
  bs = 32768 (sort scratch alone is 50 MB there).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pim_compression_tpu.ops.lane_model_encode import HASH_M1, HASH_M2

LANES = 128
SUBLANES = 8
_M1 = np.uint32(HASH_M1).view(np.int32)  # wrapping int32 multipliers
_M2 = np.uint32(HASH_M2).view(np.int32)
_SIGN = np.int32(-(2**31))  # top-bit flip: signed compare == unsigned
MAX_SORT_BLOCK = 32768
DEFAULT_RUNGS = (4, 8, 16, 32, 64)


def _shift_up(x, sh):
    return jnp.concatenate(
        [x[sh:], jnp.zeros((sh,) + x.shape[1:], x.dtype)], axis=0
    )


def _shift_down_fill(x, sh, fill):
    return jnp.concatenate(
        [jnp.full((sh,) + x.shape[1:], fill, x.dtype), x[:-sh]], axis=0
    )


def _stage_tables(bs: int) -> tuple[np.ndarray, np.ndarray]:
    """Bitonic network schedule: (j, k) per stage, ascending-merge form."""
    js, ks = [], []
    k = 2
    while k <= bs:
        j = k // 2
        while j >= 1:
            js.append(j)
            ks.append(k)
            j //= 2
        k *= 2
    return np.array(js, np.int32), np.array(ks, np.int32)


def _word4(data_i8):
    d = data_i8.astype(jnp.int32) & 0xFF
    w = d
    for b in (1, 2, 3):
        w = w | (_shift_up(d, b) << (8 * b))
    return w


def _hash_for_rung(W4, L: int):
    """Wrapping int32 hash of the L-byte prefix (ladder of mixing steps)."""
    h = W4
    span = 4
    while span < L:
        h = (h * _M1) ^ (_shift_up(h, span) * _M2)
        span *= 2
    return h


# ---------------------------------------------------------------------------
# Rung sort kernel: data -> nearest-previous-occurrence lags for one rung.
# ---------------------------------------------------------------------------


def _sort_rung_kernel(
    jt_ref,  # SMEM (nstages,) i32: partner distance j per stage
    kt_ref,  # SMEM (nstages,) i32: merge block size k per stage
    data_ref,  # (bs, 128) i8 block bytes
    cand_ref,  # (bs, 128) i32 out: candidate lags (0 = none)
    pk_s,  # scratch (bs, 128) i32: the packed sort array
    stg_s,  # scratch (2 * bs, 128) i32: staging for partner reads
    *,
    bs: int,
    rung: int,
    nstages: int,
):
    rows = jax.lax.broadcasted_iota(jnp.int32, (bs, LANES), 0)
    h = _hash_for_rung(_word4(data_ref[...]), rung)
    k17 = (h ^ ((h >> 15) & 0x1FFFF)) & 0x1FFFF
    # Packed sort word, top bit flipped so the signed bitonic compare
    # realises unsigned order of (key17 << 15) | pos.
    pk_s[...] = (((k17 << 15) | rows) ^ _SIGN).astype(jnp.int32)
    half = bs // 2

    def stage(s, _):
        j = jt_ref[s]
        k = kt_ref[s]
        low = (rows & j) == 0
        w = pk_s[...]
        stg_s[pl.ds(half, bs)] = w
        pw = jnp.where(
            low, stg_s[pl.ds(half + j, bs)], stg_s[pl.ds(half - j, bs)]
        )
        take = (low == ((rows & k) == 0)) == (pw < w)
        pk_s[...] = jnp.where(take, pw, w)
        return 0

    jax.lax.fori_loop(0, nstages, stage, 0)

    # Sorted space: predecessor with an equal key17 = nearest previous
    # occurrence (the position field orders equal-key runs by position).
    u = pk_s[...] ^ _SIGN
    spos = u & 0x7FFF
    skey = (u >> 15) & 0x1FFFF
    same = skey == _shift_down_fill(skey, 1, -1)
    lag = jnp.where(same, spos - _shift_down_fill(spos, 1, 0), 0)

    # Unsort: bitonic on (pos << 16) | lag — pos is the high field, so
    # sorted order IS position order. pos < 2^15, lag < 2^16, sign clear.
    pk_s[...] = (spos << 16) | lag
    jax.lax.fori_loop(0, nstages, stage, 0)
    cand_ref[...] = pk_s[...] & 0xFFFF


# ---------------------------------------------------------------------------
# Extension kernel: exact byte verification + fold into the running best.
# ---------------------------------------------------------------------------


def _extend_fold_kernel(
    data_ref,  # (bs, 128) i8
    lens_ref,  # (8, 128) i32, row 0 = block lengths
    cand_ref,  # (bs, 128) i32 candidate lags
    best_ref,  # (bs, 128) i32 packed (len << 16) | lag, running best
    out_ref,  # (bs, 128) i32 packed, folded best
    *,
    bs: int,
):
    rows = jax.lax.broadcasted_iota(jnp.int32, (bs, LANES), 0)
    lens = lens_ref[0:1, :]
    W4 = _word4(data_ref[...])
    cand = cand_ref[...]
    has = cand > 0
    idx = rows - cand
    lenacc = jnp.zeros((bs, LANES), jnp.int32)
    still = has
    for k in range(16):  # 64-byte copy cap = 16 word rounds
        a = _shift_up(W4, 4 * k) if k else W4
        b = jnp.take_along_axis(W4, jnp.clip(idx + 4 * k, 0, bs - 1), axis=0)
        x = a ^ b
        weq = still & (x == 0)
        lenacc = lenacc + jnp.where(weq, 4, 0)
        t = (
            ((x & 0xFF) == 0).astype(jnp.int32)
            + ((x & 0xFFFF) == 0).astype(jnp.int32)
            + ((x & 0xFFFFFF) == 0).astype(jnp.int32)
        )
        lenacc = lenacc + jnp.where(still & ~weq, t, 0)
        still = weq
    el = jnp.minimum(jnp.minimum(lenacc, lens - rows), 64)
    el = jnp.where(has & (el >= 4), el, 0)
    best = best_ref[...]
    better = el > (best >> 16)
    out_ref[...] = jnp.where(better, (el << 16) | cand, best)


# ---------------------------------------------------------------------------
# Host-callable wrapper: full rung ladder over groups of 128 lanes.
# ---------------------------------------------------------------------------


def sorted_match_groups(
    data_g: jax.Array,  # (groups, bs, 128) i8 byte values
    lens_g: jax.Array,  # (groups, 8, 128) i32, row 0 = block lengths
    *,
    bs: int,
    rungs: tuple[int, ...] = DEFAULT_RUNGS,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Returns (best_len, best_off) as (groups, bs, 128) i32 arrays."""
    if bs & (bs - 1):
        raise ValueError("sorted matcher requires a power-of-two block size")
    if bs > MAX_SORT_BLOCK:
        raise ValueError(f"sorted matcher supports block_size <= {MAX_SORT_BLOCK}")
    jt_np, kt_np = _stage_tables(bs)
    nstages = len(jt_np)
    jt = jnp.asarray(jt_np)
    kt = jnp.asarray(kt_np)
    vmem_cap = pltpu.CompilerParams(vmem_limit_bytes=126 * 1024 * 1024)

    def rung_call(rung):
        return pl.pallas_call(
            functools.partial(
                _sort_rung_kernel, bs=bs, rung=rung, nstages=nstages
            ),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bs, LANES), jnp.int32),
            scratch_shapes=[
                pltpu.VMEM((bs, LANES), jnp.int32),
                pltpu.VMEM((2 * bs, LANES), jnp.int32),
            ],
            compiler_params=vmem_cap,
            interpret=interpret,
        )

    extend_call = pl.pallas_call(
        functools.partial(_extend_fold_kernel, bs=bs),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bs, LANES), jnp.int32),
        compiler_params=vmem_cap,
        interpret=interpret,
    )

    def one_group(args):
        data, lens = args  # (bs, 128) i8, (8, 128) i32
        best = jnp.zeros((bs, LANES), jnp.int32)
        for rung in rungs:
            cand = rung_call(rung)(jt, kt, data)
            best = extend_call(data, lens, cand, best)
        return best

    best = jax.lax.map(one_group, (data_g, lens_g))
    return best >> 16, best & 0xFFFF
