"""Lane-parallel Pallas TPU encode kernels.

Implements ``ops/lane_model_encode.py`` (the executable spec) on TPU. Two
kernels, both gridded over 8 groups of 128 blocks (2-D ``[rows, 128]``
arrays, where int8 tiles are dense and per-vreg throughput is maximal):

- **K1 match search** (``_match_kernel``): for every lag d in [1, window],
  shifted byte equality + AND-doubling run indicators give bucketed match
  lengths {4,8,16,32,64}; an int8 fold keeps the longest/nearest candidate,
  merged into int32 once per 32-lag chunk. Exhaustive within the window —
  strictly better candidates than the reference's collision-prone hash
  probe (snappy_compress.c:333-348), with no hash table and no gathers.
  Dynamic lag shifts are decomposed into a 32-aligned dynamic slice plus 32
  static sub-shifts, so no unaligned dynamic sublane access is needed.
- **K2 parse + emit** (``_emit_kernel``): greedy accept scan (8 rows per
  aligned step), vectorized literal-run and element layout, then four
  monotone token channels (header bytes 0..2 at element heads + literal
  data bytes) routed into compressed-stream rows with the conflict-free
  compact-then-expand schedule shared with the decoder.

Output lengths are bucketed (emitting a shorter copy than the true match is
always format-valid); matches are exact byte equalities, never fingerprints.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pim_compression_tpu.format import constants as C

LANES = 128
SUBLANES = 8
BATCH = SUBLANES * LANES  # blocks per batch
MAX_ENC_BLOCK = 16384
_OCC = 1 << 30


def encode_capacity(block_size: int) -> int:
    cap = C.max_compressed_length(block_size)
    return (cap + 127) // 128 * 128


def _route_rows(bs: int, cap: int) -> int:
    return (max(cap, bs) + 15) // 8 * 8


def _shift_down(x, sh):
    return jnp.concatenate(
        [jnp.zeros((sh,) + x.shape[1:], x.dtype), x[:-sh]], axis=0
    )


def _shift_up(x, sh):
    return jnp.concatenate(
        [x[sh:], jnp.zeros((sh,) + x.shape[1:], x.dtype)], axis=0
    )


def _scan_max_down(x):
    # Inclusive prefix max along axis 0 (log-shift; fill -1). Mosaic has no
    # cummax primitive, so scans are built from concat-shifts.
    n = x.shape[0]
    sh = 1
    while sh < n:
        shifted = jnp.concatenate(
            [jnp.full((sh,) + x.shape[1:], -1, x.dtype), x[:-sh]], axis=0
        )
        x = jnp.maximum(x, shifted)
        sh <<= 1
    return x


def _scan_min_up(x):
    # Inclusive suffix min along axis 0 (log-shift; fill INT32_MAX).
    n = x.shape[0]
    big = jnp.iinfo(jnp.int32).max
    sh = 1
    while sh < n:
        shifted = jnp.concatenate(
            [x[sh:], jnp.full((sh,) + x.shape[1:], big, x.dtype)], axis=0
        )
        x = jnp.minimum(x, shifted)
        sh <<= 1
    return x


def _scan_sum_down(x):
    # Inclusive prefix sum along axis 0 (log-shift).
    n = x.shape[0]
    sh = 1
    while sh < n:
        x = x + _shift_down(x, sh)
        sh <<= 1
    return x


# ---------------------------------------------------------------------------
# K1: match search (one 128-block group per grid step).
# ---------------------------------------------------------------------------


def _match_kernel(
    padded_ref,  # (1, pad + bs + 64, 128) i32; zeros in the pads
    valid_ref,  # (1, bs + 64, 128) i32: 1 where row < block length
    len_out,  # (1, bs, 128) i32: bucketed best length (0 or 4..64)
    lag_out,  # (1, bs, 128) i32: best lag
    *,
    bs: int,
    window: int,
    coarse_window: int = 0,
):
    # pad = total left zero-pad = reach of the deepest searched lag.
    pad = max(window, coarse_window)
    ext = bs + 64  # runs may extend a little past bs for end-of-block buckets
    data = padded_ref[0, pad : pad + ext]
    valid = valid_ref[0] != 0
    rows = jax.lax.broadcasted_iota(jnp.int32, (ext, LANES), 0)

    def chunk(base, span, stride, best):
        # 32 lags d = base + stride .. base + 32*stride. One 32-aligned
        # dynamic slice reaches the deepest lag; 32 static sub-shifts pick
        # the individual lags (stride 1 = fine sweep, stride 8 = sampled
        # coarse sweep per lane_model_encode.match_search).
        start = pl.multiple_of(pad - base - span, 32)
        src = padded_ref[0, pl.ds(start, ext + span), :]
        cur_ml = jnp.zeros((bs, LANES), jnp.int32)
        cur_idx = jnp.zeros((bs, LANES), jnp.int32)
        for j in range(32):
            back = span - (j + 1) * stride  # static offset within the slice
            shifted = src[back : back + ext]
            d = base + (j + 1) * stride
            # Run-doubling in int32: Mosaic cannot shift (concat) i1 masks.
            r = ((data == shifted) & valid & (rows >= d)).astype(jnp.int32)
            ml = jnp.zeros((ext, LANES), jnp.int32)
            for L in (2, 4, 8, 16, 32, 64):
                r = r & _shift_up(r, L // 2)
                if L >= 4:
                    ml = jnp.where(r != 0, L, ml)
            ml = ml[:bs]
            take = ml > cur_ml
            cur_ml = jnp.where(take, ml, cur_ml)
            cur_idx = jnp.where(take, j, cur_idx)
        lag = base + (cur_idx + 1) * stride
        cand = jnp.where(
            cur_ml >= 4,
            (cur_ml << 16) | (0xFFFF - lag),
            0,
        )
        return jnp.maximum(best, cand)

    best = jax.lax.fori_loop(
        0,
        window // 32,
        lambda ci, best: chunk(ci * 32, 32, 1, best),
        jnp.zeros((bs, LANES), jnp.int32),
    )
    if coarse_window > window:
        best = jax.lax.fori_loop(
            0,
            (coarse_window - window) // 256,
            lambda ci, best: chunk(window + ci * 256, 256, 8, best),
            best,
        )
    len_out[0] = best >> 16
    lag_out[0] = jnp.where(best > 0, 0xFFFF - (best & 0xFFFF), 0)


# ---------------------------------------------------------------------------
# K1b: phased-granule long-range search (implements
# lane_model_encode.granule_search). Arrays are 1/8 resolution: one row per
# 8-byte granule. Covers ALL lags in (window, coarse] at ~1/8 the cost of an
# exhaustive byte sweep; matches start at granule-aligned byte positions.
# ---------------------------------------------------------------------------


def _granule_kernel(
    lo0_ref,  # (1, ng, 128) i32: phase-0 granule words, bytes [8i, 8i+4)
    hi0_ref,  # (1, ng, 128) i32: bytes [8i+4, 8i+8)
    ok0_ref,  # (1, ng, 128) i32: 1 where the dest granule is within len
    lop_ref,  # (1, 8 * (Dpad + ng), 128) i32: per-phase lo planes, Dpad zeros
    hip_ref,  # (1, 8 * (Dpad + ng), 128) i32: per-phase hi planes
    out_ref,  # (1, ng, 128) i32: packed granule scores (len<<16 | 0xFFFF-d)
    *,
    ng: int,
    Dpad: int,
    nchunks: int,
    window: int,
    coarse: int,
):
    lo0 = lo0_ref[0]
    hi0 = hi0_ref[0]
    ok0 = ok0_ref[0] != 0
    grow = jax.lax.broadcasted_iota(jnp.int32, (ng, LANES), 0) * 8
    P = Dpad + ng
    best = jnp.zeros((ng, LANES), jnp.int32)

    for r in range(8):  # static unroll over the 8 lag residues
        def chunk(ci, best, r=r):
            # Granule-lags D = base+1 .. base+32 for phase r, one 32-aligned
            # dynamic slice + 32 static sub-shifts (fine-chunk pattern).
            base = ci * 32
            start = pl.multiple_of(r * P + Dpad - base - 32, 32)
            slo = lop_ref[0, pl.ds(start, ng + 32), :]
            shi = hip_ref[0, pl.ds(start, ng + 32), :]
            cur = jnp.zeros((ng, LANES), jnp.int32)
            for j in range(32):
                back = 32 - 1 - j
                D = base + j + 1
                d = 8 * D - r  # byte lag
                eq = (
                    (lo0 == slo[back : back + ng])
                    & (hi0 == shi[back : back + ng])
                    & ok0
                    & (grow >= d)
                ).astype(jnp.int32)
                r2 = eq & _shift_up(eq, 1)
                r4 = r2 & _shift_up(r2, 2)
                r8 = r4 & _shift_up(r4, 4)
                gl = jnp.where(
                    r8 != 0,
                    64,
                    jnp.where(
                        r4 != 0, 32, jnp.where(r2 != 0, 16, jnp.where(eq != 0, 8, 0))
                    ),
                )
                # Only lags the fine sweep does not already cover.
                dok = ((d > window) & (d <= coarse)).astype(jnp.int32)
                cand = jnp.where(gl >= 8, (gl << 16) | (0xFFFF - d), 0) * dok
                cur = jnp.maximum(cur, cand)
            return jnp.maximum(best, cur)

        best = jax.lax.fori_loop(0, nchunks, chunk, best)
    out_ref[0] = best


def _granule_planes(data_g, lens_g, ng: int, Dpad: int):
    """XLA-side prep: packed 4-byte words + strided per-phase granule planes.

    data_g: (8, bs, 128) i32 byte values; lens_g: (8, 1, 128).
    Returns (lo0, hi0, ok0, lo_planes, hi_planes) per _granule_kernel's spec.
    """
    bs = data_g.shape[1]
    W4 = data_g
    for b in (1, 2, 3):
        shifted = jnp.concatenate(
            [data_g[:, b:], jnp.zeros((SUBLANES, b, LANES), jnp.int32)], axis=1
        )
        W4 = W4 | (shifted << (8 * b))
    lo0 = W4[:, 0::8][:, :ng]
    hi0 = W4[:, 4::8][:, :ng]
    gend = (jnp.arange(ng, dtype=jnp.int32) * 8 + 8)[None, :, None]
    ok0 = (gend <= lens_g).astype(jnp.int32)
    los, his = [], []
    zpad = jnp.zeros((SUBLANES, Dpad, LANES), jnp.int32)
    for r in range(8):
        lo_r = W4[:, r::8][:, :ng]
        hi_r = W4[:, r + 4 :: 8][:, :ng]
        if lo_r.shape[1] < ng:  # high phases run past bs; zero rows are
            lo_r = jnp.concatenate(  # never read by a valid comparison
                [lo_r, jnp.zeros((SUBLANES, ng - lo_r.shape[1], LANES), jnp.int32)],
                axis=1,
            )
        if hi_r.shape[1] < ng:
            hi_r = jnp.concatenate(
                [hi_r, jnp.zeros((SUBLANES, ng - hi_r.shape[1], LANES), jnp.int32)],
                axis=1,
            )
        los += [zpad, lo_r]
        his += [zpad, hi_r]
    return lo0, hi0, ok0, jnp.concatenate(los, axis=1), jnp.concatenate(his, axis=1)


# ---------------------------------------------------------------------------
# K2: greedy parse + layout + 4-channel routing.
# ---------------------------------------------------------------------------


def _route_channel(comp_s, tok, dst, val, nrows, W_s, rank_s, STG):
    """One monotone channel: tokens (mask/dst/val over [bs, 128]) routed to
    their compressed-stream rows; lands into the ``comp_s`` scratch.

    Same scratch-based fori-round structure as the decoder's route kernel:
    unrolled round chains leak ~1 array of register-allocator spill per
    round (hardware-verified), so rounds >= 8 read staged scratch at
    dynamic 8-aligned offsets.
    """
    bs = tok.shape[0]
    crows = jax.lax.broadcasted_iota(jnp.int32, (bs, LANES), 0)

    # Tokens + occupancy prefix-sum over the [0, bs) source rows. Every
    # round lives in a fori with staged (possibly unaligned) dynamic-shift
    # reads — unrolled rounds leak register-allocator spills.
    W_s[0:bs] = jnp.where(tok, _OCC | (dst << 8) | (val & 0xFF), 0)
    if nrows > bs:
        W_s[bs:nrows] = jnp.zeros((nrows - bs, LANES), jnp.int32)
    rank_s[...] = (W_s[0:bs] & _OCC) // _OCC
    STG[0:bs] = jnp.zeros((bs, LANES), jnp.int32)

    def csum_body(j, _):
        sh = jnp.int32(1) << j
        STG[bs : 2 * bs] = rank_s[...]
        rank_s[...] = rank_s[...] + STG[pl.ds(bs - sh, bs), :]
        return 0

    jax.lax.fori_loop(0, (bs - 1).bit_length(), csum_body, 0)
    rank_s[...] = jnp.where((W_s[0:bs] & _OCC) != 0, rank_s[...] - 1, 0)

    # Compact up, LSB-first.
    def compact_body(k, _):
        sh = jnp.int32(1) << k
        W = W_s[0:bs]
        rank = rank_s[...]
        occ = (W & _OCC) != 0
        move = occ & ((((crows - rank) >> k) & 1) == 1)
        STG[0:bs] = jnp.where(move, W, 0)
        moved_W = STG[pl.ds(sh, bs), :]
        arriving = (moved_W & _OCC) != 0
        staying = occ & ~move
        new_W = jnp.where(arriving, moved_W, jnp.where(staying, W, 0))
        STG[0:bs] = jnp.where(move, rank, 0)
        moved_rank = STG[pl.ds(sh, bs), :]
        rank_s[...] = jnp.where(arriving, moved_rank, jnp.where(staying, rank, 0))
        W_s[0:bs] = new_W
        return 0

    STG[bs : 2 * bs] = jnp.zeros((bs, LANES), jnp.int32)  # up-shift pad
    jax.lax.fori_loop(0, (bs - 1).bit_length(), compact_body, 0)

    # Expand down, MSB-first over [0, nrows).
    rows = jax.lax.broadcasted_iota(jnp.int32, (nrows, LANES), 0)
    max_bit = (nrows - 1).bit_length() - 1

    def expand_body(j, _):
        sh = jnp.int32(1) << (max_bit - j)
        W = W_s[...]
        occ = (W & _OCC) != 0
        wdst = (W >> 8) & 0x3FFFFF
        move = occ & (wdst - rows >= sh)
        STG[nrows : 2 * nrows] = jnp.where(move, W, 0)
        moved_W = STG[pl.ds(nrows - sh, nrows), :]
        arriving = (moved_W & _OCC) != 0
        staying = occ & ~move
        W_s[...] = jnp.where(arriving, moved_W, jnp.where(staying, W, 0))
        return 0

    STG[0:nrows] = jnp.zeros((nrows, LANES), jnp.int32)  # down-shift pad
    jax.lax.fori_loop(0, max_bit + 1, expand_body, 0)

    W = W_s[...]
    landed = (W & _OCC) != 0
    comp_s[0:nrows] = jnp.where(landed, W & 0xFF, comp_s[0:nrows])


def _emit_kernel(
    data_ref,  # (1, bs, 128) i8 byte values (converted on read)
    match_ref,  # (1, bs, 128) i32: bucketed len (7 bits) | lag << 7
    lens_ref,  # (1, 8, 128) i32, row 0 = block lengths
    comp_ref,  # (1, cap, 128) i32 out
    size_ref,  # (1, 8, 128) i32 out
    accept_ref,  # scratch (bs, 128) i32
    copy_ref,  # scratch (bs, 128) i32
    W_s,  # scratch (nrows, 128) i32
    rank_s,  # scratch (bs, 128) i32
    STG,  # scratch (2 * nrows, 128) i32
    comp_s,  # scratch (nrows, 128) i32
    meta_s,  # scratch (bs, 128) i32 (parked layout metadata)
    *,
    bs: int,
    cap: int,
):
    best_len = match_ref[0] & 0x7F
    best_off = match_ref[0] >> 7
    lens = lens_ref[0, 0:1, :]  # (1, 128)
    rows = jax.lax.broadcasted_iota(jnp.int32, (bs, LANES), 0)
    in_range = rows < lens

    # Greedy accept scan: 8 rows per aligned step, static unroll inside;
    # masks accumulate into VMEM scratch via 8-aligned stores.
    def scan_outer(i, next_accept):
        base = i * SUBLANES
        bl8 = match_ref[0, pl.ds(base * 1, SUBLANES), :] & 0x7F
        acc_rows = []
        cp_rows = []
        for j in range(SUBLANES):
            p = base + j
            bl = bl8[j : j + 1]
            acc = (next_accept == p) & (lens > p)
            copy = acc & (bl >= 4)
            adv = jnp.where(copy, bl, 1)
            next_accept = jnp.where(acc, p + adv, next_accept)
            acc_rows.append(acc.astype(jnp.int32))  # concat of i1 rows is
            cp_rows.append(copy.astype(jnp.int32))  # not lowerable; cast first
        accept_ref[pl.ds(base, SUBLANES), :] = jnp.concatenate(acc_rows)
        copy_ref[pl.ds(base, SUBLANES), :] = jnp.concatenate(cp_rows)
        return next_accept

    jax.lax.fori_loop(
        0, bs // SUBLANES, scan_outer, jnp.zeros((1, LANES), jnp.int32)
    )
    accept = accept_ref[...] != 0
    is_copy = copy_ref[...] != 0

    # Scratch-staged prefix/suffix scans (value-chained log-shift scans leak
    # one spilled array per round). W_s/STG are free until routing starts.
    def scan_down(x, op, fill):
        W_s[0:bs] = x
        STG[0:bs] = jnp.full((bs, LANES), fill, jnp.int32)

        def body(j, _):
            sh = jnp.int32(1) << j
            STG[bs : 2 * bs] = W_s[0:bs]
            W_s[0:bs] = op(W_s[0:bs], STG[pl.ds(bs - sh, bs), :])
            return 0

        jax.lax.fori_loop(0, (bs - 1).bit_length(), body, 0)
        return W_s[0:bs]

    def scan_up(x, op, fill):
        W_s[0:bs] = x
        STG[bs : 2 * bs] = jnp.full((bs, LANES), fill, jnp.int32)

        def body(j, _):
            sh = jnp.int32(1) << j
            STG[0:bs] = W_s[0:bs]
            W_s[0:bs] = op(W_s[0:bs], STG[pl.ds(sh, bs), :])
            return 0

        jax.lax.fori_loop(0, (bs - 1).bit_length(), body, 0)
        return W_s[0:bs]

    # Literal runs + element layout (mirrors lane_model_encode).
    is_lit = accept & ~is_copy
    prev_lit = _shift_down(is_lit.astype(jnp.int32), 1) != 0
    head_lit = is_lit & ~prev_lit
    head_row = scan_down(jnp.where(head_lit, rows, -1), jnp.maximum, -1)

    INF = jnp.int32(1 << 28)
    nonlit_next = jnp.where((accept & is_copy) | ~in_range, rows, INF)
    run_end = jnp.minimum(
        scan_up(nonlit_next, jnp.minimum, jnp.iinfo(jnp.int32).max), lens
    )
    run_len = jnp.where(head_lit, run_end - rows, 0)

    L1 = jnp.maximum(run_len - 1, 0)
    lit_ext = jnp.where(L1 < 60, 0, jnp.where(L1 < 256, 1, 2))
    hdr_lit = jnp.where(head_lit, 1 + lit_ext, 0)
    copy1 = is_copy & (best_len < 12) & (best_off < C.COPY1_MAX_OFFSET)
    hdr_copy = jnp.where(is_copy, jnp.where(copy1, 2, 3), 0)
    emit = jnp.where(head_lit, hdr_lit + run_len, 0) + hdr_copy
    incl = scan_down(emit, jnp.add, 0)
    out_start = incl - emit
    sizes = incl[bs - 1 : bs, :]  # (1, 128)

    is_head = accept & (head_lit | is_copy)
    hdr_here = hdr_lit + hdr_copy
    # Covering head's first-data position, for literal data byte dsts.
    # out_start + hdr_here is strictly increasing across heads (out_start is
    # the prefix sum of emit and emit >= hdr_here at every head), so a plain
    # max-scan of the value yields the most recent head's value — no row
    # packing needed (a packed (rows << k) | value scheme overflows int32
    # once rows * 2^k reaches 2^31; this form scales to any block size).
    cov_data0 = scan_down(
        jnp.where(is_head, out_start + hdr_here, -1), jnp.maximum, -1
    )

    off = best_off
    h0 = jnp.where(
        is_copy,
        jnp.where(
            copy1,
            1 | ((best_len - 4) << 2) | ((off >> 8) << 5),
            2 | ((best_len - 1) << 2),
        ),
        jnp.where(lit_ext == 0, L1 << 2, jnp.where(lit_ext == 1, 60 << 2, 61 << 2)),
    )
    h1 = jnp.where(is_copy, off & 0xFF, jnp.where(lit_ext >= 1, L1 & 0xFF, 0))
    h2 = jnp.where(
        is_copy & ~copy1,
        (off >> 8) & 0xFF,
        jnp.where(lit_ext == 2, (L1 >> 8) & 0xFF, 0),
    )

    # Park the big layout products in the (now dead) mask scratches so ~20
    # full arrays are not live across the four routing passes (that liveness
    # alone was 85 MB at bs=8192). meta: litdst(16) | lit(1<<16) |
    # head(1<<17) | hdr(2 bits << 18). 16 litdst bits cover cap(32768)=38261.
    copy_ref[...] = h0 | (h1 << 8) | (h2 << 16)
    litdst = jnp.clip(
        cov_data0 + (rows - jnp.maximum(head_row, 0)), 0, (1 << 16) - 1
    )
    meta_s[...] = (
        litdst
        | (is_lit.astype(jnp.int32) << 16)
        | (is_head.astype(jnp.int32) << 17)
        | (hdr_here << 18)
    )
    accept_ref[...] = out_start

    nrows = _route_rows(bs, cap)
    comp_s[...] = jnp.zeros((nrows, LANES), jnp.int32)
    for ch in range(4):
        meta = meta_s[...]
        if ch < 3:
            tok = (((meta >> 17) & 1) != 0) & (((meta >> 18) & 3) > ch)
            dst = accept_ref[...] + ch
            val = (copy_ref[...] >> (8 * ch)) & 0xFF
        else:
            tok = ((meta >> 16) & 1) != 0
            dst = meta & 0xFFFF
            val = data_ref[0].astype(jnp.int32) & 0xFF
        _route_channel(comp_s, tok, dst, val, nrows, W_s, rank_s, STG)

    comp_ref[0] = comp_s[0:cap]
    size_ref[0] = jnp.broadcast_to(sizes, (SUBLANES, LANES))


# ---------------------------------------------------------------------------
# Host-callable wrapper.
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=(
        "block_size", "window", "coarse_window", "granular", "matcher",
        "interpret",
    ),
)
def encode_blocks_pallas(
    blocks: jax.Array,  # uint8[num_blocks, block_size], multiple of 1024
    lens: jax.Array,  # int32[num_blocks]
    *,
    block_size: int = 4096,
    window: int = 512,
    coarse_window: int = 0,
    granular: bool = False,
    matcher: str = "sweep",
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Compress a batch of blocks with the lane-parallel kernels.

    ``matcher="sorted"`` (the production path) finds candidates with the
    bitonic rung-sort kernels (pallas_match.py): exact nearest previous
    occurrences at any lag — the whole block is the window, ``window`` /
    ``coarse_window`` are ignored — at O(bs log^2 bs) cost. Ratios beat
    the reference compressor on its corpus (xml @32K: 0.787 vs 0.741).

    ``matcher="sweep"`` is the round-1 O(bs * window) path: lags in
    [1, window] searched exhaustively by shifted compares; long lags in
    (window, coarse_window] either sampled every-8th (``granular=False``)
    or fully covered at 1/8 resolution by the phased-granule kernel
    (``granular=True``).

    Returns (comp uint8[num_blocks, cap], sizes int32[num_blocks]).
    """
    if block_size > MAX_ENC_BLOCK:
        raise ValueError(f"pallas encoder supports block_size <= {MAX_ENC_BLOCK}")
    if matcher == "sorted" and block_size & (block_size - 1):
        raise ValueError("sorted matcher requires a power-of-two block size")
    window = min(window, block_size)
    window = (window + 31) // 32 * 32
    coarse_window = min(coarse_window, block_size)
    if granular and coarse_window > window and block_size % 256 != 0:
        raise ValueError("granular coarse matching needs block_size % 256 == 0")
    if not granular and coarse_window > window:
        # Sampled coarse chunks cover 256 lags each; round to whole chunks.
        coarse_window = window + (coarse_window - window) // 256 * 256
    if coarse_window <= window:
        coarse_window = 0
    # K1's left pad covers only the lags K1 itself sweeps.
    k1_coarse = 0 if granular else coarse_window
    pad = max(window, k1_coarse)
    nb, _ = blocks.shape
    assert nb % BATCH == 0, "pad the batch to a multiple of 1024 blocks"
    nbatch = nb // BATCH
    bs = block_size
    assert bs % SUBLANES == 0
    cap = encode_capacity(bs)

    def one_batch(blocks_b, lens_b):
        # [1024, bs] u8 -> groups (8, rows, 128)
        data_t = blocks_b.T.reshape(bs, SUBLANES, LANES)
        lens_t = lens_b.reshape(SUBLANES, LANES)
        data_g = data_t.transpose(1, 0, 2).astype(jnp.int32)  # (8, bs, 128)
        lens_g = lens_t[:, None, :]  # (8, 1, 128)

        def _emit(data_g, lens_t, mlen, mlag):
            lens_bc = jnp.broadcast_to(
                lens_t[:, None, :], (SUBLANES, SUBLANES, LANES)
            )
            match_g = mlen | (mlag << 7)
            comp_g, size_g = pl.pallas_call(
                functools.partial(_emit_kernel, bs=bs, cap=cap),
                grid=(SUBLANES,),
                in_specs=[
                    pl.BlockSpec((1, bs, LANES), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, bs, LANES), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec(
                        (1, SUBLANES, LANES), lambda g: (g, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=[
                    pl.BlockSpec((1, cap, LANES), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec(
                        (1, SUBLANES, LANES), lambda g: (g, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_shape=[
                    jax.ShapeDtypeStruct((SUBLANES, cap, LANES), jnp.int32),
                    jax.ShapeDtypeStruct((SUBLANES, SUBLANES, LANES), jnp.int32),
                ],
                scratch_shapes=[
                    pltpu.VMEM((bs, LANES), jnp.int32),
                    pltpu.VMEM((bs, LANES), jnp.int32),
                    pltpu.VMEM((_route_rows(bs, cap), LANES), jnp.int32),
                    pltpu.VMEM((bs, LANES), jnp.int32),
                    pltpu.VMEM((2 * _route_rows(bs, cap), LANES), jnp.int32),
                    pltpu.VMEM((_route_rows(bs, cap), LANES), jnp.int32),
                    pltpu.VMEM((bs, LANES), jnp.int32),
                ],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=126 * 1024 * 1024,
                ),
                interpret=interpret,
            )(data_g.astype(jnp.int8), match_g, lens_bc)
            comp_b = comp_g.transpose(0, 2, 1).reshape(BATCH, cap).astype(jnp.uint8)
            size_b = size_g[:, 0, :].reshape(BATCH)
            return comp_b, size_b

        if matcher == "sorted":
            from pim_compression_tpu.ops import pallas_match as pm

            lens_bc8 = jnp.broadcast_to(
                lens_t[:, None, :], (SUBLANES, SUBLANES, LANES)
            )
            mlen, mlag = pm.sorted_match_groups(
                data_g.astype(jnp.int8), lens_bc8, bs=bs, interpret=interpret
            )
            return _emit(data_g, lens_t, mlen, mlag)

        padded_g = jnp.concatenate(
            [
                jnp.zeros((SUBLANES, pad, LANES), jnp.int32),
                data_g.astype(jnp.int32),
                jnp.zeros((SUBLANES, 64, LANES), jnp.int32),
            ],
            axis=1,
        )
        rows = jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, bs + 64, LANES), 1)
        valid_g = (rows < lens_g).astype(jnp.int32)

        mlen, mlag = pl.pallas_call(
            functools.partial(
                _match_kernel, bs=bs, window=window, coarse_window=k1_coarse
            ),
            grid=(SUBLANES,),
            in_specs=[
                pl.BlockSpec(
                    (1, pad + bs + 64, LANES), lambda g: (g, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, bs + 64, LANES), lambda g: (g, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=[
                pl.BlockSpec(
                    (1, bs, LANES), lambda g: (g, 0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (1, bs, LANES), lambda g: (g, 0, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((SUBLANES, bs, LANES), jnp.int32),
                jax.ShapeDtypeStruct((SUBLANES, bs, LANES), jnp.int32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=126 * 1024 * 1024,
            ),
            interpret=interpret,
        )(padded_g, valid_g)

        if granular and coarse_window > window:
            ng = bs // 8
            Dmax = (coarse_window + 7) // 8
            nchunks = -(-Dmax // 32)
            Dpad = nchunks * 32
            lo0, hi0, ok0, lop, hip = _granule_planes(data_g, lens_g, ng, Dpad)
            P = Dpad + ng
            gsc = pl.pallas_call(
                functools.partial(
                    _granule_kernel, ng=ng, Dpad=Dpad, nchunks=nchunks,
                    window=window, coarse=coarse_window,
                ),
                grid=(SUBLANES,),
                in_specs=[
                    pl.BlockSpec((1, ng, LANES), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, ng, LANES), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, ng, LANES), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 8 * P, LANES), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 8 * P, LANES), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(
                    (1, ng, LANES), lambda g: (g, 0, 0), memory_space=pltpu.VMEM
                ),
                out_shape=jax.ShapeDtypeStruct((SUBLANES, ng, LANES), jnp.int32),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=126 * 1024 * 1024,
                ),
                interpret=interpret,
            )(lo0, hi0, ok0, lop, hip)
            # Upsample granule scores to byte rows (non-aligned rows = 0) and
            # fold into K1's packed candidates.
            up = jnp.concatenate(
                [gsc[:, :, None, :], jnp.zeros((SUBLANES, ng, 7, LANES), jnp.int32)],
                axis=2,
            ).reshape(SUBLANES, bs, LANES)
            fine = jnp.where(mlen > 0, (mlen << 16) | (0xFFFF - mlag), 0)
            merged = jnp.maximum(fine, up)
            mlen = merged >> 16
            mlag = jnp.where(mlen > 0, 0xFFFF - (merged & 0xFFFF), 0)

        return _emit(data_g, lens_t, mlen, mlag)

    blocks_r = blocks.reshape(nbatch, BATCH, bs)
    lens_r = lens.reshape(nbatch, BATCH)
    comp, sizes = jax.lax.map(lambda t: one_batch(*t), (blocks_r, lens_r))
    return comp.reshape(nb, cap), sizes.reshape(nb)


def encode_blocks_pallas_sharded(
    blocks,
    lens,
    mesh,
    *,
    block_size: int,
    window: int = 512,
    coarse_window: int = 0,
    granular: bool = False,
    matcher: str = "sweep",
    interpret: bool = False,
):
    """Multi-device wrapper (pallas_call does not auto-partition under jit)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from pim_compression_tpu.parallel.mesh import BLOCK_AXIS

    fn = functools.partial(
        encode_blocks_pallas,
        block_size=block_size,
        window=window,
        coarse_window=coarse_window,
        granular=granular,
        matcher=matcher,
        interpret=interpret,
    )
    sharded = shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(BLOCK_AXIS), P(BLOCK_AXIS)),
        out_specs=(P(BLOCK_AXIS), P(BLOCK_AXIS)),
        check_vma=False,
    )
    return jax.jit(sharded)(blocks, lens)
