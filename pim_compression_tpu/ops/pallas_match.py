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
- The compare-exchange network runs on the sublane (major) axis with a
  STATIC schedule. Stages with partner distance j < CH (the chunk
  height) never cross a chunk boundary, so each merge's within-chunk
  stages fuse into one in-place chunk pass of pair-compares on the
  (CH/2j, 2j, 128) reshape — one compare and two selects per stage on
  half-height arrays, no partner reads at all. Only the log2(k/CH)
  cross-chunk stages of merges k > CH read a partner chunk (one
  contiguous read at scalar offset base ^ j) and ping-pong buffers.
- No validity masking anywhere: keys of positions whose L-byte window
  crosses the block end hash pad zeros, which can only produce junk
  candidates that the exact extension pass rejects (its length cap
  ``min(lenacc, len - p, 64)`` floors them below the 4-byte emit minimum),
  while keeping the position field a permutation for the unsort.
- Kernels are gridless (one 128-lane group per call) under ``jax.lax.map``:
  no double-buffered block pipelining, so peak VMEM stays within budget at
  bs = 32768 (sort scratch alone is ~35 MB there).
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
# The rung sort/lag kernels handle the format's max 64 K block (16+16
# packed words above 32 K sorted rows; prev-step/select candidates window
# in from HBM there — see sorted_match_groups' hbm_cands).
MAX_SORT_BLOCK = 65536
DEFAULT_RUNGS = (4, 8, 16, 32, 64)


def _shift_up(x, sh):
    return jnp.concatenate(
        [x[sh:], jnp.zeros((sh,) + x.shape[1:], x.dtype)], axis=0
    )


def _span_sweep(src_s, c, nq, rs, dist, maxd, span, zz):
    """Adaptive chunk-distance sweep, ``span`` consecutive source chunks
    per iteration: gather each of the span planes at ``rs`` (per-lane
    column index), then binary-select per lane by the low bits of
    ``loc = dist - d0`` (gather-first: the plane choice is per
    DESTINATION lane, so selecting before the gather would index the
    tree at the gathered lane). d0 = span*i - 1 covers forward reads
    (dist = -1). Iteration count is driven by the scalar ``maxd`` (max
    chunk distance over live lanes): wider spans cut iterations ~span/4x
    at ~span/4 gathers per iteration — the win is the amortized loop/
    select overhead and fewer dependent iterations (census:
    docs/sweep_stats.json; span 8 halves flagship iterations)."""
    assert span & (span - 1) == 0 and span >= 2

    def sweep(i, b):
        d0 = span * i - 1
        g = [
            jnp.take_along_axis(
                src_s[
                    pl.ds(
                        jnp.clip(c - (d0 + j), 0, nq - 1) * LANES,
                        LANES,
                    )
                ],
                rs,
                axis=1,
            )
            for j in range(span)
        ]
        loc = dist - d0
        cur = g
        lvl = 1
        while len(cur) > 1:
            bit = (loc & lvl) != 0
            cur = [
                jnp.where(bit, cur[i2 + 1], cur[i2])
                for i2 in range(0, len(cur), 2)
            ]
            lvl <<= 1
        return jnp.where((loc >= 0) & (loc < span), cur[0], b)

    nit = (maxd + span + 1) >> (span.bit_length() - 1)
    return jax.lax.fori_loop(0, nit, sweep, zz)


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
    data_ref,  # (bs, 128) i8 block bytes
    cand_ref,  # (bs, 128) i32 out: candidate lags (0 = none)
    pk_s,  # scratch (m, 128) i32 ping buffer; holds the sorted data
    stg_s,  # scratch pong buffer (far-stage ping-pong; stride-2 staging)
    *,
    bs: int,
    rung: int,
    stride: int = 1,
    window: int = 0,
):
    """One rung: hash-key sort -> nearest-previous lags -> unsort.

    ``window`` > 0 (sorted rows; reach = window * stride bytes) runs a
    CHUNK-LOCAL sort: the bitonic network stops at merge size ``window``
    (the final merge relabeled ``m`` so every window-group sorts
    ascending — bit ``m`` of any row is 0, so the existing complement
    transition machinery realizes the all-ascending direction for free),
    and the lag scan resets its carry at group boundaries. Candidates
    then come only from the position's aligned window-group: fewer sort
    stages AND a bounded extension-sweep distance (the dominant encode
    cost on device, docs/device_kernel_attrib.json). Spec:
    ``lane_model_encode.packed_prev_lags(window=...)``.

    Fully chunked (full-array phase bodies held 4-5 live (bs, 128) arrays
    — ~84 MB of register spill at bs=32768). The bitonic network runs as
    a STATIC schedule in XOR-COMPLEMENT form (descending regions hold
    bit-inverted words, so every compare-exchange is a direction-free
    reduce_min/reduce_max pair and complement transitions cost one XOR
    per merge — see the network comment below), split by where the
    partner distance j sits relative to the chunk height CH:

    - j < CH (114 of 120 stages at m=32768, CH=4096): the compare block
      at distance j never crosses a chunk boundary (CH is a multiple of
      2j), so the partner already sits inside the loaded chunk. Each
      merge's within-chunk stages run FUSED in one in-place chunk pass:
      load the chunk once, apply every stage as a min/max pair on the
      (parts, 2, j, 128) reshape (~1 vreg-op/row/stage — no direction
      mask, no selects, no partner reads), store once. No read margin:
      each scratch buffer is exactly m rows.
    - j >= CH (the first log2(k/CH) stages of merges k > CH): the xor
      partner row set (base + iot) ^ j = (base ^ j) + iot is one
      contiguous chunk read at a scalar offset; these stages ping-pong
      between the two buffers.

    The hash chunk reads a 128-row lookahead (word pack 3 + ladder shifts
    <= 60 bytes of reach), zero past the block end to match the spec's
    zero-fill shifts.

    ``stride=2`` sorts only even positions (m = bs/2 rows, one fewer
    outer bitonic pass, half the chunk passes per stage): the packed
    words carry the compacted index ``p >> 1`` and lags are scaled back
    by 2 on output. Compaction/expansion use the extension kernel's
    layout trick — transpose 128-row chunks so positions sit on LANES,
    where single-vreg ``take_along_axis`` gathers are legal. Spec:
    ``lane_model_encode.packed_prev_lags(stride=2)``.
    """
    m = bs // stride  # sorted rows
    wl = window if 0 < window < m else m  # chunk-local sort group size
    if wl < m:
        assert m % wl == 0, "window must divide the sorted rows"
        # wl >= 4: the k=2 complement init assumes merge 2 runs with its
        # normal alternating directions (the final merge is the relabeled
        # all-ascending one).
        assert wl >= 4
    # 4096-row chunks: at m=32768 only 3 merges have cross-chunk (far)
    # stages (6 far stages vs 15 at CH=1024) — far stages cost ~6 ops/row
    # (two chunk reads, compare, select, store) vs the fused form's ~1.
    # CH=8192 measured ~2% fewer vreg-ops but exceeded the 126 MB device
    # VMEM budget by 1.9 MB at bs=32768 (register liveness of the fused
    # chunk pass) — hardware-bounded, not a guess. At m=65536 the three
    # 32 MB buffers leave < 30 MB of headroom and CH=4096's fused-pass
    # liveness spills ~38 MB (device-measured round 5, inherited from the
    # r4 sort rework): halve the chunk there.
    CH = min(m, 4096 if m <= 32768 else 2048)
    NC = m // CH
    LOOK = 128
    # Packed word geometry: 17-bit folded key + 15-bit index up to 32 K
    # sorted rows; 16 + 16 above (the 64 K groundwork — more fold
    # collisions, which the exact extension rejects; spec: fold_key).
    pos_bits = 15 if m <= (1 << 15) else 16
    key_bits = 32 - pos_bits
    key_mask = (1 << key_bits) - 1

    def ch_iota(n):
        return jax.lax.broadcasted_iota(jnp.int32, (n, LANES), 0)

    # Phase H: packed (key17 << 15) | idx sort words (idx = pos / stride;
    # odd-position words are dropped by compaction when stride = 2), top
    # bit flipped so the signed bitonic compare realises unsigned order,
    # then complement-initialised for the XOR-form network below (rows in
    # merge k=2's descending regions, bit 1 of the row index, start
    # bit-inverted).
    CHS = min(bs, 1024)
    NCS = bs // CHS
    # Hoisted phase-H init plane: _SIGN everywhere, additionally inverted
    # where (row & 2) != 0. Bit 1 of the global row equals bit 1 of the
    # chunk-local iota for any chunk height >= 2.
    xsign_h = jnp.where(
        (ch_iota(CHS) & 2) != 0, jnp.int32(~_SIGN), jnp.int32(_SIGN)
    )

    def hchunk(c, _):
        base = c * CHS
        d0 = data_ref[pl.ds(base, CHS)].astype(jnp.int32) & 0xFF
        # i8 vector loads need a provably aligned start: clamp in units of
        # 128 rows and re-multiply so Mosaic can see the alignment.
        start1 = pl.multiple_of(
            jnp.maximum(
                jnp.minimum((base + CHS) // LANES, (bs - LOOK) // LANES), 0
            )
            * LANES,
            LANES,
        )
        d1 = data_ref[pl.ds(start1, LOOK)].astype(jnp.int32) & 0xFF
        d1 = jnp.where(base + CHS < bs, d1, 0)
        dd = jnp.concatenate([d0, d1], axis=0)  # (CHS + 128, 128)
        w = dd
        for b in (1, 2, 3):
            w = w | (_shift_up(dd, b) << (8 * b))
        h = _hash_for_rung(w, rung)
        key = (h[0:CHS] ^ ((h[0:CHS] >> (32 - key_bits)) & key_mask)) & key_mask
        rows = base + ch_iota(CHS)
        packed = ((key << pos_bits) | (rows // stride)).astype(jnp.int32)
        if stride == 1:
            pk_s[pl.ds(base, CHS)] = packed ^ xsign_h
        else:
            # Compaction MOVES words between rows, so the k=2 complement
            # init (a row property) is applied on the compacted rows in
            # cchunk below; stage plain sign-flipped words here.
            stg_s[pl.ds(base, CHS)] = packed ^ _SIGN
        return 0

    jax.lax.fori_loop(0, NCS, hchunk, 0)

    if stride > 1:
        # Compact stride-aligned rows: each 128-row output chunk j merges
        # every stride-th row of input chunks stride*j .. stride*j+s-1.
        # Transposed, positions sit on LANES: out_T[:, l] =
        # T_{(s*l)>>7}[:, (s*l) & 127].
        lane = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
        s_idx = (stride * lane) & (LANES - 1)
        # k=2 complement init over the compacted (sorted-space) row index.
        xinit = jnp.where(
            (jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0) & 2)
            != 0,
            jnp.int32(-1),
            jnp.int32(0),
        )

        def cchunk(j, _):
            out = jnp.zeros((LANES, LANES), jnp.int32)
            for t in range(stride):
                tt = jnp.transpose(
                    stg_s[pl.ds((j * stride + t) * LANES, LANES)]
                )
                gt = jnp.take_along_axis(tt, s_idx, axis=1)
                out = jnp.where(
                    (stride * lane) >> 7 == t, gt, out
                )
            pk_s[pl.ds(j * LANES, LANES)] = jnp.transpose(out) ^ xinit
            return 0

        jax.lax.fori_loop(0, m // LANES, cchunk, 0)

    # Compare-exchange network, statically scheduled (j and k are Python
    # ints, so the pair-compare reshape shapes below are static), in
    # XOR-COMPLEMENT form: while merge k runs, every row in one of its
    # descending regions ((row & k) != 0) holds the BIT-INVERTED word, so
    # bitwise-NOT reverses unsigned order and every compare-exchange is a
    # direction-free min/max pair — one reduce_min + one reduce_max over
    # the pair axis per stage, no direction mask, no select. All exchanges
    # of merge k stay inside one k-aligned region, so the complement state
    # (a row property, constant per region) is preserved by the exchanges;
    # transitions between merges XOR the array with the state-difference
    # mask ONCE per merge. For rows of a CH-aligned chunk, row-index bits
    # t < CH come from the chunk-local iota (hoisted planes shared by all
    # chunks) and bits t >= CH are chunk-constant scalars; bit t == m is 0
    # (rows < m), so the final merge runs plain-ascending and the sorted
    # result needs no un-complementing.
    #
    # - Within-chunk stages (j < CH) of one merge run FUSED in a single
    #   in-place chunk pass, in PARTS form: each stage's min/max halves
    #   stay separate arrays (no per-stage re-concatenation; bounded at
    #   PARTS_MAX arrays, the trace-size cap); one in-order concat per
    #   merge reconstructs row order.
    # - Far stages (j >= CH) keep the one-contiguous-partner-read form and
    #   ping-pong between the buffers (parity tracked in Python); the
    #   merge's complement transition folds into its first far stage (one
    #   scalar XOR per side — partner chunks share the merge-k state but
    #   not the previous-merge state, so each side flips by its own base).

    PARTS_MAX = 64
    iot = ch_iota(CH)

    def _pair_step(p, j):
        v = p.reshape(-1, 2, j, LANES)
        return jnp.min(v, axis=1), jnp.max(v, axis=1)

    def fused_pass(merges, A, enter):
        # merges: [(k, [j descending])], all j < CH; ``enter`` = the merge
        # size whose complement state the array carries on entry (the
        # previous merge, or this one when a far prefix already applied
        # the transition). Iota-bit flip planes are hoisted per merge.
        trans = []  # per merge: (iota_plane | None, [scalar bits])
        kp = enter
        for k, _ in merges:
            ip, sb = None, []
            if kp != k:
                lo = [t for t in (kp, k) if t < CH]
                hi = [t for t in (kp, k) if CH <= t < m]
                if lo:
                    x = (iot & lo[0]) != 0
                    if len(lo) > 1:
                        x = x != ((iot & lo[1]) != 0)
                    ip = jnp.where(x, jnp.int32(-1), jnp.int32(0))
                sb = hi
            trans.append((ip, sb))
            kp = k

        def up(c, _):
            base = c * CH
            w = A[pl.ds(base, CH)]
            for (k, js), (ip, sb) in zip(merges, trans):
                f = ip
                for t in sb:
                    s = jnp.where(
                        (base & t) != 0, jnp.int32(-1), jnp.int32(0)
                    )
                    f = s if f is None else f ^ s
                if f is not None:
                    w = w ^ f
                j0 = js[0]
                parts = [w.reshape(CH // (2 * j0), 2 * j0, LANES)]
                for j in js:
                    if len(parts) >= PARTS_MAX:
                        parts = [jnp.concatenate(parts, axis=1)]
                    new = []
                    for p in parts:
                        lo2, hi2 = _pair_step(p, j)
                        new.append(lo2)
                        new.append(hi2)
                    parts = new
                w = (
                    parts[0]
                    if len(parts) == 1
                    else jnp.concatenate(parts, axis=1)
                ).reshape(CH, LANES)
            A[pl.ds(base, CH)] = w
            return 0

        jax.lax.fori_loop(0, NC, up, 0)

    def _sflip(b, kp, k):
        # Scalar complement-transition word for a chunk at base ``b``:
        # bits kp and k are both >= CH here (chunk-constant); bit m is 0.
        x = (b & kp) != 0
        if k < m:
            x = x != ((b & k) != 0)
        return jnp.where(x, jnp.int32(-1), jnp.int32(0))

    def far_stage(j, k, A, B, trans_from=None):
        def up(c, _):
            base = c * CH
            w = A[pl.ds(base, CH)]
            pw = A[pl.ds(base ^ j, CH)]
            if trans_from is not None:
                w = w ^ _sflip(base, trans_from, k)
                pw = pw ^ _sflip(base ^ j, trans_from, k)
            take = (pw < w) != ((base & j) != 0)
            B[pl.ds(base, CH)] = jnp.where(take, pw, w)
            return 0

        jax.lax.fori_loop(0, NC, up, 0)

    def run_sort():
        # Result lands back in pk_s: only far stages flip the buffer
        # parity; an odd far count ends with one chunked copy back.
        #
        # Every merge k <= CH is fully chunk-local (its largest partner
        # distance is k/2 < CH and chunks are CH-aligned), and nothing in
        # those merges crosses a chunk boundary — so ALL of them run on a
        # single chunk load/store instead of one pass per merge
        # (log2(CH) - 1 fewer chunk loads+stores per sort run).
        cur = 0
        bufs = (pk_s, stg_s)

        def lab(k):
            # Chunk-local sort: the FINAL merge (size wl) is labeled m so
            # its regions all run ascending ((row & m) == 0 everywhere —
            # the transition machinery below then un-complements merge
            # wl/2's descending halves and applies no new complements).
            return m if (wl < m and k == wl) else k

        merges1 = []
        k = 2
        while k <= min(CH, wl):
            merges1.append(
                (lab(k), [1 << b for b in range(k.bit_length() - 2, -1, -1)])
            )
            k *= 2
        if merges1:
            fused_pass(merges1, bufs[cur], enter=2)
        while k <= wl:
            j = k // 2
            first = True
            while j >= CH:  # cross-chunk prefix of this merge
                far_stage(
                    j, lab(k), bufs[cur], bufs[1 - cur],
                    trans_from=k // 2 if first else None,
                )
                first = False
                cur = 1 - cur
                j //= 2
            if j >= 1:
                fused_pass(
                    [(lab(k), [1 << b for b in range(j.bit_length() - 1, -1, -1)])],
                    bufs[cur],
                    enter=lab(k),
                )
            k *= 2
        if cur:

            def back(c, _):
                base = c * CH
                pk_s[pl.ds(base, CH)] = stg_s[pl.ds(base, CH)]
                return 0

            jax.lax.fori_loop(0, NC, back, 0)

    run_sort()

    # Sorted space: predecessor with an equal key17 = nearest previous
    # occurrence (the position field orders equal-key runs by position).
    # Chunked with a carried previous row; repack as (pos << 16) | lag so
    # a second sort restores position order (the TPU-native scatter).
    # The hoisted plane folds the sign flip (keeps the unsort's signed
    # compare == unsigned even when a 16-bit spos fills bits 16-31) with
    # the k=2 complement init of the second XOR-form sort.
    xsign_l = jnp.where(
        (iot & 2) != 0, jnp.int32(~_SIGN), jnp.int32(_SIGN)
    )

    def lag_chunk(c, carry):
        pkey, ppos = carry
        base = c * CH
        u = pk_s[pl.ds(base, CH)] ^ _SIGN
        spos = u & ((1 << pos_bits) - 1)
        skey = (u >> pos_bits) & key_mask
        prev_key = jnp.concatenate([pkey, skey[: CH - 1]]) if CH > 1 else pkey
        prev_pos = jnp.concatenate([ppos, spos[: CH - 1]]) if CH > 1 else ppos
        same = skey == prev_key
        if wl < m:
            # Window-group boundary: the first row of each wl-aligned
            # group must not chain to the previous group's last run.
            same = same & (((base + ch_iota(CH)) & (wl - 1)) != 0)
        lag = jnp.where(same, spos - prev_pos, 0)
        pk_s[pl.ds(base, CH)] = ((spos << 16) | lag) ^ xsign_l
        return (skey[CH - 1 : CH], spos[CH - 1 : CH])

    jax.lax.fori_loop(
        0, NC, lag_chunk,
        (jnp.full((1, LANES), -1, jnp.int32), jnp.zeros((1, LANES), jnp.int32)),
    )
    run_sort()

    if stride == 1:

        def out_chunk(c, _):
            base = c * CH
            cand_ref[pl.ds(base, CH)] = pk_s[pl.ds(base, CH)] & 0xFFFF
            return 0

        jax.lax.fori_loop(0, NC, out_chunk, 0)
    else:
        # Expand: compacted chunk j (idx rows [128j, 128j+128)) covers
        # positions [128*s*j, 128*s*(j+1)). Transposed lane-gather
        # l -> l/s (+ q*(128/s) for the q-th output sub-chunk), lags scale
        # back by stride; off-stride positions get no candidate.
        lane2 = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
        on_stride = (lane2 & (stride - 1)) == 0
        lg2s = stride.bit_length() - 1

        def xchunk(j, _):
            t = jnp.transpose(pk_s[pl.ds(j * LANES, LANES)])
            for q in range(stride):
                part = jnp.take_along_axis(
                    t, (q * (LANES >> lg2s)) + (lane2 >> lg2s), axis=1
                )
                lag = jnp.where(on_stride, (part & 0xFFFF) * stride, 0)
                cand_ref[pl.ds((j * stride + q) * LANES, LANES)] = (
                    jnp.transpose(lag)
                )
            return 0

        jax.lax.fori_loop(0, m // LANES, xchunk, 0)


# ---------------------------------------------------------------------------
# Extension kernel: exact byte verification + fold into the running best.
#
# Mosaic's dynamic_gather cannot cross vregs along the gather dimension
# (hardware fact, shared with the decoder's route kernel), so the naive
# ``take_along_axis(W4, idx, axis=0)`` over bs rows does not lower. The
# kernel instead works in the decoder's chunk-transposed layout: each
# 128-position chunk of the (positions, blocks) array is transposed to
# (blocks, position-residues), putting positions on LANES where per-element
# gathers are legal within one vreg. The cross-chunk component of a
# source index becomes a dynamic 128-row offset (plain address arithmetic
# on the sublane-major axis), swept adaptively: per chunk and round, only
# the chunk-distances that still-alive candidates actually need run
# (nearest-previous-occurrence lags are short on real data, so the sweep
# is shallow). Chunk-outer / round-inner nesting keeps lenacc/still in
# registers; the only scratch is the transposed word array.
# ---------------------------------------------------------------------------


def _extend_fold_kernel(
    data_ref,  # (bs, 128) i8
    lens_ref,  # (8, 128) i32, row 0 = block lengths
    cand_ref,  # (bs, 128) i32 candidate lags
    best_ref,  # (bs, 128) i32 packed (len << 16) | lag, running best
    out_ref,  # (bs, 128) i32 packed, folded best
    TW_s,  # scratch (bs, 128) i32: chunk-transposed packed words
    *,
    bs: int,
    rounds: int = 16,
    span: int = 4,
):
    nq = bs // LANES
    lane = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)

    # Phase T: chunk-transposed W4. Word packing reads 3 bytes past the
    # chunk, so each chunk reads its successor too (zeroed past the block
    # end, matching the spec's zero-fill shift).
    def build(q, _):
        d0 = data_ref[pl.ds(q * LANES, LANES)].astype(jnp.int32) & 0xFF
        nxt = jnp.minimum(q + 1, nq - 1) * LANES
        d1 = data_ref[pl.ds(nxt, LANES)].astype(jnp.int32) & 0xFF
        d1 = jnp.where(q + 1 < nq, d1, 0)
        dd = jnp.concatenate([d0, d1], axis=0)  # (256, 128)
        w = dd[0:LANES]
        for b in (1, 2, 3):
            w = w | (dd[b : LANES + b] << (8 * b))
        TW_s[pl.ds(q * LANES, LANES)] = jnp.transpose(w)
        return 0

    jax.lax.fori_loop(0, nq, build, 0)

    lens_t = jnp.transpose(
        jnp.broadcast_to(lens_ref[0:1, :], (LANES, LANES))
    )  # (blocks, _) — per-row block lengths in transposed layout
    # Hoisted constant planes: every per-round use below is a reference,
    # not a fresh broadcast eqn (the jaxpr-level op count — the ledger and
    # the emulator's per-op dispatch cost — pays for each broadcast).
    zz = jnp.zeros((LANES, LANES), jnp.int32)
    neg1 = jnp.full((LANES, LANES), -1, jnp.int32)
    four4 = jnp.full((LANES, LANES), 4, jnp.int32)

    # Phase E: per destination chunk, all 16 extension rounds in registers.
    def per_chunk(c, _):
        cn = cand_ref[pl.ds(c * LANES, LANES)]  # normal layout (pos, block)
        cand = jnp.transpose(cn)  # (block, residue)
        p = c * LANES + lane  # position, per lane
        crow = zz + c  # chunk index plane, shared by every round's dist
        has = cand > 0
        still = has
        lenacc = zz
        # The failing round's xor word, deferred: the 1-3-byte partial-match
        # tail is a function of the first differing word alone, and `still`
        # is monotone so each lane fails at most once — one post-loop tail
        # computation replaces 16 per-round ones (~12% of the kernel).
        # All-ones marks never-failed lanes (their tail is 0 either way).
        xfail = neg1
        # Live lags never reach past position 0 (sorted-space lags and
        # their compositions are backward jumps from p), so src stays
        # >= 0 unclipped; rs is masked to a lane index and the sweep's
        # start offset is clipped, so beyond-block reads on EITHER side
        # (a-words past the block end read the next chunk's real rows or
        # the repeated last chunk; b-words past it read a clipped chunk)
        # produce junk that only affects lanes whose lenacc the
        # el = min(..., len - p) clamp already floors: any lane whose
        # lenacc or tail came from a junk round had already survived to
        # p + 4k >= bs >= len, so its lenacc >= len - p and the clamp
        # decides — the same equivalence the spec's zero-fill relies on.
        src0 = p - cand
        own = TW_s[pl.ds(c * LANES, LANES)]
        nxt_start = jnp.minimum(c + 1, nq - 1) * LANES
        own_nxt = TW_s[pl.ds(nxt_start, LANES)]
        # rounds=16 is the 64-byte copy cap; fewer rounds make the capped
        # cheap pass of select-then-extend (spec: extend_match(max_len)).
        for k in range(rounds):
            # a = W4[p + 4k]: 4k is static per unrolled round, so the
            # two-chunk lane fetch is a static lane shift (slice +
            # concat), not a gather; no block-end mask (see junk note).
            if k == 0:
                a = own
            else:
                a = jnp.concatenate(
                    [own[:, 4 * k :], own_nxt[:, : 4 * k]], axis=1
                )
            # b = W4[p - cand + 4k] via adaptive chunk-delta sweep.
            src = src0 + 4 * k if k else src0
            qs = src >> 7
            rs = src & (LANES - 1)
            dist = crow - qs
            maxd = jnp.max(jnp.where(still, dist, neg1))

            # Span sweep: ``span`` consecutive source chunks per
            # iteration, per-lane binary select, one gather per plane.
            # d0 = -1 covers forward reads (4k > cand). No still gate: a
            # dead lane's b is never read (x, weq, xfail are all
            # still-gated downstream).
            b = _span_sweep(TW_s, c, nq, rs, dist, maxd, span, zz)
            x = a ^ b
            weq = still & (x == 0)
            lenacc = lenacc + jnp.where(weq, four4, zz)
            xfail = jnp.where(still ^ weq, x, xfail)  # still & ~weq: weq<=still
            still = weq
        lenacc = lenacc + (
            ((xfail & 0xFF) == 0).astype(jnp.int32)
            + ((xfail & 0xFFFF) == 0).astype(jnp.int32)
            + ((xfail & 0xFFFFFF) == 0).astype(jnp.int32)
        )
        el = jnp.minimum(jnp.minimum(lenacc, lens_t - p), 4 * rounds)
        el = jnp.where(has & (el >= 4), el, 0)
        el_n = jnp.transpose(el)  # back to (pos, block)
        best = best_ref[pl.ds(c * LANES, LANES)]
        better = el_n > (best >> 16)
        out_ref[pl.ds(c * LANES, LANES)] = jnp.where(
            better, (el_n << 16) | cn, best
        )
        return 0

    jax.lax.fori_loop(0, nq, per_chunk, 0)


# ---------------------------------------------------------------------------
# Fused select-then-extend kernel: ALL candidate arrays (every rung and the
# prev ladder) share ONE transposed-word build and ONE full extension. Each
# candidate runs only the CHEAP capped extension (sel_rounds word rounds)
# into a strictly-greater selection fold (earlier arrays win ties — the
# caller passes nearer-lag candidates first), and the per-position winner
# gets the single full extension. Spec:
# lane_model_encode.match_search_sorted(sel_all=True, sel_cap=...).
# ---------------------------------------------------------------------------


def _select_extend_kernel(
    data_ref,  # (bs, 128) i8
    lens_ref,  # (8, 128) i32, row 0 = block lengths
    *refs,  # n_cands x (bs, 128) i32 candidate lags; out_ref; TW_s
    # hbm mode appends: CWIN (128, 128) i32 window, DMA sem
    bs: int,
    n_cands: int,
    sel_rounds: int,
    rounds: int = 16,
    hbm: bool = False,
    span: int = 4,
):
    cand_refs = refs[:n_cands]
    out_ref = refs[n_cands]
    TW_s = refs[n_cands + 1]
    if hbm:
        CWIN, csem = refs[n_cands + 2], refs[n_cands + 3]
    nq = bs // LANES
    lane = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)

    def build(q, _):
        d0 = data_ref[pl.ds(q * LANES, LANES)].astype(jnp.int32) & 0xFF
        nxt = jnp.minimum(q + 1, nq - 1) * LANES
        d1 = data_ref[pl.ds(nxt, LANES)].astype(jnp.int32) & 0xFF
        d1 = jnp.where(q + 1 < nq, d1, 0)
        dd = jnp.concatenate([d0, d1], axis=0)
        w = dd[0:LANES]
        for b in (1, 2, 3):
            w = w | (dd[b : LANES + b] << (8 * b))
        TW_s[pl.ds(q * LANES, LANES)] = jnp.transpose(w)
        return 0

    jax.lax.fori_loop(0, nq, build, 0)

    lens_t = jnp.transpose(
        jnp.broadcast_to(lens_ref[0:1, :], (LANES, LANES))
    )
    # Hoisted constant planes (see _extend_fold_kernel: each per-round use
    # is a reference, not a fresh broadcast eqn).
    zz = jnp.zeros((LANES, LANES), jnp.int32)
    neg1 = jnp.full((LANES, LANES), -1, jnp.int32)
    four4 = jnp.full((LANES, LANES), 4, jnp.int32)

    def per_chunk(c, _):
        p = c * LANES + lane
        crow = zz + c
        lensp = lens_t - p
        own = TW_s[pl.ds(c * LANES, LANES)]
        nxt_start = jnp.minimum(c + 1, nq - 1) * LANES
        own_nxt = TW_s[pl.ds(nxt_start, LANES)]

        def ext_len(cand, nrounds, start=0, lenacc0=None, still0=None):
            # Exact capped extension in transposed space — identical to
            # _extend_fold_kernel's round structure (deferred-tail, adaptive
            # chunk-delta sweep, junk-read block-end equivalence), with
            # `own` words shared across calls.
            # ``start/lenacc0/still0`` resume the winner's full extension
            # from the capped pass's state instead of re-running rounds
            # 0..start-1: equivalent to a from-scratch extension because a
            # non-saturated capped length already includes its tail bytes
            # (still0 = False freezes it) and a saturated one (== 4*start,
            # only reachable by `start` clean word rounds) resumes with an
            # untouched tail.
            has = cand > 0
            still = has if still0 is None else still0
            lenacc = zz if lenacc0 is None else lenacc0
            xfail = neg1
            src0 = p - cand
            for k in range(start, nrounds):
                if k == 0:
                    a = own
                else:
                    a = jnp.concatenate(
                        [own[:, 4 * k :], own_nxt[:, : 4 * k]], axis=1
                    )
                src = src0 + 4 * k if k else src0
                qs = src >> 7
                rs = src & (LANES - 1)
                dist = crow - qs
                maxd = jnp.max(jnp.where(still, dist, neg1))

                # Span sweep: ``span`` consecutive source chunks per
                # iteration (sweep_stats.json: distances are dense near
                # 0, so distance-set scheduling wins little; batching
                # the linear scan is what pays).
                b = _span_sweep(TW_s, c, nq, rs, dist, maxd, span, zz)
                x = a ^ b
                weq = still & (x == 0)
                lenacc = lenacc + jnp.where(weq, four4, zz)
                xfail = jnp.where(still ^ weq, x, xfail)
                still = weq
            lenacc = lenacc + (
                ((xfail & 0xFF) == 0).astype(jnp.int32)
                + ((xfail & 0xFFFF) == 0).astype(jnp.int32)
                + ((xfail & 0xFFFFFF) == 0).astype(jnp.int32)
            )
            el = jnp.minimum(jnp.minimum(lenacc, lensp), 4 * nrounds)
            return jnp.where(has & (el >= 4), el, 0)

        sel_len = zz
        sel_lag = zz
        for cr in cand_refs:
            if hbm:
                # 64 K envelope: candidate planes live in HBM; window in
                # this chunk's 128 rows (resident candidates would put the
                # kernel ~40 MB over the VMEM budget).
                cp = pltpu.make_async_copy(
                    cr.at[pl.ds(c * LANES, LANES)], CWIN, csem
                )
                cp.start()
                cp.wait()
                cand = jnp.transpose(CWIN[...])
            else:
                cand = jnp.transpose(cr[pl.ds(c * LANES, LANES)])
            cl = ext_len(cand, sel_rounds)
            better = cl > sel_len
            sel_len = jnp.where(better, cl, sel_len)
            sel_lag = jnp.where(better, cand, sel_lag)
        el = ext_len(
            sel_lag, rounds, start=sel_rounds, lenacc0=sel_len,
            still0=sel_len == 4 * sel_rounds,
        )
        out_ref[pl.ds(c * LANES, LANES)] = jnp.transpose(
            jnp.where(el > 0, (el << 16) | sel_lag, 0)
        )
        return 0

    jax.lax.fori_loop(0, nq, per_chunk, 0)


# ---------------------------------------------------------------------------
# Prev-step kernel: (j+1)-th-nearest-previous-occurrence lags by lag
# composition, with NO extra sort. In sorted space the j-step predecessor
# lag is the sum of j consecutive equal-key-run lags; back in natural
# position order each step is lag_{j+1}(p) = lag_j(p) + lag(p - lag_j(p))
# — the (j+1)-th previous occurrence of p's prefix is the nearest previous
# occurrence of the j-th one. One transpose/lane-gather pass per step (the
# extension kernel's exact access pattern). Spec:
# lane_model_encode.packed_prev_lags(prev_k=j+1).
# ---------------------------------------------------------------------------


def _prev_step_kernel(
    near_ref,  # (bs, 128) i32 nearest-previous lags (gather source)
    lagj_ref,  # (bs, 128) i32 j-th-previous lags (0 = none)
    out_ref,  # (bs, 128) i32 out: (j+1)-th-previous lags (0 = none)
    TC_s,  # scratch (bs, 128) i32: chunk-transposed nearest lags
    *hbm_scratch,  # hbm mode: (WIN (128,128) i32, DMA sem)
    bs: int,
    hbm: bool = False,
    span: int = 4,
):
    """``hbm=True`` (the 64 K envelope) takes ``near_ref`` in ANY/HBM and
    windows it in per 128-row chunk: three resident (bs, 128) planes +
    scratch total 128.07 MB at 64 K — 72 KB over the budget."""
    nq = bs // LANES
    lane = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)

    def build(q, _):
        if hbm:
            WIN, sem = hbm_scratch
            cp = pltpu.make_async_copy(
                near_ref.at[pl.ds(q * LANES, LANES)], WIN, sem
            )
            cp.start()
            cp.wait()
            TC_s[pl.ds(q * LANES, LANES)] = jnp.transpose(WIN[...])
        else:
            TC_s[pl.ds(q * LANES, LANES)] = jnp.transpose(
                near_ref[pl.ds(q * LANES, LANES)]
            )
        return 0

    jax.lax.fori_loop(0, nq, build, 0)

    def per_chunk(c, _):
        lagj = jnp.transpose(lagj_ref[pl.ds(c * LANES, LANES)])
        p = c * LANES + lane
        has = lagj > 0
        # src = p - lagj sits in [0, p] (lags never reach past position
        # 0), so no clip is needed and the adaptive chunk-delta sweep only
        # looks backwards (d >= 0).
        src = p - lagj
        qs = src >> 7
        rs = src & (LANES - 1)
        dist = c - qs
        maxd = jnp.max(jnp.where(has, dist, -1))
        # No has gate: a dead lane's b is never read (c2 is has-gated).
        lag_src = _span_sweep(
            TC_s, c, nq, rs, dist, maxd, span,
            jnp.zeros((LANES, LANES), jnp.int32),
        )
        c2 = jnp.where(has & (lag_src > 0), lagj + lag_src, 0)
        out_ref[pl.ds(c * LANES, LANES)] = jnp.transpose(c2)
        return 0

    jax.lax.fori_loop(0, nq, per_chunk, 0)


# ---------------------------------------------------------------------------
# Host-callable wrapper: full rung ladder over groups of 128 lanes.
# ---------------------------------------------------------------------------


def sorted_match_groups(
    data_g: jax.Array,  # (groups, bs, 128) i8 byte values
    lens_g: jax.Array,  # (groups, 8, 128) i32, row 0 = block lengths
    *,
    bs: int,
    rungs: tuple[int, ...] = DEFAULT_RUNGS,
    prev_k: int = 1,
    stride2_min: int = 0,
    sel_cap: int = 0,
    sel_all: bool = False,
    rung_strides: tuple[int, ...] | None = None,
    ext_cap: int = 64,
    neighbor: bool = False,
    sort_window: int = 0,
    rung_pick: bool = False,
    max_lag: int = 0,
    sweep_span: int = 4,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Returns (best_len, best_off) as (groups, bs, 128) i32 arrays.

    ``max_lag`` > 0 drops candidates with lag > max_lag (one elementwise
    select per rung, applied BEFORE rung-pick/ladder folds so nearer
    short-rung candidates fill in). This bounds the extension sweeps'
    chunk distance — the dominant device encode cost — at a measured
    small ratio price (xml @32K flagship: 0.8050 full -> 0.8018 @16384
    -> 0.7925 @8192 -> 0.7754 @4096, census in docs/sweep_stats.json;
    reference bar 0.7408). Unlike ``sort_window`` (aligned chunk-local
    sorts) the cap is sliding and costs no sort-reach, so its ratio
    dominates sort_window at equal reach.

    ``sweep_span`` (power of two in [2, 16]) sets how many consecutive
    source chunks each adaptive-sweep iteration covers (``_span_sweep``):
    span 8 halves flagship sweep iterations vs span 4.

    ``prev_k=k`` also folds the 2nd..k-th-nearest previous occurrences on
    the L=4 rung (computed by iterated lag composition, no extra sort —
    see ``_prev_step_kernel``): when a nearer source's own match is
    shorter than a farther one's, the farther candidate wins. Each step
    costs one composition pass + one extension pass (~1 c/B) and is worth
    +0.2-0.3 ratio points on xml up to k=4.

    ``stride2_min`` > 0 runs every rung >= that length as a half-density
    sort (even positions only, see ``_sort_rung_kernel``): ~40% fewer
    sort ops for those rungs at a small ratio cost. Must be > 4 so the
    L=4 rung (the prev2 base and short-match safety net) stays full
    density.

    ``sel_cap`` > 0 (bytes, multiple of 4, <= 64) switches the prev
    ladder to select-then-extend: each prev candidate runs a CHEAP
    capped extension (``sel_cap // 4`` word rounds instead of 16) into
    a selection fold, and only the per-position winner gets the full
    64-byte extension — ``prev_k`` capped passes + 1 full pass instead
    of ``prev_k`` full passes. The fold order matches the full path
    (strictly-greater, nearest-first), so results differ only where two
    candidates both saturate the cap but diverge past it. Spec:
    ``lane_model_encode.match_search_sorted(sel_cap=...)``.

    ``sel_all=True`` (requires ``sel_cap``) extends select-then-extend to
    EVERY candidate array — each rung and the prev ladder — in one fused
    kernel (``_select_extend_kernel``): all capped passes share a single
    transposed-word build, and the winner's full extension RESUMES from
    the capped state (rounds ``sel_cap//4``..15 only). The round-3
    production path: (4,32)+prev2 goes 4.40 -> 2.26-2.59 c/B at a 0.4-0.7
    ratio-point cost on xml. Spec:
    ``match_search_sorted(sel_all=True, sel_cap=...)``.

    ``rung_strides`` (parallel to ``rungs``; values 1/2/4/8) overrides
    ``stride2_min`` with an explicit per-rung sort density — e.g.
    ``(1, 8)`` sorts the 32-byte rung at 1/8 density for ~1/8 its sort
    cost (xml @32K: 0.7595 with prev2+sel16 vs 0.7636 at stride 4).

    ``ext_cap`` (bytes, multiple of 4 in [sel_cap or 4, 64]) caps the
    FULL extension at ``ext_cap // 4`` word rounds: matches longer than
    the cap emit as chained copies of at most ``ext_cap`` bytes instead
    of 64. At 48 the extra headers cost ~nothing on xml @32K (spec
    0.7497 vs 0.7563 without neighbor) while cutting a quarter of the
    extension rounds — the adaptive gather sweeps that dominate the
    matcher's data-dependent cost. Spec:
    ``match_search_sorted(ext_cap=...)``.

    ``neighbor=True`` folds each position's left neighbor's match,
    one byte shorter, after all rungs (spec ``derive_neighbor``): if
    data[p-1..p-1+L) matched at ``off``, then (L-1, off) is a valid
    match at p. One elementwise pass, worth +0.7 ratio points on xml
    @32K (0.7563 -> 0.7635) — it fills positions whose own candidates
    lost to hash-fold collisions or capped selection.
    """
    if bs & (bs - 1):
        raise ValueError("sorted matcher requires a power-of-two block size")
    if bs > MAX_SORT_BLOCK:
        raise ValueError(f"sorted matcher supports block_size <= {MAX_SORT_BLOCK}")
    if not 1 <= prev_k <= 8:
        raise ValueError("prev_k must be in [1, 8]")
    if stride2_min and stride2_min <= 4:
        raise ValueError("stride2_min must be > 4 (L=4 stays full density)")
    if sel_cap and (sel_cap % 4 or not 4 <= sel_cap <= 64):
        raise ValueError("sel_cap must be a multiple of 4 in [4, 64]")
    if rung_strides is not None:
        if len(rung_strides) != len(rungs):
            raise ValueError("rung_strides must parallel rungs")
        if any(s not in (1, 2, 4, 8) for s in rung_strides):
            raise ValueError("rung strides must be 1, 2, 4 or 8")
        if rung_strides[0] != 1 and rungs[0] == 4:
            raise ValueError("the L=4 rung must stay full density")
    if sel_all and not sel_cap:
        raise ValueError("sel_all requires sel_cap")
    if rung_pick and (sel_cap or prev_k != 1):
        raise ValueError(
            "rung_pick replaces the select ladder: requires prev_k=1 and "
            "sel_cap=0"
        )
    if sort_window:
        if sort_window & (sort_window - 1):
            raise ValueError("sort_window must be a power of two")
        if sort_window < 512 or bs % sort_window:
            raise ValueError(
                "sort_window must be >= 512 and divide the block size"
            )
    if ext_cap % 4 or not max(sel_cap, 4) <= ext_cap <= 64:
        raise ValueError(
            "ext_cap must be a multiple of 4 in [max(sel_cap, 4), 64]"
        )
    if sweep_span & (sweep_span - 1) or not 2 <= sweep_span <= 32:
        raise ValueError("sweep_span must be a power of two in [2, 32]")
    if bs > 32768:
        # The 64 K select-extend/extension kernels already sit at the VMEM
        # edge (HBM-windowed candidates, r3); wider spans' extra live
        # gathered planes spill ~38 MB of registers past the budget
        # (device-measured). The reach cap still applies.
        sweep_span = min(sweep_span, 4)
    if max_lag < 0:
        raise ValueError("max_lag must be >= 0 (0 = unlimited)")
    ext_rounds = ext_cap // 4

    def cap_lag(c):
        # Candidates are nonnegative; 0 (none) stays 0 under the select.
        return jnp.where(c <= max_lag, c, 0) if max_lag else c
    vmem_cap = pltpu.CompilerParams(vmem_limit_bytes=126 * 1024 * 1024)

    def rung_stride(ri: int) -> int:
        if rung_strides is not None:
            return rung_strides[ri]
        return 2 if (stride2_min and rungs[ri] >= stride2_min) else 1

    def rung_call(rung, stride):
        # sort_window is a byte reach at full density; a strided rung
        # covers the same bytes with window // stride sorted rows (spec:
        # packed_prev_lags strides first, then windows the sorted rows).
        return pl.pallas_call(
            functools.partial(
                _sort_rung_kernel, bs=bs, rung=rung, stride=stride,
                window=sort_window // stride if sort_window else 0,
            ),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bs, LANES), jnp.int32),
            scratch_shapes=[
                # Exactly m sorted rows each (fused in-chunk stages read no
                # margin); the strided pong buffer additionally stages
                # the full-density words (bs rows) before compaction.
                pltpu.VMEM((bs // stride, LANES), jnp.int32),  # ping
                pltpu.VMEM(
                    (max(bs // stride, bs if stride > 1 else 0), LANES),
                    jnp.int32,
                ),  # pong
            ],
            compiler_params=vmem_cap,
            interpret=interpret,
        )

    def extend_fold_call(rounds=16):
        return pl.pallas_call(
            functools.partial(
                _extend_fold_kernel, bs=bs, rounds=rounds, span=sweep_span
            ),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bs, LANES), jnp.int32),
            scratch_shapes=[pltpu.VMEM((bs, LANES), jnp.int32)],
            compiler_params=vmem_cap,
            interpret=interpret,
        )

    extend_call = extend_fold_call(rounds=ext_rounds)

    # 64 K envelope: the gather-source plane arrives via HBM windows — a
    # third resident (bs, 128) plane put the kernel 72 KB over the budget.
    hbm_cands = bs > 32768
    prev_step_call = pl.pallas_call(
        functools.partial(
            _prev_step_kernel, bs=bs, hbm=hbm_cands, span=sweep_span
        ),
        in_specs=[
            pl.BlockSpec(
                memory_space=pl.ANY if hbm_cands else pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bs, LANES), jnp.int32),
        scratch_shapes=[pltpu.VMEM((bs, LANES), jnp.int32)]
        + (
            [pltpu.VMEM((LANES, LANES), jnp.int32), pltpu.SemaphoreType.DMA]
            if hbm_cands
            else []
        ),
        compiler_params=vmem_cap,
        interpret=interpret,
    )

    def _neighbor_fold(best):
        # Inherit the left neighbor's match one byte shorter (spec:
        # lane_model_encode.derive_neighbor). Packed (len<<16)|lag form:
        # subtracting 1<<16 from the shifted word decrements the length
        # while keeping the lag, so the whole fold is shift + compare +
        # select on the packed plane. Strictly-greater keeps own
        # candidates (nearer lags) on ties.
        prev = jnp.concatenate(
            [jnp.zeros((1, LANES), jnp.int32), best[: bs - 1]]
        )
        inh = prev - (1 << 16)
        take = (inh >= (4 << 16)) & ((inh >> 16) > (best >> 16))
        return jnp.where(take, inh, best)

    def one_group_sel_all(args):
        # Fused select-then-extend over EVERY candidate array (each rung
        # and the prev ladder): collect the candidate arrays, then one
        # kernel runs all the capped selection passes (sharing one
        # transposed-word build) plus the single full extension.
        data, lens = args
        cands = []
        for ri, rung in enumerate(rungs):
            cand = rung_call(rung, rung_stride(ri))(data)
            cands.append(cap_lag(cand))
            if rung == 4 and prev_k >= 2:
                # The composition chain stays uncapped (capping a middle
                # step would break the j-th-previous recurrence); only the
                # candidates handed to the extension are capped.
                lagj = cand
                for _ in range(2, prev_k + 1):
                    lagj = prev_step_call(cand, lagj)
                    cands.append(cap_lag(lagj))
        sel_call = pl.pallas_call(
            functools.partial(
                _select_extend_kernel, bs=bs, n_cands=len(cands),
                sel_rounds=sel_cap // 4, rounds=ext_rounds, hbm=hbm_cands,
                span=sweep_span,
            ),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
            + [
                pl.BlockSpec(
                    memory_space=pl.ANY if hbm_cands else pltpu.VMEM
                )
            ]
            * len(cands),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bs, LANES), jnp.int32),
            scratch_shapes=[pltpu.VMEM((bs, LANES), jnp.int32)]
            + (
                [
                    pltpu.VMEM((LANES, LANES), jnp.int32),
                    pltpu.SemaphoreType.DMA,
                ]
                if hbm_cands
                else []
            ),
            compiler_params=vmem_cap,
            interpret=interpret,
        )
        best = sel_call(data, lens, *cands)
        if neighbor:
            best = _neighbor_fold(best)
        return best >> 16, best & 0xFFFF

    def one_group(args):
        data, lens = args  # (bs, 128) i8, (8, 128) i32
        best = jnp.zeros((bs, LANES), jnp.int32)
        for ri, rung in enumerate(rungs):
            cand = rung_call(rung, rung_stride(ri))(data)
            if rung == 4 and prev_k >= 2 and sel_cap:
                cheap_call = extend_fold_call(rounds=sel_cap // 4)
                zero = jnp.zeros((bs, LANES), jnp.int32)
                sel = cheap_call(data, lens, cap_lag(cand), zero)
                lagj = cand
                for _ in range(2, prev_k + 1):
                    lagj = prev_step_call(cand, lagj)
                    sel = cheap_call(data, lens, cap_lag(lagj), sel)
                best = extend_call(data, lens, sel & 0xFFFF, best)
            else:
                best = extend_call(data, lens, cap_lag(cand), best)
                if rung == 4 and prev_k >= 2:
                    lagj = cand
                    for _ in range(2, prev_k + 1):
                        lagj = prev_step_call(cand, lagj)
                        best = extend_call(data, lens, cap_lag(lagj), best)
        # Unpack per group: a whole-batch unpack fusion on the stacked
        # (groups, bs, 128) map output exceeds XLA's 16 MB scoped-vmem
        # stack allocation (observed on v5e at bs=8192 x 8 groups).
        if neighbor:
            best = _neighbor_fold(best)
        return best >> 16, best & 0xFFFF

    def one_group_rung_pick(args):
        # Rung-priority selection (round-4 flagship candidate): the
        # LONGEST rung with a candidate wins outright — no capped select
        # sweeps at all — and ONE from-scratch extension verifies the
        # winner exactly (hash-fold collisions on long rungs extend
        # short and are floored below the emit minimum, never emitted
        # wrong). Fewer data-dependent gather sweeps than the capped
        # select ladder (sweep_stats.json: 99K vs 131K span-4 iterations
        # on xml @32K) at BETTER ratio (spec 0.8050 vs 0.7879); every
        # corpus file still compresses below the reference stream. Spec:
        # lane_model_encode.match_search_sorted(rung_pick=True).
        data, lens = args
        sel = jnp.zeros((bs, LANES), jnp.int32)
        for ri, rung in enumerate(rungs):
            cand = cap_lag(rung_call(rung, rung_stride(ri))(data))
            sel = jnp.where(cand > 0, cand, sel)
        best = extend_call(
            data, lens, sel, jnp.zeros((bs, LANES), jnp.int32)
        )
        if neighbor:
            best = _neighbor_fold(best)
        return best >> 16, best & 0xFFFF

    if rung_pick:
        fn = one_group_rung_pick
    elif sel_all and sel_cap:
        fn = one_group_sel_all
    else:
        fn = one_group
    return jax.lax.map(fn, (data_g, lens_g))
