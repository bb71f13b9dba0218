"""Lane-parallel Pallas TPU decode kernels.

Implements the pipeline specified (and property-tested) in
``ops/lane_model.py`` — see DESIGN.md for the hardware rationale. Two
kernels:

- **K1 parse DFA** (``_dfa_kernel``): 1024 blocks in lockstep as an
  (8, 128) vector of per-lane state machines; the grid walks compressed
  positions in chunks with the DFA state carried in VMEM scratch across
  sequential grid steps. Emits one routing token per byte position.
- **K2 route/fill/resolve** (``_route_kernel``): per 128-block group, moves
  tokens to their output rows with the conflict-free compact-then-expand
  schedule (shift + select only, no gathers), fills copy interiors with a
  log-shift prefix-max, and pointer-doubles copy chains (the only gathers
  in the whole decoder, via ``take_along_axis`` -> ``tpu.dynamic_gather``).

Token packing (int32, block_size <= 32768, the format default): OCCUPIED
(sign bit) | dst<<16 (15 bits) | kind<<15 (1 bit) | value (15 bits); value
holds the literal byte or offset-1.

The per-block serial tag walk of the reference decoder
(``snappy_decompress.c:218-289``, ``dpu-decompress/dpu_decompress.c:224-299``)
is thereby replaced with: one lockstep pass over bytes + O(log n) vector
passes — no per-element serial work anywhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pim_compression_tpu.format import constants as C
from pim_compression_tpu.ops.lane_model import (
    ERR_BAD_OFFSET,
    ERR_ELEMENT_OVERRUN,
    ERR_LENGTH_MISMATCH,
    ERR_ROUTE_CONFLICT,
    ERR_UNRESOLVED,
    KIND_COPY,
    KIND_LIT,
    OCCUPIED,
)

DST_SHIFT = 16
KIND_SHIFT = 15
VALUE_MASK = (1 << 15) - 1
MAX_PALLAS_BLOCK = 32768  # single-plane packing budget (15-bit dst/value)
# Wide (two-plane) token format for 32 K < block_size <= 64 K (the format's
# documented max, snappy/README.md:7): the 34 bits a 64 K token needs
# (17-bit dst + kind + 16-bit value + occupancy) split across an int32
# routing word OCC | dst << 8 | kind and an int16 value plane that rides
# every routing move — the encoder's payload-rides-the-route pattern
# (pallas_encode._route_tokens).
MAX_PALLAS_BLOCK_WIDE = 65536
WDST_SHIFT = 8
WDST_MASK = (1 << 17) - 1

LANES = 128
SUBLANES = 8
DFA_LANES = SUBLANES * LANES  # blocks per K1 batch
TAG, EXT, LIT, OFF = 0, 1, 2, 3


def pallas_capacity(block_size: int) -> int:
    cap = C.max_compressed_length(block_size)
    return (cap + 127) // 128 * 128


def _shift_down(x: jax.Array, sh: int) -> jax.Array:
    """Non-cyclic shift along axis 0: out[i] = x[i-sh], zeros shifted in."""
    return jnp.concatenate([jnp.zeros((sh,) + x.shape[1:], x.dtype), x[:-sh]], axis=0)


def _shift_up(x: jax.Array, sh: int) -> jax.Array:
    return jnp.concatenate([x[sh:], jnp.zeros((sh,) + x.shape[1:], x.dtype)], axis=0)


# ---------------------------------------------------------------------------
# K1: parse DFA.
# ---------------------------------------------------------------------------


def _dfa_kernel(
    comp_ref,  # (CHUNK, 8, 128) i32
    comp_len_ref,  # (8, 128) i32
    out_len_ref,  # (8, 128) i32
    tokens_ref,  # (CHUNK, 8, 128) i32 out
    *rest,  # wide: (vals_ref (CHUNK,8,128) i16, err_ref, state_ref)
    # narrow: (err_ref, state_ref)
    chunk: int,
    cap: int,
    bias: int,
    block_size: int,
    wide: bool = False,
):
    if wide:
        vals_ref, err_ref, state_ref = rest
    else:
        vals_ref = None
        err_ref, state_ref = rest
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        state_ref[...] = jnp.zeros_like(state_ref)

    comp_len = comp_len_ref[...]
    out_len = out_len_ref[...]

    def body(i, carry):
        mode, cnt, acc, shift, length, out_cur, err = carry
        p = step * chunk + i
        b = comp_ref[i]
        active = p < comp_len

        is_tag = active & (mode == TAG)
        is_ext = active & (mode == EXT)
        is_lit = active & (mode == LIT)
        is_off = active & (mode == OFF)

        kind = b & 3
        lf = b >> 2

        t_lit_inline = is_tag & (kind == 0) & (lf < 60)
        t_lit_ext = is_tag & (kind == 0) & (lf >= 60)
        t_copy1 = is_tag & (kind == 1)
        t_copy2 = is_tag & (kind == 2)
        t_copy4 = is_tag & (kind == 3)
        any_copy = t_copy1 | t_copy2 | t_copy4

        n_mode = jnp.where(t_lit_inline, LIT, mode)
        n_cnt = jnp.where(t_lit_inline, lf + 1, cnt)
        n_len = jnp.where(t_lit_inline, lf + 1, length)

        n_mode = jnp.where(t_lit_ext, EXT, n_mode)
        n_cnt = jnp.where(t_lit_ext, lf - 59, n_cnt)
        n_acc = jnp.where(t_lit_ext, 0, acc)
        n_shift = jnp.where(t_lit_ext, 0, shift)

        n_mode = jnp.where(any_copy, OFF, n_mode)
        n_acc = jnp.where(t_copy1, (b >> 5) << 8, jnp.where(any_copy, 0, n_acc))
        n_shift = jnp.where(any_copy, 0, n_shift)
        n_cnt = jnp.where(
            t_copy1, 1, jnp.where(t_copy2, 2, jnp.where(t_copy4, 4, n_cnt))
        )
        n_len = jnp.where(
            t_copy1, ((b >> 2) & 7) + 4, jnp.where(t_copy2 | t_copy4, lf + 1, n_len)
        )

        # EXT: long-literal length bytes.
        sh_clamped = jnp.minimum(shift, 24)
        ext_clamp = is_ext & (shift >= 24) & (b > 0)
        err = jnp.where(ext_clamp, err | ERR_ELEMENT_OVERRUN, err)
        n_acc = jnp.where(is_ext, acc + jnp.where(shift < 24, b << sh_clamped, 0), n_acc)
        n_shift = jnp.where(is_ext, shift + 8, n_shift)
        n_cnt = jnp.where(is_ext, cnt - 1, n_cnt)
        ext_done = is_ext & (cnt == 1)
        n_len = jnp.where(ext_done, n_acc + 1, n_len)
        n_mode = jnp.where(ext_done, LIT, n_mode)
        n_cnt = jnp.where(ext_done, n_acc + 1, n_cnt)

        # LIT: route this data byte.
        lit_ok = is_lit & (out_cur < out_len)
        err = jnp.where(is_lit & ~lit_ok, err | ERR_LENGTH_MISMATCH, err)
        if wide:
            token = jnp.where(
                lit_ok,
                OCCUPIED | ((bias + out_cur) << WDST_SHIFT) | KIND_LIT,
                0,
            )
            value = jnp.where(lit_ok, b, 0)
        else:
            token = jnp.where(
                lit_ok,
                OCCUPIED
                | ((bias + out_cur) << DST_SHIFT)
                | (KIND_LIT << KIND_SHIFT)
                | b,
                0,
            )
        n_cnt = jnp.where(is_lit, cnt - 1, n_cnt)
        n_mode = jnp.where(is_lit & (cnt == 1), TAG, n_mode)

        # OFF: offset bytes; emit copy record on completion.
        off_clamp = is_off & (shift >= 24) & (b > 0)
        n_acc = jnp.where(is_off, acc + jnp.where(shift < 24, b << sh_clamped, 0), n_acc)
        n_shift = jnp.where(is_off, shift + 8, n_shift)
        n_cnt = jnp.where(is_off, cnt - 1, n_cnt)
        off_done = is_off & (cnt == 1)
        offset = n_acc
        bad_off = off_done & (
            (offset <= 0) | (offset > out_cur) | (offset > block_size) | off_clamp
        )
        err = jnp.where(bad_off, err | ERR_BAD_OFFSET, err)
        err = jnp.where(
            off_done & (out_cur + length > out_len), err | ERR_LENGTH_MISMATCH, err
        )
        copy_ok = off_done & ~bad_off & (out_cur < out_len)
        if wide:
            token = jnp.where(
                copy_ok,
                OCCUPIED | ((bias + out_cur) << WDST_SHIFT) | KIND_COPY,
                token,
            )
            value = jnp.where(copy_ok, (offset - 1) & 0xFFFF, value)
        else:
            token = jnp.where(
                copy_ok,
                OCCUPIED
                | ((bias + out_cur) << DST_SHIFT)
                | (KIND_COPY << KIND_SHIFT)
                | ((offset - 1) & VALUE_MASK),
                token,
            )
        n_mode = jnp.where(off_done, TAG, n_mode)

        out_cur = jnp.where(
            is_lit, out_cur + 1, jnp.where(off_done, out_cur + length, out_cur)
        )
        tokens_ref[i] = token
        if wide:
            vals_ref[i] = value.astype(jnp.int16)
        return n_mode, n_cnt, n_acc, n_shift, n_len, out_cur, err

    carry = tuple(state_ref[j] for j in range(7))
    carry = jax.lax.fori_loop(0, chunk, body, carry)
    for j, arr in enumerate(carry):
        state_ref[j] = arr

    @pl.when(step == pl.num_programs(0) - 1)
    def _finalize():
        mode, _, _, _, _, out_cur, err = tuple(state_ref[j] for j in range(7))
        err = jnp.where((mode != TAG) & (comp_len > 0), err | ERR_ELEMENT_OVERRUN, err)
        err = jnp.where(out_cur != out_len, err | ERR_LENGTH_MISMATCH, err)
        err_ref[...] = err


# ---------------------------------------------------------------------------
# K2: route + fill + resolve (per 128-block group).
# ---------------------------------------------------------------------------


def _pick_chunk(rows: int, target: int = 4096) -> int:
    """Largest divisor of ``rows`` that is <= target and a multiple of 8.

    Phase bodies operate on (chunk, 128) slices so the register allocator
    never has to materialize more than a few MB of live vector values: at
    bs=32768 a single whole-array expression costs 16 MB of spill slots and
    the straight-line kernel needed 281 MB of VMEM (measured; budget 128).
    """
    ch = min(rows, target)
    while ch > 8 and (rows % ch or ch % 8):
        ch -= 8
    if rows % ch or ch % 8:
        raise ValueError(f"no chunk divisor for {rows}")
    return ch


def _route_kernel(
    tokens_hbm,  # (8, cap, 128) i32 in ANY (HBM); group g is DMA'd in
    out_len_ref,  # (1, 8, 128) i32  (row 0 used)
    out_ref,  # (1, block_size, 128) i8
    err_ref,  # (1, 8, 128) i32
    W_s,  # scratch (cap + CHC, 128) i32 (zeroed pad chunk above cap)
    rank_s,  # scratch (max(cap, block_size) + CHC, 128) i32: D plane
    E_s,  # scratch (block_size, 128) i32
    C_s,  # scratch (2 * CHB, 128) i32 (expand chunk-0 snapshot + zeros pad)
    sem,  # DMA semaphore
    *,
    cap: int,
    block_size: int,
    resolve_rounds: int,
):
    # Structure: every phase is a (rounds x chunks) fori nest. Pure-copy
    # staging runs on the DMA engines (VMEM->VMEM async copies); compute
    # staging and combines run chunk-wise so peak value liveness stays a few
    # (chunk, 128) arrays. The token input lives in HBM and is DMA'd into
    # W_s once — a windowed input would hold 2 x cap rows of VMEM.
    bs = block_size
    g = pl.program_id(0)
    CHC = _pick_chunk(cap)
    CHB = _pick_chunk(bs)
    NCC = cap // CHC
    NCB = bs // CHB
    nq = bs // LANES  # 128-row transpose chunks (resolve layout)

    def dma(src, dst):
        cp = pltpu.make_async_copy(src, dst, sem)
        cp.start()
        cp.wait()

    def ch_iota(n):
        return jax.lax.broadcasted_iota(jnp.int32, (n, LANES), 0)

    dma(tokens_hbm.at[g], W_s.at[pl.ds(0, cap)])
    # Zero the pad chunk above cap: the staging-free compact reads source
    # windows clamped to [cap, cap + CHC) (hardware scratch is NOT
    # zero-initialized; interpret mode is).
    W_s[cap : cap + CHC] = jnp.zeros((CHC, LANES), jnp.int32)
    rank_s[cap : cap + CHC] = jnp.zeros((CHC, LANES), jnp.int32)
    zzc = jnp.zeros((CHC, LANES), jnp.int32)
    zzb = zzc if CHB == CHC else jnp.zeros((CHB, LANES), jnp.int32)

    # ---- Phase 1a: occupancy ranks in ONE ascending chunk-carry pass
    # (in-chunk log-shift inclusive scan + carried total), stored as the
    # UPWARD travel distance D = row - rank — the compact rounds' whole
    # move decision is then one bit test (see pallas_encode._route_tokens:
    # at round k a token sits at rank + (D & ~(2^k - 1)), so bit k of its
    # current displacement equals bit k of the INITIAL D). Empty and
    # vacated rows carry D = 0: never move, never arrive.
    def occ_rank(c, tot):
        base = c * CHC
        W = W_s[pl.ds(base, CHC)]
        occ_i = (W < 0).astype(jnp.int32)  # OCCUPIED is the sign bit
        x = occ_i
        sh = 1
        while sh < CHC:
            x = x + jnp.concatenate(
                [jnp.zeros((sh, LANES), jnp.int32), x[: CHC - sh]]
            )
            sh <<= 1
        incl = x + tot
        crows = base + ch_iota(CHC)
        rank_s[pl.ds(base, CHC)] = jnp.where(occ_i != 0, crows - incl + 1, 0)
        return incl[CHC - 1 : CHC]

    jax.lax.fori_loop(
        0, NCC, occ_rank, jnp.zeros((1, LANES), jnp.int32)
    )

    # ---- Phase 1b: compact up, LSB-first, STAGING-FREE: ascending chunk
    # order reads source rows [base+sh, base+sh+CHC) from chunks not yet
    # updated this round (within-chunk rows load before the chunk stores),
    # clamped into the zero pad above cap. The conflict accumulator keeps
    # the routing-invariant check (arrivals must land on vacated/empty
    # rows) at one AND + any-reduce per chunk.
    def compact_round(k, conflict):
        sh = jnp.int32(1) << k
        shv = zzc + sh  # one broadcast per round, not per chunk

        def upd(c, conflict):
            base = c * CHC
            W = W_s[pl.ds(base, CHC)]
            D = rank_s[pl.ds(base, CHC)]
            move = (D & shv) != 0
            src = jnp.minimum(base + sh, cap)
            nW = W_s[pl.ds(src, CHC)]
            nD = rank_s[pl.ds(src, CHC)]
            arriving = (nD & shv) != 0
            conflict = conflict | jnp.any(
                arriving & (W < 0) & ~move, axis=0, keepdims=True
            ).astype(jnp.int32)
            W_s[pl.ds(base, CHC)] = jnp.where(
                arriving, nW, jnp.where(move, zzc, W)
            )
            rank_s[pl.ds(base, CHC)] = jnp.where(
                arriving, nD, jnp.where(move, zzc, D)
            )
            return conflict

        return jax.lax.fori_loop(0, NCC, upd, conflict)

    conflict_acc = jax.lax.fori_loop(
        0, (cap - 1).bit_length(), compact_round,
        jnp.zeros((1, LANES), jnp.int32),
    )

    # ---- Handoff to output space: every token produces >= 1 output byte,
    # so the compacted prefix holds at most block_size tokens and expand
    # runs in E_s. W's dst field is converted to the remaining DOWNWARD
    # distance E = dst - row in the same bits (dst >= row: token i sits at
    # row i and dsts strictly increase — no borrow into the kind/value
    # bits, no overflow into the sign bit), so the expand rounds use the
    # same bit-test schedule (MSB-first: each move subtracts exactly the
    # tested bit).
    def zero_e(c, _):
        E_s[pl.ds(c * CHB, CHB)] = jnp.zeros((CHB, LANES), jnp.int32)
        return 0

    if cap >= bs:
        dma(W_s.at[pl.ds(0, bs)], E_s)
    else:
        jax.lax.fori_loop(0, NCB, zero_e, 0)
        dma(W_s, E_s.at[pl.ds(0, cap)])

    def to_down(c, _):
        base = c * CHB
        W = E_s[pl.ds(base, CHB)]
        crows = base + ch_iota(CHB)
        E_s[pl.ds(base, CHB)] = jnp.where(
            W < 0, W - (crows << DST_SHIFT), zzb
        )
        return 0

    jax.lax.fori_loop(0, NCB, to_down, 0)

    # ---- Phase 2: expand down, MSB-first, STAGING-FREE: descending chunk
    # order reads source rows [base-sh, base-sh+CHB) from chunks not yet
    # updated this round; the scalar (base >= sh) gates chunks whose true
    # sources are negative (base and any sh >= CHB are CHB-aligned, and
    # sh < CHB implies base >= CHB > sh for every main-loop chunk). Chunk
    # 0 — the only one whose source window straddles row 0 — runs last,
    # off a per-round snapshot at C_s[CHB:2CHB) behind a zeros pad.
    max_bit = (bs - 1).bit_length() - 1
    C_s[pl.ds(0, CHB)] = jnp.zeros((CHB, LANES), jnp.int32)

    def expand_round(j, conflict):
        sh = jnp.int32(1) << (max_bit - j)
        shE = sh << DST_SHIFT
        shEv = zzb + shE
        C_s[pl.ds(CHB, CHB)] = E_s[pl.ds(0, CHB)]

        def upd(i, conflict):
            c = NCB - 1 - i
            base = c * CHB
            W = E_s[pl.ds(base, CHB)]
            move = (W & shEv) != 0
            moff = jnp.maximum(base - sh, 0)
            mW = E_s[pl.ds(moff, CHB)]
            arriving = (base >= sh) & ((mW & shEv) != 0)
            conflict = conflict | jnp.any(
                arriving & (W < 0) & ~move, axis=0, keepdims=True
            ).astype(jnp.int32)
            E_s[pl.ds(base, CHB)] = jnp.where(
                arriving, mW - shEv, jnp.where(move, zzb, W)
            )
            return conflict

        conflict = jax.lax.fori_loop(0, NCB - 1, upd, conflict)
        W = E_s[pl.ds(0, CHB)]
        move = (W & shEv) != 0
        off0 = jnp.maximum(CHB - sh, 0)
        mW = C_s[pl.ds(off0, CHB)]
        arriving = (mW & shEv) != 0
        conflict = conflict | jnp.any(
            arriving & (W < 0) & ~move, axis=0, keepdims=True
        ).astype(jnp.int32)
        E_s[pl.ds(0, CHB)] = jnp.where(
            arriving, mW - shEv, jnp.where(move, zzb, W)
        )
        return conflict

    conflict_acc = jax.lax.fori_loop(0, max_bit + 1, expand_round, conflict_acc)
    err = jnp.where(conflict_acc != 0, ERR_ROUTE_CONFLICT, 0)  # (1, 128)

    # ---- Phase 3: covering-token fill, one ascending chunk-carry pass of
    # the prefix-max over packed = (row << 16) | kind | value. A plain
    # prefix-max equals the 64-row-bounded staged fill on every stream the
    # DFA emits: copy lengths are structurally <= 64 (tag grammar), so no
    # output row is ever more than 63 rows past its covering token.
    def fill(c, carry):
        base = c * CHB
        R = E_s[pl.ds(base, CHB)]
        crows = base + ch_iota(CHB)
        K = jnp.where(R < 0, (crows << 16) | (R & 0xFFFF), -1)
        sh = 1
        while sh < CHB:
            K = jnp.maximum(
                K,
                jnp.concatenate(
                    [jnp.full((sh, LANES), -1, jnp.int32), K[: CHB - sh]]
                ),
            )
            sh <<= 1
        K = jnp.maximum(K, carry)
        rank_s[pl.ds(base, CHB)] = K
        return K[CHB - 1 : CHB]

    jax.lax.fori_loop(
        0, NCB, fill, jnp.full((1, LANES), -1, jnp.int32)
    )

    # ---- Phase 4: source pointers. Literal rows carry their byte (encoded
    # negative); copy rows point back by the covering offset.
    out_len = out_len_ref[0, 0:1, :]  # (1, 128)

    def sbad(c, bad_acc):
        R = E_s[pl.ds(c * CHB, CHB)]
        packed = rank_s[pl.ds(c * CHB, CHB)]
        rows = c * CHB + ch_iota(CHB)
        in_range = rows < out_len
        is_lit = ((R & OCCUPIED) != 0) & (((R >> KIND_SHIFT) & 1) == KIND_LIT)
        S = jnp.where(
            is_lit, -(R & 0xFF) - 1, rows - ((packed & VALUE_MASK) + 1)
        )
        bad = (
            in_range
            & ~is_lit
            & (
                (((packed >> KIND_SHIFT) & 1) != KIND_COPY)
                | (S >= rows)
                | (S < 0)
            )
        )
        bad_acc = bad_acc | jnp.any(bad, axis=0, keepdims=True).astype(
            jnp.int32
        )
        rank_s[pl.ds(c * CHB, CHB)] = jnp.where(bad | ~in_range, -1, S)
        return bad_acc

    bad_acc = jax.lax.fori_loop(0, NCB, sbad, jnp.zeros((1, LANES), jnp.int32))
    err = err | jnp.where(bad_acc != 0, ERR_BAD_OFFSET, 0)

    # ---- Phase 5: transpose to position-lane layout. Mosaic's
    # dynamic_gather cannot cross vregs along the gather dimension
    # (hardware-verified), so chains are chased with positions on lanes:
    # row (q*128 + block), lane (position % 128); the cross-chunk component
    # is a 128-aligned row shift. Chunk-wise (128, 128) transposes.
    def tr(q, _):
        x = rank_s[pl.ds(q * LANES, LANES)]  # [pos residue, block]
        E_s[pl.ds(q * LANES, LANES)] = jnp.transpose(x)  # [block, residue]
        return 0

    jax.lax.fori_loop(0, nq, tr, 0)

    # ---- Phase 6: single-pass ascending resolve. Copy sources strictly
    # precede their positions (sbad enforces S < row), so processing
    # 128-position chunks in ascending order keeps an invariant: every
    # earlier chunk is FULLY resolved. One adaptive span-4 sweep fetches
    # final bytes for lanes whose pointer leaves the chunk (sources in
    # earlier chunks hold bytes, never pointers), then ceil(log2(128)) = 7
    # pointer-doubling rounds resolve the intra-chunk chains — same-row
    # lane gathers, chains of <= 127 lanes ending at a byte. Replaces the
    # round-looped global-delta sweep with its 3 full-plane staging copies
    # per round (measured 66 ms of the 72 ms decode group time,
    # docs/route_phase_times.json); ``resolve_rounds`` is kept for API
    # compatibility but the pass count is structural now.
    del resolve_rounds
    zzl = jnp.zeros((LANES, LANES), jnp.int32)

    def resolve_chunk(q, _):
        P = E_s[pl.ds(q * LANES, LANES)]
        ptr = jnp.maximum(P, 0)
        rs = ptr & (LANES - 1)
        dist = (zzl + q) - (ptr >> 7)
        cross = (P >= 0) & (dist > 0)
        maxd = jnp.max(jnp.where(cross, dist, 0))

        def sweep(i, b):
            d0 = 4 * i + 1
            g = [
                jnp.take_along_axis(
                    E_s[
                        pl.ds(
                            jnp.clip(q - (d0 + j), 0, nq - 1) * LANES,
                            LANES,
                        )
                    ],
                    rs,
                    axis=1,
                )
                for j in range(4)
            ]
            loc = dist - d0
            odd = (loc & 1) != 0
            got = jnp.where(
                (loc & 2) != 0,
                jnp.where(odd, g[3], g[2]),
                jnp.where(odd, g[1], g[0]),
            )
            return jnp.where((loc >= 0) & (loc < 4), got, b)

        b = jax.lax.fori_loop(0, (maxd + 3) >> 2, sweep, zzl)
        P = jnp.where(cross, b, P)

        def jump(_, P):
            got = jnp.take_along_axis(
                P, jnp.maximum(P, 0) & (LANES - 1), axis=1
            )
            return jnp.where(P >= 0, got, P)

        P = jax.lax.fori_loop(0, 7, jump, P)
        E_s[pl.ds(q * LANES, LANES)] = P
        return 0

    jax.lax.fori_loop(0, nq, resolve_chunk, 0)

    # ---- Phase 7: back-transpose + int8 output (byte values bit-exact mod
    # 256: at bs=32768 an int32 out block would cost 16.8 MB of VMEM; int8
    # costs 4.2). Unresolved chains are flagged per block.
    def outw(q, unres):
        x = E_s[pl.ds(q * LANES, LANES)]  # [block, residue]
        S = jnp.transpose(x)  # [pos residue, block]
        rows = q * LANES + ch_iota(LANES)
        in_range = rows < out_len
        unres = unres | jnp.any(
            in_range & (S >= 0), axis=0, keepdims=True
        ).astype(jnp.int32)
        out_ref[0, pl.ds(q * LANES, LANES), :] = jnp.where(
            in_range, (-S - 1) & 0xFF, 0
        ).astype(jnp.int8)
        return unres

    unres = jax.lax.fori_loop(0, nq, outw, jnp.zeros((1, LANES), jnp.int32))
    err = err | jnp.where(unres != 0, ERR_UNRESOLVED, 0)
    err_ref[0] = jnp.broadcast_to(err, (SUBLANES, LANES))


def _pick_chunk_wide(rows: int, target: int = 1024) -> int:
    """Largest divisor of ``rows`` <= target that is a multiple of 128.

    The wide resolve phase reads 128-row-aligned source windows (delta is
    measured in 128-row transpose groups), so chunks must be 128-aligned.
    1024-row chunks keep the register allocator's spill slots small: the
    compact body holds ~10 live (CH, 128) i32 values, 18 MB of spill at
    CH=4096 (measured — it pushed the 64 K kernel past the VMEM budget).
    """
    ch = min(rows, target) // LANES * LANES
    while ch > LANES and rows % ch:
        ch -= LANES
    if ch <= 0 or rows % ch or ch % LANES:
        raise ValueError(f"no 128-multiple chunk divisor for {rows}")
    return ch


def _route_kernel_wide(
    tokens_hbm,  # (G, cap, 128) i32 in ANY (HBM); group g is DMA'd in
    vals_hbm,  # (G, cap, 128) i16 in ANY
    out_len_ref,  # (1, 8, 128) i32  (row 0 used)
    out_ref,  # (1, block_size, 128) i8
    err_ref,  # (1, 8, 128) i32
    W_s,  # scratch (R, 128) i32: routing words, then S pointers at moff
    rank_s,  # scratch (R, 128) i32: ranks -> fill keys -> hop accumulator
    V_s,  # scratch (R, 128) i16: the 16-bit value plane (rides every move)
    sem,  # DMA semaphore
    *,
    cap: int,
    block_size: int,
    resolve_rounds: int,
):
    """Two-plane route for 32 K < bs <= 64 K (or force-wide tests).

    Same pipeline as :func:`_route_kernel` with three structural changes
    that keep 64 K inside the VMEM budget (the single-plane kernel's
    staged form needs ~200 MB there):

    - 16-bit values ride the routing moves as a second plane (the
      encoder's payload-rides-the-route pattern) instead of living inside
      the token word, freeing 17 bits for dst.
    - Compact/expand are STAGING-FREE (pallas_encode._route_tokens):
      ascending/descending chunk order reads partner rows from chunks not
      yet updated this round and recomputes the partner's move decision —
      no 2x-cap staging buffer.
    - The resolve S-plane lives at row offset ``moff = R - bs`` inside
      W_s; per-delta gather windows read at ``moff + base - delta*128 >=
      moff - CH >= 0`` (cap > bs guarantees the margin), so no separate
      staged source plane exists. Junk reads below moff are masked by the
      delta-match condition — consuming rows always read >= moff.
    """
    bs = block_size
    g = pl.program_id(0)
    CH = _pick_chunk_wide(bs)
    cap_r = (cap + CH - 1) // CH * CH
    R = cap_r  # sources past cap_r are masked, not padded
    NCC = cap_r // CH
    NCB = bs // CH
    nq = bs // LANES
    moff = R - bs
    assert moff >= CH, (cap, bs, CH)
    out_len = out_len_ref[0, 0:1, :]  # (1, 128)

    def dma(src, dst):
        cp = pltpu.make_async_copy(src, dst, sem)
        cp.start()
        cp.wait()

    def ch_iota(n):
        return jax.lax.broadcasted_iota(jnp.int32, (n, LANES), 0)

    dma(tokens_hbm.at[g], W_s.at[pl.ds(0, cap)])
    dma(vals_hbm.at[g], V_s.at[pl.ds(0, cap)])
    if R > cap:
        W_s[cap:R] = jnp.zeros((R - cap, LANES), jnp.int32)
        rank_s[cap:R] = jnp.zeros((R - cap, LANES), jnp.int32)

    # ---- Phase 1: occupancy ranks, one ascending chunk-carry pass. ----
    def occ_rank(c, tot):
        base = c * CH
        W = W_s[pl.ds(base, CH)]
        occ_i = ((W & OCCUPIED) != 0).astype(jnp.int32)
        x = occ_i
        sh = 1
        while sh < CH:
            x = x + jnp.concatenate(
                [jnp.zeros((sh, LANES), jnp.int32), x[: CH - sh]]
            )
            sh <<= 1
        incl = x + tot
        rank_s[pl.ds(base, CH)] = jnp.where(occ_i != 0, incl - 1, 0)
        return incl[CH - 1 : CH]

    jax.lax.fori_loop(
        0, NCC, occ_rank, jnp.zeros((1, LANES), jnp.int32)
    )

    # ---- Phase 2: compact up, LSB-first, staging-free (ascending chunk
    # order reads sources from not-yet-updated rows; reads past cap_r land
    # in the zeroed pad chunk). V rides the same selects. Rounds unroll in
    # Python so every shift is STATIC: sub-chunk shifts become register
    # slices of the own + successor chunk (Mosaic cannot prove dynamic
    # sublane starts aligned for the 16-sublane int16 tile), and
    # whole-chunk shifts read at chunk-index-aligned offsets.
    nbit = (cap_r - 1).bit_length()
    conflict_acc = jnp.zeros((1, LANES), jnp.int32)
    for k in range(nbit):
        sh = 1 << k

        def upd(c, conflict, k=k, sh=sh):
            base = c * CH
            W = W_s[pl.ds(base, CH)]
            rank = rank_s[pl.ds(base, CH)]
            V = V_s[pl.ds(base, CH)]
            occ = (W & OCCUPIED) != 0
            crows = base + ch_iota(CH)
            move = occ & ((((crows - rank) >> k) & 1) == 1)
            if sh < CH:
                nb_ = jnp.minimum(c + 1, NCC - 1) * CH
                nW = jnp.concatenate([W[sh:], W_s[pl.ds(nb_, CH)][:sh]])
                nR = jnp.concatenate(
                    [rank[sh:], rank_s[pl.ds(nb_, CH)][:sh]]
                )
                nV = jnp.concatenate([V[sh:], V_s[pl.ds(nb_, CH)][:sh]])
            else:
                src = jnp.minimum(c + sh // CH, NCC - 1) * CH
                nW = W_s[pl.ds(src, CH)]
                nR = rank_s[pl.ds(src, CH)]
                nV = V_s[pl.ds(src, CH)]
            srows = crows + sh
            occ_s = (nW & OCCUPIED) != 0
            # Source reads clamp to the last chunk; rows past cap_r read
            # junk there and are masked (no tokens exist at/past cap_r).
            arriving = (
                occ_s
                & (srows < cap_r)
                & ((((srows - nR) >> k) & 1) == 1)
            )
            staying = occ & ~move
            conflict = conflict | jnp.any(
                arriving & staying, axis=0, keepdims=True
            ).astype(jnp.int32)
            W_s[pl.ds(base, CH)] = jnp.where(
                arriving, nW, jnp.where(staying, W, 0)
            )
            rank_s[pl.ds(base, CH)] = jnp.where(
                arriving, nR, jnp.where(staying, rank, 0)
            )
            V_s[pl.ds(base, CH)] = jnp.where(
                arriving, nV, jnp.where(staying, V, 0)
            )
            return conflict

        conflict_acc = jax.lax.fori_loop(0, NCC, upd, conflict_acc)

    # ---- Phase 3: expand down over [0, bs), MSB-first, staging-free
    # (descending order; source rows [base-sh, base-sh+CH) sit in
    # not-yet-updated chunks; the chunk-0 sub-shift predecessor is a
    # masked register select instead of a snapshot buffer). Tokens end
    # compact inside [0, ntok <= bs): every token emits >= 1 output byte.
    max_bit = (bs - 1).bit_length() - 1
    for j in range(max_bit + 1):
        sh = 1 << (max_bit - j)

        def upd(i, conflict, sh=sh):
            c = NCB - 1 - i
            base = c * CH
            W = W_s[pl.ds(base, CH)]
            V = V_s[pl.ds(base, CH)]
            occ = (W & OCCUPIED) != 0
            crows = base + ch_iota(CH)
            dst = (W >> WDST_SHIFT) & WDST_MASK
            move = occ & (dst - crows >= sh)
            if sh < CH:
                pb = jnp.maximum(c - 1, 0) * CH
                alive = base > 0  # chunk 0 has no rows above it
                pW = jnp.where(alive, W_s[pl.ds(pb, CH)], 0)
                pV = jnp.where(alive, V_s[pl.ds(pb, CH)], 0)
                mW = jnp.concatenate([pW[CH - sh :], W[: CH - sh]])
                mV = jnp.concatenate([pV[CH - sh :], V[: CH - sh]])
            else:
                mb = jnp.maximum(c - sh // CH, 0) * CH
                mW = W_s[pl.ds(mb, CH)]
                mV = V_s[pl.ds(mb, CH)]
            occ_m = (mW & OCCUPIED) != 0
            mdst = (mW >> WDST_SHIFT) & WDST_MASK
            arriving = (
                (crows >= sh) & occ_m & (mdst - (crows - sh) >= sh)
            )
            staying = occ & ~move
            conflict = conflict | jnp.any(
                arriving & staying, axis=0, keepdims=True
            ).astype(jnp.int32)
            W_s[pl.ds(base, CH)] = jnp.where(
                arriving, mW, jnp.where(staying, W, 0)
            )
            V_s[pl.ds(base, CH)] = jnp.where(
                arriving, mV, jnp.where(staying, V, 0)
            )
            return conflict

        conflict_acc = jax.lax.fori_loop(0, NCB, upd, conflict_acc)
    err = jnp.where(conflict_acc != 0, ERR_ROUTE_CONFLICT, 0)  # (1, 128)

    # ---- Phase 4: covering-token fill, one ascending chunk-carry pass of
    # the paired latest-token scan (key = (token_row << 1) | kind; the
    # value plane rides the same selects). A plain prefix-max equals the
    # 64-row-bounded fill on valid streams; invalid gaps surface as bad
    # offsets below, exactly like the staged form.
    def fill(c, carry):
        ck, cv = carry
        base = c * CH
        W = W_s[pl.ds(base, CH)]
        V = V_s[pl.ds(base, CH)]
        crows = base + ch_iota(CH)
        occ = (W & OCCUPIED) != 0
        K = jnp.where(occ, (crows << 1) | (W & 1), -1)
        sh = 1
        while sh < CH:
            Ks = jnp.concatenate(
                [jnp.full((sh, LANES), -1, jnp.int32), K[: CH - sh]]
            )
            Vs = jnp.concatenate(
                [jnp.zeros((sh, LANES), jnp.int16), V[: CH - sh]]
            )
            take = Ks > K
            K = jnp.where(take, Ks, K)
            V = jnp.where(take, Vs, V)
            sh <<= 1
        take = ck > K
        K = jnp.where(take, ck, K)
        V = jnp.where(take, cv, V)
        rank_s[pl.ds(base, CH)] = K
        V_s[pl.ds(base, CH)] = V
        return (K[CH - 1 : CH], V[CH - 1 : CH])

    jax.lax.fori_loop(
        0, NCB, fill,
        (
            jnp.full((1, LANES), -1, jnp.int32),
            jnp.zeros((1, LANES), jnp.int16),
        ),
    )

    # ---- Phase 5: source pointers + transpose into the margin region.
    # Literal output rows are their own covering token (every literal byte
    # has a token), so the literal byte is the covering value.
    def sbad(c, bad_acc):
        base = c * CH
        K = rank_s[pl.ds(base, CH)]
        Vv = V_s[pl.ds(base, CH)].astype(jnp.int32) & 0xFFFF
        crows = base + ch_iota(CH)
        in_range = crows < out_len
        covered = K >= 0
        k_lit = covered & ((K & 1) == KIND_LIT)
        is_lit = k_lit & ((K >> 1) == crows)
        S = jnp.where(is_lit, -(Vv & 0xFF) - 1, crows - (Vv + 1))
        bad = in_range & ~is_lit & (
            ~covered | k_lit | (S >= crows) | (S < 0)
        )
        bad_acc = bad_acc | jnp.any(bad, axis=0, keepdims=True).astype(
            jnp.int32
        )
        rank_s[pl.ds(base, CH)] = jnp.where(bad | ~in_range, -1, S)
        return bad_acc

    bad_acc = jax.lax.fori_loop(
        0, NCB, sbad, jnp.zeros((1, LANES), jnp.int32)
    )
    err = err | jnp.where(bad_acc != 0, ERR_BAD_OFFSET, 0)

    def tr(q, _):
        x = rank_s[pl.ds(q * LANES, LANES)]  # [pos residue, block]
        W_s[pl.ds(moff + q * LANES, LANES)] = jnp.transpose(x)
        return 0

    jax.lax.fori_loop(0, nq, tr, 0)

    # ---- Phase 6: single-pass ascending resolve in [block, residue]
    # layout at W_s[moff:moff+bs) — same algorithm as the narrow kernel
    # (see _route_kernel): ascending 128-position chunks keep earlier
    # chunks fully resolved, so a span-4 sweep fetches final bytes for
    # cross-chunk pointers and 7 pointer-doubling rounds close the
    # intra-chunk chains. ``resolve_rounds`` kept for API compatibility.
    del resolve_rounds
    zzl = jnp.zeros((LANES, LANES), jnp.int32)

    def resolve_chunk(q, _):
        P = W_s[pl.ds(moff + q * LANES, LANES)]
        ptr = jnp.maximum(P, 0)
        rs = ptr & (LANES - 1)
        dist = (zzl + q) - (ptr >> 7)
        cross = (P >= 0) & (dist > 0)
        maxd = jnp.max(jnp.where(cross, dist, 0))

        def sweep(i, b):
            d0 = 4 * i + 1
            g = [
                jnp.take_along_axis(
                    W_s[
                        pl.ds(
                            moff
                            + jnp.clip(q - (d0 + j), 0, nq - 1) * LANES,
                            LANES,
                        )
                    ],
                    rs,
                    axis=1,
                )
                for j in range(4)
            ]
            loc = dist - d0
            odd = (loc & 1) != 0
            got = jnp.where(
                (loc & 2) != 0,
                jnp.where(odd, g[3], g[2]),
                jnp.where(odd, g[1], g[0]),
            )
            return jnp.where((loc >= 0) & (loc < 4), got, b)

        b = jax.lax.fori_loop(0, (maxd + 3) >> 2, sweep, zzl)
        P = jnp.where(cross, b, P)

        def jump(_, P):
            got = jnp.take_along_axis(
                P, jnp.maximum(P, 0) & (LANES - 1), axis=1
            )
            return jnp.where(P >= 0, got, P)

        P = jax.lax.fori_loop(0, 7, jump, P)
        W_s[pl.ds(moff + q * LANES, LANES)] = P
        return 0

    jax.lax.fori_loop(0, nq, resolve_chunk, 0)

    # ---- Phase 7: back-transpose + int8 output.
    def outw(q, unres):
        x = W_s[pl.ds(moff + q * LANES, LANES)]  # [block, residue]
        S = jnp.transpose(x)  # [pos residue, block]
        crows = q * LANES + ch_iota(LANES)
        in_range = crows < out_len
        unres = unres | jnp.any(
            in_range & (S >= 0), axis=0, keepdims=True
        ).astype(jnp.int32)
        out_ref[0, pl.ds(q * LANES, LANES), :] = jnp.where(
            in_range, (-S - 1) & 0xFF, 0
        ).astype(jnp.int8)
        return unres

    unres = jax.lax.fori_loop(0, nq, outw, jnp.zeros((1, LANES), jnp.int32))
    err = err | jnp.where(unres != 0, ERR_UNRESOLVED, 0)
    err_ref[0] = jnp.broadcast_to(err, (SUBLANES, LANES))


# ---------------------------------------------------------------------------
# Host-callable wrapper.
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("block_size", "interpret", "resolve_rounds", "wide"),
)
def decode_blocks_pallas(
    comp: jax.Array,  # uint8[num_blocks, cap] — num_blocks multiple of 128
    comp_len: jax.Array,  # int32[num_blocks]
    out_len: jax.Array,  # int32[num_blocks]
    *,
    block_size: int = 4096,
    interpret: bool = False,
    resolve_rounds: int = 17,
    wide: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Decode a batch of blocks with the lane-parallel kernels.

    Block sizes above 32768 (up to the format's 64 KB max) take the wide
    two-plane token path automatically; ``wide=True`` forces it at small
    sizes (the packing formats differ, the pipeline is the same — that is
    how CI covers the 64 K path without 64 K interpret runtimes).

    Returns (out uint8[num_blocks, block_size], err int32[num_blocks]).
    """
    if wide is None:
        wide = block_size > MAX_PALLAS_BLOCK
    max_bs = MAX_PALLAS_BLOCK_WIDE if wide else MAX_PALLAS_BLOCK
    if block_size > max_bs:
        raise ValueError(f"pallas decoder supports block_size <= {max_bs}")
    nb, cap = comp.shape
    assert nb % LANES == 0, "pad the batch to a multiple of 128 blocks"
    assert cap % LANES == 0
    assert block_size % LANES == 0, "block_size must be a multiple of 128"
    chunk = LANES

    def one_batch(comp_b, clen_b, olen_b):
        # [G*128, cap] u8 -> [cap, G, 128] i32. G = 8 for full batches; a
        # trimmed tail batch (small inputs) runs fewer lane groups.
        G = comp_b.shape[0] // LANES
        comp_t = comp_b.astype(jnp.int32).T.reshape(cap, G, LANES)
        clen_t = clen_b.reshape(G, LANES)
        olen_t = olen_b.reshape(G, LANES)

        dfa_out_shape = [
            jax.ShapeDtypeStruct((cap, G, LANES), jnp.int32),
            jax.ShapeDtypeStruct((G, LANES), jnp.int32),
        ]
        dfa_out_specs = [
            pl.BlockSpec(
                (chunk, G, LANES), lambda g: (g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (G, LANES), lambda g: (0, 0), memory_space=pltpu.VMEM
            ),
        ]
        if wide:
            dfa_out_shape.insert(
                1, jax.ShapeDtypeStruct((cap, G, LANES), jnp.int16)
            )
            dfa_out_specs.insert(
                1,
                pl.BlockSpec(
                    (chunk, G, LANES), lambda g: (g, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            )
        dfa_res = pl.pallas_call(
            functools.partial(
                _dfa_kernel, chunk=chunk, cap=cap, bias=0,
                block_size=block_size, wide=wide,
            ),
            grid=(cap // chunk,),
            in_specs=[
                pl.BlockSpec(
                    (chunk, G, LANES), lambda g: (g, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (G, LANES), lambda g: (0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (G, LANES), lambda g: (0, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=dfa_out_specs,
            out_shape=dfa_out_shape,
            scratch_shapes=[pltpu.VMEM((7, G, LANES), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=126 * 1024 * 1024,
            ),
            interpret=interpret,
        )(comp_t, clen_t, olen_t)
        if wide:
            tokens, vals, _err_dfa = dfa_res
        else:
            tokens, _err_dfa = dfa_res

        # [cap, G, 128] -> groups of [cap, 128]
        tokens_g = tokens.transpose(1, 0, 2)  # (G, cap, 128)
        olen_g = jnp.broadcast_to(
            olen_t[:, None, :], (G, SUBLANES, LANES)
        )  # per group, row 0 used

        route_out_specs = [
            pl.BlockSpec(
                (1, block_size, LANES), lambda g: (g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, SUBLANES, LANES), lambda g: (g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        route_out_shape = [
            jax.ShapeDtypeStruct((G, block_size, LANES), jnp.int8),
            jax.ShapeDtypeStruct((G, SUBLANES, LANES), jnp.int32),
        ]
        if wide:
            CH = _pick_chunk_wide(block_size)
            cap_r = (cap + CH - 1) // CH * CH
            R = cap_r
            out_g, err_g = pl.pallas_call(
                functools.partial(
                    _route_kernel_wide, cap=cap, block_size=block_size,
                    resolve_rounds=resolve_rounds,
                ),
                grid=(G,),
                in_specs=[
                    # tokens/vals stay in HBM; the kernel DMAs group g in.
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(
                        (1, SUBLANES, LANES), lambda g: (g, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=route_out_specs,
                out_shape=route_out_shape,
                scratch_shapes=[
                    pltpu.VMEM((R, LANES), jnp.int32),  # W_s
                    pltpu.VMEM((R, LANES), jnp.int32),  # rank_s
                    pltpu.VMEM((R, LANES), jnp.int16),  # V_s
                    pltpu.SemaphoreType.DMA,
                ],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=126 * 1024 * 1024,
                ),
                interpret=interpret,
            )(tokens_g, vals.transpose(1, 0, 2), olen_g)
        else:
            out_g, err_g = pl.pallas_call(
                functools.partial(
                    _route_kernel, cap=cap, block_size=block_size,
                    resolve_rounds=resolve_rounds,
                ),
                grid=(G,),
                in_specs=[
                    # tokens stay in HBM; the kernel DMAs group g into W_s.
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(
                        (1, SUBLANES, LANES), lambda g: (g, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=route_out_specs,
                out_shape=route_out_shape,
                scratch_shapes=[
                    # W_s / rank_s carry a zeroed pad chunk above cap: the
                    # staging-free compact clamps source reads into it.
                    pltpu.VMEM((cap + _pick_chunk(cap), LANES), jnp.int32),
                    pltpu.VMEM(
                        (max(cap, block_size) + _pick_chunk(cap), LANES),
                        jnp.int32,
                    ),
                    pltpu.VMEM((block_size, LANES), jnp.int32),
                    # C_s: expand chunk-0 snapshot behind a zeros pad
                    # (the single-pass resolve needs no staging).
                    pltpu.VMEM((2 * _pick_chunk(block_size), LANES), jnp.int32),
                    pltpu.SemaphoreType.DMA,
                ],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=126 * 1024 * 1024,
                ),
                interpret=interpret,
            )(tokens_g, olen_g)

        # (G, bs, 128) -> [G*128, bs] u8 ; err (G, 8, 128) row 0 -> [G*128]
        out_b = out_g.transpose(0, 2, 1).reshape(G * LANES, block_size)
        err_b = err_g[:, 0, :].reshape(G * LANES)
        # merge DFA-side errors (length/overrun/offset found during parse)
        err_b = err_b | _err_dfa.reshape(G * LANES)
        return out_b.astype(jnp.uint8), err_b

    # Full 1024-block batches iterate on-device (lax.map); a trailing
    # partial batch (whole 128-lane groups) runs once with G < 8.
    full = nb // DFA_LANES * DFA_LANES
    outs, errs = [], []
    if full:
        comp_r = comp[:full].reshape(-1, DFA_LANES, cap)
        clen_r = comp_len[:full].reshape(-1, DFA_LANES)
        olen_r = out_len[:full].reshape(-1, DFA_LANES)
        out_f, err_f = jax.lax.map(
            lambda t: one_batch(*t), (comp_r, clen_r, olen_r)
        )
        outs.append(out_f.reshape(full, block_size))
        errs.append(err_f.reshape(full))
    if nb > full:
        out_t, err_t = one_batch(comp[full:], comp_len[full:], out_len[full:])
        outs.append(out_t)
        errs.append(err_t)
    if len(outs) == 1:
        return outs[0], errs[0]
    return jnp.concatenate(outs), jnp.concatenate(errs)


def decode_blocks_pallas_sharded(
    comp,
    comp_len,
    out_len,
    mesh,
    *,
    block_size: int,
    interpret: bool = False,
):
    """Multi-device wrapper: pallas_call does not auto-partition under jit,
    so shard the block axis explicitly with shard_map (each device runs the
    kernels on its local 1024-block batches)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from pim_compression_tpu.parallel.mesh import BLOCK_AXIS

    fn = functools.partial(
        decode_blocks_pallas, block_size=block_size, interpret=interpret
    )
    sharded = shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(BLOCK_AXIS), P(BLOCK_AXIS), P(BLOCK_AXIS)),
        out_specs=(P(BLOCK_AXIS), P(BLOCK_AXIS)),
        check_vma=False,
    )
    return jax.jit(sharded)(comp, comp_len, out_len)
