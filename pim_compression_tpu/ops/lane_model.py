"""NumPy model of the lane-parallel TPU decode pipeline (DESIGN.md).

This is the executable specification for the Pallas kernels in
``pallas_decode.py``: identical stage structure, identical packings, written
with whole-array NumPy ops so every stage can be validated (and its
invariants asserted) without TPU hardware. The stages:

1. parse DFA      — lockstep byte state machine over [position, lane]
2. butterfly route — MSB-first monotone routing of literal bytes + copy
                     records from comp-space rows to output-space rows
3. record fill    — packed prefix-max fills copy interiors
4. chain resolve  — pointer doubling over copy rows

Lane layout: one block per lane. All arrays are [rows, lanes].
"""

from __future__ import annotations

import numpy as np

# Packing (fits int32 for block_size <= 32768, the format's default,
# dpu_snappy.c:100): token = OCCUPIED | dst << DST_SHIFT | kind << KIND_SHIFT
# | value. value (15 bits) stores the literal byte or offset-1 (so offset ==
# 32768 fits); kind is 1 bit (copy = 0 so an "uncovered row" prefix-fill of
# -1 reads as non-copy); dst is 15 bits; OCCUPIED is the sign bit.
OCCUPIED = -(1 << 31)
DST_SHIFT = 16
KIND_SHIFT = 15
VALUE_MASK = (1 << 15) - 1
KIND_LIT = 1
KIND_COPY = 0

# DFA modes.
TAG, EXT, LIT, OFF = 0, 1, 2, 3

# Error flag bits (superset of ops.decode flags).
ERR_LENGTH_MISMATCH = 1
ERR_BAD_OFFSET = 2
ERR_ELEMENT_OVERRUN = 4
ERR_ROUTE_CONFLICT = 8
ERR_UNRESOLVED = 16


def parse_dfa(
    comp: np.ndarray,  # int32 [cap, lanes] byte values
    comp_len: np.ndarray,  # int32 [lanes]
    out_len: np.ndarray,  # int32 [lanes]
    block_size: int,
    bias: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Lockstep parse. Returns (tokens [cap, lanes] int32, err [lanes])."""
    cap, lanes = comp.shape
    mode = np.zeros(lanes, np.int32)
    cnt = np.zeros(lanes, np.int32)
    acc = np.zeros(lanes, np.int32)
    shift = np.zeros(lanes, np.int32)
    length = np.zeros(lanes, np.int32)
    out_cur = np.zeros(lanes, np.int32)
    err = np.zeros(lanes, np.int32)
    tokens = np.zeros((cap, lanes), np.int32)

    for p in range(cap):
        b = comp[p]
        active = p < comp_len

        is_tag = active & (mode == TAG)
        is_ext = active & (mode == EXT)
        is_lit = active & (mode == LIT)
        is_off = active & (mode == OFF)

        kind = b & 3
        lf = b >> 2

        # --- TAG transitions ---
        t_lit_inline = is_tag & (kind == 0) & (lf < 60)
        t_lit_ext = is_tag & (kind == 0) & (lf >= 60)
        t_copy1 = is_tag & (kind == 1)
        t_copy2 = is_tag & (kind == 2)
        t_copy4 = is_tag & (kind == 3)

        n_mode = mode.copy()
        n_cnt = cnt.copy()
        n_acc = acc.copy()
        n_shift = shift.copy()
        n_len = length.copy()

        n_mode = np.where(t_lit_inline, LIT, n_mode)
        n_cnt = np.where(t_lit_inline, lf + 1, n_cnt)
        n_len = np.where(t_lit_inline, lf + 1, n_len)

        n_mode = np.where(t_lit_ext, EXT, n_mode)
        n_cnt = np.where(t_lit_ext, lf - 59, n_cnt)
        n_acc = np.where(t_lit_ext, 0, n_acc)
        n_shift = np.where(t_lit_ext, 0, n_shift)

        any_copy = t_copy1 | t_copy2 | t_copy4
        n_mode = np.where(any_copy, OFF, n_mode)
        n_acc = np.where(t_copy1, (b >> 5) << 8, np.where(any_copy, 0, n_acc))
        n_shift = np.where(any_copy, 0, n_shift)
        n_cnt = np.where(t_copy1, 1, np.where(t_copy2, 2, np.where(t_copy4, 4, n_cnt)))
        n_len = np.where(
            t_copy1, ((b >> 2) & 7) + 4, np.where(t_copy2 | t_copy4, lf + 1, n_len)
        )

        # --- EXT: accumulate long-literal length ---
        ext_byte = np.where((is_ext) & (shift < 24), b << np.minimum(shift, 24), 0)
        ext_clamp = is_ext & (shift >= 24) & (b > 0)
        err = np.where(ext_clamp, err | ERR_ELEMENT_OVERRUN, err)
        n_acc = np.where(is_ext, acc + ext_byte, n_acc)
        n_shift = np.where(is_ext, shift + 8, n_shift)
        n_cnt = np.where(is_ext, cnt - 1, n_cnt)
        ext_done = is_ext & (cnt == 1)
        n_len = np.where(ext_done, n_acc + 1, n_len)
        n_mode = np.where(ext_done, LIT, n_mode)
        n_cnt = np.where(ext_done, n_acc + 1, n_cnt)

        # --- LIT: route this literal data byte to its output row ---
        lit_ok = is_lit & (out_cur < out_len)
        err = np.where(is_lit & ~lit_ok, err | ERR_LENGTH_MISMATCH, err)
        tokens[p] = np.where(
            lit_ok,
            OCCUPIED | ((bias + out_cur) << DST_SHIFT) | (KIND_LIT << KIND_SHIFT) | b,
            0,
        )
        n_cnt = np.where(is_lit, cnt - 1, n_cnt)
        n_mode = np.where(is_lit & (cnt == 1), TAG, n_mode)

        # --- OFF: accumulate offset; emit copy record when complete ---
        off_byte = np.where(is_off & (shift < 24), b << np.minimum(shift, 24), 0)
        off_clamp = is_off & (shift >= 24) & (b > 0)
        n_acc = np.where(is_off, acc + off_byte, n_acc)
        n_shift = np.where(is_off, shift + 8, n_shift)
        n_cnt = np.where(is_off, cnt - 1, n_cnt)
        off_done = is_off & (cnt == 1)
        offset = n_acc
        bad_off = off_done & (
            (offset <= 0) | (offset > out_cur) | (offset > block_size) | off_clamp
        )
        err = np.where(bad_off, err | ERR_BAD_OFFSET, err)
        copy_ok = off_done & ~bad_off & (out_cur < out_len)
        err = np.where(off_done & (out_cur + length > out_len), err | ERR_LENGTH_MISMATCH, err)
        tokens[p] = np.where(
            copy_ok,
            OCCUPIED
            | ((bias + out_cur) << DST_SHIFT)
            | (KIND_COPY << KIND_SHIFT)
            | ((offset - 1) & VALUE_MASK),
            tokens[p],
        )
        n_mode = np.where(off_done, TAG, n_mode)

        adv = np.where(off_done, length, 0)
        out_cur = np.where(is_lit, out_cur + 1, out_cur + adv)

        mode, cnt, acc, shift, length = n_mode, n_cnt, n_acc, n_shift, n_len

    err = np.where((mode != TAG) & (comp_len > 0), err | ERR_ELEMENT_OVERRUN, err)
    err = np.where(out_cur != out_len, err | ERR_LENGTH_MISMATCH, err)
    return tokens, err


def butterfly_route(
    tokens: np.ndarray, nrows: int, err: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Move each token from its source row to its dst row: compact-then-expand.

    Plain greedy bit-fixing of a monotone partial permutation collides
    (tokens overtake each other), but two structured phases are provably
    conflict-free and order-preserving:

    1. **Compact up, LSB-first.** Each token's target is its rank (prefix
       count of tokens above it). Upward distances ``u_i = s_i - i`` are
       nondecreasing in token order, and for x >= y top-bits(x) >= top-bits(y)
       implies ``(u_j & m) - (u_i & m) <= u_j - u_i`` for any low-bit mask m,
       which keeps inter-token spacing >= rank spacing every round.
    2. **Expand down, MSB-first.** From the compacted prefix, downward
       distances ``d_i - i`` are nondecreasing (d strictly increasing), and
       top-bits monotonicity gives spacing >= rank spacing again.

    The move condition needs only the carried rank / destination and the
    current row, so tokens route with two int32 arrays and shifted selects —
    no gathers. Conflicts are still *detected* and flagged (invariant check).
    """
    cap, lanes = tokens.shape
    W = tokens.copy()
    rows = np.arange(cap, dtype=np.int32)[:, None]

    occupied = (W & OCCUPIED) != 0
    rank = np.where(occupied, np.cumsum(occupied, axis=0) - 1, 0).astype(np.int32)

    # Phase 1: compact up within the [0, cap) source rows, LSB-first.
    # Move up 2^k iff bit k of (row - rank).
    for k in range(max(1, (cap - 1)).bit_length()):
        sh = 1 << k
        if sh >= cap:
            break
        occ = (W & OCCUPIED) != 0
        move = occ & ((((rows - rank) >> k) & 1) == 1)
        moved_W = np.zeros_like(W)
        moved_W[:-sh] = np.where(move, W, 0)[sh:]
        moved_rank = np.zeros_like(rank)
        moved_rank[:-sh] = np.where(move, rank, 0)[sh:]
        arriving = (moved_W & OCCUPIED) != 0
        staying = occ & ~move
        conflict = arriving & staying
        if conflict.any():
            err = err | np.where(conflict.any(axis=0), ERR_ROUTE_CONFLICT, 0)
        W = np.where(arriving, moved_W, np.where(staying, W, 0))
        rank = np.where(arriving, moved_rank, np.where(staying, rank, 0))

    # Hand off: every token yields >= 1 output byte, so the compacted prefix
    # holds at most nrows tokens; expand in an [nrows] array with bias-free
    # destinations (mirrors the kernel's two-hop structure).
    W2 = np.zeros((nrows, lanes), np.int32)
    W2[: min(cap, nrows)] = W[: min(cap, nrows)]
    W = W2
    rows = np.arange(nrows, dtype=np.int32)[:, None]

    # Phase 2: expand down, MSB-first. Move down 2^k iff dst - row >= 2^k.
    for k in range(max(1, (nrows - 1)).bit_length() - 1, -1, -1):
        sh = 1 << k
        occ = (W & OCCUPIED) != 0
        dst = (W >> DST_SHIFT) & 0x7FFF
        move = occ & (dst - rows >= sh)
        moved_W = np.zeros_like(W)
        moved_W[sh:] = np.where(move, W, 0)[:-sh]
        arriving = (moved_W & OCCUPIED) != 0
        staying = occ & ~move
        conflict = arriving & staying
        if conflict.any():
            err = err | np.where(conflict.any(axis=0), ERR_ROUTE_CONFLICT, 0)
        W = np.where(arriving, moved_W, np.where(staying, W, 0))
    return W, err


def fill_and_resolve(
    W: np.ndarray,
    bias: int,
    block_size: int,
    out_len: np.ndarray,
    err: np.ndarray,
    max_rounds: int = 16,
) -> tuple[np.ndarray, np.ndarray]:
    """Fill copy interiors by prefix-max, then pointer-double the chains."""
    R = W[bias : bias + block_size]
    lanes = R.shape[1]
    rows = np.arange(block_size, dtype=np.int32)[:, None]

    occupied = (R & OCCUPIED) != 0
    kind = (R >> KIND_SHIFT) & 1
    value = R & VALUE_MASK

    # Prefix-max of (row << 16 | kind << 15 | value) over occupied rows:
    # every row learns its nearest preceding routed row (its covering
    # element), with the record's kind and value carried in the low 16 bits.
    # rows <= 32767 so rows << 16 stays within int31.
    packed = np.where(occupied, (rows << 16) | (R & 0xFFFF), -1)
    packed = np.maximum.accumulate(packed, axis=0)
    cov_kind = (packed >> KIND_SHIFT) & 1
    cov_value = packed & VALUE_MASK

    # Source pointers: literal rows already carry their byte; copy rows point
    # back by their covering offset.
    is_lit_row = occupied & (kind == KIND_LIT)
    lit_byte = np.where(is_lit_row, value & 0xFF, 0)
    S = np.where(is_lit_row, -(lit_byte + 1), rows - (cov_value + 1))
    in_range = rows < out_len[None, :]
    bad = in_range & (~is_lit_row) & ((cov_kind != KIND_COPY) | (S >= rows) | (S < 0))
    err = err | np.where(bad.any(axis=0), ERR_BAD_OFFSET, 0)
    S = np.where(bad | ~in_range, -1, S)

    for _ in range(max_rounds):
        if not (S >= 0).any():
            break
        hop = np.take_along_axis(S, np.clip(S, 0, block_size - 1), axis=0)
        S = np.where(S >= 0, hop, S)
    err = err | np.where((S >= 0).any(axis=0), ERR_UNRESOLVED, 0)
    out = (-S - 1).astype(np.uint8)
    return out, err


def decode_lanes(
    comp: np.ndarray,  # uint8 [lanes, cap]
    comp_len: np.ndarray,
    out_len: np.ndarray,
    block_size: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Full pipeline; returns (out [lanes, block_size] uint8, err [lanes])."""
    cap = comp.shape[1]
    bias = 0  # two-hop routing: destinations are plain output positions
    nrows = block_size
    comp_t = comp.T.astype(np.int32)
    tokens, err = parse_dfa(comp_t, comp_len, out_len, block_size, bias)
    W, err = butterfly_route(tokens, nrows, err)
    out, err = fill_and_resolve(W, bias, block_size, out_len, err)
    pos = np.arange(block_size, dtype=np.int32)[:, None]
    out = np.where(pos < out_len[None, :], out, 0)
    return out.T, err
