"""NumPy model of the lane-parallel TPU encode pipeline.

Executable spec for the Pallas encoder (mirror of ``lane_model.py`` for
decode). One block per lane; stages:

1. **Match search** — for each lag d in [1, window], shifted equality plus
   AND-doubling gives "run >= L from p" indicators for bucket lengths
   L in {4, 8, 16, 32, 64}; a packed max-fold keeps the longest bucket at
   the nearest lag. O(window) vector passes, no hash table, no gathers —
   and *exhaustive* within the window (better candidates than the
   reference's collision-prone probe loop, snappy_compress.c:333-348).
2. **Greedy parse scan** — tiny lockstep state machine (next-accept cursor)
   over positions; emits accept/copy/literal decisions.
3. **Vector layout** — literal-run detection, per-element emit sizes,
   cumsum to compressed offsets, covering fills; every token's destination
   is known analytically.
4. **Token routing** — four channels (header bytes 0..2 + literal data),
   each monotone, routed with the same conflict-free compact-then-expand
   schedule as decode, then OR-merged into the compressed bytes.

Emitted streams decode with any conforming decoder; lengths are bucketed
(emitting a shorter copy than the true match is always valid).
"""

from __future__ import annotations

import numpy as np

BUCKETS = (64, 32, 16, 8, 4)  # descending


def _shift_down(x: np.ndarray, sh: int) -> np.ndarray:
    out = np.zeros_like(x)
    if sh < x.shape[0]:
        out[sh:] = x[:-sh]
    return out


def _shift_up(x: np.ndarray, sh: int) -> np.ndarray:
    out = np.zeros_like(x)
    if sh < x.shape[0]:
        out[:-sh] = x[sh:]
    return out


def match_search(
    data: np.ndarray,  # int32 [bs, lanes]
    lens: np.ndarray,  # int32 [lanes]
    window: int,
    coarse_window: int = 0,
    coarse_step: int = 8,
) -> tuple[np.ndarray, np.ndarray]:
    """Returns (best_len [bs, lanes], best_off [bs, lanes]), bucketed.

    Lags in [1, window] are searched exhaustively. When ``coarse_window >
    window``, lags in (window, coarse_window] are sampled every
    ``coarse_step`` — full byte resolution, exact equality (no
    fingerprints), so every reported match is real; only matches at
    unsampled long distances are missed. On repetitive data a frequent
    substring occurs at many prior distances, so sampling recovers most of
    the long-range redundancy at ~1/step the cost of an exhaustive sweep.
    """
    bs, lanes = data.shape
    rows = np.arange(bs, dtype=np.int32)[:, None]
    valid = rows < lens[None, :]
    score = np.zeros((bs, lanes), np.int32)  # len << 16 | (0xFFFF - d)

    def sweep(score, d):
        eq = (data == _shift_down(data, d)) & valid & (rows >= d)
        run = {1: eq}
        # run[L][p] == True iff positions p..p+L-1 all match at lag d
        for L in (2, 4, 8, 16, 32, 64):
            run[L] = run[L // 2] & _shift_up(run[L // 2], L // 2)
        ml = np.zeros((bs, lanes), np.int32)
        for L in BUCKETS:
            ml = np.where((ml == 0) & run[L], L, ml)
        cand = np.where(ml >= 4, (ml << 16) | (0xFFFF - d), 0)
        return np.maximum(score, cand)

    for d in range(1, min(window, bs - 1) + 1):
        score = sweep(score, d)
    for d in range(
        window + coarse_step,
        min(coarse_window, bs - 1) + 1,
        coarse_step,
    ):
        score = sweep(score, d)
    best_len = score >> 16
    best_off = np.where(best_len > 0, 0xFFFF - (score & 0xFFFF), 0)
    return best_len, best_off


def granule_search(
    data: np.ndarray,  # int32 [bs, lanes]
    lens: np.ndarray,  # int32 [lanes]
    window: int,
    coarse_window: int,
) -> np.ndarray:
    """Phased-granule long-range search: ALL lags in (window, coarse_window]
    at ~1/8 the cost of an exhaustive byte sweep (executable spec for the
    round-2 Pallas kernel; supersedes the every-8th-lag sampling miss).

    Granule arrays at 8 byte-phases: G_r[i] = bytes[8i+r, 8i+r+8) held as
    two exact int32 words (no fingerprints). Comparing phase-0 granules at
    position-granule i against phase-r granules at granule i-D detects an
    8-byte match at byte position 8i with lag d = 8D - r; r sweeps the lag
    residues mod 8, D the coarse distance, both on arrays of bs/8 rows.
    Granule run-doubling turns consecutive hits into byte buckets
    {8,16,32,64}. Matches start only at granule-aligned positions (a long
    match loses at most 7 leading bytes). Returns a packed score array
    [bs, lanes] ((len << 16) | (0xFFFF - d), 0 where no match) mergeable
    with match_search's fold.
    """
    bs, lanes = data.shape
    ng = bs // 8
    if ng == 0 or coarse_window <= window:
        return np.zeros((bs, lanes), np.int32)
    # Packed 4-byte little-endian words at every byte position (int64 to
    # stay exact); W4[p] == W4[q] iff bytes p..p+3 == q..q+3.
    W4 = np.zeros((bs, lanes), np.int64)
    for b in range(4):
        w = data if b == 0 else _shift_up(data, b)
        W4 += w.astype(np.int64) << (8 * b)
    rows = np.arange(bs, dtype=np.int32)[:, None]
    # A granule at byte p is in-range iff its 8 bytes are within the block.
    tail_ok = rows + 8 <= lens[None, :]

    grow = np.arange(ng, dtype=np.int32)[:, None] * 8  # byte row per granule
    score = np.zeros((bs, lanes), np.int32)
    g_scores = np.zeros((ng, lanes), np.int32)
    lo0, hi0 = W4[0::8][:ng], W4[4::8][:ng]  # phase-0 granules
    ok0 = tail_ok[0::8][:ng]
    for r in range(8):
        # Phase-r granule words at granule j live at byte 8j + r.
        lo_r = np.zeros((ng, lanes), np.int64)
        hi_r = np.zeros((ng, lanes), np.int64)
        nr = (bs - r - 4) // 8 + 1 if bs - r >= 4 else 0
        lo_r[:nr] = W4[r::8][:nr]
        nr2 = (bs - r - 8) // 8 + 1 if bs - r >= 8 else 0
        hi_r[:nr2] = W4[r + 4 :: 8][:nr2]
        d_min = window + 1  # only lags the fine sweep does not reach
        D_lo = (d_min + r + 7) // 8
        D_hi = (coarse_window + r) // 8
        for D in range(max(D_lo, 1), D_hi + 1):
            d = 8 * D - r
            eq = (
                (lo0 == _shift_down(lo_r, D))
                & (hi0 == _shift_down(hi_r, D))
                & ok0
                & (grow >= d)
            )
            run = {1: eq.astype(np.int32)}
            for G in (2, 4, 8):
                run[G] = run[G // 2] & _shift_up(run[G // 2], G // 2)
            gl = np.zeros((ng, lanes), np.int32)
            for G in (8, 4, 2, 1):  # bytes = 8 * G
                gl = np.where((gl == 0) & (run[G] != 0), 8 * G, gl)
            cand = np.where(gl >= 8, (gl << 16) | (0xFFFF - d), 0)
            g_scores = np.maximum(g_scores, cand)
    score[0::8][:ng] = g_scores
    return score


def match_search_granular(
    data: np.ndarray,
    lens: np.ndarray,
    window: int,
    coarse_window: int = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """Fine exhaustive sweep + phased-granule long-range search, merged."""
    best_len, best_off = match_search(data, lens, window)
    fine = np.where(
        best_len > 0, (best_len << 16) | (0xFFFF - best_off), 0
    ).astype(np.int32)
    merged = np.maximum(fine, granule_search(data, lens, window, coarse_window))
    best_len = merged >> 16
    best_off = np.where(best_len > 0, 0xFFFF - (merged & 0xFFFF), 0)
    return best_len, best_off


# 32-bit odd multipliers for the wrapping hash ladder (kernel-faithful:
# int32 multiply wraps mod 2^32 on TPU and in NumPy's int64-masked emulation).
HASH_M1 = 0x9E3779B1
HASH_M2 = 0x85EBCA77
SORT_SENTINEL = np.int32(0x7FFFFFFF)


def _pack_word4(data: np.ndarray) -> np.ndarray:
    """Exact little-endian 4-byte words at every position, int32 (wrapping).

    W4[p] == W4[q] iff bytes p..p+3 == q..q+3 (the top byte uses the sign
    bit; equality is unaffected).
    """
    w = data.astype(np.int64)
    for b in (1, 2, 3):
        w = w + (_shift_up(data, b).astype(np.int64) << (8 * b))
    return (w & 0xFFFFFFFF).astype(np.uint32).view(np.int32).reshape(data.shape)


def _hash_ladder_step(h: np.ndarray, span: int) -> np.ndarray:
    """H[2L] from H[L]: wrapping int32 mix of a span-L-shifted pair.

    h covers bytes [p, p+span); the result covers [p, p+2*span). All
    arithmetic wraps mod 2^32 exactly like TPU int32 ops.
    """
    a = (h.view(np.uint32).astype(np.uint64) * HASH_M1) & 0xFFFFFFFF
    b = (_shift_up(h, span).view(np.uint32).astype(np.uint64) * HASH_M2) & 0xFFFFFFFF
    return (a ^ b).astype(np.uint32).view(np.int32)


def fold_key(h: np.ndarray, key_bits: int) -> np.ndarray:
    """Fold a 32-bit hash to the sort key the packed kernel uses.

    key_bits + position bits fill one int32, so the rung sort runs on a
    single packed array (the kernel's VMEM budget): 17+15 up to 32 KB
    blocks, 16+16 at 64 KB. Collisions only shadow candidates — the exact
    extension pass rejects false ones — and cost a measured ~0.001 ratio
    on xml vs exact keys at 17 bits (~0.004 at 16 bits / 64K, where
    prev-k's extra candidates absorb most shadowing).
    """
    return (h ^ (h >> (32 - key_bits))) & ((1 << key_bits) - 1)


def fold_key17(h: np.ndarray) -> np.ndarray:
    return fold_key(h, 17)


def packed_prev_lags(
    h: np.ndarray,  # int32 [bs, lanes] rung hash (full 32-bit)
    prev_k: int = 1,
    stride: int = 1,
    window: int = 0,
) -> list[np.ndarray]:
    """Packed-key candidate search (the Pallas kernel's exact semantics).

    Sorts ``(fold_key17(h) << 15) | pos`` as one int32 per position in
    *unsigned* order (the kernel flips the top bit so its signed bitonic
    compare matches). Equal-key17 runs are position-ordered, so the j-th
    sorted predecessor with an equal key is the j-th most recent prior
    occurrence (modulo fold collisions). There is no validity masking:
    keys of positions whose window crosses the block end hash pad zeros,
    which can only yield junk candidates the exact extension pass rejects
    (its ``min(lenacc, len - p, 64)`` cap floors them below the 4-byte
    emit minimum) — and the position field stays a permutation, which the
    kernel's sort-based unsort requires.

    ``stride=2`` sorts only even positions (half-density: the position
    field holds the compacted index ``p >> 1`` and lags scale back by 2),
    halving the sort's rows AND its stage count; odd positions get no
    candidate from this rung. Used for long rungs, where a miss only
    shortens a copy chain that the stride-1 rungs still seed.
    """
    bs, lanes = h.shape
    m0 = (bs + stride - 1) // stride
    pos_bits = 15 if m0 <= (1 << 15) else 16
    key = fold_key(h, 32 - pos_bits).astype(np.uint32).astype(np.int64)[::stride]
    m = key.shape[0]
    rows = np.arange(m, dtype=np.int64)[:, None]
    words = (key << pos_bits) | rows
    if window and window < m:
        # Chunk-local sort: the bitonic network stops at merge size
        # ``window`` (sorted rows, i.e. window*stride bytes of reach), so
        # candidates only come from the position's aligned window-group.
        # Cuts the kernel's stage count from log^2(m)/2 to the partial sum
        # at window; long-range redundancy is the longer rungs' job.
        assert m % window == 0
        sp = np.sort(words.reshape(m // window, window, lanes), axis=1)
        sp = sp.reshape(m, lanes)
        gstart = (rows // window) * window  # group base row
    else:
        sp = np.sort(words, axis=0)
        gstart = np.zeros((m, 1), np.int64)
    spos = sp & ((1 << pos_bits) - 1)
    skey = sp >> pos_bits
    out = []
    for j in range(1, prev_k + 1):
        same = (skey == _shift_down(skey, j)) & (rows - gstart >= j)
        lag_sorted = np.where(
            same, (spos - _shift_down(spos, j)) * stride, 0
        )
        cand_s = np.zeros((m, lanes), np.int64)
        np.put_along_axis(cand_s, spos, lag_sorted, axis=0)
        cand = np.zeros((bs, lanes), np.int64)
        cand[::stride] = cand_s
        out.append(np.where(cand > 0, cand, 0).astype(np.int32))
    return out


def nearest_prev_lags(
    key: np.ndarray,  # int32 [bs, lanes]; SORT_SENTINEL marks invalid rows
    prev_k: int = 1,
) -> list[np.ndarray]:
    """Sort-based candidate search: for each position, the lag to the
    nearest previous position with an equal key (and the k-th previous for
    prev_k > 1). Returns prev_k arrays [bs, lanes] of lags (0 = none).

    Spec for the Pallas bitonic rung sort: sorting (key, pos) pairs
    ascending groups equal keys into position-ordered runs, so sorted
    neighbor j steps back is the j-th most recent prior occurrence. The
    scatter back to position order is itself a sort of (pos << 16) | lag
    packed words (pos is the high field, so packed order == position
    order). Any comparison sort yields identical results because the
    (key, pos) pairs are unique — the kernel's bitonic network and this
    argsort agree exactly.
    """
    bs, lanes = key.shape
    order = np.argsort(key, axis=0, kind="stable").astype(np.int64)
    skey = np.take_along_axis(key, order, 0)
    srow = np.arange(bs)[:, None]
    out = []
    for j in range(1, prev_k + 1):
        same = (
            (skey == _shift_down(skey, j))
            & (skey != SORT_SENTINEL)
            & (srow >= j)
        )
        lag_sorted = np.where(same, order - _shift_down(order, j), 0)
        cand = np.zeros((bs, lanes), np.int64)
        np.put_along_axis(cand, order, lag_sorted, axis=0)
        out.append(cand.astype(np.int32))
    return out


def extend_match(
    W4: np.ndarray,  # int32 [bs, lanes] packed words
    lens: np.ndarray,
    cand: np.ndarray,  # int32 [bs, lanes] candidate lags (0 = none)
    max_len: int = 64,
    trust: np.ndarray | None = None,  # int [bs, lanes] trusted prefix bytes
) -> np.ndarray:
    """Exact byte-verified match length (0 or 4..max_len) for each candidate.

    Gathers the candidate's words at +4k offsets and XOR-compares against
    own words; a trailing partial word contributes its matching prefix
    bytes. Out-of-range gather rows are clamped — any accidental equality
    past the block end is cut by the final length cap. This is the spec for
    the Pallas extend kernel's take_along_axis rounds.

    ``trust`` (verify-after-parse mode) gives per-position trusted prefix
    byte counts (multiples of 4: the rung length of the winning candidate,
    capped at 16): those bytes are ASSUMED matched — word rounds with
    4k < trust are skipped, lenacc starts at trust — on the strength of
    the rung sort's key equality. Fold collisions (wrong assumptions) are
    caught after the greedy parse by :func:`verify_copy_prefix` at
    accepted copy positions only, and collision-hit blocks re-encode
    through the exact path. With ``trust=None`` every round runs exactly
    (identical to the pre-trust behavior).
    """
    bs, lanes = W4.shape
    rows = np.arange(bs, dtype=np.int64)[:, None]
    has = cand > 0
    idx = rows - cand
    trustv = (
        np.where(has, trust.astype(np.int64), 0)
        if trust is not None
        else np.zeros((bs, lanes), np.int64)
    )
    lenacc = trustv.copy()
    still = has.copy()
    own = W4
    for k in range(max_len // 4):
        active = still & (4 * k >= trustv)
        a = _shift_up(own, 4 * k) if k else own
        b = np.take_along_axis(W4, np.clip(idx + 4 * k, 0, bs - 1), axis=0)
        x = a ^ b
        weq = active & (x == 0)
        lenacc += np.where(weq, 4, 0)
        t = (
            ((x & 0xFF) == 0).astype(np.int64)
            + ((x & 0xFFFF) == 0).astype(np.int64)
            + ((x & 0xFFFFFF) == 0).astype(np.int64)
        )
        lenacc += np.where(active & ~weq, t, 0)
        still = np.where(active, weq, still)
    lenacc = np.minimum(lenacc, lens[None, :] - rows)
    el = np.where(has, np.minimum(lenacc, max_len), 0)
    return np.where(el >= 4, el, 0).astype(np.int32)


def verify_copy_prefix(
    W4: np.ndarray,  # int32 [bs, lanes] packed words
    lens: np.ndarray,
    is_copy: np.ndarray,  # accepted copy positions (greedy_parse output)
    best_len: np.ndarray,
    best_off: np.ndarray,
    vbytes: int = 16,
) -> np.ndarray:
    """Per-lane flag: any accepted copy whose first min(len, vbytes) bytes
    do NOT match its source — the verify-after-parse check that catches
    trusted-prefix fold collisions (spec for the emit kernel's verify
    pass). Bytes >= vbytes were verified exactly by the extension rounds,
    and bytes genuinely equal never flag, so checking min(len, vbytes)
    unconditionally (rather than min(len, trust)) is sound and needs no
    trust plumbing. ``lens`` is accepted for signature symmetry with the
    other spec passes but unused: the caller's best_len is already
    lens-clamped by extend_match, so no claimed byte reaches past the
    block. Returns bool [lanes]."""
    del lens
    bs, lanes = W4.shape
    rows = np.arange(bs, dtype=np.int64)[:, None]
    idx = rows - best_off
    vb = np.where(is_copy, np.minimum(best_len, vbytes), 0)
    bad = np.zeros((bs, lanes), bool)
    for k in range(vbytes // 4):
        a = _shift_up(W4, 4 * k) if k else W4
        b = np.take_along_axis(W4, np.clip(idx + 4 * k, 0, bs - 1), axis=0)
        x = a ^ b
        r = np.clip(vb - 4 * k, 0, 4)  # bytes this round checks
        mask = np.where(
            r >= 4, -1, np.where(r == 1, 0xFF, np.where(r == 2, 0xFFFF, 0xFFFFFF))
        )
        bad |= (r > 0) & ((x & mask) != 0)
    return bad.any(axis=0)


def derive_neighbor(
    best_len: np.ndarray, best_off: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Inherit the previous position's match, one byte shorter.

    If data[p-1 .. p-1+L) == data[p-1-off ..), then data[p .. p+L-1) ==
    data[p-off ..): a valid (L-1, off) match at p. Folding this in fills
    positions the half-density (stride-2) rungs skipped — an even
    position's match seeds its odd successor — at one elementwise pass.
    Only strictly-better inherits fold (ties keep the own candidate, which
    has the nearer lag by construction of the rung sort).
    """
    ln = _shift_down(best_len, 1) - 1
    off = _shift_down(best_off, 1)
    take = (ln >= 4) & (ln > best_len)
    return (
        np.where(take, ln, best_len).astype(np.int32),
        np.where(take, off, best_off).astype(np.int32),
    )


def match_search_sorted(
    data: np.ndarray,  # int32 [bs, lanes]
    lens: np.ndarray,  # int32 [lanes]
    rungs: tuple[int, ...] = (4, 8, 16, 32, 64),
    prev_k: int = 1,
    packed: bool = True,
    stride2_min: int = 0,
    sel_cap: int = 0,
    neighbor: bool = False,
    rung_windows: tuple[int, ...] | None = None,
    rung_strides: tuple[int, ...] | None = None,
    ext_cap: int = 64,
    sel_all: bool = False,
    sort_window: int = 0,
    rung_pick: bool = False,
    trusted: bool = False,
    max_lag: int = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """Sort-based exact match finder — full-block window at O(bs log^2 bs).

    For each rung length L, every position is keyed by an exact word
    (L = 4) or a wrapping 32-bit hash of its L-byte prefix (L >= 8), and a
    per-lane sort finds the nearest previous position with an equal key —
    the nearest exact L-byte match (hash rungs: modulo collisions, which
    the exact extension pass then rejects). Larger rungs find sources that
    match *longer*, which greedy parsing turns into 64-byte copy chains;
    the window is the whole block, unlimited.

    Replaces the O(bs * window) shifted-compare sweeps (match_search /
    granule_search): better candidates (exact nearest at any lag, full
    32 KB window) at sort cost. The reference's analog is its hash-probe
    loop (snappy_compress.c:333-348) — collision-prone, sequential; sorting
    is the TPU-native equivalent. Returns exact (best_len, best_off) with
    lengths in [4, 64].

    ``packed=True`` is the production (Pallas-kernel-faithful) path:
    single-array sort of 17-bit-folded keys packed with the position.
    ``packed=False`` sorts exact 32-bit keys with a position tiebreak
    (the quality ceiling; xml @32K: 0.7885 vs 0.7871 packed).

    ``stride2_min`` > 0 sorts rungs >= that length at half density
    (``packed_prev_lags`` stride=2): ~40% fewer sort ops for those rungs
    at a small ratio cost (xml @32K full ladder: 0.7775 vs 0.7871 at
    ``stride2_min=16``). Packed path only.

    ``sel_cap`` > 0 (bytes, multiple of 4) switches the prev ladder to
    select-then-extend: each L=4 prev candidate gets only a CHEAP
    extension capped at ``sel_cap`` bytes, the per-position winner
    (longest capped length, nearest lag on ties — the same
    strictly-greater fold order as the full path) is picked, and ONE
    full extension runs on the winner. Cuts the prev ladder's extension
    cost from ``prev_k`` full passes to ``prev_k`` capped passes + 1
    full pass; the approximation loses only when two candidates both
    saturate the cap but differ past it.
    """
    bs, lanes = data.shape
    rows = np.arange(bs, dtype=np.int64)[:, None]
    W4 = _pack_word4(data)
    best_len = np.zeros((bs, lanes), np.int32)
    best_off = np.zeros((bs, lanes), np.int32)

    def cap_lag(c):
        # max_lag: drop candidates beyond the reach cap (kernel:
        # sorted_match_groups(max_lag=...)); applied per rung BEFORE the
        # pick/ladder folds so nearer short-rung candidates fill in.
        return np.where(c <= max_lag, c, 0) if max_lag else c

    if rung_pick:
        # Rung-priority selection: the longest rung with a candidate wins
        # outright; one from-scratch extension verifies exactly (kernel:
        # sorted_match_groups(rung_pick=True)). ``trusted=True`` is the
        # verify-after-parse mode: the extension TRUSTS the winning rung's
        # prefix (min(L, 16) bytes — its sort proved key equality) and
        # starts past it; verify_copy_prefix catches fold collisions
        # after the greedy parse.
        assert prev_k == 1 and not sel_cap
        sel = np.zeros((bs, lanes), np.int32)
        trust = np.zeros((bs, lanes), np.int32)
        h = W4
        span = 4
        for ri, L in enumerate(rungs):
            while span < L:
                h = _hash_ladder_step(h, span)
                span *= 2
            stride = 2 if (stride2_min and L >= stride2_min) else 1
            if rung_strides:
                stride = rung_strides[ri]
            rw = (
                rung_windows[ri]
                if rung_windows
                else (sort_window // stride if sort_window else 0)
            )
            cand = cap_lag(packed_prev_lags(h, 1, stride=stride, window=rw)[0])
            sel = np.where(cand > 0, cand, sel)
            trust = np.where(cand > 0, min(L, 16), trust)
        best_len = extend_match(
            W4, lens, sel, max_len=ext_cap, trust=trust if trusted else None
        )
        best_off = np.where(best_len > 0, sel, 0)
        if neighbor:
            best_len, best_off = derive_neighbor(best_len, best_off)
        return best_len, best_off
    h = W4
    span = 4
    all_cands: list[np.ndarray] = []
    for ri, L in enumerate(rungs):
        while span < L:
            h = _hash_ladder_step(h, span)
            span *= 2
        k = prev_k if L == 4 else 1
        stride = 2 if (stride2_min and L >= stride2_min) else 1
        if rung_strides:
            stride = rung_strides[ri]
        # sort_window is a byte reach; packed_prev_lags windows the
        # strided sorted rows (kernel: _sort_rung_kernel(window=...)).
        rw = (
            rung_windows[ri]
            if rung_windows
            else (sort_window // stride if sort_window else 0)
        )
        if packed:
            cands = packed_prev_lags(h, k, stride=stride, window=rw)
        else:
            valid = rows + L <= lens[None, :]
            key = np.where(valid, h, SORT_SENTINEL).astype(np.int32)
            cands = nearest_prev_lags(key, k)
        cands = [cap_lag(c) for c in cands]
        if sel_all and sel_cap:
            all_cands.extend(cands)
            continue
        if L == 4 and k > 1 and sel_cap:
            sel_len = np.zeros((bs, lanes), np.int32)
            sel_off = np.zeros((bs, lanes), np.int32)
            for cand in cands:
                cl = extend_match(W4, lens, cand, max_len=sel_cap)
                better = cl > sel_len
                sel_len = np.where(better, cl, sel_len)
                sel_off = np.where(better, cand, sel_off)
            cands = [sel_off]
        for cand in cands:
            el = extend_match(W4, lens, cand, max_len=ext_cap)
            better = el > best_len
            best_len = np.where(better, el, best_len)
            best_off = np.where(better, cand, best_off)
    if sel_all and sel_cap:
        # Global select-then-extend: every candidate array (all rungs AND
        # the prev ladder) gets only the CHEAP capped extension; the
        # per-position winner (longest capped length; earlier arrays win
        # ties — rung order puts nearer lags first) gets the one full
        # extension. The capped passes share one word build in the kernel.
        sel_len = np.zeros((bs, lanes), np.int32)
        sel_off = np.zeros((bs, lanes), np.int32)
        for cand in all_cands:
            cl = extend_match(W4, lens, cand, max_len=sel_cap)
            better = cl > sel_len
            sel_len = np.where(better, cl, sel_len)
            sel_off = np.where(better, cand, sel_off)
        best_len = extend_match(W4, lens, sel_off, max_len=ext_cap)
        best_off = np.where(best_len > 0, sel_off, 0)
    if neighbor:
        best_len, best_off = derive_neighbor(best_len, best_off)
    return best_len, best_off


def emit_sizes(
    lens: np.ndarray,
    accept: np.ndarray,
    is_copy: np.ndarray,
    best_len: np.ndarray,
    best_off: np.ndarray,
) -> np.ndarray:
    """Per-lane compressed sizes from a parse — the layout math of
    ``layout_and_emit`` without the routing passes (for fast ratio sweeps).
    """
    bs, lanes = accept.shape
    rows = np.arange(bs, dtype=np.int32)[:, None]
    in_range = rows < lens[None, :]
    is_lit = accept & ~is_copy
    prev_lit = _shift_down(is_lit.astype(np.int32), 1).astype(bool)
    head_lit = is_lit & ~prev_lit
    INF = np.int32(1 << 28)
    nonlit_next = np.where((accept & is_copy) | ~in_range, rows, INF)
    run_end = np.minimum.accumulate(nonlit_next[::-1], axis=0)[::-1]
    run_end = np.minimum(run_end, lens[None, :])
    run_len = np.where(head_lit, run_end - rows, 0)
    L1 = np.maximum(run_len - 1, 0)
    lit_ext = np.where(L1 < 60, 0, np.where(L1 < 256, 1, 2))
    hdr_lit = np.where(head_lit, 1 + lit_ext, 0)
    copy1 = is_copy & (best_len < 12) & (best_off < 2048)
    hdr_copy = np.where(is_copy, np.where(copy1, 2, 3), 0)
    emit = np.where(head_lit, hdr_lit + run_len, 0) + hdr_copy
    return emit.sum(axis=0).astype(np.int32)


def lazy_defer(best_len: np.ndarray) -> np.ndarray:
    """Lazy-1 matching as an elementwise pre-transform.

    Deferring a copy whenever the NEXT position's match is strictly longer
    is equivalent to zeroing this position's length before the greedy
    accept scan (the scan then takes one literal and accepts the longer
    match at p+1; comparisons use ORIGINAL lengths, so chains behave like
    the sequential lazy rule). Measured on xml: +0.0023 ratio @ 16K
    (0.7611 -> 0.7634), +0.0024 @ 32K (0.7871 -> 0.7895), at zero runtime
    cost. The reference compressor is fully greedy
    (snappy_compress.c:333-413); classic LZ77 lazy evaluation.
    """
    nxt = np.vstack([best_len[1:], np.zeros((1, best_len.shape[1]), best_len.dtype)])
    return np.where(nxt > best_len, 0, best_len)


def greedy_parse(
    best_len: np.ndarray, lens: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Lockstep accept scan. Returns (accept [bs, lanes], is_copy)."""
    bs, lanes = best_len.shape
    next_accept = np.zeros(lanes, np.int32)
    accept = np.zeros((bs, lanes), bool)
    is_copy = np.zeros((bs, lanes), bool)
    for p in range(bs):
        acc = (p == next_accept) & (p < lens)
        copy = acc & (best_len[p] >= 4)
        accept[p] = acc
        is_copy[p] = copy
        adv = np.where(copy, best_len[p], 1)
        next_accept = np.where(acc, p + adv, next_accept)
    return accept, is_copy


def layout_and_emit(
    data: np.ndarray,  # int32 [bs, lanes]
    lens: np.ndarray,
    accept: np.ndarray,
    is_copy: np.ndarray,
    best_len: np.ndarray,
    best_off: np.ndarray,
    cap: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Vector layout + 4-channel token routing. Returns (comp, sizes)."""
    bs, lanes = data.shape
    rows = np.arange(bs, dtype=np.int32)[:, None]
    in_range = rows < lens[None, :]

    is_lit = accept & ~is_copy  # accepted literal byte positions
    # Literal runs are maximal runs of consecutive accepted-literal positions.
    prev_lit = _shift_down(is_lit.astype(np.int32), 1).astype(bool)
    head_lit = is_lit & ~prev_lit
    # Run id per literal byte: forward-fill of head row index.
    head_row = np.where(head_lit, rows, -1)
    head_row = np.maximum.accumulate(head_row, axis=0)
    # Run length: count literal bytes per run via difference of cumsums at
    # the next head; simpler: total - cumsum trick using the next non-lit.
    lit_cum = np.cumsum(is_lit.astype(np.int32), axis=0)
    # run_len at head = lit_cum at run end - lit_cum before head; run end =
    # next position where a new element begins or stream ends.
    INF = np.int32(1 << 28)
    nonlit_next = np.where((accept & is_copy) | ~in_range, rows, INF)
    # reverse cummin: first copy/stream-end row at or after p
    run_end = np.minimum.accumulate(nonlit_next[::-1], axis=0)[::-1]
    run_end = np.minimum(run_end, lens[None, :])
    run_len = np.where(head_lit, run_end - rows, 0)

    # Element sizes.
    L1 = np.maximum(run_len - 1, 0)
    lit_ext = np.where(L1 < 60, 0, np.where(L1 < 256, 1, 2))
    hdr_lit = np.where(head_lit, 1 + lit_ext, 0)
    copy1 = is_copy & (best_len < 12) & (best_off < 2048)
    hdr_copy = np.where(is_copy, np.where(copy1, 2, 3), 0)
    emit = (
        np.where(head_lit, hdr_lit + run_len, 0) + hdr_copy
    )  # bytes this element contributes
    out_start = np.cumsum(emit, axis=0) - emit  # exclusive, per lane
    sizes = np.where(
        np.arange(lanes) >= 0, np.cumsum(emit, axis=0)[-1], 0
    ).astype(np.int32)

    # Covering element head (for literal data byte destinations).
    elem_head = np.where(accept & (head_lit | is_copy), rows, -1)
    elem_head = np.maximum.accumulate(elem_head, axis=0)
    gather0 = lambda arr: np.take_along_axis(
        arr, np.clip(elem_head, 0, bs - 1), axis=0
    )
    cov_start = gather0(out_start)
    cov_hdr = gather0(hdr_lit + hdr_copy)

    # Header byte values per element head.
    h = np.zeros((3, bs, lanes), np.int32)
    off = best_off
    h[0] = np.where(
        is_copy,
        np.where(
            copy1,
            1 | ((best_len - 4) << 2) | ((off >> 8) << 5),
            2 | ((best_len - 1) << 2),
        ),
        np.where(
            head_lit,
            np.where(lit_ext == 0, L1 << 2, np.where(lit_ext == 1, 60 << 2, 61 << 2)),
            0,
        ),
    )
    h[1] = np.where(
        is_copy, off & 0xFF, np.where(head_lit & (lit_ext >= 1), L1 & 0xFF, 0)
    )
    h[2] = np.where(
        is_copy & ~copy1,
        (off >> 8) & 0xFF,
        np.where(head_lit & (lit_ext == 2), (L1 >> 8) & 0xFF, 0),
    )

    # Single-channel tokens: every emitted byte belongs to exactly one
    # token row, as 1-4 CONSECUTIVE output bytes in one 32-bit payload.
    # A head row carries its 1-3 header bytes (plus, for a literal head,
    # its own first data byte — the cov identity makes them adjacent); a
    # non-head literal row carries its one data byte. Token start
    # destinations are strictly increasing in row order and the byte spans
    # are disjoint (dst of the next element >= this one's start + count),
    # so ONE compact-then-expand route replaces the four per-byte channels,
    # and a 4-way shifted OR lands the payload bytes.
    is_head = accept & (head_lit | is_copy)
    hdr_len_here = hdr_lit + hdr_copy
    tok = is_head | is_lit
    data_idx = rows - head_row  # position within run (head -> 0)
    dst = np.where(is_head, out_start, cov_start + cov_hdr + data_idx)
    count = np.where(
        is_head, hdr_len_here + np.where(head_lit, 1, 0), 1
    )
    pay = np.where(
        is_head,
        h[0] | (h[1] << 8) | (h[2] << 16),
        data & 0xFF,
    )
    pay = np.where(
        head_lit, pay | (data & 0xFF) << (8 * hdr_lit), pay
    )
    comp = _route_tokens(tok, dst, count, pay, cap)
    return comp.astype(np.uint8), sizes


def _route_tokens(
    tok: np.ndarray,  # [bs, lanes] token mask
    dst: np.ndarray,  # [bs, lanes] first-byte destinations in [0, cap)
    count: np.ndarray,  # [bs, lanes] payload byte counts in [1, 4]
    pay: np.ndarray,  # [bs, lanes] up to 4 little-endian payload bytes
    cap: int,
) -> np.ndarray:
    """Route (dst, count, payload) tokens, then land bytes by shifted OR.

    The route word packs OCC | dst << 8 | count (count in bits 0-2, dst in
    bits 8-24 — 17 bits cover the 64 KB block capacity); the 32-bit payload
    rides through the same compact/expand moves as a second array. Landing:
    output row r collects byte j of the token routed to row r - j when that
    token's count > j — spans are disjoint, so at most one j contributes.
    """
    bs, lanes = tok.shape
    nrows = max(cap, bs)
    W = np.zeros((nrows, lanes), np.int32)
    P = np.zeros((nrows, lanes), np.int32)
    OCC = 1 << 30
    W[:bs] = np.where(tok, OCC | (dst << 8) | count, 0)
    P[:bs] = np.where(tok, pay, 0)
    rows = np.arange(nrows, dtype=np.int32)[:, None]

    occ = (W & OCC) != 0
    rank = np.where(occ, np.cumsum(occ, axis=0) - 1, 0)
    max_bit = max(1, nrows - 1).bit_length() - 1
    for k in range(max_bit + 1):  # compact up, LSB-first
        sh = 1 << k
        occ = (W & OCC) != 0
        move = occ & ((((rows - rank) >> k) & 1) == 1)
        mw = _shift_up(np.where(move, W, 0), sh)
        mr = _shift_up(np.where(move, rank, 0), sh)
        mp = _shift_up(np.where(move, P, 0), sh)
        arriving = (mw & OCC) != 0
        staying = occ & ~move
        assert not (arriving & staying).any(), "route conflict (compact)"
        W = np.where(arriving, mw, np.where(staying, W, 0))
        rank = np.where(arriving, mr, np.where(staying, rank, 0))
        P = np.where(arriving, mp, np.where(staying, P, 0))
    for k in range(max_bit, -1, -1):  # expand down, MSB-first
        sh = 1 << k
        occ = (W & OCC) != 0
        wdst = (W >> 8) & 0x1FFFF
        move = occ & (wdst - rows >= sh)
        mw = _shift_down(np.where(move, W, 0), sh)
        mp = _shift_down(np.where(move, P, 0), sh)
        arriving = (mw & OCC) != 0
        staying = occ & ~move
        assert not (arriving & staying).any(), "route conflict (expand)"
        W = np.where(arriving, mw, np.where(staying, W, 0))
        P = np.where(arriving, mp, np.where(staying, P, 0))

    out = np.zeros((cap, lanes), np.int32)
    for j in range(4):
        Wj = _shift_down(W, j)[:cap] if j else W[:cap]
        Pj = _shift_down(P, j)[:cap] if j else P[:cap]
        hit = ((Wj & OCC) != 0) & ((Wj & 7) > j)
        out = np.where(hit, (Pj >> (8 * j)) & 0xFF, out)
    return out


def _route_channel(
    comp: np.ndarray,  # [cap, lanes] accumulator
    tok: np.ndarray,  # [bs, lanes] token mask
    dst: np.ndarray,  # [bs, lanes] destinations in [0, cap)
    val: np.ndarray,  # [bs, lanes] byte values
    cap: int,
) -> np.ndarray:
    """Compact-then-expand route of one monotone channel into comp rows."""
    bs, lanes = tok.shape
    nrows = max(cap, bs)
    W = np.zeros((nrows, lanes), np.int32)
    OCC = 1 << 30
    W[:bs] = np.where(tok, OCC | (dst << 8) | (val & 0xFF), 0)
    rows = np.arange(nrows, dtype=np.int32)[:, None]

    occ = (W & OCC) != 0
    rank = np.where(occ, np.cumsum(occ, axis=0) - 1, 0)
    max_bit = max(1, nrows - 1).bit_length() - 1
    for k in range(max_bit + 1):  # compact up, LSB-first
        sh = 1 << k
        occ = (W & OCC) != 0
        move = occ & ((((rows - rank) >> k) & 1) == 1)
        mw = _shift_up(np.where(move, W, 0), sh)
        mr = _shift_up(np.where(move, rank, 0), sh)
        arriving = (mw & OCC) != 0
        staying = occ & ~move
        assert not (arriving & staying).any(), "route conflict (compact)"
        W = np.where(arriving, mw, np.where(staying, W, 0))
        rank = np.where(arriving, mr, np.where(staying, rank, 0))
    for k in range(max_bit, -1, -1):  # expand down, MSB-first
        sh = 1 << k
        occ = (W & OCC) != 0
        wdst = (W >> 8) & 0x3FFFFF
        move = occ & (wdst - rows >= sh)
        mw = _shift_down(np.where(move, W, 0), sh)
        arriving = (mw & OCC) != 0
        staying = occ & ~move
        assert not (arriving & staying).any(), "route conflict (expand)"
        W = np.where(arriving, mw, np.where(staying, W, 0))

    landed = (W[:cap] & OCC) != 0
    return np.where(landed, W[:cap] & 0xFF, comp)


def encode_lanes(
    blocks: np.ndarray,  # uint8 [lanes, bs]
    lens: np.ndarray,  # int32 [lanes]
    block_size: int,
    cap: int,
    window: int = 512,
    coarse_window: int = 0,
    matcher: str = "sweep",
    rungs: tuple[int, ...] | None = None,
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
    sweep_span: int = 4,  # perf-only kernel knob: no spec effect
) -> tuple[np.ndarray, np.ndarray]:
    """Full pipeline; returns (comp [lanes, cap] uint8, sizes [lanes])."""
    del sweep_span
    data = blocks.T.astype(np.int32)
    if matcher == "sorted":
        best_len, best_off = match_search_sorted(
            data, lens, rungs=rungs or (4, 8, 16, 32, 64), prev_k=prev_k,
            stride2_min=stride2_min, sel_cap=sel_cap, sel_all=sel_all,
            rung_strides=rung_strides, ext_cap=ext_cap, neighbor=neighbor,
            sort_window=sort_window, rung_pick=rung_pick, max_lag=max_lag,
        )
    else:
        best_len, best_off = match_search(data, lens, window, coarse_window)
    best_len = lazy_defer(best_len)
    accept, is_copy = greedy_parse(best_len, lens)
    comp, sizes = layout_and_emit(
        data, lens, accept, is_copy, best_len, best_off, cap
    )
    return comp.T, sizes
