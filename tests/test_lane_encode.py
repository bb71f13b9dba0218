"""Lane-parallel encoder model tests: streams must decode via the oracle."""

import random

import numpy as np
import pytest

from pim_compression_tpu.format import constants as C
from pim_compression_tpu.format import oracle
from pim_compression_tpu.format.varint import encode_varint32
from pim_compression_tpu.ops import lane_model_encode as lme

from conftest import corpus_pair


def _encode(
    data: bytes, bs: int = 4096, window: int = 512, coarse: int = 0
) -> bytes:
    nb = max(1, (len(data) + bs - 1) // bs)
    cap = (C.max_compressed_length(bs) + 127) // 128 * 128
    blocks = np.zeros((nb, bs), np.uint8)
    lens = np.zeros(nb, np.int32)
    raw = np.frombuffer(data, np.uint8)
    for i in range(nb):
        ch = raw[i * bs : (i + 1) * bs]
        blocks[i, : len(ch)] = ch
        lens[i] = len(ch)
    comp, sizes = lme.encode_lanes(blocks, lens, bs, cap, window, coarse)
    assert sizes.max(initial=0) <= cap
    stream = bytearray(encode_varint32(len(data)) + encode_varint32(bs))
    if len(data):
        for i in range(nb):
            stream += int(sizes[i]).to_bytes(4, "little")
            stream += comp[i, : sizes[i]].tobytes()
    return bytes(stream)


@pytest.mark.parametrize("name", ["coding", "terror2"])
def test_lane_encode_corpus(corpus_dir, name):
    data = (corpus_dir / f"{name}.txt").read_bytes()
    stream = _encode(data)
    assert oracle.decompress(stream) == data
    # Exhaustive in-window matching must at least beat no compression.
    assert len(stream) < len(data)


def test_lane_encode_adversarial():
    r = random.Random(3)
    for data in [
        b"",
        b"x",
        b"a" * 10000,
        r.randbytes(9000),
        b"ab" * 5000,
        r.randbytes(61),
        bytes(range(256)) * 40,
        b"z" * 4096,  # exactly one full block of RLE
    ]:
        assert oracle.decompress(_encode(data)) == data


def test_lane_encode_window_tradeoff():
    data = corpus_pair("terror2")[0]
    sizes = {w: len(_encode(data, window=w)) for w in (64, 512)}
    assert sizes[512] < sizes[64]  # bigger window => better ratio


def test_lane_encode_coarse_long_range():
    # Redundancy only at a long, 8-aligned distance: invisible to the fine
    # window, caught exactly by the sampled coarse sweep.
    r = random.Random(11)
    chunk = r.randbytes(600)
    gap = r.randbytes(2400 - 600)  # second occurrence starts at lag 2400
    data = chunk + gap + chunk + r.randbytes(300)
    fine = _encode(data, window=512)
    coarse = _encode(data, window=512, coarse=4096)
    assert oracle.decompress(coarse) == data
    assert len(coarse) < len(fine) - 400  # the 600-B repeat must compress


def test_lane_encode_coarse_unsampled_lag_still_valid():
    # Distance not a multiple of 8: the coarse sweep misses it, but the
    # stream must remain well-formed and exact.
    r = random.Random(12)
    chunk = r.randbytes(200)
    data = chunk + r.randbytes(803 - 200) + chunk
    stream = _encode(data, window=64, coarse=2048)
    assert oracle.decompress(stream) == data


def _encode_granular(data: bytes, bs: int, window: int, coarse: int) -> bytes:
    cap = (C.max_compressed_length(bs) + 127) // 128 * 128
    blocks = np.zeros((1, bs), np.uint8)
    blocks[0, : len(data)] = np.frombuffer(data, np.uint8)
    lens = np.array([len(data)], np.int32)
    d = blocks.T.astype(np.int32)
    best_len, best_off = lme.match_search_granular(d, lens, window, coarse)
    accept, is_copy = lme.greedy_parse(best_len, lens)
    comp, sizes = lme.layout_and_emit(
        d, lens, accept, is_copy, best_len, best_off, cap
    )
    return bytes(
        encode_varint32(len(data)) + encode_varint32(bs)
        + int(sizes[0]).to_bytes(4, "little") + comp[:, 0][: sizes[0]].tobytes()
    )


def test_granule_search_covers_unsampled_lags():
    # Repeat at lag 1237 (not a multiple of 8): the sampled-lag coarse sweep
    # misses it; the phased-granule search must not.
    r = random.Random(17)
    chunk = r.randbytes(256)
    data = chunk + r.randbytes(1237 - 256) + chunk + r.randbytes(64)
    bs, window = 2048, 64
    sampled = _encode(data, bs=bs, window=window, coarse=2048)
    granular = _encode_granular(data, bs=bs, window=window, coarse=2048)
    assert oracle.decompress(granular) == data
    # chunk repeat compresses under granular search, stays literal otherwise
    assert len(granular) < len(sampled) - 150


def test_granule_search_randomized_valid():
    r = random.Random(18)
    for _ in range(4):
        seed = r.randbytes(r.randint(30, 300))
        body = bytearray()
        while len(body) < 3500:
            body += seed if r.random() < 0.4 else r.randbytes(r.randint(5, 200))
        data = bytes(body[: r.randint(2000, 4096)])
        stream = _encode_granular(data, bs=4096, window=64, coarse=4096)
        assert oracle.decompress(stream) == data


def test_lane_encode_copy1_emission():
    # short match at small offset must use the 2-byte COPY_1 form
    data = b"abcdefgh" + b"abcd" + b"XYZW" * 4
    stream = _encode(data)
    assert oracle.decompress(stream) == data


# ---------------------------------------------------------------------------
# Sorted matcher (round-2): exactness, validity, ratio dominance.
# ---------------------------------------------------------------------------


def _encode_sorted(
    data: bytes, bs: int, rungs=(4, 8, 16, 32, 64), prev_k: int = 1
) -> bytes:
    cap = (C.max_compressed_length(bs) + 127) // 128 * 128
    nb = max(1, (len(data) + bs - 1) // bs)
    blocks = np.zeros((nb, bs), np.uint8)
    lens = np.zeros(nb, np.int32)
    raw = np.frombuffer(data, np.uint8)
    for i in range(nb):
        ch = raw[i * bs : (i + 1) * bs]
        blocks[i, : len(ch)] = ch
        lens[i] = len(ch)
    d = blocks.T.astype(np.int32)
    best_len, best_off = lme.match_search_sorted(d, lens, rungs, prev_k)
    # Every reported match must be a real byte match within the block.
    rows = np.arange(bs)[:, None]
    has = best_len > 0
    assert (best_len[has] >= 4).all() and (best_len[has] <= 64).all()
    assert (best_off[has] > 0).all()
    assert ((rows - best_off)[has] >= 0).all()
    for p, lane in zip(*np.nonzero(has)):
        L, o = int(best_len[p, lane]), int(best_off[p, lane])
        src = blocks[lane]
        assert p + L <= lens[lane]
        for k in range(L):  # forward copy semantics (RLE overlap allowed)
            assert src[p + k] == src[p - o + k]
    accept, is_copy = lme.greedy_parse(best_len, lens)
    comp, sizes = lme.layout_and_emit(
        d, lens, accept, is_copy, best_len, best_off, cap
    )
    stream = bytearray(encode_varint32(len(data)) + encode_varint32(bs))
    if len(data):
        for i in range(nb):
            stream += int(sizes[i]).to_bytes(4, "little")
            stream += comp[:, i][: sizes[i]].tobytes()
    return bytes(stream)


def test_sorted_matcher_adversarial_roundtrip():
    r = random.Random(41)
    for data in [
        b"",
        b"x",
        b"a" * 3000,
        r.randbytes(2100),
        b"ab" * 1500,
        bytes(range(256)) * 10,
        b"z" * 2048,  # exactly one full block of RLE
    ]:
        assert oracle.decompress(_encode_sorted(data, bs=2048)) == data


def test_sorted_matcher_randomized_roundtrip():
    r = random.Random(42)
    for _ in range(4):
        seed = r.randbytes(r.randint(20, 400))
        body = bytearray()
        while len(body) < 5000:
            body += seed if r.random() < 0.5 else r.randbytes(r.randint(4, 300))
        data = bytes(body[: r.randint(3000, 5000)])
        assert oracle.decompress(_encode_sorted(data, bs=4096)) == data


def test_sorted_matcher_full_window_reach():
    # Repeat at an arbitrary long unaligned lag: out of reach for sweep
    # windows, trivially found by the sort (whole-block window).
    r = random.Random(43)
    chunk = r.randbytes(300)
    data = chunk + r.randbytes(3001 - 300) + chunk
    stream = _encode_sorted(data, bs=4096)
    assert oracle.decompress(stream) == data
    assert len(stream) < len(data) - 200


def test_sorted_matcher_beats_sweep_on_corpus():
    data = corpus_pair("terror2")[0][:32768]
    sw = _encode(data, bs=4096, window=512)
    so = _encode_sorted(data, bs=4096)
    assert oracle.decompress(so) == data
    assert len(so) < len(sw)


def test_sorted_matcher_prev2_roundtrip_and_ratio():
    # prev_k=2 folds the second-nearest previous occurrence on the 4-byte
    # rung: streams stay valid and never get bigger; on data where the
    # nearest source's own continuation diverges, the farther one wins.
    r = random.Random(44)
    seed = r.randbytes(256)
    body = bytearray()
    while len(body) < 6000:
        body += seed[: r.randint(4, 120)] if r.random() < 0.6 else r.randbytes(
            r.randint(3, 50)
        )
    data = bytes(body[:6000])
    s1 = _encode_sorted(data, bs=2048, prev_k=1)
    s2 = _encode_sorted(data, bs=2048, prev_k=2)
    assert oracle.decompress(s2) == data
    assert len(s2) <= len(s1)
    # Construct a case where prev2 strictly wins: the nearest occurrence of
    # "ABCD" continues differently, the second-nearest continues identically.
    # (rungs=(4,) so the longer-prefix rungs cannot also find the far one)
    tail = b"ABCD" + b"efghijklmnop"
    data = tail + b"ABCD" + b"XXXXXXXX" + tail + b"." * 16
    s1 = _encode_sorted(data, bs=256, rungs=(4,), prev_k=1)
    s2 = _encode_sorted(data, bs=256, rungs=(4,), prev_k=2)
    assert oracle.decompress(s2) == data
    assert len(s2) < len(s1)


def test_prev2_lag_composition_matches_sorted_definition():
    # packed_prev_lags(h, 2)[1] (sorted-space j=2 lags) must equal the lag
    # composition lag(p) + lag(p - lag(p)) — the identity the Pallas prev2
    # kernel is built on (no second sort).
    r = random.Random(45)
    bs, lanes = 512, 4
    data = np.zeros((bs, lanes), np.int32)
    for l in range(lanes):
        seed = r.randbytes(64)
        body = bytearray()
        while len(body) < bs:
            body += seed if r.random() < 0.5 else r.randbytes(r.randint(3, 40))
        data[:, l] = np.frombuffer(bytes(body[:bs]), np.uint8)
    W4 = lme._pack_word4(data)
    lag1, lag2 = lme.packed_prev_lags(W4, 2)
    rows = np.arange(bs)[:, None]
    src = np.clip(rows - lag1, 0, bs - 1)
    lag_src = np.take_along_axis(lag1, src, axis=0)
    composed = np.where((lag1 > 0) & (lag_src > 0), lag1 + lag_src, 0)
    assert (composed == lag2).all()


def test_extend_match_exact_lengths():
    # Hand-built block: "abcdeabcdXabcde" — at p=5 lag 5 matches 4 bytes
    # ("abcd"), at p=10 lag 10 matches 5 bytes ("abcde").
    data = np.frombuffer(b"abcdeabcdXabcde" + b"\0", np.uint8)[:16]
    d = data[:, None].astype(np.int32)
    lens = np.array([15], np.int32)
    W4 = lme._pack_word4(d)
    cand = np.zeros((16, 1), np.int32)
    cand[5, 0] = 5
    cand[10, 0] = 10
    el = lme.extend_match(W4, lens, cand)
    assert el[5, 0] == 4
    assert el[10, 0] == 5


def test_extend_match_rle_overlap():
    # lag 1 in a run of 'a': overlap extension to the 64-byte cap.
    d = np.full((128, 1), ord("a"), np.int32)
    lens = np.array([128], np.int32)
    W4 = lme._pack_word4(d)
    cand = np.zeros((128, 1), np.int32)
    cand[1, 0] = 1
    el = lme.extend_match(W4, lens, cand)
    assert el[1, 0] == 64


def test_max_lag_candidate_cap():
    # max_lag drops candidates beyond the reach cap; nearer short-rung
    # candidates fill in; streams stay valid and ratio degrades gracefully.
    rng = np.random.default_rng(4)
    bs, lanes = 2048, 8
    base = (b"a moderately repetitive payload phrase " * 60)[:bs]
    data = np.zeros((bs, lanes), np.int32)
    for l in range(lanes):
        arr = bytearray(base)
        for _ in range(40):
            arr[rng.integers(0, bs)] = rng.integers(0, 256)
        data[:, l] = np.frombuffer(bytes(arr), np.uint8)
    lens = np.full(lanes, bs, np.int32)
    sizes_by_cap = []
    for cap in (0, 1024, 256, 64):
        bl, bo = lme.match_search_sorted(
            data, lens, rungs=(4, 16), rung_pick=True, ext_cap=48,
            neighbor=True, max_lag=cap,
        )
        if cap:
            assert int(bo.max()) <= cap
        ml = lme.lazy_defer(bl)
        acc, cp = lme.greedy_parse(ml, lens)
        sizes_by_cap.append(
            int(lme.emit_sizes(lens, acc, cp, ml, bo).sum())
        )
    # Tighter caps lose long-range matches; the greedy parse is not
    # perfectly monotone element-by-element, but the 64-byte cap must be
    # clearly worse than full reach on repetitive data.
    assert sizes_by_cap[-1] > sizes_by_cap[0]


def test_extend_match_trusted_matches_exact_on_true_candidates():
    # With genuinely matching candidates, the trusted extension (skip
    # rounds below the trusted prefix) returns exactly the exact lengths.
    rng = np.random.default_rng(11)
    bs, lanes = 1024, 4
    data = np.zeros((bs, lanes), np.int32)
    for l in range(lanes):
        data[:, l] = np.frombuffer(
            (bytes(rng.integers(32, 127, 130, dtype=np.uint8)) * 10)[:bs],
            np.uint8,
        )
    lens = np.full(lanes, bs, np.int32)
    W4 = lme._pack_word4(data)
    h16 = lme._hash_ladder_step(lme._hash_ladder_step(W4, 4), 8)
    c16 = lme.packed_prev_lags(h16, 1)[0]
    rows = np.arange(bs)[:, None]
    # keep only candidates whose 16-byte prefix REALLY matches
    src = np.clip(rows - c16, 0, bs - 1)
    true16 = np.ones((bs, lanes), bool)
    for k in range(4):
        a = lme._shift_up(W4, 4 * k) if k else W4
        b = np.take_along_axis(W4, np.clip(src + 4 * k, 0, bs - 1), 0)
        true16 &= a == b
    cand = np.where(true16, c16, 0)
    trust = np.where(cand > 0, 16, 0)
    exact = lme.extend_match(W4, lens, cand, max_len=48)
    trusted = lme.extend_match(W4, lens, cand, max_len=48, trust=trust)
    assert (exact == trusted).all()


def test_verify_copy_prefix_flags_false_trust():
    # A fold-collision candidate trusted for 16 bytes emits a wrong copy;
    # verify_copy_prefix must flag the lane. (This records the round-5
    # investigation: trusting rung prefixes without byte verification is
    # caught by the after-parse check — see DESIGN.md.)
    bs, lanes = 512, 2
    rng = np.random.default_rng(3)
    raw = rng.integers(32, 127, (bs, lanes), dtype=np.int64)
    data = raw.astype(np.int32)
    lens = np.full(lanes, bs, np.int32)
    W4 = lme._pack_word4(data)
    # forge: candidate at p=300 pointing lag 100 with differing bytes
    cand = np.zeros((bs, lanes), np.int64)
    cand[300, 0] = 100
    trust = np.where(cand > 0, 16, 0)
    trusted_len = lme.extend_match(W4, lens, cand, max_len=48, trust=trust)
    assert trusted_len[300, 0] >= 16  # wrongly trusted
    is_copy = trusted_len > 0
    bad = lme.verify_copy_prefix(W4, lens, is_copy, trusted_len, cand)
    assert bad[0] and not bad[1]
    # the exact extension rejects the same forged candidate
    exact_len = lme.extend_match(W4, lens, cand, max_len=48)
    assert exact_len[300, 0] == 0
    bad_exact = lme.verify_copy_prefix(
        W4, lens, exact_len > 0, exact_len, cand
    )
    assert not bad_exact.any()
