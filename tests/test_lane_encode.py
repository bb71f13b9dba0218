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
