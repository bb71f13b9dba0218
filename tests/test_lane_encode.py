"""Lane-parallel encoder model tests: streams must decode via the oracle."""

import random

import numpy as np
import pytest

from pim_compression_tpu.format import constants as C
from pim_compression_tpu.format import oracle
from pim_compression_tpu.format.varint import encode_varint32
from pim_compression_tpu.ops import lane_model_encode as lme

from conftest import corpus_pair


def _encode(data: bytes, bs: int = 4096, window: int = 512) -> bytes:
    nb = max(1, (len(data) + bs - 1) // bs)
    cap = (C.max_compressed_length(bs) + 127) // 128 * 128
    blocks = np.zeros((nb, bs), np.uint8)
    lens = np.zeros(nb, np.int32)
    raw = np.frombuffer(data, np.uint8)
    for i in range(nb):
        ch = raw[i * bs : (i + 1) * bs]
        blocks[i, : len(ch)] = ch
        lens[i] = len(ch)
    comp, sizes = lme.encode_lanes(blocks, lens, bs, cap, window)
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


def test_lane_encode_copy1_emission():
    # short match at small offset must use the 2-byte COPY_1 form
    data = b"abcdefgh" + b"abcd" + b"XYZW" * 4
    stream = _encode(data)
    assert oracle.decompress(stream) == data
