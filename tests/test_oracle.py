"""Format-core tests: varints, oracle codec, corpus golden files.

Mirrors the reference's golden-file strategy (`snappy/Makefile:54-60`: run the
codec on every test/*.snappy and cmp against the .txt) plus the unit/property
coverage the reference lacks (SURVEY.md §4).
"""

import os
import random

import pytest

from pim_compression_tpu.format import constants as C
from pim_compression_tpu.format import oracle
from pim_compression_tpu.format.varint import decode_varint32, encode_varint32

from conftest import CORPUS_PAIRS, corpus_pair


# ---------------------------------------------------------------------------
# Varint
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "value,encoded",
    [
        (0, b"\x00"),
        (1, b"\x01"),
        (127, b"\x7f"),
        (128, b"\x80\x01"),
        (32768, b"\x80\x80\x02"),
        (0xFFFFFFFF, b"\xff\xff\xff\xff\x0f"),
    ],
)
def test_varint_known_values(value, encoded):
    assert encode_varint32(value) == encoded
    decoded, pos = decode_varint32(encoded)
    assert (decoded, pos) == (value, len(encoded))


def test_varint_roundtrip_random():
    rng = random.Random(0)
    for _ in range(200):
        v = rng.randrange(0, 1 << 32)
        enc = encode_varint32(v)
        assert decode_varint32(enc) == (v, len(enc))


def test_varint_rejects_overlong():
    with pytest.raises(ValueError):
        decode_varint32(b"\xff\xff\xff\xff\xff\xff")
    with pytest.raises(ValueError):
        decode_varint32(b"\x80\x80")


# ---------------------------------------------------------------------------
# Golden corpus: decode .snappy -> must equal .txt; compress .txt -> must be
# byte-identical to the shipped .snappy (the corpus was produced by the
# reference's own compressor at 32 KB blocks, reference README.md:23).
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("name", CORPUS_PAIRS)
def test_corpus_decompress_golden(corpus_dir, name):
    txt, snappy = corpus_pair(name)
    assert oracle.decompress(snappy) == txt


@pytest.mark.parametrize("name", CORPUS_PAIRS)
def test_corpus_compress_bit_exact(corpus_dir, name):
    txt, snappy = corpus_pair(name)
    assert oracle.compress(txt, C.DEFAULT_BLOCK_SIZE) == snappy


def test_corpus_xml_roundtrip(corpus_dir):
    snappy = (corpus_dir / "xml.snappy").read_bytes()
    plain = oracle.decompress(snappy)
    assert len(plain) == 5_345_280
    assert oracle.compress(plain, C.DEFAULT_BLOCK_SIZE) == snappy


# ---------------------------------------------------------------------------
# Properties / adversarial buffers (SURVEY.md §4 gap-fill).
# ---------------------------------------------------------------------------


def _roundtrip(data: bytes, block_size: int = C.DEFAULT_BLOCK_SIZE) -> None:
    stream = oracle.compress(data, block_size)
    assert oracle.decompress(stream) == data


def test_roundtrip_empty():
    _roundtrip(b"")


def test_roundtrip_tiny():
    for n in range(1, 20):
        _roundtrip(bytes(range(n)))


def test_roundtrip_all_zero():
    _roundtrip(b"\x00" * 100_000)


def test_roundtrip_incompressible():
    _roundtrip(random.Random(1).randbytes(70_000))


def test_roundtrip_rle_overlap():
    # offset < length cases: 1-byte and 3-byte periods
    _roundtrip(b"a" * 5000 + b"abc" * 3000 + b"xyz")


def test_roundtrip_literal_length_boundaries():
    # literal lengths around the 60/61 inline/extension boundary and 256/65536
    rng = random.Random(2)
    for n in [59, 60, 61, 62, 255, 256, 257, 65535, 65536]:
        _roundtrip(rng.randbytes(n), block_size=C.MAX_BLOCK_SIZE)


def test_roundtrip_copy_length_boundaries():
    # matched runs around the 64/68 chunking rule
    for run in [60, 63, 64, 65, 67, 68, 69, 128, 132]:
        data = random.Random(3).randbytes(64) * 2 + b"Q" * run + b"tail" * 8
        _roundtrip(data)


def test_roundtrip_block_sizes():
    data = (b"The quick brown fox. " * 4000)[:80_000]
    for bs in [1024, 4096, 32768, 65536]:
        _roundtrip(data, block_size=bs)


def test_decompress_rejects_bad_offset():
    # COPY_1 with offset 0 (invalid backreference)
    bad_block = bytes([0x00, ord("A"), 0x01 | (0 << 2), 0x00])
    stream = (
        encode_varint32(5)
        + encode_varint32(C.DEFAULT_BLOCK_SIZE)
        + len(bad_block).to_bytes(4, "little")
        + bad_block
    )
    with pytest.raises(ValueError):
        oracle.decompress(stream)


def test_scan_block_frames(corpus_dir):
    snappy = (corpus_dir / "xml.snappy").read_bytes()
    total, bs, frames = oracle.scan_block_frames(snappy)
    assert total == 5_345_280
    assert bs == C.DEFAULT_BLOCK_SIZE
    assert len(frames) == 164
    off, size = frames[-1]
    assert off + size == len(snappy)
