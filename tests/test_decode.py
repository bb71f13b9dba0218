"""XLA decoder tests on the CPU mesh: corpus golden files + error flags."""

import numpy as np
import pytest

from pim_compression_tpu.format import constants as C
from pim_compression_tpu.format import oracle
from pim_compression_tpu.ops import decode

from conftest import CORPUS_PAIRS, corpus_pair


def _blockize(stream: bytes):
    total, bs, frames = oracle.scan_block_frames(stream)
    cap = decode.padded_capacity(bs)
    nb = len(frames)
    comp = np.zeros((nb, cap), np.uint8)
    clen = np.zeros(nb, np.int32)
    olen = np.zeros(nb, np.int32)
    raw = np.frombuffer(stream, np.uint8)
    off = 0
    for i, (o, s) in enumerate(frames):
        comp[i, :s] = raw[o : o + s]
        clen[i] = s
        olen[i] = min(bs, total - off)
        off += olen[i]
    return comp, clen, olen, bs, total


def _decode(stream: bytes) -> tuple[bytes, np.ndarray]:
    comp, clen, olen, bs, total = _blockize(stream)
    out, err = decode.decode_blocks(comp, clen, olen, block_size=bs)
    out = np.asarray(out)
    got = b"".join(out[i, : olen[i]].tobytes() for i in range(len(olen)))
    return got, np.asarray(err)


@pytest.mark.parametrize("name", CORPUS_PAIRS)
def test_decode_corpus(corpus_dir, name):
    txt, snappy = corpus_pair(name)
    got, err = _decode(snappy)
    assert not err.any()
    assert got == txt


def test_decode_xml(corpus_dir):
    snappy = (corpus_dir / "xml.snappy").read_bytes()
    got, err = _decode(snappy)
    assert not err.any()
    assert got == oracle.decompress(snappy)


def test_decode_roundtrip_adversarial():
    import random

    rng = random.Random(5)
    data = (
        b"\x00" * 5000
        + rng.randbytes(40000)
        + b"abc" * 10000
        + b"x" * 70
        + rng.randbytes(61)
    )
    stream = oracle.compress(data)
    got, err = _decode(stream)
    assert not err.any()
    assert got == data


def test_decode_flags_bad_offset():
    # COPY_1 len 4 offset 0 -> ERR_BAD_OFFSET
    bad_payload = bytes([0x00, ord("A"), C.ElementType.COPY_1_BYTE_OFFSET, 0x00])
    comp = np.zeros((1, decode.padded_capacity(C.DEFAULT_BLOCK_SIZE)), np.uint8)
    comp[0, : len(bad_payload)] = np.frombuffer(bad_payload, np.uint8)
    out, err = decode.decode_blocks(
        comp,
        np.array([len(bad_payload)], np.int32),
        np.array([5], np.int32),
        block_size=C.DEFAULT_BLOCK_SIZE,
    )
    assert int(np.asarray(err)[0]) & decode.ERR_BAD_OFFSET


def test_decode_flags_length_mismatch():
    payload = bytes([0x00, ord("A")])  # 1-byte literal
    comp = np.zeros((1, decode.padded_capacity(C.DEFAULT_BLOCK_SIZE)), np.uint8)
    comp[0, : len(payload)] = np.frombuffer(payload, np.uint8)
    out, err = decode.decode_blocks(
        comp,
        np.array([len(payload)], np.int32),
        np.array([99], np.int32),  # lie about the output size
        block_size=C.DEFAULT_BLOCK_SIZE,
    )
    assert int(np.asarray(err)[0]) & decode.ERR_LENGTH_MISMATCH


def test_decode_flags_element_overrun():
    payload = bytes([59 << 2])  # claims 15-byte literal, no data follows
    comp = np.zeros((1, decode.padded_capacity(C.DEFAULT_BLOCK_SIZE)), np.uint8)
    comp[0, 0] = payload[0]
    out, err = decode.decode_blocks(
        comp,
        np.array([1], np.int32),
        np.array([15], np.int32),
        block_size=C.DEFAULT_BLOCK_SIZE,
    )
    assert int(np.asarray(err)[0]) & decode.ERR_ELEMENT_OVERRUN


def test_decode_accepts_copy4():
    # COPY_4 is decode-only (never emitted by any compressor here or in the
    # reference, snappy_decompress.c:278-283) — all decoders must accept it.
    payload = bytes([4 << 2]) + b"ABCDE" + bytes([3 | (2 << 2), 5, 0, 0, 0])
    expected = b"ABCDEABC"

    out = bytearray()
    oracle.decompress_block(memoryview(payload), out, 0)
    assert bytes(out) == expected

    cap = decode.padded_capacity(C.DEFAULT_BLOCK_SIZE)
    comp = np.zeros((1, cap), np.uint8)
    comp[0, : len(payload)] = np.frombuffer(payload, np.uint8)
    o, err = decode.decode_blocks(
        comp,
        np.array([len(payload)], np.int32),
        np.array([len(expected)], np.int32),
        block_size=C.DEFAULT_BLOCK_SIZE,
    )
    assert not np.asarray(err).any()
    assert np.asarray(o)[0, : len(expected)].tobytes() == expected
