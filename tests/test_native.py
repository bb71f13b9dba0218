"""Native C++ codec tests: bit-exactness vs oracle + corpus, threading."""

import random

import pytest

from pim_compression_tpu import native
from pim_compression_tpu.format import constants as C
from pim_compression_tpu.format import oracle
from pim_compression_tpu.utils.errors import SnappyError

from conftest import CORPUS_PAIRS, corpus_pair

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native codec failed to build"
)


@pytest.mark.parametrize("name", CORPUS_PAIRS)
def test_native_corpus_bit_exact(corpus_dir, name):
    txt, snappy = corpus_pair(name)
    assert native.compress(txt) == snappy
    assert native.decompress(snappy) == txt


def test_native_xml(corpus_dir):
    snappy = (corpus_dir / "xml.snappy").read_bytes()
    plain = native.decompress(snappy)
    assert native.compress(plain) == snappy


@pytest.mark.parametrize("threads", [1, 4])
def test_native_matches_oracle_random(threads):
    rng = random.Random(7)
    for size in [0, 1, 15, 16, 100, 5000, 70000, 200_001]:
        data = rng.randbytes(size // 2) + b"pattern" * (size // 14 + 1)
        data = data[:size]
        stream = native.compress(data, num_threads=threads)
        assert stream == oracle.compress(data)
        assert native.decompress(stream, num_threads=threads) == data


def test_native_block_sizes():
    data = (b"the quick brown fox " * 5000)[:90_000]
    for bs in [1024, 32768, 65536]:
        stream = native.compress(data, block_size=bs)
        assert stream == oracle.compress(data, block_size=bs)
        assert native.decompress(stream) == data


def test_native_rejects_garbage():
    with pytest.raises(SnappyError):
        native.decompress(b"\xff\xff\xff\xff\xff\xff\xff\xff")
    good = native.compress(b"hello world hello world hello")
    with pytest.raises(SnappyError):
        native.decompress(good[: len(good) - 3])


def test_native_rejects_bad_block_size():
    with pytest.raises(SnappyError):
        native.compress(b"x", block_size=0)
    with pytest.raises(SnappyError):
        native.compress(b"x", block_size=1 << 20)


def test_native_scan_frames(corpus_dir):
    snappy = (corpus_dir / "xml.snappy").read_bytes()
    info = native.scan_frames(snappy)
    assert info["total_len"] == 5_345_280
    assert info["block_size"] == C.DEFAULT_BLOCK_SIZE
    assert len(info["payload_off"]) == 164
    ref_total, ref_bs, ref_frames = oracle.scan_block_frames(snappy)
    assert info["payload_off"].tolist() == [f[0] for f in ref_frames]
    assert info["payload_size"].tolist() == [f[1] for f in ref_frames]
    assert info["out_off"][-1] + info["out_size"][-1] == ref_total


def test_native_tiny_block_sizes():
    # Regression (round-1 advisor): with tiny blocks the per-block 4-byte
    # frames + 32-byte slack dominate, so a capacity bound in terms of n
    # alone under-allocates and the compact pass overran the heap buffer.
    rng = random.Random(11)
    data = rng.randbytes(2000)
    for bs in [1, 2, 4, 7, 16, 33]:
        stream = native.compress(data, block_size=bs)
        assert stream == oracle.compress(data, block_size=bs)
        assert native.decompress(stream) == data


def test_native_rejects_trailing_empty_frame():
    # A zero-payload frame appended after the output is complete is
    # malformed; both the native scanner and the oracle must reject it.
    good = native.compress(b"reject trailing frames " * 10)
    bad = good + (0).to_bytes(4, "little")
    with pytest.raises(SnappyError):
        native.decompress(bad)
    with pytest.raises(ValueError):
        oracle.decompress(bad)
    with pytest.raises(ValueError):
        oracle.scan_block_frames(bad)


def test_native_blockize_assemble_parity():
    # The native host pre/post entry points (parallel per-block memcpys)
    # must reproduce the NumPy ragged gather/scatter bytes exactly,
    # including pooled-buffer reuse with the dirty-watermark zeroing and
    # the zero_pad=False fast path (slot bytes past each payload are
    # unconstrained there — both decode engines mask reads >= comp_len).
    import numpy as np

    from pim_compression_tpu.runtime import pipeline

    rng = random.Random(23)
    plain = (b"blockize and assemble ride parallel memcpys " * 300
             + rng.randbytes(4000)) * 3
    bs = 1024
    stream = native.compress(plain, block_size=bs)
    info = native.scan_frames(stream)
    nb = len(info["payload_off"])
    pad = -(-nb // 128) * 128

    comp_n, cl_n, ol_n = pipeline.blockize_compressed(stream, info, pad)
    comp_n = comp_n.copy()
    # NumPy reference path
    av = native.available
    try:
        native.available = lambda: False
        comp_p, cl_p, ol_p = pipeline.blockize_compressed(stream, info, pad)
    finally:
        native.available = av
    np.testing.assert_array_equal(comp_n, comp_p)
    np.testing.assert_array_equal(cl_n, cl_p)
    np.testing.assert_array_equal(ol_n, ol_p)

    # Pooled reuse at a SMALLER geometry must still zero stale pad bytes.
    small = native.compress(plain[: 5 * bs], block_size=bs)
    sinfo = native.scan_frames(small)
    comp_s, cl_s, _ = pipeline.blockize_compressed(small, sinfo, 128)
    comp_s = comp_s.copy()
    try:
        native.available = lambda: False
        comp_sp, _, _ = pipeline.blockize_compressed(small, sinfo, 128)
    finally:
        native.available = av
    np.testing.assert_array_equal(comp_s, comp_sp)

    # zero_pad=False: payload bytes intact, stream reassembles, frames OK.
    comp_f, cl_f, _ = pipeline.blockize_compressed(
        stream, info, pad, zero_pad=False
    )
    for i in range(nb):
        np.testing.assert_array_equal(
            comp_f[i, : cl_f[i]], comp_n[i, : cl_n[i]]
        )

    # Assemble: native parallel compaction reconstructs the stream
    # byte-identically (bytearray return compares equal to bytes).
    out = pipeline.assemble_compressed(
        comp_n, cl_n, info["total_len"], bs, nb
    )
    assert out == stream
    # Plain blockize + decompressed assembly round-trip.
    blocks, lens = pipeline.blockize_plain(plain, bs, pad)
    try:
        native.available = lambda: False
        blocks_p, lens_p = pipeline.blockize_plain(plain, bs, pad)
    finally:
        native.available = av
    np.testing.assert_array_equal(blocks, blocks_p)
    np.testing.assert_array_equal(lens, lens_p)
    assert pipeline.assemble_decompressed(blocks[:nb], len(plain)) == plain
