"""Lane-parallel decode tests.

The NumPy lane model (the executable spec) is exercised at full block sizes;
the Pallas kernels run in interpret mode at a small block size (the pipeline
is size-parameterized with identical code paths; hardware runs cover the
large sizes). Mirrors SURVEY.md §4: kernels in interpret mode on CPU first.
"""

import random

import numpy as np
import pytest

from pim_compression_tpu.format import constants as C
from pim_compression_tpu.format import oracle
from pim_compression_tpu.ops import lane_model, pallas_decode


def _blockize(stream: bytes, cap: int, pad_to: int):
    total, bs, frames = oracle.scan_block_frames(stream)
    nb = len(frames)
    n = max(pad_to, ((nb + pad_to - 1) // pad_to) * pad_to) if pad_to else nb
    comp = np.zeros((n, cap), np.uint8)
    clen = np.zeros(n, np.int32)
    olen = np.zeros(n, np.int32)
    off = 0
    for i, (o, s) in enumerate(frames):
        comp[i, :s] = np.frombuffer(stream[o : o + s], np.uint8)
        clen[i] = s
        olen[i] = min(bs, total - off)
        off += olen[i]
    return comp, clen, olen, nb, bs


# ---------------------------------------------------------------------------
# Lane model (spec) at production block size.
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("name", ["coding", "terror2"])
def test_lane_model_corpus(corpus_dir, name):
    data = (corpus_dir / f"{name}.txt").read_bytes()
    stream = oracle.compress(data, 8192)
    cap = pallas_decode.pallas_capacity(8192)
    comp, clen, olen, nb, bs = _blockize(stream, cap, pad_to=0)
    out, err = lane_model.decode_lanes(comp, clen, olen, bs)
    assert not err[:nb].any()
    got = b"".join(out[i, : olen[i]].tobytes() for i in range(nb))
    assert got == data


def test_lane_model_flags_bad_offset():
    bs = 8192
    cap = pallas_decode.pallas_capacity(bs)
    payload = bytes([0x00, ord("A"), lane_model.KIND_LIT & 0, 0])  # copy1 off=0
    payload = bytes([0x00, ord("A"), 0x01, 0x00])
    comp = np.zeros((1, cap), np.uint8)
    comp[0, : len(payload)] = np.frombuffer(payload, np.uint8)
    out, err = lane_model.decode_lanes(
        comp, np.array([len(payload)], np.int32), np.array([5], np.int32), bs
    )
    assert err[0] & lane_model.ERR_BAD_OFFSET


def test_routing_property_monotone_conflict_free():
    rng = np.random.default_rng(123)
    for _ in range(50):
        nrows, cap = 512, 200
        n_tok = int(rng.integers(1, cap))
        src = np.sort(rng.choice(cap, size=n_tok, replace=False))
        dst = cap + np.sort(rng.choice(nrows - cap, size=n_tok, replace=False))
        tokens = np.zeros((cap, 1), np.int32)
        tokens[src, 0] = (
            lane_model.OCCUPIED
            | (dst << lane_model.DST_SHIFT)
            | (lane_model.KIND_LIT << lane_model.KIND_SHIFT)
            | (np.arange(n_tok) & 0xFF)
        )
        err = np.zeros(1, np.int32)
        W, err = lane_model.butterfly_route(tokens, nrows, err)
        landed = np.nonzero((W[:, 0] & lane_model.OCCUPIED) != 0)[0]
        assert err[0] == 0
        assert np.array_equal(landed, dst)
        assert np.array_equal(W[landed, 0] & 0xFF, np.arange(n_tok) & 0xFF)


# ---------------------------------------------------------------------------
# Pallas kernels, interpret mode, small block size.
# ---------------------------------------------------------------------------


def test_pallas_kernels_interpret_roundtrip():
    bs = 256
    cap = pallas_decode.pallas_capacity(bs)
    r = random.Random(7)
    data = (
        b"hello world " * 30
        + b"a" * 500
        + r.randbytes(400)
        + b"ab" * 300
        + r.randbytes(65)
    )
    stream = oracle.compress(data, bs)
    comp, clen, olen, nb, _ = _blockize(stream, cap, pad_to=pallas_decode.DFA_LANES)
    out, err = pallas_decode.decode_blocks_pallas(
        comp, clen, olen, block_size=bs, interpret=True
    )
    out, err = np.asarray(out), np.asarray(err)
    assert not err.any()
    got = b"".join(out[i, : olen[i]].tobytes() for i in range(nb))
    assert got == data


def test_pallas_runtime_engine_small_blocks():
    from pim_compression_tpu import runtime
    from pim_compression_tpu.utils.config import CodecConfig

    data = b"pallas engine end to end " * 40 + random.Random(9).randbytes(300)
    cfg = CodecConfig(engine="pallas", block_size=256)
    stream = runtime.compress(data, cfg)
    assert runtime.decompress(stream, cfg) == data
    assert oracle.decompress(stream) == data


def test_lane_model_accepts_copy4():
    payload = bytes([4 << 2]) + b"ABCDE" + bytes([3 | (2 << 2), 5, 0, 0, 0])
    expected = b"ABCDEABC"
    bs = 256
    cap = pallas_decode.pallas_capacity(bs)
    comp = np.zeros((1, cap), np.uint8)
    comp[0, : len(payload)] = np.frombuffer(payload, np.uint8)
    out, err = lane_model.decode_lanes(
        comp, np.array([len(payload)], np.int32),
        np.array([len(expected)], np.int32), bs,
    )
    assert not err.any()
    assert out[0, : len(expected)].tobytes() == expected


def test_pallas_decode_resolves_coarse_long_offsets():
    # Streams from the coarse matcher carry COPY_2 offsets approaching the
    # block size; the pallas decoder's adaptive resolve sweep must cover
    # those distances, end-to-end through the runtime (encode + decode both
    # pallas, interpret mode on CPU).
    from pim_compression_tpu import runtime
    from pim_compression_tpu.utils.config import CodecConfig

    r = random.Random(41)
    chunk = r.randbytes(400)
    data = (chunk + r.randbytes(1504 - 400) + chunk) * 3  # lags 1504 & in-block
    cfg = CodecConfig(
        engine="pallas", block_size=2048, match_window=64, coarse_window=1600
    )
    stream = runtime.compress(data, cfg)
    assert len(stream) < len(data) - 500  # long-lag repeats must compress
    assert oracle.decompress(stream) == data
    assert runtime.decompress(stream, cfg) == data


def test_pallas_runtime_rejects_corrupt_structure():
    """Structural corruption must surface as a typed error through the
    pallas engine's validation flags (not silent garbage)."""
    from pim_compression_tpu import runtime
    from pim_compression_tpu.utils.config import CodecConfig
    from pim_compression_tpu.utils.errors import SnappyError

    data = b"validate the pallas path " * 40
    cfg = CodecConfig(engine="pallas", block_size=256)
    stream = bytearray(runtime.compress(data, cfg))
    # Truncate the final block's payload but keep the frame word intact:
    # the DFA must flag ELEMENT_OVERRUN / LENGTH_MISMATCH.
    del stream[-3:]
    try:
        out = runtime.decompress(bytes(stream), cfg)
    except (SnappyError, ValueError):
        return  # typed rejection — good
    assert out != data, "corrupt stream decoded to the original?!"


def test_pallas_kernels_interpret_32k_blocks():
    # The format's default 32 KB blocks (dpu_snappy.c:100): exercises the
    # wide token packing (dst/value 15 bits, OCCUPIED at the sign bit), the
    # 32768-row expand/fill, and deep RLE chains through the adaptive
    # resolve. Highly compressible data keeps cap (and so interpret-mode
    # cost) small while the output space is the full 32 K rows.
    bs = 32768
    r = random.Random(13)
    phrase = b"thirty-two kilobyte blocks are the reference operating point. "
    data = (
        phrase * 200
        + b"z" * 20000  # RLE chain ~20000 deep -> needs 15 resolve rounds
        + r.randbytes(700)
        + phrase * 80
    )
    data = data[: bs + 2000]  # 2 blocks: one full, one partial
    stream = oracle.compress(data, bs)
    _, _, frames = oracle.scan_block_frames(stream)
    cap = ((max(s for _, s in frames) + 127) // 128 * 128) + 128
    comp, clen, olen, nb, _ = _blockize(stream, cap, pad_to=pallas_decode.DFA_LANES)
    out, err = pallas_decode.decode_blocks_pallas(
        comp, clen, olen, block_size=bs, interpret=True
    )
    out, err = np.asarray(out), np.asarray(err)
    assert not err[:nb].any()
    got = b"".join(out[i, : olen[i]].tobytes() for i in range(nb))
    assert got == data


def test_lane_model_32k_wide_packing():
    # Spec-level check at bs=32768 with destinations past the old 14-bit
    # packing limit and copies whose sources sit below 16384 while their
    # destinations sit above it.
    bs = 32768
    r = random.Random(17)
    seed = r.randbytes(120)
    body = bytearray(r.randbytes(16000))
    while len(body) < 31000:
        body += seed + r.randbytes(r.randint(10, 60))
    data = bytes(body[:bs])
    stream = oracle.compress(data, bs)
    _, _, frames = oracle.scan_block_frames(stream)
    cap = (max(s for _, s in frames) + 127) // 128 * 128
    comp, clen, olen, nb, _ = _blockize(stream, cap, pad_to=0)
    out, err = lane_model.decode_lanes(comp, clen, olen, bs)
    assert not err[:nb].any()
    got = b"".join(out[i, : olen[i]].tobytes() for i in range(nb))
    assert got == data


def test_pallas_decode_partial_batch_groups():
    # Trimmed batches: G < 8 lane groups (the small-input path — e.g. the
    # 164-block 32 K corpus files dispatch 2 groups, not 1024 padded
    # slots), and a full batch plus a partial tail in one call.
    bs = 256
    cap = pallas_decode.pallas_capacity(bs)
    r = random.Random(21)
    small = (b"group-trimmed batches " * 40 + r.randbytes(500)) * 30  # 162 bl
    tailed = small * 7  # 1134 blocks: one full 1024-batch + a real tail
    for data, pad_to in ((small, 256), (tailed, pallas_decode.DFA_LANES + 128)):
        stream = oracle.compress(data, bs)
        comp, clen, olen, nb, _ = _blockize(stream, cap, pad_to=128)
        assert nb <= pad_to
        grow = pad_to - comp.shape[0]
        comp = np.pad(comp, ((0, grow), (0, 0)))
        clen, olen = np.pad(clen, (0, grow)), np.pad(olen, (0, grow))
        out, err = pallas_decode.decode_blocks_pallas(
            comp, clen, olen, block_size=bs, interpret=True
        )
        out, err = np.asarray(out), np.asarray(err)
        assert out.shape[0] == pad_to
        assert not err[:nb].any()
        got = b"".join(out[i, : olen[i]].tobytes() for i in range(nb))
        assert got == data


def test_pallas_decode_wide_token_path():
    # The wide (two-plane) token format serves 32K < bs <= 64K — the
    # format's documented max (snappy/README.md:7): an int32 routing word
    # (OCC | dst<<8 | kind) plus an int16 value plane that rides every
    # compact/expand/fill move, with staging-free routing and the resolve
    # S-plane in W_s's margin region. Forced on at small sizes here (the
    # pipeline is size-parameterized; hardware validates 64K), it must
    # produce byte-identical output to the narrow kernel, including RLE
    # overlaps, COPY_4 elements, and corrupt-stream error flags.
    import jax.numpy as jnp

    r = random.Random(9)
    data = (
        b"wide tokens ride a second plane through every routing move " * 40
        + r.randbytes(900)
        + b"\x00" * 500
        + b"ab" * 400
    )
    for bs in (256, 1024):
        cap = pallas_decode.pallas_capacity(bs)
        stream = oracle.compress(data, bs)
        comp, clen, olen, nb, _ = _blockize(stream, cap, pad_to=128)
        args = (jnp.asarray(comp), jnp.asarray(clen), jnp.asarray(olen))
        out_w, err_w = pallas_decode.decode_blocks_pallas(
            *args, block_size=bs, interpret=True, wide=True
        )
        out_n, err_n = pallas_decode.decode_blocks_pallas(
            *args, block_size=bs, interpret=True, wide=False
        )
        out_w, err_w = np.asarray(out_w), np.asarray(err_w)
        assert not err_w[:nb].any()
        np.testing.assert_array_equal(out_w[:nb], np.asarray(out_n)[:nb])
        got = b"".join(out_w[i, : olen[i]].tobytes() for i in range(nb))
        assert got == data

    # COPY_4 + corrupt stream through the wide path.
    bs = 256
    cap = pallas_decode.pallas_capacity(bs)
    payload = bytes([0x00 << 2 | 0]) + b"Q"  # 1-byte literal
    payload += bytes([((4 - 1) << 2) | 3]) + (1).to_bytes(4, "little")  # COPY_4
    stream = (
        bytes([5, bs & 0x7F | 0x80, bs >> 7])
        + len(payload).to_bytes(4, "little")
        + payload
    )
    comp, clen, olen, nb, _ = _blockize(stream, cap, pad_to=128)
    out_w, err_w = pallas_decode.decode_blocks_pallas(
        jnp.asarray(comp), jnp.asarray(clen), jnp.asarray(olen),
        block_size=bs, interpret=True, wide=True,
    )
    assert not np.asarray(err_w)[:nb].any()
    assert np.asarray(out_w)[0, :5].tobytes() == b"QQQQQ"

    bad = bytearray(stream)
    bad[-5] = ((60 - 1) << 2) | 2  # overlong COPY_2 in place of the COPY_4
    comp, clen, olen, nb, _ = _blockize(bytes(bad), cap, pad_to=128)
    _, err_w = pallas_decode.decode_blocks_pallas(
        jnp.asarray(comp), jnp.asarray(clen), jnp.asarray(olen),
        block_size=bs, interpret=True, wide=True,
    )
    assert np.asarray(err_w)[0] != 0
