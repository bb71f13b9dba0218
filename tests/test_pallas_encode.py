"""Pallas encoder tests (interpret mode, small block size — size-parameterized
identical code paths; hardware covers production sizes)."""

import random

import numpy as np
import pytest

from pim_compression_tpu.format import oracle
from pim_compression_tpu.format.varint import encode_varint32
from pim_compression_tpu.ops import pallas_encode as pe
from pim_compression_tpu.ops import lane_model_encode as lme
import jax.numpy as jnp

from conftest import corpus_pair


def _encode(
    data: bytes, bs: int = 256, window: int = 64, coarse: int = 0,
    granular: bool = False,
) -> bytes:
    cap = pe.encode_capacity(bs)
    blocks = np.zeros((pe.BATCH, bs), np.uint8)
    lens = np.zeros(pe.BATCH, np.int32)
    raw = np.frombuffer(data, np.uint8)
    nb = max(1, (len(data) + bs - 1) // bs)
    assert nb <= pe.BATCH
    for i in range((len(data) + bs - 1) // bs):
        ch = raw[i * bs : (i + 1) * bs]
        blocks[i, : len(ch)] = ch
        lens[i] = len(ch)
    comp, sizes = pe.encode_blocks_pallas(
        blocks, lens, block_size=bs, window=window, coarse_window=coarse,
        granular=granular, interpret=True,
    )
    comp, sizes = np.asarray(comp), np.asarray(sizes)
    assert sizes.max(initial=0) <= cap
    stream = bytearray(encode_varint32(len(data)) + encode_varint32(bs))
    if len(data):
        for i in range((len(data) + bs - 1) // bs):
            stream += int(sizes[i]).to_bytes(4, "little")
            stream += comp[i, : sizes[i]].tobytes()
    return bytes(stream)


def test_pallas_encode_mixed_content():
    r = random.Random(7)
    data = (
        b"hello world " * 30
        + b"a" * 500
        + r.randbytes(400)
        + b"ab" * 300
        + r.randbytes(65)
    )
    stream = _encode(data)
    assert oracle.decompress(stream) == data
    assert len(stream) < len(data)


def test_pallas_encode_adversarial():
    r = random.Random(8)
    for data in [b"", b"x", b"q" * 256, r.randbytes(300), b"xyz" * 170]:
        assert oracle.decompress(_encode(data)) == data


def test_pallas_encode_coarse_long_range():
    # Repeat at an 8-aligned lag beyond the fine window; the sampled coarse
    # sweep must find it, and the result must match the NumPy lane model.
    from pim_compression_tpu.ops import lane_model_encode as lme

    r = random.Random(21)
    chunk = r.randbytes(300)
    data = chunk + r.randbytes(800 - 300) + chunk + r.randbytes(100)
    bs, window, coarse = 2048, 64, 1088  # 1088 = 64 + 4 * 256
    fine = _encode(data, bs=bs, window=window)
    stream = _encode(data, bs=bs, window=window, coarse=coarse)
    assert oracle.decompress(stream) == data
    assert len(stream) < len(fine) - 200

    blocks = np.zeros((1, bs), np.uint8)
    blocks[0, : len(data)] = np.frombuffer(data, np.uint8)
    lens = np.array([len(data)], np.int32)
    cap = pe.encode_capacity(bs)
    mcomp, msizes = lme.encode_lanes(blocks, lens, bs, cap, window, coarse)
    body = stream[len(stream) - len(mcomp[0, : msizes[0]].tobytes()) :]
    assert body == mcomp[0, : msizes[0]].tobytes()


def test_pallas_encode_coarse_randomized_model_parity():
    # Random mixes of short- and long-range redundancy: kernel output must
    # equal the NumPy spec byte-for-byte, and every stream must decode.
    from pim_compression_tpu.ops import lane_model_encode as lme

    bs, window, coarse = 1024, 32, 544  # 544 = 32 + 2 * 256
    cap = pe.encode_capacity(bs)
    r = random.Random(33)
    cases = []
    for _ in range(4):
        seed = r.randbytes(r.randint(40, 200))
        body = bytearray()
        while len(body) < bs - 100:
            if r.random() < 0.5:
                body += seed[: r.randint(4, len(seed))]
            else:
                body += r.randbytes(r.randint(1, 120))
        cases.append(bytes(body[: r.randint(bs // 2, bs)]))

    blocks = np.zeros((pe.BATCH, bs), np.uint8)
    lens = np.zeros(pe.BATCH, np.int32)
    for i, data in enumerate(cases):
        blocks[i, : len(data)] = np.frombuffer(data, np.uint8)
        lens[i] = len(data)
    comp, sizes = pe.encode_blocks_pallas(
        blocks, lens, block_size=bs, window=window, coarse_window=coarse,
        interpret=True,
    )
    comp, sizes = np.asarray(comp), np.asarray(sizes)
    mcomp, msizes = lme.encode_lanes(
        blocks[: pe.BATCH], lens[: pe.BATCH], bs, cap, window, coarse
    )
    for i, data in enumerate(cases):
        assert sizes[i] == msizes[i]
        assert comp[i, : sizes[i]].tobytes() == mcomp[i, : msizes[i]].tobytes()
        stream = (
            encode_varint32(len(data)) + encode_varint32(bs)
            + int(sizes[i]).to_bytes(4, "little") + comp[i, : sizes[i]].tobytes()
        )
        assert oracle.decompress(stream) == data


def test_pallas_encode_granular_model_parity():
    # Phased-granule kernel vs the NumPy spec, including a repeat at a
    # long NON-multiple-of-8 lag that the sampled sweep cannot see.
    from pim_compression_tpu.format import constants as C
    from pim_compression_tpu.ops import lane_model_encode as lme

    bs, window = 2048, 64
    coarse = 1500  # deliberately not chunk-aligned; dok mask bounds it
    r = random.Random(55)
    chunk = r.randbytes(250)
    cases = [
        chunk + r.randbytes(1237 - 250) + chunk + r.randbytes(80),
        (chunk + r.randbytes(711 - 250)) * 2 + chunk,
        r.randbytes(2000),
    ]
    blocks = np.zeros((pe.BATCH, bs), np.uint8)
    lens = np.zeros(pe.BATCH, np.int32)
    for i, data in enumerate(cases):
        blocks[i, : len(data)] = np.frombuffer(data, np.uint8)
        lens[i] = len(data)
    comp, sizes = pe.encode_blocks_pallas(
        blocks, lens, block_size=bs, window=window, coarse_window=coarse,
        granular=True, interpret=True,
    )
    comp, sizes = np.asarray(comp), np.asarray(sizes)

    cap = (C.max_compressed_length(bs) + 127) // 128 * 128
    d = blocks.T.astype(np.int32)
    best_len, best_off = lme.match_search_granular(
        d, lens, window, min(coarse, bs)
    )
    accept, is_copy = lme.greedy_parse(best_len, lens)
    mcomp, msizes = lme.layout_and_emit(
        d, lens, accept, is_copy, best_len, best_off, cap
    )
    for i, data in enumerate(cases):
        assert sizes[i] == msizes[i], f"case {i}"
        assert comp[i, : sizes[i]].tobytes() == mcomp[:, i][: msizes[i]].tobytes()
        stream = (
            encode_varint32(len(data)) + encode_varint32(bs)
            + int(sizes[i]).to_bytes(4, "little") + comp[i, : sizes[i]].tobytes()
        )
        assert oracle.decompress(stream) == data
    # the unsampled-lag repeat must actually compress
    assert sizes[0] < len(cases[0]) - 150


def test_pallas_runtime_engine_compress():
    from pim_compression_tpu import runtime
    from pim_compression_tpu.utils.config import CodecConfig

    data = b"pallas compress end to end " * 30 + random.Random(9).randbytes(200)
    cfg = CodecConfig(engine="pallas", block_size=256)
    stream = runtime.compress(data, cfg)
    assert oracle.decompress(stream) == data
    assert runtime.decompress(stream, cfg) == data


def test_pallas_emit_kernel_high_rows_bs16384():
    # Regression (round-1 advisor): the covering-head scan used a packed
    # (rows << 18) | value word that wraps negative for rows >= 8192, so at
    # bs=16384 literal destinations in the second half of the block were
    # wrong and the encoder silently emitted corrupt streams. Drive the emit
    # kernel directly (grid=1 group) at bs=16384 with match inputs from the
    # NumPy spec and require byte parity + oracle decode.
    import functools

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from pim_compression_tpu.ops import lane_model_encode as lme

    bs = 16384
    cap = pe.encode_capacity(bs)
    r = random.Random(99)
    phrase = b"second-half-rows-need-literals-and-copies-"
    body = bytearray()
    while len(body) < bs:
        body += r.randbytes(r.randint(20, 90))
        body += phrase
    data = bytes(body[:bs])

    blocks = np.zeros((1, bs), np.uint8)
    blocks[0] = np.frombuffer(data, np.uint8)
    lens = np.array([bs], np.int32)
    d = blocks.T.astype(np.int32)
    best_len, best_off = lme.match_search(d, lens, 64)
    accept, is_copy = lme.greedy_parse(best_len, lens)
    mcomp, msizes = lme.layout_and_emit(
        d, lens, accept, is_copy, best_len, best_off, cap
    )

    data_g = np.zeros((1, bs, pe.LANES), np.uint8)
    data_g[0, :, 0] = blocks[0]
    match_g = np.zeros((1, bs, pe.LANES), np.int32)
    match_g[0, :, 0] = best_len[:, 0] | (best_off[:, 0] << 7)
    lens_g = np.zeros((1, pe.SUBLANES, pe.LANES), np.int32)
    lens_g[0, :, 0] = bs

    nrows = pe._route_rows(bs, cap)
    comp_g, size_g = pl.pallas_call(
        functools.partial(pe._emit_kernel, bs=bs, cap=cap),
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, pe.SUBLANES, pe.LANES), lambda g: (g, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, cap, pe.LANES), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, pe.SUBLANES, pe.LANES), lambda g: (g, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, cap, pe.LANES), jnp.int8),
            jax.ShapeDtypeStruct((1, pe.SUBLANES, pe.LANES), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bs, pe.LANES), jnp.int32),
            pltpu.VMEM((nrows, pe.LANES), jnp.int32),
            pltpu.VMEM((bs + min(bs, 1024), pe.LANES), jnp.int32),
            pltpu.VMEM((nrows, pe.LANES), jnp.int32),  # PAY
            pltpu.VMEM((pe._stg_rows(bs), pe.LANES), jnp.int32),
            pltpu.VMEM((bs, pe.LANES), jnp.int32),
            pltpu.VMEM((bs, pe.LANES), jnp.int8),
            pltpu.VMEM((bs, pe.LANES), jnp.int16),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=True,
    )(
        jnp.asarray(data_g.view(np.int8)),
        jnp.asarray(match_g & 0x7F, dtype=np.int8),
        jnp.asarray(match_g >> 7, dtype=np.int16),
        jnp.asarray(lens_g),
    )

    size = int(np.asarray(size_g)[0, 0, 0])
    assert size == int(msizes[0])
    out = np.asarray(comp_g)[0, :size, 0].astype(np.uint8).tobytes()
    assert out == mcomp[:, 0][:size].tobytes()
    stream = (
        encode_varint32(len(data)) + encode_varint32(bs)
        + size.to_bytes(4, "little") + out
    )
    assert oracle.decompress(stream) == data


# ---------------------------------------------------------------------------
# Sorted matcher end-to-end (round-2): kernel-vs-spec byte parity + validity.
# ---------------------------------------------------------------------------


def test_pallas_sorted_matcher_parity_with_spec():
    bs = 1024
    r = random.Random(61)
    blocks = np.zeros((pe.BATCH, bs), np.uint8)
    lens = np.zeros(pe.BATCH, np.int32)
    seed = r.randbytes(300)
    for i in range(pe.BATCH):
        if i % 3 == 0:
            b = (seed * 5)[: r.randint(1, bs)]
        elif i % 3 == 1:
            b = r.randbytes(r.randint(1, bs))
        else:
            body = bytearray()
            while len(body) < bs:
                body += (
                    seed[: r.randint(4, 80)]
                    if r.random() < 0.5
                    else r.randbytes(r.randint(3, 60))
                )
            b = bytes(body[: r.randint(1, bs)])
        blocks[i, : len(b)] = np.frombuffer(b, np.uint8)
        lens[i] = len(b)

    comp_k, sizes_k = pe.encode_blocks_pallas(
        jnp.asarray(blocks),
        jnp.asarray(lens),
        block_size=bs,
        matcher="sorted",
        interpret=True,
    )
    cap = pe.encode_capacity(bs)
    comp_s, sizes_s = lme.encode_lanes(
        blocks, lens, bs, cap, matcher="sorted"
    )
    assert (np.asarray(sizes_k) == sizes_s).all()
    ck = np.asarray(comp_k)
    for i in range(pe.BATCH):
        assert (ck[i, : sizes_s[i]] == comp_s[i, : sizes_s[i]]).all()


def test_pallas_sorted_matcher_oracle_valid():
    bs = 2048
    data = corpus_pair("terror2")[0]
    nb = (len(data) + bs - 1) // bs
    pad_nb = (nb + pe.BATCH - 1) // pe.BATCH * pe.BATCH
    blocks = np.zeros((pad_nb, bs), np.uint8)
    lens = np.zeros(pad_nb, np.int32)
    raw = np.frombuffer(data, np.uint8)
    for i in range(nb):
        ch = raw[i * bs : (i + 1) * bs]
        blocks[i, : len(ch)] = ch
        lens[i] = len(ch)
    comp, sizes = pe.encode_blocks_pallas(
        jnp.asarray(blocks),
        jnp.asarray(lens),
        block_size=bs,
        matcher="sorted",
        interpret=True,
    )
    comp = np.asarray(comp)
    sizes = np.asarray(sizes)
    stream = bytearray(encode_varint32(len(data)) + encode_varint32(bs))
    for i in range(nb):
        stream += int(sizes[i]).to_bytes(4, "little")
        stream += comp[i, : sizes[i]].tobytes()
    assert oracle.decompress(bytes(stream)) == data
    # Sorted matcher must beat the round-1 sweep config on ratio.
    sw, sw_sizes = pe.encode_blocks_pallas(
        jnp.asarray(blocks),
        jnp.asarray(lens),
        block_size=bs,
        window=512,
        interpret=True,
    )
    assert sizes[:nb].sum() < np.asarray(sw_sizes)[:nb].sum()


@pytest.mark.parametrize("prev_k", [2, 4])
def test_pallas_sorted_prevk_parity(prev_k):
    # prev_k>=2 (2nd..k-th-nearest candidates on the 4-byte rung, computed
    # by iterated lag composition in _prev_step_kernel — no extra sort)
    # must stay byte-parity with the spec and decode, and must not
    # compress worse than prev_k=1 on repetitive data.
    bs = 1024
    r = random.Random(62)
    blocks = np.zeros((pe.BATCH, bs), np.uint8)
    lens = np.zeros(pe.BATCH, np.int32)
    seed = r.randbytes(200)
    for i in range(pe.BATCH):
        body = bytearray()
        while len(body) < bs:
            body += (
                seed[: r.randint(4, 90)]
                if r.random() < 0.6
                else r.randbytes(r.randint(3, 60))
            )
        b = bytes(body[: r.randint(1, bs)])
        blocks[i, : len(b)] = np.frombuffer(b, np.uint8)
        lens[i] = len(b)

    comp_k, sizes_k = pe.encode_blocks_pallas(
        jnp.asarray(blocks), jnp.asarray(lens), block_size=bs,
        matcher="sorted", prev_k=prev_k, interpret=True,
    )
    cap = pe.encode_capacity(bs)
    comp_s, sizes_s = lme.encode_lanes(
        blocks, lens, bs, cap, matcher="sorted", prev_k=prev_k
    )
    assert (np.asarray(sizes_k) == sizes_s).all()
    ck = np.asarray(comp_k)
    for i in range(pe.BATCH):
        assert (ck[i, : sizes_s[i]] == comp_s[i, : sizes_s[i]]).all()
        stream = (
            encode_varint32(int(lens[i])) + encode_varint32(bs)
            + int(sizes_s[i]).to_bytes(4, "little")
            + ck[i, : sizes_s[i]].tobytes()
        )
        assert oracle.decompress(stream) == blocks[i, : lens[i]].tobytes()
    base_sizes = np.asarray(
        lme.encode_lanes(blocks, lens, bs, cap, matcher="sorted")[1]
    )
    assert sizes_s.sum() <= base_sizes.sum()


@pytest.mark.parametrize("prev_k,sel_cap", [(2, 12), (4, 16)])
def test_pallas_sorted_selcap_parity(prev_k, sel_cap):
    # sel_cap > 0 (select-then-extend: cheap capped extension per prev
    # candidate, one full extension on the winner) must stay byte-parity
    # with the spec and decode. The selection differs from the full fold
    # only where two candidates both saturate the cap but diverge past it
    # (the winner is never worse than the nearest candidate: it only
    # displaces the nearest by a strictly longer capped length, which
    # implies the nearest's full extension ended below the cap).
    bs = 1024
    r = random.Random(77)
    blocks = np.zeros((pe.BATCH, bs), np.uint8)
    lens = np.zeros(pe.BATCH, np.int32)
    seed = r.randbytes(200)
    for i in range(pe.BATCH):
        body = bytearray()
        while len(body) < bs:
            body += (
                seed[: r.randint(4, 90)]
                if r.random() < 0.6
                else r.randbytes(r.randint(3, 60))
            )
        b = bytes(body[: r.randint(1, bs)])
        blocks[i, : len(b)] = np.frombuffer(b, np.uint8)
        lens[i] = len(b)

    comp_k, sizes_k = pe.encode_blocks_pallas(
        jnp.asarray(blocks), jnp.asarray(lens), block_size=bs,
        matcher="sorted", prev_k=prev_k, sel_cap=sel_cap, interpret=True,
    )
    cap = pe.encode_capacity(bs)
    comp_s, sizes_s = lme.encode_lanes(
        blocks, lens, bs, cap, matcher="sorted", prev_k=prev_k,
        sel_cap=sel_cap,
    )
    assert (np.asarray(sizes_k) == sizes_s).all()
    ck = np.asarray(comp_k)
    for i in range(pe.BATCH):
        assert (ck[i, : sizes_s[i]] == comp_s[i, : sizes_s[i]]).all()
        stream = (
            encode_varint32(int(lens[i])) + encode_varint32(bs)
            + int(sizes_s[i]).to_bytes(4, "little")
            + ck[i, : sizes_s[i]].tobytes()
        )
        assert oracle.decompress(stream) == blocks[i, : lens[i]].tobytes()


def test_pallas_sorted_extcap_neighbor_parity():
    # The round-4 flagship knobs: ext_cap caps the full extension (long
    # matches emit as chained copies <= ext_cap bytes) and neighbor folds
    # each position's left-neighbor match one byte shorter
    # (lane_model_encode.derive_neighbor). Kernel must stay byte-parity
    # with the spec and decode under both, alone and combined with the
    # fused select-then-extend (the production default).
    bs = 1024
    r = random.Random(91)
    blocks = np.zeros((pe.BATCH, bs), np.uint8)
    lens = np.zeros(pe.BATCH, np.int32)
    seed = r.randbytes(200)
    for i in range(pe.BATCH):
        body = bytearray()
        while len(body) < bs:
            body += (
                seed[: r.randint(4, 120)]
                if r.random() < 0.6
                else r.randbytes(r.randint(3, 60))
            )
        b = bytes(body[: r.randint(1, bs)])
        blocks[i, : len(b)] = np.frombuffer(b, np.uint8)
        lens[i] = len(b)

    for cfg in (
        dict(rungs=(4,), prev_k=2, sel_cap=16, sel_all=True, ext_cap=48,
             neighbor=True),  # the flagship default
        dict(rungs=(4,), prev_k=1, ext_cap=24, neighbor=True),
        dict(rungs=(4,), prev_k=2, sel_cap=16, ext_cap=48),
    ):
        comp_k, sizes_k = pe.encode_blocks_pallas(
            jnp.asarray(blocks), jnp.asarray(lens), block_size=bs,
            matcher="sorted", interpret=True, **cfg,
        )
        comp_s, sizes_s = lme.encode_lanes(
            blocks, lens, bs, pe.encode_capacity(bs), matcher="sorted",
            **cfg,
        )
        assert (np.asarray(sizes_k) == sizes_s).all(), cfg
        ck = np.asarray(comp_k)
        for i in range(pe.BATCH):
            assert (ck[i, : sizes_s[i]] == comp_s[i, : sizes_s[i]]).all(), cfg
            stream = (
                encode_varint32(int(lens[i])) + encode_varint32(bs)
                + int(sizes_s[i]).to_bytes(4, "little")
                + ck[i, : sizes_s[i]].tobytes()
            )
            assert oracle.decompress(stream) == blocks[i, : lens[i]].tobytes()


def test_pallas_sorted_rungs_subset_parity():
    # The --rungs knob (cycle/ratio tradeoff) must stay byte-parity with
    # the spec for reduced ladders, and every stream must decode.
    bs = 1024
    rungs = (4, 16, 64)
    data = corpus_pair("terror2")[0][: bs * 6]
    nb = (len(data) + bs - 1) // bs
    pad_nb = (nb + pe.BATCH - 1) // pe.BATCH * pe.BATCH
    blocks = np.zeros((pad_nb, bs), np.uint8)
    lens = np.zeros(pad_nb, np.int32)
    raw = np.frombuffer(data, np.uint8)
    for i in range(nb):
        ch = raw[i * bs : (i + 1) * bs]
        blocks[i, : len(ch)] = ch
        lens[i] = len(ch)
    comp, sizes = pe.encode_blocks_pallas(
        jnp.asarray(blocks), jnp.asarray(lens), block_size=bs,
        matcher="sorted", rungs=rungs, interpret=True,
    )
    comp, sizes = np.asarray(comp), np.asarray(sizes)
    cap = pe.encode_capacity(bs)
    mcomp, msizes = lme.encode_lanes(
        blocks, lens, bs, cap, matcher="sorted", rungs=rungs
    )
    full_sizes = np.asarray(
        pe.encode_blocks_pallas(
            jnp.asarray(blocks), jnp.asarray(lens), block_size=bs,
            matcher="sorted", interpret=True,
        )[1]
    )
    for i in range(nb):
        assert sizes[i] == msizes[i]
        assert comp[i, : sizes[i]].tobytes() == mcomp[i, : msizes[i]].tobytes()
        stream = (
            encode_varint32(int(lens[i])) + encode_varint32(bs)
            + int(sizes[i]).to_bytes(4, "little") + comp[i, : sizes[i]].tobytes()
        )
        assert oracle.decompress(stream) == blocks[i, : lens[i]].tobytes()
    # the reduced ladder compresses slightly worse than the full one
    assert sizes[:nb].sum() >= full_sizes[:nb].sum()


def test_pallas_sorted_stride2_parity():
    # The --stride2-min knob (half-density sort on long rungs, ~40% fewer
    # sort ops there) must stay byte-parity with the spec and decode; the
    # half-density ladder compresses no better than the full-density one.
    bs = 1024
    data = corpus_pair("plrabn12")[0][: bs * 6]
    nb = (len(data) + bs - 1) // bs
    pad_nb = (nb + pe.BATCH - 1) // pe.BATCH * pe.BATCH
    blocks = np.zeros((pad_nb, bs), np.uint8)
    lens = np.zeros(pad_nb, np.int32)
    raw = np.frombuffer(data, np.uint8)
    for i in range(nb):
        ch = raw[i * bs : (i + 1) * bs]
        blocks[i, : len(ch)] = ch
        lens[i] = len(ch)
    kw = dict(matcher="sorted", rungs=(4, 16, 64), prev_k=2, stride2_min=16)
    comp, sizes = pe.encode_blocks_pallas(
        jnp.asarray(blocks), jnp.asarray(lens), block_size=bs,
        interpret=True, **kw,
    )
    comp, sizes = np.asarray(comp), np.asarray(sizes)
    cap = pe.encode_capacity(bs)
    mcomp, msizes = lme.encode_lanes(blocks, lens, bs, cap, **kw)
    full_sizes = np.asarray(
        pe.encode_blocks_pallas(
            jnp.asarray(blocks), jnp.asarray(lens), block_size=bs,
            matcher="sorted", rungs=(4, 16, 64), prev_k=2, interpret=True,
        )[1]
    )
    for i in range(nb):
        assert sizes[i] == msizes[i]
        assert comp[i, : sizes[i]].tobytes() == mcomp[i, : msizes[i]].tobytes()
        stream = (
            encode_varint32(int(lens[i])) + encode_varint32(bs)
            + int(sizes[i]).to_bytes(4, "little") + comp[i, : sizes[i]].tobytes()
        )
        assert oracle.decompress(stream) == blocks[i, : lens[i]].tobytes()
    assert sizes[:nb].sum() >= full_sizes[:nb].sum()


def test_pallas_encode_non_pow2_block_size():
    # Regression: the in-place scan staging sized its fill region as bs/2,
    # but the deepest log-shift is 2^(nbit-1) which EXCEEDS bs/2 for
    # non-power-of-two block sizes (e.g. 768 -> shift 512), reading before
    # the staging region. Non-pow2 sizes take the sweep-matcher path.
    r = random.Random(77)
    bs = 768
    data = (b"non-pow2 block sizes ride the sweep matcher " * 40
            + r.randbytes(700)) * 2
    stream = _encode(data, bs=bs, window=64)
    assert oracle.decompress(stream) == data


@pytest.mark.parametrize(
    "bs,matcher",
    [(384, "sorted"), (384, "sweep"), (640, "sorted"), (1024, "sorted"),
     (1536, "sorted")],
)
def test_pallas_engine_fuzz_block_sizes(bs, matcher):
    # Cross-size fuzz through the full runtime: random, redundant and
    # RLE-heavy payloads must produce oracle-valid streams, round-trip,
    # and decode the oracle's own streams. Non-pow2 sizes exercise the
    # sorted matcher's pad-to-pow2 path and the emit kernel's
    # pow2-divisor chunk height (1536 -> CHB 512), plus the sweep path's
    # partial-chunk scan staging.
    from pim_compression_tpu import runtime
    from pim_compression_tpu.utils.config import CodecConfig

    r = random.Random(bs)
    cfg = CodecConfig(
        engine="pallas", block_size=bs, matcher=matcher, strict_engine=True
    )
    seed = r.randbytes(90)
    payloads = [
        r.randbytes(bs * 2 + 17),
        (seed * 40)[: bs * 3 - 5],
        (b"\x00" * 700 + r.randbytes(40)) * 4,
    ]
    for data in payloads:
        stream = runtime.compress(data, cfg)
        assert oracle.decompress(stream) == data
        assert runtime.decompress(stream, cfg) == data
        assert runtime.decompress(oracle.compress(data, bs), cfg) == data


def test_pallas_sorted_non_pow2_parity_with_padded_pow2():
    # A non-pow2 block size runs the rung sorts padded to the next power
    # of two. Junk (zero-pad) rows sit at positions >= bs, so they can
    # never be the nearest-PREVIOUS occurrence for a real row — the
    # matcher candidates, and therefore the emitted bytes, must be
    # IDENTICAL to encoding the same zero-padded payload at the pow2
    # block size with the true lengths.
    bs, pow2 = 768, 1024
    r = random.Random(91)
    data = (b"pad-to-pow2 keeps the full sort window " * 30
            + r.randbytes(250)) * 2
    raw = np.frombuffer(data[: 3 * bs], np.uint8)
    kw = dict(matcher="sorted", rungs=(4, 32), prev_k=2, interpret=True)

    blocks = np.zeros((128, bs), np.uint8)
    lens = np.zeros(128, np.int32)
    blocks[:3] = raw.reshape(3, bs)
    lens[:3] = bs
    comp_n, sizes_n = pe.encode_blocks_pallas(
        blocks, lens, block_size=bs, **kw
    )
    blocks_p = np.zeros((128, pow2), np.uint8)
    blocks_p[:, :bs] = blocks
    comp_p, sizes_p = pe.encode_blocks_pallas(
        blocks_p, lens, block_size=pow2, **kw
    )
    comp_n, sizes_n = np.asarray(comp_n), np.asarray(sizes_n)
    comp_p, sizes_p = np.asarray(comp_p), np.asarray(sizes_p)
    np.testing.assert_array_equal(sizes_n[:3], sizes_p[:3])
    for i in range(3):
        np.testing.assert_array_equal(
            comp_n[i, : sizes_n[i]], comp_p[i, : sizes_p[i]]
        )
        out = bytearray()
        oracle.decompress_block(
            memoryview(comp_n[i, : sizes_n[i]].tobytes()), out, 0
        )
        assert bytes(out) == data[i * bs : (i + 1) * bs]


def test_pallas_encode_partial_batch_groups():
    # Trimmed batches (G < 8 lane groups) and a full-batch-plus-tail call
    # must produce exactly the bytes of the padded full batch: the
    # small-input path that lets the 164-block 32 K corpus files skip
    # ~860 padded block slots.
    bs = 256
    r = random.Random(31)
    data = (b"trimmed group batches for small inputs " * 12 + r.randbytes(300))
    raw = np.frombuffer((data * 40)[: 250 * bs], np.uint8)  # 250 blocks
    full = np.zeros((pe.BATCH + 256, bs), np.uint8)
    lens_full = np.zeros(pe.BATCH + 256, np.int32)
    nb = len(raw) // bs
    full[:nb] = raw.reshape(nb, bs)
    lens_full[:nb] = bs
    ref_comp, ref_sizes = pe.encode_blocks_pallas(
        full[: pe.BATCH], lens_full[: pe.BATCH], block_size=bs,
        matcher="sorted", rungs=(4, 32), prev_k=2, interpret=True,
    )
    ref_comp, ref_sizes = np.asarray(ref_comp), np.asarray(ref_sizes)
    # G=2 trimmed call
    comp2, sizes2 = pe.encode_blocks_pallas(
        full[:256], lens_full[:256], block_size=bs,
        matcher="sorted", rungs=(4, 32), prev_k=2, interpret=True,
    )
    comp2, sizes2 = np.asarray(comp2), np.asarray(sizes2)
    assert comp2.shape[0] == 256
    np.testing.assert_array_equal(sizes2[:nb], ref_sizes[:nb])
    np.testing.assert_array_equal(comp2[:nb], ref_comp[:nb])
    # full batch + partial tail in one call
    comp_t, sizes_t = pe.encode_blocks_pallas(
        full, lens_full, block_size=bs,
        matcher="sorted", rungs=(4, 32), prev_k=2, interpret=True,
    )
    comp_t, sizes_t = np.asarray(comp_t), np.asarray(sizes_t)
    assert comp_t.shape[0] == pe.BATCH + 256
    np.testing.assert_array_equal(sizes_t[:nb], ref_sizes[:nb])
    np.testing.assert_array_equal(comp_t[:nb], ref_comp[:nb])


def test_pallas_sorted_matcher_64k_packing():
    # 64 K groundwork (the format's max block): above 32 K sorted rows the
    # packed sort word switches to 16 key + 16 position bits and the
    # unsort word's top bit is flipped (a 16-bit spos fills bits 16-31,
    # where a signed compare would otherwise invert the order). The
    # matcher kernel must equal the spec exactly at bs=65536.
    import jax.numpy as jnp

    from pim_compression_tpu.ops import pallas_match as pm

    bs = 65536
    data = open("/root/reference/test/world192.txt", "rb").read()[: 2 * bs]
    blocks = np.zeros((128, bs), np.uint8)
    lens = np.full(128, bs, np.int32)
    blocks[0] = np.frombuffer(data[:bs], np.uint8)
    blocks[1] = np.frombuffer(data[bs : 2 * bs], np.uint8)
    data_g = (
        jnp.asarray(blocks).T.reshape(bs, 1, 128).transpose(1, 0, 2)
    ).astype(jnp.int8)
    lens_bc = jnp.broadcast_to(
        jnp.asarray(lens).reshape(1, 128)[:, None, :], (1, 8, 128)
    )
    mlen, mlag = pm.sorted_match_groups(
        data_g, lens_bc, bs=bs, rungs=(4,), prev_k=2, sel_cap=16,
        sel_all=True, interpret=True,
    )
    mlen, mlag = np.asarray(mlen), np.asarray(mlag)
    sl, so = lme.match_search_sorted(
        blocks.T.astype(np.int32), lens, rungs=(4,), prev_k=2, sel_cap=16,
        sel_all=True,
    )
    np.testing.assert_array_equal(mlen[0, :, :2], sl[:, :2])
    np.testing.assert_array_equal(mlag[0, :, :2], so[:, :2])


def test_pallas_encode_wide_emit_parity():
    # The wide (64K) emit kernel streams its layout planes through HBM
    # workspaces (chunk windows + carried rows) instead of holding them
    # resident in VMEM; the routing reuses _route_tokens via chunk_in /
    # land_out hooks. Forced on at small sizes (the pipeline is
    # size-parameterized; the device validates 64K), it must produce
    # byte-identical streams to the resident kernel.
    r = random.Random(13)
    data = (
        b"wide emit streams its layout planes through HBM windows " * 60
        + r.randbytes(1500)
        + b"\x00" * 700
        + b"xy" * 500
    )
    for bs in (256, 1024):
        nb = -(-len(data) // bs)
        blocks = np.zeros((128, bs), np.uint8)
        lens = np.zeros(128, np.int32)
        for i in range(nb):
            ch = data[i * bs : (i + 1) * bs]
            blocks[i, : len(ch)] = np.frombuffer(ch, np.uint8)
            lens[i] = len(ch)
        kw = dict(
            block_size=bs, matcher="sorted", rungs=(4,), prev_k=2,
            sel_cap=16, sel_all=True, interpret=True,
        )
        cw, sw = pe.encode_blocks_pallas(
            jnp.asarray(blocks), jnp.asarray(lens), wide=True, **kw
        )
        cn, sn = pe.encode_blocks_pallas(
            jnp.asarray(blocks), jnp.asarray(lens), wide=False, **kw
        )
        cw, sw, cn, sn = map(np.asarray, (cw, sw, cn, sn))
        np.testing.assert_array_equal(sw[:nb], sn[:nb])
        for i in range(nb):
            np.testing.assert_array_equal(cw[i, : sw[i]], cn[i, : sn[i]])
            out = bytearray()
            oracle.decompress_block(
                memoryview(cw[i, : sw[i]].tobytes()), out, 0
            )
            assert bytes(out) == data[i * bs : (i + 1) * bs]


def test_pallas_sorted_window_parity():
    # sort_window > 0 runs each rung's bitonic chunk-locally (merges stop
    # at the window; the final merge is relabeled m so every group sorts
    # ascending) and the lag scan masks group boundaries. Kernel must stay
    # byte-parity with the spec at windows below, equal to, and above the
    # chunk height, with and without the fused select path, and the
    # streams must decode. Device speed/ratio tradeoff:
    # docs/sweep_stats.json.
    bs = 2048
    r = random.Random(123)
    blocks = np.zeros((pe.BATCH, bs), np.uint8)
    lens = np.zeros(pe.BATCH, np.int32)
    seed = r.randbytes(300)
    for i in range(pe.BATCH):
        body = bytearray()
        while len(body) < bs:
            body += (
                seed[: r.randint(4, 120)]
                if r.random() < 0.6
                else r.randbytes(r.randint(3, 60))
            )
        b = bytes(body[: r.randint(1, bs)])
        blocks[i, : len(b)] = np.frombuffer(b, np.uint8)
        lens[i] = len(b)

    for cfg in (
        dict(rungs=(4,), prev_k=2, sel_cap=16, sel_all=True, ext_cap=48,
             neighbor=True, sort_window=1024),  # flagship + window
        dict(rungs=(4,), prev_k=2, sort_window=512),
        dict(rungs=(4, 8), prev_k=1, sort_window=2048),  # == bs: full
    ):
        comp_k, sizes_k = pe.encode_blocks_pallas(
            jnp.asarray(blocks), jnp.asarray(lens), block_size=bs,
            matcher="sorted", interpret=True, **cfg,
        )
        comp_s, sizes_s = lme.encode_lanes(
            blocks, lens, bs, pe.encode_capacity(bs), matcher="sorted",
            **cfg,
        )
        assert (np.asarray(sizes_k) == sizes_s).all(), cfg
        ck = np.asarray(comp_k)
        for i in range(pe.BATCH):
            assert (ck[i, : sizes_s[i]] == comp_s[i, : sizes_s[i]]).all(), cfg
            stream = (
                encode_varint32(int(lens[i])) + encode_varint32(bs)
                + int(sizes_s[i]).to_bytes(4, "little")
                + ck[i, : sizes_s[i]].tobytes()
            )
            assert oracle.decompress(stream) == blocks[i, : lens[i]].tobytes()


def test_pallas_sorted_rung_pick_parity():
    # rung_pick: the longest rung with a candidate wins outright (no
    # capped select sweeps) and one from-scratch extension verifies it.
    # Kernel must stay byte-parity with the spec; streams must decode.
    bs = 1024
    r = random.Random(555)
    blocks = np.zeros((pe.BATCH, bs), np.uint8)
    lens = np.zeros(pe.BATCH, np.int32)
    seed = r.randbytes(300)
    for i in range(pe.BATCH):
        body = bytearray()
        while len(body) < bs:
            body += (
                seed[: r.randint(4, 120)]
                if r.random() < 0.6
                else r.randbytes(r.randint(3, 60))
            )
        b = bytes(body[: r.randint(1, bs)])
        blocks[i, : len(b)] = np.frombuffer(b, np.uint8)
        lens[i] = len(b)

    for cfg in (
        dict(rungs=(4, 16), prev_k=1, ext_cap=48, neighbor=True,
             rung_pick=True),  # the round-4 flagship candidate
        dict(rungs=(4, 16, 64), prev_k=1, ext_cap=64, rung_pick=True),
        dict(rungs=(4, 16), prev_k=1, rung_pick=True, sort_window=512),
    ):
        comp_k, sizes_k = pe.encode_blocks_pallas(
            jnp.asarray(blocks), jnp.asarray(lens), block_size=bs,
            matcher="sorted", interpret=True, **cfg,
        )
        comp_s, sizes_s = lme.encode_lanes(
            blocks, lens, bs, pe.encode_capacity(bs), matcher="sorted",
            **cfg,
        )
        assert (np.asarray(sizes_k) == sizes_s).all(), cfg
        ck = np.asarray(comp_k)
        for i in range(pe.BATCH):
            assert (ck[i, : sizes_s[i]] == comp_s[i, : sizes_s[i]]).all(), cfg
            stream = (
                encode_varint32(int(lens[i])) + encode_varint32(bs)
                + int(sizes_s[i]).to_bytes(4, "little")
                + ck[i, : sizes_s[i]].tobytes()
            )
            assert oracle.decompress(stream) == blocks[i, : lens[i]].tobytes()

def test_pallas_max_lag_span_parity():
    # max_lag (candidate reach cap) + sweep_span (gather span): kernel
    # byte-parity with the spec and oracle-valid streams. span is a pure
    # perf knob (identical output); max_lag changes candidates.
    bs = 1024
    r = random.Random(990)
    blocks = np.zeros((pe.BATCH, bs), np.uint8)
    lens = np.zeros(pe.BATCH, np.int32)
    seed = r.randbytes(200)
    for i in range(pe.BATCH):
        body = bytearray()
        while len(body) < bs:
            body += (
                seed[: r.randint(4, 100)]
                if r.random() < 0.7
                else r.randbytes(r.randint(3, 50))
            )
        b = bytes(body[: r.randint(1, bs)])
        blocks[i, : len(b)] = np.frombuffer(b, np.uint8)
        lens[i] = len(b)

    for cfg in (
        dict(rungs=(4, 16), rung_pick=True, ext_cap=48, neighbor=True,
             max_lag=256, sweep_span=8),  # the round-5 flagship shape
        dict(rungs=(4, 16), rung_pick=True, max_lag=128, sweep_span=16),
        dict(rungs=(4,), prev_k=2, sel_cap=16, sel_all=True, max_lag=256,
             sweep_span=8),  # select ladder with capped reach
    ):
        comp_k, sizes_k = pe.encode_blocks_pallas(
            jnp.asarray(blocks), jnp.asarray(lens), block_size=bs,
            matcher="sorted", interpret=True, **cfg,
        )
        comp_s, sizes_s = lme.encode_lanes(
            blocks, lens, bs, pe.encode_capacity(bs), matcher="sorted",
            **cfg,
        )
        assert (np.asarray(sizes_k) == sizes_s).all(), cfg
        ck = np.asarray(comp_k)
        for i in range(0, pe.BATCH, 37):
            assert (ck[i, : sizes_s[i]] == comp_s[i, : sizes_s[i]]).all(), cfg
            stream = (
                encode_varint32(int(lens[i])) + encode_varint32(bs)
                + int(sizes_s[i]).to_bytes(4, "little")
                + ck[i, : sizes_s[i]].tobytes()
            )
            assert oracle.decompress(stream) == blocks[i, : lens[i]].tobytes()


def test_pallas_sweep_span_output_invariant():
    # sweep_span only reorders the gather schedule — outputs must be
    # IDENTICAL across spans for the same config.
    bs = 512
    r = random.Random(13)
    blocks = np.zeros((pe.BATCH, bs), np.uint8)
    lens = np.full(pe.BATCH, bs, np.int32)
    for i in range(pe.BATCH):
        blocks[i] = np.frombuffer(
            (r.randbytes(40) * 20)[:bs], np.uint8
        )
    outs = []
    for span in (2, 4, 8, 16):
        comp, sizes = pe.encode_blocks_pallas(
            jnp.asarray(blocks), jnp.asarray(lens), block_size=bs,
            matcher="sorted", rungs=(4, 16), rung_pick=True,
            sweep_span=span, interpret=True,
        )
        outs.append((np.asarray(comp), np.asarray(sizes)))
    for comp, sizes in outs[1:]:
        assert (sizes == outs[0][1]).all()
        assert (comp == outs[0][0]).all()
