"""Mosaic lowering regression tier (VERDICT r1 item 8).

CI runs the Pallas kernels only in interpret mode at small block sizes; these
tests run the *TPU lowering path* (``jax.jit(...).trace(...).lower(
lowering_platforms=("tpu",))``) for the production shapes, so kernel edits
cannot silently break Mosaic lowering while the suite stays CPU-only. This
is the tier DESIGN.md's "Mosaic compatibility notes" describes: value-level
dynamic slices, cum* primitives, zero-size concats etc. all fail here, not
on hardware.

No execution happens: lowering builds the Mosaic MLIR module only (the
heavy Mosaic -> LLO compile still happens on device at first run).
"""

import functools

import jax
import jax.numpy as jnp
import pytest

from pim_compression_tpu.ops import pallas_decode as pd
from pim_compression_tpu.ops import pallas_encode as pe


def _lower(fn, *args):
    lowered = jax.jit(fn).trace(*args).lower(lowering_platforms=("tpu",))
    text = lowered.as_text()
    assert "tpu_custom_call" in text, "pallas kernel did not lower via Mosaic"
    return text


@pytest.mark.parametrize("bs", [8192, 32768])
def test_decode_lowering_production_shapes(bs):
    cap = pd.pallas_capacity(bs)
    fn = functools.partial(pd.decode_blocks_pallas, block_size=bs)
    _lower(
        fn,
        jax.ShapeDtypeStruct((pd.DFA_LANES, cap), jnp.uint8),
        jax.ShapeDtypeStruct((pd.DFA_LANES,), jnp.int32),
        jax.ShapeDtypeStruct((pd.DFA_LANES,), jnp.int32),
    )


@pytest.mark.parametrize(
    "bs,window,coarse,granular",
    [
        (8192, 512, 4096, True),  # bench default config
        (8192, 2048, 8192, True),  # best-ratio ladder config
        (16384, 512, 4096, True),
    ],
)
def test_encode_lowering_production_shapes(bs, window, coarse, granular):
    fn = functools.partial(
        pe.encode_blocks_pallas,
        block_size=bs,
        window=window,
        coarse_window=coarse,
        granular=granular,
    )
    _lower(
        fn,
        jax.ShapeDtypeStruct((pe.BATCH, bs), jnp.uint8),
        jax.ShapeDtypeStruct((pe.BATCH,), jnp.int32),
    )


@pytest.mark.parametrize("bs", [8192, 16384, 32768])
def test_encode_sorted_lowering_production_shapes(bs):
    fn = functools.partial(
        pe.encode_blocks_pallas, block_size=bs, matcher="sorted"
    )
    _lower(
        fn,
        jax.ShapeDtypeStruct((pe.BATCH, bs), jnp.uint8),
        jax.ShapeDtypeStruct((pe.BATCH,), jnp.int32),
    )


@pytest.mark.parametrize("bs", [16384, 32768])
def test_encode_sorted_prev2_lowering_production_shapes(bs):
    # prev_k=2 adds the lag-composition kernel (pallas_match._prev2_kernel)
    # plus one extra extension fold on the L=4 rung.
    fn = functools.partial(
        pe.encode_blocks_pallas, block_size=bs, matcher="sorted", prev_k=2
    )
    _lower(
        fn,
        jax.ShapeDtypeStruct((pe.BATCH, bs), jnp.uint8),
        jax.ShapeDtypeStruct((pe.BATCH,), jnp.int32),
    )


@pytest.mark.parametrize("bs", [16384, 32768])
def test_encode_sorted_stride2_lowering_production_shapes(bs):
    # stride2_min runs long rungs as half-density sorts with the
    # transpose/lane-gather compaction-expansion passes
    # (pallas_match._sort_rung_kernel stride=2).
    fn = functools.partial(
        pe.encode_blocks_pallas, block_size=bs, matcher="sorted",
        rungs=(4, 16, 64), prev_k=2, stride2_min=16,
    )
    _lower(
        fn,
        jax.ShapeDtypeStruct((pe.BATCH, bs), jnp.uint8),
        jax.ShapeDtypeStruct((pe.BATCH,), jnp.int32),
    )


@pytest.mark.parametrize("bs", [16384, 32768])
def test_encode_sorted_selcap_lowering_production_shapes(bs):
    # sel_cap runs the capped extend-fold variant (rounds=sel_cap//4) for
    # the prev ladder plus one full extension on the selected winner.
    fn = functools.partial(
        pe.encode_blocks_pallas, block_size=bs, matcher="sorted",
        rungs=(4, 32), prev_k=4, sel_cap=16,
    )
    _lower(
        fn,
        jax.ShapeDtypeStruct((pe.BATCH, bs), jnp.uint8),
        jax.ShapeDtypeStruct((pe.BATCH,), jnp.int32),
    )


def test_trimmed_partial_batch_lowering_production_shapes():
    # G=2 lane groups at the 32 K flagship config (the shape the 164-block
    # corpus files now dispatch): both directions must still Mosaic-lower.
    bs = 32768
    fn = functools.partial(
        pe.encode_blocks_pallas, block_size=bs, matcher="sorted",
        rungs=(4, 32), prev_k=4,
    )
    _lower(
        fn,
        jax.ShapeDtypeStruct((256, bs), jnp.uint8),
        jax.ShapeDtypeStruct((256,), jnp.int32),
    )
    cap = pd.pallas_capacity(bs)
    dfn = functools.partial(pd.decode_blocks_pallas, block_size=bs)
    _lower(
        dfn,
        jax.ShapeDtypeStruct((256, cap), jnp.uint8),
        jax.ShapeDtypeStruct((256,), jnp.int32),
        jax.ShapeDtypeStruct((256,), jnp.int32),
    )
