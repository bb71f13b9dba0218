"""Test configuration.

Tests run on a virtual 8-device CPU mesh by default (the analog of the
reference's DPU functional simulator, see SURVEY.md §4). The axon TPU-tunnel
sitecustomize imports jax at interpreter start, which pins the backend before
this conftest can configure it — so if that happened, re-exec the test run
with a cleaned environment. Set PIM_TPU_TESTS=1 to run the suite against the
real device instead.
"""

import os
import pathlib
import sys

_AXON_SITE = "/root/.axon_site"

import pytest  # noqa: E402


def _needs_reexec() -> bool:
    if os.environ.get("PIM_TPU_TESTS") == "1" or os.environ.get("_PIM_REEXEC") == "1":
        return False
    return os.environ.get("JAX_PLATFORMS") != "cpu" or any(
        _AXON_SITE in p for p in sys.path
    )


def pytest_configure(config):
    if not _needs_reexec():
        return
    # Restore the real stdout/stderr before exec so the replacement run's
    # output reaches the terminal.
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.stop_global_capturing()
    env = dict(os.environ)
    env["_PIM_REEXEC"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_NUM_CPU_DEVICES"] = "8"
    env["PYTHONPATH"] = os.pathsep.join(
        p
        for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and _AXON_SITE not in p
    )
    sys.stdout.flush()
    sys.stderr.flush()
    os.execvpe(sys.executable, list(sys.orig_argv), env)

CORPUS_DIR = pathlib.Path("/root/reference/test")

# Reference corpus (README.md:8-19); only the small/medium pairs ship in this
# snapshot (xml has no .txt twin — validated via oracle round-trip).
CORPUS_PAIRS = ["alice", "coding", "terror2", "plrabn12", "world192"]
CORPUS_SNAPPY_ONLY = ["xml"]


@pytest.fixture(scope="session")
def corpus_dir() -> pathlib.Path:
    if not CORPUS_DIR.is_dir():
        pytest.skip("reference corpus not available")
    return CORPUS_DIR


def corpus_pair(name: str) -> tuple[bytes, bytes]:
    return (
        (CORPUS_DIR / f"{name}.txt").read_bytes(),
        (CORPUS_DIR / f"{name}.snappy").read_bytes(),
    )


# ---------------------------------------------------------------------------
# Test tiers (VERDICT r4 weak #2: the full suite runs ~33-38 min on this
# VM — interpret-mode pallas kernels dominate). The fast tier
# (`make test`, `-m "not slow"`) keeps every engine's correctness gates
# and at least one pallas parity test per kernel family, measured 9:39
# quiet (the floor is ~160 tests x ~3s of JAX-on-CPU startup + interpret
# kernels); the slow tier (`make test-full`) re-runs every config-parity
# matrix. The second comments are measured per-test durations from the
# round-5 full run.
# ---------------------------------------------------------------------------

SLOW_TESTS = {
    "test_pallas_64k_blocks_end_to_end",  # 482s
    "test_run_benchmarks_selcap_axis",  # 129s
    "test_pallas_engine_fuzz_block_sizes",  # 35-55s per param
    "test_pallas_sorted_matcher_oracle_valid",  # 53s
    "test_pallas_sorted_window_parity",  # 53s
    "test_pallas_encode_granular_model_parity",  # 49s
    "test_pallas_sorted_rung_pick_parity",  # 46s
    "test_pallas_envelope_gate_falls_back_loudly",  # 45s
    "test_pallas_sorted_stride2_parity",  # 44s
    "test_pallas_encode_partial_batch_groups",  # 43s
    "test_pallas_sorted_matcher_64k_packing",  # 41s
    "test_pallas_sorted_prevk_parity",  # 34-39s per param
    "test_pallas_sorted_selcap_parity",  # 34-36s per param
    "test_pallas_sorted_extcap_neighbor_parity",  # 36s
    "test_compress_text_triage_is_identity",  # 33s
    "test_pallas_encode_wide_emit_parity",  # 32s
    "test_debug_block_dump",  # 28s
    "test_pallas_sorted_non_pow2_parity_with_padded_pow2",  # 25s
    "test_pallas_encode_coarse_long_range",  # 25s
    "test_pallas_sorted_rungs_subset_parity",  # 24s
    "test_pallas_max_lag_span_parity",  # 90s
    "test_pallas_sweep_span_output_invariant",  # 20s
    "test_pallas_encode_coarse_randomized_model_parity",  # 16s
    "test_pallas_decode_resolves_coarse_long_offsets",  # 16s
    "test_verify_on_device_roundtrip",  # 15s
    "test_verify_catches_decoder_disagreement",  # 15s
    "test_compress_mixed_roundtrip",  # 13s
    "test_pallas_decode_wide_token_path",  # 12s
    "test_dryrun_multichip_8",  # 12s (the 2-device variant stays fast)
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        base = item.name.split("[")[0]
        if base in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
