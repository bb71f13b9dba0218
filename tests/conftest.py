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
