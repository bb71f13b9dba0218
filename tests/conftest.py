"""Test configuration.

Tests run on a virtual 8-device CPU mesh by default (the analog of the
reference's DPU functional simulator, see SURVEY.md §4): set JAX_PLATFORMS=cpu
and xla_force_host_platform_device_count=8 unless the user overrode them
(e.g. to run the suite against real TPU hardware).
"""

import os
import pathlib

os.environ.setdefault("JAX_PLATFORMS", "cpu")
if "--xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()

import pytest  # noqa: E402

CORPUS_DIR = pathlib.Path("/root/reference/test")

# (name, original size) — reference README.md:8-19; only the small/medium
# pairs are shipped in this snapshot (xml has no .txt twin but its .snappy
# self-describes its decompressed form via round-trip with the oracle).
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
