"""CLI tests: flag compatibility, stdout contract, error paths."""

import pathlib
import subprocess
import sys

import pytest

from conftest import CORPUS_DIR

REPO = pathlib.Path(__file__).resolve().parent.parent


def run_cli(*args, cwd):
    return subprocess.run(
        [sys.executable, "-m", "pim_compression_tpu.cli", *args],
        capture_output=True,
        text=True,
        cwd=cwd,
        env={
            "PATH": "/usr/bin:/bin",
            "PYTHONPATH": str(REPO),
            "JAX_PLATFORMS": "cpu",
            "HOME": "/root",
        },
    )


@pytest.fixture
def tmp_cwd(tmp_path):
    return tmp_path


def test_cli_decompress_golden(corpus_dir, tmp_cwd):
    r = run_cli("-i", str(corpus_dir / "coding.snappy"), "-o", "out.bin", cwd=tmp_cwd)
    assert r.returncode == 0, r.stderr
    assert "Compression ratio:" in r.stdout
    assert "kernel time:" in r.stdout
    assert (tmp_cwd / "out.bin").read_bytes() == (corpus_dir / "coding.txt").read_bytes()


def test_cli_compress_bit_exact(corpus_dir, tmp_cwd):
    r = run_cli("-c", "-i", str(corpus_dir / "coding.txt"), "-o", "out.snappy", cwd=tmp_cwd)
    assert r.returncode == 0, r.stderr
    assert (tmp_cwd / "out.snappy").read_bytes() == (
        corpus_dir / "coding.snappy"
    ).read_bytes()


def test_cli_block_size_flag(tmp_cwd):
    src = tmp_cwd / "in.txt"
    src.write_bytes(b"block size flag test " * 500)
    r = run_cli("-c", "-b", "1024", "-i", str(src), "-o", "c.snappy", cwd=tmp_cwd)
    assert r.returncode == 0, r.stderr
    r = run_cli("-i", "c.snappy", "-o", "rt.txt", cwd=tmp_cwd)
    assert r.returncode == 0, r.stderr
    assert (tmp_cwd / "rt.txt").read_bytes() == src.read_bytes()


def test_cli_json_metrics(corpus_dir, tmp_cwd):
    r = run_cli(
        "-c", "-i", str(corpus_dir / "alice.txt"), "-o", "a.snappy", "--json",
        cwd=tmp_cwd,
    )
    assert r.returncode == 0
    import json

    line = [l for l in r.stdout.splitlines() if l.startswith("{")][0]
    m = json.loads(line)
    assert m["engine"] == "native"
    assert m["original_bytes"] == 312


def test_cli_missing_input(tmp_cwd):
    r = run_cli("-i", "nope.bin", cwd=tmp_cwd)
    assert r.returncode == 2
    assert "not found" in r.stderr


def test_cli_bad_block_size(tmp_cwd):
    (tmp_cwd / "x").write_bytes(b"x")
    r = run_cli("-c", "-b", "999999", "-i", "x", cwd=tmp_cwd)
    assert r.returncode == 2
    assert "block_size" in r.stderr


def test_cli_corrupt_stream(tmp_cwd):
    (tmp_cwd / "bad.snappy").write_bytes(b"\xff" * 40)
    r = run_cli("-i", "bad.snappy", cwd=tmp_cwd)
    assert r.returncode == 1
    assert "error" in r.stderr


def test_preset_operating_points_valid():
    # Every preset x block size resolves to a valid CodecConfig, and the
    # CLI maps --preset to the table (explicit flags still override).
    from pim_compression_tpu.utils.config import (
        CodecConfig, OPERATING_POINTS, preset_overrides,
    )

    for preset, table in OPERATING_POINTS.items():
        for bs in (*table, 24576, 256):
            kw = preset_overrides(preset, bs)
            cfg = CodecConfig(block_size=bs, engine="pallas", **kw)
            if bs == 65536:
                # the wide emit path needs the fused select ladder
                assert cfg.sel_all and cfg.sel_cap
            else:
                assert cfg.effective_rung_pick
    # speed trades reach/span for iterations, ratio keeps full reach
    assert OPERATING_POINTS["ratio"][32768]["max_lag"] == 0
    assert (
        OPERATING_POINTS["speed"][32768]["max_lag"]
        <= OPERATING_POINTS["balanced"][32768]["max_lag"]
    )


def test_cli_preset_flag_overrides(tmp_path):
    # --preset sets knobs; an explicit knob flag wins over the preset.
    import pim_compression_tpu.cli as cli

    src = tmp_path / "in.txt"
    src.write_bytes(b"preset override check " * 200)
    out = tmp_path / "out.snappy"
    rc = cli.main(
        ["-c", "--engine", "oracle", "--preset", "speed",
         "--max-lag", "1024", "-i", str(src), "-o", str(out)]
    )
    assert rc == 0 and out.stat().st_size > 0
