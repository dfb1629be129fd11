"""Smoke test: the interactive tuner example's scripted session (live
phase-continuous retuning while streaming)."""

import pathlib
import subprocess
import sys


def test_tuner_auto_session():
    repo = pathlib.Path(__file__).resolve().parents[1]
    r = subprocess.run(
        [sys.executable, str(repo / "examples" / "tuner.py"), "--auto"],
        capture_output=True, text=True, timeout=240,
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu",
             "XLA_FLAGS": ""},  # single CPU device: 8-dev mesh compiles slowly
    )
    assert "auto session OK" in r.stdout, r.stdout + r.stderr
