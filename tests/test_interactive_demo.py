"""Interactive demo smoke: the keyboard-driven demo's selftest script runs
headlessly (reference demos/anymal_terrain.py keyboard control, C22)."""

import os
import subprocess
import sys

import pytest


@pytest.mark.slow  # full Anymal env build + policy compile
def test_interactive_selftest_runs():
    env = dict(os.environ)
    # single env can't shard over the suite's 8 virtual devices
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, "-m", "omniisaacgymenvs_tpu.demos.interactive",
         "task=Anymal", "pipeline=cpu", "selftest=1"],
        capture_output=True, text=True, timeout=500, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "selftest ok" in out.stdout
