"""The repo tools must stay runnable (VERDICT r3 items 4–5): exercise
tools/tpu_smoke.py end-to-end in interpret mode (subprocess, CPU).

tools/validate_pretrained.py has its own suite (test_validate_pretrained).
"""

import os
import pathlib
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]


@pytest.mark.slow
def test_tpu_smoke_interpret_all_pass():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "tpu_smoke.py"),
         "2", "128", "--interpret"],
        capture_output=True, text=True, timeout=1200, env=env,
        cwd=str(REPO))
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, out
    assert "SMOKE OK (5/5)" in out, out
    assert out.count("PASS") == 5, out
