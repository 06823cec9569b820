"""Examples stay runnable (examples/ is user-facing documentation; a
silent API drift there is a doc bug). Only the fastest example runs in
CI — the other four were validated by execution when added and share
the same APIs."""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_example_scale_search_runs():
    out = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "examples", "02_scale_search.py"),
         "--cpu", "--n", "2000"],
        capture_output=True, text=True, timeout=600, cwd=REPO,
        env={k: v for k, v in os.environ.items()
             if k not in ("XLA_FLAGS",)})
    assert out.returncode == 0, out.stdout[-1500:] + out.stderr[-1500:]
    assert "exact top-10:" in out.stdout
    assert "ivf top-10" in out.stdout
    assert "host int8 ivf top-10:" in out.stdout
