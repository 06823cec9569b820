"""REAL multi-process DCN validation (tools/multiprocess_dcn_check.py).

The in-process virtual-device tests (test_distributed.py) prove mesh
semantics; this proves the same code over actual OS process boundaries:
2 processes x 4 CPU devices each, jax.distributed.initialize via a
localhost coordinator, collectives over Gloo — the closest
hardware-free approximation of a multi-host TPU pod (ROADMAP 19).
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_dcn_check():
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "MPDCN_PROC")}
    port = 20000 + os.getpid() % 10000
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools",
                                      "multiprocess_dcn_check.py"),
         "--port", str(port)],
        env=env, capture_output=True, text=True, timeout=900, cwd=REPO)
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "ALL OK" in out.stdout
    assert out.stdout.count("MPDCN_OK") == 2
