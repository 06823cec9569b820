"""Disposable TPU compile-health probe.

Runs ONE tiny novel-shape jit (fresh odd dims from the pid, so it can
never be served from a warm program cache) and prints a JSON verdict.
Launch it nohup'd in the background and poll the log — NEVER block a
session on it, and never kill it: while the compile service is wedged
even backend init hangs ~25 min before failing UNAVAILABLE
(.claude/skills/verify/SKILL.md).

    nohup python tools/chip_probe.py > /tmp/probe.log 2>&1 &
"""
from __future__ import annotations

import json
import os
import time


def main() -> None:
    t0 = time.time()
    try:
        import jax
        import jax.numpy as jnp
        n = 131 + (os.getpid() % 97)          # novel odd shape per run
        m = 239 + (os.getpid() % 89)
        y = jax.jit(lambda a: (a * 1.3 + 0.7).sum())(jnp.ones((n, m)))
        print(json.dumps({
            "ok": True, "platform": jax.devices()[0].platform,
            "value": float(y), "shape": [n, m],
            "s": round(time.time() - t0, 1)}), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"ok": False, "error": str(e)[:300],
                          "s": round(time.time() - t0, 1)}), flush=True)


if __name__ == "__main__":
    main()
