"""Minimal repro: does the axon backend hang when device work is
issued from a non-main thread?

Why: tools/soak.py hung twice (2/2 sessions) in its first /api/ingest
with ZERO CPU progress — kernel stacks showed the HTTP handler thread
parked on a futex waiting for an axon-client reply while the client's
tokio runtime idled in epoll (lost wakeup), and a disposable
main-thread chip probe compiled + ran fine in the same window. Every
other chip tool in this repo drives JAX from the MAIN thread; the HTTP
service is the only place device work originates from ephemeral
request-handler threads.

Stages (each printed as it completes; a missing line = the hang):
  main_put       device_put + jit + readback from the main thread
  thread_put     the same from a fresh threading.Thread
  thread_fresh   a thread that is the FIRST to touch the backend
                 (run with MAS_PROBE_FRESH=1; separate process)

Run on the TPU host, bounded:
    timeout 240 python tools/probe_thread_hang.py

Feeds the serve() threading fix in service/server.py (the reference's
Streamlit app is single-threaded per session and never hits this:
/root/reference/audio_search.py:702-711).
"""
from __future__ import annotations

import json
import os
import pathlib
import sys
import threading
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

TIMEOUT_S = 60.0


def work(tag: str) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    t0 = time.perf_counter()
    x = jax.device_put(np.arange(17 * 131, dtype=np.float32)
                       .reshape(17, 131) + hash(tag) % 7)
    y = jax.jit(lambda a: (a * 2 + 1).sum())(x)
    v = float(jnp.asarray(y).ravel()[0])   # real readback (axon: b_u_r lies)
    print(json.dumps({"stage": tag, "ok": True, "v": v,
                      "s": round(time.perf_counter() - t0, 2)}), flush=True)


def run_in_thread(tag: str) -> bool:
    done = threading.Event()

    def tgt() -> None:
        work(tag)
        done.set()

    th = threading.Thread(target=tgt, daemon=True, name=tag)
    th.start()
    if not done.wait(TIMEOUT_S):
        print(json.dumps({"stage": tag, "ok": False,
                          "detail": f"HUNG > {TIMEOUT_S:.0f}s"}), flush=True)
        return False
    return True


def main() -> None:
    if os.environ.get("MAS_PROBE_FRESH"):
        # backend first touched from a non-main thread
        ok = run_in_thread("thread_fresh")
        print(json.dumps({"verdict_fresh": ok}), flush=True)
        return
    import jax
    print(json.dumps({"platform": jax.devices()[0].platform}), flush=True)
    work("main_put")
    ok = run_in_thread("thread_put")
    ok2 = run_in_thread("thread_put_2") if ok else None
    print(json.dumps({"verdict": {"main_ok": True, "thread_ok": ok,
                                  "thread2_ok": ok2}}), flush=True)


if __name__ == "__main__":
    main()
    os._exit(0)   # axon teardown can hang post-measurement (bench.py)
