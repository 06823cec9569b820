"""Does host->device transfer overlap device compute on this runtime?

Why this matters: fast_lossless ingest is transfer-bound, and the
round-5 bench's host_ms shows wait ~= wire_time + compute_time (serial
sum) while the round-4 parity run's wait was BELOW its serial sum —
i.e. transfer/compute overlap seems to come and go. The ingest dispatch
loop (pipelines/ingest.py::process_waveform) interleaves
put(b1), compute(b1), put(b2), compute(b2); if the tunnel client
executes that command stream strictly in order, batch 2's wire time
cannot hide under batch 1's compute and the loop's intended pipelining
buys nothing.

This probe answers the question with >=500 ms stages (wall timing is
valid above the tunnel's +-10 ms RTT jitter) in ONE process so session
weather cancels:

  put_only       N batches device_put + drain, nothing else: wire s/batch
  compute_only   calibrated matmul loop on RESIDENT data: compute s/run
  interleaved    the ingest loop's exact ordering:
                 [put(b); y=f(b) for each b]; drain all — the measured
                 pipeline as shipped
  put_under_compute
                 dispatch compute on resident data, then device_put a
                 fresh batch while it runs, drain both: wall ~= max()
                 if the runtime overlaps H2D with compute at all,
                 ~= sum() if it cannot
  threaded       puts issued from a background thread as computes are
                 dispatched in order: does explicit concurrency beat
                 the in-order client stream?

Decision rule: if put_under_compute ~= max() but interleaved ~= sum(),
the runtime CAN overlap and the ingest ordering is the blocker ->
restructure (pre-put batches / thread the puts). If put_under_compute
~= sum(), the tunnel serializes H2D with compute and the serial wait
is structural — record it and stop chasing.

Run plain on the TPU (background, no timeout):
    python tools/probe_transfer_overlap.py

Reference ingest contract this feeds: /root/reference/audio_search.py
:227-233 (upload -> segments); the transfer path is this repo's
tpu-native addition.
"""
from __future__ import annotations

import json
import pathlib
import sys
import threading
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import bench  # noqa: E402

N_BATCH = 4          # batches; 4 gives 3 hideable transfers
SEG = 160_000        # 10 s at 16 kHz
B = 64               # segments per batch


def main() -> None:
    ok, detail, probe_s = bench.probe_tpu_with_retry()
    if not ok:
        print(json.dumps({"ok": False, "detail": detail}), flush=True)
        return
    import jax
    import jax.numpy as jnp
    import numpy as np

    plat = jax.devices()[0].platform
    cal = bench.calibrate(plat == "tpu")
    print(json.dumps({"calibration": cal}), flush=True)

    rng = np.random.default_rng(0)
    # int16 with audio-like correlation (the tunnel compresses; white
    # noise would understate the real wire rate for int16/int16d)
    base = np.cumsum(rng.normal(0, 300, size=(B, SEG)), axis=1)
    base -= base.mean(axis=1, keepdims=True)
    batches = [np.clip(base * (1.0 + 0.01 * i), -32767, 32767)
               .astype(np.int16) for i in range(N_BATCH)]
    mb = batches[0].nbytes / 2**20

    # calibrated compute: matmul loop sized to ~the bench's per-batch
    # device time (mel+encode+decode ~= 230 ms at B=64/parity). The
    # input DEPENDS on the transferred batch (sum -> scalar nudge) so
    # the schedule matches ingest's compute-after-put dependency.
    m = jnp.asarray(rng.normal(size=(2048, 2048)), jnp.bfloat16)

    def make_compute(reps: int):
        @jax.jit
        def f(q, m):
            s = (q[0, 0].astype(jnp.float32) * 1e-20)
            a = m * (1 + s.astype(jnp.bfloat16))

            def body(i, acc):
                return acc @ a

            out = jax.lax.fori_loop(0, reps, body, m)
            return out[0, 0]
        return f

    # size the loop so one compute ~= 200-300 ms
    reps = 8
    f = make_compute(reps)
    qd0 = jax.device_put(batches[0])
    _ = float(f(qd0, m))  # compile
    t0 = time.perf_counter()
    r = f(qd0, m)
    float(r)
    per = time.perf_counter() - t0
    while per < 0.18 and reps < 4096:
        reps *= 2
        f = make_compute(reps)
        _ = float(f(qd0, m))
        t0 = time.perf_counter()
        float(f(qd0, m))
        per = time.perf_counter() - t0
    print(json.dumps({"case": "compute_calib", "reps": reps,
                      "s_per_call": round(per, 4)}), flush=True)

    def drain(x):
        # read one element back: block_until_ready does not block on
        # this backend (docs/BENCHMARKS.md)
        return float(jnp.asarray(x).ravel()[0])

    results = {}

    # --- put_only: wire rate for this payload this session
    for name, rep in (("put_only_cold", 0), ("put_only", 1)):
        t0 = time.perf_counter()
        ds = [jax.device_put(b) for b in batches]
        for d in ds:
            drain(d[:1, :1].astype(jnp.float32))
        dt = time.perf_counter() - t0
        results[name] = dt
        print(json.dumps({"case": name, "s": round(dt, 3),
                          "mb_per_s": round(N_BATCH * mb / dt, 1)}),
              flush=True)
        del ds

    # --- compute_only on resident data
    resident = [jax.device_put(b) for b in batches]
    for d in resident:
        drain(d[:1, :1].astype(jnp.float32))
    t0 = time.perf_counter()
    outs = [f(d, m) for d in resident]
    for o in outs:
        drain(o)
    results["compute_only"] = time.perf_counter() - t0
    print(json.dumps({"case": "compute_only",
                      "s": round(results["compute_only"], 3)}), flush=True)

    serial = results["put_only"] + results["compute_only"]
    best = max(results["put_only"], results["compute_only"]) \
        + results["put_only"] / N_BATCH

    # --- interleaved: the shipped ingest ordering
    t0 = time.perf_counter()
    outs = []
    for b in batches:
        qd = jax.device_put(b)
        outs.append(f(qd, m))
    for o in outs:
        drain(o)
    results["interleaved"] = time.perf_counter() - t0
    print(json.dumps({"case": "interleaved",
                      "s": round(results["interleaved"], 3),
                      "serial_sum_s": round(serial, 3),
                      "ideal_s": round(best, 3)}), flush=True)

    # --- put_under_compute: can the runtime overlap AT ALL?
    # long compute on resident data, then put fresh data while it runs
    f_long = make_compute(reps * N_BATCH)
    _ = drain(f_long(resident[0], m))
    t0 = time.perf_counter()
    o = f_long(resident[0], m)
    ds = [jax.device_put(b) for b in batches]
    for d in ds:
        drain(d[:1, :1].astype(jnp.float32))
    t_puts = time.perf_counter() - t0
    drain(o)
    dt = time.perf_counter() - t0
    results["put_under_compute"] = dt
    print(json.dumps({"case": "put_under_compute", "s": round(dt, 3),
                      "puts_done_at_s": round(t_puts, 3),
                      "max_s": round(max(results["put_only"],
                                         results["compute_only"]), 3),
                      "sum_s": round(serial, 3)}), flush=True)
    del ds

    # --- threaded: puts from a background thread, computes in order
    t0 = time.perf_counter()
    slots: list = [None] * N_BATCH
    done = [threading.Event() for _ in range(N_BATCH)]

    def putter():
        for i, b in enumerate(batches):
            slots[i] = jax.device_put(b)
            done[i].set()

    th = threading.Thread(target=putter, daemon=True)
    th.start()
    outs = []
    for i in range(N_BATCH):
        done[i].wait()
        outs.append(f(slots[i], m))
    for o in outs:
        drain(o)
    th.join()
    results["threaded"] = time.perf_counter() - t0
    print(json.dumps({"case": "threaded",
                      "s": round(results["threaded"], 3)}), flush=True)

    overlap_possible = results["put_under_compute"] < 0.75 * serial
    ordering_blocks = results["interleaved"] > 0.9 * serial
    print(json.dumps({
        "verdict": {
            "runtime_can_overlap_h2d_with_compute": overlap_possible,
            "shipped_ordering_serializes": ordering_blocks,
            "threaded_speedup_vs_interleaved": round(
                results["interleaved"] / results["threaded"], 3),
        }}), flush=True)


if __name__ == "__main__":
    main()
    import os
    os._exit(0)  # axon teardown can hang post-measurement (bench.py)
