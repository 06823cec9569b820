"""Service soak: the FULL HTTP surface on the real chip, one command.

Reproduces the round-2 ad-hoc soak (docs/BENCHMARKS.md "Service soak")
as a repeatable tool: start serve() on a local port with production
defaults, POST a synthesized WAV through /api/ingest, query
/api/search, scrape /metrics, delete the source, and print one JSON
line of timings/results. Run plain on the TPU (background, no shell
timeout — first compiles take minutes).

    python tools/soak.py [--seconds 60] [--port 8765]
"""
from __future__ import annotations

import argparse
import io
import json
import pathlib
import struct
import sys
import time
import urllib.request

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def make_wav(seconds: float, sr: int = 16_000) -> bytes:
    import numpy as np
    rng = np.random.default_rng(0)
    t = np.arange(int(sr * seconds)) / sr
    wave = (0.3 * np.sin(2 * np.pi * 440.0 * t)
            + 0.1 * rng.normal(size=len(t))).astype(np.float32)
    pcm = (np.clip(wave, -1, 1) * 32767).astype("<i2").tobytes()
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16)
           + b"data" + struct.pack("<I", len(pcm)))
    return hdr + pcm


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=60.0)
    ap.add_argument("--port", type=int, default=8765)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the axon TPU plugin "
                         "ignores JAX_PLATFORMS; local verification runs "
                         "must opt out before first backend use)")
    ap.add_argument("--loop-minutes", type=float, default=0.0,
                    help="after the single-pass smoke, run a mixed "
                         "ingest/search/delete/save load until the "
                         "deadline, sampling RSS / segment count / "
                         "search p50, and ASSERT bounded growth "
                         "(round-4 verdict item 7). Emits one timeline "
                         "sample line per iteration so a killed run "
                         "still leaves evidence.")
    args = ap.parse_args()

    # The soak hung twice on the axon backend with zero CPU progress
    # (lost client wakeup; tools/probe_thread_hang.py). Dump every
    # thread's Python stack to stderr periodically so a hung run leaves
    # the exact frame in its .out file instead of a bare warning line.
    import faulthandler
    faulthandler.dump_traceback_later(240.0, repeat=True)

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from multimodal_audio_search_tpu.service.server import serve

    srv = serve(block=False, port=args.port)
    # serve(block=False) CONSTRUCTS the server but does not run its
    # accept loop (the caller owns threading — every test does this
    # too). Without this thread the first request sits in the TCP
    # backlog forever with zero CPU: the "soak hang" of rounds 4-5
    # was exactly this missing line, not a TPU/backend fault
    # (docs/onchip_r5/soak_hang_rootcause.out).
    import threading
    threading.Thread(target=srv.serve_forever, daemon=True,
                     name="http-accept").start()
    base = f"http://127.0.0.1:{args.port}"
    out = {}

    def req(method, path, data=None, headers=None):
        # NO client timeout: the first ingest sits behind minutes of
        # device compiles, and abandoning the request kills the process
        # mid-compile — which wedges the axon remote compile service for
        # ~45 min (.claude/skills/verify/SKILL.md). Patience is cheaper.
        r = urllib.request.Request(base + path, data=data, method=method,
                                   headers=headers or {})
        with urllib.request.urlopen(r) as resp:
            return resp.status, resp.read()

    wav = make_wav(args.seconds)
    t0 = time.perf_counter()
    st, body = req("POST", "/api/ingest?name=soak.wav", wav,
                   {"Content-Type": "application/octet-stream"})
    out["ingest"] = {"status": st, "s": round(time.perf_counter() - t0, 1),
                     "segments": json.loads(body).get("segments")}

    t0 = time.perf_counter()
    st, body = req("GET", "/api/search?q=music+and+tones&k=5")
    hits = json.loads(body)
    out["search"] = {"status": st, "s": round(time.perf_counter() - t0, 2),
                     "hits": len(hits.get("results", hits.get("hits", [])))}
    t0 = time.perf_counter()
    st, _ = req("GET", "/api/search?q=speech")
    out["search_warm"] = {"status": st,
                          "s": round(time.perf_counter() - t0, 3)}

    st, body = req("GET", "/metrics")
    out["metrics"] = {"status": st,
                      "lines": body.decode().count("\n")}
    st, body = req("GET", "/api/stats")
    out["stats"] = {"status": st}
    st, body = req("POST", "/api/delete?source=soak.wav")
    out["delete"] = {"status": st, "body": json.loads(body)}

    if args.loop_minutes > 0:
        _soak_loop(req, wav, args.loop_minutes, out)

    srv.shutdown()
    print(json.dumps({"metric": "service_soak", "ok": all(
        v.get("status") in (200,) for v in out.values()
        if isinstance(v, dict)), **out}),
        flush=True)


def _soak_loop(req, wav: bytes, minutes: float, out: dict) -> None:
    """Mixed ingest/search/delete/save load with resource-growth
    assertions (round-4 verdict item 7): after the warm first third,
    RSS must plateau (final-third median within 10% + 100 MB of the
    middle-third median), the segment store must stay bounded by the
    delete cadence, and search p50 must not degrade >2x between the
    first and final thirds. All programs compile during the smoke pass
    above, so the loop itself is compile-free — no wedge risk."""
    import psutil

    proc = psutil.Process()
    hdr = {"Content-Type": "application/octet-stream"}
    queries = ["music and tones", "speech sounds", "a dog barking",
               "rain and wind"]
    samples: list[dict] = []
    kept: list[str] = []
    t_start = time.time()
    deadline = t_start + minutes * 60.0
    i = 0
    while time.time() < deadline:
        name = f"soak_loop_{i}.wav"
        st, _ = req("POST", f"/api/ingest?name={name}", wav, hdr)
        assert st == 200, ("ingest", i, st)
        kept.append(name)
        lat = []
        for q in queries:
            t0 = time.perf_counter()
            st, _ = req("GET", "/api/search?q=" + q.replace(" ", "+"))
            lat.append(time.perf_counter() - t0)
            assert st == 200, ("search", i, st)
        total = None
        if len(kept) > 8:                 # bounded store via deletes
            st, body = req("POST", f"/api/delete?source={kept.pop(0)}")
            assert st == 200, ("delete", i, st)
            total = json.loads(body)["total"]
        if i % 5 == 4:                    # periodic checkpoint
            st, _ = req("POST", "/api/save?path=soak_ckpt")
            assert st == 200, ("save", i, st)
        st, _ = req("GET", "/api/stats")
        assert st == 200, ("stats", i, st)
        s = {"t_s": round(time.time() - t_start, 1),
             "rss_mb": round(proc.memory_info().rss / 1e6, 1),
             "p50_ms": round(sorted(lat)[len(lat) // 2] * 1e3, 1)}
        if total is not None:
            s["segments"] = total
        samples.append(s)
        print(json.dumps({"soak_sample": s}), flush=True)
        i += 1

    third = max(1, len(samples) // 3)
    med = lambda xs: sorted(xs)[len(xs) // 2]          # noqa: E731
    rss_mid = med([s["rss_mb"] for s in samples[third:2 * third]])
    rss_end = med([s["rss_mb"] for s in samples[-third:]])
    p50_first = med([s["p50_ms"] for s in samples[:third]])
    p50_end = med([s["p50_ms"] for s in samples[-third:]])
    segs = [s["segments"] for s in samples if "segments" in s]
    checks = {
        "rss_plateau": rss_end <= rss_mid * 1.10 + 100.0,
        "store_bounded": (not segs) or max(segs) <= max(segs[0], 16) * 2,
        "p50_stable": p50_end <= max(p50_first * 2.0, p50_first + 50.0),
    }
    out["loop"] = {
        "minutes": round((time.time() - t_start) / 60.0, 1),
        "iterations": len(samples),
        "rss_mb_mid_median": rss_mid, "rss_mb_final_median": rss_end,
        "p50_ms_first_median": p50_first, "p50_ms_final_median": p50_end,
        "segments_max": max(segs) if segs else None,
        "checks": checks,
        "status": 200 if all(checks.values()) else 500,
    }


if __name__ == "__main__":
    main()
    # hard-exit: the axon client teardown can hang post-measurement and
    # starve every later chip client (seen round 5 with bench.py; same
    # guard there). All output is flushed/written by main() already.
    import os
    os._exit(0)
