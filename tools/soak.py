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
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from multimodal_audio_search_tpu.service.server import serve

    srv = serve(block=False, port=args.port)
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
    srv.shutdown()
    print(json.dumps({"metric": "service_soak", "ok": all(
        v.get("status") in (200,) for v in out.values()), **out}),
        flush=True)


if __name__ == "__main__":
    main()
