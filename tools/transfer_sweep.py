"""Ingest-throughput sweep over host->device transfer modes.

The tunneled-host link is the ingest bottleneck (docs/BENCHMARKS.md), so
the transfer encoding is a first-order perf lever. This sweeps the modes
through the full fast-mode ingest path (bench.measure_mode) in ONE
process — decoder/encoder programs compile once and are reused; only the
per-mode mel dequant program recompiles — and prints one JSON line per
mode incrementally (TPU runs must never be SIGKILLed mid-compile; poll
the output file instead of bounding with a shell timeout).

    python tools/transfer_sweep.py [--modes int16 int12 mulaw8] [--out f]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", nargs="*",
                    default=["int16", "int16d", "int12", "mulaw8"])
    ap.add_argument("--audio-seconds", type=float, default=1280.0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import bench
    import jax
    import jax.numpy as jnp

    on_tpu = jax.devices()[0].platform == "tpu"
    if not on_tpu:
        args.audio_seconds = min(args.audio_seconds, 40.0)
    cal = bench.calibrate(on_tpu)
    print(json.dumps({"calibration": cal, "on_tpu": on_tpu}), flush=True)
    lines = []
    for mode in args.modes:
        r = bench.measure_mode(
            mode, on_tpu=on_tpu, short_context=True, int8_kv=False,
            fused_layer=on_tpu, fused_encoder=on_tpu,
            index_dtype=jnp.bfloat16 if on_tpu else jnp.float32,
            transfer_dtype=mode,
            audio_seconds=args.audio_seconds,
            batch=64 if on_tpu else 4, max_new=64 if on_tpu else 8,
            n_index=1024, n_queries=3,
            asr_preset="base" if on_tpu else "tiny", cap_preset="tiny",
            cal=cal)
        line = json.dumps({"mode": mode,
                           "ingest_audio_sec_per_sec":
                               r["ingest_audio_sec_per_sec"],
                           "transfer_mb": r.get("transfer_mb"),
                           "host_ms": r.get("host_ms")})
        print(line, flush=True)
        lines.append(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
    # hard-exit: the axon client teardown can hang post-measurement and
    # starve every later chip client (seen round 5 with bench.py; same
    # guard there). All output is flushed/written by main() already.
    import os
    os._exit(0)
