"""Same-session A/B: fast_lossless vs fast_lossless_int8enc on chip.

The int8-dot encoder attention (fused_encoder="int8") is now
transcript-exact on BOTH self-trained oracles including the round-5
decision-strength production-geometry run (agree_exact 1.000 at
truth_exact 0.948, docs/onchip_r5/drift_s5_b.json), so it meets
fast_lossless's stated lever criterion — but its HEADLINE value is an
economics question this tool answers. OUTCOME (docs/onchip_r5/
int8enc_ab.out): e2e encode UNCHANGED (87.1 vs 86.1 ms) — the result
that exposed the round-4 wall-minus-RTT kernel rows (MFU 0.536 vs
0.293, headpair_ab.out) as timing artifacts; tools/probe_int8_e2e.py
holds the root-cause re-timing. Kept for reproduction. Run plain on
the TPU; both modes measure in ONE process minutes apart so tunnel
weather cancels.

    python tools/profile_int8enc_ab.py
"""
from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import bench  # noqa: E402  (repo root on path)


def main() -> None:
    ok, detail, probe_s = bench.probe_tpu_with_retry()
    if not ok:
        print(json.dumps({"ok": False, "detail": detail}), flush=True)
        return
    import jax
    import jax.numpy as jnp
    on_tpu = jax.devices()[0].platform == "tpu"
    cal = bench.calibrate(on_tpu)
    print(json.dumps({"calibration": cal}), flush=True)
    common = dict(on_tpu=on_tpu, audio_seconds=1280.0 if on_tpu else 40.0,
                  batch=64 if on_tpu else 4, max_new=64 if on_tpu else 8,
                  n_index=4096, n_queries=5,
                  asr_preset="base" if on_tpu else "tiny",
                  cap_preset="tiny", cal=cal)
    for name, enc in (("fast_lossless", True),
                      ("fast_lossless_int8enc", "int8"),
                      # order: bf16 first so its compile warms shared
                      # programs; a trailing bf16 rep guards against
                      # monotonic tunnel drift biasing the middle row
                      ("fast_lossless_rep2", True)):
        m = bench.measure_mode(
            name.replace("_rep2", ""), short_context=False,
            int8_kv=False, fused_layer=on_tpu, transfer_dtype="auto",
            fused_encoder=enc if on_tpu else False,
            index_dtype=jnp.float32, **common)
        m["mode"] = name
        print(json.dumps(m), flush=True)


if __name__ == "__main__":
    main()
    # hard-exit: the axon client teardown can hang post-measurement and
    # starve every later chip client (seen round 5 with bench.py — the
    # lingering process held the chip 15+ min; bench.py::main has the
    # same guard). All output is already flushed line-by-line.
    import os
    os._exit(0)
