"""Probe deferred-softmax-division formulations at the 30 s parity
context's MULTI-STEP grid (round-4 verdict item 6).

The "div" deferral (pv / l on the [blk_q, D] tile) measured 2x on the
encoder block kernel at single-step grids but crashed the Mosaic
compile helper at t_pad > blk_q, so the t=1500 parity encode still
divides on the [blk_q, T] score tile. This probe tests each
formulation at the production multi-step shape (B=64, H=8, D=64,
t=1500, blk_q=128/256) in an ISOLATED SUBPROCESS per case — a compiler
crash (its own exit, not a kill) must not take down the harness, and
no case is ever killed mid-compile (verify SKILL.md).

Each case reports compile+run ok, max |err| vs the einsum reference,
and in-jit kernel ms (bench._stage_time). One JSON line per case.

    python tools/probe_deferdiv.py              # parent: all cases
    python tools/probe_deferdiv.py --case div:128   # child: one case

Accelerates the reference encoder hot path (/root/reference/
audio_search.py:358-362); behavior identical up to f32 rounding.
"""
from __future__ import annotations

import argparse
import json
import os
import pathlib
import subprocess
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

# Round-5 finding (docs/onchip_r5/deferdiv.out + /tmp child log): the
# "Mosaic crash" of the deferred-div form at multi-step grids is a
# MARGINAL scoped-VMEM overflow — 16.43M vs the 16M budget (+440 KB) at
# blk_q=128, bf16 whisper-base t=1500 — not a compiler bug. The
# deferral keeps an extra live temp per unrolled head, and 128-row
# blocks sit exactly at the budget edge. So the decision cases are the
# 64-row blocks (comfortably inside budget) vs the production off:128.
CASES = ("off:128", "off:64", "div:64", "recip:64")


def child(case: str, batch: int) -> None:
    mode, blk = case.split(":")
    os.environ["MAS_ENC_DEFER"] = mode
    import jax
    import jax.numpy as jnp
    import numpy as np
    from bench import _stage_time, calibrate
    from multimodal_audio_search_tpu.ops.encoder_block import (
        fused_attention_o_residual)

    on_tpu = jax.devices()[0].platform == "tpu"
    cal = calibrate(on_tpu)
    rtt = cal["rtt_ms"] / 1e3
    b, h, t, d = batch, 8, 1500, 64
    hd = h * d
    dt = jnp.bfloat16 if on_tpu else jnp.float32
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.normal(size=(b, h, t, d)) * 0.2, dt)
               for _ in range(3))
    x = jnp.asarray(rng.normal(size=(b, t, hd)) * 0.2, dt)
    wo = jnp.asarray(rng.normal(size=(hd, hd)) * 0.05, dt)
    bo = jnp.asarray(rng.normal(size=(hd,)) * 0.05, dt)

    def run(q, k, v, x, wo, bo):
        # off-TPU smoke runs the interpret-mode twin (same math; the
        # Mosaic-compile question this probe exists for is TPU-only).
        # k/v/x/wo/bo flow through as OPERANDS — closing over them
        # bakes ~300 MB of HLO literals into the timing jit and the
        # remote compile service rejects it with HTTP 413
        # (bench._stage_time docstring; bit us live in this probe).
        return fused_attention_o_residual(q, k, v, x, wo, bo,
                                          blk_q=int(blk),
                                          interpret=not on_tpu)

    out = np.asarray(run(q, k, v, x, wo, bo)[:2, :8],
                     np.float32)                   # force the compile

    # einsum reference (f32) on the same inputs, first rows only
    qf, kf, vf = (np.asarray(a, np.float32) for a in (q, k, v))
    s = np.einsum("bhqd,bhkd->bhqk", qf[:2, :, :8], kf[:2]) / np.sqrt(d)
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    at = np.einsum("bhqk,bhkd->bhqd", p, vf[:2])
    at = at.transpose(0, 2, 1, 3).reshape(2, 8, hd)
    ref = (np.asarray(x[:2, :8], np.float32)
           + at @ np.asarray(wo, np.float32)
           + np.asarray(bo, np.float32))
    err = float(np.max(np.abs(out - ref)))

    ms = _stage_time(run, q, 16 if on_tpu else 2, rtt,
                     k, v, x, wo, bo) * 1e3
    gflop = (4 * b * h * t * t * d + 2 * b * t * hd * hd) / 1e9
    mfu = gflop / ms / cal["tflops_bf16"]
    print(json.dumps({"case": case, "ok": True, "ms": round(ms, 3),
                      "max_abs_err": round(err, 5),
                      "in_kernel_mfu": round(mfu, 3),
                      "platform": "tpu" if on_tpu else "cpu"}),
          flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", default=None)
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()
    if args.case:
        child(args.case, args.batch)
        return
    for case in CASES:
        # isolated child: a Mosaic CHECK-crash exits the child without
        # killing the probe; children are never signalled mid-compile
        r = subprocess.run(
            [sys.executable, __file__, "--case", case,
             "--batch", str(args.batch)],
            capture_output=True, text=True)
        line = next((ln for ln in reversed(r.stdout.splitlines())
                     if ln.startswith("{")), None)
        if r.returncode == 0 and line:
            print(line, flush=True)
        else:
            # surface the actual exception lines, not JAX's trailing
            # "internal frames removed" banner
            text = (r.stderr or "") + "\n" + (r.stdout or "")
            errs = [ln for ln in text.splitlines()
                    if "Error" in ln or "error:" in ln]
            tail = (errs or text.strip().splitlines())[-3:]
            print(json.dumps({"case": case, "ok": False,
                              "rc": r.returncode,
                              "tail": " | ".join(tail)[:400]}),
                  flush=True)


if __name__ == "__main__":
    main()
