"""Resolve the int8-dot encoder contradiction (round 5).

Evidence in tension:
  * headpair_ab (round 4, wall-minus-RTT single-shot timing): int8
    attention kernel 3.77 ms vs bf16 6.90 ms at B=64/t=1500 — a 45%
    kernel win that should take the 6-layer whisper-base encode from
    ~86 ms to ~67 ms.
  * int8enc_ab (round 5, in-jit fori stage timer): e2e encode with
    fused_blocks="int8" measures 87.1 ms — IDENTICAL to bf16 (86.1),
    on a traced-and-verified int8 path (the jaxpr contains the int8
    converts).

One of those instruments is lying. The wall-minus-RTT timer has a
±10 ms jitter floor (the same tool's t=500 rows went NEGATIVE and are
annotated as garbage), so this probe re-times all three kernel
variants AND the full encode stack with the in-jit fori timer
(bench._stage_time — dependent calls, nothing hoistable) at the exact
bench geometry: whisper-base, B=64, bf16, t=1500, blk_q=128.

    python tools/probe_int8_e2e.py        # on the chip, background

Reference hot path this decides acceleration for:
/root/reference/audio_search.py:358-375 (30 s-context encode).
"""
from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from bench import _stage_time, calibrate
    from multimodal_audio_search_tpu.models import whisper as W
    from multimodal_audio_search_tpu.ops.encoder_block import (
        fused_attention_o_residual)

    on_tpu = jax.devices()[0].platform == "tpu"
    cal = calibrate(on_tpu)
    rtt = cal["rtt_ms"] / 1e3
    print(json.dumps({"calibration": cal}), flush=True)

    b, h, t, d = (64, 8, 1500, 64) if on_tpu else (2, 8, 96, 64)
    hd = h * d
    blk_q = 128 if on_tpu else 32
    dt = jnp.bfloat16 if on_tpu else jnp.float32
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.normal(size=(b, h, t, d)) * 0.2, dt)
               for _ in range(3))
    x = jnp.asarray(rng.normal(size=(b, t, hd)) * 0.2, dt)
    wo = jnp.asarray(rng.normal(size=(hd, hd)) * 0.05, dt)
    bo = jnp.asarray(rng.normal(size=(hd,)) * 0.05, dt)
    gflop = (4 * b * h * t * t * d + 2 * b * t * hd * hd) / 1e9

    for name, kw in (("kernel_bf16", {}),
                     ("kernel_paired", {"pair_heads": True}),
                     ("kernel_int8", {"qk_int8": True})):
        def run(q, k, v, x, wo, bo, _kw=kw):
            return fused_attention_o_residual(
                q, k, v, x, wo, bo, blk_q=blk_q,
                interpret=not on_tpu, **_kw)
        try:
            ms = _stage_time(run, q, 16 if on_tpu else 1, rtt,
                             k, v, x, wo, bo) * 1e3
            print(json.dumps({
                "case": name, "ms": round(ms, 3),
                "in_kernel_mfu": round(
                    gflop / ms / cal["tflops_bf16"], 3)}), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"case": name,
                              "error": str(e)[:300]}), flush=True)

    # full encode stack at the bench preset (the e2e number the stage
    # timer reports); int8enc_ab saw no bf16->int8 delta here
    preset = "base" if on_tpu else "tiny"
    cfg = W.PRESETS[preset]
    params = W.init_params(jax.random.PRNGKey(0), cfg)
    from multimodal_audio_search_tpu.models import layers as L
    params = L.cast_floats(params, dt)
    mel = jnp.asarray(rng.normal(size=(b, cfg.n_mels, 2 * t)), dt)
    for name, fb in (("encode_bf16_fused", True),
                     ("encode_int8", "int8"),
                     ("encode_paired", "paired"),
                     ("encode_einsum", False)):
        def enc(m, _fb=fb):
            return W.encode(params, m, cfg, fused_blocks=_fb)
        try:
            ms = _stage_time(enc, mel, 8 if on_tpu else 1, rtt) * 1e3
            print(json.dumps({"case": name, "preset": preset,
                              "ms": round(ms, 3)}), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"case": name,
                              "error": str(e)[:300]}), flush=True)


if __name__ == "__main__":
    main()
    import os
    os._exit(0)  # axon teardown can hang post-measurement (bench.py)
