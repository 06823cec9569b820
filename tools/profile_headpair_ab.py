"""Encoder attention kernel variant A/B: base vs head-paired vs int8.

Times the fused encoder attention block (ops/encoder_block.py) against
its round-4 variants at whisper-base geometry, 10 s and 30 s contexts:

  * paired — two D=64 heads per dot via block-diagonal K/V (round-3
    verdict item 6). A-priori MXU accounting says time-NEUTRAL (a K=64
    pass costs a full array pass either way; packing converts idle depth
    1:1 into doubled output tiles) while doubling K/V HBM traffic —
    this tool measures that claim.
  * int8 — both attention dots as int8 x int8 -> int32 (2x bf16 MXU
    throughput on v5e) with scales factored around the dots; lossy
    (drift measured by the synth oracle), so a fast-mode candidate.

Run plain on the TPU (background, NO shell timeout; 6 novel compiles):

    nohup python tools/profile_headpair_ab.py > /tmp/headpair_ab.out 2>&1 &

Only 128-multiple t_pad shapes are used (in-kernel lane slices at the
t_pad offset; 64-offset lane slicing hangs remote Mosaic — SKILL.md).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def sync_time(fn, *args, reps=5):
    out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    from multimodal_audio_search_tpu.ops.encoder_block import (
        fused_attention_o_residual)

    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()

    platform = jax.devices()[0].platform
    B, H, D = args.batch, 8, 64
    HD = H * D
    dtype = jnp.bfloat16
    print(f"platform={platform} B={B} H={H} D={D}", flush=True)

    one = jnp.zeros((1,))
    rtt = sync_time(lambda x: x + 1, one)
    print(f"rtt_ms={rtt*1e3:.1f}", flush=True)
    # measured bf16 peak, like every other MFU reporter (bench.calibrate;
    # a hardcoded 394e12 is the INT8 peak and halves every MFU reading)
    from bench import calibrate
    cal = calibrate(platform == "tpu")
    peak = cal["tflops_bf16"] * 1e12
    print(f"calibration: {cal}", flush=True)

    rng = np.random.default_rng(0)
    for t, blk_q in ((500, 512), (1500, 128)):
        q, k, v = (jnp.asarray(rng.normal(size=(B, H, t, D)), dtype)
                   for _ in range(3))
        x = jnp.asarray(rng.normal(size=(B, t, HD)), dtype)
        wo = jnp.asarray(rng.normal(size=(HD, HD)) * 0.02, dtype)
        bo = jnp.asarray(rng.normal(size=(HD,)) * 0.02, dtype)
        flops = 4 * B * H * t * t * D + 2 * B * t * HD * HD
        print(f"\nt={t} blk_q={blk_q} useful_gflop={flops/1e9:.1f}",
              flush=True)
        for name, kw in (("base", {}), ("paired", {"pair_heads": True}),
                         ("int8", {"qk_int8": True})):
            try:
                fn = lambda q, k, v, x, wo, bo, _kw=kw: \
                    fused_attention_o_residual(
                        q, k, v, x, wo, bo, blk_q=blk_q, **_kw)
                tt = sync_time(fn, q, k, v, x, wo, bo) - rtt
                mfu = flops / tt / peak if platform == "tpu" else 0.0
                print(f"  {name:8s} {tt*1e3:8.2f} ms  in-kernel "
                      f"MFU={mfu:.3f}", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"  {name:8s} FAILED: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
