"""Layer-scan decode A/B (round-3 verdict item 7 / ROADMAP 18).

Measures whether running the decoder layer loop as ``lax.scan`` over
stacked per-layer params (DecodeConfig.scan_layers) amortizes the
per-step op-dispatch residue that keeps whisper-small decode at ~1.9x
its KV-traffic floor. Run plain on the TPU (background, no shell
timeout — verify SKILL.md):

    nohup python tools/profile_decode_scan_ab.py > /tmp/scan_ab.out 2>&1 &

Compiles are kept small: 2 modes x 2 presets = 4 jits (+1 RTT probe).
Timing forces a 1-element host read and subtracts measured RTT
(block_until_ready does not block through the axon tunnel).
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
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(leaf.ravel()[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = np.asarray(leaf.ravel()[0])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    from multimodal_audio_search_tpu.config import DecodeConfig, MelConfig
    from multimodal_audio_search_tpu.models import layers as L
    from multimodal_audio_search_tpu.models import whisper as W
    from multimodal_audio_search_tpu.models.generate import generate

    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--presets", default="base,small")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=64)
    args = ap.parse_args()

    platform = jax.devices()[0].platform
    B, STEPS = args.batch, args.steps
    dtype = jnp.bfloat16
    print(f"platform={platform} B={B} steps={STEPS}", flush=True)

    one = jnp.zeros((1,))
    rtt = sync_time(lambda x: x + 1, one)
    print(f"rtt_ms={rtt*1e3:.1f}", flush=True)

    for preset in args.presets.split(","):
        cfg = W.PRESETS[preset]
        mel_cfg = MelConfig(padded_seconds=10.0)
        t_enc = int(mel_cfg.padded_seconds * 50)
        params = L.cast_floats(W.init_params(jax.random.PRNGKey(0), cfg),
                               dtype)
        rng = np.random.default_rng(0)
        enc_out = jnp.asarray(rng.normal(size=(B, t_enc, cfg.d_model)), dtype)
        prefix = jnp.tile(jnp.asarray(W.forced_prefix(cfg), jnp.int32),
                          (B, 1))
        plen = prefix.shape[1]
        # KV floor: per step, read the whole self-KV cache + cross-KV
        kv_bytes = (2 * cfg.dec_layers * B * (plen + STEPS) * cfg.d_model
                    + 2 * cfg.dec_layers * B * t_enc * cfg.d_model) * 2
        print(f"\npreset={preset} L={cfg.dec_layers} d={cfg.d_model} "
              f"kv_read_per_step={kv_bytes/1e6:.1f} MB", flush=True)

        results = {}
        # baseline = the production fast-mode loop (fused cross kernel +
        # fused self sub-block), so a scan WIN means beating the best
        # shipping config, not a weakened one; scan+fused runs the SAME
        # kernels inside the scan body, isolating the dispatch residue
        for mode, kw in (("loop(fused)", dict(cross_attn="fused",
                                              fused_layer=True)),
                         ("scan_layers", dict(scan_layers=True)),
                         ("scan+fused", dict(scan_layers=True,
                                             fused_layer=True))):
            dec_cfg = DecodeConfig(method="greedy", max_new_tokens=STEPS,
                                   **kw)

            def full(params, enc_out, prefix, _cfg=cfg, _dec=dec_cfg,
                     _plen=plen):
                out = generate(params, enc_out, prefix, cfg=_cfg, decode=_dec,
                               prefix_len=_plen, max_new_tokens=STEPS)
                return out.tokens
            t = sync_time(jax.jit(full), params, enc_out, prefix)
            ms = (t - rtt) * 1e3
            results[mode] = ms
            floor_ms = kv_bytes * STEPS / 812e9 * 1e3  # 812 GB/s HBM
            print(f"  {mode:14s} {ms:8.1f} ms  ({ms/STEPS:.3f} ms/step, "
                  f"{ms/floor_ms:.2f}x KV floor)", flush=True)
        lo = results["loop(fused)"]
        sc = min(results["scan_layers"], results["scan+fused"])
        print(f"  => best scan is {lo/sc:.3f}x the loop "
              f"({'WIN' if sc < lo else 'LOSS'})", flush=True)


if __name__ == "__main__":
    main()
