"""Per-stage encoder profile on the real chip (round-3 MFU push).

Times every sub-stage of models/whisper.py::encode at bench shapes so the
0.36-0.43 MFU gap (BENCH_r02 roofline) can be attributed: conv frontend,
per-layer LN / qkv projections / head split / fused attention / merge +
o-proj / MLP — plus the fused Pallas alternatives once available.

Usage:  python tools/profile_encode.py [--batch 64] [--seconds 10|30]
"""
from __future__ import annotations

import argparse
import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--preset", default="base")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from bench import _rtt_floor, _stage_time, calibrate
    from multimodal_audio_search_tpu.config import MelConfig
    from multimodal_audio_search_tpu.models import layers as L
    from multimodal_audio_search_tpu.models import whisper as W
    from multimodal_audio_search_tpu.models.layers import cast_floats
    from multimodal_audio_search_tpu.ops.attention import (
        fused_encoder_attention)
    from multimodal_audio_search_tpu.ops.mel import log_mel_spectrogram
    from multimodal_audio_search_tpu.utils import roofline

    on_tpu = jax.devices()[0].platform == "tpu"
    cfg = W.PRESETS[args.preset]
    mel_cfg = MelConfig(padded_seconds=args.seconds)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    params = cast_floats(
        W.init_params(jax.random.PRNGKey(0), cfg), dtype)
    cal = calibrate(on_tpu)
    rtt = cal["rtt_ms"] / 1e3
    print(f"calibration: {cal}")

    b = args.batch
    rng = np.random.default_rng(0)
    waves = jnp.asarray(rng.normal(size=(b, mel_cfg.n_samples)) * 0.3,
                        jnp.float32)
    mel = jax.jit(lambda w: log_mel_spectrogram(w, mel_cfg))(waves) \
        .astype(dtype)
    reps = 8 if on_tpu else 1

    def t(name, fn, x, flops=None, note="", extra=()):
        dt_s = _stage_time(fn, x, reps, rtt, *extra)
        mfu = ""
        if flops:
            mfu = f"  mfu={flops / dt_s / (cal['tflops_bf16'] * 1e12):.3f}"
        print(f"{name:26s} {dt_s * 1e3:8.3f} ms{mfu}  {note}")
        return dt_s

    enc = params["encoder"]
    d, heads = cfg.d_model, cfg.heads
    frames = mel.shape[-1]
    tt = frames // 2

    # ---- whole encode, both attention paths
    total_flops = roofline.encoder_flops(cfg, b, frames)
    t("encode (auto attn)", jax.jit(
        lambda m: W.encode(params, m, cfg)), mel, total_flops)
    t("encode (einsum attn)", jax.jit(
        lambda m: W.encode(params, m, cfg, fused_attention=False)), mel,
      total_flops)

    # ---- frontend
    from multimodal_audio_search_tpu.models.whisper import _conv1d
    t("conv1+gelu", jax.jit(
        lambda m: L.gelu(_conv1d(enc["conv1"], m.transpose(0, 2, 1), 1))),
      mel, 2 * b * frames * 3 * cfg.n_mels * d)
    x1 = jax.jit(lambda m: L.gelu(
        _conv1d(enc["conv1"], m.transpose(0, 2, 1), 1)))(mel)
    t("conv2+gelu", jax.jit(
        lambda x: L.gelu(_conv1d(enc["conv2"], x, 2))), x1,
      2 * b * tt * 3 * d * d)
    x = jax.jit(lambda x: L.gelu(_conv1d(enc["conv2"], x, 2))
                + enc["positions"][:tt][None].astype(dtype))(x1)

    # ---- one layer, stage by stage
    blk = enc["blocks"][0]
    a = blk["self_attn"]
    t("layer: LN", jax.jit(
        lambda x: L.layer_norm(blk["self_ln"], x, cfg.ln_eps)), x)
    h = L.layer_norm(blk["self_ln"], x, cfg.ln_eps)
    t("layer: q proj", jax.jit(lambda h: L.dense(a["q"], h)), h,
      2 * b * tt * d * d)
    t("layer: qkv proj+split", jax.jit(lambda h: tuple(
        L.split_heads(L.dense(a[k], h), heads) for k in ("q", "k", "v"))),
      h, 3 * 2 * b * tt * d * d)
    q, k, v = (L.split_heads(L.dense(a[kk], h), heads)
               for kk in ("q", "k", "v"))
    attn_flops = 4 * b * heads * tt * tt * (d // heads)
    t("layer: fused attention",
      lambda q, k, v: fused_encoder_attention(q, k, v), q, attn_flops,
      extra=(k, v))
    attn = fused_encoder_attention(q, k, v)
    t("layer: merge+o+residual",
      lambda at, x: x + L.dense(a["o"], L.merge_heads(at)), attn,
      2 * b * tt * d * d, extra=(x,))
    x2 = x + L.dense(a["o"], L.merge_heads(attn))
    mlp_flops = 2 * 2 * b * tt * d * cfg.ffn

    def mlp_xla(x2):
        hh = L.layer_norm(blk["mlp_ln"], x2, cfg.ln_eps)
        return x2 + L.dense(blk["mlp_out"],
                            L.gelu(L.dense(blk["mlp_in"], hh)))
    t("layer: LN+MLP+res (XLA)", jax.jit(mlp_xla), x2, mlp_flops)

    # ---- fused Pallas alternatives
    if on_tpu:
        from multimodal_audio_search_tpu.ops.encoder_block import (
            fused_attention_o_residual)

        blkq = 256 if tt <= 1024 else 128

        def attn_o_pl(q, k, v, x):
            return fused_attention_o_residual(
                q, k, v, x, a["o"]["w"], a["o"]["b"], blk_q=blkq)
        t("layer: attn+o+res (PL)", attn_o_pl, q,
          attn_flops + 2 * b * tt * d * d, extra=(k, v, x))

        t("encode (fused blocks)", jax.jit(
            lambda m: W.encode(params, m, cfg, fused_blocks=True)), mel,
          total_flops)


if __name__ == "__main__":
    main()
