"""Training: fine-tune the tiny captioner on procedural synthetic audio
until its transcripts are non-degenerate, then decode a held-out clip.

This is the same stack (training/synth.py -> training/finetune.py) that
produced the measured perf-mode accuracy-drift tables in
docs/BENCHMARKS.md; with converted real checkpoints, training/loop.py's
finetune_captioner runs full dp+tp fine-tuning with checkpoint/resume.

    python examples/04_training.py --cpu [--steps 150]
"""
import argparse
import sys

import os

sys.path.insert(0, os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--steps", type=int, default=150)
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    from multimodal_audio_search_tpu.training.synth import (
        make_clip, train_synth_captioner)

    model = train_synth_captioner(steps=args.steps, batch=8)
    print(f"trained {args.steps} steps; "
          f"loss {model.losses[0]:.3f} -> {model.losses[-1]:.3f}")

    # decode a held-out clip and compare to its known ground truth
    from multimodal_audio_search_tpu.models import whisper as W
    from multimodal_audio_search_tpu.models.generate import generate
    from multimodal_audio_search_tpu.ops.mel import log_mel_spectrogram
    import jax.numpy as jnp
    from multimodal_audio_search_tpu.config import DecodeConfig, MelConfig

    wave, truth = make_clip(np.random.default_rng(123),
                            clip_seconds=model.mel_seconds / 2)
    mel_cfg = MelConfig(padded_seconds=model.mel_seconds)
    pad = np.zeros(mel_cfg.n_samples, np.float32)
    pad[: len(wave)] = wave
    mel = log_mel_spectrogram(jnp.asarray(pad[None]), mel_cfg)
    enc = W.encode(model.params, mel.astype(jnp.float32), model.cfg)
    prefix = jnp.asarray([[model.cfg.bos_token_id]], jnp.int32)
    out = generate(model.params, enc, prefix, cfg=model.cfg,
                   decode=DecodeConfig(method="greedy", max_new_tokens=8),
                   prefix_len=1, max_new_tokens=8)
    toks = np.asarray(out.tokens)[0]
    text = model.vocab.decode(toks[1:].tolist())
    print(f"ground truth: {truth!r}")
    print(f"decoded:      {text!r}")


if __name__ == "__main__":
    main()
