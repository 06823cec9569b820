"""Short-context accuracy drift evaluation (ROADMAP item 11).

The whisper.cpp-style audio_ctx trick (EngineConfig.short_context) cuts
encoder compute and cross-attention K/V traffic ~3x for 10 s segments,
but its accuracy cost can only be measured with real checkpoints. This
harness is that measurement, runnable the day weights land:

    python tools/eval_context.py --whisper ~/ckpts/whisper-base \
        [--audio clip1.wav ...] [--preset base] [--max-new 64]

For each audio file (or synthesized fixtures) it decodes every segment
twice — full 30 s mel context vs segment-length context — and reports
per-segment transcript agreement (exact rate + token F1) plus the
decision impact: how often validation outcomes flip. Exit JSON mirrors
bench.py conventions (one line, machine-readable).

With random-init weights (no --whisper) the script still runs end to
end as a plumbing smoke test; transcripts are degenerate so agreement
numbers are meaningless but the chain is exercised.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def token_f1(a: str, b: str) -> float:
    ta, tb = a.lower().split(), b.lower().split()
    if not ta and not tb:
        return 1.0
    used = [False] * len(tb)
    common = 0
    for w in ta:
        for j, v in enumerate(tb):
            if not used[j] and v == w:
                used[j] = True
                common += 1
                break
    if common == 0:
        return 0.0
    p, r = common / len(ta), common / len(tb)
    return 2 * p * r / (p + r)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--whisper", default=None,
                    help="converted/HF checkpoint dir (random init if unset)")
    ap.add_argument("--preset", default="base")
    ap.add_argument("--audio", nargs="*", default=None)
    ap.add_argument("--max-new", type=int, default=64)
    ap.add_argument("--segment-seconds", type=float, default=10.0)
    ap.add_argument("--out", default="context_eval.json")
    args = ap.parse_args()

    import jax.numpy as jnp

    from multimodal_audio_search_tpu.audio.segment import segment_audio
    from multimodal_audio_search_tpu.config import (
        AudioConfig, DecodeConfig, MelConfig, SegmentConfig)
    from multimodal_audio_search_tpu.models import whisper as W
    from multimodal_audio_search_tpu.models.tokenizer import load_tokenizer
    from multimodal_audio_search_tpu.pipelines.validators import (
        validate_asr_text)
    from multimodal_audio_search_tpu.pipelines.whisper_pipeline import (
        WhisperTextPipeline)

    wcfg = W.PRESETS[args.preset]
    params, tokenizer = None, None
    if args.whisper:
        from multimodal_audio_search_tpu.models.convert import (
            convert_whisper, load_state_dict_from_dir)
        params = convert_whisper(
            load_state_dict_from_dir(args.whisper), wcfg)
        tokenizer = load_tokenizer(
            args.whisper, vocab_size=wcfg.vocab_size, add_cls_sep=False,
            pad_id=wcfg.pad_token_id, eos_id=wcfg.eos_token_id)

    decode = DecodeConfig(max_new_tokens=args.max_new)
    sr = 16_000
    pipes = {
        "full": WhisperTextPipeline(
            params=params, cfg=wcfg, tokenizer=tokenizer, decode=decode,
            mel_cfg=MelConfig(n_mels=wcfg.n_mels), name="full"),
        "short": WhisperTextPipeline(
            params=params, cfg=wcfg, tokenizer=tokenizer, decode=decode,
            mel_cfg=MelConfig(n_mels=wcfg.n_mels,
                              padded_seconds=args.segment_seconds),
            name="short"),
    }

    waves = []
    if args.audio:
        from multimodal_audio_search_tpu.audio.decode import load_audio
        for f in args.audio:
            w, _ = load_audio(f, sr)
            waves.append((f, w))
    else:
        rng = np.random.default_rng(0)
        t = np.arange(sr * 25) / sr
        waves = [
            ("tone", (0.3 * np.sin(2 * np.pi * 440 * t))
             .astype(np.float32)),
            ("noise", (rng.normal(size=len(t)) * 0.2).astype(np.float32)),
        ]

    seg_cfg = SegmentConfig(segment_seconds=args.segment_seconds)
    rows = []
    for name, w in waves:
        _, pieces = segment_audio(w, sr, seg_cfg, AudioConfig())
        for mode, pipe in pipes.items():
            n = pipe.mel_cfg.n_samples
            batch = np.zeros((len(pieces), n), np.float32)
            for i, piece in enumerate(pieces):
                m = min(len(piece), n)
                batch[i, :m] = piece[:m]
            texts = pipe.transcribe_batch(batch)
            for i, text in enumerate(texts):
                if mode == "full":
                    rows.append({"source": name, "segment": i,
                                 "full": text})
                else:
                    rows[-len(texts) + i]["short"] = text

    for r in rows:
        r["exact"] = r["full"] == r["short"]
        r["f1"] = token_f1(r["full"], r["short"])
        r["valid_flip"] = (bool(validate_asr_text(r["full"]))
                           != bool(validate_asr_text(r["short"])))

    summary = {
        "metric": "short_context_transcript_agreement",
        "segments": len(rows),
        "exact_rate": float(np.mean([r["exact"] for r in rows])),
        "f1_mean": float(np.mean([r["f1"] for r in rows])),
        "validation_flip_rate": float(np.mean(
            [r["valid_flip"] for r in rows])),
        "random_init": args.whisper is None,
        "context_seconds": [30.0, args.segment_seconds],
    }
    with open(args.out, "w") as f:
        json.dump({"summary": summary, "rows": rows}, f, indent=2)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
