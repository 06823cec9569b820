"""Quantify perf-mode ranking drift against the parity default.

Every opt-in speed lever trades something; this harness measures what,
using the retrieval metrics (index/eval.py) on identical audio + query
sets. Modes compared against the parity default (30 s context, f32
index, int16 transfer):

  * bf16_index    — halves per-query HBM traffic; close-rank flips
  * short_context — audio_ctx speed mode (3x less encoder/KV work)
  * mulaw8        — 8-bit companded host->device transfer
  * fused_layer   — fused decode kernels (should be token-identical)

    python tools/compare_modes.py [--audio f.wav ...] [--preset tiny]
        [--max-new 16] [--out mode_report.json]

With random-init weights the absolute rankings are arbitrary but the
DELTAS are still informative (a mode that flips tokens on random
weights flips them on real ones); with converted checkpoints this is
the accuracy side of every BENCHMARKS.md perf claim.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

QUERIES = [
    "upbeat music with drums",
    "someone speaking clearly",
    "rain and wind in the background",
    "loud engine noise",
    "quiet piano melody",
]


def build_engine(mode: str, preset: str, max_new: int, seed: int):
    import jax.numpy as jnp

    from multimodal_audio_search_tpu.config import (
        DecodeConfig, EngineConfig, FusionConfig)
    from multimodal_audio_search_tpu.pipelines.ingest import (
        make_default_ingest)
    from multimodal_audio_search_tpu.service.api import AudioSearchEngine
    from multimodal_audio_search_tpu.config import ModelSpec

    decode = DecodeConfig(max_new_tokens=max_new,
                          fused_layer=(mode == "fused_layer"))
    cfg = EngineConfig(
        ingest_batch=8,
        asr_decode=decode, caption_decode=decode,
        asr_model=ModelSpec(family="whisper", preset=preset),
        caption_model=ModelSpec(family="whisper", preset=preset),
        short_context=(mode == "short_context"),
        transfer_dtype=mode if mode in ("mulaw8", "int12") else "int16",
        fusion=FusionConfig(
            index_dtype="bfloat16" if mode == "bf16_index"
            else "float32"),
    )
    return AudioSearchEngine(
        cfg=cfg, ingest_pipeline=make_default_ingest(cfg, seed=seed))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--audio", nargs="*", default=None)
    ap.add_argument("--preset", default="tiny")
    ap.add_argument("--max-new", type=int, default=16)
    ap.add_argument("--modes", nargs="*",
                    default=["bf16_index", "short_context", "mulaw8",
                             "fused_layer"])
    ap.add_argument("--out", default="mode_report.json")
    args = ap.parse_args()

    from multimodal_audio_search_tpu.index.eval import compare_rankings

    sr = 16_000
    waves = []
    if args.audio:
        from multimodal_audio_search_tpu.audio.decode import load_audio
        waves = [load_audio(f, sr)[0] for f in args.audio]
    else:
        rng = np.random.default_rng(0)
        waves = [(rng.normal(size=sr * 35) * 0.25).astype(np.float32)]

    def run(mode: str):
        eng = build_engine(mode if mode != "parity" else "",
                           args.preset, args.max_new, seed=0)
        for i, w in enumerate(waves):
            eng.ingest_waveform(w, sr, f"clip{i}")
        texts = [(m.get("asr_text", ""), m.get("audio_description", ""))
                 for m in eng.store.meta]
        tops = {}
        for q in QUERIES:
            hits, _ = eng.search(q)
            tops[q] = [h["index"] for h in hits]
        return texts, tops

    base_texts, base_tops = run("parity")
    report = {"preset": args.preset, "max_new": args.max_new,
              "segments": len(base_texts), "modes": {}}
    for mode in args.modes:
        texts, tops = run(mode)
        text_match = (float(np.mean([a == b for a, b in
                                     zip(base_texts, texts)]))
                      if len(texts) == len(base_texts) else 0.0)
        per_q = {q: compare_rankings(base_tops[q], tops.get(q, []))
                 for q in QUERIES}
        report["modes"][mode] = {
            "segment_text_match": text_match,
            "mean_overlap@10": float(np.mean(
                [m["overlap@10"] for m in per_q.values()])),
            "mean_exact@10": float(np.mean(
                [m["exact@10"] for m in per_q.values()])),
            "per_query": per_q,
        }
        print(f"{mode:14s} text_match={text_match:.2f} "
              f"overlap@10={report['modes'][mode]['mean_overlap@10']:.2f} "
              f"exact@10={report['modes'][mode]['mean_exact@10']:.2f}",
              flush=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
