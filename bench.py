"""Headline benchmark: ingest throughput (audio-seconds/sec/chip).

Measures the full dual-pipeline ingest hot path on real production shapes —
log-mel -> whisper-base ASR greedy decode (KV cache, 64 steps) ->
whisper-tiny caption decode -> MiniLM embed — over synthesized 16 kHz audio,
plus fused-search p50 latency over a 100k-segment index.

Baseline (BASELINE.md): >= 60 audio-sec/sec/chip (1 h audio in < 60 s) and
< 50 ms p50 query latency. Prints ONE JSON line.

Weights are random-init (no egress in this image) — identical FLOPs/shapes
to converted checkpoints; decode runs the full 64 steps since random models
never emit EOS, so the throughput number is the worst case.
"""
import json
import time

import numpy as np


def main() -> None:
    import jax
    platform = jax.devices()[0].platform
    on_tpu = platform == "tpu"

    import jax.numpy as jnp
    from multimodal_audio_search_tpu.config import (
        DecodeConfig, EngineConfig, MelConfig)
    from multimodal_audio_search_tpu.index.fusion import fused_topk
    from multimodal_audio_search_tpu.models import whisper as W
    from multimodal_audio_search_tpu.models.minilm import MiniLMConfig
    from multimodal_audio_search_tpu.pipelines.embed import TextEmbedder
    from multimodal_audio_search_tpu.pipelines.ingest import (
        DualPipelineIngest)
    from multimodal_audio_search_tpu.pipelines.whisper_pipeline import (
        WhisperTextPipeline)

    if on_tpu:
        audio_seconds = 1280.0          # 128 x 10 s segments
        batch, max_new, n_index, n_queries = 64, 64, 100_000, 30
        asr_preset, cap_preset = "base", "tiny"
        # short-context production mode (whisper.cpp audio_ctx trick):
        # 10 s mel context -> 500 encoder positions, 3x less cross-attn
        # K/V per decode step than the padded 30 s context
        mel_cfg = MelConfig(padded_seconds=10.0)
        dtype = jnp.bfloat16
    else:                               # CPU smoke mode (local verification)
        audio_seconds = 40.0
        batch, max_new, n_index, n_queries = 4, 8, 4_096, 5
        asr_preset, cap_preset = "tiny", "tiny"
        mel_cfg = MelConfig(padded_seconds=10.0)
        dtype = jnp.float32

    decode = DecodeConfig(method="greedy", max_new_tokens=max_new,
                          int8_cross_kv=on_tpu)
    cfg = EngineConfig(ingest_batch=batch, asr_decode=decode,
                       caption_decode=decode)
    asr_cfg = W.PRESETS[asr_preset]
    cap_cfg = W.PRESETS[cap_preset]
    asr = WhisperTextPipeline(cfg=asr_cfg, decode=decode, mel_cfg=mel_cfg,
                              dtype=dtype, seed=0, name="asr")
    cap = WhisperTextPipeline(
        cfg=cap_cfg, decode=decode, mel_cfg=mel_cfg, dtype=dtype, seed=1,
        name="caption", prefix_ids=[cap_cfg.bos_token_id])
    emb = TextEmbedder(cfg=MiniLMConfig(), dtype=dtype)
    ingest = DualPipelineIngest(asr, cap, emb, cfg)

    rng = np.random.default_rng(0)
    sr = 16_000
    wave = (rng.normal(size=int(sr * audio_seconds)) * 0.3) \
        .astype(np.float32)

    # warm-up: compile all programs on one batch-sized slice
    warm = wave[: int(sr * 10 * batch)]
    ingest.process_waveform(warm, sr, "warmup")

    t0 = time.perf_counter()
    segments = ingest.process_waveform(wave, sr, "bench")
    ingest_s = time.perf_counter() - t0
    throughput = audio_seconds / ingest_s

    # ---- fused search over a 100k-segment index ----
    emb_idx = rng.normal(size=(n_index, 2, 384)).astype(np.float32)
    emb_idx /= np.linalg.norm(emb_idx, axis=-1, keepdims=True)
    ok = rng.random((n_index, 2)) > 0.2
    emb_d = jax.device_put(jnp.asarray(emb_idx, dtype))
    ok_d = jax.device_put(ok)
    q = emb_idx[123, 0]
    out = fused_topk(jnp.asarray(q), emb_d, ok_d, jnp.float32(0.6),
                     jnp.float32(0.4), k=10)
    jax.block_until_ready(out)

    # production query path: ONE dispatch (tokenize host-side, then a single
    # jitted MiniLM-embed + fused-top-k program; index/search.py does the
    # same); sync via a host read of the scores
    import functools
    from multimodal_audio_search_tpu.index.fusion import fused_topk_impl
    from multimodal_audio_search_tpu.models import minilm

    @functools.partial(jax.jit, static_argnames=("k", "threshold"))
    def query_program(params, ids, mask, index_emb, success, w_a, w_b,
                      *, k, threshold):
        qv = minilm.sentence_embed(params, ids, mask, emb.cfg)[0]
        return fused_topk_impl(qv, index_emb, success, w_a, w_b,
                               k=k, threshold=threshold)

    lat = []
    for i in range(n_queries):
        t0 = time.perf_counter()
        ids, mask = emb.tokenizer.encode(
            [f"query about music and drums number {i}"], emb.max_tokens)
        out = query_program(
            emb.params, jnp.asarray(ids), jnp.asarray(mask), emb_d, ok_d,
            jnp.float32(0.6), jnp.float32(0.4), k=10, threshold=0.1)
        _ = np.asarray(out["scores"])
        lat.append(time.perf_counter() - t0)
    p50_ms = float(np.percentile(lat[1:] or lat, 50) * 1e3)

    baseline = 60.0  # audio-sec/sec/chip target (BASELINE.md)
    print(json.dumps({
        "metric": "ingest_audio_seconds_per_sec_per_chip",
        "value": round(throughput, 2),
        "unit": "audio-sec/sec/chip",
        "vs_baseline": round(throughput / baseline, 3),
        "extras": {
            "platform": platform,
            "ingest_wall_s": round(ingest_s, 2),
            "segments": len(segments),
            "query_p50_ms_100k": round(p50_ms, 2),
            "decode_steps": max_new,
            "short_context": mel_cfg.padded_seconds < 30.0,
            "int8_cross_kv": on_tpu,
            "batch": batch,
        },
    }))


if __name__ == "__main__":
    main()
