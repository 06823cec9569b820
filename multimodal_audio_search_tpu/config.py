"""Typed configuration for the whole framework.

Every constant the reference hard-codes is carried here with the reference
value as the default, so default-config behavior is parity behavior
(citations point into /root/reference):

  - sample rate 16 kHz                     audio_search.py:233
  - peak-conditional normalization bounds  audio_search.py:237-242
  - 10 s segments, drop < 3 s              audio_search.py:247,259
  - ASR decode params                      audio_search.py:316-327
  - caption decode params                  audio_search.py:366-375
  - fusion threshold 0.1, top-10           audio_search.py:672,699
  - query-weight bounds 0.2-0.8            audio_search.py:593-620
  - model names                            audio_search.py:92-94

Unlike the reference (constants scattered through one file), this is a typed,
frozen dataclass tree that can be serialized, overridden per-call, and passed
through jitted functions as static metadata.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any


@dataclass(frozen=True)
class AudioConfig:
    """Ingest-time audio handling (reference L1)."""

    sample_rate: int = 16_000        # audio_search.py:233
    mono: bool = True
    # peak-conditional normalization (audio_search.py:237-242)
    quiet_peak: float = 0.1          # below this -> boost
    quiet_target: float = 0.5
    loud_peak: float = 0.95          # above this -> attenuate
    loud_target: float = 0.8


@dataclass(frozen=True)
class SegmentConfig:
    """Windowing of a waveform into search units (audio_search.py:247-260)."""

    segment_seconds: float = 10.0    # audio_search.py:247
    min_segment_seconds: float = 3.0  # audio_search.py:259
    # historical variants used 5 s (clean_audio_search.py:141) and a
    # 5-30 s slider (streamlit_app_backup.py:875); expose as plain config.


@dataclass(frozen=True)
class MelConfig:
    """Whisper log-mel frontend (matches WhisperFeatureExtractor defaults)."""

    n_fft: int = 400
    hop_length: int = 160
    n_mels: int = 80
    padded_seconds: float = 30.0     # Whisper fixed 30 s context -> 3000 frames
    sample_rate: int = 16_000

    @property
    def n_frames(self) -> int:
        return int(self.padded_seconds * self.sample_rate) // self.hop_length

    @property
    def n_samples(self) -> int:
        return int(self.padded_seconds * self.sample_rate)


@dataclass(frozen=True)
class DecodeConfig:
    """Autoregressive decode controls.

    The reference uses HF ``generate`` kwargs: sampling decode for ASR
    (audio_search.py:316-327) and beam-2 for captions (audio_search.py:366-375).
    The TPU-native default is KV-cached greedy decode (fixed shapes, one
    compile); ``method`` selects greedy/sample/beam for parity modes.
    """

    method: str = "greedy"            # "greedy" | "sample" | "beam"
    max_new_tokens: int = 100         # caption max_length=100 audio_search.py:368
    num_beams: int = 1                # caption parity mode: 2 (audio_search.py:371)
    temperature: float = 1.0          # ASR parity mode: 0.2 (audio_search.py:320)
    repetition_penalty: float = 1.0   # ASR 1.05 (:323) / caption 1.3 (:372)
    no_repeat_ngram_size: int = 0     # ASR 2 (:321) / caption 3 (:369)
    length_penalty: float = 1.0       # ASR 0.8 (:322) / caption 1.0 (:373)
    early_stopping: bool = True       # audio_search.py:374
    # int8-quantized cross-attention K/V (ops/cached_attention.py): halves
    # the dominant per-step HBM memory of KV-cached decode. NOT a speed win
    # (docs/BENCHMARKS.md round-2 profile) — memory-constrained serving only.
    int8_cross_kv: bool = False
    # decode cross-attention implementation:
    #   "auto"   - fused Pallas kernel on TPU when the context fits VMEM
    #              (ops/cross_attention.py, exact bf16, ~4x einsum), einsum
    #              otherwise; int8_cross_kv=True overrides to "int8"
    #   "fused" | "einsum" | "int8" - force one path
    #   "int8_fused" - merged-head int8 kernel: HALF the cross-KV HBM
    #              memory at bf16-fused speed (not faster — the mode is a
    #              memory lever, docs/BENCHMARKS.md); bounded-error
    #              contract, guardrail-tested
    cross_attn: str = "auto"
    # route the decode self sub-block (LN + q/k/v + cache write +
    # attention + o-proj + residual) through one Pallas kernel per layer
    # (ops/decoder_block.py); opt-in while maturing. "v2" additionally
    # folds the cross-LN/q-proj into the self kernel and the cross
    # o-proj/residual into the MLP kernel (3 kernels + 2 cache writes
    # per layer, nothing else) — measured EQUAL to True at whisper-base
    # (0.850 vs 0.838 ms/step, B=64/10 s): the per-step residue is not
    # XLA op overhead (docs/BENCHMARKS.md)
    fused_layer: bool | str = False
    # run the decode layer loop as lax.scan over stacked per-layer params
    # instead of a traced Python loop (models/whisper.py::decode_step_scan)
    # — the ROADMAP-18 dispatch-residue experiment for many-layer decoders
    # (whisper-small: 12). Math identical to the plain path; forces the
    # merged-head cross-KV format. A/B tool: tools/profile_decode_scan_ab.py.
    scan_layers: bool = False
    # encoder fused blocks (ops/encoder_block.py): fold the all-heads
    # attention + o-proj + residual into one Pallas kernel — the
    # ROADMAP-17 encoder MFU lever. None = AUTO: the fused kernel on a
    # real TPU backend, the plain einsum path elsewhere (interpret-mode
    # kernels would be pure slowdown on CPU). PROMOTED to the parity
    # default in round 5: the decision-strength production-geometry
    # oracle (truth_exact 0.948, 96 clips, 10 s clips / 30 s context)
    # measured bf16+fused transcript-exact — agree_exact 1.000
    # (docs/onchip_r5/drift_s5_c.json) — on top of the round-4 on-chip
    # 0/1152 token-flip check. False forces the einsum path (the drift
    # oracle's baseline); "int8" additionally runs both attention dots
    # as int8 x int8 -> int32 (agree_exact 1.000 on the same
    # decision-strength oracle, drift_s5_b.json). Round-5 in-jit
    # re-measurement (docs/onchip_r5/int8_e2e.out) REVISED both perf
    # variants' standing: at t=1500 the kernel is softmax/VPU- and
    # VMEM-traffic-bound, not dot-bound — "int8" is speed-NEUTRAL
    # (8.41 vs 8.56 ms) and "paired" (head-paired block-diagonal K/V,
    # full 128-lane depth, same bf16 rounding class) LOSES (11.77 ms;
    # its structural-zero 2x K/V bytes cost more than full-depth dots
    # save). The round-4 wall-minus-RTT rows claiming big wins were
    # timing artifacts. Both stay selectable as research levers;
    # "paired" geometries whose doubled K/V overflow scoped VMEM (e.g.
    # whisper-small at 30 s) auto-fall-back to the unpaired kernel
    # (models/whisper.py::encode).
    fused_encoder: bool | str | None = None


def asr_parity_decode() -> DecodeConfig:
    """Reference ASR decode knobs (audio_search.py:316-327), greedy base."""
    return DecodeConfig(
        method="greedy", max_new_tokens=224, temperature=0.2,
        repetition_penalty=1.05, no_repeat_ngram_size=2, length_penalty=0.8,
    )


def caption_parity_decode() -> DecodeConfig:
    """Reference caption decode knobs (audio_search.py:366-375)."""
    return DecodeConfig(
        method="beam", max_new_tokens=100, num_beams=2,
        repetition_penalty=1.3, no_repeat_ngram_size=3, length_penalty=1.0,
        early_stopping=True,
    )


@dataclass(frozen=True)
class FusionConfig:
    """Query-weighted score fusion (audio_search.py:586-699)."""

    balanced_weight: float = 0.5          # audio_search.py:595
    one_sided_gain: float = 0.3           # 0.5 + 0.3*strength  (:601,:608)
    one_sided_saturation: float = 3.0     # strength = min(n/3, 1)  (:600,:607)
    mixed_floor: float = 0.2              # 0.2 + 0.6*ratio  (:618)
    mixed_span: float = 0.6
    relevance_threshold: float = 0.1      # audio_search.py:672
    top_k: int = 10                       # audio_search.py:699
    # device index dtype: "float32" (default; exact top-k parity) or
    # "bfloat16" (halves per-query HBM traffic; close-rank ties may
    # flip — quantify with tools/compare_modes.py)
    index_dtype: str = "float32"
    # approximate search: "none" (default; exact O(N) scan) or "ivf"
    # (index/ivf.py — sublinear candidate generation with exact fused
    # rescoring; for 10M+ indexes). ann_nprobe clusters are probed per
    # query out of ~sqrt(2N).
    ann: str = "none"
    ann_nprobe: int = 8


@dataclass(frozen=True)
class ValidatorConfig:
    """Text-quality gates (audio_search.py:399-455)."""

    asr_min_chars: int = 2                # audio_search.py:401
    asr_min_alnum_ratio: float = 0.2      # audio_search.py:423
    caption_min_chars: int = 5            # audio_search.py:439
    require_caption_keyword: bool = True  # audio_search.py:453


@dataclass(frozen=True)
class ModelSpec:
    """One model slot: architecture family + size + optional local weights."""

    family: str                      # "whisper" | "minilm" | "clap" | "bridge"
    preset: str                      # e.g. "base", "tiny", "L6"
    hf_name: str = ""                # provenance only; weights load from disk
    weights_path: str | None = None  # local converted-checkpoint dir (orbax/npz)
    dtype: str = "bfloat16"
    quantize_decoder: bool = False   # int8 decoder weights (ops/quant.py)


@dataclass(frozen=True)
class EngineConfig:
    """Top-level engine configuration. Defaults reproduce the reference."""

    audio: AudioConfig = field(default_factory=AudioConfig)
    segment: SegmentConfig = field(default_factory=SegmentConfig)
    mel: MelConfig = field(default_factory=MelConfig)
    fusion: FusionConfig = field(default_factory=FusionConfig)
    validator: ValidatorConfig = field(default_factory=ValidatorConfig)
    asr_decode: DecodeConfig = field(
        default_factory=lambda: DecodeConfig(max_new_tokens=64)
    )
    caption_decode: DecodeConfig = field(
        default_factory=lambda: DecodeConfig(max_new_tokens=64)
    )
    # model slots (names per audio_search.py:92-94)
    text_embedder: ModelSpec = field(default_factory=lambda: ModelSpec(
        family="minilm", preset="L6",
        hf_name="sentence-transformers/all-MiniLM-L6-v2"))
    asr_model: ModelSpec = field(default_factory=lambda: ModelSpec(
        family="whisper", preset="base", hf_name="openai/whisper-base"))
    caption_model: ModelSpec = field(default_factory=lambda: ModelSpec(
        family="whisper", preset="tiny",
        hf_name="cahya/whisper-tiny-audio-captioning-v2.0"))
    # analyzer selection: "keyword" (production, audio_search.py:457) or
    # "semantic" (historical prototype classifier, streamlit_app_backup.py:274)
    analyzer: str = "keyword"
    # ASR decoder prompt (reference parity: language="en", task="transcribe",
    # audio_search.py:318-319); any Whisper language code / "translate"
    # works with multilingual checkpoints (models/whisper.py forced_prefix)
    asr_language: str = "en"
    asr_task: str = "transcribe"
    # ingest batching (TPU-native addition; reference is one segment at a time)
    ingest_batch: int = 32
    embed_dim: int = 384
    # short-context mode (whisper.cpp's audio_ctx trick): run the Whisper
    # encoder on a segment-length mel context instead of the padded 30 s —
    # 3x less encoder work and 3x less cross-attention K/V traffic per
    # decode step for 10 s segments. Positional embeddings are sliced;
    # known-good accuracy trade in practice, but OFF by default because the
    # parity contract is the exact 30 s pipeline.
    short_context: bool = False
    # host->device waveform encoding: "float32" (bit-exact for any
    # source), "int16" (default; BIT-EXACT for the 16-bit PCM sources
    # that dominate the reference's upload types — WAV and almost all
    # FLAC decode to the int16 grid, so re-quantizing to it is the
    # identity; mp3/m4a decode to float and round at -96 dB, measured
    # transcript-exact on the synthetic oracle), "int12" (packed
    # 1.5 B/sample, 72 dB SNR; transcript-exact at the toy oracle
    # geometry but NOT at production geometry — 0.922 agree-exact at
    # 10 s/30 s, docs/BENCHMARKS.md production drift table — so it is
    # an explicit opt-in, never auto-picked), or
    # "mulaw8" (telephony-grade 8-bit companding for bandwidth-starved
    # hosts; has measured transcript drift, docs/BENCHMARKS.md), or
    # "mel16" (host-computed HF-f64-exact log-mel shipped as uint16
    # codes: 1.5x fewer tunnel bytes than int12 for 10 s segments AND
    # no device STFT; quantization error 3e-5, an order below the
    # device's own f32 mel deviation — drift measured on the synth
    # oracle, ops/mel.py::encode_mel16), "mel12" (log-mel codes packed
    # to 12 bits over the RELATIVE [gmax-8, gmax] window the epilogue
    # keeps — 2x fewer tunnel bytes than int12 at step 2e-3 log units),
    # or "mel8" (1 B relative codes — half of mulaw8's bytes with the
    # loss in feature space; drift on the synth oracle), or "int16d"
    # (int16 delta-coded with wraparound arithmetic: bit-identical
    # samples on device, same wire bytes pre-compression, but far lower
    # byte entropy — tunnels/links with transparent compression move it
    # much faster), or "auto" (probe the BIT-EXACT candidates
    # int16/int16d with a slice of the real payload and pick the
    # fastest, re-probing every 256 MB shipped — the round-4 on-chip
    # finding is that per-mode link rates depend on payload
    # compressibility and flip between sessions, so no static choice is
    # safe). Set MAS_TRANSFER_DTYPE=float32 for the unconditional-exact
    # path.
    transfer_dtype: str = "int16"
    # multi-chip execution (SURVEY §2c; the reference is single-device,
    # audio_search.py:89,181). data_parallel shards ingest segment batches
    # and the index N axis over the mesh 'data' axis; model_parallel
    # applies the Megatron TP rules (parallel/mesh.py) to the Whisper /
    # MiniLM params over 'model'. 1 x 1 (default) = single device, exact
    # reference-parity execution. Requires data_parallel * model_parallel
    # <= len(jax.devices()).
    data_parallel: int = 1
    model_parallel: int = 1

    def replace(self, **kw: Any) -> "EngineConfig":
        return dataclasses.replace(self, **kw)


def default_config() -> EngineConfig:
    return EngineConfig()


def apply_profile(cfg: EngineConfig, profile: str) -> EngineConfig:
    """One-knob perf profiles, matching bench.py's measured modes
    (docs/BENCHMARKS.md):

      * "parity"        — engine defaults, exact reference-parity math
      * "fast_lossless" — every lever measured TRANSCRIPT-EXACT on
                          BOTH self-trained oracles (toy AND production
                          geometry): auto-probed BIT-EXACT transfer
                          (fastest of int16/int16d on the live link) +
                          fused decode/encoder kernels, full 30 s
                          context, f32 index. Recommended production
                          mode.
      * "fast"          — maximum throughput: additionally
                          short-context encode, mu-law 8-bit transfer,
                          bf16 index — each with a measured, documented
                          accuracy cost.
    """
    if profile == "parity":
        return cfg
    if profile == "fast_lossless":
        return cfg.replace(
            transfer_dtype="auto",
            asr_decode=dataclasses.replace(
                cfg.asr_decode, fused_layer=True, fused_encoder=True),
            caption_decode=dataclasses.replace(
                cfg.caption_decode, fused_layer=True, fused_encoder=True))
    if profile == "fast":
        return cfg.replace(
            transfer_dtype="mulaw8", short_context=True,
            fusion=dataclasses.replace(cfg.fusion,
                                       index_dtype="bfloat16"),
            asr_decode=dataclasses.replace(
                cfg.asr_decode, fused_layer=True, fused_encoder=True),
            caption_decode=dataclasses.replace(
                cfg.caption_decode, fused_layer=True, fused_encoder=True))
    raise ValueError(
        f"unknown profile {profile!r}; options: parity, fast_lossless, "
        f"fast")


def config_from_env(base: EngineConfig | None = None) -> EngineConfig:
    """Environment-variable overrides (MAS_*).

    Realizes the reference's aspirational .env sketch that no code ever read
    (previous_iterations/DEPLOYMENT.md:61-70). Unset variables keep the
    reference-parity defaults.

      MAS_PROFILE (parity | fast_lossless | fast — applied first; see
      apply_profile), MAS_SAMPLE_RATE, MAS_SEGMENT_SECONDS,
      MAS_MIN_SEGMENT_SECONDS, MAS_TOP_K, MAS_THRESHOLD,
      MAS_INGEST_BATCH, MAS_ANALYZER, MAS_ASR_PRESET,
      MAS_CAPTION_PRESET, MAS_MAX_NEW_TOKENS, MAS_ASR_WEIGHTS,
      MAS_CAPTION_WEIGHTS, MAS_EMBEDDER_WEIGHTS, MAS_INDEX_DTYPE,
      MAS_ANN (none | ivf), MAS_ANN_NPROBE
    """
    import os
    cfg = base or EngineConfig()
    profile = os.environ.get("MAS_PROFILE")
    if profile:
        cfg = apply_profile(cfg, profile)

    def env(name, cast, default):
        v = os.environ.get(f"MAS_{name}")
        return cast(v) if v is not None else default

    audio = dataclasses.replace(
        cfg.audio, sample_rate=env("SAMPLE_RATE", int,
                                   cfg.audio.sample_rate))
    segment = dataclasses.replace(
        cfg.segment,
        segment_seconds=env("SEGMENT_SECONDS", float,
                            cfg.segment.segment_seconds),
        min_segment_seconds=env("MIN_SEGMENT_SECONDS", float,
                                cfg.segment.min_segment_seconds))
    fusion = dataclasses.replace(
        cfg.fusion,
        top_k=env("TOP_K", int, cfg.fusion.top_k),
        index_dtype=env("INDEX_DTYPE", str, cfg.fusion.index_dtype),
        ann=env("ANN", str, cfg.fusion.ann),
        ann_nprobe=env("ANN_NPROBE", int, cfg.fusion.ann_nprobe),
        relevance_threshold=env("THRESHOLD", float,
                                cfg.fusion.relevance_threshold))
    max_new = env("MAX_NEW_TOKENS", int, None)
    asr_decode = cfg.asr_decode if max_new is None else \
        dataclasses.replace(cfg.asr_decode, max_new_tokens=max_new)
    cap_decode = cfg.caption_decode if max_new is None else \
        dataclasses.replace(cfg.caption_decode, max_new_tokens=max_new)
    return cfg.replace(
        audio=audio, segment=segment, fusion=fusion,
        asr_decode=asr_decode, caption_decode=cap_decode,
        analyzer=env("ANALYZER", str, cfg.analyzer),
        asr_language=env("ASR_LANGUAGE", str, cfg.asr_language),
        asr_task=env("ASR_TASK", str, cfg.asr_task),
        ingest_batch=env("INGEST_BATCH", int, cfg.ingest_batch),
        data_parallel=env("DATA_PARALLEL", int, cfg.data_parallel),
        model_parallel=env("MODEL_PARALLEL", int, cfg.model_parallel),
        short_context=env("SHORT_CONTEXT",
                          lambda v: v.lower() in ("1", "true", "yes"),
                          cfg.short_context),
        transfer_dtype=env("TRANSFER_DTYPE", str, cfg.transfer_dtype),
        asr_model=dataclasses.replace(
            cfg.asr_model,
            preset=env("ASR_PRESET", str, cfg.asr_model.preset),
            weights_path=env("ASR_WEIGHTS", str,
                             cfg.asr_model.weights_path)),
        caption_model=dataclasses.replace(
            cfg.caption_model,
            preset=env("CAPTION_PRESET", str, cfg.caption_model.preset),
            weights_path=env("CAPTION_WEIGHTS", str,
                             cfg.caption_model.weights_path)),
        text_embedder=dataclasses.replace(
            cfg.text_embedder,
            weights_path=env("EMBEDDER_WEIGHTS", str,
                             cfg.text_embedder.weights_path)),
    )
