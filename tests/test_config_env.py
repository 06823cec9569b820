from multimodal_audio_search_tpu.config import (
    EngineConfig, config_from_env, default_config)


def test_defaults_are_reference_values():
    c = default_config()
    assert c.audio.sample_rate == 16000            # audio_search.py:233
    assert c.segment.segment_seconds == 10.0       # :247
    assert c.segment.min_segment_seconds == 3.0    # :259
    assert c.fusion.relevance_threshold == 0.1     # :672
    assert c.fusion.top_k == 10                    # :699
    assert c.fusion.mixed_floor == 0.2             # :618
    assert c.validator.caption_min_chars == 5      # :439
    assert c.asr_model.preset == "base"
    assert c.caption_model.preset == "tiny"


def test_env_overrides(monkeypatch):
    monkeypatch.setenv("MAS_SEGMENT_SECONDS", "5")
    monkeypatch.setenv("MAS_TOP_K", "25")
    monkeypatch.setenv("MAS_THRESHOLD", "0.05")
    monkeypatch.setenv("MAS_ANALYZER", "semantic")
    monkeypatch.setenv("MAS_INGEST_BATCH", "64")
    monkeypatch.setenv("MAS_ASR_PRESET", "small")
    monkeypatch.setenv("MAS_MAX_NEW_TOKENS", "96")
    monkeypatch.setenv("MAS_ANN", "ivf")
    monkeypatch.setenv("MAS_ANN_NPROBE", "16")
    c = config_from_env()
    assert c.fusion.ann == "ivf" and c.fusion.ann_nprobe == 16
    assert c.segment.segment_seconds == 5.0
    assert c.fusion.top_k == 25
    assert c.fusion.relevance_threshold == 0.05
    assert c.analyzer == "semantic"
    assert c.ingest_batch == 64
    assert c.asr_model.preset == "small"
    assert c.asr_decode.max_new_tokens == 96
    assert c.caption_decode.max_new_tokens == 96
    # untouched values keep parity defaults
    assert c.audio.sample_rate == 16000
    assert c.segment.min_segment_seconds == 3.0


def test_env_noop_without_vars():
    assert config_from_env() == EngineConfig()


def test_fused_encoder_auto_default(monkeypatch):
    """Round-5 parity promotion: DecodeConfig.fused_encoder defaults to
    None = AUTO — the fused bf16 Pallas block kernels on a real TPU
    backend (transcript-exact at decision strength on the production-
    geometry oracle, docs/onchip_r5/drift_s5_c.json), the plain einsum
    path elsewhere (interpret-mode kernels are pure slowdown on CPU).
    The pipeline resolves the value once at build time and exposes it
    as fused_encoder_resolved."""
    import jax

    from multimodal_audio_search_tpu.config import DecodeConfig
    from multimodal_audio_search_tpu.models import whisper as W
    from multimodal_audio_search_tpu.pipelines.whisper_pipeline import (
        WhisperTextPipeline)

    assert DecodeConfig().fused_encoder is None

    cfg = W.PRESETS["test"]
    pipe = WhisperTextPipeline(cfg=cfg, decode=DecodeConfig(max_new_tokens=4))
    assert pipe.fused_encoder_resolved is False    # CPU backend -> einsum

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    pipe = WhisperTextPipeline(cfg=cfg, decode=DecodeConfig(max_new_tokens=4))
    assert pipe.fused_encoder_resolved is True     # auto -> fused on TPU

    pipe = WhisperTextPipeline(
        cfg=cfg, decode=DecodeConfig(max_new_tokens=4, fused_encoder=False))
    assert pipe.fused_encoder_resolved is False    # explicit False wins


def test_profiles(monkeypatch):
    from multimodal_audio_search_tpu.config import apply_profile
    import pytest

    base = EngineConfig()
    assert apply_profile(base, "parity") == base

    ll = apply_profile(base, "fast_lossless")
    # round 4: the profile rides the auto-probed lossless transfer
    # (fastest of int16/int16d/int12 on the live link)
    assert ll.transfer_dtype == "auto"
    assert ll.short_context is False            # full 30 s context
    assert ll.fusion.index_dtype == "float32"   # exact index
    assert ll.asr_decode.fused_layer is True
    assert ll.caption_decode.fused_encoder is True

    f = apply_profile(base, "fast")
    assert f.transfer_dtype == "mulaw8"
    assert f.short_context is True
    assert f.fusion.index_dtype == "bfloat16"

    with pytest.raises(ValueError):
        apply_profile(base, "warp9")

    # MAS_PROFILE applies first; explicit vars still win afterwards
    monkeypatch.setenv("MAS_PROFILE", "fast_lossless")
    monkeypatch.setenv("MAS_TRANSFER_DTYPE", "int16")
    c = config_from_env()
    assert c.asr_decode.fused_layer is True     # from the profile
    assert c.transfer_dtype == "int16"          # explicit override wins
