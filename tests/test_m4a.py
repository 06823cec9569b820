"""M4A/AAC (and OGG) decode path — audio/ffdecode.py over libavformat.

The reference accepts .m4a uploads (audio_search.py:776) and decoded them via
librosa -> audioread -> the system's ffmpeg. We bind the same system codec
libraries directly. Fixtures are generated in-test with the module's encode
helper (AAC is lossy, so conformance = signal-level fidelity: dominant
frequency, correlation against the source tone, sane duration).
"""
import numpy as np
import pytest

from multimodal_audio_search_tpu.audio import ffdecode
from multimodal_audio_search_tpu.audio.decode import load_audio, sniff_format

needs_ff = pytest.mark.skipif(not ffdecode.available(),
                              reason="FFmpeg libs/toolchain not available")


def _tone(rate=44_100, seconds=3.0, freq=440.0, amp=0.5):
    t = np.arange(int(rate * seconds)) / rate
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


@pytest.fixture(scope="module")
def m4a_fixture(tmp_path_factory):
    if not ffdecode.available():
        pytest.skip("FFmpeg libs/toolchain not available")
    path = tmp_path_factory.mktemp("m4a") / "tone.m4a"
    ffdecode.encode_file(_tone(), 44_100, path)
    return path.read_bytes()


@needs_ff
def test_m4a_sniff_and_decode(m4a_fixture):
    assert sniff_format(m4a_fixture) == "m4a"
    pcm, rate = ffdecode.decode(m4a_fixture)
    assert rate == 44_100
    mono = pcm if pcm.ndim == 1 else pcm.mean(axis=1)
    # duration within codec priming tolerance of the 3 s source
    assert abs(len(mono) - 3 * rate) < 4096
    # dominant frequency is the 440 Hz tone
    seg = mono[4096:4096 + 32768]
    freqs = np.fft.rfftfreq(len(seg), 1 / rate)
    dom = freqs[np.argmax(np.abs(np.fft.rfft(seg)))]
    assert abs(dom - 440.0) < 5.0


@needs_ff
def test_m4a_through_load_audio(m4a_fixture):
    y, sr = load_audio(m4a_fixture, sample_rate=16_000)
    assert sr == 16_000 and y.ndim == 1
    assert abs(len(y) - 3 * 16_000) < 2000
    # correlate against the ideal tone at the decoded alignment
    t = np.arange(len(y)) / 16_000
    ref_sin = np.sin(2 * np.pi * 440.0 * t)
    ref_cos = np.cos(2 * np.pi * 440.0 * t)
    mid = slice(4000, len(y) - 4000)
    power = float(np.mean(y[mid] ** 2))
    proj = (np.mean(y[mid] * ref_sin[mid]) ** 2
            + np.mean(y[mid] * ref_cos[mid]) ** 2) * 2 / max(power, 1e-12)
    assert power > 1e-3          # real signal present
    assert proj > 0.9            # >90% of energy at 440 Hz


@needs_ff
def test_ogg_decode(tmp_path):
    path = tmp_path / "tone.ogg"
    ffdecode.encode_file(_tone(seconds=1.5), 44_100, path)
    data = path.read_bytes()
    assert sniff_format(data) == "ogg"
    y, sr = load_audio(data, sample_rate=16_000)
    assert sr == 16_000 and abs(len(y) - 1.5 * 16_000) < 2000


@needs_ff
def test_m4a_garbage_rejected():
    junk = b"\x00\x00\x00\x1cftypM4A " + b"\x00" * 256
    with pytest.raises(ValueError):
        load_audio(junk, sample_rate=16_000)


@needs_ff
def test_m4a_ingest_end_to_end(tmp_path, rng):
    """The reference's m4a-upload capability through the full dual-pipeline
    ingest (same harness as test_mp3.py)."""
    import jax.numpy as jnp
    from multimodal_audio_search_tpu import AudioSearchEngine, EngineConfig
    from multimodal_audio_search_tpu.config import DecodeConfig, MelConfig
    from multimodal_audio_search_tpu.models import whisper as W
    from multimodal_audio_search_tpu.models.minilm import MiniLMConfig
    from multimodal_audio_search_tpu.pipelines.embed import TextEmbedder
    from multimodal_audio_search_tpu.pipelines.ingest import (
        DualPipelineIngest)
    from multimodal_audio_search_tpu.pipelines.whisper_pipeline import (
        WhisperTextPipeline)

    path = tmp_path / "noise.m4a"
    wave = (rng.normal(size=44_100 * 7) * 0.2).astype(np.float32)
    ffdecode.encode_file(wave, 44_100, path)

    wcfg = W.WhisperConfig(
        vocab_size=128, d_model=32, enc_layers=1, dec_layers=1, heads=2,
        ffn=64, enc_positions=150, dec_positions=16,
        bos_token_id=100, eos_token_id=101, pad_token_id=101)
    mel = MelConfig(padded_seconds=3.0)
    decode = DecodeConfig(max_new_tokens=4)
    cfg = EngineConfig(ingest_batch=4)
    asr = WhisperTextPipeline(cfg=wcfg, decode=decode, mel_cfg=mel,
                              dtype=jnp.float32, name="asr")
    cap = WhisperTextPipeline(cfg=wcfg, decode=decode, mel_cfg=mel,
                              dtype=jnp.float32, name="caption",
                              prefix_ids=[wcfg.bos_token_id], seed=1)
    emb = TextEmbedder(cfg=MiniLMConfig(vocab_size=512, hidden=64,
                                        layers=1, heads=2,
                                        intermediate=128))
    eng = AudioSearchEngine(
        cfg=cfg, ingest_pipeline=DualPipelineIngest(asr, cap, emb, cfg))
    eng.cfg = eng.cfg.replace(embed_dim=64)
    eng.store.embed_dim = 64
    eng.store._emb = np.zeros((eng.store._cap, 2, 64), np.float32)
    segs = eng.ingest(str(path), source_name="noise.m4a")
    assert len(eng.store) == len(segs) >= 1
    for s in segs:
        assert s["sample_rate"] == 16_000
        assert s["asr_success"] or s["audio_success"]
