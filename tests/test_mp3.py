"""MP3 decode path (audio/mp3.py — direct libmpg123 FFI).

Conformance strategy: no ffmpeg exists in this image, so correctness is
established by agreement between TWO independent decoder implementations
— our libmpg123 binding vs SDL_mixer's dr_mp3 (via pygame) — on a
real-world fixture, plus end-to-end ingest through the engine pipeline.
The reference only ever exercised one decoder (librosa -> audioread).
"""
import numpy as np
import pytest

from multimodal_audio_search_tpu.audio import mp3
from multimodal_audio_search_tpu.audio.decode import load_audio, sniff_format

FIXTURE = ("/opt/venv/lib/python3.12/site-packages/pygame/examples/data/"
           "house_lo.mp3")

needs_mpg123 = pytest.mark.skipif(not mp3.available(),
                                  reason="libmpg123 not on this system")


def _fixture_bytes():
    try:
        with open(FIXTURE, "rb") as f:
            return f.read()
    except OSError:
        pytest.skip("pygame mp3 fixture not present")


@needs_mpg123
def test_mp3_sniff_and_decode():
    data = _fixture_bytes()
    assert sniff_format(data) == "mp3"
    pcm, rate = mp3.decode_mp3(data)
    assert rate in (8000, 11025, 12000, 16000, 22050, 24000, 32000,
                    44100, 48000)
    n = pcm.shape[0]
    assert n > rate  # > 1 s of audio
    assert np.isfinite(pcm).all()
    assert 0.01 < np.abs(pcm).max() <= 1.5  # real signal, sane scale


@needs_mpg123
def test_mp3_matches_independent_decoder():
    """Cross-decoder conformance: libmpg123 vs SDL dr_mp3 (pygame)."""
    pygame = pytest.importorskip("pygame")
    data = _fixture_bytes()
    ours, rate = mp3.decode_mp3(data)
    if ours.ndim == 2:
        ours = ours.mean(axis=1)

    import os
    os.environ.setdefault("SDL_AUDIODRIVER", "dummy")
    pygame.mixer.quit()
    pygame.mixer.init(frequency=rate, size=-16, channels=2)
    snd = pygame.mixer.Sound(FIXTURE)
    theirs = pygame.sndarray.array(snd).astype(np.float32) / 32768.0
    if theirs.ndim == 2:
        theirs = theirs.mean(axis=1)
    pygame.mixer.quit()

    # decoders may disagree on encoder-delay trimming: align by
    # cross-correlation over a window, then demand near-identity
    n = min(len(ours), len(theirs))
    assert abs(len(ours) - len(theirs)) < 5000
    probe = theirs[5000:15000]
    best_off, best_corr = 0, -1.0
    for off in range(-2304, 2305, 576):  # granule-aligned candidates
        seg = ours[5000 + off: 15000 + off]
        if len(seg) != len(probe):
            continue
        c = float(np.dot(seg, probe)
                  / (np.linalg.norm(seg) * np.linalg.norm(probe) + 1e-12))
        if c > best_corr:
            best_corr, best_off = c, off
    a = ours[max(best_off, 0): n - 8000]
    b = theirs[max(-best_off, 0): len(a) + max(-best_off, 0)]
    m = min(len(a), len(b))
    a, b = a[:m], b[:m]
    corr = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert corr > 0.999, f"decoders disagree (corr={corr}, off={best_off})"
    assert np.sqrt(np.mean((a - b) ** 2)) < 5e-3  # 16-bit-ish agreement


@needs_mpg123
def test_mp3_through_load_audio_resamples_to_16k():
    data = _fixture_bytes()
    y, sr = load_audio(data, sample_rate=16_000)
    assert sr == 16_000 and y.ndim == 1
    native, rate = mp3.decode_mp3(data)
    expect = -(-native.shape[0] * 16_000 // rate)
    assert abs(len(y) - expect) <= 1
    assert np.isfinite(y).all()


@needs_mpg123
def test_mp3_ingest_end_to_end(rng):
    """The reference's mp3-upload capability (audio_search.py:776) through
    the full dual-pipeline ingest."""
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
    segs = eng.ingest(FIXTURE, source_name="house_lo.mp3")
    # 7.26 s fixture -> at most two >=3 s windows survive validation
    assert len(eng.store) == len(segs)
    for s in segs:
        assert s["sample_rate"] == 16_000
        assert s["asr_success"] or s["audio_success"]


def test_mp3_garbage_rejected():
    if not mp3.available():
        pytest.skip("libmpg123 not on this system")
    with pytest.raises(ValueError):
        mp3.decode_mp3(b"\xff\xe0" + b"\x00" * 64)
