import numpy as np
import pytest

from multimodal_audio_search_tpu.config import MelConfig
from multimodal_audio_search_tpu.ops.mel import (
    log_mel_batch, log_mel_spectrogram, mel_filterbank)

CFG = MelConfig()


@pytest.fixture(scope="module")
def waves():
    rng = np.random.default_rng(7)
    # covers full 10 s, minimum 3 s, and ragged 7.5 s segments
    return [
        (rng.normal(size=int(16000 * s)) * 0.3).astype(np.float32)
        for s in (10.0, 3.0, 7.5)]


@pytest.fixture(scope="module")
def hf_ref(waves):
    """Oracle: transformers' WhisperFeatureExtractor (offline-safe)."""
    from transformers import WhisperFeatureExtractor
    fe = WhisperFeatureExtractor()
    out = fe(list(waves), sampling_rate=16000, return_tensors="np",
             padding="max_length")
    return out.input_features  # [B, 80, 3000]


def padded(waves):
    batch = np.zeros((len(waves), CFG.n_samples), np.float32)
    for i, w in enumerate(waves):
        batch[i, : len(w)] = w
    return batch


def test_mel_filterbank_matches_transformers():
    from transformers.audio_utils import mel_filter_bank
    ref = mel_filter_bank(
        num_frequency_bins=201, num_mel_filters=80, min_frequency=0.0,
        max_frequency=8000.0, sampling_rate=16000, norm="slaney",
        mel_scale="slaney").T  # -> [80, 201]
    got = mel_filterbank(80, 400, 16000, 0.0, 8000.0)
    np.testing.assert_allclose(got, ref, atol=1e-10)


def test_log_mel_exact_parity_float64():
    """Algorithm-exactness: under x64 the program matches HF to ~f32 eps.

    Runs on a 3 s context (the computation is per-frame identical to 30 s)
    to keep the f64 CPU conv compile affordable.
    """
    import jax
    from transformers import WhisperFeatureExtractor
    rng = np.random.default_rng(3)
    w = (rng.normal(size=int(16000 * 2.0)) * 0.3).astype(np.float32)
    fe = WhisperFeatureExtractor()
    ref = fe([w], sampling_rate=16000, return_tensors="np",
             padding="max_length", max_length=48000).input_features
    cfg = MelConfig(padded_seconds=3.0)
    batch = np.zeros((1, cfg.n_samples), np.float64)
    batch[0, : len(w)] = w
    with jax.enable_x64():
        got = np.asarray(log_mel_spectrogram(batch, cfg, dtype=np.float64))
    assert got.shape == ref.shape
    # residual is the complex64 rounding HF itself applies (f32 eps level)
    np.testing.assert_allclose(got, ref, atol=5e-6)


def test_log_mel_float32_deviation_bounded(waves, hf_ref):
    """Production f32 path: bounded deviation from the f64 oracle."""
    got = np.asarray(log_mel_batch(padded(waves), CFG))
    assert got.shape == hf_ref.shape == (3, 80, 3000)
    d = np.abs(got - hf_ref)
    assert d.mean() < 1e-3
    assert np.quantile(d, 0.999) < 1e-2
    assert d.max() < 5e-2


def test_log_mel_sine():
    # a 1 kHz tone must put its energy near the 1 kHz mel bin
    t = np.arange(CFG.n_samples) / 16000
    w = (0.5 * np.sin(2 * np.pi * 1000 * t)).astype(np.float32)
    feats = np.asarray(log_mel_batch(w[None], CFG))[0]
    peak_bin = int(np.argmax(feats.mean(axis=1)))
    # slaney scale: 1 kHz sits at mel 15 of [0, ~42] -> bin ~ 15/42*80 ~ 28
    assert 20 <= peak_bin <= 40
    assert np.all(feats >= (feats.max() - 8.0 + 4.0) / 4.0 - 1e-5)
