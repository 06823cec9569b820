"""ClapFeatureExtractor-parity log-mel frontend (unfused / rand_trunc path).

The reference's CLAP iteration fed 48 kHz audio through HF's
ClapFeatureExtractor (previous_iterations/streamlit_app_backup.py:598-638).
This reimplements the *unfused-checkpoint* configuration — the one the
reference used — exactly:

  * 1024-point STFT, hop 480, periodic Hann, reflect center padding,
    power-2 spectrum  (transformers/audio_utils.spectrogram defaults)
  * 64 slaney-scale slaney-normalized mel filters over 0..14 kHz at 48 kHz
  * dB log: 10*log10(max(mel, 1e-10)), no top_db clamp
  * short clips: "repeatpad" (tile whole copies, zero-pad the tail) to 10 s
  * long clips: a crop of exactly max_length samples. HF picks the offset
    with np.random; determinism matters more than parity-of-RNG here, so the
    caller passes ``crop_offset`` (default 0 == HF's idx=0 draw).

Host-side numpy by design: the mel is [1001, 64] f32 (256 KB) vs 960 KB of
48 kHz int16 waveform — computing it host-side *reduces* tunnel bytes before
the HTSAT tower (models/clap_htsat.py) runs on device.

Parity oracle: tests/test_clap_htsat.py::test_feature_extractor_parity
(random waveforms vs transformers.ClapFeatureExtractor(truncation=
"rand_trunc"), the laion/clap-htsat-unfused preprocessor config).
"""
from __future__ import annotations

from functools import lru_cache

import numpy as np

from ..ops.mel import hann_window, mel_filterbank

SAMPLE_RATE = 48_000
N_FFT = 1024
HOP = 480
N_MELS = 64
FMIN = 0.0
FMAX = 14_000.0
MAX_LENGTH_S = 10
MAX_SAMPLES = MAX_LENGTH_S * SAMPLE_RATE


@lru_cache(maxsize=1)
def _mel_matrix() -> np.ndarray:
    """[n_freqs, n_mels] slaney filterbank, float64 (HF computes in f64)."""
    return mel_filterbank(N_MELS, N_FFT, SAMPLE_RATE, FMIN, FMAX).T


def _pad_short(wave: np.ndarray, max_length: int, padding: str) -> np.ndarray:
    if len(wave) >= max_length:
        return wave
    if padding == "repeat":
        n = max_length // len(wave)
        wave = np.tile(wave, n + 1)[:max_length]
    elif padding == "repeatpad":
        n = max_length // len(wave)
        wave = np.tile(wave, max(n, 1))
    elif padding != "pad":
        raise ValueError(f"unknown padding mode {padding!r}")
    return np.pad(wave, (0, max_length - len(wave)))


def clap_log_mel(
    wave_48k: np.ndarray,
    max_length: int = MAX_SAMPLES,
    padding: str = "repeatpad",
    crop_offset: int = 0,
) -> np.ndarray:
    """48 kHz float waveform -> [n_frames, 64] float32 log-mel.

    n_frames = max_length // hop + 1 (1001 for the 10 s default).
    """
    wave = np.asarray(wave_48k, np.float64)
    if wave.ndim != 1:
        raise ValueError("clap_log_mel expects mono [n] audio")
    if len(wave) > max_length:
        crop_offset = min(max(crop_offset, 0), len(wave) - max_length)
        wave = wave[crop_offset:crop_offset + max_length]
    else:
        wave = _pad_short(wave, max_length, padding)

    half = N_FFT // 2
    padded = np.pad(wave, (half, half), mode="reflect")
    n_frames = (len(padded) - N_FFT) // HOP + 1
    idx = np.arange(N_FFT)[None, :] + HOP * np.arange(n_frames)[:, None]
    frames = padded[idx] * hann_window(N_FFT)[None, :]
    spec = np.abs(np.fft.rfft(frames, axis=-1)) ** 2      # [T, n_freqs]
    mel = spec @ _mel_matrix()                            # [T, 64]
    return (10.0 * np.log10(np.maximum(mel, 1e-10))).astype(np.float32)


def clap_input_features(
    wave_48k: np.ndarray, crop_offset: int = 0
) -> np.ndarray:
    """Waveform -> [1, 1, T, 64] model input (ClapAudioModel layout)."""
    return clap_log_mel(wave_48k, crop_offset=crop_offset)[None, None]
