import io
import math

import numpy as np
import pytest

from multimodal_audio_search_tpu.audio import native
from multimodal_audio_search_tpu.audio.decode import load_audio, sniff_format
from multimodal_audio_search_tpu.audio.resample import resample
from multimodal_audio_search_tpu.audio.segment import (
    normalize_peak, pad_segment_batch, segment_audio, segment_windows)
from multimodal_audio_search_tpu.audio.wav import (
    read_wav, to_mono, write_wav)


# ----------------------------------------------------------------- segmenter
def test_segment_boundaries_parity():
    sr = 16000
    # 25 s -> windows [0,10), [10,20), [20,25): last kept (5 s >= 3 s)
    wins = segment_windows(25 * sr, sr)
    assert [(w.start_time, w.end_time) for w in wins] == [
        (0.0, 10.0), (10.0, 20.0), (20.0, 25.0)]
    # 22 s -> last window 2 s < 3 s: dropped
    wins = segment_windows(22 * sr, sr)
    assert [(w.start_time, w.end_time) for w in wins] == [
        (0.0, 10.0), (10.0, 20.0)]
    # exactly 3 s tail is kept (strict < in the reference)
    wins = segment_windows(23 * sr, sr)
    assert wins[-1].end_time == pytest.approx(23.0)
    # 2 s file -> nothing
    assert segment_windows(2 * sr, sr) == []
    # 10 s exact -> one window
    assert len(segment_windows(10 * sr, sr)) == 1


def test_normalize_peak_rules():
    quiet = np.full(100, 0.05, np.float32)
    out, peak = normalize_peak(quiet)
    assert peak == pytest.approx(0.05)
    assert np.max(np.abs(out)) == pytest.approx(0.5, abs=1e-6)
    loud = np.full(100, 0.99, np.float32)
    out, _ = normalize_peak(loud)
    assert np.max(np.abs(out)) == pytest.approx(0.8, abs=1e-6)
    mid = np.full(100, 0.5, np.float32)
    out, _ = normalize_peak(mid)
    np.testing.assert_array_equal(out, mid)
    silent = np.zeros(10, np.float32)
    out, peak = normalize_peak(silent)   # reference would divide by zero
    assert peak == 0.0 and np.all(out == 0)


def test_segment_audio_and_padding(rng):
    sr = 16000
    audio = rng.normal(size=int(17.5 * sr)).astype(np.float32) * 0.02
    wins, waves = segment_audio(audio, sr)
    assert len(wins) == 2
    assert wins[1].length == int(7.5 * sr)
    batch, lens = pad_segment_batch(waves, 10 * sr)
    assert batch.shape == (2, 10 * sr)
    assert lens.tolist() == [10 * sr, int(7.5 * sr)]
    assert np.all(batch[1, int(7.5 * sr):] == 0)
    # normalization applied before windowing (quiet -> boosted to 0.5)
    assert np.max(np.abs(batch)) == pytest.approx(0.5, abs=1e-5)


# ----------------------------------------------------------------- WAV codec
@pytest.mark.parametrize("bits", [16, 32])
def test_wav_roundtrip(tmp_path, rng, bits):
    sr = 22050
    x = np.clip(rng.normal(size=(1000, 2)) * 0.3, -0.99, 0.99) \
        .astype(np.float32)
    p = str(tmp_path / "t.wav")
    write_wav(p, x, sr, bits=bits)
    y, rate = read_wav(p)
    assert rate == sr and y.shape == x.shape
    tol = 1e-4 if bits == 16 else 1e-7
    np.testing.assert_allclose(y, x, atol=tol)


def test_wav_24bit_and_torchaudio_independence(tmp_path):
    # hand-build a 24-bit PCM file
    import struct
    sr, n = 8000, 64
    vals = np.linspace(-0.9, 0.9, n)
    ints = (vals * (1 << 23)).astype(np.int64)
    payload = b"".join(
        struct.pack("<i", int(v))[:3] for v in ints)
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI", b"RIFF", 36 + len(payload), b"WAVE",
        b"fmt ", 16, 1, 1, sr, sr * 3, 3, 24, b"data", len(payload))
    y, rate = read_wav(hdr + payload)
    assert rate == sr
    np.testing.assert_allclose(y[:, 0], vals, atol=2e-7)


def test_wav_error_paths():
    with pytest.raises(ValueError):
        read_wav(b"not a wav file at all")
    with pytest.raises(ValueError):
        load_audio(b"\x00" * 100)
    assert sniff_format(b"fLaC....") == "flac"
    assert sniff_format(b"ID3\x04...") == "mp3"


# ---------------------------------------------------------------- resampler
@pytest.mark.parametrize("sr_in,sr_out", [
    (44100, 16000), (48000, 16000), (22050, 16000), (8000, 16000),
    (16000, 16000)])
def test_resample_sine_fidelity(sr_in, sr_out):
    f = 440.0
    t = np.arange(int(sr_in * 0.5)) / sr_in
    x = np.sin(2 * math.pi * f * t).astype(np.float32)
    y = resample(x, sr_in, sr_out)
    assert len(y) == -(-len(x) * sr_out // sr_in)
    # compare against an ideal sine at the new rate (skip filter edges)
    ty = np.arange(len(y)) / sr_out
    ref = np.sin(2 * math.pi * f * ty)
    m = slice(200, len(y) - 200)
    err = np.max(np.abs(y[m] - ref[m]))
    assert err < 5e-3, err


def test_native_matches_python_resample(rng):
    if not native.available():
        pytest.skip("native toolchain unavailable")
    x = rng.normal(size=44100).astype(np.float32)
    y_py = resample(x, 44100, 16000)
    y_nat = native.resample(x, 44100, 16000)
    np.testing.assert_allclose(y_nat, y_py, atol=2e-5)


def test_native_wav_matches_python(tmp_path, rng):
    if not native.available():
        pytest.skip("native toolchain unavailable")
    x = (rng.normal(size=(5000, 2)) * 0.4).astype(np.float32)
    p = str(tmp_path / "t.wav")
    write_wav(p, x, 16000, bits=16)
    data = open(p, "rb").read()
    mono_nat, rate = native.wav_decode_mono(data)
    mono_py = to_mono(read_wav(data)[0])
    assert rate == 16000
    np.testing.assert_allclose(mono_nat, mono_py, atol=1e-6)


# ------------------------------------------------------------------- loader
def test_load_audio_end_to_end(tmp_path, rng):
    sr_file = 44100
    t = np.arange(sr_file * 2) / sr_file
    x = (0.5 * np.sin(2 * math.pi * 440 * t)).astype(np.float32)
    p = str(tmp_path / "tone.wav")
    write_wav(p, x, sr_file)
    y, sr = load_audio(p, sample_rate=16000)
    assert sr == 16000
    assert len(y) == -(-len(x) * 16000 // sr_file)
    ref = 0.5 * np.sin(2 * math.pi * 440 * np.arange(len(y)) / 16000)
    assert np.max(np.abs(y[200:-200] - ref[200:-200])) < 5e-3


def test_load_audio_from_bytes_and_stream(tmp_path, rng):
    x = rng.normal(size=16000).astype(np.float32) * 0.2
    p = str(tmp_path / "s.wav")
    write_wav(p, x, 16000)
    data = open(p, "rb").read()
    y1, _ = load_audio(data)
    y2, _ = load_audio(io.BytesIO(data))
    np.testing.assert_allclose(y1, y2)
    np.testing.assert_allclose(y1, x, atol=1e-4)


def test_peak_scale_matches_normalize_peak():
    """peak_scale is the FACTOR form of normalize_peak: multiplying the
    raw waveform by it must reproduce normalize_peak bitwise in every
    branch (quiet boost, loud attenuate, mid untouched, silent, empty).
    The ingest hot path relies on this equivalence to defer the
    normalization pass into quantize/storage."""
    from multimodal_audio_search_tpu.audio.segment import peak_scale
    rng = np.random.default_rng(7)
    base = rng.normal(size=4096).astype(np.float32)
    cases = [
        base * np.float32(0.05 / np.abs(base).max()),   # quiet  (<0.1)
        base * np.float32(0.99 / np.abs(base).max()),   # loud   (>0.95)
        base * np.float32(0.5 / np.abs(base).max()),    # mid    (untouched)
        np.zeros(100, np.float32),                      # silent
        np.zeros(0, np.float32),                        # empty
    ]
    for w in cases:
        ref, _ = normalize_peak(w)
        c = np.float32(peak_scale(w))
        got = w * c if c != np.float32(1.0) else w
        np.testing.assert_array_equal(got, ref)
    # mid/silent/empty must be exactly factor 1 (no multiply pass at all)
    for w in cases[2:]:
        assert peak_scale(w) == 1.0
