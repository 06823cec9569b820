import numpy as np
import pytest

from multimodal_audio_search_tpu.audio import native
from multimodal_audio_search_tpu.audio.decode import load_audio

from flac_fixture import encode_flac

needs_native = pytest.mark.skipif(
    not native.available() or native.get_lib() is None
    or not hasattr(native.get_lib(), "mas_flac_probe"),
    reason="native FLAC decoder unavailable")


def tone(n, ch=1, f=440.0, rate=16000, amp=8000):
    t = np.arange(n) / rate
    x = (amp * np.sin(2 * np.pi * f * t)).astype(np.int16)
    if ch == 2:
        x = np.stack([x, (x // 2)], axis=1)
    return x


@needs_native
@pytest.mark.parametrize("mode", ["verbatim", "constant", "fixed0",
                                  "fixed1", "fixed2"])
def test_flac_mono_roundtrip(mode):
    if mode == "constant":
        x = np.full(3000, 1234, np.int16)
    else:
        x = tone(3000)
    data = encode_flac(x, rate=16000, blocksize=1024, mode=mode)
    got = native.flac_decode_mono(data)
    assert got is not None, "decode failed"
    y, rate = got
    assert rate == 16000
    assert len(y) == len(x)
    np.testing.assert_allclose(y, x.astype(np.float32) / 32768.0,
                               atol=1e-6)


@needs_native
def test_flac_stereo_mixdown():
    x = tone(2500, ch=2)
    data = encode_flac(x, rate=22050, blocksize=512, mode="fixed1")
    y, rate = native.flac_decode_mono(data)
    assert rate == 22050
    expected = x.astype(np.float32).mean(axis=1) / 32768.0
    np.testing.assert_allclose(y, expected, atol=1e-6)


@needs_native
def test_flac_through_load_audio():
    x = tone(int(16000 * 1.5))
    data = encode_flac(x, rate=16000, mode="fixed2")
    y, sr = load_audio(data, sample_rate=16000)
    assert sr == 16000
    np.testing.assert_allclose(y, x.astype(np.float32) / 32768.0, atol=1e-6)
    # resample path: 22.05k container -> 16k pipeline rate
    data = encode_flac(tone(22050, rate=22050), rate=22050)
    y, sr = load_audio(data, sample_rate=16000)
    assert sr == 16000 and len(y) == -(-22050 * 16000 // 22050)


@needs_native
def test_flac_unknown_length_not_truncated():
    # STREAMINFO total_samples=0 (unknown-length stream). Constant blocks
    # compress far below 1 bit/sample, so the old bytes*8 capacity heuristic
    # truncated valid streams; the wrapper must regrow until complete.
    x = np.full(200_000, 777, np.int16)
    data = encode_flac(x, rate=16000, blocksize=4096, mode="constant",
                       total_in_streaminfo=False)
    assert len(data) * 8 < len(x)  # fixture really stresses the regrow path
    y, rate = native.flac_decode_mono(data)
    assert rate == 16000
    assert len(y) == len(x)
    np.testing.assert_allclose(y, x.astype(np.float32) / 32768.0, atol=1e-6)


@needs_native
def test_flac_garbage_rejected():
    assert native.flac_decode_mono(b"fLaC" + b"\x00" * 10) is None
    with pytest.raises(ValueError):
        load_audio(b"fLaC" + b"\x00" * 64)
