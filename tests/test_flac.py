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


def _crafted_frame(bs: int, subframe_bits) -> bytes:
    """Minimal frame header (mono, 16 bps, 16-bit blocksize field) + raw
    subframe bits; CRCs appended but unenforced by the decoder."""
    from flac_fixture import BitWriter, crc8, crc16
    h = BitWriter()
    h.write(0b11111111111110, 14)
    h.write(0, 1); h.write(0, 1)
    h.write(7, 4)        # 16-bit blocksize-1 follows
    h.write(0, 4); h.write(0, 4)      # rate from STREAMINFO; mono
    h.write(0b100, 3); h.write(0, 1)  # 16 bps
    h.write(0, 8)        # frame number 0
    h.write(bs - 1, 16)
    hdr = h.to_bytes() + bytes([crc8(h.to_bytes())])
    w = BitWriter()
    subframe_bits(w)
    frame = hdr + w.to_bytes()
    return frame + crc16(frame).to_bytes(2, "big")


@needs_native
def test_flac_lpc_order_exceeding_blocksize_rejected():
    """Crafted 1-sample frame with LPC order 32: the warmup would write
    31 samples past the blocksize-sized buffer (heap overflow) — must be
    rejected, not crash."""
    preamble = encode_flac(np.zeros(0, np.int16))   # fLaC + STREAMINFO

    def bits(w):
        w.write(0, 1)
        w.write(0b111111, 6)   # LPC order 32
        w.write(0, 1)          # no wasted bits
        w.write(0, 64)         # filler the parser may consume
    data = preamble + _crafted_frame(1, bits)
    assert native.flac_decode_mono(data) is None


@needs_native
def test_flac_wasted_bits_exceeding_bps_rejected():
    """Crafted wasted-bits run >= bps: effective bps goes negative and
    the bit cursor would rewind into out-of-bounds reads before the
    buffer — must be rejected, not crash."""
    preamble = encode_flac(np.zeros(0, np.int16))

    def bits(w):
        w.write(0, 1)
        w.write(1, 6)          # VERBATIM
        w.write(1, 1)          # wasted-bits flag
        w.write(0, 20); w.write(1, 1)   # unary 20 -> wasted = 21 >= 16
        w.write(0, 64)
    data = preamble + _crafted_frame(16, bits)
    assert native.flac_decode_mono(data) is None


@needs_native
def test_flac_corrupt_tail_salvages_prefix():
    """A stream whose final frame is corrupt returns the cleanly decoded
    prefix (tolerant-reader contract), not a whole-file failure."""
    x = tone(2048)
    good = encode_flac(x, blocksize=1024)

    def bits(w):
        w.write(0, 1)
        w.write(0b111111, 6)   # LPC order 32 on a 1-sample block
        w.write(0, 1)
        w.write(0, 64)
    data = good + _crafted_frame(1, bits)
    out = native.flac_decode_mono(data)
    assert out is not None
    y, rate = out
    assert rate == 16000 and len(y) == 2048
    np.testing.assert_allclose(y, x.astype(np.float32) / 32768.0,
                               atol=1e-4)
