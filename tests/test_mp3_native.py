"""Conformance suite for the from-scratch Layer III decoder.

Oracle: the system's libmpg123 (an independent implementation — ours shares
only the machine-probed data tables with it). Vectors are lame-encoded
in-test (tests/lame_fixture.py) so every MPEG version, sample rate, stereo
mode, VBR, short/start/stop blocks, scfsi, and the bit reservoir get
exercised by a real encoder; agreement is demanded SAMPLE-EXACT (float
rounding only), which is a far stronger bar than the waveform-correlation
check the FFI path originally shipped with (test_mp3.py).
"""
import numpy as np
import pytest

from multimodal_audio_search_tpu.audio import mp3, mp3_native
from multimodal_audio_search_tpu.audio.decode import load_audio, sniff_format

needs_native = pytest.mark.skipif(not mp3_native.available(),
                                  reason="native decoder build failed")
needs_oracle = pytest.mark.skipif(not mp3.available(),
                                  reason="libmpg123 oracle not available")

FIXTURE = ("/opt/venv/lib/python3.12/site-packages/pygame/examples/data/"
           "house_lo.mp3")


def _signal(rng, rate, secs=1.5, f=440.0):
    t = np.arange(int(rate * secs)) / rate
    x = 0.3 * np.sin(2 * np.pi * f * t) + 0.05 * rng.normal(size=len(t))
    for k in range(8):          # transients force short/start/stop blocks
        i = int((k + 0.5) * len(t) / 8)
        x[i:i + 50] += np.hanning(50) * 0.5 * (-1) ** k
    return np.clip(x, -0.9, 0.9).astype(np.float32)


def _stereo(rng, rate, secs=1.5):
    left = _signal(rng, rate, secs, 440.0)
    right = np.clip(0.7 * _signal(rng, rate, secs, 650.0) + 0.3 * left,
                    -0.9, 0.9)
    return np.stack([left, right], axis=1).astype(np.float32)


def _assert_sample_exact(data: bytes, atol=3e-6):
    ours, r1 = mp3_native.decode_mp3_native(data)
    ref, r2 = mp3.decode_mp3(data)
    assert r1 == r2
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=atol)


@needs_native
@needs_oracle
@pytest.mark.parametrize("rate,bitrate", [
    (44100, 128), (48000, 192), (32000, 64),      # MPEG-1
    (22050, 64), (24000, 48), (16000, 32),        # MPEG-2 (LSF)
    (11025, 32), (12000, 32), (8000, 24),         # MPEG-2.5
])
def test_all_rates_mono_sample_exact(rng, rate, bitrate):
    from tests.lame_fixture import encode
    data = encode(_signal(rng, rate), rate, bitrate=bitrate, mode=3)
    _assert_sample_exact(data)


@needs_native
@needs_oracle
@pytest.mark.parametrize("mode,vbr", [(1, False), (0, False), (1, True)])
def test_stereo_modes_sample_exact(rng, mode, vbr):
    from tests.lame_fixture import encode
    data = encode(_stereo(rng, 44100), 44100, bitrate=128, mode=mode,
                  vbr=vbr)
    _assert_sample_exact(data)


@needs_native
@needs_oracle
def test_lsf_joint_stereo_sample_exact(rng):
    from tests.lame_fixture import encode
    data = encode(_stereo(rng, 22050), 22050, bitrate=48, mode=1)
    _assert_sample_exact(data)
    data = encode(_stereo(rng, 11025), 11025, bitrate=32, mode=1)
    _assert_sample_exact(data)


@needs_native
@needs_oracle
def test_real_world_fixture_sample_exact():
    try:
        with open(FIXTURE, "rb") as f:
            data = f.read()
    except OSError:
        pytest.skip("pygame mp3 fixture not present")
    _assert_sample_exact(data)


@needs_native
@needs_oracle
def test_crafted_frames_sample_exact(rng):
    """Bit-reservoir-free crafted frames with random Huffman content
    through the ESC table 31 (13 linbits) — values libmpg123 and we must
    both requantize identically."""
    import sys
    import pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).resolve()
                           .parents[1] / "tools"))
    from mp3_frames import GranuleSpec, probe_stream
    probes = []
    for t in (13, 15, 16, 24, 31):
        for _ in range(5):
            bits = "".join("01"[b] for b in rng.integers(0, 2, size=40)) \
                + "1" * 40
            probes.append(GranuleSpec(
                data_bits=bits, big_values=4, table_select=(t, t, t),
                region0_count=15, region1_count=7, global_gain=160))
    _assert_sample_exact(probe_stream(probes))


@needs_native
def test_native_is_the_production_path(rng):
    """load_audio routes mp3 through the from-scratch decoder."""
    from tests.lame_fixture import encode
    wave = _signal(rng, 44100, secs=1.0)
    data = encode(wave, 44100, bitrate=128, mode=3)
    assert sniff_format(data) == "mp3"
    y, sr = load_audio(data, sample_rate=16_000)
    assert sr == 16_000
    native, rate = mp3_native.decode_mp3_native(data)
    assert abs(len(y) - (-(-len(native) * 16_000 // rate))) <= 1


@needs_native
def test_native_garbage_rejected():
    with pytest.raises(ValueError):
        mp3_native.decode_mp3_native(b"\xff\xe0" + b"\x00" * 64)
    with pytest.raises(ValueError):
        mp3_native.decode_mp3_native(b"not an mp3 at all")


@needs_native
def test_id3v2_tag_skipped(rng):
    from tests.lame_fixture import encode
    data = encode(_signal(rng, 44100, secs=0.5), 44100, bitrate=128, mode=3)
    tag = b"ID3\x04\x00\x00\x00\x00\x00\x0a" + b"\x00" * 10
    with_tag = tag + data
    a, r1 = mp3_native.decode_mp3_native(data)
    b, r2 = mp3_native.decode_mp3_native(with_tag)
    np.testing.assert_array_equal(a, b)


@needs_native
@needs_oracle
def test_intensity_stereo_crafted_frames():
    """Intensity stereo (and intensity+MS) conformance via crafted joint
    stereo frames — no encoder in the image emits intensity, so the frames
    are hand-packed: left carries wideband content, right carries a short
    spectrum plus is_pos scalefactors (including the 'illegal' 7 = skip)."""
    import json
    import pathlib
    import sys
    sys.path.insert(0, str(pathlib.Path(__file__).resolve()
                           .parents[1] / "tools"))
    from mp3_frames import GranuleSpec, frame_stereo, SILENT

    books = json.loads((pathlib.Path(__file__).resolve().parents[1] /
                        "tools" / "mp3_tables.json").read_text())["books"]
    b15 = books["15"]

    def code(x, y):
        return next(k for k, v in b15.items() if v == [x, y])

    lb = (code(3, 2) + "00") * 40          # 80 left lines of content
    rb = (code(1, 1) + "00") * 4           # 8 right lines, zero above
    for is_pos in ([1, 2, 3, 4, 5, 6, 0, 1, 2, 3, 4, 5, 6, 1, 2, 3, 4,
                    5, 0, 1, 2],
                   [7, 7, 3, 7, 0, 6, 7, 2, 7, 1, 7, 5, 7, 4, 7, 3, 7,
                    2, 7, 1, 7]):          # incl. is_pos 7 = no processing
        sf_bits = "".join(format(v, "04b") for v in is_pos[:11]) + \
                  "".join(format(v, "03b") for v in is_pos[11:21])
        gl = GranuleSpec(data_bits=lb, big_values=40,
                         table_select=(15, 15, 15), region0_count=15,
                         region1_count=7, global_gain=200)
        gr_ = GranuleSpec(data_bits=sf_bits + rb, big_values=4,
                          table_select=(15, 15, 15), region0_count=15,
                          region1_count=7, global_gain=200,
                          scalefac_compress=15)
        frames = [frame_stereo([(SILENT, SILENT)] * 2)]
        for mode_ext in (1, 3):            # intensity; intensity + MS
            frames.append(frame_stereo([(gl, gr_), (SILENT, SILENT)],
                                       mode_ext=mode_ext))
            frames.append(frame_stereo([(SILENT, SILENT)] * 2,
                                       mode_ext=mode_ext))
        data = b"".join(frames)
        ours, r1 = mp3_native.decode_mp3_native(data)
        ref, r2 = mp3.decode_mp3(data)
        assert r1 == r2 and ours.shape == ref.shape
        peak = max(float(np.abs(ref).max()), 1.0)
        np.testing.assert_allclose(ours, ref, atol=3e-6 * peak)


@needs_native
@needs_oracle
@pytest.mark.parametrize("rate,bitrate", [
    (22050, 64), (16000, 64), (11025, 32), (8000, 32)])
def test_lsf_mixed_block_crafted_frames(rate, bitrate):
    """LSF (MPEG-2/2.5) mixed-block conformance via crafted frames — no
    encoder emits mixed blocks, and the round-2 advisor flagged that the
    hardcoded 36-line long/short split is wrong at 8 kHz, where the wide
    short bands put it at 3*short_[3] = 72. Probed both with flat gains
    (reorder layout) and nonzero subblock gains (requantize band
    scaling); all rates must be sample-exact vs libmpg123."""
    import json
    import pathlib
    import sys
    sys.path.insert(0, str(pathlib.Path(__file__).resolve()
                           .parents[1] / "tools"))
    from mp3_frames import GranuleSpec, probe_stream_lsf

    books = json.loads((pathlib.Path(__file__).resolve().parents[1] /
                        "tools" / "mp3_tables.json").read_text())["books"]
    code = next(k for k, v in books["15"].items() if v == [3, 2])
    for sbg in ((0, 0, 0), (1, 2, 3)):
        g = GranuleSpec(data_bits=(code + "00") * 50, big_values=50,
                        table_select=(15, 15, 15), global_gain=190,
                        window_switching=True, block_type=2,
                        mixed_block=True, subblock_gain=sbg)
        data = probe_stream_lsf([g], rate=rate, bitrate=bitrate)
        ours, r1 = mp3_native.decode_mp3_native(data)
        ref, r2 = mp3.decode_mp3(data)
        assert r1 == r2 and ours.shape == ref.shape
        peak = max(float(np.abs(ref).max()), 1.0)
        np.testing.assert_allclose(ours, ref, atol=3e-6 * peak)
