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


def _books_code():
    import json
    import pathlib
    books = json.loads((pathlib.Path(__file__).resolve().parents[1] /
                        "tools" / "mp3_tables.json").read_text())["books"]

    def code(x, y):
        return next(k for k, v in books["15"].items() if v == [x, y])
    return code


def _cmp_oracle(data: bytes, atol_scale=3e-6):
    ours, r1 = mp3_native.decode_mp3_native(data)
    ref, r2 = mp3.decode_mp3(data)
    assert r1 == r2 and ours.shape == ref.shape
    peak = max(float(np.abs(ref).max()), 1.0)
    np.testing.assert_allclose(ours, ref, atol=atol_scale * peak)


@needs_native
@needs_oracle
def test_intensity_wideband_and_misaligned_bound():
    """Long-block intensity edge cases the first crafted vectors missed:
    (a) left content through band 21 (no transmitted scalefactor — the
    trailing-band rule reuses band 20's is_pos), and (b) a right-channel
    zero region starting MID-band (6 lines; 48 kHz bands start 0/4/8):
    MS must extend through the partially-zero band, i.e. the intensity
    bound rounds UP to the next band boundary."""
    import sys
    import pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).resolve()
                           .parents[1] / "tools"))
    from mp3_frames import GranuleSpec, frame_stereo, SILENT
    code = _books_code()
    is_pos = [1, 2, 3, 4, 5, 6, 0, 1, 2, 3, 4, 5, 6, 1, 2, 3, 4, 5, 0,
              1, 2]
    sf_bits = "".join(format(v, "04b") for v in is_pos[:11]) + \
              "".join(format(v, "03b") for v in is_pos[11:21])
    gl = GranuleSpec(data_bits=(code(3, 2) + "00") * 288, big_values=288,
                     table_select=(15, 15, 15), region0_count=15,
                     region1_count=7, global_gain=200)
    for pairs in (4, 3):                  # bound on / off a band edge
        gr_ = GranuleSpec(data_bits=sf_bits + (code(1, 1) + "00") * pairs,
                          big_values=pairs, table_select=(15, 15, 15),
                          region0_count=15, region1_count=7,
                          global_gain=200, scalefac_compress=15)
        for mode_ext in (1, 3):
            _cmp_oracle(b"".join([
                frame_stereo([(SILENT, SILENT)] * 2),
                frame_stereo([(gl, gr_), (SILENT, SILENT)],
                             mode_ext=mode_ext),
                frame_stereo([(SILENT, SILENT)] * 2, mode_ext=mode_ext)]))


@needs_native
@needs_oracle
def test_intensity_short_blocks_crafted():
    """Short-block intensity: the spec determines the zero region PER
    WINDOW — conformance caught the single-bound version scaling windows
    that still had right-channel content."""
    import sys
    import pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).resolve()
                           .parents[1] / "tools"))
    from mp3_frames import GranuleSpec, frame_stereo, SILENT
    code = _books_code()
    short_sf = "".join(format(v, "04b") for v in
                       [1, 2, 3, 4, 5, 6, 0, 1, 2, 3, 4, 5, 6, 1, 2, 3,
                        4, 5]) + \
               "".join(format(v, "03b") for v in
                       [0, 1, 2, 7, 7, 7, 3, 4, 5, 1, 2, 3, 4, 5, 6, 0,
                        1, 2])
    gl = GranuleSpec(data_bits=(code(3, 2) + "00") * 288, big_values=288,
                     table_select=(15, 15, 15), global_gain=200,
                     window_switching=True, block_type=2)
    gr_ = GranuleSpec(data_bits=short_sf + (code(1, 1) + "00") * 4,
                      big_values=4, table_select=(15, 15, 15),
                      global_gain=200, window_switching=True,
                      block_type=2, scalefac_compress=15)
    for mode_ext in (1, 3):
        _cmp_oracle(b"".join([
            frame_stereo([(SILENT, SILENT)] * 2),
            frame_stereo([(gl, gr_), (SILENT, SILENT)],
                         mode_ext=mode_ext),
            frame_stereo([(SILENT, SILENT)] * 2, mode_ext=mode_ext)]))


@needs_native
@needs_oracle
@pytest.mark.parametrize("block", ["long", "short"])
@pytest.mark.parametrize("int_scale", [0, 1])
def test_lsf_intensity_crafted(block, int_scale):
    """LSF (MPEG-2) intensity stereo — a different panning law from
    MPEG-1 (io^((is_pos+1)/2), io by scalefac_compress bit 0; the
    per-band all-ones value is the no-intensity marker). The decoder
    previously skipped intensity entirely at LSF and, at mode_ext=3,
    skipped MS too (raw mid/side played back)."""
    import sys
    import pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).resolve()
                           .parents[1] / "tools"))
    from mp3_frames import GranuleSpec, frame_stereo_lsf, SILENT
    code = _books_code()
    sfc_r = (129 << 1) | int_scale       # int_ch slens (3,3,3)
    if block == "long":
        sf = "".join(format(v, "03b")
                     for v in ([1, 2, 3, 4, 5, 6, 0] * 3)[:21])
        extra = {}
    else:
        sf = "".join(format(v, "03b")
                     for v in ([1, 2, 3, 4, 5, 6, 0, 1, 2, 3, 4, 5]
                               * 3)[:36])
        extra = {"window_switching": True, "block_type": 2}
    gl = GranuleSpec(data_bits=(code(3, 2) + "00") * 200, big_values=200,
                     table_select=(15, 15, 15), global_gain=200,
                     **({} if block == "long"
                        else extra),
                     **({"region0_count": 15, "region1_count": 7}
                        if block == "long" else {}))
    gr_ = GranuleSpec(data_bits=sf + (code(1, 1) + "00") * 4,
                      big_values=4, table_select=(15, 15, 15),
                      global_gain=200, scalefac_compress=sfc_r,
                      **({"region0_count": 15, "region1_count": 7}
                         if block == "long" else extra))
    for mode_ext in (1, 3):
        _cmp_oracle(b"".join([
            frame_stereo_lsf((SILENT, SILENT), bitrate=144),
            frame_stereo_lsf((gl, gr_), mode_ext=mode_ext, bitrate=144),
            frame_stereo_lsf((SILENT, SILENT), mode_ext=mode_ext,
                             bitrate=144)]))


@needs_native
@needs_oracle
def test_lsf_preflag_not_latched():
    """LSF sets preflag implicitly via scalefac_compress >= 500 and has
    no side-info bit to clear it: a latched preflag from frame k must
    not mis-scale bands 11-20 of frame k+1."""
    import sys
    import pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).resolve()
                           .parents[1] / "tools"))
    from mp3_frames import GranuleSpec, probe_stream_lsf
    code = _books_code()
    content = (code(3, 2) + "00") * 110
    mk = lambda sfc: GranuleSpec(  # noqa: E731
        data_bits=content, big_values=110, table_select=(15, 15, 15),
        region0_count=15, region1_count=7, global_gain=190,
        scalefac_compress=sfc)
    _cmp_oracle(probe_stream_lsf([mk(500), mk(0)], rate=22050,
                                 bitrate=64))


@needs_native
def test_vbr_tag_frame_skipped(rng):
    """A leading Xing/Info frame is encoder metadata: decoding it as
    audio prepends ~26 ms of silence and shifts every timestamp (the
    mpg123/ffmpeg chains the reference rode both skip it). The raw
    libmpg123 feed API does NOT skip, so the assertion is against our
    own untagged decode."""
    import sys
    import pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).resolve()
                           .parents[1] / "tools"))
    from mp3_frames import frame_mono, SILENT
    from tests.lame_fixture import encode
    data = encode(_signal(rng, 44100, secs=1.0), 44100, bitrate=128,
                  mode=3)
    clean, r1 = mp3_native.decode_mp3_native(data)
    tagf = bytearray(frame_mono([SILENT, SILENT], rate=44100,
                                bitrate=128))
    for magic in (b"Xing", b"Info"):
        tagf[21:25] = magic              # 4 (header) + 17 (mono side info)
        tagf[25:29] = b"\x00" * 4        # flags: no fields
        tagged, r2 = mp3_native.decode_mp3_native(bytes(tagf) + data)
        assert r1 == r2
        np.testing.assert_array_equal(clean, tagged)


@needs_native
def test_false_sync_in_leading_junk(rng):
    """A byte pair inside pre-stream junk that parses as a valid header
    must not lock the decoder onto a bogus format (it previously made
    the first REAL frame look like a format change and rejected the
    whole file)."""
    from tests.lame_fixture import encode
    data = encode(_signal(rng, 48000, secs=0.5), 48000, bitrate=128,
                  mode=3)
    clean, r1 = mp3_native.decode_mp3_native(data)
    # 0xFF 0xFB 0x92 0x00: MPEG-1 L3 128k 44.1 kHz (wrong rate) framed
    # inside junk that contains no second matching header
    junk = b"\x00garbage" + bytes([0xFF, 0xFB, 0x92, 0x00]) + \
        b"\x01" * 64
    got, r2 = mp3_native.decode_mp3_native(junk + data)
    assert r1 == r2 == 48000
    np.testing.assert_array_equal(clean, got)


@needs_native
def test_concurrent_decodes_fresh_process(rng, tmp_path):
    """The shared decode tables (Huffman LUTs, pow43, antialias, IMDCT,
    synthesis matrix) build on first use; the threaded HTTP server
    decodes uploads concurrently with the GIL released, so first-use
    initialization must be thread-safe. Races only exist before the
    tables are built, hence the fresh subprocess."""
    import pathlib
    import subprocess
    import sys
    from tests.lame_fixture import encode
    data = encode(_signal(rng, 44100, secs=1.0), 44100, bitrate=128,
                  mode=1)
    p = tmp_path / "c.mp3"
    p.write_bytes(data)
    repo = str(pathlib.Path(__file__).resolve().parents[1])
    script = (
        "import sys, threading\n"
        "import numpy as np\n"
        f"sys.path.insert(0, {repo!r})\n"
        "from multimodal_audio_search_tpu.audio import mp3_native\n"
        f"data = open({str(p)!r}, 'rb').read()\n"
        "outs = [None] * 8\n"
        "def run(i):\n"
        "    outs[i] = mp3_native.decode_mp3_native(data)\n"
        "ts = [threading.Thread(target=run, args=(i,)) for i in range(8)]\n"
        "[t.start() for t in ts]; [t.join() for t in ts]\n"
        "ref = outs[0][0]\n"
        "assert all(np.array_equal(o[0], ref) and o[1] == outs[0][1]\n"
        "           for o in outs)\n"
        "print('CONCURRENT_OK')\n")
    out = subprocess.run([sys.executable, "-c", script],
                         capture_output=True, text=True, timeout=300)
    assert "CONCURRENT_OK" in out.stdout, (out.stdout, out.stderr)
