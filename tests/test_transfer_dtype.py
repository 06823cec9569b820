import numpy as np
import jax.numpy as jnp
import pytest

from multimodal_audio_search_tpu import EngineConfig
from multimodal_audio_search_tpu.config import DecodeConfig, MelConfig
from multimodal_audio_search_tpu.models import whisper as W
from multimodal_audio_search_tpu.models.minilm import MiniLMConfig
from multimodal_audio_search_tpu.pipelines.embed import TextEmbedder
from multimodal_audio_search_tpu.pipelines.ingest import DualPipelineIngest
from multimodal_audio_search_tpu.pipelines.whisper_pipeline import (
    WhisperTextPipeline)


def make_ingest(transfer):
    wcfg = W.WhisperConfig(
        vocab_size=128, d_model=32, enc_layers=1, dec_layers=1, heads=2,
        ffn=64, enc_positions=150, dec_positions=12,
        bos_token_id=100, eos_token_id=101, pad_token_id=101)
    mel = MelConfig(padded_seconds=3.0)
    d = DecodeConfig(max_new_tokens=3)
    cfg = EngineConfig(ingest_batch=4, transfer_dtype=transfer)
    return DualPipelineIngest(
        WhisperTextPipeline(cfg=wcfg, decode=d, mel_cfg=mel,
                            dtype=jnp.float32, name="asr"),
        WhisperTextPipeline(cfg=wcfg, decode=d, mel_cfg=mel,
                            dtype=jnp.float32, name="caption", seed=1,
                            prefix_ids=[100]),
        TextEmbedder(cfg=MiniLMConfig(vocab_size=512, hidden=64, layers=1,
                                      heads=2, intermediate=128)),
        cfg)


@pytest.mark.parametrize("transfer",
                         ["float32", "int16", "int16d", "int12", "mulaw8",
                          "mel16", "mel12", "mel8", "auto"])
def test_transfer_dtypes_agree(rng, transfer):
    """All transfer encodings produce identical decoded tokens on the same
    audio (the models are coarse enough that 8/16-bit waveform quantization
    must not change argmax decode on this input)."""
    wave = (rng.normal(size=16000 * 7) * 0.3).astype(np.float32)
    segs = make_ingest(transfer).process_waveform(wave, 16000, "x")
    texts = [(s["asr_text"], s["audio_description"]) for s in segs]
    ref = make_ingest("float32").process_waveform(wave, 16000, "x")
    ref_texts = [(s["asr_text"], s["audio_description"]) for s in ref]
    assert texts == ref_texts


def test_int16d_delta_roundtrip_bit_exact(rng):
    """int16d transfer: wraparound first differences undone by the device
    cumsum must reproduce the int16 codes BIT-exactly, including extreme
    alternating samples (per-delta wrap) and rows long enough that the
    int32 cumsum itself overflows (mod-2^32 wrap is consistent mod 2^16,
    which the re-centering keeps)."""
    import jax.numpy as jnp
    q = rng.integers(-32768, 32768, size=(2, 200_000)).astype(np.int16)
    q[0, :4] = [32767, -32768, 32767, -32768]
    q[1, :] = 32767                      # max-magnitude running sum
    # host encode (the int16d branch of encode_transfer)
    d = np.empty_like(q)
    d[:, 0] = q[:, 0]
    np.subtract(q[:, 1:], q[:, :-1], out=d[:, 1:])
    # device decode (the int16d branch of _mel16)
    c = jnp.cumsum(jnp.asarray(d).astype(jnp.int32), axis=1)
    r = ((c + 32768) % 65536) - 32768
    np.testing.assert_array_equal(np.asarray(r, np.int32),
                                  q.astype(np.int32))


def test_auto_transfer_resolves_and_caches(rng):
    """transfer_dtype="auto" probes the lossless candidates with the
    first real payload, locks a candidate, and does not re-probe until
    the shipped-bytes cadence elapses."""
    ing = make_ingest("auto")
    wave = (rng.normal(size=16000 * 7) * 0.3).astype(np.float32)
    ing.process_waveform(wave, 16000, "x")
    assert ing.last_transfer_resolved in ing.AUTO_TRANSFER_CANDIDATES
    assert ing.last_trace["probe"] > 0.0
    # every candidate got a decision-grade probe entry (median of warm
    # reps — the round-4 verdict's min-of-2 probe made a bad pick)
    assert set(ing.last_probe) == set(ing.AUTO_TRANSFER_CANDIDATES)
    first = ing._auto_transfer_choice
    ing.process_waveform(wave, 16000, "y")
    # cached: the resolver returns immediately (µs, vs ms for a probe)
    assert ing.last_trace["probe"] < 1e-3
    assert ing._auto_transfer_choice == first
    # shipped bytes accumulate toward the re-probe cadence
    assert ing._bytes_since_probe > 0


def test_auto_transfer_reprobes_on_weather_cadence(rng):
    """Session weather flips per-mode tunnel rates (round-4 verdict item
    4): after AUTO_REPROBE_MB shipped, the next ingest re-measures the
    candidates instead of trusting a stale one-shot choice."""
    ing = make_ingest("auto")
    wave = (rng.normal(size=16000 * 7) * 0.3).astype(np.float32)
    ing.process_waveform(wave, 16000, "x")
    assert ing.last_trace["probe"] > 0.0
    ing._bytes_since_probe = ing.AUTO_REPROBE_MB * 1e6   # cadence elapsed
    ing.process_waveform(wave, 16000, "y")
    assert ing.last_trace["probe"] > 0.0                 # re-probed
    assert ing._bytes_since_probe < ing.AUTO_REPROBE_MB * 1e6  # reset


def test_auto_transfer_candidates_bit_exact_only():
    """The lossless auto set must contain only BIT-EXACT transfer modes:
    int12 was measured NOT transcript-exact at production geometry
    (0.922 agree-exact, docs/onchip_r4/drift_prod_s4.out) and must never
    ride the fast_lossless headline again."""
    assert set(DualPipelineIngest.AUTO_TRANSFER_CANDIDATES) == {
        "int16", "int16d"}


def test_mulaw_roundtrip_accuracy(rng):
    x = np.clip(rng.normal(size=4096) * 0.3, -1, 1).astype(np.float32)
    y = np.sign(x) * np.log1p(255 * np.abs(x)) / np.log(256)
    q = np.round(y * 127).astype(np.int8)
    yd = q.astype(np.float32) / 127.0
    xd = np.sign(yd) * (np.power(256.0, np.abs(yd)) - 1) / 255.0
    # companded 8-bit: relative error small for mid/large amplitudes
    big = np.abs(x) > 0.05
    assert np.max(np.abs(xd[big] - x[big]) / np.abs(x[big])) < 0.04


def test_int12_roundtrip_accuracy(rng):
    """Packed 12-bit transfer: uniform grid of 1/2047 — worst-case
    absolute error half a step, ~72 dB SNR on full-scale signals."""
    from multimodal_audio_search_tpu.pipelines.ingest import _pack_int12
    x = np.clip(rng.normal(size=4097) * 0.3, -1, 1).astype(np.float32)
    pk = _pack_int12(x).astype(np.int32).reshape(-1, 3)
    q0 = pk[:, 0] | ((pk[:, 1] & 0xF) << 8)
    q1 = (pk[:, 1] >> 4) | (pk[:, 2] << 4)
    q = np.stack([q0, q1], -1).reshape(-1)[: len(x)]
    q = np.where(q >= 2048, q - 4096, q)
    xd = q.astype(np.float32) / 2047.0
    assert np.max(np.abs(xd - x)) <= 0.5 / 2047.0 + 1e-7
    # all-zero packed bytes decode to exact silence (batch padding rows)
    z = np.zeros(6, np.int32)
    qz0 = z[0] | ((z[1] & 0xF) << 8)
    assert qz0 == 0


def test_int12_native_bit_exact_vs_numpy(rng):
    """The fused C int12 packer must match _pack_int12 byte-for-byte,
    including half-grid points, NaN/inf, clipping, scale, and odd tails."""
    from multimodal_audio_search_tpu.audio import native
    from multimodal_audio_search_tpu.pipelines.ingest import _pack_int12
    if not native.available() or not hasattr(
            native.get_lib(), "mas_quantize_int12"):
        pytest.skip("native toolchain unavailable")
    grid = (np.arange(-8, 9, dtype=np.float32) - 0.5) / 2047.0
    specials = np.array(
        [0.0, 1.0, -1.0, 1.5, -1.5, np.nan, np.inf, -np.inf,
         np.float32(0.5 / 2047.0), np.float32(-0.5 / 2047.0)], np.float32)
    for scale in (1.0, 0.8 / 0.97, 0.5 / 0.03):
        for extra in (0, 1):  # even and odd lengths (implicit-zero tail)
            w = np.concatenate([
                grid, specials,
                (rng.normal(size=4096 + extra) * 0.4).astype(np.float32)])
            w = w.astype(np.float32)
            wn = w * np.float32(scale)
            ref = _pack_int12(wn)
            out = np.zeros(3 * ((len(w) + 1) // 2), np.uint8)
            assert native.quantize_int12(w, float(scale), out)
            np.testing.assert_array_equal(out, ref)


def test_native_quantize_bit_exact_vs_numpy(rng):
    """The fused C quantizers (native/audio_kernels.cc) must match the
    numpy closed forms bit-for-bit, including half-grid samples, NaN,
    +/-inf, clipped values, and a non-unit deferred-normalization scale."""
    from multimodal_audio_search_tpu.audio import native
    from multimodal_audio_search_tpu.pipelines.ingest import _mulaw_lut
    if not native.available():
        pytest.skip("native toolchain unavailable")
    lut = _mulaw_lut()
    # adversarial samples: exact grid points, half-grid midpoints, ends
    grid = (np.arange(-8, 9, dtype=np.float32) - 0.5) / 32767.5
    specials = np.array(
        [0.0, 1.0, -1.0, 1.5, -1.5, np.nan, np.inf, -np.inf,
         np.float32(1 / 32767.5), np.float32(-1 / 32767.5)], np.float32)
    for scale in (1.0, 0.8 / 0.97, 0.5 / 0.03):
        w = np.concatenate([
            grid, specials,
            (rng.normal(size=4096) * 0.4).astype(np.float32)])
        w = w.astype(np.float32)
        scale = np.float32(scale)
        # numpy closed forms (the fallback path in encode_transfer)
        wn = w * scale
        idx = np.clip(np.rint(np.nan_to_num(wn) * 32767.5 + 32767.5),
                      0.0, 65535.0).astype(np.uint16)
        ref8 = lut[idx]
        ref16 = (np.clip(wn, -1.0, 1.0) * 32767.0).astype(np.int16)
        out8 = np.empty(len(w), np.int8)
        assert native.quantize_mulaw(w, float(scale), lut, out8)
        np.testing.assert_array_equal(out8, ref8)
        out16 = np.empty(len(w), np.int16)
        assert native.quantize_int16(w, float(scale), out16)
        # NaN->int16 is platform-defined in numpy too; compare finite only
        fin = np.isfinite(wn)
        np.testing.assert_array_equal(out16[fin], ref16[fin])


def test_native_mel_codes_match_numpy(rng):
    """The fused C mel encoder (mas_mel_encode: mixed-radix f64 FFT +
    complex64-rounded power + banded filterbank + quantize) must produce
    the numpy path's codes exactly — the FFT summation-order difference
    sits ~7 orders below the complex64 rounding that defines the
    contract, so any mismatch is a real bug, not numerics."""
    import os
    from multimodal_audio_search_tpu.audio import native
    from multimodal_audio_search_tpu.ops import mel as M
    if not native.available():
        pytest.skip("native toolchain unavailable")
    for cfg, seg in ((MelConfig(padded_seconds=2.0), 16000),
                     (MelConfig(), 24000)):
        w = (rng.normal(size=(2, seg)) * 0.4).astype(np.float32)
        w[0, :50] = 0.0                        # silence -> log floor
        t_seg = M.mel_seg_frames(seg, cfg)
        os.environ["MAS_NO_NATIVE_MEL"] = "1"
        try:
            ref16 = M.encode_mel16(w, cfg, t_seg)
            ref12 = M.encode_mel12(w, cfg, t_seg)
            ref8 = M.encode_mel8(w, cfg, t_seg)
        finally:
            del os.environ["MAS_NO_NATIVE_MEL"]
        nat16 = M._native_mel_codes(w, cfg, t_seg, 16)
        nat12 = M._native_mel_codes(w, cfg, t_seg, 12)
        nat8 = M._native_mel_codes(w, cfg, t_seg, 8)
        assert nat16 is not None and nat12 is not None and nat8 is not None
        np.testing.assert_array_equal(nat16, ref16)
        np.testing.assert_array_equal(nat12, ref12)
        np.testing.assert_array_equal(nat8, ref8)


def test_mel16_codes_roundtrip_accuracy(rng):
    """mel16 transfer: host HF-f64-exact log-mel quantized at step
    16/65535 — the device reconstruction must sit within half a step of
    the exact f64 mel, including the silent reconstructed tail."""
    import jax
    from multimodal_audio_search_tpu.ops import mel as M
    cfg = MelConfig(padded_seconds=2.0)
    seg = 16000
    w = (rng.normal(size=(2, seg)) * 0.3).astype(np.float32)
    codes = M.encode_mel16(w, cfg)
    assert codes.shape == (2, cfg.n_mels, M.mel_seg_frames(seg, cfg))
    rec = np.asarray(M.decode_mel16(jnp.asarray(codes), cfg))
    wp = np.pad(w, ((0, 0), (0, cfg.n_samples - seg)))
    with jax.enable_x64():
        exact = np.asarray(M.log_mel_spectrogram(
            jnp.asarray(wp, jnp.float64), cfg, dtype=jnp.float64))
    step = (M.MEL_LOG_HI - M.MEL_LOG_LO) / 65535.0
    assert np.max(np.abs(rec - exact)) <= step / 2 / 4 * 1.01 + 1e-7


def test_mel12_pack_roundtrip_and_accuracy(rng):
    """mel12: the 12-bit packing must be lossless over the 12-bit codes,
    and the reconstruction within half a RELATIVE-window step of the
    exact mel — the codes quantize clamp(log, gmax-8, gmax), the only
    range the (x+4)/4 epilogue keeps, so the effective step is
    8/4095 log units (half the absolute encoding's)."""
    import jax
    from multimodal_audio_search_tpu.ops import mel as M
    cfg = MelConfig(padded_seconds=2.0)
    seg = 16000
    w = (rng.normal(size=(2, seg)) * 0.3).astype(np.float32)
    t_seg = M.mel_seg_frames(seg, cfg)
    packed = M.encode_mel12(w, cfg, t_seg)
    assert packed.shape == (2, cfg.n_mels * t_seg * 3 // 2 + 4)
    # pack/unpack is the identity on codes (unpack in numpy, backend-
    # independently, so this holds for both the native and numpy encoders)
    u = packed[:, :-4].reshape(2, -1, 3).astype(np.int64)
    codes = np.stack([u[..., 0] | ((u[..., 1] & 0xF) << 8),
                      (u[..., 1] >> 4) | (u[..., 2] << 4)], -1) \
        .reshape(2, cfg.n_mels, t_seg)
    gmax = packed[:, -4:].copy().view("<f4")[:, 0].astype(np.float64)
    rec = np.asarray(M.decode_mel12(jnp.asarray(packed), cfg, t_seg))
    # pack/unpack identity: dequantized codes appear exactly in rec
    # (silent tail aside), so the bound below is pure quantization
    lo = gmax[:, None, None] - M.MEL_REL_RANGE
    dq = ((codes / M._MEL12_SCALE + lo) + 4.0) / 4.0
    np.testing.assert_allclose(rec[:, :, :t_seg], dq, atol=1e-6)
    # quantization bound vs the exact f64 mel (incl. its clamp epilogue)
    wp = np.pad(w, ((0, 0), (0, cfg.n_samples - seg)))
    with jax.enable_x64():
        exact = np.asarray(M.log_mel_spectrogram(
            jnp.asarray(wp, jnp.float64), cfg, dtype=jnp.float64))
    step = M.MEL_REL_RANGE / 4095.0
    assert np.max(np.abs(rec - exact)) <= step / 2 / 4 * 1.01 + 1e-6


def test_mel8_roundtrip_and_accuracy(rng):
    """mel8: 1 B/code relative-window encoding — reconstruction within
    half an 8/255 step of the exact f64 mel features."""
    import jax
    from multimodal_audio_search_tpu.ops import mel as M
    cfg = MelConfig(padded_seconds=2.0)
    seg = 16000
    w = (rng.normal(size=(2, seg)) * 0.3).astype(np.float32)
    t_seg = M.mel_seg_frames(seg, cfg)
    packed = M.encode_mel8(w, cfg, t_seg)
    assert packed.shape == (2, cfg.n_mels * t_seg + 4)
    rec = np.asarray(M.decode_mel8(jnp.asarray(packed), cfg, t_seg))
    wp = np.pad(w, ((0, 0), (0, cfg.n_samples - seg)))
    with jax.enable_x64():
        exact = np.asarray(M.log_mel_spectrogram(
            jnp.asarray(wp, jnp.float64), cfg, dtype=jnp.float64))
    step = M.MEL_REL_RANGE / 255.0
    assert np.max(np.abs(rec - exact)) <= step / 2 / 4 * 1.01 + 1e-6
    # the silent tail reconstructs at the clamp floor
    assert np.allclose(rec[:, :, t_seg:],
                       ((packed[:, -4:].copy().view("<f4")[:, 0]
                         - M.MEL_REL_RANGE)[:, None, None] + 4.0) / 4.0)


def test_auto_probe_payload_byte_capped(rng):
    """Round-5 self-review: at production seg_len (160k samples) an
    uncapped probe shipped 82 MB per probe event (32 waves x 320 KB x
    4 reps x 2 modes) — ~24% of the AUTO_REPROBE_MB cadence spent on
    measurement. The per-put sample must respect AUTO_PROBE_PUT_BYTES."""
    ing = make_ingest("auto")
    seg_len = 160_000
    waves = [np.zeros(seg_len, np.float32) for _ in range(64)]
    seen = []

    def fake_encode(sample, b, mode):
        seen.append(len(sample))
        return np.zeros((len(sample), 8), np.int16)

    ing._resolve_auto_transfer(fake_encode, waves, seg_len)
    cap = max(1, int(ing.AUTO_PROBE_PUT_BYTES // (seg_len * 2)))
    assert seen and all(n == cap for n in seen)
    assert cap * seg_len * 2 <= ing.AUTO_PROBE_PUT_BYTES
    # and at toy seg_len the old 32-wave cap still applies
    ing2 = make_ingest("auto")
    seen.clear()
    ing2._resolve_auto_transfer(fake_encode, waves, 1000)
    assert seen and all(n == 32 for n in seen)
