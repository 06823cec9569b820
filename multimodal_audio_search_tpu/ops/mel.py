"""Whisper log-mel frontend as a batched XLA program.

The reference computes this per segment on CPU inside the HF processor
(audio_search.py:358-362). Here the whole batch is one jitted program shaped
for the MXU: framing is a strided-view chunk reshape (stft_frames), the
windowed real-DFT is ONE [*, 400] x [400, 402] matmul, the mel projection is
another matmul, and the log/clamp/scale epilogue fuses in.

Numerical contract (parity-tested against transformers'
WhisperFeatureExtractor):
  * n_fft 400, hop 160, periodic Hann, reflect center-padding of n_fft//2
  * power spectrum, last STFT frame dropped -> 3000 frames for 30 s audio
  * slaney-scale, slaney-normalized 80-bin mel filterbank, fmax 8 kHz
  * log10(max(., 1e-10)); per-sample clamp at global max - 8; (x + 4) / 4
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..config import MelConfig


def hann_window(n_fft: int) -> np.ndarray:
    """Periodic Hann window (matches torch.hann_window / HF)."""
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n_fft) / n_fft))) \
        .astype(np.float64)


def _hz_to_mel_slaney(f: np.ndarray) -> np.ndarray:
    """Slaney mel scale: linear below 1 kHz, log above."""
    f = np.asarray(f, np.float64)
    min_log_hz = 1000.0
    min_log_mel = min_log_hz * 3.0 / 200.0
    logstep = np.log(6.4) / 27.0
    return np.where(
        f >= min_log_hz,
        min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep,
        f * 3.0 / 200.0)


def _mel_to_hz_slaney(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, np.float64)
    min_log_mel = 15.0
    logstep = np.log(6.4) / 27.0
    return np.where(
        m >= min_log_mel,
        1000.0 * np.exp(logstep * (m - min_log_mel)),
        m * 200.0 / 3.0)


def _hz_to_mel_htk(f: np.ndarray) -> np.ndarray:
    return 2595.0 * np.log10(1.0 + np.asarray(f, np.float64) / 700.0)


def _mel_to_hz_htk(m: np.ndarray) -> np.ndarray:
    return 700.0 * (10.0 ** (np.asarray(m, np.float64) / 2595.0) - 1.0)


def mel_filterbank(
    n_mels: int = 80, n_fft: int = 400, sample_rate: int = 16_000,
    fmin: float = 0.0, fmax: float | None = None,
    mel_scale: str = "slaney", norm: str | None = "slaney",
) -> np.ndarray:
    """[n_mels, n_fft//2+1] triangular filterbank.

    Defaults match Whisper's (slaney scale, slaney 2/bandwidth norm);
    ``mel_scale="htk", norm=None`` matches ClapFeatureExtractor's fusion
    filterbank (one triangle construction serves both)."""
    fmax = fmax if fmax is not None else sample_rate / 2.0
    n_freqs = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sample_rate / 2.0, n_freqs)
    to_mel, to_hz = {
        "slaney": (_hz_to_mel_slaney, _mel_to_hz_slaney),
        "htk": (_hz_to_mel_htk, _mel_to_hz_htk),
    }[mel_scale]
    mel_pts = np.linspace(
        to_mel(np.float64(fmin)), to_mel(np.float64(fmax)), n_mels + 2)
    hz_pts = to_hz(mel_pts)
    # triangular filters between consecutive center frequencies
    fdiff = np.diff(hz_pts)
    slopes = hz_pts[None, :] - fft_freqs[:, None]         # [F, n_mels+2]
    down = -slopes[:, :-2] / fdiff[None, :-1]
    up = slopes[:, 2:] / fdiff[None, 1:]
    fb = np.maximum(0.0, np.minimum(down, up)).T          # [n_mels, F]
    if norm == "slaney":
        # slaney normalization: 2 / bandwidth
        enorm = 2.0 / (hz_pts[2:] - hz_pts[:-2])
        fb = fb * enorm[:, None]
    return fb.astype(np.float64)


@functools.lru_cache(maxsize=8)
def _dft_mel_weights(cfg: MelConfig) -> tuple[np.ndarray, np.ndarray]:
    """(stft_filters [n_fft, 2*n_freqs], mel [n_freqs, n_mels]) in float32.

    The STFT filters bake the Hann window into the real-DFT basis so framing
    + windowing + DFT is a single strided conv / matmul.
    """
    n_fft = cfg.n_fft
    n_freqs = n_fft // 2 + 1
    win = hann_window(n_fft)
    t = np.arange(n_fft)[:, None]                 # [n_fft, 1]
    k = np.arange(n_freqs)[None, :]               # [1, n_freqs]
    ang = -2.0 * np.pi * t * k / n_fft
    basis = np.concatenate([np.cos(ang), np.sin(ang)], axis=1)  # [n_fft, 2F]
    filt = win[:, None] * basis                       # float64
    mel = mel_filterbank(cfg.n_mels, n_fft, cfg.sample_rate).T
    return filt, mel


def stft_frames(x: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """[B, L] (already center-padded) -> [B, n_frames, n_fft] frame
    tensor built from hop-sized chunk reshapes + shifted-chunk concats
    (pure strided views, no gather) so a downstream DFT matmul feeds the
    MXU directly — lax.conv at C_in=1 lowers to ~MFU 0.03 on TPU (same
    disease as the encoder stem, models/whisper.py::_conv1d)."""
    bsz = x.shape[0]
    c = -(-n_fft // hop)                          # chunks per frame
    n_frames = (x.shape[1] - n_fft) // hop + 1
    n_chunks = n_frames - 1 + c
    lp = n_chunks * hop
    # pad-or-truncate to a whole number of chunks: every kept frame ends
    # at (t*hop + n_fft) <= n_chunks*hop, so truncation never drops
    # needed samples and padding only feeds the final (dropped) frame
    x2 = jnp.pad(x, ((0, 0), (0, lp - x.shape[1]))) \
        if lp >= x.shape[1] else x[:, :lp]
    ch = x2.reshape(bsz, n_chunks, hop)
    return jnp.concatenate(
        [ch[:, i: i + n_frames] for i in range(c)],
        axis=-1)[..., :n_fft]                     # [B, n_frames, n_fft]


def log_mel_spectrogram(
    wave: jnp.ndarray, cfg: MelConfig = MelConfig(), dtype=jnp.float32
) -> jnp.ndarray:
    """[B, n_samples] float32 -> [B, n_mels, n_frames] Whisper features.

    ``wave`` must already be padded/truncated to ``cfg.n_samples``
    (Whisper's fixed 30 s context). Jit-friendly: all shapes static.

    Precision: HF computes this in numpy float64; in float32 the STFT's
    400-tap cancellation leaves ~1e-4 mean / ~3e-2 worst-case deviation in
    near-silent bins after the log (parity-bounded in tests; exact parity is
    verified under x64). The encoder consumes bf16 downstream, so f32 is the
    production dtype.
    """
    filt_np, mel_np = _dft_mel_weights(cfg)
    filt = jnp.asarray(filt_np, dtype)            # [n_fft, 2F]
    mel = jnp.asarray(mel_np, dtype)              # [F, n_mels]
    n_fft, hop = cfg.n_fft, cfg.hop_length
    half = n_fft // 2
    n_freqs = n_fft // 2 + 1

    x = wave.astype(dtype)
    x = jnp.pad(x, ((0, 0), (half, half)), mode="reflect")
    if dtype == jnp.float64:
        # exactness path (CPU/x64 only): explicit frame gather + matmul —
        # the f64 strided conv takes minutes to compile on CPU
        n_frames = (x.shape[1] - n_fft) // hop + 1
        idx = (jnp.arange(n_frames)[:, None] * hop
               + jnp.arange(n_fft)[None, :])
        frames = x[:, idx]                        # [B, T+1, n_fft]
        spec = jnp.einsum("btf,fk->bkt", frames, filt,
                          precision=jax.lax.Precision.HIGHEST)
        spec = spec[:, :, :-1]
        # HF's numpy path stores the FFT result as complex64 before the
        # float64 power/mel/log steps; reproduce that rounding for exactness
        spec = spec.astype(jnp.float32).astype(jnp.float64)
    else:
        # production path: framing via stft_frames (strided-view chunk
        # concat), then ONE MXU matmul against the window-scaled DFT
        # basis
        frames = stft_frames(x, n_fft, hop)       # [B, n_frames, n_fft]
        spec = jnp.einsum(
            "btf,fk->bkt", frames, filt,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=dtype)         # [B, 2F, n_frames]
        spec = spec[:, :, :-1]                    # HF drops the last frame
    re, im = spec[:, :n_freqs], spec[:, n_freqs:]
    power = re * re + im * im                     # [B, F, T]
    melspec = jnp.einsum(
        "fm,bft->bmt", mel, power,
        precision=jax.lax.Precision.HIGHEST, preferred_element_type=dtype)
    log_spec = jnp.log10(jnp.maximum(melspec, 1e-10))
    gmax = jnp.max(log_spec, axis=(1, 2), keepdims=True)
    log_spec = jnp.maximum(log_spec, gmax - 8.0)
    return ((log_spec + 4.0) / 4.0).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("cfg",))
def log_mel_batch(wave: jnp.ndarray, cfg: MelConfig = MelConfig()):
    return log_mel_spectrogram(wave, cfg)


# ---------------------------------------------------------- host transfer
# "mel16" host->device transfer mode: on tunnel-attached hosts the link
# (~18 MB/s) is the ingest bottleneck, and the log-mel is a 2x smaller
# representation of a 10 s segment than even the packed int12 waveform
# (80 mels x ~1002 frames x 2 B = 160 KB vs 240 KB) — AND shipping it
# removes the device-side STFT+mel matmuls entirely. The host computes
# the HF-exact float64 mel (numpy rfft, complex64 spectrum rounding —
# the same recipe the f64 exactness path above reproduces) and ships
# uint16 codes over the absolute log10 range [-10, 6] (step 2.4e-4,
# an order below the device's own f32-vs-f64 deviation). Frames beyond
# the segment are exact silence (log10(1e-10) = -10), so only the
# segment-covering frames travel; the device reconstructs the rest and
# runs the clamp/normalize epilogue (pipelines/ingest.py::_mel16).

MEL_LOG_LO, MEL_LOG_HI = -10.0, 6.0
_MEL_CODE_SCALE = 65535.0 / (MEL_LOG_HI - MEL_LOG_LO)


def mel_seg_frames(seg_len: int, cfg: MelConfig) -> int:
    """Number of STFT frames that see any of the first ``seg_len``
    samples (center padding n_fft//2): frames t with t*hop - n_fft//2 <
    seg_len; every later frame of the padded context is exact silence."""
    half = cfg.n_fft // 2
    return min(cfg.n_frames,
               (seg_len + half + cfg.hop_length - 1) // cfg.hop_length)


@functools.lru_cache(maxsize=8)
def _host_mel_fb(cfg: MelConfig) -> tuple[np.ndarray, np.ndarray]:
    return (hann_window(cfg.n_fft),
            mel_filterbank(cfg.n_mels, cfg.n_fft, cfg.sample_rate).T)


def _host_mel_padded(wave: np.ndarray, cfg: MelConfig,
                     n_frames: int) -> np.ndarray:
    """The framing input both host mel paths share: [B, L] -> [B, need]
    float64, reflect-padded half a window on the left and zero-extended/
    reflect-closed on the right exactly as the full-context transform
    frames it (need = (n_frames-1)*hop + n_fft)."""
    n_fft, hop = cfg.n_fft, cfg.hop_length
    half = n_fft // 2
    b, m = wave.shape
    # zero-extend to every original sample the requested frames touch
    # BEFORE the reflect pad: in the real padded context the samples
    # after the segment are zeros, not a reflection of its tail (the
    # right reflect pad only ever applies at the full-context edge,
    # where it reflects zeros)
    ext = max(m, min(cfg.n_samples, (n_frames - 1) * hop + n_fft - half))
    x = np.asarray(wave, np.float64)
    if ext > m:
        x = np.pad(x, ((0, 0), (0, ext - m)))
    x = np.pad(x, ((0, 0), (half, half)), mode="reflect")
    need = (n_frames - 1) * hop + n_fft
    if x.shape[1] < need:
        x = np.pad(x, ((0, 0), (0, need - x.shape[1])))
    return x


def host_log_mel(wave: np.ndarray, cfg: MelConfig,
                 n_frames: int | None = None) -> np.ndarray:
    """[B, L<=n_samples] float -> [B, n_mels, n_frames] UNNORMALIZED
    log10 mel (before the global-max clamp and (x+4)/4 epilogue), in
    HF float64 numerics: rfft spectrum rounded through complex64, then
    float64 power/mel/log10 — the same rounding the f64 exactness path
    of ``log_mel_spectrogram`` reproduces (parity-tested)."""
    win, mel = _host_mel_fb(cfg)
    n_fft, hop = cfg.n_fft, cfg.hop_length
    b, m = wave.shape
    if n_frames is None:
        n_frames = mel_seg_frames(m, cfg)
    x = _host_mel_padded(wave, cfg, n_frames)
    frames = np.lib.stride_tricks.as_strided(
        x, shape=(b, n_frames, n_fft),
        strides=(x.strides[0], hop * x.itemsize, x.itemsize))
    spec = np.fft.rfft(frames * win, axis=-1)
    # complex64 rounding of the HF recipe without materializing the
    # complex128 roundtrip (real/imag round independently)
    sr = spec.real.astype(np.float32).astype(np.float64)
    si = spec.imag.astype(np.float32).astype(np.float64)
    power = sr * sr + si * si                        # [B, T, F]
    melspec = power @ mel                            # [B, T, n_mels]
    return np.log10(np.maximum(melspec, 1e-10)) \
        .transpose(0, 2, 1)                          # [B, n_mels, T]


def _native_mel_codes(wave: np.ndarray, cfg: MelConfig, n_frames: int,
                      bits: int) -> np.ndarray | None:
    """Single-pass C encode of the mel16/mel12 transfer codes
    (native/audio_kernels.cc::mas_mel_encode); None -> numpy fallback.
    Codes match the numpy path to <=1 (FFT summation-order differences
    sit ~7 orders below the code step; parity-tested)."""
    if os.environ.get("MAS_NO_NATIVE_MEL"):
        return None
    from ..audio import native
    win, mel = _host_mel_fb(cfg)
    x = _host_mel_padded(wave, cfg, n_frames)
    scale = {16: _MEL_CODE_SCALE, 12: _MEL12_SCALE,
             8: _MEL8_SCALE}[bits]
    # bits==16 encodes the absolute [MEL_LOG_LO, MEL_LOG_HI] range;
    # 12/8 encode relative to the row's gmax (4-byte f32 tail)
    return native.mel_encode(x, win, mel, cfg.n_fft, cfg.hop_length,
                             n_frames, bits, MEL_LOG_LO, scale,
                             relative=bits != 16)


def encode_mel16(wave: np.ndarray, cfg: MelConfig,
                 n_frames: int | None = None) -> np.ndarray:
    """[B, L] float waveform -> [B, n_mels, n_frames] uint16 transfer
    codes over the absolute log range [MEL_LOG_LO, MEL_LOG_HI]."""
    if n_frames is None:
        n_frames = mel_seg_frames(wave.shape[1], cfg)
    nat = _native_mel_codes(wave, cfg, n_frames, 16)
    if nat is not None:
        return nat
    log = host_log_mel(wave, cfg, n_frames)
    return np.clip(np.round((log - MEL_LOG_LO) * _MEL_CODE_SCALE),
                   0.0, 65535.0).astype(np.uint16)


# mel12/mel8: RELATIVE-range codes. The normalization epilogue keeps
# only [gmax - 8, gmax] of the log-mel (everything below the global-max
# clamp is flattened to gmax-8), so absolute-range codes waste most of
# their code space on values the model never sees. These modes quantize
# the post-clamp representation directly — clamp(log, gmax-8, gmax) —
# over the 8-log-unit window and ship the per-row float32 gmax as a
# 4-byte tail, halving mel12's effective step vs an absolute encoding
# and making a 1 B/code mel8 viable (half of mulaw8's bytes, with the
# loss in feature space instead of waveform companding).
MEL_REL_RANGE = 8.0
_MEL12_SCALE = 4095.0 / MEL_REL_RANGE
_MEL8_SCALE = 255.0 / MEL_REL_RANGE


def _relative_codes(wave: np.ndarray, cfg: MelConfig, n_frames: int,
                    bits: int) -> tuple[np.ndarray, np.ndarray]:
    """Host path shared by mel12/mel8: ([B, n_mels*T] uint16 codes over
    [gmax-8, gmax], [B] float32 gmax)."""
    log = host_log_mel(wave, cfg, n_frames)        # [B, n_mels, T]
    b = log.shape[0]
    gmax = log.max(axis=(1, 2))
    scale = _MEL12_SCALE if bits == 12 else _MEL8_SCALE
    cmax = 4095.0 if bits == 12 else 255.0
    rel = (log - (gmax[:, None, None] - MEL_REL_RANGE)) * scale
    codes = np.clip(np.round(rel), 0.0, cmax).astype(np.uint16)
    return codes.reshape(b, -1), gmax.astype("<f4")


def encode_mel12(wave: np.ndarray, cfg: MelConfig,
                 n_frames: int | None = None) -> np.ndarray:
    """mel12: relative log-mel codes packed to 12 bits (1.5 B per 2
    codes — 2x fewer tunnel bytes than the int12 waveform for 10 s
    segments). [B, L] float -> [B, n_mels * n_frames * 3 // 2 + 4]
    uint8; the last 4 bytes are the row's float32 gmax (LE). Code count
    (n_mels * n_frames) must be even. Layout per 2 codes (a, b): byte0 =
    a&0xFF, byte1 = (a>>8) | ((b&0xF)<<4), byte2 = b>>4 (the unsigned
    cousin of _pack_int12's layout)."""
    if n_frames is None:
        n_frames = mel_seg_frames(wave.shape[1], cfg)
    nat = _native_mel_codes(wave, cfg, n_frames, 12)
    if nat is not None:
        return nat
    codes, gmax = _relative_codes(wave, cfg, n_frames, 12)
    b = codes.shape[0]
    assert codes.shape[1] % 2 == 0, codes.shape
    pair = codes.reshape(b, -1, 2).astype(np.uint32)
    a, c = pair[..., 0], pair[..., 1]
    out = np.empty((b, pair.shape[1], 3), np.uint8)
    out[..., 0] = a & 0xFF
    out[..., 1] = (a >> 8) | ((c & 0xF) << 4)
    out[..., 2] = c >> 4
    return np.concatenate(
        [out.reshape(b, -1), gmax.view(np.uint8).reshape(b, 4)], axis=1)


def encode_mel8(wave: np.ndarray, cfg: MelConfig,
                n_frames: int | None = None) -> np.ndarray:
    """mel8: relative log-mel codes at 1 B each — half of mulaw8's
    tunnel bytes for 10 s segments, with the quantization applied to the
    post-clamp feature window instead of companding the waveform.
    [B, L] float -> [B, n_mels * n_frames + 4] uint8 (float32 gmax
    tail)."""
    if n_frames is None:
        n_frames = mel_seg_frames(wave.shape[1], cfg)
    nat = _native_mel_codes(wave, cfg, n_frames, 8)
    if nat is not None:
        return nat
    codes, gmax = _relative_codes(wave, cfg, n_frames, 8)
    return np.concatenate(
        [codes.astype(np.uint8), gmax.view(np.uint8).reshape(-1, 4)],
        axis=1)


def _finish_relative(codes: jnp.ndarray, gmax: jnp.ndarray, scale: float,
                     cfg: MelConfig, t_seg: int) -> jnp.ndarray:
    """[B, n_mels, t_seg] int codes + [B] gmax -> [B, n_mels, n_frames]
    normalized features. Codes already encode the clamped window, so no
    further max/clamp is needed; tail frames sit at the clamp floor
    (exactly where the full transform's epilogue puts silence)."""
    b = codes.shape[0]
    lo = (gmax - MEL_REL_RANGE)[:, None, None]
    log = codes.astype(jnp.float32) / scale + lo
    if t_seg < cfg.n_frames:
        log = jnp.concatenate(
            [log, jnp.broadcast_to(
                lo, (b, cfg.n_mels, cfg.n_frames - t_seg))], axis=2)
    return (log + 4.0) / 4.0


def decode_mel12(packed: jnp.ndarray, cfg: MelConfig,
                 t_seg: int) -> jnp.ndarray:
    """Device side: [B, n_mels * t_seg * 3 // 2 + 4] uint8 -> [B,
    n_mels, n_frames] normalized features (unpack + scale epilogue)."""
    b = packed.shape[0]
    gmax = jax.lax.bitcast_convert_type(packed[:, -4:], jnp.float32)
    u = packed[:, :-4].astype(jnp.int32).reshape(b, -1, 3)
    a = u[..., 0] | ((u[..., 1] & 0xF) << 8)
    c = (u[..., 1] >> 4) | (u[..., 2] << 4)
    codes = jnp.stack([a, c], -1).reshape(b, cfg.n_mels, t_seg)
    return _finish_relative(codes, gmax, _MEL12_SCALE, cfg, t_seg)


def decode_mel8(packed: jnp.ndarray, cfg: MelConfig,
                t_seg: int) -> jnp.ndarray:
    """Device side: [B, n_mels * t_seg + 4] uint8 -> [B, n_mels,
    n_frames] normalized features."""
    b = packed.shape[0]
    gmax = jax.lax.bitcast_convert_type(packed[:, -4:], jnp.float32)
    codes = packed[:, :-4].astype(jnp.int32).reshape(b, cfg.n_mels, t_seg)
    return _finish_relative(codes, gmax, _MEL8_SCALE, cfg, t_seg)


def decode_mel16(codes: jnp.ndarray, cfg: MelConfig) -> jnp.ndarray:
    """Device side: [B, n_mels, T_seg] uint16 -> [B, n_mels, n_frames]
    normalized features (the clamp/scale epilogue of
    ``log_mel_spectrogram``; silent tail frames reconstructed at -10)."""
    log = codes.astype(jnp.float32) / _MEL_CODE_SCALE + MEL_LOG_LO
    b, n_mels, t_seg = codes.shape
    if t_seg < cfg.n_frames:
        log = jnp.concatenate(
            [log, jnp.full((b, n_mels, cfg.n_frames - t_seg),
                           MEL_LOG_LO, jnp.float32)], axis=2)
    gmax = jnp.max(log, axis=(1, 2), keepdims=True)
    log = jnp.maximum(log, gmax - 8.0)
    return (log + 4.0) / 4.0
