"""Classic DSP features for the lightweight bridge path, in JAX.

The historical "lightweight" variant embeds audio without any neural audio
model: 13 MFCCs + spectral centroid/bandwidth/rolloff + zero-crossing rate,
mean-pooled over frames and zero-padded to 128D
(previous_iterations/lightweight_audio_search.py:84-114). The reference used
librosa on CPU; here the whole feature stack is one jitted XLA program
reusing the mel frontend's DFT machinery (ops/mel.py), so bridge features
batch on-device like everything else.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import MelConfig
from .mel import _dft_mel_weights, mel_filterbank

FEATURE_DIM = 128  # zero-padded (lightweight_audio_search.py:108-114)


def _dct_ortho(n_out: int, n_in: int) -> np.ndarray:
    """DCT-II with ortho norm (librosa/scipy convention) as a matrix."""
    k = np.arange(n_out)[:, None]
    n = np.arange(n_in)[None, :]
    m = np.cos(np.pi * k * (2 * n + 1) / (2 * n_in))
    m *= np.sqrt(2.0 / n_in)
    m[0] *= 1.0 / np.sqrt(2.0)
    return m.astype(np.float32)


@functools.partial(jax.jit, static_argnames=("cfg", "n_mfcc"))
def audio_feature_vector(
    wave: jnp.ndarray,                      # [B, n_samples] float32
    cfg: MelConfig = MelConfig(),
    n_mfcc: int = 13,
) -> jnp.ndarray:
    """[B, 128]: mean-pooled MFCC + centroid + bandwidth + rolloff + ZCR."""
    filt_np, _ = _dft_mel_weights(cfg)
    filt = jnp.asarray(filt_np, jnp.float32)
    n_fft, hop = cfg.n_fft, cfg.hop_length
    n_freqs = n_fft // 2 + 1
    x = wave.astype(jnp.float32)
    x = jnp.pad(x, ((0, 0), (n_fft // 2, n_fft // 2)), mode="reflect")
    from .mel import stft_frames
    spec = jnp.einsum(
        "btf,fk->bkt", stft_frames(x, n_fft, hop), filt,
        preferred_element_type=jnp.float32)
    re, im = spec[:, :n_freqs], spec[:, n_freqs:]
    power = re * re + im * im                           # [B, F, T]
    mag = jnp.sqrt(jnp.maximum(power, 1e-20))

    # MFCC: mel power -> dB -> DCT-II(ortho) -> first n_mfcc
    mel = jnp.asarray(
        mel_filterbank(128, n_fft, cfg.sample_rate), jnp.float32)
    melspec = jnp.einsum("mf,bft->bmt", mel, power)
    db = 10.0 * jnp.log10(jnp.maximum(melspec, 1e-10))
    db = jnp.maximum(db, jnp.max(db, axis=(1, 2), keepdims=True) - 80.0)
    dct = jnp.asarray(_dct_ortho(n_mfcc, 128))
    mfcc = jnp.einsum("km,bmt->bkt", dct, db)           # [B, 13, T]

    freqs = jnp.linspace(0.0, cfg.sample_rate / 2.0, n_freqs)[None, :, None]
    norm = jnp.maximum(jnp.sum(mag, axis=1, keepdims=True), 1e-10)
    centroid = jnp.sum(freqs * mag, axis=1, keepdims=True) / norm  # [B,1,T]
    bandwidth = jnp.sqrt(
        jnp.sum(mag * (freqs - centroid) ** 2, axis=1, keepdims=True)
        / norm)
    # rolloff: lowest freq bin holding >= 85% cumulative energy
    cum = jnp.cumsum(mag, axis=1)
    thresh = 0.85 * cum[:, -1:, :]
    roll_idx = jnp.argmax(cum >= thresh, axis=1)        # [B, T]
    rolloff = roll_idx.astype(jnp.float32) \
        * (cfg.sample_rate / 2.0) / (n_freqs - 1)

    # zero-crossing rate per frame on the unpadded signal
    w = wave.astype(jnp.float32)
    sign = jnp.sign(w)
    flips = jnp.abs(jnp.diff(sign, axis=1)) > 0
    t_frames = mfcc.shape[-1]
    # frame-mean via reshape over hop-aligned chunks (approximation of
    # librosa's frame view, adequate for a mean-pooled feature)
    usable = (w.shape[1] - 1) // hop * hop
    fl = flips[:, :usable].reshape(w.shape[0], -1, hop)
    zcr_frames = jnp.mean(fl.astype(jnp.float32), axis=2)

    feats = jnp.concatenate([
        jnp.mean(mfcc, axis=2),                         # [B, 13]
        jnp.mean(centroid[:, 0, :], axis=1, keepdims=True),
        jnp.mean(bandwidth[:, 0, :], axis=1, keepdims=True),
        jnp.mean(rolloff, axis=1, keepdims=True),
        jnp.mean(zcr_frames, axis=1, keepdims=True),
    ], axis=1)                                          # [B, 17]
    pad = FEATURE_DIM - feats.shape[1]
    return jnp.pad(feats, ((0, 0), (0, pad)))
