import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multimodal_audio_search_tpu.config import DecodeConfig
from multimodal_audio_search_tpu.models import whisper as W
from multimodal_audio_search_tpu.models.generate import generate
from multimodal_audio_search_tpu.ops.quant import (
    quant_matmul, quantize_weight, quantize_whisper_decoder)


def test_quantize_weight_roundtrip(rng):
    w = rng.normal(size=(64, 96)).astype(np.float32)
    q, s = quantize_weight(w)
    assert q.dtype == np.int8 and s.shape == (96,)
    deq = q.astype(np.float32) * s[None, :]
    # per-column max error bounded by scale/2
    assert np.all(np.abs(deq - w) <= s[None, :] * 0.5 + 1e-7)


def test_quant_matmul_matches_dequant(rng):
    x = rng.normal(size=(16, 128)).astype(np.float32)
    w = rng.normal(size=(128, 700)).astype(np.float32)  # forces padding
    q, s = quantize_weight(w)
    ref = x @ (q.astype(np.float32) * s[None, :])
    got = np.asarray(quant_matmul(
        jnp.asarray(x), jnp.asarray(q), jnp.asarray(s),
        blk_n=256, interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-4)


def test_quantized_decoder_generates_same_shape_and_close_tokens(rng):
    cfg = W.WhisperConfig(
        vocab_size=160, d_model=64, enc_layers=1, dec_layers=2, heads=4,
        ffn=128, enc_positions=40, dec_positions=24,
        bos_token_id=150, eos_token_id=151, pad_token_id=151)
    params = W.init_params(jax.random.PRNGKey(0), cfg)
    qparams = quantize_whisper_decoder(params)

    mel = (rng.normal(size=(2, 80, 80)) * 0.5).astype(np.float32)
    enc = W.encode(params, mel, cfg)
    prefix = np.full((2, 1), cfg.bos_token_id, np.int32)
    d = DecodeConfig(method="greedy")
    out_f = generate(params, enc, prefix, cfg=cfg, decode=d,
                     prefix_len=1, max_new_tokens=10)
    out_q = generate(qparams, enc, prefix, cfg=cfg, decode=d,
                     prefix_len=1, max_new_tokens=10)
    tf, tq = np.asarray(out_f.tokens), np.asarray(out_q.tokens)
    assert tq.shape == tf.shape
    # int8 decode should agree on most greedy tokens of a random model
    agree = (tf == tq).mean()
    assert agree > 0.6, f"quantized decode diverged too much: {agree}"

    # teacher-forced logits stay close in the active region
    ids = rng.integers(0, 150, size=(2, 6)).astype(np.int32)
    lf = np.asarray(W.decode_train(params, enc, ids, cfg))
    lq = np.asarray(W.decode_train(qparams, enc, ids, cfg))
    rel = np.abs(lf - lq).max() / (np.abs(lf).max() + 1e-9)
    assert rel < 0.15, rel
