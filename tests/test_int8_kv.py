import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multimodal_audio_search_tpu.config import DecodeConfig
from multimodal_audio_search_tpu.models import whisper as W
from multimodal_audio_search_tpu.models.generate import generate
from multimodal_audio_search_tpu.ops.cached_attention import (
    int8_cached_attention, quantize_kv, xla_int8_cached_attention)


def test_quantize_kv_roundtrip(rng):
    k = rng.normal(size=(2, 4, 16, 8)).astype(np.float32)
    v = rng.normal(size=(2, 4, 16, 8)).astype(np.float32)
    k8, ks, v8, vs = quantize_kv(jnp.asarray(k), jnp.asarray(v))
    deq = np.asarray(k8, np.float32) * np.asarray(ks)[..., None]
    # per-row max error bounded by scale/2
    assert np.all(np.abs(deq - k) <= np.asarray(ks)[..., None] * 0.5 + 1e-6)


def test_int8_attention_matches_f32(rng):
    b, h, t, d = 2, 4, 128, 64
    q = rng.normal(size=(b, h, d)).astype(np.float32)
    k = rng.normal(size=(b, h, t, d)).astype(np.float32)
    v = rng.normal(size=(b, h, t, d)).astype(np.float32)
    # f32 reference
    logits = np.einsum("bhd,bhtd->bht", q, k) / np.sqrt(d)
    p = np.exp(logits - logits.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    ref = np.einsum("bht,bhtd->bhd", p, v)

    k8, ks, v8, vs = quantize_kv(jnp.asarray(k), jnp.asarray(v))
    got_xla = np.asarray(xla_int8_cached_attention(
        jnp.asarray(q), k8, ks, v8, vs))
    np.testing.assert_allclose(got_xla, ref, atol=5e-2, rtol=5e-2)

    got_pl = np.asarray(int8_cached_attention(
        jnp.asarray(q), k8, ks, v8, vs, interpret=True))
    # kernel vs its own XLA twin must agree tightly (same quantized inputs)
    np.testing.assert_allclose(got_pl, got_xla, atol=2e-2, rtol=2e-2)


def test_int8_kv_guardrail_whisper_base_shapes(rng):
    """Accuracy guardrail for the opt-in int8-KV mode (VERDICT round 1):
    full greedy generate at B=32 on real whisper-base decoder shapes
    (d=512, 8 heads, 500-position cross context) must be token-exact vs
    the f32-KV path on random-init weights, and the first-step logit
    delta must stay within 5% of the logit range.

    Policy (docs/BENCHMARKS.md): int8 KV is a MEMORY mode, not a speed
    mode; it is safe when this guardrail holds for the deployed weights —
    rerun via tools/parity_eval.py when real checkpoints arrive.
    """
    cfg = W.WhisperConfig(
        vocab_size=1000, d_model=512, enc_layers=1, dec_layers=2, heads=8,
        ffn=1024, enc_positions=500, dec_positions=24,
        bos_token_id=990, eos_token_id=991, pad_token_id=991,
        no_timestamps_id=993, transcribe_id=994, lang_en_id=995)
    params = W.init_params(jax.random.PRNGKey(1), cfg)
    b, steps = 32, 8
    enc_out = jnp.asarray(rng.normal(size=(b, 500, cfg.d_model)) * 0.3,
                          jnp.float32)
    prefix = jnp.tile(jnp.asarray(W.forced_prefix(cfg), jnp.int32), (b, 1))
    outs = {}
    for mode in ("einsum", "int8"):
        dec = DecodeConfig(method="greedy", max_new_tokens=steps,
                           cross_attn=mode)
        outs[mode] = generate(
            params, enc_out, prefix, cfg=cfg, decode=dec,
            prefix_len=prefix.shape[1], max_new_tokens=steps)
    np.testing.assert_array_equal(np.asarray(outs["einsum"].tokens),
                                  np.asarray(outs["int8"].tokens))

    # bounded first-step logit delta
    ckv_f = W.cross_kv(params, enc_out, cfg)
    ckv_q = W.cross_kv_quantized(params, enc_out, cfg)
    cache = W.init_cache(cfg, b, steps + prefix.shape[1], jnp.float32)
    tok = jnp.full((b,), cfg.bos_token_id, jnp.int32)
    lf, _ = W.decode_step(params, tok, jnp.int32(0), cache, ckv_f, cfg)
    lq, _ = W.decode_step(params, tok, jnp.int32(0), cache, ckv_q, cfg)
    lf, lq = np.asarray(lf), np.asarray(lq)
    rng_span = lf.max() - lf.min() + 1e-9
    assert np.abs(lf - lq).max() / rng_span < 0.05


def test_decode_with_int8_cross_kv(rng):
    """generate() with quantized cross K/V stays close to the bf16 path."""
    cfg = W.WhisperConfig(
        vocab_size=160, d_model=64, enc_layers=1, dec_layers=2, heads=4,
        ffn=128, enc_positions=64, dec_positions=24,
        bos_token_id=150, eos_token_id=151, pad_token_id=151)
    params = W.init_params(jax.random.PRNGKey(0), cfg)
    mel = (rng.normal(size=(2, 80, 128)) * 0.5).astype(np.float32)
    enc = W.encode(params, mel, cfg)

    import multimodal_audio_search_tpu.models.generate as G

    # monkeypatch-free: drive decode_step directly with both ckv formats
    ckv_f = W.cross_kv(params, enc, cfg)
    ckv_q = W.cross_kv_quantized(params, enc, cfg)
    cache_f = W.init_cache(cfg, 2, 8, jnp.float32)
    cache_q = W.init_cache(cfg, 2, 8, jnp.float32)
    tok = jnp.full((2,), cfg.bos_token_id, jnp.int32)
    lf, _ = W.decode_step(params, tok, jnp.int32(0), cache_f, ckv_f, cfg)
    lq, _ = W.decode_step(params, tok, jnp.int32(0), cache_q, ckv_q, cfg)
    lf, lq = np.asarray(lf), np.asarray(lq)
    rel = np.abs(lf - lq).max() / (np.abs(lf).max() + 1e-9)
    assert rel < 0.05, rel
    # greedy next-token choice unchanged for this model
    np.testing.assert_array_equal(lf.argmax(-1), lq.argmax(-1))
