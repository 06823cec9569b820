"""Layer-scan decode parity (round-3 verdict item 7 / ROADMAP 18).

``DecodeConfig(scan_layers=True)`` runs the decoder layer loop as
``lax.scan`` over stacked per-layer params. The math must equal the
plain traced-loop path with the same merged-head cross-KV format
(``cross_attn="fused"``); the on-chip A/B is
tools/profile_decode_scan_ab.py (docs/ONCHIP_RUNBOOK.md).
"""
import numpy as np
import pytest

from multimodal_audio_search_tpu.config import DecodeConfig
from multimodal_audio_search_tpu.models import generate as G
from multimodal_audio_search_tpu.models import whisper as W


@pytest.fixture(scope="module")
def model():
    import jax
    cfg = W.config_for("test")
    params = W.init_params(jax.random.PRNGKey(5), cfg)
    return cfg, params


@pytest.fixture(scope="module")
def enc(model):
    cfg, params = model
    rng = np.random.default_rng(9)
    mel = (rng.normal(size=(4, cfg.n_mels, 2 * cfg.enc_positions)) * 0.5) \
        .astype(np.float32)
    return W.encode(params, mel, cfg)


def _gen(cfg, params, enc, **decode_kw):
    prefix = np.full((enc.shape[0], 1), cfg.bos_token_id, np.int32)
    return G.generate(
        params, enc, prefix, cfg=cfg,
        decode=DecodeConfig(max_new_tokens=10, **decode_kw),
        prefix_len=1, max_new_tokens=10)


def test_scan_layers_tokens_match_loop(model, enc):
    cfg, params = model
    ref = _gen(cfg, params, enc, cross_attn="fused")
    out = _gen(cfg, params, enc, scan_layers=True)
    np.testing.assert_array_equal(np.asarray(out.tokens),
                                  np.asarray(ref.tokens))
    np.testing.assert_array_equal(np.asarray(out.lengths),
                                  np.asarray(ref.lengths))


def test_scan_layers_with_processors_matches_loop(model, enc):
    cfg, params = model
    kw = dict(repetition_penalty=1.3, no_repeat_ngram_size=2)
    ref = _gen(cfg, params, enc, cross_attn="fused", **kw)
    out = _gen(cfg, params, enc, scan_layers=True, **kw)
    np.testing.assert_array_equal(np.asarray(out.tokens),
                                  np.asarray(ref.tokens))


def test_scan_layers_fused_tokens_match_fused_loop(model):
    """scan_layers + fused_layer runs the SAME Pallas sub-block kernels
    inside the scan body (weights sliced from the stacked pytree per
    step); tokens must match the fused loop. Batch 8 — both paths gate
    the fused kernels on batch % 8 == 0."""
    cfg, params = model
    rng = np.random.default_rng(11)
    mel = (rng.normal(size=(8, cfg.n_mels, 2 * cfg.enc_positions)) * 0.5) \
        .astype(np.float32)
    enc8 = W.encode(params, mel, cfg)
    ref = _gen(cfg, params, enc8, cross_attn="fused", fused_layer=True)
    out = _gen(cfg, params, enc8, scan_layers=True, fused_layer=True)
    np.testing.assert_array_equal(np.asarray(out.tokens),
                                  np.asarray(ref.tokens))
    np.testing.assert_array_equal(np.asarray(out.lengths),
                                  np.asarray(ref.lengths))


def test_decode_step_scan_logits_match_decode_step(model, enc):
    """Single-step logits parity at step 0 and a later step, exact f32."""
    import jax.numpy as jnp
    cfg, params = model
    b = enc.shape[0]
    total = 8
    ckv_list = W.cross_kv_merged(params, enc, cfg)
    ckv_st = W.cross_kv_merged_stacked(params, enc, cfg)
    cache = W.init_cache(cfg, b, total, enc.dtype)
    cache_st = W.init_cache_stacked(cfg, b, total, enc.dtype)
    tok = jnp.full((b,), cfg.bos_token_id, jnp.int32)
    for step in range(3):
        pos = jnp.int32(step)
        ref, cache = W.decode_step(params, tok, pos, cache, ckv_list, cfg)
        got, cache_st = W.decode_step_scan(
            params, tok, pos, cache_st, ckv_st, cfg)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)
        # stacked cache rows equal the per-layer dict cache
        for li in range(cfg.dec_layers):
            np.testing.assert_allclose(
                np.asarray(cache_st["k"][li]), np.asarray(cache[li]["k"]),
                atol=1e-6)
        tok = jnp.argmax(ref, axis=-1).astype(jnp.int32)
