"""Fused merged-head cross-attention kernel (ops/cross_attention.py).

CPU runs the kernel in Pallas interpret mode; correctness is asserted
against the einsum reference and through the full decode path (token-exact
generate with cross_attn="fused" vs "einsum").
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_audio_search_tpu.config import DecodeConfig
from multimodal_audio_search_tpu.models import whisper as W
from multimodal_audio_search_tpu.models.generate import generate
from multimodal_audio_search_tpu.ops.cross_attention import (
    fused_cross_attention, merge_heads_kv, xla_cross_attention)


@pytest.mark.parametrize("b,h,t,d", [
    (8, 8, 96, 64),     # whisper-base head shape
    (8, 6, 50, 64),     # whisper-tiny head count (HD=384)
    (12, 8, 40, 64),    # B not a multiple of the 8-row block -> pad path
    (8, 2, 33, 16),     # tiny test config shape (HD=32 lanes)
    (8, 8, 1500, 64),   # full 30 s whisper context -> kc=1 K/V streaming
])
def test_fused_matches_einsum(rng, b, h, t, d):
    q = jnp.asarray(rng.normal(size=(b, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.float32)
    ref = xla_cross_attention(q, k, v)
    k_m, v_m = merge_heads_kv(k, v)
    got = fused_cross_attention(q, k_m, v_m, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_merge_heads_layout(rng):
    b, h, t, d = 2, 3, 5, 4
    k = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.float32)
    k_m, _ = merge_heads_kv(k, k)
    assert k_m.shape == (b, t, h * d)
    # head h's slice of the merged row == original [b, h, t]
    np.testing.assert_array_equal(
        np.asarray(k_m[1, 2, d: 2 * d]), np.asarray(k[1, 1, 2]))


def tiny_cfg():
    return W.WhisperConfig(
        vocab_size=96, d_model=32, enc_layers=1, dec_layers=2, heads=2,
        ffn=64, enc_positions=40, dec_positions=24,
        bos_token_id=90, eos_token_id=91, pad_token_id=91,
        no_timestamps_id=93, transcribe_id=94, lang_en_id=95)


def test_decode_token_exact_fused_vs_einsum(rng):
    """The fused kernel must not change a single generated token."""
    cfg = tiny_cfg()
    params = W.init_params(jax.random.PRNGKey(0), cfg)
    enc_out = jnp.asarray(rng.normal(size=(4, 40, cfg.d_model)),
                          jnp.float32)
    prefix = jnp.tile(
        jnp.asarray(W.forced_prefix(cfg), jnp.int32), (4, 1))
    outs = {}
    for mode in ("einsum", "fused"):
        dec = DecodeConfig(method="greedy", max_new_tokens=10,
                           cross_attn=mode)
        outs[mode] = generate(
            params, enc_out, prefix, cfg=cfg, decode=dec,
            prefix_len=prefix.shape[1], max_new_tokens=10)
    np.testing.assert_array_equal(np.asarray(outs["einsum"].tokens),
                                  np.asarray(outs["fused"].tokens))
    np.testing.assert_array_equal(np.asarray(outs["einsum"].lengths),
                                  np.asarray(outs["fused"].lengths))


def test_auto_mode_selects_einsum_on_cpu(rng):
    """cross_attn='auto' must stay on the einsum path off-TPU (the kernel
    interpret mode is for tests; production auto-dispatch is TPU-gated)."""
    from multimodal_audio_search_tpu.ops.cross_attention import (
        use_fused_cross_attention)
    assert use_fused_cross_attention(500, 64) is False  # CPU in tests
