"""Pallas fused attention kernel vs the einsum reference (interpret mode)."""
import numpy as np
import pytest

import jax.numpy as jnp

from multimodal_audio_search_tpu.models import layers as L
from multimodal_audio_search_tpu.ops.attention import (
    fused_encoder_attention)


@pytest.mark.parametrize("t", [256, 300, 750])   # 300/750: padding+mask path
def test_fused_attention_matches_einsum(rng, t):
    b, h, d = 2, 4, 64
    q = rng.normal(size=(b, h, t, d)).astype(np.float32)
    k = rng.normal(size=(b, h, t, d)).astype(np.float32)
    v = rng.normal(size=(b, h, t, d)).astype(np.float32)
    ref = np.asarray(L.attention_scores(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    got = np.asarray(fused_encoder_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        blk_q=256, interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_fused_attention_bf16(rng):
    b, h, t, d = 1, 2, 256, 64
    q = (rng.normal(size=(b, h, t, d)) * 0.5).astype(jnp.bfloat16)
    k = (rng.normal(size=(b, h, t, d)) * 0.5).astype(jnp.bfloat16)
    v = (rng.normal(size=(b, h, t, d)) * 0.5).astype(jnp.bfloat16)
    ref = np.asarray(L.attention_scores(q, k, v)).astype(np.float32)
    got = np.asarray(fused_encoder_attention(
        q, k, v, blk_q=128, interpret=True)).astype(np.float32)
    np.testing.assert_allclose(got, ref, atol=3e-2, rtol=3e-2)


def test_whisper_encode_fused_flag_consistency(rng):
    """encode(..., fused_attention=True) == einsum path (interpret)."""
    import jax
    from unittest import mock
    from multimodal_audio_search_tpu.models import whisper as W
    cfg = W.WhisperConfig(
        vocab_size=64, d_model=64, enc_layers=2, dec_layers=1, heads=2,
        ffn=128, enc_positions=128, dec_positions=8)
    params = W.init_params(jax.random.PRNGKey(0), cfg)
    mel = rng.normal(size=(1, 80, 256)).astype(np.float32)
    ref = np.asarray(W.encode(params, mel, cfg, fused_attention=False))
    import functools
    import multimodal_audio_search_tpu.ops.attention as A
    orig = A.fused_encoder_attention
    with mock.patch.object(
            A, "fused_encoder_attention",
            functools.partial(orig, blk_q=128, interpret=True)):
        got = np.asarray(W.encode(params, mel, cfg, fused_attention=True))
    np.testing.assert_allclose(got, ref, atol=5e-5, rtol=1e-4)
