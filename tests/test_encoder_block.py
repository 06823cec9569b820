"""Encoder fused-block kernels (ops/encoder_block.py) vs the XLA path.

Interpret-mode parity on CPU: the kernels are behavior-neutral perf
levers (ROADMAP 17), so encode(fused_blocks=True) must match the plain
encoder to float tolerance at f32 (erf approximation |err| < 1.5e-7).
"""
import jax
import jax.numpy as jnp
import numpy as np

from multimodal_audio_search_tpu.models import layers as L
from multimodal_audio_search_tpu.models import whisper as W
from multimodal_audio_search_tpu.ops.encoder_block import (
    encoder_ln_qkv, encoder_mlp)


def test_ln_qkv_kernel_matches_xla(rng):
    d = 64
    x = jnp.asarray(rng.normal(size=(48, d)), jnp.float32)
    mha = L.init_mha(jax.random.PRNGKey(0), d, k_bias=False)
    ln = L.init_layer_norm(d)
    ln = {"scale": ln["scale"] + 0.3, "bias": ln["bias"] - 0.1}
    q, k, v = encoder_ln_qkv(
        x, ln["scale"], ln["bias"], mha["q"]["w"], mha["q"]["b"],
        mha["k"]["w"], mha["v"]["w"], mha["v"]["b"],
        eps=1e-5, interpret=True)
    h = L.layer_norm(ln, x, 1e-5)
    np.testing.assert_allclose(q, L.dense(mha["q"], h), atol=1e-5)
    np.testing.assert_allclose(k, L.dense(mha["k"], h), atol=1e-5)
    np.testing.assert_allclose(v, L.dense(mha["v"], h), atol=1e-5)


def test_encoder_mlp_kernel_matches_xla(rng):
    d, f = 64, 256
    x = jnp.asarray(rng.normal(size=(2, 24, d)), jnp.float32)
    w1 = L.init_dense(jax.random.PRNGKey(1), d, f)
    w2 = L.init_dense(jax.random.PRNGKey(2), f, d)
    ln = L.init_layer_norm(d)
    out = encoder_mlp(x, ln["scale"], ln["bias"], w1["w"], w1["b"],
                      w2["w"], w2["b"], eps=1e-5, interpret=True)
    h = L.layer_norm(ln, x, 1e-5)
    ref = x + L.dense(w2, L.gelu(L.dense(w1, h)))
    np.testing.assert_allclose(out, ref, atol=2e-6)


def test_encode_fused_blocks_matches_plain(rng, monkeypatch):
    """Full encode with fused_blocks=True == plain encode (f32, CPU via
    interpret-mode kernels)."""
    import multimodal_audio_search_tpu.ops.attention as attn_mod
    import multimodal_audio_search_tpu.ops.encoder_block as eb_mod

    # route the Pallas calls through interpret mode on CPU
    orig_attn = attn_mod.fused_encoder_attention
    monkeypatch.setattr(
        attn_mod, "fused_encoder_attention",
        lambda q, k, v, **kw: orig_attn(q, k, v, interpret=True))
    orig_qkv = eb_mod.encoder_ln_qkv
    monkeypatch.setattr(
        eb_mod, "encoder_ln_qkv",
        lambda *a, **kw: orig_qkv(*a, **{**kw, "interpret": True}))
    orig_mlp = eb_mod.encoder_mlp
    monkeypatch.setattr(
        eb_mod, "encoder_mlp",
        lambda *a, **kw: orig_mlp(*a, **{**kw, "interpret": True}))

    cfg = W.PRESETS["test"]
    params = W.init_params(jax.random.PRNGKey(0), cfg)
    mel = jnp.asarray(rng.normal(size=(2, cfg.n_mels, 64)) * 0.5,
                      jnp.float32)
    ref = W.encode(params, mel, cfg, fused_attention=False)
    out = W.encode(params, mel, cfg, fused_blocks=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5)
