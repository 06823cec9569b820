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


def test_int8_fused_matches_dequant_reference(rng):
    """int8 kernel (interpret) vs its dequantizing einsum twin: identical
    quantized inputs -> near-identical outputs (pw re-quantization is the
    only extra error source)."""
    from multimodal_audio_search_tpu.ops.cross_attention import (
        fused_single_query_attention_int8, quantize_kv_merged,
        xla_single_query_attention, xla_single_query_attention_int8)
    b, h, t, d = 8, 4, 40, 16
    q = jnp.asarray(rng.normal(size=(b, h * d)), jnp.float32)
    k_m = jnp.asarray(rng.normal(size=(b, t, h * d)), jnp.float32)
    v_m = jnp.asarray(rng.normal(size=(b, t, h * d)), jnp.float32)
    k8, ks, v8, vs = quantize_kv_merged(k_m, v_m, h)
    ref = xla_single_query_attention_int8(q, k8, ks, v8, vs, heads=h)
    got = fused_single_query_attention_int8(q, k8, ks, v8, vs, heads=h,
                                            interpret=True)
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert rel < 0.03, rel
    # and both against the unquantized f32 attention
    exact = xla_single_query_attention(q, k_m, v_m, heads=h)
    rel = float(jnp.linalg.norm(got - exact) / jnp.linalg.norm(exact))
    assert rel < 0.05, rel


def test_int8_fused_guardrail_whisper_base_shapes(rng):
    """Accuracy policy for the opt-in int8_fused mode at whisper-base
    decode shapes, B=32: bounded first-step logit delta (<5% of the
    logit range) and high greedy argmax agreement vs the exact path.
    Unlike the old int8 GRP mode this one is NOT token-exact — the bound
    is the contract (docs/BENCHMARKS.md)."""
    from multimodal_audio_search_tpu.config import DecodeConfig
    from multimodal_audio_search_tpu.models import whisper as WW
    from multimodal_audio_search_tpu.models.generate import generate
    cfg = WW.WhisperConfig(
        vocab_size=1000, d_model=512, enc_layers=1, dec_layers=2, heads=8,
        ffn=1024, enc_positions=500, dec_positions=24,
        bos_token_id=990, eos_token_id=991, pad_token_id=991,
        no_timestamps_id=993, transcribe_id=994, lang_en_id=995)
    params = WW.init_params(jax.random.PRNGKey(1), cfg)
    b = 32
    enc_out = jnp.asarray(rng.normal(size=(b, 500, cfg.d_model)) * 0.3,
                          jnp.float32)
    prefix = jnp.tile(jnp.asarray(WW.forced_prefix(cfg), jnp.int32),
                      (b, 1))
    ckv_f = WW.cross_kv(params, enc_out, cfg)
    ckv_q = WW.cross_kv_merged_int8(params, enc_out, cfg)
    cache = WW.init_cache(cfg, b, 12, jnp.float32)
    tok = jnp.full((b,), cfg.bos_token_id, jnp.int32)
    lf, _ = WW.decode_step(params, tok, jnp.int32(0), cache, ckv_f, cfg)
    lq, _ = WW.decode_step(params, tok, jnp.int32(0), cache, ckv_q, cfg)
    lf, lq = np.asarray(lf), np.asarray(lq)
    span = lf.max() - lf.min() + 1e-9
    assert np.abs(lf - lq).max() / span < 0.05
    agree = (lf.argmax(-1) == lq.argmax(-1)).mean()
    assert agree >= 0.9, agree


def test_fused_layer_token_exact(rng):
    """The fused self sub-block kernel (ops/decoder_block.py) must not
    change a single generated token vs the unfused path (f32, interpret;
    includes the closed-form fresh-row attention term)."""
    from multimodal_audio_search_tpu.ops.decoder_block import (
        fused_self_block)
    cfg = tiny_cfg()
    params = W.init_params(jax.random.PRNGKey(0), cfg)
    enc_out = jnp.asarray(rng.normal(size=(8, 40, cfg.d_model)),
                          jnp.float32)
    prefix = jnp.tile(jnp.asarray(W.forced_prefix(cfg), jnp.int32),
                      (8, 1))
    outs = {}
    for fl in (False, True):
        dec = DecodeConfig(method="greedy", max_new_tokens=10,
                           cross_attn="einsum", fused_layer=fl)
        outs[fl] = generate(params, enc_out, prefix, cfg=cfg, decode=dec,
                            prefix_len=prefix.shape[1], max_new_tokens=10)
    np.testing.assert_array_equal(np.asarray(outs[False].tokens),
                                  np.asarray(outs[True].tokens))

    # direct kernel-vs-reference check at a mid-sequence position
    b, hd, l, heads = 8, cfg.d_model, 12, cfg.heads
    blk = params["decoder"]["blocks"][0]
    a = blk["self_attn"]
    x = jnp.asarray(rng.normal(size=(b, hd)), jnp.float32)
    kc = jnp.asarray(rng.normal(size=(b, l, hd)), jnp.float32)
    vc = jnp.asarray(rng.normal(size=(b, l, hd)), jnp.float32)
    pos = jnp.int32(5)
    x1, k1, v1 = fused_self_block(
        x, blk["self_ln"]["scale"], blk["self_ln"]["bias"],
        a["q"]["w"], a["q"]["b"], a["k"]["w"], a["v"]["w"], a["v"]["b"],
        a["o"]["w"], a["o"]["b"], kc, vc, pos,
        heads=heads, eps=cfg.ln_eps, interpret=True)
    # unfused reference
    from multimodal_audio_search_tpu.models import layers as L
    from multimodal_audio_search_tpu.ops.cross_attention import (
        xla_single_query_attention)
    h = L.layer_norm(blk["self_ln"], x[:, None, :], cfg.ln_eps)
    k1r = L.dense(a["k"], h)[:, 0, :]
    v1r = L.dense(a["v"], h)[:, 0, :]
    q1r = L.dense(a["q"], h)[:, 0, :]
    kk = kc.at[:, 5, :].set(k1r)
    vv = vc.at[:, 5, :].set(v1r)
    attn = xla_single_query_attention(q1r, kk, vv, heads=heads, pos=pos)
    xr = x + L.dense(a["o"], attn[:, None, :].astype(x.dtype))[:, 0, :]
    np.testing.assert_allclose(np.asarray(k1), np.asarray(k1r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v1r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(xr),
                               atol=2e-5, rtol=1e-5)


def test_fused_cross_mlp_block_correct(rng):
    """fused_cross_mlp_block (unwired — measured slower, kept as a
    correctness-tested negative result) must match the unfused math."""
    from multimodal_audio_search_tpu.models import layers as L
    from multimodal_audio_search_tpu.ops.cross_attention import (
        merge_heads_kv, xla_cross_attention)
    from multimodal_audio_search_tpu.ops.decoder_block import (
        fused_cross_mlp_block)
    cfg = tiny_cfg()
    params = W.init_params(jax.random.PRNGKey(0), cfg)
    blk = params["decoder"]["blocks"][0]
    b, hd, t, heads = 8, cfg.d_model, 20, cfg.heads
    x = jnp.asarray(rng.normal(size=(b, hd)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, heads, t, hd // heads)),
                    jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, heads, t, hd // heads)),
                    jnp.float32)
    k_m, v_m = merge_heads_kv(k, v)
    c = blk["cross_attn"]
    got = fused_cross_mlp_block(
        x, blk["cross_ln"]["scale"], blk["cross_ln"]["bias"],
        c["q"]["w"], c["q"]["b"], c["o"]["w"], c["o"]["b"],
        blk["mlp_ln"]["scale"], blk["mlp_ln"]["bias"],
        blk["mlp_in"]["w"], blk["mlp_in"]["b"],
        blk["mlp_out"]["w"], blk["mlp_out"]["b"],
        k_m, v_m, heads=heads, eps=cfg.ln_eps, interpret=True)
    # unfused reference
    h = L.layer_norm(blk["cross_ln"], x[:, None, :], cfg.ln_eps)
    q = L.split_heads(L.dense(c["q"], h), heads)[:, :, 0, :]
    attn = xla_cross_attention(q, k, v).reshape(b, hd)
    x1 = x + L.dense(c["o"], attn[:, None, :].astype(x.dtype))[:, 0, :]
    h = L.layer_norm(blk["mlp_ln"], x1[:, None, :], cfg.ln_eps)
    ref = x1 + L.dense(blk["mlp_out"],
                       L.gelu(L.dense(blk["mlp_in"], h)))[:, 0, :]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-5, rtol=1e-5)


def test_fused_mlp_block_correct(rng):
    """fused_mlp_block (the all-rows MLP kernel wired into fused_layer
    decode) must match the unfused LN+fc1+gelu+fc2+residual math."""
    from multimodal_audio_search_tpu.models import layers as L
    from multimodal_audio_search_tpu.ops.decoder_block import (
        fused_mlp_block)
    cfg = tiny_cfg()
    params = W.init_params(jax.random.PRNGKey(0), cfg)
    blk = params["decoder"]["blocks"][0]
    x = jnp.asarray(rng.normal(size=(8, cfg.d_model)), jnp.float32)
    got = fused_mlp_block(
        x, blk["mlp_ln"]["scale"], blk["mlp_ln"]["bias"],
        blk["mlp_in"]["w"], blk["mlp_in"]["b"],
        blk["mlp_out"]["w"], blk["mlp_out"]["b"],
        eps=cfg.ln_eps, interpret=True)
    h = L.layer_norm(blk["mlp_ln"], x[:, None, :], cfg.ln_eps)
    ref = x + L.dense(blk["mlp_out"],
                      L.gelu(L.dense(blk["mlp_in"], h)))[:, 0, :]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-5, rtol=1e-5)


def test_fused_layer_v2_token_exact(rng):
    """fused_layer='v2' (self+cross-q kernel, cross kernel on the emitted
    query, o-proj+MLP kernel) must match the unfused path token-for-token
    (f32, interpret). Requires the merged-head cross K/V format."""
    cfg = tiny_cfg()
    params = W.init_params(jax.random.PRNGKey(2), cfg)
    enc_out = jnp.asarray(rng.normal(size=(8, 40, cfg.d_model)),
                          jnp.float32)
    prefix = jnp.tile(jnp.asarray(W.forced_prefix(cfg), jnp.int32),
                      (8, 1))
    base = generate(
        params, enc_out, prefix,
        cfg=cfg, decode=DecodeConfig(method="greedy", max_new_tokens=10,
                                     cross_attn="einsum",
                                     fused_layer=False),
        prefix_len=prefix.shape[1], max_new_tokens=10)
    v2 = generate(
        params, enc_out, prefix,
        cfg=cfg, decode=DecodeConfig(method="greedy", max_new_tokens=10,
                                     cross_attn="fused",
                                     fused_layer="v2"),
        prefix_len=prefix.shape[1], max_new_tokens=10)
    np.testing.assert_array_equal(np.asarray(base.tokens),
                                  np.asarray(v2.tokens))
