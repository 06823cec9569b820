"""Encoder fused attention block (ops/encoder_block.py) vs the XLA path.

Interpret-mode parity on CPU: the kernel is a behavior-neutral perf
lever (ROADMAP 17), so encode(fused_blocks=True) must match the plain
encoder to float tolerance at f32.
"""
import jax
import jax.numpy as jnp
import numpy as np

from multimodal_audio_search_tpu.models import layers as L
from multimodal_audio_search_tpu.models import whisper as W
from multimodal_audio_search_tpu.ops.encoder_block import (
    fused_attention_o_residual)


def test_attn_o_residual_kernel_matches_xla(rng):
    b, heads, t, d = 2, 4, 40, 16
    hd = heads * d
    q, k, v = (jnp.asarray(rng.normal(size=(b, heads, t, d)), jnp.float32)
               for _ in range(3))
    x = jnp.asarray(rng.normal(size=(b, t, hd)), jnp.float32)
    o = L.init_dense(jax.random.PRNGKey(0), hd, hd)

    out = fused_attention_o_residual(
        q, k, v, x, o["w"], o["b"], blk_q=16, interpret=True)
    ref = x + L.dense(o, L.merge_heads(L.attention_scores(q, k, v)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_attn_o_residual_single_step_defer(rng):
    """blk_q >= T (one grid step per batch row) takes the deferred
    /l formulation (the 2x path, gated at t_pad == blk_q); must still
    match the XLA reference exactly at f32."""
    b, heads, t, d = 2, 4, 40, 16
    hd = heads * d
    q, k, v = (jnp.asarray(rng.normal(size=(b, heads, t, d)), jnp.float32)
               for _ in range(3))
    x = jnp.asarray(rng.normal(size=(b, t, hd)), jnp.float32)
    o = L.init_dense(jax.random.PRNGKey(2), hd, hd)
    out = fused_attention_o_residual(
        q, k, v, x, o["w"], o["b"], blk_q=48, interpret=True)
    ref = x + L.dense(o, L.merge_heads(L.attention_scores(q, k, v)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_attn_o_residual_padding_mask(rng):
    """T not a multiple of blk_q: padded keys must not leak into softmax."""
    b, heads, t, d = 1, 2, 21, 8
    hd = heads * d
    q, k, v = (jnp.asarray(rng.normal(size=(b, heads, t, d)), jnp.float32)
               for _ in range(3))
    x = jnp.asarray(rng.normal(size=(b, t, hd)), jnp.float32)
    o = L.init_dense(jax.random.PRNGKey(1), hd, hd)
    out = fused_attention_o_residual(
        q, k, v, x, o["w"], o["b"], blk_q=16, interpret=True)
    ref = x + L.dense(o, L.merge_heads(L.attention_scores(q, k, v)))
    assert out.shape == (b, t, hd)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_attn_o_residual_exp2_matches(rng):
    """use_exp2 folds log2(e) into the score scale (bare exp2 on the
    VPU); softmax output must be identical to float tolerance in both
    the single-block deferred and multi-block in-tile formulations."""
    b, heads, t, d = 1, 2, 40, 16
    hd = heads * d
    q, k, v = (jnp.asarray(rng.normal(size=(b, heads, t, d)), jnp.float32)
               for _ in range(3))
    x = jnp.asarray(rng.normal(size=(b, t, hd)), jnp.float32)
    o = L.init_dense(jax.random.PRNGKey(5), hd, hd)
    ref = x + L.dense(o, L.merge_heads(L.attention_scores(q, k, v)))
    for kw in ({"blk_q": 48}, {"blk_q": 16}):
        out = fused_attention_o_residual(
            q, k, v, x, o["w"], o["b"], use_exp2=True, interpret=True,
            **kw)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)


def test_attn_o_residual_bf16_multiblock_close(rng):
    """Production dtype sanity: the multi-block (long-context) path at
    bf16 stays within bf16 rounding of the f32 XLA reference."""
    b, heads, t, d = 1, 2, 40, 16
    hd = heads * d
    q, k, v = (jnp.asarray(rng.normal(size=(b, heads, t, d)), jnp.float32)
               for _ in range(3))
    x = jnp.asarray(rng.normal(size=(b, t, hd)), jnp.float32)
    o = L.init_dense(jax.random.PRNGKey(6), hd, hd)
    ref = x + L.dense(o, L.merge_heads(L.attention_scores(q, k, v)))
    out = fused_attention_o_residual(
        q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
        v.astype(jnp.bfloat16), x.astype(jnp.bfloat16),
        o["w"].astype(jnp.bfloat16), o["b"].astype(jnp.bfloat16),
        blk_q=16, interpret=True)
    err = np.max(np.abs(np.asarray(out, np.float32) - np.asarray(ref)))
    assert err < 0.15, err  # bf16 rounding through 3 matmuls


def test_encode_long_context_wiring(rng, monkeypatch):
    """Long-context fork RESOLVED (round-4 on-chip A/Bs, docs/
    BENCHMARKS.md): the streaming variant is deleted; W.encode at
    t > 512 routes through the multi-block full-T kernel (even under
    the former MAS_ENC_STREAM env, now meaningless) and the output
    matches the plain path (interpret mode on CPU)."""
    import multimodal_audio_search_tpu.ops.encoder_block as eb_mod

    monkeypatch.setenv("MAS_ENC_STREAM", "1")  # must be inert

    orig = eb_mod.fused_attention_o_residual
    seen = {}

    def spy(*a, **kw):
        seen.update({k: v for k, v in kw.items() if k == "blk_q"})
        return orig(*a, **{**kw, "interpret": True})

    monkeypatch.setattr(eb_mod, "fused_attention_o_residual", spy)
    cfg = W.WhisperConfig(
        vocab_size=64, d_model=32, enc_layers=1, dec_layers=1, heads=2,
        ffn=64, enc_positions=600, dec_positions=8,
        bos_token_id=60, eos_token_id=61, pad_token_id=61)
    params = W.init_params(jax.random.PRNGKey(1), cfg)
    mel = jnp.asarray(rng.normal(size=(1, cfg.n_mels, 1200)) * 0.5,
                      jnp.float32)
    ref = W.encode(params, mel, cfg, fused_attention=False)
    out = W.encode(params, mel, cfg, fused_blocks=True)
    # round-5: blk_q is dtype-aware — f32 activations double every
    # VMEM tile, so 4-byte dtypes get half the query block (the f32
    # 128-block overflowed scoped VMEM at t=1500 on real Mosaic,
    # docs/onchip_r5/drift_prod_s5.out); bf16 keeps the measured-best
    # 256 at this context
    assert seen == {"blk_q": 128}, seen
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5)
    seen.clear()
    p16 = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, params)
    W.encode(p16, mel.astype(jnp.bfloat16), cfg, fused_blocks=True)
    assert seen == {"blk_q": 256}, seen


def test_encode_wide_dtype_long_context_routes_per_head(rng, monkeypatch):
    """f32 + fused_blocks at t > 1024 must NOT call the all-heads block
    kernel (full-T K/V double-buffered at 4 B/elt exceeds scoped VMEM
    at any query block — OOMed twice on real Mosaic, docs/onchip_r5/
    drift_s5_c.out); it routes through the per-head fused attention
    kernel and still matches the plain path. bf16 keeps the block
    kernel."""
    import multimodal_audio_search_tpu.ops.attention as attn_mod
    import multimodal_audio_search_tpu.ops.encoder_block as eb_mod

    called = {"block": 0, "per_head": 0}
    orig_blk = eb_mod.fused_attention_o_residual
    orig_ph = attn_mod.fused_encoder_attention

    def spy_blk(*a, **kw):
        called["block"] += 1
        return orig_blk(*a, **{**kw, "interpret": True})

    def spy_ph(*a, **kw):
        called["per_head"] += 1
        return orig_ph(*a, **{**kw, "interpret": True})

    monkeypatch.setattr(eb_mod, "fused_attention_o_residual", spy_blk)
    monkeypatch.setattr(attn_mod, "fused_encoder_attention", spy_ph)
    # W.encode imports fused_encoder_attention inside the function body,
    # so the module-attr patch is picked up
    cfg = W.WhisperConfig(
        vocab_size=64, d_model=32, enc_layers=1, dec_layers=1, heads=2,
        ffn=64, enc_positions=1100, dec_positions=8,
        bos_token_id=60, eos_token_id=61, pad_token_id=61)
    params = W.init_params(jax.random.PRNGKey(2), cfg)
    mel = jnp.asarray(rng.normal(size=(1, cfg.n_mels, 2200)) * 0.5,
                      jnp.float32)
    ref = W.encode(params, mel, cfg, fused_attention=False)
    out = W.encode(params, mel, cfg, fused_blocks=True)
    assert called == {"block": 0, "per_head": 1}, called
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5)


def test_encode_fused_blocks_matches_plain(rng, monkeypatch):
    """Full encode with fused_blocks=True == plain encode (f32, CPU via
    the interpret-mode kernel)."""
    import multimodal_audio_search_tpu.ops.encoder_block as eb_mod

    orig = eb_mod.fused_attention_o_residual
    monkeypatch.setattr(
        eb_mod, "fused_attention_o_residual",
        lambda *a, **kw: orig(*a, **{**kw, "interpret": True}))

    cfg = W.PRESETS["test"]
    params = W.init_params(jax.random.PRNGKey(0), cfg)
    mel = jnp.asarray(rng.normal(size=(2, cfg.n_mels, 64)) * 0.5,
                      jnp.float32)
    ref = W.encode(params, mel, cfg, fused_attention=False)
    out = W.encode(params, mel, cfg, fused_blocks=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5)


def test_encode_fused_blocks_paired_routing(rng, monkeypatch):
    """fused_blocks="paired" (round-5 wiring of the round-4 chip-proven
    head-paired kernel) routes the block kernel to pair_heads=True and
    matches the plain path; geometries whose doubled block-diagonal K/V
    would overflow scoped VMEM (8*H*t_pad*D*itemsize > 13 MB double-
    buffered, e.g. whisper-small at the 30 s context: 18.9 MB) fall
    back to the unpaired kernel instead of letting Mosaic raise
    RESOURCE_EXHAUSTED. Round-5 review regression: the first wiring
    double-counted (coefficient 16) and silently disabled "paired" at
    whisper-base/bf16/t=1500 — the exact chip-proven win geometry —
    so this test pins engagement there."""
    import multimodal_audio_search_tpu.ops.encoder_block as eb_mod

    orig = eb_mod.fused_attention_o_residual
    seen = []

    def spy(*a, **kw):
        seen.append(bool(kw.get("pair_heads", False)))
        return orig(*a, **{**kw, "interpret": True})

    monkeypatch.setattr(eb_mod, "fused_attention_o_residual", spy)
    cfg = W.WhisperConfig(
        vocab_size=64, d_model=32, enc_layers=1, dec_layers=1, heads=2,
        ffn=64, enc_positions=64, dec_positions=8,
        bos_token_id=60, eos_token_id=61, pad_token_id=61)
    params = W.init_params(jax.random.PRNGKey(3), cfg)
    mel = jnp.asarray(rng.normal(size=(1, cfg.n_mels, 128)) * 0.5,
                      jnp.float32)
    ref = W.encode(params, mel, cfg, fused_attention=False)
    out = W.encode(params, mel, cfg, fused_blocks="paired")
    assert seen == [True], seen
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5)

    # VMEM fallback: 8 * H * t_pad * D * itemsize = 16.8 MB here
    # (bf16, heads=2, t_pad=512, D=1024) — same arithmetic class as
    # whisper-small at t=1500 (18.9 MB) — must run the UNPAIRED kernel
    seen.clear()
    cfg2 = W.WhisperConfig(
        vocab_size=64, d_model=2048, enc_layers=1, dec_layers=1, heads=2,
        ffn=64, enc_positions=512, dec_positions=8,
        bos_token_id=60, eos_token_id=61, pad_token_id=61)
    p2 = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a,
        W.init_params(jax.random.PRNGKey(4), cfg2))
    mel2 = jnp.asarray(rng.normal(size=(1, cfg2.n_mels, 1024)) * 0.5,
                       jnp.bfloat16)
    W.encode(p2, mel2, cfg2, fused_blocks="paired")
    assert seen == [False], seen

    # ENGAGEMENT at the chip-proven geometry (whisper-base dims, bf16,
    # t=1500 -> 12.6 MB double-buffered, inside the 13 MB gate): the
    # paired kernel must actually run — the round-5 first wiring
    # double-counted K/V bytes and silently fell back here. The spy
    # short-circuits (returns x) so the CPU test only checks routing,
    # not the interpret-mode kernel at production size.
    seen.clear()
    monkeypatch.setattr(eb_mod, "fused_attention_o_residual",
                        lambda q, k, v, x, wo, bo, **kw:
                        (seen.append(bool(kw.get("pair_heads", False)))
                         or x))
    cfg3 = W.WhisperConfig(
        vocab_size=64, d_model=512, enc_layers=1, dec_layers=1, heads=8,
        ffn=64, enc_positions=1500, dec_positions=8,
        bos_token_id=60, eos_token_id=61, pad_token_id=61)
    p3 = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a,
        W.init_params(jax.random.PRNGKey(5), cfg3))
    mel3 = jnp.asarray(rng.normal(size=(1, cfg3.n_mels, 3000)) * 0.5,
                       jnp.bfloat16)
    W.encode(p3, mel3, cfg3, fused_blocks="paired")
    assert seen == [True], seen


def test_attn_o_residual_pair_heads_matches_xla(rng):
    """Head-paired block-diagonal variant (round-3 verdict item 6) must
    match the XLA reference, multi-query-block grid + padding mask."""
    b, heads, t, d = 2, 4, 40, 16
    hd = heads * d
    q, k, v = (jnp.asarray(rng.normal(size=(b, heads, t, d)), jnp.float32)
               for _ in range(3))
    x = jnp.asarray(rng.normal(size=(b, t, hd)), jnp.float32)
    o = L.init_dense(jax.random.PRNGKey(0), hd, hd)

    out = fused_attention_o_residual(
        q, k, v, x, o["w"], o["b"], blk_q=16, pair_heads=True,
        interpret=True)
    ref = x + L.dense(o, L.merge_heads(L.attention_scores(q, k, v)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_attn_o_residual_pair_heads_single_step_defer(rng):
    """Single-query-block grid takes the deferred-divide path of the
    paired kernel; must still match XLA exactly at f32."""
    b, heads, t, d = 2, 4, 48, 16
    hd = heads * d
    q, k, v = (jnp.asarray(rng.normal(size=(b, heads, t, d)), jnp.float32)
               for _ in range(3))
    x = jnp.asarray(rng.normal(size=(b, t, hd)), jnp.float32)
    o = L.init_dense(jax.random.PRNGKey(1), hd, hd)

    out = fused_attention_o_residual(
        q, k, v, x, o["w"], o["b"], blk_q=48, pair_heads=True,
        interpret=True)
    ref = x + L.dense(o, L.merge_heads(L.attention_scores(q, k, v)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_attn_o_residual_int8_matches_quantized_reference(rng):
    """int8-dot variant == the same quantized math in plain XLA (exact
    modulo f32 reduction order), and close to the f32 attention."""
    b, heads, t, d = 2, 4, 40, 16
    hd = heads * d
    q, k, v = (jnp.asarray(rng.normal(size=(b, heads, t, d)), jnp.float32)
               for _ in range(3))
    x = jnp.asarray(rng.normal(size=(b, t, hd)), jnp.float32)
    o = L.init_dense(jax.random.PRNGKey(0), hd, hd)

    out = fused_attention_o_residual(
        q, k, v, x, o["w"], o["b"], blk_q=16, qk_int8=True,
        interpret=True)

    # XLA twin of the SAME quantized math (row maxima make the kernel's
    # blk_q tiling irrelevant) — also the plain-encode MAS_ENC_INT8 path
    from multimodal_audio_search_tpu.ops.encoder_block import (
        int8_attention_xla)
    ref = x + L.dense(o, L.merge_heads(int8_attention_xla(q, k, v)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)

    # and the quantization is a small perturbation of the f32 attention
    f32 = x + L.dense(o, L.merge_heads(L.attention_scores(q, k, v)))
    err = float(jnp.max(jnp.abs(out - f32)) / jnp.max(jnp.abs(f32)))
    assert err < 0.05, err


def test_encode_int8_env_path_matches_kernel(rng, monkeypatch):
    """MAS_ENC_INT8=1 on the plain encode path (XLA twin) must produce
    the same encoder states as the int8 Pallas kernel (interpret mode)
    — one arithmetic, two executors."""
    import os as _os
    from multimodal_audio_search_tpu.ops import encoder_block as eb
    cfg = W.config_for("test")
    params = W.init_params(jax.random.PRNGKey(3), cfg)
    mel = jnp.asarray(rng.normal(size=(2, cfg.n_mels, 2 * cfg.enc_positions)),
                      jnp.float32)

    monkeypatch.setenv("MAS_ENC_INT8", "1")
    plain = W.encode(params, mel, cfg, fused_attention=False)

    orig = eb.fused_attention_o_residual
    def forced(*a, **kw):
        kw["interpret"] = True
        kw["qk_int8"] = True
        return orig(*a, **kw)
    monkeypatch.setattr(eb, "fused_attention_o_residual", forced)
    fused = W.encode(params, mel, cfg, fused_blocks=True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(plain),
                               atol=2e-4, rtol=2e-4)
