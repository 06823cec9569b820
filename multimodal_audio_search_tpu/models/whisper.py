"""Whisper encoder-decoder in functional JAX, parameterized tiny/base/small.

One implementation serves both reference model slots: openai/whisper-base for
ASR (audio_search.py:93) and the cahya whisper-tiny captioner
(audio_search.py:94) — the captioner is architecturally a stock Whisper
fine-tune, so it loads through the same conversion path (models/convert.py).

Architecture parity with HF WhisperForConditionalGeneration:
  * encoder: conv(k3,s1) -> gelu -> conv(k3,s2) -> gelu -> +learned positions
    -> pre-norm transformer -> final LN (fixed 1500 positions for 30 s mel)
  * decoder: tied token embeddings + learned positions -> pre-norm blocks of
    causal self-attn, cross-attn, MLP -> final LN -> logits = h @ E^T
  * attention k-projection has no bias; LN eps 1e-5; erf-GELU

TPU shape discipline: everything is static-shape; generation uses a
fixed-size KV cache [B, heads, max_len, hd] updated with dynamic_update_slice
inside lax.while_loop (models/generate.py), so one compilation serves every
decode call.
"""
from __future__ import annotations

import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from . import layers as L


@dataclass(frozen=True)
class WhisperConfig:
    vocab_size: int = 51865          # multilingual
    d_model: int = 512
    enc_layers: int = 6
    dec_layers: int = 6
    heads: int = 8
    ffn: int = 2048
    n_mels: int = 80
    enc_positions: int = 1500
    dec_positions: int = 448
    ln_eps: float = 1e-5
    # special ids (multilingual layout; HF generation_config)
    bos_token_id: int = 50258        # <|startoftranscript|>
    eos_token_id: int = 50257        # <|endoftext|>
    pad_token_id: int = 50257
    no_timestamps_id: int = 50363
    transcribe_id: int = 50359
    lang_en_id: int = 50259


PRESETS = {
    "tiny": WhisperConfig(d_model=384, enc_layers=4, dec_layers=4,
                          heads=6, ffn=1536),
    "base": WhisperConfig(d_model=512, enc_layers=6, dec_layers=6,
                          heads=8, ffn=2048),
    "small": WhisperConfig(d_model=768, enc_layers=12, dec_layers=12,
                           heads=12, ffn=3072),
}
# large-v3 shape (128 mel bins, 51866 vocab with shifted specials) — the
# biggest published Whisper; conversion path identical
PRESETS["large-v3"] = WhisperConfig(
    d_model=1280, enc_layers=32, dec_layers=32, heads=20, ffn=5120,
    n_mels=128, vocab_size=51866, bos_token_id=50258, eos_token_id=50257,
    pad_token_id=50257, no_timestamps_id=50364, transcribe_id=50360,
    lang_en_id=50259)
# English-only variants: 51864-token vocab, shifted special ids
_EN = dict(vocab_size=51864, bos_token_id=50257, eos_token_id=50256,
           pad_token_id=50256, no_timestamps_id=50362,
           transcribe_id=50358, lang_en_id=50258)
PRESETS.update({
    "tiny.en": WhisperConfig(d_model=384, enc_layers=4, dec_layers=4,
                             heads=6, ffn=1536, **_EN),
    "base.en": WhisperConfig(d_model=512, enc_layers=6, dec_layers=6,
                             heads=8, ffn=2048, **_EN),
    "small.en": WhisperConfig(d_model=768, enc_layers=12, dec_layers=12,
                              heads=12, ffn=3072, **_EN),
})


# CI/dryrun preset: the production code paths (forced prefix layout,
# KV-cached generate, mesh sharding — heads divisible by model_parallel=2)
# at toy dims, so the REAL engine can compile+run on CPU test meshes
PRESETS["test"] = WhisperConfig(
    vocab_size=512, d_model=64, enc_layers=2, dec_layers=2, heads=4,
    ffn=128, enc_positions=100, dec_positions=32, bos_token_id=500,
    eos_token_id=501, pad_token_id=501, no_timestamps_id=502,
    transcribe_id=503, lang_en_id=504)


def config_for(preset: str, **overrides) -> WhisperConfig:
    import dataclasses
    return dataclasses.replace(PRESETS[preset], **overrides)


# --------------------------------------------------------------------- init
def _init_block(key, cfg: WhisperConfig, cross: bool):
    ks = jax.random.split(key, 3)
    blk = {
        "self_attn": L.init_mha(ks[0], cfg.d_model, k_bias=False),
        "self_ln": L.init_layer_norm(cfg.d_model),
        "mlp_in": L.init_dense(ks[1], cfg.d_model, cfg.ffn),
        "mlp_out": L.init_dense(ks[2], cfg.ffn, cfg.d_model),
        "mlp_ln": L.init_layer_norm(cfg.d_model),
    }
    if cross:
        k4 = jax.random.fold_in(key, 99)
        blk["cross_attn"] = L.init_mha(k4, cfg.d_model, k_bias=False)
        blk["cross_ln"] = L.init_layer_norm(cfg.d_model)
    return blk


def init_params(key, cfg: WhisperConfig):
    ks = jax.random.split(key, cfg.enc_layers + cfg.dec_layers + 6)
    d = cfg.d_model
    enc = {
        "conv1": {"w": jax.random.normal(ks[0], (3, cfg.n_mels, d)) * 0.02,
                  "b": jnp.zeros((d,))},
        "conv2": {"w": jax.random.normal(ks[1], (3, d, d)) * 0.02,
                  "b": jnp.zeros((d,))},
        "positions": jax.random.normal(ks[2], (cfg.enc_positions, d)) * 0.02,
        "blocks": [_init_block(ks[3 + i], cfg, cross=False)
                   for i in range(cfg.enc_layers)],
        "ln": L.init_layer_norm(d),
    }
    off = 3 + cfg.enc_layers
    dec = {
        "embed_tokens": jax.random.normal(
            ks[off], (cfg.vocab_size, d)) * 0.02,
        "positions": jax.random.normal(
            ks[off + 1], (cfg.dec_positions, d)) * 0.02,
        "blocks": [_init_block(ks[off + 2 + i], cfg, cross=True)
                   for i in range(cfg.dec_layers)],
        "ln": L.init_layer_norm(d),
    }
    return {"encoder": enc, "decoder": dec}


# ------------------------------------------------------------------ encoder
def _conv1d(p, x: jnp.ndarray, stride: int) -> jnp.ndarray:
    """x: [B, T, C_in], w: [k, C_in, C_out], SAME-1 padding like HF.

    Lowered as shifted-slice patches + ONE MXU matmul instead of
    lax.conv: XLA's conv lowering at C_in=80 measured MFU 0.027 on the
    chip (tools/profile_encode.py) while the identical-math
    [B*T, k*C_in] @ [k*C_in, C_out] dot runs at matmul rate. Tap i of
    the kernel multiplies input position t*stride - 1 + i (cross-
    correlation, same as lax.conv/HF torch)."""
    k, cin, cout = p["w"].shape
    t_out = (x.shape[1] - 1) // stride + 1
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))
    patches = jnp.concatenate(
        [xp[:, off: off + stride * (t_out - 1) + 1: stride]
         for off in range(k)], axis=-1)                # [B, T_out, k*C_in]
    y = jax.lax.dot_general(
        patches, p["w"].astype(x.dtype).reshape(k * cin, cout),
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return (y + p["b"].astype(jnp.float32)).astype(x.dtype)


def encode(
    params, mel: jnp.ndarray, cfg: WhisperConfig,
    fused_attention: bool | None = None,
    fused_blocks: bool | str = False,
) -> jnp.ndarray:
    """[B, n_mels, 3000] log-mel -> [B, 1500, d] encoder states.

    ``fused_attention``: route self-attention through the Pallas fused
    kernel (ops/attention.py). None = auto (real TPU and T >= 512).
    ``fused_blocks``: additionally fold LN+qkv and LN+MLP+residual into
    Pallas kernels (ops/encoder_block.py; opt-in perf mode, bf16-rounding
    equal to the XLA path). Implies the fused attention kernel. "int8"
    selects the int8-dot attention variant of the block kernel; "paired"
    the head-paired block-diagonal variant (full 128-lane MXU depth,
    same bf16 rounding class — a pure layout lever).
    """
    from ..ops.attention import fused_encoder_attention, use_pallas_attention
    enc = params["encoder"]
    x = mel.transpose(0, 2, 1)                       # [B, T, n_mels]
    x = L.gelu(_conv1d(enc["conv1"], x, 1))
    x = L.gelu(_conv1d(enc["conv2"], x, 2))          # [B, T/2, d]
    # slice positions to the actual context: full 1500 for 30 s parity, or
    # fewer under the short-context speed mode (mel padded_seconds < 30)
    x = x + enc["positions"][: x.shape[1]][None].astype(x.dtype)
    if fused_attention is None:
        fused_attention = fused_blocks or use_pallas_attention(x.shape[1])
    if (fused_blocks and fused_blocks != "int8"
            and jnp.dtype(x.dtype).itemsize >= 4 and x.shape[1] > 1024
            and not os.environ.get("MAS_ENC_INT8")):
        # f32 + block kernel at the 30 s context cannot fit scoped
        # VMEM: the kernel holds full-T K/V per grid step and BlockSpec
        # inputs are double-buffered, so K+V alone cost 4*H*T*D*4 B
        # (~9.4 MB at tiny, 12.6 at base) before any score temp — both
        # the 128- and 64-row query blocks OOMed on real Mosaic
        # (docs/onchip_r5/drift_prod_s5.out, drift_s5_c.out). Wide
        # dtypes at long context route through the per-head fused
        # attention kernel instead (K/V blocked per head — same math,
        # f32 softmax, ~1.6 MB K/V per step); the production bf16
        # pipeline stays on the all-heads block kernel. The int8
        # variant's K/V blocks are int8 and fit at any dtype.
        fused_blocks = False
        fused_attention = True
    if fused_blocks == "paired":
        # the paired kernel's block-diagonal K/V carry structural zeros
        # — 2x the unpaired kernel's K/V bytes. Per grid step the kernel
        # holds kb [P, 2D, 2T_pad] + vb [P, 2T_pad, 2D] (P = H/2 pairs),
        # each double-buffered: 2 buffers x 2 blocks x (H/2)(2D)(2T_pad)
        # = 8*H*T_pad*D*itemsize — 12.6 MB at base/bf16/t=1500 (fits;
        # chip-proven, docs/onchip_r4/headpair_ab.out) but 18.9 MB at
        # small (H=12), over the 16 MB scoped-VMEM budget. Route
        # oversized geometries to the unpaired block kernel rather than
        # letting Mosaic raise RESOURCE_EXHAUSTED. (Round-5 review fix:
        # the first wiring used coefficient 16 — double-counting kb+vb —
        # which read base/bf16/t=1500 as 25.2 MB and silently routed
        # "paired" to the unpaired kernel at the exact geometry the A/B
        # proved it wins at; tests/test_encoder_block.py now asserts
        # engagement at base geometry.)
        t_pad = -(-x.shape[1] // 128) * 128
        kv_bytes = 8 * cfg.heads * t_pad * (cfg.d_model // cfg.heads) \
            * jnp.dtype(x.dtype).itemsize
        if kv_bytes > 13 * 2**20:
            fused_blocks = True
    if fused_blocks:
        # Round-3 profile (tools/profile_encode.py): XLA already runs the
        # LN and MLP sub-blocks at MFU ~1.0 — the only kernel that pays
        # is the all-heads attention + o-proj + residual block (the
        # per-head kernel ran at MFU 0.11 on per-step overhead).
        from ..ops.encoder_block import fused_attention_o_residual
        t = x.shape[1]
        # measured on-chip (B=64, 10 s ctx): one whole-T step per batch
        # (blk_q=512) beats 256 (16.2 vs 17.7 ms encode) — K/V are
        # fetched once and the /l divide defers to the [blk, D] output.
        # Long-context fork RESOLVED by the round-4 on-chip A/Bs
        # (docs/BENCHMARKS.md "Round-4 on-chip A/Bs"): the streaming
        # (blk_k-chunked) online-softmax variant crashed the real
        # Mosaic compile helper at t=1500 and was within noise of
        # full-T at t=500 once timed at decision grade, so it was
        # DELETED — these full-T configs are the only encoder path
        # (the former MAS_ENC_STREAM opt-in is gone).
        # f32 activations double every VMEM-resident tile (the full-T
        # K/V blocks plus the per-head [blk_q, T] score temps), and at
        # t=1500 the 128-row query block overflowed Mosaic's 16 MB
        # scoped-VMEM budget (19.5 MB requested — the round-5 drift
        # oracle's first on-chip fused_enc attempt, docs/onchip_r5/
        # drift_prod_s5.out). Halve the block for 4-byte dtypes; bf16
        # (the production pipeline dtype) keeps the measured-best blocks.
        wide = jnp.dtype(x.dtype).itemsize >= 4
        if t <= 512:
            blk_q = 256 if wide else 512
        elif t <= 1024:
            blk_q = 128 if wide else 256
        else:
            blk_q = 64 if wide else 128
        # int8-dot attention (int8 x int8 -> int32 dots; int8 rounding
        # on q and softmax rows — transcript-exact on BOTH self-trained
        # oracles, incl. the round-5 decision-strength production-
        # geometry run: agree_exact 1.000 at truth_exact 0.948,
        # docs/onchip_r5/drift_s5_b.json). PERF STANDING REVISED round 5
        # (docs/onchip_r5/int8_e2e.out, in-jit timer): at t=1500 the
        # kernel is NOT dot-bound — int8 measures 8.41 ms vs bf16's
        # 8.56 (equal within noise; the round-4 wall-minus-RTT rows
        # claiming 3.77 vs 6.90 were timing artifacts). Kept as an
        # opt-in research lever via fused_blocks="int8"
        # (DecodeConfig.fused_encoder) or the MAS_ENC_INT8 env override
        # the drift tool uses; the parity default stays the bf16 fused
        # kernel, whose rounding class matches the einsum path.
        qk_int8 = fused_blocks == "int8" or os.environ.get(
            "MAS_ENC_INT8", "0").lower() in ("1", "true")
        # head-paired block-diagonal K/V (fused_encoder="paired"): every
        # score/PV dot contracts the full 128-lane MXU depth instead of
        # D=64. PERF STANDING REVISED round 5 (docs/onchip_r5/
        # int8_e2e.out, in-jit timer): it LOSES at t=1500 — 11.77 ms vs
        # the unpaired kernel's 8.56 (the structural-zero 2x K/V bytes
        # cost more than the full-depth dots save; the round-4
        # wall-minus-RTT "win" was a timing artifact). Same bf16
        # rounding class as the default kernel (the extra block-diagonal
        # terms are exact zero-products; f32 accumulate); kept as an
        # opt-in layout-study lever. int8 outranks it if both are
        # requested; odd head counts (never a Whisper preset, but
        # reachable under odd tensor-parallel shards) fall back to the
        # unpaired kernel.
        pair = (fused_blocks == "paired" and not qk_int8
                and cfg.heads % 2 == 0)
        # off-TPU (CPU drift oracle, debugging) the block kernel runs in
        # Pallas interpret mode — same math, slow but correct — instead
        # of failing to lower; decided at trace time, so jitted programs
        # are unaffected on chip
        interp = jax.default_backend() != "tpu"
        for blk in params["encoder"]["blocks"]:
            a = blk["self_attn"]
            h = L.layer_norm(blk["self_ln"], x, cfg.ln_eps)
            q = L.split_heads(L.dense(a["q"], h), cfg.heads)
            k = L.split_heads(L.dense(a["k"], h), cfg.heads)
            v = L.split_heads(L.dense(a["v"], h), cfg.heads)
            x = fused_attention_o_residual(
                q, k, v, x, a["o"]["w"], a["o"]["b"], blk_q=blk_q,
                pair_heads=pair, qk_int8=qk_int8, interpret=interp)
            h = L.layer_norm(blk["mlp_ln"], x, cfg.ln_eps)
            x = x + L.dense(blk["mlp_out"],
                            L.gelu(L.dense(blk["mlp_in"], h)))
        return L.layer_norm(params["encoder"]["ln"], x, cfg.ln_eps)
    for blk in params["encoder"]["blocks"]:
        h = L.layer_norm(blk["self_ln"], x, cfg.ln_eps)
        # the MAS_ENC_INT8 override outranks the plain fused kernel: the
        # drift oracle uses it to measure the int8-dot lever's accuracy,
        # and on TPU fused_attention auto-selects True at t>=512 — were
        # this an elif after it, the "int8" drift row would silently
        # re-measure the bf16 kernel (caught in round 4's first
        # production-geometry drift run)
        if os.environ.get("MAS_ENC_INT8", "0").lower() in ("1", "true"):
            # plain-XLA twin of the int8-dot kernel's math — lets the
            # CPU drift oracle measure the lever without Pallas
            from ..ops.encoder_block import int8_attention_xla
            a = blk["self_attn"]
            q = L.split_heads(L.dense(a["q"], h), cfg.heads)
            k = L.split_heads(L.dense(a["k"], h), cfg.heads)
            v = L.split_heads(L.dense(a["v"], h), cfg.heads)
            x = x + L.dense(a["o"],
                            L.merge_heads(int8_attention_xla(q, k, v))
                            .astype(x.dtype))
        elif fused_attention:
            a = blk["self_attn"]
            q = L.split_heads(L.dense(a["q"], h), cfg.heads)
            k = L.split_heads(L.dense(a["k"], h), cfg.heads)
            v = L.split_heads(L.dense(a["v"], h), cfg.heads)
            attn = L.merge_heads(fused_encoder_attention(q, k, v))
            x = x + L.dense(a["o"], attn)
        else:
            x = x + L.mha(blk["self_attn"], h, h, cfg.heads)
        h = L.layer_norm(blk["mlp_ln"], x, cfg.ln_eps)
        x = x + L.dense(blk["mlp_out"], L.gelu(L.dense(blk["mlp_in"], h)))
    return L.layer_norm(params["encoder"]["ln"], x, cfg.ln_eps)


# ------------------------------------------------------------------ decoder
def cross_kv(params, enc_out: jnp.ndarray, cfg: WhisperConfig):
    """Precompute per-layer cross-attention K/V from encoder output."""
    out = []
    for blk in params["decoder"]["blocks"]:
        k = L.split_heads(L.dense(blk["cross_attn"]["k"], enc_out), cfg.heads)
        v = L.split_heads(L.dense(blk["cross_attn"]["v"], enc_out), cfg.heads)
        out.append((k, v))
    return out


def cross_kv_quantized(params, enc_out: jnp.ndarray, cfg: WhisperConfig):
    """Int8 cross-attention K/V (ops/cached_attention.py): computed once per
    segment batch, read 64+ times during decode at half the HBM traffic."""
    from ..ops.cached_attention import quantize_kv
    out = []
    for k, v in cross_kv(params, enc_out, cfg):
        out.append(quantize_kv(k, v))
    return out


def cross_kv_merged(params, enc_out: jnp.ndarray, cfg: WhisperConfig):
    """Merged-head [B, T, H*D] cross K/V for the fused decode kernel
    (ops/cross_attention.py — full 128-lane rows, ~4x the einsum path)."""
    from ..ops.cross_attention import merge_heads_kv
    return [merge_heads_kv(k, v) for k, v in cross_kv(params, enc_out, cfg)]


def cross_kv_merged_int8(params, enc_out: jnp.ndarray, cfg: WhisperConfig):
    """Merged-head int8 cross K/V: half the per-step HBM traffic of the
    bf16 fused path at the same kernel structure (native int8 MXU dots,
    ops/cross_attention.py::fused_single_query_attention_int8). Opt-in:
    ~1-2% attention-output error (guardrail-tested)."""
    from ..ops.cross_attention import merge_heads_kv, quantize_kv_merged
    out = []
    for k, v in cross_kv(params, enc_out, cfg):
        k_m, v_m = merge_heads_kv(k, v)
        out.append(quantize_kv_merged(k_m, v_m, cfg.heads))
    return out


def _cross_attend(blk, h, ckv_entry, cfg):
    """Cross-attention for one block; dispatches on the K/V cache format:
    len-2 of 4D arrays = bf16 einsum; len-2 of 3D = merged-head fused
    Pallas kernel; len-4 of 3D = merged int8 fused kernel; len-4 of 4D =
    the round-1 int8 GRP path (memory mode)."""
    if len(ckv_entry) == 4 and ckv_entry[0].ndim == 3:
        from ..ops.cross_attention import (
            fused_single_query_attention_int8,
            xla_single_query_attention_int8)
        q_m = L.dense(blk["cross_attn"]["q"], h)       # [B, 1, D] merged
        if q_m.shape[1] != 1:
            raise ValueError("int8_fused cross-attn is single-query only")
        q_m = q_m[:, 0, :]
        k8, ks, v8, vs = ckv_entry
        if jax.devices()[0].platform == "tpu":
            o = fused_single_query_attention_int8(
                q_m, k8, ks, v8, vs, heads=cfg.heads)
        else:
            o = xla_single_query_attention_int8(
                q_m, k8, ks, v8, vs, heads=cfg.heads)
        return L.dense(blk["cross_attn"]["o"],
                       o[:, None, :].astype(h.dtype))
    q = L.split_heads(L.dense(blk["cross_attn"]["q"], h), cfg.heads)
    if len(ckv_entry) == 2 and ckv_entry[0].ndim == 3:
        from ..ops.cross_attention import fused_cross_attention
        if q.shape[2] != 1:
            raise ValueError(
                "fused cross-attention is single-query (decode steps); "
                "use cross_kv() for teacher-forced decoding")
        k_m, v_m = ckv_entry
        interpret = jax.devices()[0].platform != "tpu"
        o = fused_cross_attention(q[:, :, 0, :], k_m, v_m,
                                  interpret=interpret)
        attn = L.merge_heads(o[:, :, None, :].astype(h.dtype))
        return L.dense(blk["cross_attn"]["o"], attn)
    if len(ckv_entry) == 4:
        from ..ops.cached_attention import (
            int8_cached_attention, xla_int8_cached_attention)
        if q.shape[2] != 1:
            raise ValueError(
                "int8 cross-KV supports single-query decode steps only; "
                "use cross_kv() for teacher-forced decoding")
        k8, ks, v8, vs = ckv_entry
        # single-query decode path only (q time dim == 1)
        q1 = q[:, :, 0, :]
        if jax.devices()[0].platform == "tpu":
            o = int8_cached_attention(q1, k8, ks, v8, vs)
        else:
            o = xla_int8_cached_attention(q1, k8, ks, v8, vs)
        attn = L.merge_heads(o[:, :, None, :].astype(h.dtype))
    else:
        ck, cv = ckv_entry
        attn = L.merge_heads(L.attention_scores(q, ck, cv))
    return L.dense(blk["cross_attn"]["o"], attn)


def _block_decode(blk, x, self_k, self_v, ckv_entry, cfg, self_bias):
    """One pre-norm decoder block given materialized self K/V."""
    h = L.layer_norm(blk["self_ln"], x, cfg.ln_eps)
    q = L.split_heads(L.dense(blk["self_attn"]["q"], h), cfg.heads)
    attn = L.merge_heads(L.attention_scores(q, self_k, self_v, self_bias))
    x = x + L.dense(blk["self_attn"]["o"], attn)
    h = L.layer_norm(blk["cross_ln"], x, cfg.ln_eps)
    x = x + _cross_attend(blk, h, ckv_entry, cfg)
    h = L.layer_norm(blk["mlp_ln"], x, cfg.ln_eps)
    return x + L.dense(blk["mlp_out"], L.gelu(L.dense(blk["mlp_in"], h)))


def decode_train(
    params, enc_out: jnp.ndarray, tokens: jnp.ndarray, cfg: WhisperConfig,
) -> jnp.ndarray:
    """Teacher-forced full-sequence decode -> [B, T, vocab] logits."""
    dec = params["decoder"]
    t = tokens.shape[1]
    x = dec["embed_tokens"][tokens] + dec["positions"][:t][None]
    x = x.astype(enc_out.dtype)
    ckv = cross_kv(params, enc_out, cfg)
    bias = L.causal_bias(t, t)
    for blk, ckv_entry in zip(dec["blocks"], ckv):
        # pre-norm: self K/V come from the layer-normed hidden (same h that
        # _block_decode recomputes for the query)
        h = L.layer_norm(blk["self_ln"], x, cfg.ln_eps)
        k = L.split_heads(L.dense(blk["self_attn"]["k"], h), cfg.heads)
        v = L.split_heads(L.dense(blk["self_attn"]["v"], h), cfg.heads)
        x = _block_decode(blk, x, k, v, ckv_entry, cfg, bias)
    x = L.layer_norm(dec["ln"], x, cfg.ln_eps)
    return _tied_logits(dec, x)


def _tied_logits(dec, x: jnp.ndarray) -> jnp.ndarray:
    """h @ E^T; uses the int8 table when the decoder is quantized."""
    if "embed_tokens_q" in dec:
        from ..ops.quant import quant_dense_apply
        return quant_dense_apply(dec["embed_tokens_q"], x,
                                 out_dtype=jnp.float32)
    return jnp.dot(
        x, dec["embed_tokens"].T.astype(x.dtype),
        preferred_element_type=jnp.float32)


# ----------------------------------------------------------- cached decode
def init_cache(cfg: WhisperConfig, batch: int, max_len: int, dtype):
    """Merged-head self-attention KV cache: [B, max_len, d_model].

    The merged layout (feature f = head*hd + i — exactly the k/v dense
    layers' output order) keeps rows at full 128-lane width; the round-1
    [B, H, L, hd=64] layout wasted half of every lane row and needed a
    head split plus two strided dynamic_update_slices per layer."""
    return [
        {"k": jnp.zeros((batch, max_len, cfg.d_model), dtype),
         "v": jnp.zeros((batch, max_len, cfg.d_model), dtype)}
        for _ in range(cfg.dec_layers)
    ]


def _self_attend_cached(q1, k, v, pos, cfg: WhisperConfig):
    """Single-query causal attention over the merged cache: q1 [B, D],
    k/v [B, L, D] -> [B, D] f32. Fused Pallas kernel on TPU, einsum twin
    elsewhere (ops/cross_attention.py)."""
    from ..ops.cross_attention import (
        fused_single_query_attention, xla_single_query_attention)
    if jax.devices()[0].platform == "tpu":
        return fused_single_query_attention(
            q1, k, v, heads=cfg.heads, pos=pos)
    return xla_single_query_attention(q1, k, v, heads=cfg.heads, pos=pos)


def decode_step(
    params, token: jnp.ndarray, pos: jnp.ndarray, cache, ckv,
    cfg: WhisperConfig, fused_layer: bool = False,
):
    """One KV-cached decode step.

    token [B] int32, pos scalar int32 (current position), cache as from
    init_cache, ckv from cross_kv. Returns (logits [B, vocab], new cache).
    ``fused_layer`` routes the whole self sub-block (LN + q/k/v + cache
    write + attention + o-proj + residual) through one Pallas kernel per
    layer (ops/decoder_block.py).
    """
    dec = params["decoder"]
    x = dec["embed_tokens"][token][:, None, :] \
        + jax.lax.dynamic_slice_in_dim(dec["positions"], pos, 1)[None]
    x = x.astype(cache[0]["k"].dtype)
    new_cache = []
    fused_layer = fused_layer and x.shape[0] % 8 == 0
    # v2 folds the WHOLE layer into 3 kernels: self block also emits the
    # cross query (cross-LN + q-proj tail), the cross kernel consumes it
    # directly, and the MLP kernel starts with the cross o-proj +
    # residual — leaving only the two cache-row writes as XLA ops.
    # Requires the merged-head cross K/V format.
    v2 = (fused_layer == "v2"
          and len(ckv[0]) == 2 and ckv[0][0].ndim == 3)
    for blk, layer_cache, ckv_entry in zip(dec["blocks"], cache, ckv):
        if v2:
            from ..ops.cross_attention import (
                fused_single_query_attention)
            from ..ops.decoder_block import (
                fused_mlp_block_o, fused_self_block_q)
            a = blk["self_attn"]
            c = blk["cross_attn"]
            interpret = jax.devices()[0].platform != "tpu"
            x1, k1, v1, qc = fused_self_block_q(
                x[:, 0, :],
                blk["self_ln"]["scale"], blk["self_ln"]["bias"],
                a["q"]["w"], a["q"]["b"], a["k"]["w"],
                a["v"]["w"], a["v"]["b"], a["o"]["w"], a["o"]["b"],
                blk["cross_ln"]["scale"], blk["cross_ln"]["bias"],
                c["q"]["w"], c["q"]["b"],
                layer_cache["k"], layer_cache["v"], pos,
                heads=cfg.heads, eps=cfg.ln_eps, interpret=interpret)
            k = jax.lax.dynamic_update_slice(
                layer_cache["k"], k1[:, None, :], (0, pos, 0))
            v = jax.lax.dynamic_update_slice(
                layer_cache["v"], v1[:, None, :], (0, pos, 0))
            new_cache.append({"k": k, "v": v})
            k_m, v_m = ckv_entry
            attn = fused_single_query_attention(
                qc, k_m, v_m, heads=cfg.heads, interpret=interpret)
            x = fused_mlp_block_o(
                x1, attn, c["o"]["w"], c["o"]["b"],
                blk["mlp_ln"]["scale"], blk["mlp_ln"]["bias"],
                blk["mlp_in"]["w"], blk["mlp_in"]["b"],
                blk["mlp_out"]["w"], blk["mlp_out"]["b"],
                eps=cfg.ln_eps, interpret=interpret)[:, None, :]
            continue
        if fused_layer:
            from ..ops.decoder_block import fused_self_block
            a = blk["self_attn"]
            interpret = jax.devices()[0].platform != "tpu"
            x1, k1, v1 = fused_self_block(
                x[:, 0, :],
                blk["self_ln"]["scale"], blk["self_ln"]["bias"],
                a["q"]["w"], a["q"]["b"], a["k"]["w"],
                a["v"]["w"], a["v"]["b"], a["o"]["w"], a["o"]["b"],
                layer_cache["k"], layer_cache["v"], pos,
                heads=cfg.heads, eps=cfg.ln_eps, interpret=interpret)
            # the kernel already attended to k1/v1; persist the row here
            # (in-place dynamic_update_slice inside the decode loop)
            k = jax.lax.dynamic_update_slice(
                layer_cache["k"], k1[:, None, :], (0, pos, 0))
            v = jax.lax.dynamic_update_slice(
                layer_cache["v"], v1[:, None, :], (0, pos, 0))
            new_cache.append({"k": k, "v": v})
            x = x1[:, None, :]
        else:
            h = L.layer_norm(blk["self_ln"], x, cfg.ln_eps)
            # dense outputs ARE the merged-head layout: one update
            k1 = L.dense(blk["self_attn"]["k"], h)        # [B, 1, D]
            v1 = L.dense(blk["self_attn"]["v"], h)
            k = jax.lax.dynamic_update_slice(
                layer_cache["k"], k1.astype(layer_cache["k"].dtype),
                (0, pos, 0))
            v = jax.lax.dynamic_update_slice(
                layer_cache["v"], v1.astype(layer_cache["v"].dtype),
                (0, pos, 0))
            new_cache.append({"k": k, "v": v})
            q1 = L.dense(blk["self_attn"]["q"], h)[:, 0, :]
            attn = _self_attend_cached(q1, k, v, pos, cfg)
            x = x + L.dense(blk["self_attn"]["o"],
                            attn[:, None, :].astype(x.dtype))
        h = L.layer_norm(blk["cross_ln"], x, cfg.ln_eps)
        x = x + _cross_attend(blk, h, ckv_entry, cfg)
        if fused_layer and "w" in blk["mlp_in"]:
            from ..ops.decoder_block import fused_mlp_block
            x = fused_mlp_block(
                x[:, 0, :],
                blk["mlp_ln"]["scale"], blk["mlp_ln"]["bias"],
                blk["mlp_in"]["w"], blk["mlp_in"]["b"],
                blk["mlp_out"]["w"], blk["mlp_out"]["b"],
                eps=cfg.ln_eps,
                interpret=jax.devices()[0].platform != "tpu")[:, None, :]
        else:
            h = L.layer_norm(blk["mlp_ln"], x, cfg.ln_eps)
            x = x + L.dense(blk["mlp_out"],
                            L.gelu(L.dense(blk["mlp_in"], h)))
    x = L.layer_norm(dec["ln"], x, cfg.ln_eps)
    logits = _tied_logits(dec, x[:, 0, :])
    return logits, new_cache


# ------------------------------------------------- layer-scan decode (A/B)
def stack_decoder_blocks(params):
    """Stack the per-layer decoder block params into one pytree whose
    leaves carry a leading layer dim — the xs of ``decode_step_scan``'s
    ``lax.scan``. All decoder layers are shape-homogeneous, so this is a
    pure relayout."""
    blocks = params["decoder"]["blocks"]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)


def decode_step_scan(
    params, token: jnp.ndarray, pos: jnp.ndarray, cache, ckv,
    cfg: WhisperConfig, stacked_blocks=None, fused_layer: bool = False,
):
    """``decode_step`` with the layer loop as ``lax.scan`` over stacked
    per-layer params (round-3 verdict item 7 / ROADMAP 18 experiment).

    The traced-Python layer loop emits ~10 XLA ops per layer per step;
    for many-layer decoders (whisper-small: 12) the hypothesis is that
    per-op dispatch residue scales with layer count and a scanned body
    amortizes it. This variant keeps the math of the plain path
    (merged-head KV cache + single-query attentions) but runs ONE layer
    body under scan.

    cache: ``{"k": [L, B, total, D], "v": ...}`` (stacked layout, see
    ``init_cache_stacked``); ckv: ``(k_m [L, B, T, H*D], v_m ...)``
    stacked merged cross K/V. Returns (logits, new stacked cache).
    Numerics are identical to ``decode_step``'s plain path up to XLA
    reduction-order rounding (parity-tested exactly on CPU f32).
    """
    dec = params["decoder"]
    if stacked_blocks is None:
        stacked_blocks = stack_decoder_blocks(params)
    x = dec["embed_tokens"][token][:, None, :] \
        + jax.lax.dynamic_slice_in_dim(dec["positions"], pos, 1)[None]
    x = x.astype(cache["k"].dtype)
    ck_s, cv_s = ckv
    fused = fused_layer and x.shape[0] % 8 == 0
    interpret = jax.devices()[0].platform != "tpu"

    def layer(x, xs):
        blk, k_cache, v_cache, k_m, v_m = xs
        if fused:
            # same Pallas sub-block kernels as decode_step's fused_layer
            # loop — scan slices this layer's stacked weights per step,
            # so the A/B isolates the dispatch residue, not kernel choice
            from ..ops.decoder_block import fused_mlp_block, fused_self_block
            a = blk["self_attn"]
            x1, k1, v1 = fused_self_block(
                x[:, 0, :],
                blk["self_ln"]["scale"], blk["self_ln"]["bias"],
                a["q"]["w"], a["q"]["b"], a["k"]["w"],
                a["v"]["w"], a["v"]["b"], a["o"]["w"], a["o"]["b"],
                k_cache, v_cache, pos,
                heads=cfg.heads, eps=cfg.ln_eps, interpret=interpret)
            k = jax.lax.dynamic_update_slice(
                k_cache, k1[:, None, :], (0, pos, 0))
            v = jax.lax.dynamic_update_slice(
                v_cache, v1[:, None, :], (0, pos, 0))
            x = x1[:, None, :]
        else:
            h = L.layer_norm(blk["self_ln"], x, cfg.ln_eps)
            k1 = L.dense(blk["self_attn"]["k"], h)
            v1 = L.dense(blk["self_attn"]["v"], h)
            k = jax.lax.dynamic_update_slice(
                k_cache, k1.astype(k_cache.dtype), (0, pos, 0))
            v = jax.lax.dynamic_update_slice(
                v_cache, v1.astype(v_cache.dtype), (0, pos, 0))
            q1 = L.dense(blk["self_attn"]["q"], h)[:, 0, :]
            attn = _self_attend_cached(q1, k, v, pos, cfg)
            x = x + L.dense(blk["self_attn"]["o"],
                            attn[:, None, :].astype(x.dtype))
        h = L.layer_norm(blk["cross_ln"], x, cfg.ln_eps)
        x = x + _cross_attend(blk, h, (k_m, v_m), cfg)
        if fused and "w" in blk["mlp_in"]:
            from ..ops.decoder_block import fused_mlp_block
            x = fused_mlp_block(
                x[:, 0, :],
                blk["mlp_ln"]["scale"], blk["mlp_ln"]["bias"],
                blk["mlp_in"]["w"], blk["mlp_in"]["b"],
                blk["mlp_out"]["w"], blk["mlp_out"]["b"],
                eps=cfg.ln_eps, interpret=interpret)[:, None, :]
        else:
            h = L.layer_norm(blk["mlp_ln"], x, cfg.ln_eps)
            x = x + L.dense(blk["mlp_out"],
                            L.gelu(L.dense(blk["mlp_in"], h)))
        return x, (k, v)

    x, (ks, vs) = jax.lax.scan(
        layer, x, (stacked_blocks, cache["k"], cache["v"], ck_s, cv_s))
    x = L.layer_norm(dec["ln"], x, cfg.ln_eps)
    return _tied_logits(dec, x[:, 0, :]), {"k": ks, "v": vs}


def init_cache_stacked(cfg: WhisperConfig, batch: int, max_len: int,
                       dtype=jnp.float32):
    """Stacked-layout self-attention KV cache for ``decode_step_scan``:
    one [L, B, max_len, d_model] array per side instead of L dicts."""
    shape = (cfg.dec_layers, batch, max_len, cfg.d_model)
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def cross_kv_merged_stacked(params, enc_out: jnp.ndarray,
                            cfg: WhisperConfig):
    """Merged-head cross K/V stacked over layers: ``(k_m, v_m)`` each
    [L, B, T, H*D] — the xs layout of ``decode_step_scan``."""
    pairs = cross_kv_merged(params, enc_out, cfg)
    return (jnp.stack([k for k, _ in pairs]),
            jnp.stack([v for _, v in pairs]))


_WHISPER_LANG_CODES: tuple[str, ...] | None = None


def _language_codes() -> tuple[str, ...]:
    """Whisper's language-token ordering (public data; machine-extracted
    from the local transformers install, which carries openai/whisper's
    LANGUAGES table — token <|code|> = lang_en_id + index)."""
    global _WHISPER_LANG_CODES
    if _WHISPER_LANG_CODES is None:
        try:
            from transformers.models.whisper.tokenization_whisper import (
                LANGUAGES)
            _WHISPER_LANG_CODES = tuple(LANGUAGES.keys())
        except Exception:  # pragma: no cover - transformers always in image
            _WHISPER_LANG_CODES = ("en",)
    return _WHISPER_LANG_CODES


def language_token_id(cfg: WhisperConfig, language: str) -> int:
    """Token id of ``<|language|>``. Multilingual v1/v2 vocabs (51865)
    carry 99 language tokens; large-v3 (51866) adds a 100th (yue) and
    shifts the task ids — both layouts are offset-from-<|en|>."""
    if language == "en":
        return cfg.lang_en_id
    codes = _language_codes()
    n_langs = 100 if cfg.vocab_size >= 51866 else 99
    if language not in codes[:n_langs]:
        raise ValueError(
            f"unknown Whisper language {language!r} for vocab "
            f"{cfg.vocab_size} ({n_langs} languages)")
    return cfg.lang_en_id + codes.index(language)


def forced_prefix(cfg: WhisperConfig, task: str = "transcribe",
                  language: str = "en") -> list[int]:
    """Decoder prompt: <sot> <lang> <task> <notimestamps> — the ids the
    reference forces via generate kwargs language='en', task='transcribe'
    (audio_search.py:318-319); any of Whisper's languages and the
    translate task are selectable beyond that parity default.
    English-only checkpoints (vocab 51864) take no language/task tokens."""
    if cfg.vocab_size == 51864:  # *.en models
        return [cfg.bos_token_id, cfg.no_timestamps_id]
    if task == "transcribe":
        task_id = cfg.transcribe_id
    elif task == "translate":
        task_id = cfg.transcribe_id - 1  # <|translate|> precedes it
    else:
        raise ValueError(f"unknown Whisper task {task!r}")
    return [cfg.bos_token_id, language_token_id(cfg, language), task_id,
            cfg.no_timestamps_id]
