"""MPNet sentence encoder (all-mpnet-base-v2) in functional JAX.

The reference's model dropdown offers ``all-mpnet-base-v2`` as the 768D
alternative embedder (previous_iterations/clean_audio_search.py:32-47).
Unlike the BERT-shaped stand-in (``minilm.PRESETS["base768"]``), this is
the real MPNet architecture: RoBERTa-style position ids computed from
padding (padding_idx 1, no token types), and a T5-style relative position
bias — one shared ``Embedding(32, heads)`` table, bucketed bidirectionally
with max_distance 128 — added to every layer's attention scores. The bias
is computed ONCE per forward at trace time (static T) and broadcast into
the per-layer attention, so on TPU it fuses into the existing score
addition; everything else reuses the minilm/BERT layer stack.

Weight conversion from any HF MPNetModel checkpoint:
models/convert.py::convert_mpnet. Sentence-transformers semantics (mean
pooling + L2 norm) come from minilm.sentence_embed-equivalent
``sentence_embed`` here.
"""
from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from . import layers as L


@dataclass(frozen=True)
class MPNetConfig:
    vocab_size: int = 30527
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    intermediate: int = 3072
    max_positions: int = 514
    pad_token_id: int = 1          # also the padding_idx of the embeddings
    rel_buckets: int = 32
    rel_max_distance: int = 128
    ln_eps: float = 1e-5


PRESETS = {
    # sentence-transformers/all-mpnet-base-v2 geometry
    "base": MPNetConfig(),
}


def init_params(key, cfg: MPNetConfig = MPNetConfig()):
    keys = jax.random.split(key, cfg.layers + 3)
    emb = {
        "word": jax.random.normal(
            keys[0], (cfg.vocab_size, cfg.hidden), jnp.float32) * 0.02,
        "position": jax.random.normal(
            keys[1], (cfg.max_positions, cfg.hidden), jnp.float32) * 0.02,
        "ln": L.init_layer_norm(cfg.hidden),
    }
    rel_bias = jax.random.normal(
        keys[2], (cfg.rel_buckets, cfg.heads), jnp.float32) * 0.02
    blocks = []
    for i in range(cfg.layers):
        k1, k2, k3 = jax.random.split(keys[3 + i], 3)
        blocks.append({
            "attn": L.init_mha(k1, cfg.hidden),
            "attn_ln": L.init_layer_norm(cfg.hidden),
            "mlp_in": L.init_dense(k2, cfg.hidden, cfg.intermediate),
            "mlp_out": L.init_dense(k3, cfg.intermediate, cfg.hidden),
            "mlp_ln": L.init_layer_norm(cfg.hidden),
        })
    return {"embeddings": emb, "rel_bias": rel_bias, "blocks": blocks}


def _relative_position_bucket(rel_pos: jnp.ndarray, num_buckets: int,
                              max_distance: int) -> jnp.ndarray:
    """T5/MPNet bidirectional bucketing of ``memory_pos - context_pos``
    (transformers MPNetEncoder.relative_position_bucket semantics)."""
    n = -rel_pos
    num_buckets //= 2
    ret = (n < 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(n)
    max_exact = num_buckets // 2
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact)
        / math.log(max_distance / max_exact) * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(n < max_exact, n, val_if_large)


def position_bias(rel_bias: jnp.ndarray, t: int,
                  cfg: MPNetConfig) -> jnp.ndarray:
    """[1, H, T, T] additive attention bias shared by every layer."""
    ctx = jnp.arange(t)[:, None]
    mem = jnp.arange(t)[None, :]
    bucket = _relative_position_bucket(
        mem - ctx, cfg.rel_buckets, cfg.rel_max_distance)    # [T, T]
    values = rel_bias[bucket]                                # [T, T, H]
    return values.transpose(2, 0, 1)[None]                   # [1, H, T, T]


def _position_ids(input_ids: jnp.ndarray, pad_id: int) -> jnp.ndarray:
    """RoBERTa-style: consecutive ids starting at pad_id + 1 for non-pad
    tokens, pad_id at padding (create_position_ids_from_input_ids)."""
    mask = (input_ids != pad_id).astype(jnp.int32)
    return jnp.cumsum(mask, axis=1) * mask + pad_id


def encode_tokens(
    params, input_ids: jnp.ndarray, attention_mask: jnp.ndarray,
    cfg: MPNetConfig = MPNetConfig(),
) -> jnp.ndarray:
    """[B, T] ids + mask -> [B, T, H] hidden states."""
    emb = params["embeddings"]
    t = input_ids.shape[1]
    pos_ids = _position_ids(input_ids, cfg.pad_token_id)
    x = emb["word"][input_ids] + emb["position"][pos_ids]
    x = L.layer_norm(emb["ln"], x, cfg.ln_eps)
    bias = L.padding_bias(attention_mask) \
        + position_bias(params["rel_bias"], t, cfg).astype(jnp.float32)
    for blk in params["blocks"]:
        a = L.mha(blk["attn"], x, x, cfg.heads, bias)
        x = L.layer_norm(blk["attn_ln"], x + a, cfg.ln_eps)
        h = L.dense(blk["mlp_out"], L.gelu(L.dense(blk["mlp_in"], x)))
        x = L.layer_norm(blk["mlp_ln"], x + h, cfg.ln_eps)
    return x


def sentence_embed(
    params, input_ids: jnp.ndarray, attention_mask: jnp.ndarray,
    cfg: MPNetConfig = MPNetConfig(),
) -> jnp.ndarray:
    """[B, T] -> [B, H] unit-norm sentence embeddings (mean pool + L2),
    the sentence-transformers all-mpnet-base-v2 head."""
    h = encode_tokens(params, input_ids, attention_mask, cfg) \
        .astype(jnp.float32)
    m = attention_mask.astype(jnp.float32)[:, :, None]
    pooled = jnp.sum(h * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1e-9)
    return pooled / jnp.maximum(
        jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-12)
