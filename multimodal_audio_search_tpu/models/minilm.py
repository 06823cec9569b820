"""MiniLM sentence encoder (all-MiniLM-L6-v2) in functional JAX.

The reference's unified 384D embedding space comes from
sentence-transformers' all-MiniLM-L6-v2 (audio_search.py:92,153): a 6-layer
BERT encoder -> attention-masked mean pooling -> L2 normalization. This
implements that stack as a pure function over a param pytree; weights convert
from any HF BertModel checkpoint via models/convert.py.

Parity: post-layernorm BERT encoder (LN eps 1e-12), learned absolute
positions, token-type embeddings, erf-GELU. Output embeddings are unit-norm,
so index cosine == dot (index/fusion.py).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from . import layers as L


@dataclass(frozen=True)
class MiniLMConfig:
    vocab_size: int = 30522
    hidden: int = 384
    layers: int = 6
    heads: int = 12
    intermediate: int = 1536
    max_positions: int = 512
    type_vocab: int = 2
    ln_eps: float = 1e-12


PRESETS = {
    # all-MiniLM-L6-v2 (reference default, audio_search.py:92)
    "L6": MiniLMConfig(),
    # all-mpnet-base-v2-shaped alternative surface (clean_audio_search.py:32)
    "base768": MiniLMConfig(hidden=768, layers=12, heads=12,
                            intermediate=3072),
    # clip-ViT-B-32-multilingual-v1 text tower (clean_audio_search.py:36):
    # a 6-layer multilingual DistilBERT (no token-type embeddings) whose
    # mean-pooled output is projected to CLIP's 512D space (see
    # sentence_projection / convert_distilbert).
    "clip512_text": MiniLMConfig(vocab_size=119_547, hidden=768, layers=6,
                                 heads=12, intermediate=3072, type_vocab=0),
    # CI/dryrun preset: real architecture at toy dims (heads/hidden
    # divisible by model_parallel=2 for mesh tests)
    "test": MiniLMConfig(vocab_size=512, hidden=64, layers=2, heads=4,
                         intermediate=128),
}


def init_params(key, cfg: MiniLMConfig = MiniLMConfig()):
    keys = jax.random.split(key, cfg.layers + 4)
    emb = {
        "word": jax.random.normal(
            keys[0], (cfg.vocab_size, cfg.hidden), jnp.float32) * 0.02,
        "position": jax.random.normal(
            keys[1], (cfg.max_positions, cfg.hidden), jnp.float32) * 0.02,
        "token_type": jax.random.normal(
            keys[2], (cfg.type_vocab, cfg.hidden), jnp.float32) * 0.02,
        "ln": L.init_layer_norm(cfg.hidden),
    }
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
    return {"embeddings": emb, "blocks": blocks}


def encode_tokens(
    params, input_ids: jnp.ndarray, attention_mask: jnp.ndarray,
    cfg: MiniLMConfig = MiniLMConfig(),
) -> jnp.ndarray:
    """[B, T] ids + mask -> [B, T, H] hidden states (BERT encoder)."""
    emb = params["embeddings"]
    t = input_ids.shape[1]
    x = emb["word"][input_ids] + emb["position"][:t][None]
    if cfg.type_vocab:          # DistilBERT (type_vocab=0) has none
        x = x + emb["token_type"][0][None, None]
    x = L.layer_norm(emb["ln"], x, cfg.ln_eps)
    bias = L.padding_bias(attention_mask)
    for blk in params["blocks"]:
        a = L.mha(blk["attn"], x, x, cfg.heads, bias)
        x = L.layer_norm(blk["attn_ln"], x + a, cfg.ln_eps)
        h = L.dense(blk["mlp_out"], L.gelu(L.dense(blk["mlp_in"], x)))
        x = L.layer_norm(blk["mlp_ln"], x + h, cfg.ln_eps)
    return x


def sentence_embed(
    params, input_ids: jnp.ndarray, attention_mask: jnp.ndarray,
    cfg: MiniLMConfig = MiniLMConfig(),
) -> jnp.ndarray:
    """[B, T] -> [B, H] unit-norm sentence embeddings (mean pool + L2)."""
    h = encode_tokens(params, input_ids, attention_mask, cfg) \
        .astype(jnp.float32)
    m = attention_mask.astype(jnp.float32)[:, :, None]
    pooled = jnp.sum(h * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1e-9)
    return pooled / jnp.maximum(
        jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-12)


def sentence_projection(
    params, pooled: jnp.ndarray, tanh: bool = False
) -> jnp.ndarray:
    """sentence-transformers Dense head (e.g. the 768->512 CLIP projection
    of clip-ViT-B-32-multilingual-v1): linear (+optional tanh) + L2 norm.
    ``params`` is a models.layers dense pytree ({"w","b"})."""
    z = L.dense(params, pooled).astype(jnp.float32)
    if tanh:
        z = jnp.tanh(z)
    return z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True),
                           1e-12)


def mean_pool(h: jnp.ndarray, attention_mask: jnp.ndarray) -> jnp.ndarray:
    """Attention-masked mean pooling ([B,T,H], [B,T]) -> [B,H] float32."""
    m = attention_mask.astype(jnp.float32)[:, :, None]
    hf = h.astype(jnp.float32)
    return jnp.sum(hf * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1e-9)
