"""CLAP-style dual-tower audio/text embedding (historical v1 capability).

The reference's first iteration searched with laion/clap-htsat-(un)fused:
direct audio -> 512D and text -> 512D contrastive towers
(previous_iterations/streamlit_app_backup.py:22-35,598-638; 48 kHz audio,
10 s default chunks). This module supplies the TPU-native equivalent as a
framework component:

  * audio tower: log-mel -> patch embedding (conv) -> small pre-norm
    transformer -> attention-pooled 512D projection (a ViT-on-spectrogram,
    the same family as HTSAT but MXU-shaped rather than a Swin port),
  * text tower: the MiniLM backbone (models/minilm.py) + linear projection,
  * both L2-normalized into one space; trainable contrastively
    (training/finetune.py-style loop can be pointed at it).

This module is the lightweight *trainable* variant; weight parity with
laion's actual Swin + RoBERTa checkpoint lives in models/clap_htsat.py
(HTSAT-Swin + RoBERTa towers, checkpoint conversion, frontend parity).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from . import layers as L
from .minilm import MiniLMConfig, encode_tokens


@dataclass(frozen=True)
class ClapConfig:
    embed_dim: int = 512
    d_model: int = 256
    layers: int = 4
    heads: int = 4
    ffn: int = 1024
    n_mels: int = 80
    patch_frames: int = 10       # 10 mel frames per patch (100 ms)
    max_patches: int = 300       # 30 s / 100 ms
    ln_eps: float = 1e-5


def init_audio_tower(key, cfg: ClapConfig = ClapConfig()):
    ks = jax.random.split(key, cfg.layers + 4)
    d = cfg.d_model
    params = {
        "patch": L.init_dense(
            ks[0], cfg.n_mels * cfg.patch_frames, d),
        "positions": jax.random.normal(
            ks[1], (cfg.max_patches, d), jnp.float32) * 0.02,
        "blocks": [],
        "ln": L.init_layer_norm(d),
        "pool_q": jax.random.normal(ks[2], (1, d), jnp.float32) * 0.02,
        "proj": L.init_dense(ks[3], d, cfg.embed_dim),
    }
    for i in range(cfg.layers):
        k1, k2 = jax.random.split(ks[4 + i] if 4 + i < len(ks)
                                  else jax.random.fold_in(key, 100 + i), 2)
        params["blocks"].append({
            "self_attn": L.init_mha(k1, d),
            "self_ln": L.init_layer_norm(d),
            "mlp_in": L.init_dense(k2, d, cfg.ffn),
            "mlp_out": L.init_dense(jax.random.fold_in(k2, 1), cfg.ffn, d),
            "mlp_ln": L.init_layer_norm(d),
        })
    return params


def audio_embed(
    params, mel: jnp.ndarray, cfg: ClapConfig = ClapConfig()
) -> jnp.ndarray:
    """[B, n_mels, T] log-mel -> [B, embed_dim] unit-norm embeddings."""
    b, m, t = mel.shape
    pf = cfg.patch_frames
    n_patch = t // pf
    x = mel[:, :, : n_patch * pf].reshape(b, m, n_patch, pf)
    x = x.transpose(0, 2, 1, 3).reshape(b, n_patch, m * pf)
    x = L.dense(params["patch"], x)
    x = x + params["positions"][:n_patch][None].astype(x.dtype)
    for blk in params["blocks"]:
        h = L.layer_norm(blk["self_ln"], x, cfg.ln_eps)
        x = x + L.mha(blk["self_attn"], h, h, cfg.heads)
        h = L.layer_norm(blk["mlp_ln"], x, cfg.ln_eps)
        x = x + L.dense(blk["mlp_out"], L.gelu(L.dense(blk["mlp_in"], h)))
    x = L.layer_norm(params["ln"], x, cfg.ln_eps)
    # attention pooling with a learned query
    q = jnp.broadcast_to(
        params["pool_q"][None].astype(x.dtype), (b, 1, x.shape[-1]))
    w = jax.nn.softmax(jnp.einsum(
        "bqd,btd->bqt", q, x, preferred_element_type=jnp.float32), axis=-1)
    pooled = jnp.einsum("bqt,btd->bqd", w.astype(x.dtype), x)[:, 0]
    z = L.dense(params["proj"], pooled).astype(jnp.float32)
    return z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True),
                           1e-12)


def init_text_projection(key, text_cfg: MiniLMConfig,
                         cfg: ClapConfig = ClapConfig()):
    return L.init_dense(key, text_cfg.hidden, cfg.embed_dim)


def text_embed(
    bert_params, proj_params, input_ids, attention_mask,
    text_cfg: MiniLMConfig, cfg: ClapConfig = ClapConfig(),
) -> jnp.ndarray:
    """Text tower: MiniLM backbone -> mean pool -> 512D projection."""
    h = encode_tokens(bert_params, input_ids, attention_mask, text_cfg) \
        .astype(jnp.float32)
    m = attention_mask.astype(jnp.float32)[:, :, None]
    pooled = jnp.sum(h * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1e-9)
    z = L.dense(proj_params, pooled)
    return z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True),
                           1e-12)


def contrastive_loss(
    audio_z: jnp.ndarray, text_z: jnp.ndarray, temperature: float = 0.07
) -> jnp.ndarray:
    """Symmetric InfoNCE over a batch of (audio, text) pairs."""
    logits = audio_z @ text_z.T / temperature
    labels = jnp.arange(logits.shape[0])
    la = optax_softmax_ce(logits, labels)
    lt = optax_softmax_ce(logits.T, labels)
    return 0.5 * (la + lt)


def optax_softmax_ce(logits, labels):
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(logp[jnp.arange(logits.shape[0]), labels])
