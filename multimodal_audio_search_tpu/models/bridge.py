"""AudioToTextEmbeddingBridge — the lightweight trainable audio embedder.

The reference's only trainable component
(previous_iterations/lightweight_audio_search.py:26-45): an MLP mapping 128D
classic DSP features into the 384D MiniLM text-embedding space,
128 -> 256 -> 512 -> 384 with ReLU + dropout and a Tanh output, trained with
MSE/Adam (lr 1e-3, 50 epochs, lightweight_audio_search.py:163-195). The
Xavier-init + feature-standardization variant is
streamlit_app_lightweight.py:73-82,171. Implemented here as a pytree MLP
with an optax training loop (training/bridge.py).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from . import layers as L


@dataclass(frozen=True)
class BridgeConfig:
    in_dim: int = 128
    hidden: tuple = (256, 512)
    out_dim: int = 384
    dropout: float = 0.2
    xavier_init: bool = True      # streamlit_app_lightweight.py:73-82
    standardize: bool = True      # streamlit_app_lightweight.py:171


def init_params(key, cfg: BridgeConfig = BridgeConfig()):
    dims = (cfg.in_dim, *cfg.hidden, cfg.out_dim)
    params = {"layers": []}
    for i in range(len(dims) - 1):
        k = jax.random.fold_in(key, i)
        if cfg.xavier_init:
            std = float(jnp.sqrt(2.0 / (dims[i] + dims[i + 1])))
            w = jax.random.normal(k, (dims[i], dims[i + 1])) * std
        else:
            w = jax.random.normal(k, (dims[i], dims[i + 1])) * 0.02
        params["layers"].append(
            {"w": w.astype(jnp.float32),
             "b": jnp.zeros((dims[i + 1],), jnp.float32)})
    # running feature statistics for standardization
    params["feat_mean"] = jnp.zeros((cfg.in_dim,), jnp.float32)
    params["feat_std"] = jnp.ones((cfg.in_dim,), jnp.float32)
    return params


def apply(
    params, feats: jnp.ndarray, cfg: BridgeConfig = BridgeConfig(),
    *, train: bool = False, rng=None,
) -> jnp.ndarray:
    """[B, 128] features -> [B, 384] unit-norm bridge embeddings."""
    x = feats.astype(jnp.float32)
    if cfg.standardize:
        # fitted-then-fixed scaler (streamlit_app_lightweight.py:171):
        # stop_gradient keeps Adam from drifting the statistics
        mean = jax.lax.stop_gradient(params["feat_mean"])
        std = jax.lax.stop_gradient(params["feat_std"])
        x = (x - mean) / jnp.maximum(std, 1e-6)
    n = len(params["layers"])
    for i, lyr in enumerate(params["layers"]):
        x = L.dense(lyr, x)
        if i < n - 1:
            x = jax.nn.relu(x)
            if train and cfg.dropout > 0.0 and rng is not None:
                rng = jax.random.fold_in(rng, i)
                keep = jax.random.bernoulli(
                    rng, 1.0 - cfg.dropout, x.shape)
                x = jnp.where(keep, x / (1.0 - cfg.dropout), 0.0)
        else:
            x = jnp.tanh(x)
    return x / jnp.maximum(
        jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
