"""Bridge-network training: align DSP features to the text-embedding space.

Reference recipe (lightweight_audio_search.py:163-195): MSE loss between
bridge(audio_features) and the text embedding of the segment's transcript,
Adam lr 1e-3, 50 epochs. Batched, jitted, with feature standardization
fitted on the training set (streamlit_app_lightweight.py:171).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import MelConfig
from ..models import bridge as B
from ..ops.audio_features import audio_feature_vector


def fit_feature_stats(params, feats: np.ndarray):
    """Set standardization statistics from training features [N, 128]."""
    params = dict(params)
    params["feat_mean"] = jnp.asarray(feats.mean(axis=0), jnp.float32)
    std = feats.std(axis=0)
    params["feat_std"] = jnp.asarray(
        np.where(std > 1e-6, std, 1.0), jnp.float32)
    return params


def train_bridge(
    feats: np.ndarray,            # [N, 128] audio features
    targets: np.ndarray,          # [N, 384] unit-norm text embeddings
    cfg: B.BridgeConfig = B.BridgeConfig(),
    epochs: int = 50,             # lightweight_audio_search.py:183
    lr: float = 1e-3,             # lightweight_audio_search.py:181
    batch_size: int = 64,
    seed: int = 0,
):
    """Returns (params, per-epoch losses)."""
    key = jax.random.PRNGKey(seed)
    params = B.init_params(key, cfg)
    if cfg.standardize:
        params = fit_feature_stats(params, feats)
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @functools.partial(jax.jit, static_argnames=())
    def step(params, opt_state, xb, yb, rng):
        def loss_fn(p):
            pred = B.apply(p, xb, cfg, train=True, rng=rng)
            return jnp.mean(jnp.sum((pred - yb) ** 2, axis=-1))
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    n = len(feats)
    rng_np = np.random.default_rng(seed)
    losses = []
    for epoch in range(epochs):
        order = rng_np.permutation(n)
        ep = 0.0
        steps = 0
        for lo in range(0, n, batch_size):
            idx = order[lo: lo + batch_size]
            if len(idx) < batch_size:      # keep shapes static: reuse head
                idx = np.concatenate([idx, order[: batch_size - len(idx)]])
            key, sub = jax.random.split(key)
            params, opt_state, loss = step(
                params, opt_state,
                jnp.asarray(feats[idx]), jnp.asarray(targets[idx]), sub)
            ep += float(loss)
            steps += 1
        losses.append(ep / max(steps, 1))
    return params, losses


def features_for_waves(
    waves: np.ndarray, mel_cfg: MelConfig = MelConfig()
) -> np.ndarray:
    """[B, n_samples] padded waves -> [B, 128] features (host numpy)."""
    return np.asarray(audio_feature_vector(jnp.asarray(waves), mel_cfg))
