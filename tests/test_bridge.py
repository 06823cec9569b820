import numpy as np
import jax
import jax.numpy as jnp

from multimodal_audio_search_tpu.config import MelConfig
from multimodal_audio_search_tpu.models import bridge as B
from multimodal_audio_search_tpu.ops.audio_features import (
    FEATURE_DIM, audio_feature_vector)
from multimodal_audio_search_tpu.training.bridge import train_bridge


def test_feature_vector_shapes_and_sanity(rng):
    cfg = MelConfig(padded_seconds=2.0)
    # tone vs noise must separate on spectral features
    t = np.arange(cfg.n_samples) / 16000
    tone = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    noise = (rng.normal(size=cfg.n_samples) * 0.3).astype(np.float32)
    f = np.asarray(audio_feature_vector(
        jnp.asarray(np.stack([tone, noise])), cfg))
    assert f.shape == (2, FEATURE_DIM)
    assert np.all(f[:, 17:] == 0)          # zero padding
    centroid_tone, centroid_noise = f[0, 13], f[1, 13]
    assert centroid_tone < centroid_noise  # 440 Hz tone is low-centroid
    zcr_tone, zcr_noise = f[0, 16], f[1, 16]
    assert zcr_tone < zcr_noise


def test_bridge_forward_unit_norm(rng):
    cfg = B.BridgeConfig()
    params = B.init_params(jax.random.PRNGKey(0), cfg)
    x = rng.normal(size=(4, 128)).astype(np.float32)
    y = np.asarray(B.apply(params, jnp.asarray(x), cfg))
    assert y.shape == (4, 384)
    np.testing.assert_allclose(np.linalg.norm(y, axis=-1), 1.0, atol=1e-5)
    # dropout only active in train mode with rng
    y2 = np.asarray(B.apply(params, jnp.asarray(x), cfg))
    np.testing.assert_allclose(y, y2)


def test_bridge_training_reduces_loss(rng):
    feats = rng.normal(size=(128, 128)).astype(np.float32)
    w = rng.normal(size=(128, 384)).astype(np.float32) * 0.1
    targets = feats @ w
    targets /= np.linalg.norm(targets, axis=-1, keepdims=True)
    params, losses = train_bridge(
        feats, targets, epochs=8, batch_size=32, seed=0)
    assert losses[-1] < losses[0] * 0.8
    pred = np.asarray(B.apply(params, jnp.asarray(feats[:8])))
    sims = np.sum(pred * targets[:8], axis=-1)
    assert np.mean(sims) > 0.3  # learned alignment beats random (~0)
