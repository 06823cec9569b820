import numpy as np
import jax.numpy as jnp
import pytest

from multimodal_audio_search_tpu.index.fusion import fused_scores
from multimodal_audio_search_tpu.ops.fused_search import (
    pallas_fused_scores)


@pytest.mark.parametrize("n,d", [(1024, 128), (2048, 384)])
def test_pallas_scores_match_xla(rng, n, d):
    emb = rng.normal(size=(n, 2, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    ok = rng.random((n, 2)) > 0.3
    q = emb[11, 0]
    ref, _ = fused_scores(
        jnp.asarray(q), jnp.asarray(emb), jnp.asarray(ok),
        jnp.float32(0.7), jnp.float32(0.3), 0.1)
    got = pallas_fused_scores(
        jnp.asarray(q), jnp.asarray(emb), jnp.asarray(ok),
        jnp.float32(0.7), jnp.float32(0.3),
        threshold=0.1, blk=256, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_pallas_scores_validity_rules(rng):
    d, n = 64, 256
    emb = np.zeros((n, 2, d), np.float32)
    ok = np.zeros((n, 2), bool)
    q = np.zeros(d, np.float32); q[0] = 1.0
    emb[0, 0, 0] = 1.0; ok[0, 0] = True          # valid, score 1.0
    emb[1, 0, 0] = 0.05; ok[1, 0] = True         # below threshold
    emb[2, 0, 0] = -1.0; ok[2, 0] = True         # negative sim
    emb[3, 0, 0] = 1.0                           # sim>0 but success False
    got = np.asarray(pallas_fused_scores(
        jnp.asarray(q), jnp.asarray(emb), jnp.asarray(ok),
        jnp.float32(0.5), jnp.float32(0.5),
        threshold=0.1, blk=128, interpret=True))
    assert got[0] == pytest.approx(1.0, abs=1e-6)
    assert got[1] < -1e29 and got[2] < -1e29 and got[3] < -1e29
    assert np.all(got[4:] < -1e29)
