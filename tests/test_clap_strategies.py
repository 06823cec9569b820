import zlib

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multimodal_audio_search_tpu.index.strategies import (
    STRATEGIES, adaptive_weights, compare_all, run_strategy)
from multimodal_audio_search_tpu.index.analyzer import WeightAnalysis
from multimodal_audio_search_tpu.models import clap
from multimodal_audio_search_tpu.models.minilm import (
    MiniLMConfig, init_params as init_bert)


def test_audio_tower_shapes(rng):
    cfg = clap.ClapConfig(d_model=64, layers=2, heads=2, ffn=128)
    params = clap.init_audio_tower(jax.random.PRNGKey(0), cfg)
    mel = rng.normal(size=(3, 80, 300)).astype(np.float32)
    z = np.asarray(clap.audio_embed(params, jnp.asarray(mel), cfg))
    assert z.shape == (3, 512)
    np.testing.assert_allclose(np.linalg.norm(z, axis=-1), 1.0, atol=1e-5)


def test_text_tower_and_contrastive_loss(rng):
    tcfg = MiniLMConfig(vocab_size=100, hidden=32, layers=1, heads=2,
                        intermediate=64)
    ccfg = clap.ClapConfig(d_model=32, layers=1, heads=2, ffn=64)
    bert = init_bert(jax.random.PRNGKey(0), tcfg)
    proj = clap.init_text_projection(jax.random.PRNGKey(1), tcfg, ccfg)
    ids = rng.integers(0, 100, size=(4, 9))
    mask = np.ones((4, 9), np.int32)
    tz = clap.text_embed(bert, proj, jnp.asarray(ids), jnp.asarray(mask),
                         tcfg, ccfg)
    assert tz.shape == (4, 512)
    az = rng.normal(size=(4, 512)).astype(np.float32)
    az /= np.linalg.norm(az, axis=-1, keepdims=True)
    loss = clap.contrastive_loss(jnp.asarray(az), tz)
    assert np.isfinite(float(loss)) and float(loss) > 0


@pytest.fixture
def spaces(rng):
    n, dt, da = 50, 16, 24
    ti = rng.normal(size=(n, dt)); ti /= np.linalg.norm(ti, 1, keepdims=True)
    ai = rng.normal(size=(n, da)); ai /= np.linalg.norm(ai, 1, keepdims=True)
    return ti.astype(np.float32), ai.astype(np.float32)


def test_strategies_dispatch(spaces, rng):
    ti, ai = spaces
    tq, aq = ti[7], ai[7]
    for s in STRATEGIES:
        out = run_strategy(s, "drums and music", tq, aq, ti, ai, k=5)
        assert len(out["top"]) == 5
        assert out["info"]["strategy"] == s
    # audio_only must rank the matching audio row first
    out = run_strategy("audio_only", "x", tq, aq, ti, ai)
    assert out["top"][0] == 7

    all_out = compare_all("guitar solo", tq, aq, ti, ai, k=3)
    assert set(all_out) == set(STRATEGIES)

    with pytest.raises(ValueError):
        run_strategy("nope", "q", tq, aq, ti, ai)


def test_adaptive_weights_bounds():
    # strongly ASR-sided analysis
    w_asr, w_audio = adaptive_weights(WeightAnalysis(0.8, 0.2, "x"))
    assert 0.7 <= w_asr <= 0.9 and abs(w_asr + w_audio - 1) < 1e-9
    # strongly audio-sided
    w_asr, w_audio = adaptive_weights(WeightAnalysis(0.2, 0.8, "x"))
    assert 0.1 <= w_asr <= 0.3
    # balanced -> base weights
    w_asr, _ = adaptive_weights(WeightAnalysis(0.5, 0.5, "x"))
    assert w_asr == pytest.approx(0.7)  # ties go toward ASR base


def test_quality_adaptive_search(rng):
    from multimodal_audio_search_tpu.index.store import SegmentStore
    from multimodal_audio_search_tpu.index.strategies import (
        quality_adaptive_search)

    d = 16

    def embed(texts):
        out = np.zeros((len(texts), d), np.float32)
        for i, t in enumerate(texts):
            for w in t.lower().split():
                out[i, zlib.crc32(w.encode()) % d] += 1.0
            n = np.linalg.norm(out[i])
            if n:
                out[i] /= n
        return out

    store = SegmentStore(embed_dim=d, keep_audio=False)
    rows = [
        # long transcript -> ASR weight 0.7
        ("a very long transcript about the topic", "music playing"),
        # short transcript -> ASR weight 0.3
        ("hi", "music playing"),
        # caption only -> weight renormalizes to audio
        ("", "drums playing loudly"),
    ]
    for i, (a, c) in enumerate(rows):
        store.add({"segment_id": f"s{i}", "asr_text": a,
                   "audio_description": c},
                  embed([a])[0] if a else None,
                  embed([c])[0] if c else None)
    hits = quality_adaptive_search(store, embed, "long transcript topic")
    assert hits[0]["segment_id"] == "s0"
    assert hits[0]["asr_weight"] == pytest.approx(0.7)
    by_id = {h["segment_id"]: h for h in hits}
    if "s1" in by_id:
        assert by_id["s1"]["asr_weight"] == pytest.approx(0.3)
    if "s2" in by_id:
        assert by_id["s2"]["audio_weight"] == pytest.approx(1.0)
    # empty store
    assert quality_adaptive_search(
        SegmentStore(embed_dim=d), embed, "x") == []
