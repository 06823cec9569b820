"""MPNet encoder parity vs a random-init torch MPNetModel oracle.

The reference's model dropdown offers all-mpnet-base-v2 as the 768D
alternative embedder (previous_iterations/clean_audio_search.py:32-47);
models/mpnet.py implements the real architecture (relative position
bias, RoBERTa position ids) rather than a BERT-shaped stand-in."""
import numpy as np
import pytest

from multimodal_audio_search_tpu.models import mpnet
from multimodal_audio_search_tpu.models.convert import (
    convert_mpnet, mpnet_config_from_hf)


def _make(hf_kwargs, seed=0):
    import torch
    from transformers import MPNetConfig, MPNetModel
    hf_cfg = MPNetConfig(
        attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0,
        **hf_kwargs)
    torch.manual_seed(seed)
    model = MPNetModel(hf_cfg).eval()
    cfg = mpnet_config_from_hf(hf_cfg)
    params = convert_mpnet(model.state_dict(), cfg)
    return model, cfg, params


@pytest.fixture(scope="module")
def small():
    return _make(dict(vocab_size=211, hidden_size=48, num_hidden_layers=3,
                      num_attention_heads=4, intermediate_size=96,
                      max_position_embeddings=64))


def _ids(rng, cfg, b, t):
    # avoid the pad id in content positions (it also drives position ids)
    ids = rng.integers(cfg.pad_token_id + 1, cfg.vocab_size, size=(b, t))
    return ids


def test_encoder_matches_torch(small, rng):
    import torch
    model, cfg, params = small
    ids = _ids(rng, cfg, 3, 17)
    mask = np.ones((3, 17), np.int64)
    mask[1, 9:] = 0
    mask[2, 4:] = 0
    ids[mask == 0] = cfg.pad_token_id   # HF position ids key off pad id
    with torch.no_grad():
        ref = model(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask)).last_hidden_state.numpy()
    got = np.asarray(mpnet.encode_tokens(
        params, np.asarray(ids), np.asarray(mask), cfg))
    for b in range(3):
        n = int(mask[b].sum())
        np.testing.assert_allclose(got[b, :n], ref[b, :n],
                                   atol=2e-5, rtol=1e-4)


def test_relative_bucket_matches_torch(small):
    import torch
    from transformers.models.mpnet.modeling_mpnet import MPNetEncoder
    t = 40
    rel = (torch.arange(t)[None, :] - torch.arange(t)[:, None])
    ref = MPNetEncoder.relative_position_bucket(
        rel, num_buckets=32, max_distance=128).numpy()
    got = np.asarray(mpnet._relative_position_bucket(
        np.asarray(rel.numpy()), 32, 128))
    np.testing.assert_array_equal(got, ref)


def test_sentence_embed_unit_norm(small, rng):
    _, cfg, params = small
    ids = _ids(rng, cfg, 2, 12)
    mask = np.ones((2, 12), np.int64)
    mask[1, 7:] = 0
    ids[mask == 0] = cfg.pad_token_id
    e = np.asarray(mpnet.sentence_embed(
        params, np.asarray(ids), np.asarray(mask), cfg))
    np.testing.assert_allclose(np.linalg.norm(e, axis=-1), 1.0, atol=1e-5)


def test_text_embedder_with_mpnet(small):
    from multimodal_audio_search_tpu.pipelines.embed import TextEmbedder
    _, cfg, params = small
    emb = TextEmbedder(params=params, cfg=cfg, model=mpnet)
    out = emb(["music with drums", "someone speaking"])
    assert out.shape == (2, cfg.hidden)
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0,
                               atol=1e-5)


def test_full_geometry_parity(rng):
    """all-mpnet-base-v2 geometry (768/12/12, vocab 30527, 514 pos)."""
    import torch
    model, cfg, params = _make(dict(max_position_embeddings=514))
    assert cfg.hidden == 768 and cfg.layers == 12
    ids = _ids(rng, cfg, 2, 24)
    mask = np.ones((2, 24), np.int64)
    mask[1, 15:] = 0
    ids[mask == 0] = cfg.pad_token_id
    with torch.no_grad():
        ref = model(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask)).last_hidden_state.numpy()
    got = np.asarray(mpnet.encode_tokens(
        params, np.asarray(ids), np.asarray(mask), cfg))
    for b in range(2):
        n = int(mask[b].sum())
        np.testing.assert_allclose(got[b, :n], ref[b, :n],
                                   atol=5e-5, rtol=1e-4)
