import numpy as np
import pytest

from multimodal_audio_search_tpu.models import minilm
from multimodal_audio_search_tpu.models.convert import (
    bert_config_from_hf, convert_bert)


@pytest.fixture(scope="module")
def torch_bert():
    """Random-init torch BertModel (offline oracle) + converted params."""
    import torch
    from transformers import BertConfig, BertModel
    hf_cfg = BertConfig(
        vocab_size=211, hidden_size=48, num_hidden_layers=3,
        num_attention_heads=4, intermediate_size=96,
        max_position_embeddings=64, hidden_act="gelu",
        attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0)
    torch.manual_seed(0)
    model = BertModel(hf_cfg).eval()
    cfg = bert_config_from_hf(hf_cfg)
    params = convert_bert(model.state_dict(), cfg)
    return model, cfg, params


def test_encoder_matches_torch(torch_bert, rng):
    import torch
    model, cfg, params = torch_bert
    ids = rng.integers(0, cfg.vocab_size, size=(3, 17))
    mask = np.ones((3, 17), np.int64)
    mask[1, 9:] = 0
    mask[2, 4:] = 0
    with torch.no_grad():
        ref = model(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask)).last_hidden_state.numpy()
    got = np.asarray(minilm.encode_tokens(
        params, np.asarray(ids), np.asarray(mask), cfg))
    # padded positions differ (torch still computes them); compare valid ones
    for b in range(3):
        n = int(mask[b].sum())
        np.testing.assert_allclose(got[b, :n], ref[b, :n],
                                   atol=2e-5, rtol=1e-4)


def test_sentence_embed_matches_st_pipeline(torch_bert, rng):
    """mean pooling + L2 norm == sentence-transformers' pipeline math."""
    import torch
    model, cfg, params = torch_bert
    ids = rng.integers(0, cfg.vocab_size, size=(2, 12))
    mask = np.ones((2, 12), np.int64)
    mask[1, 7:] = 0
    with torch.no_grad():
        h = model(input_ids=torch.tensor(ids),
                  attention_mask=torch.tensor(mask)).last_hidden_state
    m = torch.tensor(mask).unsqueeze(-1).float()
    pooled = (h * m).sum(1) / m.sum(1)
    ref = torch.nn.functional.normalize(pooled, dim=-1).numpy()
    got = np.asarray(minilm.sentence_embed(
        params, np.asarray(ids), np.asarray(mask), cfg))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.linalg.norm(got, axis=-1), 1.0, atol=1e-6)


def test_init_params_shapes():
    import jax
    cfg = minilm.MiniLMConfig(vocab_size=100, hidden=32, layers=2, heads=4,
                              intermediate=64)
    p = minilm.init_params(jax.random.PRNGKey(0), cfg)
    assert p["embeddings"]["word"].shape == (100, 32)
    assert len(p["blocks"]) == 2
    e = minilm.sentence_embed(
        p, np.zeros((1, 5), np.int32), np.ones((1, 5), np.int32), cfg)
    assert e.shape == (1, 32)


def test_distilbert_parity_and_projection(rng):
    """clip-ViT-B-32-multilingual-v1-shaped alternate (clean_audio_search
    .py:36): DistilBERT encoder parity vs torch + the 512D sentence
    projection head."""
    import jax
    import jax.numpy as jnp
    import torch
    from transformers import DistilBertConfig, DistilBertModel

    from multimodal_audio_search_tpu.models import layers as L
    from multimodal_audio_search_tpu.models.convert import (
        convert_distilbert, distilbert_config_from_hf)
    from multimodal_audio_search_tpu.models.minilm import (
        encode_tokens, mean_pool, sentence_projection)

    hf_cfg = DistilBertConfig(
        vocab_size=200, dim=48, n_layers=2, n_heads=4, hidden_dim=96,
        max_position_embeddings=40)
    torch.manual_seed(0)
    model = DistilBertModel(hf_cfg).eval()
    cfg = distilbert_config_from_hf(hf_cfg)
    params = convert_distilbert(model.state_dict(), cfg)

    ids = rng.integers(0, 200, size=(3, 11))
    mask = np.ones((3, 11), np.int64)
    mask[1, 7:] = 0
    with torch.inference_mode():
        want = model(torch.from_numpy(ids),
                     torch.from_numpy(mask)).last_hidden_state.numpy()
    got = np.asarray(encode_tokens(
        params, jnp.asarray(ids), jnp.asarray(mask), cfg))
    np.testing.assert_allclose(got[mask.astype(bool)],
                               want[mask.astype(bool)], atol=3e-5)

    # 512D projection head: unit-norm output, linear map verified by hand
    proj = L.init_dense(jax.random.PRNGKey(1), cfg.hidden, 16)
    pooled = mean_pool(jnp.asarray(got), jnp.asarray(mask))
    z = np.asarray(sentence_projection(proj, pooled))
    assert z.shape == (3, 16)
    np.testing.assert_allclose(np.linalg.norm(z, axis=-1), 1.0, atol=1e-5)
    byhand = np.asarray(pooled) @ np.asarray(proj["w"]) + np.asarray(
        proj["b"])
    byhand /= np.linalg.norm(byhand, axis=-1, keepdims=True)
    np.testing.assert_allclose(z, byhand, atol=1e-5)
