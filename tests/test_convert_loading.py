import numpy as np
import pytest

from multimodal_audio_search_tpu.models.convert import (
    load_state_dict_from_dir)


def test_load_torch_bin(tmp_path):
    import torch
    sd = {"a.weight": torch.randn(3, 4), "a.bias": torch.randn(4)}
    torch.save(sd, tmp_path / "pytorch_model.bin")
    got = load_state_dict_from_dir(str(tmp_path))
    assert set(got) == {"a.weight", "a.bias"}
    np.testing.assert_allclose(got["a.weight"].numpy(),
                               sd["a.weight"].numpy())


def test_load_safetensors(tmp_path):
    st = pytest.importorskip("safetensors.numpy")
    st.save_file({"x": np.ones((2, 2), np.float32)},
                 str(tmp_path / "model.safetensors"))
    got = load_state_dict_from_dir(str(tmp_path))
    np.testing.assert_allclose(got["x"], np.ones((2, 2)))


def test_load_missing_dir(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_state_dict_from_dir(str(tmp_path / "nope"))


def test_sentence_transformers_prefix_stripping(rng):
    """ST checkpoints prefix weights with '0.auto_model.' — conversion must
    accept them (the reference's embedder ships that way)."""
    import torch
    from transformers import BertConfig, BertModel
    from multimodal_audio_search_tpu.models.convert import (
        bert_config_from_hf, convert_bert)
    from multimodal_audio_search_tpu.models import minilm
    hf_cfg = BertConfig(
        vocab_size=64, hidden_size=32, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=64,
        attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0)
    torch.manual_seed(0)
    model = BertModel(hf_cfg).eval()
    cfg = bert_config_from_hf(hf_cfg)
    prefixed = {f"0.auto_model.{k}": v for k, v in
                model.state_dict().items()}
    params = convert_bert(prefixed, cfg)
    ids = rng.integers(0, 64, size=(1, 6))
    mask = np.ones((1, 6), np.int64)
    got = np.asarray(minilm.encode_tokens(params, ids, mask, cfg))
    import torch as T
    with T.no_grad():
        ref = model(input_ids=T.tensor(ids),
                    attention_mask=T.tensor(mask)).last_hidden_state.numpy()
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)
