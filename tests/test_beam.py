import numpy as np
import pytest

from multimodal_audio_search_tpu.config import DecodeConfig
from multimodal_audio_search_tpu.models import whisper as W
from multimodal_audio_search_tpu.models.beam import beam_generate
from multimodal_audio_search_tpu.models.convert import (
    convert_whisper, whisper_config_from_hf)


@pytest.fixture(scope="module")
def torch_whisper():
    import torch
    from transformers import WhisperConfig as HFC
    from transformers import WhisperForConditionalGeneration
    hf_cfg = HFC(
        vocab_size=120, d_model=48, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=96, decoder_ffn_dim=96, num_mel_bins=80,
        max_source_positions=40, max_target_positions=48,
        decoder_start_token_id=100, eos_token_id=101, pad_token_id=101,
        bos_token_id=101, suppress_tokens=[], begin_suppress_tokens=[],
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0)
    torch.manual_seed(7)
    model = WhisperForConditionalGeneration(hf_cfg).eval()
    cfg = whisper_config_from_hf(hf_cfg)
    params = convert_whisper(model.state_dict(), cfg)
    return model, cfg, params


@pytest.mark.parametrize("kwargs", [
    dict(num_beams=2),
    dict(num_beams=2, repetition_penalty=1.3, no_repeat_ngram_size=3),
    dict(num_beams=4, length_penalty=0.8),
])
def test_beam_matches_hf(torch_whisper, rng, kwargs):
    import torch
    model, cfg, params = torch_whisper
    b, max_new = 3, 14
    mel = (rng.normal(size=(b, 80, 80)) * 0.5).astype(np.float32)
    with torch.no_grad():
        ref = model.generate(
            input_features=torch.tensor(mel), do_sample=False,
            max_new_tokens=max_new, early_stopping=True, min_length=0,
            **kwargs).numpy()
    enc = W.encode(params, mel, cfg)
    prefix = np.full((b, 1), cfg.bos_token_id, np.int32)
    out = beam_generate(
        params, enc, prefix, cfg=cfg,
        decode=DecodeConfig(
            method="beam",
            repetition_penalty=kwargs.get("repetition_penalty", 1.0),
            no_repeat_ngram_size=kwargs.get("no_repeat_ngram_size", 0),
            length_penalty=kwargs.get("length_penalty", 1.0),
            early_stopping=True),
        prefix_len=1, max_new_tokens=max_new,
        num_beams=kwargs["num_beams"])
    got = np.asarray(out.tokens)[:, 1:]  # HF strips decoder-start
    for i in range(b):
        n = min(ref.shape[1], got.shape[1])
        np.testing.assert_array_equal(got[i, :n], ref[i, :n],
                                      err_msg=f"row {i} kwargs {kwargs}")
