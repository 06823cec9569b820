"""Weights-day chain dry run (tools/weights_day.py).

Random-init torch models saved via save_pretrained stand in for real
checkpoints: the FULL chain — state-dict load, JAX conversion, tokenizer
build from raw assets, engine assembly from EngineConfig weight paths,
ingest + fused search — runs exactly as it will the day real weights
land (VERDICT round 1, item 10).
"""
import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from multimodal_audio_search_tpu.models import minilm as M
from multimodal_audio_search_tpu.models import whisper as W

from tokenizer_fixture import make_whisper_style_dir


@pytest.fixture()
def standins(tmp_path):
    """Save random-init HF checkpoints at toy shapes + tokenizer assets,
    and register matching presets so the production EngineConfig path
    resolves them by name."""
    from transformers import (
        BertConfig, BertModel, WhisperConfig, WhisperForConditionalGeneration)
    torch.manual_seed(0)

    wcfg_hf = WhisperConfig(
        vocab_size=256, d_model=32, encoder_layers=1, decoder_layers=1,
        encoder_attention_heads=2, decoder_attention_heads=2,
        encoder_ffn_dim=64, decoder_ffn_dim=64,
        max_source_positions=500, max_target_positions=24,
        num_mel_bins=80, bos_token_id=250, eos_token_id=251,
        pad_token_id=251, decoder_start_token_id=250)
    ours_w = W.WhisperConfig(
        vocab_size=256, d_model=32, enc_layers=1, dec_layers=1, heads=2,
        ffn=64, enc_positions=500, dec_positions=24,
        bos_token_id=250, eos_token_id=251, pad_token_id=251)
    for name in ("wd-asr", "wd-cap"):
        W.PRESETS[name] = ours_w
    asr_dir = tmp_path / "asr"
    cap_dir = tmp_path / "cap"
    WhisperForConditionalGeneration(wcfg_hf).save_pretrained(asr_dir)
    WhisperForConditionalGeneration(wcfg_hf).save_pretrained(cap_dir)
    # raw tokenizer assets next to the weights (builder reconstructs BPE)
    tok_src = make_whisper_style_dir(tmp_path)
    for d in (asr_dir, cap_dir):
        for f in ("vocab.json", "merges.txt", "added_tokens.json"):
            (d / f).write_text((tok_src / f).read_text())

    bcfg_hf = BertConfig(
        vocab_size=64, hidden_size=32, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=64,
        attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0)
    M.PRESETS["wd-mini"] = M.MiniLMConfig(
        vocab_size=64, hidden=32, layers=1, heads=2, intermediate=64)
    mini_dir = tmp_path / "mini"
    BertModel(bcfg_hf).save_pretrained(mini_dir)

    yield {"asr": str(asr_dir), "cap": str(cap_dir),
           "mini": str(mini_dir), "tmp": tmp_path}
    for name in ("wd-asr", "wd-cap"):
        W.PRESETS.pop(name, None)
    M.PRESETS.pop("wd-mini", None)


def test_weights_day_dry_run_chain(standins, monkeypatch):
    import tools.weights_day as wd
    monkeypatch.chdir(standins["tmp"])
    report = wd.run(
        standins["asr"], standins["cap"], standins["mini"],
        dry_run=True, asr_preset="wd-asr", caption_preset="wd-cap",
        minilm_preset="wd-mini", embed_dim=32,
        short_context=True, smoke_max_new=6,
        out=str(standins["tmp"] / "report.json"))

    conv = report["steps"]["convert"]
    assert conv["ok"]
    # converted param counts match freshly-initialized pytrees exactly
    import jax
    want_w = wd.n_params(W.init_params(jax.random.PRNGKey(0),
                                       W.PRESETS["wd-asr"]))
    assert conv["whisper_base"]["params"] == want_w
    assert conv["captioner"]["params"] == want_w

    toks = report["steps"]["tokenize"]
    assert toks["whisper_base"]["real"] and toks["captioner"]["real"]
    assert toks["minilm"]["real"] is False  # no vocab assets -> hash

    smoke = report["steps"]["smoke"]
    # random-init weights + a real BPE decode to byte garbage, which the
    # validators (correctly) reject — survivorship isn't asserted, the
    # chain executing end-to-end is
    assert smoke["ok"] and smoke["segments"] >= 0 and "hits" in smoke
    assert report["steps"]["parity"] == "skipped (--dry-run)"
    # report persisted
    with open(standins["tmp"] / "report.json") as f:
        assert json.load(f)["steps"]["smoke"]["ok"]
