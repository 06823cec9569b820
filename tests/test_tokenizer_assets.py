"""Tokenizer asset builders (models/tokenizer.py, tools/build_tokenizer.py).

The reference received ready tokenizers from the HF hub
(audio_search.py:153,200); these tests prove a raw local checkpoint dir
(vocab.json+merges.txt or vocab.txt) becomes the production tokenizer
path with exact ids and lossless round-trips — the last plumbing between
"checkpoints arrive" and readable transcripts.
"""
import numpy as np
import pytest

from multimodal_audio_search_tpu.models.tokenizer import (
    HashWordTokenizer, HFTokenizerWrapper, load_tokenizer)

from tokenizer_fixture import (
    bytes_to_unicode, make_minilm_style_dir, make_whisper_style_dir)

pytest.importorskip("tokenizers")


def test_whisper_bpe_roundtrip_and_ids(tmp_path):
    d = make_whisper_style_dir(tmp_path)
    tok = load_tokenizer(d)
    assert isinstance(tok, HFTokenizerWrapper)
    ids, mask = tok.encode(["hello world"], max_len=16)
    assert mask[0].sum() == 2  # fully merged: 'hello' + 'Ġworld'
    assert tok.decode(ids[0][: mask[0].sum()]) == "hello world"
    # arbitrary ascii round-trips through byte fallback tokens
    s = "goodbye, cruel world!"
    ids, mask = tok.encode([s], max_len=64)
    assert tok.decode(ids[0][: mask[0].sum()]) == s

    # added specials land on their checkpoint ids and are skippable
    t = tok.tok
    base = 256 + 9  # byte alphabet + 9 merges
    assert t.token_to_id("<|endoftext|>") == base
    assert t.token_to_id("<|startoftranscript|>") == base + 1
    with_specials = [base + 1, base + 2] + list(ids[0][: mask[0].sum()]) \
        + [base]
    assert tok.decode(with_specials, skip_special_tokens=True) == s


def test_non_contiguous_added_tokens_rejected(tmp_path):
    import json
    d = make_whisper_style_dir(tmp_path)
    added = json.loads((d / "added_tokens.json").read_text())
    added["<|rogue|>"] = 9999  # gap -> ids would silently shift
    (d / "added_tokens.json").write_text(json.dumps(added))
    with pytest.raises(ValueError, match="non-contiguous"):
        load_tokenizer(d)


def test_minilm_wordpiece_roundtrip(tmp_path):
    d = make_minilm_style_dir(tmp_path)
    tok = load_tokenizer(d)
    assert isinstance(tok, HFTokenizerWrapper)
    ids, mask = tok.encode(["Hello world", "playing drums"], max_len=16)
    # [CLS] ... [SEP] template, lowercasing, ##-continuation merging
    assert ids[0][0] == 2 and ids[0][mask[0].sum() - 1] == 3
    assert tok.decode(ids[0][: mask[0].sum()]) == "hello world"
    assert tok.decode(ids[1][: mask[1].sum()]) == "playing drums"
    # unknown word -> [UNK], still decodes without crashing
    ids, mask = tok.encode(["zzz hello"], max_len=16)
    assert 1 in ids[0][: mask[0].sum()]  # [UNK]


def test_build_tool_writes_tokenizer_json(tmp_path):
    import tools.build_tokenizer as bt
    d = make_whisper_style_dir(tmp_path)
    msg = bt.build_dir(d)
    assert "wrote tokenizer.json" in msg
    assert (d / "tokenizer.json").exists()
    # second run is a no-op; the saved file loads identically
    assert "already present" in bt.build_dir(d)
    tok = load_tokenizer(d)
    ids, mask = tok.encode(["hello world"], max_len=8)
    assert tok.decode(ids[0][: mask[0].sum()]) == "hello world"


def test_weights_only_dir_falls_back_to_hash(tmp_path):
    (tmp_path / "weights.npz").write_bytes(b"x")
    tok = load_tokenizer(tmp_path, vocab_size=512)
    assert isinstance(tok, HashWordTokenizer)


def test_bytes_to_unicode_is_bijective():
    m = bytes_to_unicode()
    assert len(m) == 256 and len(set(m.values())) == 256
    assert m[ord("A")] == "A" and m[ord(" ")] != " "


def test_pipeline_tokenizer_kwargs_match_whisper_slot(tmp_path):
    """The exact load_tokenizer call make_default_ingest issues for a
    whisper slot with a weights_path resolves to the checkpoint assets
    (pipelines/ingest.py)."""
    from multimodal_audio_search_tpu.models import whisper as W
    d = make_whisper_style_dir(tmp_path)
    cfg = W.PRESETS["tiny"]
    tok = load_tokenizer(d, vocab_size=cfg.vocab_size, add_cls_sep=False,
                         pad_id=cfg.pad_token_id, eos_id=cfg.eos_token_id)
    assert isinstance(tok, HFTokenizerWrapper)
    ids, mask = tok.encode(["hello world"], max_len=8)
    assert tok.decode(ids[0][: mask[0].sum()]) == "hello world"
