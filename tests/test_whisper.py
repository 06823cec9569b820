import numpy as np
import pytest

from multimodal_audio_search_tpu.config import DecodeConfig
from multimodal_audio_search_tpu.models import generate as G
from multimodal_audio_search_tpu.models import whisper as W
from multimodal_audio_search_tpu.models.convert import (
    convert_whisper, whisper_config_from_hf)


@pytest.fixture(scope="module")
def torch_whisper():
    """Random-init torch WhisperForConditionalGeneration (offline oracle)."""
    import torch
    from transformers import WhisperConfig as HFWhisperConfig
    from transformers import WhisperForConditionalGeneration
    hf_cfg = HFWhisperConfig(
        vocab_size=150, d_model=64, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=128, decoder_ffn_dim=128, num_mel_bins=80,
        max_source_positions=60, max_target_positions=40,
        decoder_start_token_id=101, eos_token_id=102, pad_token_id=102,
        bos_token_id=102, suppress_tokens=[], begin_suppress_tokens=[],
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        use_cache=True)
    torch.manual_seed(1)
    model = WhisperForConditionalGeneration(hf_cfg).eval()
    cfg = whisper_config_from_hf(hf_cfg)
    params = convert_whisper(model.state_dict(), cfg)
    return model, cfg, params


def mel_input(rng, b, cfg):
    # encoder downsamples 2x: mel frames = 2 * max_source_positions
    return (rng.normal(size=(b, cfg.n_mels, 2 * cfg.enc_positions)) * 0.5) \
        .astype(np.float32)


def test_encoder_matches_torch(torch_whisper, rng):
    import torch
    model, cfg, params = torch_whisper
    mel = mel_input(rng, 2, cfg)
    with torch.no_grad():
        ref = model.model.encoder(torch.tensor(mel)).last_hidden_state \
            .numpy()
    got = np.asarray(W.encode(params, mel, cfg))
    np.testing.assert_allclose(got, ref, atol=3e-5, rtol=1e-4)


def test_decoder_teacher_forced_matches_torch(torch_whisper, rng):
    import torch
    model, cfg, params = torch_whisper
    mel = mel_input(rng, 2, cfg)
    dec_ids = rng.integers(0, cfg.vocab_size, size=(2, 9))
    dec_ids[:, 0] = cfg.bos_token_id
    with torch.no_grad():
        ref = model(
            input_features=torch.tensor(mel),
            decoder_input_ids=torch.tensor(dec_ids)).logits.numpy()
    enc = W.encode(params, mel, cfg)
    got = np.asarray(W.decode_train(params, enc, np.asarray(dec_ids), cfg))
    np.testing.assert_allclose(got, ref, atol=5e-5, rtol=1e-4)


def test_cached_decode_matches_teacher_forced(torch_whisper, rng):
    """KV-cached stepwise logits == full-sequence teacher-forced logits."""
    import jax.numpy as jnp
    _, cfg, params = torch_whisper
    mel = mel_input(rng, 2, cfg)
    enc = W.encode(params, mel, cfg)
    ids = rng.integers(0, cfg.vocab_size, size=(2, 7)).astype(np.int32)
    full = np.asarray(W.decode_train(params, enc, ids, cfg))
    ckv = W.cross_kv(params, enc, cfg)
    cache = W.init_cache(cfg, 2, 7, jnp.float32)
    step_logits = []
    for t in range(7):
        lg, cache = W.decode_step(
            params, jnp.asarray(ids[:, t]), jnp.int32(t), cache, ckv, cfg)
        step_logits.append(np.asarray(lg))
    stepped = np.stack(step_logits, axis=1)
    np.testing.assert_allclose(stepped, full, atol=2e-4, rtol=1e-4)


def test_greedy_generate_matches_hf(torch_whisper, rng):
    import torch
    model, cfg, params = torch_whisper
    mel = mel_input(rng, 3, cfg)
    max_new = 12
    with torch.no_grad():
        ref = model.generate(
            input_features=torch.tensor(mel), do_sample=False, num_beams=1,
            max_new_tokens=max_new, min_length=0).numpy()
    enc = W.encode(params, mel, cfg)
    prefix = np.full((3, 1), cfg.bos_token_id, np.int32)
    out = G.generate(
        params, enc, prefix, cfg=cfg, decode=DecodeConfig(method="greedy"),
        prefix_len=1, max_new_tokens=max_new)
    got = np.asarray(out.tokens)
    # HF Whisper generate strips the decoder-start token from its output
    gen = got[:, 1:]
    for b in range(3):
        n = min(ref.shape[1], gen.shape[1])
        np.testing.assert_array_equal(gen[b, :n], ref[b, :n])


def test_greedy_generate_with_processors_matches_hf(torch_whisper, rng):
    """repetition_penalty + no_repeat_ngram parity under greedy decode."""
    import torch
    model, cfg, params = torch_whisper
    mel = mel_input(rng, 2, cfg)
    max_new = 14
    with torch.no_grad():
        ref = model.generate(
            input_features=torch.tensor(mel), do_sample=False, num_beams=1,
            max_new_tokens=max_new, repetition_penalty=1.3,
            no_repeat_ngram_size=2, min_length=0).numpy()
    enc = W.encode(params, mel, cfg)
    prefix = np.full((2, 1), cfg.bos_token_id, np.int32)
    out = G.generate(
        params, enc, prefix, cfg=cfg,
        decode=DecodeConfig(method="greedy", repetition_penalty=1.3,
                            no_repeat_ngram_size=2),
        prefix_len=1, max_new_tokens=max_new)
    gen = np.asarray(out.tokens)[:, 1:]  # HF strips the decoder-start token
    for b in range(2):
        n = min(ref.shape[1], gen.shape[1])
        np.testing.assert_array_equal(gen[b, :n], ref[b, :n])


def test_logits_processor_parity_units(rng):
    """Unit parity of processors against transformers' implementations."""
    import torch
    from transformers import (
        NoRepeatNGramLogitsProcessor, RepetitionPenaltyLogitsProcessor)
    v, b, t = 37, 3, 11
    ids = rng.integers(0, v, size=(b, t))
    logits = rng.normal(size=(b, v)).astype(np.float32)

    ref = RepetitionPenaltyLogitsProcessor(1.25)(
        torch.tensor(ids), torch.tensor(logits)).numpy()
    got = np.asarray(G.apply_repetition_penalty(
        logits, np.asarray(ids), np.ones((b, t), bool), 1.25))
    np.testing.assert_allclose(got, ref, atol=1e-6)

    ref2 = NoRepeatNGramLogitsProcessor(2)(
        torch.tensor(ids), torch.tensor(logits)).numpy()
    got2 = np.asarray(G.ban_repeated_ngrams(
        logits, np.asarray(ids), np.full((b,), t), 2))
    # both use large negative bans; compare bans + untouched values
    np.testing.assert_array_equal(ref2 < -1e8, got2 < -1e8)
    keep = ref2 > -1e8
    np.testing.assert_allclose(got2[keep], ref2[keep], atol=1e-6)


def test_eos_early_stop_and_lengths(torch_whisper, rng):
    _, cfg, params = torch_whisper
    mel = mel_input(rng, 2, cfg)
    enc = W.encode(params, mel, cfg)
    prefix = np.full((2, 1), cfg.bos_token_id, np.int32)
    out = G.generate(
        params, enc, prefix, cfg=cfg, decode=DecodeConfig(method="greedy"),
        prefix_len=1, max_new_tokens=20)
    toks = np.asarray(out.tokens)
    lens = np.asarray(out.lengths)
    for b in range(2):
        gen = toks[b, 1:]
        if cfg.eos_token_id in gen.tolist():
            first = gen.tolist().index(cfg.eos_token_id)
            assert lens[b] == first + 1
            # everything after EOS is pad
            assert np.all(gen[first + 1:] == cfg.pad_token_id)
        else:
            assert lens[b] == 20


def test_forced_prefix_language_and_task():
    """Language/task-selectable decoder prompts (beyond the reference's
    hard-coded language='en', task='transcribe', audio_search.py:318)."""
    from transformers.models.whisper.tokenization_whisper import LANGUAGES

    codes = list(LANGUAGES.keys())
    cfg = W.PRESETS["base"]
    assert W.forced_prefix(cfg) == W.forced_prefix(
        cfg, task="transcribe", language="en")
    de = W.forced_prefix(cfg, language="de")
    assert de[1] == cfg.lang_en_id + codes.index("de")
    assert de[0] == cfg.bos_token_id and de[3] == cfg.no_timestamps_id
    tr = W.forced_prefix(cfg, task="translate", language="fr")
    assert tr[2] == cfg.transcribe_id - 1
    with pytest.raises(ValueError):
        W.forced_prefix(cfg, language="xx")
    with pytest.raises(ValueError):
        W.forced_prefix(cfg, task="caption")
    # v1/v2 vocab has 99 languages: yue only exists on large-v3
    with pytest.raises(ValueError):
        W.forced_prefix(cfg, language="yue")
    v3 = W.PRESETS["large-v3"]
    assert W.forced_prefix(v3, language="yue")[1] == \
        v3.lang_en_id + codes.index("yue")
    # English-only checkpoints take no language/task tokens at all
    en_cfg = W.PRESETS["base.en"] if "base.en" in W.PRESETS else None
    if en_cfg is not None:
        assert len(W.forced_prefix(en_cfg, language="de")) == 2


def test_sampling_distribution_matches_hf_at_reference_knobs(rng):
    """Distribution-level sampling parity (round-2 verdict item 9): the
    reference's PRODUCTION ASR decode is sampling at temperature 0.2 with
    repetition_penalty 1.05 and no_repeat_ngram_size 2
    (audio_search.py:316-327). Seed-free check: the full processed
    next-token probability VECTOR (penalty -> ngram ban -> temperature ->
    softmax) must equal HF's LogitsProcessorList + TemperatureLogitsWarper
    chain on identical raw logits and histories."""
    import jax
    import jax.numpy as jnp
    import torch
    from transformers import (
        LogitsProcessorList, NoRepeatNGramLogitsProcessor,
        RepetitionPenaltyLogitsProcessor, TemperatureLogitsWarper)
    from multimodal_audio_search_tpu.models.generate import (
        apply_repetition_penalty, ban_repeated_ngrams)

    B, V, L = 5, 64, 12
    temp, pen, n = 0.2, 1.05, 2
    logits = rng.normal(size=(B, V)).astype(np.float32) * 3.0
    # histories of different lengths, with planted repeats so both the
    # penalty and the 2-gram ban actually fire
    cur_len = np.array([3, 5, 8, 12, 4], np.int32)
    tokens = rng.integers(0, V, size=(B, L)).astype(np.int32)
    tokens[1, :5] = [7, 9, 7, 9, 7]        # 2-gram (7,9) must be banned
    tokens[2, :8] = [3, 3, 4, 5, 3, 4, 6, 3]

    # ours: the exact processing chain of models/generate.py::body
    valid = np.arange(L)[None, :] < cur_len[:, None]
    out = apply_repetition_penalty(
        jnp.asarray(logits), jnp.asarray(tokens), jnp.asarray(valid),
        pen)
    out = ban_repeated_ngrams(
        out, jnp.asarray(tokens), jnp.asarray(cur_len), n)
    ours = jax.nn.softmax(np.asarray(out) / temp, axis=-1)

    # HF: per-row (ragged histories), processors then warper then softmax
    procs = LogitsProcessorList([
        RepetitionPenaltyLogitsProcessor(pen),
        NoRepeatNGramLogitsProcessor(n)])
    warper = TemperatureLogitsWarper(temp)
    for i in range(B):
        ids = torch.tensor(tokens[None, i, :cur_len[i]].astype(np.int64))
        raw = torch.tensor(logits[None, i])
        hf = warper(ids, procs(ids, raw))
        hf_probs = torch.softmax(hf, dim=-1).numpy()[0]
        np.testing.assert_allclose(
            np.asarray(ours[i]), hf_probs, atol=1e-5,
            err_msg=f"row {i} (cur_len={cur_len[i]})")
