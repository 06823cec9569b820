import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P, NamedSharding

from multimodal_audio_search_tpu.config import DecodeConfig
from multimodal_audio_search_tpu.models import whisper as W
from multimodal_audio_search_tpu.models.generate import generate
from multimodal_audio_search_tpu.parallel.mesh import make_mesh


def tiny():
    cfg = W.WhisperConfig(
        vocab_size=96, d_model=32, enc_layers=1, dec_layers=1, heads=2,
        ffn=64, enc_positions=20, dec_positions=20,
        bos_token_id=90, eos_token_id=91, pad_token_id=91)
    return cfg, W.init_params(jax.random.PRNGKey(0), cfg)


def test_sampling_temperature_behavior(rng):
    """temp->0 sampling converges to greedy; temp>0 varies across seeds."""
    cfg, params = tiny()
    mel = (rng.normal(size=(2, 80, 40)) * 0.5).astype(np.float32)
    enc = W.encode(params, mel, cfg)
    prefix = np.full((2, 1), cfg.bos_token_id, np.int32)

    greedy = generate(params, enc, prefix, cfg=cfg,
                      decode=DecodeConfig(method="greedy"),
                      prefix_len=1, max_new_tokens=8)
    cold = generate(params, enc, prefix, cfg=cfg,
                    decode=DecodeConfig(method="sample", temperature=1e-4),
                    prefix_len=1, max_new_tokens=8,
                    rng=jax.random.PRNGKey(7))
    np.testing.assert_array_equal(np.asarray(greedy.tokens),
                                  np.asarray(cold.tokens))

    hot = [np.asarray(generate(
        params, enc, prefix, cfg=cfg,
        decode=DecodeConfig(method="sample", temperature=2.0),
        prefix_len=1, max_new_tokens=8,
        rng=jax.random.PRNGKey(s)).tokens) for s in range(3)]
    assert not all(np.array_equal(hot[0], h) for h in hot[1:])


def test_sampling_parity_mode_runs_reference_asr_knobs(rng):
    """ASR parity knobs (audio_search.py:316-327) execute end to end."""
    from multimodal_audio_search_tpu.config import asr_parity_decode
    cfg, params = tiny()
    mel = (rng.normal(size=(1, 80, 40)) * 0.5).astype(np.float32)
    enc = W.encode(params, mel, cfg)
    prefix = np.full((1, 1), cfg.bos_token_id, np.int32)
    d = asr_parity_decode()
    out = generate(params, enc, prefix, cfg=cfg,
                   decode=DecodeConfig(
                       method="sample", temperature=d.temperature,
                       repetition_penalty=d.repetition_penalty,
                       no_repeat_ngram_size=d.no_repeat_ngram_size),
                   prefix_len=1, max_new_tokens=10,
                   rng=jax.random.PRNGKey(0))
    toks = np.asarray(out.tokens)[0, 1:]
    # no immediate 2-gram repeats (the ngram ban is live)
    pairs = set()
    prev = None
    for t in toks:
        if prev is not None:
            assert (prev, t) not in pairs
            pairs.add((prev, t))
        prev = t


def test_data_sharded_batch_inference(rng):
    """Batch-sharded encode+generate over the 8-device mesh: the serving
    data-parallel path (params replicated, batch split over 'data')."""
    cfg, params = tiny()
    mesh = make_mesh(8, model_parallel=1)
    b = 16
    mel = (rng.normal(size=(b, 80, 40)) * 0.5).astype(np.float32)
    prefix = np.full((b, 1), cfg.bos_token_id, np.int32)

    ref = generate(params, W.encode(params, mel, cfg), prefix, cfg=cfg,
                   decode=DecodeConfig(method="greedy"),
                   prefix_len=1, max_new_tokens=6)

    batch_sharding = NamedSharding(mesh, P("data"))
    mel_s = jax.device_put(mel, batch_sharding)
    prefix_s = jax.device_put(prefix, batch_sharding)
    params_r = jax.device_put(params, NamedSharding(mesh, P()))
    with mesh:
        enc = W.encode(params_r, mel_s, cfg)
        out = generate(params_r, enc, prefix_s, cfg=cfg,
                       decode=DecodeConfig(method="greedy"),
                       prefix_len=1, max_new_tokens=6)
    np.testing.assert_array_equal(np.asarray(out.tokens),
                                  np.asarray(ref.tokens))


def test_en_presets_prefix():
    en = W.PRESETS["base.en"]
    assert en.vocab_size == 51864
    assert W.forced_prefix(en) == [en.bos_token_id, en.no_timestamps_id]
    multi = W.PRESETS["base"]
    assert len(W.forced_prefix(multi)) == 4
