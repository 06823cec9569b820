"""Regression tests for the round-1 self-review findings."""
import numpy as np
import jax.numpy as jnp
import pytest


def test_no_eos_keeps_last_token():
    """texts_from_tokens must not truncate when decode hit max_new_tokens."""
    from multimodal_audio_search_tpu.models.tokenizer import (
        HashWordTokenizer)
    from multimodal_audio_search_tpu.pipelines.whisper_pipeline import (
        WhisperTextPipeline)
    from multimodal_audio_search_tpu.models import whisper as W
    cfg = W.WhisperConfig(
        vocab_size=128, d_model=32, enc_layers=1, dec_layers=1, heads=2,
        ffn=64, enc_positions=10, dec_positions=10,
        bos_token_id=100, eos_token_id=101, pad_token_id=101)
    pipe = WhisperTextPipeline(cfg=cfg, dtype=jnp.float32, name="t",
                               prefix_ids=[100])
    tok: HashWordTokenizer = pipe.tokenizer
    # no EOS: lengths == n generated; all 3 tokens must survive
    tokens = np.array([[100, 40, 41, 42]])
    [text] = pipe.texts_from_tokens(tokens, np.array([3]), 1)
    assert text == tok.decode([40, 41, 42]).strip()
    # with EOS: lengths includes it; decode skips it
    tokens = np.array([[100, 40, 41, 101]])
    [text] = pipe.texts_from_tokens(tokens, np.array([3]), 1)
    assert text == tok.decode([40, 41]).strip()


def test_cli_index_after_subcommand(tmp_path):
    from multimodal_audio_search_tpu.cli import main
    import multimodal_audio_search_tpu.cli as cli
    from unittest import mock
    captured = {}

    class FakeEngine:
        store = []
        def ingest_many(self, files, source_names=None):
            return []
        def save_index(self, path):
            captured["saved"] = path
    with mock.patch.object(cli, "_engine", lambda a: FakeEngine()):
        rc = main(["ingest", str(tmp_path / "x.wav"),
                   "--index", str(tmp_path / "idx")])
    assert rc == 0
    assert captured["saved"] == str(tmp_path / "idx")


def test_ngram_ban_n1_matches_hf(rng):
    import torch
    from transformers import NoRepeatNGramLogitsProcessor
    from multimodal_audio_search_tpu.models.generate import (
        ban_repeated_ngrams)
    v, b, t = 29, 2, 6
    ids = rng.integers(0, v, size=(b, t))
    logits = rng.normal(size=(b, v)).astype(np.float32)
    ref = NoRepeatNGramLogitsProcessor(1)(
        torch.tensor(ids), torch.tensor(logits)).numpy()
    got = np.asarray(ban_repeated_ngrams(
        jnp.asarray(logits), jnp.asarray(ids), jnp.full((b,), t), 1))
    np.testing.assert_array_equal(ref < -1e8, got < -1e8)


def test_pallas_scores_odd_n(rng):
    from multimodal_audio_search_tpu.index.fusion import fused_scores
    from multimodal_audio_search_tpu.ops.fused_search import (
        pallas_fused_scores)
    n, d = 1027, 64   # not divisible by 1024/128/8
    emb = rng.normal(size=(n, 2, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    ok = rng.random((n, 2)) > 0.3
    q = emb[n - 1, 0]  # the tail row must be scored
    ref, _ = fused_scores(jnp.asarray(q), jnp.asarray(emb), jnp.asarray(ok),
                          jnp.float32(0.5), jnp.float32(0.5), 0.1)
    got = pallas_fused_scores(
        jnp.asarray(q), jnp.asarray(emb), jnp.asarray(ok),
        jnp.float32(0.5), jnp.float32(0.5), threshold=0.1, interpret=True)
    assert got.shape == (n,)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_ingest_waveform_resamples_foreign_rate(rng):
    from multimodal_audio_search_tpu import EngineConfig
    from multimodal_audio_search_tpu.config import DecodeConfig, MelConfig
    from multimodal_audio_search_tpu.models import whisper as W
    from multimodal_audio_search_tpu.models.minilm import MiniLMConfig
    from multimodal_audio_search_tpu.pipelines.embed import TextEmbedder
    from multimodal_audio_search_tpu.pipelines.ingest import (
        DualPipelineIngest)
    from multimodal_audio_search_tpu.pipelines.whisper_pipeline import (
        WhisperTextPipeline)
    wcfg = W.WhisperConfig(
        vocab_size=128, d_model=32, enc_layers=1, dec_layers=1, heads=2,
        ffn=64, enc_positions=150, dec_positions=8,
        bos_token_id=100, eos_token_id=101, pad_token_id=101)
    mel = MelConfig(padded_seconds=3.0)
    cfg = EngineConfig(ingest_batch=4)
    ing = DualPipelineIngest(
        WhisperTextPipeline(cfg=wcfg, decode=DecodeConfig(max_new_tokens=2),
                            mel_cfg=mel, dtype=jnp.float32, name="asr"),
        WhisperTextPipeline(cfg=wcfg, decode=DecodeConfig(max_new_tokens=2),
                            mel_cfg=mel, dtype=jnp.float32, name="cap",
                            seed=1, prefix_ids=[100]),
        TextEmbedder(cfg=MiniLMConfig(vocab_size=256, hidden=64, layers=1,
                                      heads=2, intermediate=128)),
        cfg)
    # 44.1 kHz waveform: 13 s of audio -> one 10 s window + 3 s tail at 16 k
    wave = (rng.normal(size=int(44100 * 13)) * 0.3).astype(np.float32)
    segs = ing.process_waveform(wave, 44100, "hi-rate")
    times = [(s["start_time"], round(s["end_time"], 1)) for s in segs]
    for st, en in times:
        assert en <= 13.01  # timings in seconds of the original audio
    assert all(s["sample_rate"] == 16000 for s in segs)


def test_bridge_stats_not_trained(rng):
    import jax
    from multimodal_audio_search_tpu.models import bridge as B
    from multimodal_audio_search_tpu.training.bridge import (
        fit_feature_stats, train_bridge)
    feats = rng.normal(size=(64, 128)).astype(np.float32) * 3 + 1
    targets = rng.normal(size=(64, 384)).astype(np.float32)
    targets /= np.linalg.norm(targets, axis=-1, keepdims=True)
    params, _ = train_bridge(feats, targets, epochs=3, batch_size=32)
    fitted = fit_feature_stats(B.init_params(jax.random.PRNGKey(0)), feats)
    np.testing.assert_allclose(np.asarray(params["feat_mean"]),
                               np.asarray(fitted["feat_mean"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(params["feat_std"]),
                               np.asarray(fitted["feat_std"]), atol=1e-6)


def test_ingest_many_retry_and_skip(tmp_path, rng, monkeypatch):
    """Per-file failures are retried then skipped (or raised on demand)."""
    import jax.numpy as jnp
    from multimodal_audio_search_tpu import AudioSearchEngine, EngineConfig
    from multimodal_audio_search_tpu.audio.wav import write_wav
    from multimodal_audio_search_tpu.config import DecodeConfig, MelConfig
    from multimodal_audio_search_tpu.models import whisper as W
    from multimodal_audio_search_tpu.models.minilm import MiniLMConfig
    from multimodal_audio_search_tpu.pipelines.embed import TextEmbedder
    from multimodal_audio_search_tpu.pipelines.ingest import (
        DualPipelineIngest)
    from multimodal_audio_search_tpu.pipelines.whisper_pipeline import (
        WhisperTextPipeline)
    wcfg = W.WhisperConfig(
        vocab_size=128, d_model=32, enc_layers=1, dec_layers=1, heads=2,
        ffn=64, enc_positions=150, dec_positions=8,
        bos_token_id=100, eos_token_id=101, pad_token_id=101)
    mel = MelConfig(padded_seconds=3.0)
    cfg = EngineConfig(ingest_batch=4)
    eng = AudioSearchEngine(cfg=cfg, ingest_pipeline=DualPipelineIngest(
        WhisperTextPipeline(cfg=wcfg, decode=DecodeConfig(max_new_tokens=2),
                            mel_cfg=mel, dtype=jnp.float32, name="asr"),
        WhisperTextPipeline(cfg=wcfg, decode=DecodeConfig(max_new_tokens=2),
                            mel_cfg=mel, dtype=jnp.float32, name="cap",
                            seed=1, prefix_ids=[100]),
        TextEmbedder(cfg=MiniLMConfig(vocab_size=256, hidden=384, layers=1,
                                      heads=2, intermediate=128)),
        cfg))
    good = tmp_path / "ok.wav"
    write_wav(str(good), (rng.normal(size=16000 * 4) * 0.3)
              .astype(np.float32), 16000)
    bad = tmp_path / "bad.mp3"
    bad.write_bytes(b"ID3\x04garbage that is not decodable")

    segs = eng.ingest_many([str(bad), str(good)])
    assert len(eng.store) == len(segs)          # good file ingested
    errs = [e for e in eng.stats.log.events if e.operation == "ingest_error"]
    assert len(errs) == 1 and "bad.mp3" in errs[0].details["source"]

    with pytest.raises(ValueError):
        eng.ingest_many([str(bad)], on_error="raise")


# ---------------------------------------------------- round-2 advisor fixes

def test_mulaw_lut_index_rounds_to_nearest():
    """Round-2 advisor: the LUT index must round (not floor) onto the
    int16 grid, matching the closed form within one LSB symmetrically,
    and NaN samples must map to a defined (mid-scale) code."""
    from multimodal_audio_search_tpu.pipelines.ingest import _mulaw_lut
    lut = _mulaw_lut()
    # boundary-adjacent samples: w slightly below a grid midpoint must
    # round down, slightly above must round up
    grid = (np.arange(100, 130, dtype=np.float64) - 0.0)  # raw indices
    w_lo = ((grid - 0.49) - 32767.5) / 32767.5
    w_hi = ((grid + 0.49) - 32767.5) / 32767.5
    for w, expect in ((w_lo, grid), (w_hi, grid)):
        idx = np.clip(np.rint(np.nan_to_num(w) * 32767.5 + 32767.5),
                      0.0, 65535.0).astype(np.uint16)
        np.testing.assert_array_equal(idx, expect.astype(np.uint16))
    # closed-form parity on random waveforms: codes agree exactly when
    # the index is the nearest grid point
    rng = np.random.default_rng(0)
    w = rng.uniform(-1, 1, 4096)
    idx = np.clip(np.rint(w * 32767.5 + 32767.5), 0, 65535).astype(np.uint16)
    closed = np.round(
        np.sign(w) * np.log1p(255.0 * np.abs(w)) / np.log(256.0) * 127.0
    ).astype(np.int8)
    assert np.mean(lut[idx] == closed) > 0.999   # |diff| <= 1 only at grid
    assert np.max(np.abs(lut[idx].astype(int) - closed.astype(int))) <= 1
    # NaN: defined behavior (mid-scale silence), no undefined cast
    w = np.array([np.nan, -np.nan, 0.0])
    idx = np.clip(np.rint(np.nan_to_num(w) * 32767.5 + 32767.5),
                  0.0, 65535.0).astype(np.uint16)
    assert idx[0] == idx[1] == idx[2]


def test_ui_has_no_string_spliced_handlers():
    """Round-2 advisor: stored XSS via source names spliced into inline
    onclick handlers. The delete buttons must be built with DOM APIs and
    state-changing fetches must carry the API token header."""
    from multimodal_audio_search_tpu.service.server import _UI
    assert "delSource(\\'" not in _UI
    assert "onclick=\"delSource" not in _UI
    assert "addEventListener('click'" in _UI
    # every state-changing fetch sends the token header
    assert _UI.count("authHeaders()") >= 4
