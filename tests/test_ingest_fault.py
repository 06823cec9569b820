"""Fault injection for batch-level ingest retry (SURVEY §5: add
ingest-job retry on top of the reference's graceful degradation,
audio_search.py:346-350 — whose semantics must stay intact)."""
import numpy as np
import jax.numpy as jnp
import pytest

from multimodal_audio_search_tpu import EngineConfig
from multimodal_audio_search_tpu.config import DecodeConfig, MelConfig
from multimodal_audio_search_tpu.models import whisper as W
from multimodal_audio_search_tpu.models.minilm import MiniLMConfig
from multimodal_audio_search_tpu.pipelines.embed import TextEmbedder
from multimodal_audio_search_tpu.pipelines.ingest import DualPipelineIngest
from multimodal_audio_search_tpu.pipelines.whisper_pipeline import (
    WhisperTextPipeline)
from multimodal_audio_search_tpu.service.stats import StatsRegistry


@pytest.fixture()
def ingest():
    wcfg = W.PRESETS["test"]
    mel = MelConfig(padded_seconds=2.0)
    d = DecodeConfig(max_new_tokens=3)
    cfg = EngineConfig(ingest_batch=4)
    stats = StatsRegistry()
    return DualPipelineIngest(
        WhisperTextPipeline(cfg=wcfg, decode=d, mel_cfg=mel,
                            dtype=jnp.float32, name="asr"),
        WhisperTextPipeline(cfg=wcfg, decode=d, mel_cfg=mel,
                            dtype=jnp.float32, name="caption", seed=1,
                            prefix_ids=[wcfg.bos_token_id]),
        TextEmbedder(cfg=MiniLMConfig(vocab_size=512, hidden=64, layers=1,
                                      heads=2, intermediate=128)),
        cfg, stats)


def _wave(seconds=9.0):
    rng = np.random.default_rng(3)
    return (rng.normal(size=int(16000 * seconds)) * 0.3).astype(np.float32)


def test_transient_failure_retries_and_lands(ingest, monkeypatch):
    """Kill the first batch drain once: the batch must land on retry and
    the retry must be visible in the metrics log."""
    ref = ingest.process_waveform(_wave(), 16000, "ok")
    assert len(ref) > 0

    calls = {"n": 0}
    orig = ingest.asr.texts_from_tokens

    def flaky(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected device failure")
        return orig(*a, **kw)

    monkeypatch.setattr(ingest.asr, "texts_from_tokens", flaky)
    segs = ingest.process_waveform(_wave(), 16000, "flaky")
    assert [s["asr_text"] for s in segs] == [s["asr_text"] for s in ref]
    assert [s["audio_description"] for s in segs] == \
        [s["audio_description"] for s in ref]
    retries = [e for e in ingest.stats.log.events
               if e.operation == "ingest_batch_retry"]
    assert len(retries) == 1
    assert not [e for e in ingest.stats.log.events
                if e.operation == "ingest_batch_failed"]


def test_persistent_failure_degrades_batch_only(ingest, monkeypatch):
    """A batch that fails retry too is dropped (both pipelines fail ->
    keep-if-either discards its segments), later waveforms unaffected."""
    monkeypatch.setattr(
        ingest.asr, "texts_from_tokens",
        lambda *a, **kw: (_ for _ in ()).throw(RuntimeError("dead")))
    segs = ingest.process_waveform(_wave(), 16000, "dead")
    assert segs == []
    failed = [e for e in ingest.stats.log.events
              if e.operation == "ingest_batch_failed"]
    assert len(failed) == 1
    monkeypatch.undo()
    segs = ingest.process_waveform(_wave(), 16000, "alive")
    assert len(segs) > 0
