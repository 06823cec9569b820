"""Streaming ingest (pipelines/streaming.py + /api/stream endpoints).

The key property: a stream fed in ARBITRARY chunk sizes commits exactly
the segments the one-shot batch path produces on the concatenated audio
(same windows, same texts, same embeddings), with segments searchable as
soon as their window completes.
"""
import json
import threading
import urllib.request

import numpy as np
import pytest

import jax.numpy as jnp

from multimodal_audio_search_tpu import AudioSearchEngine, EngineConfig
from multimodal_audio_search_tpu.config import DecodeConfig, MelConfig
from multimodal_audio_search_tpu.index.store import SegmentStore
from multimodal_audio_search_tpu.models import whisper as W
from multimodal_audio_search_tpu.models.minilm import MiniLMConfig
from multimodal_audio_search_tpu.pipelines.embed import TextEmbedder
from multimodal_audio_search_tpu.pipelines.ingest import DualPipelineIngest
from multimodal_audio_search_tpu.pipelines.streaming import StreamingIngest
from multimodal_audio_search_tpu.pipelines.whisper_pipeline import (
    WhisperTextPipeline)


def tiny_pipeline(cfg):
    wcfg = W.WhisperConfig(
        vocab_size=128, d_model=32, enc_layers=1, dec_layers=1, heads=2,
        ffn=64, enc_positions=150, dec_positions=16,
        bos_token_id=100, eos_token_id=101, pad_token_id=101)
    mel = MelConfig(padded_seconds=3.0)
    decode = DecodeConfig(max_new_tokens=4)
    asr = WhisperTextPipeline(cfg=wcfg, decode=decode, mel_cfg=mel,
                              dtype=jnp.float32, name="asr")
    cap = WhisperTextPipeline(cfg=wcfg, decode=decode, mel_cfg=mel,
                              dtype=jnp.float32, name="caption",
                              prefix_ids=[wcfg.bos_token_id], seed=1)
    emb = TextEmbedder(cfg=MiniLMConfig(vocab_size=512, hidden=64,
                                        layers=1, heads=2,
                                        intermediate=128))
    return DualPipelineIngest(asr, cap, emb, cfg)


@pytest.fixture(scope="module")
def cfg():
    # 3 s segments keep the tiny models' 3 s mel context exact
    base = EngineConfig(ingest_batch=4, embed_dim=64)
    import dataclasses
    return base.replace(segment=dataclasses.replace(
        base.segment, segment_seconds=3.0, min_segment_seconds=1.0))


def test_stream_matches_one_shot(cfg, rng):
    sr = 16000
    # mid-range amplitude: neither path triggers peak normalization
    wave = (rng.normal(size=int(sr * 10.3)) * 0.1).astype(np.float32)
    wave = np.clip(wave, -0.9, 0.9)

    pipe = tiny_pipeline(cfg)
    ref = pipe.process_waveform(wave[: 3 * int(sr * 3)], sr, "stream")

    pipe2 = tiny_pipeline(cfg)
    store = SegmentStore(embed_dim=64)
    s = StreamingIngest(pipe2, store, cfg, source_name="stream")
    got = []
    # awkward chunk sizes: 0.7 s, 1.3 s, 2.9 s, rest
    cuts = [0, int(0.7 * sr), int(2.0 * sr), int(4.9 * sr), len(wave)]
    for lo, hi in zip(cuts, cuts[1:]):
        got += s.feed(wave[lo:hi], sr)
    tail = s.flush()

    assert len(got) == len(ref)
    for a, b in zip(got, ref):
        assert a["asr_text"] == b["asr_text"]
        assert a["audio_description"] == b["audio_description"]
        assert a["start_time"] == b["start_time"]
        assert a["end_time"] == b["end_time"]
        if a["asr_embedding"] is not None:
            np.testing.assert_allclose(a["asr_embedding"],
                                       b["asr_embedding"], atol=1e-6)
    # store committed incrementally
    assert len(store) == len(got) + len(tail)
    # 10.3 s - 9 s windows = 1.3 s tail >= min 1 s -> flushed
    assert len(tail) <= 1
    if tail:
        assert tail[0]["start_time"] == 9.0

    # closed stream refuses more data
    with pytest.raises(ValueError):
        s.feed(wave[:100], sr)


def test_stream_rate_change_rejected(cfg, rng):
    pipe = tiny_pipeline(cfg)
    s = StreamingIngest(pipe, SegmentStore(embed_dim=64), cfg)
    s.feed((rng.normal(size=1000) * 0.1).astype(np.float32), 16000)
    with pytest.raises(ValueError, match="rate changed"):
        s.feed(np.zeros(100, np.float32), 22050)


def test_stream_autosave(cfg, rng, tmp_path):
    pipe = tiny_pipeline(cfg)
    store = SegmentStore(embed_dim=64)
    s = StreamingIngest(pipe, store, cfg, autosave_path=tmp_path / "idx",
                        autosave_every=1)
    sr = 16000
    s.feed((rng.normal(size=sr * 3) * 0.1).astype(np.float32), sr)
    if len(store):  # random tiny models may reject all text
        loaded = SegmentStore.load(tmp_path / "idx")
        assert len(loaded) == len(store)


def test_stream_http_endpoints(cfg, rng):
    from multimodal_audio_search_tpu.service.server import serve
    eng = AudioSearchEngine(cfg=cfg, ingest_pipeline=tiny_pipeline(cfg))
    eng.store.embed_dim = 64
    eng.store._emb = np.zeros((eng.store._cap, 2, 64), np.float32)
    srv = serve(eng, host="127.0.0.1", port=0, block=False)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        req = urllib.request.Request(base + "/api/stream/open?name=mic",
                                     method="POST")
        sid = json.loads(urllib.request.urlopen(req, timeout=60).read())[
            "session"]
        sr = 16000
        wave = (rng.normal(size=sr * 4) * 0.1 * 32767).astype(np.int16)
        req = urllib.request.Request(
            base + f"/api/stream/{sid}/chunk?rate={sr}",
            data=wave.tobytes(), method="POST")
        out = json.loads(urllib.request.urlopen(req, timeout=300).read())
        assert "segments" in out and out["buffered_s"] == pytest.approx(
            1.0, abs=0.05)
        req = urllib.request.Request(base + f"/api/stream/{sid}/close",
                                     method="POST")
        out = json.loads(urllib.request.urlopen(req, timeout=300).read())
        assert "segments" in out
        # closed session is gone
        req = urllib.request.Request(base + f"/api/stream/{sid}/chunk",
                                     data=b"", method="POST")
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=60)
        assert e.value.code == 404
    finally:
        srv.shutdown()


def test_stream_chunking_fuzz(cfg, rng):
    """Property: ANY random chunking commits the same windows as one-shot
    (window boundaries depend only on cumulative sample count)."""
    sr = 16000
    wave = (rng.normal(size=int(sr * 9.5)) * 0.1).astype(np.float32)
    pipe = tiny_pipeline(cfg)
    ref = pipe.process_waveform(wave[: 3 * int(sr * 3)], sr, "stream")
    for trial in range(3):
        r2 = np.random.default_rng(trial)
        pipe2 = tiny_pipeline(cfg)
        store = SegmentStore(embed_dim=64)
        s = StreamingIngest(pipe2, store, cfg, source_name="stream")
        got, lo = [], 0
        while lo < len(wave):
            hi = min(lo + int(r2.integers(1000, 40000)), len(wave))
            got += s.feed(wave[lo:hi], sr)
            lo = hi
        s.flush()
        assert [g["start_time"] for g in got] == \
            [r["start_time"] for r in ref]
        assert [g["asr_text"] for g in got] == [r["asr_text"] for r in ref]
