"""Regression tests for the late-round-3 self-review findings."""
import json

import numpy as np
import pytest


def test_mesh_from_config_rejects_non_pow2_dp():
    """dp=3 used to pass make_mesh and then die deep inside the first
    sharded device_put (buckets are powers of two); the knob must fail
    fast with an actionable error."""
    from multimodal_audio_search_tpu.config import EngineConfig
    from multimodal_audio_search_tpu.parallel.mesh import mesh_from_config
    with pytest.raises(ValueError, match="power of two"):
        mesh_from_config(EngineConfig(data_parallel=3))
    with pytest.raises(ValueError, match="power of two"):
        mesh_from_config(EngineConfig(data_parallel=6, model_parallel=2))
    # powers of two still build (dp*mp devices exist under the 8-dev env)
    assert mesh_from_config(EngineConfig(data_parallel=4)) is not None
    assert mesh_from_config(EngineConfig()) is None


def test_reconfigure_failure_leaves_engine_intact(monkeypatch, rng):
    """A failed pipeline rebuild must not commit ANY state: the old
    embedder keeps serving the old index (previously cfg was swapped
    first and the next lazy rebuild paired a new embedder with a
    stale, dimension-mismatched store)."""
    from multimodal_audio_search_tpu import AudioSearchEngine
    from multimodal_audio_search_tpu.config import (
        DecodeConfig, EngineConfig, ModelSpec, SegmentConfig)
    import multimodal_audio_search_tpu.service.api as api_mod

    cfg = EngineConfig(
        asr_model=ModelSpec(family="whisper", preset="test"),
        caption_model=ModelSpec(family="whisper", preset="test"),
        text_embedder=ModelSpec(family="minilm", preset="test"),
        embed_dim=64, ingest_batch=8,
        segment=SegmentConfig(segment_seconds=2.0, min_segment_seconds=0.5),
        short_context=True,
        asr_decode=DecodeConfig(max_new_tokens=4),
        caption_decode=DecodeConfig(max_new_tokens=4))
    eng = AudioSearchEngine(cfg=cfg, keep_audio=False)
    eng.load_all_models()
    wave = (rng.normal(size=16000 * 5) * 0.3).astype(np.float32)
    eng.ingest_waveform(wave, 16000, "clip")
    n_before = len(eng.store)
    assert n_before > 0
    old_cfg, old_ingest, old_store = eng.cfg, eng._ingest, eng.store

    def boom(*a, **k):
        raise RuntimeError("simulated rebuild failure")

    monkeypatch.setattr(api_mod, "make_default_ingest", boom)
    with pytest.raises(RuntimeError, match="simulated"):
        eng.reconfigure(segment_seconds=4.0)
    # nothing committed: same cfg object semantics, same pipelines,
    # same (un-reset) index — and search still answers
    assert eng.cfg is old_cfg
    assert eng._ingest is old_ingest
    assert eng.store is old_store and len(eng.store) == n_before
    rows, _ = eng.search("music with drums")
    assert isinstance(rows, list)


def test_incremental_save_refuses_short_meta(tmp_path):
    """meta.jsonl shorter than the manifest's committed meta_bytes means
    the data blocks never hit disk — truncate(committed) would EXTEND
    the file with NUL bytes; the store must refuse instead."""
    from multimodal_audio_search_tpu.index.store import SegmentStore
    st = SegmentStore(embed_dim=8, keep_audio=False)
    for i in range(3):
        st.add({"segment_id": f"s{i}", "asr_text": f"t{i}"},
               np.ones(8, np.float32), np.ones(8, np.float32))
    p = tmp_path / "inc"
    st.save_incremental(p)
    meta = p / "meta.jsonl"
    committed = json.loads((p / "manifest.json").read_text())["meta_bytes"]
    meta.write_bytes(meta.read_bytes()[: committed // 2])  # lost blocks
    st.add({"segment_id": "s3", "asr_text": "t3"},
           np.ones(8, np.float32), np.ones(8, np.float32))
    with pytest.raises(ValueError, match="lost data"):
        st.save_incremental(p)
    # full save into a fresh directory still works (the repair path)
    st.save(tmp_path / "full")
    again = SegmentStore.load(tmp_path / "full")
    assert len(again) == 4
    # and no NUL bytes were ever written into the damaged file
    assert b"\x00" not in meta.read_bytes()


def test_compare_all_payload_carries_snippets(rng):
    """The Compare-All UI panel reads texts[] from the search response;
    it must not need a second /api/segments round trip."""
    from multimodal_audio_search_tpu import AudioSearchEngine
    from multimodal_audio_search_tpu.index.store import SegmentStore

    eng = AudioSearchEngine.__new__(AudioSearchEngine)
    eng.store = SegmentStore(embed_dim=16, keep_audio=False)
    from multimodal_audio_search_tpu.config import EngineConfig
    eng.cfg = EngineConfig(embed_dim=16)
    from multimodal_audio_search_tpu.service.stats import StatsRegistry
    eng.stats = StatsRegistry()
    eng._searcher = None
    eng._combined_searcher = None
    eng.mesh = None

    def embed(texts):
        out = rng.normal(size=(len(texts), 16)).astype(np.float32)
        return out / np.linalg.norm(out, axis=-1, keepdims=True)

    eng._ingest = type("I", (), {"embedder": staticmethod(embed)})()
    # AudioSearchEngine.embedder property goes through ingest_pipeline
    for i in range(6):
        e = embed([f"x{i}"])[0]
        eng.store.add({"segment_id": f"s{i}", "asr_text": f"spoken {i}",
                       "audio_description": f"music {i}"}, e, e)
    results, info = eng.search_strategy("drums", strategy="compare_all")
    for s, o in info["per_strategy"].items():
        assert len(o["texts"]) == len(o["top"])
        for t in o["texts"]:
            assert isinstance(t, str) and t


def test_clap_fusion_batch_empty():
    from multimodal_audio_search_tpu.audio.clap_features import (
        clap_fusion_batch)
    feats, longer = clap_fusion_batch([])
    assert feats.shape[0] == 0 and feats.shape[1] == 4
    assert longer.shape == (0,)


def test_htk_filterbank_matches_transformers():
    """The deduped mel_filterbank(htk, norm=None) must equal the HF
    ClapFeatureExtractor fusion filterbank."""
    import transformers.audio_utils as au
    from multimodal_audio_search_tpu.ops.mel import mel_filterbank
    ref = au.mel_filter_bank(
        num_frequency_bins=513, num_mel_filters=64, min_frequency=0.0,
        max_frequency=14_000.0, sampling_rate=48_000, norm=None,
        mel_scale="htk")                                   # [F, n_mels]
    got = mel_filterbank(64, 1024, 48_000, 0.0, 14_000.0,
                         mel_scale="htk", norm=None).T
    np.testing.assert_allclose(got, ref, atol=1e-10)
