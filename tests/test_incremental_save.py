"""Append-only sharded index persistence (SegmentStore.save_incremental).

Streaming ingest autosaves every N commits (pipelines/streaming.py); the
full save() rewrites the whole store each time, which is O(index) per
commit. The sharded layout appends only new rows, with the manifest
updated last so a crash mid-save is ignored on load."""
import json

import numpy as np
import pytest

from multimodal_audio_search_tpu.index.store import SegmentStore


def _add(st, n, rng, src="s"):
    for i in range(n):
        st.add({"source": src, "start_time": float(len(st))},
               rng.normal(size=8), rng.normal(size=8),
               audio_data=np.full(3, len(st), np.float32))


def test_incremental_roundtrip(rng, tmp_path):
    st = SegmentStore(embed_dim=8)
    p = tmp_path / "idx"
    _add(st, 5, rng)
    assert st.save_incremental(p) == 5
    _add(st, 3, rng)
    assert st.save_incremental(p) == 3
    assert st.save_incremental(p) == 0          # nothing new
    manifest = json.loads((p / "manifest.json").read_text())
    assert manifest["rows"] == 8 and manifest["shards"] == 2
    st2 = SegmentStore.load(p)
    assert len(st2) == 8
    np.testing.assert_allclose(st2.embeddings, st.embeddings, rtol=1e-6)
    np.testing.assert_array_equal(st2.success, st.success)
    assert st2.meta == st.meta
    for i in range(8):
        np.testing.assert_array_equal(st2.audio(i), st.audio(i))


def test_crash_between_shard_and_manifest(rng, tmp_path):
    st = SegmentStore(embed_dim=8)
    p = tmp_path / "idx"
    _add(st, 4, rng)
    st.save_incremental(p)
    # simulate a crash: shard written + meta appended, manifest NOT updated
    _add(st, 2, rng)
    np.save(p / "emb.shard-00001.npy", st.embeddings[4:6])
    np.save(p / "success.shard-00001.npy", st.success[4:6])
    with open(p / "meta.jsonl", "a") as f:
        for row in st.meta[4:6]:
            f.write(json.dumps(row) + "\n")
    st2 = SegmentStore.load(p)            # manifest says 4 rows
    assert len(st2) == 4
    # the next incremental save re-appends the orphaned rows cleanly
    assert st.save_incremental(p) == 2
    assert len(SegmentStore.load(p)) == 6


def test_orphan_meta_never_shadows_new_rows(rng, tmp_path):
    """The round-2 advisor finding: a crash between the meta append and
    the manifest rename leaves orphan meta lines. If the process then
    RESTARTS (store reloaded from disk at the committed row count) and
    ingests different segments, the next incremental save must not let
    the stale orphan lines shadow the newly committed rows."""
    st = SegmentStore(embed_dim=8)
    p = tmp_path / "idx"
    _add(st, 4, rng, src="before")
    st.save_incremental(p)
    # crash mid-save: shard + meta appended, manifest not updated
    _add(st, 2, rng, src="orphan")
    np.save(p / "emb.shard-00001.npy", st.embeddings[4:6])
    np.save(p / "success.shard-00001.npy", st.success[4:6])
    with open(p / "meta.jsonl", "a") as f:
        for row in st.meta[4:6]:
            f.write(json.dumps(row) + "\n")
    # restart: reload at the committed 4 rows, ingest DIFFERENT segments
    st2 = SegmentStore.load(p)
    assert len(st2) == 4
    _add(st2, 3, rng, src="after")
    assert st2.save_incremental(p) == 3
    st3 = SegmentStore.load(p)
    assert [r["source"] for r in st3.meta] == ["before"] * 4 + \
        ["after"] * 3
    np.testing.assert_allclose(st3.embeddings, st2.embeddings, rtol=1e-6)


def test_legacy_manifest_without_meta_bytes(rng, tmp_path):
    """Manifests written before the meta_bytes field must still truncate
    orphans (one-time line-count rewrite), then upgrade in place."""
    st = SegmentStore(embed_dim=8)
    p = tmp_path / "idx"
    _add(st, 3, rng, src="a")
    st.save_incremental(p)
    manifest = p / "manifest.json"
    state = json.loads(manifest.read_text())
    del state["meta_bytes"]
    manifest.write_text(json.dumps(state))
    with open(p / "meta.jsonl", "a") as f:        # orphan line
        f.write(json.dumps({"source": "orphan"}) + "\n")
    _add(st, 2, rng, src="b")
    assert st.save_incremental(p) == 2
    st2 = SegmentStore.load(p)
    assert [r["source"] for r in st2.meta] == ["a"] * 3 + ["b"] * 2
    assert "meta_bytes" in json.loads(manifest.read_text())


def test_full_save_clears_stale_audio(rng, tmp_path):
    """delete_where removing every row that carried audio must not leave
    a stale audio.npz for load() to misalign onto the new rows."""
    st = SegmentStore(embed_dim=8)
    _add(st, 2, rng, src="a")                     # has audio
    p = tmp_path / "idx"
    st.save(p)
    assert (p / "audio.npz").exists()
    st.delete_source("a")
    for i in range(2):                            # new rows, no audio
        st.add({"source": "b"}, rng.normal(size=8), rng.normal(size=8),
               audio_data=None)
    st.save(p)
    assert not (p / "audio.npz").exists()
    st2 = SegmentStore.load(p)
    assert len(st2) == 2 and st2.audio(0) is None


def test_delete_then_regrow_refuses_incremental(rng, tmp_path):
    """The corruption window: save 4 rows, delete 2, add 3 — the store
    is BIGGER than the saved prefix but its early rows no longer match
    the disk. The compaction counter in the manifest must force a
    refusal (streaming autosave then falls back to a full rewrite)."""
    st = SegmentStore(embed_dim=8)
    _add(st, 2, rng, src="a")
    _add(st, 2, rng, src="b")
    p = tmp_path / "idx"
    st.save_incremental(p)
    st.delete_source("a")                  # rows shift: disk prefix stale
    _add(st, 3, rng, src="c")              # regrow past the saved count
    assert len(st) == 5
    with pytest.raises(ValueError):
        st.save_incremental(p)
    st.save(p)                             # full rewrite is the recovery
    st2 = SegmentStore.load(p)
    assert [r["source"] for r in st2.meta] == ["b", "b", "c", "c", "c"]
    # and incremental works again on a fresh sharded dir
    p2 = tmp_path / "idx2"
    assert st.save_incremental(p2) == 5
    _add(st, 1, rng, src="d")
    assert st.save_incremental(p2) == 1
    assert len(SegmentStore.load(p2)) == 6


def test_full_save_supersedes_shards(rng, tmp_path):
    st = SegmentStore(embed_dim=8)
    p = tmp_path / "idx"
    _add(st, 4, rng)
    st.save_incremental(p)
    st.delete_source("s")                  # shrink: can't extend any more
    with pytest.raises(ValueError):
        st.save_incremental(p)
    st.save(p)                             # full rewrite clears the shards
    assert not (p / "manifest.json").exists()
    assert not list(p.glob("*.shard-*.np*"))
    assert len(SegmentStore.load(p)) == 0


def test_incremental_refuses_full_layout(rng, tmp_path):
    st = SegmentStore(embed_dim=8)
    p = tmp_path / "idx"
    _add(st, 2, rng)
    st.save(p)
    with pytest.raises(ValueError):
        st.save_incremental(p)


def test_streaming_autosave_uses_shards(rng, tmp_path):
    import jax.numpy as jnp
    from multimodal_audio_search_tpu import EngineConfig
    from multimodal_audio_search_tpu.config import DecodeConfig, MelConfig
    from multimodal_audio_search_tpu.models import whisper as W
    from multimodal_audio_search_tpu.models.minilm import MiniLMConfig
    from multimodal_audio_search_tpu.pipelines.embed import TextEmbedder
    from multimodal_audio_search_tpu.pipelines.ingest import (
        DualPipelineIngest)
    from multimodal_audio_search_tpu.pipelines.streaming import (
        StreamingIngest)
    from multimodal_audio_search_tpu.pipelines.whisper_pipeline import (
        WhisperTextPipeline)

    wcfg = W.WhisperConfig(
        vocab_size=128, d_model=32, enc_layers=1, dec_layers=1, heads=2,
        ffn=64, enc_positions=150, dec_positions=12,
        bos_token_id=100, eos_token_id=101, pad_token_id=101)
    mel = MelConfig(padded_seconds=3.0)
    d = DecodeConfig(max_new_tokens=3)
    cfg = EngineConfig(ingest_batch=4)
    ing = DualPipelineIngest(
        WhisperTextPipeline(cfg=wcfg, decode=d, mel_cfg=mel,
                            dtype=jnp.float32, name="asr"),
        WhisperTextPipeline(cfg=wcfg, decode=d, mel_cfg=mel,
                            dtype=jnp.float32, name="caption", seed=1,
                            prefix_ids=[100]),
        TextEmbedder(cfg=MiniLMConfig(vocab_size=512, hidden=64, layers=1,
                                      heads=2, intermediate=128)),
        cfg)
    store = SegmentStore(embed_dim=64)
    p = tmp_path / "auto"
    stream = StreamingIngest(ing, store, cfg, source_name="live",
                             autosave_path=p, autosave_every=1)
    sr = 16000
    wave = (rng.normal(size=sr * 7) * 0.3).astype(np.float32)
    stream.feed(wave[: sr * 4], sr)
    stream.feed(wave[sr * 4:], sr)
    stream.flush()
    assert (p / "manifest.json").exists()
    st2 = SegmentStore.load(p)
    assert len(st2) == len(store)
    np.testing.assert_allclose(st2.embeddings, store.embeddings,
                               rtol=1e-6)
