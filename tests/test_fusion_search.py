import zlib

import numpy as np
import pytest

from multimodal_audio_search_tpu.index.search import (
    FusionSearcher, reference_fusion_oracle)
from multimodal_audio_search_tpu.index.store import SegmentStore


def make_segments(rng, n=200, d=384):
    """Random segments with all availability combinations."""
    segs = []
    for i in range(n):
        has_asr = rng.random() > 0.25
        has_audio = rng.random() > 0.25
        if not (has_asr or has_audio):
            has_asr = True
        def emb():
            e = rng.normal(size=d).astype(np.float32)
            return e / np.linalg.norm(e)
        segs.append({
            "segment_id": f"seg_{i}",
            "start_time": 10.0 * i, "end_time": 10.0 * i + 10.0,
            "duration": 10.0,
            "asr_text": "hello world" if has_asr else "",
            "audio_description": "music playing" if has_audio else "",
            "asr_embedding": emb() if has_asr else None,
            "audio_embedding": emb() if has_audio else None,
            "asr_success": has_asr, "audio_success": has_audio,
        })
    return segs


@pytest.mark.parametrize("w_asr", [0.5, 0.8, 0.2, 0.64])
def test_fused_topk_matches_reference_loop(rng, w_asr):
    segs = make_segments(rng)
    store = SegmentStore(embed_dim=384, keep_audio=False)
    store.extend(segs)
    q = rng.normal(size=384).astype(np.float32)
    q /= np.linalg.norm(q)

    class FixedAnalyzer:
        def __call__(self, query):
            from multimodal_audio_search_tpu.index.analyzer import (
                WeightAnalysis)
            return WeightAnalysis(w_asr, 1.0 - w_asr, "fixed")

    searcher = FusionSearcher(
        store, embed_fn=lambda texts: np.tile(q, (len(texts), 1)),
        analyzer=FixedAnalyzer())
    got, info = searcher("anything")
    exp = reference_fusion_oracle(q, segs, w_asr, 1.0 - w_asr)

    assert [r["index"] for r in got] == [r["index"] for r in exp]
    for g, e in zip(got, exp):
        assert g["fusion_score"] == pytest.approx(e["fusion_score"], abs=1e-5)
        assert g["asr_similarity"] == pytest.approx(
            e["asr_similarity"], abs=1e-5)
        assert g["effective_asr_weight"] == pytest.approx(
            e["effective_asr_weight"], abs=1e-6)


def test_searcher_ivf_full_probe_matches_exact(rng):
    """enable_ivf with n_probe >= n_clusters must reproduce the exact
    searcher's rows (reference_fusion_oracle transitively), and the
    layout must rebuild itself when the store grows."""
    segs = make_segments(rng, n=120)
    store = SegmentStore(embed_dim=384, keep_audio=False)
    store.extend(segs)
    q = rng.normal(size=384).astype(np.float32)
    q /= np.linalg.norm(q)
    embed = lambda texts: np.tile(q, (len(texts), 1))  # noqa: E731
    exact = FusionSearcher(store, embed_fn=embed)
    ivf = FusionSearcher(store, embed_fn=embed)
    ivf.enable_ivf(n_probe=1_000_000)  # clamped to n_clusters
    e_rows, _ = exact("some query")
    a_rows, info = ivf("some query")
    assert info["ann"]["mode"] == "ivf"
    assert [r["index"] for r in a_rows] == [r["index"] for r in e_rows]
    for g, e in zip(a_rows, e_rows):
        assert g["fusion_score"] == pytest.approx(e["fusion_score"],
                                                  abs=1e-5)
        assert g["asr_similarity"] == pytest.approx(e["asr_similarity"],
                                                    abs=1e-5)

    built = ivf._ivf
    store.extend(make_segments(rng, n=20))
    e_rows, _ = exact("grown")
    a_rows, info2 = ivf("grown")
    assert ivf._ivf is not built and ivf._ivf.n_rows == 140
    assert [r["index"] for r in a_rows] == [r["index"] for r in e_rows]

    ivf.disable_ivf()
    d_rows, info3 = ivf("back to exact")
    assert "ann" not in info3
    assert [r["index"] for r in d_rows] == \
        [r["index"] for r in exact("back to exact")[0]]


def test_searcher_ivf_rebuilds_after_same_count_mutation(rng):
    """delete + ingest of equal size shifts row ids WITHOUT changing
    len(store); the IVF layout must still rebuild (keyed on the store's
    mutation counter) or buckets point at pre-compaction rows."""
    segs = make_segments(rng, n=80)
    for s in segs[:20]:
        s["source"] = "doomed"
    store = SegmentStore(embed_dim=384, keep_audio=False)
    store.extend(segs)
    q = rng.normal(size=384).astype(np.float32)
    q /= np.linalg.norm(q)
    embed = lambda texts: np.tile(q, (len(texts), 1))  # noqa: E731
    exact = FusionSearcher(store, embed_fn=embed)
    ivf = FusionSearcher(store, embed_fn=embed)
    ivf.enable_ivf(n_probe=1_000_000)
    ivf("warm build")
    store.delete_source("doomed")           # compaction shifts ids
    store.extend(make_segments(rng, n=20))  # back to the same count
    assert len(store) == 80
    e_rows, _ = exact("after churn")
    a_rows, _ = ivf("after churn")
    assert [r["index"] for r in a_rows] == [r["index"] for r in e_rows]


def test_threshold_and_validity(rng):
    # scores at/below 0.1 must be excluded; negative-sim rows excluded
    store = SegmentStore(embed_dim=8, keep_audio=False)
    q = np.zeros(8, np.float32); q[0] = 1.0
    mk = lambda v: np.asarray(v, np.float32)
    e_hi = mk([1, 0, 0, 0, 0, 0, 0, 0])          # sim 1.0
    e_lo = mk([0.05, 1, 0, 0, 0, 0, 0, 0])        # sim ~0.05 -> below threshold
    e_neg = mk([-1, 0, 0, 0, 0, 0, 0, 0])         # sim -1 -> invalid
    store.add({"segment_id": "hi"}, e_hi, None)
    store.add({"segment_id": "lo"}, e_lo, None)
    store.add({"segment_id": "neg"}, e_neg, None)
    searcher = FusionSearcher(
        store, embed_fn=lambda t: np.tile(q, (len(t), 1)))
    got, _ = searcher("no keywords here")
    assert [r["segment_id"] for r in got] == ["hi"]


def test_store_persistence_roundtrip(tmp_path, rng):
    segs = make_segments(rng, n=37)
    store = SegmentStore()
    for s in segs:
        store.add(
            {k: v for k, v in s.items() if "embedding" not in k},
            s["asr_embedding"], s["audio_embedding"],
            audio_data=rng.normal(size=160).astype(np.float32))
    store.save(tmp_path / "idx")
    loaded = SegmentStore.load(tmp_path / "idx")
    assert len(loaded) == len(store)
    np.testing.assert_allclose(loaded.embeddings, store.embeddings)
    np.testing.assert_array_equal(loaded.success, store.success)
    assert loaded.meta[5]["segment_id"] == store.meta[5]["segment_id"]
    np.testing.assert_allclose(loaded.audio(3), store.audio(3), atol=1e-7)


def test_store_growth(rng):
    store = SegmentStore(embed_dim=4, keep_audio=False)
    e = np.ones(4, np.float32)
    for i in range(3000):   # force capacity doubling past 1024/2048
        store.add({}, e, None)
    assert len(store) == 3000
    assert store.embeddings.shape == (3000, 2, 4)
    np.testing.assert_allclose(np.linalg.norm(store.embeddings[0, 0]), 1.0)


def test_store_mmap_persistence(tmp_path, rng):
    segs = make_segments(rng, n=21)
    store = SegmentStore(keep_audio=False)
    store.extend(segs)
    store.save(tmp_path / "idx", mmap=True)
    assert (tmp_path / "idx" / "emb.npy").exists()
    loaded = SegmentStore.load(tmp_path / "idx")
    assert len(loaded) == 21
    np.testing.assert_allclose(loaded.embeddings, store.embeddings)
    np.testing.assert_array_equal(loaded.success, store.success)
    # mmap store can keep growing (copy-on-append into owned buffers)
    loaded.add({"segment_id": "extra"},
               np.ones(384, np.float32) / np.sqrt(384), None)
    assert len(loaded) == 22


def test_search_batch_matches_singles(rng):
    """Batched query path == N single searches (SURVEY §2c data-parallel
    queries; one device dispatch for the whole batch)."""
    from multimodal_audio_search_tpu.index.search import FusionSearcher
    from multimodal_audio_search_tpu.index.store import SegmentStore

    d = 32
    store = SegmentStore(embed_dim=d, keep_audio=False)
    emb = rng.normal(size=(40, 2, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    for i in range(40):
        store.add({"segment_id": f"s{i}"}, emb[i, 0], emb[i, 1])

    def hash_embed(texts):
        out = []
        for t in texts:
            h = zlib.crc32(t.encode()) % 40
            out.append(emb[h, 0])
        return np.stack(out)

    s = FusionSearcher(store, hash_embed)
    queries = ["music with drums", "someone speaking", "guitar solo"]
    batch = s.search_batch(queries, k=5)
    assert len(batch) == 3
    for q, (results, info) in zip(queries, batch):
        single, sinfo = s(q, 5)
        assert [r["index"] for r in results] == [r["index"] for r in single]
        assert [r["fusion_score"] for r in results] == pytest.approx(
            [r["fusion_score"] for r in single])
        assert info["asr_weight"] == sinfo["asr_weight"]
        assert info["query"] == q


def test_engine_search_batch_and_http(rng):
    """Engine + HTTP multi-q batched search over a seeded store."""
    import json
    import threading
    import urllib.request
    import jax.numpy as jnp
    from multimodal_audio_search_tpu import AudioSearchEngine, EngineConfig
    from multimodal_audio_search_tpu.config import DecodeConfig, MelConfig
    from multimodal_audio_search_tpu.models import whisper as W
    from multimodal_audio_search_tpu.models.minilm import MiniLMConfig
    from multimodal_audio_search_tpu.pipelines.embed import TextEmbedder
    from multimodal_audio_search_tpu.pipelines.ingest import (
        DualPipelineIngest)
    from multimodal_audio_search_tpu.pipelines.whisper_pipeline import (
        WhisperTextPipeline)
    from multimodal_audio_search_tpu.service.server import serve

    wcfg = W.WhisperConfig(
        vocab_size=128, d_model=32, enc_layers=1, dec_layers=1, heads=2,
        ffn=64, enc_positions=150, dec_positions=16,
        bos_token_id=100, eos_token_id=101, pad_token_id=101)
    mel = MelConfig(padded_seconds=3.0)
    decode = DecodeConfig(max_new_tokens=4)
    cfg = EngineConfig(ingest_batch=4, embed_dim=64)
    asr = WhisperTextPipeline(cfg=wcfg, decode=decode, mel_cfg=mel,
                              dtype=jnp.float32, name="asr")
    cap = WhisperTextPipeline(cfg=wcfg, decode=decode, mel_cfg=mel,
                              dtype=jnp.float32, name="caption",
                              prefix_ids=[wcfg.bos_token_id], seed=1)
    emb = TextEmbedder(cfg=MiniLMConfig(vocab_size=512, hidden=64,
                                        layers=1, heads=2,
                                        intermediate=128))
    eng = AudioSearchEngine(
        cfg=cfg, ingest_pipeline=DualPipelineIngest(asr, cap, emb, cfg))
    eng.store.embed_dim = 64
    eng.store._emb = np.zeros((eng.store._cap, 2, 64), np.float32)
    eng.ingest_waveform(
        (rng.normal(size=16000 * 7) * 0.2).astype(np.float32), 16000, "x")

    queries = ["music with drums", "a person talking"]
    batch = eng.search_batch(queries)
    assert len(batch) == 2
    for (results, info), q in zip(batch, queries):
        single, _ = eng.search(q)
        assert [r["index"] for r in results] == [r["index"] for r in single]

    srv = serve(eng, host="127.0.0.1", port=0, block=False)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        url = (base + "/api/search?q=music%20with%20drums"
               "&q=a%20person%20talking&k=5")
        with urllib.request.urlopen(url, timeout=120) as r:
            out = json.loads(r.read())
        assert len(out["batch"]) == 2
        assert out["batch"][0]["weight_info"]["query"] == "music with drums"
    finally:
        srv.shutdown()


def test_index_dtype_plumbing(rng):
    """FusionConfig.index_dtype routes the searcher's device index (the
    bf16 perf lever was previously reachable only by hand)."""
    import jax.numpy as jnp

    from multimodal_audio_search_tpu.config import FusionConfig
    from multimodal_audio_search_tpu.index.search import FusionSearcher
    from multimodal_audio_search_tpu.index.store import SegmentStore

    d = 16

    def embed(texts):
        out = rng.normal(size=(len(texts), d)).astype(np.float32)
        return out / np.linalg.norm(out, axis=-1, keepdims=True)

    store = SegmentStore(embed_dim=d, keep_audio=False)
    for i in range(12):
        e = rng.normal(size=d)
        store.add({"asr_text": f"t{i}", "audio_description": f"c{i}",
                   "start_time": float(i), "source": "s"}, e, e)
    s16 = FusionSearcher(store, embed,
                         cfg=FusionConfig(index_dtype="bfloat16"))
    hits, _ = s16("query words")
    emb, _ = store.device_index("bfloat16")
    assert emb.dtype == jnp.bfloat16
    assert len(hits) > 0
    s32 = FusionSearcher(store, embed)
    emb32, _ = store.device_index("float32")   # cfg default refreshes
    hits32, _ = s32("query words")
    assert emb32.dtype == jnp.float32 and len(hits32) > 0
