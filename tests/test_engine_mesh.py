"""Engine-integrated multi-chip (SURVEY §2c; round-2 verdict item 1).

The PRODUCTION engine path — EngineConfig(data_parallel/model_parallel) ->
make_default_ingest -> DualPipelineIngest -> SegmentStore -> FusionSearcher
— must compile and run over a device mesh and produce the same segments,
embeddings, and search results as single-device execution (the reference's
model, audio_search.py:89,268-271, scaled per SURVEY §2c).
"""
import numpy as np
import pytest

from multimodal_audio_search_tpu import AudioSearchEngine
from multimodal_audio_search_tpu.config import (
    DecodeConfig, EngineConfig, ModelSpec, SegmentConfig)


def _cfg(dp, mp, transfer="int16"):
    return EngineConfig(
        asr_model=ModelSpec(family="whisper", preset="test"),
        caption_model=ModelSpec(family="whisper", preset="test"),
        text_embedder=ModelSpec(family="minilm", preset="test"),
        embed_dim=64, ingest_batch=16,
        segment=SegmentConfig(segment_seconds=2.0, min_segment_seconds=0.5),
        short_context=True,
        asr_decode=DecodeConfig(max_new_tokens=6),
        caption_decode=DecodeConfig(max_new_tokens=6),
        transfer_dtype=transfer,
        data_parallel=dp, model_parallel=mp)


def _engine(dp=1, mp=1, transfer="int16"):
    eng = AudioSearchEngine(cfg=_cfg(dp, mp, transfer), keep_audio=False,
                            seed=0)
    eng.load_all_models()
    return eng


@pytest.fixture(scope="module")
def wave(request):
    rng = np.random.default_rng(7)
    return (rng.normal(size=16000 * 7) * 0.3).astype(np.float32)


@pytest.fixture(scope="module")
def single(wave):
    """Single-device reference run of the same engine."""
    eng = _engine(1, 1)
    segs = eng.ingest_waveform(wave, 16000, "clip")
    return eng, segs


@pytest.mark.parametrize("dp,mp", [(8, 1), (4, 2)])
def test_engine_ingest_search_matches_single_device(single, wave, dp, mp):
    ref, ref_segs = single
    eng = _engine(dp, mp)
    assert eng.mesh is not None
    assert eng.mesh.shape == {"data": dp, "model": mp}
    assert eng.ingest_pipeline.mesh is eng.mesh

    segs = eng.ingest_waveform(wave, 16000, "clip")
    assert len(segs) == len(ref_segs) > 0
    for s, r in zip(segs, ref_segs):
        assert s["asr_text"] == r["asr_text"]
        assert s["audio_description"] == r["audio_description"]
        assert (s["asr_success"], s["audio_success"]) == \
            (r["asr_success"], r["audio_success"])
    np.testing.assert_allclose(
        eng.store.embeddings, ref.store.embeddings, atol=2e-5)

    for query in ("music with drums", "someone speaking words", "xyzzy"):
        rows, info = eng.search(query)
        ref_rows, ref_info = ref.search(query)
        assert info["asr_weight"] == ref_info["asr_weight"]
        assert [r["index"] for r in rows] == \
            [r["index"] for r in ref_rows]
        np.testing.assert_allclose(
            [r["fusion_score"] for r in rows],
            [r["fusion_score"] for r in ref_rows], atol=2e-5)
        for r, rr in zip(rows, ref_rows):
            np.testing.assert_allclose(
                [r["asr_similarity"], r["audio_similarity"],
                 r["effective_asr_weight"], r["effective_audio_weight"]],
                [rr["asr_similarity"], rr["audio_similarity"],
                 rr["effective_asr_weight"], rr["effective_audio_weight"]],
                atol=2e-5)

    # batched queries route through the mesh path too
    outs = eng.search_batch(["music with drums", "someone speaking"])
    assert len(outs) == 2 and all(isinstance(o, tuple) for o in outs)


def test_engine_mesh_int12_transfer_matches_single_device(wave):
    """The packed int12 transfer (uint8 rows of 3*ceil(seg/2) bytes) must
    shard over the data axis like any other batch layout and decode to
    the same tokens as single-device int12 ingest."""
    ref = _engine(1, 1, transfer="int12")
    ref_segs = ref.ingest_waveform(wave, 16000, "clip")
    eng = _engine(8, 1, transfer="int12")
    segs = eng.ingest_waveform(wave, 16000, "clip")
    assert len(segs) == len(ref_segs) > 0
    for s, r in zip(segs, ref_segs):
        assert s["asr_text"] == r["asr_text"]
        assert s["audio_description"] == r["audio_description"]
    np.testing.assert_allclose(
        eng.store.embeddings, ref.store.embeddings, atol=2e-5)


def test_sharded_search_payload_matches_fused_topk(rng):
    """sharded_fused_search's full result dict == single-device
    fused_topk on the same index (indices, scores, sims, weights)."""
    import jax.numpy as jnp
    from multimodal_audio_search_tpu.index.fusion import fused_topk
    from multimodal_audio_search_tpu.parallel.mesh import make_mesh
    from multimodal_audio_search_tpu.parallel.sharding import (
        shard_index, sharded_fused_search)

    mesh = make_mesh(8, model_parallel=1)
    n, d = 512, 32
    emb = rng.normal(size=(n, 2, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    ok = rng.uniform(size=(n, 2)) > 0.3
    emb *= ok[..., None]
    q = emb[17, 0] + 0.05 * rng.normal(size=d).astype(np.float32)
    q /= np.linalg.norm(q)

    ref = fused_topk(jnp.asarray(q), jnp.asarray(emb), jnp.asarray(ok),
                     jnp.float32(0.6), jnp.float32(0.4), k=10)
    emb_s, ok_s = shard_index(mesh, emb, ok)
    out = sharded_fused_search(mesh, k=10)(
        jnp.asarray(q), emb_s, ok_s, jnp.float32(0.6), jnp.float32(0.4))

    np.testing.assert_array_equal(np.asarray(out["indices"]),
                                  np.asarray(ref["indices"]))
    np.testing.assert_allclose(np.asarray(out["scores"]),
                               np.asarray(ref["scores"]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out["sims"]),
                               np.asarray(ref["sims"]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out["effective_weights"]),
                               np.asarray(ref["effective_weights"]),
                               rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(out["valid"]),
                                  np.asarray(ref["valid"]))
    assert int(out["num_valid"]) == int(ref["num_valid"])


@pytest.mark.parametrize("transfer", ["mel16", "mel8"])
def test_engine_mesh_hostmel_transfer_matches_single_device(wave, transfer):
    """The host-mel transfers (mel16 uint16 codes; mel8 relative codes
    with the per-row f32 gmax tail, whose bitcast slice must stay
    shard-local) must shard over the data axis like any other batch
    layout and decode to the same tokens as single-device ingest."""
    ref = _engine(1, 1, transfer=transfer)
    ref_segs = ref.ingest_waveform(wave, 16000, "clip")
    eng = _engine(8, 1, transfer=transfer)
    segs = eng.ingest_waveform(wave, 16000, "clip")
    assert len(segs) == len(ref_segs) > 0
    for s, r in zip(segs, ref_segs):
        assert s["asr_text"] == r["asr_text"]
        assert s["audio_description"] == r["audio_description"]
    np.testing.assert_allclose(
        eng.store.embeddings, ref.store.embeddings, atol=2e-5)
