"""Beyond-HBM host index (index/bigindex.py): build + streamed search
must equal the in-memory fused_topk on the same data."""
import numpy as np
import pytest

import jax.numpy as jnp

from multimodal_audio_search_tpu.index.bigindex import (
    HostIndex, build_host_index)
from multimodal_audio_search_tpu.index.fusion import fused_topk
from multimodal_audio_search_tpu.index.store import SegmentStore


def make_store(rng, n=700, d=48):
    store = SegmentStore(embed_dim=d, keep_audio=False)
    emb = rng.normal(size=(n, 2, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    ok = rng.random((n, 2)) > 0.25
    for i in range(n):
        store.add({"segment_id": f"s{i}", "asr_text": f"t{i}",
                   "start_time": float(i)},
                  emb[i, 0] if ok[i, 0] else None,
                  emb[i, 1] if ok[i, 1] else None)
    return store, emb


@pytest.mark.parametrize("dtype", ["float32", "bfloat16", "int8"])
def test_host_index_matches_in_memory(rng, tmp_path, dtype):
    store, emb = make_store(rng)
    idx = build_host_index(store, tmp_path / "big", dtype=dtype)
    # fresh open from disk
    idx = HostIndex(tmp_path / "big", chunk=256)  # force multi-chunk merge
    assert len(idx) == len(store)

    q = emb[123, 0]
    ref = fused_topk(jnp.asarray(q), jnp.asarray(store.embeddings),
                     jnp.asarray(store.success),
                     jnp.float32(0.7), jnp.float32(0.3), k=10)
    s, i = idx.search(q, 0.7, 0.3, k=10)
    if dtype == "float32":
        np.testing.assert_array_equal(i, np.asarray(ref["indices"]))
        np.testing.assert_allclose(s, np.asarray(ref["scores"]), rtol=1e-6)
    else:
        # quantized storage: top-1 holds, top-10 within close-rank drift
        assert i[0] == int(ref["indices"][0])
        overlap = len(set(i.tolist())
                      & set(np.asarray(ref["indices"]).tolist()))
        assert overlap >= 8, (i, ref["indices"])

    recs = idx.records(i, s)
    assert recs[0]["segment_id"] == f"s{int(i[0])}"
    assert recs[0]["fusion_score"] == pytest.approx(float(s[0]))


@pytest.mark.parametrize("dtype", ["float32", "int8"])
def test_host_ivf_full_probe_matches_streamed(rng, tmp_path, dtype):
    """search_ivf with a full probe must equal the chunk-streamed
    search() on the same memmaps (candidate set == every row with a
    successful slot; identical device scoring program)."""
    store, emb = make_store(rng, n=400)
    build_host_index(store, tmp_path / "bivf", dtype=dtype)
    idx = HostIndex(tmp_path / "bivf", chunk=128)
    idx.build_ivf(n_clusters=12, seed=1)
    q = emb[37, 0]
    se, ie = idx.search(q, 0.6, 0.4, k=10)
    sa, ia = idx.search_ivf(q, 0.6, 0.4, k=10, n_probe=12)
    keep = se > -1e29
    np.testing.assert_array_equal(ia[keep], ie[keep])
    np.testing.assert_allclose(sa[keep], se[keep], rtol=1e-5, atol=1e-6)


def test_host_ivf_persists_and_reloads(rng, tmp_path):
    """build_ivf(save=True) writes ivf.npz; a fresh HostIndex auto-loads
    it and serves identical results without rebuilding."""
    store, emb = make_store(rng, n=300)
    build_host_index(store, tmp_path / "bivf2", dtype="float32")
    idx = HostIndex(tmp_path / "bivf2")
    idx.build_ivf(n_clusters=10, seed=2)
    q = emb[11, 1]
    s1, i1 = idx.search_ivf(q, 0.5, 0.5, k=10, n_probe=10)
    idx2 = HostIndex(tmp_path / "bivf2")
    assert idx2._ivf is not None      # loaded from ivf.npz, no rebuild
    s2, i2 = idx2.search_ivf(q, 0.5, 0.5, k=10, n_probe=10)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, rtol=1e-6)


def test_host_ivf_stale_layout_ignored_after_rebuild(rng, tmp_path):
    """Rebuilding the host index at the same path with DIFFERENT data of
    the same size must not reuse the previous build's ivf.npz (build_id
    token + unlink)."""
    store_a, _ = make_store(rng, n=200)
    build_host_index(store_a, tmp_path / "b", dtype="float32")
    idx = HostIndex(tmp_path / "b")
    idx.build_ivf(n_clusters=8, seed=3)
    assert (tmp_path / "b" / "ivf.npz").exists()
    store_b, emb_b = make_store(rng, n=200)   # same size, new vectors
    build_host_index(store_b, tmp_path / "b", dtype="float32")
    idx2 = HostIndex(tmp_path / "b")
    assert idx2._ivf is None                  # stale layout rejected
    idx2.build_ivf(n_clusters=8, seed=4)
    q = emb_b[5, 0]
    se, ie = idx2.search(q, 0.6, 0.4, k=10)
    sa, ia = idx2.search_ivf(q, 0.6, 0.4, k=10, n_probe=8)
    keep = se > -1e29
    np.testing.assert_array_equal(ia[keep], ie[keep])


def test_host_ivf_large_probe_falls_back_to_stream(rng, tmp_path):
    """Candidate sets past the RAM budget route through the chunked
    exact search (identical results, no monolithic padded buffer)."""
    store, emb = make_store(rng, n=300)
    build_host_index(store, tmp_path / "bfb", dtype="float32")
    idx = HostIndex(tmp_path / "bfb", chunk=128)
    idx.build_ivf(n_clusters=10, seed=5)
    idx.max_candidate_bytes = 1          # force the fallback
    q = emb[9, 0]
    se, ie = idx.search(q, 0.6, 0.4, k=10)
    sa, ia = idx.search_ivf(q, 0.6, 0.4, k=10, n_probe=10)
    np.testing.assert_array_equal(ia, ie)
    np.testing.assert_allclose(sa, se, rtol=1e-6)


def test_host_index_threshold_and_meta(rng, tmp_path):
    store, emb = make_store(rng, n=64)
    idx = build_host_index(store, tmp_path / "big2", dtype="float32")
    # absurd threshold -> nothing survives; records() drops NEG_INF rows
    s, i = idx.search(emb[0, 0], 0.5, 0.5, k=10, threshold=0.999)
    assert idx.records(i, s) == [] or all(
        r["fusion_score"] > 0.999 for r in idx.records(i, s))
    # meta carries no array payloads
    assert "audio_data" not in idx.meta[0]
