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


def test_host_index_writer_matches_build(rng, tmp_path):
    """HostIndexWriter (streamed chunks, no store) must produce a
    byte-compatible layout: searches equal build_host_index's on the
    same data, and int8 quantization matches chunk-for-chunk."""
    from multimodal_audio_search_tpu.index.bigindex import HostIndexWriter
    store, emb = make_store(rng, n=200)
    ok = np.asarray(store.success[:200])
    build_host_index(store, tmp_path / "ref", dtype="int8")
    ref = HostIndex(tmp_path / "ref", chunk=64)
    w = HostIndexWriter(tmp_path / "w", 200, emb.shape[-1], dtype="int8")
    full = np.asarray(store.embeddings[:200], np.float32)
    for lo in range(0, 200, 64):                   # uneven final chunk
        w.append(full[lo:lo + 64], ok[lo:lo + 64],
                 store.meta[lo:min(lo + 64, 200)])
    idx = w.finalize(chunk=64)
    np.testing.assert_array_equal(np.asarray(idx.emb),
                                  np.asarray(ref.emb))
    np.testing.assert_allclose(np.asarray(idx.scale),
                               np.asarray(ref.scale))
    q = emb[11, 0]
    s1, i1 = ref.search(q, 0.6, 0.4, k=10)
    s2, i2 = idx.search(q, 0.6, 0.4, k=10)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, rtol=1e-6)
    assert idx.meta[11]["segment_id"] == "s11"


def test_host_ivf_candidate_gather_byte_bound(rng, tmp_path):
    """The beyond-HBM claim (docs/BENCHMARKS.md; proven at 10M by
    tools/bench_ivf_10m.py): search_ivf ships only the probed buckets
    (+spill), never the index. last_query_bytes must respect the
    static bound 2*pow2(n_probe*cap + spill) row-bytes and sit far
    under the full index footprint. Built via HostIndexWriter at a
    size where the pow2-padded bucket is a small fraction of the
    index (at a few hundred rows the 1024-row minimum bucket exceeds
    the index and the bound is vacuous)."""
    from multimodal_audio_search_tpu.index.bigindex import HostIndexWriter
    n, d = 20_000, 48
    w = HostIndexWriter(tmp_path / "bb", n, d, dtype="int8")
    emb = rng.normal(size=(n, 2, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    ok = rng.random((n, 2)) > 0.25
    emb[~ok] = 0.0
    w.append(emb, ok)
    idx = w.finalize(chunk=4096)
    idx.build_ivf(n_clusters=64, seed=3)
    _, members, spill = idx._ivf
    n_probe = 2
    s, gi = idx.search_ivf(emb[5, 0], 0.6, 0.4, k=10, n_probe=n_probe)
    assert s.size and gi.size
    cap = members.shape[1]
    worst = n_probe * cap + spill.size
    b = 1024
    while b < worst:
        b *= 2
    row_bytes = 2 * idx.dim * idx.emb.itemsize + 1 + 8   # emb+ok+scale
    assert idx.last_query_bytes <= b * row_bytes
    assert idx.last_query_candidates <= worst
    full = idx.emb.nbytes + idx.success.nbytes + idx.scale.nbytes
    assert idx.last_query_bytes < full, \
        (idx.last_query_bytes, full)
