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


def test_host_index_threshold_and_meta(rng, tmp_path):
    store, emb = make_store(rng, n=64)
    idx = build_host_index(store, tmp_path / "big2", dtype="float32")
    # absurd threshold -> nothing survives; records() drops NEG_INF rows
    s, i = idx.search(emb[0, 0], 0.5, 0.5, k=10, threshold=0.999)
    assert idx.records(i, s) == [] or all(
        r["fusion_score"] > 0.999 for r in idx.records(i, s))
    # meta carries no array payloads
    assert "audio_data" not in idx.meta[0]
