"""Per-source index deletion (capability beyond the reference, whose only
index mutations are append and full reset — audio_search.py:115,797)."""
import json
import urllib.request

import numpy as np
import pytest

from multimodal_audio_search_tpu.index.store import SegmentStore
from tests.test_server import server  # noqa: F401  (shared fixture)


def _store_with(sources, rng):
    st = SegmentStore(embed_dim=8)
    for i, src in enumerate(sources):
        e1 = rng.normal(size=8)
        e2 = rng.normal(size=8) if i % 3 else None
        st.add({"source": src, "start_time": float(i)}, e1, e2,
               audio_data=np.full(4, i, np.float32))
    return st


def test_delete_source_compacts_and_preserves_order(rng):
    srcs = ["a.wav", "b.wav", "a.wav", "c.wav", "b.wav", "a.wav"]
    st = _store_with(srcs, rng)
    survivors_emb = st.embeddings[[1, 3, 4]].copy()
    survivors_ok = st.success[[1, 3, 4]].copy()
    removed = st.delete_source("a.wav")
    assert removed == 3 and len(st) == 3
    assert [r["source"] for r in st.meta] == ["b.wav", "c.wav", "b.wav"]
    np.testing.assert_array_equal(st.embeddings, survivors_emb)
    np.testing.assert_array_equal(st.success, survivors_ok)
    # audio rows stay aligned with meta rows
    assert [int(st.audio(i)[0]) for i in range(3)] == [1, 3, 4]
    # device view was invalidated: padding rows all success=False
    emb, ok = st.device_index()
    assert np.asarray(ok)[3:].sum() == 0
    np.testing.assert_allclose(np.asarray(emb)[:3], survivors_emb,
                               rtol=1e-6)
    assert st.delete_source("nope.wav") == 0


def test_delete_then_save_load_roundtrip(rng, tmp_path):
    st = _store_with(["x", "y", "x", "y"], rng)
    st.delete_source("x")
    st.save(tmp_path / "idx")
    st2 = SegmentStore.load(tmp_path / "idx")
    assert len(st2) == 2
    np.testing.assert_array_equal(st2.embeddings, st.embeddings)
    assert [r["source"] for r in st2.meta] == ["y", "y"]


def test_http_delete_endpoint(server, rng, tmp_path):
    from multimodal_audio_search_tpu.audio.wav import write_wav

    server, _ = server
    wave = (rng.normal(size=16000 * 8) * 0.3).astype(np.float32)
    p = tmp_path / "d.wav"
    write_wav(str(p), wave, 16000)
    for name in ("keep.wav", "drop.wav"):
        req = urllib.request.Request(
            server + f"/api/ingest?name={name}", data=p.read_bytes(),
            method="POST")
        with urllib.request.urlopen(req, timeout=300) as r:
            total = json.loads(r.read())["total"]
    req = urllib.request.Request(
        server + "/api/delete?source=drop.wav", method="POST")
    with urllib.request.urlopen(req, timeout=60) as r:
        body = json.loads(r.read())
    assert body["removed"] > 0
    assert body["total"] == total - body["removed"]
    # missing ?source= is a 400
    req = urllib.request.Request(server + "/api/delete", method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 400
    # UI carries the per-file remove control wired to the endpoint
    with urllib.request.urlopen(server + "/", timeout=30) as r:
        html = r.read().decode()
    assert "sources_out" in html and "/api/delete?source=" in html


def test_prometheus_metrics_endpoint(server):
    server, _ = server
    with urllib.request.urlopen(server + "/metrics", timeout=30) as r:
        body = r.read().decode()
        ctype = r.headers.get("Content-Type", "")
    assert "text/plain" in ctype
    assert "# TYPE mas_calls_total counter" in body
    assert 'mas_calls_total{pipeline="asr_pipeline"}' in body
    assert "mas_index_segments" in body
    assert "mas_ingest_jobs_queued" in body
    assert "mas_ingest_jobs_queued_bytes" in body
    # every sample line parses as <name>{labels}? <float>
    for line in body.strip().splitlines():
        if line.startswith("#"):
            continue
        name_part, value = line.rsplit(" ", 1)
        float(value)
        assert name_part.startswith("mas_")
