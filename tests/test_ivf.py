"""IVF approximate fused search (index/ivf.py).

Correctness contract: the fusion math on any scored candidate is EXACT
(same availability renorm / strict-> threshold as index/fusion.py), and
with n_probe == n_clusters the result equals the exact fused_topk —
approximation only ever narrows the candidate set.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from multimodal_audio_search_tpu.index.fusion import fused_topk
from multimodal_audio_search_tpu.index.ivf import build_ivf


def _mk_index(rng, n, d, missing=0.2):
    emb = rng.normal(size=(n, 2, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    success = rng.random((n, 2)) > missing
    emb[~success] = 0.0
    return emb, success


def _exact(emb, success, q, w=(0.6, 0.4), k=10):
    out = fused_topk(jnp.asarray(q), jnp.asarray(emb),
                     jnp.asarray(success), jnp.float32(w[0]),
                     jnp.float32(w[1]), k=k)
    s = np.asarray(out["scores"])
    i = np.asarray(out["indices"])
    keep = s > -1e29
    return s[keep], i[keep]


def _ivf(ivf, emb, success, q, w=(0.6, 0.4), k=10, n_probe=None):
    fn = ivf.search_fn(k=k, n_probe=n_probe or ivf.n_clusters)
    out = fn(jnp.asarray(q), jnp.float32(w[0]), jnp.float32(w[1]),
             jnp.asarray(emb), jnp.asarray(success))
    s = np.asarray(out["scores"])
    i = np.asarray(out["indices"])
    keep = np.asarray(out["valid"])
    return s[keep], i[keep], {kk: np.asarray(v) for kk, v in out.items()}


def _unit(rng, d):
    q = rng.normal(size=d).astype(np.float32)
    return q / np.linalg.norm(q)


def test_full_probe_equals_exact(rng):
    emb, success = _mk_index(rng, 300, 16)
    ivf = build_ivf(emb, success, n_clusters=10, seed=1)
    for t in range(3):
        q = _unit(rng, 16)
        es, ei = _exact(emb, success, q)
        s, i, out = _ivf(ivf, emb, success, q)
        np.testing.assert_array_equal(i, ei)
        np.testing.assert_allclose(s, es, rtol=1e-5, atol=1e-6)
        # result dict carries the reference's per-hit diagnostics
        assert out["sims"].shape == (10, 2)
        assert out["effective_weights"].shape == (10, 2)


def test_spill_preserves_exactness(rng):
    """cap_factor < 1 forces most rows into the spill tail; full-probe
    equality must still hold (imbalance degrades speed, not results)."""
    emb, success = _mk_index(rng, 200, 8)
    ivf = build_ivf(emb, success, n_clusters=8, cap_factor=0.3, seed=2)
    assert int(ivf.spill.shape[0]) > 0
    q = _unit(rng, 8)
    es, ei = _exact(emb, success, q)
    s, i, _ = _ivf(ivf, emb, success, q)
    np.testing.assert_array_equal(i, ei)
    np.testing.assert_allclose(s, es, rtol=1e-5, atol=1e-6)


def test_clustered_recall_with_few_probes(rng):
    """Well-separated synthetic clusters: probing 2 of 8 clusters must
    recover the exact top-10 (the point of IVF)."""
    d, per = 32, 40
    centers = rng.normal(size=(8, d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=-1, keepdims=True)
    rows = []
    for c in centers:
        pts = c[None] + 0.05 * rng.normal(size=(per, d)).astype(np.float32)
        rows.append(pts / np.linalg.norm(pts, axis=-1, keepdims=True))
    flat = np.concatenate(rows)                      # [320, d]
    emb = np.stack([flat, flat], axis=1)             # both slots identical
    success = np.ones((len(flat), 2), bool)
    ivf = build_ivf(emb, success, n_clusters=8, seed=3)
    q = centers[3] + 0.01 * rng.normal(size=d).astype(np.float32)
    q = (q / np.linalg.norm(q)).astype(np.float32)
    es, ei = _exact(emb, success, q)
    s, i, _ = _ivf(ivf, emb, success, q, n_probe=2)
    np.testing.assert_array_equal(i, ei)
    np.testing.assert_allclose(s, es, rtol=1e-5, atol=1e-6)


def test_row_reachable_via_both_slots_appears_once(rng):
    """A row whose two slots cluster differently is listed in two
    buckets; when both are probed it must surface once, at its exact
    fused score."""
    d = 8
    a = np.eye(d, dtype=np.float32)[0]
    b = np.eye(d, dtype=np.float32)[1]
    # row 0: slot0 ~ a, slot1 ~ b  -> two different clusters
    emb = np.zeros((40, 2, d), np.float32)
    success = np.zeros((40, 2), bool)
    emb[0, 0], emb[0, 1] = a, b
    success[0] = True
    rng_pts = rng.normal(size=(39, d)).astype(np.float32)
    emb[1:, 0] = rng_pts / np.linalg.norm(rng_pts, axis=1, keepdims=True)
    success[1:, 0] = True
    ivf = build_ivf(emb, success, n_clusters=6, seed=4)
    q = ((a + b) / np.linalg.norm(a + b)).astype(np.float32)
    s, i, out = _ivf(ivf, emb, success, q, w=(0.5, 0.5), k=40)
    assert np.count_nonzero(i == 0) == 1
    es, ei = _exact(emb, success, q, w=(0.5, 0.5), k=40)
    np.testing.assert_array_equal(i, ei)
    # num_valid counts deduped ROWS, matching the exact path even when
    # a row is reachable through two probed buckets
    from multimodal_audio_search_tpu.index.fusion import fused_topk
    oe = fused_topk(jnp.asarray(q), jnp.asarray(emb),
                    jnp.asarray(success), jnp.float32(0.5),
                    jnp.float32(0.5), k=40)
    assert int(out["num_valid"]) == int(np.asarray(oe["num_valid"]))


def test_capacity_padded_index_operands(rng):
    """emb/success may be capacity-padded past n_rows (the store's cached
    device view); member ids never reach the padding and results still
    match the exact search over the padded arrays."""
    emb, success = _mk_index(rng, 37, 8)
    pad_emb = np.zeros((64, 2, 8), np.float32)
    pad_suc = np.zeros((64, 2), bool)
    pad_emb[:37], pad_suc[:37] = emb, success
    ivf = build_ivf(emb, success, n_clusters=5, seed=6)
    q = _unit(rng, 8)
    es, ei = _exact(pad_emb, pad_suc, q)
    s, i, _ = _ivf(ivf, pad_emb, pad_suc, q)
    np.testing.assert_array_equal(i, ei)
    assert (i < 37).all()
    np.testing.assert_allclose(s, es, rtol=1e-5, atol=1e-6)


def test_more_clusters_than_points(rng):
    emb, success = _mk_index(rng, 5, 8, missing=0.0)
    ivf = build_ivf(emb, success, n_clusters=64, seed=5)
    q = _unit(rng, 8)
    es, ei = _exact(emb, success, q, k=5)
    s, i, _ = _ivf(ivf, emb, success, q, k=5)
    np.testing.assert_array_equal(i, ei)


def test_sharded_ivf_full_probe_equals_exact(rng):
    """Per-shard buckets + ICI candidate merge over an 8-device mesh:
    with a full probe the merged result equals the exact single-device
    fused_topk over the whole index (global indices included)."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from multimodal_audio_search_tpu.index.ivf import (
        build_ivf_sharded, sharded_ivf_search_impl)

    devs = np.array(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devs, ("data", "model"))
    n, d = 256, 16
    emb, success = _mk_index(rng, n, d)
    layout = build_ivf_sharded(emb, success, 4, n_clusters=6)
    s_data = NamedSharding(mesh, P("data"))
    emb_d = jax.device_put(jnp.asarray(emb), s_data)
    suc_d = jax.device_put(jnp.asarray(success), s_data)
    cent_d = jax.device_put(layout.centroids, s_data)
    memb_d = jax.device_put(layout.members, s_data)
    spill_d = jax.device_put(layout.spill, s_data)
    fn = jax.jit(sharded_ivf_search_impl(
        mesh, layout, k=10, n_probe=layout.n_clusters))
    for _ in range(2):
        q = _unit(rng, d)
        out = fn(jnp.asarray(q), cent_d, memb_d, spill_d, emb_d, suc_d,
                 jnp.float32(0.6), jnp.float32(0.4))
        s = np.asarray(out["scores"])
        i = np.asarray(out["indices"])
        keep = np.asarray(out["valid"])
        es, ei = _exact(emb, success, q)
        np.testing.assert_array_equal(i[keep], ei)
        np.testing.assert_allclose(s[keep], es, rtol=1e-5, atol=1e-6)


def test_searcher_mesh_ivf_matches_exact(rng):
    """FusionSearcher.enable_ivf over a mesh: full-probe results equal
    the exact mesh-sharded searcher end-to-end (store-capacity padding
    included)."""
    import jax
    from jax.sharding import Mesh
    from multimodal_audio_search_tpu.index.search import FusionSearcher
    from multimodal_audio_search_tpu.index.store import SegmentStore

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2),
                ("data", "model"))
    store = SegmentStore(embed_dim=32, keep_audio=False)
    emb, success = _mk_index(rng, 90, 32)
    for r in range(90):
        store.add({"segment_id": f"s{r}"},
                  emb[r, 0] if success[r, 0] else None,
                  emb[r, 1] if success[r, 1] else None)
    q = _unit(rng, 32)
    embf = lambda texts: np.tile(q, (len(texts), 1))  # noqa: E731
    exact = FusionSearcher(store, embed_fn=embf, mesh=mesh)
    approx = FusionSearcher(store, embed_fn=embf, mesh=mesh)
    approx.enable_ivf(n_probe=1_000_000)
    e_rows, _ = exact("query")
    a_rows, info = approx("query")
    assert info["ann"]["sharded"] is True
    assert [r["index"] for r in a_rows] == [r["index"] for r in e_rows]
    for g, e in zip(a_rows, e_rows):
        assert abs(g["fusion_score"] - e["fusion_score"]) < 1e-5


def test_empty_clusters_rank_below_negative_sims(rng):
    """A memberless cluster (zero-centroid padding or genuinely empty)
    must never win a probe slot over a real cluster with NEGATIVE query
    similarity — the live-cluster mask sends it to NEG_INF."""
    import jax.numpy as jnp2
    from multimodal_audio_search_tpu.index.ivf import (
        local_candidate_scores)
    d = 8
    v = np.zeros(d, np.float32)
    v[0] = 1.0
    q = jnp2.asarray(-v)                       # sim(real centroid) = -1
    centroids = jnp2.asarray(np.stack([v, np.zeros(d, np.float32)]))
    members = jnp2.asarray(np.array([[0, -1], [-1, -1]], np.int32))
    spill = jnp2.asarray(np.zeros(0, np.int32))
    emb = np.zeros((1, 2, d), np.float32)
    emb[0, 0] = -v                             # sim(q, row 0 slot 0) = 1
    success = np.array([[True, False]])
    score_s, rows_s = local_candidate_scores(
        q, centroids, members, spill, jnp2.asarray(emb),
        jnp2.asarray(success), jnp2.float32(1.0), jnp2.float32(0.0),
        n_probe=1, threshold=0.1)
    # with the mask, probe 1 picks the REAL cluster despite cs=-1 < 0,
    # and row 0 scores 1.0; without it the empty cluster (cs=0) wins
    # and nothing is found
    assert float(np.max(np.asarray(score_s))) == pytest.approx(1.0)


def test_calibrate_n_probe(rng):
    """On well-separated clustered data the calibrator returns a small
    n_probe; an unreachable target degrades to a full probe."""
    from multimodal_audio_search_tpu.index.ivf import calibrate_n_probe
    d, per = 16, 30
    centers = rng.normal(size=(8, d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=-1, keepdims=True)
    pts = (centers[:, None, :] + (0.2 / np.sqrt(d)) * rng.normal(
        size=(8, per, d))).reshape(-1, d).astype(np.float32)
    pts /= np.linalg.norm(pts, axis=-1, keepdims=True)
    emb = np.stack([pts, pts], axis=1)
    success = np.ones((len(pts), 2), bool)
    ivf = build_ivf(emb, success, n_clusters=8, seed=8)
    qs = (centers[:4] + (0.3 / np.sqrt(d)) * rng.normal(
        size=(4, d))).astype(np.float32)
    qs /= np.linalg.norm(qs, axis=-1, keepdims=True)
    npb = calibrate_n_probe(ivf, emb, success, qs, target_overlap=0.9)
    assert 1 <= npb <= ivf.n_clusters
    # the chosen n_probe actually delivers the target
    run = ivf.search_fn(k=10, n_probe=npb)
    for qi, q in enumerate(qs):
        es, ei = _exact(emb, success, q)
        out = run(jnp.asarray(q), jnp.float32(0.6), jnp.float32(0.4),
                  jnp.asarray(emb), jnp.asarray(success))
        s = np.asarray(out["scores"])
        got = set(np.asarray(out["indices"])[s > -1e29].tolist())
        assert len(got & set(ei.tolist())) / max(len(ei), 1) >= 0.5


def test_incremental_rebuild_reuses_centroids(rng):
    """After growth, build_ivf(centroids=...) re-assigns without k-means;
    full-probe equality holds on the grown index."""
    emb, success = _mk_index(rng, 100, 8)
    ivf = build_ivf(emb, success, n_clusters=8, seed=7)
    emb2, success2 = _mk_index(rng, 140, 8)
    emb2[:100], success2[:100] = emb, success
    ivf2 = build_ivf(emb2, success2, centroids=ivf.centroids)
    assert ivf2.n_rows == 140 and ivf2.n_clusters == ivf.n_clusters
    q = _unit(rng, 8)
    es, ei = _exact(emb2, success2, q)
    s, i, _ = _ivf(ivf2, emb2, success2, q)
    np.testing.assert_array_equal(i, ei)
