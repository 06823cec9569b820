"""Fusion search over a SegmentStore.

Behavioral contract (audio_search.py:624-699): analyze the query for weights,
embed it, score every segment with availability-renormalized weighted cosine
fusion, keep scores > threshold, return the top-10 plus a weight-info dict.
Here the scoring loop is a single jitted program (index/fusion.py) over the
HBM-resident index.
"""
from __future__ import annotations

import time
from typing import Any, Callable, Sequence

import jax.numpy as jnp
import numpy as np

from ..config import FusionConfig
from .analyzer import KeywordAnalyzer, WeightAnalysis
from .fusion import NEG_INF, fused_topk, fused_topk_impl
from .store import SegmentStore


class FusionSearcher:
    """search(query) -> (results, weight_info) with reference-shaped rows."""

    def __init__(
        self,
        store: SegmentStore,
        embed_fn: Callable[[Sequence[str]], np.ndarray],
        analyzer: Callable[[str], WeightAnalysis] | None = None,
        cfg: FusionConfig | None = None,
        mesh=None,
    ):
        """``mesh`` shards the index N axis over the mesh's 'data' axis
        and routes scoring through the per-shard-top-k + all-gather
        program (parallel/sharding.py) — the multi-chip serving path.
        Without it, the whole index scores on one device (exact
        reference-parity execution)."""
        self.store = store
        self.embed_fn = embed_fn
        self.cfg = cfg or FusionConfig()
        self.analyzer = analyzer or KeywordAnalyzer(self.cfg)
        self.mesh = mesh
        self._sharded_cache: dict[tuple, Any] = {}
        self._combined = self._build_combined(embed_fn)
        self._ivf_cfg: tuple | None = None
        self._ivf = None

    # ------------------------------------------------------------ IVF (ANN)
    def enable_ivf(self, n_probe: int = 8, n_clusters: int | None = None,
                   rebuild_growth: float = 0.2) -> None:
        """Opt-in sublinear search for very large indexes (index/ivf.py).

        The fusion math on every scored candidate stays exact; only the
        candidate set narrows (n_probe of ~sqrt(2N) clusters + the spill
        tail). The layout rebuilds lazily whenever the store's row count
        changes — reusing centroids (assignment + repack only) while the
        change is within ``rebuild_growth`` of the built size, full
        k-means beyond that. With a mesh, each 'data' shard builds its
        own buckets and probes locally; only k candidates per shard
        cross ICI (index/ivf.py::sharded_ivf_search_impl). Default exact
        search is untouched unless this is called."""
        self._ivf_cfg = (n_probe, n_clusters, rebuild_growth)
        self._ivf = None

    def disable_ivf(self) -> None:
        self._ivf_cfg = None
        self._ivf = None

    def prewarm(self) -> None:
        """Build/refresh the IVF layout for the store's CURRENT contents
        (no-op without enable_ivf or on an up-to-date layout). Called
        after ingest (service/api.py) so the k-means/packing cost lands
        on the write path, not on the first query after growth."""
        if self._ivf_cfg is not None and len(self.store) > 0:
            self._ensure_ivf_layout()

    def _ensure_ivf_layout(self):
        """(Re)build the IVF layout if the store mutated; returns the
        store's device view (the expensive part is host-side build)."""
        from .ivf import build_ivf, build_ivf_sharded
        n_probe, n_clusters, growth = self._ivf_cfg
        n = len(self.store)
        if self.mesh is not None:
            # per-shard buckets over the capacity-padded, P('data')-
            # sharded index (padding rows have success=False and never
            # enter buckets); rebuild tracks live rows + capacity
            emb, ok = self.store.device_index(
                getattr(self.cfg, "index_dtype", "float32"), self.mesh)
            dp = self.mesh.shape["data"]
            # keyed on the store's mutation counter, NOT len(): a
            # delete+ingest of equal size compacts/shifts row ids
            # without changing the count (review round-3b finding)
            key = (getattr(self.store, "version", n), emb.shape[0])
            if self._ivf is None or getattr(self, "_ivf_key", None) != key:
                cent = None
                if self._ivf is not None and abs(
                        n - getattr(self, "_ivf_rows", n)) \
                        <= growth * max(getattr(self, "_ivf_rows", 1), 1):
                    cent = self._ivf.centroids   # re-assign/repack only
                h_emb, h_suc = self.store.host_index(padded=True)
                self._ivf = build_ivf_sharded(
                    h_emb, h_suc, dp, n_clusters=n_clusters,
                    centroids=cent)
                self._ivf_key = key
                self._ivf_rows = n
                self._ivf_spill = int(np.count_nonzero(
                    np.asarray(self._ivf.spill) >= 0))
                from jax.sharding import NamedSharding, PartitionSpec as P
                import jax
                s = NamedSharding(self.mesh, P("data"))
                self._ivf_dev = tuple(
                    jax.device_put(a, s) for a in
                    (self._ivf.centroids, self._ivf.members,
                     self._ivf.spill))
                self._ivf_run = {}
            return emb, ok
        ver = getattr(self.store, "version", n)
        if self._ivf is None or getattr(self, "_ivf_key", None) != ver:
            cent = None
            if self._ivf is not None and \
                    abs(n - self._ivf.n_rows) <= growth * self._ivf.n_rows:
                cent = self._ivf.centroids
            h_emb, h_suc = self.store.host_index()
            self._ivf = build_ivf(h_emb, h_suc, n_clusters=n_clusters,
                                  centroids=cent)
            self._ivf_key = ver
            self._ivf_spill = int(self._ivf.spill.shape[0])
        return self.store.device_index(
            getattr(self.cfg, "index_dtype", "float32"))

    def _ivf_out(self, query: str, wa, k: int):
        n_probe = self._ivf_cfg[0]   # rebuild policy lives in
        n = len(self.store)          # _ensure_ivf_layout
        q = np.asarray(self.embed_fn([query]), np.float32)[0]
        nq = float(np.linalg.norm(q))
        if nq > 0:
            q = q / nq
        emb, ok = self._ensure_ivf_layout()
        if self.mesh is not None:
            rk = (min(k, n), n_probe)
            if rk not in self._ivf_run:
                import jax
                from .ivf import sharded_ivf_search_impl
                self._ivf_run[rk] = jax.jit(sharded_ivf_search_impl(
                    self.mesh, self._ivf, k=rk[0], n_probe=n_probe,
                    threshold=self.cfg.relevance_threshold))
            cent_d, memb_d, spill_d = self._ivf_dev
            return self._ivf_run[rk](
                jnp.asarray(q), cent_d, memb_d, spill_d, emb, ok,
                jnp.float32(wa.asr_weight), jnp.float32(wa.audio_weight))
        run = self._ivf.search_fn(
            k=min(k, n), n_probe=n_probe,
            threshold=self.cfg.relevance_threshold)
        return run(jnp.asarray(q), jnp.float32(wa.asr_weight),
                   jnp.float32(wa.audio_weight), emb, ok)

    def _sharded_topk(self, k: int):
        """Cached jitted sharded search program for (k, threshold)."""
        from ..parallel.sharding import sharded_fused_search_impl
        key = (k, self.cfg.relevance_threshold)
        if key not in self._sharded_cache:
            import jax
            self._sharded_cache[key] = jax.jit(sharded_fused_search_impl(
                self.mesh, k=k, threshold=self.cfg.relevance_threshold))
        return self._sharded_cache[key]

    def _build_combined(self, embed_fn):
        """Single-dispatch query program: MiniLM embed + fused top-k in ONE
        jitted call (halves tunnel/dispatch roundtrips vs embed-then-search;
        the reference pays a model call plus N sklearn calls,
        audio_search.py:635-651)."""
        try:
            from ..pipelines.embed import TextEmbedder
        except ImportError:  # pragma: no cover
            return None
        if not isinstance(embed_fn, TextEmbedder):
            return None
        emb = embed_fn
        import functools
        import jax

        mesh = self.mesh

        @functools.partial(jax.jit, static_argnames=("k", "threshold"))
        def program(params, ids, mask, index_emb, success,
                    w_asr, w_audio, *, k, threshold):
            q = emb.sentence_fn(params, ids, mask)[0]
            if mesh is not None:
                from ..parallel.sharding import sharded_fused_search_impl
                return sharded_fused_search_impl(
                    mesh, k=k, threshold=threshold)(
                    q, index_emb, success, w_asr, w_audio)
            return fused_topk_impl(
                q, index_emb, success, w_asr, w_audio,
                k=k, threshold=threshold)

        return (program, emb)

    def _build_batched(self, embed_fn):
        """One program for MANY queries: batched MiniLM embed + vmapped
        fused top-k (data-parallel query batches, SURVEY §2c). The index
        is read once per dispatch regardless of batch size."""
        try:
            from ..pipelines.embed import TextEmbedder
        except ImportError:  # pragma: no cover
            return None
        if not isinstance(embed_fn, TextEmbedder):
            return None
        emb = embed_fn
        import functools
        import jax

        @functools.partial(jax.jit, static_argnames=("k", "threshold"))
        def program(params, ids, mask, index_emb, success,
                    w_asr, w_audio, *, k, threshold):
            q = emb.sentence_fn(params, ids, mask)      # [Q, D]
            run = functools.partial(fused_topk_impl,
                                    k=k, threshold=threshold)
            return jax.vmap(run, in_axes=(0, None, None, 0, 0))(
                q, index_emb, success, w_asr, w_audio)

        return (program, emb)

    def search_batch(
        self, queries: Sequence[str], k: int | None = None
    ) -> list[tuple[list[dict[str, Any]], dict[str, Any]]]:
        """Batched fusion search: one device dispatch for all queries.
        Returns [(results, weight_info)] aligned with ``queries``."""
        if len(self.store) == 0 or not queries:
            return [([], {}) for _ in queries]
        k = k or self.cfg.top_k
        if self._ivf_cfg is not None:
            # IVF candidate generation is per-query (centroid probe picks
            # different buckets per query); run the sublinear program per
            # query rather than silently falling back to the exact O(N)
            # scan the operator opted out of
            return [self(q, k) for q in queries]
        if self.mesh is not None:
            # sharded index: one mesh-wide dispatch per query (a vmap over
            # the shard_map'd per-shard top-k is not batchable; the index
            # pass dominates per-query cost anyway)
            return [self(q, k) for q in queries]
        if getattr(self, "_batched", None) is None:
            self._batched = self._build_batched(self.embed_fn)
        was = [self.analyzer(q) for q in queries]
        emb, ok = self.store.device_index(
            getattr(self.cfg, "index_dtype", "float32"))
        t0 = time.perf_counter()
        if self._batched is not None:
            program, embedder = self._batched
            ids, mask = embedder.tokenizer.encode(
                list(queries), embedder.max_tokens)
            out = program(
                embedder.params, jnp.asarray(ids), jnp.asarray(mask),
                emb, ok,
                jnp.asarray([w.asr_weight for w in was], jnp.float32),
                jnp.asarray([w.audio_weight for w in was], jnp.float32),
                k=min(k, emb.shape[0]),
                threshold=self.cfg.relevance_threshold)
            out = {kk: np.asarray(v) for kk, v in out.items()}
            outs = [{kk: v[qi] for kk, v in out.items()}
                    for qi in range(len(queries))]
        else:  # generic embed_fn: embed host-side, still one scoring vmap
            outs = []
            qv = np.asarray(self.embed_fn(list(queries)), np.float32)
            qv /= np.maximum(
                np.linalg.norm(qv, axis=-1, keepdims=True), 1e-12)
            for qi, w in enumerate(was):
                o = fused_topk(
                    jnp.asarray(qv[qi]), emb, ok,
                    jnp.float32(w.asr_weight), jnp.float32(w.audio_weight),
                    k=min(k, emb.shape[0]),
                    threshold=self.cfg.relevance_threshold)
                outs.append({kk: np.asarray(v) for kk, v in o.items()})
        dt = time.perf_counter() - t0
        return [(self._rows(outs[qi], was[qi]),
                 {"asr_weight": was[qi].asr_weight,
                  "audio_weight": was[qi].audio_weight,
                  "analysis": was[qi].analysis, "query": queries[qi],
                  "latency_s": dt}) for qi in range(len(queries))]

    def _rows(self, out, wa) -> list[dict[str, Any]]:
        results: list[dict[str, Any]] = []
        for rank in range(len(out["indices"])):
            if not out["valid"][rank] or out["scores"][rank] <= NEG_INF / 2:
                continue
            i = int(out["indices"][rank])
            if i >= len(self.store):   # capacity padding
                continue
            row = dict(self.store.meta[i])
            row.update(
                index=i,
                asr_similarity=float(out["sims"][rank, 0]),
                audio_similarity=float(out["sims"][rank, 1]),
                fusion_score=float(out["scores"][rank]),
                effective_asr_weight=float(
                    out["effective_weights"][rank, 0]),
                effective_audio_weight=float(
                    out["effective_weights"][rank, 1]),
                query_asr_weight=wa.asr_weight,
                query_audio_weight=wa.audio_weight,
            )
            results.append(row)
        return results

    def __call__(
        self, query: str, k: int | None = None
    ) -> tuple[list[dict[str, Any]], dict[str, Any]]:
        if len(self.store) == 0:
            return [], {}
        k = k or self.cfg.top_k
        t0 = time.perf_counter()
        wa = self.analyzer(query)
        if self._ivf_cfg is not None:
            out = {kk: np.asarray(v)
                   for kk, v in self._ivf_out(query, wa, k).items()}
            return self._rows(out, wa), {
                "asr_weight": wa.asr_weight,
                "audio_weight": wa.audio_weight,
                "analysis": wa.analysis, "query": query,
                "ann": {"mode": "ivf",
                        "n_clusters": self._ivf.n_clusters,
                        "n_probe": min(self._ivf_cfg[0],
                                       self._ivf.n_clusters),
                        "sharded": self.mesh is not None,
                        # cached at build time: counting the device
                        # array here would add a ~30 ms tunnel readback
                        # to every query
                        "spill": getattr(self, "_ivf_spill", 0)},
                "latency_s": time.perf_counter() - t0,
            }
        emb, ok = self.store.device_index(
            getattr(self.cfg, "index_dtype", "float32"), self.mesh)
        if self._combined is not None:
            program, embedder = self._combined
            ids, mask = embedder.tokenizer.encode(
                [query], embedder.max_tokens)
            out = program(
                embedder.params, jnp.asarray(ids), jnp.asarray(mask),
                emb, ok,
                jnp.float32(wa.asr_weight), jnp.float32(wa.audio_weight),
                k=min(k, emb.shape[0]),
                threshold=self.cfg.relevance_threshold)
        else:
            q = np.asarray(self.embed_fn([query]), np.float32)[0]
            n = float(np.linalg.norm(q))
            if n > 0:
                q = q / n
            if self.mesh is not None:
                out = self._sharded_topk(min(k, emb.shape[0]))(
                    jnp.asarray(q), emb, ok,
                    jnp.float32(wa.asr_weight),
                    jnp.float32(wa.audio_weight))
            else:
                out = fused_topk(
                    jnp.asarray(q), emb, ok,
                    jnp.float32(wa.asr_weight),
                    jnp.float32(wa.audio_weight),
                    k=min(k, emb.shape[0]),
                    threshold=self.cfg.relevance_threshold)
        out = {kk: np.asarray(v) for kk, v in out.items()}
        results = self._rows(out, wa)
        weight_info = {
            "asr_weight": wa.asr_weight,
            "audio_weight": wa.audio_weight,
            "analysis": wa.analysis,
            "query": query,
            "latency_s": time.perf_counter() - t0,
        }
        return results, weight_info


def reference_fusion_oracle(
    query_emb: np.ndarray,
    segments: list[dict[str, Any]],
    asr_weight: float,
    audio_weight: float,
    threshold: float = 0.1,
    k: int = 10,
) -> list[dict[str, Any]]:
    """Direct numpy transcription of the reference's per-segment loop
    (audio_search.py:639-699), used as the parity oracle in tests."""
    def cos(a, b):
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        return float(a @ b / (na * nb)) if na > 0 and nb > 0 else 0.0

    out = []
    for i, seg in enumerate(segments):
        asr_sim = cos(query_emb, seg["asr_embedding"]) \
            if seg.get("asr_embedding") is not None else 0.0
        audio_sim = cos(query_emb, seg["audio_embedding"]) \
            if seg.get("audio_embedding") is not None else 0.0
        if asr_sim > 0 or audio_sim > 0:
            ew_asr = asr_weight if seg["asr_success"] else 0.0
            ew_audio = audio_weight if seg["audio_success"] else 0.0
            total = ew_asr + ew_audio
            if total > 0:
                ew_asr, ew_audio = ew_asr / total, ew_audio / total
                score = ew_asr * asr_sim + ew_audio * audio_sim
                if score > threshold:
                    out.append({
                        "index": i, "fusion_score": score,
                        "asr_similarity": asr_sim,
                        "audio_similarity": audio_sim,
                        "effective_asr_weight": ew_asr,
                        "effective_audio_weight": ew_audio,
                    })
    out.sort(key=lambda r: r["fusion_score"], reverse=True)
    return out[:k]
