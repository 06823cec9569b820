"""IVF (inverted-file) approximate fused search — beyond-reference scale.

The reference scores every segment per query (a Python loop over sklearn
cosines, audio_search.py:639-682); this package's exact path does the same
O(N) work as one fused XLA program (index/fusion.py) and meets the <50 ms
target at 1M rows. IVF makes query compute sublinear for the 10M+ regime
while keeping the FUSION MATH EXACT on every candidate it scores:

  build:  spherical k-means over all successful (row, slot) embeddings
          (matmul assignment + segment-sum update, device-side, chunked),
          then a static-shaped bucket layout: ``members[C, cap]`` row ids
          padded with -1, plus a ``spill`` tail of overflow rows that is
          scanned on EVERY query — so cluster imbalance degrades speed,
          never correctness.
  query:  q @ centroids -> top-n_probe clusters -> gather their member
          rows (+ spill) -> exact fused scoring of the candidate subset
          (same availability-renorm / >threshold math as index/fusion.py)
          -> row-dedup (a row reachable via both slots must not appear
          twice) -> top-k, returning the same result dict shape as
          fused_topk_impl so FusionSearcher._rows consumes it directly.

TPU-first shapes: everything after build is static — [n_probe, cap]
gathers, one [Nc, 2, D] einsum, a fixed-length sort for dedup — so the
query is ONE jitted program per (k, n_probe) like the exact path. The
index arrays (emb/success) are CALL OPERANDS, shared with the exact
path's cached capacity-padded device view (index/store.py:152) — IVF
adds centroids+buckets to HBM, never a second copy of the index.

With n_probe == n_clusters the candidate set is every row with at least
one successful slot, and results equal the exact fused_topk (rows with
no successful slot are invalid under the reference's weight-renorm rule,
audio_search.py:656-664, so excluding them from buckets loses nothing);
tests assert this equivalence, spill behavior included.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from .fusion import NEG_INF, normalize


# Module-level so every chunk (and every caller) shares ONE compiled
# executable — a per-call jax.jit wrapper recompiled the identical
# [chunk, C] program once per 262k-row memmap chunk (ADVICE r3).
_argmax_sim_jit = jax.jit(
    lambda a, c: jnp.argmax(a @ c.T, axis=1).astype(jnp.int32))


def _chunked_argmax_sim(x: np.ndarray, cent: jnp.ndarray,
                        chunk: int = 16384) -> np.ndarray:
    """argmax_c <x_i, cent_c> for every row, chunked so the [chunk, C]
    similarity tile stays small at any N."""
    fn = _argmax_sim_jit
    out = np.empty(len(x), np.int32)
    for lo in range(0, len(x), chunk):
        hi = min(lo + chunk, len(x))
        a = x[lo:hi]
        if hi - lo < chunk:  # pad to the compiled shape
            a = np.pad(a, ((0, chunk - (hi - lo)), (0, 0)))
        out[lo:hi] = np.asarray(fn(jnp.asarray(a), cent))[: hi - lo]
    return out


def spherical_kmeans(
    x: np.ndarray,              # [M, D] unit-norm training vectors
    n_clusters: int,
    iters: int = 10,
    seed: int = 0,
    sample: int = 32768,
) -> jnp.ndarray:
    """Cosine k-means: centroids re-normalized each step. Trains on a
    deterministic subsample (standard IVF practice — centroid quality
    saturates long before full-data assignment cost pays off)."""
    rng = np.random.default_rng(seed)
    m = len(x)
    if m > sample:
        x_train = x[rng.choice(m, size=sample, replace=False)]
    else:
        x_train = x
    n_clusters = min(n_clusters, max(len(x_train), 1))
    if len(x_train) == 0:
        return jnp.zeros((1, x.shape[1] if x.ndim == 2 else 1),
                         jnp.float32)
    cent = jnp.asarray(
        x_train[rng.choice(len(x_train), size=n_clusters, replace=False)])

    xd = jnp.asarray(x_train)

    @jax.jit
    def step(cent):
        assign = jnp.argmax(xd @ cent.T, axis=1)            # [M']
        sums = jax.ops.segment_sum(xd, assign, n_clusters)  # [C, D]
        counts = jax.ops.segment_sum(
            jnp.ones((len(xd), 1), jnp.float32), assign, n_clusters)
        # empty clusters keep their previous centroid
        return jnp.where(counts > 0, normalize(sums), cent)

    for _ in range(iters):
        cent = step(cent)
    return cent


def local_candidate_scores(q, centroids, members, spill, emb, success,
                           w_asr, w_audio, *, n_probe: int,
                           threshold: float):
    """Shared probe -> gather -> exact-fused-score -> dedup body (used
    by the single-device, mesh-sharded, and hierarchical DCN queries —
    one place to fix the scoring/dedup logic).

    Inputs are UNBATCHED per shard: centroids [C, D], members [C, cap]
    (-1 padded), spill [S] (may be -1 padded), emb [N_local, 2, D],
    success [N_local, 2]. Returns (score_s, rows_s): candidate scores
    sorted by (row asc, score desc) with duplicates and invalid rows at
    NEG_INF — callers top_k and globalize."""
    cs = centroids.astype(jnp.float32) @ q
    # clusters with no members (zero-centroid padding from uneven
    # sharded stacking, or genuinely empty clusters) must rank BELOW
    # every real cluster — a zero centroid's cs=0 would otherwise beat
    # real centroids with negative query similarity and waste probes
    live = jnp.any(members >= 0, axis=-1)            # [C]
    cs = jnp.where(live, cs, NEG_INF)
    n_probe = min(n_probe, int(centroids.shape[0]))
    _, probe = jax.lax.top_k(cs, n_probe)            # [P]
    cand = members[probe].reshape(-1)                # [P*cap]
    if spill.shape[0]:
        cand = jnp.concatenate([cand, spill])
    valid_cand = cand >= 0
    cand = jnp.where(valid_cand, cand, 0)
    # exact fusion math on the candidate subset (index/fusion.py;
    # decision parity with audio_search.py:654-672 preserved per row)
    sims = jnp.einsum(
        "npd,d->np", emb[cand].astype(jnp.float32), q,
        preferred_element_type=jnp.float32)          # [Nc, 2]
    w = jnp.stack([w_asr, w_audio]).astype(jnp.float32)
    eff = w[None, :] * success[cand].astype(jnp.float32)
    total = jnp.sum(eff, axis=-1)
    eff = eff / jnp.maximum(total, 1e-30)[:, None]
    score = jnp.sum(eff * sims, axis=-1)
    ok = (jnp.any(sims > 0.0, axis=-1) & (total > 0.0)
          & (score > threshold) & valid_cand)
    score = jnp.where(ok, score, NEG_INF)
    # row dedup: sort by (row asc, score desc); the best occurrence of
    # each row survives, later duplicates mask to NEG_INF. Ties then
    # resolve to the lowest row id, matching lax.top_k over the dense
    # score vector in the exact path.
    order = jnp.lexsort((-score, cand))
    rows_s = cand[order]
    score_s = score[order]
    first = jnp.concatenate(
        [jnp.ones((1,), bool), rows_s[1:] != rows_s[:-1]])
    return jnp.where(first, score_s, NEG_INF), rows_s


@functools.partial(jax.jit, static_argnames=("n_probe", "k", "threshold"))
def _ivf_query(query_emb, w_asr, w_audio, centroids, members, spill,
               emb, success, *, n_probe: int, k: int, threshold: float):
    q = query_emb.astype(jnp.float32)
    score_s, rows_s = local_candidate_scores(
        q, centroids, members, spill, emb, success, w_asr, w_audio,
        n_probe=n_probe, threshold=threshold)
    w = jnp.stack([w_asr, w_audio]).astype(jnp.float32)
    kk = min(k, score_s.shape[0])
    top_s, top_i = jax.lax.top_k(score_s, kk)
    hit = top_s > NEG_INF / 2
    idx = jnp.where(hit, rows_s[top_i], 0)
    # per-hit diagnostics, same shape as fused_topk_impl's result dict
    # (the reference surfaces sims + effective weights per result,
    # audio_search.py:673-682)
    sims_k = jnp.einsum(
        "kpd,d->kp", emb[idx].astype(jnp.float32), q,
        preferred_element_type=jnp.float32)
    eff_k = w[None, :] * success[idx].astype(jnp.float32)
    eff_k = eff_k / jnp.maximum(
        jnp.sum(eff_k, axis=-1, keepdims=True), 1e-30)
    return {
        "indices": jnp.where(hit, idx, -1),
        "scores": top_s,
        "valid": hit,
        "sims": sims_k,
        "effective_weights": eff_k,
        # counted AFTER dedup: a row reachable via two probed buckets
        # (or bucket + spill) passes ``ok`` once per occurrence
        "num_valid": jnp.sum((score_s > NEG_INF / 2).astype(jnp.int32)),
    }


@dataclasses.dataclass
class IVFIndex:
    """Built IVF layout (centroids + buckets only — the index arrays
    stay wherever the exact path keeps them and are passed per call)."""
    centroids: jnp.ndarray       # [C, D]
    members: jnp.ndarray         # [C, cap] int32 row ids, -1 padded
    spill: jnp.ndarray           # [S] int32 row ids (always scanned)
    n_rows: int

    @property
    def n_clusters(self) -> int:
        return int(self.centroids.shape[0])

    def search_fn(self, k: int = 10, n_probe: int = 8,
                  threshold: float = 0.1):
        """run(query_emb, w_asr, w_audio, emb, success) -> result dict
        (fused_topk_impl shape; misses carry index -1 / score NEG_INF).
        ``emb``/``success`` may be capacity-padded (index/store.py) —
        member ids never point past n_rows."""
        n_probe_ = min(n_probe, int(self.members.shape[0]))

        def run(query_emb, w_asr, w_audio, emb, success):
            return _ivf_query(
                query_emb, w_asr, w_audio, self.centroids, self.members,
                self.spill, emb, success,
                n_probe=n_probe_, k=k, threshold=threshold)

        return run


@dataclasses.dataclass
class ShardedIVF:
    """Per-shard IVF layouts stacked on a leading device axis, ready to
    shard with P("data"): centroids [dp, C, D], members [dp, C, cap],
    spill [dp, S] (-1 padded). Local member ids are shard-local; the
    query globalizes with axis_index, exactly like
    parallel/sharding.py::sharded_fused_search_impl."""
    centroids: jnp.ndarray
    members: jnp.ndarray
    spill: jnp.ndarray
    n_rows: int                   # global rows covered (incl. padding)
    shard_rows: int               # rows per shard

    @property
    def n_clusters(self) -> int:
        return int(self.centroids.shape[1])


def build_ivf_sharded(
    emb,                          # [N, 2, D] (N divisible by n_shards)
    success,                      # [N, 2]
    n_shards: int,
    n_clusters: int | None = None,
    cap_factor: float = 4.0,
    iters: int = 10,
    seed: int = 0,
    centroids: jnp.ndarray | None = None,   # [n_shards, C, D] to reuse
) -> ShardedIVF:
    """Build one IVF layout per contiguous row shard (matching the
    store's P('data') axis-0 sharding) and stack them to uniform shapes
    (padding centroids have no members, so the query's live-cluster mask
    ranks them below every real cluster; -1 member/spill padding is
    masked too). Pass ``centroids`` (a previous layout's stack) to skip
    per-shard k-means and only re-assign/re-pack."""
    emb_np = np.asarray(emb, np.float32)
    suc_np = np.asarray(success, bool)
    n = len(emb_np)
    if n % n_shards:
        raise ValueError(f"{n} rows do not divide into {n_shards} shards")
    if centroids is not None and centroids.shape[0] != n_shards:
        centroids = None        # shard count changed: full rebuild
    blk = n // n_shards
    parts = [build_ivf(emb_np[s * blk:(s + 1) * blk],
                       suc_np[s * blk:(s + 1) * blk],
                       n_clusters=n_clusters, cap_factor=cap_factor,
                       iters=iters, seed=seed + s,
                       centroids=None if centroids is None
                       else jnp.asarray(np.asarray(centroids)[s]))
             for s in range(n_shards)]
    c_max = max(p.n_clusters for p in parts)
    cap_max = max(int(p.members.shape[1]) for p in parts)
    s_max = max(int(p.spill.shape[0]) for p in parts)
    cents = np.zeros((n_shards, c_max, emb_np.shape[-1]), np.float32)
    membs = np.full((n_shards, c_max, cap_max), -1, np.int32)
    spills = np.full((n_shards, max(s_max, 1)), -1, np.int32)
    for s, p in enumerate(parts):
        cents[s, : p.n_clusters] = np.asarray(p.centroids)
        membs[s, : p.n_clusters, : p.members.shape[1]] = \
            np.asarray(p.members)
        spills[s, : p.spill.shape[0]] = np.asarray(p.spill)
    return ShardedIVF(
        centroids=jnp.asarray(cents), members=jnp.asarray(membs),
        spill=jnp.asarray(spills), n_rows=n, shard_rows=blk)


def sharded_ivf_search_impl(mesh, layout: ShardedIVF, k: int = 10,
                            n_probe: int = 8, threshold: float = 0.1):
    """shard_map'd IVF search over ``mesh``'s 'data' axis (trace-time
    body; jit the result). fn(query, emb, success, w_asr, w_audio) with
    emb/success sharded P('data') on axis 0 returns the
    fused_topk_impl-shaped dict with GLOBAL indices. Each shard probes
    its own buckets and only k candidates (+payloads) cross ICI."""
    from jax.sharding import PartitionSpec as P

    n_probe_ = min(n_probe, layout.n_clusters)

    def local_search(query, cent, members, spill, emb, success,
                     w_asr, w_audio):
        # per shard: cent [1, C, D], members [1, C, cap], spill [1, S],
        # emb [blk, 2, D] — local body shared with every IVF query path
        q = query.astype(jnp.float32)
        score_s, rows_s = local_candidate_scores(
            q, cent[0], members[0], spill[0], emb, success,
            w_asr, w_audio, n_probe=n_probe_, threshold=threshold)
        w = jnp.stack([w_asr, w_audio]).astype(jnp.float32)
        kk = min(k, score_s.shape[0])
        top_s, top_i = jax.lax.top_k(score_s, kk)
        hit = top_s > NEG_INF / 2
        li = jnp.where(hit, rows_s[top_i], 0)
        sims_k = jnp.einsum(
            "kpd,d->kp", emb[li].astype(jnp.float32), q,
            preferred_element_type=jnp.float32)
        succ_k = success[li].astype(jnp.float32)
        shard = jax.lax.axis_index("data")
        gi = jnp.where(hit, li + shard * emb.shape[0], -1)
        # k candidates per shard cross ICI
        all_s = jax.lax.all_gather(top_s, "data", tiled=True)
        all_i = jax.lax.all_gather(gi, "data", tiled=True)
        all_sims = jax.lax.all_gather(sims_k, "data", tiled=True)
        all_succ = jax.lax.all_gather(succ_k, "data", tiled=True)
        all_hit = jax.lax.all_gather(hit, "data", tiled=True)
        s, order2 = jax.lax.top_k(all_s, kk)
        eff2 = w[None, :] * all_succ[order2]
        eff2 = eff2 / jnp.maximum(
            jnp.sum(eff2, axis=-1, keepdims=True), 1e-30)
        return {
            "indices": jnp.take(all_i, order2),
            "scores": s,
            "valid": all_hit[order2],
            "sims": all_sims[order2],
            "effective_weights": eff2,
            # per-row (deduped), then summed across shards
            "num_valid": jax.lax.psum(
                jnp.sum((score_s > NEG_INF / 2).astype(jnp.int32)),
                "data"),
        }

    return jax.shard_map(
        local_search, mesh=mesh,
        in_specs=(P(), P("data"), P("data"), P("data"), P("data"), P("data"),
                  P(), P()),
        out_specs={"indices": P(), "scores": P(), "valid": P(),
                   "sims": P(), "effective_weights": P(),
                   "num_valid": P()},
        check_vma=False)


def build_ivf(
    emb,                         # [N, 2, D] unit-norm (np or jnp)
    success,                     # [N, 2] bool
    n_clusters: int | None = None,
    cap_factor: float = 4.0,
    iters: int = 10,
    seed: int = 0,
    centroids: jnp.ndarray | None = None,
) -> IVFIndex:
    """Cluster every successful (row, slot) vector; rows whose bucket
    overflows ``cap_factor`` x the mean occupancy land in the spill tail
    (scanned every query). A row assigned to the same cluster via both
    slots is inserted once. Pass ``centroids`` to skip k-means and only
    re-assign/re-pack (incremental rebuild after index growth)."""
    emb_np = np.asarray(emb, np.float32)
    suc_np = np.asarray(success, bool)
    n = len(emb_np)
    flat = emb_np.reshape(-1, emb_np.shape[-1])      # [(N*2), D]
    rows = np.repeat(np.arange(n, dtype=np.int32), 2)
    ok = suc_np.reshape(-1) & (np.linalg.norm(flat, axis=1) > 0)
    x = flat[ok]
    rows_ok = rows[ok]
    if centroids is None:
        if n_clusters is None:
            n_clusters = max(1, int(np.sqrt(max(len(x), 1))))
        cent = spherical_kmeans(x, n_clusters, iters=iters, seed=seed)
    else:
        cent = centroids
    n_clusters = int(cent.shape[0])
    assign = _chunked_argmax_sim(x, cent) if len(x) else \
        np.zeros(0, np.int32)

    members, spill_rows = pack_buckets(
        rows_ok, assign, n_clusters, len(x), cap_factor)
    return IVFIndex(
        centroids=cent,
        members=jnp.asarray(members),
        spill=jnp.asarray(spill_rows),
        n_rows=n,
    )


def calibrate_n_probe(
    ivf: IVFIndex,
    emb, success,                # the index arrays (device or host)
    queries: np.ndarray,         # [Q, D] unit-norm sample queries
    w: tuple[float, float] = (0.6, 0.4),
    target_overlap: float = 0.95,
    k: int = 10,
    threshold: float = 0.1,
) -> int:
    """Smallest power-of-two n_probe whose mean top-k overlap vs the
    exact scan meets ``target_overlap`` on the sample queries (doubling
    sweep; returns n_clusters if even a full probe is needed). Run once
    at deploy time with production-like queries, then pin the result in
    FusionConfig.ann_nprobe."""
    from .fusion import fused_topk
    emb_d = jnp.asarray(emb)
    suc_d = jnp.asarray(success)
    wa, wb = jnp.float32(w[0]), jnp.float32(w[1])
    exact = []
    for q in queries:
        out = fused_topk(jnp.asarray(q), emb_d, suc_d, wa, wb, k=k,
                         threshold=threshold)
        s = np.asarray(out["scores"])
        exact.append(set(np.asarray(out["indices"])[s > NEG_INF / 2]
                         .tolist()))
    n_probe = 1
    while n_probe < ivf.n_clusters:
        run = ivf.search_fn(k=k, n_probe=n_probe, threshold=threshold)
        overlaps = []
        for qi, q in enumerate(queries):
            out = run(jnp.asarray(q), wa, wb, emb_d, suc_d)
            s = np.asarray(out["scores"])
            got = set(np.asarray(out["indices"])[s > NEG_INF / 2]
                      .tolist())
            overlaps.append(len(got & exact[qi]) / max(len(exact[qi]), 1))
        if float(np.mean(overlaps)) >= target_overlap:
            return n_probe
        n_probe *= 2
    return ivf.n_clusters


def pack_buckets(rows_ok: np.ndarray, assign: np.ndarray,
                 n_clusters: int, n_vectors: int,
                 cap_factor: float = 4.0) \
        -> tuple[np.ndarray, np.ndarray]:
    """Vectorized bucket packing (a per-(row,slot) Python loop ran for
    minutes at the 10M target scale and executed inside the first query
    after any store growth): dedup (row, cluster) pairs, group by
    cluster with a stable sort (rows ascending within each cluster),
    fill each bucket to cap, spill the rest. Returns
    (members[C, cap] int32 -1-padded, spill[S] int32 sorted-unique)."""
    cap = max(1, int(np.ceil(cap_factor * max(n_vectors, 1) / n_clusters)))
    members = np.full((n_clusters, cap), -1, np.int32)
    if not len(rows_ok):
        return members, np.zeros(0, np.int32)
    pair = rows_ok.astype(np.int64) * n_clusters + assign.astype(np.int64)
    pair = np.unique(pair)       # both slots -> same cluster: insert once
    r = (pair // n_clusters).astype(np.int32)
    c = (pair % n_clusters).astype(np.int32)
    order = np.argsort(c, kind="stable")
    r_s, c_s = r[order], c[order]
    counts = np.bincount(c_s, minlength=n_clusters)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    pos = np.arange(len(c_s)) - starts[c_s]
    in_cap = pos < cap
    members[c_s[in_cap], pos[in_cap]] = r_s[in_cap]
    return members, np.unique(r_s[~in_cap]).astype(np.int32)
