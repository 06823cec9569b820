"""Beyond-HBM index: memory-mapped host store + chunk-streamed search.

A v5e chip holds ~5M f32 segments of [N, 2, 384] index in HBM next to the
models; past that (or on memory-constrained hosts) the index lives on
disk/host RAM as numpy memmaps and search streams it through the device
in fixed-size chunks:

    for each chunk:  device_put (async) -> fused scores -> local top-k
    merge the per-chunk candidates on host  (same math as the sharded
    ICI merge in parallel/sharding.py, so results == in-memory fused_topk)

JAX dispatch is asynchronous, so chunk i+1's host->device transfer
overlaps chunk i's scoring without explicit double-buffer plumbing; the
chunk size trades HBM residency (2 chunks in flight) against dispatch
count.

Storage dtypes: float32 (parity), bfloat16, or int8 with per-vector
scales (4x smaller; scores are dequantized on device, rank drift is the
same close-tie class as bf16 — opt-in).

Layout on disk (build from a SegmentStore via ``build_host_index``):
    emb.dat      [N, 2, D]  (dtype)
    scale.dat    [N, 2] f32         (int8 only)
    success.dat  [N, 2] bool
    meta.jsonl   one segment record per line
"""
from __future__ import annotations

import functools
import json
import pathlib

import jax
import jax.numpy as jnp
import numpy as np

from .fusion import NEG_INF, fused_scores


def build_host_index(store, path, dtype: str = "float32",
                     chunk: int = 262_144) -> "HostIndex":
    """Write a SegmentStore's index as memmaps (streams; no 2x RAM)."""
    p = pathlib.Path(path)
    p.mkdir(parents=True, exist_ok=True)
    n = len(store)
    emb = store.embeddings[:n]          # [N, 2, D] float32 (host)
    ok = store.success[:n]
    d = emb.shape[-1]
    np_dtype = {"float32": np.float32, "bfloat16": np.float32,
                "int8": np.int8}[dtype]
    if dtype == "bfloat16":
        import ml_dtypes
        np_dtype = ml_dtypes.bfloat16
    out = np.memmap(p / "emb.dat", mode="w+", dtype=np_dtype,
                    shape=(n, 2, d))
    scale = None
    if dtype == "int8":
        scale = np.memmap(p / "scale.dat", mode="w+", dtype=np.float32,
                          shape=(n, 2))
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        x = emb[lo:hi]
        if dtype == "int8":
            s = np.maximum(np.abs(x).max(axis=-1), 1e-12) / 127.0
            scale[lo:hi] = s
            out[lo:hi] = np.clip(np.round(x / s[..., None]),
                                 -127, 127).astype(np.int8)
        else:
            out[lo:hi] = x.astype(np_dtype)
    out.flush()
    if scale is not None:
        scale.flush()
    okm = np.memmap(p / "success.dat", mode="w+", dtype=np.bool_,
                    shape=(n, 2))
    okm[:] = ok
    okm.flush()
    with open(p / "meta.jsonl", "w") as f:
        for m in store.meta[:n]:
            f.write(json.dumps({k: v for k, v in m.items()
                                if k not in ("audio_data",)},
                               default=float) + "\n")
    import uuid
    (p / "ivf.npz").unlink(missing_ok=True)   # layout of any prior build
    with open(p / "index.json", "w") as f:
        json.dump({"n": n, "dim": d, "dtype": dtype,
                   "build_id": uuid.uuid4().hex}, f)
    return HostIndex(p)


class HostIndexWriter:
    """Stream a host index to disk without materializing the source
    in RAM (build_host_index needs a whole SegmentStore; ingest at the
    10M+ scale produces embeddings in batches). Append [n_i, 2, D] f32
    chunks; rows are quantized to the storage dtype on the fly.

        w = HostIndexWriter(path, n_total, d, dtype="int8")
        for emb_chunk, success_chunk, meta_chunk in batches:
            w.append(emb_chunk, success_chunk, meta_chunk)
        hi = w.finalize()
    """

    def __init__(self, path, n: int, d: int, dtype: str = "float32"):
        self.p = pathlib.Path(path)
        self.p.mkdir(parents=True, exist_ok=True)
        self.n, self.d, self.dtype = n, d, dtype
        np_dtype = {"float32": np.float32, "bfloat16": np.float32,
                    "int8": np.int8}[dtype]
        if dtype == "bfloat16":
            import ml_dtypes
            np_dtype = ml_dtypes.bfloat16
        self._emb = np.memmap(self.p / "emb.dat", mode="w+",
                              dtype=np_dtype, shape=(n, 2, d))
        self._scale = np.memmap(
            self.p / "scale.dat", mode="w+", dtype=np.float32,
            shape=(n, 2)) if dtype == "int8" else None
        self._ok = np.memmap(self.p / "success.dat", mode="w+",
                             dtype=np.bool_, shape=(n, 2))
        self._meta = open(self.p / "meta.jsonl", "w")
        self._row = 0

    def append(self, emb: np.ndarray, success: np.ndarray,
               meta: list[dict] | None = None) -> None:
        lo, hi = self._row, self._row + len(emb)
        if hi > self.n:
            raise ValueError(f"writer sized for {self.n} rows, got {hi}")
        if self.dtype == "int8":
            s = np.maximum(np.abs(emb).max(axis=-1), 1e-12) / 127.0
            self._scale[lo:hi] = s
            self._emb[lo:hi] = np.clip(np.round(emb / s[..., None]),
                                       -127, 127).astype(np.int8)
        else:
            self._emb[lo:hi] = emb.astype(self._emb.dtype)
        self._ok[lo:hi] = success
        for m in (meta if meta is not None else
                  ({} for _ in range(len(emb)))):
            self._meta.write(json.dumps(m, default=float) + "\n")
        self._row = hi

    def finalize(self, chunk: int = 262_144) -> "HostIndex":
        if self._row != self.n:
            raise ValueError(f"wrote {self._row} of {self.n} rows")
        self._emb.flush()
        if self._scale is not None:
            self._scale.flush()
        self._ok.flush()
        self._meta.close()
        import uuid
        (self.p / "ivf.npz").unlink(missing_ok=True)
        with open(self.p / "index.json", "w") as f:
            json.dump({"n": self.n, "dim": self.d, "dtype": self.dtype,
                       "build_id": uuid.uuid4().hex}, f)
        return HostIndex(self.p, chunk=chunk)


class HostIndex:
    """Memory-mapped [N, 2, D] index searched in device-streamed chunks."""

    def __init__(self, path, chunk: int = 262_144):
        p = pathlib.Path(path)
        spec = json.loads((p / "index.json").read_text())
        self.n, self.dim, self.dtype = spec["n"], spec["dim"], spec["dtype"]
        np_dtype = np.int8 if self.dtype == "int8" else (
            __import__("ml_dtypes").bfloat16
            if self.dtype == "bfloat16" else np.float32)
        self.emb = np.memmap(p / "emb.dat", mode="r", dtype=np_dtype,
                             shape=(self.n, 2, self.dim))
        self.scale = np.memmap(
            p / "scale.dat", mode="r", dtype=np.float32,
            shape=(self.n, 2)) if self.dtype == "int8" else None
        self.success = np.memmap(p / "success.dat", mode="r",
                                 dtype=np.bool_, shape=(self.n, 2))
        self.meta = [json.loads(line)
                     for line in (p / "meta.jsonl").read_text().splitlines()]
        self.chunk = chunk
        self.max_candidate_bytes = 512 * 1024 * 1024
        self.path = p
        self.build_id = spec.get("build_id", "")
        self._ivf = None                # (centroids, members, spill)
        ivf_p = p / "ivf.npz"
        if ivf_p.exists():
            z = np.load(ivf_p)
            # stale layouts are ignored: the build_id ties the layout to
            # ONE build_host_index run (a same-size rebuild at the same
            # path would otherwise reuse buckets built for other data —
            # the same bug class SegmentStore.version fixes in-memory);
            # build_host_index also unlinks ivf.npz.
            bid = str(z["build_id"]) if "build_id" in z.files else ""
            if int(z["n"]) == self.n and bid == self.build_id:
                self._ivf = (z["centroids"], z["members"], z["spill"])

        @functools.partial(jax.jit, static_argnames=("k", "threshold"))
        def _chunk_topk(q, emb, success, scale, w_a, w_b, k, threshold):
            e = emb.astype(jnp.float32)
            if scale is not None:
                e = e * scale[..., None]
            masked, _ = fused_scores(q, e, success, w_a, w_b, threshold)
            kk = min(k, masked.shape[0])
            return jax.lax.top_k(masked, kk)
        self._chunk_topk = _chunk_topk

    def __len__(self) -> int:
        return self.n

    # ------------------------------------------------------------ IVF (ANN)
    def _rows_f32(self, idx: np.ndarray) -> np.ndarray:
        """Dequantized [len(idx), 2, D] f32 rows (host)."""
        x = np.asarray(self.emb[idx], np.float32) \
            if self.dtype != "int8" else \
            self.emb[idx].astype(np.float32) * self.scale[idx][..., None]
        return x

    def build_ivf(self, n_clusters: int | None = None,
                  cap_factor: float = 4.0, iters: int = 10, seed: int = 0,
                  save: bool = True, sample: int = 16384) -> None:
        """One streaming pass over the memmap: train spherical k-means on
        a row subsample, assign every successful (row, slot) vector, pack
        buckets (index/ivf.py::pack_buckets). Persisted as ivf.npz next
        to the memmaps (save=True) and auto-loaded by __init__, so the
        build cost is paid once per index, not per process."""
        from .ivf import _chunked_argmax_sim, pack_buckets, spherical_kmeans
        rng = np.random.default_rng(seed)
        take = min(self.n, max(sample // 2, 1))
        t_rows = np.sort(rng.choice(self.n, size=take, replace=False))
        xs = self._rows_f32(t_rows).reshape(-1, self.dim)
        oks = np.asarray(self.success[t_rows]).reshape(-1) \
            & (np.linalg.norm(xs, axis=1) > 0)
        if n_clusters is None:
            n_clusters = max(1, int(np.sqrt(2 * self.n)))
        cent = spherical_kmeans(xs[oks], n_clusters, iters=iters,
                                seed=seed)
        n_clusters = int(cent.shape[0])
        rows_all, assign_all, n_vec = [], [], 0
        for lo in range(0, self.n, self.chunk):
            hi = min(lo + self.chunk, self.n)
            x = self._rows_f32(np.arange(lo, hi)).reshape(-1, self.dim)
            ok = np.asarray(self.success[lo:hi]).reshape(-1) \
                & (np.linalg.norm(x, axis=1) > 0)
            rows = np.repeat(np.arange(lo, hi, dtype=np.int32), 2)[ok]
            if len(rows):
                rows_all.append(rows)
                assign_all.append(_chunked_argmax_sim(x[ok], cent))
                n_vec += len(rows)
        rows_ok = np.concatenate(rows_all) if rows_all else \
            np.zeros(0, np.int32)
        assign = np.concatenate(assign_all) if assign_all else \
            np.zeros(0, np.int32)
        members, spill = pack_buckets(rows_ok, assign, n_clusters, n_vec,
                                      cap_factor)
        self._ivf = (np.asarray(cent, np.float32), members, spill)
        if save:
            np.savez(self.path / "ivf.npz", n=self.n,
                     build_id=self.build_id,
                     centroids=self._ivf[0], members=members, spill=spill)

    def search_ivf(self, query_emb, asr_weight, audio_weight, k: int = 10,
                   n_probe: int = 8, threshold: float = 0.1):
        """Sublinear beyond-HBM search: centroid probe on host, gather
        ONLY candidate rows from the memmap, ship them in the storage
        dtype, score+top-k with the same device program as the streamed
        path. Host->device traffic per query drops from the whole index
        to ~n_probe/C of it — the difference between 30 GB and tens of
        MB at 10M rows on a transfer-bound host. Full probe == search()."""
        if self._ivf is None:
            self.build_ivf()
        cent, members, spill = self._ivf
        q = np.asarray(query_emb, np.float32)
        cs = cent @ q
        n_probe = min(n_probe, len(cs))
        probe = np.argpartition(-cs, n_probe - 1)[:n_probe]
        cand = members[probe].reshape(-1)
        cand = cand[cand >= 0]
        if spill.size:
            cand = np.concatenate([cand, spill])
        cand = np.unique(cand)          # host dedup: rows scored once
        if cand.size == 0:
            return (np.zeros(0, np.float32), np.zeros(0, np.int64))
        # a near-full probe would materialize ~the whole index in host
        # RAM as one padded buffer, defeating the memmap design — past
        # the budget, the chunk-streamed exact path is both cheaper and
        # identical in results (superset candidate set)
        cand_bytes = 2 * cand.size * (2 * self.dim * self.emb.itemsize
                                      + (8 if self.scale is not None
                                         else 0))
        if cand_bytes > self.max_candidate_bytes:
            self.last_query_bytes = self.emb.nbytes + self.success.nbytes \
                + (self.scale.nbytes if self.scale is not None else 0)
            self.last_query_candidates = self.n
            return self.search(query_emb, asr_weight, audio_weight, k=k,
                               threshold=threshold)
        # pad to a power-of-two bucket so the jitted program compiles
        # once per bucket; padding rows have success=False
        b = 1024
        while b < cand.size:
            b *= 2
        # observability: host->device bytes this query actually ships
        # (the whole point of the IVF path at beyond-HBM scale — tens of
        # MB instead of the full index; asserted by test_bigindex)
        self.last_query_bytes = b * (2 * self.dim * self.emb.itemsize
                                     + 1 + (8 if self.scale is not None
                                            else 0))
        self.last_query_candidates = int(cand.size)
        emb_c = np.zeros((b, 2, self.dim), self.emb.dtype)
        ok_c = np.zeros((b, 2), np.bool_)
        emb_c[: cand.size] = self.emb[cand]
        ok_c[: cand.size] = self.success[cand]
        sc_d = None
        if self.scale is not None:
            sc_c = np.zeros((b, 2), np.float32)
            sc_c[: cand.size] = self.scale[cand]
            sc_d = jnp.asarray(sc_c)
        s, li = self._chunk_topk(
            jnp.asarray(np.asarray(query_emb, np.float32)),
            jnp.asarray(emb_c), jnp.asarray(ok_c), sc_d,
            jnp.float32(asr_weight), jnp.float32(audio_weight),
            k=min(k, int(cand.size)), threshold=threshold)
        s = np.asarray(s)
        gi = np.where(np.asarray(li) < cand.size,
                      cand[np.minimum(np.asarray(li), cand.size - 1)], -1)
        return s, gi

    def search(self, query_emb, asr_weight, audio_weight, k: int = 10,
               threshold: float = 0.1):
        """(scores[k], indices[k]) == in-memory fused_topk on the same
        data (merge math identical; parity-tested)."""
        q = jnp.asarray(np.asarray(query_emb, np.float32))
        wa = jnp.float32(asr_weight)
        wb = jnp.float32(audio_weight)
        pending = []  # (lo, (scores, idx) device futures)
        for lo in range(0, self.n, self.chunk):
            hi = min(lo + self.chunk, self.n)
            emb_d = jnp.asarray(self.emb[lo:hi])     # async H->D
            ok_d = jnp.asarray(self.success[lo:hi])
            sc_d = jnp.asarray(self.scale[lo:hi]) \
                if self.scale is not None else None
            pending.append(
                (lo, self._chunk_topk(q, emb_d, ok_d, sc_d, wa, wb,
                                      k=k, threshold=threshold)))
        all_s, all_i = [], []
        for lo, (s, i) in pending:
            all_s.append(np.asarray(s))
            all_i.append(np.asarray(i) + lo)
        s = np.concatenate(all_s)
        i = np.concatenate(all_i)
        order = np.argsort(-s, kind="stable")[:k]
        return s[order], i[order]

    def records(self, indices, scores) -> list[dict]:
        out = []
        for idx, sc in zip(indices, scores):
            if sc <= NEG_INF / 2:
                continue
            r = dict(self.meta[int(idx)])
            r["index"] = int(idx)
            r["fusion_score"] = float(sc)
            out.append(r)
        return out
