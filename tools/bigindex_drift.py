"""Quantified rank drift of the beyond-HBM index dtypes (verdict item 7).

index/bigindex.py ships bf16 and int8(+per-vector-scale) host indexes
with drift "the same close-tie class as bf16" asserted from small
fixtures. This sweep measures it: recall@10 / MRR / overlap@10 / exact
rank agreement of each storage dtype against the f32 in-memory ground
truth, on a clustered synthetic embedding geometry (1024 unit centers +
noise — cosine margins shaped like real text embeddings, unlike i.i.d.
Gaussian vectors whose top-10 are all ties).

    python tools/bigindex_drift.py --n 100000 [--queries 50] [--out f.json]

Runs on the chip when MAS_DRIFT_TPU=1 (chunks stream through HBM),
CPU otherwise (same math, smaller default n).
"""
from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_index(path, n, d, rng, dtype, centers):
    """Write a HostIndex layout directly (no 2x-RAM SegmentStore)."""
    import ml_dtypes
    p = pathlib.Path(path)
    p.mkdir(parents=True, exist_ok=True)
    np_dtype = {"float32": np.float32, "bfloat16": ml_dtypes.bfloat16,
                "int8": np.int8}[dtype]
    emb = np.memmap(p / "emb.dat", mode="w+", dtype=np_dtype,
                    shape=(n, 2, d))
    scale = np.memmap(p / "scale.dat", mode="w+", dtype=np.float32,
                      shape=(n, 2)) if dtype == "int8" else None
    ok = np.memmap(p / "success.dat", mode="w+", dtype=np.bool_,
                   shape=(n, 2))
    f32 = np.memmap(p / "f32.dat", mode="w+", dtype=np.float32,
                    shape=(n, 2, d))
    chunk = 65_536
    c = len(centers)
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        m = hi - lo
        cid = rng.integers(0, c, size=(m, 2))
        x = centers[cid] + 0.3 * rng.normal(size=(m, 2, d))
        x /= np.linalg.norm(x, axis=-1, keepdims=True)
        x = x.astype(np.float32)
        okc = rng.random((m, 2)) > 0.15
        x *= okc[..., None]
        f32[lo:hi] = x
        ok[lo:hi] = okc
        if dtype == "int8":
            s = np.maximum(np.abs(x).max(axis=-1), 1e-12) / 127.0
            scale[lo:hi] = s
            emb[lo:hi] = np.clip(np.round(x / s[..., None]),
                                 -127, 127).astype(np.int8)
        else:
            emb[lo:hi] = x.astype(np_dtype)
    for m_ in (emb, ok, f32) + ((scale,) if scale is not None else ()):
        m_.flush()
    with open(p / "index.json", "w") as f:
        json.dump({"n": n, "dim": d, "dtype": dtype}, f)
    (p / "meta.jsonl").write_text(
        "")  # HostIndex tolerates empty meta for score-only use
    return p


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=None)
    ap.add_argument("--queries", type=int, default=50)
    ap.add_argument("--dim", type=int, default=384)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    on_tpu = bool(os.environ.get("MAS_DRIFT_TPU"))
    if not on_tpu:
        jax.config.update("jax_platforms", "cpu")
    n = args.n or (1_000_000 if on_tpu else 20_000)
    d = args.dim

    from multimodal_audio_search_tpu.index.bigindex import HostIndex
    from multimodal_audio_search_tpu.index.eval import (
        mrr, overlap_at_k, rank_agreement, recall_at_k)

    rng = np.random.default_rng(args.seed)
    centers = rng.normal(size=(1024, d))
    centers /= np.linalg.norm(centers, axis=-1, keepdims=True)

    root = pathlib.Path(tempfile.mkdtemp(prefix="bigidx_"))
    paths = {}
    for dtype in ("float32", "bfloat16", "int8"):
        # identical f32 source data for all dtypes: same rng seed stream
        paths[dtype] = make_index(root / dtype, n, d,
                                  np.random.default_rng(args.seed + 1),
                                  dtype, centers)

    queries = centers[rng.integers(0, 1024, size=args.queries)] \
        + 0.25 * rng.normal(size=(args.queries, d))
    queries /= np.linalg.norm(queries, axis=-1, keepdims=True)
    queries = queries.astype(np.float32)
    weights = rng.uniform(0.2, 0.8, size=args.queries).astype(np.float32)

    results = {}
    timing = {}
    for dtype in ("float32", "bfloat16", "int8"):
        idx = HostIndex(paths[dtype])
        ranked = []
        t0 = time.perf_counter()
        for qi in range(args.queries):
            s, i = idx.search(queries[qi], weights[qi], 1 - weights[qi],
                              k=10)
            ranked.append([int(v) for v in i])
        timing[dtype] = round((time.perf_counter() - t0)
                              / args.queries * 1e3, 1)
        results[dtype] = ranked

    truth = results["float32"]
    out_modes = {}
    for dtype in ("bfloat16", "int8"):
        r = results[dtype]
        out_modes[dtype] = {
            "recall@10": round(float(np.mean(
                [recall_at_k(r[q], truth[q], 10)
                 for q in range(args.queries)])), 4),
            "mrr_vs_f32": round(float(np.mean(
                [mrr(r[q], truth[q][:1]) for q in range(args.queries)])),
                4),
            "overlap@10": round(float(np.mean(
                [overlap_at_k(r[q], truth[q], 10)
                 for q in range(args.queries)])), 4),
            "rank_agreement@10": round(float(np.mean(
                [rank_agreement(r[q], truth[q], 10)
                 for q in range(args.queries)])), 4),
            "query_ms": timing[dtype],
        }
    out = {"metric": "bigindex_drift", "n": n, "dim": d,
           "queries": args.queries, "platform": jax.devices()[0].platform,
           "f32_query_ms": timing["float32"], "modes": out_modes}
    line = json.dumps(out)
    print(line)
    if args.out:
        pathlib.Path(args.out).write_text(line + "\n")


if __name__ == "__main__":
    main()
