"""Beyond-HBM IVF proof at 10M rows (round-4 verdict item 5).

The claim under test: at 10M rows the memmap-backed IVF path
(index/bigindex.py::HostIndex.search_ivf) ships TENS OF MB per query
instead of the whole index (int8: ~8 GB; f32: ~31 GB), with recall@10
vs the exact chunk-streamed scan recorded rather than extrapolated
from the 1M in-HBM run (docs/onchip_r4/ivf_1m.out).

What runs, end to end on the REAL on-disk layout:
  1. stream 10M topical-mixture rows into a HostIndexWriter (int8 +
     per-vector scales by default: 10M x 2 x 384 = 7.7 GB on disk; the
     f32 source is never materialized),
  2. HostIndex.build_ivf(): subsampled spherical k-means + full
     streaming assignment pass,
  3. exact baseline: HostIndex.search() (chunk-streamed full scan),
  4. search_ivf at a doubling n_probe ladder: p50 latency, recall@10
     vs exact, bytes shipped per query (HostIndex.last_query_bytes).

One JSON line per case, bench.py-style. CPU is the documented target
for this artifact (the scaling story is host->device bytes, which the
layout fixes regardless of backend); pass nothing on the TPU host for
the chip run. Sized-down smoke: --rows 200000.

    nohup python tools/bench_ivf_10m.py --cpu > /tmp/ivf10m.out 2>&1 &

Reference scaling cliff this replaces: the per-segment Python cosine
loop at audio_search.py:639-651.
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_000_000)
    ap.add_argument("--d", type=int, default=384)
    ap.add_argument("--dtype", default="int8",
                    choices=("int8", "bfloat16", "float32"))
    ap.add_argument("--queries", type=int, default=25)
    ap.add_argument("--clusters", type=int, default=None,
                    help="default sqrt(2N) ~ 4472 at 10M")
    ap.add_argument("--path", default="/tmp/mas_ivf10m")
    ap.add_argument("--keep", action="store_true",
                    help="keep the on-disk index (default: delete)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the axon TPU plugin "
                    "ignores JAX_PLATFORMS)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from multimodal_audio_search_tpu.index.bigindex import (
        HostIndex, HostIndexWriter)

    n, d = args.rows, args.d
    rng = np.random.default_rng(0)
    # topical mixture, same recipe as tools/bench_ivf.py: text/audio
    # embeddings of real transcripts cluster by subject, so rows are
    # noisy copies of unit topic centers and queries land near topics
    topics = max(64, n // 2000)
    cent = rng.normal(size=(topics, d)).astype(np.float32)
    cent /= np.linalg.norm(cent, axis=-1, keepdims=True)
    s_row, s_q = 0.35 / np.sqrt(d), 0.5 / np.sqrt(d)

    t0 = time.perf_counter()
    w = HostIndexWriter(args.path, n, d, dtype=args.dtype)
    chunk = 131_072
    for lo in range(0, n, chunk):
        m = min(chunk, n - lo)
        t_row = rng.integers(0, topics, size=m)
        # f32 draws directly: f64 normal + astype dominated the write
        # pass at the 10M scale on the 1-core host
        emb = (cent[t_row][:, None, :] + s_row * rng.standard_normal(
            size=(m, 2, d), dtype=np.float32))
        emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
        ok = rng.random((m, 2)) > 0.2
        emb[~ok] = 0.0
        w.append(emb, ok)
    hi = w.finalize()
    write_s = time.perf_counter() - t0
    disk_gb = sum(f.stat().st_size for f in
                  pathlib.Path(args.path).glob("*.dat")) / 1e9
    print(json.dumps({"case": "write", "rows": n, "dtype": args.dtype,
                      "disk_gb": round(disk_gb, 2),
                      "write_s": round(write_s, 1)}), flush=True)

    t0 = time.perf_counter()
    hi.build_ivf(n_clusters=args.clusters)
    build_s = time.perf_counter() - t0
    cent_i, members, spill = hi._ivf
    print(json.dumps({
        "case": "build_ivf", "n_clusters": int(cent_i.shape[0]),
        "cap": int(members.shape[1]), "spill": int(spill.shape[0]),
        "build_s": round(build_s, 1)}), flush=True)

    qt = rng.integers(0, topics, size=args.queries)
    qs = cent[qt] + s_q * rng.standard_normal(
        size=(args.queries, d), dtype=np.float32)
    qs /= np.linalg.norm(qs, axis=-1, keepdims=True)

    # exact baseline: the chunk-streamed full scan over the memmap
    exact_sets, ts = [], []
    for q in qs:
        t0 = time.perf_counter()
        s, gi = hi.search(q, 0.6, 0.4, k=10)
        ts.append(time.perf_counter() - t0)
        exact_sets.append(set(gi[s > -1e29].tolist()))
    full_gb = (hi.emb.nbytes + hi.success.nbytes
               + (hi.scale.nbytes if hi.scale is not None else 0)) / 1e9
    print(json.dumps({
        "case": "exact_stream", "p50_ms": round(
            float(np.percentile(ts[1:], 50)) * 1e3, 1),
        "bytes_per_query_gb": round(full_gb, 2)}), flush=True)

    for n_probe in (2, 4, 8, 16, 32):
        ts, overlaps, shipped, cands = [], [], [], []
        for qi, q in enumerate(qs):
            t0 = time.perf_counter()
            s, gi = hi.search_ivf(q, 0.6, 0.4, k=10, n_probe=n_probe)
            ts.append(time.perf_counter() - t0)
            got = set(gi[s > -1e29].tolist())
            overlaps.append(len(got & exact_sets[qi])
                            / max(len(exact_sets[qi]), 1))
            shipped.append(hi.last_query_bytes)
            cands.append(hi.last_query_candidates)
        print(json.dumps({
            "case": f"ivf@{n_probe}",
            "p50_ms": round(float(np.percentile(ts[1:], 50)) * 1e3, 1),
            "recall10_vs_exact": round(float(np.mean(overlaps)), 4),
            "shipped_mb_per_query": round(
                float(np.mean(shipped)) / 1e6, 1),
            "candidates": int(np.mean(cands)),
            "scanned_frac": round(float(np.mean(cands)) / n, 5),
        }), flush=True)

    if not args.keep:
        import shutil
        shutil.rmtree(args.path, ignore_errors=True)


if __name__ == "__main__":
    main()
    # hard-exit: the axon client teardown can hang post-measurement and
    # starve every later chip client (seen round 5 with bench.py; same
    # guard there). All output is flushed/written by main() already.
    import os
    os._exit(0)
