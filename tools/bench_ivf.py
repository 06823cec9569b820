"""IVF vs exact fused-search scaling (index/ivf.py vs index/fusion.py).

Measures, at --n rows (1M default on TPU): exact fused_topk p50, IVF p50
at several n_probe settings, recall@10 / top-10 overlap vs exact over
--queries random queries, plus build time. One JSON line per
configuration (TPU discipline: run in background, never SIGKILL
mid-compile).

    nohup python tools/bench_ivf.py > /tmp/bench_ivf.out 2>&1 &
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
    ap.add_argument("--n", type=int, default=None)
    ap.add_argument("--d", type=int, default=384)
    ap.add_argument("--queries", type=int, default=20)
    ap.add_argument("--clusters", type=int, default=None)
    ap.add_argument("--uniform", action="store_true",
                    help="uniform random vectors instead of the topical "
                    "mixture (ANN worst case; recall will be low)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the axon TPU plugin "
                    "ignores JAX_PLATFORMS; without this flag a wedged "
                    "tunnel hangs backend init ~25 min)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from multimodal_audio_search_tpu.index.fusion import fused_topk
    from multimodal_audio_search_tpu.index.ivf import build_ivf

    on_tpu = jax.devices()[0].platform == "tpu"
    n = args.n or (1_000_000 if on_tpu else 20_000)
    rng = np.random.default_rng(0)
    if args.uniform:
        # uniform random vectors on the 384-sphere have NO neighborhood
        # structure (worst case for any ANN — recall is meaningless
        # here); kept as a stress configuration only
        emb = rng.normal(size=(n, 2, args.d)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
        qs = rng.normal(size=(args.queries, args.d)).astype(np.float32)
        qs /= np.linalg.norm(qs, axis=-1, keepdims=True)
    else:
        # realistic topical structure: text embeddings of transcripts
        # cluster by subject, so rows are a topic mixture (centers on
        # the sphere, sigma=0.35 intra-topic spread) and queries land
        # near topics — the regime IVF is for
        topics = max(64, n // 2000)
        cent = rng.normal(size=(topics, args.d)).astype(np.float32)
        cent /= np.linalg.norm(cent, axis=-1, keepdims=True)
        t_row = rng.integers(0, topics, size=n)
        # per-coordinate sigma scales 1/sqrt(d) so the NOISE VECTOR's
        # norm (sigma*sqrt(d)) is the stated fraction of the unit
        # center — at 384-D an unscaled 0.35 per coordinate would give
        # ||noise|| ~ 6.9 and reduce to the uniform worst case
        s_row, s_q = 0.35 / np.sqrt(args.d), 0.5 / np.sqrt(args.d)
        emb = (cent[t_row][:, None, :]
               + s_row * rng.normal(size=(n, 2, args.d))).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
        qt = rng.integers(0, topics, size=args.queries)
        qs = (cent[qt] + s_q * rng.normal(
            size=(args.queries, args.d))).astype(np.float32)
        qs /= np.linalg.norm(qs, axis=-1, keepdims=True)
    success = rng.random((n, 2)) > 0.2
    emb[~success] = 0.0

    emb_d = jax.device_put(jnp.asarray(emb))
    suc_d = jax.device_put(jnp.asarray(success))
    wa, wb = jnp.float32(0.6), jnp.float32(0.4)

    def p50(fn):
        ts = []
        for qi in range(args.queries):
            t0 = time.perf_counter()
            out = fn(jnp.asarray(qs[qi]))
            _ = np.asarray(out["scores"])[0]
            ts.append(time.perf_counter() - t0)
        return float(np.percentile(ts[1:], 50) * 1e3)

    exact_res = []

    def run_exact(q):
        out = fused_topk(q, emb_d, suc_d, wa, wb, k=10)
        return out

    t_exact = p50(run_exact)
    for qi in range(args.queries):
        out = run_exact(jnp.asarray(qs[qi]))
        s = np.asarray(out["scores"])
        exact_res.append(set(np.asarray(out["indices"])[s > -1e29]
                             .tolist()))
    print(json.dumps({"case": "exact", "n": n, "p50_ms": round(t_exact, 2)}),
          flush=True)

    t0 = time.perf_counter()
    ivf = build_ivf(emb, success, n_clusters=args.clusters)
    build_s = time.perf_counter() - t0
    print(json.dumps({"case": "build", "n_clusters": ivf.n_clusters,
                      "cap": int(ivf.members.shape[1]),
                      "spill": int(ivf.spill.shape[0]),
                      "build_s": round(build_s, 1)}), flush=True)

    for n_probe in (4, 8, 16, 32, 64):
        if n_probe > ivf.n_clusters:
            break
        run = ivf.search_fn(k=10, n_probe=n_probe)
        fn = lambda q: run(q, wa, wb, emb_d, suc_d)  # noqa: E731
        t_ivf = p50(fn)
        overlaps = []
        for qi in range(args.queries):
            out = fn(jnp.asarray(qs[qi]))
            s = np.asarray(out["scores"])
            got = set(np.asarray(out["indices"])[s > -1e29].tolist())
            denom = max(len(exact_res[qi]), 1)
            overlaps.append(len(got & exact_res[qi]) / denom)
        frac = n_probe * ivf.members.shape[1] + ivf.spill.shape[0]
        print(json.dumps({
            "case": f"ivf@{n_probe}", "p50_ms": round(t_ivf, 2),
            "recall10_vs_exact": round(float(np.mean(overlaps)), 4),
            "scanned_frac": round(float(frac) / max(2 * n, 1), 4),
        }), flush=True)


if __name__ == "__main__":
    main()
    # hard-exit: the axon client teardown can hang post-measurement and
    # starve every later chip client (seen round 5 with bench.py; same
    # guard there). All output is flushed/written by main() already.
    import os
    os._exit(0)
