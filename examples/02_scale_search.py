"""Search at scale: exact fused top-k, IVF candidate generation, and the
beyond-HBM host index — all over the same synthetic topical index.

    python examples/02_scale_search.py --cpu [--n 20000]
"""
import argparse
import sys
import tempfile

import numpy as np

import os

sys.path.insert(0, os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--n", type=int, default=5000)
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    from multimodal_audio_search_tpu.index.bigindex import (
        HostIndex, build_host_index)
    from multimodal_audio_search_tpu.index.fusion import fused_topk
    from multimodal_audio_search_tpu.index.ivf import (
        build_ivf, calibrate_n_probe)
    from multimodal_audio_search_tpu.index.store import SegmentStore

    # topical mixture (text embeddings cluster by subject)
    rng = np.random.default_rng(0)
    n, d = args.n, 64
    topics = 64
    cent = rng.normal(size=(topics, d)).astype(np.float32)
    cent /= np.linalg.norm(cent, axis=-1, keepdims=True)
    rows = cent[rng.integers(0, topics, size=n)]
    emb = (rows[:, None, :] + (0.35 / np.sqrt(d)) * rng.normal(
        size=(n, 2, d))).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    success = rng.random((n, 2)) > 0.2
    emb[~success] = 0.0
    q = (cent[7] + (0.4 / np.sqrt(d)) * rng.normal(size=d)) \
        .astype(np.float32)
    q /= np.linalg.norm(q)

    # 1) exact: one fused program over the whole index
    out = fused_topk(jnp.asarray(q), jnp.asarray(emb),
                     jnp.asarray(success), jnp.float32(0.6),
                     jnp.float32(0.4), k=10)
    exact_ids = np.asarray(out["indices"])
    print("exact top-10:", exact_ids.tolist())

    # 2) IVF: sublinear candidate generation, exact rescoring
    ivf = build_ivf(emb, success)
    qs = (cent[rng.integers(0, topics, size=8)]
          + (0.4 / np.sqrt(d)) * rng.normal(size=(8, d))).astype(np.float32)
    qs /= np.linalg.norm(qs, axis=-1, keepdims=True)
    n_probe = calibrate_n_probe(ivf, emb, success, qs,
                                target_overlap=0.95)
    run = ivf.search_fn(k=10, n_probe=n_probe)
    out = run(jnp.asarray(q), jnp.float32(0.6), jnp.float32(0.4),
              jnp.asarray(emb), jnp.asarray(success))
    ivf_ids = np.asarray(out["indices"])
    frac = n_probe / ivf.n_clusters
    print(f"ivf top-10 (n_probe={n_probe}/{ivf.n_clusters}, "
          f"~{100*frac:.0f}% scanned):", ivf_ids.tolist())

    # 3) beyond-HBM: memmap store + int8 storage + persisted IVF
    store = SegmentStore(embed_dim=d, keep_audio=False)
    for i in range(n):
        store.add({"segment_id": f"s{i}"},
                  emb[i, 0] if success[i, 0] else None,
                  emb[i, 1] if success[i, 1] else None)
    with tempfile.TemporaryDirectory() as tdir:
        build_host_index(store, tdir, dtype="int8")
        host = HostIndex(tdir)
        host.build_ivf()
        s, i = host.search_ivf(q, 0.6, 0.4, k=10, n_probe=n_probe)
        print("host int8 ivf top-10:", i[s > -1e29].tolist())


if __name__ == "__main__":
    main()
