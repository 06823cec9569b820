"""Query-latency scaling: fused search at 100k / 400k / 1M segments.

Run plainly on the TPU. The index is GENERATED ON DEVICE (a 1M-segment
f32 index is 3 GB; the tunneled host link at ~18 MB/s would take minutes
to ship what the chip can synthesize in milliseconds) — content is
irrelevant to timing.

Measures, per index size and dtype:
  * full production query path p50 (host tokenize -> jitted MiniLM embed
    + fused score + renormalize + threshold + top-k, ONE dispatch)
  * device-only search time (RTT-corrected) for the XLA fused_topk and
    the Pallas scoring kernel (ops/fused_search.py) + lax.top_k
  * achieved HBM fraction vs the 812 GB/s streaming calibration

Target (BASELINE.md + VERDICT round 1 item 8): p50 < 50 ms at 1M
segments in the f32 parity mode.
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp
    from bench import _sync_time
    from multimodal_audio_search_tpu.index.fusion import (
        fused_topk, fused_topk_impl)
    from multimodal_audio_search_tpu.models import minilm
    from multimodal_audio_search_tpu.models.minilm import MiniLMConfig
    from multimodal_audio_search_tpu.ops.fused_search import (
        pallas_fused_scores)
    from multimodal_audio_search_tpu.pipelines.embed import TextEmbedder

    platform = jax.devices()[0].platform
    on_tpu = platform == "tpu"
    sizes = [100_000, 400_000, 1_000_000] if on_tpu else [4096]
    dtypes = [jnp.float32, jnp.bfloat16] if on_tpu else [jnp.float32]
    rtt = _sync_time(jax.jit(lambda x: x + 1), jnp.zeros(()))
    print(f"platform={platform} rtt={rtt*1e3:.1f} ms", flush=True)

    emb_pipe = TextEmbedder(cfg=MiniLMConfig(),
                            dtype=jnp.bfloat16 if on_tpu else jnp.float32)

    @functools.partial(jax.jit, static_argnames=("n", "dtype"))
    def make_index(key, n, dtype):
        e = jax.random.normal(key, (n, 2, 384), jnp.float32)
        e = e / jnp.linalg.norm(e, axis=-1, keepdims=True)
        ok = jax.random.uniform(jax.random.fold_in(key, 1), (n, 2)) > 0.2
        return e.astype(dtype), ok

    @functools.partial(jax.jit, static_argnames=("k", "threshold"))
    def query_program(params, ids, mask, index_emb, success, w_a, w_b,
                      *, k, threshold):
        qv = minilm.sentence_embed(params, ids, mask, emb_pipe.cfg)[0]
        return fused_topk_impl(qv, index_emb, success, w_a, w_b,
                               k=k, threshold=threshold)

    @jax.jit
    def pallas_search(q, e, ok, wa, wb):
        scores = pallas_fused_scores(q, e, ok, wa, wb)
        return jax.lax.top_k(scores, 10)

    results = []
    for dtype in dtypes:
        for n in sizes:
            e, ok = make_index(jax.random.PRNGKey(0), n, dtype)
            jax.block_until_ready((e, ok))
            q = jnp.asarray(np.asarray(e[123, 0], np.float32))
            wa, wb = jnp.float32(0.6), jnp.float32(0.4)

            t_xla = max(_sync_time(
                lambda: fused_topk(q, e, ok, wa, wb, k=10)) - rtt, 1e-5)
            t_pl = max(_sync_time(
                lambda: pallas_search(q, e, ok, wa, wb)) - rtt, 1e-5)

            lat = []
            for i in range(20):
                t0 = time.perf_counter()
                ids, mask = emb_pipe.tokenizer.encode(
                    [f"music with drums number {i}"], emb_pipe.max_tokens)
                out = query_program(
                    emb_pipe.params, jnp.asarray(ids), jnp.asarray(mask),
                    e, ok, wa, wb, k=10, threshold=0.1)
                _ = np.asarray(out["scores"])
                lat.append(time.perf_counter() - t0)
            p50 = float(np.percentile(lat[1:], 50) * 1e3)

            gb = n * 2 * 384 * np.dtype(dtype).itemsize / 1e9
            row = {
                "n": n, "dtype": np.dtype(dtype).name,
                "query_p50_ms": round(p50, 2),
                "xla_device_ms": round(t_xla * 1e3, 2),
                "pallas_device_ms": round(t_pl * 1e3, 2),
                "xla_gbps": round(gb / t_xla, 0),
                "pallas_gbps": round(gb / t_pl, 0),
                "hbm_frac_pallas": round(gb / t_pl / 812, 3),
            }
            results.append(row)
            print(json.dumps(row), flush=True)
            del e, ok
    ok_1m = [r for r in results
             if r["n"] == 1_000_000 and r["dtype"] == "float32"]
    if ok_1m:
        verdict = "PASS" if ok_1m[0]["query_p50_ms"] < 50 else "FAIL"
        print(f"1M f32 parity p50 target <50 ms: {verdict}")


if __name__ == "__main__":
    main()
