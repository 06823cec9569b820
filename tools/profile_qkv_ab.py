"""A/B: three separate q/k/v projections vs one merged [D, 3D] matmul
(whisper encoder layer shapes). Pure-XLA experiment; prints one JSON
line per case incrementally.

    python tools/profile_qkv_ab.py [--batch 64]
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from bench import _sync_time, calibrate

    on_tpu = jax.devices()[0].platform == "tpu"
    cal = calibrate(on_tpu)
    rtt = cal["rtt_ms"] / 1e3
    print(json.dumps({"calibration": cal}), flush=True)

    b, heads, dm = args.batch, 8, 512
    d = dm // heads
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16 if on_tpu else jnp.float32
    reps = 16 if on_tpu else 1

    def stage(fn, arrays):
        @jax.jit
        def run(*arrs):
            x = arrs[0]

            def body(i, acc):
                y = fn((x * (1 + acc * 1e-30)).astype(x.dtype), *arrs[1:])
                return jnp.float32(
                    y[0].ravel()[0].astype(jnp.float32)) * 1e-30
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0))
        return max(_sync_time(run, *arrays) - rtt, 1e-6) / reps

    for t in (500, 1500):
        x = jnp.asarray(rng.normal(size=(b, t, dm)) * 0.2, dt)
        ws = [jnp.asarray(rng.normal(size=(dm, dm)) * 0.05, dt)
              for _ in range(3)]
        bs = [jnp.asarray(rng.normal(size=dm) * 0.01, dt)
              for _ in range(3)]
        flops = 3 * 2 * b * t * dm * dm

        def split3(x, wq, wk, wv, bq, bv):
            def sh(y):
                return y.reshape(b, t, heads, d).transpose(0, 2, 1, 3)
            q = sh((jnp.dot(x, wq, preferred_element_type=jnp.float32)
                    + bq).astype(x.dtype))
            k = sh(jnp.dot(x, wk, preferred_element_type=jnp.float32)
                   .astype(x.dtype))
            v = sh((jnp.dot(x, wv, preferred_element_type=jnp.float32)
                    + bv).astype(x.dtype))
            return q, k, v

        def merged(x, wq, wk, wv, bq, bv):
            w = jnp.concatenate([wq, wk, wv], axis=1)
            y = jnp.dot(x, w, preferred_element_type=jnp.float32)
            q = (y[..., :dm] + bq).astype(x.dtype)
            k = y[..., dm:2 * dm].astype(x.dtype)
            v = (y[..., 2 * dm:] + bv).astype(x.dtype)

            def sh(z):
                return z.reshape(b, t, heads, d).transpose(0, 2, 1, 3)
            return sh(q), sh(k), sh(v)

        for name, fn in (("split3", split3), ("merged", merged)):
            s = stage(fn, [x, ws[0], ws[1], ws[2], bs[0], bs[2]])
            print(json.dumps({
                "case": f"{name} t={t}", "ms": round(s * 1e3, 3),
                "mfu": round(flops / s / (cal["tflops_bf16"] * 1e12), 3),
            }), flush=True)


if __name__ == "__main__":
    main()
