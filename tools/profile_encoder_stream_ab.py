"""A/B the streaming (blk_k online-softmax) encoder block kernel at the
30 s parity context vs the round-3 production formulation (ROADMAP 20).

Round-3 state at t=1500: the full-T [blk, T] f32 score tile overflowed
scoped VMEM at blk_q=256 (forcing 128) and the deferred-divide variant
crashed the Mosaic compile helper on multi-block grids. The streaming
formulation keeps only a [blk_q, blk_k] score tile and defers /l onto
the [blk_q, D] accumulator, so both limits should lift; this measures
which (blk_q, blk_k) wins.

Prints one JSON line per case incrementally. TPU discipline: run in the
background with NO timeout, poll the output file, never SIGKILL
mid-compile (wedges the remote compile service ~45 min).

    nohup python tools/profile_encoder_stream_ab.py > /tmp/stream_ab.out &
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
    ap.add_argument("--t", type=int, default=1500)
    ap.add_argument("--reps", type=int, default=None,
                    help="in-jit dependent reps per case (default 8 on "
                         "TPU). At t=500 a rep is ~0.5 ms, so 8 reps sit "
                         "inside the ±10 ms tunnel-RTT jitter — use 64+ "
                         "for decision-grade short-context numbers")
    ap.add_argument("--only", nargs="*", default=None,
                    help="run only cases whose 'blkq/blkk/exp2' tag is "
                         "listed, e.g. --only 512/None/True 512/512/True")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from bench import _sync_time, calibrate
    from multimodal_audio_search_tpu.ops.encoder_block import (
        _round_up, fused_attention_o_residual)

    on_tpu = jax.devices()[0].platform == "tpu"
    cal = calibrate(on_tpu)
    rtt = cal["rtt_ms"] / 1e3
    print(json.dumps({"calibration": cal}), flush=True)

    b, h, d, t_ctx = args.batch, 8, 64, args.t
    hd = h * d
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16 if on_tpu else jnp.float32
    tf = cal["tflops_bf16"] * 1e12
    qkvx = [jnp.asarray(rng.normal(size=s) * 0.1, dt) for s in
            [(b, h, t_ctx, d)] * 3 + [(b, t_ctx, hd)]]
    wo = jnp.asarray(rng.normal(size=(hd, hd)) * 0.05, dt)
    bo = jnp.asarray(rng.normal(size=hd) * 0.01, dt)
    reps = args.reps or (8 if on_tpu else 1)

    def stage_time(blk_q, blk_k, use_exp2=False):
        # arrays as jit operands (closure bake -> HTTP 413 at t=1500)
        @jax.jit
        def run(q, k, v, x, wo, bo):
            def body(i, acc):
                y = fused_attention_o_residual(
                    q, k, v, (x * (1 + acc * 1e-30)).astype(x.dtype),
                    wo, bo, blk_q=blk_q, blk_k=blk_k, use_exp2=use_exp2)
                return jnp.float32(
                    y.ravel()[0].astype(jnp.float32)) * 1e-30
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

        return max(_sync_time(run, *qkvx, wo, bo) - rtt, 1e-6) / reps

    # (blk_q, blk_k, exp2): blk_k None = full-T in-tile divide (round-3
    # production formulation)
    cases = [(128, None, False), (256, 512, False), (512, 512, False),
             (256, 256, False), (512, 768, False), (128, 512, False),
             (256, 512, True), (512, 512, True),
             # the t<=512 production default (full-T single step) and its
             # exp2 twin — the round-4 promotion decision compares these
             # against the streaming 512/512 rows
             (512, None, False), (512, None, True)]
    if args.only:
        cases = [c for c in cases
                 if f"{c[0]}/{c[1]}/{c[2]}" in set(args.only)]
    ref = None
    for blk_q, blk_k, x2 in cases:
        tag = f"t={t_ctx} blk_q={blk_q} blk_k={blk_k} exp2={x2}"
        try:
            t_pad = _round_up(t_ctx, blk_q)
            if blk_k:
                t_pad = _round_up(t_pad, blk_k)
            flops = 4 * b * h * t_pad * t_pad * d + 2 * b * t_pad * hd * hd
            sv = stage_time(blk_q, blk_k, x2)
            got = fused_attention_o_residual(
                *qkvx, wo, bo, blk_q=blk_q, blk_k=blk_k, use_exp2=x2)
            if ref is None:
                ref = got
            err = float(jnp.max(jnp.abs(
                got.astype(jnp.float32) - ref.astype(jnp.float32))))
            print(json.dumps({"case": tag, "ms": round(sv * 1e3, 3),
                              "mfu": round(flops / sv / tf, 3),
                              "max_abs_vs_first": err}), flush=True)
        except Exception as e:  # noqa: BLE001 — VMEM overflow etc: report
            print(json.dumps({"case": tag, "error": str(e)[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()
