"""A/B the encoder attention kernel vs a deferred-softmax-division
variant (ROADMAP 20).

The fused all-heads block (ops/encoder_block.py) measures ~0.2 in-kernel
MFU; the score dots are pinned at half MXU utilization by D=64, so the
remaining levers are VPU passes. The variant here moves the softmax /l
normalization off the [blk, T] score tile onto the [blk, D] PV output
(T/D = 8-24x less divide work per head; identical math up to f32
rounding, and one fewer T-wide f32 temp alive in VMEM — which may also
re-admit blk_q=256 at the 30 s parity context, where the score tile
overflowed scoped VMEM at 256).

Prints one line per timed case incrementally (TPU discipline: run in
background, never SIGKILL mid-compile).

    python tools/profile_encoder_kernel_ab.py [--batch 64]
"""
from __future__ import annotations

import argparse
import functools
import json
import math
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from bench import _sync_time, calibrate
    from multimodal_audio_search_tpu.ops import encoder_block as eb

    on_tpu = jax.devices()[0].platform == "tpu"
    cal = calibrate(on_tpu)
    rtt = cal["rtt_ms"] / 1e3
    print(json.dumps({"calibration": cal}), flush=True)

    def _kernel_v2(q_ref, k_ref, v_ref, x_ref, wo_ref, bo_ref, o_ref,
                   *, t_real, scale, heads, defer_div=True):
        t_pad = k_ref.shape[2]
        dd = v_ref.shape[3]
        outs = []
        ls = []
        for h in range(heads):
            q = q_ref[0, h].astype(jnp.float32) * scale
            k = k_ref[0, h]
            s = jax.lax.dot_general(
                q.astype(k.dtype), k,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if t_real < t_pad:
                col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                s = jnp.where(col < t_real, s, eb.NEG_INF)
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=1, keepdims=True)
            if defer_div == "post":        # divide after the head concat
                pv = jax.lax.dot_general(
                    p.astype(v_ref.dtype), v_ref[0, h],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                outs.append(pv)
                ls.append(l)
            elif defer_div:
                pv = jax.lax.dot_general(
                    p.astype(v_ref.dtype), v_ref[0, h],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                outs.append(pv / l)        # defer /l to [blk, D]
            else:                          # original formulation
                p = (p / l).astype(v_ref.dtype)
                outs.append(jax.lax.dot_general(
                    p, v_ref[0, h],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
        attn = jnp.concatenate(outs, axis=-1)
        if defer_div == "post":
            linv = jnp.concatenate(
                [jnp.broadcast_to(1.0 / l_, (l_.shape[0], dd))
                 for l_ in ls], axis=-1)
            attn = attn * linv
        y = jax.lax.dot_general(
            attn.astype(wo_ref.dtype), wo_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) \
            + bo_ref[0].astype(jnp.float32)
        o_ref[0] = (x_ref[0].astype(jnp.float32) + y).astype(o_ref.dtype)

    @functools.partial(jax.jit, static_argnames=("blk_q", "defer_div"))
    def fused_v2(q, k, v, x, wo, bo, blk_q=256, defer_div=True):
        b, h, t, d = q.shape
        hd = h * d
        scale = 1.0 / math.sqrt(d)
        t_pad = eb._round_up(t, blk_q)
        if t_pad != t:
            pad4 = ((0, 0), (0, 0), (0, t_pad - t), (0, 0))
            q = jnp.pad(q, pad4)
            k = jnp.pad(k, pad4)
            v = jnp.pad(v, pad4)
            x = jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))
        dt = x.dtype
        kernel = functools.partial(
            _kernel_v2, t_real=t, scale=scale, heads=h,
            defer_div=defer_div)
        qkv_spec = pl.BlockSpec((1, h, t_pad, d),
                                lambda bi, i: (bi, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kernel,
            grid=(b, t_pad // blk_q),
            in_specs=[
                pl.BlockSpec((1, h, blk_q, d), lambda bi, i: (bi, 0, i, 0),
                             memory_space=pltpu.VMEM),
                qkv_spec, qkv_spec,
                pl.BlockSpec((1, blk_q, hd), lambda bi, i: (bi, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((hd, hd), lambda bi, i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, hd), lambda bi, i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, blk_q, hd), lambda bi, i: (bi, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, t_pad, hd), dt),
            cost_estimate=pl.CostEstimate(
                flops=4 * b * h * t_pad * t_pad * d
                + 2 * b * t_pad * hd * hd,
                bytes_accessed=b * t_pad * hd * 6 * 2,
                transcendentals=b * h * t_pad * t_pad),
        )(q.astype(dt), k.astype(dt), v.astype(dt), x,
          wo.astype(dt), bo.reshape(1, hd).astype(dt))
        return out[:, :t, :]

    def stage_time_multi(fn, arrays, reps, rtt):
        # bench._stage_time bakes closed-over arrays into the jit as HLO
        # literals — at t=1500 that's ~300 MB of q/k/v and the remote
        # compile service rejects the request (HTTP 413). Pass every
        # array as an explicit jit operand instead.
        @jax.jit
        def run(*arrs):
            x = arrs[3]

            def body(i, acc):
                y = fn(arrs[0], arrs[1], arrs[2],
                       (x * (1 + acc * 1e-30)).astype(x.dtype),
                       arrs[4], arrs[5])
                return jnp.float32(
                    y.ravel()[0].astype(jnp.float32)) * 1e-30
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

        return max(_sync_time(run, *arrays) - rtt, 1e-6) / reps

    b, h, d = args.batch, 8, 64
    hd = h * d
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16 if on_tpu else jnp.float32
    tf = cal["tflops_bf16"] * 1e12

    for t_ctx, blks in ((500, (512,)), (1500, (128,))):
        qkvx = [jnp.asarray(rng.normal(size=s) * 0.1, dt) for s in
                [(b, h, t_ctx, d)] * 3 + [(b, t_ctx, hd)]]
        wo = jnp.asarray(rng.normal(size=(hd, hd)) * 0.05, dt)
        bo = jnp.asarray(rng.normal(size=hd) * 0.01, dt)
        t_pad = eb._round_up(t_ctx, blks[0])
        flops = 4 * b * h * t_pad * t_pad * d + 2 * b * t_pad * hd * hd
        reps = 8 if on_tpu else 1

        ref = None
        for blk in blks:
            for defer in (False, True, "post"):
                t_padv = eb._round_up(t_ctx, blk)
                flopsv = 4 * b * h * t_padv * t_padv * d \
                    + 2 * b * t_padv * hd * hd
                name = {False: "v1-orig ", True: "v2-defer",
                        "post": "v3-post "}[defer]
                tag = f"{name} t={t_ctx} blk={blk}"
                try:
                    fn = functools.partial(fused_v2, blk_q=blk,
                                           defer_div=defer)
                    sv = stage_time_multi(
                        lambda q_, k_, v_, xx, wo_, bo_: fn(
                            q_, k_, v_, xx, wo_, bo_),
                        qkvx + [wo, bo], reps, rtt)
                    got = fn(qkvx[0], qkvx[1], qkvx[2], qkvx[3], wo, bo)
                    if ref is None:
                        ref = got
                    err = float(jnp.max(jnp.abs(
                        got.astype(jnp.float32)
                        - ref.astype(jnp.float32))))
                    print(json.dumps({"case": tag,
                                      "ms": round(sv * 1e3, 3),
                                      "mfu": round(flopsv / sv / tf, 3),
                                      "max_abs_vs_first": err}),
                          flush=True)
                except Exception as e:  # VMEM overflow etc: report
                    print(json.dumps({"case": tag,
                                      "error": str(e)[:300]}),
                          flush=True)


if __name__ == "__main__":
    main()
