"""On-chip compile + numeric check of every Pallas kernel touched by the
deferred-softmax-division change, at production shapes.

The deferral (see ops/encoder_block.py) measured 2x on the encoder block
kernel but crashes the Mosaic compile helper at some shapes — this
script is the gate-keeper evidence: each case compiles, runs once, and
reports max |err| vs the XLA einsum reference. One JSON line per case,
incremental (TPU discipline: background, no shell timeout).

    python tools/compile_check_kernels.py
"""
from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    on_tpu = jax.devices()[0].platform == "tpu"
    print(json.dumps({"on_tpu": on_tpu}), flush=True)

    from multimodal_audio_search_tpu.ops.attention import (
        fused_encoder_attention)
    from multimodal_audio_search_tpu.ops.cross_attention import (
        fused_single_query_attention, fused_single_query_attention_int8,
        merge_heads_kv, quantize_kv_merged)
    from multimodal_audio_search_tpu.ops.encoder_block import (
        fused_attention_o_residual)
    from multimodal_audio_search_tpu.models import layers as L

    rng = np.random.default_rng(0)
    dt = jnp.bfloat16 if on_tpu else jnp.float32
    b, h, d = 64, 8, 64
    hd = h * d

    def report(name, fn):
        try:
            err = fn()
            print(json.dumps({"case": name, "ok": True,
                              "max_abs_err": round(err, 5)}), flush=True)
        except Exception as e:
            print(json.dumps({"case": name, "ok": False,
                              "error": str(e)[:200]}), flush=True)

    def mk(t):
        q, k, v = (jnp.asarray(rng.normal(size=(b, h, t, d)) * 0.2, dt)
                   for _ in range(3))
        return q, k, v

    for t in (500, 1500):
        q, k, v = mk(t)
        ref = L.attention_scores(
            q.astype(jnp.float32), k.astype(jnp.float32),
            v.astype(jnp.float32))

        def enc_attn(q=q, k=k, v=v, ref=ref):
            out = fused_encoder_attention(q, k, v)
            return float(jnp.max(jnp.abs(
                out.astype(jnp.float32) - ref)))
        report(f"fused_encoder_attention t={t}", enc_attn)

        x = jnp.asarray(rng.normal(size=(b, t, hd)) * 0.2, dt)
        wo = jnp.asarray(rng.normal(size=(hd, hd)) * 0.05, dt)
        bo = jnp.asarray(rng.normal(size=hd) * 0.01, dt)
        blk_q = 512 if t <= 512 else (256 if t <= 1024 else 128)
        ref_o = x.astype(jnp.float32) + (
            L.merge_heads(ref) @ wo.astype(jnp.float32)
            + bo.astype(jnp.float32))

        def enc_block(q=q, k=k, v=v, x=x, wo=wo, bo=bo, blk_q=blk_q,
                      ref_o=ref_o):
            out = fused_attention_o_residual(q, k, v, x, wo, bo,
                                             blk_q=blk_q)
            return float(jnp.max(jnp.abs(
                out.astype(jnp.float32) - ref_o)))
        report(f"fused_attention_o_residual t={t} blk={blk_q}",
               enc_block)

        # single-query decode kernels over a merged-head K/V buffer
        qm = jnp.asarray(rng.normal(size=(b, hd)) * 0.2, dt)
        km, vm = merge_heads_kv(k, v)
        refq = jnp.einsum(
            "bhtd,bht->bhd", v.astype(jnp.float32),
            jax.nn.softmax(jnp.einsum(
                "bhd,bhtd->bht",
                qm.reshape(b, h, d).astype(jnp.float32),
                k.astype(jnp.float32)) / np.sqrt(d), axis=-1)
        ).reshape(b, hd)

        def cross(qm=qm, km=km, vm=vm, refq=refq):
            out = fused_single_query_attention(qm, km, vm, heads=h)
            return float(jnp.max(jnp.abs(out - refq)))
        report(f"fused_single_query_attention t={t}", cross)

        def cross8(qm=qm, km=km, vm=vm, refq=refq):
            k8, ks, v8, vs = quantize_kv_merged(km, vm, h)
            out = fused_single_query_attention_int8(
                qm, k8, ks, v8, vs, heads=h)
            return float(jnp.max(jnp.abs(out - refq)))
        report(f"fused_single_query_attention_int8 t={t}", cross8)


if __name__ == "__main__":
    main()
