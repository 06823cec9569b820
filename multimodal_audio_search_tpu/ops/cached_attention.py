"""Single-query cross-attention over an int8-quantized KV cache (Pallas).

Decode is cross-attention-KV-bandwidth-bound (docs/BENCHMARKS.md): every
step re-reads [B, H, T_enc, D] K and V for all layers. Quantizing K/V to
int8 with per-position scales halves that traffic, and the scale factors
commute with the dot products:

    logits[t] = (q . k8[t]) * k_scale[t] * sm_scale
    out       = sum_t softmax(logits)[t] * v_scale[t] * v8[t]

so the kernel never materializes dequantized K/V. Encoder K/V are computed
once per segment batch (whisper.cross_kv_quantized) and read 64+ times
during decode — the int8 rounding is amortized across the whole decode.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def quantize_kv(k: jnp.ndarray, v: jnp.ndarray):
    """[B, H, T, D] bf16/f32 -> (k8, ks, v8, vs) with per-(b,h,t) scales."""
    def q(x):
        xf = x.astype(jnp.float32)
        s = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1), 1e-12) / 127.0
        x8 = jnp.clip(jnp.round(xf / s[..., None]), -127, 127) \
            .astype(jnp.int8)
        return x8, s
    k8, ks = q(k)
    v8, vs = q(v)
    return k8, ks, v8, vs


GRP = 8  # (batch*head) rows per grid step — satisfies the TPU sublane rule


def _kernel(q_ref, k8_ref, ks_ref, v8_ref, vs_ref, o_ref, *, scale: float):
    """GRP (batch, head) rows at once: q [G, D], k8/v8 [G, T, D],
    ks/vs [G, T] -> o [G, D]. The per-row matvecs unroll statically
    (Mosaic has no batched dot); scales stay factored out of the int8
    data, so K/V are never dequantized outside VMEM."""
    grp = q_ref.shape[0]
    for g in range(grp):                               # static unroll
        q = q_ref[g][None, :].astype(jnp.bfloat16)     # [1, D]
        logits = jax.lax.dot_general(
            q, k8_ref[g].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)        # [1, T]
        logits = logits * ks_ref[g][None, :] * scale
        m = jnp.max(logits, axis=1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=1, keepdims=True)
        pw = (p * vs_ref[g][None, :]).astype(jnp.bfloat16)
        out = jax.lax.dot_general(
            pw, v8_ref[g].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # [1, D]
        o_ref[g] = out[0].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def int8_cached_attention(
    q: jnp.ndarray,       # [B, H, D]
    k8: jnp.ndarray,      # [B, H, T, D] int8
    ks: jnp.ndarray,      # [B, H, T] f32
    v8: jnp.ndarray,      # [B, H, T, D] int8
    vs: jnp.ndarray,      # [B, H, T] f32
    interpret: bool = False,
) -> jnp.ndarray:         # [B, H, D]
    b, h, d = q.shape
    t = k8.shape[2]
    scale = 1.0 / math.sqrt(d)
    bh = b * h
    bh_pad = (bh + GRP - 1) // GRP * GRP

    def flat(x, shape):
        x = x.reshape(shape)
        if bh_pad != bh:
            pad = [(0, bh_pad - bh)] + [(0, 0)] * (x.ndim - 1)
            x = jnp.pad(x, pad)
        return x

    kernel = functools.partial(_kernel, scale=scale)
    out = pl.pallas_call(
        kernel,
        grid=(bh_pad // GRP,),
        in_specs=[
            pl.BlockSpec((GRP, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GRP, t, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GRP, t), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GRP, t, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GRP, t), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((GRP, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh_pad, d), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * t * d,
            bytes_accessed=bh * t * (2 * d + 8),
            transcendentals=bh * t),
        interpret=interpret,
    )(flat(q, (bh, d)), flat(k8, (bh, t, d)), flat(ks, (bh, t)),
      flat(v8, (bh, t, d)), flat(vs, (bh, t)))
    return out[:bh].reshape(b, h, d)


def xla_int8_cached_attention(q, k8, ks, v8, vs):
    """Reference/CPU path: same math in plain XLA (materializes dequant)."""
    d = q.shape[-1]
    kf = k8.astype(jnp.float32) * ks[..., None]
    vf = v8.astype(jnp.float32) * vs[..., None]
    logits = jnp.einsum("bhd,bhtd->bht", q.astype(jnp.float32), kf) \
        / np.sqrt(d)
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bht,bhtd->bhd", p, vf)
