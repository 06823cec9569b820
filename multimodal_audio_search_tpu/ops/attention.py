"""Fused encoder self-attention as a Pallas TPU kernel.

Why: XLA's einsum attention materializes the [B, H, T, T] probability tensor
in HBM — for whisper-base ingest batches (B=32, H=8, T=1500) that is ~2.3 GB
written+read per layer. This kernel keeps each query block's score matrix in
VMEM: K/V for one (batch, head) are DMA'd into VMEM once and reused across
query blocks (their index map is constant in the query grid dimension), so
HBM traffic drops to O(B*H*T*D) — the speed-of-light minimum for attention
at this sequence length (S fits comfortably in VMEM: 128x1536 f32 = 786 KB).

Non-causal, padding-masked (keys >= t_real are masked), f32 softmax, bf16 in/
out. Decoder attention stays on the einsum path (q length 1 per step).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, t_real: int, scale: float):
    """One query block vs all keys for one (batch*head).

    q_ref [1, blk_q, D], k_ref/v_ref [1, T_pad, D], o_ref [1, blk_q, D].
    """
    q = q_ref[0].astype(jnp.float32) * scale          # [blk_q, D]
    k = k_ref[0]                                      # [T_pad, D] bf16
    s = jax.lax.dot_general(
        q.astype(k.dtype), k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)           # [blk_q, T_pad]
    t_pad = k.shape[0]
    if t_real < t_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < t_real, s, NEG_INF)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)           # [blk_q, D]
    # softmax /l deferred from the [blk_q, T] tile to the [blk_q, D]
    # output (T/D less divide work; measured 2x on the all-heads block
    # kernel, tools/profile_encoder_kernel_ab.py)
    o_ref[0] = (o / l).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(
    jax.jit, static_argnames=("blk_q", "interpret"))
def fused_encoder_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    blk_q: int = 256, interpret: bool = False,
) -> jnp.ndarray:
    """Softmax(QK^T/sqrt(D))V for [B, H, T, D] inputs, non-causal.

    Equivalent to layers.attention_scores(q, k, v) without a bias; pads T
    internally and masks padded keys.
    """
    b, h, t, d = q.shape
    scale = 1.0 / math.sqrt(d)
    t_pad = _round_up(t, blk_q)
    if t_pad != t:
        pad = ((0, 0), (0, 0), (0, t_pad - t), (0, 0))
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    qf = q.reshape(b * h, t_pad, d)
    kf = k.reshape(b * h, t_pad, d)
    vf = v.reshape(b * h, t_pad, d)

    kernel = functools.partial(_attn_kernel, t_real=t, scale=scale)
    out = pl.pallas_call(
        kernel,
        grid=(b * h, t_pad // blk_q),
        in_specs=[
            pl.BlockSpec((1, blk_q, d), lambda bh, i: (bh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, d), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, d), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, blk_q, d), lambda bh, i: (bh, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, t_pad, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * t_pad * t_pad * d,
            bytes_accessed=b * h * t_pad * d * 4 * q.dtype.itemsize,
            transcendentals=b * h * t_pad * t_pad),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(b, h, t_pad, d)[:, :, :t, :]


def use_pallas_attention(t: int) -> bool:
    """Production dispatch rule: Pallas on real TPU for long sequences."""
    try:
        dev = jax.devices()[0].platform
    except Exception:
        return False
    return dev == "tpu" and t >= 512
