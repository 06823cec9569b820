"""Pallas fused-search scoring kernel.

One pass over the HBM-resident [N, 2, D] index computes, per segment, both
cosine sims (dot products against the unit query), availability-renormalized
weight fusion, the any-positive-sim rule, and the relevance threshold —
emitting masked scores [N] ready for lax.top_k. The index is the only HBM
traffic (bf16), read exactly once; XLA's unfused form materializes the
[N, 2] sims and several [N] temporaries in HBM between ops.

Semantics identical to index/fusion.py::fused_scores (parity-tested in
interpret mode on CPU and on TPU).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _score_kernel(q_ref, w_ref, emb_ref, ok_ref, out_ref, *,
                  threshold: float):
    """emb_ref [blk, 2, D], ok_ref [blk, 2] f32, q_ref [1, D] f32,
    w_ref [1, 2] f32 -> out_ref [blk] f32."""
    blk, two, d = emb_ref.shape
    e = emb_ref[...].reshape(blk * two, d)
    q = q_ref[0]                                   # [D]
    sims = jax.lax.dot_general(
        e.astype(jnp.float32), q,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(blk, two)
    ok = ok_ref[...]
    eff = w_ref[0][None, :] * ok                   # [blk, 2]
    total = jnp.sum(eff, axis=1)
    eff = eff / jnp.maximum(total, 1e-30)[:, None]
    score = jnp.sum(eff * sims, axis=1)
    any_pos = jnp.any(sims > 0.0, axis=1)
    valid = any_pos & (total > 0.0) & (score > threshold)
    out_ref[...] = jnp.where(valid, score, NEG_INF)


@functools.partial(
    jax.jit, static_argnames=("threshold", "blk", "interpret"))
def pallas_fused_scores(
    query: jnp.ndarray,      # [D] f32 unit query
    emb: jnp.ndarray,        # [N, 2, D] (bf16 or f32), N % blk == 0
    success: jnp.ndarray,    # [N, 2] bool
    asr_weight: jnp.ndarray,
    audio_weight: jnp.ndarray,
    *,
    threshold: float = 0.1,
    blk: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    n, two, d = emb.shape
    assert two == 2
    # rank-1 output blocks must be 128-multiples (or the whole array):
    # pad N up to the block size rather than shrinking the block (the
    # round-1 shrink-to-8 fallback violated the tiling rule at N=100k)
    if n < blk:
        blk = max(128, -(-n // 128) * 128)
    n_pad = (n + blk - 1) // blk * blk
    if n_pad != n:  # pad tail rows; success=0 scores them NEG_INF
        emb = jnp.pad(emb, ((0, n_pad - n), (0, 0), (0, 0)))
        success = jnp.pad(success, ((0, n_pad - n), (0, 0)))
    w = jnp.stack([asr_weight, audio_weight]).astype(jnp.float32)[None]
    ok = success.astype(jnp.float32)
    kernel = functools.partial(_score_kernel, threshold=threshold)
    out = pl.pallas_call(
        kernel,
        grid=(n_pad // blk,),
        in_specs=[
            pl.BlockSpec((1, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, 2, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((blk,), lambda i: (i,),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad,), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * 2 * d,
            bytes_accessed=n * 2 * d * emb.dtype.itemsize + n * 4,
            transcendentals=0),
        interpret=interpret,
    )(query[None].astype(jnp.float32), w, emb, ok)
    return out[:n]
