"""Single-query cross-attention at HBM roofline (Pallas, bf16, exact).

Decode is cross-attention-KV-bandwidth-bound (docs/BENCHMARKS.md): every
step re-reads the per-layer encoder K/V for every decoder layer. Round-1
shipped an int8 GRP kernel (ops/cached_attention.py) that ran at ~260 GB/s;
round-2 profiling (tools/profile_decode.py) showed the in-graph bf16 einsum
at ~0.95 ms/step and the einsum's isolated roofline at ~0.4 ms/step.

This kernel reaches ~0.23 ms/step at B=64, T=500, whisper-base — measured
at the chip's full HBM rate — with EXACT bf16 math (no quantization):

  * K/V live in a merged-head layout [B, T, H*D]: the int8/bf16 lane tiling
    wants 128-lane rows; the old [B, H, T, D=64] layout wasted half of
    every lane row, halving effective bandwidth.
  * Per-head logits come from ONE MXU matmul per batch row against a
    block-diagonal query matrix W[H*D, H] (W[h*D:(h+1)*D, h] = q_h):
    K_m[T, H*D] @ W -> [T, H] gives every head's logits without batched
    dots (Mosaic has none) and without M=1 matvecs (8x sublane waste).
  * The weighted sum is the same trick transposed: P[T, H] @ V_m[T, H*D]
    -> [H, H*D], whose diagonal blocks are the outputs; off-diagonal
    blocks cost only MXU FLOPs, which are free at this arithmetic
    intensity. Extraction is a mask-multiply + sublane reduction (a
    lane-splitting reshape of [H, H*D] is not Mosaic-lowerable).
  * W is built IN-KERNEL from the [BC, H*D] query block via an f32
    lane->sublane insert (bf16 inserts are not Mosaic-lowerable; 32-bit
    ones are). Passing a prebuilt [B, H*D, H] W doubled the pipelined
    VMEM footprint and overflowed the 16 MB budget by 44 KB at
    B=64, T=500 inside the full decode graph.

Reference behavior: identical math to HF Whisper cross-attention at
decode (audio_search.py:366-375 drives it via generate()); the einsum
path remains for CPU and for contexts whose K/V blocks exceed VMEM.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BC = 8          # q/o block rows (min sublane tile)
# K/V stream in kc-row blocks; kc shrinks with context length so the two
# double-buffered [kc, T, H*D] blocks stay within ~12 MB of the 16 MB VMEM
KV_BUDGET_BYTES = 12 * 1024 * 1024


def _kv_rows(t: int, hd: int, itemsize: int) -> int:
    kc = BC
    while kc > 1 and 2 * 2 * kc * t * hd * itemsize > KV_BUDGET_BYTES:
        kc //= 2
    return kc


def merge_heads_kv(k: jnp.ndarray, v: jnp.ndarray):
    """[B, H, T, D] -> ([B, T, H*D], [B, T, H*D]) merged-head layout."""
    def m(x):
        b, h, t, d = x.shape
        return x.transpose(0, 2, 1, 3).reshape(b, t, h * d)
    return m(k), m(v)


def _kernel(pos_ref, q_ref, k_ref, v_ref, o_ref, *, scale: float,
            heads: int, d: int):
    # q/o blocks carry BC rows (the 8-sublane minimum); K/V blocks carry
    # kc <= BC rows so their double buffers fit VMEM at any context
    # length. Grid position modulo (BC // kc) picks which kc-row slice of
    # the q/o block this step serves. pos_ref (SMEM scalar) masks cache
    # positions beyond the current decode step (self-attention); the
    # cross path passes T-1 (all valid).
    kc, t, hd = k_ref.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (hd, heads), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (hd, heads), 1)
    blockmask = (rows // d) == cols                            # [H*D, H]
    mask_t = blockmask.astype(jnp.float32).T                   # [H, H*D]
    t_idx = jax.lax.broadcasted_iota(jnp.int32, (t, heads), 0)
    valid = t_idx <= pos_ref[0, 0]                             # [T, H]

    def attend(base: int):
        for b in range(kc):                                    # static
            # f32 round-trip: bf16 lane->sublane inserts don't lower
            qcol = q_ref[base + b].astype(jnp.float32)[:, None]
            w = jnp.where(blockmask, qcol, 0.0).astype(k_ref.dtype)
            logits = jax.lax.dot_general(
                k_ref[b], w,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale    # [T, H]
            logits = jnp.where(valid, logits, -1e30)
            m = jnp.max(logits, axis=0, keepdims=True)
            p = jnp.exp(logits - m)
            p = p / jnp.sum(p, axis=0, keepdims=True)
            of = jax.lax.dot_general(
                p.astype(k_ref.dtype), v_ref[b],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)            # [H, H*D]
            o_ref[base + b] = jnp.sum(of * mask_t, axis=0) \
                .astype(o_ref.dtype)                           # diag blocks

    subs = BC // kc
    sub = pl.program_id(0) % subs
    for j in range(subs):                                      # static
        @pl.when(sub == j)
        def _(j=j):
            attend(j * kc)


@functools.partial(jax.jit, static_argnames=("heads", "interpret"))
def fused_single_query_attention(
    q_m: jnp.ndarray,    # [B, H*D] merged-head queries (dense-layer order)
    k_m: jnp.ndarray,    # [B, T, H*D] merged-head keys
    v_m: jnp.ndarray,    # [B, T, H*D] merged-head values
    *,
    heads: int,
    pos: jnp.ndarray | None = None,   # scalar: attend to cache[<= pos]
    interpret: bool = False,
) -> jnp.ndarray:        # [B, H*D] f32
    """One fused single-query attention over a merged-head K/V buffer —
    serves BOTH decode attentions: cross (pos=None -> all positions) and
    causal self over a KV cache (pos = current step). The merged layout
    f = h*d + i is exactly the feature order of the q/k/v dense layers,
    so callers pass projections straight through with no head split."""
    b, hd = q_m.shape
    t = k_m.shape[1]
    d = hd // heads
    scale = 1.0 / math.sqrt(d)
    bp = -(-b // BC) * BC
    qf = q_m.astype(k_m.dtype)
    if bp != b:
        qf = jnp.pad(qf, ((0, bp - b), (0, 0)))
        k_m = jnp.pad(k_m, ((0, bp - b), (0, 0), (0, 0)))
        v_m = jnp.pad(v_m, ((0, bp - b), (0, 0), (0, 0)))
    if pos is None:
        pos = jnp.int32(t - 1)
    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1, 1)
    kernel = functools.partial(_kernel, scale=scale, heads=heads, d=d)
    kc = _kv_rows(t, hd, k_m.dtype.itemsize)
    subs = BC // kc
    out = pl.pallas_call(
        kernel,
        grid=(subs * bp // BC,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((BC, hd), lambda i, s=subs: (i // s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kc, t, hd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kc, t, hd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BC, hd), lambda i, s=subs: (i // s, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, hd), k_m.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * t * hd * heads * 2,
            bytes_accessed=bp * t * hd * 2 * k_m.dtype.itemsize,
            transcendentals=bp * t * heads),
        interpret=interpret,
    )(pos_arr, qf, k_m, v_m)
    return out[:b].astype(jnp.float32)


def xla_single_query_attention(q_m, k_m, v_m, *, heads: int, pos=None):
    """Einsum twin of fused_single_query_attention (CPU / fallback)."""
    b, hd = q_m.shape
    t = k_m.shape[1]
    d = hd // heads
    q = q_m.reshape(b, heads, d).astype(jnp.float32)
    k = k_m.reshape(b, t, heads, d).astype(jnp.float32)
    v = v_m.reshape(b, t, heads, d).astype(jnp.float32)
    logits = jnp.einsum("bhd,bthd->bht", q, k) / np.sqrt(d)
    if pos is not None:
        valid = jnp.arange(t)[None, None, :] <= pos
        logits = jnp.where(valid, logits, -1e30)
    p = jax.nn.softmax(logits, axis=-1)
    o = jnp.einsum("bht,bthd->bhd", p, v)
    return o.reshape(b, hd)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_cross_attention(
    q: jnp.ndarray,      # [B, H, D]
    k_m: jnp.ndarray,    # [B, T, H*D] merged-head keys
    v_m: jnp.ndarray,    # [B, T, H*D] merged-head values
    interpret: bool = False,
) -> jnp.ndarray:        # [B, H, D] f32
    b, h, d = q.shape
    out = fused_single_query_attention(
        q.reshape(b, h * d), k_m, v_m, heads=h, interpret=interpret)
    return out.reshape(b, h, d)


def use_fused_cross_attention(t_enc: int, batch: int) -> bool:
    """TPU-only; kc-row K/V streaming covers every Whisper context (the
    full 30 s context streams 1-row blocks of ~1.5 MB)."""
    return jax.devices()[0].platform == "tpu"


def xla_cross_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray):
    """Reference einsum path ([B,H,T,D] layout), used on CPU and for
    long contexts; numerically identical reduction order up to XLA."""
    d = q.shape[-1]
    logits = jnp.einsum(
        "bhd,bhtd->bht", q.astype(jnp.float32), k.astype(jnp.float32)) \
        / np.sqrt(d)
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bht,bhtd->bhd", p, v.astype(jnp.float32))
