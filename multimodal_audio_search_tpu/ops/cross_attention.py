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
            l = jnp.sum(p, axis=0, keepdims=True)
            of = jax.lax.dot_general(
                p.astype(k_ref.dtype), v_ref[b],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)            # [H, H*D]
            # softmax /l deferred from the [T, H] tile to the [H, H*D]
            # output — the kernel is element-rate bound (docs/
            # BENCHMARKS.md), so dropping a T-wide VPU pass is a direct
            # per-step saving; math identical up to f32 rounding
            o_ref[base + b] = jnp.sum((of / l.T) * mask_t, axis=0) \
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


# ------------------------------------------------------------- int8 fast
def quantize_kv_merged(k_m: jnp.ndarray, v_m: jnp.ndarray, heads: int):
    """[B, T, H*D] -> (int8 [B, T, H*D], scales [B, T, H]) per tensor.

    Per-(b, t, head-row) scales keep the quantization error ~0.4% per
    element; the merged layout keeps int8 rows at full 128 lanes (the
    round-1 [.., D=64] int8 layout was silently padded 2x by the
    (32, 128) int8 tile)."""
    def q(x):
        b, t, hd = x.shape
        xf = x.astype(jnp.float32).reshape(b, t, heads, hd // heads)
        s = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1), 1e-12) / 127.0
        x8 = jnp.clip(jnp.round(xf / s[..., None]), -127, 127) \
            .astype(jnp.int8)
        return x8.reshape(b, t, hd), s
    k8, ks = q(k_m)
    v8, vs = q(v_m)
    return k8, ks, v8, vs


def _kernel_int8(pos_ref, q_ref, qs_ref, k_ref, ks_ref, v_ref, vs_ref,
                 o_ref, *, scale: float, heads: int, d: int):
    """Block-diag trick on the NATIVE int8 MXU path: logits from an
    int8 x int8 dot against a quantized block-diagonal query (no
    dequantize pass — the int8->f32 convert of K/V on the VPU costs more
    than the bandwidth it saves, docs/BENCHMARKS.md); the softmax weights
    are re-quantized per head column for an int8 V dot. Opt-in: ~0.4%
    K-side and ~1-2% V-side relative error (guardrail-tested)."""
    kc, t, hd = k_ref.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (hd, heads), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (hd, heads), 1)
    blockmask = (rows // d) == cols
    mask_t = blockmask.astype(jnp.float32).T                   # [H, H*D]
    t_idx = jax.lax.broadcasted_iota(jnp.int32, (t, heads), 0)
    valid = t_idx <= pos_ref[0, 0]

    def attend(base: int):
        for b in range(kc):                                    # static
            qcol = q_ref[base + b][:, None]                    # i32 [HD,1]
            w8 = jnp.where(blockmask, qcol, 0).astype(jnp.int8)
            li = jax.lax.dot_general(
                k_ref[b], w8,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)              # [T, H]
            logits = li.astype(jnp.float32) * ks_ref[b] \
                * qs_ref[base + b][None, :] * scale
            logits = jnp.where(valid, logits, -1e30)
            m = jnp.max(logits, axis=0, keepdims=True)
            p = jnp.exp(logits - m)
            l = jnp.sum(p, axis=0, keepdims=True)
            pw = p * vs_ref[b]                                 # [T, H]
            spw = jnp.maximum(jnp.max(pw, axis=0, keepdims=True),
                              1e-20) / 127.0
            pw8 = jnp.clip(jnp.round(pw / spw), -127, 127) \
                .astype(jnp.int8)
            oi = jax.lax.dot_general(
                pw8, v_ref[b],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)              # [H, H*D]
            # softmax /l folded into the per-head dequant scale (spw/l):
            # drops the [T, H] divide pass entirely — the quantization
            # error pattern is unchanged because pw/spw is scale-
            # invariant in l
            o_ref[base + b] = jnp.sum(
                oi.astype(jnp.float32) * (spw[0] / l[0])[:, None]
                * mask_t, axis=0).astype(o_ref.dtype)

    subs = BC // kc
    sub = pl.program_id(0) % subs
    for j in range(subs):                                      # static
        @pl.when(sub == j)
        def _(j=j):
            attend(j * kc)


@functools.partial(jax.jit, static_argnames=("heads", "interpret"))
def fused_single_query_attention_int8(
    q_m: jnp.ndarray,    # [B, H*D] float queries (quantized in here)
    k8: jnp.ndarray,     # [B, T, H*D] int8
    ks: jnp.ndarray,     # [B, T, H] f32 scales
    v8: jnp.ndarray,     # [B, T, H*D] int8
    vs: jnp.ndarray,     # [B, T, H] f32 scales
    *,
    heads: int,
    pos: jnp.ndarray | None = None,
    interpret: bool = False,
) -> jnp.ndarray:        # [B, H*D] f32
    b, hd = q_m.shape
    t = k8.shape[1]
    d = hd // heads
    scale = 1.0 / math.sqrt(d)
    qf = q_m.astype(jnp.float32).reshape(b, heads, d)
    qs = jnp.maximum(jnp.max(jnp.abs(qf), axis=-1), 1e-12) / 127.0
    q8 = jnp.clip(jnp.round(qf / qs[..., None]), -127, 127) \
        .reshape(b, hd).astype(jnp.int32)   # i32: int8 lane->sublane
    bp = -(-b // BC) * BC
    if bp != b:
        pad = ((0, bp - b),)
        q8 = jnp.pad(q8, pad + ((0, 0),))
        qs = jnp.pad(qs, pad + ((0, 0),))
        k8 = jnp.pad(k8, pad + ((0, 0), (0, 0)))
        ks = jnp.pad(ks, pad + ((0, 0), (0, 0)))
        v8 = jnp.pad(v8, pad + ((0, 0), (0, 0)))
        vs = jnp.pad(vs, pad + ((0, 0), (0, 0)))
    if pos is None:
        pos = jnp.int32(t - 1)
    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1, 1)
    kernel = functools.partial(_kernel_int8, scale=scale, heads=heads, d=d)
    # budget as if bf16: the f32 scale blocks + int32/f32 in-kernel temps
    # (logits, p, pw, oi) eat the headroom int8 data alone would leave
    kc = _kv_rows(t, hd, 2)
    subs = BC // kc
    out = pl.pallas_call(
        kernel,
        grid=(subs * bp // BC,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((BC, hd), lambda i, s=subs: (i // s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BC, heads), lambda i, s=subs: (i // s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kc, t, hd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kc, t, heads), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kc, t, hd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kc, t, heads), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BC, hd), lambda i, s=subs: (i // s, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, hd), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * t * hd * heads * 2,
            bytes_accessed=bp * t * (hd * 2 + heads * 8),
            transcendentals=bp * t * heads),
        interpret=interpret,
    )(pos_arr, q8, qs, k8, ks, v8, vs)
    return out[:b]


def xla_single_query_attention_int8(q_m, k8, ks, v8, vs, *, heads,
                                    pos=None):
    """Dequantizing einsum twin (CPU / reference for the int8 kernel)."""
    b, hd = q_m.shape
    t = k8.shape[1]
    d = hd // heads
    kf = k8.astype(jnp.float32).reshape(b, t, heads, d) * ks[..., None]
    vf = v8.astype(jnp.float32).reshape(b, t, heads, d) * vs[..., None]
    q = q_m.astype(jnp.float32).reshape(b, heads, d)
    logits = jnp.einsum("bhd,bthd->bht", q, kf) / np.sqrt(d)
    if pos is not None:
        logits = jnp.where(jnp.arange(t)[None, None, :] <= pos,
                           logits, -1e30)
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bht,bthd->bhd", p, vf).reshape(b, hd)
