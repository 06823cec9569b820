"""Fused encoder sub-block kernels (round-3 MFU push, ROADMAP 17).

BENCH_r02 measured encoder MFU 0.36 (parity) / 0.43 (fast) with the fused
attention kernel already in place — the residue is XLA elementwise passes
between the matmuls: LN before qkv, LN before MLP, gelu, residual adds,
and the head split/merge transposes, each a full [B, T, D] HBM round trip.
These kernels fold the elementwise work into the matmul kernels:

  * ``encoder_ln_qkv``  — LN + the three qkv projections in ONE kernel:
    x is read once (instead of LN read+write plus three matmul reads).
  * ``encoder_mlp``     — LN + fc1 + erf-GELU + fc2 + residual in ONE
    kernel over row blocks (the encoder-shaped sibling of
    decoder_block.fused_mlp_block, which is sized for decode rows).

Accelerates the per-segment HF encoder call of the reference
(/root/reference/audio_search.py:358-362) — behavior-neutral: outputs
match the XLA path to bf16 rounding (erf via Abramowitz-Stegun 7.1.26,
|err| < 1.5e-7, far below bf16 resolution).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .decoder_block import _mlp_kernel


def _ln(x_ref, g_ref, b_ref, eps: float):
    x = x_ref[...].astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    return ((x - mu) * jax.lax.rsqrt(var + eps)
            * g_ref[0].astype(jnp.float32)
            + b_ref[0].astype(jnp.float32))


def _ln_qkv_kernel(x_ref, g_ref, b_ref, wq_ref, bq_ref, wk_ref,
                   wv_ref, bv_ref, q_ref, k_ref, v_ref, *, eps: float):
    h = _ln(x_ref, g_ref, b_ref, eps).astype(x_ref.dtype)       # [R, D]

    def proj(w_ref, b_ref, o_ref):
        y = jax.lax.dot_general(
            h, w_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if b_ref is not None:
            y = y + b_ref[0].astype(jnp.float32)
        o_ref[...] = y.astype(o_ref.dtype)

    proj(wq_ref, bq_ref, q_ref)
    proj(wk_ref, None, k_ref)         # whisper k-proj has no bias
    proj(wv_ref, bv_ref, v_ref)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def encoder_ln_qkv(
    x: jnp.ndarray,                                # [N, D] flattened rows
    ln_g: jnp.ndarray, ln_b: jnp.ndarray,          # [D]
    wq: jnp.ndarray, bq: jnp.ndarray,              # [D, D], [D]
    wk: jnp.ndarray,                               # [D, D] (no bias)
    wv: jnp.ndarray, bv: jnp.ndarray,              # [D, D], [D]
    *,
    eps: float = 1e-5,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(q, k, v) = LN(x) @ (Wq, Wk, Wv) + biases, one x read."""
    n, d = x.shape
    rows = 256
    while n % rows:
        rows //= 2
    dt = x.dtype
    vec = lambda a: a.reshape(1, -1).astype(dt)     # noqa: E731
    full = lambda i: (0, 0)                         # noqa: E731
    kernel = functools.partial(_ln_qkv_kernel, eps=eps)
    blk = pl.BlockSpec((rows, d), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((d, d), full, memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((1, d), full, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n // rows,),
        in_specs=[blk, vspec, vspec, wspec, vspec, wspec, wspec, vspec],
        out_specs=(blk, blk, blk),
        out_shape=tuple(
            jax.ShapeDtypeStruct((n, d), dt) for _ in range(3)),
        interpret=interpret,
    )(x, vec(ln_g), vec(ln_b), wq.astype(dt), vec(bq), wk.astype(dt),
      wv.astype(dt), vec(bv))


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def encoder_mlp(
    x: jnp.ndarray,                                # [B, T, D] or [N, D]
    ln_g: jnp.ndarray, ln_b: jnp.ndarray,
    w1: jnp.ndarray, b1: jnp.ndarray,              # [D, F], [F]
    w2: jnp.ndarray, b2: jnp.ndarray,              # [F, D], [D]
    *,
    eps: float = 1e-5,
    interpret: bool = False,
) -> jnp.ndarray:
    """x + fc2(gelu(fc1(LN(x)))) over encoder-scale row counts.

    Row blocks sized for VMEM: weights (D*F bf16 x2) stay resident,
    the f32 [rows, F] intermediate is the budget driver."""
    shape = x.shape
    d = shape[-1]
    f = w1.shape[1]
    x2 = x.reshape(-1, d)
    n = x2.shape[0]
    rows = 256
    # f32 intermediate [rows, F] + 2x weights + in/out blocks under ~12 MB
    while rows > 8 and (rows * f * 4 + 4 * d * f + 4 * rows * d) > 12e6:
        rows //= 2
    while n % rows:
        rows //= 2
    dt = x.dtype
    vec = lambda a: a.reshape(1, -1).astype(dt)     # noqa: E731
    full = lambda i: (0, 0)                         # noqa: E731
    kernel = functools.partial(_mlp_kernel, eps=eps)
    blk = pl.BlockSpec((rows, d), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(n // rows,),
        in_specs=[
            blk,
            pl.BlockSpec((1, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, f), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((f, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), full, memory_space=pltpu.VMEM),
        ],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((n, d), dt),
        interpret=interpret,
    )(x2, vec(ln_g), vec(ln_b), w1.astype(dt), vec(b1),
      w2.astype(dt), vec(b2))
    return out.reshape(shape)


def use_fused_blocks(t: int) -> bool:
    """Auto rule: real TPU, long context (same gate as fused attention)."""
    try:
        dev = jax.devices()[0].platform
    except Exception:  # pragma: no cover
        return False
    return dev == "tpu" and t >= 512
