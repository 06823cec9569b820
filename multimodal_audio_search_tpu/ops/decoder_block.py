"""Fused decoder-layer blocks for KV-cached decode (Pallas).

After the fused attention kernels (ops/cross_attention.py) took decode to
its cross-KV bandwidth floor, the residue is tens of small XLA ops per
layer per step (LNs, projections, cache updates, adds). These kernels
fold a whole decoder sub-block into one Pallas call each:

  fused_self_block:   x -> LN -> q/k/v proj -> cache row write ->
                      masked block-diag self-attention -> o proj -> +x
  fused_cross_mlp_block: x -> LN -> cross-q proj -> block-diag
                      cross-attention (streamed K/V) -> o proj -> +x
                      -> LN -> MLP -> +x

Both reuse the merged-head layout and block-diagonal matmul trick of
ops/cross_attention.py (see that module's docstring for the Mosaic
constraints that shaped it). The self block updates the KV cache
IN PLACE via input_output_aliases — the cache row write happens in VMEM
between the projection and the attention, so the step's own k1/v1 are
attended to without a second HBM round-trip.

Opt-in via DecodeConfig.fused_layer; token-exactness vs the unfused path
is asserted in tests (f32) and the TPU bf16 paths agree to rounding.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BC = 8


def _self_block_kernel(pos_ref, x_ref, g1_ref, b1_ref, wq_ref, bq_ref,
                       wk_ref, wv_ref, bv_ref, wo_ref, bo_ref,
                       kin_ref, vin_ref,
                       xo_ref, k1_ref, v1_ref, *,
                       scale: float, heads: int, d: int, eps: float):
    bc, l, hd = kin_ref.shape
    pos = pos_ref[0, 0]
    x = x_ref[...].astype(jnp.float32)                         # [BC, D]
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    h = ((x - mu) * jax.lax.rsqrt(var + eps)
         * g1_ref[0].astype(jnp.float32)
         + b1_ref[0].astype(jnp.float32)).astype(x_ref.dtype)

    def proj(w_ref, b_ref):
        y = jax.lax.dot_general(
            h, w_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if b_ref is not None:
            y = y + b_ref[0].astype(jnp.float32)
        return y.astype(x_ref.dtype)                           # [BC, D]

    q1 = proj(wq_ref, bq_ref)
    k1 = proj(wk_ref, None)
    v1 = proj(wv_ref, bv_ref)
    # this step's k1/v1 leave as small outputs; XLA writes the cache row
    # in place outside (a dynamic sublane store at arbitrary pos is not
    # Mosaic-lowerable, and a masked full-cache rewrite costs an extra
    # full write-back per layer per step). The kernel attends over the
    # STALE cache rows (< pos) and adds the fresh row's term in closed
    # form: its logit is the per-head dot q1.k1, computed for all heads
    # at once as (q1*k1) @ blockmask.
    k1_ref[...] = k1
    v1_ref[...] = v1

    rows = jax.lax.broadcasted_iota(jnp.int32, (hd, heads), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (hd, heads), 1)
    blockmask = (rows // d) == cols
    maskf = blockmask.astype(x_ref.dtype)                      # [H*D, H]
    mask_t = blockmask.astype(jnp.float32).T                   # [H, H*D]
    t_idx = jax.lax.broadcasted_iota(jnp.int32, (l, heads), 0)
    valid = t_idx < pos                                        # strictly

    # fresh-row logits for every row at once: [BC, H]
    l_new = jax.lax.dot_general(
        (q1.astype(jnp.float32) * k1.astype(jnp.float32))
        .astype(x_ref.dtype), maskf,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale

    outs = []
    for b in range(bc):                                        # static
        qcol = q1[b].astype(jnp.float32)[:, None]              # [H*D, 1]
        w = jnp.where(blockmask, qcol, 0.0).astype(x_ref.dtype)
        logits = jax.lax.dot_general(
            kin_ref[b], w,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale        # [L, H]
        logits = jnp.where(valid, logits, -1e30)
        ln = l_new[b][None, :]                                 # [1, H]
        m = jnp.maximum(jnp.max(logits, axis=0, keepdims=True), ln)
        p = jnp.exp(logits - m)
        pn = jnp.exp(ln - m)                                   # [1, H]
        denom = jnp.sum(p, axis=0, keepdims=True) + pn
        p = p / denom
        pn = pn / denom
        of = jax.lax.dot_general(
            p.astype(x_ref.dtype), vin_ref[b],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                # [H, H*D]
        row = jnp.sum(of * mask_t, axis=0, keepdims=True)      # [1, H*D]
        # fresh-row value contribution: broadcast per-head weight pn
        # across its 64-lane group via blockmask
        pn_b = jax.lax.dot_general(
            pn.astype(x_ref.dtype), maskf,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                # [1, H*D]
        outs.append(row + pn_b * v1[b].astype(jnp.float32))
    attn = jnp.concatenate(outs, axis=0).astype(x_ref.dtype)   # [BC, H*D]

    o = jax.lax.dot_general(
        attn, wo_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) \
        + bo_ref[0].astype(jnp.float32)
    xo_ref[...] = (x + o).astype(xo_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("heads", "eps", "interpret"))
def fused_self_block(
    x: jnp.ndarray,        # [B, D]
    ln_g: jnp.ndarray, ln_b: jnp.ndarray,          # [D]
    wq: jnp.ndarray, bq: jnp.ndarray,              # [D, D], [D]
    wk: jnp.ndarray,                               # [D, D] (no bias)
    wv: jnp.ndarray, bv: jnp.ndarray,
    wo: jnp.ndarray, bo: jnp.ndarray,
    k_cache: jnp.ndarray,  # [B, L, D]
    v_cache: jnp.ndarray,
    pos: jnp.ndarray,      # scalar int32
    *,
    heads: int,
    eps: float = 1e-5,
    interpret: bool = False,
):
    """Returns (x_out [B, D], k1 [B, D], v1 [B, D]); the caller writes
    k1/v1 into the cache row at ``pos`` (XLA does that in place inside
    the decode loop) — the kernel already attended to them."""
    b, hd = x.shape
    l = k_cache.shape[1]
    d = hd // heads
    scale = 1.0 / math.sqrt(d)
    assert b % BC == 0, "decode batches are power-of-two bucketed (>=8)"
    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1, 1)
    vec = lambda a: a.reshape(1, hd).astype(x.dtype)  # noqa: E731
    kernel = functools.partial(_self_block_kernel, scale=scale,
                               heads=heads, d=d, eps=eps)
    row = lambda i: (i, 0)          # noqa: E731
    full = lambda i: (0, 0)         # noqa: E731
    out = pl.pallas_call(
        kernel,
        grid=(b // BC,),
        in_specs=[
            pl.BlockSpec((1, 1), full, memory_space=pltpu.SMEM),
            pl.BlockSpec((BC, hd), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hd), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hd), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((hd, hd), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hd), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((hd, hd), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((hd, hd), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hd), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((hd, hd), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hd), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((BC, l, hd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BC, l, hd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((BC, hd), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((BC, hd), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((BC, hd), row, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, hd), x.dtype),
            jax.ShapeDtypeStruct((b, hd), k_cache.dtype),
            jax.ShapeDtypeStruct((b, hd), v_cache.dtype),
        ),
        interpret=interpret,
    )(pos_arr, x, vec(ln_g), vec(ln_b), wq.astype(x.dtype), vec(bq),
      wk.astype(x.dtype), wv.astype(x.dtype), vec(bv),
      wo.astype(x.dtype), vec(bo), k_cache, v_cache)
    return out
