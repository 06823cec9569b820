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

from .cross_attention import KV_BUDGET_BYTES

BC = 8


def _self_block_body(pos_ref, x_ref, g1_ref, b1_ref, wq_ref, bq_ref,
                     wk_ref, wv_ref, bv_ref, wo_ref, bo_ref,
                     kin_ref, vin_ref, *,
                     scale: float, heads: int, d: int, eps: float):
    """Shared self sub-block math; returns (x_out f32 [BC, D], k1, v1)."""
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
    return x + o, k1, v1


def _self_block_kernel(pos_ref, x_ref, g1_ref, b1_ref, wq_ref, bq_ref,
                       wk_ref, wv_ref, bv_ref, wo_ref, bo_ref,
                       kin_ref, vin_ref,
                       xo_ref, k1_ref, v1_ref, *,
                       scale: float, heads: int, d: int, eps: float):
    xo, k1, v1 = _self_block_body(
        pos_ref, x_ref, g1_ref, b1_ref, wq_ref, bq_ref, wk_ref, wv_ref,
        bv_ref, wo_ref, bo_ref, kin_ref, vin_ref,
        scale=scale, heads=heads, d=d, eps=eps)
    k1_ref[...] = k1
    v1_ref[...] = v1
    xo_ref[...] = xo.astype(xo_ref.dtype)


def _self_block_q_kernel(pos_ref, x_ref, g1_ref, b1_ref, wq_ref, bq_ref,
                         wk_ref, wv_ref, bv_ref, wo_ref, bo_ref,
                         kin_ref, vin_ref,
                         g2_ref, b2_ref, wcq_ref, bcq_ref,
                         xo_ref, k1_ref, v1_ref, qc_ref, *,
                         scale: float, heads: int, d: int, eps: float):
    """v2 tail: also emit the NEXT sub-block's query — cross-LN + cross
    q-projection on the self output, removing those XLA ops from the
    per-step graph (wcq adds 0.5 MB of resident VMEM weights)."""
    xo, k1, v1 = _self_block_body(
        pos_ref, x_ref, g1_ref, b1_ref, wq_ref, bq_ref, wk_ref, wv_ref,
        bv_ref, wo_ref, bo_ref, kin_ref, vin_ref,
        scale=scale, heads=heads, d=d, eps=eps)
    k1_ref[...] = k1
    v1_ref[...] = v1
    xo_ref[...] = xo.astype(xo_ref.dtype)
    mu = jnp.mean(xo, axis=-1, keepdims=True)
    var = jnp.mean((xo - mu) ** 2, axis=-1, keepdims=True)
    h2 = ((xo - mu) * jax.lax.rsqrt(var + eps)
          * g2_ref[0].astype(jnp.float32)
          + b2_ref[0].astype(jnp.float32)).astype(x_ref.dtype)
    qc = jax.lax.dot_general(
        h2, wcq_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) \
        + bcq_ref[0].astype(jnp.float32)
    qc_ref[...] = qc.astype(qc_ref.dtype)


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


@functools.partial(jax.jit,
                   static_argnames=("heads", "eps", "interpret"))
def fused_self_block_q(
    x: jnp.ndarray,        # [B, D]
    ln_g: jnp.ndarray, ln_b: jnp.ndarray,
    wq: jnp.ndarray, bq: jnp.ndarray,
    wk: jnp.ndarray,
    wv: jnp.ndarray, bv: jnp.ndarray,
    wo: jnp.ndarray, bo: jnp.ndarray,
    cross_ln_g: jnp.ndarray, cross_ln_b: jnp.ndarray,
    wcq: jnp.ndarray, bcq: jnp.ndarray,
    k_cache: jnp.ndarray,
    v_cache: jnp.ndarray,
    pos: jnp.ndarray,
    *,
    heads: int,
    eps: float = 1e-5,
    interpret: bool = False,
):
    """fused_self_block + the next sub-block's cross-LN + q-projection in
    the same kernel. Returns (x_out, k1, v1, q_cross [B, D])."""
    b, hd = x.shape
    l = k_cache.shape[1]
    d = hd // heads
    scale = 1.0 / math.sqrt(d)
    assert b % BC == 0, "decode batches are power-of-two bucketed (>=8)"
    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1, 1)
    vec = lambda a: a.reshape(1, hd).astype(x.dtype)  # noqa: E731
    kernel = functools.partial(_self_block_q_kernel, scale=scale,
                               heads=heads, d=d, eps=eps)
    row = lambda i: (i, 0)          # noqa: E731
    full = lambda i: (0, 0)         # noqa: E731
    wspec = pl.BlockSpec((hd, hd), full, memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((1, hd), full, memory_space=pltpu.VMEM)
    rspec = pl.BlockSpec((BC, hd), row, memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(b // BC,),
        in_specs=[
            pl.BlockSpec((1, 1), full, memory_space=pltpu.SMEM),
            rspec, vspec, vspec, wspec, vspec, wspec, wspec, vspec,
            wspec, vspec,
            pl.BlockSpec((BC, l, hd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BC, l, hd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            vspec, vspec, wspec, vspec,
        ],
        out_specs=(rspec, rspec, rspec, rspec),
        out_shape=(
            jax.ShapeDtypeStruct((b, hd), x.dtype),
            jax.ShapeDtypeStruct((b, hd), k_cache.dtype),
            jax.ShapeDtypeStruct((b, hd), v_cache.dtype),
            jax.ShapeDtypeStruct((b, hd), x.dtype),
        ),
        interpret=interpret,
    )(pos_arr, x, vec(ln_g), vec(ln_b), wq.astype(x.dtype), vec(bq),
      wk.astype(x.dtype), wv.astype(x.dtype), vec(bv),
      wo.astype(x.dtype), vec(bo), k_cache, v_cache,
      vec(cross_ln_g), vec(cross_ln_b), wcq.astype(x.dtype), vec(bcq))
    return out


def _mlp_o_kernel(x_ref, attn_ref, wco_ref, bco_ref,
                  g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                  xo_ref, *, eps: float):
    """v2: cross o-projection + residual folded in front of the MLP
    sub-block — x = x_prev + attn @ wco + bco, then x + MLP(LN(x))."""
    x = x_ref[...].astype(jnp.float32)                          # [R, D]
    x = x + jax.lax.dot_general(
        attn_ref[...], wco_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) \
        + bco_ref[0].astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    h = ((x - mu) * jax.lax.rsqrt(var + eps)
         * g_ref[0].astype(jnp.float32)
         + b_ref[0].astype(jnp.float32)).astype(x_ref.dtype)
    u = jax.lax.dot_general(
        h, w1_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) \
        + b1_ref[0].astype(jnp.float32)                         # [R, F]
    z = u / jnp.sqrt(2.0).astype(u.dtype)
    s = jnp.sign(z)
    az = jnp.abs(z)
    tt = 1.0 / (1.0 + 0.3275911 * az)
    poly = tt * (0.254829592 + tt * (-0.284496736 + tt * (
        1.421413741 + tt * (-1.453152027 + tt * 1.061405429))))
    erf = s * (1.0 - poly * jnp.exp(-az * az))
    u = 0.5 * u * (1.0 + erf)
    y = jax.lax.dot_general(
        u.astype(x_ref.dtype), w2_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) \
        + b2_ref[0].astype(jnp.float32)
    xo_ref[...] = (x + y).astype(xo_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def fused_mlp_block_o(
    x: jnp.ndarray,                                # [B, D] (pre-cross-o)
    attn: jnp.ndarray,                             # [B, D] merged attn
    wco: jnp.ndarray, bco: jnp.ndarray,            # cross o-projection
    ln_g: jnp.ndarray, ln_b: jnp.ndarray,
    w1: jnp.ndarray, b1: jnp.ndarray,
    w2: jnp.ndarray, b2: jnp.ndarray,
    *,
    eps: float = 1e-5,
    interpret: bool = False,
) -> jnp.ndarray:
    """cross o-proj + residual + LN + MLP + residual in ONE all-rows
    kernel (v2 of fused_mlp_block; +0.5 MB resident wco)."""
    b, hd = x.shape
    f = w1.shape[1]
    rows = b
    while rows > 8 and (2 * hd * f * 2 + hd * hd * 2
                        + rows * f * 4
                        + 5 * rows * hd * 4) > KV_BUDGET_BYTES:
        rows //= 2
    assert b % rows == 0
    dt = x.dtype
    vec = lambda a, n: a.reshape(1, n).astype(dt)   # noqa: E731
    full2 = lambda i: (0, 0)                        # noqa: E731
    kernel = functools.partial(_mlp_o_kernel, eps=eps)
    return pl.pallas_call(
        kernel,
        grid=(b // rows,),
        in_specs=[
            pl.BlockSpec((rows, hd), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, hd), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hd, hd), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hd), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hd), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hd), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((hd, f), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((f, hd), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hd), full2, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, hd), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hd), dt),
        interpret=interpret,
    )(x, attn.astype(dt), wco.astype(dt), vec(bco, hd),
      vec(ln_g, hd), vec(ln_b, hd), w1.astype(dt), vec(b1, f),
      w2.astype(dt), vec(b2, hd))


def _cross_mlp_kernel(x_ref, g2_ref, b2_ref, wcq_ref, bcq_ref,
                      wco_ref, bco_ref, g3_ref, b3_ref,
                      wm1_ref, bm1_ref, wm2_ref, bm2_ref,
                      k_ref, v_ref, xo_ref, *,
                      scale: float, heads: int, d: int, eps: float):
    kc, t, hd = k_ref.shape
    subs = BC // kc
    sub = pl.program_id(0) % subs

    rows = jax.lax.broadcasted_iota(jnp.int32, (hd, heads), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (hd, heads), 1)
    blockmask = (rows // d) == cols
    mask_t = blockmask.astype(jnp.float32).T                   # [H, H*D]

    def ln(xf, g_ref, b_ref):
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
        return ((xf - mu) * jax.lax.rsqrt(var + eps)
                * g_ref[0].astype(jnp.float32)
                + b_ref[0].astype(jnp.float32))

    def run(base: int):
        x = x_ref[base: base + kc].astype(jnp.float32)         # [kc, D]
        h = ln(x, g2_ref, b2_ref).astype(x_ref.dtype)
        q1 = (jax.lax.dot_general(
            h, wcq_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
            + bcq_ref[0].astype(jnp.float32)).astype(x_ref.dtype)
        outs = []
        for b in range(kc):                                    # static
            qcol = q1[b].astype(jnp.float32)[:, None]
            w = jnp.where(blockmask, qcol, 0.0).astype(x_ref.dtype)
            logits = jax.lax.dot_general(
                k_ref[b], w,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale    # [T, H]
            m = jnp.max(logits, axis=0, keepdims=True)
            p = jnp.exp(logits - m)
            l = jnp.sum(p, axis=0, keepdims=True)
            of = jax.lax.dot_general(
                p.astype(x_ref.dtype), v_ref[b],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)            # [H, H*D]
            # softmax /l deferred to the [H, H*D] output (see
            # cross_attention._kernel): one fewer T-wide VPU pass
            outs.append(jnp.sum((of / l.T) * mask_t, axis=0,
                                keepdims=True))
        attn = jnp.concatenate(outs, axis=0).astype(x_ref.dtype)
        x = x + jax.lax.dot_general(
            attn, wco_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) \
            + bco_ref[0].astype(jnp.float32)                   # [kc, D]
        h = ln(x, g3_ref, b3_ref).astype(x_ref.dtype)
        u = jax.lax.dot_general(
            h, wm1_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) \
            + bm1_ref[0].astype(jnp.float32)                   # [kc, F]
        # erf-GELU. Mosaic has no erf primitive; use Abramowitz-Stegun
        # 7.1.26 (|err| < 1.5e-7 — far below bf16 resolution, and below
        # the f32 test tolerance)
        z = u / jnp.sqrt(2.0).astype(u.dtype)
        s = jnp.sign(z)
        az = jnp.abs(z)
        tt = 1.0 / (1.0 + 0.3275911 * az)
        poly = tt * (0.254829592 + tt * (-0.284496736 + tt * (
            1.421413741 + tt * (-1.453152027 + tt * 1.061405429))))
        erf = s * (1.0 - poly * jnp.exp(-az * az))
        u = 0.5 * u * (1.0 + erf)
        y = jax.lax.dot_general(
            u.astype(x_ref.dtype), wm2_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) \
            + bm2_ref[0].astype(jnp.float32)
        xo_ref[base: base + kc] = (x + y).astype(xo_ref.dtype)

    for j in range(subs):                                      # static
        @pl.when(sub == j)
        def _(j=j):
            run(j * kc)


@functools.partial(jax.jit,
                   static_argnames=("heads", "eps", "interpret"))
def fused_cross_mlp_block(
    x: jnp.ndarray,                                # [B, D]
    ln2_g, ln2_b, wcq, bcq, wco, bco,
    ln3_g, ln3_b, wm1, bm1, wm2, bm2,
    k_m: jnp.ndarray,                              # [B, T, H*D]
    v_m: jnp.ndarray,
    *,
    heads: int,
    eps: float = 1e-5,
    interpret: bool = False,
) -> jnp.ndarray:
    """x -> +cross_attention(LN(x)) -> +MLP(LN(.)) in ONE kernel; K/V
    stream in kc-row blocks sized so they and the resident MLP weights
    coexist in VMEM. Returns x_out [B, D].

    NOT wired into decode_step: measured SLOWER than the unfused
    cross+MLP at whisper-base shapes (1.06 vs 0.90 ms/step, interleaved
    A/B on TPU) — once the 5.2 MB of MLP weights are VMEM-resident, the
    KV budget collapses to kc=1 rows per grid step, forcing M=1 matmuls
    and an 8x-revisited MLP. Kept as a correctness-tested negative
    result (docs/BENCHMARKS.md); a viable round-3 shape would split
    cross-attention (KV-streaming) from an all-rows MLP kernel."""
    b, hd = x.shape
    t = k_m.shape[1]
    d = hd // heads
    f = wm1.shape[1]
    scale = 1.0 / math.sqrt(d)
    assert b % BC == 0
    # weight residency: wcq+wco (2*hd*hd) + wm1+wm2 (2*hd*f) bf16
    weight_bytes = (2 * hd * hd + 2 * hd * f) * 2
    budget = KV_BUDGET_BYTES - weight_bytes
    kc = BC
    while kc > 1 and 2 * 2 * kc * t * hd * k_m.dtype.itemsize > budget:
        kc //= 2
    subs = BC // kc
    kernel = functools.partial(_cross_mlp_kernel, scale=scale,
                               heads=heads, d=d, eps=eps)
    dt = x.dtype
    vec = lambda a, n: a.reshape(1, n).astype(dt)   # noqa: E731
    full2 = lambda i: (0, 0)                        # noqa: E731
    out = pl.pallas_call(
        kernel,
        grid=(subs * b // BC,),
        in_specs=[
            pl.BlockSpec((BC, hd), lambda i, s=subs: (i // s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hd), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hd), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((hd, hd), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hd), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((hd, hd), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hd), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hd), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hd), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((hd, f), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((f, hd), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hd), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((kc, t, hd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kc, t, hd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BC, hd), lambda i, s=subs: (i // s, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hd), dt),
        interpret=interpret,
    )(x, vec(ln2_g, hd), vec(ln2_b, hd), wcq.astype(dt), vec(bcq, hd),
      wco.astype(dt), vec(bco, hd), vec(ln3_g, hd), vec(ln3_b, hd),
      wm1.astype(dt), vec(bm1, f), wm2.astype(dt), vec(bm2, hd),
      k_m, v_m)
    return out


def _mlp_kernel(x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                xo_ref, *, eps: float):
    x = x_ref[...].astype(jnp.float32)                          # [R, D]
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    h = ((x - mu) * jax.lax.rsqrt(var + eps)
         * g_ref[0].astype(jnp.float32)
         + b_ref[0].astype(jnp.float32)).astype(x_ref.dtype)
    u = jax.lax.dot_general(
        h, w1_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) \
        + b1_ref[0].astype(jnp.float32)                         # [R, F]
    # erf-GELU via Abramowitz-Stegun 7.1.26 (|err| < 1.5e-7; Mosaic has
    # no erf primitive) — same approximation as _cross_mlp_kernel
    z = u / jnp.sqrt(2.0).astype(u.dtype)
    s = jnp.sign(z)
    az = jnp.abs(z)
    tt = 1.0 / (1.0 + 0.3275911 * az)
    poly = tt * (0.254829592 + tt * (-0.284496736 + tt * (
        1.421413741 + tt * (-1.453152027 + tt * 1.061405429))))
    erf = s * (1.0 - poly * jnp.exp(-az * az))
    u = 0.5 * u * (1.0 + erf)
    y = jax.lax.dot_general(
        u.astype(x_ref.dtype), w2_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) \
        + b2_ref[0].astype(jnp.float32)
    xo_ref[...] = (x + y).astype(xo_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def fused_mlp_block(
    x: jnp.ndarray,                                # [B, D]
    ln_g: jnp.ndarray, ln_b: jnp.ndarray,          # [D]
    w1: jnp.ndarray, b1: jnp.ndarray,              # [D, F], [F]
    w2: jnp.ndarray, b2: jnp.ndarray,              # [F, D], [D]
    *,
    eps: float = 1e-5,
    interpret: bool = False,
) -> jnp.ndarray:
    """x -> x + fc2(gelu(fc1(LN(x)))) in ONE kernel, ALL rows at once.

    The round-3 shape proposed by the fused_cross_mlp_block post-mortem:
    keep cross-attention in its own KV-streaming kernel and fold the MLP
    sub-block (LN + fc1 + gelu + fc2 + residual) into one all-rows call —
    the MLP weights (~5 MB bf16 at whisper-base) are VMEM-resident and
    every row hits them once, so there is no KV-budget conflict. Replaces
    ~8 XLA ops per layer per decode step."""
    b, hd = x.shape
    f = w1.shape[1]
    rows = b
    # row block: whole batch while (weights + f32 intermediate) fit VMEM
    while rows > 8 and (2 * hd * f * 2            # w1+w2 bf16
                        + rows * f * 4            # u f32
                        + 4 * rows * hd * 4) > KV_BUDGET_BYTES:
        rows //= 2
    assert b % rows == 0
    dt = x.dtype
    vec = lambda a, n: a.reshape(1, n).astype(dt)   # noqa: E731
    full2 = lambda i: (0, 0)                        # noqa: E731
    kernel = functools.partial(_mlp_kernel, eps=eps)
    return pl.pallas_call(
        kernel,
        grid=(b // rows,),
        in_specs=[
            pl.BlockSpec((rows, hd), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hd), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hd), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((hd, f), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((f, hd), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hd), full2, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, hd), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hd), dt),
        interpret=interpret,
    )(x, vec(ln_g, hd), vec(ln_b, hd), w1.astype(dt), vec(b1, f),
      w2.astype(dt), vec(b2, hd))
