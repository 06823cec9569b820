"""Fused encoder attention block: all heads + o-proj + residual in ONE
kernel (round-3 MFU push, ROADMAP 17).

What the round-3 TPU profile showed (tools/profile_encode.py, B=64/10 s):

  * XLA already runs the LN+MLP+residual sub-block at MFU ~1.0 — Pallas
    LN/MLP kernels measured SLOWER (grid + weight-DMA overhead), so no
    kernels exist for those stages; XLA keeps them.
  * The per-(batch, head) fused attention kernel (ops/attention.py) ran
    at MFU 0.114: its grid is B*H*T/blk steps of ~34 MFLOP each — a
    microsecond-scale fixed cost per step (DMA setup/semaphores)
    dominates, and every block has a 64-lane last dim (half of each
    128-lane row idle).

This kernel restructures the grid to (B, T/blk_q): one step processes
ALL heads for a query block (8x the arithmetic per step at whisper-base),
then concatenates head outputs to the merged [blk_q, H*D] layout in VMEM
and applies the o-projection + residual add in the epilogue — the XLA
merge-heads transpose and the separate o-proj matmul (MFU 0.111)
disappear entirely.

Accelerates the per-segment HF encoder call of the reference
(/root/reference/audio_search.py:358-362); behavior-neutral to bf16
rounding (parity-tested in interpret mode on CPU).
"""
from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _attn_o_kernel(q_ref, k_ref, v_ref, x_ref, wo_ref, bo_ref, o_ref,
                   *, t_real: int, scale: float, heads: int,
                   defer_div: bool, use_exp2: bool = False):
    """One query block, every head, + o-proj + residual.

    q_ref [1, H, blk_q, D]; k_ref/v_ref [1, H, T_pad, D];
    x_ref/o_ref [1, blk_q, H*D]; wo_ref [H*D, H*D]; bo_ref [1, H*D].

    A streaming online-softmax variant (static blk_k chunks) lived here
    through round 4; the round-4 on-chip A/B removed it — it crashed
    the real Mosaic compile helper at the 30 s context and was within
    noise of this full-T formulation at 10 s once timed at decision
    grade (docs/BENCHMARKS.md "Round-4 on-chip A/Bs"; recoverable from
    git history if a future TPU generation lifts the VMEM wall).
    """
    t_pad = k_ref.shape[2]
    # use_exp2: log2(e) is folded into ``scale`` by the wrapper, so the
    # softmax exponential is a bare exp2 — one fewer VPU multiply pass
    # over every score tile; softmax output is identical to f32 rounding
    _exp = jnp.exp2 if use_exp2 else jnp.exp
    outs = []
    for h in range(heads):                      # static unroll
        q = q_ref[0, h].astype(jnp.float32) * scale        # [blk_q, D]
        k = k_ref[0, h]                                    # [T_pad, D]
        s = jax.lax.dot_general(
            q.astype(k.dtype), k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # [blk_q, T_pad]
        if t_real < t_pad:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < t_real, s, NEG_INF)
        m = jnp.max(s, axis=1, keepdims=True)
        p = _exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        if defer_div:
            # softmax /l deferred onto the [blk_q, D] PV output instead
            # of the [blk_q, T] score tile: T/D = 8-24x less divide work
            # and one fewer T-wide f32 temp — measured 2.0x kernel
            # speedup at the 10 s context
            # (tools/profile_encoder_kernel_ab.py); math identical up to
            # f32 rounding. Gated to single-query-block grids by the
            # wrapper: at t_pad > blk_q (30 s parity context) the
            # deferral keeps one extra [blk_q, T] live temp per unrolled
            # head and overflows scoped VMEM by ~440 KB at blk_q=128
            # (16.43M vs the 16M budget — the round-4 "Mosaic crash"
            # root-caused by tools/probe_deferdiv.py, round 5); at
            # blk_q=64, where it fits, both the div and recip forms
            # measured SLOWER than off:128 on chip (9.0 vs 8.18 ms,
            # docs/onchip_r5/deferdiv2.out), so the gate stands on
            # evidence, not on a compiler mystery.
            pv = jax.lax.dot_general(
                p.astype(v_ref.dtype), v_ref[0, h],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # [blk_q, D]
            if defer_div == "recip":
                # same deferral, divide-free: one [blk_q, 1] reciprocal
                # + a broadcast multiply instead of a broadcast divide
                outs.append(pv * (1.0 / l))
            else:
                outs.append(pv / l)
        else:
            p = (p / l).astype(v_ref.dtype)
            outs.append(jax.lax.dot_general(
                p, v_ref[0, h],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))       # [blk_q, D]
    attn = jnp.concatenate(outs, axis=-1)                  # [blk_q, H*D]
    y = jax.lax.dot_general(
        attn.astype(wo_ref.dtype), wo_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) \
        + bo_ref[0].astype(jnp.float32)
    o_ref[0] = (x_ref[0].astype(jnp.float32) + y).astype(o_ref.dtype)


def _attn_o_kernel_paired(qp_ref, kb_ref, vb_ref, x_ref, wo_ref, bo_ref,
                          o_ref, *, t_real: int, scale: float, pairs: int,
                          defer_div: bool, use_exp2: bool = False):
    """Head-PAIRED variant (round-3 verdict item 6): two D=64 heads per
    dot via block-diagonal K/V packing, so every score dot contracts the
    full 128-lane MXU depth and every PV dot emits a full 128-lane tile.

    qp_ref [1, P, blk_q, 2D]; kb_ref [1, P, 2D, 2T_pad] block-diag
    (upper-left = head 2p keys^T, lower-right = head 2p+1);
    vb_ref [1, P, 2T_pad, 2D] block-diag likewise. The block-diagonal
    zeros make the joint contraction separable: cols [:T] of the score
    dot see only head 2p, cols [T:] only head 2p+1.

    A-priori accounting says this is MXU-time NEUTRAL — a K=64 pass
    costs a full array pass either way, and packing converts the idle
    depth 1:1 into doubled output tiles — while K/V HBM traffic and
    VMEM double (structural zeros). It exists to MEASURE that claim
    (tools/profile_headpair_ab.py); it is not wired into production.
    """
    t_pad = kb_ref.shape[3] // 2
    _exp = jnp.exp2 if use_exp2 else jnp.exp
    outs = []
    for p in range(pairs):                          # static unroll
        q = (qp_ref[0, p].astype(jnp.float32) * scale).astype(
            kb_ref.dtype)                                  # [blk_q, 2D]
        s2 = jax.lax.dot_general(
            q, kb_ref[0, p],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # [blk_q, 2T]
        if t_real < t_pad:
            col = jax.lax.broadcasted_iota(jnp.int32, s2.shape, 1)
            valid = (col < t_real) | ((col >= t_pad)
                                      & (col < t_pad + t_real))
            s2 = jnp.where(valid, s2, NEG_INF)
        sa, sb = s2[:, :t_pad], s2[:, t_pad:]       # 128-multiple slices
        ma = jnp.max(sa, axis=1, keepdims=True)
        mb = jnp.max(sb, axis=1, keepdims=True)
        pa = _exp(sa - ma)
        pb = _exp(sb - mb)
        la = jnp.sum(pa, axis=1, keepdims=True)
        lb = jnp.sum(pb, axis=1, keepdims=True)
        if defer_div:
            p2 = jnp.concatenate([pa, pb], axis=1).astype(vb_ref.dtype)
            pv = jax.lax.dot_general(
                p2, vb_ref[0, p],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # [blk_q, 2D]
            d2 = pv.shape[1] // 2
            ldiv = jnp.concatenate(
                [jnp.broadcast_to(la, (la.shape[0], d2)),
                 jnp.broadcast_to(lb, (lb.shape[0], d2))], axis=1)
            outs.append(pv / ldiv)
        else:
            p2 = jnp.concatenate([pa / la, pb / lb],
                                 axis=1).astype(vb_ref.dtype)
            outs.append(jax.lax.dot_general(
                p2, vb_ref[0, p],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
    attn = jnp.concatenate(outs, axis=-1)                  # [blk_q, H*D]
    y = jax.lax.dot_general(
        attn.astype(wo_ref.dtype), wo_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) \
        + bo_ref[0].astype(jnp.float32)
    o_ref[0] = (x_ref[0].astype(jnp.float32) + y).astype(o_ref.dtype)


def _attn_o_kernel_int8(q_ref, k8_ref, ks_ref, v8_ref, vs_ref, x_ref,
                        wo_ref, bo_ref, o_ref, *, t_real: int,
                        scale: float, heads: int, use_exp2: bool = False):
    """int8-dot variant (round-4 MFU lever): both attention dots run as
    int8 x int8 -> int32 MXU ops — 2x the bf16 MXU throughput on v5e —
    with the quantization scales factored around the dots:

      scores = (q8 . k8) * q_rowscale * k_posscale       (k from XLA-side
                                                          quantize_kv)
      out    = ((p * v_posscale)8 . v8) * p_rowscale     (position scale
                                                          folded into p
                                                          BEFORE its row
                                                          quantization,
                                                          so it commutes
                                                          through the T
                                                          contraction)

    q_ref [1, H, blk_q, D] bf16; k8/v8 [1, H, T_pad, D] int8;
    ks/vs [1, H, T_pad] f32 per-position scales. Lossy (int8 rounding on
    q and the softmax rows) — an OPT-IN fast mode whose drift the synth
    oracle measures; same quantization family as the transcript-exact
    int8 cross-KV decode path (ops/cached_attention.py).
    """
    t_pad = k8_ref.shape[2]
    _exp = jnp.exp2 if use_exp2 else jnp.exp
    outs = []
    for h in range(heads):                          # static unroll
        qf = q_ref[0, h].astype(jnp.float32) * scale       # [blk_q, D]
        qs = jnp.maximum(jnp.max(jnp.abs(qf), axis=1, keepdims=True),
                         1e-12) / 127.0
        q8 = jnp.clip(jnp.round(qf / qs), -127, 127).astype(jnp.int8)
        s = jax.lax.dot_general(
            q8, k8_ref[0, h],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32)
        s = s * qs * ks_ref[0, h][None, :]                 # [blk_q, T]
        if t_real < t_pad:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < t_real, s, NEG_INF)
        m = jnp.max(s, axis=1, keepdims=True)
        p = _exp(s - m)
        p = p / jnp.sum(p, axis=1, keepdims=True)
        pw = p * vs_ref[0, h][None, :]
        ps = jnp.maximum(jnp.max(jnp.abs(pw), axis=1, keepdims=True),
                         1e-30) / 127.0
        p8 = jnp.clip(jnp.round(pw / ps), -127, 127).astype(jnp.int8)
        pv = jax.lax.dot_general(
            p8, v8_ref[0, h],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32)
        outs.append(pv * ps)                               # [blk_q, D]
    attn = jnp.concatenate(outs, axis=-1)                  # [blk_q, H*D]
    y = jax.lax.dot_general(
        attn.astype(wo_ref.dtype), wo_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) \
        + bo_ref[0].astype(jnp.float32)
    o_ref[0] = (x_ref[0].astype(jnp.float32) + y).astype(o_ref.dtype)


def int8_attention_xla(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray
                       ) -> jnp.ndarray:
    """Plain-XLA twin of ``_attn_o_kernel_int8``'s quantized attention
    math: [B, H, T, D] q/k/v -> [B, H, T, D] attention output. Same
    per-row q / softmax-row quantization and per-position K/V scales, so
    the CPU drift oracle (tools/synth_drift.py int8_enc mode) measures
    exactly the arithmetic the TPU kernel executes."""
    from .cached_attention import quantize_kv
    d = q.shape[-1]
    k8, ks, v8, vs = quantize_kv(k, v)
    qf = q.astype(jnp.float32) / math.sqrt(d)
    qs = jnp.maximum(jnp.max(jnp.abs(qf), axis=-1, keepdims=True),
                     1e-12) / 127.0
    q8 = jnp.clip(jnp.round(qf / qs), -127, 127)
    s = jnp.einsum("bhqd,bhtd->bhqt", q8, k8.astype(jnp.float32))
    s = s * qs * ks[:, :, None, :]
    p = jax.nn.softmax(s, axis=-1)
    pw = p * vs[:, :, None, :]
    ps = jnp.maximum(jnp.max(jnp.abs(pw), axis=-1, keepdims=True),
                     1e-30) / 127.0
    p8 = jnp.clip(jnp.round(pw / ps), -127, 127)
    return jnp.einsum("bhqt,bhtd->bhqd", p8,
                      v8.astype(jnp.float32)) * ps


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(
    jax.jit, static_argnames=("blk_q", "use_exp2", "pair_heads",
                              "qk_int8", "interpret"))
def fused_attention_o_residual(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,   # [B, H, T, D]
    x: jnp.ndarray,                                   # [B, T, HD_out]
    wo: jnp.ndarray, bo: jnp.ndarray,                 # [H*D, HD_out], [HD_out]
    blk_q: int = 256, use_exp2: bool = False,
    pair_heads: bool = False, qk_int8: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """x + (softmax(QK^T/sqrt(D)) V merged over heads) @ Wo + bo.

    Non-causal, padding-masked (keys >= T are masked), f32 softmax and
    accumulation. Output is [B, T, HD_out] — the next LN consumes it
    directly, no head merge transpose.

    Single-device: ``HD_out == H*D`` (square Wo). Under tensor
    parallelism, each device holds an H/mp head shard and the matching
    [H*D/mp, HD_out] ROW shard of Wo (Megatron attention layout); the
    kernel emits that device's partial [B, T, HD_out] which psum over
    'model' completes (tests/test_production_geometry_mesh.py).
    """
    b, h, t, d = q.shape
    hd = x.shape[-1]
    assert wo.shape == (h * d, hd) and bo.shape[-1] == hd, \
        (wo.shape, bo.shape, (h * d, hd))
    scale = 1.0 / math.sqrt(d)
    t_pad = _round_up(t, blk_q)
    if t_pad != t:
        pad4 = ((0, 0), (0, 0), (0, t_pad - t), (0, 0))
        q = jnp.pad(q, pad4)
        k = jnp.pad(k, pad4)
        v = jnp.pad(v, pad4)
        x = jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))
    dt = x.dtype
    if use_exp2:
        # exp(x) == exp2(x * log2 e): fold the change of base into the
        # q scale so every in-kernel exponential is a bare exp2
        scale *= math.log2(math.e)
    if qk_int8:
        assert not pair_heads, pair_heads
        from .cached_attention import quantize_kv
        k8, ks, v8, vs = quantize_kv(k, v)
        kernel = functools.partial(
            _attn_o_kernel_int8, t_real=t, scale=scale, heads=h,
            use_exp2=use_exp2)
        out = pl.pallas_call(
            kernel,
            grid=(b, t_pad // blk_q),
            in_specs=[
                pl.BlockSpec((1, h, blk_q, d), lambda bi, i: (bi, 0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, h, t_pad, d), lambda bi, i: (bi, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, h, t_pad), lambda bi, i: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, h, t_pad, d), lambda bi, i: (bi, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, h, t_pad), lambda bi, i: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, blk_q, hd), lambda bi, i: (bi, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((h * d, hd), lambda bi, i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, hd), lambda bi, i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, blk_q, hd), lambda bi, i: (bi, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, t_pad, hd), dt),
            cost_estimate=pl.CostEstimate(
                flops=4 * b * h * t_pad * t_pad * d
                + 2 * b * t_pad * (h * d) * hd,
                bytes_accessed=b * h * t_pad * d * 2
                + b * t_pad * hd * 4 * 2,
                transcendentals=b * h * t_pad * t_pad),
            interpret=interpret,
        )(q.astype(dt), k8, ks.astype(jnp.float32),
          v8, vs.astype(jnp.float32), x,
          wo.astype(dt), bo.reshape(1, hd).astype(dt))
        return out[:, :t, :]
    if pair_heads:
        assert h % 2 == 0, h
        pairs = h // 2
        # block-diagonal packing, built XLA-side (doubles K/V bytes with
        # structural zeros — part of what the A/B measures)
        qe, qo = q[:, 0::2], q[:, 1::2]                # [B, P, T, D]
        qp = jnp.concatenate([qe, qo], axis=-1)        # [B, P, T, 2D]
        kTe = k[:, 0::2].transpose(0, 1, 3, 2)         # [B, P, D, T]
        kTo = k[:, 1::2].transpose(0, 1, 3, 2)
        z = jnp.zeros_like(kTe)
        kb = jnp.concatenate(
            [jnp.concatenate([kTe, z], axis=-1),
             jnp.concatenate([z, kTo], axis=-1)], axis=-2)  # [B,P,2D,2T]
        zv = jnp.zeros_like(v[:, 0::2])
        vb = jnp.concatenate(
            [jnp.concatenate([v[:, 0::2], zv], axis=-1),
             jnp.concatenate([zv, v[:, 1::2]], axis=-1)],
            axis=-2)                                   # [B, P, 2T, 2D]
        kernel = functools.partial(
            _attn_o_kernel_paired, t_real=t, scale=scale, pairs=pairs,
            defer_div=(t_pad == blk_q), use_exp2=use_exp2)
        out = pl.pallas_call(
            kernel,
            grid=(b, t_pad // blk_q),
            in_specs=[
                pl.BlockSpec((1, pairs, blk_q, 2 * d),
                             lambda bi, i: (bi, 0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, pairs, 2 * d, 2 * t_pad),
                             lambda bi, i: (bi, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, pairs, 2 * t_pad, 2 * d),
                             lambda bi, i: (bi, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, blk_q, hd), lambda bi, i: (bi, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((h * d, hd), lambda bi, i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, hd), lambda bi, i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, blk_q, hd), lambda bi, i: (bi, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, t_pad, hd), dt),
            cost_estimate=pl.CostEstimate(
                flops=4 * b * h * t_pad * t_pad * d
                + 2 * b * t_pad * (h * d) * hd,
                bytes_accessed=b * t_pad * hd * 8 * 2,
                transcendentals=b * h * t_pad * t_pad),
            interpret=interpret,
        )(qp.astype(dt), kb.astype(dt), vb.astype(dt), x,
          wo.astype(dt), bo.reshape(1, hd).astype(dt))
        return out[:, :t, :]
    # defer_div default: single-step grids only ("div" form). At
    # multi-step grids the deferral overflows scoped VMEM at blk_q=128
    # and loses to off:128 at blk_q=64 (round-5 on-chip probe,
    # docs/onchip_r5/deferdiv2.out) — so off is the measured optimum
    # there, not a workaround. The MAS_ENC_DEFER override
    # ("div" | "recip" | "off") exists for tools/probe_deferdiv.py;
    # read at trace time, so jitted programs are fixed.
    defer = True if t_pad == blk_q else False
    ov = os.environ.get("MAS_ENC_DEFER", "")
    if ov == "off":
        defer = False
    elif ov in ("div", "recip"):
        defer = True if ov == "div" else "recip"
    kernel = functools.partial(
        _attn_o_kernel, t_real=t, scale=scale, heads=h,
        defer_div=defer, use_exp2=use_exp2)
    qkv_spec = pl.BlockSpec((1, h, t_pad, d), lambda bi, i: (bi, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(b, t_pad // blk_q),
        in_specs=[
            pl.BlockSpec((1, h, blk_q, d), lambda bi, i: (bi, 0, i, 0),
                         memory_space=pltpu.VMEM),
            qkv_spec,
            qkv_spec,
            pl.BlockSpec((1, blk_q, hd), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h * d, hd), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hd), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, blk_q, hd), lambda bi, i: (bi, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, hd), dt),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * t_pad * t_pad * d
            + 2 * b * t_pad * (h * d) * hd,
            bytes_accessed=b * t_pad * hd * 6 * 2,
            transcendentals=b * h * t_pad * t_pad),
        interpret=interpret,
    )(q.astype(dt), k.astype(dt), v.astype(dt), x,
      wo.astype(dt), bo.reshape(1, hd).astype(dt))
    return out[:, :t, :]
