"""Int8 weight quantization + dequant-fused Pallas matmul.

KV-cached decode at small batch is weight-bandwidth-bound: every step
re-reads the decoder's dense weights and the [d, V] logits matrix from HBM.
Symmetric per-output-channel int8 halves those bytes; the Pallas kernel
dequantizes tiles in VMEM on the way into the MXU so the bf16 weights are
never materialized in HBM (XLA alone would materialize the dequantized
matrix, forfeiting the savings).

The reference's design docs list quantization as roadmap
(LIGHTWEIGHT_ARCHITECTURE.md:61-152); here it is a production feature:
``quantize_whisper_decoder(params)`` converts any whisper pytree in place,
and layers.dense dispatches on the quantized leaf structure.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------- quantize
def quantize_weight(w: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """[K, N] float -> (int8 [K, N], scale [N]) symmetric per-column."""
    w = np.asarray(w, np.float32)
    scale = np.maximum(np.abs(w).max(axis=0), 1e-12) / 127.0
    q = np.clip(np.round(w / scale[None, :]), -127, 127).astype(np.int8)
    return q, scale.astype(np.float32)


def quantize_dense(p: dict) -> dict:
    q, s = quantize_weight(np.asarray(p["w"]))
    out = {"wq": jnp.asarray(q), "scale": jnp.asarray(s)}
    if "b" in p:
        out["b"] = jnp.asarray(p["b"])
    return out


def quantize_whisper_decoder(params: dict) -> dict:
    """Quantize decoder dense layers + the tied embedding/logits matrix.

    The encoder stays bf16 (compute-bound under the fused attention kernel);
    layernorms and positions stay float.
    """
    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy
    dec = dict(params["decoder"])
    blocks = []
    for blk in dec["blocks"]:
        nb = dict(blk)
        for attn_key in ("self_attn", "cross_attn"):
            attn = dict(nb[attn_key])
            for proj in ("q", "k", "v", "o"):
                attn[proj] = quantize_dense(attn[proj])
            nb[attn_key] = attn
        nb["mlp_in"] = quantize_dense(nb["mlp_in"])
        nb["mlp_out"] = quantize_dense(nb["mlp_out"])
        blocks.append(nb)
    dec["blocks"] = blocks
    # tied embeddings: logits need [d, V] columns-quantized; token lookup
    # dequantizes per row from the same table
    e = np.asarray(dec["embed_tokens"], np.float32)      # [V, d]
    qt, st = quantize_weight(e.T)                        # [d, V], scale [V]
    dec["embed_tokens_q"] = {"wq": jnp.asarray(qt),
                             "scale": jnp.asarray(st)}
    dec["embed_tokens"] = jnp.asarray(e, jnp.bfloat16)   # lookup stays dense
    params = dict(params)
    params["decoder"] = dec
    return params


# ------------------------------------------------------------------ kernel
def _qmm_kernel(x_ref, wq_ref, s_ref, o_ref):
    """o[blk_b, blk_n] = x[blk_b, K] @ dequant(wq[K, blk_n]);
    dequant happens in VMEM."""
    x = x_ref[...]
    w = wq_ref[...].astype(x.dtype)               # int8 -> bf16 in VMEM
    acc = jax.lax.dot_general(
        x, w, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[...] = acc * s_ref[0][None, :].astype(jnp.float32)


@functools.partial(
    jax.jit, static_argnames=("blk_n", "blk_b", "interpret"))
def quant_matmul(
    x: jnp.ndarray,        # [B, K] (bf16/f32)
    wq: jnp.ndarray,       # [K, N] int8
    scale: jnp.ndarray,    # [N] f32
    blk_n: int = 512,
    blk_b: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:          # [B, N] f32
    b, k = x.shape
    k2, n = wq.shape
    assert k == k2
    if n % blk_n:
        pad = blk_n - n % blk_n
        wq = jnp.pad(wq, ((0, 0), (0, pad)))
        scale = jnp.pad(scale, (0, pad))
        n_pad = n + pad
    else:
        n_pad = n
    # tile the activation rows too: x can be a whole encoder output
    # (B*T rows for the quantized cross-K/V projections)
    blk_b = min(blk_b, (b + 7) // 8 * 8)
    b_pad = (b + blk_b - 1) // blk_b * blk_b
    if b_pad != b:
        x = jnp.pad(x, ((0, b_pad - b), (0, 0)))
    out = pl.pallas_call(
        _qmm_kernel,
        grid=(b_pad // blk_b, n_pad // blk_n),
        in_specs=[
            pl.BlockSpec((blk_b, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, blk_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((blk_b, blk_n), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, n_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * k * n_pad,
            bytes_accessed=k * n_pad + b * k * 2 + b * n_pad * 4,
            transcendentals=0),
        interpret=interpret,
    )(x, wq, scale[None, :])
    return out[:b, :n]


def quant_dense_apply(p: dict, x: jnp.ndarray,
                      interpret: bool | None = None,
                      out_dtype=None) -> jnp.ndarray:
    """Dense layer with int8 weights: Pallas on TPU, XLA dequant elsewhere.

    x may be [..., K]; output [..., N] in x.dtype.
    """
    lead = x.shape[:-1]
    k = x.shape[-1]
    x2 = x.reshape(-1, k)
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    if interpret and x2.shape[0] * p["wq"].shape[1] > (1 << 22):
        # big CPU case: plain XLA dequant matmul beats interpreter
        y = jnp.dot(x2.astype(jnp.float32),
                    p["wq"].astype(jnp.float32) * p["scale"][None, :])
    else:
        y = quant_matmul(x2, p["wq"], p["scale"], interpret=interpret)
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)
    return y.reshape(*lead, -1).astype(out_dtype or x.dtype)
