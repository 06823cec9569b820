"""Shared functional transformer building blocks.

Plain-pytree, fully functional (no flax Module state): params are nested
dicts of jnp arrays, every op is shape-static and jit/pjit/scan-friendly.
Dense weights are stored [in, out] (column-major for y = x @ W + b);
models/convert.py transposes from torch's [out, in] on import.

Matmuls run in the model dtype (bf16 on TPU) with float32 accumulation via
``preferred_element_type``; layernorm/softmax run in float32 for stability.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def dense(params, x: jnp.ndarray) -> jnp.ndarray:
    if "wq" in params:   # int8-quantized weights (ops/quant.py)
        from ..ops.quant import quant_dense_apply
        return quant_dense_apply(params, x)
    y = jnp.dot(x, params["w"], preferred_element_type=jnp.float32)
    if "b" in params:
        y = y + params["b"].astype(jnp.float32)
    return y.astype(x.dtype)


def layer_norm(params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = y * params["scale"].astype(jnp.float32) \
        + params["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Exact (erf) GELU — what BERT and Whisper both use."""
    xf = x.astype(jnp.float32)
    return (0.5 * xf * (1.0 + jax.lax.erf(xf / math.sqrt(2.0)))) \
        .astype(x.dtype)


def split_heads(x: jnp.ndarray, n_heads: int) -> jnp.ndarray:
    """[B, T, H] -> [B, heads, T, H/heads]"""
    b, t, h = x.shape
    return x.reshape(b, t, n_heads, h // n_heads).transpose(0, 2, 1, 3)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """[B, heads, T, D] -> [B, T, heads*D]"""
    b, n, t, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, n * d)


def attention_scores(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    bias: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Softmax attention with f32 logits. q,k,v: [B, heads, T, D]."""
    scale = 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k,
        preferred_element_type=jnp.float32) * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32)
    return out.astype(v.dtype)


def mha(
    params, x_q: jnp.ndarray, x_kv: jnp.ndarray, n_heads: int,
    bias: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Projected multi-head attention (self or cross)."""
    q = split_heads(dense(params["q"], x_q), n_heads)
    k = split_heads(dense(params["k"], x_kv), n_heads)
    v = split_heads(dense(params["v"], x_kv), n_heads)
    out = merge_heads(attention_scores(q, k, v, bias))
    return dense(params["o"], out)


def padding_bias(mask: jnp.ndarray) -> jnp.ndarray:
    """[B, T] {0,1} key mask -> additive [B, 1, 1, T] bias."""
    return (1.0 - mask.astype(jnp.float32))[:, None, None, :] * -1e9


def causal_bias(t_q: int, t_k: int, offset: int = 0) -> jnp.ndarray:
    """Additive [1, 1, t_q, t_k] causal mask; query i attends keys
    <= i + offset (offset = number of cached positions)."""
    qi = jnp.arange(t_q)[:, None] + offset
    ki = jnp.arange(t_k)[None, :]
    return jnp.where(ki <= qi, 0.0, -1e9)[None, None, :, :]


# ------------------------------------------------------------------ init
def init_dense(key, d_in: int, d_out: int, bias: bool = True, std=0.02):
    kw, _ = jax.random.split(key)
    p = {"w": jax.random.normal(kw, (d_in, d_out), jnp.float32) * std}
    if bias:
        p["b"] = jnp.zeros((d_out,), jnp.float32)
    return p


def init_layer_norm(d: int):
    return {"scale": jnp.ones((d,), jnp.float32),
            "bias": jnp.zeros((d,), jnp.float32)}


def init_mha(key, d_model: int, bias: bool = True, k_bias: bool = True):
    ks = jax.random.split(key, 4)
    return {
        "q": init_dense(ks[0], d_model, d_model, bias),
        "k": init_dense(ks[1], d_model, d_model, k_bias),
        "v": init_dense(ks[2], d_model, d_model, bias),
        "o": init_dense(ks[3], d_model, d_model, bias),
    }


def cast_floats(tree, dtype):
    """Cast floating leaves of a pytree to ``dtype``.

    Quantization scales (leaves keyed 'scale' next to int8 'wq' weights)
    stay float32 — they carry the dynamic range of an entire channel.
    """
    def f(path, x):
        keys = [getattr(k, "key", None) for k in path]
        if keys and keys[-1] == "scale":
            return x
        if isinstance(x, (jnp.ndarray, np.ndarray)) and \
                jnp.issubdtype(x.dtype, jnp.floating):
            return jnp.asarray(x, dtype)
        return x
    return jax.tree_util.tree_map_with_path(f, tree)
