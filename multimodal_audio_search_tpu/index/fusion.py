"""Batched weighted-fusion scoring (the search hot path).

The reference scores one segment at a time in Python with two sklearn
cosine-similarity calls per segment (audio_search.py:639-682). Here the whole
index is scored in one XLA program:

    sims[N, 2]  = emb[N, 2, D] @ q[D]          (embeddings pre-L2-normalized)
    eff[N, 2]   = weights * success, renormalized per row
    score[N]    = sum(eff * sims, -1)
    valid[N]    = any(sims > 0) & (total_weight > 0) & (score > threshold)
    top-k over score masked by valid

Decision-parity notes (audio_search.py):
  - a segment is scored only if at least one cosine sim is > 0     (:654)
  - a missing pipeline's weight is zeroed then weights renormalize (:656-664)
  - relevance threshold is a strict ``>``                          (:672)
  - sort desc, top 10                                              (:685,699)

Cosine == dot because embeddings are stored L2-normalized (the reference's
MiniLM pipeline also emits unit vectors, so its sklearn cosine matches).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12):
    """L2-normalize along ``axis`` (zero vectors stay zero)."""
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(n, eps)


def fused_scores(
    query_emb: jnp.ndarray,   # [D] unit-norm query embedding
    emb: jnp.ndarray,         # [N, 2, D] unit-norm (zeros where missing)
    success: jnp.ndarray,     # [N, 2] bool: pipeline produced text
    asr_weight: jnp.ndarray,  # scalar
    audio_weight: jnp.ndarray,  # scalar
    threshold: float = 0.1,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Return (score[N] with invalid rows at NEG_INF, valid[N] bool)."""
    q = query_emb.astype(jnp.float32)
    sims = jnp.einsum(
        "npd,d->np", emb.astype(jnp.float32), q,
        preferred_element_type=jnp.float32)                    # [N, 2]
    w = jnp.stack([asr_weight, audio_weight]).astype(jnp.float32)  # [2]
    eff = w[None, :] * success.astype(jnp.float32)             # [N, 2]
    total = jnp.sum(eff, axis=-1)                              # [N]
    eff = eff / jnp.maximum(total, 1e-30)[:, None]
    score = jnp.sum(eff * sims, axis=-1)                       # [N]
    any_pos = jnp.any(sims > 0.0, axis=-1)
    valid = any_pos & (total > 0.0) & (score > threshold)
    return jnp.where(valid, score, NEG_INF), valid


def fused_topk_impl(
    query_emb: jnp.ndarray,
    emb: jnp.ndarray,
    success: jnp.ndarray,
    asr_weight: jnp.ndarray,
    audio_weight: jnp.ndarray,
    *,
    k: int = 10,
    threshold: float = 0.1,
) -> dict[str, jnp.ndarray]:
    """One-shot fused search over the whole index (trace-time body).

    Returns top-k indices/scores plus per-hit sims and effective weights
    (the reference surfaces all of these per result, audio_search.py:673-682).
    Invalid rows carry score NEG_INF; callers drop them host-side.
    """
    masked, valid = fused_scores(
        query_emb, emb, success, asr_weight, audio_weight, threshold)
    k = min(k, masked.shape[0])
    top_scores, top_idx = jax.lax.top_k(masked, k)
    sims = jnp.einsum(
        "kpd,d->kp", emb[top_idx].astype(jnp.float32),
        query_emb.astype(jnp.float32), preferred_element_type=jnp.float32)
    w = jnp.stack([asr_weight, audio_weight]).astype(jnp.float32)
    eff = w[None, :] * success[top_idx].astype(jnp.float32)
    eff = eff / jnp.maximum(jnp.sum(eff, axis=-1, keepdims=True), 1e-30)
    return {
        "indices": top_idx,
        "scores": top_scores,
        "valid": valid[top_idx],
        "sims": sims,                # [k, 2] (asr, audio)
        "effective_weights": eff,    # [k, 2]
        "num_valid": jnp.sum(valid.astype(jnp.int32)),
    }


fused_topk = jax.jit(fused_topk_impl, static_argnames=("k", "threshold"))
