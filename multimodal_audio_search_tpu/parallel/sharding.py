"""Sharded index search: per-shard top-k + all-gather of candidates.

The scalable form of index/fusion.py for indexes beyond one chip's HBM:
the [N, 2, D] index shards over the ``data`` mesh axis; each device scores
its shard and reduces to k candidates locally, then only k scores/indices
per device cross ICI (all-gather) for the final merge — N never moves.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..index.fusion import fused_scores


def sharded_fused_topk(
    mesh: Mesh,
    k: int = 10,
    threshold: float = 0.1,
):
    """Build a jitted sharded search fn over ``mesh``.

    Returns fn(query[D], emb[N,2,D], success[N,2], w_asr, w_audio) ->
    (scores[k], global_indices[k]). ``emb``/``success`` must be sharded on
    axis 0 over 'data' (use ``shard_index``); N must divide the data axis.
    """
    data_axis = mesh.shape["data"]

    def local_search(query, emb, success, w_asr, w_audio):
        # runs per shard: emb [N/dp, 2, D]
        masked, _ = fused_scores(
            query, emb, success, w_asr, w_audio, threshold)
        kk = min(k, masked.shape[0])
        top_s, top_i = jax.lax.top_k(masked, kk)
        shard = jax.lax.axis_index("data")
        top_i = top_i + shard * masked.shape[0]  # globalize indices
        # gather k candidates from every shard: [dp*k]
        all_s = jax.lax.all_gather(top_s, "data", tiled=True)
        all_i = jax.lax.all_gather(top_i, "data", tiled=True)
        s, order = jax.lax.top_k(all_s, kk)
        return s, jnp.take(all_i, order)

    fn = jax.shard_map(
        local_search, mesh=mesh,
        in_specs=(P(), P("data"), P("data"), P(), P()),
        out_specs=(P(), P()),
        check_vma=False)
    return jax.jit(fn)


def sharded_fused_search_impl(
    mesh: Mesh,
    k: int = 10,
    threshold: float = 0.1,
):
    """Full-payload sharded search (trace-time body, composable under an
    outer jit): like ``sharded_fused_topk`` but returns the same dict as
    index/fusion.py::fused_topk_impl (per-hit sims, effective weights,
    valid flags, num_valid) so index/search.py::FusionSearcher can build
    reference-shaped result rows from a data-sharded index. Only k
    candidates per shard cross ICI — scores, indices, and the [k, 2]
    payloads — never the index itself."""

    def local_search(query, emb, success, w_asr, w_audio):
        # per shard: emb [N/dp, 2, D]
        masked, valid = fused_scores(
            query, emb, success, w_asr, w_audio, threshold)
        n_local = masked.shape[0]
        kk = min(k, n_local)
        top_s, top_i = jax.lax.top_k(masked, kk)
        # candidate payloads from the local shard
        q = query.astype(jnp.float32)
        sims = jnp.einsum(
            "kpd,d->kp", emb[top_i].astype(jnp.float32), q,
            preferred_element_type=jnp.float32)                  # [kk, 2]
        succ = success[top_i].astype(jnp.float32)                # [kk, 2]
        val = valid[top_i]
        shard = jax.lax.axis_index("data")
        gi = top_i + shard * n_local                # globalize indices
        # k candidates per shard cross ICI: [dp*kk(, 2)]
        all_s = jax.lax.all_gather(top_s, "data", tiled=True)
        all_i = jax.lax.all_gather(gi, "data", tiled=True)
        all_sims = jax.lax.all_gather(sims, "data", tiled=True)
        all_succ = jax.lax.all_gather(succ, "data", tiled=True)
        all_val = jax.lax.all_gather(val, "data", tiled=True)
        s, order = jax.lax.top_k(all_s, kk)
        w = jnp.stack([w_asr, w_audio]).astype(jnp.float32)
        eff = w[None, :] * all_succ[order]
        eff = eff / jnp.maximum(
            jnp.sum(eff, axis=-1, keepdims=True), 1e-30)
        return {
            "indices": jnp.take(all_i, order),
            "scores": s,
            "valid": all_val[order],
            "sims": all_sims[order],
            "effective_weights": eff,
            "num_valid": jax.lax.psum(
                jnp.sum(valid.astype(jnp.int32)), "data"),
        }

    return jax.shard_map(
        local_search, mesh=mesh,
        in_specs=(P(), P("data"), P("data"), P(), P()),
        out_specs={"indices": P(), "scores": P(), "valid": P(),
                   "sims": P(), "effective_weights": P(),
                   "num_valid": P()},
        check_vma=False)


def sharded_fused_search(mesh: Mesh, k: int = 10, threshold: float = 0.1):
    return jax.jit(sharded_fused_search_impl(mesh, k, threshold))


def shard_index(mesh: Mesh, emb, success):
    """Place index arrays sharded on N over the 'data' axis (replicated
    over 'model')."""
    s = NamedSharding(mesh, P("data"))
    return jax.device_put(emb, s), jax.device_put(success, s)
