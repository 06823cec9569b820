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


def shard_index(mesh: Mesh, emb, success):
    """Place index arrays sharded on N over the 'data' axis (replicated
    over 'model')."""
    s = NamedSharding(mesh, P("data"))
    return jax.device_put(emb, s), jax.device_put(success, s)
