"""Multi-host (DCN) scale-out: process init + hybrid mesh + hierarchical
sharded search.

The reference is strictly single-process (SURVEY §2c); this layer is the
framework's growth path past one host:

  * ``initialize()`` wraps ``jax.distributed.initialize`` (coordinator
    address / process count / process id from args or the standard env
    vars) and is a no-op for single-process runs, so the same entry point
    serves a laptop, one TPU host, and a multi-host slice deployment.
  * ``make_dcn_mesh(dcn, ici_data, model)`` builds a 3-axis
    ("dcn", "data", "model") mesh. On real multi-host hardware the outer
    axis maps across hosts (slow DCN links) via
    ``mesh_utils.create_hybrid_device_mesh``; on a single host (or the
    CPU virtual-device test rig) it reshapes the flat device list, which
    preserves the axis semantics for dry runs.
  * ``hierarchical_sharded_topk`` shards the [N, 2, D] index over BOTH
    data axes and merges candidates in two stages: all-gather of k
    candidates per device over "data" (ICI, cheap) reduces each slice to
    k finalists, and only those k cross "dcn" (expensive) — DCN traffic
    is k*(dcn-1) scores/indices per query regardless of index size.

Training needs no separate path: the jitted train step is
sharding-driven, so batches placed with ``P(("dcn", "data"))`` make XLA
psum gradients hierarchically over both axes (ICI-first reduction is
XLA's own optimization on hybrid meshes).
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..index.fusion import fused_scores


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize JAX's multi-process runtime; returns True if distributed.

    Args fall back to the standard env vars (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID); with neither present this is a
    recorded no-op so single-host code paths never pay for it.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    num_processes = num_processes if num_processes is not None else \
        int(os.environ.get("JAX_NUM_PROCESSES", "0") or 0)
    process_id = process_id if process_id is not None else \
        int(os.environ.get("JAX_PROCESS_ID", "-1"))
    if not coordinator_address or num_processes <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)
    return True


def make_dcn_mesh(
    dcn: int | None = None,
    ici_data: int | None = None,
    model_parallel: int = 1,
    devices=None,
) -> Mesh:
    """3-axis ("dcn", "data", "model") mesh.

    dcn defaults to the process count (1 per host), ici_data to whatever
    fills the remaining local devices. Real multi-host runs get a hybrid
    mesh whose outer axis crosses hosts; single-host / virtual-device
    runs get a reshape with identical axis semantics.
    """
    devs = devices if devices is not None else jax.devices()
    dcn = dcn or max(jax.process_count(), 1)
    n = len(devs)
    if n % dcn:
        raise ValueError(f"{n} devices do not divide into dcn={dcn}")
    per = n // dcn
    if per % model_parallel:
        raise ValueError("per-dcn devices must divide by model_parallel")
    ici_data = ici_data or per // model_parallel
    if ici_data * model_parallel != per:
        raise ValueError(
            f"dcn({dcn}) x data({ici_data}) x model({model_parallel}) "
            f"!= {n} devices")
    n_slices = len({getattr(d, "slice_index", 0) for d in devs})
    if jax.process_count() > 1 and devices is None and n_slices == dcn:
        from jax.experimental import mesh_utils
        grid = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(1, ici_data, model_parallel),
            dcn_mesh_shape=(dcn, 1, 1))
    elif jax.process_count() > 1 and devices is None:
        # multi-process without distinct slice indices (multi-process CPU,
        # single-slice multi-host): create_hybrid_device_mesh groups by
        # slice_index and rejects this layout (found by
        # tools/multiprocess_dcn_check.py) — group the outer axis by
        # process instead, so "dcn" still crosses process boundaries
        order = sorted(devs, key=lambda d: (d.process_index, d.id))
        grid = np.asarray(order[:n]).reshape(dcn, ici_data, model_parallel)
    else:
        grid = np.asarray(devs[:n]).reshape(dcn, ici_data, model_parallel)
    return Mesh(grid, ("dcn", "data", "model"))


def dcn_data_sharded(mesh: Mesh, axis: int = 0) -> NamedSharding:
    """Batch/index sharding across both data-parallel axes."""
    spec = [None] * (axis + 1)
    spec[axis] = ("dcn", "data")
    return NamedSharding(mesh, P(*spec))


def shard_index_dcn(mesh: Mesh, emb, success):
    s = dcn_data_sharded(mesh)
    return jax.device_put(emb, s), jax.device_put(success, s)


def hierarchical_sharded_topk(
    mesh: Mesh,
    k: int = 10,
    threshold: float = 0.1,
):
    """Two-stage sharded fused search over a ("dcn","data","model") mesh.

    fn(query[D], emb[N,2,D], success[N,2], w_asr, w_audio) ->
    (scores[k], global_indices[k]); emb/success sharded over
    ("dcn","data") on axis 0 (shard_index_dcn). Stage 1 merges each ICI
    slice's candidates; stage 2 moves only k finalists per slice over
    DCN. Same merge math as parallel/sharding.py, verified == the
    single-device fused_topk in tests.
    """
    def local_search(query, emb, success, w_asr, w_audio):
        masked, _ = fused_scores(
            query, emb, success, w_asr, w_audio, threshold)
        kk = min(k, masked.shape[0])
        top_s, top_i = jax.lax.top_k(masked, kk)
        d_idx = jax.lax.axis_index("data")
        c_idx = jax.lax.axis_index("dcn")
        data_ax = jax.lax.axis_size("data")
        shard = c_idx * data_ax + d_idx
        top_i = top_i + shard * masked.shape[0]          # globalize
        # stage 1: merge within the ICI slice
        s1 = jax.lax.all_gather(top_s, "data", tiled=True)
        i1 = jax.lax.all_gather(top_i, "data", tiled=True)
        s1, order = jax.lax.top_k(s1, kk)
        i1 = jnp.take(i1, order)
        # stage 2: k finalists per slice cross DCN
        s2 = jax.lax.all_gather(s1, "dcn", tiled=True)
        i2 = jax.lax.all_gather(i1, "dcn", tiled=True)
        s, order = jax.lax.top_k(s2, kk)
        return s, jnp.take(i2, order)

    fn = jax.shard_map(
        local_search, mesh=mesh,
        in_specs=(P(), P(("dcn", "data")), P(("dcn", "data")), P(), P()),
        out_specs=(P(), P()),
        check_vma=False)
    return jax.jit(fn)


def hierarchical_sharded_ivf(
    mesh: Mesh,
    layout,                       # index.ivf.ShardedIVF over dcn*data shards
    k: int = 10,
    n_probe: int = 8,
    threshold: float = 0.1,
):
    """IVF candidate generation under the hybrid mesh: each of the
    dcn*data shards probes its OWN buckets and rescores exactly
    (index/ivf.py math), then candidates merge in the same two stages as
    hierarchical_sharded_topk — k per device over 'data' (ICI), k
    finalists per slice over 'dcn'. fn(query, cent, members, spill, emb,
    success, w_asr, w_audio) -> (scores[k], global_indices[k]); all
    index-shaped args sharded P(("dcn","data")) on axis 0 (shard order
    == build_ivf_sharded block order)."""
    n_probe_ = min(n_probe, layout.n_clusters)

    def local_search(query, cent, members, spill, emb, success,
                     w_asr, w_audio):
        # local body shared with every IVF query path (index/ivf.py)
        from ..index.ivf import NEG_INF, local_candidate_scores
        q = query.astype(jnp.float32)
        score_s, rows_s = local_candidate_scores(
            q, cent[0], members[0], spill[0], emb, success,
            w_asr, w_audio, n_probe=n_probe_, threshold=threshold)
        kk = min(k, score_s.shape[0])
        top_s, top_i = jax.lax.top_k(score_s, kk)
        hit = top_s > NEG_INF / 2
        li = jnp.where(hit, rows_s[top_i], 0)
        d_idx = jax.lax.axis_index("data")
        c_idx = jax.lax.axis_index("dcn")
        data_ax = jax.lax.axis_size("data")
        shard = c_idx * data_ax + d_idx
        gi = jnp.where(hit, li + shard * emb.shape[0], -1)
        # stage 1: merge within the ICI slice
        s1 = jax.lax.all_gather(top_s, "data", tiled=True)
        i1 = jax.lax.all_gather(gi, "data", tiled=True)
        s1, o1 = jax.lax.top_k(s1, kk)
        i1 = jnp.take(i1, o1)
        # stage 2: k finalists per slice cross DCN
        s2 = jax.lax.all_gather(s1, "dcn", tiled=True)
        i2 = jax.lax.all_gather(i1, "dcn", tiled=True)
        s, o2 = jax.lax.top_k(s2, kk)
        return s, jnp.take(i2, o2)

    fn = jax.shard_map(
        local_search, mesh=mesh,
        in_specs=(P(), P(("dcn", "data")), P(("dcn", "data")),
                  P(("dcn", "data")), P(("dcn", "data")),
                  P(("dcn", "data")), P(), P()),
        out_specs=(P(), P()),
        check_vma=False)
    return jax.jit(fn)
