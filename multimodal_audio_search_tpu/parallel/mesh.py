"""Device mesh construction and sharding rules.

The reference is strictly single-process/single-device (SURVEY.md §2c). The
TPU-native scale-out story:

  * ``data`` axis — shards ingest batches and the index N axis (DP); the
    collectives (all-gather of per-shard top-k candidates, psum of grads)
    ride ICI inside a slice,
  * ``model`` axis — Megatron-style tensor parallelism over attention heads
    and FFN width for the Whisper/MiniLM matmuls (TP).

Pipeline/sequence/expert parallelism are deliberately absent: the models are
4-6 layer, fixed-1500-token encoders (SURVEY.md §2c) — TP+DP covers them.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: int | None = None, model_parallel: int = 1
) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if n > len(devs):
        raise ValueError(f"asked for {n} devices, have {len(devs)}")
    if n % model_parallel:
        raise ValueError("n_devices must divide by model_parallel")
    grid = np.asarray(devs[:n]).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, ("data", "model"))


def validate_data_axis(mesh: Mesh) -> None:
    """Reject meshes whose 'data' axis is not a power of two, with the
    same clear error ``mesh_from_config`` raises. Pipelines' batch
    buckets double from a floor of max(8, dp), so a dp like 6 would pass
    ``make_mesh`` and then fail deep inside the first sharded
    device_put with an opaque divisibility error (ADVICE r3)."""
    dp = mesh.shape.get("data", 1)
    if dp & (dp - 1):
        raise ValueError(
            f"mesh 'data' axis = {dp} is not a power of two; sharded "
            "batch and index buckets are powers of two, so dp must be "
            "one of 1, 2, 4, 8, ...")


def mesh_from_config(cfg) -> Mesh | None:
    """Engine knob -> mesh: ``EngineConfig.data_parallel/model_parallel``
    select the production mesh; 1 x 1 returns None (single-device, the
    reference's execution model, audio_search.py:89).

    ``data_parallel`` must be a power of two: every sharded batch is
    padded to a power-of-two bucket (pipelines floor ``max(8, dp)`` and
    double; the index capacity bucket is a power of two >= 1024,
    index/store.py), so a non-power-of-two dp would pass mesh
    construction here and then fail deep inside the first sharded
    device_put / shard_map with an opaque divisibility error."""
    dp = getattr(cfg, "data_parallel", 1) or 1
    mp = getattr(cfg, "model_parallel", 1) or 1
    if dp & (dp - 1):
        raise ValueError(
            f"data_parallel={dp} is not a power of two; sharded batch "
            "and index buckets are powers of two, so dp must be one of "
            "1, 2, 4, 8, ...")
    if dp * mp <= 1:
        return None
    return make_mesh(dp * mp, model_parallel=mp)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, axis: int = 0) -> NamedSharding:
    spec = [None] * (axis + 1)
    spec[axis] = "data"
    return NamedSharding(mesh, P(*spec))


# ----------------------------------------------------- TP param shardings
def whisper_param_spec(path: tuple, leaf) -> P:
    """Megatron TP rule for whisper/minilm param pytrees.

    Column-parallel (shard output dim): attention q/k/v, mlp_in.
    Row-parallel (shard input dim): attention o, mlp_out.
    Everything else replicated. Paths are pytree key-paths of our param
    dicts (models/whisper.py, models/minilm.py).
    """
    keys = [getattr(k, "key", getattr(k, "idx", None)) for k in path]
    if "w" in keys:
        if any(k in keys for k in ("q", "k", "v", "mlp_in")):
            return P(None, "model")
        if any(k in keys for k in ("o", "mlp_out")):
            return P("model", None)
    return P()


def shard_params(params, mesh: Mesh):
    """Apply the TP rule; dims that don't divide fall back to replication."""
    def place(path, leaf):
        spec = whisper_param_spec(path, leaf)
        if spec != P():
            axis = 0 if spec[0] == "model" else 1
            if leaf.ndim < 2 or \
                    leaf.shape[axis] % mesh.shape["model"] != 0:
                spec = P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map_with_path(place, params)
