"""Multi-host (DCN) scaffolding on the 8-virtual-device CPU mesh.

Exercises parallel/distributed.py: hybrid (dcn, data, model) mesh
construction, hierarchical two-stage sharded search equal to the flat
single-device fused_topk, and batch placement across both data axes.
Real DCN links don't exist in CI — the axis SEMANTICS (what crosses the
slow axis, and how little) are what these tests pin down.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_audio_search_tpu.index.fusion import fused_topk
from multimodal_audio_search_tpu.parallel.distributed import (
    dcn_data_sharded, hierarchical_sharded_topk, initialize, make_dcn_mesh,
    shard_index_dcn)

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                             reason="needs 8 virtual devices")


def test_initialize_is_noop_without_env(monkeypatch):
    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                "JAX_PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)
    assert initialize() is False


@needs_8
def test_make_dcn_mesh_shapes():
    m = make_dcn_mesh(dcn=2, model_parallel=2)
    assert dict(m.shape) == {"dcn": 2, "data": 2, "model": 2}
    m = make_dcn_mesh(dcn=4)
    assert dict(m.shape) == {"dcn": 4, "data": 2, "model": 1}
    with pytest.raises(ValueError):
        make_dcn_mesh(dcn=3)


@needs_8
@pytest.mark.parametrize("dcn,mp", [(2, 1), (2, 2), (4, 1)])
def test_hierarchical_search_matches_flat(rng, dcn, mp):
    mesh = make_dcn_mesh(dcn=dcn, model_parallel=mp)
    n, d, k = 16 * 8, 32, 10
    emb = rng.normal(size=(n, 2, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    ok = rng.random((n, 2)) > 0.3
    q = emb[37, 1]
    ref = fused_topk(jnp.asarray(q), jnp.asarray(emb), jnp.asarray(ok),
                     jnp.float32(0.7), jnp.float32(0.3), k=k)
    emb_s, ok_s = shard_index_dcn(mesh, emb, ok)
    search = hierarchical_sharded_topk(mesh, k=k)
    s, i = search(jnp.asarray(q), emb_s, ok_s,
                  jnp.float32(0.7), jnp.float32(0.3))
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ref["indices"]))
    np.testing.assert_allclose(np.asarray(s), np.asarray(ref["scores"]),
                               rtol=1e-5, atol=1e-6)


@needs_8
def test_hierarchical_ivf_matches_flat(rng):
    """IVF under the hybrid (dcn, data, model) mesh: per-shard buckets,
    two-stage candidate merge; full probe == the flat exact fused_topk
    (scores, global indices)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    import jax
    from multimodal_audio_search_tpu.index.ivf import build_ivf_sharded
    from multimodal_audio_search_tpu.parallel.distributed import (
        hierarchical_sharded_ivf)

    mesh = make_dcn_mesh(dcn=2, model_parallel=2)   # (2, 2, 2)
    n_shards = mesh.shape["dcn"] * mesh.shape["data"]
    n, d, k = 16 * 8, 32, 10
    emb = rng.normal(size=(n, 2, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    ok = rng.random((n, 2)) > 0.3
    emb[~ok] = 0.0
    q = emb[37, 1]
    ref = fused_topk(jnp.asarray(q), jnp.asarray(emb), jnp.asarray(ok),
                     jnp.float32(0.7), jnp.float32(0.3), k=k)
    layout = build_ivf_sharded(emb, ok, n_shards, n_clusters=4)
    sh = NamedSharding(mesh, P(("dcn", "data")))
    args = [jax.device_put(a, sh) for a in
            (layout.centroids, layout.members, layout.spill,
             jnp.asarray(emb), jnp.asarray(ok))]
    search = hierarchical_sharded_ivf(mesh, layout, k=k,
                                      n_probe=layout.n_clusters)
    s, i = search(jnp.asarray(q), *args,
                  jnp.float32(0.7), jnp.float32(0.3))
    rs = np.asarray(ref["scores"])
    keep = rs > -1e29
    np.testing.assert_array_equal(np.asarray(i)[keep],
                                  np.asarray(ref["indices"])[keep])
    np.testing.assert_allclose(np.asarray(s)[keep], rs[keep],
                               rtol=1e-5, atol=1e-6)


@needs_8
def test_train_step_over_dcn_mesh(rng):
    from multimodal_audio_search_tpu.models import whisper as W
    from multimodal_audio_search_tpu.parallel.mesh import shard_params
    from multimodal_audio_search_tpu.training.finetune import (
        TrainConfig, make_train_step)
    cfg = W.WhisperConfig(
        vocab_size=64, d_model=16, enc_layers=1, dec_layers=1, heads=2,
        ffn=32, enc_positions=20, dec_positions=12,
        bos_token_id=60, eos_token_id=61, pad_token_id=61)
    mesh = make_dcn_mesh(dcn=2, model_parallel=2)
    params = shard_params(W.init_params(jax.random.PRNGKey(0), cfg), mesh)
    train_step, opt = make_train_step(cfg, TrainConfig(), donate=False)
    opt_state = jax.device_put(opt.init(params))
    b = 8
    batch = {
        "mel": jax.device_put(
            rng.normal(size=(b, 80, 40)).astype(np.float32),
            dcn_data_sharded(mesh)),
        "tokens": jax.device_put(
            np.tile(np.arange(8, dtype=np.int32), (b, 1)),
            dcn_data_sharded(mesh)),
        "loss_mask": jax.device_put(np.ones((b, 7), np.float32),
                                    dcn_data_sharded(mesh)),
    }
    with mesh:
        params2, _, metrics = train_step(params, opt_state, batch)
    assert np.isfinite(float(metrics["loss"]))
    # params actually updated
    leaf0 = jax.tree_util.tree_leaves(params)[0]
    leaf1 = jax.tree_util.tree_leaves(params2)[0]
    assert not np.allclose(np.asarray(leaf0), np.asarray(leaf1))
