"""Multi-device tests on the 8-virtual-CPU-device mesh (conftest)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_audio_search_tpu.index.fusion import fused_topk
from multimodal_audio_search_tpu.models import whisper as W
from multimodal_audio_search_tpu.parallel.mesh import (
    data_sharded, make_mesh, shard_params)
from multimodal_audio_search_tpu.parallel.sharding import (
    shard_index, sharded_fused_topk)
from multimodal_audio_search_tpu.training.finetune import (
    TrainConfig, make_train_step)


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_sharded_search_matches_single_device(rng):
    mesh = make_mesh(8, model_parallel=1)
    n, d, k = 8 * 256, 64, 10
    emb = rng.normal(size=(n, 2, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    ok = rng.random((n, 2)) > 0.3
    q = emb[77, 0]
    ref = fused_topk(jnp.asarray(q), jnp.asarray(emb), jnp.asarray(ok),
                     jnp.float32(0.7), jnp.float32(0.3), k=k)
    emb_s, ok_s = shard_index(mesh, emb, ok)
    search = sharded_fused_topk(mesh, k=k)
    scores, idx = search(jnp.asarray(q), emb_s, ok_s,
                         jnp.float32(0.7), jnp.float32(0.3))
    np.testing.assert_allclose(
        np.asarray(scores), np.asarray(ref["scores"]), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(idx),
                                  np.asarray(ref["indices"]))


@pytest.mark.parametrize("mp", [1, 2])
def test_train_step_runs_and_learns(rng, mp):
    mesh = make_mesh(8, model_parallel=mp)
    cfg = W.WhisperConfig(
        vocab_size=64, d_model=16, enc_layers=1, dec_layers=1, heads=2,
        ffn=32, enc_positions=20, dec_positions=12,
        bos_token_id=60, eos_token_id=61, pad_token_id=61)
    params = W.init_params(jax.random.PRNGKey(0), cfg)
    params = shard_params(params, mesh)
    train_step, opt = make_train_step(
        cfg, TrainConfig(learning_rate=3e-3), donate=False)
    opt_state = opt.init(params)
    b = mesh.shape["data"] * 2
    batch = {
        "mel": jax.device_put(
            rng.normal(size=(b, 80, 40)).astype(np.float32),
            data_sharded(mesh)),
        "tokens": jax.device_put(
            np.tile(np.arange(8, dtype=np.int32), (b, 1)),
            data_sharded(mesh)),
        "loss_mask": jax.device_put(np.ones((b, 7), np.float32),
                                    data_sharded(mesh)),
    }
    with mesh:
        losses = []
        for _ in range(5):
            params, opt_state, m = train_step(params, opt_state, batch)
            losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]  # memorizes a fixed batch


def test_shard_params_tp_placement():
    mesh = make_mesh(8, model_parallel=2)
    cfg = W.WhisperConfig(
        vocab_size=64, d_model=16, enc_layers=1, dec_layers=1, heads=2,
        ffn=32, enc_positions=20, dec_positions=12)
    params = shard_params(W.init_params(jax.random.PRNGKey(0), cfg), mesh)
    blk = params["encoder"]["blocks"][0]
    # column-parallel q: sharded on output dim
    q_sharding = blk["self_attn"]["q"]["w"].sharding
    assert q_sharding.spec == jax.sharding.PartitionSpec(None, "model")
    o_sharding = blk["self_attn"]["o"]["w"].sharding
    assert o_sharding.spec == jax.sharding.PartitionSpec("model", None)
    # layernorm replicated
    ln = blk["self_ln"]["scale"].sharding
    assert ln.spec == jax.sharding.PartitionSpec()
