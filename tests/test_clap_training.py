"""CLAP contrastive training recipe (training/clap.py).

A fixed tiny dataset repeated for epochs must be memorized: symmetric
InfoNCE loss decreases and in-batch audio->text retrieval accuracy goes
to ~1.0, with the learnable temperature moving off its init. Runs dp+tp
over the virtual 8-device mesh like the captioner recipe.
"""
import numpy as np

import jax
import jax.numpy as jnp

from multimodal_audio_search_tpu.models import clap as C
from multimodal_audio_search_tpu.models.minilm import MiniLMConfig
from multimodal_audio_search_tpu.training.clap import (
    ClapTrainConfig, init_clap_params, make_clap_train_step, train_clap)


def tiny_cfgs():
    acfg = C.ClapConfig(embed_dim=32, d_model=16, layers=1, heads=2,
                        ffn=32, n_mels=8, patch_frames=4, max_patches=16)
    tcfg = MiniLMConfig(vocab_size=64, hidden=16, layers=1, heads=2,
                        intermediate=32)
    return acfg, tcfg


def fixed_batches(seed, n_epochs, b=8):
    rng = np.random.default_rng(seed)   # same seed -> same fixed dataset
    mel = rng.normal(size=(b, 8, 32)).astype(np.float32)
    ids = rng.integers(4, 64, size=(b, 6)).astype(np.int32)
    mask = np.ones((b, 6), np.int32)
    for _ in range(n_epochs):
        yield {"mel": mel, "input_ids": ids, "attention_mask": mask}


def test_clap_training_memorizes_pairs(tmp_path):
    acfg, tcfg = tiny_cfgs()
    params, steps, losses = train_clap(
        fixed_batches(0, 120), acfg, tcfg,
        ClapTrainConfig(learning_rate=3e-3),
        n_devices=4, model_parallel=2,
        checkpoint_dir=str(tmp_path), checkpoint_every=40,
        log_fn=lambda s: None)
    assert steps == 120
    assert losses[-1] < losses[0] * 0.5

    # retrieval sanity on the trained towers
    batch = next(fixed_batches(0, 1))
    az = C.audio_embed(params["audio"], jnp.asarray(batch["mel"]), acfg)
    tz = C.text_embed(params["text_backbone"], params["text_proj"],
                      jnp.asarray(batch["input_ids"]),
                      jnp.asarray(batch["attention_mask"]), tcfg, acfg)
    hits = np.argmax(np.asarray(az @ tz.T), axis=-1)
    assert (hits == np.arange(len(hits))).mean() >= 0.75

    # temperature learned away from init
    assert abs(float(params["log_temp"]) - float(np.log(1 / 0.07))) > 1e-3

    # resume continues the counter (checkpoint plumbing shared with the
    # captioner recipe)
    params2, steps2, _ = train_clap(
        fixed_batches(0, 5), acfg, tcfg,
        ClapTrainConfig(learning_rate=3e-3),
        n_devices=4, model_parallel=2,
        checkpoint_dir=str(tmp_path), log_fn=lambda s: None)
    assert steps2 == 125


def test_clap_train_step_metrics():
    acfg, tcfg = tiny_cfgs()
    params = init_clap_params(jax.random.PRNGKey(0), acfg, tcfg)
    step, opt = make_clap_train_step(acfg, tcfg, donate=False)
    opt_state = opt.init(params)
    batch = {k: jnp.asarray(v) for k, v in next(fixed_batches(1, 1)).items()}
    _, _, m = step(params, opt_state, batch)
    assert set(m) >= {"loss", "in_batch_acc", "temperature", "grad_norm"}
    assert np.isfinite(float(m["loss"]))
    assert 0.0 <= float(m["in_batch_acc"]) <= 1.0
