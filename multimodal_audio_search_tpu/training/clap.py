"""CLAP contrastive training recipe: (audio, caption) pairs -> dual towers.

The reference's historical v1 used downloaded laion CLAP checkpoints
(streamlit_app_backup.py:22-35) and never trained anything; this recipe
makes the capability self-sufficient — given (mel, tokenized caption)
pairs it trains our audio tower + text projection (and optionally the
MiniLM backbone) with the symmetric InfoNCE objective (models/clap.py),
a learnable temperature (as in CLIP/CLAP), dp+tp sharding over the mesh,
background prefetch, and step checkpoints with resume — the same
production shape as training/loop.py's captioner recipe.
"""
from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import clap as C
from ..models.minilm import MiniLMConfig, PRESETS as MLM_PRESETS
from ..models.minilm import init_params as init_minilm
from ..parallel.mesh import data_sharded, make_mesh, shard_params
from ..utils.checkpoint import TrainCheckpointer
from ..utils.loader import PrefetchLoader


@dataclass(frozen=True)
class ClapTrainConfig:
    learning_rate: float = 1e-4
    weight_decay: float = 0.01
    grad_clip: float = 1.0
    init_temperature: float = 0.07     # CLIP init; learned thereafter
    min_temperature: float = 0.01      # clamp (CLIP caps logit scale)
    train_text_backbone: bool = True


def init_clap_params(key, acfg: C.ClapConfig,
                     tcfg: MiniLMConfig) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "audio": C.init_audio_tower(k1, acfg),
        "text_backbone": init_minilm(k2, tcfg),
        "text_proj": C.init_text_projection(k3, tcfg, acfg),
        "log_temp": jnp.log(jnp.float32(1.0 / 0.07)),
    }


def make_clap_train_step(acfg: C.ClapConfig, tcfg: MiniLMConfig,
                         train_cfg: ClapTrainConfig | None = None,
                         donate: bool = True):
    """(train_step, optimizer). Batch: {"mel" [B, n_mels, T],
    "input_ids" [B, L], "attention_mask" [B, L]} -> metrics with loss and
    in-batch retrieval accuracy (audio->text top-1)."""
    tc = train_cfg or ClapTrainConfig()
    opt = optax.chain(
        optax.clip_by_global_norm(tc.grad_clip),
        optax.adamw(tc.learning_rate, weight_decay=tc.weight_decay,
                    mask=lambda p: jax.tree_util.tree_map(
                        lambda x: x.ndim > 1, p)),
    )

    def loss_fn(params, batch):
        az = C.audio_embed(params["audio"], batch["mel"], acfg)
        tb = params["text_backbone"] if tc.train_text_backbone \
            else jax.lax.stop_gradient(params["text_backbone"])
        tz = C.text_embed(tb, params["text_proj"], batch["input_ids"],
                          batch["attention_mask"], tcfg, acfg)
        scale = jnp.exp(params["log_temp"])
        scale = jnp.minimum(scale, 1.0 / tc.min_temperature)
        logits = az @ tz.T * scale
        labels = jnp.arange(logits.shape[0])
        la = C.optax_softmax_ce(logits, labels)
        lt = C.optax_softmax_ce(logits.T, labels)
        loss = 0.5 * (la + lt)
        acc = jnp.mean(
            (jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32))
        return loss, {"loss": loss, "in_batch_acc": acc,
                      "temperature": 1.0 / scale}

    def train_step(params, opt_state, batch):
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch)
        metrics["grad_norm"] = optax.global_norm(grads)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    donate_argnums = (0, 1) if donate else ()
    return jax.jit(train_step, donate_argnums=donate_argnums), opt


def train_clap(
    batches: Iterable[dict],          # numpy {mel, input_ids, attention_mask}
    acfg: C.ClapConfig | None = None,
    tcfg: MiniLMConfig | None = None,
    train_cfg: ClapTrainConfig | None = None,
    init_params=None,
    n_devices: int | None = None,
    model_parallel: int = 1,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 100,
    resume: bool = True,
    log_fn: Callable[[str], None] = print,
    prefetch: int = 2,
):
    """Full production loop (mesh + shardings + prefetch + checkpoints);
    the TP rules in parallel/mesh.py apply unchanged — the audio tower's
    attention/MLP parameter names match the whisper/minilm convention."""
    acfg = acfg or C.ClapConfig()
    tcfg = tcfg or MLM_PRESETS["L6"]
    mesh = make_mesh(n_devices, model_parallel)
    params = init_params if init_params is not None else \
        init_clap_params(jax.random.PRNGKey(0), acfg, tcfg)
    params = shard_params(params, mesh)
    train_step, opt = make_clap_train_step(acfg, tcfg, train_cfg,
                                           donate=False)
    opt_state = jax.device_put(opt.init(params))

    ck = TrainCheckpointer(checkpoint_dir) if checkpoint_dir else None
    start_step = 0
    if ck is not None and resume and ck.latest_step() is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        repl = NamedSharding(mesh, P())
        opt_shardings = jax.tree_util.tree_map(
            lambda x: x.sharding if isinstance(x.sharding, NamedSharding)
            else repl, opt_state)
        params, restored_opt, meta = ck.restore(params, opt_state)
        params = shard_params(params, mesh)
        if restored_opt is not None:
            opt_state = jax.tree_util.tree_map(
                jax.device_put, restored_opt, opt_shardings)
        start_step = meta["step"]
        log_fn(f"resumed from step {start_step}")

    sharding = data_sharded(mesh)
    step, losses = start_step, []
    t0 = time.perf_counter()
    with mesh:
        for batch in PrefetchLoader(batches, depth=prefetch):
            dev = {k: jax.device_put(np.asarray(v), sharding)
                   for k, v in batch.items()}
            params, opt_state, m = train_step(params, opt_state, dev)
            step += 1
            losses.append(float(m["loss"]))
            if step % 10 == 0:
                rate = (step - start_step) / (time.perf_counter() - t0)
                log_fn(f"step {step}: loss={losses[-1]:.4f} "
                       f"acc={float(m['in_batch_acc']):.2f} "
                       f"T={float(m['temperature']):.3f} "
                       f"({rate:.2f} steps/s)")
            if ck is not None and step % checkpoint_every == 0:
                ck.save(step, params, opt_state, {"loss": losses[-1]})
    if ck is not None:
        ck.save(step, params, opt_state,
                {"loss": losses[-1] if losses else None})
    return params, step, losses
