"""Training loop driver: fine-tune a Whisper captioner end to end.

Composes the pieces: mesh + TP/DP shardings (parallel/), the jitted train
step (training/finetune.py), background batch prefetch (utils/loader.py) and
step checkpoints with resume (utils/checkpoint.py). This is the production
path for reproducing a model like the reference's cahya captioner
(audio_search.py:94) from (audio, caption-text) pairs.
"""
from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable, Iterable

import jax
import numpy as np

from ..models import whisper as W
from ..parallel.mesh import data_sharded, make_mesh, shard_params
from ..utils.checkpoint import TrainCheckpointer
from ..utils.loader import PrefetchLoader
from .finetune import TrainConfig, make_train_step


@dataclass
class TrainResult:
    params: object
    steps: int
    losses: list


def finetune_captioner(
    batches: Iterable[dict],          # {"mel", "tokens", "loss_mask"} numpy
    cfg: W.WhisperConfig,
    tcfg: TrainConfig | None = None,
    init_params=None,
    n_devices: int | None = None,
    model_parallel: int = 1,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 100,
    resume: bool = True,
    log_fn: Callable[[str], None] = print,
    prefetch: int = 2,
    fast_forward_data: bool = False,
) -> TrainResult:
    tcfg = tcfg or TrainConfig()
    mesh = make_mesh(n_devices, model_parallel)
    params = init_params if init_params is not None \
        else W.init_params(jax.random.PRNGKey(0), cfg)
    params = shard_params(params, mesh)
    train_step, opt = make_train_step(cfg, tcfg, donate=False)
    opt_state = jax.device_put(opt.init(params))

    ck = TrainCheckpointer(checkpoint_dir) if checkpoint_dir else None
    start_step = 0
    if ck is not None and resume and ck.latest_step() is not None:
        # restore() returns host numpy arrays; re-apply the TP/DP shardings
        # so a resumed run keeps the same device placement (and HBM budget)
        # as a fresh one, instead of silently replicating everything.
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P
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
        if fast_forward_data:
            # opt-in for callers that pass the SAME full-dataset iterator on
            # resume: skip the start_step batches already consumed so the
            # step<->sample alignment holds. Callers that pass only the
            # remaining data keep the default (no skipping).
            it = iter(batches)
            for _ in range(start_step):
                if next(it, None) is None:
                    break
            batches = it

    sharding = data_sharded(mesh)
    losses = []
    step = start_step
    t_start = time.perf_counter()
    with mesh:
        for batch in PrefetchLoader(batches, depth=prefetch):
            dev_batch = {
                k: jax.device_put(np.asarray(v), sharding)
                for k, v in batch.items()}
            params, opt_state, metrics = train_step(
                params, opt_state, dev_batch)
            step += 1
            loss = float(metrics["loss"])
            losses.append(loss)
            if step % 10 == 0:
                rate = (step - start_step) / (time.perf_counter() - t_start)
                log_fn(f"step {step}: loss={loss:.4f} "
                       f"gnorm={float(metrics['grad_norm']):.3f} "
                       f"({rate:.2f} steps/s)")
            if ck is not None and step % checkpoint_every == 0:
                ck.save(step, params, opt_state, {"loss": loss})
    if ck is not None:
        ck.save(step, params, opt_state,
                {"loss": losses[-1] if losses else None})
    return TrainResult(params=params, steps=step, losses=losses)
