"""Whisper fine-tuning (the framework's training subsystem).

Capability rationale: the reference's caption model
(cahya/whisper-tiny-audio-captioning-v2.0, audio_search.py:94) *is* a Whisper
fine-tune; the reference itself only consumes it. This module supplies the
missing production piece: a jit/pjit teacher-forced cross-entropy training
step over a (data, model) mesh — data-parallel batches, Megatron-style
tensor-parallel matmuls (parallel/mesh.py rules) — with optax AdamW and
optional gradient checkpointing of encoder blocks.

Also covers the reference's only trainable component, the
AudioToTextEmbeddingBridge MLP (lightweight_audio_search.py:26-45), in
training/bridge.py.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import optax

from ..models import whisper as W


@dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-4
    weight_decay: float = 0.01
    b1: float = 0.9
    b2: float = 0.98
    grad_clip: float = 1.0
    label_smoothing: float = 0.0
    # LR schedule: "constant", or "warmup_cosine" (linear warmup ->
    # cosine decay to end_lr_frac * learning_rate over total_steps —
    # the standard production fine-tuning schedule)
    schedule: str = "constant"
    warmup_steps: int = 0
    total_steps: int = 10_000
    end_lr_frac: float = 0.1


def make_schedule(cfg: TrainConfig):
    """Returns an optax schedule (callable step -> lr)."""
    if cfg.schedule == "constant":
        if cfg.warmup_steps > 0:
            return optax.linear_schedule(
                0.0, cfg.learning_rate, cfg.warmup_steps)
        return optax.constant_schedule(cfg.learning_rate)
    if cfg.schedule == "warmup_cosine":
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=cfg.learning_rate,
            warmup_steps=max(cfg.warmup_steps, 1),
            decay_steps=cfg.total_steps,
            end_value=cfg.learning_rate * cfg.end_lr_frac)
    raise ValueError(f"unknown schedule {cfg.schedule!r}")


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(make_schedule(cfg), b1=cfg.b1, b2=cfg.b2,
                    weight_decay=cfg.weight_decay),
    )


def caption_loss(
    params, mel: jnp.ndarray, tokens: jnp.ndarray, loss_mask: jnp.ndarray,
    cfg: W.WhisperConfig, label_smoothing: float = 0.0,
) -> jnp.ndarray:
    """Teacher-forced next-token cross-entropy.

    tokens [B, T] includes the decoder prompt; loss_mask [B, T-1] selects
    which next-token predictions count (0 on prompt/padding).
    """
    # fused_attention=False: training differentiates the encoder, and the
    # Pallas attention kernels have no VJP (inference-only perf modes).
    # On TPU at t>=512 the auto-select would otherwise pick them and
    # value_and_grad fails with "Linearization failed ..." (seen on-chip,
    # docs/onchip_r4/drift_prod.out round 4).
    enc = W.encode(params, mel, cfg, fused_attention=False)
    logits = W.decode_train(params, enc, tokens[:, :-1], cfg)  # [B,T-1,V]
    targets = tokens[:, 1:]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    if label_smoothing > 0.0:
        smooth = -jnp.mean(logp, axis=-1)
        nll = (1 - label_smoothing) * nll + label_smoothing * smooth
    m = loss_mask.astype(jnp.float32)
    return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)


def make_train_step(
    cfg: W.WhisperConfig,
    tcfg: TrainConfig | None = None,
    donate: bool = True,
):
    """Returns (train_step, opt) where train_step(params, opt_state, batch)
    -> (params, opt_state, metrics). jit-able under any mesh; shard params
    with parallel.mesh.shard_params and batches with data_sharded for
    dp+tp execution (XLA inserts the psum/all-gathers).
    """
    tcfg = tcfg or TrainConfig()
    opt = make_optimizer(tcfg)

    def loss_fn(params, batch):
        return caption_loss(
            params, batch["mel"], batch["tokens"], batch["loss_mask"],
            cfg, tcfg.label_smoothing)

    @functools.partial(
        jax.jit, donate_argnums=(0, 1) if donate else ())
    def train_step(params, opt_state, batch) -> tuple[Any, Any, dict]:
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        gnorm = optax.global_norm(grads)
        return params, opt_state, {"loss": loss, "grad_norm": gnorm}

    return train_step, opt
