"""Audio -> text extraction pipeline (shared by ASR and captioning).

The reference runs two HF pipelines one segment at a time
(audio_search.py:309-397). Here one jitted XLA program per batch bucket runs
log-mel -> encoder -> KV-cached generation for a whole segment batch; the two
pipeline instances differ only in weights, decode config, and decoder prompt:

  * ASR: whisper-base, en-transcribe prompt (audio_search.py:316-327)
  * caption: whisper-tiny captioner, plain <sot> prompt
    (audio_search.py:365-375)
"""
from __future__ import annotations

import functools
import time
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DecodeConfig, MelConfig
from ..models import whisper as W
from ..models.generate import generate
from ..models.layers import cast_floats
from ..models.tokenizer import load_tokenizer
from ..ops.mel import log_mel_spectrogram
from ..utils.batching import bucket_pow2 as _bucket
from ..service.stats import PipelineStats


class WhisperTextPipeline:
    """transcribe(waves[B, n_samples]) -> list[str] (empty on EOS-at-start)."""

    def __init__(
        self,
        params=None,
        cfg: W.WhisperConfig | None = None,
        tokenizer=None,
        decode: DecodeConfig | None = None,
        mel_cfg: MelConfig | None = None,
        prefix_ids: Sequence[int] | None = None,
        dtype=jnp.bfloat16,
        seed: int = 0,
        stats: PipelineStats | None = None,
        name: str = "whisper",
    ):
        self.cfg = cfg or W.PRESETS["base"]
        if params is None:
            params = W.init_params(jax.random.PRNGKey(seed), self.cfg)
        self.params = cast_floats(params, dtype)
        self.dtype = dtype
        self.decode = decode or DecodeConfig(max_new_tokens=64)
        self.mel_cfg = mel_cfg or MelConfig(n_mels=self.cfg.n_mels)
        self.tokenizer = tokenizer or load_tokenizer(
            vocab_size=self.cfg.vocab_size, add_cls_sep=False,
            pad_id=self.cfg.pad_token_id, eos_id=self.cfg.eos_token_id)
        self.prefix_ids = tuple(
            prefix_ids if prefix_ids is not None
            else W.forced_prefix(self.cfg))
        self.stats = stats if stats is not None else PipelineStats(
            f"{name} pipeline", name)
        self.name = name

        # None = auto (round-5 parity promotion, config.py): the fused
        # bf16 block kernels on a real TPU backend — measured
        # transcript-exact at decision strength on the production-
        # geometry oracle (docs/onchip_r5/drift_s5_c.json) — and the
        # einsum path elsewhere. bool or "int8" pass through; encode()
        # dispatches on the value.
        fused_enc = getattr(self.decode, "fused_encoder", None)
        if fused_enc is None:
            fused_enc = jax.default_backend() == "tpu"
        # observable (bench/stats/tests): which encoder path this
        # pipeline's jitted programs were built with
        self.fused_encoder_resolved = fused_enc

        @functools.partial(jax.jit, static_argnames=())
        def _run(params, waves, prefix, rng):
            mel = log_mel_spectrogram(waves, self.mel_cfg).astype(dtype)
            enc = W.encode(params, mel, self.cfg, fused_blocks=fused_enc)
            out = generate(
                params, enc, prefix, cfg=self.cfg, decode=self.decode,
                prefix_len=len(self.prefix_ids),
                max_new_tokens=self.decode.max_new_tokens, rng=rng)
            return out.tokens, out.lengths

        @functools.partial(jax.jit, static_argnames=())
        def _run_mel(params, mel, prefix, rng):
            enc = W.encode(params, mel.astype(dtype), self.cfg,
                           fused_blocks=fused_enc)
            out = generate(
                params, enc, prefix, cfg=self.cfg, decode=self.decode,
                prefix_len=len(self.prefix_ids),
                max_new_tokens=self.decode.max_new_tokens, rng=rng)
            return out.tokens, out.lengths

        self._run = _run
        self._run_mel = _run_mel
        self._step = 0
        self.mesh = None
        self._batch_sharding = None

    def use_mesh(self, mesh) -> None:
        """Run this pipeline's programs over ``mesh``: params placed by
        the Megatron TP rules over 'model' (replicated where dims don't
        divide), batches sharded over 'data'. The jitted programs are
        unchanged — GSPMD partitions them from the input shardings (the
        pattern proven in tests/test_sampling_sharded_infer.py)."""
        from ..parallel.mesh import shard_params, validate_data_axis
        from jax.sharding import NamedSharding, PartitionSpec as P
        validate_data_axis(mesh)  # ADVICE r3: clear error for dp=6 etc.
        self.mesh = mesh
        self.params = shard_params(self.params, mesh)
        self._batch_sharding = NamedSharding(mesh, P("data"))

    def batch_floor(self) -> int:
        """Minimum batch bucket: 'data'-sharded batches must divide dp."""
        return 8 if self.mesh is None else max(8, self.mesh.shape["data"])

    def transcribe_batch(self, waves: np.ndarray) -> list[str]:
        """waves: [B, mel_cfg.n_samples] float32 (already padded)."""
        n = len(waves)
        b = _bucket(n, self.batch_floor())
        if b > n:
            waves = np.pad(waves, ((0, b - n), (0, 0)))
        waves = jnp.asarray(waves, jnp.float32)
        if self._batch_sharding is not None:
            waves = jax.device_put(waves, self._batch_sharding)
        return self._decode_to_texts(self._run, waves, n, b)

    def dispatch_mel(self, mel: jnp.ndarray):
        """Async: launch encode+generate on device-resident mel, returning
        (tokens, lengths) futures — no host sync. Lets the ingest loop
        overlap the next batch's host->device transfer with this compute."""
        b = mel.shape[0]
        prefix = np.tile(np.asarray(self.prefix_ids, np.int32), (b, 1))
        if self._batch_sharding is not None:
            prefix = jax.device_put(prefix, self._batch_sharding)
        self._step += 1
        rng = jax.random.PRNGKey(self._step)
        return self._run_mel(self.params, mel, prefix, rng)

    def texts_from_tokens(
        self, tokens: np.ndarray, lengths: np.ndarray, n: int
    ) -> list[str]:
        texts = []
        p = len(self.prefix_ids)
        for i in range(n):
            # lengths includes the EOS token when one was emitted; the
            # tokenizer's skip_special_tokens drops it, so the slice must
            # NOT subtract 1 (that truncated the last real token whenever
            # decode ran to max_new_tokens without an EOS)
            gen = tokens[i, p: p + int(lengths[i])]
            texts.append(self.tokenizer.decode(
                gen, skip_special_tokens=True).strip())
        return texts

    def _decode_to_texts(self, run, model_in, n: int, b: int) -> list[str]:
        t0 = time.perf_counter()
        prefix = np.tile(np.asarray(self.prefix_ids, np.int32), (b, 1))
        if self._batch_sharding is not None:
            prefix = jax.device_put(prefix, self._batch_sharding)
        self._step += 1
        rng = jax.random.PRNGKey(self._step)
        tokens, lengths = run(self.params, model_in, prefix, rng)
        texts = self.texts_from_tokens(
            np.asarray(tokens), np.asarray(lengths), n)
        self.stats.update(time.perf_counter() - t0, success=True, n=n)
        return texts
