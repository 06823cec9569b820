"""Text -> 384D embedding pipeline (the reference's L3).

Wraps the JAX MiniLM sentence encoder (models/minilm.py) with tokenization
and power-of-two batch bucketing so XLA compiles one program per bucket
instead of one per batch size. The reference calls
SentenceTransformer.encode one string at a time (audio_search.py:335,384,635);
this embeds whole batches.
"""
from __future__ import annotations

import functools
import time
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models import minilm
from ..models.tokenizer import load_tokenizer
from ..utils.batching import bucket_pow2 as _bucket
from ..service.stats import PipelineStats


class TextEmbedder:
    """embed(texts) -> [n, hidden] unit-norm float32 embeddings."""

    def __init__(
        self,
        params=None,
        cfg: minilm.MiniLMConfig | None = None,
        tokenizer=None,
        max_tokens: int = 64,
        dtype=jnp.float32,
        seed: int = 0,
        stats: PipelineStats | None = None,
        model=None,
    ):
        """``model`` is the encoder module (default models.minilm); any
        module exposing init_params(key, cfg) and
        sentence_embed(params, ids, mask, cfg) works — e.g. models.mpnet
        for the real all-mpnet-base-v2 architecture."""
        model = model or minilm
        if cfg is None:
            cfg = minilm.MiniLMConfig() if model is minilm \
                else model.PRESETS["base"]
        self.cfg = cfg
        if params is None:
            params = model.init_params(jax.random.PRNGKey(seed), self.cfg)
        from ..models.layers import cast_floats
        self.params = cast_floats(params, dtype)
        self.tokenizer = tokenizer or load_tokenizer(
            vocab_size=self.cfg.vocab_size)
        self.max_tokens = max_tokens
        self.stats = stats if stats is not None else PipelineStats(
            "Text Embedder", f"{model.__name__.rsplit('.', 1)[-1]}-jax")
        self.stats.embedding_dim = self.cfg.hidden
        # unjitted (params, ids, mask) -> [B, H]; composite programs
        # (index/search.py's single-dispatch embed+topk) jit around it
        self.sentence_fn = functools.partial(
            model.sentence_embed, cfg=self.cfg)
        self._fn = jax.jit(self.sentence_fn)
        self.mesh = None
        self._batch_sharding = None

    def use_mesh(self, mesh) -> None:
        """Place params over ``mesh`` (TP rules where divisible, else
        replicated) and shard embed batches over its 'data' axis. Batch
        bucketing already pads to a power of two >= 8, which every
        dp <= 8 divides; larger dp raises the bucket floor."""
        from ..parallel.mesh import shard_params, validate_data_axis
        from jax.sharding import NamedSharding, PartitionSpec as P
        validate_data_axis(mesh)  # ADVICE r3: clear error for dp=6 etc.
        self.mesh = mesh
        self.params = shard_params(self.params, mesh)
        self._batch_sharding = NamedSharding(mesh, P("data"))

    @property
    def dim(self) -> int:
        return self.cfg.hidden

    def __call__(self, texts: Sequence[str]) -> np.ndarray:
        if len(texts) == 0:
            return np.zeros((0, self.cfg.hidden), np.float32)
        t0 = time.perf_counter()
        ids, mask = self.tokenizer.encode(list(texts), self.max_tokens)
        floor = 8 if self.mesh is None else max(8, self.mesh.shape["data"])
        b = _bucket(len(texts), floor)
        if b > len(texts):  # pad rows (masked out; results sliced away)
            pad = b - len(texts)
            ids = np.pad(ids, ((0, pad), (0, 0)))
            mask = np.pad(mask, ((0, pad), (0, 0)))
            mask[len(texts):, 0] = 1  # avoid 0/0 in mean pooling
        ids, mask = jnp.asarray(ids), jnp.asarray(mask)
        if self._batch_sharding is not None:
            ids = jax.device_put(ids, self._batch_sharding)
            mask = jax.device_put(mask, self._batch_sharding)
        out = np.asarray(self._fn(self.params, ids, mask))[: len(texts)]
        self.stats.update(time.perf_counter() - t0, success=True,
                          n=len(texts))
        return out
