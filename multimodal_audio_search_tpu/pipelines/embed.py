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
from ..service.stats import PipelineStats


def _bucket(n: int, floor: int = 8) -> int:
    b = floor
    while b < n:
        b *= 2
    return b


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
    ):
        self.cfg = cfg or minilm.MiniLMConfig()
        if params is None:
            params = minilm.init_params(jax.random.PRNGKey(seed), self.cfg)
        from ..models.layers import cast_floats
        self.params = cast_floats(params, dtype)
        self.tokenizer = tokenizer or load_tokenizer(
            vocab_size=self.cfg.vocab_size)
        self.max_tokens = max_tokens
        self.stats = stats if stats is not None else PipelineStats(
            "Text Embedder", "minilm-jax")
        self.stats.embedding_dim = self.cfg.hidden
        self._fn = jax.jit(
            functools.partial(minilm.sentence_embed, cfg=self.cfg))

    @property
    def dim(self) -> int:
        return self.cfg.hidden

    def __call__(self, texts: Sequence[str]) -> np.ndarray:
        if len(texts) == 0:
            return np.zeros((0, self.cfg.hidden), np.float32)
        t0 = time.perf_counter()
        ids, mask = self.tokenizer.encode(list(texts), self.max_tokens)
        b = _bucket(len(texts))
        if b > len(texts):  # pad rows (masked out; results sliced away)
            pad = b - len(texts)
            ids = np.pad(ids, ((0, pad), (0, 0)))
            mask = np.pad(mask, ((0, pad), (0, 0)))
            mask[len(texts):, 0] = 1  # avoid 0/0 in mean pooling
        out = np.asarray(self._fn(self.params, jnp.asarray(ids),
                                  jnp.asarray(mask)))[: len(texts)]
        self.stats.update(time.perf_counter() - t0, success=True,
                          n=len(texts))
        return out
