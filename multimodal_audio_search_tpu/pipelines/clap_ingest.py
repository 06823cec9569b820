"""Assembled CLAP search path (the historical v1 architecture).

The reference's first iteration embedded audio DIRECTLY — no
transcription: chunks -> CLAP audio tower -> 512D embeddings, text
queries through the CLAP text tower, cosine ranking + strategy dispatch
(previous_iterations/streamlit_app_backup.py:561-596 chunking with >=1 s
keep rule, :598-638 get_audio_features/get_text_features, :647-734
strategies). The production architecture superseded it, but the v1 path
remains a capability of the framework; this module assembles the
existing towers (models/clap.py) into that end-to-end flow, batched and
jitted TPU-style rather than one chunk at a time.

The index is a SegmentStore with the 512D audio embedding in the AUDIO
slot (ASR slot empty, success=False) so persistence, deletion, and the
device-view cache all come for free."""
from __future__ import annotations

import functools
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..config import MelConfig
from ..index.store import AUDIO, SegmentStore
from ..models import clap as C
from ..models.minilm import MiniLMConfig
from ..models.minilm import init_params as init_minilm
from ..models.tokenizer import load_tokenizer
from ..ops.mel import log_mel_spectrogram
from ..utils.batching import bucket_pow2 as _bucket


class ClapSearch:
    """ingest(wave) -> 512D audio-embedding index; search(text) -> hits."""

    def __init__(
        self,
        audio_params=None,
        text_params=None,
        proj_params=None,
        acfg: C.ClapConfig | None = None,
        tcfg: MiniLMConfig | None = None,
        tokenizer=None,
        store: SegmentStore | None = None,
        chunk_seconds: float = 10.0,   # slider default (backup:875)
        min_seconds: float = 1.0,      # >=1 s keep rule (backup:577)
        sample_rate: int = 16_000,
        max_tokens: int = 64,
        dtype=jnp.float32,
        seed: int = 0,
    ):
        self.acfg = acfg or C.ClapConfig()
        self.tcfg = tcfg or MiniLMConfig()
        k = jax.random.PRNGKey(seed)
        ka, kt, kp = jax.random.split(k, 3)
        from ..models.layers import cast_floats
        self.audio_params = cast_floats(
            audio_params if audio_params is not None
            else C.init_audio_tower(ka, self.acfg), dtype)
        self.text_params = cast_floats(
            text_params if text_params is not None
            else init_minilm(kt, self.tcfg), dtype)
        self.proj_params = cast_floats(
            proj_params if proj_params is not None
            else C.init_text_projection(kp, self.tcfg, self.acfg), dtype)
        self.tokenizer = tokenizer or load_tokenizer(
            vocab_size=self.tcfg.vocab_size)
        self.store = store if store is not None else SegmentStore(
            embed_dim=self.acfg.embed_dim, keep_audio=False)
        self.chunk_seconds = chunk_seconds
        self.min_seconds = min_seconds
        self.sample_rate = sample_rate
        self.max_tokens = max_tokens
        self.mel_cfg = MelConfig(n_mels=self.acfg.n_mels,
                                 padded_seconds=chunk_seconds,
                                 sample_rate=sample_rate)

        @jax.jit
        def _audio_embed(params, waves):
            mel = log_mel_spectrogram(waves, self.mel_cfg).astype(dtype)
            return C.audio_embed(params, mel, self.acfg)

        @functools.partial(jax.jit, static_argnames=("k",))
        def _query(text_params, proj_params, ids, mask, emb, ok, *, k):
            q = C.text_embed(text_params, proj_params, ids, mask,
                             self.tcfg, self.acfg)[0]
            scores = emb[:, AUDIO].astype(jnp.float32) @ q
            scores = jnp.where(ok[:, AUDIO], scores, -jnp.inf)
            vals, idx = jax.lax.top_k(scores, k)
            return vals, idx

        self._audio_embed = _audio_embed
        self._query = _query

    # --------------------------------------------------------------- ingest
    def ingest_waveform(self, wave: np.ndarray, sr: int,
                        source_name: str = "clap") -> list[int]:
        """Chunk + batch-embed; returns store row indices."""
        if sr != self.sample_rate:
            from ..audio.resample import resample_best
            wave = resample_best(wave, sr, self.sample_rate)
            sr = self.sample_rate
        n = int(self.chunk_seconds * sr)
        keep = int(self.min_seconds * sr)
        pieces, times = [], []
        for lo in range(0, len(wave), n):
            piece = wave[lo: lo + n]
            if len(piece) < keep:      # >=1 s keep rule (backup:577)
                continue
            pieces.append(piece)
            times.append((lo / sr, (lo + len(piece)) / sr))
        if not pieces:
            return []
        rows: list[int] = []
        n_samples = self.mel_cfg.n_samples
        for lo in range(0, len(pieces), 32):
            chunk = pieces[lo: lo + 32]
            b = _bucket(len(chunk))
            batch = np.zeros((b, n_samples), np.float32)
            for i, p in enumerate(chunk):
                batch[i, : min(len(p), n_samples)] = p[:n_samples]
            emb = np.asarray(self._audio_embed(
                self.audio_params, jnp.asarray(batch)))[: len(chunk)]
            for i, e in enumerate(emb):
                t0, t1 = times[lo + i]
                rows.append(self.store.add(
                    {"source": source_name, "start_time": t0,
                     "end_time": t1, "duration": t1 - t0,
                     "asr_text": "", "audio_description": ""},
                    None, e))
        return rows

    # --------------------------------------------------------------- search
    def search(self, query: str, k: int = 10) -> list[dict[str, Any]]:
        """Text -> CLAP text tower -> cosine ranking over the audio index
        (the backup's Audio Only strategy, its Fixed 50/50 dim-mismatch
        fallback target, backup:661-685)."""
        if len(self.store) == 0:
            return []
        t0 = time.perf_counter()
        ids, mask = self.tokenizer.encode([query], self.max_tokens)
        emb, ok = self.store.device_index()
        k_eff = min(k, len(self.store))
        vals, idx = self._query(
            self.text_params, self.proj_params, jnp.asarray(ids),
            jnp.asarray(mask), emb, ok, k=k_eff)
        vals, idx = np.asarray(vals), np.asarray(idx)
        hits = []
        for score, i in zip(vals, idx):
            if not np.isfinite(score) or i >= len(self.store):
                continue
            row = dict(self.store.meta[int(i)])
            row["similarity"] = float(score)
            row["index"] = int(i)
            hits.append(row)
        self._last_search_s = time.perf_counter() - t0
        return hits
