"""Tokenizers for the text embedder (WordPiece) and Whisper decode (BPE).

The reference gets these implicitly from HF hub downloads
(audio_search.py:153,200). This image has no egress, so:

  * when local tokenizer assets exist (a ``tokenizer.json`` or
    ``vocab.txt``), they load through the bundled ``tokenizers`` runtime
    (HF's native Rust tokenizer library — already in the image),
  * otherwise a deterministic ``HashWordTokenizer`` keeps every pipeline,
    test, and benchmark runnable: stable word -> id hashing for encode and a
    reversible ``tok<id>`` decode. Retrieval semantics (same text -> same
    ids -> same embedding) are preserved; only human readability is not.
"""
from __future__ import annotations

import hashlib
import pathlib
import re
from typing import Sequence

import numpy as np


class HashWordTokenizer:
    """Deterministic offline tokenizer (fallback when no assets exist)."""

    def __init__(self, vocab_size: int = 30522, cls_id: int = 101,
                 sep_id: int = 102, pad_id: int = 0, reserved: int = 1000,
                 add_cls_sep: bool = True, eos_id: int | None = None):
        self.vocab_size = vocab_size
        self.cls_id, self.sep_id, self.pad_id = cls_id, sep_id, pad_id
        # special-id space can't exceed a quarter of a tiny test vocab
        self.reserved = min(reserved, max(vocab_size // 4, 8))
        self.add_cls_sep = add_cls_sep
        self.eos_id = eos_id

    def _word_id(self, w: str) -> int:
        h = int.from_bytes(
            hashlib.blake2s(w.encode(), digest_size=4).digest(), "little")
        return self.reserved + h % (self.vocab_size - self.reserved)

    def encode(
        self, texts: Sequence[str], max_len: int = 64
    ) -> tuple[np.ndarray, np.ndarray]:
        ids = np.full((len(texts), max_len), self.pad_id, np.int32)
        mask = np.zeros((len(texts), max_len), np.int32)
        for i, t in enumerate(texts):
            words = re.findall(r"[a-z0-9]+", t.lower())
            toks = [self._word_id(w) for w in words]
            if self.add_cls_sep:
                toks = [self.cls_id] + toks[: max_len - 2] + [self.sep_id]
            else:
                toks = toks[:max_len]
            ids[i, : len(toks)] = toks
            mask[i, : len(toks)] = 1
        return ids, mask

    def decode(self, ids: Sequence[int],
               skip_special_tokens: bool = True) -> str:
        special = {self.cls_id, self.sep_id, self.pad_id}
        if self.eos_id is not None:
            special.add(self.eos_id)
        out = []
        for t in ids:
            t = int(t)
            if skip_special_tokens and (t < self.reserved or t in special):
                continue
            out.append(f"tok{t}")
        return " ".join(out)


class HFTokenizerWrapper:
    """Wraps a ``tokenizers.Tokenizer`` (from local tokenizer.json/vocab)."""

    def __init__(self, tok, pad_id: int = 0):
        self.tok = tok
        self.pad_id = pad_id

    @classmethod
    def from_path(cls, path: str | pathlib.Path) -> "HFTokenizerWrapper":
        from tokenizers import Tokenizer
        p = pathlib.Path(path)
        tj = p / "tokenizer.json" if p.is_dir() else p
        if tj.exists() and tj.suffix == ".json":
            return cls(Tokenizer.from_file(str(tj)))
        vocab = p / "vocab.txt"
        if vocab.exists():
            from tokenizers import BertWordPieceTokenizer
            return cls(BertWordPieceTokenizer(str(vocab), lowercase=True))
        raise FileNotFoundError(f"no tokenizer assets under {path}")

    def encode(
        self, texts: Sequence[str], max_len: int = 64
    ) -> tuple[np.ndarray, np.ndarray]:
        ids = np.full((len(texts), max_len), self.pad_id, np.int32)
        mask = np.zeros((len(texts), max_len), np.int32)
        for i, t in enumerate(texts):
            e = self.tok.encode(t)
            toks = e.ids[:max_len]
            ids[i, : len(toks)] = toks
            mask[i, : len(toks)] = 1
        return ids, mask

    def decode(self, ids: Sequence[int],
               skip_special_tokens: bool = True) -> str:
        return self.tok.decode(
            [int(t) for t in ids], skip_special_tokens=skip_special_tokens)


def load_tokenizer(
    path: str | None = None, vocab_size: int = 30522, **hash_kw
):
    """Local assets if present, deterministic hash fallback otherwise."""
    if path is not None and pathlib.Path(path).exists():
        return HFTokenizerWrapper.from_path(path)
    return HashWordTokenizer(vocab_size=vocab_size, **hash_kw)
