"""Synthesize raw tokenizer checkpoint assets for builder tests.

Creates the file layouts an HF checkpoint dir would carry — vocab.json +
merges.txt + added_tokens.json (Whisper/GPT-2 byte-level BPE) and
vocab.txt (BERT WordPiece) — small enough to check logic, real enough to
exercise the exact production load path (no hub downloads in this image).
"""
from __future__ import annotations

import json
import pathlib


def bytes_to_unicode() -> dict[int, str]:
    """GPT-2's byte<->unicode visible mapping (vocab.json uses it)."""
    bs = list(range(33, 127)) + list(range(161, 173)) + list(range(174, 256))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def make_whisper_style_dir(root: pathlib.Path) -> pathlib.Path:
    """Byte-level BPE with a few merges + whisper-style added specials."""
    d = root / "whisper_ckpt"
    d.mkdir(parents=True, exist_ok=True)
    b2u = bytes_to_unicode()
    vocab = {ch: i for i, ch in enumerate(b2u[b] for b in range(256))}
    sp = b2u[ord(" ")]  # 'Ġ'
    merge_specs = [
        ("h", "e"), ("l", "l"), ("he", "ll"), ("hell", "o"),
        ("w", "o"), ("r", "l"), ("wo", "rl"), ("worl", "d"),
        (sp, "world"),
    ]
    merges = []
    for a, b in merge_specs:
        tok = a + b
        vocab[tok] = len(vocab)
        merges.append(f"{a} {b}")
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(merges) + "\n")
    base = len(vocab)
    added = {
        "<|endoftext|>": base,
        "<|startoftranscript|>": base + 1,
        "<|en|>": base + 2,
        "<|transcribe|>": base + 3,
        "<|notimestamps|>": base + 4,
    }
    (d / "added_tokens.json").write_text(json.dumps(added))
    return d


def make_minilm_style_dir(root: pathlib.Path) -> pathlib.Path:
    """WordPiece vocab.txt with continuation pieces, BERT specials."""
    d = root / "minilm_ckpt"
    d.mkdir(parents=True, exist_ok=True)
    words = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "hello", "world", "drum", "##s", "music", "play", "##ing",
             "a", "the", "with"]
    (d / "vocab.txt").write_text("\n".join(words) + "\n")
    return d
