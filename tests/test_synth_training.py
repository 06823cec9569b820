"""Self-trained synthetic captioner (training/synth.py) — the weights
supplier for perf-mode drift measurement (round-2 verdict item 4)."""
import numpy as np

from multimodal_audio_search_tpu.training.synth import (
    SynthVocab, make_clip, train_synth_captioner, transcribe)
from multimodal_audio_search_tpu.models import whisper as W


def test_clip_generator_deterministic_and_labeled():
    rng = np.random.default_rng(0)
    w, t = make_clip(rng)
    assert w.shape == (16000,) and w.dtype == np.float32
    vocab = SynthVocab(W.PRESETS["test"])
    ids = vocab.words_to_ids(t)
    assert vocab.decode(ids) == t
    # same seed -> same clip
    w2, t2 = make_clip(np.random.default_rng(0))
    np.testing.assert_array_equal(w, w2)
    assert t == t2


def test_training_learns_and_produces_nondegenerate_transcripts():
    """A short run must clearly reduce loss and yield transcripts drawn
    from the grammar (non-degenerate), with some exact matches — the
    preconditions for meaningful drift measurement
    (tools/synth_drift.py)."""
    m = train_synth_captioner(steps=150, batch=16, seed=0)
    assert np.mean(m.losses[:10]) > 2 * np.mean(m.losses[-10:])

    rng = np.random.default_rng(99)
    waves, texts = zip(*(make_clip(rng) for _ in range(16)))
    got = transcribe(m, np.stack(waves))
    words = set(SynthVocab.WORDS)
    assert all(set(g.split()) <= words for g in got)
    assert any(g for g in got)                      # not all empty
    # int16 transfer round trip is transcript-exact (the zero-drift
    # default claimed in docs/BENCHMARKS.md)
    q = (np.clip(np.stack(waves), -1, 1) * 32767.0).astype(np.int16)
    got16 = transcribe(m, q.astype(np.float32) / 32767.0)
    assert got16 == got
