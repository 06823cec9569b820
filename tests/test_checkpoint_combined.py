import zlib

import numpy as np
import jax
import pytest

from multimodal_audio_search_tpu.index.combined import CombinedTextSearcher
from multimodal_audio_search_tpu.index.store import SegmentStore
from multimodal_audio_search_tpu.models import whisper as W
from multimodal_audio_search_tpu.utils.checkpoint import (
    TrainCheckpointer, load_pytree, save_pytree)


def test_pytree_roundtrip(tmp_path):
    cfg = W.WhisperConfig(vocab_size=32, d_model=16, enc_layers=1,
                          dec_layers=1, heads=2, ffn=32,
                          enc_positions=10, dec_positions=8)
    params = W.init_params(jax.random.PRNGKey(0), cfg)
    save_pytree(params, tmp_path / "p.npz")
    loaded = load_pytree(params, tmp_path / "p.npz")
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_train_checkpointer_retention_and_restore(tmp_path):
    ck = TrainCheckpointer(tmp_path, keep=2)
    params = {"w": np.arange(4, dtype=np.float32)}
    for step in (1, 2, 3, 4):
        ck.save(step, {"w": params["w"] * step}, metadata={"loss": 1.0/step})
    assert ck.latest_step() == 4
    got, _, meta = ck.restore(params)
    np.testing.assert_allclose(got["w"], params["w"] * 4)
    assert meta["step"] == 4
    # retention: only 2 newest kept
    kept = sorted(p.name for p in tmp_path.glob("step_*.params.npz"))
    assert len(kept) == 2 and "step_00000003" in kept[0]
    got3, _, _ = ck.restore(params, step=3)
    np.testing.assert_allclose(got3["w"], params["w"] * 3)
    with pytest.raises(FileNotFoundError):
        TrainCheckpointer(tmp_path / "empty").restore(params)


def make_embed(d=16):
    def embed(texts):
        out = np.zeros((len(texts), d), np.float32)
        for i, t in enumerate(texts):
            for w in t.lower().split():
                out[i, zlib.crc32(w.encode()) % d] += 1.0
            n = np.linalg.norm(out[i])
            if n:
                out[i] /= n
        return out
    return embed


def test_combined_text_searcher():
    embed = make_embed()
    store = SegmentStore(embed_dim=16, keep_audio=False)
    rows = [
        ("hello world greeting", "a person speaking"),
        ("", "upbeat music with drums"),
        ("weather report sunny", ""),
    ]
    for i, (asr, cap) in enumerate(rows):
        store.add(
            {"segment_id": f"s{i}", "asr_text": asr,
             "audio_description": cap},
            embed([asr])[0] if asr else None,
            embed([cap])[0] if cap else None)
    s = CombinedTextSearcher(store, embed)
    hits = s("upbeat music drums", mode="combined", k=3)
    assert hits[0]["segment_id"] == "s1"
    hits = s("hello world", mode="asr", k=3)
    assert hits[0]["segment_id"] == "s0"
    # asr mode must exclude segments without asr embedding
    assert all(h["segment_id"] != "s1" for h in hits)
    hits = s("person speaking", mode="caption", k=3)
    assert hits[0]["segment_id"] == "s0"
    import pytest
    with pytest.raises(ValueError):
        s("x", mode="nope")
