"""Assembled CLAP v1 path: audio -> CLAP tower -> 512D index -> text
query (streamlit_app_backup.py:561-638 semantics, batched)."""
import numpy as np
import pytest

from multimodal_audio_search_tpu.models.clap import ClapConfig
from multimodal_audio_search_tpu.models.minilm import MiniLMConfig
from multimodal_audio_search_tpu.pipelines.clap_ingest import ClapSearch


@pytest.fixture(scope="module")
def cs():
    return ClapSearch(
        acfg=ClapConfig(embed_dim=32, d_model=32, layers=1, heads=2,
                        ffn=64, patch_frames=10, max_patches=1000),
        tcfg=MiniLMConfig(vocab_size=256, hidden=32, layers=1, heads=2,
                          intermediate=64),
        chunk_seconds=4.0, min_seconds=1.0)


def test_chunking_keep_rule_and_index(cs, rng):
    sr = 16000
    # 9.5 s at 4 s chunks -> [0-4], [4-8], [8-9.5] (1.5 s >= 1 s kept)
    wave = (rng.normal(size=int(sr * 9.5)) * 0.3).astype(np.float32)
    rows = cs.ingest_waveform(wave, sr, "a")
    assert len(rows) == 3
    assert cs.store.meta[rows[2]]["end_time"] == pytest.approx(9.5)
    # 8.5 s -> tail 0.5 s dropped by the >=1 s rule (backup:577)
    rows2 = cs.ingest_waveform(
        (rng.normal(size=int(sr * 8.5)) * 0.3).astype(np.float32),
        sr, "b")
    assert len(rows2) == 2
    # embeddings are unit-norm in the AUDIO slot; ASR slot empty
    emb = cs.store.embeddings
    np.testing.assert_allclose(
        np.linalg.norm(emb[:, 1], axis=-1), 1.0, atol=1e-5)
    assert not cs.store.success[:, 0].any()
    assert cs.store.success[:, 1].all()


def test_search_matches_numpy_oracle(cs, rng):
    hits = cs.search("loud music with drums", k=4)
    assert 1 <= len(hits) <= 4
    # oracle: text embed via the same towers, numpy cosine ranking
    import jax.numpy as jnp
    from multimodal_audio_search_tpu.models import clap as C
    ids, mask = cs.tokenizer.encode(["loud music with drums"],
                                    cs.max_tokens)
    q = np.asarray(C.text_embed(cs.text_params, cs.proj_params,
                                jnp.asarray(ids), jnp.asarray(mask),
                                cs.tcfg, cs.acfg))[0]
    scores = cs.store.embeddings[:, 1] @ q
    order = np.argsort(-scores)[: len(hits)]
    assert [h["index"] for h in hits] == [int(i) for i in order]
    for h in hits:
        assert h["similarity"] == pytest.approx(
            float(scores[h["index"]]), abs=1e-5)


def test_resample_and_persistence(cs, rng, tmp_path):
    from multimodal_audio_search_tpu.index.store import SegmentStore
    wave = (rng.normal(size=8000 * 5) * 0.3).astype(np.float32)
    before = len(cs.store)
    rows = cs.ingest_waveform(wave, 8000, "8k")   # resampled to 16 k
    # 5 s at 4 s chunks: [0-4] + the 1 s tail (exactly at the keep rule)
    assert len(rows) == 2 and len(cs.store) == before + 2
    cs.store.save(tmp_path / "clap_idx")
    st2 = SegmentStore.load(tmp_path / "clap_idx")
    assert len(st2) == len(cs.store)
    np.testing.assert_allclose(st2.embeddings, cs.store.embeddings,
                               rtol=1e-6)
