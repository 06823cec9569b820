"""Single-writer discipline under concurrent HTTP ingest + search.

SURVEY.md §5: JAX's purity removes device races; the host-side index
mutation is the spot needing a discipline test. Hammers the live server with
parallel ingests and searches and checks the store never tears (every
search sees a consistent prefix of the index; final count is exact).
"""
import json
import threading
import urllib.request

import numpy as np
import jax.numpy as jnp
import pytest

from multimodal_audio_search_tpu import AudioSearchEngine, EngineConfig
from multimodal_audio_search_tpu.audio.wav import write_wav
from multimodal_audio_search_tpu.config import DecodeConfig, MelConfig
from multimodal_audio_search_tpu.models import whisper as W
from multimodal_audio_search_tpu.models.minilm import MiniLMConfig
from multimodal_audio_search_tpu.pipelines.embed import TextEmbedder
from multimodal_audio_search_tpu.pipelines.ingest import DualPipelineIngest
from multimodal_audio_search_tpu.pipelines.whisper_pipeline import (
    WhisperTextPipeline)
from multimodal_audio_search_tpu.service.server import serve


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    wcfg = W.WhisperConfig(
        vocab_size=128, d_model=32, enc_layers=1, dec_layers=1, heads=2,
        ffn=64, enc_positions=150, dec_positions=12,
        bos_token_id=100, eos_token_id=101, pad_token_id=101)
    mel = MelConfig(padded_seconds=3.0)
    d = DecodeConfig(max_new_tokens=3)
    cfg = EngineConfig(ingest_batch=4)
    eng = AudioSearchEngine(cfg=cfg, ingest_pipeline=DualPipelineIngest(
        WhisperTextPipeline(cfg=wcfg, decode=d, mel_cfg=mel,
                            dtype=jnp.float32, name="asr"),
        WhisperTextPipeline(cfg=wcfg, decode=d, mel_cfg=mel,
                            dtype=jnp.float32, name="caption", seed=1,
                            prefix_ids=[100]),
        TextEmbedder(cfg=MiniLMConfig(vocab_size=512, hidden=64, layers=1,
                                      heads=2, intermediate=128)),
        cfg))
    eng.cfg = eng.cfg.replace(embed_dim=64)
    eng.store.embed_dim = 64
    eng.store._emb = np.zeros((eng.store._cap, 2, 64), np.float32)
    srv = serve(eng, host="127.0.0.1", port=0, block=False)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", eng
    srv.shutdown()


def test_concurrent_ingest_and_search(server, rng, tmp_path):
    url, eng = server
    wav_bytes = []
    for i in range(6):
        p = tmp_path / f"w{i}.wav"
        write_wav(str(p), (rng.normal(size=16000 * 4) * 0.3)
                  .astype(np.float32), 16000)
        wav_bytes.append(p.read_bytes())

    errors: list[str] = []
    ingested: list[int] = []

    def do_ingest(i):
        try:
            req = urllib.request.Request(
                f"{url}/api/ingest?name=w{i}", data=wav_bytes[i],
                method="POST")
            with urllib.request.urlopen(req, timeout=300) as r:
                body = json.loads(r.read())
            ingested.append(len(body["segments"]))
        except Exception as e:  # noqa: BLE001
            errors.append(f"ingest {i}: {e}")

    def do_search(i):
        try:
            with urllib.request.urlopen(
                    f"{url}/api/search?q=query+{i}", timeout=300) as r:
                body = json.loads(r.read())
            for hit in body["results"]:
                # any hit must reference a fully-written row
                assert hit["segment_id"].startswith("seg_")
                assert "fusion_score" in hit
        except Exception as e:  # noqa: BLE001
            errors.append(f"search {i}: {e}")

    threads = [threading.Thread(target=do_ingest, args=(i,))
               for i in range(6)]
    threads += [threading.Thread(target=do_search, args=(i,))
                for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert not errors, errors
    # exact final count: no lost/duplicated appends
    assert len(eng.store) == sum(ingested)
    # store arrays and metadata agree
    assert eng.store.embeddings.shape[0] == len(eng.store.meta)


def test_concurrent_delete_ingest_search(server, rng, tmp_path):
    """Deletion compaction racing ingest + search under the server's
    single-writer lock: no torn reads, exact final accounting."""
    url, eng = server
    p = tmp_path / "dw.wav"
    write_wav(str(p), (rng.normal(size=16000 * 4) * 0.3)
              .astype(np.float32), 16000)
    data = p.read_bytes()
    errors: list[str] = []
    removed: list[int] = []
    kept_new: list[int] = []

    def do_ingest(i, name):
        try:
            req = urllib.request.Request(
                f"{url}/api/ingest?name={name}", data=data, method="POST")
            with urllib.request.urlopen(req, timeout=300) as r:
                kept_new.append(len(json.loads(r.read())["segments"]))
        except Exception as e:  # noqa: BLE001
            errors.append(f"ingest {i}: {e}")

    def do_delete(i):
        try:
            req = urllib.request.Request(
                f"{url}/api/delete?source=victim{i}", method="POST")
            with urllib.request.urlopen(req, timeout=300) as r:
                removed.append(json.loads(r.read())["removed"])
        except Exception as e:  # noqa: BLE001
            errors.append(f"delete {i}: {e}")

    def do_search(i):
        try:
            with urllib.request.urlopen(
                    f"{url}/api/search?q=probe+{i}", timeout=300) as r:
                body = json.loads(r.read())
            for hit in body["results"]:
                assert "fusion_score" in hit
        except Exception as e:  # noqa: BLE001
            errors.append(f"search {i}: {e}")

    # seed victims to delete
    for i in range(3):
        do_ingest(i, f"victim{i}")
    victims = sum(kept_new)
    kept_new.clear()

    threads = [threading.Thread(target=do_ingest, args=(10 + i, f"keep{i}"))
               for i in range(3)]
    threads += [threading.Thread(target=do_delete, args=(i,))
                for i in range(3)]
    threads += [threading.Thread(target=do_search, args=(i,))
                for i in range(6)]
    before = len(eng.store)
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert not errors, errors
    assert sum(removed) == victims
    assert len(eng.store) == before - victims + sum(kept_new)
    assert eng.store.embeddings.shape[0] == len(eng.store.meta)
    assert not any(r["source"].startswith("victim")
                   for r in eng.store.meta)
