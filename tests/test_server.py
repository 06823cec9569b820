"""HTTP service boundary test: real server, real requests."""
import json
import threading
import urllib.parse
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
        ffn=64, enc_positions=150, dec_positions=16,
        bos_token_id=100, eos_token_id=101, pad_token_id=101)
    mel = MelConfig(padded_seconds=3.0)
    decode = DecodeConfig(max_new_tokens=4)
    cfg = EngineConfig(ingest_batch=4)
    asr = WhisperTextPipeline(cfg=wcfg, decode=decode, mel_cfg=mel,
                              dtype=jnp.float32, name="asr")
    cap = WhisperTextPipeline(cfg=wcfg, decode=decode, mel_cfg=mel,
                              dtype=jnp.float32, name="caption",
                              prefix_ids=[wcfg.bos_token_id], seed=1)
    emb = TextEmbedder(cfg=MiniLMConfig(vocab_size=512, hidden=384,
                                        layers=1, heads=4,
                                        intermediate=256))
    engine = AudioSearchEngine(
        cfg=cfg, ingest_pipeline=DualPipelineIngest(asr, cap, emb, cfg))
    root = tmp_path_factory.mktemp("data_root")
    srv = serve(engine, host="127.0.0.1", port=0, block=False,
                data_root=root)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", root
    srv.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=120) as r:
        return r.status, json.loads(r.read())


def test_full_http_flow(server, rng, tmp_path):
    server, data_root = server
    wave = (rng.normal(size=16000 * 8) * 0.3).astype(np.float32)
    p = tmp_path / "u.wav"
    write_wav(str(p), wave, 16000)
    req = urllib.request.Request(
        server + "/api/ingest?name=u.wav", data=p.read_bytes(),
        method="POST")
    with urllib.request.urlopen(req, timeout=300) as r:
        body = json.loads(r.read())
    assert r.status == 200
    assert body["total"] == len(body["segments"])
    for s in body["segments"]:
        assert "asr_embedding" not in s  # embeddings not serialized

    st, out = _get(server + "/api/search?q=music%20with%20drums&k=5")
    assert st == 200
    assert "results" in out and "weight_info" in out

    st, stats = _get(server + "/api/stats")
    assert st == 200 and "models" in stats

    st, segs = _get(server + "/api/segments")
    assert st == 200 and segs["total"] == body["total"]

    if body["total"]:
        with urllib.request.urlopen(server + "/api/audio/0",
                                    timeout=60) as r:
            wav_bytes = r.read()
        assert wav_bytes[:4] == b"RIFF"

    # UI page served
    with urllib.request.urlopen(server + "/", timeout=60) as r:
        html = r.read().decode()
    assert "Dual Pipeline Audio Search" in html

    # error paths
    req = urllib.request.Request(
        server + "/api/ingest?name=junk", data=b"\0" * 32, method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=60)
    assert e.value.code == 400

    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(server + "/api/nope", timeout=60)
    assert e.value.code == 404

    # persistence over HTTP — paths are confined to data_root; relative
    # paths resolve under it
    req = urllib.request.Request(server + "/api/save?path=idx",
                                 method="POST")
    with urllib.request.urlopen(req, timeout=60) as r:
        assert r.status == 200
    req = urllib.request.Request(server + "/api/load?path=idx",
                                 method="POST")
    with urllib.request.urlopen(req, timeout=60) as r:
        assert json.loads(r.read())["total"] == body["total"]

    # save/load outside the data root is rejected (CSRF hardening)
    for bad in (f"{tmp_path}/evil", "../escape", "/etc/pwned"):
        req = urllib.request.Request(
            server + "/api/save?path=" + urllib.parse.quote(bad),
            method="POST")
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=60)
        assert e.value.code == 403, bad

    # audio index bounds: negative and past-the-end -> 404 (not a wrong
    # segment served via python negative indexing)
    for i in (-1, 10_000):
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(server + f"/api/audio/{i}", timeout=60)
        assert e.value.code == 404

    # operation log CSV export (historical metrics parity)
    with urllib.request.urlopen(server + "/api/metrics.csv",
                                timeout=60) as r:
        csv_text = r.read().decode()
    assert csv_text.splitlines()[0].startswith("timestamp,operation")
    assert "ingest_file" in csv_text

    # reset endpoint = reference GC button + model-comparison index clear
    req = urllib.request.Request(server + "/api/reset", method="POST")
    with urllib.request.urlopen(req, timeout=60) as r:
        out = json.loads(r.read())
    assert out["reset"] is True
    st, segs = _get(server + "/api/segments")
    assert segs["total"] == 0
    # restore the saved index so state isn't lost for later assertions
    req = urllib.request.Request(server + "/api/load?path=idx",
                                 method="POST")
    with urllib.request.urlopen(req, timeout=60) as r:
        assert json.loads(r.read())["total"] == body["total"]


def test_api_token_gates_state_changes(tmp_path):
    from multimodal_audio_search_tpu.index.store import SegmentStore
    from multimodal_audio_search_tpu.service.api import AudioSearchEngine

    class NullIngest:
        stats = None
        embedder = None

    eng = AudioSearchEngine(ingest_pipeline=None,
                            store=SegmentStore(embed_dim=8))
    eng._ingest = NullIngest()  # search/ingest untested here
    srv = serve(eng, host="127.0.0.1", port=0, block=False,
                data_root=tmp_path, api_token="s3cret")
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        req = urllib.request.Request(base + "/api/reset", method="POST")
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=30)
        assert e.value.code == 401
        req = urllib.request.Request(
            base + "/api/reset", method="POST",
            headers={"X-API-Token": "s3cret"})
        with urllib.request.urlopen(req, timeout=30) as r:
            assert json.loads(r.read())["reset"] is True
    finally:
        srv.shutdown()


def test_ui_escapes_dynamic_strings(server):
    server, _ = server
    with urllib.request.urlopen(server + "/", timeout=60) as r:
        html = r.read().decode()
    # every dynamic insertion goes through esc() (textContent round-trip);
    # transcripts of attacker-supplied audio must not inject HTML
    assert "function esc(" in html
    assert "esc(s.asr_text" in html and "esc(h.asr_text" in html
    assert "esc(w.analysis)" in html
    # reference-parity surfaces exist (audio_search.py:714-765, 798-817,
    # 881-1027)
    for marker in ("System Monitor", "Model Information",
                   "Hardware / Software", "Pipeline Performance",
                   "Clear Index + GC", "Export JSON", "ASR success"):
        assert marker in html, marker


def test_upload_limit_and_profile_endpoint(server, tmp_path):
    server, data_root = server
    # oversized Content-Length rejected before reading the body
    import http.client
    host = server.split("//")[1]
    conn = http.client.HTTPConnection(host, timeout=60)
    conn.putrequest("POST", "/api/ingest?name=big")
    conn.putheader("Content-Length", str(2 << 30))
    conn.endheaders()
    resp = conn.getresponse()
    assert resp.status == 400
    assert b"limit" in resp.read()
    conn.close()

    # profiler trace capture around a search
    req = urllib.request.Request(server + "/api/profile?q=music",
                                 method="POST")
    with urllib.request.urlopen(req, timeout=120) as r:
        out = json.loads(r.read())
    import pathlib
    p = pathlib.Path(out["trace_dir"])
    assert p.exists() and str(p).startswith(str(data_root.resolve()))
    assert any(p.rglob("*")), "trace dir empty"


def test_search_strategies_over_http(server, rng, tmp_path):
    """Historical strategy surface over the production index
    (streamlit_app_backup.py:62-66 dispatch, :1110-1133 compare-all)."""
    server, _ = server
    wave = (rng.normal(size=16000 * 8) * 0.3).astype(np.float32)
    p = tmp_path / "s.wav"
    write_wav(str(p), wave, 16000)
    req = urllib.request.Request(
        server + "/api/ingest?name=s.wav", data=p.read_bytes(),
        method="POST")
    urllib.request.urlopen(req, timeout=300).read()

    for strat in ("fixed_5050", "dynamic_selection", "adaptive_weighting",
                  "audio_only"):
        st, out = _get(server + "/api/search?q=loud%20music&strategy="
                       + strat)
        assert st == 200
        assert out["weight_info"]["strategy"] == strat
        for r in out["results"]:
            assert "fusion_score" in r and "index" in r
            assert "audio_data" not in r

    st, out = _get(server + "/api/search?q=drums&strategy=compare_all")
    assert st == 200
    per = out["weight_info"]["per_strategy"]
    assert set(per) == {"audio_only", "fixed_5050", "dynamic_selection",
                        "adaptive_weighting"}
    for s, o in per.items():
        assert len(o["top"]) == len(o["scores"])

    # default stays the production fusion path
    st, out = _get(server + "/api/search?q=drums&strategy=fusion")
    assert st == 200 and "asr_weight" in out["weight_info"]
    # UI carries the dropdown
    with urllib.request.urlopen(server + "/", timeout=30) as r:
        html = r.read().decode()
    assert 'id="strategy"' in html and "compare_all" in html


def test_async_ingest_jobs(server, rng, tmp_path):
    """POST /api/ingest?async=1 -> 202 + job id; one background worker
    drains jobs in order; /api/jobs/{id} reaches 'done' with the same
    payload shape as the synchronous path, and a malformed upload lands
    'failed' (not a dead worker)."""
    import time as _time
    server, _ = server
    wave = (rng.normal(size=16000 * 6) * 0.3).astype(np.float32)
    p = tmp_path / "a.wav"
    write_wav(str(p), wave, 16000)

    req = urllib.request.Request(
        server + "/api/ingest?name=a.wav&async=1", data=p.read_bytes(),
        method="POST")
    with urllib.request.urlopen(req, timeout=60) as r:
        assert r.status == 202
        job = json.loads(r.read())
    assert job["state"] == "queued" and job["job"]

    req = urllib.request.Request(
        server + "/api/ingest?name=bad.bin&async=1", data=b"\0" * 64,
        method="POST")
    with urllib.request.urlopen(req, timeout=60) as r:
        bad = json.loads(r.read())

    def wait(jid, until, timeout=300):
        t0 = _time.time()
        while _time.time() - t0 < timeout:
            st, out = _get(server + "/api/jobs/" + jid)
            assert st == 200
            if out["state"] in until:
                return out
            _time.sleep(0.2)
        raise AssertionError(f"job {jid} never reached {until}: {out}")

    done = wait(job["job"], ("done", "failed"))
    assert done["state"] == "done", done
    assert done["n_segments"] == len(done["segments"])
    assert done["total"] >= done["n_segments"]
    assert done["finished"] >= done["started"] >= done["submitted"]
    failed = wait(bad["job"], ("done", "failed"))
    assert failed["state"] == "failed" and failed["error"]

    st, listing = _get(server + "/api/jobs")
    ids = {j["id"] for j in listing["jobs"]}
    assert {job["job"], bad["job"]} <= ids
    for j in listing["jobs"]:
        assert "segments" not in j  # listing stays slim

    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(server + "/api/jobs/nope", timeout=30)
    assert e.value.code == 404


def test_async_queue_backpressure(server, rng, tmp_path):
    """The 202 path must bound queued payload memory: with the queue gate
    closed (max_queued_jobs=0) an async upload gets 429, the synchronous
    path still works."""
    import urllib.request as ur
    server, _ = server
    wave = (rng.normal(size=16000 * 4) * 0.3).astype(np.float32)
    p = tmp_path / "bp.wav"
    write_wav(str(p), wave, 16000)
    import multimodal_audio_search_tpu.service.server as srv_mod
    # the module-level fixture's handler class: find it through gc-free
    # route — the server fixture stores the URL only, so gate via the
    # class attribute on the base handler (dynamic subclass inherits it)
    old = srv_mod.AudioSearchHandler.max_queued_jobs
    srv_mod.AudioSearchHandler.max_queued_jobs = 0
    try:
        req = ur.Request(server + "/api/ingest?name=bp.wav&async=1",
                         data=p.read_bytes(), method="POST")
        with pytest.raises(urllib.error.HTTPError) as e:
            ur.urlopen(req, timeout=60)
        assert e.value.code == 429
        req = ur.Request(server + "/api/ingest?name=bp.wav",
                         data=p.read_bytes(), method="POST")
        with ur.urlopen(req, timeout=300) as r:
            assert r.status == 200
    finally:
        srv_mod.AudioSearchHandler.max_queued_jobs = old


def test_batched_query_with_strategy_rejected(server):
    server, _ = server
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(
            server + "/api/search?q=a&q=b&strategy=audio_only",
            timeout=30)
    assert e.value.code == 400


@pytest.fixture(scope="module")
def cfg_server(tmp_path_factory):
    """Server over a test-preset engine built FROM CONFIG (so
    /api/config can rebuild models without heavyweight presets)."""
    from multimodal_audio_search_tpu.config import ModelSpec, SegmentConfig
    cfg = EngineConfig(
        asr_model=ModelSpec(family="whisper", preset="test"),
        caption_model=ModelSpec(family="whisper", preset="test"),
        text_embedder=ModelSpec(family="minilm", preset="test"),
        embed_dim=64, ingest_batch=4,
        segment=SegmentConfig(segment_seconds=2.0,
                              min_segment_seconds=0.5),
        short_context=True,
        asr_decode=DecodeConfig(max_new_tokens=3),
        caption_decode=DecodeConfig(max_new_tokens=3))
    engine = AudioSearchEngine(cfg=cfg, keep_audio=False)
    root = tmp_path_factory.mktemp("cfg_root")
    srv = serve(engine, host="127.0.0.1", port=0, block=False,
                data_root=root)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_config_endpoint_knobs(cfg_server, rng, tmp_path):
    """The historical UI's chunk-duration slider + model dropdowns
    (streamlit_app_backup.py:875, clean_audio_search.py:32-47) over HTTP:
    reconfigure changes segmentation behavior and resets the index."""
    st, cfg0 = _get(cfg_server + "/api/config")
    assert st == 200
    assert cfg0["segment_seconds"] == 2.0
    assert "base" in cfg0["asr_options"]
    assert "all-mpnet-base-v2" in cfg0["embedder_options"]

    wave = (rng.normal(size=16000 * 4) * 0.3).astype(np.float32)
    p = tmp_path / "c.wav"
    write_wav(str(p), wave, 16000)

    def ingest():
        req = urllib.request.Request(
            cfg_server + "/api/ingest?name=c.wav", data=p.read_bytes(),
            method="POST")
        with urllib.request.urlopen(req, timeout=300) as r:
            return json.loads(r.read())

    n2 = len(ingest()["segments"])          # 2 s windows over 4 s
    assert n2 == 2

    req = urllib.request.Request(
        cfg_server + "/api/config",
        data=json.dumps({"segment_seconds": 1.5}).encode(),
        method="POST", headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=300) as r:
        out = json.loads(r.read())
    assert out["segment_seconds"] == 1.5

    st, segs = _get(cfg_server + "/api/segments")
    assert segs["total"] == 0               # index reset on reconfigure
    n15 = len(ingest()["segments"])         # 1.5 s windows: 1.5/1.5/1.0
    assert n15 == 3

    # transfer-dtype knob: listed, switchable, round-trips in config
    assert cfg0["transfer_dtype"] == "int16"
    assert "int12" in cfg0["transfer_options"]
    req = urllib.request.Request(
        cfg_server + "/api/config",
        data=json.dumps({"transfer_dtype": "int12"}).encode(),
        method="POST", headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=300) as r:
        assert json.loads(r.read())["transfer_dtype"] == "int12"
    assert len(ingest()["segments"]) == 3   # ingest works on int12

    # validation errors surface as 400s — including non-object bodies
    # (a bare number used to TypeError outside the 400 mapping -> 500)
    for bad in ("{\"segment_seconds\": 99}", "{\"asr_preset\": \"nope\"}",
                "{\"transfer_dtype\": \"int9\"}", "{\"bogus_key\": 1}",
                "42", "[1, 2]", "\"text\""):
        req = urllib.request.Request(
            cfg_server + "/api/config", data=bad.encode(),
            method="POST", headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(req, timeout=60)
            raise AssertionError(f"{bad} should have failed")
        except urllib.error.HTTPError as e:
            assert e.code == 400, (bad, e.code)
