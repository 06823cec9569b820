"""HTTP service + web UI (stdlib only — no streamlit in this image).

The reference's only boundary is a Streamlit app (audio_search.py:702-1027).
This provides a real service boundary over AudioSearchEngine:

    POST /api/ingest   (body: audio bytes, ?name=)   -> segment summaries
    GET  /api/search?q=...&k=10                       -> hits + weight info
    GET  /api/stats                                   -> stats JSON export
    GET  /api/segments                                -> index listing
    GET  /api/audio/{i}                               -> segment WAV playback
    POST /api/save?path= | /api/load?path=            -> index persistence
    GET  /                                            -> single-page UI with
         the reference's three tabs (Process / Search / Statistics)

Single-writer discipline: ingest and search serialize through one lock (the
store mutates host-side; device programs are functional).
"""
from __future__ import annotations

import io
import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from ..audio.wav import write_wav
from .api import AudioSearchEngine

_UI = """<!DOCTYPE html>
<html><head><title>TPU Audio Search</title><style>
body{font-family:system-ui;margin:2rem;max-width:60rem}
nav button{margin-right:.5rem;padding:.4rem .8rem}
.tab{display:none}.tab.active{display:block}
.hit{border:1px solid #ccc;border-radius:6px;padding:.6rem;margin:.5rem 0}
.score{font-weight:bold}pre{background:#f6f6f6;padding:.6rem;overflow:auto}
</style></head><body>
<h1>🎯 Dual Pipeline Audio Search (TPU)</h1>
<nav>
<button onclick="show('process')">📁 Process Audio</button>
<button onclick="show('search')">🔍 Search</button>
<button onclick="show('stats')">📊 Statistics</button>
</nav>
<div id="process" class="tab active">
<h2>Process audio</h2>
<input type="file" id="file" accept=".wav"/>
<button onclick="ingest()">Process with Both Pipelines</button>
<div id="ingest_out"></div></div>
<div id="search" class="tab">
<h2>Weighted fusion search</h2>
<input id="q" size="50" placeholder="e.g. upbeat music with drums"/>
<button onclick="doSearch()">Search with Fusion</button>
<div id="weights"></div><div id="hits"></div></div>
<div id="stats" class="tab"><h2>Statistics</h2>
<button onclick="loadStats()">Refresh</button><pre id="stats_out"></pre></div>
<script>
function show(id){document.querySelectorAll('.tab').forEach(
 t=>t.classList.remove('active'));
 document.getElementById(id).classList.add('active');}
async function ingest(){
 const f=document.getElementById('file').files[0];
 if(!f)return alert('pick a wav file');
 const r=await fetch('/api/ingest?name='+encodeURIComponent(f.name),
  {method:'POST',body:await f.arrayBuffer()});
 const j=await r.json();
 document.getElementById('ingest_out').innerHTML=
  '<p>✅ '+j.segments.length+' segments (index: '+j.total+')</p>'+
  j.segments.map(s=>'<div class=hit>'+s.segment_id+' '+
   s.start_time.toFixed(1)+'–'+s.end_time.toFixed(1)+'s — ASR: '+
   (s.asr_text||'∅')+' — Caption: '+(s.audio_description||'∅')+
   '</div>').join('');}
async function doSearch(){
 const q=document.getElementById('q').value;
 const r=await fetch('/api/search?q='+encodeURIComponent(q));
 const j=await r.json();
 const w=j.weight_info;
 document.getElementById('weights').innerHTML='<p>🧠 ASR '+
  (100*w.asr_weight).toFixed(0)+'% / Audio '+
  (100*w.audio_weight).toFixed(0)+'% — '+w.analysis+'</p>';
 document.getElementById('hits').innerHTML=j.results.map((h,i)=>
  '<div class=hit><span class=score>#'+(i+1)+' '+
  h.fusion_score.toFixed(3)+'</span> ['+h.start_time.toFixed(1)+'–'+
  h.end_time.toFixed(1)+'s] ASR:'+h.asr_similarity.toFixed(3)+
  ' Audio:'+h.audio_similarity.toFixed(3)+'<br>'+
  (h.asr_text?'🎤 '+h.asr_text+'<br>':'')+
  (h.audio_description?'🎵 '+h.audio_description+'<br>':'')+
  '<audio controls src="/api/audio/'+h.index+'"></audio></div>'
 ).join('')||'<p>no hits above threshold</p>';}
async function loadStats(){
 const r=await fetch('/api/stats');
 document.getElementById('stats_out').textContent=
  JSON.stringify(await r.json(),null,2);}
</script></body></html>"""


class AudioSearchHandler(BaseHTTPRequestHandler):
    engine: AudioSearchEngine = None  # set by serve()
    lock: threading.Lock = None

    def _send(self, code: int, body: bytes,
              ctype: str = "application/json") -> None:
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _json(self, obj, code: int = 200) -> None:
        self._send(code, json.dumps(obj).encode())

    def log_message(self, *a):  # quiet
        pass

    def do_GET(self):
        url = urllib.parse.urlparse(self.path)
        qs = urllib.parse.parse_qs(url.query)
        try:
            if url.path == "/":
                self._send(200, _UI.encode(), "text/html")
            elif url.path == "/api/search":
                q = qs.get("q", [""])[0]
                k = int(qs.get("k", ["10"])[0])
                with self.lock:
                    results, info = self.engine.search(q, k)
                slim = [{kk: v for kk, v in r.items()
                         if kk not in ("audio_data",)} for r in results]
                self._json({"results": slim, "weight_info": info})
            elif url.path == "/api/stats":
                self._send(200, self.engine.export_stats_json().encode())
            elif url.path == "/api/segments":
                self._json({"total": len(self.engine.store),
                            "segments": self.engine.store.meta})
            elif url.path.startswith("/api/audio/"):
                i = int(url.path.rsplit("/", 1)[1])
                audio = self.engine.store.audio(i)
                if audio is None:
                    self._json({"error": "no audio stored"}, 404)
                    return
                sr = self.engine.store.meta[i].get("sample_rate", 16000)
                import tempfile
                buf = io.BytesIO()
                with tempfile.NamedTemporaryFile(suffix=".wav") as tf:
                    write_wav(tf.name, np.asarray(audio), int(sr))
                    buf.write(open(tf.name, "rb").read())
                self._send(200, buf.getvalue(), "audio/wav")
            else:
                self._json({"error": "not found"}, 404)
        except Exception as e:  # noqa: BLE001 — service boundary
            self._json({"error": str(e)}, 500)

    def do_POST(self):
        url = urllib.parse.urlparse(self.path)
        qs = urllib.parse.parse_qs(url.query)
        try:
            if url.path == "/api/ingest":
                n = int(self.headers.get("Content-Length", "0"))
                data = self.rfile.read(n)
                name = qs.get("name", ["upload"])[0]
                with self.lock:
                    segs = self.engine.ingest(data, name)
                slim = [{k: v for k, v in s.items()
                         if k not in ("asr_embedding", "audio_embedding",
                                      "audio_data")} for s in segs]
                self._json({"segments": slim,
                            "total": len(self.engine.store)})
            elif url.path == "/api/save":
                path = qs.get("path", ["./index"])[0]
                with self.lock:
                    self.engine.save_index(path)
                self._json({"saved": path})
            elif url.path == "/api/load":
                path = qs.get("path", ["./index"])[0]
                with self.lock:
                    self.engine.load_index(path)
                self._json({"loaded": path,
                            "total": len(self.engine.store)})
            else:
                self._json({"error": "not found"}, 404)
        except ValueError as e:
            self._json({"error": str(e)}, 400)
        except Exception as e:  # noqa: BLE001
            self._json({"error": str(e)}, 500)


def serve(
    engine: AudioSearchEngine | None = None,
    host: str = "127.0.0.1",
    port: int = 8527,                      # reference port (README.md:59-66)
    block: bool = True,
    warmup: bool = False,
) -> ThreadingHTTPServer:
    engine = engine or AudioSearchEngine()
    engine.load_all_models(warmup=warmup)
    handler = type("Handler", (AudioSearchHandler,),
                   {"engine": engine, "lock": threading.Lock()})
    srv = ThreadingHTTPServer((host, port), handler)
    if block:
        print(f"serving on http://{host}:{port}")
        srv.serve_forever()
    return srv


if __name__ == "__main__":
    serve()
