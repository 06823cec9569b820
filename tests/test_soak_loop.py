"""Unit tests for the soak mixed-load loop (tools/soak.py::_soak_loop,
round-4 verdict item 7): sampling, delete cadence, checkpoint cadence,
and the three growth assertions — exercised against a stubbed HTTP
transport so the logic is testable without a server or a chip (the
real artifact is the on-chip run; this pins the harness's own
behavior).

Reference long-session behavior being guarded: the Streamlit app keeps
one engine alive for the whole session (audio_search.py:702-711) — the
server equivalent must not leak RSS or degrade search latency under
sustained mixed load.
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from soak import _soak_loop  # noqa: E402


class FakeReq:
    """Minimal transport double: counts calls, tracks the segment
    total through ingest/delete, optionally leaks or slows over time."""

    def __init__(self, segs_per_wav=2, rss_series=None, lat_series=None):
        self.calls = []
        self.total = 0
        self.segs = segs_per_wav
        self.rss_series = rss_series
        self.lat_series = lat_series
        self.i = 0

    def __call__(self, method, path, data=None, headers=None):
        self.calls.append((method, path.split("?")[0]))
        if path.startswith("/api/ingest"):
            self.total += self.segs
            return 200, b"{}"
        if path.startswith("/api/delete"):
            self.total -= self.segs
            return 200, json.dumps({"total": self.total}).encode()
        return 200, b"{}"


def _run(monkeypatch, fake, iters=12):
    """Drive _soak_loop for a fixed iteration count by faking time."""
    import soak as soak_mod

    t = {"v": 0.0}
    real_time = soak_mod.time

    class FakeTime:
        @staticmethod
        def time():
            return t["v"]

        @staticmethod
        def perf_counter():
            # each perf_counter pair brackets one search; advance a
            # deterministic latency per call
            t["v"] += 0.005
            return t["v"]

    # one iteration makes 1 ingest + 4 searches (8 perf_counter calls =
    # 40 ms) + bookkeeping; advance wall time so exactly `iters`
    # iterations fit
    monkeypatch.setattr(soak_mod, "time", FakeTime)

    class FakeProc:
        def memory_info(self):
            class M:
                rss = int((300 + 0.01 * t["v"]) * 1e6)   # ~flat
            return M()

    import types
    fake_psutil = types.SimpleNamespace(Process=lambda: FakeProc())
    monkeypatch.setitem(sys.modules, "psutil", fake_psutil)

    out = {}
    # deadline: iters iterations x ~0.04 s of fake latency each
    _soak_loop(fake, b"RIFF", minutes=iters * 0.04 / 60.0, out=out)
    monkeypatch.setattr(soak_mod, "time", real_time)
    return out


def test_loop_passes_on_flat_resources(monkeypatch, capsys):
    fake = FakeReq()
    out = _run(monkeypatch, fake, iters=12)
    loop = out["loop"]
    assert loop["status"] == 200, loop
    assert all(loop["checks"].values()), loop["checks"]
    # delete cadence keeps the store bounded: never more than 9 sources
    assert loop["segments_max"] is not None
    assert loop["segments_max"] <= 9 * fake.segs
    # checkpoint cadence: one save per 5 iterations
    saves = sum(1 for m, p in fake.calls if p == "/api/save")
    assert saves == loop["iterations"] // 5
    # every sample line is incremental JSON (evidence survives a kill)
    lines = [ln for ln in capsys.readouterr().out.splitlines()
             if ln.startswith("{")]
    assert len(lines) == loop["iterations"]
    assert all("soak_sample" in ln for ln in lines)


def test_loop_fails_on_rss_growth(monkeypatch):
    import types

    fake = FakeReq()
    grow = {"rss": 300.0}

    class LeakProc:
        def memory_info(self):
            grow["rss"] *= 1.6            # hard leak every sample
            class M:
                rss = int(grow["rss"] * 1e6)
            return M()

    monkeypatch.setitem(sys.modules, "psutil",
                        types.SimpleNamespace(Process=lambda: LeakProc()))
    import soak as soak_mod

    t = {"v": 0.0}

    class FakeTime:
        @staticmethod
        def time():
            return t["v"]

        @staticmethod
        def perf_counter():
            t["v"] += 0.005
            return t["v"]

    monkeypatch.setattr(soak_mod, "time", FakeTime)
    out = {}
    _soak_loop(fake, b"RIFF", minutes=12 * 0.04 / 60.0, out=out)
    assert out["loop"]["status"] == 500
    assert out["loop"]["checks"]["rss_plateau"] is False
