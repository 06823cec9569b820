"""bench.py capture guard — the driver's one perf capture per round must
always be a parseable JSON line with rc=0, even when the axon backend is
wedged (round-3 postmortem: BENCH_r03 was rc=1 with no JSON because
``jax.devices()`` was called unguarded).

These tests import bench.py as a module and monkeypatch its internals;
no backend is touched (the reference has no analogue — this guards the
driver contract described in the task brief: bench.py prints ONE JSON
line).
"""
import importlib.util
import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def bench():
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _last_json_line(out: str) -> dict:
    lines = [ln for ln in out.strip().splitlines() if ln.strip()]
    assert lines, "no output at all"
    return json.loads(lines[-1])


def test_main_emits_json_line_when_everything_explodes(
        bench, monkeypatch, capsys):
    """A crash anywhere inside _main (wedged backend, Mosaic crash, OOM)
    must still print one parseable JSON line and request exit 0."""
    def boom():
        raise RuntimeError(
            "Unable to initialize backend 'axon': UNAVAILABLE: "
            "TPU backend setup/compile error")
    exits = []
    monkeypatch.setattr(bench, "_main", boom)
    monkeypatch.setattr(os, "_exit", lambda code: exits.append(code))
    bench.main()
    rec = _last_json_line(capsys.readouterr().out)
    assert rec["metric"] == "ingest_audio_seconds_per_sec_per_chip"
    assert rec["value"] == 0.0
    assert rec["extras"]["platform"] == "unavailable"
    assert "UNAVAILABLE" in rec["extras"]["error"]
    assert exits == [0]


def test_main_emits_json_line_on_systemexit(bench, monkeypatch, capsys):
    """Even SystemExit (e.g. a library calling sys.exit on init failure)
    is converted to the JSON line; only KeyboardInterrupt propagates."""
    exits = []
    monkeypatch.setattr(bench, "_main",
                        lambda: (_ for _ in ()).throw(SystemExit(3)))
    monkeypatch.setattr(os, "_exit", lambda code: exits.append(code))
    bench.main()
    rec = _last_json_line(capsys.readouterr().out)
    assert rec["extras"]["platform"] == "unavailable"
    assert exits == [0]

    with pytest.raises(KeyboardInterrupt):
        monkeypatch.setattr(bench, "_main",
                            lambda: (_ for _ in ()).throw(
                                KeyboardInterrupt()))
        bench.main()


def test_probe_failure_forces_cpu_not_crash(bench, monkeypatch, capsys):
    """When the probe reports the backend is down, _main must force CPU
    via jax.config (the axon plugin ignores JAX_PLATFORMS) rather than
    calling jax.devices() against the wedged backend."""
    import jax

    calls = []
    monkeypatch.setattr(
        bench, "probe_tpu_with_retry",
        lambda: (False, "probe timed out after 900s (backend wedged?)",
                 900.0))
    real_update = jax.config.update

    def spy_update(name, value):
        calls.append((name, value))
        real_update(name, value)

    monkeypatch.setattr(jax.config, "update", spy_update)
    # Cut _main short right after the platform decision: the first
    # backend-touching call after the guard is jax.devices().
    monkeypatch.setattr(jax, "devices",
                        lambda *a: (_ for _ in ()).throw(
                            RuntimeError("stop-after-guard")))
    with pytest.raises(RuntimeError, match="stop-after-guard"):
        bench._main()
    assert ("jax_platforms", "cpu") in calls


def _fake_interpreter(tmp_path, body: str) -> str:
    """A stand-in for sys.executable so _probe_tpu never touches a real
    backend from inside the suite (a healthy chip would flip the result;
    a wedged one would eat 25 min of suite wall)."""
    p = tmp_path / "fake_python.sh"
    p.write_text("#!/bin/bash\n" + body + "\n")
    p.chmod(0o755)
    return str(p)


def test_probe_parses_healthy_cpu_and_tpu(bench, monkeypatch, tmp_path):
    monkeypatch.setattr(
        sys, "executable",
        _fake_interpreter(tmp_path, 'echo "PROBE_OK cpu 17.0"'))
    ok, detail = bench._probe_tpu(timeout_s=30.0)
    assert ok is False and "no TPU" in detail

    monkeypatch.setattr(
        sys, "executable",
        _fake_interpreter(tmp_path, 'echo "PROBE_OK tpu 17.0"'))
    ok, detail = bench._probe_tpu(timeout_s=30.0)
    assert ok is True and detail == "tpu healthy"


def test_probe_reports_wedged_backend_and_timeout(
        bench, monkeypatch, tmp_path):
    monkeypatch.setattr(
        sys, "executable",
        _fake_interpreter(
            tmp_path,
            'echo "RuntimeError: UNAVAILABLE: TPU backend setup/compile '
            'error" >&2; exit 1'))
    ok, detail = bench._probe_tpu(timeout_s=30.0)
    assert ok is False and "rc=1" in detail and "UNAVAILABLE" in detail

    monkeypatch.setattr(
        sys, "executable", _fake_interpreter(tmp_path, "sleep 30"))
    ok, detail = bench._probe_tpu(timeout_s=0.5)
    assert ok is False and "timed out" in detail


def test_retry_skips_backoff_on_timeout(bench, monkeypatch):
    """A wedged-backend timeout must NOT be retried (each attempt costs
    ~25 min of the driver's capture window); a fast failure gets exactly
    one retry."""
    attempts = []

    def probe_timeout(timeout_s):
        attempts.append(timeout_s)
        return False, "probe timed out after 1s (backend wedged?)"

    monkeypatch.setenv("MAS_BENCH_PROBE_BACKOFF", "0")
    monkeypatch.setattr(bench, "_probe_tpu", probe_timeout)
    ok, detail, _ = bench.probe_tpu_with_retry()
    assert ok is False and len(attempts) == 1

    attempts.clear()
    monkeypatch.setattr(
        bench, "_probe_tpu",
        lambda t: (attempts.append(t) or False, "probe rc=1: transient"))
    ok, detail, _ = bench.probe_tpu_with_retry()
    assert ok is False and len(attempts) == 2


def test_headline_prefers_transcript_exact_mode():
    """VERDICT r3 #3: the headline must be fast_lossless (or parity),
    never the measured-lossy fast mode. Source-level contract check —
    the mode ordering in bench.py's headline selection."""
    with open(os.path.join(REPO, "bench.py")) as f:
        src = f.read()
    i_lossless = src.index('("fast_lossless", lossless)')
    i_parity = src.index('("parity", parity)')
    i_fast = src.index('("fast", fast)')
    assert i_lossless < i_parity < i_fast
