"""Headline benchmark: ingest throughput (audio-seconds/sec/chip).

Measures the full dual-pipeline ingest hot path — log-mel -> whisper-base
ASR greedy decode (KV cache, 64 steps) -> whisper-tiny caption decode ->
MiniLM embed — over synthesized 16 kHz audio, plus fused-search p50 latency
over a 100k-segment index. Prints ONE JSON line.

Three configurations are measured every run:

  * fast_lossless — HEADLINE: only levers measured transcript-exact on
              BOTH drift oracles incl. the production geometry
              (auto-probed lossless transfer — fastest of the bit-exact
              int16/int16d on the live link; int12 was dropped from the
              auto set after the production-geometry oracle measured it
              0.922 agree-exact — fused kernels, full 30 s context, f32
              index).
  * parity  — the engine's defaults: 30 s mel context, bf16 KV cache,
              f32 device index (exact top-10 parity mode).
  * fast    — every opt-in perf mode incl. measured-LOSSY ones: 10 s
              short context (whisper.cpp audio_ctx trick, 0.698
              agree-exact) + mulaw8 transfer (0.500 agree-exact) + fused
              kernels + bf16 index. Extra only, never the headline.

The headline number is the best TRANSCRIPT-EXACT mode's ingest throughput
(fast_lossless, falling back to parity); the measured-lossy ``fast`` mode
(mulaw8 + short_context) is reported in extras only. All modes' full
stage timings live in extras, along with an in-run chip calibration
(bf16 matmul TFLOP/s, HBM GB/s) and per-stage MFU / HBM-bandwidth
fractions so results can be judged against roofline.

Timing discipline for the tunneled chip (docs/BENCHMARKS.md): every device
timing forces a 1-element host read and subtracts the measured RTT;
block_until_ready does not block on the axon platform.

Weights are random-init (no egress in this image) — identical FLOPs/shapes
to converted checkpoints; decode runs the full 64 steps since random models
never emit EOS, so throughput numbers are the worst case.
"""
import functools
import json
import os
import subprocess
import sys
import time

import numpy as np


def _probe_tpu(timeout_s: float) -> tuple:
    """Probe TPU backend health in a DISPOSABLE subprocess.

    The axon backend has a failure mode where init/compile hangs ~25 min
    and then fails (docs/BENCHMARKS.md, round-3 postmortem: BENCH_r03 was
    rc=1 because ``jax.devices()`` was called unguarded in the main
    process). The probe jits a NOVEL odd shape — previously-compiled
    programs still run while the remote compile service is wedged, so a
    cached-shape probe would report healthy on a wedged backend.

    On timeout the child is deliberately NOT killed: SIGKILLing a process
    mid-TPU-compile is itself what wedges the compile service for ~45 min.
    It is left orphaned to finish or fail on its own.

    Returns ``(tpu_ok, detail)``; ``tpu_ok`` is False both when the
    backend is broken and when the machine simply has no TPU (detail
    distinguishes the two).
    """
    code = (
        "import time, jax, jax.numpy as jnp\n"
        "n = 131 + (int(time.time()) % 97)\n"
        "d = jax.devices()[0]\n"
        "x = jnp.ones((n, n + 60))\n"
        "print('PROBE_OK', d.platform, float((x @ x.T).sum()), flush=True)\n"
    )
    try:
        proc = subprocess.Popen(
            [sys.executable, "-c", code], stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True, start_new_session=True)
        try:
            out, _ = proc.communicate(timeout=timeout_s)
        except subprocess.TimeoutExpired:
            return False, (f"probe timed out after {timeout_s:.0f}s "
                           "(backend wedged?); child left to finish")
        if proc.returncode == 0 and "PROBE_OK" in out:
            platform = out.rsplit("PROBE_OK", 1)[1].split()[0]
            if platform == "tpu":
                return True, "tpu healthy"
            return False, f"no TPU present (backend={platform})"
        return False, f"probe rc={proc.returncode}: {out[-400:]}"
    except Exception as e:  # noqa: BLE001
        return False, f"probe launch failed: {type(e).__name__}: {e}"


def probe_tpu_with_retry() -> tuple:
    """Bounded-backoff TPU probe (VERDICT r3 #2).

    A fast failure (backend raises quickly) gets one retry after a short
    sleep — transient tunnel errors recover in seconds. A TIMEOUT is not
    retried: each attempt against a wedged backend eats ~25 min of wall
    and the driver's capture window, and a second one cannot succeed.
    """
    timeout_s = float(os.environ.get("MAS_BENCH_PROBE_TIMEOUT", "900"))
    t0 = time.perf_counter()
    ok, detail = _probe_tpu(timeout_s)
    if not ok and "timed out" not in detail and "no TPU" not in detail:
        time.sleep(float(os.environ.get("MAS_BENCH_PROBE_BACKOFF", "45")))
        ok, detail = _probe_tpu(timeout_s)
    return ok, detail, round(time.perf_counter() - t0, 1)


def _sync_time(fn, *args, reps: int = 5, best: bool = False) -> float:
    """Wall-time of fn(*args), forcing a 1-element device read.

    ``best=False`` -> median (honest stage timing). ``best=True`` -> min,
    for chip-peak calibration: host scheduling and tunnel drift only ever
    ADD time, so the minimum is the unbiased estimator of device capability
    (a loaded host once read 105 'TFLOP/s' on a 188-measured chip via the
    median)."""
    import jax
    out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])  # compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        ts.append(time.perf_counter() - t0)
    return float(min(ts) if best else np.median(ts))


def _rtt_floor(reps: int = 10) -> float:
    """MIN of tiny-op round trips: subtracting the floor (not the median)
    keeps calibration conservative when the tunnel latency drifts — a
    high-side RTT estimate once produced 334 'TFLOP/s' on a 197-peak
    chip."""
    import jax
    import jax.numpy as jnp
    f = jax.jit(lambda x: x + 1)
    z = jnp.zeros(())
    _ = np.asarray(f(z))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = np.asarray(f(z))
        ts.append(time.perf_counter() - t0)
    return float(min(ts))


def _stage_time(fn, x, reps: int, rtt: float, *extra) -> float:
    """Per-call device time of ``fn(x, *extra)`` via an in-jit fori_loop
    of ``reps`` dependent calls — the only way to time stages shorter
    than the tunnel's ±10 ms RTT jitter (docs/BENCHMARKS.md). The input
    is nudged by the loop carry so XLA cannot hoist the call. Pass big
    arrays through ``extra`` rather than closing over them: closed-over
    arrays bake into the jit as HLO literals, and past ~100-300 MB the
    remote compile service rejects the request (HTTP 413)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x, *extra):
        def body(i, acc):
            y = fn(x * (1 + acc * 1e-30).astype(x.dtype), *extra)
            return jnp.float32(jax.tree_util.tree_leaves(y)[0]
                               .ravel()[0].astype(jnp.float32)) * 1e-30
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

    return max(_sync_time(run, x, *extra) - rtt, 1e-6) / reps


def calibrate(on_tpu: bool) -> dict:
    """Measured chip peaks: bf16 matmul TFLOP/s and HBM read GB/s."""
    import jax
    import jax.numpy as jnp
    n = 8192 if on_tpu else 1024
    reps = 8 if on_tpu else 2
    a = jnp.ones((n, n), jnp.bfloat16)

    @jax.jit
    def mm(a):
        def body(i, x):
            return jnp.dot(a, x, preferred_element_type=jnp.bfloat16)
        return jax.lax.fori_loop(0, reps, body, a)

    rtt = _rtt_floor()
    t = _sync_time(mm, a, best=True) - rtt
    tflops = reps * 2 * n**3 / t / 1e12

    # HBM read rate. XLA reductions top out ~450 GB/s on this chip and
    # elementwise temps under-report further (round-2 lesson), so the TPU
    # calibration is a double-buffered Pallas streaming read — 8 passes
    # over a 4 GB slab (32 GB of traffic) to stand clear of the ~±5 ms
    # tunnel RTT jitter. Measures 812 GB/s on v5e (spec: 819).
    if on_tpu:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        rows, cols, n_chunk, passes = 4096, 512, 1024, 8

        def kern(x_ref, o_ref):
            @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
            def _():
                o_ref[:] = jnp.zeros_like(o_ref)
            o_ref[:] += jnp.sum(x_ref[:], axis=0, keepdims=True)[:, :128]

        @jax.jit
        def rd(x):
            return pl.pallas_call(
                kern,
                grid=(passes, n_chunk),
                in_specs=[pl.BlockSpec((rows, cols), lambda j, i: (i, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, 128), lambda j, i: (0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
            )(x)

        big = jnp.ones((rows * n_chunk, cols), jnp.bfloat16)   # 4 GB
        t = _sync_time(rd, big, best=True) - rtt
        gbps = rows * cols * n_chunk * passes * 2 / t / 1e9
        del big
    else:
        big = jnp.ones((8 * 1024 * 1024,), jnp.bfloat16)
        t = max(_sync_time(jax.jit(jnp.max), big) - rtt, 1e-6)
        gbps = big.size * 2 / t / 1e9

    # Host->device transfer rate (the tunnel is ~16-45 MB/s run-to-run on
    # this rig and is the ingest bottleneck; recording it makes a
    # congested run diagnosable from the JSON alone).
    xfer = np.ones(20 * 1024 * 1024 if on_tpu else 1024 * 1024, np.int8)
    _ = np.asarray(jax.device_put(xfer[:1024])[:1])       # warm path
    t0 = time.perf_counter()
    _ = np.asarray(jax.device_put(xfer)[:1])
    xfer_mbps = xfer.nbytes / 1e6 / (time.perf_counter() - t0)
    # floors: on a saturated CPU host the min-of-reps timing can land at
    # or below the measured RTT, making t <= 0 and the "peak" 0/negative
    # — which then zero-divides every roofline fraction downstream. Real
    # chips calibrate orders of magnitude above these floors.
    return {"rtt_ms": round(rtt * 1e3, 1),
            "tflops_bf16": max(round(tflops, 1), 0.1),
            "hbm_gbps": max(round(gbps, 1), 0.1),
            "tunnel_mbps": max(round(xfer_mbps, 1), 0.1)}


def measure_mode(name: str, *, on_tpu: bool, short_context: bool,
                 int8_kv: bool, fused_layer: bool, index_dtype,
                 transfer_dtype: str = "int16",
                 fused_encoder: bool | str | None = None,
                 audio_seconds: float,
                 batch: int, max_new: int, n_index: int, n_queries: int,
                 asr_preset: str, cap_preset: str, cal: dict) -> dict:
    import jax
    import jax.numpy as jnp
    from multimodal_audio_search_tpu.config import (
        DecodeConfig, EngineConfig, MelConfig)
    from multimodal_audio_search_tpu.index.fusion import fused_topk_impl
    from multimodal_audio_search_tpu.models import whisper as W
    from multimodal_audio_search_tpu.models import minilm
    from multimodal_audio_search_tpu.models.generate import generate
    from multimodal_audio_search_tpu.models.minilm import MiniLMConfig
    from multimodal_audio_search_tpu.ops.mel import log_mel_spectrogram
    from multimodal_audio_search_tpu.pipelines.embed import TextEmbedder
    from multimodal_audio_search_tpu.pipelines.ingest import (
        DualPipelineIngest)
    from multimodal_audio_search_tpu.pipelines.whisper_pipeline import (
        WhisperTextPipeline)
    from multimodal_audio_search_tpu.utils import roofline

    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    # None = the engine's auto default (round-5 parity promotion,
    # config.py::DecodeConfig.fused_encoder): fused bf16 block kernels
    # on the real chip, einsum elsewhere. Resolved HERE so the
    # stage-timing enc_fn below measures exactly what the pipeline runs.
    if fused_encoder is None:
        fused_encoder = on_tpu
    mel_cfg = MelConfig(padded_seconds=10.0) if short_context \
        else MelConfig()
    decode = DecodeConfig(method="greedy", max_new_tokens=max_new,
                          int8_cross_kv=int8_kv, fused_layer=fused_layer,
                          fused_encoder=fused_encoder)
    cfg = EngineConfig(ingest_batch=batch, asr_decode=decode,
                       caption_decode=decode,
                       transfer_dtype=transfer_dtype)
    asr_cfg = W.PRESETS[asr_preset]
    cap_cfg = W.PRESETS[cap_preset]
    asr = WhisperTextPipeline(cfg=asr_cfg, decode=decode, mel_cfg=mel_cfg,
                              dtype=dtype, seed=0, name="asr")
    cap = WhisperTextPipeline(
        cfg=cap_cfg, decode=decode, mel_cfg=mel_cfg, dtype=dtype, seed=1,
        name="caption", prefix_ids=[cap_cfg.bos_token_id])
    emb = TextEmbedder(cfg=MiniLMConfig(), dtype=dtype)
    ingest = DualPipelineIngest(asr, cap, emb, cfg)

    rng = np.random.default_rng(0)
    sr = 16_000
    wave = (rng.normal(size=int(sr * audio_seconds)) * 0.3) \
        .astype(np.float32)

    # warm-up compiles all programs on one batch-sized slice
    warm = wave[: int(sr * 10 * batch)]
    ingest.process_waveform(warm, sr, "warmup")
    # median of 3 timed runs: the tunnel's host->device bandwidth swings
    # 16-45 MB/s between runs and ingest is transfer-bound on this rig,
    # so a single-shot wall time conflates device perf with link weather
    runs, traces = [], []
    for r in range(3 if on_tpu else 1):
        t0 = time.perf_counter()
        segments = ingest.process_waveform(wave, sr, f"bench{r}")
        runs.append(time.perf_counter() - t0)
        traces.append(dict(ingest.last_trace))
    ingest_s = float(np.median(runs))
    # host-phase attribution of the MEDIAN run (round-2 verdict: half the
    # wall was unattributed). "wait" = future drain (device compute +
    # transfer not hidden behind host work); everything else is host time.
    trace = traces[int(np.argsort(runs)[len(runs) // 2])]
    host_ms = {k: round(v * 1e3, 1) for k, v in trace.items()}
    host_ms["attributed_pct"] = round(
        100.0 * sum(v for k, v in trace.items() if k != "wall")
        / max(trace.get("wall", 1e-9), 1e-9), 1)
    throughput = audio_seconds / ingest_s
    seg_len = min(int(cfg.segment.segment_seconds * sr), mel_cfg.n_samples)
    # "auto" probes the lossless candidates on the live link and locks
    # one (pipelines/ingest.py); byte accounting uses the resolved mode
    transfer_resolved = getattr(ingest, "last_transfer_resolved",
                                transfer_dtype)
    if transfer_resolved in ("mel16", "mel12", "mel8"):
        # host-computed log-mel codes: n_mels x segment frames x 2 B
        # (mel16) / packed 1.5 B (mel12) / 1 B (mel8); the relative
        # modes add a 4-byte f32 gmax tail per segment
        from multimodal_audio_search_tpu.ops.mel import mel_seg_frames
        per_code = {"mel16": 2.0, "mel12": 1.5, "mel8": 1.0}
        tail = 0.0 if transfer_resolved == "mel16" else 4.0
        itemsize = ((mel_cfg.n_mels * mel_seg_frames(seg_len, mel_cfg)
                     * per_code[transfer_resolved] + tail) / seg_len)
    else:
        itemsize = {"mulaw8": 1, "int12": 1.5, "int16": 2, "int16d": 2,
                    "float32": 4}[transfer_resolved]
    transfer_mb = len(segments) * seg_len * itemsize / 1e6

    # ---- device-side stage timings (whisper-base ASR path, batch rows).
    # Stages shorter than the RTT jitter are timed by in-jit repetition.
    rtt = cal["rtt_ms"] / 1e3
    n_samples = mel_cfg.n_samples
    waves_d = jax.device_put(jnp.asarray(
        rng.normal(size=(batch, n_samples)) * 0.3, jnp.float32))
    mel_fn = jax.jit(lambda w: log_mel_spectrogram(w, mel_cfg))
    mel_t = _stage_time(mel_fn, waves_d, 32 if on_tpu else 2, rtt)
    mel_d = mel_fn(waves_d).astype(dtype)
    enc_fn = jax.jit(lambda m: W.encode(asr.params, m, asr_cfg,
                                        fused_blocks=fused_encoder))
    enc_t = _stage_time(enc_fn, mel_d, 8 if on_tpu else 1, rtt)
    enc_d = enc_fn(mel_d)
    prefix = jnp.tile(jnp.asarray(W.forced_prefix(asr_cfg), jnp.int32),
                      (batch, 1))
    plen = prefix.shape[1]

    def gen_fn(e):
        out = generate(asr.params, e, prefix, cfg=asr_cfg, decode=decode,
                       prefix_len=plen, max_new_tokens=max_new)
        return out.tokens
    dec_t = _stage_time(gen_fn, enc_d, 4 if on_tpu else 1, rtt)

    t_enc = enc_d.shape[1]
    mel_frames = mel_d.shape[-1]
    enc_flops = roofline.encoder_flops(asr_cfg, batch, mel_frames)
    step_bytes = roofline.decode_step_hbm_bytes(
        asr_cfg, batch, t_enc, plen + max_new,
        kv_bytes=1 if int8_kv else 2)
    step_flops = roofline.decode_step_flops(
        asr_cfg, batch, t_enc, plen + max_new)

    # ---- fused search over an n_index-segment index -------------------
    emb_idx = rng.normal(size=(n_index, 2, 384)).astype(np.float32)
    emb_idx /= np.linalg.norm(emb_idx, axis=-1, keepdims=True)
    ok = rng.random((n_index, 2)) > 0.2
    emb_d = jax.device_put(jnp.asarray(emb_idx, index_dtype))
    ok_d = jax.device_put(ok)

    @functools.partial(jax.jit, static_argnames=("k", "threshold"))
    def query_program(params, ids, mask, index_emb, success, w_a, w_b,
                      *, k, threshold):
        qv = minilm.sentence_embed(params, ids, mask, emb.cfg)[0]
        return fused_topk_impl(qv, index_emb, success, w_a, w_b,
                               k=k, threshold=threshold)

    lat = []
    for i in range(n_queries):
        t0 = time.perf_counter()
        ids, mask = emb.tokenizer.encode(
            [f"query about music and drums number {i}"], emb.max_tokens)
        out = query_program(
            emb.params, jnp.asarray(ids), jnp.asarray(mask), emb_d, ok_d,
            jnp.float32(0.6), jnp.float32(0.4), k=10, threshold=0.1)
        _ = np.asarray(out["scores"])
        lat.append(time.perf_counter() - t0)
    p50_ms = float(np.percentile(lat[1:] or lat, 50) * 1e3)
    idx_bytes = roofline.search_hbm_bytes(
        n_index, 384, np.dtype(index_dtype).itemsize)
    query_dev_s = max(p50_ms / 1e3 - rtt, 1e-5)

    # Tunnel-normalized throughput: ingest on this rig is bound by a
    # host->device tunnel whose bandwidth swings 16-45 MB/s BETWEEN
    # ROUNDS, so raw audio-sec/sec is partly link weather. This extra
    # removes the measured transfer term (wall - bytes/measured_MBps),
    # i.e. the throughput the same run would post if transfer were free
    # — comparable across rounds and an upper bound for a PCIe host.
    tunnel_bps = max(cal.get("tunnel_mbps", 0.0), 1e-3) * 1e6
    ex_transfer_s = max(ingest_s - transfer_mb * 1e6 / tunnel_bps,
                        1e-3)
    return {
        "ingest_audio_sec_per_sec": round(throughput, 2),
        "ingest_audio_sec_per_sec_ex_transfer": round(
            audio_seconds / ex_transfer_s, 2),
        "ingest_wall_s": round(ingest_s, 2),
        "ingest_runs_s": [round(r, 2) for r in runs],
        "transfer_mb": round(transfer_mb, 1),
        "segments": len(segments),
        "query_p50_ms": round(p50_ms, 2),
        # minus the measured tunnel RTT: the cross-round-comparable
        # device+host cost (the RTT term swings 28-40 ms with tunnel
        # weather and vanishes on a PCIe host)
        "query_p50_ms_ex_rtt": round(max(p50_ms - cal["rtt_ms"], 0.0), 2),
        "index_dtype": np.dtype(index_dtype).name,
        "short_context": short_context,
        "int8_cross_kv": int8_kv,
        "fused_layer": fused_layer,
        "transfer_dtype": transfer_dtype,
        "transfer_resolved": transfer_resolved,
        "host_ms": host_ms,
        "stage_ms": {
            "mel": round(mel_t * 1e3, 2),
            "encode": round(enc_t * 1e3, 2),
            "decode_total": round(dec_t * 1e3, 2),
            "decode_per_step": round(dec_t / max_new * 1e3, 3),
        },
        "roofline": {
            "encode_mfu": round(
                enc_flops / enc_t / (cal["tflops_bf16"] * 1e12), 3),
            "decode_hbm_frac": round(
                step_bytes / (dec_t / max_new) / (cal["hbm_gbps"] * 1e9),
                3),
            "decode_mfu": round(
                step_flops / (dec_t / max_new)
                / (cal["tflops_bf16"] * 1e12), 3),
            "search_hbm_frac": round(
                idx_bytes / query_dev_s / (cal["hbm_gbps"] * 1e9), 3),
        },
    }


def measure_ivf(n_index: int, n_queries: int, cal: dict) -> dict:
    """IVF (index/ivf.py) vs exact scan on a realistic TOPICAL index
    (text embeddings cluster by subject; uniform random vectors are the
    no-structure worst case for any ANN and say nothing about the
    production regime). Reports build time, p50s, and top-10 overlap at
    n_probe=8. Guarded — a failure must never sink the headline bench."""
    import jax
    import jax.numpy as jnp
    from multimodal_audio_search_tpu.index.fusion import fused_topk
    from multimodal_audio_search_tpu.index.ivf import build_ivf
    try:
        rng = np.random.default_rng(7)
        d = 384
        topics = max(64, n_index // 2000)
        cent = rng.normal(size=(topics, d)).astype(np.float32)
        cent /= np.linalg.norm(cent, axis=-1, keepdims=True)
        t_row = rng.integers(0, topics, size=n_index)
        emb = (cent[t_row][:, None, :] + (0.35 / np.sqrt(d)) * rng.normal(
            size=(n_index, 2, d))).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
        ok = rng.random((n_index, 2)) > 0.2
        emb[~ok] = 0.0
        qv = (cent[rng.integers(0, topics, size=n_queries)]
              + (0.5 / np.sqrt(d)) * rng.normal(
                  size=(n_queries, d))).astype(np.float32)
        qv /= np.linalg.norm(qv, axis=-1, keepdims=True)
        emb_d = jax.device_put(jnp.asarray(emb))
        ok_d = jax.device_put(ok)
        wa, wb = jnp.float32(0.6), jnp.float32(0.4)

        t0 = time.perf_counter()
        ivf = build_ivf(emb, ok)
        build_s = time.perf_counter() - t0
        run = ivf.search_fn(k=10, n_probe=8)
        lat_e, lat_a, overlaps = [], [], []
        for i in range(n_queries):
            q_d = jnp.asarray(qv[i])
            t0 = time.perf_counter()
            out_e = fused_topk(q_d, emb_d, ok_d, wa, wb, k=10)
            se = np.asarray(out_e["scores"])
            lat_e.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            out_a = run(q_d, wa, wb, emb_d, ok_d)
            sa = np.asarray(out_a["scores"])
            lat_a.append(time.perf_counter() - t0)
            ee = set(np.asarray(out_e["indices"])[se > -1e29].tolist())
            aa = set(np.asarray(out_a["indices"])[sa > -1e29].tolist())
            overlaps.append(len(aa & ee) / max(len(ee), 1))
        rtt = cal["rtt_ms"]
        p50e = float(np.percentile(lat_e[1:] or lat_e, 50) * 1e3)
        p50a = float(np.percentile(lat_a[1:] or lat_a, 50) * 1e3)
        return {
            "n": n_index, "n_clusters": ivf.n_clusters,
            "spill": int(ivf.spill.shape[0]),
            "build_s": round(build_s, 1),
            "exact_p50_ms_ex_rtt": round(max(p50e - rtt, 0.0), 2),
            "ivf_p50_ms_ex_rtt": round(max(p50a - rtt, 0.0), 2),
            "overlap10_vs_exact": round(float(np.mean(overlaps)), 3),
            "n_probe": 8,
        }
    except Exception as e:  # noqa: BLE001
        return {"error": str(e)[:200]}


def _main() -> None:
    # opt-in persistent compilation cache (MAS_COMPILE_CACHE=<dir>);
    # default off so the driver's recorded run keeps stock behavior
    from multimodal_audio_search_tpu.utils.compile_cache import (
        enable_from_env)
    enable_from_env()
    # Backend guard (VERDICT r3 #2): never let a wedged axon tunnel turn
    # the round's one driver capture into a stack trace. Probe in a
    # disposable subprocess; on failure force CPU in THIS process (the
    # axon plugin ignores JAX_PLATFORMS, so jax.config is the only lever
    # that works — must run before first backend use).
    import jax
    if os.environ.get("MAS_BENCH_FORCE_CPU") == "1":
        tpu_probe = {"ok": False, "detail": "MAS_BENCH_FORCE_CPU=1",
                     "probe_s": 0.0}
    else:
        ok, detail, probe_s = probe_tpu_with_retry()
        tpu_probe = {"ok": ok, "detail": detail, "probe_s": probe_s}
    if not tpu_probe["ok"]:
        jax.config.update("jax_platforms", "cpu")
    platform = jax.devices()[0].platform
    on_tpu = platform == "tpu"

    import jax.numpy as jnp
    if on_tpu:
        audio_seconds, batch, max_new = 1280.0, 64, 64
        n_index, n_queries = 100_000, 30
        asr_preset, cap_preset = "base", "tiny"
    else:                               # CPU smoke mode (local verification)
        audio_seconds, batch, max_new = 40.0, 4, 8
        n_index, n_queries = 4_096, 5
        asr_preset, cap_preset = "tiny", "tiny"

    cal = calibrate(on_tpu)
    common = dict(on_tpu=on_tpu, audio_seconds=audio_seconds, batch=batch,
                  max_new=max_new, n_index=n_index, n_queries=n_queries,
                  asr_preset=asr_preset, cap_preset=cap_preset, cal=cal)

    def guarded(name, **kw):
        # one mode's failure (e.g. a fresh Mosaic compile rejecting a
        # kernel variant) must degrade THAT mode, never the whole bench
        # line the driver records
        try:
            return measure_mode(name, **kw)
        except Exception as e:  # noqa: BLE001
            return {"error": f"{type(e).__name__}: {e}"[:300]}

    # fast_lossless = only the levers measured TRANSCRIPT-EXACT on BOTH
    # self-trained oracles — toy AND production geometry
    # (docs/BENCHMARKS.md drift tables): auto-probed BIT-EXACT transfer
    # (fastest of int16/int16d on the live link — round 4 measured the
    # per-mode tunnel rates flipping between sessions with payload
    # compressibility; int12 was dropped from the auto set after the
    # production-geometry oracle measured it 0.922 agree-exact) + fused
    # decode/encode kernels, full 30 s context, f32 index — the
    # recommended production configuration and the HEADLINE
    # (VERDICT r3 #3: the headline must not ride measured-lossy levers).
    # Measured FIRST so the headline number exists even if a later
    # mode's fresh compile fails.
    lossless = guarded("fast_lossless", short_context=False,
                       int8_kv=False, fused_layer=on_tpu,
                       transfer_dtype="auto", fused_encoder=on_tpu,
                       index_dtype=jnp.float32, **common)
    # mel16 variant of fast_lossless: host-computed log-mel transfer
    # (half the tunnel bytes of int16 AND no device STFT; roundtrip
    # error 3e-5 — an order below the device's own f32 mel deviation).
    # The production-geometry oracle CONFIRMED the whole mel family
    # transcript-exact (1.0, docs/onchip_r4/drift_prod_s4.out); it stays
    # an extra rather than an auto candidate because its host encode is
    # the bottleneck on this 1-core rig (docs/BENCHMARKS.md "Transfer-
    # mode economics") — on a multi-core host it is the headline
    # candidate.
    lossless_mel16 = guarded("fast_lossless_mel16", short_context=False,
                             int8_kv=False, fused_layer=on_tpu,
                             transfer_dtype="mel16", fused_encoder=on_tpu,
                             index_dtype=jnp.float32, **common)
    # mel12: the same host log-mel packed to 12-bit codes (3/8 of
    # int16's tunnel bytes); transcript-exact on both oracles too
    lossless_mel12 = guarded("fast_lossless_mel12", short_context=False,
                             int8_kv=False, fused_layer=on_tpu,
                             transfer_dtype="mel12", fused_encoder=on_tpu,
                             index_dtype=jnp.float32, **common)
    # NOTE on the int8-dot encoder (fused_encoder="int8"): it is
    # transcript-exact at decision strength (drift_s5_b.json) but was
    # measured speed-NEUTRAL at the parity context by the round-5
    # in-jit re-measurement (docs/onchip_r5/int8_e2e.out: kernel 8.41
    # vs bf16 8.56 ms; e2e encode 87.0 vs 86.1 — the round-4
    # wall-minus-RTT "2x kernel win" was a timing artifact), so it has
    # no bench row: one recorded A/B lives in docs/onchip_r5/
    # int8enc_ab.out and the variant stays a config-selectable lever.
    # parity mode = engine defaults (exact reference-parity search
    # results). Round 5: this now rides the fused bf16 encoder kernel
    # on chip — promoted to the default after the decision-strength
    # production-geometry oracle measured it transcript-exact
    # (agree_exact 1.000 at truth_exact 0.948, docs/onchip_r5/
    # drift_s5_c.json).
    parity = guarded("parity", short_context=False, int8_kv=False,
                     fused_layer=False, index_dtype=jnp.float32,
                     **common)
    # fast mode = every opt-in perf lever, including the measured-LOSSY
    # ones (mulaw8 transfer: 0.594 agree-exact on the synth oracle;
    # short_context 0.594 — docs/synth_drift_2400.json). Reported as an
    # extra only; never the headline.
    fast = guarded("fast", short_context=True, int8_kv=False,
                   fused_layer=on_tpu, transfer_dtype="mulaw8",
                   fused_encoder=on_tpu,
                   index_dtype=jnp.bfloat16 if on_tpu
                   else jnp.float32, **common)
    # fast_mel8: mulaw8 swapped for mel8 relative-window codes — HALF
    # the tunnel bytes AND transcript-exact on BOTH oracles where
    # mulaw8 drifts (confirmed at decision strength in round 5: mel8
    # agree_exact 1.000 vs mulaw8 0.573, docs/onchip_r5/
    # drift_s5_d.json); the mode still carries short_context's measured
    # cost (0.792 agree-exact at production geometry), which is why it
    # stays an extra rather than the headline.
    fast_mel8 = guarded("fast_mel8", short_context=True, int8_kv=False,
                        fused_layer=on_tpu, transfer_dtype="mel8",
                        fused_encoder=on_tpu,
                        index_dtype=jnp.bfloat16 if on_tpu
                        else jnp.float32, **common)

    ivf = measure_ivf(n_index, n_queries, cal)

    baseline = 60.0  # audio-sec/sec/chip target (BASELINE.md)
    headline_mode, throughput = next(
        ((nm, m["ingest_audio_sec_per_sec"]) for nm, m in
         (("fast_lossless", lossless), ("parity", parity), ("fast", fast))
         if "ingest_audio_sec_per_sec" in m), ("none", 0.0))
    print(json.dumps({
        "metric": "ingest_audio_seconds_per_sec_per_chip",
        "value": throughput,
        "unit": "audio-sec/sec/chip",
        "vs_baseline": round(throughput / baseline, 3),
        "extras": {
            "platform": platform,
            "headline_mode": headline_mode,
            "tpu_probe": tpu_probe,
            "decode_steps": max_new,
            "batch": batch,
            "calibration": cal,
            "parity": parity,
            "fast": fast,
            "fast_lossless": lossless,
            "fast_lossless_mel16": lossless_mel16,
            "fast_lossless_mel12": lossless_mel12,
            "fast_mel8": fast_mel8,
            "ivf": ivf,
        },
    }))


def main() -> None:
    """Entry point that can never lose the driver's capture: whatever
    happens inside — a wedged backend, a Mosaic crash during calibration,
    an OOM — exactly one parseable JSON line is printed and the process
    exits 0 (VERDICT r3 #2; BENCH_r03 was rc=1 with no JSON)."""
    try:
        _main()
        # hard-exit after the JSON line is out: the axon backend's
        # client teardown can hang indefinitely post-measurement (seen
        # round 5: bench printed at 22:42, the process was still alive
        # in wait_woken 15+ min later, holding the chip and starving
        # every other client) — the driver's capture needs the process
        # to EXIT, and nothing after this point produces value
        sys.stdout.flush()
        os._exit(0)
    except BaseException as e:  # noqa: BLE001 — last-resort capture guard
        if isinstance(e, KeyboardInterrupt):
            raise
        print(json.dumps({
            "metric": "ingest_audio_seconds_per_sec_per_chip",
            "value": 0.0,
            "unit": "audio-sec/sec/chip",
            "vs_baseline": 0.0,
            "extras": {"platform": "unavailable",
                       "error": f"{type(e).__name__}: {e}"[:500]},
        }))
        sys.stdout.flush()
        os._exit(0)


if __name__ == "__main__":
    main()
