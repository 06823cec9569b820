"""Dual-pipeline ingest assembly (the reference's hot path, batched).

Behavioral contract (audio_search.py:223-307): decode/resample -> peak-
conditional normalization -> 10 s windows (drop < 3 s) -> per segment run ASR
and captioning -> validate texts -> embed valid texts -> keep the segment iff
at least one pipeline produced text. The reference runs one segment at a
time; here the whole file's segments run as fixed-shape batches through two
jitted XLA programs, and all surviving texts embed in one MiniLM batch.
"""
from __future__ import annotations

import itertools
import time
from typing import Any

import numpy as np

from ..audio.decode import load_audio
from ..audio.segment import pad_segment_batch
from ..config import EngineConfig
from ..service.stats import StatsRegistry
from .embed import TextEmbedder
from .validators import validate_asr_text, validate_audio_description
from .whisper_pipeline import WhisperTextPipeline

_MULAW_LUT: np.ndarray | None = None


def _mulaw_lut() -> np.ndarray:
    """int16-grid -> 8-bit mu-law code table (mu=255). Index i encodes the
    waveform value (i - 32767.5) / 32767.5; the table is the definition of
    the transfer encoding (the device-side expansion in _mel16 inverts
    it), quantized identically to the closed form to within the int16
    grid's resolution."""
    global _MULAW_LUT
    if _MULAW_LUT is None:
        x = (np.arange(65536, dtype=np.float64) - 32767.5) / 32767.5
        y = np.sign(x) * np.log1p(255.0 * np.abs(x)) / np.log(256.0)
        _MULAW_LUT = np.round(y * 127.0).astype(np.int8)
    return _MULAW_LUT


def _pack_int12(wn: np.ndarray) -> np.ndarray:
    """Closed-form int12 packed transfer encode of one f32 window: round
    onto the signed 12-bit grid, store two's-complement codes two-per-3-
    bytes (little-endian nibbles; the numpy fallback for the fused C
    kernel mas_quantize_int12, bit-identical — see
    native/audio_kernels.cc). All-zero bytes decode to silence, so batch
    row padding needs no special casing; an odd tail pairs with an
    implicit zero sample."""
    t = np.clip(np.rint(np.nan_to_num(wn) * np.float32(2047.0)),
                -2048.0, 2047.0)
    q = t.astype(np.int32) & 0xFFF
    if len(q) % 2:
        q = np.concatenate([q, np.zeros(1, np.int32)])
    q = q.reshape(-1, 2)
    out = np.empty((len(q), 3), np.uint8)
    out[:, 0] = q[:, 0] & 0xFF
    out[:, 1] = (q[:, 0] >> 8) | ((q[:, 1] & 0xF) << 4)
    out[:, 2] = q[:, 1] >> 4
    return out.reshape(-1)


class DualPipelineIngest:
    def __init__(
        self,
        asr: WhisperTextPipeline,
        caption: WhisperTextPipeline,
        embedder: TextEmbedder,
        cfg: EngineConfig | None = None,
        stats: StatsRegistry | None = None,
    ):
        self.asr = asr
        self.caption = caption
        self.embedder = embedder
        self.cfg = cfg or EngineConfig()
        self.stats = stats
        # monotonic across every file this pipeline ingests, so segment ids
        # never collide within one store (the reference restarted numbering
        # per upload, audio_search.py:277 — ids there collided across files)
        self._seg_counter = itertools.count()
        self.mesh = None
        self._batch_sharding = None

    def use_mesh(self, mesh) -> None:
        """Run production ingest over a device mesh: segment batches shard
        over 'data' (the DP equivalent of the reference's single-device
        per-segment loop, audio_search.py:89,268-271), params placed by
        the TP rules over 'model'. Applies to both extractors and the
        embedder; search gets the same mesh via FusionSearcher(mesh=...)."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        self.mesh = mesh
        self._batch_sharding = NamedSharding(mesh, P("data"))
        self.asr.use_mesh(mesh)
        self.caption.use_mesh(mesh)
        self.embedder.use_mesh(mesh)

    # LOSSLESS transfer encodings "auto" may pick between: only the
    # modes whose device-side samples are BIT-IDENTICAL to the host f32
    # quantize (int16 raw, int16d delta-coded — one cumsum undoes it).
    # int12 was REMOVED from the auto set in round 5: the
    # production-geometry drift oracle measured it NOT transcript-exact
    # (agree_exact 0.922 at 10 s clips / 30 s context,
    # docs/onchip_r4/drift_prod_s4.out; CONFIRMED at decision strength —
    # 0.990 at truth_exact 0.948, docs/onchip_r5/drift_s5_a.json) — its
    # earlier "transcript-exact" standing came from the toy 2 s geometry
    # only. It remains an explicit opt-in (transfer_dtype="int12") with
    # its measured bound documented in docs/BENCHMARKS.md.
    AUTO_TRANSFER_CANDIDATES = ("int16", "int16d")

    # re-probe cadence: after this many MB shipped, the next batch
    # re-measures the candidates ("session weather": the tunnel's
    # per-mode effective rate swung 2.5x between back-to-back runs and
    # FLIPPED ordering between rounds 3 and 4 — a one-shot probe locked
    # a stale choice for the pipeline lifetime, round-4 verdict item 4)
    AUTO_REPROBE_MB = 256.0

    # per-put probe payload cap (round-5 self-review): uncapped, a probe
    # at production seg_len (160k samples) shipped 32 waves x 320 KB x
    # 8 puts = 82 MB per probe event — 24% of the 256 MB cadence spent
    # re-measuring. 2 MB/put keeps each timed put ~45-110 ms on the
    # 18-45 MB/s tunnel (>> the ±10 ms RTT jitter, so the median-of-3
    # decision stays clean) at 16 MB per probe event (~6% of cadence).
    AUTO_PROBE_PUT_BYTES = 2_000_000

    def _resolve_auto_transfer(self, encode_transfer, waves, seg_len) -> str:
        """Live probe for transfer_dtype="auto": encode + ship a slice of
        the current payload in each lossless candidate mode and pick the
        fastest; re-probe after AUTO_REPROBE_MB shipped. A static choice
        is wrong somewhere: the tunnel's effective rate per mode depends
        on payload compressibility and session weather (round 3 vs round
        4 measured opposite int16/int12 orderings on the same rig).

        Decision discipline (round-4 verdict: a 16-wave min-of-2 probe
        once picked a mode that measured 40% slower in the same-session
        sweep): 4 reps per mode, the cold first rep is DISCARDED
        (compile + first-touch), decision on the MEDIAN of the rest."""
        choice = getattr(self, "_auto_transfer_choice", None)
        if choice is not None and getattr(
                self, "_bytes_since_probe", 0.0) < \
                self.AUTO_REPROBE_MB * 1e6:
            return choice
        import jax
        cap = max(1, int(self.AUTO_PROBE_PUT_BYTES // (seg_len * 2)))
        sample = waves[: min(len(waves), cap, 32)]
        best, best_t = "int16", float("inf")
        probe = {}
        for mode in self.AUTO_TRANSFER_CANDIDATES:
            times = []
            for _ in range(4):
                t0 = time.perf_counter()
                q = encode_transfer(sample, len(sample), mode)
                # plain put (no mesh sharding): the probe measures the
                # host link rate, and an arbitrary sample count need not
                # divide the mesh's data axis
                x = jax.device_put(q)
                # force the transfer: on the tunneled backend
                # block_until_ready returns before the bytes land, so
                # read one element back to host (~1 RTT)
                np.asarray(x[:1, :1])
                times.append(time.perf_counter() - t0)
            t = float(np.median(times[1:]))
            probe[mode] = round(t, 4)
            if t < best_t:
                best, best_t = mode, t
        self._auto_transfer_choice = best
        self._bytes_since_probe = 0.0
        self.last_probe = probe
        if self.stats is not None:
            self.stats.log.log("transfer_auto_choice", best_t, mode=best)
        return best

    def process_file(
        self, src, source_name: str = "upload"
    ) -> list[dict[str, Any]]:
        wave, sr = load_audio(src, self.cfg.audio.sample_rate)
        return self.process_waveform(wave, sr, source_name)

    def process_waveform(
        self, wave: np.ndarray, sr: int, source_name: str = "waveform"
    ) -> list[dict[str, Any]]:
        """Returns reference-shaped segment records (audio_search.py:275-294).

        Records carry raw segment audio for playback parity; drop them via
        SegmentStore(keep_audio=False) if undesired.
        """
        cfg = self.cfg
        t_wall0 = time.perf_counter()
        # Host-phase attribution (round-2 verdict: ~half of fast-mode
        # ingest wall was invisible to the bench). Every phase of this
        # function is timed into last_trace so bench.py can print a
        # host_ms breakdown whose sum ~= wall; "wait" is the only phase
        # containing device time (future drain = transfer + compute that
        # did NOT overlap with host work).
        tr = {k: 0.0 for k in (
            "resample", "segment", "probe", "quantize", "put", "dispatch",
            "wait", "detok", "validate", "embed", "build")}
        self.last_trace = tr
        target_sr = self.asr.mel_cfg.sample_rate
        if sr != target_sr:
            # the mel frontend is calibrated for its configured rate; a raw
            # waveform at any other rate must be resampled first (parity
            # with the reference's librosa.load(sr=16000))
            from ..audio.resample import resample_best
            t0 = time.perf_counter()
            wave = resample_best(wave, sr, target_sr)
            sr = target_sr
            tr["resample"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        # Normalization is a FACTOR here, not a pass: the 80 MB
        # peak-normalize multiply was the biggest attributed host cost on
        # the 1-core rig (bench host_ms). Windows stay views of the raw
        # waveform; the factor folds into the transfer quantize and the
        # per-segment storage copies (bitwise-identical f32 results).
        from ..audio.segment import peak_scale, segment_windows
        # ascontiguousarray, not asarray: a strided f32 view (stereo
        # column, step-sliced array) would otherwise flow into the
        # native ctypes quantizers, which read .ctypes.data as
        # contiguous memory — silently quantizing the wrong samples
        wave = np.ascontiguousarray(wave, np.float32)
        scale = np.float32(peak_scale(wave, cfg.audio))
        wins = segment_windows(len(wave), sr, cfg.segment)
        waves = [wave[w.start_sample: w.start_sample + w.length]
                 for w in wins]
        tr["segment"] = time.perf_counter() - t0
        if not wins:
            return []
        n_samples = self.asr.mel_cfg.n_samples
        # Transfer + dispatch. Both models consume the same log-mel
        # features when their mel configs agree, so per batch we ship the
        # waveform ONCE — as int16 at the true segment length (6x fewer
        # bytes than padded f32; the host link is the bottleneck on tunneled
        # chips) — dequantize + zero-pad + mel on device, then dispatch both
        # decoders asynchronously. NOTE: on the axon tunnel, batch k+1's
        # put does NOT overlap batch k's compute — the runtime serializes
        # H2D with compute, and threading the puts measures 1.7x WORSE
        # (docs/onchip_r5/overlap.out; BENCHMARKS "Round-5 overlap probe").
        # The interleaved order is kept because it is the best measured
        # arrangement, not because it pipelines; byte reduction (int16d /
        # mel codecs) is the only effective transfer lever.
        import jax
        import jax.numpy as jnp
        from ..utils.batching import bucket_pow2 as _bucket

        shared_mel = (self.asr.mel_cfg == self.caption.mel_cfg)
        seg_len = min(int(cfg.segment.segment_seconds * sr), n_samples)
        transfer = getattr(cfg, "transfer_dtype", "int16")

        from ..audio import native as _native
        have_native = _native.available()

        def encode_transfer(chunk, b, mode):
            # every branch first applies the deferred normalization scale
            # (w * scale in f32 == slicing the normalized waveform); the
            # native path fuses scale+quantize+LUT into ONE pass with no
            # temporaries (native/audio_kernels.cc, bit-identical — the
            # numpy closed form below needed five passes and was the
            # largest quantize cost on the 1-core ingest host)
            if mode in ("mel16", "mel12", "mel8"):
                # host-side HF-f64-exact log-mel, quantized to 16-bit
                # absolute / packed 12-bit relative / 8-bit relative
                # codes (ops/mel.py): 1.5-4x fewer tunnel bytes than
                # int12 and the device skips its STFT entirely. Deferred
                # norm scale applies to the waveform before the
                # transform.
                from ..ops.mel import (encode_mel8, encode_mel12,
                                       encode_mel16, mel_seg_frames)
                t_seg = mel_seg_frames(seg_len, self.asr.mel_cfg)
                w = np.zeros((b, seg_len), np.float32)
                for i, src in enumerate(chunk):
                    m = min(len(src), seg_len)
                    w[i, :m] = np.nan_to_num(
                        src[:m] * scale if scale != 1.0 else src[:m])
                enc = {"mel16": encode_mel16, "mel12": encode_mel12,
                       "mel8": encode_mel8}[mode]
                return enc(w, self.asr.mel_cfg, t_seg)
            if mode == "mulaw8":
                q = np.zeros((b, seg_len), np.int8)
                lut = _mulaw_lut()
                for i, w in enumerate(chunk):
                    m = min(len(w), seg_len)
                    if have_native and _native.quantize_mulaw(
                            w[:m], float(scale), lut, q[i, :m]):
                        continue
                    wn = w[:m] * scale if scale != 1.0 else w[:m]
                    # rint before the uint16 cast: flooring would bias
                    # boundary samples one grid code low vs the closed
                    # form; nan_to_num keeps NaN from indexing undefined
                    idx = np.clip(
                        np.rint(np.nan_to_num(wn) * 32767.5 + 32767.5),
                        0.0, 65535.0).astype(np.uint16)
                    q[i, :m] = lut[idx]
            elif mode == "int12":
                # 1.5 B/sample: 25% fewer tunnel bytes than int16 with a
                # 16x finer grid than mulaw8's companded 8-bit (the mode
                # for links where int16 is too slow and mulaw8's measured
                # transcript drift is too costly; docs/BENCHMARKS.md)
                q = np.zeros((b, 3 * ((seg_len + 1) // 2)), np.uint8)
                for i, w in enumerate(chunk):
                    m = min(len(w), seg_len)
                    if have_native and _native.quantize_int12(
                            w[:m], float(scale), q[i]):
                        continue
                    wn = w[:m] * scale if scale != 1.0 else w[:m]
                    pk = _pack_int12(wn)
                    q[i, : len(pk)] = pk
            elif mode in ("int16", "int16d"):
                q = np.zeros((b, seg_len), np.int16)
                for i, w in enumerate(chunk):
                    m = min(len(w), seg_len)
                    if have_native and _native.quantize_int16(
                            w[:m], float(scale), q[i, :m]):
                        continue
                    wn = w[:m] * scale if scale != 1.0 else w[:m]
                    # nan_to_num matches the native kernel (NaN -> 0);
                    # clip(NaN) would cast undefined int16 codes
                    q[i, :m] = np.clip(np.nan_to_num(wn),
                                       -1.0, 1.0) * 32767.0
                if mode == "int16d":
                    # delta coding over the int16 grid (wraparound
                    # arithmetic, bit-lossless): audio samples are
                    # strongly correlated, so first differences have
                    # far lower byte entropy than raw PCM and the
                    # tunnel's transparent compressor shrinks them much
                    # further (measured on-chip round 4: raw int16
                    # already moved at ~1.4x the calibrated link rate
                    # while high-entropy int12 packing moved BELOW it —
                    # docs/BENCHMARKS.md). Same byte count on the wire
                    # pre-compression; device undoes it with one cumsum.
                    d = np.empty_like(q)
                    d[:, 0] = q[:, 0]
                    np.subtract(q[:, 1:], q[:, :-1], out=d[:, 1:])
                    q = d
            else:
                q = np.zeros((b, seg_len), np.float32)
                for i, w in enumerate(chunk):
                    m = min(len(w), seg_len)
                    q[i, :m] = np.nan_to_num(
                        w[:m] * scale if scale != 1.0 else w[:m])
            return q

        if transfer == "auto":
            # Adaptive lossless transfer (round-4 on-chip finding): the
            # tunnel's effective rate per mode is NOT proportional to
            # byte count — it depends on payload compressibility, and it
            # swings between sessions (round 3 measured int12 1.45x
            # faster than int16; round 4 measured it 1.7x SLOWER on the
            # same rig). No static choice is right, so "auto" probes the
            # transcript-exact candidates ONCE with the first real
            # payload (encode + put + device drain) and locks the winner
            # for the pipeline's lifetime. docs/BENCHMARKS.md "Transfer
            # mode economics".
            t0p = time.perf_counter()
            transfer = self._resolve_auto_transfer(
                encode_transfer, waves, seg_len)
            tr["probe"] = time.perf_counter() - t0p
        self.last_transfer_resolved = transfer
        if shared_mel and getattr(self, "_mel16_key", None) != \
                (seg_len, self.asr.mel_cfg, transfer):
            from ..ops.mel import log_mel_spectrogram

            mel_cfg = self.asr.mel_cfg

            @jax.jit
            def _mel16(wq):
                if transfer == "mel16":
                    # wq IS the quantized host-computed log-mel — no
                    # device STFT at all (ops/mel.py::decode_mel16)
                    from ..ops.mel import decode_mel16
                    return decode_mel16(wq, mel_cfg)
                if transfer in ("mel12", "mel8"):
                    from ..ops.mel import (decode_mel8, decode_mel12,
                                           mel_seg_frames)
                    dec = decode_mel12 if transfer == "mel12" \
                        else decode_mel8
                    return dec(wq, mel_cfg,
                               mel_seg_frames(seg_len, mel_cfg))
                if transfer == "mulaw8":
                    # mu-law expansion (mu=255): telephony-grade 8-bit
                    y = wq.astype(jnp.float32) / 127.0
                    w = jnp.sign(y) * (jnp.power(256.0, jnp.abs(y)) - 1.0) \
                        / 255.0
                elif transfer == "int12":
                    # unpack 3 bytes -> two 12-bit two's-complement codes
                    # (nibble layout documented at _pack_int12); the odd-
                    # tail implicit zero sample is sliced off at seg_len
                    u = wq.astype(jnp.int32).reshape(wq.shape[0], -1, 3)
                    q0 = u[..., 0] | ((u[..., 1] & 0xF) << 8)
                    q1 = (u[..., 1] >> 4) | (u[..., 2] << 4)
                    q = jnp.stack([q0, q1], -1).reshape(wq.shape[0], -1)
                    q = q[:, :seg_len]
                    q = jnp.where(q >= 2048, q - 4096, q)
                    w = q.astype(jnp.float32) / 2047.0
                elif transfer == "int16":
                    w = wq.astype(jnp.float32) / 32767.0
                elif transfer == "int16d":
                    # un-delta the wraparound first differences: cumsum
                    # in int32 (overflow wraps mod 2^32, consistent mod
                    # 2^16) then re-center into the int16 range —
                    # bit-identical to the int16 path's codes
                    c = jnp.cumsum(wq.astype(jnp.int32), axis=1)
                    q = ((c + 32768) % 65536) - 32768
                    w = q.astype(jnp.float32) / 32767.0
                else:
                    w = wq.astype(jnp.float32)
                w = jnp.pad(w, ((0, 0), (0, n_samples - w.shape[1])))
                return log_mel_spectrogram(w, mel_cfg)

            self._mel16_fn = _mel16
            self._mel16_key = (seg_len, mel_cfg, transfer)

        pending = []  # (lo, hi, t0, asr_future, cap_future) per batch
        for lo in range(0, len(wins), cfg.ingest_batch):
            hi = min(lo + cfg.ingest_batch, len(wins))
            n = hi - lo
            t0 = time.perf_counter()
            if shared_mel:
                tq = time.perf_counter()
                b = _bucket(n, self.asr.batch_floor())
                q = encode_transfer(waves[lo:hi], b, transfer)
                tp = time.perf_counter()
                tr["quantize"] += tp - tq
                qd = jax.device_put(q) if self._batch_sharding is None \
                    else jax.device_put(q, self._batch_sharding)
                td = time.perf_counter()
                tr["put"] += td - tp
                # weather-aware "auto": count shipped bytes so the probe
                # refreshes after AUTO_REPROBE_MB instead of locking one
                # session-weather sample for the pipeline lifetime
                self._bytes_since_probe = getattr(
                    self, "_bytes_since_probe", 0.0) + q.nbytes
                mel = self._mel16_fn(qd)
                a_fut = self.asr.dispatch_mel(mel)
                c_fut = self.caption.dispatch_mel(mel)
                tr["dispatch"] += time.perf_counter() - td
            else:
                # non-shared-mel (different asr/caption mel configs):
                # fully synchronous, so the padded f32 batch is built
                # lazily in produce_texts — materializing every batch
                # here held ~the whole file padded in RAM for nothing
                a_fut, c_fut = None, None
            pending.append((lo, hi, t0, a_fut, c_fut))

        def produce_texts(lo, hi, a_fut, c_fut):
            """Drain one batch's futures into texts (or run the non-shared
            -mel synchronous path). Raises on device failure."""
            n = hi - lo
            if a_fut is not None:
                tw = time.perf_counter()
                a_tok, a_len = np.asarray(a_fut[0]), np.asarray(a_fut[1])
                c_tok, c_len = np.asarray(c_fut[0]), np.asarray(c_fut[1])
                tk = time.perf_counter()
                tr["wait"] += tk - tw
                asr_texts = self.asr.texts_from_tokens(a_tok, a_len, n)
                t1 = time.perf_counter()
                cap_texts = self.caption.texts_from_tokens(c_tok, c_len, n)
                tr["detok"] += time.perf_counter() - tk
            else:
                batch, _ = pad_segment_batch(waves[lo:hi], n_samples)
                if scale != 1.0:
                    batch *= scale          # owned buffer: in-place
                asr_texts = self.asr.transcribe_batch(batch)
                t1 = time.perf_counter()
                cap_texts = self.caption.transcribe_batch(batch)
            return asr_texts, cap_texts, t1

        # Batches drain + validate first; every surviving text across the
        # whole waveform then embeds in ONE MiniLM call (roadmap item 22:
        # a 2-batch file previously paid two half-full embed dispatches;
        # one consolidated batch fills the MXU bucket and pays the
        # dispatch/transfer overhead once).
        batch_texts: list[tuple[int, int, list, list, list, list]] = []
        for lo, hi, t0, a_fut, c_fut in pending:
            n = hi - lo
            try:
                asr_texts, cap_texts, t1 = produce_texts(
                    lo, hi, a_fut, c_fut)
            except Exception as err:  # noqa: BLE001
                # Bounded ingest-job retry (SURVEY §5's addition on top of
                # the reference's per-segment graceful degradation,
                # audio_search.py:346-350): a transient device failure
                # mid-batch re-dispatches the batch ONCE from the
                # still-host-resident waveforms before degrading.
                if self.stats is not None:
                    self.stats.log.log("ingest_batch_retry", 0.0,
                                       batch=f"{lo}:{hi}", error=str(err))
                try:
                    if a_fut is not None:
                        b = _bucket(n, self.asr.batch_floor())
                        q = encode_transfer(waves[lo:hi], b, transfer)
                        qd = jax.device_put(q) \
                            if self._batch_sharding is None \
                            else jax.device_put(q, self._batch_sharding)
                        mel = self._mel16_fn(qd)
                        a_fut = self.asr.dispatch_mel(mel)
                        c_fut = self.caption.dispatch_mel(mel)
                    asr_texts, cap_texts, t1 = produce_texts(
                        lo, hi, a_fut, c_fut)
                except Exception as err2:  # noqa: BLE001
                    # degrade exactly as the reference would: every
                    # segment in the batch fails both pipelines -> no
                    # text -> dropped by the keep-if-either rule; the
                    # failure lands in stats, ingest continues
                    if self.stats is not None:
                        self.stats.log.log(
                            "ingest_batch_failed", 0.0,
                            batch=f"{lo}:{hi}", error=str(err2))
                    asr_texts = [""] * n
                    cap_texts = [""] * n
                    t1 = time.perf_counter()
            t2 = time.perf_counter()

            asr_ok = [bool(validate_asr_text(t, cfg.validator))
                      for t in asr_texts]
            cap_ok = [bool(validate_audio_description(t, cfg.validator))
                      for t in cap_texts]
            tr["validate"] += time.perf_counter() - t2
            if self.stats is not None:
                self.stats.pipelines["asr_pipeline"].update_batch(
                    t1 - t0, asr_ok.count(True), asr_ok.count(False))
                self.stats.pipelines["audio_pipeline"].update_batch(
                    t2 - t1, cap_ok.count(True), cap_ok.count(False))

            batch_texts.append((lo, hi, asr_texts, cap_texts, asr_ok, cap_ok))

        # one embed batch for every surviving text in the whole file
        te = time.perf_counter()
        to_embed: list[str] = []
        slots: list[tuple[int, int]] = []  # (waveform segment idx, slot)
        for lo, hi, asr_texts, cap_texts, asr_ok, cap_ok in batch_texts:
            for i in range(hi - lo):
                if asr_ok[i]:
                    slots.append((lo + i, 0))
                    to_embed.append(asr_texts[i])
                if cap_ok[i]:
                    slots.append((lo + i, 1))
                    to_embed.append(cap_texts[i])
        embs = self.embedder(to_embed) if to_embed else \
            np.zeros((0, self.embedder.dim), np.float32)
        emb_map: dict[tuple[int, int], np.ndarray] = {
            s: embs[j] for j, s in enumerate(slots)}
        tb = time.perf_counter()
        tr["embed"] += tb - te

        records: list[dict[str, Any]] = []
        for lo, hi, asr_texts, cap_texts, asr_ok, cap_ok in batch_texts:
            for i in range(hi - lo):
                w = wins[lo + i]
                a_text = asr_texts[i] if asr_ok[i] else ""
                c_text = cap_texts[i] if cap_ok[i] else ""
                if not (a_text.strip() or c_text.strip()):
                    continue  # audio_search.py:274
                records.append({
                    "segment_id": f"seg_{next(self._seg_counter)}",
                    "source": source_name,
                    "start_time": w.start_time,
                    "end_time": w.end_time,
                    "duration": w.duration,
                    "asr_text": a_text,
                    "asr_embedding": emb_map.get((lo + i, 0)),
                    "asr_success": asr_ok[i],
                    "audio_description": c_text,
                    "audio_embedding": emb_map.get((lo + i, 1)),
                    "audio_success": cap_ok[i],
                    # stored playback audio is the NORMALIZED segment
                    # (audio_search.py:292); the deferred scale lands here
                    "audio_data": waves[lo + i] * scale
                    if scale != 1.0 else waves[lo + i],
                    "sample_rate": sr,
                })
        tr["build"] += time.perf_counter() - tb
        tr["wall"] = time.perf_counter() - t_wall0
        return records


def make_default_ingest(
    cfg: EngineConfig | None = None,
    stats: StatsRegistry | None = None,
    seed: int = 0,
    dtype=None,
    mesh=None,
) -> DualPipelineIngest:
    """Build the reference-configured dual pipeline (random-init weights
    unless ModelSpec.weights_path points at converted checkpoints)."""
    import jax
    import jax.numpy as jnp
    from ..config import MelConfig
    from ..models import whisper as W
    from ..models.minilm import PRESETS as MLM_PRESETS
    dtype = dtype or jnp.bfloat16
    cfg = cfg or EngineConfig()
    stats_reg = stats or StatsRegistry()
    mel_cfg = MelConfig(
        padded_seconds=cfg.segment.segment_seconds,
        sample_rate=cfg.audio.sample_rate,
    ) if cfg.short_context else MelConfig(sample_rate=cfg.audio.sample_rate)

    def load_whisper(spec, decode, name, prefix=None):
        wcfg = W.PRESETS[spec.preset]
        params = None
        if spec.weights_path:
            from ..models.convert import (
                convert_whisper, load_state_dict_from_dir)
            params = convert_whisper(
                load_state_dict_from_dir(spec.weights_path), wcfg)
        if spec.quantize_decoder:
            from ..ops.quant import quantize_whisper_decoder
            if params is None:
                params = W.init_params(jax.random.PRNGKey(seed), wcfg)
            params = quantize_whisper_decoder(params)
        # tokenizer assets (tokenizer.json / vocab.json+merges.txt) load
        # from the checkpoint dir the moment one is configured; the hash
        # tokenizer remains the no-assets fallback (models/tokenizer.py)
        from ..models.tokenizer import load_tokenizer
        tokenizer = load_tokenizer(
            spec.weights_path, vocab_size=wcfg.vocab_size,
            add_cls_sep=False, pad_id=wcfg.pad_token_id,
            eos_id=wcfg.eos_token_id) if spec.weights_path else None
        # the ingest loop does the reference-style stats update (timing +
        # validation outcome); the pipeline keeps its own internal counter
        return WhisperTextPipeline(
            params=params, cfg=wcfg, decode=decode, dtype=dtype, seed=seed,
            name=name, prefix_ids=prefix, mel_cfg=mel_cfg,
            tokenizer=tokenizer)

    asr_prefix = W.forced_prefix(
        W.PRESETS[cfg.asr_model.preset],
        task=getattr(cfg, "asr_task", "transcribe"),
        language=getattr(cfg, "asr_language", "en"))
    asr = load_whisper(cfg.asr_model, cfg.asr_decode, "asr",
                       prefix=asr_prefix)
    # the captioner is conditioned with a bare <sot> prompt
    cap_cfg = W.PRESETS[cfg.caption_model.preset]
    caption = load_whisper(
        cfg.caption_model, cfg.caption_decode, "caption",
        prefix=[cap_cfg.bos_token_id])
    if cfg.text_embedder.family == "mpnet":
        # real all-mpnet-base-v2 architecture (clean_audio_search.py:32):
        # relative position bias + RoBERTa position ids (models/mpnet.py)
        from ..models import mpnet as emb_model
        from ..models.convert import convert_mpnet as emb_convert
        mcfg = emb_model.PRESETS[cfg.text_embedder.preset]
    else:
        from ..models import minilm as emb_model
        from ..models.convert import convert_bert as emb_convert
        mcfg = MLM_PRESETS[cfg.text_embedder.preset]
    params = None
    if cfg.text_embedder.weights_path:
        from ..models.convert import load_state_dict_from_dir
        params = emb_convert(
            load_state_dict_from_dir(cfg.text_embedder.weights_path), mcfg)
    emb_tok = None
    if cfg.text_embedder.weights_path:
        from ..models.tokenizer import load_tokenizer
        emb_tok = load_tokenizer(cfg.text_embedder.weights_path,
                                 vocab_size=mcfg.vocab_size)
    embedder = TextEmbedder(
        params=params, cfg=mcfg, seed=seed, tokenizer=emb_tok,
        model=emb_model, stats=stats_reg.pipelines["text_embedder"])
    ing = DualPipelineIngest(asr, caption, embedder, cfg, stats_reg)
    if mesh is None:
        from ..parallel.mesh import mesh_from_config
        mesh = mesh_from_config(cfg)
    if mesh is not None:
        ing.use_mesh(mesh)
    return ing
