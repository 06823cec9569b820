"""Perf-mode accuracy drift measured on SELF-TRAINED weights.

Round-2 verdict item 4: with random-init weights every transcript is
degenerate, so tools/compare_modes.py could only say "short_context
changes 100% of transcripts" — meaningless. This harness trains the
"test"-preset captioner on procedural audio (training/synth.py) until
transcripts carry real signal, then measures each perf lever against the
parity configuration on held-out clips:

  * short_context — mel context halved (positions sliced), the audio_ctx
    lever scaled to the test geometry (2 s trained context -> 1 s)
  * mulaw8 / int16 / int12 — host->device transfer quantization round trips
  * bf16          — model compute dtype
  * int8_dec      — int8-quantized decoder weights (ops/quant.py)

Reported per mode: transcript agreement vs the parity decode (exact rate
+ token F1) and ground-truth exact rate (vs the generator's captions).
One JSON line on stdout, bench.py-style.

    python tools/synth_drift.py [--steps 600] [--clips 64] [--out f.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def token_f1(a: str, b: str) -> float:
    ta, tb = a.split(), b.split()
    if not ta and not tb:
        return 1.0
    used = [False] * len(tb)
    common = 0
    for w in ta:
        for j, v in enumerate(tb):
            if not used[j] and v == w:
                used[j] = True
                common += 1
                break
    if common == 0:
        return 0.0
    p, r = common / len(ta), common / len(tb)
    return 2 * p * r / (p + r)


def mulaw_roundtrip(w: np.ndarray) -> np.ndarray:
    """The production mulaw8 transfer: LUT encode (pipelines/ingest.py)
    + the device-side expansion of _mel16."""
    from multimodal_audio_search_tpu.pipelines.ingest import _mulaw_lut
    lut = _mulaw_lut()
    idx = np.clip(np.rint(np.nan_to_num(w) * 32767.5 + 32767.5),
                  0.0, 65535.0).astype(np.uint16)
    q = lut[idx].astype(np.float32) / 127.0
    return (np.sign(q) * (np.power(256.0, np.abs(q)) - 1.0) / 255.0
            ).astype(np.float32)


def int16_roundtrip(w: np.ndarray) -> np.ndarray:
    q = (np.clip(w, -1.0, 1.0) * 32767.0).astype(np.int16)
    return q.astype(np.float32) / 32767.0


def int12_roundtrip(w: np.ndarray) -> np.ndarray:
    """The production int12 packed transfer: pack (pipelines/ingest.py
    _pack_int12) + the device-side unpack of _mel16, per clip row."""
    from multimodal_audio_search_tpu.pipelines.ingest import _pack_int12
    out = np.empty_like(w, dtype=np.float32)
    for i in range(w.shape[0]):
        pk = _pack_int12(w[i]).astype(np.int32).reshape(-1, 3)
        q0 = pk[:, 0] | ((pk[:, 1] & 0xF) << 8)
        q1 = (pk[:, 1] >> 4) | (pk[:, 2] << 4)
        q = np.stack([q0, q1], -1).reshape(-1)[: w.shape[1]]
        q = np.where(q >= 2048, q - 4096, q)
        out[i] = q.astype(np.float32) / 2047.0
    return out


def transcribe_hostmel(model, waves: np.ndarray, bits: int = 16
                       ) -> list[str]:
    """Greedy decode through the mel16/mel12/mel8 transfer path: host-
    computed quantized log-mel (ops/mel.py encode_mel16/12/8)
    reconstructed on device and fed to the pipeline's mel entry —
    exactly what ingest does under transfer_dtype="mel16"/"mel12"/
    "mel8"."""
    import jax.numpy as jnp
    from multimodal_audio_search_tpu.config import DecodeConfig, MelConfig
    from multimodal_audio_search_tpu.ops.mel import (
        decode_mel8, decode_mel12, decode_mel16, encode_mel8,
        encode_mel12, encode_mel16, mel_seg_frames)
    from multimodal_audio_search_tpu.pipelines.whisper_pipeline import (
        WhisperTextPipeline)

    mel_cfg = MelConfig(padded_seconds=model.mel_seconds)
    pipe = WhisperTextPipeline(
        params=model.params, cfg=model.cfg, tokenizer=model.vocab,
        # fused_encoder PINNED off: since the round-5 parity promotion
        # the default is auto-on-TPU, and this row must keep measuring
        # ONLY the mel codec lever against the einsum baseline
        decode=DecodeConfig(max_new_tokens=model.max_new,
                            fused_encoder=False),
        mel_cfg=mel_cfg, prefix_ids=[model.cfg.bos_token_id],
        dtype=jnp.float32, name=f"synth_mel{bits}")
    seg_len = max(len(w) for w in waves)
    t_seg = mel_seg_frames(seg_len, mel_cfg)
    n = len(waves)
    from multimodal_audio_search_tpu.utils.batching import bucket_pow2
    b = bucket_pow2(n, pipe.batch_floor())
    w = np.zeros((b, seg_len), np.float32)
    for i, src in enumerate(waves):
        m = min(len(src), seg_len)
        w[i, :m] = src[:m]
    if bits == 16:
        codes = encode_mel16(w, mel_cfg, t_seg)
        mel = decode_mel16(jnp.asarray(codes), mel_cfg)
    elif bits == 12:
        codes = encode_mel12(w, mel_cfg, t_seg)
        mel = decode_mel12(jnp.asarray(codes), mel_cfg, t_seg)
    else:
        codes = encode_mel8(w, mel_cfg, t_seg)
        mel = decode_mel8(jnp.asarray(codes), mel_cfg, t_seg)
    toks, lens = pipe.dispatch_mel(mel)
    return pipe.texts_from_tokens(np.asarray(toks), np.asarray(lens), n)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--clips", type=int, default=64)
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None)
    ap.add_argument("--preset", default="test")
    ap.add_argument("--clip-seconds", type=float, default=1.0)
    ap.add_argument("--mel-seconds", type=float, default=2.0)
    ap.add_argument("--max-events", type=int, default=3)
    ap.add_argument("--save-model", default=None,
                    help="save trained params (utils/checkpoint.py "
                         "pytree npz) so later runs can --load-model "
                         "instead of retraining")
    ap.add_argument("--load-model", default=None,
                    help="skip training; load params saved by a prior "
                         "--save-model run with the SAME geometry flags")
    ap.add_argument("--resume", action="store_true",
                    help="with --load-model: continue training --steps "
                         "MORE steps from the checkpoint instead of "
                         "skipping training (fresh optimizer/schedule)")
    ap.add_argument("--save-every", type=int, default=0,
                    help="checkpoint params to --save-model every N "
                         "steps (plus a .meta.json with step/loss) so a "
                         "multi-hour chip run survives interruption")
    ap.add_argument("--train-only", action="store_true",
                    help="train + save and exit without measuring modes")
    ap.add_argument("--modes", nargs="*", default=None,
                    help="measure only these mode names (parity is "
                         "always computed as the baseline)")
    ap.add_argument("--production", action="store_true",
                    help="round-3 verdict item 5 geometry: whisper-tiny "
                         "preset, 10 s clips, full 30 s mel context, up "
                         "to 6 events. Chip-sized — run with "
                         "MAS_DRIFT_TPU=1 (the tiny encoder at 30 s "
                         "context is not CPU-trainable)")
    args = ap.parse_args()
    if args.production:
        args.preset, args.clip_seconds = "tiny", 10.0
        args.mel_seconds, args.max_events = 30.0, 6

    import jax
    # test-preset training is CPU-sized; opt into the chip explicitly
    # (probing the backend would hang if the remote compile service is
    # recovering — see .claude/skills/verify/SKILL.md)
    if not os.environ.get("MAS_DRIFT_TPU"):
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from multimodal_audio_search_tpu.ops.quant import (
        quantize_whisper_decoder)
    from multimodal_audio_search_tpu.training.synth import (
        make_clip, train_synth_captioner, transcribe)

    n_events = (1 if args.max_events <= 3 else 2, args.max_events)
    loaded_params = None
    if args.load_model:
        from multimodal_audio_search_tpu.models import whisper as W
        from multimodal_audio_search_tpu.utils.checkpoint import (
            load_pytree)
        wcfg = W.PRESETS[args.preset]
        template = W.init_params(jax.random.PRNGKey(0), wcfg)
        loaded_params = load_pytree(template, args.load_model)
    if args.load_model and not args.resume:
        from multimodal_audio_search_tpu.models import whisper as W
        from multimodal_audio_search_tpu.training.synth import (
            SynthModel, SynthVocab)
        wcfg = W.PRESETS[args.preset]
        model = SynthModel(
            params=loaded_params, cfg=wcfg,
            vocab=SynthVocab(wcfg), mel_seconds=args.mel_seconds,
            losses=[0.0], n_events=n_events)   # loss unknown: loaded
    else:
        save_cb = None
        if args.save_model and args.save_every:
            from multimodal_audio_search_tpu.utils.checkpoint import (
                save_pytree)

            def save_cb(step, params, losses):
                save_pytree(params, args.save_model)
                with open(args.save_model + ".meta.json", "w") as f:
                    json.dump({"step": step,
                               "loss_recent": round(float(
                                   np.mean(losses[-20:])), 4)}, f)
        model = train_synth_captioner(
            steps=args.steps, batch=args.batch, seed=args.seed,
            preset=args.preset, clip_seconds=args.clip_seconds,
            mel_seconds=args.mel_seconds, n_events=n_events,
            params_init=loaded_params, save_cb=save_cb,
            save_every=args.save_every,
            # on the tunneled chip the production step is transfer-bound;
            # int16 wave transfer is the ingest default's exact roundtrip
            transfer_int16=bool(os.environ.get("MAS_DRIFT_TPU")))
        if args.save_model:
            from multimodal_audio_search_tpu.utils.checkpoint import (
                save_pytree)
            save_pytree(model.params, args.save_model)
    if args.train_only:
        print(json.dumps({
            "metric": "synth_drift_train_only",
            "steps": args.steps,
            "final_loss": round(float(np.mean(model.losses[-20:])), 4),
            "saved": args.save_model}))
        return
    rng = np.random.default_rng(args.seed + 1)
    waves, truths = zip(*(make_clip(rng, args.clip_seconds, n_events)
                          for _ in range(args.clips)))
    waves = np.stack(waves)

    parity = transcribe(model, waves)
    # the production short_context lever shrinks the mel context to the
    # segment length (config.py::short_context); at the toy geometry
    # (clip == half context) the two coincide
    short_ctx_s = (args.clip_seconds
                   if args.clip_seconds < args.mel_seconds
                   else args.mel_seconds / 2)

    def drift(texts):
        exact = float(np.mean([g == p for g, p in zip(texts, parity)]))
        f1 = float(np.mean([token_f1(g, p)
                            for g, p in zip(texts, parity)]))
        truth = float(np.mean([g == t for g, t in zip(texts, truths)]))
        return {"agree_exact": round(exact, 3),
                "agree_token_f1": round(f1, 3),
                "truth_exact": round(truth, 3)}

    import dataclasses
    wanted = set(args.modes) if args.modes else None

    def want(name):
        return wanted is None or name in wanted

    modes = {"parity": drift(parity)}
    if want("short_context"):
        modes["short_context"] = drift(transcribe(
            model, waves, mel_seconds=short_ctx_s))
    if want("mulaw8"):
        modes["mulaw8"] = drift(transcribe(model, mulaw_roundtrip(waves)))
    if want("int16"):
        modes["int16"] = drift(transcribe(model, int16_roundtrip(waves)))
    if want("int12"):
        modes["int12"] = drift(transcribe(model, int12_roundtrip(waves)))
    if want("bf16"):
        modes["bf16"] = drift(transcribe(model, waves,
                                         dtype=jnp.bfloat16))
    if want("int8_dec"):
        modes["int8_dec"] = drift(transcribe(
            dataclasses.replace(
                model, params=quantize_whisper_decoder(model.params)),
            waves))
    # int8 encoder attention (ops/encoder_block.py int8 variant; the
    # MAS_ENC_INT8 override routes encode through the XLA twin of the
    # kernel's math on every backend — models/whisper.py)
    if want("int8_enc"):
        os.environ["MAS_ENC_INT8"] = "1"
        try:
            modes["int8_enc"] = drift(transcribe(model, waves))
        finally:
            os.environ.pop("MAS_ENC_INT8", None)
    # fused bf16 encoder block kernels (ops/encoder_block.py) — the
    # parity-default promotion decision (ROADMAP item 23). The promotion
    # candidate IS bf16+fused: the production pipeline computes in bf16
    # (pipelines/whisper_pipeline.py dtype default), so scoring the
    # fused path at f32 would measure a config that never ships — and
    # the first on-chip attempt did exactly that and overflowed the
    # kernel's scoped VMEM at the 30 s context (docs/onchip_r5/
    # drift_prod_s5.out). Real Pallas kernel on chip, interpret twin
    # on CPU; the "bf16" row above is the einsum-path control.
    if want("fused_enc"):
        modes["fused_enc"] = drift(transcribe(
            model, waves, fused_encoder=True, dtype=jnp.bfloat16))
    # f32 fused isolation row (opt-in via --modes): kernel-formulation
    # rounding alone, without the bf16 cast
    if wanted is not None and "fused_enc_f32" in wanted:
        modes["fused_enc_f32"] = drift(transcribe(
            model, waves, fused_encoder=True))
    # mel16 transfer: host HF-f64-exact log-mel -> uint16 codes ->
    # device reconstruction (the exact ingest path, pipelines/ingest.py)
    if want("mel16"):
        modes["mel16"] = drift(transcribe_hostmel(model, waves, 16))
    if want("mel12"):
        modes["mel12"] = drift(transcribe_hostmel(model, waves, 12))
    if want("mel8"):
        modes["mel8"] = drift(transcribe_hostmel(model, waves, 8))
    out = {
        "metric": "synth_drift",
        "train": {"steps": (0 if (args.load_model and not args.resume)
                            else args.steps),
                  "final_loss": round(float(
                      np.mean(model.losses[-20:])), 4),
                  "preset": args.preset,
                  "loaded": bool(args.load_model)},
        "geometry": {"clip_seconds": args.clip_seconds,
                     "mel_seconds": args.mel_seconds,
                     "max_events": args.max_events,
                     "short_context_seconds": short_ctx_s},
        "clips": args.clips,
        "modes": modes,
    }
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
    # hard-exit: the axon client teardown can hang post-measurement and
    # starve every later chip client (seen round 5 with bench.py; same
    # guard there). All output is flushed/written by main() already.
    import os
    os._exit(0)
