"""Time the batched log-mel frontend on the chip at bench shapes.

    python tools/profile_mel.py [--batch 64]
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()

    import jax
    import numpy as np
    from bench import _stage_time, calibrate
    from multimodal_audio_search_tpu.config import MelConfig
    from multimodal_audio_search_tpu.ops.mel import log_mel_spectrogram

    on_tpu = jax.devices()[0].platform == "tpu"
    cal = calibrate(on_tpu)
    rtt = cal["rtt_ms"] / 1e3
    print(json.dumps({"calibration": cal}), flush=True)
    rng = np.random.default_rng(0)
    reps = 8 if on_tpu else 1

    for seconds in (10.0, 30.0):
        cfg = MelConfig(padded_seconds=seconds)
        w = jax.numpy.asarray(
            rng.normal(size=(args.batch, cfg.n_samples)) * 0.3,
            jax.numpy.float32)
        fn = jax.jit(lambda x, cfg=cfg: log_mel_spectrogram(x, cfg))
        s = _stage_time(fn, w, reps, rtt)
        flops = 2 * args.batch * (cfg.n_samples // cfg.hop_length) \
            * cfg.n_fft * (cfg.n_fft + 2)
        print(json.dumps({
            "case": f"log_mel {seconds:.0f}s B={args.batch}",
            "ms": round(s * 1e3, 3),
            "stft_mfu": round(flops / s / (cal["tflops_bf16"] * 1e12), 3),
        }), flush=True)


if __name__ == "__main__":
    main()
