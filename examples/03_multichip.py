"""Multi-chip engine: the SAME production engine, sharded over a mesh.

EngineConfig(data_parallel=..., model_parallel=...) builds a
(data, model) jax.sharding.Mesh; ingest batches and the index shard
over 'data', params TP-shard over 'model'. On one host this runs on
virtual devices (set XLA_FLAGS below before importing jax); on a real
slice the identical code uses the real chips.

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/03_multichip.py --cpu
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))

if "--cpu" in sys.argv and \
        "--xla_force_host_platform_device_count" not in \
        os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8"
                               ).strip()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    from multimodal_audio_search_tpu import AudioSearchEngine, EngineConfig
    from multimodal_audio_search_tpu.config import DecodeConfig, ModelSpec

    print(f"{len(jax.devices())} devices: {jax.devices()[:4]} ...")
    cfg = EngineConfig(
        data_parallel=4, model_parallel=2,      # 4x2 (data, model) mesh
        asr_model=ModelSpec(family="whisper", preset="tiny"),
        caption_model=ModelSpec(family="whisper", preset="tiny"),
        asr_decode=DecodeConfig(max_new_tokens=8),
        caption_decode=DecodeConfig(max_new_tokens=8),
        short_context=True,
        ingest_batch=8,
    )
    engine = AudioSearchEngine(cfg=cfg)
    print(f"mesh: {dict(engine.mesh.shape)}")

    rng = np.random.default_rng(0)
    wave = (rng.normal(size=16000 * 40) * 0.3).astype(np.float32)
    segs = engine.ingest_waveform(wave, 16000, "mesh-demo")
    print(f"ingested {len(segs)} segment(s) with batches sharded over "
          f"{engine.mesh.shape['data']} data-parallel devices")
    hits, info = engine.search("anything")
    print(f"sharded search: {len(hits)} hit(s), "
          f"weights {info.get('asr_weight'):.2f}/"
          f"{info.get('audio_weight'):.2f}")


if __name__ == "__main__":
    main()
