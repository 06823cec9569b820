"""Production-geometry multi-chip proof (round-3 verdict item 4).

Round 3's mesh-parity evidence ran the ``test`` preset (embed 64, toy
layers); head-divisibility and kernel-layout-vs-sharding bugs in the
SHIPPED presets would have been invisible. These tests compile the real
production geometry on the 8-virtual-device CPU mesh:

* whisper-base ASR (d_model=512, H=8, D=64, 6+6 layers) + whisper-tiny
  captioner (H=6) + MiniLM-L6 embedder (384-d) through the full engine
  under (8,1) and (4,2) meshes — ingest + fused search must equal
  single-device execution (the reference's single-GPU semantics,
  /root/reference/audio_search.py:89,268-271, scaled per SURVEY §2c).
* the Pallas kernels under ``shard_map`` (interpret mode): the fused
  encoder attention+o-proj+residual block with heads sharded over the
  'model' axis, and the single-query cross-attention decode kernel with
  batch sharded over 'data' — the layouts a real multi-chip TP/DP
  deployment would execute.

Short decode + 2 s segments keep CPU runtime bounded; the geometry under
test (head counts, merged H*D lanes, TP-sharded dense dims) is the
shipped one.
"""
import math

import numpy as np
import pytest

from multimodal_audio_search_tpu import AudioSearchEngine
from multimodal_audio_search_tpu.config import (
    DecodeConfig, EngineConfig, SegmentConfig)


def _cfg(dp, mp):
    # default ModelSpecs == production presets: whisper-base ASR,
    # whisper-tiny captioner, MiniLM-L6 embedder (config.py defaults)
    return EngineConfig(
        ingest_batch=8,
        segment=SegmentConfig(segment_seconds=2.0, min_segment_seconds=0.5),
        short_context=True,          # 2 s mel context; geometry unchanged
        asr_decode=DecodeConfig(max_new_tokens=4),
        caption_decode=DecodeConfig(max_new_tokens=4),
        data_parallel=dp, model_parallel=mp)


def _engine(dp=1, mp=1):
    eng = AudioSearchEngine(cfg=_cfg(dp, mp), keep_audio=False, seed=3)
    eng.load_all_models()
    return eng


@pytest.fixture(scope="module")
def wave():
    rng = np.random.default_rng(11)
    return (rng.normal(size=16000 * 5) * 0.3).astype(np.float32)


@pytest.fixture(scope="module")
def single(wave):
    eng = _engine(1, 1)
    segs = eng.ingest_waveform(wave, 16000, "clip")
    return eng, segs


@pytest.mark.parametrize("dp,mp", [(8, 1), (4, 2)])
def test_base_geometry_engine_mesh_matches_single_device(
        single, wave, dp, mp):
    ref, ref_segs = single
    eng = _engine(dp, mp)
    assert eng.mesh is not None
    assert eng.mesh.shape == {"data": dp, "model": mp}

    # TP actually sharded the production dims: whisper-base qkv
    # [512, 512] and mlp_in [512, 2048] split over 'model'
    if mp > 1:
        blk = eng.ingest_pipeline.asr.params["encoder"]["blocks"][0]
        spec = blk["self_attn"]["q"]["w"].sharding.spec
        assert tuple(spec) == (None, "model"), spec
        spec = blk["mlp_out"]["w"].sharding.spec
        assert tuple(spec) == ("model", None), spec

    segs = eng.ingest_waveform(wave, 16000, "clip")
    assert len(segs) == len(ref_segs) > 0
    for s, r in zip(segs, ref_segs):
        assert s["asr_text"] == r["asr_text"]
        assert s["audio_description"] == r["audio_description"]
    np.testing.assert_allclose(
        eng.store.embeddings, ref.store.embeddings, atol=2e-5)

    for query in ("music with drums", "someone speaking words"):
        rows, info = eng.search(query)
        ref_rows, ref_info = ref.search(query)
        assert info["asr_weight"] == ref_info["asr_weight"]
        assert [r["index"] for r in rows] == [r["index"] for r in ref_rows]
        np.testing.assert_allclose(
            [r["fusion_score"] for r in rows],
            [r["fusion_score"] for r in ref_rows], atol=2e-5)


def _mesh(shape, names):
    import jax
    from jax.sharding import Mesh
    return Mesh(np.asarray(jax.devices()).reshape(shape), names)


def test_encoder_block_kernel_under_shard_map(rng):
    """fused_attention_o_residual with heads TP-sharded over 'model':
    each device runs the REAL Pallas kernel (interpret mode) on its H/mp
    head shard with a row-shard of Wo, partial outputs psum over 'model'
    — the Megatron attention layout at whisper-base geometry (H=8, D=64,
    merged H*D=512)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from multimodal_audio_search_tpu.ops.encoder_block import (
        fused_attention_o_residual)

    b, h, t, d = 4, 8, 96, 64
    hd = h * d
    q, k, v = (rng.normal(size=(b, h, t, d)).astype(np.float32)
               for _ in range(3))
    x = rng.normal(size=(b, t, hd)).astype(np.float32)
    wo = (rng.normal(size=(hd, hd)) / math.sqrt(hd)).astype(np.float32)
    bo = rng.normal(size=(hd,)).astype(np.float32)

    ref = fused_attention_o_residual(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(x),
        jnp.asarray(wo), jnp.asarray(bo), blk_q=32, interpret=True)

    mesh = _mesh((4, 2), ("data", "model"))
    mp = mesh.shape["model"]

    def tp_block(q, k, v, x, wo, bo):
        # per-device partial: x/mp + (local heads merged) @ wo_rowshard
        # + bo/mp; psum over 'model' reconstructs the full block. The
        # head shard's merged output lands on rows h_lo*d:(h_lo+nh)*d of
        # Wo — exactly the row shard this device holds.
        part = fused_attention_o_residual(
            q, k, v, x / mp, wo, bo / mp, blk_q=32, interpret=True)
        return jax.lax.psum(part, "model")

    out = jax.jit(jax.shard_map(
        tp_block, mesh=mesh,
        in_specs=(P("data", "model"), P("data", "model"),
                  P("data", "model"), P("data", None),
                  P("model", None), P(None)),
        out_specs=P("data", None),
        check_vma=False,  # pallas_call out_shape carries no vma (jax 0.8)
    ))(q, k, v, x, wo, bo)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_cross_attention_kernel_under_shard_map(rng):
    """fused_cross_attention (single-query decode) with the BATCH
    sharded over 'data' — the serving DP layout; per-device results must
    concatenate to the single-device kernel output."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from multimodal_audio_search_tpu.ops.cross_attention import (
        fused_cross_attention)

    b, h, s, d = 8, 8, 64, 64
    q = rng.normal(size=(b, h, d)).astype(np.float32)
    k = rng.normal(size=(b, s, h * d)).astype(np.float32)
    v = rng.normal(size=(b, s, h * d)).astype(np.float32)

    ref = fused_cross_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), interpret=True)

    mesh = _mesh((8, 1), ("data", "model"))
    out = jax.jit(jax.shard_map(
        lambda q, k, v: fused_cross_attention(q, k, v, interpret=True),
        mesh=mesh,
        in_specs=(P("data"), P("data"), P("data")),
        out_specs=P("data"),
        check_vma=False,  # pallas_call out_shape carries no vma (jax 0.8)
    ))(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
