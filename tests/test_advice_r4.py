"""Regression tests for the round-3 advisor findings (ADVICE.md r3).

Each test pins the fixed behavior; file/line pointers reference the
finding sites, not the reference repo (these are framework-internal
robustness issues with no reference analogue).
"""
import json

import numpy as np
import pytest

from multimodal_audio_search_tpu.index.store import SegmentStore


def test_ivf_chunked_argmax_shares_one_compiled_program():
    """index/ivf.py: the chunk argmax must be jitted once at module level
    — a per-call jax.jit wrapper recompiled the identical program once
    per 262k-row memmap chunk."""
    from multimodal_audio_search_tpu.index import ivf
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    cent = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
    x = rng.normal(size=(70, 8)).astype(np.float32)
    before = ivf._argmax_sim_jit._cache_size()
    a = ivf._chunked_argmax_sim(x, cent, chunk=32)
    b = ivf._chunked_argmax_sim(x[:50], cent, chunk=32)
    after = ivf._argmax_sim_jit._cache_size()
    # 3 chunks in the first call + 2 in the second: one executable total
    assert after - before <= 1
    exact = np.argmax(x @ np.asarray(cent).T, axis=1)
    np.testing.assert_array_equal(a, exact)
    np.testing.assert_array_equal(b, exact[:50])


def test_legacy_manifest_with_missing_meta_lines_refuses(rng, tmp_path):
    """index/store.py:303: a legacy manifest (no meta_bytes) whose
    meta.jsonl has FEWER lines than the committed row count is the same
    data-loss condition the meta_bytes path refuses — appending after
    the gap would silently misalign meta[:rows] with rows."""
    st = SegmentStore(embed_dim=8)
    p = tmp_path / "idx"
    for i in range(3):
        st.add({"source": "a", "start_time": float(i)},
               rng.normal(size=8), rng.normal(size=8))
    st.save_incremental(p)
    manifest = p / "manifest.json"
    state = json.loads(manifest.read_text())
    del state["meta_bytes"]                      # legacy manifest
    manifest.write_text(json.dumps(state))
    meta = p / "meta.jsonl"
    lines = meta.read_text().splitlines(keepends=True)
    meta.write_text("".join(lines[:2]))          # lost a committed line
    st.add({"source": "b", "start_time": 3.0},
           rng.normal(size=8), rng.normal(size=8))
    with pytest.raises(ValueError, match="lost data"):
        st.save_incremental(p)


def test_device_index_cache_keys_on_mesh_object(rng):
    """index/store.py:182: the sharded-view cache must key on the Mesh
    itself, not id(mesh) — a GC'd mesh's id can be recycled by a new
    Mesh, serving a view sharded for the dead mesh."""
    import jax
    from jax.sharding import Mesh

    st = SegmentStore(embed_dim=8)
    for i in range(4):
        st.add({"source": "s", "start_time": float(i)},
               rng.normal(size=8), rng.normal(size=8))
    devs = np.asarray(jax.devices())
    m1 = Mesh(devs.reshape(8, 1), ("data", "model"))
    emb1, _ = st.device_index(mesh=m1)
    key1 = st._device_view[0]
    assert m1 in key1 or any(k is m1 for k in key1)  # mesh object pinned
    m2 = Mesh(devs.reshape(2, 4), ("data", "model"))
    emb2, _ = st.device_index(mesh=m2)
    assert st._device_view[0] != key1            # different mesh -> rebuild
    assert emb2.sharding.mesh.shape["data"] == 2


def test_use_mesh_rejects_non_power_of_two_data_axis():
    """pipelines/embed.py:66 (+ whisper_pipeline.use_mesh): an externally
    built dp=6 mesh must fail fast with mesh_from_config's clear error,
    not an opaque divisibility failure at the first sharded device_put."""
    from multimodal_audio_search_tpu.parallel.mesh import make_mesh
    from multimodal_audio_search_tpu.pipelines.embed import TextEmbedder
    from multimodal_audio_search_tpu.models import minilm

    emb = TextEmbedder(cfg=minilm.MiniLMConfig(
        vocab_size=512, hidden=32, layers=1, heads=2, intermediate=64,
        max_positions=64))
    mesh = make_mesh(6, model_parallel=1)        # allowed by make_mesh
    with pytest.raises(ValueError, match="power of two"):
        emb.use_mesh(mesh)


def test_single_frame_mp3_with_trailing_id3v1_decodes(rng):
    """native/mp3_decode.cc false-sync guard: a single-frame MP3 followed
    by trailing junk (ID3v1 tag) must still configure — the guard falls
    back to a clean side-info parse when no agreeing next header exists."""
    mp3_native = pytest.importorskip(
        "multimodal_audio_search_tpu.audio.mp3_native")
    if not mp3_native.available():
        pytest.skip("native mp3 decoder unavailable")
    from tests.lame_fixture import encode

    rate, bitrate = 48000, 96                    # 144*96000/48000 = 288 B
    t = np.arange(int(0.2 * rate)) / rate
    pcm = (0.4 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    data = encode(pcm, rate, bitrate=bitrate)
    assert data[:2] != b"ID"                     # no leading tag expected
    # cut to exactly ONE frame using the header's padding bit
    pad = (data[2] >> 1) & 1
    frame_len = 144 * bitrate * 1000 // rate + pad
    one = data[:frame_len]
    id3v1 = b"TAG" + bytes(125)
    wave, got_rate = mp3_native.decode_mp3_native(one + id3v1)
    assert got_rate == rate
    assert len(wave) >= 1152 // 2                # at least one granule out
    # and genuine garbage after a false sync is still rejected
    with pytest.raises(ValueError):
        mp3_native.decode_mp3_native(b"\xff\xfb" + bytes(rng.integers(
            0, 255, 400, dtype=np.uint8).tobytes()) + id3v1)
