"""Weight-parity tests for the HTSAT-Swin + RoBERTa CLAP towers.

Oracle: random-init torch ClapModel / ClapAudioModelWithProjection from local
transformers configs (no egress; same pattern as test_minilm/test_whisper).
Every float parameter is re-randomized so the zero-initialized
relative-position-bias tables and batch-norm stats are actually exercised.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from multimodal_audio_search_tpu.models import clap_htsat as CH  # noqa: E402


def _randomize(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    sd = model.state_dict()
    for k, v in sd.items():
        if not v.is_floating_point():
            continue
        if k.endswith("running_var"):
            sd[k] = torch.rand(v.shape, generator=g) + 0.5
        elif k.endswith("num_batches_tracked"):
            continue
        else:
            sd[k] = torch.randn(v.shape, generator=g) * 0.05
    model.load_state_dict(sd)
    model.eval()
    return model


TINY_AUDIO = dict(
    num_mel_bins=16, spec_size=64, patch_size=4, patch_stride=[4, 4],
    patch_embeds_hidden_size=16, depths=[2, 2], num_attention_heads=[2, 4],
    window_size=4, hidden_size=32, projection_dim=24, enable_fusion=False)
TINY_TEXT = dict(
    vocab_size=120, hidden_size=32, num_hidden_layers=2,
    num_attention_heads=2, intermediate_size=64, max_position_embeddings=40,
    pad_token_id=1, type_vocab_size=1, projection_dim=24)


def test_bicubic_matrix_matches_torch():
    x = torch.randn(2, 3, 50, 7, generator=torch.Generator().manual_seed(1))
    want = torch.nn.functional.interpolate(
        x, (128, 7), mode="bicubic", align_corners=True).numpy()
    m = CH.bicubic_matrix(50, 128)
    got = np.einsum("st,bctf->bcsf", m, x.numpy())
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_audio_tower_parity_tiny():
    cfg_hf = transformers.ClapAudioConfig(**TINY_AUDIO)
    model = _randomize(
        transformers.ClapAudioModelWithProjection(cfg_hf), seed=2)
    cfg = CH.htsat_config_from_hf(cfg_hf)
    params = CH.convert_clap_audio(model.state_dict(), cfg)

    rng = np.random.default_rng(3)
    # T=200 < spec_width=256 exercises the bicubic stretch; F == spec_height.
    feats = rng.normal(size=(2, 1, 200, 16)).astype(np.float32)
    with torch.inference_mode():
        want = model(torch.from_numpy(feats)).audio_embeds.numpy()
    want = want / np.linalg.norm(want, axis=-1, keepdims=True)

    got = np.asarray(CH.audio_embed(params, jnp.asarray(feats), cfg))
    np.testing.assert_allclose(got, want, atol=3e-5)
    assert np.allclose(np.linalg.norm(got, axis=-1), 1.0, atol=1e-5)


def test_text_tower_parity_tiny_with_padding():
    cfg_hf = transformers.ClapTextConfig(**TINY_TEXT)
    full = transformers.ClapConfig(
        text_config=TINY_TEXT, audio_config=TINY_AUDIO, projection_dim=24)
    model = _randomize(transformers.ClapModel(full), seed=4)
    cfg = CH.roberta_config_from_hf(cfg_hf)
    params = CH.convert_clap_text(model.state_dict(), cfg)

    rng = np.random.default_rng(5)
    ids = rng.integers(2, 120, size=(3, 12)).astype(np.int64)
    mask = np.ones((3, 12), np.int64)
    mask[1, 8:] = 0
    ids[1, 8:] = 1      # pad token
    mask[2, 5:] = 0
    ids[2, 5:] = 1
    with torch.inference_mode():
        want = model.get_text_features(
            torch.from_numpy(ids), torch.from_numpy(mask)).numpy()
    got = np.asarray(CH.text_embed(
        params, jnp.asarray(ids), jnp.asarray(mask), cfg))
    np.testing.assert_allclose(got, want, atol=3e-5)


def test_audio_tower_parity_default_geometry():
    """The real laion geometry: 4 stages, window 8, shifted blocks, 256x256
    image, bicubic time stretch from 800 frames — shapes only scaled down in
    batch. Catches geometry bugs the tiny config cannot (6-deep stage,
    resolution-8 final stage where the window covers the whole map)."""
    cfg_hf = transformers.ClapAudioConfig()   # laion defaults
    model = _randomize(
        transformers.ClapAudioModelWithProjection(cfg_hf), seed=6)
    cfg = CH.htsat_config_from_hf(cfg_hf)
    params = CH.convert_clap_audio(model.state_dict(), cfg)

    rng = np.random.default_rng(7)
    feats = rng.normal(size=(1, 1, 800, 64)).astype(np.float32)
    with torch.inference_mode():
        want = model(torch.from_numpy(feats)).audio_embeds.numpy()
    want = want / np.linalg.norm(want, axis=-1, keepdims=True)
    got = np.asarray(CH.audio_embed(params, jnp.asarray(feats), cfg))
    np.testing.assert_allclose(got, want, atol=5e-5)


def test_fusion_config_checkpoint_mismatch_rejected():
    sd = {"audio_model.audio_encoder.patch_embed.fusion_model.x": 0,
          "audio_model.audio_encoder.patch_embed.mel_conv2d.weight": 0}
    with pytest.raises(ValueError, match="enable_fusion"):
        CH.convert_clap_audio(sd, CH.HTSATConfig())
    with pytest.raises(ValueError, match="fusion weights"):
        CH.convert_clap_audio(
            {"audio_model.audio_encoder.norm.weight": 0},
            CH.HTSATConfig(enable_fusion=True))


def test_fused_audio_tower_parity_tiny():
    """laion/clap-htsat-fused architecture (streamlit_app_backup.py:22-35):
    4-channel fused input, mel_conv2d local path + AFF gate for longer
    rows, global-only for short rows — vs torch at tiny geometry."""
    cfg_hf = transformers.ClapAudioConfig(
        **{**TINY_AUDIO, "enable_fusion": True})
    model = _randomize(
        transformers.ClapAudioModelWithProjection(cfg_hf), seed=21)
    cfg = CH.htsat_config_from_hf(cfg_hf)
    assert cfg.enable_fusion
    params = CH.convert_clap_audio(model.state_dict(), cfg)

    rng = np.random.default_rng(22)
    feats = rng.normal(size=(3, 4, 200, 16)).astype(np.float32)
    is_longer = np.array([True, False, True])
    with torch.inference_mode():
        want = model(torch.from_numpy(feats),
                     is_longer=torch.from_numpy(is_longer[:, None])
                     ).audio_embeds.numpy()
    want = want / np.linalg.norm(want, axis=-1, keepdims=True)
    got = np.asarray(CH.audio_embed(
        params, jnp.asarray(feats), cfg, is_longer=jnp.asarray(is_longer)))
    np.testing.assert_allclose(got, want, atol=3e-5)

    # init pytree shapes match the converted fused checkpoint
    import jax
    mine = CH.init_audio_params(jax.random.PRNGKey(0), cfg)
    assert jax.tree_util.tree_map(lambda a: np.shape(a), params) == \
        jax.tree_util.tree_map(lambda a: np.shape(a), mine)


def test_fusion_features_parity(monkeypatch):
    """clap_fusion_features vs ClapFeatureExtractor(truncation='fusion'):
    short clips (4x repeat, not longer) and long clips (bilinear global
    shrink + three crops, longer). HF draws crop starts with np.random;
    both sides are pinned to the first start of each third."""
    from multimodal_audio_search_tpu.audio import clap_features as CF

    fe = transformers.ClapFeatureExtractor(truncation="fusion",
                                           padding="repeatpad")
    rng = np.random.default_rng(23)

    wave = rng.normal(size=123_456).astype(np.float32) * 0.1   # short
    out = fe(wave, sampling_rate=48_000, return_tensors="np")
    want = out["input_features"][0]
    got, longer = CF.clap_fusion_features(wave)
    assert not longer          # truly short...
    # ...but HF forces one is_longer=True per all-short batch; the batch
    # helper reproduces that quirk
    assert bool(out["is_longer"][0])
    bf, bl = CF.clap_fusion_batch([wave])
    np.testing.assert_array_equal(bl, [True])
    assert got.shape == (1, 4, 1001, 64)
    np.testing.assert_allclose(got[0], want, atol=2e-4)
    np.testing.assert_allclose(bf[0], want, atol=2e-4)

    wave = rng.normal(size=700_000).astype(np.float32) * 0.1   # longer
    monkeypatch.setattr(np.random, "choice", lambda arr: arr[0])
    out = fe(wave, sampling_rate=48_000, return_tensors="np")
    want = out["input_features"][0]
    got, longer = CF.clap_fusion_features(wave)
    assert longer and bool(out["is_longer"][0])
    # crops are exact; the global channel's bilinear shrink runs f32 in
    # torch vs our f64 interpolation matrix (~4e-5 relative on dB values)
    np.testing.assert_allclose(got[0, 1:], want[1:], atol=2e-4)
    np.testing.assert_allclose(got[0, 0], want[0], atol=5e-3)


def test_init_shapes_match_converted_tiny():
    """Random-init pytrees are drop-in compatible with converted ones
    (training/clap.py can train the real architecture)."""
    import jax
    cfg_hf = transformers.ClapAudioConfig(**TINY_AUDIO)
    cfg = CH.htsat_config_from_hf(cfg_hf)
    model = _randomize(
        transformers.ClapAudioModelWithProjection(cfg_hf), seed=8)
    conv = CH.convert_clap_audio(model.state_dict(), cfg)
    mine = CH.init_audio_params(jax.random.PRNGKey(0), cfg)
    cs = jax.tree_util.tree_map(lambda a: np.shape(a), conv)
    ms = jax.tree_util.tree_map(lambda a: np.shape(a), mine)
    assert cs == ms

    tcfg = CH.roberta_config_from_hf(transformers.ClapTextConfig(**TINY_TEXT))
    full = transformers.ClapConfig(
        text_config=TINY_TEXT, audio_config=TINY_AUDIO, projection_dim=24)
    tconv = CH.convert_clap_text(
        _randomize(transformers.ClapModel(full), 9).state_dict(), tcfg)
    tmine = CH.init_text_params(jax.random.PRNGKey(1), tcfg)
    assert jax.tree_util.tree_map(lambda a: np.shape(a), tconv) == \
        jax.tree_util.tree_map(lambda a: np.shape(a), tmine)


def test_feature_extractor_parity():
    """clap_log_mel vs transformers.ClapFeatureExtractor (unfused config:
    rand_trunc + repeatpad + slaney filters), short and repeat-padded clips."""
    from multimodal_audio_search_tpu.audio import clap_features as CF

    fe = transformers.ClapFeatureExtractor(truncation="rand_trunc",
                                           padding="repeatpad")
    rng = np.random.default_rng(11)
    for n in (480_000, 123_456):          # exact-length and repeatpad paths
        wave = rng.normal(size=n).astype(np.float32) * 0.1
        want = fe(wave, sampling_rate=48_000,
                  return_tensors="np")["input_features"][0, 0]
        got = CF.clap_log_mel(wave)
        assert got.shape == want.shape == (1001, 64)
        np.testing.assert_allclose(got, want, atol=2e-4)


def test_feature_extractor_long_crop():
    """Clips over 10 s: a max_length crop at the requested offset matches the
    oracle run on the same crop (HF randomizes the offset; we parameterize)."""
    from multimodal_audio_search_tpu.audio import clap_features as CF

    fe = transformers.ClapFeatureExtractor(truncation="rand_trunc",
                                           padding="repeatpad")
    rng = np.random.default_rng(12)
    wave = rng.normal(size=500_000).astype(np.float32) * 0.1
    off = 7_000
    want = fe(wave[off:off + 480_000], sampling_rate=48_000,
              return_tensors="np")["input_features"][0, 0]
    got = CF.clap_log_mel(wave, crop_offset=off)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_end_to_end_wave_to_strategy_search():
    """Full laion-geometry path on random-init JAX params: 48 kHz wave ->
    frontend -> HTSAT embedding -> v1 strategy search over a mixed index."""
    import jax

    from multimodal_audio_search_tpu.audio import clap_features as CF
    from multimodal_audio_search_tpu.index.strategies import run_strategy

    cfg = CH.HTSATConfig()
    params = CH.init_audio_params(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(13)
    wave = rng.normal(size=96_000).astype(np.float32) * 0.1   # 2 s @ 48 kHz
    feats = CF.clap_input_features(wave)
    assert feats.shape == (1, 1, 1001, 64)
    z = np.asarray(CH.audio_embed(params, jnp.asarray(feats), cfg))[0]
    assert z.shape == (cfg.projection_dim,)

    ai = rng.normal(size=(20, cfg.projection_dim)).astype(np.float32)
    ai /= np.linalg.norm(ai, axis=-1, keepdims=True)
    ai[4] = z
    ti = rng.normal(size=(20, 8)).astype(np.float32)
    out = run_strategy("audio_only", "loud drums", ti[0], z, ti, ai, k=3)
    assert out["top"][0] == 4


def test_htsat_towers_are_trainable():
    """InfoNCE grads flow through both real-architecture towers (the
    training/clap.py recipe applies unchanged)."""
    import jax

    from multimodal_audio_search_tpu.models.clap import contrastive_loss

    acfg = CH.HTSATConfig(num_mel_bins=16, spec_size=64, patch_size=4,
                          patch_stride=(4, 4), patch_embed_dim=16,
                          depths=(2, 2), num_heads=(2, 4), window_size=4,
                          hidden_size=32, projection_dim=24)
    tcfg = CH.RobertaConfig(vocab_size=50, hidden=32, layers=1, heads=2,
                            intermediate=64, max_positions=24,
                            projection_dim=24)
    ap = CH.init_audio_params(jax.random.PRNGKey(3), acfg)
    tp = CH.init_text_params(jax.random.PRNGKey(4), tcfg)
    rng = np.random.default_rng(14)
    feats = jnp.asarray(rng.normal(size=(4, 1, 200, 16)).astype(np.float32))
    ids = jnp.asarray(rng.integers(2, 50, size=(4, 10)))
    mask = jnp.ones((4, 10), jnp.int32)

    def loss_fn(ap, tp):
        az = CH.audio_embed(ap, feats, acfg)
        tz = CH.text_embed(tp, ids, mask, tcfg)
        return contrastive_loss(az, tz)

    loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(ap, tp)
    assert np.isfinite(float(loss))
    gnorm = sum(float(jnp.sum(jnp.abs(g)))
                for g in jax.tree_util.tree_leaves(grads))
    assert gnorm > 0


def test_load_from_dir_roundtrip(tmp_path):
    """Checkpoint-dir loader: save a tiny random torch ClapModel the way HF
    does (config.json + pytorch_model.bin) and load it back."""
    import json

    full = transformers.ClapConfig(
        text_config=TINY_TEXT, audio_config=TINY_AUDIO, projection_dim=24)
    model = _randomize(transformers.ClapModel(full), seed=15)
    (tmp_path / "config.json").write_text(json.dumps(full.to_dict()))
    torch.save(model.state_dict(), tmp_path / "pytorch_model.bin")

    ap, tp, acfg, tcfg = CH.load_from_dir(str(tmp_path))
    assert acfg.window_size == 4 and tcfg.hidden == 32

    rng = np.random.default_rng(16)
    feats = rng.normal(size=(1, 1, 200, 16)).astype(np.float32)
    with torch.inference_mode():
        want = model.get_audio_features(torch.from_numpy(feats)).numpy()
    got = np.asarray(CH.audio_embed(ap, jnp.asarray(feats), acfg))
    np.testing.assert_allclose(got, want, atol=3e-5)
