"""Analytic roofline models (utils/roofline.py) — these feed the
recorded BENCH json's MFU/HBM fractions; hand-computed spot checks
guard the formulas."""
from multimodal_audio_search_tpu.models.whisper import WhisperConfig
from multimodal_audio_search_tpu.utils import roofline as R

CFG = WhisperConfig(vocab_size=1000, d_model=64, enc_layers=2,
                    dec_layers=3, heads=4, ffn=128,
                    enc_positions=100, dec_positions=32)


def test_decode_step_flops_hand_count():
    B, T, L = 8, 50, 16
    d, ffn, layers, V = 64, 128, 3, 1000
    proj = 6 * 2 * B * d * d
    self_a = 2 * 2 * B * L * d
    cross_a = 2 * 2 * B * T * d
    mlp = 2 * 2 * B * d * ffn
    logits = 2 * B * d * V
    assert R.decode_step_flops(CFG, B, T, L) == \
        layers * (proj + self_a + cross_a + mlp) + logits


def test_decode_step_hbm_bytes_int8_vs_bf16():
    B, T, L = 8, 50, 16
    bf16 = R.decode_step_hbm_bytes(CFG, B, T, L, kv_bytes=2)
    i8 = R.decode_step_hbm_bytes(CFG, B, T, L, kv_bytes=1)
    # int8 halves the cross-KV term but adds f32 scales
    cross_bf16 = 3 * B * 4 * T * 16 * 2 * 2
    cross_i8 = 3 * B * 4 * T * 16 * 2 * 1 + 3 * B * 4 * T * 2 * 4
    assert bf16 - i8 == cross_bf16 - cross_i8
    assert i8 < bf16


def test_encoder_flops_scales_linearly_in_batch():
    one = R.encoder_flops(CFG, 1, 200)
    eight = R.encoder_flops(CFG, 8, 200)
    assert eight == 8 * one


def test_search_hbm_bytes():
    # [N, 2, D] index in the given itemsize
    assert R.search_hbm_bytes(1000, 384, 4) == 1000 * 2 * 384 * 4


def test_stage_time_extra_operands():
    """bench._stage_time must thread extra arrays as jit operands (the
    closure-bake alternative hits the compile service's request-body
    limit at 30 s shapes) and still time a correct program."""
    import sys, pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    import jax.numpy as jnp
    from bench import _stage_time

    a = jnp.ones((8, 16))
    w = jnp.full((16, 4), 2.0)
    s = _stage_time(lambda x, w: x @ w, a, 2, 0.0, w)
    assert s > 0
    # and the no-extra form still works
    s2 = _stage_time(lambda x: x * 3.0, a, 2, 0.0)
    assert s2 > 0
