import numpy as np
import pytest

from multimodal_audio_search_tpu.models import whisper as W
from multimodal_audio_search_tpu.training.finetune import TrainConfig
from multimodal_audio_search_tpu.training.loop import finetune_captioner
from multimodal_audio_search_tpu.utils.loader import PrefetchLoader, batched


def tiny_cfg():
    return W.WhisperConfig(
        vocab_size=64, d_model=16, enc_layers=1, dec_layers=1, heads=2,
        ffn=32, enc_positions=20, dec_positions=12,
        bos_token_id=60, eos_token_id=61, pad_token_id=61)


def make_batches(rng, n_batches, b):
    for _ in range(n_batches):
        yield {
            "mel": rng.normal(size=(b, 80, 40)).astype(np.float32),
            "tokens": np.tile(np.arange(8, dtype=np.int32), (b, 1)),
            "loss_mask": np.ones((b, 7), np.float32),
        }


def test_finetune_loop_with_checkpoint_resume(rng, tmp_path):
    cfg = tiny_cfg()
    res = finetune_captioner(
        make_batches(rng, 6, 8), cfg,
        TrainConfig(learning_rate=3e-3),
        n_devices=4, model_parallel=2,
        checkpoint_dir=str(tmp_path), checkpoint_every=3,
        log_fn=lambda s: None)
    assert res.steps == 6
    assert res.losses[-1] < res.losses[0]

    # resume continues the step counter from the checkpoint, and restored
    # params keep their TP/DP shardings (not silently replicated host copies)
    res2 = finetune_captioner(
        make_batches(rng, 2, 8), cfg,
        TrainConfig(learning_rate=3e-3),
        n_devices=4, model_parallel=2,
        checkpoint_dir=str(tmp_path), resume=True,
        log_fn=lambda s: None)
    assert res2.steps == 8
    import jax
    from jax.sharding import PartitionSpec as P
    specs = {jax.tree_util.keystr(p): leaf.sharding.spec
             for p, leaf in jax.tree_util.tree_leaves_with_path(res2.params)}
    assert any(s in (P(None, "model"), P("model", None))
               for s in specs.values()), "resume lost TP shardings"

    # fast_forward_data: same full-dataset iterator on resume -> the already-
    # consumed prefix is skipped, not replayed
    res3 = finetune_captioner(
        make_batches(rng, 10, 8), cfg,
        TrainConfig(learning_rate=3e-3),
        n_devices=4, model_parallel=2,
        checkpoint_dir=str(tmp_path), resume=True,
        fast_forward_data=True, log_fn=lambda s: None)
    assert res3.steps == 10  # resumed at 8, consumed 10-8=2 fresh batches


def test_prefetch_loader_order_and_errors():
    assert list(PrefetchLoader(range(5))) == [0, 1, 2, 3, 4]

    def boom():
        yield 1
        raise RuntimeError("broken source")
    it = PrefetchLoader(boom())
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="broken source"):
        list(it)

    chunks = list(batched(list(range(7)), 3, tuple))
    assert chunks == [(0, 1, 2), (3, 4, 5), (6,)]


def test_lr_schedules():
    """warmup_cosine: 0 at step 0, peak after warmup, decays to
    end_lr_frac * peak; constant+warmup ramps linearly."""
    from multimodal_audio_search_tpu.training.finetune import (
        TrainConfig, make_schedule)
    import numpy as np

    cfg = TrainConfig(learning_rate=1e-3, schedule="warmup_cosine",
                      warmup_steps=10, total_steps=100, end_lr_frac=0.1)
    s = make_schedule(cfg)
    assert float(s(0)) == pytest.approx(0.0, abs=1e-9)
    assert float(s(10)) == pytest.approx(1e-3, rel=1e-6)
    assert float(s(100)) == pytest.approx(1e-4, rel=1e-3)
    mid = float(s(55))
    assert 1e-4 < mid < 1e-3

    warm = make_schedule(TrainConfig(learning_rate=1e-3,
                                     warmup_steps=4))
    assert float(warm(2)) == pytest.approx(5e-4, rel=1e-6)
    assert float(warm(4)) == pytest.approx(1e-3, rel=1e-6)
    const = make_schedule(TrainConfig(learning_rate=1e-3))
    assert float(const(0)) == float(const(999)) == pytest.approx(1e-3)
    with pytest.raises(ValueError):
        make_schedule(TrainConfig(schedule="nope"))
