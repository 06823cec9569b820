import numpy as np

from multimodal_audio_search_tpu.pipelines.longform import (
    chunk_windows, merge_overlapping_texts)


def test_merge_overlapping_texts():
    assert merge_overlapping_texts(
        ["the quick brown fox", "brown fox jumps over", "over the lazy dog"]
    ) == "the quick brown fox jumps over the lazy dog"
    assert merge_overlapping_texts(["hello world"]) == "hello world"
    assert merge_overlapping_texts([]) == ""
    # no overlap -> plain concatenation
    assert merge_overlapping_texts(["a b", "c d"]) == "a b c d"
    # total overlap -> dedup
    assert merge_overlapping_texts(["a b c", "a b c"]) == "a b c"


def test_chunk_windows_geometry():
    sr = 16000
    wins = chunk_windows(int(25 * sr), sr, chunk_s=10.0, stride_s=2.0)
    # advance = 6 s: starts 0, 6, 12, 18 (18 s window covers to 25 s)
    assert [w[0] // sr for w in wins] == [0, 6, 12, 18]
    assert wins[0][1] == 10 * sr
    assert wins[-1][1] == 7 * sr      # tail
    # short audio -> single window
    assert chunk_windows(int(4 * sr), sr) == [(0, int(4 * sr))]
    import pytest
    with pytest.raises(ValueError):
        chunk_windows(16000, 16000, chunk_s=4.0, stride_s=2.0)


def test_cli_roundtrip(tmp_path, rng, monkeypatch):
    """CLI ingest -> search -> stats with tiny injected models."""
    import json
    from multimodal_audio_search_tpu import cli
    from multimodal_audio_search_tpu.audio.wav import write_wav

    # steer the default engine to tiny models by monkeypatching the builder
    import jax.numpy as jnp
    from multimodal_audio_search_tpu import AudioSearchEngine, EngineConfig
    from multimodal_audio_search_tpu.config import DecodeConfig, MelConfig
    from multimodal_audio_search_tpu.models import whisper as W
    from multimodal_audio_search_tpu.models.minilm import MiniLMConfig
    from multimodal_audio_search_tpu.pipelines.embed import TextEmbedder
    from multimodal_audio_search_tpu.pipelines.ingest import (
        DualPipelineIngest)
    from multimodal_audio_search_tpu.pipelines.whisper_pipeline import (
        WhisperTextPipeline)

    def tiny_engine(args):
        wcfg = W.WhisperConfig(
            vocab_size=128, d_model=32, enc_layers=1, dec_layers=1, heads=2,
            ffn=64, enc_positions=150, dec_positions=12,
            bos_token_id=100, eos_token_id=101, pad_token_id=101)
        mel = MelConfig(padded_seconds=3.0)
        d = DecodeConfig(max_new_tokens=4)
        cfg = EngineConfig(ingest_batch=4)
        ing = DualPipelineIngest(
            WhisperTextPipeline(cfg=wcfg, decode=d, mel_cfg=mel,
                                dtype=jnp.float32, name="asr"),
            WhisperTextPipeline(cfg=wcfg, decode=d, mel_cfg=mel,
                                dtype=jnp.float32, name="caption", seed=1,
                                prefix_ids=[wcfg.bos_token_id]),
            TextEmbedder(cfg=MiniLMConfig(vocab_size=512, hidden=384,
                                          layers=1, heads=4,
                                          intermediate=256)),
            cfg)
        eng = AudioSearchEngine(cfg=cfg, ingest_pipeline=ing)
        if args.index:
            import pathlib
            if (pathlib.Path(args.index) / "embeddings.npz").exists():
                eng.load_index(args.index)
        return eng

    monkeypatch.setattr(cli, "_engine", tiny_engine)

    wav = tmp_path / "a.wav"
    write_wav(str(wav), (rng.normal(size=16000 * 7) * 0.3)
              .astype(np.float32), 16000)
    idx = str(tmp_path / "idx")

    rc = cli.main(["--index", idx, "ingest", str(wav)])
    assert rc == 0
    # the index really persisted (a subparser default once clobbered the
    # main-level --index, silently skipping the save)
    import pathlib
    assert (pathlib.Path(idx) / "embeddings.npz").exists()

    import io
    from contextlib import redirect_stdout
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = cli.main(["--index", idx, "search", "music", "-k", "3"])
    assert rc == 0
    out = json.loads(buf.getvalue())
    assert "weight_info" in out and "results" in out

    buf = io.StringIO()
    with redirect_stdout(buf):
        assert cli.main(["stats"]) == 0
    assert "models" in json.loads(buf.getvalue())


def test_cli_strategy_and_delete(tmp_path, rng, monkeypatch, capsys):
    """--strategy routes to the historical dispatch; delete removes a
    source and persists; sharded/mmap layouts load via --index."""
    import json
    from multimodal_audio_search_tpu import cli
    from multimodal_audio_search_tpu.audio.wav import write_wav
    import jax.numpy as jnp
    from multimodal_audio_search_tpu import AudioSearchEngine, EngineConfig
    from multimodal_audio_search_tpu.config import DecodeConfig, MelConfig
    from multimodal_audio_search_tpu.models import whisper as W
    from multimodal_audio_search_tpu.models.minilm import MiniLMConfig
    from multimodal_audio_search_tpu.pipelines.embed import TextEmbedder
    from multimodal_audio_search_tpu.pipelines.ingest import (
        DualPipelineIngest)
    from multimodal_audio_search_tpu.pipelines.whisper_pipeline import (
        WhisperTextPipeline)

    def tiny_engine(args):
        wcfg = W.WhisperConfig(
            vocab_size=128, d_model=32, enc_layers=1, dec_layers=1,
            heads=2, ffn=64, enc_positions=150, dec_positions=12,
            bos_token_id=100, eos_token_id=101, pad_token_id=101)
        cfg = EngineConfig(ingest_batch=4)
        ing = DualPipelineIngest(
            WhisperTextPipeline(cfg=wcfg,
                                decode=DecodeConfig(max_new_tokens=4),
                                mel_cfg=MelConfig(padded_seconds=3.0),
                                dtype=jnp.float32, name="asr"),
            WhisperTextPipeline(cfg=wcfg,
                                decode=DecodeConfig(max_new_tokens=4),
                                mel_cfg=MelConfig(padded_seconds=3.0),
                                dtype=jnp.float32, name="caption", seed=1,
                                prefix_ids=[100]),
            TextEmbedder(cfg=MiniLMConfig(vocab_size=512, hidden=384,
                                          layers=1, heads=4,
                                          intermediate=256)),
            cfg)
        eng = AudioSearchEngine(cfg=cfg, ingest_pipeline=ing)
        if args.index:
            import pathlib
            root = pathlib.Path(args.index)
            if any((root / f).exists() for f in
                   ("embeddings.npz", "emb.npy", "manifest.json")):
                eng.load_index(args.index)
        return eng

    monkeypatch.setattr(cli, "_engine", tiny_engine)
    wav = tmp_path / "b.wav"
    write_wav(str(wav), (rng.normal(size=16000 * 7) * 0.3)
              .astype(np.float32), 16000)
    idx = str(tmp_path / "idx2")
    assert cli.main(["--index", idx, "ingest", str(wav)]) == 0
    capsys.readouterr()

    # mmap layout round-trips through the CLI loader
    from multimodal_audio_search_tpu.index.store import SegmentStore
    st = SegmentStore.load(idx)
    st.save(idx, mmap=True)

    assert cli.main(["--index", idx, "search", "music",
                     "--strategy", "adaptive_weighting"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["weight_info"]["strategy"] == "adaptive_weighting"

    assert cli.main(["--index", idx, "delete", str(wav)]) == 0
    msg = capsys.readouterr().out
    assert "removed" in msg
    assert len(SegmentStore.load(idx)) == 0
