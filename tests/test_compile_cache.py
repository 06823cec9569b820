"""Persistent XLA compilation cache utility (opt-in via
MAS_COMPILE_CACHE; tunneled-TPU cold starts pay 20-40 s per program)."""
import os

import numpy as np


def test_enable_populates_cache(tmp_path, monkeypatch):
    import jax
    import jax.numpy as jnp
    from multimodal_audio_search_tpu.utils.compile_cache import (
        enable, enable_from_env)

    assert enable_from_env() is None          # unset -> no-op
    monkeypatch.setenv("MAS_COMPILE_CACHE", "off")
    assert enable_from_env() is None

    d = tmp_path / "xla"
    assert enable(d) == str(d)
    # drop the threshold so the toy program below qualifies
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    try:
        @jax.jit
        def f(x):
            for _ in range(20):
                x = jnp.tanh(x @ x) + x
            return x
        _ = np.asarray(f(jnp.ones((64, 64), jnp.float32)).ravel()[0])
        assert len(os.listdir(d)) > 0          # executable persisted
    finally:
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.5)
        jax.config.update("jax_compilation_cache_dir", None)
