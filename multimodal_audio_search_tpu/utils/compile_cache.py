"""Persistent XLA compilation cache.

On the tunneled TPU rig every fresh process pays 20-40 s of remote
compilation per distinct program (the bench's dominant startup cost);
the reference never compiles anything, so cold starts are a TPU-native
concern this module answers. One call persists compiled executables
under a cache directory so subsequent processes reuse them.

Enable by setting MAS_COMPILE_CACHE=<dir> (or calling enable(path)
directly); `enable_from_env()` is a no-op otherwise, so default behavior
is unchanged. Unsupported backends degrade to a silent no-op inside JAX
(the cache gates on executable-serialization support).

Known quirk: XLA:CPU cache hits log loud AOT machine-feature-mismatch
warnings even on the same host (XLA pseudo-features like
prefer-no-scatter aren't in the host's reported set); execution is
fine. The payoff case is the TPU, where each program costs 20-40 s of
remote compilation per process.
"""
from __future__ import annotations

import os
import pathlib


def enable(path: str | os.PathLike) -> str | None:
    """Enable the persistent compilation cache at ``path``. Safe to call
    more than once and at any point before (or between) compilations.

    Refuses on the experimental `axon` tunneled-TPU backend: measured
    twice on this rig, JAX's executable serialization DEADLOCKS the
    remote server (compiles hang minutes to ~45 min until the session
    resets). Real TPU/GPU/CPU backends are fine."""
    import jax
    d = jax.devices()[0]
    if "axon" in getattr(d.client, "platform_version", "").lower():
        import warnings
        warnings.warn("MAS_COMPILE_CACHE: persistent compilation cache "
                      "deadlocks the axon backend; not enabling",
                      stacklevel=2)
        return None
    target = pathlib.Path(path).expanduser()
    target.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(target))
    # cache everything with noticeable compile time; tiny programs
    # recompile faster than a cache round-trip
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return str(target)


def enable_from_env() -> str | None:
    """Enable iff MAS_COMPILE_CACHE names a directory; returns it."""
    env = os.environ.get("MAS_COMPILE_CACHE", "")
    if not env or env.lower() in ("off", "0", "false"):
        return None
    return enable(env)
