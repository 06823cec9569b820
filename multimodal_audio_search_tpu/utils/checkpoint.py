"""Pytree checkpointing (model params + optimizer state).

The reference has no checkpointing at all (SURVEY.md §5 — its database and
any trained bridge weights die with the process). This provides:

  * ``save_pytree`` / ``load_pytree``: any params/opt-state pytree to a
    single npz (keys are '/'-joined pytree paths) — dependency-free and
    mmap-friendly,
  * ``TrainCheckpointer``: numbered step checkpoints with retention and a
    LATEST pointer, for the training loops in training/.

Orbax is available in the image for sharded multi-host checkpoints; this
single-host format is deliberately simpler and survives version skew.
"""
from __future__ import annotations

import json
import pathlib
import re
from typing import Any

import jax
import numpy as np


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def save_pytree(tree: Any, path: str | pathlib.Path) -> None:
    flat = {}
    def record(p, leaf):
        flat[_path_str(p)] = np.asarray(leaf)
    jax.tree_util.tree_map_with_path(record, tree)
    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez(path, **flat)


def load_pytree(template: Any, path: str | pathlib.Path) -> Any:
    """Load into the structure of ``template`` (shapes/dtypes from file)."""
    z = np.load(pathlib.Path(path), allow_pickle=False)
    def restore(p, leaf):
        key = _path_str(p)
        if key not in z:
            raise KeyError(f"checkpoint missing leaf {key!r}")
        return z[key]
    return jax.tree_util.tree_map_with_path(restore, template)


class TrainCheckpointer:
    def __init__(self, directory: str | pathlib.Path, keep: int = 3):
        self.dir = pathlib.Path(directory)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.keep = keep

    def save(self, step: int, params: Any, opt_state: Any = None,
             metadata: dict | None = None) -> pathlib.Path:
        p = self.dir / f"step_{step:08d}"
        save_pytree(params, p.with_suffix(".params.npz"))
        if opt_state is not None:
            save_pytree(opt_state, p.with_suffix(".opt.npz"))
        (p.with_suffix(".meta.json")).write_text(
            json.dumps({"step": step, **(metadata or {})}))
        (self.dir / "LATEST").write_text(str(step))
        self._gc()
        return p

    def latest_step(self) -> int | None:
        f = self.dir / "LATEST"
        return int(f.read_text()) if f.exists() else None

    def restore(self, params_template: Any, opt_template: Any = None,
                step: int | None = None):
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.dir}")
        p = self.dir / f"step_{step:08d}"
        params = load_pytree(params_template, p.with_suffix(".params.npz"))
        opt = None
        if opt_template is not None and \
                p.with_suffix(".opt.npz").exists():
            opt = load_pytree(opt_template, p.with_suffix(".opt.npz"))
        meta = json.loads(p.with_suffix(".meta.json").read_text())
        return params, opt, meta

    def _gc(self) -> None:
        steps = sorted({
            int(m.group(1))
            for f in self.dir.glob("step_*.params.npz")
            if (m := re.match(r"step_(\d+)\.params", f.name))})
        for s in steps[: -self.keep]:
            for suffix in (".params.npz", ".opt.npz", ".meta.json"):
                f = self.dir / f"step_{s:08d}{suffix}"
                if f.exists():
                    f.unlink()
