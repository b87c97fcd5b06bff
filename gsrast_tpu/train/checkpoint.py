"""Checkpoint / resume.

The reference persists only UI state (camera poses + screenshot path in LMDB,
/root/reference/apps/gsrast/Inspector.cpp:408-427) and reloads the scene from
.ply every start (GSRastWindow.cpp:24). SURVEY.md §5 requires real training
checkpointing: the full Gaussian parameter pytree + optimizer + densify state
+ step, with deterministic resume (training preempted at step k and resumed
produces the same states as an uninterrupted run, given the same camera
stream).

Orbax-backed; each step's state is a directory under `ckpt_dir/step_k`.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np

from ..scene.gaussians import GaussianScene
from .densify import DensifyState
from .trainer import TrainState


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save(ckpt_dir: str, state: TrainState, keep: int = 3) -> str:
    """Save a TrainState; prunes old checkpoints beyond `keep`."""
    step = int(state.step)
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step:08d}")
    _checkpointer().save(path, jax.device_get(state), force=True)
    _prune(ckpt_dir, keep)
    return path


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [
        int(d.split("_")[1])
        for d in os.listdir(ckpt_dir)
        if d.startswith("step_") and d.split("_")[1].isdigit()
    ]
    return max(steps) if steps else None


def restore(ckpt_dir: str, template: TrainState,
            step: Optional[int] = None) -> Optional[TrainState]:
    """Restore the given (or latest) step. `template` supplies the pytree
    structure/dtypes; returns None when no checkpoint exists."""
    step = latest_step(ckpt_dir) if step is None else step
    if step is None:
        return None
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step:08d}")
    restored = _checkpointer().restore(path, item=jax.device_get(template))
    return jax.tree.map(
        lambda t, r: jax.numpy.asarray(r, getattr(t, "dtype", None)),
        template,
        restored,
    )


def _prune(ckpt_dir: str, keep: int) -> None:
    import shutil

    steps = sorted(
        d for d in os.listdir(ckpt_dir) if d.startswith("step_")
    )
    for d in steps[:-keep] if keep > 0 else []:
        shutil.rmtree(os.path.join(ckpt_dir, d), ignore_errors=True)
