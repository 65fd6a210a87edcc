"""Orbax checkpointing of learner + env state.

The reference delegates checkpointing to SB3 ``model.save`` + wandb
(wandb_callback.py:134-151) and never checkpoints env state. Here the entire
train state — learner params/optimizers AND the vectorized env state pytree
and replay buffer — is one pytree, so save/restore is exact: training resumes
bit-identically, envs mid-episode included.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import jax
import orbax.checkpoint as ocp


def save_checkpoint(path, train_state, step: int, include_buffer: bool = True):
    """Save a train-state pytree under ``path/step``.

    ``include_buffer=False`` drops the replay buffer from the saved state
    (SAC buffers are by far the largest leaf — e.g. 2+ GB at the reference's
    400k capacity — and fetching them off-device dominates checkpoint time).
    Restoring such a "light" checkpoint requires a template with
    ``buffer=None`` (see :func:`restore_checkpoint`); training then resumes
    with a fresh, empty buffer.
    """
    path = Path(path).absolute()
    if not include_buffer and getattr(train_state, "buffer", None) is not None:
        train_state = train_state.replace(buffer=None)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path / str(step), train_state, force=True)


def restore_checkpoint(path, template, step: int | None = None):
    """Restore into the shape of ``template`` (an abstract or concrete state).

    If ``step`` is None the latest step directory under ``path`` is used.
    """
    path = Path(path).absolute()
    if step is None:
        steps = sorted(
            (int(p.name) for p in path.iterdir() if p.name.isdigit()),
        )
        if not steps:
            raise FileNotFoundError(f"no checkpoints under {path}")
        step = steps[-1]
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path / str(step), abstract), step
