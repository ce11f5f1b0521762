"""Orbax checkpointing for train state (+ helpers for actors/evaluators).

Replaces the reference's ``torch.save`` dict checkpoints
(pipeline.py:596-606): contents are {params, batch_stats, opt_state,
training_steps} so training resumes bit-exact. On a single host, checkpoint
files still double as the evaluator's weight-ingest channel (as in the
reference); across chips, weights move device-to-device instead.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from alpha_zero_tpu.training.learner import TrainState


def save_checkpoint(ckpt_dir: str, state: TrainState, training_steps: int) -> str:
    """Writes ``ckpt_dir/training_steps_{t}`` and returns its path.

    Multi-process: a collective — every process calls this and orbax writes
    each array's shards directly from its owning devices (no host gather of
    the global state, unlike the reference's single-GPU ``torch.save``,
    pipeline.py:596-606)."""
    path = os.path.abspath(os.path.join(ckpt_dir, f"training_steps_{training_steps}"))
    payload = state if jax.process_count() > 1 else jax.device_get(state)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, payload, force=True)
    return path


def _abstract_like(x):
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
    return ocp.utils.to_shape_dtype_struct(np.asarray(x))


def restore_checkpoint(path: str, target: TrainState) -> TrainState:
    """Restores into the structure of ``target`` (shapes/dtypes/shardings
    template — sharded leaves come back with their global shardings)."""
    with ocp.StandardCheckpointer() as ckptr:
        abstract = jax.tree.map(_abstract_like, target)
        return ckptr.restore(os.path.abspath(path), abstract)


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    candidates = []
    for name in os.listdir(ckpt_dir):
        if name.startswith("training_steps_"):
            try:
                candidates.append((int(name.rsplit("_", 1)[1]), name))
            except ValueError:
                continue
    if not candidates:
        return None
    return os.path.join(ckpt_dir, max(candidates)[1])


def checkpoint_step(path: str) -> int:
    return int(os.path.basename(path).rsplit("_", 1)[1])
