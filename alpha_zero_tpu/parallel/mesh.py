"""Device mesh and sharding layout for multi-chip scale-out.

The reference has no tensor-level parallelism — its fleet is mp.Process actors
plus a single-GPU learner (training_go.py:276-347). The TPU design scales with
``jax.sharding`` over a 2D mesh:

- ``dp`` (data parallel): the self-play game batch and the training batch are
  sharded over ``dp``; XLA inserts psum gradient collectives over ICI for the
  learner — this is the moral equivalent of the reference's actor data
  parallelism plus the gradient sync it never had.
- ``mdl`` (model/tensor parallel): output-channel dimensions of the conv and
  FC kernels are sharded over ``mdl``. At AlphaZero model sizes (≤ ~23M
  params) this axis is optional — TP/PP exist for generality and are exercised
  by the multi-chip dry-run; SP/CP/ring-attention have no analogue for a
  fixed-size conv input and are intentionally N/A (see SURVEY.md §2).

Weights live replicated over ``dp`` and sharded over ``mdl``; per-generation
weight "distribution" to self-play is the identity (same devices, same
sharding) rather than the reference's checkpoint-file polling
(pipeline.py:232-239).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, mdl: int = 1,
              devices=None) -> Mesh:
    """Builds a ('dp', 'mdl') mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % mdl != 0:
        raise ValueError(f"{n} devices not divisible by mdl={mdl}")
    dp = n // mdl
    return Mesh(np.asarray(devices).reshape(dp, mdl), ("dp", "mdl"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch/game) dimension over 'dp'."""
    return NamedSharding(mesh, P("dp"))


def _param_spec(path: str, leaf, mdl_size: int) -> P:
    """Shards the trailing (output-feature) dim over 'mdl' when it divides;
    small vectors (BN scales, biases) stay replicated."""
    if mdl_size <= 1 or leaf.ndim < 2:
        return P()
    if leaf.shape[-1] % mdl_size != 0:
        return P()
    return P(*([None] * (leaf.ndim - 1) + ["mdl"]))


def param_shardings(mesh: Mesh, params: Any) -> Any:
    mdl_size = mesh.shape["mdl"]
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    specs = [
        NamedSharding(mesh, _param_spec(jax.tree_util.keystr(path), leaf, mdl_size))
        for path, leaf in flat
    ]
    return jax.tree_util.tree_unflatten(treedef, specs)


def shard_train_state(mesh: Mesh, state, tx) -> Any:
    """Places a TrainState on the mesh: params mdl-sharded where possible,
    batch_stats/counters replicated. The optimizer state is re-initialized
    under jit from the sharded params so its momentum traces inherit the
    params' shardings via XLA propagation (only valid for a fresh state —
    resume restores into an already-sharded template)."""
    p_shard = param_shardings(mesh, state.params)
    params = jax.tree.map(jax.device_put, state.params, p_shard)
    batch_stats = jax.tree.map(
        lambda x: jax.device_put(x, replicated(mesh)), state.batch_stats
    )
    opt_state = jax.jit(tx.init)(params)
    return state.replace(
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        training_steps=jax.device_put(state.training_steps, replicated(mesh)),
    )
