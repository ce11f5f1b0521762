"""Multi-host scale-out: global mesh, per-host self-play, DP learner.

The reference scales by spawning more mp.Process actors on one machine
(training_go.py:276-347) and has no multi-device training at all. The TPU
design scales across hosts with ``jax.distributed`` and a GLOBAL device mesh:

- every host runs the SAME program; the self-play game batch and the training
  batch are globally sharded over 'dp', so each host's chips step their local
  shard of games and the learner's gradient psum rides ICI within a slice /
  DCN across slices — XLA inserts the collectives from the shardings.
- experience stays host-local: each host harvests the games its local shard
  finished into its local replay partition, and samples its local fraction of
  every global train batch (uniform-over-union sampling, equivalent in
  distribution to the reference's single uniform buffer). There is no
  experience streaming to a central learner host — the learner is data
  parallel, so the data never has to move.
- per-generation weight "distribution" to actors is the identity: weights are
  already resident and replicated/sharded on every chip (replacing the
  reference's checkpoint-file polling, pipeline.py:232-239).
- the generation fence (games-per-checkpoint pacing) aggregates finished-game
  counts across hosts with ``global_game_count`` so every process flips from
  self-play to training on the same step; the resignation-threshold controller
  runs on process 0 (the reference's single learner, pipeline.py:519-553) and
  its threshold is broadcast each generation.

Single-host behavior is unchanged: with one process these helpers reduce to
the local mesh in ``parallel/mesh.py``.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initializes ``jax.distributed``. MUST run before anything touches the
    JAX backend (device queries included) — so this is called from the CLI
    entry point straight after config parsing, never from inside Trainer.
    No-op when no coordinator address is configured (single host)."""
    if not coordinator_address:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_global_mesh(mdl: int = 1) -> Mesh:
    """('dp', 'mdl') mesh over ALL devices of all hosts. ``jax.devices()``
    orders devices by process, so each host's chips form contiguous 'dp'
    blocks — the gradient all-reduce crosses ICI first, DCN only between
    hosts."""
    devices = jax.devices()
    n = len(devices)
    if n % mdl != 0:
        raise ValueError(f"{n} global devices not divisible by mdl={mdl}")
    return Mesh(np.asarray(devices).reshape(n // mdl, mdl), ("dp", "mdl"))


def local_to_global(mesh: Mesh, local_tree: Any) -> Any:
    """Forms globally dp-sharded arrays from each host's local rows.

    Every host passes its own pytree of ``[local_rows, ...]`` arrays (its
    fraction of the global batch); each leaf becomes one logical array of
    shape [num_hosts * local_rows, ...] sharded over 'dp'.
    """
    nproc = jax.process_count()

    def f(x):
        x = np.asarray(x)
        sharding = NamedSharding(mesh, P("dp", *([None] * (x.ndim - 1))))
        global_shape = (x.shape[0] * nproc,) + x.shape[1:]
        return jax.make_array_from_process_local_data(sharding, x, global_shape)

    return jax.tree.map(f, local_tree)


def global_to_local(global_tree: Any) -> Any:
    """This host's rows of globally dp-sharded arrays, as host numpy
    (ordered by global row index — each host owns one contiguous block)."""

    def f(x):
        # Batch arrays are sharded P('dp') on a ('dp', 'mdl') mesh, so with
        # mdl > 1 every row block is REPLICATED across the mdl axis and shows
        # up once per mdl device with an identical index — keep exactly one
        # shard per distinct row-start or the local batch gets duplicated
        # (and misordered) rows.
        uniq = {}
        for s in x.addressable_shards:
            start = s.index[0].start if s.index[0].start is not None else 0
            uniq.setdefault(start, s)
        return np.concatenate(
            [np.asarray(uniq[start].data) for start in sorted(uniq)], axis=0
        )

    return jax.tree.map(f, global_tree)


def replicate_to_global(mesh: Mesh, tree: Any) -> Any:
    """Places host-identical values (same on every process, e.g. params built
    from a shared seed) as fully-replicated global arrays on ``mesh``."""
    sharding = NamedSharding(mesh, P())

    def f(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(sharding, x, x.shape)

    return jax.tree.map(f, tree)


def global_sum(local_values, mesh: Optional[Mesh] = None) -> np.ndarray:
    """Element-wise sum of a small int64 vector across processes (one
    allgather). Used by the generation fence to move the per-step counters —
    finished games, resign-marked, could-have-won — in a single collective
    every ``fence_interval`` steps instead of one allgather per step
    (the reference's fence granularity is per-queue-item, pipeline.py:485-497).
    A collective: every process must call it at the same point."""
    arr = np.atleast_1d(np.asarray(local_values, np.int64))
    if jax.process_count() == 1:
        return arr
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(arr)
    return np.sum(gathered, axis=0)


def host_resident_value(tree: Any) -> Any:
    """Reassembles full host-numpy arrays from THIS host's addressable shards
    — no collective. Valid when every host holds a complete copy, i.e. the
    arrays are replicated over 'dp' and sharded at most over 'mdl' (the
    trainer's parameter layout: each host's chips span all 'mdl' columns).
    Lets host0 evaluate from resident weights instead of dragging every
    process through a params allgather (reference evaluator reads a ckpt
    file instead, pipeline.py:760-763)."""

    def f(x):
        out = np.empty(x.shape, x.dtype)
        seen = set()
        covered = 0
        for s in x.addressable_shards:
            key = tuple((sl.start, sl.stop) for sl in s.index)
            if key in seen:
                continue
            seen.add(key)
            data = np.asarray(s.data)
            out[s.index] = data
            covered += data.size
        if covered != x.size:
            raise ValueError(
                f"array of shape {x.shape} is not fully host-resident "
                f"({covered}/{x.size} elements addressable); it must be "
                "replicated over 'dp' to evaluate from resident weights"
            )
        return out

    return jax.tree.map(f, tree)


def global_game_count(local_count: int, mesh: Optional[Mesh] = None) -> int:
    """Sums per-host finished-game counts (the multi-host generation fence,
    replacing the reference learner's central queue accounting,
    pipeline.py:485-497). A collective: every process must call it at the
    same point."""
    if jax.process_count() == 1:
        return local_count
    from jax.experimental import multihost_utils

    counts = multihost_utils.process_allgather(np.int64(local_count))
    return int(np.sum(counts))


def broadcast_from_host0(value: float, mesh: Mesh) -> float:
    """Broadcasts a host-side control scalar (e.g. the resignation threshold)
    from process 0 to every process — the multi-host stand-in for the
    reference's ``Manager.Value`` control plane (training_go.py:282-283)."""
    if jax.process_count() == 1:
        return value
    from jax.experimental import multihost_utils

    return float(multihost_utils.broadcast_one_to_all(np.float32(value)))
