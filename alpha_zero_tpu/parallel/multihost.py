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
  counts across hosts with ``global_game_count``.

Single-host behavior is unchanged: with one process these helpers reduce to
the local mesh in ``parallel/mesh.py``.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initializes jax.distributed (no-op when single-process or already up)."""
    if jax.process_count() > 1:
        return
    if coordinator_address is None:
        return  # single host
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_global_mesh(mdl: int = 1) -> Mesh:
    """('dp', 'mdl') mesh over ALL devices of all hosts; dp spans hosts so
    the gradient all-reduce crosses ICI first, DCN only between slices."""
    devices = jax.devices()
    n = len(devices)
    if n % mdl != 0:
        raise ValueError(f"{n} global devices not divisible by mdl={mdl}")
    return Mesh(np.asarray(devices).reshape(n // mdl, mdl), ("dp", "mdl"))


def host_local_batch_to_global(mesh: Mesh, local_batch: np.ndarray) -> jax.Array:
    """Forms a globally dp-sharded array from each host's local rows.

    Every host passes its own ``local_batch`` (its fraction of the global
    batch); the result is one logical array of shape
    [num_hosts * local_rows, ...] sharded over 'dp'.
    """
    sharding = NamedSharding(mesh, P("dp"))
    global_shape = (local_batch.shape[0] * jax.process_count(),) + local_batch.shape[1:]
    return jax.make_array_from_process_local_data(sharding, local_batch, global_shape)


def global_game_count(local_count: int) -> int:
    """Sums per-host finished-game counts (the multi-host generation fence)."""
    if jax.process_count() == 1:
        return local_count
    import jax.numpy as jnp

    counts = jax.make_array_from_process_local_data(
        NamedSharding(make_global_mesh(), P("dp")),
        np.asarray([local_count], np.int64),
        (jax.process_count(),),
    )
    return int(jnp.sum(counts))
