"""Subprocess worker for the 2-process multi-host test (not a pytest file).

Each process gets 2 virtual CPU devices; together they form a global
('dp': 4, 'mdl': 1) mesh and run the full Trainer loop — globally sharded
self-play, host-local replay, DP learner, collective orbax checkpoint —
the topology that replaces the reference's mp.Process fleet
(training_go.py:276-347).

Usage: python multihost_worker.py <process_id> <num_processes> <port> <workdir> [mdl]

With mdl=2 each host's 2 virtual devices span the model axis (global mesh
('dp': nproc, 'mdl': 2)): batch rows are REPLICATED across each host's mdl
pair, exercising the ``global_to_local`` shard dedup for real across
processes.
"""

import os
import sys

pid, nproc, port, workdir = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4],
)
mdl = int(sys.argv[5]) if len(sys.argv) > 5 else 1
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from alpha_zero_tpu.parallel import multihost  # noqa: E402

multihost.initialize(
    coordinator_address=f"localhost:{port}", num_processes=nproc, process_id=pid
)
assert jax.process_count() == nproc, jax.process_count()
assert jax.device_count() == 2 * nproc

import dataclasses  # noqa: E402

from alpha_zero_tpu.config import get_config  # noqa: E402
from alpha_zero_tpu.training.pipeline import Trainer  # noqa: E402


def override(cfg, **sections):
    updates = {
        name: dataclasses.replace(getattr(cfg, name), **fields)
        for name, fields in sections.items()
    }
    return dataclasses.replace(cfg, **updates)


cfg = override(
    get_config("gomoku9"),
    env=dict(board_size=5, num_to_win=4, max_steps=25, num_stack=2),
    network=dict(num_res_blocks=1, num_filters=8, num_fc_units=8),
    search=dict(num_simulations=4, warm_up_steps=4, reuse_subtree=True),
    parallel=dict(selfplay_batch_size=4, dp=(2 * nproc) // mdl, mdl=mdl),
    train=dict(min_games=8, games_per_ckpt=4, batch_size=8,
               max_training_steps=4, ckpt_interval=2, log_interval=1,
               replay_capacity=4096, drop_straddling_games=True),
    run=dict(ckpt_dir=os.path.join(workdir, "ckpt"),
             logs_dir=os.path.join(workdir, f"logs{pid}"),
             save_sgf_dir="", seed=7),
)

trainer = Trainer(cfg)
assert trainer.multihost and trainer.mesh.shape == {
    "dp": (2 * nproc) // mdl, "mdl": mdl,
}

# Harvest dedup round-trip: each host's rows of a dp-sharded global array
# must come back exactly once and in order. With mdl > 1 every dp row block
# is replicated across the mdl axis, so a broken ``global_to_local`` (no
# per-row-start dedup) would return each row ``mdl`` times.
import numpy as np  # noqa: E402

from alpha_zero_tpu.parallel import multihost  # noqa: E402

local_rows = (np.arange(4, dtype=np.int32)[:, None]
              + 100 * (pid + 1)) * np.ones((1, 3), np.int32)
roundtrip = multihost.global_to_local(
    multihost.local_to_global(trainer.mesh, local_rows)
)
assert roundtrip.shape == local_rows.shape, (
    f"global_to_local returned {roundtrip.shape} for local rows "
    f"{local_rows.shape} — duplicated mdl-replicated shards?"
)
assert np.array_equal(roundtrip, local_rows), (roundtrip, local_rows)

trainer.run()

# Every process must see the final step count; the checkpoint is collective.
assert trainer.training_steps == 4, trainer.training_steps
assert os.path.isdir(os.path.join(workdir, "ckpt", "training_steps_4"))

# Resume path: restore the sharded state back into this (still-live) mesh.
from alpha_zero_tpu.training import checkpoint as ckpt_lib  # noqa: E402

restored = ckpt_lib.restore_checkpoint(
    os.path.join(workdir, "ckpt", "training_steps_4"), trainer.train_state
)
assert int(restored.training_steps) == 4

# Numerical equivalence: one dp-sharded train step on a deterministic global
# batch from a fresh seed-123 state. The pytest parent recomputes the same
# step single-process and compares the printed losses — proving the global
# mesh program (sharded batch, psum'd grads, cross-batch batch-norm stats)
# computes the same numbers as an unsharded learner.
import numpy as np  # noqa: E402

from alpha_zero_tpu.parallel import mesh as mesh_lib  # noqa: E402
from alpha_zero_tpu.training import learner as learner_lib  # noqa: E402

G = 16  # global batch; local share = G / nproc
rngnp = np.random.default_rng(0)
states = rngnp.integers(0, 2, size=(G, 5, 5, 5)).astype(np.int8)
pis = rngnp.random((G, 25)).astype(np.float32)
pis /= pis.sum(-1, keepdims=True)
vals = rngnp.choice([-1.0, 1.0], size=(G,)).astype(np.float32)
lo, hi = pid * G // nproc, (pid + 1) * G // nproc

state0 = learner_lib.create_train_state(
    trainer.net, jax.random.PRNGKey(123), (5, 5, 5), trainer.tx
)
p_shard = mesh_lib.param_shardings(trainer.mesh, state0.params)
params = jax.tree.map(
    lambda x, s: jax.make_array_from_process_local_data(
        s, np.asarray(x), np.asarray(x).shape),
    state0.params, p_shard,
)
batch_stats = multihost.replicate_to_global(
    trainer.mesh, jax.tree.map(np.asarray, state0.batch_stats))
state0 = state0.replace(
    params=params, batch_stats=batch_stats,
    opt_state=jax.jit(trainer.tx.init)(params),
    training_steps=multihost.replicate_to_global(
        trainer.mesh, np.asarray(state0.training_steps)),
)
globs = multihost.local_to_global(
    trainer.mesh, (states[lo:hi], pis[lo:hi], vals[lo:hi]))
step = learner_lib.make_train_step(
    trainer.net, trainer.tx, trainer.lr_schedule, argument_data=True)
_, metrics = step(state0, *globs, jax.random.PRNGKey(7))
print(f"MULTIHOST_LOSS {float(metrics.policy_loss):.6f} "
      f"{float(metrics.value_loss):.6f}", flush=True)

print(f"MULTIHOST_OK p{pid}", flush=True)
