"""Multi-host scale-out: a REAL 2-process ``jax.distributed`` run on CPU.

Spawns two worker processes (tests/multihost_worker.py), each with 2 virtual
CPU devices, forming one global ('dp': 4) mesh. Together they drive the full
Trainer loop — globally sharded self-play + train batches, host-local replay
partitions, the cross-host generation fence, the host0 threshold broadcast,
and a collective orbax checkpoint — replacing the reference's single-machine
mp.Process topology (training_go.py:276-347, pipeline.py:232-239, 485-497).
"""

import os
import socket
import subprocess
import sys
import tempfile


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _single_process_losses():
    """The multihost worker's equivalence batch, computed unsharded (must
    mirror tests/multihost_worker.py: same net config, seeds, and batch)."""
    import dataclasses

    import jax
    import numpy as np

    from alpha_zero_tpu.config import get_config
    from alpha_zero_tpu.models.resnet import build_network
    from alpha_zero_tpu.training import learner as learner_lib

    cfg = get_config("gomoku9")
    env_cfg = dataclasses.replace(
        cfg.env, board_size=5, num_to_win=4, max_steps=25, num_stack=2)
    net_cfg = dataclasses.replace(
        cfg.network, num_res_blocks=1, num_filters=8, num_fc_units=8)
    net = build_network(env_cfg, net_cfg)
    tx, schedule = learner_lib.make_optimizer(
        cfg.train.init_lr, cfg.train.lr_decay, cfg.train.lr_milestones,
        momentum=cfg.train.sgd_momentum,
        weight_decay=cfg.train.l2_regularization,
    )
    state0 = learner_lib.create_train_state(
        net, jax.random.PRNGKey(123), (5, 5, 5), tx)
    step = learner_lib.make_train_step(net, tx, schedule, argument_data=True)

    G = 16
    rngnp = np.random.default_rng(0)
    states = rngnp.integers(0, 2, size=(G, 5, 5, 5)).astype(np.int8)
    pis = rngnp.random((G, 25)).astype(np.float32)
    pis /= pis.sum(-1, keepdims=True)
    vals = rngnp.choice([-1.0, 1.0], size=(G,)).astype(np.float32)
    _, metrics = step(state0, states, pis, vals, jax.random.PRNGKey(7))
    return float(metrics.policy_loss), float(metrics.value_loss)


def _run_two_process_training(mdl: int) -> None:
    port = _free_port()
    workdir = tempfile.mkdtemp(prefix="mh_test_")
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port), workdir, str(mdl)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert f"MULTIHOST_OK p{pid}" in out

    # Numerical equivalence: the dp-sharded train step the workers ran on a
    # deterministic global batch must equal the same step computed here,
    # single-process and unsharded (same seeds, same batch).
    loss_lines = [ln for ln in outs[0].splitlines()
                  if ln.startswith("MULTIHOST_LOSS")]
    assert loss_lines, outs[0][-2000:]
    sharded_pi, sharded_v = map(float, loss_lines[0].split()[1:3])
    expect_pi, expect_v = _single_process_losses()
    # mdl=1 (pure dp) is numerically tight. mdl>1 shards layer output
    # channels, which re-partitions the bf16 compute-dtype matmuls — layers
    # whose width divides mdl accumulate in a different order and drift at
    # bf16 epsilon (~1e-2 relative); layers whose width doesn't divide stay
    # replicated and bit-exact (measured: pi head exact, value head ~3e-3).
    tol = 1e-4 if mdl == 1 else 1e-2
    assert abs(sharded_pi - expect_pi) < tol, (sharded_pi, expect_pi)
    assert abs(sharded_v - expect_v) < tol, (sharded_v, expect_v)

    # Collective checkpoint written once; host0 wrote the training CSV; both
    # hosts harvested games into their own actor CSVs.
    assert os.path.isdir(os.path.join(workdir, "ckpt", "training_steps_4"))
    assert os.path.exists(os.path.join(workdir, "logs0", "training.csv"))
    assert os.path.exists(os.path.join(workdir, "logs0", "actor0.csv"))
    assert os.path.exists(os.path.join(workdir, "logs1", "actor1.csv"))
    with open(os.path.join(workdir, "logs0", "training.csv")) as f:
        rows = f.read().strip().splitlines()
    assert len(rows) >= 3  # header + steps


def test_two_process_training_run():
    _run_two_process_training(mdl=1)


def test_two_process_mdl2_training_run():
    """2 processes x mdl=2 (global mesh ('dp': 2, 'mdl': 2)): batch rows are
    replicated across each host's mdl device pair, so harvesting exercises
    the ``global_to_local`` per-row-start shard dedup across real processes
    (the worker asserts the local_to_global round-trip returns each host's
    rows exactly once) alongside mdl-sharded params + train-loss
    equivalence."""
    _run_two_process_training(mdl=2)
