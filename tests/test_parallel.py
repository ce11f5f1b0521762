"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alpha_zero_tpu import config as config_lib
from alpha_zero_tpu.models.resnet import AlphaZeroNet
from alpha_zero_tpu.parallel import mesh as mesh_lib
from alpha_zero_tpu.training import learner as learner_lib


requires_8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


@requires_8
def test_mesh_shapes():
    mesh = mesh_lib.make_mesh(mdl=2)
    assert mesh.shape == {"dp": 4, "mdl": 2}
    mesh = mesh_lib.make_mesh()
    assert mesh.shape == {"dp": 8, "mdl": 1}


@requires_8
def test_param_shardings_shard_wide_kernels():
    mesh = mesh_lib.make_mesh(mdl=2)
    net = AlphaZeroNet(num_actions=26, num_res_blocks=1, num_filters=16, num_fc_units=16)
    x = jnp.zeros((2, 5, 5, 5), jnp.int8)
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    shardings = mesh_lib.param_shardings(mesh, variables["params"])
    flat = jax.tree_util.tree_leaves_with_path(shardings)
    specs = {jax.tree_util.keystr(p): s.spec for p, s in flat}
    # Conv kernels (4D, out-channels divisible by 2) shard on 'mdl'.
    conv_specs = [s for k, s in specs.items() if "Conv_0" in k and "kernel" in k]
    assert any(s[-1] == "mdl" for s in conv_specs if len(s) > 0)


@requires_8
def test_sharded_train_step_matches_single_device():
    """Data-parallel training over the mesh must equal single-device math."""
    n, a = 5, 26
    net = AlphaZeroNet(num_actions=a, num_res_blocks=1, num_filters=8, num_fc_units=8)
    tx, sched = learner_lib.make_optimizer(0.05, 0.1, [1000])
    state0 = learner_lib.create_train_state(net, jax.random.PRNGKey(0), (n, n, 5), tx)
    step = learner_lib.make_train_step(net, tx, sched, argument_data=False)

    rng = jax.random.PRNGKey(1)
    states = jax.random.bernoulli(rng, 0.3, (16, n, n, 5)).astype(jnp.int8)
    target_pi = jax.nn.softmax(jax.random.normal(rng, (16, a)))
    target_v = jnp.sign(jax.random.normal(rng, (16,)))

    # Single device.
    s1, m1 = step(state0, states, target_pi, target_v, jax.random.PRNGKey(7))

    # Sharded over dp=8.
    mesh = mesh_lib.make_mesh()
    state_sharded = mesh_lib.shard_train_state(
        mesh, learner_lib.create_train_state(net, jax.random.PRNGKey(0), (n, n, 5), tx), tx
    )
    shard = mesh_lib.batch_sharding(mesh)
    step2 = learner_lib.make_train_step(net, tx, sched, argument_data=False)
    s2, m2 = step2(
        state_sharded,
        jax.device_put(states, shard),
        jax.device_put(target_pi, shard),
        jax.device_put(target_v, shard),
        jax.random.PRNGKey(7),
    )
    np.testing.assert_allclose(float(m1.policy_loss), float(m2.policy_loss), rtol=1e-5)
    p1 = jax.tree.leaves(jax.device_get(s1.params))
    p2 = jax.tree.leaves(jax.device_get(s2.params))
    for a1, a2 in zip(p1, p2):
        np.testing.assert_allclose(a1, a2, rtol=2e-4, atol=2e-5)


@requires_8
def test_dp_sharded_selfplay_matches_single_device():
    """The dp-sharded self-play step (bench.py BENCH_DP / pipeline mesh
    placement) must produce the SAME per-lane games as the unsharded
    program — sharding the game batch is a layout choice, not a semantic
    one. This is the weak-scaling correctness half of the multi-chip
    story; real chips only change wall-clock."""
    from alpha_zero_tpu.training import selfplay as selfplay_lib
    from alpha_zero_tpu.training.pipeline import build_engine
    from alpha_zero_tpu.models.resnet import build_network

    cfg = config_lib.AlphaZeroConfig(
        env=config_lib.EnvConfig(game="go", board_size=5, num_stack=2),
        network=config_lib.NetworkConfig(num_res_blocks=1, num_filters=8,
                                         num_fc_units=8),
        search=config_lib.SearchConfig(num_simulations=8, warm_up_steps=2,
                                       reuse_subtree=True, max_new_sims=6),
    )
    engine = build_engine(cfg.env)
    net = build_network(cfg.env, cfg.network)
    obs = jnp.zeros((1, 5, 5, 5), jnp.int8)
    variables = net.init(jax.random.PRNGKey(0), obs, train=False)
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}
    step_fn = selfplay_lib.make_selfplay_step(engine, net, cfg.search, cfg.resign)

    def run(shard: bool):
        sp = selfplay_lib.init_selfplay_state(
            engine, 16, jax.random.PRNGKey(1), resign_threshold=-1.0,
            disable_resign_ratio=0.0, reuse_num_simulations=8)
        thr = jnp.float32(-1.0)
        vars_ = variables
        if shard:
            mesh = mesh_lib.make_mesh()
            data_sh = mesh_lib.batch_sharding(mesh)
            rep = mesh_lib.replicated(mesh)
            sp = jax.tree.map(lambda x: jax.device_put(x, data_sh), sp)
            vars_ = jax.tree.map(lambda x: jax.device_put(x, rep), variables)
            thr = jax.device_put(thr, rep)
        rng = jax.random.PRNGKey(2)
        outs = []
        for _ in range(6):
            rng, sub = jax.random.split(rng)
            sp, out = step_fn(vars_, sp, sub, thr)
            outs.append(out)
        return sp, outs

    sp1, outs1 = run(shard=False)
    sp8, outs8 = run(shard=True)
    # Per-lane game trajectories identical: moves, done flags, boards.
    for o1, o8 in zip(outs1, outs8):
        np.testing.assert_array_equal(np.asarray(o1.move), np.asarray(o8.move))
    np.testing.assert_array_equal(np.asarray(sp1.games.board),
                                  np.asarray(sp8.games.board))
    np.testing.assert_array_equal(np.asarray(sp1.games.done),
                                  np.asarray(sp8.games.done))
    np.testing.assert_array_equal(np.asarray(sp1.games.step_count),
                                  np.asarray(sp8.games.step_count))


@requires_8
def test_trainer_with_mesh_micro_run(tmp_path):
    """End-to-end micro training with dp=4, mdl=2 over virtual devices."""
    from alpha_zero_tpu.training import pipeline

    cfg = config_lib.AlphaZeroConfig(
        env=config_lib.EnvConfig(game="gomoku", board_size=5, num_stack=2, num_to_win=3),
        network=config_lib.NetworkConfig(num_res_blocks=1, num_filters=8, num_fc_units=8,
                                         gomoku=True),
        search=config_lib.SearchConfig(num_simulations=8, warm_up_steps=2),
        resign=config_lib.ResignConfig(init_resign_threshold=-1.0),
        train=config_lib.TrainConfig(
            min_games=4, games_per_ckpt=4, replay_capacity=2048, batch_size=16,
            max_training_steps=2, ckpt_interval=2, log_interval=2,
        ),
        run=config_lib.RunConfig(ckpt_dir=str(tmp_path / "ckpt"),
                                 logs_dir=str(tmp_path / "logs"), seed=5),
        parallel=config_lib.ParallelConfig(selfplay_batch_size=8, dp=4, mdl=2),
    )
    trainer = pipeline.Trainer(cfg)
    assert trainer.mesh is not None and trainer.mesh.shape == {"dp": 4, "mdl": 2}
    trainer.run()
    assert trainer.training_steps == 2
    assert trainer.replay.num_games_added >= 4
