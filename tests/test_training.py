"""Replay, learner, and batched self-play tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from alpha_zero_tpu import config as config_lib
from alpha_zero_tpu.envs.gomoku import GomokuEngine
from alpha_zero_tpu.envs.go import GoEngine
from alpha_zero_tpu.models.resnet import AlphaZeroNet
from alpha_zero_tpu.training import learner, selfplay
from alpha_zero_tpu.training.replay import UniformReplay


# ---------------------------------------------------------------------------
# Replay
# ---------------------------------------------------------------------------


def test_replay_ring_semantics():
    rp = UniformReplay(capacity=10, obs_shape=(3, 3, 2), num_actions=9, seed=0)
    assert rp.sample(4) is None
    states = np.ones((6, 3, 3, 2), np.int8)
    pis = np.full((6, 9), 1 / 9, np.float32)
    vals = np.arange(6, dtype=np.float32)
    rp.add_game(states, pis, vals)
    assert rp.size == 6 and rp.num_games_added == 1
    batch = rp.sample(4)
    assert batch.state.shape == (4, 3, 3, 2)

    # Wrap-around.
    vals2 = np.arange(6, 12, dtype=np.float32)
    rp.add_game(states * 2, pis, vals2)
    assert rp.size == 10
    assert rp.num_samples_added == 12
    # Oldest two entries were overwritten by the wrap.
    assert set(rp.values.tolist()) == set(np.arange(2, 12, dtype=np.float32).tolist())


def test_replay_save_load(tmp_path):
    rp = UniformReplay(capacity=8, obs_shape=(2, 2, 1), num_actions=4, seed=0)
    rp.add_game(np.ones((3, 2, 2, 1), np.int8), np.ones((3, 4), np.float32) / 4,
                np.array([1, -1, 1], np.float32))
    path = str(tmp_path / "replay.npz")
    rp.save(path)
    rp2 = UniformReplay(capacity=8, obs_shape=(2, 2, 1), num_actions=4, seed=1)
    rp2.load(path)
    assert rp2.num_games_added == 1 and rp2.size == 3
    np.testing.assert_array_equal(rp2.values[:3], rp.values[:3])


# ---------------------------------------------------------------------------
# Learner
# ---------------------------------------------------------------------------


def _tiny_net(num_actions):
    return AlphaZeroNet(num_actions=num_actions, num_res_blocks=1,
                        num_filters=8, num_fc_units=8)


def test_lr_schedule_multistep():
    sched = learner.make_lr_schedule(0.01, 0.1, [100, 200])
    assert float(sched(0)) == pytest.approx(0.01)
    assert float(sched(99)) == pytest.approx(0.01)
    assert float(sched(100)) == pytest.approx(0.001)
    assert float(sched(200)) == pytest.approx(0.0001)


def test_train_step_reduces_loss():
    n, a = 5, 26
    net = _tiny_net(a)
    tx, sched = learner.make_optimizer(0.05, 0.1, [1000])
    state = learner.create_train_state(net, jax.random.PRNGKey(0), (n, n, 5), tx)
    step = learner.make_train_step(net, tx, sched, argument_data=False)

    rng = jax.random.PRNGKey(1)
    states = jax.random.bernoulli(rng, 0.3, (16, n, n, 5)).astype(jnp.int8)
    target_pi = jax.nn.softmax(jax.random.normal(rng, (16, a)))
    target_v = jnp.sign(jax.random.normal(rng, (16,)))

    losses = []
    for i in range(12):
        state, metrics = step(state, states, target_pi, target_v, jax.random.PRNGKey(i))
        losses.append(float(metrics.policy_loss + metrics.value_loss))
    assert losses[-1] < losses[0]
    assert int(state.training_steps) == 12


def test_train_step_with_augmentation_runs():
    n, a = 5, 25  # no pass move
    net = _tiny_net(a)
    tx, sched = learner.make_optimizer(0.01, 0.1, [1000])
    state = learner.create_train_state(net, jax.random.PRNGKey(0), (n, n, 5), tx)
    step = learner.make_train_step(net, tx, sched, argument_data=True)
    states = jnp.zeros((8, n, n, 5), jnp.int8)
    target_pi = jnp.full((8, a), 1 / a)
    target_v = jnp.zeros((8,))
    state, metrics = step(state, states, target_pi, target_v, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics.policy_loss))


# ---------------------------------------------------------------------------
# Self-play
# ---------------------------------------------------------------------------


def _selfplay_setup(engine, batch=4, sims=16):
    cfg = config_lib.gomoku13()
    search_cfg = config_lib.SearchConfig(num_simulations=sims, warm_up_steps=4)
    resign_cfg = cfg.resign
    net = _tiny_net(engine.num_actions)
    dummy = jnp.zeros((1, engine.board_size, engine.board_size, 2 * engine.num_stack + 1), jnp.int8)
    variables = net.init(jax.random.PRNGKey(0), dummy, train=False)
    variables = {"params": variables["params"], "batch_stats": variables["batch_stats"]}
    step_fn = selfplay.make_selfplay_step(engine, net, search_cfg, resign_cfg)
    sp = selfplay.init_selfplay_state(engine, batch, jax.random.PRNGKey(1),
                                      resign_threshold=-1.0, disable_resign_ratio=0.1)
    return step_fn, sp, variables


def test_selfplay_completes_games_gomoku():
    engine = GomokuEngine(board_size=5, num_stack=2, num_to_win=3)
    step_fn, sp, variables = _selfplay_setup(engine, batch=4, sims=12)
    acc = selfplay.EpisodeAccumulator(4, num_planes=5)
    threshold = jnp.float32(-1.0)

    finished = []
    for i in range(30):
        sp, out = step_fn(variables, sp, jax.random.PRNGKey(100 + i), threshold)
        finished.extend(acc.add_step(out))
        if len(finished) >= 4:
            break
    assert len(finished) >= 4
    for game in finished:
        L = game.stats["game_length"]
        assert game.states.shape[0] == L
        assert game.pi_probs.shape == (L, engine.num_actions)
        # z-targets alternate sign (winner's moves +1) unless a draw.
        if game.stats["winner"] != 0:
            assert set(np.unique(game.values)) <= {-1.0, 1.0}
            # Winner moved last in gomoku wins.
            assert game.values[-1] == 1.0
        else:
            assert (game.values == 0).all()
        # Gomoku has no score: result strings come from the winner
        # (reference gomoku.py:138-147 — B+1.0 / W+1.0 / DRAW).
        expected = {1: "B+1.0", -1: "W+1.0", 0: "DRAW"}[game.stats["winner"]]
        assert game.stats["game_result"] == expected
        # Search policies are distributions over legal moves.
        np.testing.assert_allclose(game.pi_probs.sum(-1), 1.0, rtol=1e-4)


def test_selfplay_go_with_resign_threshold():
    engine = GoEngine(board_size=5, num_stack=2, komi=0.5, max_steps=20)
    cfg = config_lib.go9()
    search_cfg = config_lib.SearchConfig(num_simulations=8, warm_up_steps=2)
    resign_cfg = config_lib.ResignConfig(
        init_resign_threshold=-0.8, check_resign_after_steps=4,
        disable_resign_ratio=0.5,
    )
    net = _tiny_net(engine.num_actions)
    dummy = jnp.zeros((1, 5, 5, 5), jnp.int8)
    variables = net.init(jax.random.PRNGKey(0), dummy, train=False)
    variables = {"params": variables["params"], "batch_stats": variables["batch_stats"]}
    step_fn = selfplay.make_selfplay_step(engine, net, search_cfg, resign_cfg)
    sp = selfplay.init_selfplay_state(engine, 4, jax.random.PRNGKey(1),
                                      resign_threshold=-0.8, disable_resign_ratio=0.5)
    acc = selfplay.EpisodeAccumulator(4, num_planes=5)
    finished = []
    for i in range(40):
        sp, out = step_fn(variables, sp, jax.random.PRNGKey(i), jnp.float32(-0.8))
        finished.extend(acc.add_step(out))
        if len(finished) >= 3:
            break
    assert len(finished) >= 3
    for game in finished:
        assert game.stats["game_length"] <= 20
        assert game.stats["game_result"] != ""


def test_packed_obs_roundtrip():
    """StepOutput.obs is bit-packed on device; the accumulator's unpack must
    reproduce the engine observation bit-exactly."""
    engine = GomokuEngine(board_size=5, num_stack=2, num_to_win=3)
    step_fn, sp, variables = _selfplay_setup(engine, batch=4, sims=8)
    ref_obs = np.asarray(jax.vmap(engine.observation)(sp.games))
    acc = selfplay.EpisodeAccumulator(4, num_planes=5)
    sp, out = step_fn(variables, sp, jax.random.PRNGKey(0), jnp.float32(-1.0))
    assert np.asarray(out.obs).ndim == 3  # packed
    acc.add_step(out)
    for i in range(4):
        np.testing.assert_array_equal(acc._obs[i][0], ref_obs[i])
