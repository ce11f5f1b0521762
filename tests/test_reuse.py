"""Subtree-reuse parity vs the reference's re-rooting (mcts_v2.py:643-653).

The reference's ``uct_search`` returns ``next_root_node`` (the chosen child's
subtree with N/W preserved) and the next call continues its
``while root.N < num_simulations`` budget from the carried visits. Our
``reroot_trees`` + ``batched_search(prev_trees=...)`` must reproduce this
visit-for-visit under a deterministic evaluator.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from alpha_zero_tpu.envs.gomoku import GomokuEngine
from alpha_zero_tpu.envs.go import GoEngine
from alpha_zero_tpu.envs.types import jitted
from alpha_zero_tpu.search import mcts

from conftest import install_reference_shims, reference_go_engine


def fixed_prior_eval_factory(prior):
    prior = jnp.asarray(prior, jnp.float32)

    def eval_fn(obs):
        b = obs.shape[0]
        pi = jnp.broadcast_to(prior, (b,) + prior.shape)
        v = jnp.zeros((b,), jnp.float32)
        return pi, v

    return eval_fn


def _play_ref_with_reuse(make_env, mcts_v2, prior_np, num_sims, num_moves):
    """Plays ``num_moves`` deterministic moves with the reference search,
    carrying next_root_node; returns per-move (child_N, move) pairs."""
    env = make_env()

    def eval_func(obs, batched=False):
        if batched:
            b = obs.shape[0]
            return [prior_np.copy() for _ in range(b)], [0.0] * b
        return prior_np.copy(), 0.0

    records = []
    root = None
    for _ in range(num_moves):
        if root is None:
            root = mcts_v2.Node(to_play=env.to_play, num_actions=env.action_dim,
                                parent=mcts_v2.DummyNode())
            p, v = eval_func(env.observation())
            mcts_v2.expand(root, p)
            mcts_v2.backup(root, v)
        move, _, _, _, next_root = mcts_v2.uct_search(
            env=env, eval_func=eval_func, root_node=root,
            c_puct_base=19652.0, c_puct_init=1.25,
            num_simulations=num_sims, root_noise=False,
            warm_up=False, deterministic=True,
        )
        records.append((root.child_N.copy(), int(move)))
        _, _, done, _ = env.step(move)
        root = next_root
        if done:
            break
    return records


def _play_ours_with_reuse(engine, prior, num_sims, num_moves,
                          max_new_sims=None):
    step = jitted(engine, "step")
    eval_fn = fixed_prior_eval_factory(prior)
    state = engine.init()
    roots = jax.tree.map(lambda x: x[None], state)
    trees = mcts.make_empty_trees(engine, roots, num_sims)

    search = jax.jit(
        lambda rs, t, rng: mcts.batched_search(
            eval_fn, engine, rs, rng, num_simulations=num_sims,
            prev_trees=t, max_new_sims=max_new_sims, return_trees=True,
        )
    )
    reroot = jax.jit(
        lambda t, mv, dn, ns: mcts.reroot_trees(t, mv, dn, ns, engine.num_actions)
    )

    records = []
    for i in range(num_moves):
        result, trees = search(roots, trees, jax.random.PRNGKey(i))
        move = int(np.asarray(result.child_N)[0].argmax())
        records.append((np.asarray(result.child_N)[0].copy(), move))
        state = step(state, jnp.int32(move))
        done = bool(state.done)
        roots = jax.tree.map(lambda x: x[None], state)
        trees = reroot(trees, jnp.asarray([move], jnp.int32),
                       jnp.asarray([done], bool), roots)
        if done:
            break
    return records


@pytest.mark.parametrize("num_sims", [20, 40])
def test_reuse_parity_gomoku(num_sims):
    install_reference_shims()
    import sys

    sys.path.insert(0, "/root/reference")
    from alpha_zero.core import mcts_v2
    from alpha_zero.envs.gomoku import GomokuEnv

    n = 5
    raw = np.arange(1, n * n + 1, dtype=np.float32)
    prior = raw / raw.sum()

    def make_env():
        env = GomokuEnv(board_size=n, num_to_win=3, num_stack=2)
        env.reset()
        return env

    ref = _play_ref_with_reuse(make_env, mcts_v2, prior.copy(), num_sims,
                               num_moves=6)
    engine = GomokuEngine(board_size=n, num_stack=2, num_to_win=3)
    ours = _play_ours_with_reuse(engine, prior, num_sims, num_moves=6)

    assert len(ref) == len(ours)
    for k, ((ref_n, ref_mv), (our_n, our_mv)) in enumerate(zip(ref, ours)):
        np.testing.assert_array_equal(our_n, ref_n, err_msg=f"move {k}")
        assert our_mv == ref_mv, f"move {k}"


def test_reuse_parity_go_with_terminals():
    """Go with carried subtrees across moves near the end of the game —
    terminal backups inside reused subtrees must match too."""
    install_reference_shims()
    import sys

    sys.path.insert(0, "/root/reference")
    reference_go_engine(5)
    import importlib
    import alpha_zero.envs.go as ref_go_mod

    importlib.reload(ref_go_mod)
    from alpha_zero.core import mcts_v2

    n = 5
    num_sims = 25
    prefix = [12, 7, 11, 13, 17, 6]
    raw = np.ones(n * n + 1, dtype=np.float32)
    prior = raw / raw.sum()

    def make_env():
        env = ref_go_mod.GoEnv(komi=0.5, num_stack=2)
        for mv in prefix:
            env.step(mv)
        return env

    ref = _play_ref_with_reuse(make_env, mcts_v2, prior.copy(), num_sims,
                               num_moves=5)

    engine = GoEngine(board_size=n, num_stack=2, komi=0.5)
    step = jitted(engine, "step")
    state = engine.init()
    for mv in prefix:
        state = step(state, jnp.int32(mv))

    eval_fn = fixed_prior_eval_factory(prior)
    roots = jax.tree.map(lambda x: x[None], state)
    trees = mcts.make_empty_trees(engine, roots, num_sims)
    search = jax.jit(
        lambda rs, t, rng: mcts.batched_search(
            eval_fn, engine, rs, rng, num_simulations=num_sims,
            prev_trees=t, return_trees=True,
        )
    )
    reroot = jax.jit(
        lambda t, mv, dn, ns: mcts.reroot_trees(t, mv, dn, ns, engine.num_actions)
    )
    ours = []
    for i in range(5):
        result, trees = search(roots, trees, jax.random.PRNGKey(i))
        move = int(np.asarray(result.child_N)[0].argmax())
        ours.append((np.asarray(result.child_N)[0].copy(), move))
        state = step(state, jnp.int32(move))
        done = bool(state.done)
        roots = jax.tree.map(lambda x: x[None], state)
        trees = reroot(trees, jnp.asarray([move], jnp.int32),
                       jnp.asarray([done], bool), roots)
        if done:
            break

    assert len(ref) == len(ours)
    for k, ((ref_n, ref_mv), (our_n, our_mv)) in enumerate(zip(ref, ours)):
        np.testing.assert_array_equal(our_n, ref_n, err_msg=f"move {k}")
        assert our_mv == ref_mv, f"move {k}"


def test_reuse_budget_and_batch_reset():
    """Batched: every search ends with the full visit budget at the root
    (carried + new == num_simulations); finished games restart fresh."""
    engine = GomokuEngine(board_size=5, num_stack=2, num_to_win=3)
    num_sims = 24
    batch = 4
    games = engine.init_batch(batch)
    raw = np.ones(engine.num_actions, dtype=np.float32)
    eval_fn = fixed_prior_eval_factory(raw / raw.sum())
    trees = mcts.make_empty_trees(engine, games, num_sims)
    search = jax.jit(
        lambda rs, t, rng: mcts.batched_search(
            eval_fn, engine, rs, rng, num_simulations=num_sims,
            prev_trees=t, return_trees=True,
        )
    )
    for i in range(8):
        result, trees = search(games, trees, jax.random.PRNGKey(i))
        counts = np.asarray(result.child_N)
        np.testing.assert_array_equal(counts.sum(-1), num_sims - 1)
        move = jnp.argmax(result.child_N, axis=-1).astype(jnp.int32)
        stepped = engine.step_batch(games, move)
        done = stepped.done
        fresh = engine.init_batch(batch)
        games = jax.tree.map(
            lambda f, s: jnp.where(
                done.reshape((batch,) + (1,) * (s.ndim - 1)), f, s
            ),
            fresh, stepped,
        )
        trees = mcts.reroot_trees(trees, move, done, games, engine.num_actions)
        nn = np.asarray(trees.num_nodes)
        assert (nn >= 1).all() and (nn <= num_sims + 1).all()
        # Reused roots carry the chosen child's visits.
        root_n = np.asarray(trees.node_N[:, 0])
        for b in range(batch):
            if not bool(np.asarray(done)[b]):
                assert root_n[b] == counts[b].max()


def test_reuse_selfplay_step_runs():
    """End-to-end selfplay step with reuse on: shapes, auto-reset, budget."""
    from alpha_zero_tpu import config as config_lib
    from alpha_zero_tpu.training import selfplay as selfplay_lib
    from alpha_zero_tpu.models.resnet import build_network

    cfg = config_lib.gomoku9()
    import dataclasses

    env_cfg = dataclasses.replace(cfg.env, board_size=5, num_stack=2)
    search_cfg = dataclasses.replace(
        cfg.search, num_simulations=16, warm_up_steps=2, reuse_subtree=True
    )
    net_cfg = dataclasses.replace(cfg.network, num_res_blocks=1, num_filters=8,
                                  num_fc_units=8)
    engine = GomokuEngine(board_size=5, num_stack=2, num_to_win=5)
    net = build_network(env_cfg, net_cfg)
    obs = jnp.zeros((1, 5, 5, env_cfg.num_planes), jnp.int8)
    variables = net.init(jax.random.PRNGKey(0), obs, train=False)
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}

    step_fn = selfplay_lib.make_selfplay_step(engine, net, search_cfg, cfg.resign)
    sp = selfplay_lib.init_selfplay_state(
        engine, 4, jax.random.PRNGKey(1), resign_threshold=-1.0,
        disable_resign_ratio=0.0, reuse_num_simulations=16,
    )
    rng = jax.random.PRNGKey(2)
    for i in range(30):
        rng, sub = jax.random.split(rng)
        sp, out = step_fn(variables, sp, sub, jnp.float32(-1.0))
        pi = np.asarray(out.search_pi)
        assert np.isfinite(pi).all()
        live = ~np.asarray(sp.games.done)
        assert live.all()  # auto-reset keeps all slots live
