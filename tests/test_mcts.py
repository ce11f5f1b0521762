"""Batched MCTS tests.

The strongest test compares the on-device batched search against the reference
serial ``uct_search`` (core/mcts_v2.py) run with an identical deterministic
evaluation function — root child visit counts must match exactly, since both
searches are then fully deterministic (argmax PUCT, no noise).
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


def uniform_eval_factory(num_actions):
    def eval_fn(obs):
        b = obs.shape[0]
        pi = jnp.full((b, num_actions), 1.0 / num_actions, jnp.float32)
        v = jnp.zeros((b,), jnp.float32)
        return pi, v

    return eval_fn


def fixed_prior_eval_factory(prior):
    prior = jnp.asarray(prior, jnp.float32)

    def eval_fn(obs):
        b = obs.shape[0]
        pi = jnp.broadcast_to(prior, (b,) + prior.shape)
        v = jnp.zeros((b,), jnp.float32)
        return pi, v

    return eval_fn


def batch_states(engine, states):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


# ---------------------------------------------------------------------------
# Invariants
# ---------------------------------------------------------------------------


def test_visit_budget_and_policy():
    engine = GomokuEngine(board_size=5, num_stack=2)
    num_sims = 25
    roots = engine.init_batch(3)
    eval_fn = uniform_eval_factory(engine.num_actions)
    result = jax.jit(
        lambda rs, rng: mcts.batched_search(
            eval_fn, engine, rs, rng, num_simulations=num_sims
        )
    )(roots, jax.random.PRNGKey(0))

    child_n = np.asarray(result.child_N)
    # Every simulation after the root's own backup adds exactly one root child
    # visit: sum over children == num_sims - 1.
    np.testing.assert_array_equal(child_n.sum(-1), num_sims - 1)
    # Uniform prior, zero values: visits should be spread over many moves.
    assert (child_n > 0).sum(-1).min() > 5

    warm = jnp.ones((3,), bool)
    pi = np.asarray(mcts.policy_from_counts(result.child_N, result.legal, warm))
    np.testing.assert_allclose(pi.sum(-1), 1.0, rtol=1e-5)

    cold = jnp.zeros((3,), bool)
    pi_cold = np.asarray(mcts.policy_from_counts(result.child_N, result.legal, cold))
    # Low temperature sharpens: max prob must not decrease.
    assert (pi_cold.max(-1) >= pi.max(-1) - 1e-6).all()


def test_search_prefers_winning_move_gomoku():
    """Search with a truthful terminal reward finds the immediate win."""
    n = 5
    engine = GomokuEngine(board_size=n, num_stack=2, num_to_win=3)
    step = jitted(engine, "step")
    # Black: (0,0),(0,1) — one more at (0,2) wins (3-in-a-row).
    # White: (4,0),(4,1) far away... white also threatens! Give white only one.
    state = engine.init()
    for mv in [0, 20, 1, 22]:  # B(0,0) W(4,0) B(0,1) W(4,2)
        state = step(state, jnp.int32(mv))
    roots = jax.tree.map(lambda x: x[None], state)
    eval_fn = uniform_eval_factory(engine.num_actions)
    result = jax.jit(
        lambda rs, rng: mcts.batched_search(
            eval_fn, engine, rs, rng, num_simulations=60
        )
    )(roots, jax.random.PRNGKey(0))
    best = int(np.asarray(result.child_N)[0].argmax())
    assert best == 2  # (0,2) completes three-in-a-row


def test_deterministic_sample_move():
    child_n = jnp.array([[0.0, 5.0, 3.0, 0.0]])
    legal = jnp.ones((1, 4), bool)
    pi = mcts.policy_from_counts(child_n, legal, jnp.zeros((1,), bool))
    mv = mcts.sample_move(jax.random.PRNGKey(0), pi, legal, child_n,
                          jnp.zeros((1,), bool), pass_move=None, deterministic=True)
    assert int(mv[0]) == 1


def test_warm_up_bans_pass():
    # Pass (last action) carries all visits; during warm-up sampling must
    # avoid it and fall back to other legal moves.
    a = 5
    child_n = jnp.zeros((1, a)).at[0, a - 1].set(10.0)
    legal = jnp.ones((1, a), bool)
    warm = jnp.ones((1,), bool)
    pi = mcts.policy_from_counts(child_n, legal, warm)
    for seed in range(5):
        mv = mcts.sample_move(jax.random.PRNGKey(seed), pi, legal, child_n,
                              warm, pass_move=a - 1, deterministic=False)
        assert int(mv[0]) != a - 1


# ---------------------------------------------------------------------------
# Oracle parity vs reference mcts_v2 (serial uct_search)
# ---------------------------------------------------------------------------


def _reference_search_gomoku(board_size, moves, prior, num_sims):
    install_reference_shims()
    import sys

    sys.path.insert(0, "/root/reference")
    from alpha_zero.core import mcts_v2
    from alpha_zero.envs.gomoku import GomokuEnv

    env = GomokuEnv(board_size=board_size, num_to_win=3, num_stack=2)
    env.reset()
    for mv in moves:
        env.step(mv)

    prior_np = np.asarray(prior, np.float32)

    def eval_func(obs, batched=False):
        if batched:
            b = obs.shape[0]
            return [prior_np.copy() for _ in range(b)], [0.0] * b
        return prior_np.copy(), 0.0

    move, search_pi, root_q, best_q, root = mcts_v2.uct_search(
        env=env,
        eval_func=eval_func,
        root_node=None,
        c_puct_base=19652.0,
        c_puct_init=1.25,
        num_simulations=num_sims,
        root_noise=False,
        warm_up=False,
        deterministic=True,
    )
    return np.asarray(root.child_N if hasattr(root, "child_N") else []), move, root_q


@pytest.mark.parametrize("num_sims", [20, 50])
def test_parity_with_reference_serial_search(num_sims):
    """Deterministic eval => identical visit counts vs reference uct_search."""
    install_reference_shims()
    import sys

    sys.path.insert(0, "/root/reference")
    from alpha_zero.core import mcts_v2
    from alpha_zero.envs.gomoku import GomokuEnv

    n = 5
    moves = [12, 6, 8]
    # A deterministic, exactly-representable prior: (i+1)/sum.
    raw = np.arange(1, n * n + 1, dtype=np.float32)
    prior = raw / raw.sum()

    env = GomokuEnv(board_size=n, num_to_win=3, num_stack=2)
    env.reset()
    for mv in moves:
        env.step(mv)

    prior_np = prior.copy()

    def eval_func(obs, batched=False):
        if batched:
            b = obs.shape[0]
            return [prior_np.copy() for _ in range(b)], [0.0] * b
        return prior_np.copy(), 0.0

    ref_move, ref_pi, ref_root_q, ref_best_q, ref_root = mcts_v2.uct_search(
        env=env, eval_func=eval_func, root_node=None,
        c_puct_base=19652.0, c_puct_init=1.25,
        num_simulations=num_sims, root_noise=False,
        warm_up=False, deterministic=True,
    )
    # Visit counts live in the (re-rooted) returned node's parent... use the
    # search_pi exponents instead: recompute from the root the reference kept.
    # uct_search returns next_root_node; we need the original root's child_N.
    # Recover from search_pi: pi ∝ (child_N * legal) ** 5 — instead, rerun
    # and introspect via a fresh root node handle.
    env2 = GomokuEnv(board_size=n, num_to_win=3, num_stack=2)
    env2.reset()
    for mv in moves:
        env2.step(mv)
    root_node = mcts_v2.Node(to_play=env2.to_play, num_actions=env2.action_dim,
                             parent=mcts_v2.DummyNode())
    p, v = eval_func(env2.observation())
    mcts_v2.expand(root_node, p)
    mcts_v2.backup(root_node, v)
    mcts_v2.uct_search(
        env=env2, eval_func=eval_func, root_node=root_node,
        c_puct_base=19652.0, c_puct_init=1.25,
        num_simulations=num_sims, root_noise=False,
        warm_up=False, deterministic=True,
    )
    ref_child_n = root_node.child_N.copy()

    # Ours.
    engine = GomokuEngine(board_size=n, num_stack=2, num_to_win=3)
    step = jitted(engine, "step")
    state = engine.init()
    for mv in moves:
        state = step(state, jnp.int32(mv))
    roots = jax.tree.map(lambda x: x[None], state)
    eval_fn = fixed_prior_eval_factory(prior)
    result = jax.jit(
        lambda rs, rng: mcts.batched_search(
            eval_fn, engine, rs, rng, num_simulations=num_sims
        )
    )(roots, jax.random.PRNGKey(0))

    ours = np.asarray(result.child_N)[0]
    np.testing.assert_array_equal(ours, ref_child_n)
    assert float(result.root_Q[0]) == pytest.approx(float(root_node.Q), abs=1e-5)


def test_parity_with_reference_go_terminal_heavy():
    """Go near game end: terminal backups (double pass) must match too."""
    install_reference_shims()
    import sys

    sys.path.insert(0, "/root/reference")
    go_engine = reference_go_engine(5)  # noqa: F841 (sets BOARD_SIZE + reloads)
    import importlib
    import alpha_zero.envs.go as ref_go_mod

    importlib.reload(ref_go_mod)
    from alpha_zero.core import mcts_v2

    n = 5
    num_sims = 30
    env = ref_go_mod.GoEnv(komi=0.5, num_stack=2)
    moves = [12, 7, 11, 13, 17, 6, 25]  # some stones + a pass
    for mv in moves:
        env.step(mv)

    raw = np.ones(n * n + 1, dtype=np.float32)
    prior = raw / raw.sum()
    prior_np = prior.copy()

    def eval_func(obs, batched=False):
        if batched:
            b = obs.shape[0]
            return [prior_np.copy() for _ in range(b)], [0.0] * b
        return prior_np.copy(), 0.0

    root_node = mcts_v2.Node(to_play=env.to_play, num_actions=env.action_dim,
                             parent=mcts_v2.DummyNode())
    p, v = eval_func(env.observation())
    mcts_v2.expand(root_node, p)
    mcts_v2.backup(root_node, v)
    mcts_v2.uct_search(
        env=env, eval_func=eval_func, root_node=root_node,
        c_puct_base=19652.0, c_puct_init=1.25,
        num_simulations=num_sims, root_noise=False,
        warm_up=False, deterministic=True,
    )
    ref_child_n = root_node.child_N.copy()
    ref_child_w = root_node.child_W.copy()

    engine = GoEngine(board_size=n, num_stack=2, komi=0.5)
    step = jitted(engine, "step")
    state = engine.init()
    for mv in moves:
        state = step(state, jnp.int32(mv))
    roots = jax.tree.map(lambda x: x[None], state)
    eval_fn = fixed_prior_eval_factory(prior)
    result = jax.jit(
        lambda rs, rng: mcts.batched_search(
            eval_fn, engine, rs, rng, num_simulations=num_sims
        )
    )(roots, jax.random.PRNGKey(0))

    np.testing.assert_array_equal(np.asarray(result.child_N)[0], ref_child_n)
    np.testing.assert_allclose(np.asarray(result.child_W)[0], ref_child_w, atol=1e-5)
