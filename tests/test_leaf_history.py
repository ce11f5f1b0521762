"""The tree rebuilds leaf observation stacks from ancestor boards — verify
against the oracle search, whose states carry full rolled histories, using an
evaluator that DEPENDS on the observation content."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from alpha_zero_tpu.envs.go import GoEngine
from alpha_zero_tpu.envs.gomoku import GomokuEngine
from alpha_zero_tpu.envs.types import jitted
from alpha_zero_tpu.search import mcts
from alpha_zero_tpu.search.reference import oracle_search


def obs_dependent_eval(num_actions, seed=0):
    """Deterministic function of the FULL observation (all history planes)."""
    rng = np.random.RandomState(seed)
    w = rng.randn(num_actions).astype(np.float32) * 0.1

    def host_eval(obs):
        # obs: [N, N, C] int8
        flat = obs.astype(np.float32).reshape(-1)
        # Hash-like but smooth: per-action score from strided sums.
        scores = np.array(
            [flat[a % flat.size] + w[a] + 0.01 * flat.sum() for a in range(num_actions)],
            np.float32,
        )
        e = np.exp(scores - scores.max())
        return e / e.sum(), float(np.tanh(0.05 * flat.sum()))

    def device_eval(obs):
        b, n1, n2, c = obs.shape
        flat = obs.astype(jnp.float32).reshape(b, -1)
        idx = jnp.arange(num_actions) % flat.shape[1]
        scores = flat[:, idx] + jnp.asarray(w)[None, :] + 0.01 * flat.sum(-1, keepdims=True)
        pi = jax.nn.softmax(scores, axis=-1)
        v = jnp.tanh(0.05 * flat.sum(-1))
        return pi, v

    return host_eval, device_eval


@pytest.mark.parametrize("engine_ctor", [
    lambda: GomokuEngine(board_size=5, num_stack=4, num_to_win=3),
    lambda: GoEngine(board_size=5, num_stack=4, komi=0.5),
])
def test_batched_search_matches_oracle_with_obs_dependent_eval(engine_ctor):
    engine = engine_ctor()
    step = jitted(engine, "step")
    state = engine.init()
    moves = [12, 6, 8, 17, 3]
    for mv in moves:
        state = step(state, jnp.int32(mv))

    host_eval, device_eval = obs_dependent_eval(engine.num_actions)
    num_sims = 30

    oracle_n, oracle_q = oracle_search(engine, state, host_eval, num_sims)

    roots = jax.tree.map(lambda x: x[None], state)
    result = jax.jit(
        lambda rs, rng: mcts.batched_search(device_eval, engine, rs, rng,
                                            num_simulations=num_sims)
    )(roots, jax.random.PRNGKey(0))

    np.testing.assert_array_equal(np.asarray(result.child_N)[0], oracle_n)
    assert abs(float(result.root_Q[0]) - oracle_q) < 1e-4
