"""The in-repo CPU oracle search must agree with the batched device search."""

import numpy as np
import jax
import jax.numpy as jnp

from alpha_zero_tpu.envs.gomoku import GomokuEngine
from alpha_zero_tpu.envs.types import jitted
from alpha_zero_tpu.search import mcts
from alpha_zero_tpu.search.reference import oracle_search


def test_oracle_matches_batched_search():
    engine = GomokuEngine(board_size=5, num_stack=2, num_to_win=3)
    step = jitted(engine, "step")
    state = engine.init()
    for mv in [12, 6, 8]:
        state = step(state, jnp.int32(mv))

    raw = np.arange(1, engine.num_actions + 1, dtype=np.float32)
    prior = raw / raw.sum()

    def eval_func(obs):
        return prior.copy(), 0.0

    num_sims = 40
    oracle_n, oracle_q = oracle_search(engine, state, eval_func, num_sims)

    def eval_fn(obs):
        b = obs.shape[0]
        return jnp.broadcast_to(jnp.asarray(prior), (b,) + prior.shape), jnp.zeros((b,))

    roots = jax.tree.map(lambda x: x[None], state)
    result = jax.jit(
        lambda rs, rng: mcts.batched_search(eval_fn, engine, rs, rng,
                                            num_simulations=num_sims)
    )(roots, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(result.child_N)[0], oracle_n)
    assert abs(float(result.root_Q[0]) - oracle_q) < 1e-5
