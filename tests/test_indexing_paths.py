"""Both INDEXING strategies of the search hot loop compute identical results.

search/mcts.py keeps two lowerings of every per-simulation access — native
gather/scatter ("gather") and one-hot matmul / masked reduction ("onehot").
The parity suite runs whichever is the default; this test pins the two
against each other exactly (same trees, same visit counts, same values).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alpha_zero_tpu.envs.go import GoEngine
from alpha_zero_tpu.search import mcts


def _uniform_eval(engine):
    def eval_fn(obs):
        b = obs.shape[0]
        a = engine.num_actions
        # Deterministic non-uniform prior so PUCT ordering is exercised.
        logits = jnp.tile(
            jnp.sin(jnp.arange(a, dtype=jnp.float32))[None, :], (b, 1)
        )
        value = jnp.tanh(obs.astype(jnp.float32).sum((1, 2, 3)) / 50.0)
        return jax.nn.softmax(logits, -1), value

    return eval_fn


@pytest.mark.parametrize("reuse", [False, True])
def test_gather_matches_onehot(monkeypatch, reuse):
    engine = GoEngine(board_size=5, num_stack=4)
    batch, sims = 8, 24
    roots = engine.init_batch(batch)
    # Advance a few random plies so trees start from varied positions.
    rng = jax.random.PRNGKey(0)
    for _ in range(3):
        rng, sub = jax.random.split(rng)
        logits = jnp.log(jnp.maximum(roots.legal, 1e-9))
        mv = jax.random.categorical(sub, logits, axis=-1).astype(jnp.int32)
        roots = engine.step_batch(roots, mv)

    results = {}
    for mode in ("gather", "onehot"):
        monkeypatch.setattr(mcts, "INDEXING", mode)
        prev = mcts.make_empty_trees(engine, roots, sims) if reuse else None
        out, trees = mcts.batched_search(
            _uniform_eval(engine), engine, roots, jax.random.PRNGKey(1),
            num_simulations=sims, root_noise=False,
            prev_trees=prev, return_trees=True,
        )
        results[mode] = (out, trees)

    out_g, trees_g = results["gather"]
    out_o, trees_o = results["onehot"]
    np.testing.assert_array_equal(np.asarray(out_g.child_N), np.asarray(out_o.child_N))
    np.testing.assert_allclose(
        np.asarray(out_g.child_W), np.asarray(out_o.child_W), atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(trees_g.parent_index), np.asarray(trees_o.parent_index)
    )
    np.testing.assert_array_equal(
        np.asarray(trees_g.action_from_parent),
        np.asarray(trees_o.action_from_parent),
    )
    np.testing.assert_array_equal(
        np.asarray(trees_g.states.board), np.asarray(trees_o.states.board)
    )


@pytest.mark.parametrize("piece", sorted(mcts._ALL_PIECES))
def test_single_piece_gather_matches_onehot(monkeypatch, piece):
    """Each GATHER_PIECES subset lowering is pinned equal independently —
    a regression in any one hybrid path can't hide behind the all-or-nothing
    parity above."""
    engine = GoEngine(board_size=5, num_stack=4)
    batch, sims = 4, 16
    roots = engine.init_batch(batch)
    rng = jax.random.PRNGKey(2)
    for _ in range(2):
        rng, sub = jax.random.split(rng)
        logits = jnp.log(jnp.maximum(roots.legal, 1e-9))
        mv = jax.random.categorical(sub, logits, axis=-1).astype(jnp.int32)
        roots = engine.step_batch(roots, mv)

    results = {}
    for mode, pieces in (("onehot", mcts._ALL_PIECES), ("gather", (piece,))):
        monkeypatch.setattr(mcts, "INDEXING", mode)
        monkeypatch.setattr(mcts, "GATHER_PIECES", frozenset(pieces))
        out = mcts.batched_search(
            _uniform_eval(engine), engine, roots, jax.random.PRNGKey(3),
            num_simulations=sims, root_noise=False,
        )
        results[mode] = out

    np.testing.assert_array_equal(
        np.asarray(results["gather"].child_N), np.asarray(results["onehot"].child_N)
    )
    np.testing.assert_allclose(
        np.asarray(results["gather"].child_W),
        np.asarray(results["onehot"].child_W), atol=1e-5,
    )
