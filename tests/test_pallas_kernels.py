"""Parity: the Pallas select kernel vs the XLA one-hot select.

Runs on the CPU test platform with ``interpret=True`` — the kernel's math
must be BIT-identical to ``_select_leaf`` (same expression tree, same argmax
tie-breaking), so every output is compared exactly.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alpha_zero_tpu import config as config_lib
from alpha_zero_tpu.envs.go import GoEngine
from alpha_zero_tpu.envs.gomoku import GomokuEngine
from alpha_zero_tpu.models.resnet import AlphaZeroNet
from alpha_zero_tpu.ops import tree_kernels
from alpha_zero_tpu.search import mcts


def _eval_fn(engine, seed=0):
    net = AlphaZeroNet(num_actions=engine.num_actions, num_res_blocks=1,
                       num_filters=8, num_fc_units=8)
    dummy = jnp.zeros(
        (1, engine.board_size, engine.board_size, 2 * engine.num_stack + 1),
        jnp.int8)
    variables = net.init(jax.random.PRNGKey(seed), dummy, train=False)
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}

    def f(obs):
        out = net.apply(variables, obs, train=False)
        return jax.nn.softmax(out.pi_logits, axis=-1), out.value

    return f


def _grown_trees(engine, batch=8, sims=16, seed=3):
    """Real mid-search trees: run a full search, keep the populated trees."""
    states = engine.init_batch(batch)
    # Play a couple of random moves so the lanes diverge.
    rng = jax.random.PRNGKey(seed)
    for _ in range(2):
        rng, sub = jax.random.split(rng)
        legal = jax.vmap(engine.legal_actions)(states)
        move = jax.random.categorical(sub, jnp.log(legal + 1e-9), axis=-1)
        states = engine.step_batch(states, move.astype(jnp.int32))
    _, trees = mcts.batched_search(
        _eval_fn(engine), engine, states, rng, num_simulations=sims,
        root_noise=True, return_trees=True)
    return trees


@pytest.mark.parametrize("engine_fn", [
    lambda: GoEngine(board_size=5, num_stack=2),
    lambda: GomokuEngine(board_size=5, num_stack=2, num_to_win=3),
])
def test_pallas_select_matches_xla(engine_fn):
    engine = engine_fn()
    sims = 16
    trees = _grown_trees(engine, batch=8, sims=sims)
    path_cap = min(sims + 1, engine.max_steps + 2)
    kw = dict(path_cap=path_cap, c_puct_base=19652.0, c_puct_init=1.25)

    ref = jax.vmap(functools.partial(mcts._select_leaf, **kw))(trees)
    out = tree_kernels.select_leaf_batched(
        trees.node_N, trees.node_W, trees.node_P, trees.parent_index,
        trees.action_from_parent, trees.node_done, trees.child_P,
        block=4, interpret=True, **kw)

    names = ["parent", "action", "child", "hit_terminal", "even", "odd",
             "depth", "p_sel"]
    for name, r, o in zip(names, ref, out):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(o),
                                      err_msg=f"mismatch in {name}")


def test_pallas_full_search_matches_xla(monkeypatch):
    """End-to-end: a whole batched_search under the Pallas select equals the
    XLA select, including subtree reuse across a move."""
    engine = GoEngine(board_size=5, num_stack=2)
    eval_fn = _eval_fn(engine)
    states = engine.init_batch(4)
    rng = jax.random.PRNGKey(11)

    def run():
        r1, trees = mcts.batched_search(
            eval_fn, engine, states, rng, num_simulations=12,
            root_noise=True, return_trees=True)
        move = jnp.argmax(r1.child_N, axis=-1).astype(jnp.int32)
        new_states = engine.step_batch(states, move)
        trees = mcts.reroot_trees(trees, move, new_states.done, new_states,
                                  engine.num_actions)
        r2 = mcts.batched_search(
            eval_fn, engine, new_states, rng, num_simulations=12,
            root_noise=True, prev_trees=trees, max_new_sims=6)
        return r1, r2

    monkeypatch.setattr(mcts, "SELECT_MODE", "xla")
    ref1, ref2 = run()
    monkeypatch.setattr(mcts, "SELECT_MODE", "pallas")
    out1, out2 = run()

    for ref, out in ((ref1, out1), (ref2, out2)):
        np.testing.assert_array_equal(np.asarray(ref.child_N),
                                      np.asarray(out.child_N))
        np.testing.assert_allclose(np.asarray(ref.child_W),
                                   np.asarray(out.child_W), rtol=0, atol=0)
        np.testing.assert_array_equal(np.asarray(ref.legal),
                                      np.asarray(out.legal))


def test_pick_block_budgets_padded_vmem():
    """The block picker must budget Mosaic's PADDED footprint (T rounded to
    8 sublanes, A to 128 lanes, x3 for double-buffered child_P + the
    per-step masked-scatter temporary) — real-bytes x2 budgeting OOM'd the
    16 MB scoped-VMEM stack on a v5e at T=65/A=82 (PERF.md round 5)."""
    pb = tree_kernels._padded_lane_bytes
    # Padding math: T=65 -> 72 sublanes, A=82 -> 128 lanes.
    assert pb(65, 82) == 72 * 128 * 4
    assert pb(201, 82) == 208 * 128 * 4
    # Every block choice keeps 3 * blk * padded bytes within the 12 MB
    # budget (i.e. under the 16 MB VMEM stack with headroom).
    for t, a in ((65, 82), (201, 82), (129, 82), (381, 169), (761, 362)):
        blk = tree_kernels._pick_block(1024, pb(t, a))
        assert 3 * blk * pb(t, a) <= 12 * 1024 * 1024, (t, a, blk)
    # Production geometries keep their measured-good block sizes (changing
    # these silently would invalidate the PERF.md A/B crossover).
    assert tree_kernels._pick_block(1024, pb(201, 82)) == 32    # go9
    assert tree_kernels._pick_block(1024, pb(381, 169)) == 8    # gomoku13
    assert tree_kernels._pick_block(1024, pb(761, 362)) == 2    # jumbo -> XLA
    # The sweep geometry that used to OOM now picks a safe 64-lane block.
    assert tree_kernels._pick_block(1024, pb(65, 82)) == 64
