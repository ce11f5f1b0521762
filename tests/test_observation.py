"""Golden-value tests of the stacked observation tensor.

Mirrors the reference's hand-constructed plane checks
(unit_tests/envs/base_test.py:124-174, go_test.py:222-276): plane order is
[Xt, Yt, Xt-1, Yt-1, ..., C] with the latest board first and C = 1 iff black
to play.
"""

import jax.numpy as jnp
import numpy as np

from alpha_zero_tpu.envs.gomoku import GomokuEngine
from alpha_zero_tpu.envs.go import GoEngine
from alpha_zero_tpu.envs.types import jitted


def chw(obs_nhwc):
    return np.transpose(np.asarray(obs_nhwc), (2, 0, 1))


def test_initial_observation_all_zero_except_color():
    engine = GomokuEngine(board_size=5, num_stack=8)
    obs = chw(jitted(engine, "observation")(engine.init()))
    assert obs.shape == (17, 5, 5)
    assert (obs[:-1] == 0).all()
    assert (obs[-1] == 1).all()  # black to play


def test_observation_after_two_moves():
    n = 5
    engine = GomokuEngine(board_size=n, num_stack=8)
    step = jitted(engine, "step")
    obs_fn = jitted(engine, "observation")

    state = engine.init()
    state = step(state, jnp.int32(0))      # black at (0,0)
    obs = chw(obs_fn(state))
    # White to play: Xt = white stones (none), Yt = black stones.
    assert (obs[-1] == 0).all()
    assert obs[0].sum() == 0
    assert obs[1][0, 0] == 1 and obs[1].sum() == 1
    # Older planes: one step played, so planes 2.. reflect older boards (empty).
    assert obs[2].sum() == 0 and obs[3].sum() == 0

    state = step(state, jnp.int32(12))     # white at (2,2)
    obs = chw(obs_fn(state))
    # Black to play again.
    assert (obs[-1] == 1).all()
    assert obs[0][0, 0] == 1 and obs[0].sum() == 1         # Xt: black stones now
    assert obs[1][2, 2] == 1 and obs[1].sum() == 1         # Yt: white stones now
    # t-1 (after black's first move): black had (0,0), white none.
    assert obs[2][0, 0] == 1 and obs[2].sum() == 1
    assert obs[3].sum() == 0


def test_go_observation_capture_reflected():
    n = 5
    engine = GoEngine(board_size=n, num_stack=8, komi=7.5)
    step = jitted(engine, "step")
    obs_fn = jitted(engine, "observation")
    state = engine.init()
    # Black surrounds white at (1,1): B(0,1), W(1,1), B(1,0), W(4,4), B(2,1), W(4,3), B(1,2) captures.
    for mv in [1, 6, 5, 24, 11, 23, 7]:
        state = step(state, jnp.int32(mv))
    board = np.asarray(state.board)
    assert board[1, 1] == 0  # captured
    obs = chw(obs_fn(state))
    # White to play: Yt = black plane must NOT contain the captured point...
    # (black stones: (0,1),(1,0),(2,1),(1,2))
    assert obs[1][1, 1] == 0
    assert obs[1].sum() == 4
    # Xt = white: (4,4),(4,3)
    assert obs[0].sum() == 2 and obs[0][4, 4] == 1 and obs[0][4, 3] == 1
    # t-1 plane pair (before black's capture): white stone still on (1,1).
    assert obs[2][1, 1] == 1  # Xt-1: white at t-1 includes the stone
    assert obs[-1].sum() == 0  # white to play


def test_observation_matches_reference_layout():
    """Cross-check plane semantics against the reference BoardGameEnv."""
    import sys

    sys.path.insert(0, "/root/reference")
    try:
        import gym  # noqa: F401
        from alpha_zero.envs.gomoku import GomokuEnv as RefGomoku
    except Exception:
        import pytest

        pytest.skip("reference env deps unavailable")

    ref = RefGomoku(board_size=5, num_stack=8)
    ref.reset()
    engine = GomokuEngine(board_size=5, num_stack=8)
    step = jitted(engine, "step")
    obs_fn = jitted(engine, "observation")
    state = engine.init()

    rng = np.random.RandomState(42)
    for _ in range(10):
        legal = np.flatnonzero(ref.legal_actions)
        mv = int(rng.choice(legal))
        ref_obs, _, done, _ = ref.step(mv)
        state = step(state, jnp.int32(mv))
        ours = chw(obs_fn(state))
        np.testing.assert_array_equal(ours, ref_obs)
        if done:
            break
