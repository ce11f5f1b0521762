"""Gomoku kernel tests (parity targets: reference unit_tests/envs/gomoku_test.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alpha_zero_tpu.envs.gomoku import GomokuEngine
from alpha_zero_tpu.envs.types import BLACK, WHITE, jitted


def make_engine(n=7, k=5):
    return GomokuEngine(board_size=n, num_stack=8, num_to_win=k)


def play_moves(engine, moves):
    state = engine.init()
    step = jitted(engine, "step")
    for m in moves:
        state = step(state, jnp.int32(m))
    return state


def flat(n, r, c):
    return r * n + c


@pytest.mark.parametrize("direction", ["horizontal", "vertical", "diag_down", "diag_up"])
@pytest.mark.parametrize("winner_color", [BLACK, WHITE])
def test_win_detection_all_directions(direction, winner_color):
    n = 9
    engine = make_engine(n=n, k=5)

    if direction == "horizontal":
        win_line = [flat(n, 4, c) for c in range(5)]
    elif direction == "vertical":
        win_line = [flat(n, r, 4) for r in range(5)]
    elif direction == "diag_down":
        win_line = [flat(n, i, i) for i in range(5)]
    else:
        win_line = [flat(n, 4 + i, 8 - i) for i in range(5)]

    # Scattered filler for the non-winning color: never forms a run of 5 and
    # never overlaps any of the win lines above.
    filler = [flat(n, 8, 0), flat(n, 8, 1), flat(n, 8, 3), flat(n, 7, 1), flat(n, 6, 0)]
    assert not set(filler) & set(win_line)

    moves = []
    if winner_color == BLACK:
        for i in range(5):
            moves.append(win_line[i])
            if i < 4:
                moves.append(filler[i])
    else:
        for i in range(5):
            moves.append(filler[i])
            moves.append(win_line[i])

    state = play_moves(engine, moves)
    assert bool(state.done)
    assert int(state.winner) == winner_color
    assert float(state.last_reward) == 1.0


def test_no_win_four_in_a_row():
    n = 9
    engine = make_engine(n=n, k=5)
    moves = []
    for i in range(4):
        moves.append(flat(n, 4, i))      # black horizontal
        moves.append(flat(n, 8, i))      # white filler
    state = play_moves(engine, moves)
    assert not bool(state.done)
    assert int(state.winner) == 0


def test_six_in_a_row_wins_freestyle():
    """Freestyle Gomoku allows overlines (5 or more)."""
    n = 9
    engine = make_engine(n=n, k=5)
    moves = []
    black_cols = [0, 1, 2, 3, 5]
    white_filler = [flat(n, 8, 0), flat(n, 8, 1), flat(n, 8, 3), flat(n, 8, 4), flat(n, 7, 0)]
    for i, c in enumerate(black_cols):
        moves.append(flat(n, 4, c))
        moves.append(white_filler[i])
    state = play_moves(engine, moves)
    assert not bool(state.done)
    # The bridging stone makes 6 in a row.
    state = jitted(engine, "step")(state, jnp.int32(flat(n, 4, 4)))
    assert bool(state.done)
    assert int(state.winner) == BLACK


def test_draw_on_full_board():
    n = 4
    engine = make_engine(n=n, k=5)  # k > n: no wins possible
    state = play_moves(engine, list(range(n * n)))
    assert bool(state.done)
    assert int(state.winner) == 0
    assert float(state.last_reward) == 0.0


def test_legal_actions_mask():
    n = 5
    engine = make_engine(n=n, k=5)
    state = engine.init()
    legal = np.asarray(jitted(engine, "legal_actions")(state))
    assert legal.all() and legal.shape == (n * n,)
    state = jitted(engine, "step")(state, jnp.int32(12))
    legal = np.asarray(jitted(engine, "legal_actions")(state))
    assert not legal[12] and legal.sum() == n * n - 1


def test_step_after_done_is_noop():
    n = 9
    engine = make_engine(n=n, k=5)
    moves = []
    filler = [flat(n, 8, 0), flat(n, 8, 1), flat(n, 8, 3), flat(n, 8, 4)]
    for i in range(5):
        moves.append(flat(n, 4, i))
        if i < 4:
            moves.append(filler[i])
    state = play_moves(engine, moves)
    assert bool(state.done)
    before = jax.tree.map(np.asarray, state)
    after = jitted(engine, "step")(state, jnp.int32(flat(n, 0, 0)))
    after = jax.tree.map(np.asarray, after)
    for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
        np.testing.assert_array_equal(a, b)
    legal = np.asarray(jitted(engine, "legal_actions")(state))
    assert not legal.any()


def test_batched_lockstep():
    n = 7
    engine = make_engine(n=n, k=5)
    batch = engine.init_batch(4)
    step = jitted(engine, "step", batched=True)
    actions = jnp.array([0, 1, 2, 3], jnp.int32)
    batch = step(batch, actions)
    boards = np.asarray(batch.board)
    for i in range(4):
        assert boards[i].reshape(-1)[i] == BLACK
        assert boards[i].sum() == BLACK
    assert np.all(np.asarray(batch.to_play) == WHITE)
