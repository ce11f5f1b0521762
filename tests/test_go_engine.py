"""Go kernel tests.

Covers the reference's scripted cases (unit_tests/envs/go_test.py: occupied /
suicide / ko illegality, double-pass & max-steps termination, scoring) plus a
randomized move-for-move parity sweep against the reference Minigo engine
(`/root/reference/alpha_zero/envs/go_engine.py`) used as a test oracle — the
BASELINE demands fixed-seed engine parity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alpha_zero_tpu.envs.go import GoEngine
from alpha_zero_tpu.envs.types import BLACK, WHITE, RESIGN, jitted

from conftest import reference_go_engine


def make_engine(n=5, komi=7.5, **kw):
    return GoEngine(board_size=n, num_stack=8, komi=komi, **kw)


def play(engine, state, move):
    return jitted(engine, "step")(state, jnp.int32(move))


def legal(engine, state):
    return np.asarray(state.legal)


def flat(n, r, c):
    return r * n + c


def setup_board(engine, rows):
    """Builds a position from ASCII rows ('.', 'X', 'O'), black to play.

    Bypasses move order: directly writes the board (like the reference tests'
    scripted positions) and fills history with the same board.
    """
    n = engine.board_size
    board = np.zeros((n, n), np.int8)
    for r, row in enumerate(rows):
        for c, ch in enumerate(row.split()):
            board[r, c] = {".": 0, "X": 1, "O": -1}[ch]
    state = engine.init()
    board = jnp.asarray(board)
    history = jnp.broadcast_to(board[None], state.history.shape)
    # Hand-built states must refresh the cached group analysis/legal mask.
    return jitted(engine, "analyze")(state.replace(board=board, history=history))


# ---------------------------------------------------------------------------
# Basic stepping
# ---------------------------------------------------------------------------


def test_simple_capture_single_stone():
    n = 5
    engine = make_engine(n)
    state = setup_board(engine, [
        ". X . . .",
        "X O . . .",
        ". X . . .",
        ". . . . .",
        ". . . . .",
    ])
    # Black plays (1,2): captures the white stone at (1,1).
    state = play(engine, state, flat(n, 1, 2))
    board = np.asarray(state.board)
    assert board[1, 1] == 0
    assert board[1, 2] == BLACK
    assert np.asarray(state.captures)[0] == 1  # black captured one


def test_capture_group():
    n = 5
    engine = make_engine(n)
    state = setup_board(engine, [
        ". X X . .",
        "X O O . .",
        ". X X . .",
        ". . . . .",
        ". . . . .",
    ])
    # The two white stones have one liberty at (1,3).
    state = play(engine, state, flat(n, 1, 3))
    board = np.asarray(state.board)
    assert board[1, 1] == 0 and board[1, 2] == 0
    assert np.asarray(state.captures)[0] == 2


def test_occupied_point_is_illegal():
    n = 5
    engine = make_engine(n)
    state = engine.init()
    state = play(engine, state, flat(n, 2, 2))
    mask = legal(engine, state)
    assert mask[flat(n, 2, 2)] == 0
    assert mask[engine.pass_move] == 1


def test_suicide_is_illegal():
    n = 5
    engine = make_engine(n)
    # (0,0) corner point surrounded by black; white to move there = suicide.
    state = jitted(engine, "analyze")(
        setup_board(engine, [
            ". X . . .",
            "X . . . .",
            ". . . . .",
            ". . . . .",
            ". . . . .",
        ]).replace(to_play=jnp.int8(WHITE))
    )
    mask = legal(engine, state)
    assert mask[flat(n, 0, 0)] == 0
    # ...but legal for black (own group gets the liberty union).
    state_b = jitted(engine, "analyze")(state.replace(to_play=jnp.int8(BLACK)))
    assert legal(engine, state_b)[flat(n, 0, 0)] == 1


def test_suicide_multi_stone_group():
    n = 5
    engine = make_engine(n)
    # White group of 2 at (1,1),(1,2) with single eye... black filling the
    # last inside liberty would be suicide unless capturing.
    state = setup_board(engine, [
        "O O O O .",
        "O . O . .",
        "O O O . .",
        ". . . . .",
        ". . . . .",
    ])
    # Black at (1,1) has no liberties and captures nothing -> suicide.
    assert legal(engine, state)[flat(n, 1, 1)] == 0


def test_capture_not_suicide():
    n = 5
    engine = make_engine(n)
    # Black playing (1,1) captures the white stone at (0,1)? Construct atari:
    state = setup_board(engine, [
        "X O X . .",
        "O . X . .",
        "X X . . .",
        ". . . . .",
        ". . . . .",
    ])
    # White (0,1) has liberties: (1,1) only (0,0 black, 0,2 black) -> atari.
    # Black (1,1): neighbors all stones: (0,1) white atari, (1,0) white,
    # (2,1) black, (1,2) black. Captures the atari stone -> legal.
    assert legal(engine, state)[flat(n, 1, 1)] == 1
    state = play(engine, state, flat(n, 1, 1))
    assert np.asarray(state.board)[0, 1] == 0


def test_basic_ko():
    n = 5
    engine = make_engine(n)
    #   . X O . .
    #   X O . O .
    #   . X O . .
    # Black plays (1,2) capturing white (1,1) -> white cannot retake at (1,1).
    state = setup_board(engine, [
        ". X O . .",
        "X O . O .",
        ". X O . .",
        ". . . . .",
        ". . . . .",
    ])
    state = play(engine, state, flat(n, 1, 2))
    assert np.asarray(state.board)[1, 1] == 0
    assert int(state.ko) == flat(n, 1, 1)
    mask = legal(engine, state)
    assert mask[flat(n, 1, 1)] == 0  # ko retake illegal for white
    # After white plays elsewhere, ko is lifted.
    state = play(engine, state, flat(n, 4, 4))
    assert int(state.ko) == -1
    # Black elsewhere, then white may retake.
    state = play(engine, state, flat(n, 4, 0))
    assert legal(engine, state)[flat(n, 1, 1)] == 1


def test_double_pass_ends_and_scores():
    n = 5
    engine = make_engine(n, komi=0.5)
    state = setup_board(engine, [
        "X X X O O",
        "X X X O O",
        "X X X O O",
        "X X X O O",
        "X X X O O",
    ])
    state = play(engine, state, engine.pass_move)
    assert not bool(state.done)
    state = play(engine, state, engine.pass_move)
    assert bool(state.done)
    # Black 15, white 10, komi 0.5 -> B+4.5.
    assert float(state.final_score) == pytest.approx(4.5)
    assert int(state.winner) == BLACK
    assert int(state.num_passes) == 2


def test_territory_scoring():
    n = 5
    engine = make_engine(n, komi=0.5)
    # Black wall on column 2; empty left region touches only black? Put
    # white stones on the right edge.
    state = setup_board(engine, [
        ". . X . O",
        ". . X . O",
        ". . X . O",
        ". . X . O",
        ". . X . O",
    ])
    score = float(jitted(engine, "area_score")(state.board))
    # Black: 5 stones + 10 left territory = 15. White: 5 stones; middle
    # column 3 touches both -> dame. 15 - 5 = 10.
    assert score == pytest.approx(10.0)


def test_resign():
    n = 5
    engine = make_engine(n)
    state = engine.init()
    state = play(engine, state, flat(n, 2, 2))  # black
    state = play(engine, state, RESIGN)          # white resigns
    assert bool(state.done)
    assert bool(state.resigned)
    assert int(state.winner) == BLACK
    assert float(state.last_reward) == -1.0  # mover (white) lost
    assert not legal(engine, state).any()


def test_max_steps_termination():
    n = 5
    engine = make_engine(n, komi=0.5, max_steps=4)
    state = engine.init()
    for move in [flat(n, 0, 0), flat(n, 1, 1), flat(n, 2, 2), flat(n, 3, 3)]:
        state = play(engine, state, move)
    assert bool(state.done)
    # 2 black stones vs 2 white stones, all empties touch both -> 0 - 0.5 komi.
    assert int(state.winner) == WHITE


def test_pass_clears_ko():
    n = 5
    engine = make_engine(n)
    state = setup_board(engine, [
        ". X O . .",
        "X O . O .",
        ". X O . .",
        ". . . . .",
        ". . . . .",
    ])
    state = play(engine, state, flat(n, 1, 2))
    assert int(state.ko) == flat(n, 1, 1)
    state = play(engine, state, engine.pass_move)
    assert int(state.ko) == -1


# ---------------------------------------------------------------------------
# Randomized parity vs the reference Minigo engine
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("board_size,seed_base", [(5, 0), (9, 100)])
def test_random_playout_parity_with_reference(board_size, seed_base):
    """Fixed-seed random playouts must match the reference move-for-move:
    identical legal masks, boards, ko points, capture counts, and final score.
    """
    go = reference_go_engine(board_size)
    n = board_size
    engine = make_engine(n, komi=7.5)
    step = jitted(engine, "step")
    legal_fn = jitted(engine, "legal_actions")

    for game_idx in range(3):
        rng = np.random.RandomState(seed_base + game_idx)
        ref_pos = go.Position(komi=7.5)
        state = engine.init()
        for move_idx in range(n * n * 2):
            ref_legal = ref_pos.all_legal_moves()
            our_legal = np.asarray(legal_fn(state)).astype(np.int8)
            np.testing.assert_array_equal(
                our_legal, ref_legal,
                err_msg=f"legal mask diverged at game {game_idx} move {move_idx}\n"
                        f"ref board:\n{ref_pos.board}\nours:\n{np.asarray(state.board)}",
            )
            # Sample a random legal move; bias away from pass early so games
            # develop fights (captures, kos).
            candidates = np.flatnonzero(ref_legal)
            if move_idx < n * n and len(candidates) > 1:
                candidates = candidates[candidates != n * n]
            move = int(rng.choice(candidates))

            ref_pos = ref_pos.play_move(
                None if move == n * n else divmod(move, n), mutate=True
            )
            state = step(state, jnp.int32(move))

            np.testing.assert_array_equal(np.asarray(state.board), ref_pos.board)
            ref_ko = -1 if ref_pos.ko is None else ref_pos.ko[0] * n + ref_pos.ko[1]
            assert int(state.ko) == ref_ko, f"ko diverged at move {move_idx}"
            assert tuple(np.asarray(state.captures)) == ref_pos.caps
            # Double-pass termination parity
            if bool(state.done):
                assert float(state.final_score) == pytest.approx(ref_pos.score())
                break
