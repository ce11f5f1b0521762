"""Validates the fixed-round hook-and-compress group labeling.

The engine unrolls ``label_rounds = ceil(log2(N^2)) + 3`` sweeps with no
convergence check (for straight-line XLA code). These tests compare against a
run-to-convergence reference on adversarial shapes — snakes, spirals, combs —
and large random boards, where group geodesics are longest.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from alpha_zero_tpu.envs.go import GoEngine, _DIRS, _shift, _WALL
from alpha_zero_tpu.envs.types import EMPTY


def converged_labels(engine, board):
    """Run sweeps until a fixed point (ground truth)."""
    n = engine.board_size
    sent = n * n
    board = jnp.asarray(board)
    active = board != EMPTY
    same = []
    for dr, dc in _DIRS:
        nb_board = _shift(board, dr, dc, _WALL)
        same.append((nb_board == board) & active)
    idx = jnp.arange(sent, dtype=jnp.int32).reshape(n, n)
    labels = jnp.where(active, idx, sent)
    for _ in range(sent + 2):
        new = engine._label_sweep(labels, same, active)
        if bool(jnp.all(new == labels)):
            break
        labels = new
    return np.asarray(labels)


def snake_board(n):
    """One serpentine black group covering the board (max geodesic)."""
    board = np.zeros((n, n), np.int8)
    for r in range(n):
        if r % 2 == 0:
            board[r, :] = 1
        else:
            # connect at alternating ends
            board[r, n - 1 if (r // 2) % 2 == 0 else 0] = 1
    return board


def spiral_board(n):
    board = np.zeros((n, n), np.int8)
    top, bottom, left, right = 0, n - 1, 0, n - 1
    while top <= bottom and left <= right:
        board[top, left:right + 1] = 1
        board[top:bottom + 1, right] = 1
        board[bottom, left:right + 1] = 1
        board[top:bottom + 1, left] = 1
        top += 2
        bottom -= 2
        left += 2
        right -= 2
    return board


def comb_board(n):
    board = np.zeros((n, n), np.int8)
    board[0, :] = 1
    for c in range(0, n, 2):
        board[:, c] = 1
    return board


@pytest.mark.parametrize("n", [9, 19])
@pytest.mark.parametrize("shape", ["snake", "spiral", "comb"])
def test_fixed_rounds_match_convergence_adversarial(n, shape):
    engine = GoEngine(board_size=n)
    board = {"snake": snake_board, "spiral": spiral_board, "comb": comb_board}[shape](n)
    fixed = np.asarray(jax.jit(engine.label_groups)(jnp.asarray(board)))
    truth = converged_labels(engine, board)
    np.testing.assert_array_equal(fixed, truth, err_msg=f"{shape} {n}x{n}")


@pytest.mark.parametrize("n", [5, 9, 19])
def test_fixed_rounds_match_convergence_random(n):
    engine = GoEngine(board_size=n)
    label_fn = jax.jit(engine.label_groups)
    rng = np.random.RandomState(0)
    for trial in range(30):
        # Mix densities: dense boards make long snaky groups.
        p = rng.choice([0.3, 0.4, 0.48])
        board = rng.choice([0, 1, -1], size=(n, n),
                           p=[1 - 2 * p, p, p]).astype(np.int8)
        fixed = np.asarray(label_fn(jnp.asarray(board)))
        truth = converged_labels(engine, board)
        np.testing.assert_array_equal(fixed, truth, err_msg=f"trial {trial}")


def test_labels_are_canonical_min_index():
    engine = GoEngine(board_size=5)
    board = np.zeros((5, 5), np.int8)
    board[2, 1:4] = 1  # group with min flat index 11
    board[0, 0] = -1
    labels = np.asarray(jax.jit(engine.label_groups)(jnp.asarray(board)))
    assert labels[2, 1] == labels[2, 2] == labels[2, 3] == 11
    assert labels[0, 0] == 0
    assert labels[1, 1] == 25  # empty -> sentinel
