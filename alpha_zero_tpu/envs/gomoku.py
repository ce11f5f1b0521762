"""Pure-JAX vectorized freestyle Gomoku engine.

Rules parity with the reference (`alpha_zero/envs/gomoku.py:17-157`): players
alternate placing stones; a line of ``num_to_win`` or more same-colored stones
(4 directions) wins; a full board draws; no pass, no resign.

The reference's last-move directional scan (``is_current_player_won``
gomoku.py:85-129) becomes a full-board windowed check built from K-1 shifted
ANDs per direction — equivalent because play stops at the first win, and
trivially ``vmap``-able.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from alpha_zero_tpu.envs.types import BLACK, EMPTY, GameState


def _shift_k(x: jnp.ndarray, dr: int, dc: int, k: int) -> jnp.ndarray:
    """x[i, j] -> x[i + k*dr, j + k*dc], False outside the board."""
    n = x.shape[-1]
    pad = k
    padded = jnp.pad(x, pad, constant_values=False)
    return padded[pad + k * dr : pad + k * dr + n, pad + k * dc : pad + k * dc + n]


class GomokuEngine:
    """Static-config namespace of pure functions over :class:`GameState`."""

    def __init__(self, board_size: int = 13, num_stack: int = 8, num_to_win: int = 5,
                 max_steps: int | None = None) -> None:
        self.board_size = board_size
        self.num_stack = num_stack
        self.num_to_win = num_to_win
        self.max_steps = max_steps if max_steps is not None else board_size * board_size
        self.num_actions = board_size * board_size  # no pass move
        self.pass_move = None
        self.has_pass_move = False
        self.has_resign_move = False
        self.komi = 0.0

    def _key(self):
        return (type(self).__name__, self.board_size, self.num_stack, self.num_to_win, self.max_steps)

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return isinstance(other, GomokuEngine) and self._key() == other._key()

    # -----------------------------------------------------------------------
    def init(self) -> GameState:
        n = self.board_size
        return GameState(
            board=jnp.zeros((n, n), jnp.int8),
            history=jnp.zeros((self.num_stack, n, n), jnp.int8),
            to_play=jnp.int8(BLACK),
            step_count=jnp.int32(0),
            done=jnp.bool_(False),
            winner=jnp.int8(0),
            last_move=jnp.int32(-2),
            last_reward=jnp.float32(0.0),
            ko=jnp.int32(-1),
            pass_streak=jnp.int32(0),
            num_passes=jnp.int32(0),
            captures=jnp.zeros((2,), jnp.int32),
            resigned=jnp.bool_(False),
            final_score=jnp.float32(0.0),
            # Gomoku needs no group analysis; keep minimal dummies.
            labels=jnp.zeros((1, 1), jnp.float32),
            group_libs=jnp.zeros((1,), jnp.float32),
            legal=jnp.ones((self.num_actions,), jnp.float32),
        )

    def init_batch(self, batch_size: int) -> GameState:
        return jax.tree.map(
            lambda x: jnp.broadcast_to(x, (batch_size,) + x.shape), self.init()
        )

    # -----------------------------------------------------------------------
    def legal_actions(self, state: GameState) -> jnp.ndarray:
        """bool[N*N]: empty points; all-false once done (cached in state)."""
        return state.legal

    def analyze(self, state: GameState) -> GameState:
        """Recomputes the cached legal mask (for hand-built states)."""
        legal = (state.board == EMPTY).reshape(-1).astype(jnp.float32)
        legal = jnp.where(state.done, jnp.zeros_like(legal), legal)
        return state.replace(legal=legal)

    def _has_win(self, board: jnp.ndarray, color: jnp.ndarray) -> jnp.ndarray:
        """Any run of >= num_to_win stones of ``color`` in any direction."""
        f = board == color
        win = jnp.bool_(False)
        for dr, dc in ((0, 1), (1, 0), (1, 1), (1, -1)):
            acc = f
            for k in range(1, self.num_to_win):
                acc = acc & _shift_k(f, dr, dc, k)
            win |= jnp.any(acc)
        return win

    # -----------------------------------------------------------------------
    def step(self, state: GameState, action: jnp.ndarray) -> GameState:
        """Places a stone at flat ``action``; no-op when already done."""
        n = self.board_size
        action = jnp.asarray(action, jnp.int32)
        a = jnp.clip(action, 0, n * n - 1)
        color = state.to_play

        # One-hot blend, not .at[r, c].set: a per-lane 2-D scatter under vmap
        # serializes on TPU (measured 36x slower per self-play step).
        point = (jnp.arange(n * n, dtype=jnp.int32) == a).reshape(n, n)
        board = jnp.where(point, color, state.board).astype(jnp.int8)
        won = self._has_win(board, color)
        step_count = state.step_count + 1
        full = jnp.all(board != EMPTY)
        done = won | full | (step_count >= self.max_steps)

        winner = jnp.where(won, color, jnp.int8(0)).astype(jnp.int8)
        # Reward for the mover (gomoku.py:72-77): win 1.0, else 0 (draws give 0).
        reward = jnp.where(won, 1.0, 0.0).astype(jnp.float32)
        history = jnp.concatenate([board[None], state.history[:-1]], axis=0)
        legal = ((board == EMPTY).reshape(-1) & ~done).astype(jnp.float32)

        new_state = state.replace(
            board=board,
            history=history,
            to_play=(-color).astype(jnp.int8),
            step_count=step_count,
            done=done,
            winner=winner,
            last_move=action,
            last_reward=reward,
            legal=legal,
        )
        return jax.tree.map(
            lambda old, new: jnp.where(state.done, old, new), state, new_state
        )

    def step_batch(self, states: GameState, actions: jnp.ndarray) -> GameState:
        """Batched step (uniform hot-path interface with GoEngine)."""
        return jax.vmap(self.step)(states, actions)

    # -----------------------------------------------------------------------
    def with_num_stack(self, num_stack: int) -> "GomokuEngine":
        return GomokuEngine(board_size=self.board_size, num_stack=num_stack,
                            num_to_win=self.num_to_win, max_steps=self.max_steps)

    @staticmethod
    def observation_from(history: jnp.ndarray, to_play: jnp.ndarray) -> jnp.ndarray:
        """Same stacked-plane layout as Go (base.py:228-259), NHWC int8."""
        s = history.shape[0]
        cur = history == to_play
        opp = history == -to_play
        planes = jnp.stack([cur, opp], axis=1).reshape(2 * s, *history.shape[1:])
        color = jnp.full((1,) + history.shape[1:], to_play == BLACK)
        obs = jnp.concatenate([planes, color], axis=0).astype(jnp.int8)
        return jnp.transpose(obs, (1, 2, 0))

    def observation(self, state: GameState) -> jnp.ndarray:
        return self.observation_from(state.history, state.to_play)
