"""Pure-JAX vectorized Go engine.

Re-implements the rules of the reference engine (`alpha_zero/envs/go_engine.py`
— Minigo ``Position``/``LibertyTracker``) as fixed-shape XLA programs:

- group/liberty analysis: the reference's incremental set-based
  ``LibertyTracker`` (go_engine.py:166-297) becomes a connected-component
  labeling via min-label propagation with pointer-jumping (hook & compress),
  plus a scatter-add liberty count per group root.
- legality (`Position.all_legal_moves` go_engine.py:417-441 /
  ``is_move_suicidal`` :386-402): vectorized over every point at once — a move
  on an empty point is non-suicidal iff it has an empty neighbor, an adjacent
  friendly group with >= 2 liberties, or an adjacent opponent group in atari.
- ko: basic ko only, exactly as the reference (single stone captured from a
  "koish" point, go_engine.py:479-494; super-ko intentionally NOT implemented,
  reference README.md:219 — reproduced for parity, not "fixed").
- scoring: Tromp-Taylor area scoring without dead-stone removal
  (go_engine.py:123-152), via empty-region labeling + border-color reduction.

Everything is shape-static and scalar-free so a batch of thousands of games
steps in lockstep under ``jax.vmap``/``jit`` — this replaces the reference's
per-simulation ``copy.deepcopy(env)`` + interpreted Python stepping
(core/mcts_v2.py:579), the dominant cost of its self-play.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from alpha_zero_tpu.envs.types import BLACK, EMPTY, RESIGN, WHITE, GameState

# 4-connectivity neighborhood.
_DIRS: Tuple[Tuple[int, int], ...] = ((-1, 0), (1, 0), (0, -1), (0, 1))
# Sentinel board value for off-board cells ("wall"): not empty, not a color.
_WALL = jnp.int8(2)


def _shift(x: jnp.ndarray, dr: int, dc: int, fill) -> jnp.ndarray:
    """x[i, j] -> x[i + dr, j + dc], i.e. the value of the (dr, dc)-neighbor
    of each cell; out-of-board neighbors read ``fill``. dr/dc in {-1, 0, 1}."""
    n = x.shape[-1]
    padded = jnp.pad(x, 1, constant_values=fill)
    return padded[1 + dr : 1 + dr + n, 1 + dc : 1 + dc + n]


class GoEngine:
    """Static-config namespace of pure functions over :class:`GameState`.

    Hashable & comparable by config so it can be closed over by ``jit``.
    """

    def __init__(self, board_size: int = 9, num_stack: int = 8, komi: float = 7.5,
                 max_steps: int | None = None) -> None:
        self.board_size = board_size
        self.num_stack = num_stack
        self.komi = komi
        self.max_steps = max_steps if max_steps is not None else board_size * board_size * 2
        self.num_actions = board_size * board_size + 1  # + pass
        self.pass_move = board_size * board_size
        self.has_pass_move = True
        self.has_resign_move = True

    # -- hashability for jit closures ---------------------------------------
    def _key(self):
        return (type(self).__name__, self.board_size, self.num_stack, self.komi, self.max_steps)

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return isinstance(other, GoEngine) and self._key() == other._key()

    # -----------------------------------------------------------------------
    def init(self) -> GameState:
        """Fresh single-game state (vmap over a dummy arg to batch)."""
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
        )

    def init_batch(self, batch_size: int) -> GameState:
        return jax.tree.map(
            lambda x: jnp.broadcast_to(x, (batch_size,) + x.shape), self.init()
        )

    # -----------------------------------------------------------------------
    # Group analysis
    # -----------------------------------------------------------------------
    def label_groups(self, board: jnp.ndarray) -> jnp.ndarray:
        """Connected components of same-colored stones.

        Returns int32[N, N]: for stones, the min flat index of their group
        (a canonical group id usable as a scatter target); N*N for empties.
        Min-label propagation with pointer jumping converges in
        O(log(longest group path)) sweeps; the loop is bounded by N*N.
        """
        n = self.board_size
        sent = n * n
        idx = jnp.arange(sent, dtype=jnp.int32).reshape(n, n)
        labels0 = jnp.where(board != EMPTY, idx, sent)

        def sweep(labels):
            m = labels
            for dr, dc in _DIRS:
                nb_label = _shift(labels, dr, dc, sent)
                nb_board = _shift(board, dr, dc, _WALL)
                m = jnp.minimum(m, jnp.where(nb_board == board, nb_label, sent))
            m = jnp.where(board != EMPTY, m, sent)
            # Pointer jumping: a label is a flat cell index, and that cell's
            # label is at least as canonical — follow it twice (compress).
            for _ in range(2):
                flat = m.reshape(-1)
                jumped = jnp.where(flat < sent, flat[jnp.clip(flat, 0, sent - 1)], sent)
                m = jumped.reshape(n, n)
            return m

        def cond(carry):
            _, changed, i = carry
            return changed & (i < sent)

        def body(carry):
            labels, _, i = carry
            new = sweep(labels)
            return new, jnp.any(new != labels), i + 1

        labels, _, _ = jax.lax.while_loop(cond, body, (labels0, jnp.bool_(True), jnp.int32(0)))
        return labels

    def group_liberties(self, board: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
        """Liberty count per group, indexed by group root id.

        Returns int32[N*N + 1]; entry ``g`` is the number of *distinct* empty
        points adjacent to group ``g`` (the reference's
        ``len(group.liberties)``, go_engine.py:178). The final slot is a
        scatter dump for invalid contributions.
        """
        n = self.board_size
        sent = n * n
        empty = board == EMPTY

        counts = jnp.zeros(sent + 1, jnp.int32)
        seen = []
        for dr, dc in _DIRS:
            nb_label = _shift(labels, dr, dc, sent)
            # Each empty point contributes one liberty to each *distinct*
            # neighboring group (dedupe across the 4 directions).
            dup = functools.reduce(
                jnp.logical_or, [nb_label == p for p in seen], jnp.zeros_like(empty)
            )
            valid = empty & (nb_label != sent) & ~dup
            target = jnp.where(valid, nb_label, sent).reshape(-1)
            counts = counts.at[target].add(valid.reshape(-1).astype(jnp.int32))
            seen.append(nb_label)
        return counts

    # -----------------------------------------------------------------------
    # Legality
    # -----------------------------------------------------------------------
    def legal_actions(self, state: GameState) -> jnp.ndarray:
        """bool[N*N + 1] legal-move mask (pass last), all points vectorized.

        Parity target: ``Position.all_legal_moves`` (go_engine.py:417-441) —
        empty, not the ko point, not suicide; pass always legal. All-false
        once the game is over (the reference zeroes ``legal_actions`` at game
        end, envs/go.py:111,142).
        """
        board = state.board
        n = self.board_size
        sent = n * n
        labels = self.label_groups(board)
        counts = self.group_liberties(board, labels)

        empty = board == EMPTY
        has_empty_nb = jnp.zeros_like(empty)
        friendly_alive = jnp.zeros_like(empty)
        captures_sth = jnp.zeros_like(empty)
        to_play = state.to_play
        for dr, dc in _DIRS:
            nb_board = _shift(board, dr, dc, _WALL)
            nb_label = _shift(labels, dr, dc, sent)
            nb_libs = jnp.where(nb_label != sent, counts[jnp.clip(nb_label, 0, sent)], 0)
            has_empty_nb |= nb_board == EMPTY
            # A friendly neighbor group with a liberty besides this point
            # (go_engine.py:386-402: union of friendly liberties minus the
            # point itself is non-empty iff some group has >= 2 liberties).
            friendly_alive |= (nb_board == to_play) & (nb_libs >= 2)
            # An opponent neighbor group in atari would be captured.
            captures_sth |= (nb_board == -to_play) & (nb_libs == 1)

        not_suicide = has_empty_nb | friendly_alive | captures_sth
        idx = jnp.arange(sent, dtype=jnp.int32).reshape(n, n)
        playable = empty & not_suicide & (idx != state.ko)
        legal = jnp.concatenate([playable.reshape(-1), jnp.ones((1,), jnp.bool_)])
        return jnp.where(state.done, jnp.zeros_like(legal), legal)

    # -----------------------------------------------------------------------
    # Scoring
    # -----------------------------------------------------------------------
    def area_score(self, board: jnp.ndarray) -> jnp.ndarray:
        """Tromp-Taylor area score, black-perspective, *before* komi.

        Empty regions bordered only by black count for black, only-white for
        white, mixed (dame/seki) for neither — exactly ``area_score``
        (go_engine.py:123-152), including NOT removing dead stones.
        """
        n = self.board_size
        sent = n * n
        empty = board == EMPTY
        idx = jnp.arange(sent, dtype=jnp.int32).reshape(n, n)
        labels0 = jnp.where(empty, idx, sent)

        def sweep(labels):
            m = labels
            for dr, dc in _DIRS:
                nb_label = _shift(labels, dr, dc, sent)
                nb_empty = _shift(empty, dr, dc, False)
                m = jnp.minimum(m, jnp.where(nb_empty & empty, nb_label, sent))
            m = jnp.where(empty, m, sent)
            for _ in range(2):
                flat = m.reshape(-1)
                jumped = jnp.where(flat < sent, flat[jnp.clip(flat, 0, sent - 1)], sent)
                m = jumped.reshape(n, n)
            return m

        def cond(carry):
            _, changed, i = carry
            return changed & (i < sent)

        def body(carry):
            labels, _, i = carry
            new = sweep(labels)
            return new, jnp.any(new != labels), i + 1

        labels, _, _ = jax.lax.while_loop(cond, body, (labels0, jnp.bool_(True), jnp.int32(0)))

        borders_black = jnp.zeros(sent + 1, jnp.int32)
        borders_white = jnp.zeros(sent + 1, jnp.int32)
        for dr, dc in _DIRS:
            nb_board = _shift(board, dr, dc, _WALL)
            target = jnp.where(empty, labels, sent).reshape(-1)
            borders_black = borders_black.at[target].max((nb_board == BLACK).reshape(-1).astype(jnp.int32))
            borders_white = borders_white.at[target].max((nb_board == WHITE).reshape(-1).astype(jnp.int32))

        region_black = (borders_black == 1) & (borders_white == 0)
        region_white = (borders_white == 1) & (borders_black == 0)
        terr_black = jnp.sum(jnp.where(empty, region_black[jnp.clip(labels, 0, sent)], False))
        terr_white = jnp.sum(jnp.where(empty, region_white[jnp.clip(labels, 0, sent)], False))

        black = jnp.sum(board == BLACK) + terr_black
        white = jnp.sum(board == WHITE) + terr_white
        return (black - white).astype(jnp.float32)

    def score(self, board: jnp.ndarray) -> jnp.ndarray:
        """Black-perspective score with komi (``Position.score`` go_engine.py:509)."""
        return self.area_score(board) - jnp.float32(self.komi)

    # -----------------------------------------------------------------------
    # Step
    # -----------------------------------------------------------------------
    def step(self, state: GameState, action: jnp.ndarray) -> GameState:
        """Plays ``action`` (flat [0, N*N) board move, N*N pass, -1 resign).

        No-op when the game is already over. Legality of board moves is the
        caller's contract (search/selfplay select only from the legal mask;
        the host wrapper validates and raises like the reference).
        """
        n = self.board_size
        sent = n * n
        action = jnp.asarray(action, jnp.int32)
        is_resign = action == RESIGN
        is_pass = action == self.pass_move
        is_board_move = ~is_resign & ~is_pass
        color = state.to_play

        a = jnp.clip(action, 0, sent - 1)
        r, c = a // n, a % n

        # --- ko pre-check: the played point is "koish" iff every in-bounds
        # neighbor holds an opponent stone (is_koish, go_engine.py:91-99).
        koish = jnp.bool_(True)
        for dr, dc in _DIRS:
            rr, cc = r + dr, c + dc
            inb = (rr >= 0) & (rr < n) & (cc >= 0) & (cc < n)
            nb_val = state.board[jnp.clip(rr, 0, n - 1), jnp.clip(cc, 0, n - 1)]
            koish &= jnp.where(inb, nb_val == -color, True)

        # --- place stone and resolve captures.
        board1 = state.board.at[r, c].set(
            jnp.where(is_board_move, color, state.board[r, c]).astype(jnp.int8)
        )
        labels1 = self.label_groups(board1)
        counts1 = self.group_liberties(board1, labels1)
        lib_map = jnp.where(labels1 != sent, counts1[jnp.clip(labels1, 0, sent)], 0)
        captured = is_board_move & (board1 == -color) & (lib_map == 0)
        num_captured = jnp.sum(captured, dtype=jnp.int32)
        board2 = jnp.where(captured, jnp.int8(EMPTY), board1)

        # Basic ko (go_engine.py:491-494): single capture from a koish point.
        first_cap = jnp.argmax(captured.reshape(-1)).astype(jnp.int32)
        new_ko = jnp.where(is_board_move & (num_captured == 1) & koish, first_cap, -1)

        new_board = jnp.where(is_board_move, board2, state.board)

        # --- bookkeeping.
        pass_streak = jnp.where(is_pass, state.pass_streak + 1, 0)
        caps_add = jnp.where(
            color == BLACK,
            jnp.array([1, 0], jnp.int32),
            jnp.array([0, 1], jnp.int32),
        ) * num_captured
        captures = state.captures + caps_add
        step_count = state.step_count + 1
        history = jnp.concatenate([new_board[None], state.history[:-1]], axis=0)

        # --- termination (envs/go.py:176-192): resign, two consecutive
        # passes, or max_steps.
        done = is_resign | (pass_streak >= 2) | (step_count >= self.max_steps)

        # Score only matters at termination; computed unconditionally because
        # vmap lowers lax.cond to select anyway (lockstep batches).
        score = self.score(new_board)
        score_winner = jnp.where(score > 0, 1, jnp.where(score < 0, -1, 0)).astype(jnp.int8)
        winner = jnp.where(
            is_resign, (-color).astype(jnp.int8), jnp.where(done, score_winner, jnp.int8(0))
        )
        # Reward for the mover (envs/go.py:137-156): +1 win / -1 loss, 0 draw.
        reward = jnp.where(
            done & (winner != 0),
            jnp.where(winner == color, 1.0, -1.0),
            0.0,
        ).astype(jnp.float32)

        new_state = GameState(
            board=new_board,
            history=history,
            to_play=(-color).astype(jnp.int8),
            step_count=step_count,
            done=done,
            winner=winner,
            last_move=action,
            last_reward=reward,
            ko=new_ko.astype(jnp.int32),
            pass_streak=pass_streak,
            num_passes=state.num_passes + is_pass.astype(jnp.int32),
            captures=captures,
            resigned=is_resign,
            final_score=jnp.where(done & ~is_resign, score, 0.0).astype(jnp.float32),
        )
        # A finished game ignores further steps.
        return jax.tree.map(
            lambda old, new: jnp.where(state.done, old, new), state, new_state
        )

    # -----------------------------------------------------------------------
    # Observation
    # -----------------------------------------------------------------------
    def observation(self, state: GameState) -> jnp.ndarray:
        """Stacked feature planes, channel-last int8[N, N, 2*num_stack+1].

        Plane order [Xt, Yt, Xt-1, Yt-1, ..., C] exactly as the reference
        (``BoardGameEnv.observation`` base.py:228-259); channel-last NHWC is
        the TPU-native layout (transpose to NCHW for parity checks).
        """
        hist = state.history
        cur = hist == state.to_play
        opp = hist == -state.to_play
        planes = jnp.stack([cur, opp], axis=1).reshape(2 * self.num_stack, *hist.shape[1:])
        color = jnp.full((1,) + hist.shape[1:], state.to_play == BLACK)
        obs = jnp.concatenate([planes, color], axis=0).astype(jnp.int8)
        return jnp.transpose(obs, (1, 2, 0))
