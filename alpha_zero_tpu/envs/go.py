"""Pure-JAX vectorized Go engine.

Re-implements the rules of the reference engine (`alpha_zero/envs/go_engine.py`
— Minigo ``Position``/``LibertyTracker``) as fixed-shape XLA programs:

- group/liberty analysis: the reference's incremental set-based
  ``LibertyTracker`` (go_engine.py:166-297) becomes connected-component
  labeling via min-label propagation with pointer-jumping (hook & compress),
  plus a scatter-add liberty count per group root. The analysis is computed
  once per position and CACHED IN THE STATE (``labels``/``group_libs``/
  ``legal``), so a step consumes the parent's analysis for capture detection
  and produces the child's — one labeling pass per move, like the reference's
  incremental tracker but batched.
- legality (`Position.all_legal_moves` go_engine.py:417-441 /
  ``is_move_suicidal`` :386-402): vectorized over every point at once — a move
  on an empty point is non-suicidal iff it has an empty neighbor, an adjacent
  friendly group with >= 2 liberties, or an adjacent opponent group in atari.
- ko: basic ko only, exactly as the reference (single stone captured from a
  "koish" point, go_engine.py:479-494; super-ko intentionally NOT implemented,
  reference README.md:219 — reproduced for parity, not "fixed").
- scoring: Tromp-Taylor area scoring without dead-stone removal
  (go_engine.py:123-152) via empty-region labeling + border-color reduction.
  Scoring only matters at termination, so ``step_batch`` computes it under a
  batch-level ``lax.cond`` — zero cost on the vast majority of steps.

Everything is shape-static and scalar-free so thousands of games step in
lockstep under ``jax.vmap``/``jit`` — replacing the reference's
per-simulation ``copy.deepcopy(env)`` + interpreted stepping
(core/mcts_v2.py:579), the dominant cost of its self-play.
"""

from __future__ import annotations

import functools
import math
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


def _onehot_gather(values: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """``values[idx]`` as a one-hot matmul — native TPU gathers serialize on
    small arrays, while an [M, S] x [S] one-hot product rides the MXU/VPU.

    values: f32[S]; idx: int-valued (any dtype) [M] in [0, S). Returns
    f32[M]. Exact for integer payloads < 2^24.
    """
    s = values.shape[0]
    iota = jnp.arange(s, dtype=jnp.float32)
    oh = (idx.astype(jnp.float32)[:, None] == iota[None, :]).astype(jnp.float32)
    return oh @ values


def _onehot_scatter_add(contrib: jnp.ndarray, idx: jnp.ndarray, size: int) -> jnp.ndarray:
    """``zeros(size).at[idx].add(contrib)`` as a one-hot matmul (transpose
    of the gather trick). contrib: f32[M]; idx: int-valued [M] in [0, size)."""
    iota = jnp.arange(size, dtype=jnp.float32)
    oh = (idx.astype(jnp.float32)[:, None] == iota[None, :]).astype(jnp.float32)
    return contrib @ oh


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
        # Unrolled sweep count for hook-and-compress labeling: enough for all
        # practical positions (validated in tests); pathological shapes
        # (long snakes/spirals) fall through to a convergence-checked
        # while_loop that costs a single condition evaluation when the
        # unrolled rounds already converged.
        self.label_rounds = math.ceil(math.log2(board_size * board_size)) + 3

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
        sent = n * n
        state = GameState(
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
            labels=jnp.full((n, n), float(sent), jnp.float32),
            group_libs=jnp.zeros((sent + 1,), jnp.float32),
            legal=jnp.ones((self.num_actions,), jnp.float32),
        )
        return state

    def init_batch(self, batch_size: int) -> GameState:
        return jax.tree.map(
            lambda x: jnp.broadcast_to(x, (batch_size,) + x.shape), self.init()
        )

    # -----------------------------------------------------------------------
    # Group analysis
    # -----------------------------------------------------------------------
    def _label_sweep(self, labels: jnp.ndarray, same_mask, active) -> jnp.ndarray:
        """One hook (min over connected neighbors) + two pointer jumps.

        Labels are carried as f32 (exact small integers) so the pointer jumps
        — gathers by value — lower to one-hot matmuls on the MXU instead of
        serialized TPU gathers.
        """
        n = self.board_size
        sent = n * n
        m = labels
        for idx, (dr, dc) in enumerate(_DIRS):
            nb_label = _shift(labels, dr, dc, float(sent))
            m = jnp.minimum(m, jnp.where(same_mask[idx], nb_label, float(sent)))
        m = jnp.where(active, m, float(sent))
        iota = jnp.arange(sent + 1, dtype=jnp.float32)
        for _ in range(2):
            flat = m.reshape(-1)
            vals = jnp.concatenate([flat, jnp.full((1,), sent, jnp.float32)])
            oh = (flat[:, None] == iota[None, :]).astype(jnp.float32)
            m = (oh @ vals).reshape(n, n)
        return m

    def _label_components(self, active: jnp.ndarray, same_mask) -> jnp.ndarray:
        """Connected components over ``active`` cells with per-direction
        connectivity ``same_mask[4, N, N]``; returns min-flat-index labels
        (sent = N*N for inactive cells).

        ``label_rounds`` sweeps are unrolled into straight-line fused code
        (covers all practical positions); a convergence-checked while_loop
        then handles pathological long-geodesic groups — when already
        converged it costs exactly one extra sweep + condition.
        """
        n = self.board_size
        sent = n * n
        idx = jnp.arange(sent, dtype=jnp.float32).reshape(n, n)
        labels = jnp.where(active, idx, float(sent))
        for _ in range(self.label_rounds):
            labels = self._label_sweep(labels, same_mask, active)

        def cond(carry):
            labels, changed, i = carry
            return changed & (i < sent)

        def body(carry):
            labels, _, i = carry
            new = self._label_sweep(labels, same_mask, active)
            return new, jnp.any(new != labels), i + 1

        first = self._label_sweep(labels, same_mask, active)
        labels, _, _ = jax.lax.while_loop(
            cond, body, (first, jnp.any(first != labels), jnp.int32(0))
        )
        return labels  # f32 (exact small integers)

    def label_groups(self, board: jnp.ndarray) -> jnp.ndarray:
        """Group labels for stones (both colors at once; same-color
        connectivity). f32[N, N] exact integers; N*N for empty cells."""
        active = board != EMPTY
        same = []
        for dr, dc in _DIRS:
            nb_board = _shift(board, dr, dc, _WALL)
            same.append((nb_board == board) & active)
        return self._label_components(active, same)

    def group_liberties(self, board: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
        """Liberty count per group root: the number of *distinct* empty points
        adjacent to each group (go_engine.py:178). f32[N*N + 1]; the last
        slot is a scatter dump for invalid contributions."""
        n = self.board_size
        sent = n * n
        empty = board == EMPTY

        counts = jnp.zeros(sent + 1, jnp.float32)
        seen = []
        for dr, dc in _DIRS:
            nb_label = _shift(labels, dr, dc, sent)
            dup = functools.reduce(
                jnp.logical_or, [nb_label == p for p in seen], jnp.zeros_like(empty)
            )
            valid = empty & (nb_label != sent) & ~dup
            target = jnp.where(valid, nb_label, sent).reshape(-1)
            counts = counts + _onehot_scatter_add(
                valid.reshape(-1).astype(jnp.float32), target, sent + 1
            )
            seen.append(nb_label)
        return counts  # f32 counts

    def _compute_legal(self, board, labels, counts, ko, to_play, done) -> jnp.ndarray:
        """Vectorized all-points legality (go_engine.py:417-441)."""
        n = self.board_size
        sent = n * n
        empty = board == EMPTY
        has_empty_nb = jnp.zeros_like(empty)
        friendly_alive = jnp.zeros_like(empty)
        captures_sth = jnp.zeros_like(empty)
        counts_f = counts
        for dr, dc in _DIRS:
            nb_board = _shift(board, dr, dc, _WALL)
            nb_label = _shift(labels, dr, dc, sent)
            libs_gathered = _onehot_gather(counts_f, nb_label.reshape(-1)).reshape(n, n)
            nb_libs = jnp.where(nb_label != sent, libs_gathered, 0.0)
            has_empty_nb |= nb_board == EMPTY
            friendly_alive |= (nb_board == to_play) & (nb_libs >= 2)
            captures_sth |= (nb_board == -to_play) & (nb_libs == 1)
        not_suicide = has_empty_nb | friendly_alive | captures_sth
        idx = jnp.arange(sent, dtype=jnp.int32).reshape(n, n)
        playable = empty & not_suicide & (idx != ko)
        legal = jnp.concatenate(
            [playable.reshape(-1).astype(jnp.float32), jnp.ones((1,), jnp.float32)]
        )
        return jnp.where(done, jnp.zeros_like(legal), legal)

    def analyze(self, state: GameState) -> GameState:
        """(Re)computes the cached analysis fields from the raw board — used
        when a state is constructed by hand (tests, SGF replay)."""
        labels = self.label_groups(state.board)
        counts = self.group_liberties(state.board, labels)
        legal = self._compute_legal(state.board, labels, counts, state.ko,
                                    state.to_play, state.done)
        return state.replace(labels=labels, group_libs=counts, legal=legal)

    def legal_actions(self, state: GameState) -> jnp.ndarray:
        """f32[N*N + 1] legal-move mask (0/1) — precomputed by init/step."""
        return state.legal

    # -----------------------------------------------------------------------
    # Scoring
    # -----------------------------------------------------------------------
    def area_counts(self, board: jnp.ndarray) -> tuple:
        """Per-player Tromp-Taylor areas (black, white), *before* komi.

        Empty regions bordered only by black count for black, only-white for
        white, mixed (dame/seki) for neither — exactly ``area_score``
        (go_engine.py:123-152), including NOT removing dead stones (the
        limitation demonstrated by ``analysis score-demo`` /
        others/go_score_system.py).
        """
        n = self.board_size
        sent = n * n
        empty = board == EMPTY
        same = []
        for dr, dc in _DIRS:
            nb_empty = _shift(empty, dr, dc, False)
            same.append(nb_empty & empty)
        labels = self._label_components(empty, same)

        # Border "max" over 0/1 flags == "any", i.e. scatter-add > 0 — which
        # keeps everything in one-hot matmul land.
        target = jnp.where(empty, labels, sent).reshape(-1)
        black_touch = jnp.zeros(sent + 1, jnp.float32)
        white_touch = jnp.zeros(sent + 1, jnp.float32)
        for dr, dc in _DIRS:
            nb_board = _shift(board, dr, dc, _WALL)
            black_touch = black_touch + _onehot_scatter_add(
                (nb_board == BLACK).reshape(-1).astype(jnp.float32), target, sent + 1
            )
            white_touch = white_touch + _onehot_scatter_add(
                (nb_board == WHITE).reshape(-1).astype(jnp.float32), target, sent + 1
            )

        region_black = ((black_touch > 0) & (white_touch == 0)).astype(jnp.float32)
        region_white = ((white_touch > 0) & (black_touch == 0)).astype(jnp.float32)
        terr_black = jnp.sum(
            jnp.where(empty.reshape(-1), _onehot_gather(region_black, target), 0.0)
        )
        terr_white = jnp.sum(
            jnp.where(empty.reshape(-1), _onehot_gather(region_white, target), 0.0)
        )

        black = jnp.sum(board == BLACK) + terr_black
        white = jnp.sum(board == WHITE) + terr_white
        return black.astype(jnp.float32), white.astype(jnp.float32)

    def area_score(self, board: jnp.ndarray) -> jnp.ndarray:
        """Tromp-Taylor area score, black-perspective, *before* komi."""
        black, white = self.area_counts(board)
        return black - white

    def score(self, board: jnp.ndarray) -> jnp.ndarray:
        """Black-perspective score with komi (``Position.score`` go_engine.py:509)."""
        return self.area_score(board) - jnp.float32(self.komi)

    # -----------------------------------------------------------------------
    # Step
    # -----------------------------------------------------------------------
    def step_core(self, state: GameState, action: jnp.ndarray) -> GameState:
        """Plays ``action`` (flat [0, N*N) board move, N*N pass, -1 resign)
        WITHOUT terminal scoring — ``step_batch`` fills scores at the batch
        level; use :meth:`step` for single-game use.

        Capture detection consumes the parent's cached analysis: an opponent
        neighbor group with exactly one liberty dies — that liberty must be
        the played point itself (it is empty and adjacent). No-op when the
        game is already over. Legality of board moves is the caller's
        contract (search/selfplay select from the cached legal mask; the host
        wrapper validates and raises like the reference).
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

        # Gather the four neighbors' board values and group labels.
        nb_vals = []
        nb_labels = []
        koish = jnp.bool_(True)
        for dr, dc in _DIRS:
            rr, cc = r + dr, c + dc
            inb = (rr >= 0) & (rr < n) & (cc >= 0) & (cc < n)
            rc, cc2 = jnp.clip(rr, 0, n - 1), jnp.clip(cc, 0, n - 1)
            val = jnp.where(inb, state.board[rc, cc2], _WALL)
            lab = jnp.where(inb, state.labels[rc, cc2], sent)
            nb_vals.append(val)
            nb_labels.append(lab)
            # koish: every in-bounds neighbor is an opponent stone
            # (is_koish, go_engine.py:91-99).
            koish &= jnp.where(inb, val == -color, True)

        # Captured groups: opponent neighbors in atari (their single liberty
        # is the played point).
        captured = jnp.zeros((n, n), jnp.bool_)
        for val, lab in zip(nb_vals, nb_labels):
            lab_idx = jnp.clip(lab, 0, sent).astype(jnp.int32)
            dies = is_board_move & (val == -color) & (state.group_libs[lab_idx] == 1)
            captured |= dies & (state.labels == lab)
        num_captured = jnp.sum(captured, dtype=jnp.int32)

        # One-hot blend, NOT ``board.at[r, c].set``: a per-lane 2-D scatter
        # under vmap serializes on TPU (the Gomoku 36x step-time finding,
        # PERF.md) and on the axon backend at batch >= ~2048 silently DROPS
        # writes with flat index >= 64 — boards diverged from CPU until this
        # blend (caught by the pro-corpus replay, round 4).
        point_oh_b = (
            jnp.arange(sent, dtype=jnp.int32).reshape(n, n) == a
        )
        board1 = jnp.where(point_oh_b & is_board_move, color, state.board)
        new_board = jnp.where(captured, jnp.int8(EMPTY), board1)
        new_board = jnp.where(is_board_move, new_board, state.board)

        # Basic ko (go_engine.py:491-494): single capture from a koish point.
        first_cap = jnp.argmax(captured.reshape(-1)).astype(jnp.int32)
        new_ko = jnp.where(is_board_move & (num_captured == 1) & koish, first_cap, -1)

        # --- bookkeeping.
        pass_streak = jnp.where(is_pass, state.pass_streak + 1, 0)
        caps_add = jnp.where(
            color == BLACK,
            jnp.array([1, 0], jnp.int32),
            jnp.array([0, 1], jnp.int32),
        ) * num_captured
        captures_cnt = state.captures + caps_add
        step_count = state.step_count + 1
        history = jnp.concatenate([new_board[None], state.history[:-1]], axis=0)

        # --- termination (envs/go.py:176-192): resign, two consecutive
        # passes, or max_steps. Winner/reward for score-decided games are
        # filled by step_batch's conditional scoring pass.
        done = is_resign | (pass_streak >= 2) | (step_count >= self.max_steps)
        winner = jnp.where(is_resign, (-color).astype(jnp.int8), jnp.int8(0))
        reward = jnp.where(is_resign, -1.0, 0.0).astype(jnp.float32)

        # --- new position analysis: labels are updated INCREMENTALLY (exact).
        # Placing a stone can only (a) create/merge friendly groups through
        # the played point and (b) delete captured opponent groups; no other
        # group's membership changes. Labels are min-flat-index per group, so
        # the merged group's label is min(point, adjacent friendly labels) —
        # the same fixed point full relabeling reaches, in one elementwise
        # pass instead of O(log N^2) propagation sweeps (the reference's
        # incremental LibertyTracker.add_stone, go_engine.py:217-262, batched).
        friendly = [
            jnp.where(val == color, lab, float(sent)).astype(jnp.float32)
            for val, lab in zip(nb_vals, nb_labels)
        ]
        merged = functools.reduce(jnp.minimum, friendly, a.astype(jnp.float32))
        absorbed = functools.reduce(
            jnp.logical_or,
            [(state.labels == f) & (f < sent) for f in friendly],
        )
        point_oh = point_oh_b
        labels = jnp.where(absorbed | point_oh, merged, state.labels)
        labels = jnp.where(captured, float(sent), labels)
        labels = jnp.where(is_board_move, labels, state.labels)
        counts = self.group_liberties(new_board, labels)
        legal = self._compute_legal(new_board, labels, counts, new_ko,
                                    (-color).astype(jnp.int8), done)

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
            captures=captures_cnt,
            resigned=is_resign,
            final_score=jnp.float32(0.0),
            labels=labels,
            group_libs=counts,
            legal=legal,
        )
        # A finished game ignores further steps.
        return jax.tree.map(
            lambda old, new: jnp.where(state.done, old, new), state, new_state
        )

    def _finalize_scores(self, was_done: jnp.ndarray, stepped: GameState) -> GameState:
        """Fills winner/reward/final_score for games that just terminated by
        double-pass or max_steps (score-decided; resign is already settled)."""
        needs = stepped.done & ~stepped.resigned & ~was_done

        def fill(s: GameState) -> GameState:
            scores = jax.vmap(self.score)(s.board)
            score_winner = jnp.where(
                scores > 0, 1, jnp.where(scores < 0, -1, 0)
            ).astype(jnp.int8)
            mover = (-s.to_play).astype(jnp.int8)  # player who made the move
            reward = jnp.where(
                score_winner != 0,
                jnp.where(score_winner == mover, 1.0, -1.0),
                0.0,
            ).astype(jnp.float32)
            return s.replace(
                winner=jnp.where(needs, score_winner, s.winner),
                last_reward=jnp.where(needs, reward, s.last_reward),
                final_score=jnp.where(needs, scores, s.final_score),
            )

        return jax.lax.cond(jnp.any(needs), fill, lambda s: s, stepped)

    def step_batch(self, states: GameState, actions: jnp.ndarray) -> GameState:
        """Batched step with terminal scoring under a batch-level cond —
        the hot-path entry point (scoring costs nothing on the overwhelming
        majority of steps)."""
        was_done = states.done
        stepped = jax.vmap(self.step_core)(states, actions)
        return self._finalize_scores(was_done, stepped)

    def step(self, state: GameState, action: jnp.ndarray) -> GameState:
        """Single-game step including terminal scoring (host wrapper, tests)."""
        batched = jax.tree.map(lambda x: x[None], state)
        out = self.step_batch(batched, jnp.asarray(action, jnp.int32)[None])
        return jax.tree.map(lambda x: x[0], out)

    # -----------------------------------------------------------------------
    # Observation
    # -----------------------------------------------------------------------
    def with_num_stack(self, num_stack: int) -> "GoEngine":
        """Same rules, different history depth (the search stores 1-deep
        states and rebuilds observation stacks from ancestor boards)."""
        return GoEngine(board_size=self.board_size, num_stack=num_stack,
                        komi=self.komi, max_steps=self.max_steps)

    @staticmethod
    def observation_from(history: jnp.ndarray, to_play: jnp.ndarray) -> jnp.ndarray:
        """Stacked feature planes from an explicit [S, N, N] board history
        (latest first), channel-last int8[N, N, 2*S+1].

        Plane order [Xt, Yt, Xt-1, Yt-1, ..., C] exactly as the reference
        (``BoardGameEnv.observation`` base.py:228-259); channel-last NHWC is
        the TPU-native layout (transpose to NCHW for parity checks).
        """
        s = history.shape[0]
        cur = history == to_play
        opp = history == -to_play
        planes = jnp.stack([cur, opp], axis=1).reshape(2 * s, *history.shape[1:])
        color = jnp.full((1,) + history.shape[1:], to_play == BLACK)
        obs = jnp.concatenate([planes, color], axis=0).astype(jnp.int8)
        return jnp.transpose(obs, (1, 2, 0))

    def observation(self, state: GameState) -> jnp.ndarray:
        """Observation from the state's own rolled history."""
        return self.observation_from(state.history, state.to_play)
