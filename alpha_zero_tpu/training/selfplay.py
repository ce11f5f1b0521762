"""Device-resident batched self-play.

The reference's actor fleet — N processes each deep-copying a Python env per
MCTS simulation (`run_selfplay_actor_loop` pipeline.py:166-286,
`play_and_record_one_game` :289-382) — becomes ONE jitted program stepping
thousands of games in lockstep:

    selfplay_step:  batched MCTS  ->  temperature policy  ->  move sampling
                    -> resignation logic -> batched engine step -> auto-reset

Per call it emits one transition per live game (root observation, search
policy, metadata); the host accumulates per-game episodes and finalizes them
(z-target assignment per pipeline.py:349-354) into the replay buffer when
games complete. Game completion resets the slot in place, so the batch never
idles.

Resignation parity (pipeline.py:328-341, 361-365): per-game resign-disabled
flags sampled at game start with probability ``disable_resign_ratio``; a game
is "marked" the first time both root Q and best-child Q fall below the
threshold after ``check_resign_after_steps``; marked games with resignation
enabled actually resign, disabled ones play on to measure false positives.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from alpha_zero_tpu.envs.types import RESIGN, GameState
from alpha_zero_tpu.utils.results import result_string
from alpha_zero_tpu.search import mcts


@struct.dataclass
class SelfplayState:
    """Batched device state carried across self-play steps."""

    games: GameState              # [B] live games (never done on entry)
    resign_disabled: jnp.ndarray  # bool[B]
    marked_resign_player: jnp.ndarray  # int8[B]; 0 = unmarked
    trees: Optional[mcts.Tree] = None  # [B] carried search trees (subtree reuse)


class StepOutput(NamedTuple):
    """Per-move record for every game slot (host copies these out)."""

    obs: jnp.ndarray            # root observation: [B, N, N, C] int8 planes,
    #                             OR [B, N, N] int32 with plane c in bit c —
    #                             make_selfplay_step emits the bit-packed
    #                             form (binary planes, C <= 31) to cut the
    #                             per-step device->host transfer ~4x; the
    #                             accumulator unpacks by ndim
    search_pi: jnp.ndarray      # [B, A] f32
    to_play: jnp.ndarray        # [B] i8 (player who chose the move)
    move: jnp.ndarray           # [B] i32 (RESIGN == -1)
    root_q: jnp.ndarray         # [B] f32
    best_child_q: jnp.ndarray   # [B] f32
    root_visits: jnp.ndarray    # [B] f32; root N when the budget ended —
    #                             carried (reuse) + new sims; < num_simulations
    #                             means max_new_sims cut this lane short
    # Game-completion info (valid where done):
    done: jnp.ndarray           # [B] bool
    winner: jnp.ndarray         # [B] i8
    resigned: jnp.ndarray       # [B] bool
    final_score: jnp.ndarray    # [B] f32
    game_length: jnp.ndarray    # [B] i32
    num_passes: jnp.ndarray     # [B] i32
    was_resign_disabled: jnp.ndarray    # [B] bool
    marked_resign_player: jnp.ndarray   # [B] i8


def init_selfplay_state(engine, batch_size: int, rng: jax.Array,
                        resign_threshold: float,
                        disable_resign_ratio: float,
                        reuse_num_simulations: Optional[int] = None) -> SelfplayState:
    """``reuse_num_simulations`` (the search budget) must be set when the
    selfplay step was built with ``search_cfg.reuse_subtree`` — it sizes the
    carried trees (fresh/empty at start)."""
    games = engine.init_batch(batch_size)
    disabled = _sample_resign_disabled(
        rng, batch_size, engine.has_resign_move, resign_threshold, disable_resign_ratio
    )
    trees = None
    if reuse_num_simulations is not None:
        # Under jit so every tree leaf gets its own buffer — eager
        # broadcast_to would alias the games' arrays and break donation.
        trees = jax.jit(
            functools.partial(mcts.make_empty_trees, engine,
                              num_simulations=reuse_num_simulations)
        )(games)
    return SelfplayState(
        games=games,
        resign_disabled=disabled,
        marked_resign_player=jnp.zeros((batch_size,), jnp.int8),
        trees=trees,
    )


def _sample_resign_disabled(rng, batch_size, has_resign, threshold, ratio):
    """Parity with pipeline.py:244-246: resign enabled (disabled=False) iff
    the env supports it, the threshold is active, and rand() > ratio."""
    if not has_resign:
        return jnp.ones((batch_size,), jnp.bool_)
    u = jax.random.uniform(rng, (batch_size,))
    enabled = (threshold > -1.0) & (u > ratio)
    return ~enabled


def make_selfplay_step(
    engine,
    net,
    search_cfg,
    resign_cfg,
    deterministic: bool = False,
    root_noise: bool = True,
) -> Callable:
    """Builds the jitted self-play step.

    Returns ``step(variables, sp_state, rng, resign_threshold) ->
    (new_sp_state, StepOutput)`` where ``variables`` is the Flax variable
    dict and ``resign_threshold`` a host-controlled f32 scalar (the learner's
    dynamic controller feeds it in, replacing the reference's
    ``var_resign_threshold`` shared value)."""

    has_pass = engine.has_pass_move
    pass_move = engine.pass_move if has_pass else None
    has_resign = engine.has_resign_move
    warm_up_steps = search_cfg.warm_up_steps
    check_after = resign_cfg.check_resign_after_steps
    disable_ratio = resign_cfg.disable_resign_ratio
    reuse = getattr(search_cfg, "reuse_subtree", False)
    max_new_sims = getattr(search_cfg, "max_new_sims", None)
    if max_new_sims is not None and not reuse:
        # Without reuse every tree is fresh and needs the full
        # num_simulations - 1 loop; a smaller cap would silently truncate
        # every search below budget and skew the visit-count policy.
        raise ValueError(
            "search.max_new_sims requires search.reuse_subtree=True "
            f"(got max_new_sims={max_new_sims} with reuse off)"
        )
    warm_temp = getattr(search_cfg, "warm_up_temperature", 1.0)
    final_temp = getattr(search_cfg, "temperature", 0.1)

    def eval_fn_factory(variables):
        def eval_fn(obs):
            out = net.apply(variables, obs, train=False)
            return jax.nn.softmax(out.pi_logits, axis=-1), out.value

        return eval_fn

    def selfplay_step(variables, sp: SelfplayState, rng: jax.Array,
                      resign_threshold: jnp.ndarray):
        rng_search, rng_move, rng_resign = jax.random.split(rng, 3)
        games = sp.games
        batch = games.done.shape[0]

        obs = jax.vmap(engine.observation)(games)
        search_out = mcts.batched_search(
            eval_fn_factory(variables), engine, games, rng_search,
            num_simulations=search_cfg.num_simulations,
            c_puct_base=search_cfg.c_puct_base,
            c_puct_init=search_cfg.c_puct_init,
            root_noise=root_noise,
            dirichlet_eps=search_cfg.dirichlet_eps,
            dirichlet_alpha=search_cfg.dirichlet_alpha,
            prev_trees=sp.trees if reuse else None,
            max_new_sims=max_new_sims,
            return_trees=reuse,
        )
        result, trees = search_out if reuse else (search_out, None)

        # warm_up iff env.steps <= warm_up_steps (pipeline.py:320).
        warm_up = games.step_count <= warm_up_steps
        search_pi = mcts.policy_from_counts(
            result.child_N, result.legal, warm_up,
            warm_up_temperature=warm_temp, temperature=final_temp,
        )
        move = mcts.sample_move(
            rng_move, search_pi, result.legal, result.child_N, warm_up,
            pass_move=pass_move, deterministic=deterministic,
        )
        best_q = mcts.best_child_q(result.child_N, result.child_W, move)

        # Resignation (pipeline.py:328-341).
        if has_resign:
            active = resign_threshold > -1.0
            signal = (
                active
                & (games.step_count > check_after)
                & (result.root_Q < resign_threshold)
                & (best_q < resign_threshold)
            )
            newly_marked = signal & (sp.marked_resign_player == 0)
            marked = jnp.where(newly_marked, games.to_play, sp.marked_resign_player)
            do_resign = signal & ~sp.resign_disabled
            move = jnp.where(do_resign, jnp.int32(RESIGN), move)
        else:
            marked = sp.marked_resign_player

        to_play = games.to_play
        stepped = engine.step_batch(games, move)
        done = stepped.done

        # Bit-pack the binary observation planes (plane c -> bit c): the
        # [B, N, N, C] int8 tensor is the dominant device->host transfer of
        # the harvest (1.4 MB/step at go9) and the tunnel's D2H serializes
        # with compute — [B, N, N] int32 is 4.3x smaller, exactly invertible.
        plane_bits = 2 ** jnp.arange(obs.shape[-1], dtype=jnp.int32)
        obs_packed = jnp.sum(obs.astype(jnp.int32) * plane_bits, axis=-1)

        out = StepOutput(
            obs=obs_packed,
            search_pi=search_pi,
            to_play=to_play,
            move=move,
            root_q=result.root_Q,
            best_child_q=best_q,
            root_visits=1.0 + result.child_N.sum(-1),
            done=done,
            winner=stepped.winner,
            resigned=stepped.resigned,
            final_score=stepped.final_score,
            game_length=stepped.step_count,
            num_passes=stepped.num_passes,
            was_resign_disabled=sp.resign_disabled,
            marked_resign_player=marked,
        )

        # Auto-reset finished slots; resample their resign-disabled flags.
        fresh = engine.init_batch(batch)
        new_games = jax.tree.map(
            lambda f, s: jnp.where(
                done.reshape((batch,) + (1,) * (s.ndim - 1)), f, s
            ),
            fresh, stepped,
        )
        new_disabled = _sample_resign_disabled(
            rng_resign, batch, has_resign, resign_threshold, disable_ratio
        )
        new_trees = None
        if reuse:
            # Promote the chosen child's subtree into the next move's root;
            # finished (auto-reset) games get fresh trees.
            new_trees = mcts.reroot_trees(trees, move, done, new_games,
                                          engine.num_actions)
        new_sp = SelfplayState(
            games=new_games,
            resign_disabled=jnp.where(done, new_disabled, sp.resign_disabled),
            marked_resign_player=jnp.where(done, jnp.int8(0), marked),
            trees=new_trees,
        )
        return new_sp, out

    return jax.jit(selfplay_step, donate_argnums=(1,))


# ---------------------------------------------------------------------------
# Host-side episode accumulation
# ---------------------------------------------------------------------------


class FinishedGame(NamedTuple):
    """One completed game, host-side (reference stats: pipeline.py:367-380)."""

    states: np.ndarray     # [L, N, N, C] int8
    pi_probs: np.ndarray   # [L, A] f32
    values: np.ndarray     # [L] f32 z-targets
    stats: dict
    moves: list            # [(color 'B'/'W', flat move)] excluding resign — for SGF


class EpisodeAccumulator:
    """Collects per-slot transitions; emits finished games with z-targets.

    z assignment (pipeline.py:349-354): all-zero on draws, else +1 for steps
    whose to-play player won, -1 otherwise.
    """

    def __init__(self, batch_size: int, num_planes: Optional[int] = None) -> None:
        self.batch_size = batch_size
        self.num_planes = num_planes  # needed to unpack bit-packed obs
        self._obs: list[list[np.ndarray]] = [[] for _ in range(batch_size)]
        self._pi: list[list[np.ndarray]] = [[] for _ in range(batch_size)]
        self._to_play: list[list[int]] = [[] for _ in range(batch_size)]
        self._moves: list[list] = [[] for _ in range(batch_size)]
        self._stale = np.zeros(batch_size, np.bool_)

    def mark_all_stale(self) -> None:
        """Flags every in-flight game as started under now-replaced weights.
        Their FinishedGame.stats['stale'] will be True — the trainer drops
        them, matching the reference's generation fence which deletes games
        from older checkpoints (pipeline.py:492-493). Empty slots (game about
        to start fresh) are not in flight and stay clean."""
        for i in range(self.batch_size):
            self._stale[i] = bool(self._obs[i])

    def add_step(self, out: StepOutput) -> list[FinishedGame]:
        obs = np.asarray(out.obs)
        if obs.ndim == 3:
            # Bit-packed planes from make_selfplay_step; unpack on host.
            if self.num_planes is None:
                raise ValueError(
                    "bit-packed obs needs EpisodeAccumulator(num_planes=...)")
            obs = (
                (obs[..., None] >> np.arange(self.num_planes, dtype=np.int32))
                & 1
            ).astype(np.int8)
        pi = np.asarray(out.search_pi)
        # One vectorized device->host->list conversion per array; the per-slot
        # loop then touches plain Python ints (a per-element np scalar cast
        # here costs ~5 Python/numpy calls per slot per step, the dominant
        # host-side term at large batch).
        to_play = np.asarray(out.to_play).tolist()
        move = np.asarray(out.move).tolist()
        done_idx = np.flatnonzero(np.asarray(out.done))
        winner = np.asarray(out.winner)

        finished: list[FinishedGame] = []
        for i in range(self.batch_size):
            # The transition for the final (even resigning) step is recorded
            # — the reference appends obs/pi before env.step
            # (pipeline.py:323-343). Resign moves are excluded from the SGF
            # move history only (envs/go.py:101-122).
            self._obs[i].append(obs[i])
            self._pi[i].append(pi[i])
            self._to_play[i].append(to_play[i])
            if move[i] != RESIGN:
                color = "B" if to_play[i] == 1 else "W"
                self._moves[i].append((color, move[i]))
        for i in done_idx:
            finished.append(self._finalize(int(i), out, i_winner=int(winner[i])))
        return finished

    def _finalize(self, i: int, out: StepOutput, i_winner: int) -> FinishedGame:
        states = np.stack(self._obs[i])
        pis = np.stack(self._pi[i])
        to_plays = np.asarray(self._to_play[i], np.int8)
        if i_winner == 0:
            values = np.zeros(len(to_plays), np.float32)
        else:
            values = np.where(to_plays == i_winner, 1.0, -1.0).astype(np.float32)

        marked = int(np.asarray(out.marked_resign_player)[i])
        was_disabled = bool(np.asarray(out.was_resign_disabled)[i])
        is_marked = was_disabled and marked != 0
        is_could_won = is_marked and i_winner == marked

        resigned = bool(np.asarray(out.resigned)[i])
        score = float(np.asarray(out.final_score)[i])
        result = result_string(i_winner, score, resigned)

        stats = {
            "game_length": int(np.asarray(out.game_length)[i]),
            "game_result": result,
            "num_passes": int(np.asarray(out.num_passes)[i]),
            "is_resign_disabled": was_disabled,
            "is_marked_for_resign": is_marked,
            "is_could_won": is_could_won,
            "marked_resign_player": {1: "B", -1: "W", 0: None}[marked],
            "winner": i_winner,
            "stale": bool(self._stale[i]),
        }
        self._stale[i] = False

        moves = list(self._moves[i])
        self._obs[i].clear()
        self._pi[i].clear()
        self._to_play[i].clear()
        self._moves[i].clear()
        return FinishedGame(states=states, pi_probs=pis, values=values, stats=stats,
                            moves=moves)
