"""Evaluator: latest-vs-previous matches with Elo + pro-game metrics.

Parity targets:
- ``eval_against_prev_ckpt`` (pipeline.py:814-867): one deterministic game,
  black = latest checkpoint, white = previous, no root noise, Elo update for
  both players, SGF record. This remains the reference-exact mode
  (``eval_games=1``); the default plays ``eval_games`` stochastic lockstep
  games per checkpoint with alternating colors (half latest-as-black, half
  latest-as-white) and updates Elo per game — one deterministic game per
  checkpoint gives Elo dominated by komi/color noise (a single batch-1
  sample), while N color-balanced games track actual strength.
- ``eval_on_pro_games`` (pipeline.py:870-941): top-1/3/5 human-move accuracy,
  policy entropy, value MSE over the pro-game dataset — here a single jitted
  batched scan instead of a torch DataLoader loop.
- ``run_evaluator_loop`` (pipeline.py:678-811): the surrounding loop —
  checkpoint polling becomes a direct function call from the trainer (same
  host), with black/white promotion and Elo copying preserved.
"""

from __future__ import annotations

import functools
from collections import namedtuple
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from alpha_zero_tpu.envs.types import BLACK
from alpha_zero_tpu.eval.dataset import EvalDataset
from alpha_zero_tpu.eval.elo import EloRating
from alpha_zero_tpu.search import mcts
from alpha_zero_tpu.utils.results import result_string

PlayerMove = namedtuple("PlayerMove", ["color", "move"])


def make_eval_move_fn(engine, net, search_cfg) -> Callable:
    """Jitted deterministic move: search without noise, argmax visit count
    (create_mcts_player with root_noise=False, deterministic=True,
    pipeline.py:741-757)."""

    def eval_fn_factory(variables):
        def eval_fn(obs):
            out = net.apply(variables, obs, train=False)
            return jax.nn.softmax(out.pi_logits, axis=-1), out.value

        return eval_fn

    def move_fn(variables, state):
        roots = jax.tree.map(lambda x: x[None], state)
        result = mcts.batched_search(
            eval_fn_factory(variables), engine, roots, jax.random.PRNGKey(0),
            num_simulations=search_cfg.num_simulations,
            c_puct_base=search_cfg.c_puct_base,
            c_puct_init=search_cfg.c_puct_init,
            root_noise=False,
        )
        move = jnp.argmax(result.child_N, axis=-1).astype(jnp.int32)[0]
        new_state = engine.step(state, move)
        return new_state, move

    return jax.jit(move_fn)


def play_eval_game(engine, move_fn, black_variables, white_variables) -> Dict:
    """One deterministic game: black plays ``black_variables``'s net."""
    state = engine.init()
    num_passes = 0
    moves = []
    while not bool(state.done):
        variables = black_variables if int(state.to_play) == BLACK else white_variables
        color = "B" if int(state.to_play) == BLACK else "W"
        state, move = move_fn(variables, state)
        move = int(move)
        moves.append(PlayerMove(color, move))
        if engine.has_pass_move and move == engine.pass_move:
            num_passes += 1

    winner = int(state.winner)
    score = float(state.final_score)
    result = result_string(winner, score, bool(state.resigned))

    stats = {
        "game_length": int(state.step_count),
        "game_result": result,
        "winner": winner,
        "moves": moves,
    }
    if engine.has_pass_move:
        stats["num_passes"] = num_passes
    return stats


def eval_against_prev_ckpt(engine, move_fn, black_variables, white_variables,
                           black_elo: EloRating, white_elo: EloRating) -> Dict:
    """Single match + Elo update (pipeline.py:814-867)."""
    stats = play_eval_game(engine, move_fn, black_variables, white_variables)
    winner = stats.pop("winner")
    moves = stats.pop("moves")
    if winner != 0:
        if winner == BLACK:
            w, l = black_elo, white_elo
        else:
            w, l = white_elo, black_elo
        w.update_rating(l.rating, 1)
        l.update_rating(w.rating, 0)
    stats["black_elo_rating"] = black_elo.rating
    stats["white_elo_rating"] = white_elo.rating
    stats["_moves"] = moves
    return stats


def make_pro_metrics_fn(net, k_list=(1, 3, 5)) -> Callable:
    """Jitted batched metrics pass (pipeline.py:870-941)."""
    max_k = max(k_list)

    def metrics(variables, states, target_pi, target_v):
        out = net.apply(variables, states, train=False)
        probs = jax.nn.softmax(out.pi_logits, axis=-1)
        target_idx = jnp.argmax(target_pi, axis=-1)
        _, topk = jax.lax.top_k(probs, max_k)
        match = topk == target_idx[:, None]
        correct = {k: jnp.sum(jnp.any(match[:, :k], axis=-1)) for k in k_list}
        entropy = -jnp.sum(probs * jnp.log(jnp.maximum(probs, 1e-12)), axis=-1).sum()
        mse = jnp.sum(jnp.square(out.value - target_v))
        return correct, entropy, mse

    return jax.jit(metrics)


def eval_on_pro_games(metrics_fn, variables, dataset: EvalDataset,
                      batch_size: int = 1024, k_list=(1, 3, 5)) -> Dict:
    """Streams the dataset through the jitted metrics pass. The final partial
    batch is padded and masked via weighting by true count."""
    m = len(dataset)
    if m == 0:
        return {}
    total_correct = {k: 0 for k in k_list}
    total_entropy = 0.0
    total_mse = 0.0
    for start in range(0, m, batch_size):
        end = min(start + batch_size, m)
        states = jnp.asarray(dataset.states[start:end])
        pi = jnp.asarray(dataset.target_pi[start:end])
        v = jnp.asarray(dataset.target_v[start:end])
        correct, entropy, mse = metrics_fn(variables, states, pi, v)
        for k in k_list:
            total_correct[k] += int(correct[k])
        total_entropy += float(entropy)
        total_mse += float(mse)

    stats = {
        "value_mse_error": total_mse / m,
        "policy_entropy": total_entropy / m,
    }
    for k in k_list:
        stats[f"policy_top_{k}_accuracy"] = total_correct[k] / m
    return stats


class Evaluator:
    """Holds prev-checkpoint weights + Elo state across generations
    (run_evaluator_loop, pipeline.py:678-811).

    ``eval_games=1`` is the reference-exact mode (one deterministic game,
    latest always black). ``eval_games=N`` plays N stochastic lockstep games
    per checkpoint — N//2 with the latest model as black and the rest as
    white — through the batched match player (eval/match.py semantics:
    visit-count sampling, no root noise), updating Elo once per finished
    game. Deterministic games can't be batched for signal (N identical
    replicas), and one game per checkpoint is komi/color noise."""

    def __init__(self, engine, net, search_cfg, default_rating: float = 0.0,
                 dataset: Optional[EvalDataset] = None,
                 eval_games: int = 1) -> None:
        self.engine = engine
        self.eval_games = max(1, int(eval_games))
        self.move_fn = make_eval_move_fn(engine, net, search_cfg)
        if self.eval_games > 1:
            from alpha_zero_tpu.eval.match import make_match_move_fn

            # Built once: jit caches per (variables-structure, batch) so the
            # two color batches compile once each across all checkpoints.
            self.batch_move_fn = make_match_move_fn(engine, net, search_cfg)
        else:
            self.batch_move_fn = None
        self.metrics_fn = make_pro_metrics_fn(net)
        self.black_elo = EloRating(rating=default_rating)
        self.white_elo = EloRating(rating=default_rating)
        self.dataset = dataset
        self._dataset_dev = None  # device-resident copy, uploaded once
        self.prev_variables = None

    def restore_continuity(self, rating: float, prev_variables=None) -> None:
        """Resume support: carries the Elo history and the previous-model
        weights across a process restart. The reference threads the last
        rating back in by hand via ``--default_rating``
        (pipeline.py:713-718); here the trainer reads it from the last
        evaluation.csv row. After every ``evaluate`` both sides hold the
        same (promoted) rating, so one scalar restores the pair."""
        self.black_elo = EloRating(rating=rating)
        self.white_elo = EloRating(rating=rating)
        if prev_variables is not None:
            self.prev_variables = prev_variables

    def evaluate(self, variables, seed: int = 0) -> Dict:
        """Evaluates ``variables`` (the latest ckpt) vs the previous one.
        ``seed`` varies the stochastic batched games per checkpoint (pass
        the training step); the ``eval_games=1`` path ignores it."""
        if self.prev_variables is None:
            self.prev_variables = variables
        if self.eval_games > 1:
            stats = self._evaluate_batched(variables, seed)
        else:
            stats = eval_against_prev_ckpt(
                self.engine, self.move_fn, variables, self.prev_variables,
                self.black_elo, self.white_elo,
            )
        if self.dataset is not None and len(self.dataset) > 0:
            stats.update(self._pro_metrics(variables))
        # Promote: new model becomes the next baseline; assume equal strength
        # (pipeline.py:804-809).
        self.prev_variables = variables
        import copy

        self.white_elo = copy.deepcopy(self.black_elo)
        return stats

    def _pro_metrics(self, variables, batch_size: int = 1024) -> Dict:
        """Pro-game metrics with the dataset DEVICE-RESIDENT: the 620k-position
        go9 corpus is ~1 GB of tensors — re-uploading it every checkpoint cost
        minutes over the tunneled TPU, so it is put on device once and sliced
        there for each batch (~16 GB HBM holds it alongside self-play)."""
        if self._dataset_dev is None:
            ds = self.dataset
            self._dataset_dev = (
                jax.device_put(ds.states), jax.device_put(ds.target_pi),
                jax.device_put(ds.target_v))
        states, pi, v = self._dataset_dev
        m = states.shape[0]
        k_list = (1, 3, 5)
        total_correct = {k: 0 for k in k_list}
        total_entropy = 0.0
        total_mse = 0.0
        for start in range(0, m - batch_size + 1, batch_size):
            sl = slice(start, start + batch_size)
            correct, entropy, mse = self.metrics_fn(
                variables, states[sl], pi[sl], v[sl])
            for k in k_list:
                total_correct[k] += int(correct[k])
            total_entropy += float(entropy)
            total_mse += float(mse)
        tail = m % batch_size
        if tail:
            sl = slice(m - tail, m)
            correct, entropy, mse = self.metrics_fn(
                variables, states[sl], pi[sl], v[sl])
            for k in k_list:
                total_correct[k] += int(correct[k])
            total_entropy += float(entropy)
            total_mse += float(mse)
        stats = {
            "value_mse_error": total_mse / m,
            "policy_entropy": total_entropy / m,
        }
        for k in k_list:
            stats[f"policy_top_{k}_accuracy"] = total_correct[k] / m
        return stats

    def _play_lockstep(self, black_variables, white_variables, n: int,
                       seed: int) -> Tuple:
        """N lockstep stochastic games, black's net on even plies. Returns
        the terminal batch state + the move list of game 0 (for SGF)."""
        states = self.engine.init_batch(n)
        rng = jax.random.PRNGKey(seed)
        moves0 = []
        ply = 0
        while not bool(jnp.all(states.done)):
            variables = black_variables if ply % 2 == 0 else white_variables
            done0 = bool(np.asarray(states.done)[0])
            rng, sub = jax.random.split(rng)
            states, move = self.batch_move_fn(variables, states, sub)
            if not done0:
                m0 = int(np.asarray(move)[0])
                if m0 >= 0:
                    moves0.append(PlayerMove("B" if ply % 2 == 0 else "W", m0))
            ply += 1
            if ply > self.engine.max_steps + 2:
                break
        return states, moves0

    def _evaluate_batched(self, variables, seed: int) -> Dict:
        """N color-balanced stochastic games; Elo updated per game with the
        same winner-then-loser ordering as ``eval_against_prev_ckpt``.
        ``black_elo`` tracks the LATEST model (the csv column keeps its
        1-game-mode meaning of "the promoted side"), ``white_elo`` the
        previous one."""
        n_latest_black = (self.eval_games + 1) // 2
        n_latest_white = self.eval_games - n_latest_black
        batches = [(True, *self._play_lockstep(
            variables, self.prev_variables, n_latest_black, seed))]
        if n_latest_white:
            states_w, _ = self._play_lockstep(
                self.prev_variables, variables, n_latest_white, seed + 1)
            batches.append((False, states_w, None))

        latest_won = prev_won = draws = 0
        lengths = []
        moves0 = batches[0][2]
        for latest_is_black, states, _ in batches:
            winners = np.asarray(states.winner)
            lengths.extend(int(x) for x in np.asarray(states.step_count))
            for w in winners:
                if int(w) == 0:
                    draws += 1
                    continue
                if (int(w) == BLACK) == latest_is_black:
                    latest_won += 1
                    w_elo, l_elo = self.black_elo, self.white_elo
                else:
                    prev_won += 1
                    w_elo, l_elo = self.white_elo, self.black_elo
                w_elo.update_rating(l_elo.rating, 1)
                l_elo.update_rating(w_elo.rating, 0)

        result = f"latest {latest_won}-{prev_won}"
        if draws:
            result += f"-{draws}"
        states0 = batches[0][1]
        game0_result = result_string(
            int(np.asarray(states0.winner)[0]),
            float(np.asarray(states0.final_score)[0]),
            bool(np.asarray(states0.resigned)[0]),
        )
        stats = {
            "game_length": float(np.mean(lengths)),
            "game_result": result,
        }
        if self.engine.has_pass_move:
            stats["num_passes"] = sum(
                1 for m in moves0 if m.move == self.engine.pass_move)
        stats.update({
            "black_elo_rating": self.black_elo.rating,
            "white_elo_rating": self.white_elo.rating,
            "eval_games": self.eval_games,
            "latest_win_rate": latest_won / max(1, latest_won + prev_won),
            "_moves": moves0,
            "_sgf_result": game0_result,  # SGF needs game 0's B+/W+ string
        })
        return stats
