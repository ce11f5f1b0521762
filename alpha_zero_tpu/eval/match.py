"""Batched head-to-head match tournament on device.

Replaces the reference's mp.Pool-of-processes mass matches
(`eval_play/eval_agent_go_mass_matches.py:106-233`) with ONE jitted program
playing G games in lockstep. Both sides sample from the visit-count policy
without root noise (the reference match players use deterministic=False,
root_noise=False, eval_agent_go_mass_matches.py:94-103).

All lockstep games share move parity (every move — including pass — flips the
player to move, and finished games idle), so each ply evaluates a single
network for the whole batch: black's on even plies, white's on odd.
"""

from __future__ import annotations

import functools
from collections import namedtuple
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from alpha_zero_tpu.search import mcts
from alpha_zero_tpu.utils.results import result_string

PlayerMove = namedtuple("PlayerMove", ["color", "move"])


def make_match_move_fn(engine, net, search_cfg):
    """Jitted batched ply: search (no noise) + stochastic sampling + step.
    Finished games step as no-ops."""

    def eval_fn_factory(variables):
        def eval_fn(obs):
            out = net.apply(variables, obs, train=False)
            return jax.nn.softmax(out.pi_logits, axis=-1), out.value

        return eval_fn

    def move_fn(variables, states, rng):
        result = mcts.batched_search(
            eval_fn_factory(variables), engine, states, rng,
            num_simulations=search_cfg.num_simulations,
            c_puct_base=search_cfg.c_puct_base,
            c_puct_init=search_cfg.c_puct_init,
            root_noise=False,
        )
        warm = jnp.zeros(states.done.shape, bool)  # no warm-up in matches
        pi = mcts.policy_from_counts(result.child_N, result.legal, warm)
        rng_move = jax.random.split(rng, 2)[1]
        move = mcts.sample_move(
            rng_move, pi, result.legal, result.child_N, warm,
            pass_move=engine.pass_move if engine.has_pass_move else None,
            deterministic=False,
        )
        new_states = engine.step_batch(states, move)
        return new_states, move

    return jax.jit(move_fn)


def make_match_move_fn_reuse(engine, net, search_cfg):
    """Jitted batched ply with SUBTREE REUSE: the mover's carried trees seed
    the search (mcts_v2.py:643-653), and after the step the played move
    re-roots BOTH the returned mover trees and the opponent's trees (the
    reference's match loop re-roots each player's tree through every ply,
    theirs and the opponent's)."""

    def eval_fn_factory(variables):
        def eval_fn(obs):
            out = net.apply(variables, obs, train=False)
            return jax.nn.softmax(out.pi_logits, axis=-1), out.value

        return eval_fn

    def move_fn(variables, states, my_trees, opp_trees, rng):
        result, trees = mcts.batched_search(
            eval_fn_factory(variables), engine, states, rng,
            num_simulations=search_cfg.num_simulations,
            c_puct_base=search_cfg.c_puct_base,
            c_puct_init=search_cfg.c_puct_init,
            root_noise=False,
            prev_trees=my_trees,
            max_new_sims=search_cfg.max_new_sims,
            return_trees=True,
        )
        warm = jnp.zeros(states.done.shape, bool)  # no warm-up in matches
        pi = mcts.policy_from_counts(result.child_N, result.legal, warm)
        rng_move = jax.random.split(rng, 2)[1]
        move = mcts.sample_move(
            rng_move, pi, result.legal, result.child_N, warm,
            pass_move=engine.pass_move if engine.has_pass_move else None,
            deterministic=False,
        )
        was_done = states.done
        new_states = engine.step_batch(states, move)
        move_eff = jnp.where(was_done, -1, move)
        my_new = mcts.reroot_trees(trees, move_eff, new_states.done, new_states,
                                   engine.num_actions)
        opp_new = mcts.reroot_trees(opp_trees, move_eff, new_states.done,
                                    new_states, engine.num_actions)
        return new_states, move, my_new, opp_new

    return jax.jit(move_fn)


def play_matches_asym(engine, net, black_cfg, white_cfg, black_variables,
                      white_variables, num_games: int, seed: int = 0,
                      record_moves: bool = False) -> List[Dict]:
    """Head-to-head with PER-SIDE search configs — the measurement harness
    for the subtree-reuse strength question (e.g. black reuse@max_new_sims
    vs white fresh-tree full budget). Both sides carry their own tree per
    game; every ply re-roots both. Sides with ``reuse_subtree=False`` search
    a fresh tree each move but still pay no tree carry."""
    fns = {}
    trees = {}
    for color, cfg in (("B", black_cfg), ("W", white_cfg)):
        if cfg.reuse_subtree:
            fns[color] = make_match_move_fn_reuse(engine, net, cfg)
        else:
            fns[color] = make_match_move_fn(engine, net, cfg)
    states = engine.init_batch(num_games)
    for color, cfg in (("B", black_cfg), ("W", white_cfg)):
        if cfg.reuse_subtree or black_cfg.reuse_subtree or white_cfg.reuse_subtree:
            trees[color] = jax.jit(
                lambda s, n=cfg.num_simulations: mcts.make_empty_trees(engine, s, n)
            )(states)
    rng = jax.random.PRNGKey(seed)
    all_moves: List[List[PlayerMove]] = [[] for _ in range(num_games)]
    reroot_j = jax.jit(
        functools.partial(mcts.reroot_trees, num_actions=engine.num_actions)
    )

    ply = 0
    while not bool(jnp.all(states.done)):
        color, other = ("B", "W") if ply % 2 == 0 else ("W", "B")
        cfg = black_cfg if color == "B" else white_cfg
        variables = black_variables if color == "B" else white_variables
        was_done = np.asarray(states.done)
        rng, sub = jax.random.split(rng)
        if cfg.reuse_subtree:
            states, move, trees[color], trees[other] = fns[color](
                variables, states, trees[color], trees[other], sub
            )
        else:
            states, move = fns[color](variables, states, sub)
            if other in trees:
                # Re-root the reusing side's trees through this ply too.
                move_eff = jnp.where(jnp.asarray(was_done), -1, move)
                trees[other] = reroot_j(trees[other], move_eff, states.done,
                                        states)
        if record_moves:
            mv = np.asarray(move)
            for i in range(num_games):
                if not was_done[i] and mv[i] >= 0:
                    all_moves[i].append(PlayerMove(color, int(mv[i])))
        ply += 1
        if ply > engine.max_steps + 2:
            break

    return _collect_stats(states, num_games, all_moves if record_moves else None)


def _collect_stats(states, num_games, all_moves) -> List[Dict]:
    winners = np.asarray(states.winner)
    resigned = np.asarray(states.resigned)
    scores = np.asarray(states.final_score)
    lengths = np.asarray(states.step_count)
    out = []
    for i in range(num_games):
        result = result_string(int(winners[i]), float(scores[i]), bool(resigned[i]))
        stats = {
            "game": i,
            "game_result": result,
            "game_length": int(lengths[i]),
            "winner": int(winners[i]),
        }
        if all_moves is not None:
            stats["moves"] = all_moves[i]
        out.append(stats)
    return out


def play_matches(engine, net, search_cfg, black_variables, white_variables,
                 num_games: int, seed: int = 0,
                 record_moves: bool = False) -> List[Dict]:
    """Plays ``num_games`` lockstep games; returns per-game stats dicts
    (schema of eval_agent_go_mass_matches.py:141-148)."""
    move_fn = make_match_move_fn(engine, net, search_cfg)
    states = engine.init_batch(num_games)
    rng = jax.random.PRNGKey(seed)
    all_moves: List[List[PlayerMove]] = [[] for _ in range(num_games)]

    ply = 0
    while not bool(jnp.all(states.done)):
        variables = black_variables if ply % 2 == 0 else white_variables
        was_done = np.asarray(states.done)
        rng, sub = jax.random.split(rng)
        states, move = move_fn(variables, states, sub)
        if record_moves:
            mv = np.asarray(move)
            color = "B" if ply % 2 == 0 else "W"
            for i in range(num_games):
                if not was_done[i] and mv[i] >= 0:
                    all_moves[i].append(PlayerMove(color, int(mv[i])))
        ply += 1
        if ply > engine.max_steps + 2:
            break

    winners = np.asarray(states.winner)
    resigned = np.asarray(states.resigned)
    scores = np.asarray(states.final_score)
    lengths = np.asarray(states.step_count)
    out = []
    for i in range(num_games):
        result = result_string(int(winners[i]), float(scores[i]), bool(resigned[i]))
        stats = {
            "game": i,
            "game_result": result,
            "game_length": int(lengths[i]),
            "winner": int(winners[i]),
        }
        if record_moves:
            stats["moves"] = all_moves[i]
        out.append(stats)
    return out
