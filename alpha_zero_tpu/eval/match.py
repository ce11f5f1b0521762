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

from collections import namedtuple
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from alpha_zero_tpu.search import mcts

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
        if resigned[i]:
            result = "B+R" if winners[i] == 1 else "W+R"
        elif scores[i] > 0:
            result = "B+%.1f" % scores[i]
        elif scores[i] < 0:
            result = "W+%.1f" % abs(scores[i])
        else:
            result = "DRAW"
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
