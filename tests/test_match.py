"""Batched match tournament: the lockstep parity assumption under test.

``play_matches`` evaluates black's net on even plies and white's on odd,
relying on every move (including pass) flipping the player and finished
games idling. These tests replay the recorded games move-by-move through the
sequential host env: strict B/W alternation, legality of every move, result
strings matching a fresh sequential scoring, and no post-finish moves —
covering games that end at different plies (match analogue of the
reference's eval_agent_go_mass_matches.py:106-233).
"""

import jax
import numpy as np
import pytest

from alpha_zero_tpu.config import EnvConfig, NetworkConfig, SearchConfig
from alpha_zero_tpu.envs.host import GoEnv
from alpha_zero_tpu.eval.match import play_matches, play_matches_asym
from alpha_zero_tpu.models.resnet import build_network
from alpha_zero_tpu.training.pipeline import build_engine


@pytest.fixture(scope="module")
def match_results():
    env_cfg = EnvConfig(game="go", board_size=5, num_stack=2, max_steps=30)
    net_cfg = NetworkConfig(num_res_blocks=1, num_filters=8, num_fc_units=8)
    search_cfg = SearchConfig(num_simulations=8, warm_up_steps=0)
    engine = build_engine(env_cfg)
    net = build_network(env_cfg, net_cfg)
    obs = np.zeros((1, 5, 5, env_cfg.num_planes), np.int8)
    vb = net.init(jax.random.PRNGKey(3), obs, train=False)
    vw = net.init(jax.random.PRNGKey(4), obs, train=False)
    results = play_matches(engine, net, search_cfg, vb, vw,
                           num_games=8, seed=11, record_moves=True)
    return env_cfg, results


def test_games_complete_with_results(match_results):
    _, results = match_results
    assert len(results) == 8
    for stats in results:
        assert stats["game_result"] != ""
        assert stats["winner"] in (-1, 0, 1)
        # Games end at different plies (exercises idling finished slots).
    lengths = {s["game_length"] for s in results}
    assert len(lengths) > 1, "want staggered game ends to exercise parity"


def test_moves_alternate_and_replay_legally(match_results):
    env_cfg, results = match_results
    for stats in results:
        moves = stats["moves"]
        assert stats["game_length"] == len(moves)
        env = GoEnv(board_size=env_cfg.board_size, num_stack=env_cfg.num_stack,
                    max_steps=env_cfg.max_steps)
        for ply, pm in enumerate(moves):
            # Parity: black on even plies, white on odd — for EVERY game
            # regardless of when its neighbors finished.
            assert pm.color == ("B" if ply % 2 == 0 else "W")
            assert env.to_play == (env.black_player if pm.color == "B"
                                   else env.white_player)
            assert env.is_legal_move(pm.move), f"illegal move at ply {ply}"
            env.step(pm.move)
        # Sequential re-score agrees with the lockstep result.
        assert env.get_result_string() == stats["game_result"]


def test_asym_no_reuse_matches_symmetric(match_results):
    """Asymmetric harness with both sides at the shared config must reproduce
    play_matches exactly (same programs, same rng stream)."""
    env_cfg, results = match_results
    net_cfg = NetworkConfig(num_res_blocks=1, num_filters=8, num_fc_units=8)
    search_cfg = SearchConfig(num_simulations=8, warm_up_steps=0)
    engine = build_engine(env_cfg)
    net = build_network(env_cfg, net_cfg)
    obs = np.zeros((1, 5, 5, env_cfg.num_planes), np.int8)
    vb = net.init(jax.random.PRNGKey(3), obs, train=False)
    vw = net.init(jax.random.PRNGKey(4), obs, train=False)
    asym = play_matches_asym(engine, net, search_cfg, search_cfg, vb, vw,
                             num_games=8, seed=11, record_moves=True)
    for a, b in zip(asym, results):
        assert a == b


def test_asym_reuse_vs_fresh_replays_legally():
    """Black reuse@capped-sims vs white fresh-tree full budget: games finish,
    alternate correctly, and replay legally — the harness for the
    max_new_sims strength measurement (PERF.md)."""
    env_cfg = EnvConfig(game="go", board_size=5, num_stack=2, max_steps=30)
    net_cfg = NetworkConfig(num_res_blocks=1, num_filters=8, num_fc_units=8)
    reuse_cfg = SearchConfig(num_simulations=8, warm_up_steps=0,
                             reuse_subtree=True, max_new_sims=5)
    fresh_cfg = SearchConfig(num_simulations=8, warm_up_steps=0)
    engine = build_engine(env_cfg)
    net = build_network(env_cfg, net_cfg)
    obs = np.zeros((1, 5, 5, env_cfg.num_planes), np.int8)
    vb = net.init(jax.random.PRNGKey(3), obs, train=False)
    vw = net.init(jax.random.PRNGKey(4), obs, train=False)
    out = play_matches_asym(engine, net, reuse_cfg, fresh_cfg, vb, vw,
                            num_games=6, seed=5, record_moves=True)
    assert len(out) == 6
    for stats in out:
        assert stats["winner"] in (-1, 0, 1)
        env = GoEnv(board_size=5, num_stack=2, max_steps=30)
        for ply, pm in enumerate(stats["moves"]):
            assert pm.color == ("B" if ply % 2 == 0 else "W")
            assert env.is_legal_move(pm.move)
            env.step(pm.move)
        assert env.get_result_string() == stats["game_result"]
