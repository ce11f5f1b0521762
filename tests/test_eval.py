"""Evaluator / Elo / dataset-builder tests."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from alpha_zero_tpu import config as config_lib
from alpha_zero_tpu.envs.gomoku import GomokuEngine
from alpha_zero_tpu.eval import dataset as dataset_lib
from alpha_zero_tpu.eval import evaluator as evaluator_lib
from alpha_zero_tpu.eval.elo import EloRating, get_k_factor
from alpha_zero_tpu.models.resnet import AlphaZeroNet
from alpha_zero_tpu.utils import sgf as sgf_lib


# ---------------------------------------------------------------------------
# Elo
# ---------------------------------------------------------------------------


def test_k_factor_bands():
    assert get_k_factor((0, 0)) == 32
    assert get_k_factor((2000, 2050)) == 32
    assert get_k_factor((2150, 2200)) == 24
    assert get_k_factor((2500, 2600)) == 16
    assert get_k_factor((2000, 2200)) == 24


def test_elo_update_symmetry():
    p1, p2 = EloRating(), EloRating()
    p1.update_rating(p2.rating, 1)
    p2.update_rating(p1.rating, 0)
    assert p1.rating > 0 > p2.rating


# ---------------------------------------------------------------------------
# Evaluator match + metrics
# ---------------------------------------------------------------------------


def _net_and_vars(engine, seed=0):
    net = AlphaZeroNet(num_actions=engine.num_actions, num_res_blocks=1,
                       num_filters=8, num_fc_units=8)
    dummy = jnp.zeros(
        (1, engine.board_size, engine.board_size, 2 * engine.num_stack + 1), jnp.int8
    )
    variables = net.init(jax.random.PRNGKey(seed), dummy, train=False)
    return net, {"params": variables["params"], "batch_stats": variables["batch_stats"]}


def test_eval_match_and_elo():
    engine = GomokuEngine(board_size=5, num_stack=2, num_to_win=3)
    net, black_vars = _net_and_vars(engine, seed=0)
    _, white_vars = _net_and_vars(engine, seed=1)
    search_cfg = config_lib.SearchConfig(num_simulations=8)
    move_fn = evaluator_lib.make_eval_move_fn(engine, net, search_cfg)
    black_elo, white_elo = EloRating(), EloRating()
    stats = evaluator_lib.eval_against_prev_ckpt(
        engine, move_fn, black_vars, white_vars, black_elo, white_elo
    )
    assert stats["game_length"] > 0
    assert stats["game_result"] in ("B+1.0", "W+1.0", "DRAW")
    if stats["game_result"] != "DRAW":
        assert stats["black_elo_rating"] != stats["white_elo_rating"]
    assert len(stats["_moves"]) == stats["game_length"]


def test_batched_evaluator():
    """eval_games=N mode: N color-balanced stochastic games, Elo per game,
    promotion semantics preserved."""
    engine = GomokuEngine(board_size=5, num_stack=2, num_to_win=3)
    net, vars_a = _net_and_vars(engine, seed=0)
    _, vars_b = _net_and_vars(engine, seed=1)
    search_cfg = config_lib.SearchConfig(num_simulations=8)
    ev = evaluator_lib.Evaluator(engine, net, search_cfg, eval_games=4)
    stats = ev.evaluate(vars_a, seed=3)  # first call: prev == latest
    assert stats["eval_games"] == 4
    won, lost = map(int, stats["game_result"].split()[1].split("-")[:2])
    assert won + lost <= 4
    assert 0.0 <= stats["latest_win_rate"] <= 1.0
    assert stats["game_length"] > 0
    assert len(stats["_moves"]) > 0
    assert stats["_sgf_result"] in ("B+1.0", "W+1.0", "DRAW")
    # Second checkpoint vs the promoted prev; Elo continues from last state.
    rating_before = ev.black_elo.rating
    stats2 = ev.evaluate(vars_b, seed=7)
    w2, l2 = map(int, stats2["game_result"].split()[1].split("-")[:2])
    if w2 != l2:
        assert stats2["black_elo_rating"] != rating_before
    # Promotion: both sides share the promoted rating for the next round.
    assert ev.white_elo.rating == ev.black_elo.rating


def test_pro_metrics():
    engine = GomokuEngine(board_size=5, num_stack=2)
    net, variables = _net_and_vars(engine)
    metrics_fn = evaluator_lib.make_pro_metrics_fn(net)
    m = 40
    rng = np.random.RandomState(0)
    states = rng.randint(0, 2, (m, 5, 5, 5)).astype(np.int8)
    target_idx = rng.randint(0, 25, m)
    target_pi = np.eye(25, dtype=np.float32)[target_idx]
    target_v = rng.choice([-1.0, 1.0], m).astype(np.float32)
    ds = dataset_lib.EvalDataset(states=states, target_pi=target_pi, target_v=target_v)
    stats = evaluator_lib.eval_on_pro_games(metrics_fn, variables, ds, batch_size=16)
    assert 0 <= stats["policy_top_1_accuracy"] <= stats["policy_top_3_accuracy"] \
        <= stats["policy_top_5_accuracy"] <= 1
    assert stats["policy_entropy"] > 0
    assert stats["value_mse_error"] > 0


# ---------------------------------------------------------------------------
# SGF parsing + dataset builder
# ---------------------------------------------------------------------------

SAMPLE_SGF = """(;CA[UTF-8]AP[test]RU[Chinese]
PB[Alice (2500)]BR[2500]PW[Bob (2400)]WR[2400]
KM[0.5]RE[B+Resign]DT[2024-01-01]SZ[5]
;B[cc];W[bb];B[dd];W[cb])"""


def test_parse_sgf_basic():
    game = sgf_lib.parse_sgf(SAMPLE_SGF)
    assert game.board_size == 5
    assert game.result == "B+Resign"
    assert game.komi == 0.5
    assert game.moves == [("B", "cc"), ("W", "bb"), ("B", "dd"), ("W", "cb")]
    assert sgf_lib.parse_game_result(game.result) == 1


def test_make_parse_roundtrip():
    from collections import namedtuple

    PM = namedtuple("PlayerMove", ["color", "move"])
    moves = [PM("B", 12), PM("W", 7), PM("B", 13)]
    content = sgf_lib.make_sgf(5, moves, "B+2.5", komi=7.5, date="2024")
    game = sgf_lib.parse_sgf(content)
    assert game.board_size == 5
    assert game.result == "B+2.5"
    cc = sgf_lib.CoordsConvertor(5)
    parsed = [(c, cc.to_flat(cc.from_sgf(m))) for c, m in game.moves]
    assert parsed == [("B", 12), ("W", 7), ("B", 13)]


def test_dataset_builder_on_generated_game(tmp_path):
    # Build a tiny legitimate 5x5 Go game SGF and replay it.
    sgf_content = """(;CA[UTF-8]RU[Chinese]PB[StrongA (2500)]PW[StrongB (2600)]
KM[0.5]RE[W+0.5]SZ[5]
;B[cc];W[bc];B[dd];W[];B[])"""
    p = tmp_path / "game1.sgf"
    p.write_text(sgf_content)
    ds = dataset_lib.build_eval_dataset(str(tmp_path), board_size=5, num_stack=2)
    assert ds.num_games == 1
    # The empty-board position is skipped (env.steps > skip_n with skip_n=0,
    # reference eval_dataset.py:195) -> 4 of the 5 moves recorded.
    assert len(ds) == 4
    assert ds.states.shape == (4, 5, 5, 5)
    assert ds.target_pi.shape == (4, 26)
    # First recorded target: white's reply at sgf 'bc' -> (row 2, col 1) = 11.
    assert ds.target_pi[0].argmax() == 11
    # Winner is white: white moves get +1.
    assert ds.target_v[0] == 1.0


def test_dataset_cache_roundtrip(tmp_path):
    sgf_content = """(;CA[UTF-8]RU[Chinese]PB[StrongA (2500)]PW[StrongB (2600)]
KM[0.5]RE[W+0.5]SZ[5]
;B[cc];W[bc];B[dd];W[];B[])"""
    (tmp_path / "game1.sgf").write_text(sgf_content)
    cache = str(tmp_path / "cache.npz")
    ds = dataset_lib.build_eval_dataset(
        str(tmp_path), board_size=5, num_stack=2, cache_path=cache
    )
    assert os.path.exists(cache)
    # Unchanged corpus: loads from cache (identical tensors, no reparse).
    ds2 = dataset_lib.build_eval_dataset(
        str(tmp_path), board_size=5, num_stack=2, cache_path=cache
    )
    assert ds2.num_games == ds.num_games and len(ds2) == len(ds)
    np.testing.assert_array_equal(ds2.states, ds.states)
    np.testing.assert_array_equal(ds2.target_pi, ds.target_pi)
    np.testing.assert_array_equal(ds2.target_v, ds.target_v)
    assert ds2.mismatch_stats == ds.mismatch_stats
    # Changed corpus (file added) or different num_stack: stale cache is
    # detected via the stored fingerprint and the dataset rebuilds.
    (tmp_path / "game2.sgf").write_text(
        sgf_content.replace("StrongA", "OtherA").replace("StrongB", "OtherB"))
    ds3 = dataset_lib.build_eval_dataset(
        str(tmp_path), board_size=5, num_stack=2, cache_path=cache
    )
    assert ds3.num_games == 2 and len(ds3) == 2 * len(ds)
    ds4 = dataset_lib.build_eval_dataset(
        str(tmp_path), board_size=5, num_stack=3, cache_path=cache
    )
    assert ds4.states.shape[-1] == 2 * 3 + 1


def test_dataset_builder_filters(tmp_path):
    # Wrong board size -> skipped.
    (tmp_path / "wrong_size.sgf").write_text("(;SZ[9]RE[B+1.5];B[aa])")
    # Timeout result -> skipped.
    (tmp_path / "timeout.sgf").write_text("(;SZ[5]RE[B+T];B[aa])")
    # Weak players -> skipped.
    (tmp_path / "weak.sgf").write_text(
        "(;SZ[5]RE[B+1.5]PB[Weak (1500)]PW[AlsoWeak (1400)];B[aa])"
    )
    ds = dataset_lib.build_eval_dataset(str(tmp_path), board_size=5, num_stack=2)
    assert ds.num_games == 0 and len(ds) == 0
