"""ResignController unit tests driven by scripted stats sequences
(reference semantics: pipeline.py:519-553, 656-670)."""

import logging

from alpha_zero_tpu.config import ResignConfig
from alpha_zero_tpu.training.pipeline import ResignController, maybe_adjust_resign_threshold

LOGGER = logging.getLogger("test")


def make_controller(**overrides):
    cfg = ResignConfig(
        init_resign_threshold=-0.88,
        check_resign_after_steps=1,
        target_fp_rate=0.05,
        disable_resign_ratio=0.1,
        reset_fp_interval=40,
        no_resign_games=10,
        **overrides,
    )
    # games_per_ckpt=320 -> adjust_every = int(320 * 0.5 * 0.1 * 0.5) = 8
    return ResignController(cfg, games_per_ckpt=320, logger=LOGGER), cfg


def marked_stats(could_won: bool) -> dict:
    return {
        "is_resign_disabled": True,
        "is_marked_for_resign": True,
        "is_could_won": could_won,
    }


def test_disabled_until_no_resign_games_then_reset_enables():
    ctl, cfg = make_controller()
    assert ctl.threshold == -1.0  # no_resign_games > 0 starts disabled
    for n in range(1, 10):
        ctl.on_game(marked_stats(True), n)
        assert ctl.threshold == -1.0
        assert ctl.resign_count == 0  # games below the floor never counted
    # Game no_resign_games triggers the hard reset that turns resignation on.
    ctl.on_game(marked_stats(True), 10)
    assert ctl.threshold == cfg.init_resign_threshold
    assert ctl.resign_count == 0


def test_threshold_tightens_on_high_fp_rate():
    ctl, cfg = make_controller()
    ctl.on_game(marked_stats(True), 10)  # reset/enable
    # 8 marked games (= adjust_every), half "could have won": fp_rate 0.5.
    n = 10
    for i in range(8):
        n += 1
        ctl.on_game(marked_stats(could_won=(i % 2 == 0)), n)
    # maybe_adjust(-0.88, 0.5, 0.05): new=-0.88*1.45=-1.276,
    # smoothed=0.5*(-1.276)+0.5*(-0.88)=-1.078 -> clamped to -0.9999.
    assert ctl.threshold == -0.9999
    assert ctl.last_resign_count == 8


def test_no_adjustment_when_fp_rate_below_target():
    ctl, _ = make_controller()
    ctl.on_game(marked_stats(True), 10)
    n = 10
    for _ in range(8):
        n += 1
        ctl.on_game(marked_stats(could_won=False), n)  # fp_rate 0
    assert ctl.threshold == -0.88


def test_unmarked_games_do_not_count():
    ctl, _ = make_controller()
    ctl.on_game(marked_stats(True), 10)
    n = 10
    for _ in range(20):
        n += 1
        ctl.on_game({"is_resign_disabled": False, "is_marked_for_resign": False,
                     "is_could_won": False}, n)
    assert ctl.resign_count == 0
    assert ctl.threshold == -0.88


def test_periodic_hard_reset():
    ctl, cfg = make_controller()
    ctl.on_game(marked_stats(True), 10)
    n = 10
    for i in range(8):
        n += 1
        ctl.on_game(marked_stats(True), n)
    assert ctl.threshold == -0.9999  # fp_rate 1.0 tightened
    # Hard reset at num_games_added % reset_fp_interval == 0 (game 40):
    # threshold and counters return to init regardless of recent stats.
    while n < 40:
        n += 1
        ctl.on_game(marked_stats(True), n)
    assert ctl.threshold == cfg.init_resign_threshold
    assert ctl.resign_count == 0 and ctl.could_won_count == 0


def test_maybe_adjust_matches_reference_formula():
    # Reference maybe_adjust_resign_threshold (pipeline.py:656-670).
    assert maybe_adjust_resign_threshold(-0.88, 0.05, 0.05) == -0.88
    assert maybe_adjust_resign_threshold(-0.88, 0.04, 0.05) == -0.88
    assert maybe_adjust_resign_threshold(-0.88, 0.1, 0.05) == round(
        0.5 * (-0.88 * 1.05) + 0.5 * -0.88, 4
    )
    assert maybe_adjust_resign_threshold(-0.88, 1.0, 0.05) == -0.9999  # clamp


def test_permanently_disabled():
    cfg = ResignConfig(init_resign_threshold=-1.0, no_resign_games=0)
    ctl = ResignController(cfg, games_per_ckpt=320, logger=LOGGER)
    assert ctl.threshold == -1.0
    for n in range(1, 30):
        ctl.on_game(marked_stats(True), n)
    assert ctl.threshold == -1.0
