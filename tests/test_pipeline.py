"""End-to-end micro training run: the minimum slice of BASELINE config 1."""

import os

import numpy as np

from alpha_zero_tpu import config as config_lib
from alpha_zero_tpu.training import pipeline


def micro_config(tmp_path):
    return config_lib.AlphaZeroConfig(
        env=config_lib.EnvConfig(game="gomoku", board_size=5, num_stack=2, num_to_win=3),
        network=config_lib.NetworkConfig(num_res_blocks=1, num_filters=8, num_fc_units=8,
                                         gomoku=True),
        search=config_lib.SearchConfig(num_simulations=8, warm_up_steps=2),
        resign=config_lib.ResignConfig(init_resign_threshold=-1.0),
        train=config_lib.TrainConfig(
            min_games=6, games_per_ckpt=4, replay_capacity=4096, batch_size=16,
            max_training_steps=6, ckpt_interval=3, log_interval=3,
            init_lr=0.01, lr_milestones=(1000,),
        ),
        run=config_lib.RunConfig(
            ckpt_dir=str(tmp_path / "ckpt"), logs_dir=str(tmp_path / "logs"),
            save_sgf_dir=str(tmp_path / "sgf"), save_sgf_interval=3, seed=3,
        ),
        parallel=config_lib.ParallelConfig(selfplay_batch_size=4),
    )


def test_end_to_end_micro_training(tmp_path):
    cfg = micro_config(tmp_path)
    trainer = pipeline.train(cfg)

    # Training ran to the step budget.
    assert trainer.training_steps == 6
    # Games were collected and replayed.
    assert trainer.replay.num_games_added >= 10
    assert trainer.replay.size > 0

    # CSV metrics in the reference schemas.
    training_csv = os.path.join(cfg.run.logs_dir, "training.csv")
    actor_csv = os.path.join(cfg.run.logs_dir, "actor0.csv")
    assert os.path.exists(training_csv) and os.path.exists(actor_csv)
    header = open(training_csv).readline().strip().split(",")
    assert header == ["datetime", "training_steps", "policy_loss", "value_loss",
                      "learning_rate", "total_games", "total_samples"]
    actor_header = open(actor_csv).readline().strip().split(",")
    assert actor_header[:3] == ["datetime", "game_length", "game_result"]

    # Checkpoints exist and are restorable.
    assert trainer.latest_ckpt_path is not None
    from alpha_zero_tpu.training import checkpoint as ckpt_lib

    latest = ckpt_lib.latest_checkpoint(cfg.run.ckpt_dir)
    assert latest is not None and ckpt_lib.checkpoint_step(latest) == 6
    restored = ckpt_lib.restore_checkpoint(latest, trainer.train_state)
    np.testing.assert_allclose(
        np.asarray(restored.training_steps), np.asarray(trainer.train_state.training_steps)
    )

    # SGF dumps were produced and parse back.
    sgf_files = os.listdir(cfg.run.save_sgf_dir)
    assert sgf_files
    from alpha_zero_tpu.utils import sgf as sgf_lib

    game = sgf_lib.parse_sgf(open(os.path.join(cfg.run.save_sgf_dir, sgf_files[0])).read())
    assert game.board_size == 5
    assert len(game.moves) > 0


def test_resume_from_checkpoint(tmp_path):
    cfg = micro_config(tmp_path)
    trainer = pipeline.train(cfg)
    ckpt = trainer.latest_ckpt_path

    import dataclasses

    cfg2 = dataclasses.replace(
        cfg,
        run=dataclasses.replace(cfg.run, load_ckpt=ckpt),
        train=dataclasses.replace(cfg.train, max_training_steps=9),
    )
    trainer2 = pipeline.Trainer(cfg2)
    assert trainer2.training_steps == 6
    trainer2.run()
    assert trainer2.training_steps == 9


def test_resign_threshold_continuity_across_resume(tmp_path):
    """A resumed run past no_resign_games must come back with the threshold
    ACTIVE (seeded from the last active actor-CSV value), not silently play
    the rest of the run with resignation off — the crossing that enables it
    (games_added == no_resign_games) never re-fires after resume."""
    import dataclasses

    cfg = micro_config(tmp_path)
    cfg = dataclasses.replace(
        cfg,
        env=config_lib.EnvConfig(game="go", board_size=5, num_stack=2),
        resign=config_lib.ResignConfig(
            init_resign_threshold=-0.88, no_resign_games=2,
            check_resign_after_steps=4,
        ),
        train=dataclasses.replace(cfg.train, min_games=4, games_per_ckpt=3,
                                  save_replay_interval=2),
    )
    trainer = pipeline.train(cfg)
    assert trainer.resign_controller.threshold > -1.0  # crossing fired live

    # Simulate the post-crash restart: fresh Trainer, checkpoint + replay
    # loaded, games_added already past no_resign_games.
    cfg2 = dataclasses.replace(
        cfg,
        run=dataclasses.replace(
            cfg.run, load_ckpt=trainer.latest_ckpt_path,
            load_replay=trainer._replay_path,
        ),
        train=dataclasses.replace(cfg.train, max_training_steps=9),
    )
    trainer2 = pipeline.Trainer(cfg2)
    assert trainer2.replay.num_games_added >= cfg.resign.no_resign_games
    assert trainer2.resign_controller.threshold > -1.0, (
        "resumed controller left resignation disabled"
    )
    # Exact continuity: the seeded value is the last active recorded one.
    assert trainer2.resign_controller.threshold == trainer.resign_controller.threshold


def test_elo_continuity_across_resume(tmp_path):
    """A killed-and-resumed run continues ONE Elo history: the restarted
    evaluator seeds its rating pair from the last evaluation.csv row and its
    prev-model from the resumed weights, instead of resetting both to
    defaults (reference threads the rating by hand via --default_rating,
    pipeline.py:713-718)."""
    import csv
    import dataclasses

    cfg = micro_config(tmp_path)
    trainer = pipeline.Trainer(cfg)
    trainer.enable_evaluator()
    trainer.run()
    eval_csv = os.path.join(cfg.run.logs_dir, "evaluation.csv")
    with open(eval_csv) as f:
        rows = list(csv.DictReader(f))
    assert rows, "first segment wrote evaluation rows"
    last_rating = float(rows[-1]["black_elo_rating"])

    cfg2 = dataclasses.replace(
        cfg,
        run=dataclasses.replace(cfg.run, load_ckpt=trainer.latest_ckpt_path),
        train=dataclasses.replace(cfg.train, max_training_steps=9),
    )
    trainer2 = pipeline.Trainer(cfg2)
    trainer2.enable_evaluator()
    # The resumed evaluator starts from the recorded rating, not the default.
    assert trainer2.evaluator.black_elo.rating == last_rating
    assert trainer2.evaluator.white_elo.rating == last_rating
    # And compares the next checkpoint against the RESUMED weights (not None,
    # which would make the first post-resume eval latest-vs-itself).
    assert trainer2.evaluator.prev_variables is not None

    trainer2.run()
    with open(eval_csv) as f:
        rows2 = list(csv.DictReader(f))
    assert len(rows2) > len(rows)
    seg2 = rows2[len(rows):]
    # Every post-resume rating is one Elo update away from a real history
    # seeded at last_rating: with K<=32 a single game moves a rating by at
    # most 32, so the first resumed row must be within 32 of the seed —
    # a default-rating reset (back to 0 from a nonzero curve) would violate
    # this whenever |last_rating| > 32; structurally we assert continuity by
    # checking the first resumed row's pair derives from last_rating.
    first = seg2[0]
    b, w = float(first["black_elo_rating"]), float(first["white_elo_rating"])
    assert abs(b - last_rating) <= 32.0 and abs(w - last_rating) <= 32.0


def test_async_evaluator_pipeline(tmp_path):
    """eval_async=True: evaluations run on the worker thread; every
    checkpoint still gets its evaluation.csv row, in step order."""
    import dataclasses
    import csv

    cfg = micro_config(tmp_path)
    cfg = dataclasses.replace(
        cfg, run=dataclasses.replace(cfg.run, eval_async=True, eval_games=2))
    trainer = pipeline.Trainer(cfg)
    trainer.enable_evaluator()
    trainer.run()
    trainer.evaluator  # built
    path = os.path.join(cfg.run.logs_dir, "evaluation.csv")
    with open(path) as f:
        rows = list(csv.DictReader(f))
    # max_training_steps=6 / ckpt_interval=3 -> 2 checkpoints, 2 rows.
    assert [int(r["training_steps"]) for r in rows] == [3, 6]
    assert all("black_elo_rating" in r for r in rows)
