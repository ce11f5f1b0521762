"""``python -m alpha_zero_tpu.cli.train`` — the single config-driven trainer.

Replaces the reference's three absl-flag drivers (training_go.py,
training_go_jumbo.py, training_gomoku.py): pick a named config
(go9 / go19_jumbo / gomoku13 / gomoku9) and override any field with
``--set a.b.c=value``.
"""

from __future__ import annotations

import argparse
import dataclasses
import json

from alpha_zero_tpu.cli.common import (add_config_args, enable_compile_cache,
                                        resolve_config)
from alpha_zero_tpu.training import pipeline
from alpha_zero_tpu.utils.logging import create_logger


def main(argv=None) -> None:
    enable_compile_cache()
    parser = argparse.ArgumentParser(description=__doc__)
    add_config_args(parser)
    # The evaluator runs by default, like the reference's always-spawned
    # evaluator process (training_go.py:292-314): one deterministic
    # latest-vs-prev game + Elo per checkpoint (+ pro-game metrics when
    # run.eval_games_dir is set).
    parser.add_argument("--eval", action="store_true", dest="eval_",
                        help=argparse.SUPPRESS)  # legacy no-op (now default)
    parser.add_argument("--no-eval", action="store_true",
                        help="skip the per-checkpoint evaluator")
    args = parser.parse_args(argv)

    cfg = resolve_config(args.config, args.set)
    # Multi-host: jax.distributed must come up before anything touches the
    # backend (Trainer queries devices in __init__).
    if cfg.parallel.coordinator_address:
        from alpha_zero_tpu.parallel import multihost

        multihost.initialize(
            coordinator_address=cfg.parallel.coordinator_address,
            num_processes=cfg.parallel.num_processes or None,
            process_id=None if cfg.parallel.process_id < 0 else cfg.parallel.process_id,
        )
    logger = create_logger(cfg.run.log_level)
    logger.info("config: %s", json.dumps(dataclasses.asdict(cfg), default=str, indent=1))

    trainer = pipeline.Trainer(cfg)
    if not args.no_eval:
        trainer.enable_evaluator()
    trainer.run()


if __name__ == "__main__":
    main()
