"""Offline re-evaluation of every saved checkpoint of a run.

Reproduces the evaluator's per-checkpoint row (N latest-vs-prev games with
per-game Elo + pro-game metrics) from the saved checkpoints alone — the
in-run evaluator can lose rows when the crash-prone tunnel dies mid-eval,
and this rebuilds a COMPLETE, internally consistent evaluation curve
(fresh Elo chain over the checkpoints in step order).

Usage:
  python tools/backfill_eval.py --config go9 \
      --ckpt-dir checkpoints/go/9x9_matched \
      --eval-games-dir /root/reference/games/pro_games/go/9x9 \
      --out logs/go/9x9_matched/evaluation_backfill.csv [--metrics-only]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="go9")
    p.add_argument("--ckpt-dir", required=True)
    p.add_argument("--eval-games-dir", default="")
    p.add_argument("--out", required=True)
    p.add_argument("--eval-games", type=int, default=16)
    p.add_argument("--metrics-only", action="store_true",
                   help="skip the matches/Elo; only pro-game metrics")
    p.add_argument("--steps", type=int, nargs="*", default=None,
                   help="only these training steps (default: all found)")
    args = p.parse_args()

    from alpha_zero_tpu import config as config_lib
    from alpha_zero_tpu.cli.common import enable_compile_cache
    from alpha_zero_tpu.cli.play import load_variables
    from alpha_zero_tpu.eval.dataset import build_eval_dataset
    from alpha_zero_tpu.eval.evaluator import Evaluator
    from alpha_zero_tpu.training.pipeline import build_engine
    from alpha_zero_tpu.utils.csv_writer import CsvWriter
    from alpha_zero_tpu.utils.logging import create_logger, get_time_stamp

    enable_compile_cache()
    logger = create_logger()
    cfg = config_lib.get_config(args.config)
    engine = build_engine(cfg.env)

    ckpts = []
    for name in os.listdir(args.ckpt_dir):
        if name.startswith("training_steps_"):
            ckpts.append((int(name.rsplit("_", 1)[1]), name))
    ckpts.sort()
    if args.steps:
        ckpts = [(s, n) for s, n in ckpts if s in set(args.steps)]
    if not ckpts:
        print("no checkpoints found")
        return 1

    dataset = None
    if args.eval_games_dir:
        dataset = build_eval_dataset(
            args.eval_games_dir, cfg.env.board_size, cfg.env.num_stack,
            logger=logger,
            cache_path=os.path.join(
                args.ckpt_dir,
                f"eval_dataset_{cfg.env.board_size}x{cfg.env.board_size}.npz"))

    net = None
    evaluator = None
    writer = CsvWriter(args.out, buffer_size=1)
    for step, name in ckpts:
        net, variables = load_variables(cfg, os.path.join(args.ckpt_dir, name))
        if evaluator is None:
            evaluator = Evaluator(
                engine, net, cfg.search, dataset=dataset,
                eval_games=1 if args.metrics_only else args.eval_games)
        if args.metrics_only:
            stats = evaluator._pro_metrics(variables, batch_size=8192)
        else:
            stats = evaluator.evaluate(variables, seed=step)
            stats.pop("_moves", None)
            stats.pop("_sgf_result", None)
        writer.write({"datetime": get_time_stamp(), "training_steps": step,
                      **stats})
        logger.info(f"step {step}: " + ", ".join(
            f"{k}={v}" for k, v in stats.items()
            if k.startswith("policy_top_1") or k == "game_result"))
    writer.close()
    print(f"wrote {args.out} ({len(ckpts)} rows)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
