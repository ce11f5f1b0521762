"""Short end-to-end training run on real hardware (go9, scaled down).

Validates the full pipeline on the TPU: batched self-play feeding replay,
generations of SGD with augmentation, checkpointing, evaluator match + Elo.
Prints per-generation losses; expect policy loss to drop from ~ln(82).

Usage: python tools/tpu_smoke_train.py [out_dir]
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from alpha_zero_tpu import config as config_lib  # noqa: E402
from alpha_zero_tpu.training import pipeline  # noqa: E402


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/az_smoke"
    cfg = config_lib.AlphaZeroConfig(
        env=config_lib.EnvConfig(game="go", board_size=9, komi=7.5, num_stack=8),
        network=config_lib.NetworkConfig(num_res_blocks=10, num_filters=128,
                                         num_fc_units=128),
        search=config_lib.SearchConfig(num_simulations=50, warm_up_steps=16),
        resign=config_lib.ResignConfig(init_resign_threshold=-0.88,
                                       no_resign_games=100_000),
        train=config_lib.TrainConfig(
            min_games=400, games_per_ckpt=300, replay_capacity=100_000,
            batch_size=512, ckpt_interval=100, log_interval=50,
            max_training_steps=300, init_lr=0.02,
        ),
        run=config_lib.RunConfig(ckpt_dir=f"{out}/ckpt", logs_dir=f"{out}/logs",
                                 save_sgf_dir=f"{out}/sgf", seed=7),
        parallel=config_lib.ParallelConfig(selfplay_batch_size=256),
    )
    t0 = time.time()
    trainer = pipeline.Trainer(cfg)
    trainer.enable_evaluator()

    def report(tr):
        print(f"[{time.time() - t0:7.1f}s] step={tr.training_steps} "
              f"games={tr.replay.num_games_added} samples={tr.replay.num_samples_added}",
              flush=True)

    trainer.run(on_checkpoint=report)
    print(f"done in {time.time() - t0:.1f}s; "
          f"{trainer.replay.num_games_added} games, "
          f"{trainer.training_steps} training steps", flush=True)
    with open(f"{out}/logs/training.csv") as f:
        print("training.csv tail:")
        for line in f.readlines()[-5:]:
            print(" ", line.strip())


if __name__ == "__main__":
    main()
