#!/bin/bash
# One real go19_jumbo training generation end-to-end on a single chip at
# reduced shapes (VERDICT r4 #5): selfplay -> replay -> train -> ckpt ->
# eval at the exact jumbo tensor geometry (19x19, 19b256 net, 800-sim
# trees, T=801), with a reduced batch (256), a shortened game cap
# (env.max_steps=120 — documented shape-proof, not a strength run) and a
# tiny generation so it fits ~30-40 min of chip time.
set -eu
cd "$(dirname "$0")/.."
timeout "${JUMBO_TIMEOUT:-3600}" python -m alpha_zero_tpu.cli.train --config go19_jumbo \
  --set parallel.selfplay_batch_size=256 \
  --set env.max_steps=120 \
  --set train.min_games=256 --set train.games_per_ckpt=256 \
  --set train.batch_size=512 --set train.max_training_steps=30 \
  --set train.ckpt_interval=30 --set train.log_interval=10 \
  --set train.replay_capacity=100000 \
  --set train.save_replay_interval=0 \
  --set resign.init_resign_threshold=-1.0 \
  --set run.eval_games=2 \
  --set run.ckpt_dir=checkpoints/go/19x19_e2e \
  --set run.logs_dir=logs/go/19x19_e2e \
  "$@"
