#!/bin/bash
# Crash-resume supervisor for cli.train on the tunneled TPU.
#
# The axon TPU tunnel intermittently fails with transient backend errors
# (~every 10 min in the round-3 gomoku9 run); this loop restarts training
# from the latest checkpoint + saved replay until it exits cleanly (step
# budget reached) or MAX_RESTARTS is hit. Elo/evaluator continuity across
# restarts is automatic (Trainer seeds the evaluator from the last
# evaluation.csv row and the resumed weights — pipeline.enable_evaluator).
#
# Usage: tools/supervise_train.sh <config> <ckpt_dir> [extra --set overrides...]
set -u
CONFIG="$1"; CKPT_DIR="$2"; shift 2
MAX_RESTARTS="${MAX_RESTARTS:-200}"

for i in $(seq 1 "$MAX_RESTARTS"); do
  LATEST=$(python - "$CKPT_DIR" <<'EOF'
import sys
from alpha_zero_tpu.training.checkpoint import latest_checkpoint
print(latest_checkpoint(sys.argv[1]) or "")
EOF
)
  RESUME=()
  if [ -n "$LATEST" ]; then
    RESUME+=("--set" "run.load_ckpt=$LATEST")
    echo "=== supervisor: attempt $i resuming from $LATEST ==="
  else
    echo "=== supervisor: attempt $i fresh start ==="
  fi
  # Replay is saved every train.save_replay_interval GAMES, so it exists
  # during the long first generation before any checkpoint does — reload it
  # even without a checkpoint, or a crash mid-generation-1 restarts the
  # min_games collection from zero (Trainer.run counts
  # replay.num_games_added toward the first generation's target).
  if [ -f "$CKPT_DIR/replay_state.npz" ]; then
    RESUME+=("--set" "run.load_replay=$CKPT_DIR/replay_state.npz")
  fi
  # ${RESUME[@]+...}: guard the empty-array expansion under `set -u` (bash
  # < 4.4 aborts with 'unbound variable' on a plain "${RESUME[@]}").
  python -m alpha_zero_tpu.cli.train --config "$CONFIG" ${RESUME[@]+"${RESUME[@]}"} "$@"
  rc=$?
  if [ $rc -eq 0 ]; then
    echo "=== supervisor: training finished cleanly ==="
    exit 0
  fi
  echo "=== supervisor: train exited rc=$rc; restarting in 5s ==="
  sleep 5
done
echo "=== supervisor: gave up after $MAX_RESTARTS restarts ==="
exit 1
