"""Accelerator-vs-CPU engine parity sweep (run on a machine WITH the TPU).

Steps identical random legal games through ``step_batch`` jitted for the
accelerator and for the host CPU backend and diffs every analysis field at
several batch sizes. CPU-only unit tests cannot catch a backend-specific
miscompile; this harness exists because one was real: vmapped per-lane 2-D
scatters (``board.at[r, c].set``) silently DROPPED writes with flat index
>= 64 at batch >= 1024 on the axon TPU backend — every Go board on TPU was
corrupt until envs/go.py switched the stone write to a one-hot blend
(round 4; found by replaying the pro-game corpus, where ~half the games
"became illegal" mid-replay).

Usage: python tools/device_parity.py [--game go|gomoku] [--board-size N]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

# Importable when run as a script from anywhere (PYTHONPATH must stay
# untouched: the session's sitecustomize — which registers the axon TPU
# plugin — is found through it).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--game", default="go", choices=("go", "gomoku"))
    p.add_argument("--board-size", type=int, default=9)
    p.add_argument("--batches", type=int, nargs="*", default=[256, 1024, 2048, 4096])
    p.add_argument("--steps", type=int, default=12)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from alpha_zero_tpu.envs.go import GoEngine
    from alpha_zero_tpu.envs.gomoku import GomokuEngine

    cpu = jax.devices("cpu")[0]
    accels = [d for d in jax.devices() if d.platform != "cpu"]
    if not accels:
        print("no accelerator devices found; nothing to compare")
        return 0
    dev = accels[0]

    if args.game == "go":
        engine = GoEngine(board_size=args.board_size, num_stack=8)
        fields = ("board", "labels", "group_libs", "legal", "ko", "to_play",
                  "pass_streak", "done", "winner")
        n_moves = args.board_size * args.board_size
    else:
        engine = GomokuEngine(board_size=args.board_size, num_stack=8)
        fields = ("board", "legal", "to_play", "done", "winner")
        n_moves = args.board_size * args.board_size

    failures = 0
    for B in args.batches:
        rng = np.random.default_rng(B)
        step_a = jax.jit(engine.step_batch, device=dev)
        step_c = jax.jit(engine.step_batch, device=cpu)
        s_a = jax.device_put(engine.init_batch(B), dev)
        s_c = jax.device_put(jax.tree.map(np.asarray, s_a), cpu)
        bad = None
        for j in range(args.steps):
            legal = np.asarray(s_c.legal)
            mv = np.array(
                [rng.choice(np.flatnonzero(legal[i][:n_moves] > 0.5))
                 if legal[i][:n_moves].sum() else n_moves
                 for i in range(B)], np.int32,
            )
            s_a = step_a(s_a, jax.device_put(jnp.asarray(mv), dev))
            s_c = step_c(s_c, jax.device_put(jnp.asarray(mv), cpu))
            for f in fields:
                a, c = np.asarray(getattr(s_a, f)), np.asarray(getattr(s_c, f))
                if not np.array_equal(a, c):
                    lanes = int((a != c).reshape(B, -1).any(-1).sum())
                    bad = (j, f, lanes)
                    break
            if bad:
                break
        if bad:
            failures += 1
            print(f"B={B}: DIVERGED step {bad[0]} field {bad[1]} ({bad[2]} lanes)")
        else:
            print(f"B={B}: OK ({args.steps} steps, all fields bit-equal)")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
