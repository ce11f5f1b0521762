"""On-accelerator cross-lowering parity sweep for the MCTS hot loop.

Runs ``batched_search`` (+ a reroot/reuse step) under every hot-loop
lowering — Pallas vs XLA select, and each AZT_GATHER_PIECES subset — ON THE
ACCELERATOR and requires bit-identical results against the default
(onehot/XLA) lowering on the same device.

Why same-device instead of device-vs-CPU: all lowerings share the same
formulas, so on one backend they must agree bit-for-bit; a backend
miscompile of one lowering (e.g. the vmapped-scatter dropped-write class
found in round 4, see tools/device_parity.py) shows up as divergence at
large batch. Device-vs-CPU comparison of the full search is confounded by
ULP differences in transcendentals (log/sqrt/exp) between backends, which
flip PUCT argmaxes without any bug.

The NN is replaced by a deterministic integer-exact pseudo-evaluator so
runs are reproducible and all-backend-exact.

Usage: python tools/search_parity.py [--batches 256 1024] [--sims 64]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _pseudo_eval(num_actions):
    """Deterministic, integer-exact policy/value from the observation."""
    import jax.numpy as jnp

    def f(obs):
        b = obs.shape[0]
        flat = obs.reshape(b, -1).astype(jnp.int32)
        h = jnp.sum(flat * (jnp.arange(flat.shape[1]) % 13 + 1), axis=1)
        a = jnp.arange(num_actions)
        w = 1.0 + ((h[:, None] * 7 + a[None, :] * 3) % 11).astype(jnp.float32)
        pi = w / jnp.sum(w, axis=1, keepdims=True)
        v = (((h % 9) - 4).astype(jnp.float32)) / 4.0
        return pi, v

    return f


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--game", default="go", choices=("go", "gomoku"))
    p.add_argument("--board-size", type=int, default=9)
    p.add_argument("--batches", type=int, nargs="*", default=[256, 1024, 2048])
    p.add_argument("--sims", type=int, default=64)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (smoke-testing the tool "
                        "without touching the accelerator)")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from alpha_zero_tpu.envs.go import GoEngine
    from alpha_zero_tpu.envs.gomoku import GomokuEngine
    from alpha_zero_tpu.search import mcts

    if args.game == "go":
        engine = GoEngine(board_size=args.board_size, num_stack=8)
    else:
        engine = GomokuEngine(board_size=args.board_size, num_stack=8)
    eval_fn = _pseudo_eval(engine.num_actions)

    # (name, INDEXING, GATHER_PIECES, SELECT_MODE)
    configs = [
        ("onehot/xla (default ref)", "onehot", frozenset(), "xla"),
        ("pallas-select", "onehot", frozenset(), "pallas"),
    ] + [
        (f"gather:{piece}", "gather", frozenset([piece]), "xla")
        for piece in mcts._ALL_PIECES
    ] + [
        ("gather:all", "gather", frozenset(mcts._ALL_PIECES), "xla"),
    ]

    def run(B, seed=0):
        states = engine.init_batch(B)
        rng = jax.random.PRNGKey(seed)
        r1, trees = mcts.batched_search(
            eval_fn, engine, states, rng, num_simulations=args.sims,
            root_noise=True, return_trees=True)
        move = jnp.argmax(r1.child_N, axis=-1).astype(jnp.int32)
        new_states = engine.step_batch(states, move)
        trees = mcts.reroot_trees(trees, move, new_states.done, new_states,
                                  engine.num_actions)
        r2 = mcts.batched_search(
            eval_fn, engine, new_states, rng, num_simulations=args.sims,
            prev_trees=trees, max_new_sims=args.sims // 2, root_noise=True)
        return jax.tree.map(np.asarray, (r1, r2))

    failures = 0
    for B in args.batches:
        ref = None
        for name, indexing, pieces, select_mode in configs:
            mcts.INDEXING = indexing
            mcts.GATHER_PIECES = pieces
            mcts.SELECT_MODE = select_mode
            try:
                out = run(B)
            except Exception as e:  # noqa: BLE001
                failures += 1
                print(f"B={B} {name}: ERROR {type(e).__name__}: {e}")
                continue
            if ref is None:
                ref = out
                print(f"B={B} {name}: reference")
                continue
            bad = []
            for r, o, tag in ((ref[0], out[0], "r1"), (ref[1], out[1], "r2")):
                for field in r._fields:
                    a, b = getattr(r, field), getattr(o, field)
                    if not np.array_equal(a, b):
                        lanes = int(
                            (a != b).reshape(a.shape[0], -1).any(-1).sum())
                        bad.append(f"{tag}.{field} ({lanes} lanes)")
            if bad:
                failures += 1
                print(f"B={B} {name}: DIVERGED {', '.join(bad)}")
            else:
                print(f"B={B} {name}: OK (bit-equal)")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
