"""alpha_zero_tpu — a TPU-native AlphaZero framework.

A from-scratch JAX/XLA re-design of the capabilities of michaelnny/alpha_zero:

- ``envs``     — pure-JAX batched board-game kernels (Go, Gomoku) that step
  thousands of games in lockstep under ``jit``/``vmap``, plus host-side
  wrappers exposing the reference's Gym-like API for GUIs/CLIs/tests.
- ``models``   — Flax ResNet policy/value network (MXU-friendly NHWC, bf16).
- ``search``   — batched on-device MCTS over fixed-capacity array trees.
- ``training`` — self-play actor / learner pipeline as alternating jitted
  programs, host ring-buffer replay, optax SGD learner, orbax checkpoints.
- ``parallel`` — device mesh / sharding helpers (dp over games & batch,
  psum gradient collectives over ICI).
- ``eval``     — Elo ratings, head-to-head evaluator, pro-game datasets.
- ``utils``    — coordinates, SGF, CSV metrics, logging (host-side I/O).
"""

__version__ = "0.1.0"
