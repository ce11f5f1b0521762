"""Game state pytree shared by all board-game kernels.

The reference keeps mutable Python objects per game (``envs/base.py:26-364``,
``envs/go_engine.py:300-534``); here a game is an immutable fixed-shape pytree
so thousands of games step in lockstep under ``jit``/``vmap`` and whole trees
of states can live on device inside MCTS.

Colors are +1 (black) / -1 (white) / 0 (empty) for both games — swapping colors
is a sign flip, and the binary observation planes are identical to the
reference's (which uses 1/2 ids for Gomoku; only the comparison target differs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import struct

BLACK = 1
WHITE = -1
EMPTY = 0

# Special actions. Flat board moves are [0, N*N); N*N is pass (Go only);
# RESIGN mirrors the reference's resign_move == -1 (envs/base.py:72).
RESIGN = -1


@struct.dataclass
class GameState:
    """One game's complete state. All fields fixed-shape; batch via vmap.

    ``history[0]`` is always the board after the most recent move (the
    reference's ``board_deltas`` deque with latest at index 0, base.py:210).
    """

    board: jnp.ndarray        # int8[N, N]; +1 black, -1 white, 0 empty
    history: jnp.ndarray      # int8[num_stack, N, N]; [0] == current board
    to_play: jnp.ndarray      # int8 scalar; +1 or -1
    step_count: jnp.ndarray   # int32 scalar; moves played so far
    done: jnp.ndarray         # bool scalar
    winner: jnp.ndarray       # int8 scalar; +1 / -1 / 0 (none or draw)
    last_move: jnp.ndarray    # int32 scalar; flat action, -1 resign, -2 none yet
    last_reward: jnp.ndarray  # float32 scalar; reward emitted by the last step,
    #                           from the mover's perspective (base.py/go.py docs)
    # --- Go-specific (zero for Gomoku) ---
    ko: jnp.ndarray           # int32 scalar; flat index of ko point, -1 none
    pass_streak: jnp.ndarray  # int32 scalar; consecutive passes
    num_passes: jnp.ndarray   # int32 scalar; total passes (per-game stats)
    captures: jnp.ndarray     # int32[2]; (black, white) capture counts
    resigned: jnp.ndarray     # bool scalar; game ended by resignation
    final_score: jnp.ndarray  # float32 scalar; black-perspective score at end
    #                           (komi applied), 0 until the game completes
    # --- cached position analysis (computed by init/step; Go keeps real
    #     group data, Gomoku keeps minimal dummies). Stored as f32 (exact
    #     small integers / 0-1 flags): the search gathers these per node with
    #     one-hot matmuls, and float-native storage avoids whole-array dtype
    #     conversions inside the simulation loop. ---
    labels: jnp.ndarray       # f32[N, N] group labels (N*N = empty); Go
    group_libs: jnp.ndarray   # f32[N*N+1] liberty count per group root; Go
    legal: jnp.ndarray        # f32[num_actions] legal-move mask (0.0/1.0)


@functools.lru_cache(maxsize=None)
def jitted(engine, method_name: str, batched: bool = False):
    """Globally cached jitted (optionally vmapped) engine method.

    Engines hash/compare by static config, so repeated constructions of the
    same config reuse one compiled executable instead of re-tracing.
    """
    fn = getattr(engine, method_name)
    if batched:
        fn = jax.vmap(fn)
    return jax.jit(fn)
