"""Batched on-device MCTS over fixed-capacity array trees.

A TPU-first redesign of the reference search (`alpha_zero/core/mcts_v2.py`):
instead of Python ``Node`` objects with on-demand children and
``copy.deepcopy(env)`` per simulation (mcts_v2.py:56-140, :579), the whole
search state is a structure-of-arrays pytree with a leading batch dimension.

Layout choices are driven by what runs fast on TPU:

- **node-indexed visit/value stats** (``node_N/node_W [T]``): the stats of the
  edge INTO each node. This is numerically identical to the reference's
  parent-layout ``child_N/child_W`` (``node.N`` lives at the parent,
  mcts_v2.py:111-135) with node 0's entry playing the ``DummyNode`` root slot
  (:56-62) — but makes backup a dense [T]-vector update instead of scattered
  [T, A] writes.
- **one-hot matmuls instead of gathers/scatters**: per-game dynamic indexing
  under ``vmap`` lowers to serialized TPU gathers; every row/element fetch
  here is an MXU-friendly one-hot product.
- **path-recording select + single-matmul backup**: selection records the
  visited nodes at uniform depth indices (fast dynamic-update-slice under
  vmap); backup folds the whole sign-alternating path update
  (mcts_v2.py:213-232) into one one-hot matrix product.
- **per-lane slot allocation via one-hot blends**: simulation writes land at
  each game's own next free slot (``num_nodes``) as dense masked blends over
  the [T]-indexed arrays — vectorized elementwise work, no scatters. A slot is
  only consumed when a new node actually materializes (selection that hits an
  existing terminal node allocates nothing).
- one neural-net evaluation per simulation, batched over all games. This
  replaces the reference's virtual-loss tree parallelism (mcts_v2.py:453-482,
  :568-625): the whole batch advances synchronously, one leaf per game per
  simulation, so virtual loss is unnecessary — NN batching comes from the
  game batch (thousands of games) instead of 8 intra-tree leaves.

Search semantics match the *serial* ``uct_search`` (mcts_v2.py:301-450)
exactly: PUCT with sign-flipped child Q, terminal-state backup with the true
reward, Dirichlet root noise, temperature with the [1, 5] exponent clamp —
verified visit-for-visit against the reference in tests.

**Subtree reuse across moves** (mcts_v2.py:643-653) is supported: after a move
the chosen child's subtree is promoted to the root by compacting its nodes
into the low slots (`reroot_trees`). Slot ids are allocated in creation order,
so every node's index exceeds its parent's and a stable compaction lands the
new root at slot 0 automatically. The next search then continues the
reference's ``while root.N < num_simulations`` budget: lanes whose reused root
already carries visits run fewer *real* simulations (the remaining loop
iterations are masked no-ops). With ``max_new_sims`` below the full budget the
simulation loop itself shortens — the throughput lever reuse buys — at the
cost of lanes with little reuse not reaching the full budget.
"""

from __future__ import annotations

import functools
import os
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from alpha_zero_tpu.envs.types import GameState

# Indexing strategy for the per-simulation hot loop:
#   "gather" — native dynamic indexing (take_along_axis / scatter-at): per-sim
#              HBM traffic is proportional to what is actually touched
#              (~KB per lane), the mctx-style layout.
#   "onehot" — the round-1 one-hot matmul / masked-reduce forms: every access
#              sweeps the full [T, ...] arrays (~MB per lane per sim).
# Both compute identical results (covered by the same parity tests); the
# toggle exists because the two lower very differently on TPU and the winner
# is decided by end-to-end bench.py, not microbenches. Measured on the v5e
# bench config (B=1024, 200 sims, reuse@120): onehot 1130 env-steps/s; every
# native-indexing combination loses (all-gather 379, scatter-writes-only 612,
# read-gathers-only 965) — vmapped gathers/scatters serialize on this
# hardware, so onehot is the default.
#
# STATUS: the gather lowerings are BENCH-ONLY measurement baselines, not
# supported production paths — because they are slower, not because they
# are unverified: the on-device cross-lowering sweep
# (tools/search_parity.py) ran on the TPU at B=256 and B=1024 and every
# gather piece (and the Pallas select) is bit-identical to this default
# path on device (PERF.md round 5); re-run the sweep when moving to a new
# accelerator/backend before trusting any non-default piece there.
INDEXING = os.environ.get("AZT_INDEXING", "onehot")

# Per-piece override: which hot-loop pieces use the gather lowering when
# INDEXING == "gather" (bisection/tuning knob; AZT_GATHER_PIECES is a comma
# list drawn from the full set below).
#
# NOTE: both AZT_INDEXING and AZT_GATHER_PIECES are read ONCE, at import
# time. Setting them after `import alpha_zero_tpu.search.mcts` has no
# effect; set them in the environment before Python starts (as bench.py
# does) or monkeypatch the module globals INDEXING / GATHER_PIECES (as
# tests/test_indexing_paths.py does).
_ALL_PIECES = ("select", "state", "materialize", "expand", "history")
GATHER_PIECES = frozenset(
    p for p in os.environ.get("AZT_GATHER_PIECES", ",".join(_ALL_PIECES)).split(",")
    if p
)


def _use_gather(piece: str) -> bool:
    return INDEXING == "gather" and piece in GATHER_PIECES


# Select lowering:
#   "pallas" — the VMEM-resident Pallas descent kernel
#              (ops/tree_kernels.py): each lane-block's child_P is DMA'd
#              on-chip ONCE per simulation; the XLA lowering re-sweeps it
#              from HBM once per descent step.
#   "xla"    — the one-hot/while_loop lowering (_select_leaf).
#   "auto"   — on TPU backends, pallas when the per-lane child_P row block
#              is big enough that select is HBM-sweep-bound; xla elsewhere.
# Read once at import time, like AZT_INDEXING above.
SELECT_MODE = os.environ.get("AZT_SELECT", "auto")

# v5e measurements (bench.py, B=1024, round 5): the Pallas descent trades
# one child_P HBM sweep per SIM against [blk, T, A] VPU passes per descent
# STEP. Small trees are compute-bound and lose (go9 T*A=16.5k: 1,583 vs
# 2,000 e/s); big trees are sweep-bound and win (gomoku13 T*A=64k: 674 vs
# 541 e/s). Crossover sits between — use bytes-per-lane >= 128 KB.
_PALLAS_SELECT_MIN_ROW_BYTES = 128 * 1024


def _use_pallas_select(capacity: int, num_actions: int) -> bool:
    if INDEXING == "gather" and "select" in GATHER_PIECES:
        return False  # explicit gather experiments keep the XLA path
    if SELECT_MODE == "pallas":
        return True
    if SELECT_MODE == "xla":
        return False
    if jax.default_backend() in ("cpu",):
        return False
    if capacity * num_actions * 4 < _PALLAS_SELECT_MIN_ROW_BYTES:
        return False
    # Huge rows (go19_jumbo: 1.16 MB/lane) force lane blocks of 2-4 to fit
    # VMEM — hundreds of grid programs per call, overhead-bound. Keep XLA
    # unless at least 8 lanes fit per block.
    from alpha_zero_tpu.ops import tree_kernels

    return tree_kernels._pick_block(
        1024, tree_kernels._padded_lane_bytes(capacity, num_actions)) >= 8


@struct.dataclass
class NodeState:
    """Minimal per-node game state stored in the tree.

    The engine's full :class:`GameState` carries fields a tree node never
    needs again once its children's legality is folded into ``child_P``
    (``legal`` — 328B of f32), duplicates (1-deep ``history`` == ``board``),
    and wide dtypes (f32 ``labels``/``group_libs`` cached analysis — exact
    small integers that fit i16). Since every per-simulation access sweeps
    the whole [T, ...] state arrays in the one-hot lowering, trimming the
    node from ~1.2KB to ~0.4KB cuts the dominant HBM traffic of the search
    (gather_state + materialize) by ~3x. ``step_core`` reads exactly these
    fields (envs/go.py:330-455, envs/gomoku.py:105-138)."""

    board: jnp.ndarray        # int8[N, N]
    labels: jnp.ndarray       # int8/int16 group labels (Go; [1,1] dummy for
    #                           Gomoku); int8 when N*N <= 127
    group_libs: jnp.ndarray   # int8/int16 liberties per group root (Go)
    to_play: jnp.ndarray      # int8 scalar
    pass_streak: jnp.ndarray  # int32 scalar (Go double-pass termination)
    step_count: jnp.ndarray   # int32 scalar (max_steps termination)


def _node_state_of(gs: GameState) -> NodeState:
    """GameState -> NodeState (elementwise; works batched or per-game).

    Labels and liberty counts are flat indices / counts bounded by N*N, so
    on boards up to 11x11 they fit int8 — halving the bytes of the two
    widest NodeState leaves that every per-sim state sweep reads (gather /
    materialize). 19x19 keeps int16 (values up to 361)."""
    n = gs.board.shape[-1]
    idt = jnp.int8 if n * n <= 127 else jnp.int16
    return NodeState(
        board=gs.board,
        labels=gs.labels.astype(idt),
        group_libs=gs.group_libs.astype(idt),
        to_play=gs.to_play,
        pass_streak=gs.pass_streak,
        step_count=gs.step_count,
    )


def _game_state_of(ns: NodeState, num_actions: int) -> GameState:
    """Reconstructs a full batched GameState for the engine step from stored
    node fields. Dummied fields fall into two classes — do NOT consume the
    second class from tree nodes:

    - never read by ``step_core``: the parent's ``legal``/``ko`` are already
      folded into the stored child priors (-1 sentinel), and history at
      num_stack=1 duplicates the board.
    - read but benign-and-discarded: ``captures`` (go.py:395) and
      ``num_passes`` (go.py:444) accumulate from the dummy zeros, and
      ``done=False`` means an already-terminal node WOULD step a phantom
      move (the finished-game no-op guard, go.py:454 / gomoku.py:139, never
      fires). All three are safe only because selection stops at terminal
      children — a done node is never chosen as the expansion leaf — and
      because the expanded child's captures/num_passes/winner are never read
      back out of the tree. A future consumer of those per-node fields must
      store ``done`` (and the true counters) in NodeState first."""
    b = ns.board.shape[0]
    zi = jnp.zeros((b,), jnp.int32)
    return GameState(
        board=ns.board,
        history=ns.board[:, None],
        to_play=ns.to_play,
        step_count=ns.step_count,
        done=jnp.zeros((b,), jnp.bool_),
        winner=jnp.zeros((b,), jnp.int8),
        last_move=jnp.full((b,), -2, jnp.int32),
        last_reward=jnp.zeros((b,), jnp.float32),
        ko=jnp.full((b,), -1, jnp.int32),
        pass_streak=ns.pass_streak,
        num_passes=zi,
        captures=jnp.zeros((b, 2), jnp.int32),
        resigned=jnp.zeros((b,), jnp.bool_),
        final_score=jnp.zeros((b,), jnp.float32),
        labels=ns.labels.astype(jnp.float32),
        group_libs=ns.group_libs.astype(jnp.float32),
        legal=jnp.zeros((b, num_actions), jnp.float32),
    )


@struct.dataclass
class Tree:
    """Fixed-capacity search tree for ONE game (batch via leading vmap dim).

    T = num_simulations + 1 node slots; node 0 is the root; new nodes fill
    slots in creation order (``num_nodes`` is the next free slot), so parents
    always precede children — the invariant subtree re-rooting relies on.
    """

    node_N: jnp.ndarray          # f32[T] visits of the edge into each node
    node_W: jnp.ndarray          # f32[T] value sum (node-player perspective)
    node_P: jnp.ndarray          # f32[T] prior of the edge INTO each node —
    #                              a dense copy of child_P[parent, action]
    #                              maintained at materialize / root noise /
    #                              reroot. Select's PUCT over EXISTING
    #                              children then runs on [T] vectors; the
    #                              [T, A] child_P sweep remains only for the
    #                              fresh-action row fetch (one per descent
    #                              step instead of ~five [T, A]-sized ops).
    child_P: jnp.ndarray         # f32[T, A] child priors per node; -1.0 marks
    #                              ILLEGAL actions (select reads one row for
    #                              both prior and legality — the node's legal
    #                              mask never changes after creation)
    parent_index: jnp.ndarray    # f32[T]; -1 for root (float-native index)
    action_from_parent: jnp.ndarray  # f32[T]
    # There is deliberately NO children_index [T, A] array: select finds
    # cur's children by comparing the two [T] parent/action vectors (each
    # (parent, action) pair is written once, so the masked scatter by action
    # is exact). Storing it cost a [T, A] HBM fetch per descent step in
    # select, a [T, A] blend in materialize, and a [T, A] permute in reroot
    # — 2-4x the bytes of everything else those phases touch (round-4
    # profile split).
    node_expanded: jnp.ndarray   # bool[T]; has priors (terminal nodes never do)
    node_done: jnp.ndarray       # f32[T]; 1.0 when game over at this node
    node_reward: jnp.ndarray     # f32[T]; reward emitted by the creating step
    states: NodeState            # stacked [T, ...] trimmed node states
    #                              (observation stacks are rebuilt from
    #                              ancestor boards + root_history)
    root_legal: jnp.ndarray      # f32[A]; the root state's legal mask
    root_history: jnp.ndarray    # s8[S, N, N]; the root's pre-search history
    num_nodes: jnp.ndarray       # f32 scalar; next free slot (nodes in use)


class SearchResult(NamedTuple):
    """Root statistics after the simulation budget is spent."""

    child_N: jnp.ndarray   # [B, A] root child visit counts
    child_W: jnp.ndarray   # [B, A] root child total values
    root_Q: jnp.ndarray    # [B] root mean value (root player's perspective)
    legal: jnp.ndarray     # [B, A] root legal mask


# ---------------------------------------------------------------------------
# One-hot indexing primitives (TPU-fast replacements for gather/scatter)
# ---------------------------------------------------------------------------


def _oh(idx: jnp.ndarray, size: int) -> jnp.ndarray:
    """One-hot f32 row for a scalar index (all-zero when out of range)."""
    return (jnp.arange(size, dtype=jnp.int32) == idx).astype(jnp.float32)


def _elem(vec: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """vec[idx] (f32) via one-hot dot; 0 when idx out of range."""
    return _oh(idx, vec.shape[0]) @ vec


def _elem_exact(vec: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Like :func:`_elem` but bit-exact on TPU — for float-native NODE IDS,
    which the default f32-dot path would round to bf16 (exact only <= 256)."""
    return jnp.dot(_oh(idx, vec.shape[0]), vec,
                   precision=jax.lax.Precision.HIGHEST)


def _fetch_row(arr: jnp.ndarray, i: jnp.ndarray) -> jnp.ndarray:
    """arr[i] for a 2-D array and in-range scalar index (per-lane form; a
    batched gather under vmap when INDEXING == 'gather')."""
    if _use_gather("select"):
        return jax.lax.dynamic_slice_in_dim(arr, i, 1, axis=0)[0]
    return _oh(i, arr.shape[0]) @ arr


def _fetch_elem(vec: jnp.ndarray, i: jnp.ndarray) -> jnp.ndarray:
    """vec[i] for an in-range scalar index (per-lane form)."""
    if _use_gather("select"):
        return jax.lax.dynamic_index_in_dim(vec, i, keepdims=False)
    return _elem(vec, i)


def _matmul_state(states: GameState, m_f: jnp.ndarray, capacity: int,
                  out_rows: Optional[int] = None) -> GameState:
    """Applies a {0,1} row-selection matrix ``m_f [R, T]`` to every [T, ...]
    leaf of ``states`` via matmuls (exact for small-int payloads).

    int8 leaves (board, history — the bulk of the state) use an s8 x s8 MXU
    product so the big buffers are never converted to f32; float leaves
    multiply directly. Only tiny scalar-per-node leaves pay a convert.
    """
    m_s8 = m_f.astype(jnp.int8)
    rows = m_f.shape[0] if out_rows is None else out_rows

    def g(leaf):
        flat = leaf.reshape(capacity, -1)
        if leaf.dtype == jnp.int8:
            out = jax.lax.dot_general(
                m_s8, flat, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.int8)
        elif leaf.dtype == jnp.float32:
            out = jnp.dot(m_f, flat, precision=jax.lax.Precision.HIGHEST)
        else:
            # i16 payloads (labels/liberties, values up to N*N): HIGHEST so
            # integers above 256 survive the TPU's bf16 f32-dot rounding.
            out = jnp.dot(m_f, flat.astype(jnp.float32),
                          precision=jax.lax.Precision.HIGHEST).astype(leaf.dtype)
        return out.reshape((rows,) + leaf.shape[1:])

    return jax.tree.map(g, states)


def _gather_state(states: GameState, idx: jnp.ndarray, capacity: int) -> GameState:
    """states[idx] as a masked reduction (one predicated pass over each [T,...]
    leaf — measured much faster on TPU than the int8 MXU dot path, which does
    not hit the fast fusion)."""
    oh = jnp.arange(capacity, dtype=jnp.int32) == idx

    def g(leaf):
        flat = leaf.reshape(capacity, -1)
        if jnp.issubdtype(leaf.dtype, jnp.integer) or leaf.dtype == jnp.bool_:
            row = jnp.where(oh[:, None], flat, 0).sum(0, dtype=jnp.int32)
            row = row.astype(leaf.dtype)
        else:
            row = jnp.where(oh[:, None], flat, 0).sum(0, dtype=leaf.dtype)
        return row.reshape(leaf.shape[1:])

    return jax.tree.map(g, states)


def _gather_state_rows(states: GameState, idx: jnp.ndarray) -> GameState:
    """Batched ``states[b, idx[b]]`` as one row gather per [B, T, ...] leaf —
    touches only the selected rows instead of sweeping the whole tree (the
    'gather' counterpart of vmapped :func:`_gather_state`)."""

    def g(leaf):
        ix = idx.reshape((-1,) + (1,) * (leaf.ndim - 1)).astype(jnp.int32)
        return jnp.take_along_axis(leaf, ix, axis=1)[:, 0]

    return jax.tree.map(g, states)


def _leaf_history_batch(tree: Tree, parent: jnp.ndarray, depth: jnp.ndarray,
                        new_board: jnp.ndarray, num_stack: int) -> jnp.ndarray:
    """Rebuilds every leaf's [S, N, N] board history (latest first), batched.

    Plane 0 is the leaf's own board; planes 1..S-1 come from ancestor boards
    (walked via parent pointers) while they exist (hop k <= depth), then from
    the root's pre-search history (``root_history[k - depth]``).

    Two-phase structure keeps HBM traffic at ONE pass over the tree's boards
    per simulation: first the (cheap, [B, T]-sized) parent-pointer walk
    collects all S-1 ancestor slot ids, then a single masked one-hot
    contraction pulls every ancestor plane out of ``states.board`` at once —
    instead of S-1 separate full-array sweeps.
    """
    if num_stack == 1:
        return new_board[:, None]
    batch, capacity = tree.node_N.shape
    n = new_board.shape[-1]
    t_iota = jnp.arange(capacity, dtype=jnp.int32)

    # Phase 1: ancestor ids [B, S-1] via S-2 tiny [B, T] lookups.
    ids = [parent.astype(jnp.float32)]
    for _ in range(2, num_stack):
        walk_i = jnp.clip(ids[-1], 0.0, capacity - 1).astype(jnp.int32)
        if _use_gather("history"):
            nxt = jnp.take_along_axis(tree.parent_index, walk_i[:, None], axis=1)[:, 0]
        else:
            oh = (t_iota[None, :] == walk_i[:, None]).astype(jnp.float32)
            nxt = jnp.einsum("bt,bt->b", oh, tree.parent_index)
        ids.append(jnp.where(ids[-1] >= 0, nxt, -1.0))
    anc = jnp.stack(ids, axis=1)  # f32 [B, S-1]; hop k-1 = depth of plane k

    ks = jnp.arange(1, num_stack, dtype=jnp.int32)  # plane index of each hop
    from_tree_mask = (ks[None, :] <= depth[:, None]) & (anc >= 0)
    anc_i = jnp.clip(anc, 0.0, capacity - 1).astype(jnp.int32)
    rh_idx = jnp.clip(ks[None, :] - depth[:, None], 0, num_stack - 1)

    if _use_gather("history"):
        # Phase 2: gather the S-1 ancestor boards and root-history planes
        # directly ([B, S-1] row gathers — touches KBs, not the whole tree).
        boards = tree.states.board.reshape(batch, capacity, -1)
        tree_planes = jnp.take_along_axis(boards, anc_i[:, :, None], axis=1)
        roots = tree.root_history.reshape(batch, num_stack, -1)
        root_planes = jnp.take_along_axis(roots, rh_idx[:, :, None], axis=1)
        older = jnp.where(
            from_tree_mask[:, :, None], tree_planes, root_planes
        ).reshape(batch, num_stack - 1, n, n)
    else:
        # Phase 2: one masked one-hot contraction per source (full sweep).
        oh_tree = (
            (anc_i[:, :, None] == t_iota[None, None, :]) & from_tree_mask[:, :, None]
        ).astype(jnp.float32)
        boards_f = tree.states.board.reshape(batch, capacity, -1).astype(jnp.float32)
        tree_planes = jnp.einsum("bst,btx->bsx", oh_tree, boards_f)

        oh_root = (
            (rh_idx[:, :, None] == jnp.arange(num_stack, dtype=jnp.int32)[None, None, :])
            & ~from_tree_mask[:, :, None]
        ).astype(jnp.float32)
        roots_f = tree.root_history.reshape(batch, num_stack, -1).astype(jnp.float32)
        root_planes = jnp.einsum("bsr,brx->bsx", oh_root, roots_f)
        older = (tree_planes + root_planes).astype(jnp.int8).reshape(
            batch, num_stack - 1, n, n
        )
    return jnp.concatenate([new_board[:, None], older], axis=1)


# ---------------------------------------------------------------------------
# Tree construction
# ---------------------------------------------------------------------------


def _make_empty_tree(root_state: GameState, root_history: jnp.ndarray,
                     capacity: int, num_actions: int) -> Tree:
    """A tree holding only an UNEXPANDED root; ``_init_root`` applies the
    root's NN evaluation at search start (mcts_v2.py:363-368)."""
    node = _node_state_of(root_state)
    states = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (capacity,) + x.shape), node
    )
    return Tree(
        node_N=jnp.zeros((capacity,), jnp.float32),
        node_W=jnp.zeros((capacity,), jnp.float32),
        node_P=jnp.zeros((capacity,), jnp.float32),
        child_P=jnp.full((capacity, num_actions), -1.0, jnp.float32),
        parent_index=jnp.full((capacity,), -1.0, jnp.float32),
        action_from_parent=jnp.full((capacity,), -1.0, jnp.float32),
        node_expanded=jnp.zeros((capacity,), jnp.bool_),
        node_done=jnp.zeros((capacity,), jnp.float32),
        node_reward=jnp.zeros((capacity,), jnp.float32),
        states=states,
        root_legal=root_state.legal,
        root_history=root_history,
        num_nodes=jnp.float32(1.0),
    )


def make_empty_trees(engine, root_states: GameState, num_simulations: int) -> Tree:
    """Batched fresh trees for ``root_states`` (used to seed subtree reuse)."""
    capacity = num_simulations + 1
    return jax.vmap(
        functools.partial(_make_empty_tree, capacity=capacity,
                          num_actions=engine.num_actions)
    )(root_states, root_states.history)


def _init_root(tree: Tree, prior: jnp.ndarray, value: jnp.ndarray) -> Tree:
    """Expands + backs up the root IF it is fresh (mcts_v2.py:363-368); a
    reused root keeps its carried stats and skips the evaluation entirely
    (mcts_v2.py:366: root creation only `if root_node is None`). The stored
    prior keeps the -1 illegal sentinel (see Tree.child_P)."""
    fresh = ~tree.node_expanded[0]
    prior_sel = jnp.where(tree.root_legal > 0.5, prior, -1.0)
    return tree.replace(
        node_N=tree.node_N.at[0].set(jnp.where(fresh, 1.0, tree.node_N[0])),
        node_W=tree.node_W.at[0].set(jnp.where(fresh, value, tree.node_W[0])),
        child_P=tree.child_P.at[0].set(
            jnp.where(fresh, prior_sel, tree.child_P[0])
        ),
        node_expanded=tree.node_expanded.at[0].set(True),
    )


def _add_dirichlet_noise(tree: Tree, rng: jax.Array, eps: float, alpha: float) -> Tree:
    """Root exploration noise (mcts_v2.py:235-262): noise sampled over the
    full action space, masked by legality, NOT renormalized — exact parity.
    Applied every search, including to reused roots (uct_search re-noises the
    carried priors each call, mcts_v2.py:376-378)."""
    num_actions = tree.child_P.shape[-1]
    noise = jax.random.dirichlet(rng, jnp.full((num_actions,), alpha, jnp.float32))
    legal = tree.root_legal > 0.5
    noise = noise * tree.root_legal
    new_p = jnp.maximum(tree.child_P[0], 0.0) * (1.0 - eps) + noise * eps
    row0 = jnp.where(legal, new_p, -1.0)
    # Keep the dense edge-prior copy consistent: a reused root's EXISTING
    # children must see the freshly noised priors, exactly as the row fetch
    # used to (select reads node_P for materialized children).
    a_iota_f = jnp.arange(num_actions, dtype=jnp.float32)
    oh = (tree.action_from_parent[:, None] == a_iota_f[None, :]).astype(jnp.float32)
    # HIGHEST: the prior must match a direct row read bit-for-bit (the TPU's
    # default f32-dot path rounds operands to bf16).
    p_of_action = jnp.dot(oh, row0, precision=jax.lax.Precision.HIGHEST)  # [T]
    node_P = jnp.where(tree.parent_index == 0.0, p_of_action, tree.node_P)
    return tree.replace(
        child_P=tree.child_P.at[0].set(row0),
        node_P=node_P,
    )


# ---------------------------------------------------------------------------
# Selection (records the path for the matmul backup)
# ---------------------------------------------------------------------------


def _select_leaf(tree: Tree, path_cap: int, c_puct_base: float,
                 c_puct_init: float):
    """Descends by PUCT until an unmaterialized edge or a terminal node.

    PUCT for EXISTING children runs entirely on dense [T] vectors: each
    node's incoming-edge prior is stored in ``node_P``, so its score
    -Q + U is plain vector arithmetic over (node_N, node_W, node_P). The
    per-action view needed for the argmax is assembled by ONE [T, A]
    masked scatter (each (parent, action) pair is unique, so a masked max
    is exact); unmaterialized actions score from the parent's child_P row
    (the single [T, A]-array fetch left per descent step — it doubles as
    the legality mask via the -1 illegal sentinel). Numerically identical
    to PUCT over gathered child stats (mcts_v2.py:99-109, 142-186): same
    expression tree per action, same argmax tie-breaking.

    The visited path is recorded as two dense [T] one-hot accumulators split
    by depth parity (``even``/``odd``) — no per-lane indexed writes, and the
    sign-alternating backup becomes pure vector arithmetic.

    Returns (parent_node, action, existing_child_or_-1, hit_terminal,
    even_mask, odd_mask, depth, edge_prior) where depth = number of recorded
    nodes (the leaf's depth) and edge_prior = the chosen edge's prior
    (materialize stores it as the new node's ``node_P``).
    """
    capacity = tree.node_N.shape[0]
    num_actions = tree.child_P.shape[-1]
    t_iota = jnp.arange(capacity, dtype=jnp.int32)
    t_iota_f = jnp.arange(capacity, dtype=jnp.float32)
    a_iota_f = jnp.arange(num_actions, dtype=jnp.float32)

    def cond(carry):
        _, _, _, _, _, stop, depth, _, _ = carry
        return ~stop & (depth < path_cap)

    def body(carry):
        cur, n_cur, _, _, _, _, depth, even, odd = carry
        cur_f = cur.astype(jnp.float32)
        pmask = tree.parent_index == cur_f  # [T] cur's children
        pb_c = jnp.log((1.0 + n_cur + c_puct_base) / c_puct_base) + c_puct_init
        # Existing children: every materialized node has N >= 1 (backup runs
        # in the same simulation that materializes it), so -Q + U over the
        # dense vectors reproduces the gathered-stats math exactly.
        u_t = pb_c * jnp.maximum(tree.node_P, 0.0) * (
            jnp.sqrt(n_cur) / (1.0 + tree.node_N))
        q_t = tree.node_W / jnp.maximum(tree.node_N, 1.0)
        score_t = -q_t + u_t  # [T]
        # One [T, A] pass: scatter child scores/ids to their action slots.
        link = pmask[:, None] & (
            tree.action_from_parent[:, None] == a_iota_f[None, :])  # [T, A]
        score_A = jnp.max(jnp.where(link, score_t[:, None], -jnp.inf), axis=0)
        child_A = jnp.max(jnp.where(link, t_iota_f[:, None], -1.0), axis=0)
        has_child = child_A >= 0.0
        p_row = _fetch_row(tree.child_P, cur)
        legal_row = p_row >= 0.0
        # Fresh actions: c_n = 0, q = 0 -> score = -0 + pb_c*p*sqrt(n)/1.
        fresh = -0.0 + pb_c * jnp.maximum(p_row, 0.0) * (jnp.sqrt(n_cur) / 1.0)
        scores = jnp.where(legal_row,
                           jnp.where(has_child, score_A, fresh), -9999.0)
        action = jnp.argmax(scores).astype(jnp.int32)

        a_oh = (jnp.arange(num_actions, dtype=jnp.int32) == action)
        child = jnp.max(jnp.where(a_oh, child_A, -1.0)).astype(jnp.int32)
        p_sel = jnp.max(jnp.where(a_oh, p_row, -jnp.inf))
        child_c = jnp.clip(child, 0, capacity - 1)
        is_new = child < 0
        is_term = ~is_new & (_fetch_elem(tree.node_done, child_c) > 0.5)
        stop = is_new | is_term
        # Record cur at this depth into the parity accumulators (dense add).
        cur_oh = (t_iota == cur).astype(jnp.float32)
        is_even = (depth % 2) == 0
        even = even + jnp.where(is_even, 1.0, 0.0) * cur_oh
        odd = odd + jnp.where(is_even, 0.0, 1.0) * cur_oh
        nxt = jnp.where(stop, cur, child_c)
        child_n = _fetch_elem(tree.node_N, child_c)
        nxt_n = jnp.where(stop, n_cur, child_n)
        return (nxt, nxt_n, action, child, p_sel, stop, depth + 1, even, odd)

    zeros_t = jnp.zeros((capacity,), jnp.float32)
    init = (jnp.int32(0), tree.node_N[0], jnp.int32(-1), jnp.int32(-1),
            jnp.float32(0.0), jnp.bool_(False), jnp.int32(0), zeros_t, zeros_t)
    cur, _, action, child, p_sel, _, depth, even, odd = jax.lax.while_loop(
        cond, body, init)
    hit_terminal = child >= 0
    return cur, action, child, hit_terminal, even, odd, depth, p_sel


# ---------------------------------------------------------------------------
# Backup: one one-hot matmul for the whole sign-alternating path
# ---------------------------------------------------------------------------


def _backup(tree: Tree, even: jnp.ndarray, odd: jnp.ndarray,
            leaf_depth: jnp.ndarray, leaf: jnp.ndarray,
            value: jnp.ndarray, act: jnp.ndarray) -> Tree:
    """Adds ``value`` (leaf player's perspective) to the leaf and alternating
    -value up the recorded path (mcts_v2.py:213-232), as dense [T] vector
    arithmetic over the parity masks; ``act`` (0/1) masks out budget-complete
    lanes.

    A node at depth j receives value * (-1)^(D - j) where D = leaf_depth;
    (-1)^(D-j) = (-1)^D * (-1)^j, and (-1)^j is +1 on the even mask, -1 on
    the odd mask. The leaf itself (depth D) receives +value.
    """
    capacity = tree.node_N.shape[0]
    leaf_oh = _oh(leaf, capacity) * act
    d_sign = jnp.where(leaf_depth % 2 == 0, 1.0, -1.0)
    path_w = value * d_sign * (even - odd)
    return tree.replace(
        node_N=tree.node_N + even + odd + leaf_oh,
        node_W=tree.node_W + path_w + value * leaf_oh,
    )


# ---------------------------------------------------------------------------
# Materialize + expand (around the batch-level step / NN eval)
# ---------------------------------------------------------------------------


def _materialize(tree: Tree, slot: jnp.ndarray, parent: jnp.ndarray,
                 action: jnp.ndarray, existing_child: jnp.ndarray,
                 hit_terminal: jnp.ndarray, active: jnp.ndarray,
                 new_node: NodeState, new_done: jnp.ndarray,
                 new_reward: jnp.ndarray, edge_prior: jnp.ndarray):
    """Writes the freshly stepped leaf into this lane's next free ``slot`` as
    dense one-hot blends (no scatters); allocates nothing when selection hit
    an existing terminal node or the lane's budget is spent.
    Returns (tree, leaf, needs_eval)."""
    capacity = tree.node_N.shape[0]
    is_new = ~hit_terminal & active & (slot < capacity)
    slot_i = jnp.clip(slot, 0, capacity - 1)
    oh_b = (_oh(slot_i, capacity) * is_new) > 0.5

    states = jax.tree.map(
        lambda arr, s: jnp.where(
            oh_b.reshape((capacity,) + (1,) * (arr.ndim - 1)), s, arr
        ),
        tree.states, new_node,
    )
    # The parent -> child link lives entirely in parent_index /
    # action_from_parent (written below); there is no children_index array
    # to update (see Tree docstring).

    tree = tree.replace(
        states=states,
        parent_index=jnp.where(oh_b, parent.astype(jnp.float32), tree.parent_index),
        action_from_parent=jnp.where(
            oh_b, action.astype(jnp.float32), tree.action_from_parent
        ),
        node_done=jnp.where(oh_b, new_done.astype(jnp.float32), tree.node_done),
        node_reward=jnp.where(oh_b, new_reward, tree.node_reward),
        node_N=jnp.where(oh_b, 0.0, tree.node_N),
        node_W=jnp.where(oh_b, 0.0, tree.node_W),
        node_P=jnp.where(oh_b, edge_prior, tree.node_P),
        num_nodes=tree.num_nodes + is_new.astype(jnp.float32),
    )
    leaf = jnp.where(is_new, slot_i, jnp.clip(existing_child, 0, capacity - 1))
    needs_eval = is_new & ~new_done
    return tree, leaf, needs_eval


def _materialize_scatter(tree: Tree, slot: jnp.ndarray, parent: jnp.ndarray,
                         action: jnp.ndarray, existing_child: jnp.ndarray,
                         hit_terminal: jnp.ndarray, active: jnp.ndarray,
                         new_node: NodeState, new_done: jnp.ndarray,
                         new_reward: jnp.ndarray, edge_prior: jnp.ndarray):
    """Batch-level scatter variant of :func:`_materialize`: the new leaf's row
    is written with native per-lane scatters (unique indices, out-of-range
    dropped) — HBM traffic is one row per lane instead of a full-tree blend.
    Lanes that hit an existing terminal node or exhausted their budget write
    nothing (their scatter index is pushed out of range)."""
    batch, capacity = tree.node_N.shape
    is_new = ~hit_terminal & active & (slot < capacity)
    slot_i = jnp.clip(slot, 0, capacity - 1)
    widx = jnp.where(is_new, slot_i, capacity)  # capacity == dropped
    bidx = jnp.arange(batch, dtype=jnp.int32)

    def put_rows(arr, rows):
        return arr.at[bidx, widx].set(rows, mode="drop", unique_indices=True)

    states = jax.tree.map(put_rows, tree.states, new_node)

    tree = tree.replace(
        states=states,
        parent_index=put_rows(tree.parent_index, parent.astype(jnp.float32)),
        action_from_parent=put_rows(
            tree.action_from_parent, action.astype(jnp.float32)
        ),
        node_done=put_rows(tree.node_done, new_done.astype(jnp.float32)),
        node_reward=put_rows(tree.node_reward, new_reward),
        node_N=put_rows(tree.node_N, jnp.zeros((batch,), jnp.float32)),
        node_W=put_rows(tree.node_W, jnp.zeros((batch,), jnp.float32)),
        node_P=put_rows(tree.node_P, edge_prior),
        num_nodes=tree.num_nodes + is_new.astype(jnp.float32),
    )
    leaf = jnp.where(is_new, slot_i, jnp.clip(existing_child, 0, capacity - 1))
    needs_eval = is_new & ~new_done
    return tree, leaf, needs_eval


def _expand_backup(tree: Tree, slot: jnp.ndarray, leaf: jnp.ndarray,
                   needs_eval: jnp.ndarray, active: jnp.ndarray,
                   even: jnp.ndarray, odd: jnp.ndarray,
                   leaf_depth: jnp.ndarray, prior: jnp.ndarray,
                   value: jnp.ndarray) -> Tree:
    """Expand evaluated leaves (priors at this lane's slot); back up NN value
    or the true terminal reward. Budget-complete lanes (``active`` false)
    change nothing.

    Terminal leaves back up ``-reward`` — the reward belongs to the player who
    *made* the terminal move, the opposite of the leaf's player to move
    (mcts_v2.py:406-411).
    """
    capacity = tree.node_N.shape[0]
    slot_i = jnp.clip(slot, 0, capacity - 1)
    oh_e = (_oh(slot_i, capacity) * needs_eval) > 0.5
    tree = tree.replace(
        child_P=jnp.where(oh_e[:, None], prior[None, :], tree.child_P),
        node_expanded=jnp.where(oh_e, True, tree.node_expanded),
    )
    act = active.astype(jnp.float32)
    term_reward = _elem(tree.node_reward, leaf)
    backup_value = jnp.where(needs_eval, value, -term_reward)
    return _backup(tree, even * act, odd * act, leaf_depth, leaf,
                   backup_value, act)


def _expand_backup_scatter(tree: Tree, slot: jnp.ndarray, leaf: jnp.ndarray,
                           needs_eval: jnp.ndarray, active: jnp.ndarray,
                           even: jnp.ndarray, odd: jnp.ndarray,
                           leaf_depth: jnp.ndarray, prior: jnp.ndarray,
                           value: jnp.ndarray) -> Tree:
    """Batch-level scatter variant of :func:`_expand_backup`: the evaluated
    leaf's prior row is scatter-written instead of blended over the whole
    [B, T, A] array. The path backup stays dense [B, T] vector arithmetic
    (semantics identical — same parity tests)."""
    batch, capacity = tree.node_N.shape
    slot_i = jnp.clip(slot, 0, capacity - 1)
    widx = jnp.where(needs_eval, slot_i, capacity)  # capacity == dropped
    bidx = jnp.arange(batch, dtype=jnp.int32)
    tree = tree.replace(
        child_P=tree.child_P.at[bidx, widx].set(
            prior, mode="drop", unique_indices=True
        ),
        node_expanded=tree.node_expanded.at[bidx, widx].set(
            True, mode="drop", unique_indices=True
        ),
    )
    act = active.astype(jnp.float32)
    term_reward = jnp.take_along_axis(
        tree.node_reward, leaf[:, None].astype(jnp.int32), axis=1
    )[:, 0]
    backup_value = jnp.where(needs_eval, value, -term_reward)
    # Dense sign-alternating path update (see _backup).
    t_iota = jnp.arange(capacity, dtype=jnp.int32)
    leaf_oh = (t_iota[None, :] == leaf[:, None]).astype(jnp.float32) * act[:, None]
    d_sign = jnp.where(leaf_depth % 2 == 0, 1.0, -1.0)
    path = (even - odd) * act[:, None]
    path_w = (backup_value * d_sign)[:, None] * path
    return tree.replace(
        node_N=tree.node_N + (even + odd) * act[:, None] + leaf_oh,
        node_W=tree.node_W + path_w + backup_value[:, None] * leaf_oh,
    )


# ---------------------------------------------------------------------------
# Subtree re-rooting (reuse across moves, mcts_v2.py:643-653)
# ---------------------------------------------------------------------------


def _descendant_mask(parent_index: jnp.ndarray, root: jnp.ndarray) -> jnp.ndarray:
    """0/1 f32[T] mask of ``root`` and all its descendants, by pointer-doubling
    over the parent chain (ceil(log2 T) rounds of one-hot matvecs — every
    lookup is an MXU product, no per-lane gathers)."""
    capacity = parent_index.shape[0]
    iota = jnp.arange(capacity, dtype=jnp.int32)
    desc = (iota == root).astype(jnp.float32)
    par = parent_index
    for _ in range(max(1, (capacity - 1).bit_length())):
        par_i = jnp.clip(par, 0.0, float(capacity - 1)).astype(jnp.int32)
        oh = (par_i[:, None] == iota[None, :]).astype(jnp.float32)
        valid = (par >= 0).astype(jnp.float32)
        desc = jnp.maximum(desc, (oh @ desc) * valid)
        # par[par[i]]: ids must stay exact (see _elem_exact).
        par = jnp.where(
            par >= 0,
            jnp.dot(oh, par, precision=jax.lax.Precision.HIGHEST),
            -1.0,
        )
    return desc


def _reroot_one(tree: Tree, move: jnp.ndarray, done: jnp.ndarray,
                new_root_state: GameState, new_root_history: jnp.ndarray,
                num_actions: int) -> Tree:
    """Promotes the chosen child's subtree to the root (one game).

    Compacts the child's descendants into slots [0, m) preserving creation
    order — since children always occupy higher slots than their parents, the
    child itself lands at slot 0. The carried N/W/P stats are untouched, the
    exact semantics of the reference's re-rooting (mcts_v2.py:643-653: N and W
    preserved, parent replaced by a DummyNode). Lanes whose game just ended,
    resigned, or whose move has no materialized child fall back to a fresh
    empty tree (uct_search then recreates the root, mcts_v2.py:364-368).
    """
    capacity = tree.node_N.shape[0]
    # Root's child for ``move``, from the parent/action vectors (the stored
    # children_index array is gone — see Tree docstring).
    link = (tree.parent_index == 0.0) & (
        tree.action_from_parent == move.astype(jnp.float32)
    )
    link_f = link.astype(jnp.float32)
    child_f = jnp.where(
        link_f.sum() > 0,
        jnp.dot(link_f, jnp.arange(capacity, dtype=jnp.float32),
                precision=jax.lax.Precision.HIGHEST),  # exact node id
        -1.0,
    )
    valid = (~done) & (move >= 0) & (child_f >= 0.0)
    child = jnp.clip(child_f, 0.0, float(capacity - 1)).astype(jnp.int32)

    desc = _descendant_mask(tree.parent_index, child)
    newidx = jnp.where(desc > 0, jnp.cumsum(desc) - 1.0, -1.0)
    m_count = desc.sum()
    jr = jnp.arange(capacity, dtype=jnp.float32)
    # Permutation-selection matrix: row j picks the old node with new index j.
    perm = ((newidx[None, :] == jr[:, None]) & (desc[None, :] > 0)).astype(jnp.float32)

    def remap(vals):
        """old node ids -> new ids (-1 stays -1, non-descendants -> -1)."""
        v = jnp.clip(vals, 0.0, float(capacity - 1)).astype(jnp.int32)
        return jnp.where(vals >= 0, newidx[v], -1.0)

    in_use = jr < m_count
    # All reroot matmuls at HIGHEST precision: this runs once per MOVE (not
    # per simulation), and several operands are float-native integers (node
    # ids, actions, visit counts) that the TPU's default bf16 f32-dot path
    # would round above 256; carrying stats (W, P) bit-exactly across moves
    # also prevents cumulative per-move quantization of the reused subtree.
    hp = functools.partial(jnp.dot, precision=jax.lax.Precision.HIGHEST)
    rerooted = Tree(
        node_N=hp(perm, tree.node_N),
        node_W=hp(perm, tree.node_W),
        node_P=hp(perm, tree.node_P),
        child_P=hp(perm, tree.child_P),
        parent_index=jnp.where(in_use, hp(perm, remap(tree.parent_index)), -1.0),
        action_from_parent=jnp.where(in_use, hp(perm, tree.action_from_parent), -1.0)
        .at[0].set(-1.0),
        node_expanded=(perm @ tree.node_expanded.astype(jnp.float32)) > 0.5,
        node_done=perm @ tree.node_done,
        node_reward=hp(perm, tree.node_reward),
        states=_matmul_state(tree.states, perm, capacity),
        root_legal=new_root_state.legal,
        root_history=new_root_history,
        num_nodes=m_count,
    )
    fresh = _make_empty_tree(new_root_state, new_root_history, capacity, num_actions)
    out = jax.tree.map(lambda a, b: jnp.where(valid, a, b), rerooted, fresh)
    # Overwrite slot 0 with the REAL post-move state: identical to the
    # compacted child state for valid lanes (same step on the same state),
    # and the fresh root otherwise — guarantees root/legal parity bit-exactly.
    states = jax.tree.map(
        lambda arr, s: arr.at[0].set(s), out.states, _node_state_of(new_root_state)
    )
    return out.replace(states=states)


def reroot_trees(trees: Tree, move: jnp.ndarray, done: jnp.ndarray,
                 new_root_states: GameState, num_actions: int) -> Tree:
    """Batched subtree promotion after the real games stepped with ``move``.

    ``new_root_states`` are the post-step (and post-auto-reset) game states;
    ``done`` marks games that finished on this move (their trees reset).
    """
    return jax.vmap(
        functools.partial(_reroot_one, num_actions=num_actions)
    )(trees, move, done, new_root_states, new_root_states.history)


# ---------------------------------------------------------------------------
# Full search
# ---------------------------------------------------------------------------


def batched_search(
    eval_fn: Callable[[jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]],
    engine,
    root_states: GameState,
    rng: jax.Array,
    num_simulations: int,
    c_puct_base: float = 19652.0,
    c_puct_init: float = 1.25,
    root_noise: bool = False,
    dirichlet_eps: float = 0.25,
    dirichlet_alpha: float = 0.03,
    prev_trees: Optional[Tree] = None,
    max_new_sims: Optional[int] = None,
    return_trees: bool = False,
):
    """Runs MCTS for a batch of games; one batched NN eval per simulation.

    ``eval_fn(obs[B, N, N, C]) -> (pi_probs[B, A], value[B])`` — softmaxed
    policy over ALL actions (illegal filtered at select, like the reference's
    eval_position, pipeline.py:91-123) and value in the current player's view.

    The visit budget follows the serial reference loop ``while root.N <
    num_simulations`` (mcts_v2.py:379): a fresh root starts at N=1 after its
    own expand+backup, so a fresh tree runs num_simulations - 1 simulations;
    with ``prev_trees`` (subtree reuse) lanes whose reused root already
    carries visits stop early (masked no-ops). ``max_new_sims`` caps the
    static simulation-loop length — below num_simulations - 1 it trades
    worst-case budget completion for wall-clock (only meaningful with reuse).

    Returns the SearchResult, plus the post-search trees when
    ``return_trees`` (feed them through ``reroot_trees`` into the next call).
    """
    capacity = num_simulations + 1
    # A path can't outgrow the tree depth nor the game length.
    path_cap = min(num_simulations + 1, engine.max_steps + 2)
    num_stack = engine.num_stack

    obs0 = jax.vmap(engine.observation)(root_states)
    prior0, value0 = eval_fn(obs0)
    # Tree nodes carry 1-deep history (just their board); observation stacks
    # are rebuilt from ancestor boards + the root's pre-search history, so
    # per-node history arrays would be pure redundant HBM traffic.
    tree_engine = engine.with_num_stack(1)
    if prev_trees is None:
        trees = make_empty_trees(engine, root_states, num_simulations)
    else:
        trees = prev_trees
    trees = jax.vmap(_init_root)(trees, prior0, value0)
    if root_noise:
        batch = value0.shape[0]
        noise_rngs = jax.random.split(rng, batch)
        trees = jax.vmap(
            functools.partial(_add_dirichlet_noise, eps=dirichlet_eps, alpha=dirichlet_alpha)
        )(trees, noise_rngs)

    if _use_pallas_select(capacity, engine.num_actions):
        from alpha_zero_tpu.ops import tree_kernels

        def select(trees):
            return tree_kernels.select_leaf_batched(
                trees.node_N, trees.node_W, trees.node_P, trees.parent_index,
                trees.action_from_parent, trees.node_done, trees.child_P,
                path_cap=path_cap, c_puct_base=c_puct_base,
                c_puct_init=c_puct_init,
                interpret=jax.default_backend() == "cpu")
    else:
        select = jax.vmap(
            functools.partial(_select_leaf, path_cap=path_cap,
                              c_puct_base=c_puct_base, c_puct_init=c_puct_init)
        )
    gather_state = (_gather_state_rows if _use_gather("state")
                    else jax.vmap(functools.partial(_gather_state, capacity=capacity)))
    materialize = (_materialize_scatter if _use_gather("materialize")
                   else jax.vmap(_materialize))
    expand_backup = (_expand_backup_scatter if _use_gather("expand")
                     else jax.vmap(_expand_backup))

    num_actions = engine.num_actions

    def sim_body(i, trees):
        active = trees.node_N[:, 0] < float(num_simulations)
        slot = trees.num_nodes.astype(jnp.int32)
        parent, action, child, hit_term, even, odd, depth, p_sel = select(trees)
        parent_nodes = gather_state(trees.states, parent)
        parent_states = _game_state_of(parent_nodes, num_actions)
        new_states = tree_engine.step_batch(parent_states, action)
        trees, leaf, needs_eval = materialize(
            trees, slot, parent, action, child, hit_term, active,
            _node_state_of(new_states), new_states.done, new_states.last_reward,
            p_sel,
        )
        history = _leaf_history_batch(trees, parent, depth, new_states.board,
                                      num_stack)
        obs = jax.vmap(engine.observation_from)(history, new_states.to_play)
        prior, value = eval_fn(obs)
        # Keep the -1 illegal sentinel in the stored prior (Tree.child_P).
        prior_sel = jnp.where(new_states.legal > 0.5, prior, -1.0)
        return expand_backup(trees, slot, leaf, needs_eval, active, even, odd,
                             depth, prior_sel, value)

    loop_len = num_simulations - 1 if max_new_sims is None else max_new_sims
    trees = jax.lax.fori_loop(0, loop_len, sim_body, trees)

    # Root child stats: per action, the visits/values of the root's child —
    # one masked one-hot contraction over the [B, T] parent/action vectors
    # (once per move, outside the hot loop).
    a_iota_f = jnp.arange(num_actions, dtype=jnp.float32)
    root_link = (
        (trees.parent_index[:, :, None] == 0.0)
        & (trees.action_from_parent[:, :, None] == a_iota_f[None, None, :])
    ).astype(jnp.float32)  # [B, T, A]
    # HIGHEST: counts above 256 and f32 W sums must survive exactly (the
    # default TPU f32-dot path rounds operands to bf16).
    child_n = jnp.einsum("bta,bt->ba", root_link, trees.node_N,
                         precision=jax.lax.Precision.HIGHEST)
    child_w = jnp.einsum("bta,bt->ba", root_link, trees.node_W,
                         precision=jax.lax.Precision.HIGHEST)
    result = SearchResult(
        child_N=child_n,
        child_W=child_w,
        root_Q=trees.node_W[:, 0] / jnp.maximum(trees.node_N[:, 0], 1.0),
        legal=trees.root_legal,
    )
    if return_trees:
        return result, trees
    return result


# ---------------------------------------------------------------------------
# Policy / move extraction
# ---------------------------------------------------------------------------


def _temp_exponent(temperature: float) -> float:
    """The reference's overflow-safe exponent clamp: clip(1/temp, 1, 5)
    (generate_search_policy, mcts_v2.py:286-289)."""
    if not 0.0 < temperature <= 1.0:
        raise ValueError(
            f"Expect temperature in (0.0, 1.0], got {temperature}"
        )
    return max(1.0, min(5.0, 1.0 / temperature))


def policy_from_counts(child_N: jnp.ndarray, legal: jnp.ndarray,
                       warm_up: jnp.ndarray,
                       warm_up_temperature: float = 1.0,
                       temperature: float = 0.1) -> jnp.ndarray:
    """Visit-count policy (generate_search_policy, mcts_v2.py:265-298):
    ``warm_up_temperature`` during warm-up (reference uses 1.0),
    ``temperature`` after (reference 0.1), exponent = clip(1/temp, 1, 5).
    ``warm_up`` is a per-game bool [B]."""
    counts = child_N * legal
    exponent = jnp.where(
        warm_up, _temp_exponent(warm_up_temperature), _temp_exponent(temperature)
    )[:, None]
    powered = counts ** exponent
    total = powered.sum(axis=-1, keepdims=True)
    return jnp.where(total > 0, powered / jnp.maximum(total, 1e-9), powered)


def sample_move(
    rng: jax.Array,
    search_pi: jnp.ndarray,
    legal: jnp.ndarray,
    child_N: jnp.ndarray,
    warm_up: jnp.ndarray,
    pass_move: int | None,
    deterministic: bool,
) -> jnp.ndarray:
    """Picks the move: argmax of visits when deterministic (mcts_v2.py:634-636),
    else samples from the search policy, excluding pass during warm-up
    (the reference resamples until a non-pass legal move, mcts_v2.py:638-641 —
    equivalent to the renormalized conditional distribution)."""
    if deterministic:
        return jnp.argmax(child_N, axis=-1).astype(jnp.int32)

    probs = search_pi * legal
    if pass_move is not None:
        ban_pass = warm_up[:, None] & (
            jnp.arange(probs.shape[-1]) == pass_move
        )
        probs = jnp.where(ban_pass, 0.0, probs)
    # Degenerate fallback (all mass banned): uniform over remaining legal moves.
    total = probs.sum(axis=-1, keepdims=True)
    fallback = legal.astype(jnp.float32)
    if pass_move is not None:
        fallback = jnp.where(
            warm_up[:, None] & (jnp.arange(probs.shape[-1]) == pass_move)
            & (legal.sum(-1, keepdims=True) > 1),
            0.0, fallback,
        )
    probs = jnp.where(total > 0, probs, fallback)
    logits = jnp.log(jnp.maximum(probs, 1e-30))
    return jax.random.categorical(rng, logits, axis=-1).astype(jnp.int32)


def best_child_q(child_N: jnp.ndarray, child_W: jnp.ndarray,
                 move: jnp.ndarray) -> jnp.ndarray:
    """-Q of the selected child, 0 when unvisited (mcts_v2.py:643-653)."""
    idx = move[:, None]
    n = jnp.take_along_axis(child_N, idx, axis=-1)[:, 0]
    w = jnp.take_along_axis(child_W, idx, axis=-1)[:, 0]
    return jnp.where(n > 0, -(w / jnp.maximum(n, 1.0)), 0.0)
