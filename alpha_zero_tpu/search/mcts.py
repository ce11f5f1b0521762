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
- **lockstep slot allocation**: simulation ``i`` always materializes into
  slot ``i+1`` (a batch-uniform index), wasting the slot when selection hit
  an existing terminal node — uniform-index writes are dynamic-update-slices,
  per-lane writes would be scatters.
- one neural-net evaluation per simulation, batched over all games. This
  replaces the reference's virtual-loss tree parallelism (mcts_v2.py:453-482,
  :568-625): the whole batch advances synchronously, one leaf per game per
  simulation, so virtual loss is unnecessary — NN batching comes from the
  game batch (thousands of games) instead of 8 intra-tree leaves.

Search semantics match the *serial* ``uct_search`` (mcts_v2.py:301-450)
exactly: PUCT with sign-flipped child Q, terminal-state backup with the true
reward, Dirichlet root noise, temperature with the [1, 5] exponent clamp —
verified visit-for-visit against the reference in tests.

Subtree reuse across moves (mcts_v2.py:643-653) is intentionally not
implemented: each move starts a fresh tree (documented deviation; the
reference's reuse re-roots a Python object graph, which has no cheap
fixed-shape equivalent — measured Elo impact is the criterion for revisiting).
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from alpha_zero_tpu.envs.types import GameState


@struct.dataclass
class Tree:
    """Fixed-capacity search tree for ONE game (batch via leading vmap dim).

    T = num_simulations + 1 node slots; node 0 is the root; simulation i
    materializes into slot i + 1.
    """

    node_N: jnp.ndarray          # f32[T] visits of the edge into each node
    node_W: jnp.ndarray          # f32[T] value sum (node-player perspective)
    child_P: jnp.ndarray         # f32[T, A] child priors per node
    children_index: jnp.ndarray  # f32[T, A]; node id of child, -1 unmaterialized
    #                              (float-native: exact small ints, avoids
    #                               whole-array converts in the select loop)
    parent_index: jnp.ndarray    # f32[T]; -1 for root (float-native index)
    action_from_parent: jnp.ndarray  # f32[T]
    node_expanded: jnp.ndarray   # bool[T]; has priors (terminal nodes never do)
    node_done: jnp.ndarray       # f32[T]; 1.0 when game over at this node
    node_reward: jnp.ndarray     # f32[T]; reward emitted by the creating step
    states: GameState            # stacked [T, ...] game states (1-deep history:
    #                              observation stacks are rebuilt from ancestor
    #                              boards + root_history, so per-node history
    #                              would be redundant traffic)
    root_history: jnp.ndarray    # s8[S, N, N]; the root's pre-search history


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


def _row(matrix: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """matrix[idx] for f32 [T, A] via one-hot matvec."""
    return _oh(idx, matrix.shape[0]) @ matrix


def _elem(vec: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """vec[idx] (f32) via one-hot dot; 0 when idx out of range."""
    return _oh(idx, vec.shape[0]) @ vec


def _gather_by_index_vector(vec: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """vec[idx[k]] for an index vector -> [K] via one-hot matmul; entries with
    idx out of [0, len(vec)) read 0."""
    size = vec.shape[0]
    oh = (idx[:, None] == jnp.arange(size, dtype=jnp.int32)[None, :]).astype(jnp.float32)
    return oh @ vec


def _gather_state(states: GameState, idx: jnp.ndarray, capacity: int) -> GameState:
    """states[idx] via one-hot matmuls (exact for small-int payloads).

    int8 leaves (board, history — the bulk of the state) use an s8 x s8 MXU
    product so the big buffers are never converted to f32; float leaves
    multiply directly. Only tiny scalar-per-node leaves pay a convert.
    """
    oh_f = _oh(idx, capacity)
    oh_s8 = oh_f.astype(jnp.int8)

    def g(leaf):
        flat = leaf.reshape(capacity, -1)
        if leaf.dtype == jnp.int8:
            out = jax.lax.dot_general(
                oh_s8, flat, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.int8)
        elif leaf.dtype == jnp.float32:
            out = oh_f @ flat
        else:
            out = (oh_f @ flat.astype(jnp.float32)).astype(leaf.dtype)
        return out.reshape(leaf.shape[1:])

    return jax.tree.map(g, states)


def _leaf_history(tree: Tree, parent: jnp.ndarray, depth: jnp.ndarray,
                  new_board: jnp.ndarray, num_stack: int) -> jnp.ndarray:
    """Rebuilds the leaf's [S, N, N] board history (latest first) from the
    tree: plane 0 is the leaf's own board; planes 1..S-1 come from ancestor
    boards (walked via parent pointers) while they exist, then from the
    root's pre-search history. All fetches are one-hot matvecs.

    The leaf sits at depth ``depth``; ancestor hop k reaches depth-k, so
    plane k uses the tree for k <= depth and root_history[k - depth] beyond.
    """
    if num_stack == 1:
        return new_board[None]
    capacity = tree.node_N.shape[0]
    n = new_board.shape[-1]
    boards_f = tree.states.board.reshape(capacity, -1).astype(jnp.float32)
    s_iota = jnp.arange(num_stack, dtype=jnp.float32)

    planes = [new_board]
    walk = parent.astype(jnp.float32)
    for k in range(1, num_stack):
        from_tree = (
            (_oh(walk.astype(jnp.int32), capacity) @ boards_f)
            .reshape(n, n).astype(jnp.int8)
        )
        rh_idx = jnp.clip(k - depth, 0, num_stack - 1).astype(jnp.float32)
        oh_s = (s_iota == rh_idx).astype(jnp.float32)
        from_root = (
            (oh_s @ tree.root_history.reshape(num_stack, -1).astype(jnp.float32))
            .reshape(n, n).astype(jnp.int8)
        )
        planes.append(jnp.where(k <= depth, from_tree, from_root))
        walk = _elem(tree.parent_index, walk.astype(jnp.int32))
    return jnp.stack(planes)


# ---------------------------------------------------------------------------
# Tree construction
# ---------------------------------------------------------------------------


def _make_tree(root_state: GameState, root_history: jnp.ndarray,
               prior: jnp.ndarray, value: jnp.ndarray,
               capacity: int, num_actions: int) -> Tree:
    """Root node expanded with ``prior`` and backed up with ``value``
    (mcts_v2.py:363-368: expand + backup give the fresh root N=1, W=v)."""
    states = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (capacity,) + x.shape), root_state
    )
    return Tree(
        node_N=jnp.zeros((capacity,), jnp.float32).at[0].set(1.0),
        node_W=jnp.zeros((capacity,), jnp.float32).at[0].set(value),
        child_P=jnp.zeros((capacity, num_actions), jnp.float32).at[0].set(prior),
        children_index=jnp.full((capacity, num_actions), -1.0, jnp.float32),
        parent_index=jnp.full((capacity,), -1.0, jnp.float32),
        action_from_parent=jnp.full((capacity,), -1.0, jnp.float32),
        node_expanded=jnp.zeros((capacity,), jnp.bool_).at[0].set(True),
        node_done=jnp.zeros((capacity,), jnp.float32),
        node_reward=jnp.zeros((capacity,), jnp.float32),
        states=states,
        root_history=root_history,
    )


def _add_dirichlet_noise(tree: Tree, rng: jax.Array, eps: float, alpha: float) -> Tree:
    """Root exploration noise (mcts_v2.py:235-262): noise sampled over the
    full action space, masked by legality, NOT renormalized — exact parity."""
    num_actions = tree.child_P.shape[-1]
    noise = jax.random.dirichlet(rng, jnp.full((num_actions,), alpha, jnp.float32))
    noise = noise * tree.states.legal[0]
    new_p = tree.child_P[0] * (1.0 - eps) + noise * eps
    return tree.replace(child_P=tree.child_P.at[0].set(new_p))


# ---------------------------------------------------------------------------
# Selection (records the path for the matmul backup)
# ---------------------------------------------------------------------------


def _select_leaf(tree: Tree, path_cap: int, c_puct_base: float,
                 c_puct_init: float):
    """Descends by PUCT until an unmaterialized edge or a terminal node.

    The visited path is recorded as two dense [T] one-hot accumulators split
    by depth parity (``even``/``odd``) — no per-lane indexed writes, and the
    sign-alternating backup becomes pure vector arithmetic.

    Returns (parent_node, action, existing_child_or_-1, hit_terminal,
    even_mask, odd_mask, depth) where depth = number of recorded nodes (the
    leaf's depth).
    """
    capacity = tree.node_N.shape[0]

    def cond(carry):
        _, _, _, _, stop, depth, _, _ = carry
        return ~stop & (depth < path_cap)

    def body(carry):
        cur, n_cur, _, _, _, depth, even, odd = carry
        # PUCT over cur's children (mcts_v2.py:99-109, 142-186).
        ci_row = _row(tree.children_index, cur)  # f32 child ids, -1 = none
        p_row = _row(tree.child_P, cur)
        legal_row = _row(tree.states.legal, cur) > 0.5
        c_n = jnp.where(ci_row >= 0, _gather_by_index_vector(tree.node_N, ci_row), 0.0)
        c_w = jnp.where(ci_row >= 0, _gather_by_index_vector(tree.node_W, ci_row), 0.0)

        pb_c = jnp.log((1.0 + n_cur + c_puct_base) / c_puct_base) + c_puct_init
        u = pb_c * p_row * (jnp.sqrt(n_cur) / (1.0 + c_n))
        q = c_w / jnp.maximum(c_n, 1.0)
        scores = jnp.where(legal_row, -q + u, -9999.0)
        action = jnp.argmax(scores).astype(jnp.int32)

        child = (_oh(action, scores.shape[0]) @ ci_row).astype(jnp.int32)
        is_new = child < 0
        is_term = ~is_new & (_elem(tree.node_done,
                                   jnp.clip(child, 0, capacity - 1)) > 0.5)
        stop = is_new | is_term
        # Record cur at this depth into the parity accumulators (dense add).
        cur_oh = _oh(cur, capacity)
        is_even = (depth % 2) == 0
        even = even + jnp.where(is_even, 1.0, 0.0) * cur_oh
        odd = odd + jnp.where(is_even, 0.0, 1.0) * cur_oh
        nxt = jnp.where(stop, cur, jnp.clip(child, 0, capacity - 1))
        child_n = _elem(tree.node_N, jnp.clip(child, 0, capacity - 1))
        nxt_n = jnp.where(stop, n_cur, child_n)
        return (nxt, nxt_n, action, child, stop, depth + 1, even, odd)

    zeros_t = jnp.zeros((capacity,), jnp.float32)
    init = (jnp.int32(0), tree.node_N[0], jnp.int32(-1), jnp.int32(-1),
            jnp.bool_(False), jnp.int32(0), zeros_t, zeros_t)
    cur, _, action, child, _, depth, even, odd = jax.lax.while_loop(cond, body, init)
    hit_terminal = child >= 0
    return cur, action, child, hit_terminal, even, odd, depth


# ---------------------------------------------------------------------------
# Backup: one one-hot matmul for the whole sign-alternating path
# ---------------------------------------------------------------------------


def _backup(tree: Tree, even: jnp.ndarray, odd: jnp.ndarray,
            leaf_depth: jnp.ndarray, leaf: jnp.ndarray,
            value: jnp.ndarray) -> Tree:
    """Adds ``value`` (leaf player's perspective) to the leaf and alternating
    -value up the recorded path (mcts_v2.py:213-232), as dense [T] vector
    arithmetic over the parity masks.

    A node at depth j receives value * (-1)^(D - j) where D = leaf_depth;
    (-1)^(D-j) = (-1)^D * (-1)^j, and (-1)^j is +1 on the even mask, -1 on
    the odd mask. The leaf itself (depth D) receives +value.
    """
    capacity = tree.node_N.shape[0]
    leaf_oh = _oh(leaf, capacity)
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
                 hit_terminal: jnp.ndarray, new_state: GameState):
    """Writes the freshly stepped leaf into (batch-uniform) ``slot``; when the
    selection hit an existing terminal node the slot is written but never
    linked. Returns (tree, leaf, needs_eval)."""
    capacity = tree.node_N.shape[0]
    num_actions = tree.child_P.shape[-1]
    is_new = ~hit_terminal

    states = jax.tree.map(
        lambda arr, s: arr.at[slot].set(s), tree.states, new_state
    )
    # Link parent -> slot via a one-hot outer-product blend (per-lane (row,
    # col) scatter would serialize).
    link = (_oh(parent, capacity)[:, None] * _oh(action, num_actions)[None, :]) > 0.5
    children_index = jnp.where(
        link & is_new, jnp.float32(slot), tree.children_index
    )

    tree = tree.replace(
        states=states,
        parent_index=tree.parent_index.at[slot].set(parent.astype(jnp.float32)),
        action_from_parent=tree.action_from_parent.at[slot].set(
            action.astype(jnp.float32)
        ),
        node_done=tree.node_done.at[slot].set(new_state.done.astype(jnp.float32)),
        node_reward=tree.node_reward.at[slot].set(new_state.last_reward),
        node_N=tree.node_N.at[slot].set(0.0),
        node_W=tree.node_W.at[slot].set(0.0),
        children_index=children_index,
    )
    leaf = jnp.where(is_new, slot, jnp.clip(existing_child, 0, capacity - 1))
    needs_eval = is_new & ~new_state.done
    return tree, leaf, needs_eval


def _expand_backup(tree: Tree, slot: jnp.ndarray, leaf: jnp.ndarray,
                   needs_eval: jnp.ndarray, even: jnp.ndarray,
                   odd: jnp.ndarray, leaf_depth: jnp.ndarray,
                   prior: jnp.ndarray, value: jnp.ndarray) -> Tree:
    """Expand evaluated leaves (priors at the uniform slot); back up NN value
    or the true terminal reward.

    Terminal leaves back up ``-reward`` — the reward belongs to the player who
    *made* the terminal move, the opposite of the leaf's player to move
    (mcts_v2.py:406-411).
    """
    tree = tree.replace(
        child_P=tree.child_P.at[slot].set(
            jnp.where(needs_eval, prior, tree.child_P[slot])
        ),
        node_expanded=tree.node_expanded.at[slot].set(
            jnp.where(needs_eval, True, tree.node_expanded[slot])
        ),
    )
    term_reward = _elem(tree.node_reward, leaf)
    backup_value = jnp.where(needs_eval, value, -term_reward)
    return _backup(tree, even, odd, leaf_depth, leaf, backup_value)


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
) -> SearchResult:
    """Runs MCTS for a batch of games; one batched NN eval per simulation.

    ``eval_fn(obs[B, N, N, C]) -> (pi_probs[B, A], value[B])`` — softmaxed
    policy over ALL actions (illegal filtered at select, like the reference's
    eval_position, pipeline.py:91-123) and value in the current player's view.

    Total simulations including the root evaluation equal ``num_simulations``
    (the serial reference loops while root.N < num_simulations; root starts
    at N=1 after its own expand+backup, mcts_v2.py:363-378).
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
    root_trimmed = root_states.replace(history=root_states.history[:, :1])
    trees = jax.vmap(
        functools.partial(_make_tree, capacity=capacity, num_actions=engine.num_actions)
    )(root_trimmed, root_states.history, prior0, value0)
    if root_noise:
        batch = value0.shape[0]
        noise_rngs = jax.random.split(rng, batch)
        trees = jax.vmap(
            functools.partial(_add_dirichlet_noise, eps=dirichlet_eps, alpha=dirichlet_alpha)
        )(trees, noise_rngs)

    select = jax.vmap(
        functools.partial(_select_leaf, path_cap=path_cap,
                          c_puct_base=c_puct_base, c_puct_init=c_puct_init)
    )
    gather_state = jax.vmap(functools.partial(_gather_state, capacity=capacity))
    materialize = jax.vmap(_materialize, in_axes=(0, None, 0, 0, 0, 0, 0))
    expand_backup = jax.vmap(_expand_backup, in_axes=(0, None, 0, 0, 0, 0, 0, 0, 0))

    leaf_hist = jax.vmap(
        functools.partial(_leaf_history, num_stack=num_stack)
    )

    def sim_body(i, trees):
        slot = i + 1  # lockstep slot allocation (batch-uniform index)
        parent, action, child, hit_term, even, odd, depth = select(trees)
        parent_states = gather_state(trees.states, parent)
        new_states = tree_engine.step_batch(parent_states, action)
        trees, leaf, needs_eval = materialize(
            trees, slot, parent, action, child, hit_term, new_states
        )
        history = leaf_hist(trees, parent, depth, new_states.board)
        obs = jax.vmap(engine.observation_from)(history, new_states.to_play)
        prior, value = eval_fn(obs)
        return expand_backup(trees, slot, leaf, needs_eval, even, odd, depth,
                             prior, value)

    trees = jax.lax.fori_loop(0, num_simulations - 1, sim_body, trees)

    # Root child stats: visits/values of the root's children, action-indexed
    # (one plain gather outside the hot loop is fine).
    root_children = trees.children_index[:, 0, :].astype(jnp.int32)
    safe = jnp.clip(root_children, 0, capacity - 1)
    child_n = jnp.where(
        root_children >= 0, jnp.take_along_axis(trees.node_N, safe, axis=1), 0.0
    )
    child_w = jnp.where(
        root_children >= 0, jnp.take_along_axis(trees.node_W, safe, axis=1), 0.0
    )
    return SearchResult(
        child_N=child_n,
        child_W=child_w,
        root_Q=trees.node_W[:, 0] / jnp.maximum(trees.node_N[:, 0], 1.0),
        legal=trees.states.legal[:, 0],
    )


# ---------------------------------------------------------------------------
# Policy / move extraction
# ---------------------------------------------------------------------------


def policy_from_counts(child_N: jnp.ndarray, legal: jnp.ndarray,
                       warm_up: jnp.ndarray) -> jnp.ndarray:
    """Visit-count policy with the reference's exponent clamp
    (generate_search_policy, mcts_v2.py:265-298): temperature 1.0 during
    warm-up, 0.1 after, exponent = clip(1/temp, 1, 5). ``warm_up`` is a
    per-game bool [B]."""
    counts = child_N * legal
    exponent = jnp.where(warm_up, 1.0, 5.0)[:, None]
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
