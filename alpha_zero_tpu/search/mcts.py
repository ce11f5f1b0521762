"""Batched on-device MCTS over fixed-capacity array trees.

A TPU-first redesign of the reference search (`alpha_zero/core/mcts_v2.py`):
instead of Python ``Node`` objects with on-demand children and
``copy.deepcopy(env)`` per simulation (mcts_v2.py:56-140, :579), the whole
search state is a structure-of-arrays pytree with a leading batch dimension:

- per-node child statistics ``child_N/child_W/child_P [T, A]`` stored at the
  parent, exactly the reference's parent-layout (mcts_v2.py:111-135) with the
  root's own N/W as scalars standing in for its ``DummyNode`` (:56-62);
- game states (with their cached legality/group analysis) stored per node, so
  selection walks the tree without re-stepping the environment — one batched
  engine step per simulation, only to create the new leaf;
- one neural-net evaluation per simulation, batched over *all games*. This
  replaces the reference's virtual-loss tree parallelism (mcts_v2.py:453-482,
  :568-625): the whole batch advances synchronously, one leaf per game per
  simulation, so virtual loss is unnecessary — NN batching comes from the
  game batch (thousands of games) instead of 8 intra-tree leaves. Search
  semantics otherwise match the *serial* ``uct_search`` (mcts_v2.py:301-450):
  PUCT with sign-flipped child Q, terminal-state backup with the true reward,
  Dirichlet root noise, temperature with exponent clamped to [1, 5].

Each simulation is three phases — select/step/materialize are per-game
functions under ``vmap``; the engine step and the NN evaluation sit between
them at the top level of a ``lax.fori_loop``, so terminal scoring and the
forward pass run once per batch, not per game.

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

    T = num_simulations + 1 node slots; node 0 is the root. Legal masks live
    in ``states.legal``.
    """

    child_N: jnp.ndarray         # f32[T, A] edge visit counts
    child_W: jnp.ndarray         # f32[T, A] edge total values (child-player view)
    child_P: jnp.ndarray         # f32[T, A] edge priors
    children_index: jnp.ndarray  # i32[T, A]; node id of child, -1 unmaterialized
    parent_index: jnp.ndarray    # i32[T]; -1 for root
    action_from_parent: jnp.ndarray  # i32[T]
    node_expanded: jnp.ndarray   # bool[T]; has priors (terminal nodes never do)
    node_done: jnp.ndarray       # bool[T]; game over at this node
    node_reward: jnp.ndarray     # f32[T]; reward emitted by the creating step
    states: GameState            # stacked [T, ...] game states
    root_N: jnp.ndarray          # f32 scalar (the DummyNode's child_N entry)
    root_W: jnp.ndarray          # f32 scalar
    next_free: jnp.ndarray       # i32 scalar; next unallocated node slot


class SearchResult(NamedTuple):
    """Root statistics after the simulation budget is spent."""

    child_N: jnp.ndarray   # [B, A] root child visit counts
    child_W: jnp.ndarray   # [B, A] root child total values
    root_Q: jnp.ndarray    # [B] root mean value (root player's perspective)
    legal: jnp.ndarray     # [B, A] root legal mask


# ---------------------------------------------------------------------------
# Tree construction
# ---------------------------------------------------------------------------


def _make_tree(root_state: GameState, prior: jnp.ndarray, value: jnp.ndarray,
               capacity: int, num_actions: int) -> Tree:
    """Root node expanded with ``prior`` and backed up with ``value``
    (mcts_v2.py:363-368: expand + backup give the fresh root N=1, W=v)."""
    zeros_ta = jnp.zeros((capacity, num_actions), jnp.float32)
    states = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (capacity,) + x.shape), root_state
    )
    return Tree(
        child_N=zeros_ta,
        child_W=zeros_ta,
        child_P=zeros_ta.at[0].set(prior),
        children_index=jnp.full((capacity, num_actions), -1, jnp.int32),
        parent_index=jnp.full((capacity,), -1, jnp.int32),
        action_from_parent=jnp.full((capacity,), -1, jnp.int32),
        node_expanded=jnp.zeros((capacity,), jnp.bool_).at[0].set(True),
        node_done=jnp.zeros((capacity,), jnp.bool_),
        node_reward=jnp.zeros((capacity,), jnp.float32),
        states=states,
        root_N=jnp.float32(1.0),
        root_W=value.astype(jnp.float32),
        next_free=jnp.int32(1),
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
# Selection
# ---------------------------------------------------------------------------


def _puct_scores(tree: Tree, node: jnp.ndarray, node_visits: jnp.ndarray,
                 c_puct_base: float, c_puct_init: float) -> jnp.ndarray:
    """-Q + U over the node's children (mcts_v2.py:99-109, 142-186)."""
    c_n = tree.child_N[node]
    c_w = tree.child_W[node]
    c_p = tree.child_P[node]
    pb_c = jnp.log((1.0 + node_visits + c_puct_base) / c_puct_base) + c_puct_init
    u = pb_c * c_p * (jnp.sqrt(node_visits) / (1.0 + c_n))
    q = c_w / jnp.maximum(c_n, 1.0)
    scores = -q + u
    return jnp.where(tree.states.legal[node], scores, -9999.0)


def _select_leaf(tree: Tree, c_puct_base: float, c_puct_init: float,
                 max_depth: int):
    """Descends by PUCT until an unmaterialized edge or a terminal node.

    Returns (parent_node, action, existing_child_or_-1, hit_terminal,
    parent_state)."""

    def cond(carry):
        _, _, _, _, stop, depth = carry
        return ~stop & (depth < max_depth)

    def body(carry):
        cur, n_cur, _, _, _, depth = carry
        scores = _puct_scores(tree, cur, n_cur, c_puct_base, c_puct_init)
        action = jnp.argmax(scores).astype(jnp.int32)
        child = tree.children_index[cur, action]
        is_new = child < 0
        child_c = jnp.clip(child, 0, tree.parent_index.shape[0] - 1)
        is_term = ~is_new & tree.node_done[child_c]
        stop = is_new | is_term
        nxt = jnp.where(stop, cur, child_c)
        nxt_n = jnp.where(stop, n_cur, tree.child_N[cur, action])
        return (nxt, nxt_n, action, child, stop, depth + 1)

    init = (jnp.int32(0), tree.root_N, jnp.int32(-1), jnp.int32(-1),
            jnp.bool_(False), jnp.int32(0))
    cur, _, action, child, _, _ = jax.lax.while_loop(cond, body, init)
    is_term = child >= 0
    parent_state = jax.tree.map(lambda x: x[cur], tree.states)
    return cur, action, child, is_term, parent_state


# ---------------------------------------------------------------------------
# Backup
# ---------------------------------------------------------------------------


def _backup(tree: Tree, leaf: jnp.ndarray, value: jnp.ndarray) -> Tree:
    """Adds ``value`` (leaf player's perspective) up the path, flipping sign
    per level (mcts_v2.py:213-232); the root's stats live in the scalars."""

    def cond(carry):
        node, *_ = carry
        return node >= 0

    def body(carry):
        node, v, c_n, c_w, r_n, r_w = carry
        p = tree.parent_index[node]
        a = tree.action_from_parent[node]
        has_parent = p >= 0
        pc = jnp.clip(p, 0, tree.parent_index.shape[0] - 1)
        ac = jnp.clip(a, 0, tree.child_N.shape[1] - 1)
        inc = jnp.where(has_parent, 1.0, 0.0)
        c_n = c_n.at[pc, ac].add(inc)
        c_w = c_w.at[pc, ac].add(jnp.where(has_parent, v, 0.0))
        r_n = r_n + (1.0 - inc)
        r_w = r_w + jnp.where(has_parent, 0.0, v)
        return (p, -v, c_n, c_w, r_n, r_w)

    _, _, c_n, c_w, r_n, r_w = jax.lax.while_loop(
        cond, body, (leaf, value, tree.child_N, tree.child_W, tree.root_N, tree.root_W)
    )
    return tree.replace(child_N=c_n, child_W=c_w, root_N=r_n, root_W=r_w)


# ---------------------------------------------------------------------------
# Materialize + expand + backup (around the batch-level step / NN eval)
# ---------------------------------------------------------------------------


def _materialize(engine, tree: Tree, parent: jnp.ndarray, action: jnp.ndarray,
                 existing_child: jnp.ndarray, hit_terminal: jnp.ndarray,
                 new_state: GameState):
    """Writes the freshly stepped leaf into the tree (masked no-op when the
    selection hit an existing terminal node); returns (tree, leaf, needs_eval,
    leaf_obs)."""
    cap = tree.parent_index.shape[0]
    slot = jnp.clip(tree.next_free, 0, cap - 1)
    is_new = ~hit_terminal

    states = jax.tree.map(
        lambda arr, s: arr.at[slot].set(jnp.where(is_new, s, arr[slot])),
        tree.states, new_state,
    )
    tree = tree.replace(
        states=states,
        parent_index=tree.parent_index.at[slot].set(
            jnp.where(is_new, parent, tree.parent_index[slot])
        ),
        action_from_parent=tree.action_from_parent.at[slot].set(
            jnp.where(is_new, action, tree.action_from_parent[slot])
        ),
        node_done=tree.node_done.at[slot].set(
            jnp.where(is_new, new_state.done, tree.node_done[slot])
        ),
        node_reward=tree.node_reward.at[slot].set(
            jnp.where(is_new, new_state.last_reward, tree.node_reward[slot])
        ),
        children_index=tree.children_index.at[parent, action].set(
            jnp.where(is_new, slot, tree.children_index[parent, action])
        ),
        next_free=tree.next_free + jnp.where(is_new, 1, 0),
    )

    leaf = jnp.where(is_new, slot, jnp.clip(existing_child, 0, cap - 1))
    leaf_state = jax.tree.map(lambda x: x[leaf], tree.states)
    needs_eval = is_new & ~new_state.done
    obs = engine.observation(leaf_state)
    return tree, leaf, needs_eval, obs


def _expand_backup(tree: Tree, leaf: jnp.ndarray, needs_eval: jnp.ndarray,
                   prior: jnp.ndarray, value: jnp.ndarray) -> Tree:
    """Expand evaluated leaves; back up NN value or true terminal reward.

    Terminal leaves back up ``-reward`` — the reward belongs to the player who
    *made* the terminal move, the opposite of the leaf's player to move
    (mcts_v2.py:406-411).
    """
    tree = tree.replace(
        child_P=tree.child_P.at[leaf].set(
            jnp.where(needs_eval, prior, tree.child_P[leaf])
        ),
        node_expanded=tree.node_expanded.at[leaf].set(
            jnp.where(needs_eval, True, tree.node_expanded[leaf])
        ),
    )
    backup_value = jnp.where(needs_eval, value, -tree.node_reward[leaf])
    return _backup(tree, leaf, backup_value)


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
    max_depth = num_simulations + 1

    obs0 = jax.vmap(engine.observation)(root_states)
    prior0, value0 = eval_fn(obs0)
    trees = jax.vmap(
        functools.partial(_make_tree, capacity=capacity, num_actions=engine.num_actions)
    )(root_states, prior0, value0)
    if root_noise:
        batch = value0.shape[0]
        noise_rngs = jax.random.split(rng, batch)
        trees = jax.vmap(
            functools.partial(_add_dirichlet_noise, eps=dirichlet_eps, alpha=dirichlet_alpha)
        )(trees, noise_rngs)

    select = jax.vmap(
        functools.partial(_select_leaf, c_puct_base=c_puct_base,
                          c_puct_init=c_puct_init, max_depth=max_depth)
    )
    materialize = jax.vmap(functools.partial(_materialize, engine))
    expand_backup = jax.vmap(_expand_backup)

    def sim_body(_, trees):
        parent, action, child, hit_term, parent_states = select(trees)
        new_states = engine.step_batch(parent_states, action)
        trees, leaf, needs_eval, obs = materialize(
            trees, parent, action, child, hit_term, new_states
        )
        prior, value = eval_fn(obs)
        return expand_backup(trees, leaf, needs_eval, prior, value)

    trees = jax.lax.fori_loop(0, num_simulations - 1, sim_body, trees)

    return SearchResult(
        child_N=trees.child_N[:, 0],
        child_W=trees.child_W[:, 0],
        root_Q=trees.root_W / jnp.maximum(trees.root_N, 1.0),
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
