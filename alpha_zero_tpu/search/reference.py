"""Self-contained object-tree MCTS — the CPU correctness oracle.

Fills the role of the reference's ``mcts_v1``/serial ``mcts_v2``
(`alpha_zero/core/mcts_v1.py:47-419`, `mcts_v2.py:301-450`) as a slow,
obviously-correct implementation for cross-checking the batched device search
in tests and debugging — per SURVEY.md §2 #5 ("kept only as a CPU oracle").
It operates on the host wrappers (GoEnv/GomokuEnv) or directly on engine
states, mirrors the PUCT/backup/temperature semantics exactly, and is NOT a
production code path.
"""

from __future__ import annotations

import math
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from alpha_zero_tpu.envs.types import jitted


class Node:
    """One search-tree node; child stats stored at the parent (minigo layout)."""

    __slots__ = ("to_play", "move", "parent", "num_actions", "is_expanded",
                 "child_W", "child_N", "child_P", "children")

    def __init__(self, to_play: int, num_actions: int, move: Optional[int] = None,
                 parent=None) -> None:
        self.to_play = to_play
        self.move = move
        self.parent = parent
        self.num_actions = num_actions
        self.is_expanded = False
        self.child_W = np.zeros(num_actions, dtype=np.float32)
        self.child_N = np.zeros(num_actions, dtype=np.float32)
        self.child_P = np.zeros(num_actions, dtype=np.float32)
        self.children: Dict[int, "Node"] = {}

    @property
    def N(self) -> float:
        return self.parent.child_N[self.move]

    @N.setter
    def N(self, value) -> None:
        self.parent.child_N[self.move] = value

    @property
    def W(self) -> float:
        return self.parent.child_W[self.move]

    @W.setter
    def W(self, value) -> None:
        self.parent.child_W[self.move] = value

    def child_U(self, c_puct_base: float, c_puct_init: float) -> np.ndarray:
        pb_c = math.log((1 + self.N + c_puct_base) / c_puct_base) + c_puct_init
        return pb_c * self.child_P * (math.sqrt(self.N) / (1 + self.child_N))

    def child_Q(self) -> np.ndarray:
        child_n = np.where(self.child_N > 0, self.child_N, 1)
        return self.child_W / child_n


class DummyNode:
    def __init__(self) -> None:
        self.parent = None
        self.child_W = __import__("collections").defaultdict(float)
        self.child_N = __import__("collections").defaultdict(float)


def backup(node: Node, value: float) -> None:
    while isinstance(node, Node):
        node.N += 1
        node.W += value
        node = node.parent
        value = -value


def oracle_search(
    engine,
    state,
    eval_func: Callable[[np.ndarray], Tuple[np.ndarray, float]],
    num_simulations: int,
    c_puct_base: float = 19652.0,
    c_puct_init: float = 1.25,
) -> Tuple[np.ndarray, float]:
    """Serial UCT over engine states; returns (root child_N, root Q).

    ``eval_func(obs_nhwc) -> (pi_probs[A], value)``. Matches the reference's
    serial ``uct_search`` visit-for-visit under a deterministic evaluator.
    """
    step = jitted(engine, "step")
    obs_fn = jitted(engine, "observation")

    def legal_np(s):
        return np.asarray(s.legal)

    prior, value = eval_func(np.asarray(obs_fn(state)))
    root = Node(to_play=int(state.to_play), num_actions=engine.num_actions,
                parent=DummyNode())
    root.child_P = np.asarray(prior, np.float32).copy()
    root.is_expanded = True
    backup(root, float(value))

    states = {id(root): state}

    while root.N < num_simulations:
        node = root
        sim_state = state
        done = bool(sim_state.done)
        reward = 0.0
        while node.is_expanded:
            scores = -node.child_Q() + node.child_U(c_puct_base, c_puct_init)
            scores = np.where(legal_np(sim_state) == 1, scores, -9999)
            move = int(np.argmax(scores))
            if move not in node.children:
                node.children[move] = Node(
                    to_play=-int(sim_state.to_play), num_actions=engine.num_actions,
                    move=move, parent=node,
                )
            node = node.children[move]
            sim_state = step(sim_state, jnp.int32(move))
            done = bool(sim_state.done)
            reward = float(sim_state.last_reward)
            if done:
                break
        if done:
            backup(node, -reward)
            continue
        prior, value = eval_func(np.asarray(obs_fn(sim_state)))
        node.child_P = np.asarray(prior, np.float32).copy()
        node.is_expanded = True
        backup(node, float(value))

    root_q = root.W / root.N
    return root.child_N.copy(), float(root_q)
