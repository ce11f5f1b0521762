"""Pallas TPU kernels for the MCTS tree hot loop.

The one Pallas kernel that pays for itself on this workload is SELECT: the
XLA lowering of the batched PUCT descent (search/mcts.py:_select_leaf)
re-reads the [B, T, A] ``child_P`` array from HBM once per descent step —
the loop runs until the DEEPEST lane in the batch stops, so one simulation
sweeps ~(max depth) x 66KB/lane of HBM (go9 sizes; 258KB/lane at gomoku13,
where this is the dominant cost of the whole framework — see PERF.md).

Here each lane-block's ``child_P`` is DMA'd into VMEM once per simulation
and the entire descent runs on-chip: HBM traffic drops from
O(depth x B x T x A) to O(B x T x A), and the [T]-vector PUCT math runs at
VMEM bandwidth. The kernel is a transliteration of ``_select_leaf``'s math
(same expression tree per action, same argmax tie-breaking, per-lane
while-loop semantics reproduced with masked block-level iteration), so the
two paths are bit-identical — pinned by tests/test_pallas_kernels.py.

Replaces the reference's recursive best_child descent
(alpha_zero/core/mcts_v2.py:142-186, :568-625) at the batch scale the
reference reaches with process fleets.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_block(batch: int, tree_bytes_per_lane: int,
                vmem_budget: int = 6 * 1024 * 1024) -> int:
    """Largest power-of-two lane block that divides ``batch`` and keeps the
    pipelined (double-buffered) child_P block within the VMEM budget."""
    blk = 1
    cand = 2
    while cand <= batch and batch % cand == 0:
        if 2 * cand * tree_bytes_per_lane > vmem_budget:
            break
        blk = cand
        cand *= 2
    return blk


def _select_kernel(nN_ref, nW_ref, nP_ref, par_ref, act_ref, done_ref,
                   childP_ref, scal_ref, even_ref, odd_ref, *,
                   path_cap: int, c_puct_base: float, c_puct_init: float):
    blk, T = nN_ref.shape
    A = childP_ref.shape[-1]
    nN = nN_ref[...]
    nW = nW_ref[...]
    nP = nP_ref[...]
    par = par_ref[...]
    actv = act_ref[...]
    nd = done_ref[...]
    childP = childP_ref[...]

    t_iota_i = jax.lax.broadcasted_iota(jnp.int32, (blk, T), 1)
    t_iota_f3 = jax.lax.broadcasted_iota(jnp.float32, (blk, T, A), 1)
    a_iota_f3 = jax.lax.broadcasted_iota(jnp.float32, (blk, T, A), 2)
    a_iota_i2 = jax.lax.broadcasted_iota(jnp.int32, (blk, A), 1)

    # Q and U terms over the dense [blk, T] vectors are loop-invariant except
    # for the sqrt(n_cur)/pb_c factors; precompute the invariant pieces.
    q_t = nW / jnp.maximum(nN, 1.0)
    u_base = jnp.maximum(nP, 0.0) / (1.0 + nN)  # * pb_c * sqrt(n_cur) later

    def cond(carry):
        curs, n_cur, action, child, p_sel, stop, depth, even, odd = carry
        return jnp.any(~stop & (depth < path_cap))

    def body(carry):
        curs, n_cur, action, child, p_sel, stop, depth, even, odd = carry
        act_lane = ~stop & (depth < path_cap)
        cur_f = curs.astype(jnp.float32)
        pmask = par == cur_f[:, None]  # [blk, T]
        pb_c = jnp.log((1.0 + n_cur + c_puct_base) / c_puct_base) + c_puct_init
        sqn = jnp.sqrt(n_cur)
        # Same expression tree as _select_leaf: pb_c * max(P,0) * (sqrt/(1+N)).
        u_t = pb_c[:, None] * jnp.maximum(nP, 0.0) * (
            sqn[:, None] / (1.0 + nN))
        score_t = -q_t + u_t  # [blk, T]
        link = pmask[:, :, None] & (actv[:, :, None] == a_iota_f3)
        score_A = jnp.max(
            jnp.where(link, score_t[:, :, None], -jnp.inf), axis=1)
        child_A = jnp.max(jnp.where(link, t_iota_f3, -1.0), axis=1)
        has_child = child_A >= 0.0
        # Parent's prior row: per-lane dynamic row read from the VMEM block.
        cur_oh3 = (t_iota_i == curs[:, None])[:, :, None]
        p_row = jnp.max(jnp.where(cur_oh3, childP, -jnp.inf), axis=1)
        legal_row = p_row >= 0.0
        fresh = -0.0 + pb_c[:, None] * jnp.maximum(p_row, 0.0) * (
            sqn[:, None] / 1.0)
        scores = jnp.where(legal_row,
                           jnp.where(has_child, score_A, fresh), -9999.0)
        action_new = jnp.argmax(scores, axis=-1).astype(jnp.int32)
        a_oh = a_iota_i2 == action_new[:, None]
        child_new = jnp.max(jnp.where(a_oh, child_A, -1.0), axis=1)
        p_sel_new = jnp.max(jnp.where(a_oh, p_row, -jnp.inf), axis=1)
        child_c = jnp.clip(child_new, 0.0, T - 1).astype(jnp.int32)
        ch_oh = t_iota_i == child_c[:, None]
        done_val = jnp.max(jnp.where(ch_oh, nd, 0.0), axis=1)
        child_n = jnp.max(jnp.where(ch_oh, nN, 0.0), axis=1)
        is_new = child_new < 0.0
        is_term = ~is_new & (done_val > 0.5)
        stop_new = is_new | is_term
        cur_oh = (t_iota_i == curs[:, None]).astype(jnp.float32)
        is_even = (depth % 2) == 0
        even = even + (act_lane & is_even).astype(jnp.float32)[:, None] * cur_oh
        odd = odd + (act_lane & ~is_even).astype(jnp.float32)[:, None] * cur_oh
        nxt = jnp.where(stop_new, curs, child_c)
        nxt_n = jnp.where(stop_new, n_cur, child_n)
        return (
            jnp.where(act_lane, nxt, curs),
            jnp.where(act_lane, nxt_n, n_cur),
            jnp.where(act_lane, action_new, action),
            jnp.where(act_lane, child_new, child),
            jnp.where(act_lane, p_sel_new, p_sel),
            jnp.where(act_lane, stop_new, stop),
            jnp.where(act_lane, depth + 1, depth),
            even, odd,
        )

    zeros_bt = jnp.zeros((blk, T), jnp.float32)
    init = (
        jnp.zeros((blk,), jnp.int32),             # cur = root
        nN[:, 0],                                  # n_cur = root N
        jnp.full((blk,), -1, jnp.int32),           # action
        jnp.full((blk,), -1.0, jnp.float32),       # child (raw id, -1 = new)
        jnp.zeros((blk,), jnp.float32),            # p_sel
        jnp.zeros((blk,), jnp.bool_),              # stop
        jnp.zeros((blk,), jnp.int32),              # depth
        zeros_bt, zeros_bt,                        # even / odd
    )
    curs, _, action, child, p_sel, _, depth, even, odd = jax.lax.while_loop(
        cond, body, init)

    scal_ref[:, 0] = curs.astype(jnp.float32)
    scal_ref[:, 1] = action.astype(jnp.float32)
    scal_ref[:, 2] = child
    scal_ref[:, 3] = (child >= 0.0).astype(jnp.float32)
    scal_ref[:, 4] = depth.astype(jnp.float32)
    scal_ref[:, 5] = p_sel
    scal_ref[:, 6] = jnp.zeros((blk,), jnp.float32)
    scal_ref[:, 7] = jnp.zeros((blk,), jnp.float32)
    even_ref[...] = even
    odd_ref[...] = odd


@functools.partial(
    jax.jit,
    static_argnames=("path_cap", "c_puct_base", "c_puct_init", "block",
                     "interpret"),
)
def select_leaf_batched(node_N, node_W, node_P, parent_index,
                        action_from_parent, node_done, child_P, *,
                        path_cap: int, c_puct_base: float, c_puct_init: float,
                        block: int = 0, interpret: bool = False) -> Tuple:
    """Batched PUCT descent, child_P VMEM-resident per lane block.

    Returns (parent, action, child, hit_terminal, even, odd, depth, p_sel)
    with identical values to ``jax.vmap(mcts._select_leaf)``."""
    B, T = node_N.shape
    A = child_P.shape[-1]
    if block <= 0:
        block = _pick_block(B, T * A * 4)
    grid = (B // block,)

    vec = lambda: pl.BlockSpec((block, T), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
    in_specs = [vec() for _ in range(6)] + [
        pl.BlockSpec((block, T, A), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((block, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block, T), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block, T), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, 8), jnp.float32),
        jax.ShapeDtypeStruct((B, T), jnp.float32),
        jax.ShapeDtypeStruct((B, T), jnp.float32),
    ]
    kernel = functools.partial(
        _select_kernel, path_cap=path_cap, c_puct_base=c_puct_base,
        c_puct_init=c_puct_init)
    scal, even, odd = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(node_N, node_W, node_P, parent_index, action_from_parent, node_done,
      child_P)
    parent = scal[:, 0].astype(jnp.int32)
    action = scal[:, 1].astype(jnp.int32)
    child = scal[:, 2].astype(jnp.int32)
    hit_terminal = scal[:, 3] > 0.5
    depth = scal[:, 4].astype(jnp.int32)
    p_sel = scal[:, 5]
    return parent, action, child, hit_terminal, even, odd, depth, p_sel
