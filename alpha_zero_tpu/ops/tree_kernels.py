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


def _padded_lane_bytes(t: int, a: int) -> int:
    """VMEM bytes one lane's ``child_P`` row actually occupies: Mosaic tiles
    f32 as (8, 128), so T rounds up to a multiple of 8 and A to 128 lanes."""
    return (-(-t // 8) * 8) * (-(-a // 128) * 128) * 4


def _pick_block(batch: int, tree_bytes_per_lane: int,
                vmem_budget: int = 12 * 1024 * 1024) -> int:
    """Largest power-of-two lane block that divides ``batch`` and keeps the
    block's VMEM footprint within budget. The factor 3 covers the
    double-buffered child_P block plus the [blk, T, A]-sized temporary the
    per-step masked scatter materializes (measured: real-bytes x2 budgeting
    OOM'd scoped VMEM at small-T geometry, e.g. T=65/A=82/blk=128 -> 17.9 MB
    against the 16 MB stack limit)."""
    blk = 1
    cand = 2
    while cand <= batch and batch % cand == 0:
        if 3 * cand * tree_bytes_per_lane > vmem_budget:
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

    # Mosaic layout rules shape this kernel: iota must be integer, minor-dim
    # inserts/broadcasts are only supported on 32-bit types, and 1-D
    # lane-vectors don't relayout to (blk, 1, ...) — so every per-lane
    # scalar stays a [blk, 1] f32/i32 column and every mask is built by
    # comparing 32-bit operands at the target rank.
    t_iota_f2 = jax.lax.broadcasted_iota(
        jnp.int32, (blk, T), 1).astype(jnp.float32)
    t_iota_f3 = jax.lax.broadcasted_iota(
        jnp.int32, (blk, T, A), 1).astype(jnp.float32)
    a_iota_f3 = jax.lax.broadcasted_iota(
        jnp.int32, (blk, T, A), 2).astype(jnp.float32)
    a_iota_f2A = jax.lax.broadcasted_iota(
        jnp.int32, (blk, A), 1).astype(jnp.float32)

    q_t = nW / jnp.maximum(nN, 1.0)  # loop-invariant

    # Every per-lane carry scalar lives as a ROW-UNIFORM f32 [blk, T] array
    # (all T entries equal) so the while-loop carry keeps one standard
    # Mosaic layout — [blk, 1] columns and i32/bool selects trip relayout
    # and replication limits in layout inference. [blk, 1] reduction results
    # are spread back to rows by multiplying with a ones row (exact).
    # Built from iota (not constants): constant splats get a fully
    # replicated layout that the while-carry can't be relaid out to.
    zeros_bt = jnp.minimum(t_iota_f2, 0.0)
    ones_bt = zeros_bt + 1.0
    ones_ba = jnp.minimum(a_iota_f2A, 0.0) + 1.0

    # The descent state lives in VMEM SCRATCH REFS and the while-loop carry
    # is a single scalar continue-flag: vector-valued loop carries trip
    # Mosaic's layout-inference (replicated vs offset layout joins), while
    # ref reads/writes always use the canonical layout.
    def _loop(curs_s, ncur_s, action_s, child_s, psel_s, stop_s, depth_s):

        def cond(go):
            return go > 0.5

        def body(go):
            curs = curs_s[...]
            n_cur = ncur_s[...]
            action = action_s[...]
            child = child_s[...]
            p_sel = psel_s[...]
            stop = stop_s[...]
            depth = depth_s[...]
            even = even_ref[...]
            odd = odd_ref[...]
            out = _body_math(curs, n_cur, action, child, p_sel, stop, depth,
                             even, odd)
            (curs_s[...], ncur_s[...], action_s[...], child_s[...],
             psel_s[...], stop_s[...], depth_s[...], even_ref[...],
             odd_ref[...]) = out
            cont = jnp.where(
                (out[5] < 0.5) & (out[6] < float(path_cap)), 1.0, 0.0)
            return jnp.max(cont)

        jax.lax.while_loop(cond, body, jnp.float32(1.0))

    def _body_math(curs, n_cur, action, child, p_sel, stop, depth, even, odd):
        act_f = jnp.where(stop < 0.5, 1.0, 0.0) * jnp.where(
            depth < float(path_cap), 1.0, 0.0)           # [blk, T] uniform
        pb_c = jnp.log((1.0 + n_cur + c_puct_base) / c_puct_base) + c_puct_init
        sqn = jnp.sqrt(n_cur)
        # Same expression tree as _select_leaf: pb_c * max(P,0) * (sqrt/(1+N)).
        u_t = pb_c * jnp.maximum(nP, 0.0) * (sqn / (1.0 + nN))
        score_t = -q_t + u_t                              # [blk, T]
        pmask_f = jnp.where(par == curs, 1.0, 0.0)        # [blk, T]
        # One [blk, T, A] scatter pass: each child's score lands at its
        # action slot (-inf elsewhere). An existing child's score is always
        # finite, so "has a child at action a" == "score_A[a] > -inf" — no
        # separate has_child/child-id full-rank passes (the chosen action's
        # child id is recovered after the argmax with a [blk, T] pass).
        link = (pmask_f[:, :, None] > 0.5) & (actv[:, :, None] == a_iota_f3)
        score_A = jnp.max(
            jnp.where(link, score_t[:, :, None], -jnp.inf), axis=1)
        has_child = score_A > -jnp.inf
        # Parent's prior row via a masked max over the VMEM-resident block.
        cur_ohf = jnp.where(t_iota_f2 == curs, 1.0, 0.0)  # [blk, T]
        p_row = jnp.max(
            jnp.where(cur_ohf[:, :, None] > 0.5, childP, -jnp.inf), axis=1)
        legal_row = p_row >= 0.0
        # Lane scalars at [blk, A] rank, spread from keepdims reductions.
        pb_cA = jnp.max(pb_c, axis=1, keepdims=True) * ones_ba
        sqnA = jnp.max(sqn, axis=1, keepdims=True) * ones_ba
        fresh = -0.0 + pb_cA * jnp.maximum(p_row, 0.0) * (sqnA / 1.0)
        scores = jnp.where(legal_row,
                           jnp.where(has_child, score_A, fresh), -9999.0)
        # argmax as min-index-of-max in pure f32 (integer argmax + sitofp
        # doesn't legalize in Mosaic); first-max-wins like jnp.argmax.
        max_score = jnp.max(scores, axis=1, keepdims=True) * ones_ba
        action_new = jnp.min(
            jnp.where(scores == max_score, a_iota_f2A, float(A)), axis=1,
            keepdims=True)                                # [blk, 1]
        a_oh = a_iota_f2A == action_new * ones_ba
        # Chosen action's child id from the [T] vectors ([blk, T] pass).
        ch_link = (pmask_f > 0.5) & (actv == action_new * ones_bt)
        child_col = jnp.max(
            jnp.where(ch_link, t_iota_f2, -1.0), axis=1, keepdims=True)
        child_new = child_col * ones_bt                   # [blk, T] uniform
        p_sel_new = jnp.max(jnp.where(a_oh, p_row, -9999.0), axis=1,
                            keepdims=True) * ones_bt
        child_c = jnp.clip(child_new, 0.0, T - 1.0)       # [blk, T] uniform
        ch_ohf = jnp.where(t_iota_f2 == child_c, 1.0, 0.0)
        done_val = jnp.max(ch_ohf * nd, axis=1, keepdims=True) * ones_bt
        child_n = jnp.max(ch_ohf * nN, axis=1, keepdims=True) * ones_bt
        new_f = jnp.where(child_new < 0.0, 1.0, 0.0)
        term_f = (1.0 - new_f) * jnp.where(done_val > 0.5, 1.0, 0.0)
        stop_new = jnp.maximum(new_f, term_f)
        # Integer parity of the f32 depth counter (exact for small ints).
        is_even_f = jnp.where(depth - 2.0 * jnp.floor(depth * 0.5) < 0.5,
                              1.0, 0.0)
        even = even + (act_f * is_even_f) * cur_ohf
        odd = odd + (act_f * (1.0 - is_even_f)) * cur_ohf
        nxt = stop_new * curs + (1.0 - stop_new) * child_c
        nxt_n = stop_new * n_cur + (1.0 - stop_new) * child_n

        def blend(new, old):
            return act_f * new + (1.0 - act_f) * old

        return (
            blend(nxt, curs),
            blend(nxt_n, n_cur),
            blend(action_new * ones_bt, action),
            blend(child_new, child),
            blend(p_sel_new, p_sel),
            blend(stop_new, stop),
            blend(depth + 1.0, depth),
            even, odd,
        )

    root_mask = jnp.where(t_iota_f2 == 0.0, 1.0, 0.0)
    n_root = jnp.max(root_mask * nN, axis=1, keepdims=True) * ones_bt

    def _run(curs_s, ncur_s, action_s, child_s, psel_s, stop_s, depth_s):
        curs_s[...] = zeros_bt
        ncur_s[...] = n_root
        action_s[...] = zeros_bt - 1.0
        child_s[...] = zeros_bt - 1.0
        psel_s[...] = zeros_bt
        stop_s[...] = zeros_bt
        depth_s[...] = zeros_bt
        even_ref[...] = zeros_bt
        odd_ref[...] = zeros_bt
        _loop(curs_s, ncur_s, action_s, child_s, psel_s, stop_s, depth_s)
        child = child_s[...]
        scal_ref[:, 0:1] = jnp.max(curs_s[...], axis=1, keepdims=True)
        scal_ref[:, 1:2] = jnp.max(action_s[...], axis=1, keepdims=True)
        scal_ref[:, 2:3] = jnp.max(child, axis=1, keepdims=True)
        scal_ref[:, 3:4] = jnp.max(
            jnp.where(child >= 0.0, 1.0, 0.0), axis=1, keepdims=True)
        scal_ref[:, 4:5] = jnp.max(depth_s[...], axis=1, keepdims=True)
        scal_ref[:, 5:6] = jnp.max(psel_s[...], axis=1, keepdims=True)
        scal_ref[:, 6:8] = jnp.zeros((blk, 2), jnp.float32)

    pl.run_scoped(
        _run,
        *[pltpu.VMEM((blk, T), jnp.float32) for _ in range(7)],
    )


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
        block = _pick_block(B, _padded_lane_bytes(T, A))
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
