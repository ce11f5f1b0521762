"""Micro-bench each phase of one MCTS simulation at the bench config.

Phases match the sim_body of search/mcts.py:batched_search. Standalone-jit
timings include per-dispatch overhead the fused loop doesn't pay; use the
numbers for RELATIVE ranking, and bench.py for end-to-end truth.
"""
import os, time, functools
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from alpha_zero_tpu import config as config_lib
from alpha_zero_tpu.models.resnet import build_network
from alpha_zero_tpu.training.pipeline import build_engine
from alpha_zero_tpu.search import mcts as M

batch = int(os.environ.get("B", "1024"))
sims = int(os.environ.get("SIMS", "200"))
cfg = config_lib.go9()
engine = build_engine(cfg.env)
net = build_network(cfg.env, cfg.network)
n = cfg.env.board_size
A = engine.num_actions
capacity = sims + 1
path_cap = min(sims + 1, engine.max_steps + 2)
tree_engine = engine.with_num_stack(1)

obs = jnp.zeros((batch, n, n, cfg.env.num_planes), jnp.int8)
variables = net.init(jax.random.PRNGKey(0), obs[:1], train=False)
variables = {"params": variables["params"], "batch_stats": variables["batch_stats"]}

def eval_fn(o):
    out = net.apply(variables, o, train=False)
    return jax.nn.softmax(out.pi_logits, -1), out.value

# Build a mid-search tree by running ~60 sims of the real search body.
roots = engine.init_batch(batch)
prior0, value0 = eval_fn(jax.vmap(engine.observation)(roots))
trees0 = M.make_empty_trees(engine, roots, sims)
trees0 = jax.vmap(M._init_root)(trees0, prior0, value0)

select = jax.vmap(functools.partial(M._select_leaf, path_cap=path_cap,
                                    c_puct_base=19652.0, c_puct_init=1.25))
if M.INDEXING == "gather":
    gather_state = M._gather_state_rows
    materialize = M._materialize_scatter
    expand_backup = M._expand_backup_scatter
else:
    gather_state = jax.vmap(functools.partial(M._gather_state, capacity=capacity))
    materialize = jax.vmap(M._materialize)
    expand_backup = jax.vmap(M._expand_backup)

def sim_body(i, trees):
    active = trees.node_N[:, 0] < float(sims)
    slot = trees.num_nodes.astype(jnp.int32)
    parent, action, child, hit_term, even, odd, depth, p_sel = select(trees)
    parent_nodes = gather_state(trees.states, parent)
    parent_states = M._game_state_of(parent_nodes, A)
    new_states = tree_engine.step_batch(parent_states, action)
    trees, leaf, needs_eval = materialize(
        trees, slot, parent, action, child, hit_term, active,
        M._node_state_of(new_states), new_states.done, new_states.last_reward,
        p_sel)
    history = M._leaf_history_batch(trees, parent, depth, new_states.board, engine.num_stack)
    o = jax.vmap(engine.observation_from)(history, new_states.to_play)
    prior, value = eval_fn(o)
    prior_sel = jnp.where(new_states.legal > 0.5, prior, -1.0)
    return expand_backup(trees, slot, leaf, needs_eval, active, even, odd, depth, prior_sel, value)

warm = int(os.environ.get("WARM_SIMS", "60"))
trees = jax.jit(lambda t: jax.lax.fori_loop(0, warm, sim_body, t))(trees0)
jax.block_until_ready(trees.node_N)

def timeit(name, fn, *args, iters=100):
    r = fn(*args); jax.block_until_ready(jax.tree_util.tree_leaves(r)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(r)[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt*1e3:.3f} ms", flush=True)
    return dt

sel_j = jax.jit(select)
t_sel = timeit("select", sel_j, trees)
parent, action, child, hit_term, even, odd, depth, p_sel = sel_j(trees)

gs_j = jax.jit(lambda t, p: gather_state(t.states, p))
t_gs = timeit("gather_state", gs_j, trees, parent)
parent_nodes = gs_j(trees, parent)
parent_states = jax.jit(lambda ns: M._game_state_of(ns, A))(parent_nodes)

st_j = jax.jit(tree_engine.step_batch)
t_st = timeit("tree_engine.step (stack1)", st_j, parent_states, action)
new_states = st_j(parent_states, action)

slot_v = trees.num_nodes.astype(jnp.int32)
active_v = trees.node_N[:, 0] < float(sims)
mat_j = jax.jit(lambda t, sl, p, a, c, h, ac, ns, d, r, ps: materialize(t, sl, p, a, c, h, ac, ns, d, r, ps))
new_node = jax.jit(M._node_state_of)(new_states)
t_mat = timeit("materialize", mat_j, trees, slot_v, parent, action, child, hit_term, active_v, new_node, new_states.done, new_states.last_reward, p_sel)
trees2, leaf, needs_eval = mat_j(trees, slot_v, parent, action, child, hit_term, active_v, new_node, new_states.done, new_states.last_reward, p_sel)

lh_j = jax.jit(lambda t, p, d, b: M._leaf_history_batch(t, p, d, b, engine.num_stack))
t_lh = timeit("leaf_history", lh_j, trees2, parent, depth, new_states.board)
history = lh_j(trees2, parent, depth, new_states.board)

obs_j = jax.jit(lambda h, tp: jax.vmap(engine.observation_from)(h, tp))
t_obs = timeit("observation_from", obs_j, history, new_states.to_play)
o = obs_j(history, new_states.to_play)

nn_j = jax.jit(eval_fn)
t_nn = timeit("nn_eval", nn_j, o)
prior, value = nn_j(o)

eb_j = jax.jit(lambda t, sl, l, ne, ac, e, od, d, pr, v: expand_backup(
    t, sl, l, ne, ac, e, od, d, pr, v))
t_eb = timeit("expand_backup", eb_j, trees2, slot_v, leaf, needs_eval, active_v, even, odd, depth, prior, value)

total = t_sel + t_gs + t_st + t_mat + t_lh + t_obs + t_nn + t_eb
print(f"sum of phases: {total*1e3:.3f} ms/sim (standalone-jit; fused loop may differ)")
