"""Split timing: NN forward vs engine step vs full selfplay move."""
import os, time
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from alpha_zero_tpu import config as config_lib
from alpha_zero_tpu.models.resnet import build_network
from alpha_zero_tpu.training import selfplay as selfplay_lib
from alpha_zero_tpu.training.pipeline import build_engine

batch = int(os.environ.get("B", "1024"))
sims = int(os.environ.get("SIMS", "200"))
cfg = config_lib.go9()
engine = build_engine(cfg.env)
net = build_network(cfg.env, cfg.network)
n = cfg.env.board_size
obs = jnp.zeros((batch, n, n, cfg.env.num_planes), jnp.int8)
variables = net.init(jax.random.PRNGKey(0), obs[:1], train=False)
variables = {"params": variables["params"], "batch_stats": variables["batch_stats"]}


def timeit(name, fn, *args, iters=sims):
    r = fn(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(r)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(r)[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt*1e3:.3f} ms/iter")
    return dt


@jax.jit
def fwd(v, o):
    out = net.apply(v, o, train=False)
    return out.pi_logits, out.value

nn_dt = timeit("nn_forward", fwd, variables, obs)

sp = selfplay_lib.init_selfplay_state(engine, batch, jax.random.PRNGKey(1),
                                      resign_threshold=-1.0,
                                      disable_resign_ratio=cfg.resign.disable_resign_ratio)
acts = jnp.zeros((batch,), jnp.int32)

@jax.jit
def eng_step(state, a):
    return engine.step_batch(state, a)

eng_dt = timeit("engine_step_batch (game-level, num_stack=8)", eng_step, sp.games, acts)

# The number that actually sits in the per-sim budget: the IN-TREE step
# (1-deep history), matching what the search loop runs.
tree_engine = engine.with_num_stack(1)
tree_states = sp.games.replace(history=sp.games.history[:, :1])

@jax.jit
def tree_step(state, a):
    return tree_engine.step_batch(state, a)

tree_dt = timeit("engine_step_batch (in-tree, num_stack=1)", tree_step,
                 tree_states, acts)

search_cfg = config_lib.SearchConfig(num_simulations=sims, warm_up_steps=cfg.search.warm_up_steps)
step_fn = selfplay_lib.make_selfplay_step(engine, net, search_cfg, cfg.resign)
rng = jax.random.PRNGKey(2)
out = step_fn(variables, sp, rng, jnp.float32(-1.0))
jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
t0 = time.perf_counter()
iters = 4
o = out
for i in range(iters):
    o = step_fn(variables, o[0], jax.random.fold_in(rng, i), jnp.float32(-1.0))
jax.block_until_ready(jax.tree_util.tree_leaves(o)[0])
move_dt = (time.perf_counter() - t0) / iters
print(f"full selfplay move ({sims} sims): {move_dt*1e3:.1f} ms "
      f"= {move_dt/sims*1e3:.3f} ms/sim")
print(f"shares per sim: nn {nn_dt*1e3:.3f} ms ({nn_dt/(move_dt/sims)*100:.0f}%), "
      f"in-tree engine step {tree_dt*1e3:.3f} ms ({tree_dt/(move_dt/sims)*100:.0f}%), "
      f"other tree ops {(move_dt/sims - nn_dt - tree_dt)*1e3:.3f} ms/sim")
print(f"env-steps/s at B={batch}: {batch/move_dt:.0f}")
