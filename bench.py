"""Benchmark: batched self-play throughput on the 9x9 Go headline config.

Measures env-steps/s (game moves per second across the batch) with the
trained reference configuration — 200 MCTS simulations per move, 10-block x
128-filter network — against the reference fleet baseline of ~418 env-steps/s
(113 actor processes on a 128-CPU + 8x RTX 3090 server; BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

# Persistent compile cache: the search program is large; repeated bench runs
# (and the driver's run) skip the multi-minute first compile.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/root/repo/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

BASELINE_ENV_STEPS_PER_S = 418.0  # logs/go/9x9/run.log fleet throughput


def main() -> None:
    batch = int(os.environ.get("BENCH_BATCH", "1024"))
    num_sims = int(os.environ.get("BENCH_SIMS", "200"))
    warmup_steps = int(os.environ.get("BENCH_WARMUP", "2"))
    timed_steps = int(os.environ.get("BENCH_STEPS", "8"))

    from alpha_zero_tpu import config as config_lib
    from alpha_zero_tpu.models.resnet import build_network
    from alpha_zero_tpu.training import selfplay as selfplay_lib
    from alpha_zero_tpu.training.pipeline import build_engine

    cfg = config_lib.go9()
    search_cfg = config_lib.SearchConfig(
        num_simulations=num_sims,
        warm_up_steps=cfg.search.warm_up_steps,
    )
    engine = build_engine(cfg.env)
    net = build_network(cfg.env, cfg.network)

    n = cfg.env.board_size
    obs = jnp.zeros((1, n, n, cfg.env.num_planes), jnp.int8)
    variables = net.init(jax.random.PRNGKey(0), obs, train=False)
    variables = {"params": variables["params"], "batch_stats": variables["batch_stats"]}

    step_fn = selfplay_lib.make_selfplay_step(engine, net, search_cfg, cfg.resign)
    sp = selfplay_lib.init_selfplay_state(
        engine, batch, jax.random.PRNGKey(1),
        resign_threshold=-1.0, disable_resign_ratio=cfg.resign.disable_resign_ratio,
    )

    threshold = jnp.float32(-1.0)
    rng = jax.random.PRNGKey(2)

    t_compile = time.time()
    for i in range(warmup_steps):
        rng, sub = jax.random.split(rng)
        sp, out = step_fn(variables, sp, sub, threshold)
    jax.block_until_ready(out.search_pi)
    compile_time = time.time() - t_compile

    t0 = time.time()
    for i in range(timed_steps):
        rng, sub = jax.random.split(rng)
        sp, out = step_fn(variables, sp, sub, threshold)
    jax.block_until_ready(out.search_pi)
    elapsed = time.time() - t0

    env_steps_per_s = batch * timed_steps / elapsed
    sims_per_s = env_steps_per_s * num_sims

    print(
        f"# batch={batch} sims={num_sims} warmup(compile)={compile_time:.1f}s "
        f"timed={elapsed:.2f}s for {timed_steps} steps; "
        f"sims/s={sims_per_s:,.0f}",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "selfplay_env_steps_per_s_9x9go_200sims",
        "value": round(env_steps_per_s, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(env_steps_per_s / BASELINE_ENV_STEPS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
