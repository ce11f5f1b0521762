"""Benchmark: batched self-play throughput on the 9x9 Go headline config.

Measures env-steps/s (game moves per second across the batch) with the
trained reference configuration — 200 MCTS simulations per move, 10-block x
128-filter network — against the reference fleet baseline of ~418 env-steps/s
(113 actor processes on a 128-CPU + 8x RTX 3090 server; BASELINE.md).

Budget-proof output: a JSON result line is printed (and flushed) after EVERY
timed step, so even if the driver kills this process mid-run the last line on
stdout is a valid partial measurement. The final line is the full-precision
result. Uses the persistent compile cache in .jax_cache — run once after any
search-code change to re-warm it.

Env knobs: BENCH_CONFIG (go9|gomoku13|go19_jumbo), BENCH_BATCH, BENCH_SIMS,
BENCH_STEPS, BENCH_WARMUP, BENCH_REUSE (0/1), BENCH_MAX_NEW_SIMS,
BENCH_DP (shard the game batch over the first N devices of a ('dp','mdl')
mesh — the multi-chip scale-out path; batch is the GLOBAL batch).

Sims/s is reported two ways (VERDICT r4 "honest sims/s"): ``nn_sims_per_s``
counts NN-backed simulations actually executed per second (the sim-loop
length: ``max_new_sims`` under subtree reuse, else ``num_simulations-1``);
``budget_sims_per_s`` counts the full search budget per move, which under
reuse includes visits carried from the previous move's subtree (99.3% of
moves still reach the full budget — PERF.md visits histogram). The headline
metric stays env-steps/s.
"""

import dataclasses
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

# BENCH_FORCE_CPU=n: run on n virtual CPU devices instead of the TPU —
# correctness/partitioning smoke for BENCH_DP without chips (throughput
# numbers are meaningless there). Works post-import like tests/conftest.py.
_force_cpu = int(os.environ.get("BENCH_FORCE_CPU", "0"))
if _force_cpu:
    _xf = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in _xf:
        os.environ["XLA_FLAGS"] = (
            _xf + f" --xla_force_host_platform_device_count={_force_cpu}").strip()
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu")

BASELINE_ENV_STEPS_PER_S = 418.0  # logs/go/9x9/run.log fleet throughput


def main() -> None:
    from alpha_zero_tpu import config as config_lib
    from alpha_zero_tpu.models.resnet import build_network
    from alpha_zero_tpu.training import selfplay as selfplay_lib
    from alpha_zero_tpu.training.pipeline import build_engine

    config_name = os.environ.get("BENCH_CONFIG", "go9")
    cfg = config_lib.get_config(config_name)
    batch = int(os.environ.get("BENCH_BATCH",
                               str(cfg.parallel.selfplay_batch_size)))
    num_sims = int(os.environ.get("BENCH_SIMS", str(cfg.search.num_simulations)))
    warmup_steps = int(os.environ.get("BENCH_WARMUP", "1"))
    timed_steps = int(os.environ.get("BENCH_STEPS", "8"))
    reuse = bool(int(os.environ.get("BENCH_REUSE",
                                    "1" if cfg.search.reuse_subtree else "0")))
    mns_env = os.environ.get("BENCH_MAX_NEW_SIMS", "")
    max_new_sims = int(mns_env) if mns_env else (
        cfg.search.max_new_sims if reuse else None
    )

    search_cfg = dataclasses.replace(
        cfg.search,
        num_simulations=num_sims,
        reuse_subtree=reuse,
        max_new_sims=max_new_sims if reuse else None,
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
        reuse_num_simulations=num_sims if reuse else None,
    )

    threshold = jnp.float32(-1.0)
    rng = jax.random.PRNGKey(2)

    bench_dp = int(os.environ.get("BENCH_DP", "0"))
    if bench_dp > 1:
        # Multi-chip scale-out path: games sharded over 'dp', weights
        # replicated — exactly the pipeline's single-host mesh placement
        # (training/pipeline.py:252-279). On N real chips the same program
        # runs N lanes-per-chip smaller; XLA keeps every collective on ICI.
        from alpha_zero_tpu.parallel import mesh as mesh_lib

        if batch % bench_dp != 0:
            raise SystemExit(f"BENCH_BATCH={batch} not divisible by BENCH_DP={bench_dp}")
        mesh = mesh_lib.make_mesh(n_devices=bench_dp)
        data_sh = mesh_lib.batch_sharding(mesh)
        rep = mesh_lib.replicated(mesh)
        variables = jax.tree.map(lambda x: jax.device_put(x, rep), variables)
        sp = jax.tree.map(lambda x: jax.device_put(x, data_sh), sp)
        threshold = jax.device_put(threshold, rep)
        print(f"# dp={bench_dp} mesh over {mesh.devices.ravel().tolist()}",
              file=sys.stderr, flush=True)

    # NN-backed sims per env-step = the sim-loop length (search/mcts.py:948);
    # the full budget additionally counts visits carried via subtree reuse.
    loop_len = (num_sims - 1) if (not reuse or max_new_sims is None) else max_new_sims

    metric = f"selfplay_env_steps_per_s_{config_name}_{num_sims}sims"
    if bench_dp > 1:
        metric += f"_dp{bench_dp}"

    def emit(env_steps_per_s: float, partial: bool) -> None:
        line = {
            "metric": metric if (config_name != "go9" or bench_dp > 1)
            else "selfplay_env_steps_per_s_9x9go_200sims",
            "value": round(env_steps_per_s, 1),
            "unit": "env-steps/s",
            "vs_baseline": round(env_steps_per_s / BASELINE_ENV_STEPS_PER_S, 3),
            "nn_sims_per_s": round(env_steps_per_s * loop_len),
            "budget_sims_per_s": round(env_steps_per_s * num_sims),
        }
        if partial:
            line["partial"] = True
        print(json.dumps(line), flush=True)

    t_compile = time.time()
    for _ in range(warmup_steps):
        rng, sub = jax.random.split(rng)
        sp, out = step_fn(variables, sp, sub, threshold)
    # Materialize a real value on the host: on some remote-device transports
    # block_until_ready can acknowledge before execution finishes, producing
    # impossibly-fast timings — a device-to-host scalar cannot lie.
    _ = float(jnp.sum(out.search_pi))
    compile_time = time.time() - t_compile
    print(f"# compile+warmup({warmup_steps} steps)={compile_time:.1f}s",
          file=sys.stderr, flush=True)

    # PIPELINED TIMING (matches the real training loop,
    # training/pipeline.py:selfplay_until): dispatch step k+1, then force
    # completion of step k via a device->host scalar — per-step host/tunnel
    # latency overlaps device compute instead of serializing with it. Every
    # step's completion is still proven by a real value on the host.
    t0 = time.time()
    done_steps = 0
    prev = None
    for i in range(timed_steps):
        rng, sub = jax.random.split(rng)
        sp, out = step_fn(variables, sp, sub, threshold)
        if prev is not None:
            _ = float(jnp.sum(prev.search_pi))
            done_steps = i  # steps 0..i-1 proven complete
            elapsed = time.time() - t0
            rate = batch * done_steps / elapsed
            # Partial result after every step: a timeout still leaves a number.
            emit(rate, partial=True)
            print(f"# step {done_steps}/{timed_steps}: {rate:,.0f} env-steps/s "
                  f"({rate * loop_len:,.0f} NN sims/s, {rate * num_sims:,.0f} "
                  f"budget sims/s)", file=sys.stderr, flush=True)
        prev = out
    _ = float(jnp.sum(prev.search_pi))
    done_steps = timed_steps

    elapsed = time.time() - t0
    env_steps_per_s = batch * done_steps / elapsed
    emit(env_steps_per_s, partial=False)
    print(
        f"# config={config_name} batch={batch} sims={num_sims} reuse={reuse} "
        f"max_new_sims={max_new_sims} dp={bench_dp or 1} "
        f"timed={elapsed:.2f}s for {done_steps} steps; "
        f"nn_sims/s={env_steps_per_s * loop_len:,.0f} "
        f"budget_sims/s={env_steps_per_s * num_sims:,.0f}",
        file=sys.stderr, flush=True,
    )


if __name__ == "__main__":
    main()
