"""Root-visit distribution under subtree reuse (VERDICT r2 item #5).

Measures how the ``max_new_sims`` cap interacts with carried subtree visits:
for each self-play move, the root's final visit count N_root = carried + new
sims. The reference's budget semantics are ``while root.N < num_simulations``
(mcts_v2.py:379) — with a cap below num_simulations-1, lanes whose reused
root carried few visits stop short of the full budget. This prints the
distribution of N_root across steady-state batches so the strength lever is
quantified, not guessed.

Usage: python tools/visits_hist.py  [env: B, STEPS, WARM, MAX_NEW_SIMS, CONFIG]
"""
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from alpha_zero_tpu import config as config_lib
from alpha_zero_tpu.models.resnet import build_network
from alpha_zero_tpu.training import selfplay as selfplay_lib
from alpha_zero_tpu.training.pipeline import build_engine


def main():
    batch = int(os.environ.get("B", "1024"))
    warm = int(os.environ.get("WARM", "50"))    # steps to reach steady state
    steps = int(os.environ.get("STEPS", "20"))  # measured steps
    cfg = config_lib.get_config(os.environ.get("CONFIG", "go9"))
    mns = os.environ.get("MAX_NEW_SIMS", "")
    search_cfg = dataclasses.replace(
        cfg.search, reuse_subtree=True,
        max_new_sims=int(mns) if mns else cfg.search.max_new_sims,
    )
    sims = search_cfg.num_simulations
    engine = build_engine(cfg.env)
    net = build_network(cfg.env, cfg.network)

    n = cfg.env.board_size
    obs = jnp.zeros((1, n, n, cfg.env.num_planes), jnp.int8)
    variables = net.init(jax.random.PRNGKey(0), obs, train=False)
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}

    step_fn = selfplay_lib.make_selfplay_step(engine, net, search_cfg, cfg.resign)
    sp = selfplay_lib.init_selfplay_state(
        engine, batch, jax.random.PRNGKey(1), resign_threshold=-1.0,
        disable_resign_ratio=cfg.resign.disable_resign_ratio,
        reuse_num_simulations=sims,
    )
    threshold = jnp.float32(-1.0)
    rng = jax.random.PRNGKey(2)

    visits = []
    for i in range(warm + steps):
        rng, sub = jax.random.split(rng)
        sp, out = step_fn(variables, sp, sub, threshold)
        if i >= warm:
            visits.append(np.asarray(jax.device_get(out.root_visits)))
    v = np.concatenate(visits)
    full = float((v >= sims).mean())
    print(f"config={os.environ.get('CONFIG', 'go9')} sims={sims} "
          f"max_new_sims={search_cfg.max_new_sims} batch={batch} "
          f"moves={v.size} (after {warm} warm steps)")
    print(f"N_root: mean={v.mean():.1f} median={np.median(v):.0f} "
          f"p10={np.percentile(v, 10):.0f} p25={np.percentile(v, 25):.0f} "
          f"p75={np.percentile(v, 75):.0f} min={v.min():.0f}")
    print(f"fraction reaching full budget ({sims}): {full:.3f}")
    edges = [0, 121, 140, 160, 180, 199, 10_000]
    labels = ["<=120", "121-140", "141-160", "161-180", "181-199", ">=200"]
    hist, _ = np.histogram(v, bins=edges)
    for lab, h in zip(labels, hist):
        bar = "#" * int(60 * h / max(1, hist.max()))
        print(f"{lab:>8}: {h / v.size:6.3f} {bar}")


if __name__ == "__main__":
    main()
