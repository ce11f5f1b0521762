"""Times TPU trace+compile of the selfplay step per gather-piece config.

Usage: AZT_GATHER_PIECES=<csv> python tools/compile_bisect.py
Prints one line: pieces, trace seconds, compile seconds.
"""
import os
import sys
import time
import dataclasses

import jax
import jax.numpy as jnp

from alpha_zero_tpu import config as config_lib
from alpha_zero_tpu.models.resnet import build_network
from alpha_zero_tpu.training import selfplay as selfplay_lib
from alpha_zero_tpu.training.pipeline import build_engine
from alpha_zero_tpu.search import mcts

batch = int(os.environ.get("BISECT_BATCH", "256"))
sims = int(os.environ.get("BISECT_SIMS", "64"))

cfg = config_lib.go9()
engine = build_engine(cfg.env)
net = build_network(cfg.env, cfg.network)
n = cfg.env.board_size
obs = jnp.zeros((1, n, n, cfg.env.num_planes), jnp.int8)
variables = net.init(jax.random.PRNGKey(0), obs, train=False)
variables = {"params": variables["params"], "batch_stats": variables["batch_stats"]}
sc = dataclasses.replace(cfg.search, num_simulations=sims,
                         max_new_sims=max(8, sims // 2))

step = selfplay_lib.make_selfplay_step(engine, net, sc, cfg.resign)
sp = selfplay_lib.init_selfplay_state(engine, batch, jax.random.PRNGKey(1),
                                      -1.0, 0.1, reuse_num_simulations=sims)
t0 = time.time()
lowered = step.lower(variables, sp, jax.random.PRNGKey(2), jnp.float32(-1.0))
t1 = time.time()
print(f"pieces={sorted(mcts.GATHER_PIECES) if mcts.INDEXING=='gather' else 'onehot'}"
      f" trace={t1-t0:.1f}s", flush=True)
compiled = lowered.compile()
t2 = time.time()
print(f"compile={t2-t1:.1f}s", flush=True)
