"""Single-host actor/learner pipeline as alternating jitted programs.

The reference runs N actor processes + an evaluator process around a learner
(training_go.py:276-381, pipeline.py:166-811), synchronized with mp.Events and
a ckpt-file weight channel. On TPU the actor fleet *is* one batched self-play
program, so the topology collapses to a sequential generation loop on one
host driving the chip(s):

    repeat:
      1. self-play until `games_per_ckpt` new games finish
         (`min_games` for the very first generation, pipeline.py:556-558)
      2. run `ckpt_interval` SGD steps on replay samples (pipeline.py:570-581)
      3. checkpoint + CSV metrics + resign-threshold controller updates

Kept behaviors: games-per-checkpoint pacing, the dynamic resignation
threshold controller with hard resets and FP-rate bookkeeping
(pipeline.py:519-553, 656-670), warm-up temperature, CSV schemas, SGF dumps,
replay save/restore, checkpoint resume.

Documented deviation: the reference's generation fence drops whole games
started under an older checkpoint (pipeline.py:492-493); with lockstep
batched self-play, games in flight at a weight switch *continue under the
new weights* by default. A straddling game's pre-switch transitions (obs/pi
recorded under the old weights) DO enter replay — a small
training-distribution difference vs the reference in exchange for throwing
no work away. Set ``train.drop_straddling_games=True`` for reference-exact
behavior: games alive at a weight switch are finished but discarded
(not counted, not stored).

Multi-host (``jax.distributed`` initialized by cli.train before the Trainer
is built): every process runs this same loop over ONE global ('dp', 'mdl')
mesh. Games and train batches are globally dp-sharded (each host feeds and
harvests its local rows), replay stays host-local, the generation fence
counts games globally, the resignation threshold is host0's broadcast, and
checkpoints are written collectively by orbax from the sharded state. See
``parallel/multihost.py``.
"""

from __future__ import annotations

import os
import time
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from alpha_zero_tpu.config import AlphaZeroConfig
from alpha_zero_tpu.envs.go import GoEngine
from alpha_zero_tpu.envs.gomoku import GomokuEngine
from alpha_zero_tpu.models.resnet import build_network
from alpha_zero_tpu.training import checkpoint as ckpt_lib
from alpha_zero_tpu.training import learner as learner_lib
from alpha_zero_tpu.training import selfplay as selfplay_lib
from alpha_zero_tpu.training.replay import UniformReplay
from alpha_zero_tpu.utils import sgf as sgf_lib
from alpha_zero_tpu.utils.csv_writer import CsvWriter
from alpha_zero_tpu.utils.logging import Timer, create_logger, get_time_stamp


def build_engine(env_cfg):
    if env_cfg.game == "go":
        return GoEngine(board_size=env_cfg.board_size, num_stack=env_cfg.num_stack,
                        komi=env_cfg.komi, max_steps=env_cfg.max_steps)
    if env_cfg.game == "gomoku":
        return GomokuEngine(board_size=env_cfg.board_size, num_stack=env_cfg.num_stack,
                            num_to_win=env_cfg.num_to_win, max_steps=env_cfg.max_steps)
    raise ValueError(f"unknown game {env_cfg.game}")


def maybe_adjust_resign_threshold(current_v: float, current_rate: float,
                                  target_rate: float, min_v: float = -0.9999,
                                  smoothing_factor: float = 0.5) -> float:
    """Threshold controller update (pipeline.py:656-670)."""
    rate_delta = current_rate - target_rate
    if rate_delta <= 0:
        return current_v
    new_v = current_v + current_v * rate_delta
    smoothed_v = smoothing_factor * new_v + (1 - smoothing_factor) * current_v
    return round(max(min_v, smoothed_v), 4)


class ResignController:
    """Dynamic resignation threshold with FP-rate tracking
    (pipeline.py:449-460, 519-553)."""

    def __init__(self, resign_cfg, games_per_ckpt: int, logger) -> None:
        self.cfg = resign_cfg
        self.games_per_ckpt = games_per_ckpt
        self.logger = logger
        self.resign_count = 0
        self.last_resign_count = 0
        self.could_won_count = 0
        if not resign_cfg.enabled:
            self.threshold = -1.0
        elif resign_cfg.no_resign_games > 0:
            self.threshold = -1.0
        else:
            self.threshold = resign_cfg.init_resign_threshold

    def on_game(self, stats: dict, num_games_added: int) -> None:
        cfg = self.cfg
        if not cfg.enabled or num_games_added < cfg.no_resign_games:
            return
        if stats.get("is_resign_disabled") and stats.get("is_marked_for_resign"):
            self.resign_count += 1
            if stats.get("is_could_won"):
                self.could_won_count += 1

        if num_games_added == cfg.no_resign_games or (
            cfg.reset_fp_interval > 0 and num_games_added % cfg.reset_fp_interval == 0
        ):
            self.resign_count = self.last_resign_count = self.could_won_count = 0
            self.threshold = cfg.init_resign_threshold
            self.logger.info(f"Reset resignation threshold to {self.threshold}")
            return

        adjust_every = int(self.games_per_ckpt * 0.5 * cfg.disable_resign_ratio * 0.5)
        if (
            adjust_every > 0
            and self.resign_count > self.last_resign_count
            and self.resign_count % adjust_every == 0
        ):
            self.last_resign_count = self.resign_count
            self._adjust()

    def _adjust(self) -> None:
        cfg = self.cfg
        fp_rate = 0.0 if self.resign_count == 0 else round(
            self.could_won_count / self.resign_count, 4
        )
        new_threshold = maybe_adjust_resign_threshold(
            self.threshold, fp_rate, cfg.target_fp_rate
        )
        if new_threshold != self.threshold:
            self.logger.info(
                f"Resignation FP {fp_rate} vs target {cfg.target_fp_rate}: "
                f"threshold {self.threshold} -> {new_threshold}"
            )
            self.threshold = new_threshold

    def on_games_global(self, num_marked: int, num_could_won: int,
                        games_before: int, games_after: int) -> None:
        """Batched multi-host update: host0 applies the GLOBAL game stream's
        statistics at fence granularity — all hosts' marked/could-won counts
        are aggregated (one allgather per fence), so the controller samples
        the full stream like the reference's single learner (pipeline.py:
        519-553) instead of host0's 1/N slice. Reset/adjust crossings are
        evaluated on count windows, matching the per-game cadence up to one
        fence interval of slack."""
        cfg = self.cfg
        if not cfg.enabled or games_after < cfg.no_resign_games:
            return
        self.resign_count += num_marked
        self.could_won_count += num_could_won
        crossed_start = games_before < cfg.no_resign_games <= games_after
        crossed_reset = cfg.reset_fp_interval > 0 and (
            games_after // cfg.reset_fp_interval
            > max(games_before, cfg.no_resign_games) // cfg.reset_fp_interval
        )
        if crossed_start or crossed_reset:
            self.resign_count = self.last_resign_count = self.could_won_count = 0
            self.threshold = cfg.init_resign_threshold
            self.logger.info(f"Reset resignation threshold to {self.threshold}")
            return
        adjust_every = int(self.games_per_ckpt * 0.5 * cfg.disable_resign_ratio * 0.5)
        if (
            adjust_every > 0
            and self.resign_count - self.last_resign_count >= adjust_every
        ):
            self.last_resign_count = self.resign_count
            self._adjust()


class Trainer:
    """Owns all state of a training run; ``run()`` drives it to completion."""

    def __init__(self, cfg: AlphaZeroConfig) -> None:
        self.cfg = cfg
        self.logger = create_logger(cfg.run.log_level)
        self.engine = build_engine(cfg.env)
        self.net = build_network(cfg.env, cfg.network)

        for d in (cfg.run.ckpt_dir, cfg.run.logs_dir, cfg.run.save_sgf_dir):
            if d:
                os.makedirs(d, exist_ok=True)

        n = cfg.env.board_size
        obs_shape = (n, n, cfg.env.num_planes)
        self.tx, self.lr_schedule = learner_lib.make_optimizer(
            cfg.train.init_lr, cfg.train.lr_decay, cfg.train.lr_milestones,
            momentum=cfg.train.sgd_momentum, weight_decay=cfg.train.l2_regularization,
        )
        rng = jax.random.PRNGKey(cfg.run.seed)
        self.rng, init_rng, sp_rng = jax.random.split(rng, 3)
        self.train_state = learner_lib.create_train_state(
            self.net, init_rng, obs_shape, self.tx
        )
        self.train_step = learner_lib.make_train_step(
            self.net, self.tx, self.lr_schedule, argument_data=cfg.train.argument_data
        )
        self.selfplay_step = selfplay_lib.make_selfplay_step(
            self.engine, self.net, cfg.search, cfg.resign,
            deterministic=False, root_noise=True,
        )

        self.replay = UniformReplay(
            capacity=cfg.train.replay_capacity, obs_shape=obs_shape,
            num_actions=cfg.env.num_actions, seed=cfg.run.seed,
        )
        self.resign_controller = ResignController(
            cfg.resign, cfg.train.games_per_ckpt, self.logger
        )

        # Multi-chip: shard the train state / batches / game batch over the
        # ('dp', 'mdl') mesh when more than one device is requested — XLA
        # then inserts the psum gradient collectives over ICI.
        # Multi-host (jax.distributed already initialized by cli.train): one
        # GLOBAL mesh over every host's devices; each process holds its local
        # shard of the game/train batches and its local replay partition.
        self.mesh = None
        self.data_sharding = None
        self.multihost = jax.process_count() > 1
        self.process_index = jax.process_index()
        self.is_host0 = self.process_index == 0
        n_mesh = cfg.parallel.dp * cfg.parallel.mdl
        if self.multihost:
            from alpha_zero_tpu.parallel import mesh as mesh_lib
            from alpha_zero_tpu.parallel import multihost as mh_lib

            self._mh = mh_lib
            self.mesh = mh_lib.make_global_mesh(mdl=cfg.parallel.mdl)
            self.data_sharding = mesh_lib.batch_sharding(self.mesh)
            # Params/opt state are host-identical (same seed everywhere):
            # place them replicated-over-dp / mdl-sharded on the global mesh.
            p_shard = mesh_lib.param_shardings(self.mesh, self.train_state.params)
            params = jax.tree.map(
                lambda x, s: jax.make_array_from_process_local_data(
                    s, np.asarray(x), np.asarray(x).shape),
                self.train_state.params, p_shard,
            )
            rep = jax.tree.map(np.asarray, self.train_state.batch_stats)
            batch_stats = mh_lib.replicate_to_global(self.mesh, rep)
            opt_state = jax.jit(self.tx.init)(params)
            self.train_state = self.train_state.replace(
                params=params, batch_stats=batch_stats, opt_state=opt_state,
                training_steps=mh_lib.replicate_to_global(
                    self.mesh, np.asarray(self.train_state.training_steps)
                ),
            )
        elif n_mesh > 1:
            from alpha_zero_tpu.parallel import mesh as mesh_lib

            self.mesh = mesh_lib.make_mesh(n_devices=n_mesh, mdl=cfg.parallel.mdl)
            self.data_sharding = mesh_lib.batch_sharding(self.mesh)
            self.train_state = mesh_lib.shard_train_state(
                self.mesh, self.train_state, self.tx
            )

        batch = cfg.parallel.selfplay_batch_size  # per-host games
        # Multi-host: decorrelate each host's game stream (reference seeds
        # actors with seed+rank, pipeline.py:193).
        sp_rng = jax.random.fold_in(sp_rng, self.process_index)
        self.sp_state = selfplay_lib.init_selfplay_state(
            self.engine, batch, sp_rng,
            resign_threshold=self.resign_controller.threshold,
            disable_resign_ratio=cfg.resign.disable_resign_ratio,
            reuse_num_simulations=(
                cfg.search.num_simulations if cfg.search.reuse_subtree else None
            ),
        )
        if self.multihost:
            self.sp_state = self._mh.local_to_global(
                self.mesh, jax.tree.map(np.asarray, self.sp_state)
            )
        elif self.data_sharding is not None:
            self.sp_state = jax.tree.map(
                lambda x: jax.device_put(x, self.data_sharding), self.sp_state
            )
        self.accumulator = selfplay_lib.EpisodeAccumulator(
            batch, num_planes=cfg.env.num_planes)

        self.actor_writer = CsvWriter(
            os.path.join(cfg.run.logs_dir, f"actor{self.process_index}.csv")
            if self.multihost
            else os.path.join(cfg.run.logs_dir, "actor0.csv")
        )
        self.train_writer = CsvWriter(os.path.join(cfg.run.logs_dir, "training.csv"),
                                      buffer_size=1)
        self.eval_writer = CsvWriter(os.path.join(cfg.run.logs_dir, "evaluation.csv"),
                                     buffer_size=1)
        self.evaluator = None  # built lazily by enable_evaluator()
        self._eval_failures = 0  # consecutive-failure escalation counter
        self._replay_path = os.path.join(
            cfg.run.ckpt_dir,
            f"replay_state_p{self.process_index}.npz" if self.multihost
            else "replay_state.npz",
        )
        self.timer = Timer()
        self.training_steps = 0
        self.last_ckpt_games = 0
        self.last_ckpt_samples = 0
        self.played_games = 0
        self.latest_ckpt_path: Optional[str] = None

        # Resume.
        if cfg.run.load_ckpt and os.path.exists(cfg.run.load_ckpt):
            self.train_state = ckpt_lib.restore_checkpoint(cfg.run.load_ckpt, self.train_state)
            self.training_steps = int(self.train_state.training_steps)
            self.logger.info(
                f"Resumed from checkpoint {cfg.run.load_ckpt} at step {self.training_steps}"
            )
        if cfg.run.load_replay and os.path.exists(cfg.run.load_replay):
            try:
                self.replay.load(cfg.run.load_replay)
                self.logger.info(f"Loaded replay state from {cfg.run.load_replay}")
            except Exception as e:  # noqa: BLE001
                # A corrupt snapshot (e.g. killed mid-save before saves were
                # atomic) must not crash-loop the supervisor; resume with an
                # empty replay — the same loss the reference has on any crash
                # (its replay lives in learner RAM).
                self.logger.error(
                    f"Replay snapshot {cfg.run.load_replay} unreadable "
                    f"({e}); starting with an empty replay")

        # Global (all-host) finished-game count, advanced by the fence; seeds
        # the resignation controller's global cadence after a replay resume.
        self.global_games_added = self.replay.num_games_added
        if self.multihost:
            self.global_games_added = int(
                self._mh.global_sum(self.replay.num_games_added, self.mesh)[0]
            )

        # Resign-threshold continuity: the controller enables the threshold
        # on the games_added == no_resign_games CROSSING, which a resumed run
        # past that point never sees again — a restart would silently play
        # the rest of the run with resignation off (the reference has the
        # same hole and only recovers at its next reset_fp_interval multiple,
        # pipeline.py:449-460, 532-536). Re-seed from the last actor-CSV
        # row's recorded threshold (exact continuity), falling back to the
        # init threshold (the reference's hard-reset value; FP statistics
        # restart either way, as they do on its resets).
        if (
            cfg.resign.enabled
            and self.engine.has_resign_move
            and self.global_games_added >= cfg.resign.no_resign_games
            and self.resign_controller.threshold <= -1.0
        ):
            t = self._last_recorded_resign_threshold()
            self.resign_controller.threshold = (
                t if t is not None else cfg.resign.init_resign_threshold
            )
            self.logger.info(
                f"Resign threshold resumed at {self.resign_controller.threshold}"
            )

    def _last_recorded_resign_threshold(self) -> Optional[float]:
        """Last ACTIVE threshold in this host's actor CSV. Rows with -1.0 are
        pre-activation (or written by a restart that hit the continuity hole
        this function repairs) — an active controller can never reach -1.0
        (its floor is -0.9999), so only values above -1.0 count."""
        path = os.path.join(
            self.cfg.run.logs_dir,
            f"actor{self.process_index}.csv" if self.multihost else "actor0.csv",
        )
        try:
            import csv as _csv

            last = None
            with open(path) as f:
                for row in _csv.DictReader(f):
                    try:
                        t = float(row["resign_threshold"])
                    except (KeyError, ValueError):
                        continue
                    if t > -1.0:
                        last = t
            return last
        except OSError:
            return None

    # ------------------------------------------------------------------
    @property
    def variables(self):
        return {"params": self.train_state.params,
                "batch_stats": self.train_state.batch_stats}

    def _next_rng(self):
        self.rng, sub = jax.random.split(self.rng)
        return sub

    # ------------------------------------------------------------------
    def selfplay_until(self, target_new_games: int,
                       max_steps: Optional[int] = None) -> int:
        """Runs self-play until ``target_new_games`` finish (counted across
        all hosts when multi-host — every process exits on the same step);
        returns the count this host saw globally."""
        cfg = self.cfg
        new_games = 0
        steps = 0
        threshold = jnp.float32(self.resign_controller.threshold)
        # Multi-host: the generation fence (global game count + threshold
        # broadcast) runs every ``fence_interval`` steps, not every step — on
        # real DCN a per-step host round-trip would gate the whole fleet on
        # control-plane latency. Between fences each host accumulates its
        # finished/marked/could-won counters locally; ``new_games`` only
        # advances at fences, so every process exits this loop on the same
        # step. (The reference's fence granularity is per-queue-item, i.e.
        # per finished game, pipeline.py:485-497.)
        fence_k = max(1, cfg.parallel.fence_interval)
        pending = [0, 0, 0]  # finished, resign-marked, could-have-won
        # PIPELINED HARVEST: dispatch step k+1 to the device, THEN harvest
        # step k's output while k+1 computes. The harvest is a dozen
        # device->host reads (~2 MB at go9 sizes) plus the Python accounting
        # in _harvest_step — synchronous with the device it cost ~40% of
        # selfplay wall-clock on the tunneled TPU; overlapped it is ~free.
        # The price is one step of staleness in the resign threshold and the
        # game-count exit check — the reference's async actor fleet runs with
        # far more staleness on both (actors are whole games ahead of the
        # controller, pipeline.py:485-497).
        from collections import deque

        # Two steps in flight: harvest step k-2 while steps k-1 and k
        # compute — the ~2 MB device->host copy then has two full device
        # steps to land over the tunnel (one step hid the latency but not
        # the transfer itself; measured 1,354 -> ~1,9xx env-steps/s).
        in_flight = deque()
        harvest_depth = 2
        thr_val = self.resign_controller.threshold
        while new_games < target_new_games:
            with self.timer:
                self.sp_state, out = self.selfplay_step(
                    self.variables, self.sp_state, self._next_rng(), threshold
                )
                # Start the device->host copies of every output leaf NOW:
                # they complete behind the device compute, so the later
                # harvest reads already-landed host memory instead of
                # paying a dozen sequential tunnel round-trips.
                for leaf in jax.tree.leaves(out):
                    if hasattr(leaf, "copy_to_host_async"):
                        leaf.copy_to_host_async()
                in_flight.append(out)
                if len(in_flight) > harvest_depth:
                    new_games += self._harvest_step(in_flight.popleft(), pending)
            steps += 1
            if self.multihost and steps % fence_k == 0:
                new_games += self._fence(pending)
                pending = [0, 0, 0]
            # Threshold may have moved mid-collection; re-upload the scalar
            # only when it changed (a handful of times per generation) so
            # tiny per-step transfers stay off the wire.
            if self.resign_controller.threshold != thr_val:
                thr_val = self.resign_controller.threshold
                threshold = jnp.float32(thr_val)
            if max_steps is not None and steps >= max_steps:
                break
        while in_flight:
            # Drain the in-flight steps: every output must still enter the
            # accumulator (per-lane histories grow one move per step).
            new_games += self._harvest_step(in_flight.popleft(), pending)
        # Flush counters the final (partial) fence window left behind. The
        # condition depends only on the lockstep ``steps``, so every process
        # joins this collective together.
        if self.multihost and steps % fence_k != 0:
            new_games += self._fence(pending)
        return new_games

    def _harvest_step(self, out, pending) -> int:
        """Host-side processing of one self-play step's output: accumulate
        per-lane histories, fold finished games into replay / resign
        controller / CSV / SGF. Returns the local new-game count
        (single-host); multi-host counts advance at fences instead."""
        cfg = self.cfg
        new_games = 0
        if self.multihost:
            # Harvest this host's rows of the global batch.
            out = selfplay_lib.StepOutput(*self._mh.global_to_local(out))
        finished = self.accumulator.add_step(out)
        if cfg.train.drop_straddling_games:
            kept = []
            for game in finished:
                if game.stats.pop("stale"):
                    continue  # reference fence: discard, don't count
                kept.append(game)
            finished = kept
        else:
            for game in finished:
                game.stats.pop("stale", None)
        for game in finished:
            self.played_games += 1
            self.last_ckpt_games += 1
            self.last_ckpt_samples += game.stats["game_length"]
            self.replay.add_game(game.states, game.pi_probs, game.values)
            if self.multihost:
                pending[0] += 1
                pending[1] += int(game.stats["is_marked_for_resign"])
                pending[2] += int(game.stats["is_could_won"])
            else:
                new_games += 1
                self.resign_controller.on_game(
                    game.stats, self.replay.num_games_added
                )

            row = {
                "datetime": get_time_stamp(),
                "game_length": game.stats["game_length"],
                "game_result": game.stats["game_result"],
            }
            if self.engine.has_pass_move:
                row["num_passes"] = game.stats["num_passes"]
            if self.engine.has_resign_move:
                row["is_resign_disabled"] = game.stats["is_resign_disabled"]
                row["is_marked_for_resign"] = game.stats["is_marked_for_resign"]
                row["is_could_won"] = game.stats["is_could_won"]
                row["marked_resign_player"] = game.stats["marked_resign_player"]
                row["resign_threshold"] = self.resign_controller.threshold
            row["time_per_game"] = round(self.timer.mean_time(), 4)
            row["training_steps"] = self.training_steps
            self.actor_writer.write(row)

            if (
                cfg.run.save_sgf_dir
                and cfg.run.save_sgf_interval > 0
                and self.played_games % cfg.run.save_sgf_interval == 0
            ):
                self._save_sgf(game)

            if self.replay.num_games_added % 10000 == 0:
                self.logger.info(
                    f"Collected {self.replay.num_games_added} self-play games, "
                    f"{self.replay.num_samples_added} samples."
                )
            if (
                cfg.train.save_replay_interval > 0
                and self.replay.num_games_added
                >= getattr(self, "_last_replay_save", 0)
                + cfg.train.save_replay_interval
            ):
                # Threshold, not modulo: several games can finish in one
                # lockstep step, hopping over the exact multiple.
                self._last_replay_save = self.replay.num_games_added
                self.replay.save(self._replay_path)
        return new_games

    def _fence(self, pending) -> int:
        """One fence collective: sums [finished, marked, could-won] across
        hosts, feeds the GLOBAL stream to host0's resignation controller, and
        broadcasts host0's threshold back. Returns the global finished-game
        delta."""
        totals = self._mh.global_sum(pending, self.mesh)
        delta = int(totals[0])
        before = self.global_games_added
        self.global_games_added = before + delta
        if self.is_host0:
            self.resign_controller.on_games_global(
                int(totals[1]), int(totals[2]), before, self.global_games_added
            )
        self.resign_controller.threshold = self._mh.broadcast_from_host0(
            self.resign_controller.threshold, self.mesh
        )
        return delta

    def _save_sgf(self, game: selfplay_lib.FinishedGame) -> None:
        from collections import namedtuple

        PM = namedtuple("PlayerMove", ["color", "move"])
        content = sgf_lib.make_sgf(
            board_size=self.cfg.env.board_size,
            move_history=[PM(c, m) for c, m in game.moves],
            result_string=game.stats["game_result"],
            ruleset="Chinese" if self.cfg.env.game == "go" else "",
            komi=self.cfg.env.komi if self.cfg.env.game == "go" else "",
            date=get_time_stamp(),
        )
        path = os.path.join(
            self.cfg.run.save_sgf_dir,
            f"actor{self.process_index}_{get_time_stamp(True)}_{self.played_games}.sgf",
        )
        with open(path, "w") as f:
            f.write(content)

    # ------------------------------------------------------------------
    def train_generation(self) -> None:
        """Runs ``ckpt_interval`` SGD steps then checkpoints
        (pipeline.py:563-615)."""
        cfg = self.cfg
        target = self.training_steps + cfg.train.ckpt_interval
        # Multi-host: each host samples its local fraction of the global
        # batch from its local replay partition (uniform-over-union).
        local_bs = cfg.train.batch_size
        if self.multihost:
            nproc = jax.process_count()
            if cfg.train.batch_size % nproc:
                raise ValueError(
                    f"train.batch_size={cfg.train.batch_size} must divide by "
                    f"process count {nproc}"
                )
            local_bs = cfg.train.batch_size // nproc
        while self.training_steps < target:
            batch = self.replay.sample(local_bs)
            if self.multihost:
                # Every host must agree (collective control flow): train only
                # if ALL local replays can sample.
                ok = self._mh.global_game_count(int(batch is not None), self.mesh)
                if ok < jax.process_count():
                    batch = None
            if batch is None:
                self.logger.warning("replay too small to sample; skipping update")
                break
            if self.multihost:
                globs = self._mh.local_to_global(
                    self.mesh, (batch.state, batch.pi_prob, batch.value)
                )
                states, pis, values = globs
            else:
                states = jnp.asarray(batch.state)
                pis = jnp.asarray(batch.pi_prob)
                values = jnp.asarray(batch.value)
                if self.data_sharding is not None:
                    states = jax.device_put(states, self.data_sharding)
                    pis = jax.device_put(pis, self.data_sharding)
                    values = jax.device_put(values, self.data_sharding)
            self.train_state, metrics = self.train_step(
                self.train_state, states, pis, values, self._next_rng(),
            )
            self.training_steps += 1
            if self.is_host0 and (
                self.training_steps % cfg.train.log_interval == 0
                or self.training_steps % cfg.train.ckpt_interval == 0
            ):
                self.train_writer.write({
                    "datetime": get_time_stamp(),
                    "training_steps": self.training_steps,
                    "policy_loss": float(metrics.policy_loss),
                    "value_loss": float(metrics.value_loss),
                    "learning_rate": float(metrics.learning_rate),
                    "total_games": self.replay.num_games_added,
                    "total_samples": self.replay.num_samples_added,
                })

        self.latest_ckpt_path = ckpt_lib.save_checkpoint(
            cfg.run.ckpt_dir, self.train_state, self.training_steps
        )
        if cfg.train.drop_straddling_games:
            # Reference fence (pipeline.py:492-493): games in flight at the
            # weight switch will be discarded when they finish.
            self.accumulator.mark_all_stale()
        self.last_ckpt_games = 0
        self.last_ckpt_samples = 0
        self.logger.info(
            f"Checkpoint for step {self.training_steps} at {self.latest_ckpt_path}"
        )

    # ------------------------------------------------------------------
    def profile(self, num_steps: int = 3, out_dir: Optional[str] = None) -> str:
        """Captures a jax.profiler trace of a few self-play + train steps
        (the reference only has wall-clock Timers, utils/util.py:75-96)."""
        out_dir = out_dir or os.path.join(self.cfg.run.logs_dir, "profile")
        threshold = jnp.float32(self.resign_controller.threshold)
        with jax.profiler.trace(out_dir):
            for _ in range(num_steps):
                self.sp_state, out = self.selfplay_step(
                    self.variables, self.sp_state, self._next_rng(), threshold
                )
            jax.block_until_ready(out.search_pi)
            batch = self.replay.sample(self.cfg.train.batch_size)
            if batch is not None:
                self.train_state, _ = self.train_step(
                    self.train_state,
                    jnp.asarray(batch.state), jnp.asarray(batch.pi_prob),
                    jnp.asarray(batch.value), self._next_rng(),
                )
                jax.block_until_ready(self.train_state.params)
        self.logger.info(f"profiler trace written to {out_dir}")
        return out_dir

    # ------------------------------------------------------------------
    def enable_evaluator(self) -> None:
        """Builds the evaluator (deterministic latest-vs-prev matches, Elo,
        pro-game metrics when ``eval_games_dir`` is set) — the in-process
        equivalent of the reference's evaluator process
        (run_evaluator_loop, pipeline.py:678-811)."""
        from alpha_zero_tpu.eval.dataset import build_eval_dataset
        from alpha_zero_tpu.eval.evaluator import Evaluator

        cfg = self.cfg
        dataset = None
        if cfg.run.eval_games_dir and os.path.exists(cfg.run.eval_games_dir):
            dataset = build_eval_dataset(
                cfg.run.eval_games_dir, cfg.env.board_size, cfg.env.num_stack,
                logger=self.logger,
                cache_path=os.path.join(
                    cfg.run.ckpt_dir,
                    f"eval_dataset_{cfg.env.board_size}x{cfg.env.board_size}.npz",
                ),
            )
        self.evaluator = Evaluator(
            self.engine, self.net, cfg.search,
            default_rating=cfg.run.default_rating, dataset=dataset,
            eval_games=cfg.run.eval_games,
        )
        # Resume continuity: a restarted run must continue the SAME Elo
        # curve (the reference threads this by hand via --default_rating,
        # pipeline.py:713-718 — here it's automatic from the last
        # evaluation.csv row) and compare its first new checkpoint against
        # the RESUMED weights, not against itself.
        if self.training_steps > 0:
            rating = self._last_recorded_rating()
            prev = self.variables
            if self.multihost:
                prev = self._mh.host_resident_value(prev) if self.is_host0 else None
            else:
                prev = jax.device_get(prev)
            self.evaluator.restore_continuity(
                rating if rating is not None else cfg.run.default_rating,
                prev_variables=prev,
            )
            if rating is not None:
                self.logger.info(
                    f"Evaluator resumed: Elo {rating:.2f} from last "
                    f"evaluation.csv row, prev model = resumed checkpoint"
                )

    def _games_at_last_ckpt(self) -> Optional[int]:
        """total_games at the last training.csv row whose step matches the
        resumed checkpoint (or the closest row at/below it)."""
        path = os.path.join(self.cfg.run.logs_dir, "training.csv")
        try:
            with open(path) as f:
                import csv as _csv

                best = None
                for row in _csv.DictReader(f):
                    step = int(row["training_steps"])
                    if step <= int(self.training_steps):
                        best = int(row["total_games"])
            return best
        except (OSError, KeyError, ValueError):
            return None

    def _last_recorded_rating(self) -> Optional[float]:
        """Last black (i.e. promoted) Elo rating written to evaluation.csv."""
        path = os.path.join(self.cfg.run.logs_dir, "evaluation.csv")
        try:
            with open(path) as f:
                import csv as _csv

                rows = list(_csv.DictReader(f))
            if not rows:
                return None
            return float(rows[-1]["black_elo_rating"])
        except (OSError, KeyError, ValueError):
            return None

    def start_async_evaluator(self) -> None:
        """Runs evaluations on a background worker thread so the next
        generation's self-play starts immediately after training — the
        reference topology, where the evaluator is its own process on its
        own GPU concurrent with the learner (training_go.py:292-314). On a
        single chip the evaluator's device work still interleaves with
        self-play dispatches (JAX queues are per-device FIFO), but its
        host-side cost — CSV/SGF writing, dataset streaming, result
        collection over the tunnel — fully overlaps. Ordering per
        checkpoint (Elo continuity) is preserved by the single worker.
        Trade-off vs inline: a crash loses the queued evaluations' csv rows
        (the reference loses the same when its evaluator process dies)."""
        import queue
        import threading

        if getattr(self, "_eval_queue", None) is not None:
            return
        self._eval_queue = queue.Queue()

        def worker():
            while True:
                item = self._eval_queue.get()
                if item is None:
                    self._eval_queue.task_done()
                    return
                variables, steps = item
                try:
                    self._evaluate_and_record(variables, steps)
                except Exception as e:  # noqa: BLE001 - keep the worker alive
                    self.logger.error(
                        f"async evaluation for step {steps} failed: {e}")
                finally:
                    self._eval_queue.task_done()

        self._eval_thread = threading.Thread(
            target=worker, name="evaluator", daemon=True)
        self._eval_thread.start()

    def finish_async_evaluator(self) -> None:
        if getattr(self, "_eval_queue", None) is None:
            return
        self._eval_queue.join()
        self._eval_queue.put(None)
        self._eval_thread.join()
        self._eval_queue = None

    def run_evaluation(self) -> Optional[dict]:
        """Evaluates the current weights; writes evaluation.csv + eval SGF.
        Multi-host: host0 alone reassembles the weights from its RESIDENT
        addressable shards (params are dp-replicated, so every host holds a
        full copy — no allgather, no other process involved) and plays the
        matches on its local devices — the equivalent of the reference's
        single evaluator process (pipeline.py:678-811)."""
        if self.evaluator is None:
            return None
        variables = self.variables
        if self.multihost:
            if not self.is_host0:
                return None
            variables = self._mh.host_resident_value(variables)
        if getattr(self, "_eval_queue", None) is not None:
            # Async mode: hand the checkpoint to the worker thread; self-play
            # of the next generation proceeds immediately. The weights are
            # snapshotted to HOST memory first — the learner's next train
            # step donates the device buffers, which must not race the
            # worker's matches.
            self._eval_queue.put(
                (jax.device_get(variables), self.training_steps))
            return None
        return self._evaluate_and_record(variables, self.training_steps)

    def _evaluate_and_record(self, variables, training_steps) -> Optional[dict]:
        try:
            stats = self.evaluator.evaluate(variables, seed=training_steps)
        except Exception as e:  # noqa: BLE001
            # The reference evaluator is a separate process whose death never
            # takes down the learner (training_go.py:292-314); keep that
            # isolation — a failed evaluation (e.g. a transient device error)
            # skips this checkpoint's row and training continues. But a
            # DETERMINISTIC evaluator bug would fail every checkpoint the
            # same way, so escalate once the failures stop looking transient.
            self._eval_failures += 1
            log = (self.logger.error if self._eval_failures >= 3
                   else self.logger.warning)
            log(
                f"evaluation failed for step {training_steps} "
                f"({self._eval_failures} consecutive): {e}"
            )
            return None
        self._eval_failures = 0
        moves = stats.pop("_moves", [])
        sgf_result = stats.pop("_sgf_result", stats.get("game_result", ""))
        row = {"datetime": get_time_stamp(), "training_steps": training_steps,
               **stats}
        self.eval_writer.write(row)
        if self.cfg.run.save_sgf_dir and moves:
            content = sgf_lib.make_sgf(
                board_size=self.cfg.env.board_size,
                move_history=moves,
                result_string=sgf_result,
                ruleset="Chinese" if self.cfg.env.game == "go" else "",
                komi=self.cfg.env.komi if self.cfg.env.game == "go" else "",
                date=get_time_stamp(),
            )
            path = os.path.join(
                self.cfg.run.save_sgf_dir,
                f"eval_training_steps_{training_steps}.sgf",
            )
            with open(path, "w") as f:
                f.write(content)
        return stats

    # ------------------------------------------------------------------
    def run(self, on_checkpoint: Optional[Callable[["Trainer"], None]] = None) -> None:
        """Full training loop to ``max_training_steps``."""
        cfg = self.cfg
        if cfg.run.eval_async and self.evaluator is not None and (
                not self.multihost or self.is_host0):
            self.start_async_evaluator()
        # "first" generation = the min_games warm-up, which counts the
        # replay's existing games (a crash mid-generation-1 resumes the
        # collection). A run resumed from a CHECKPOINT (training_steps > 0)
        # is past warm-up: it must collect games_per_ckpt NEW games before
        # the next training generation, like the reference's
        # games-since-last-ckpt pacing (pipeline.py:556-558) — otherwise
        # every crash-restart would immediately train a phantom generation
        # on stale replay.
        first = self.training_steps == 0
        resumed = not first
        while self.training_steps < cfg.train.max_training_steps:
            target = cfg.train.min_games if first else cfg.train.games_per_ckpt
            already = self.replay.num_games_added if first else 0
            if resumed:
                # Crash-resume mid-generation: credit the games collected
                # since the last checkpoint (training.csv logs total_games
                # per step; the restored replay carries num_games_added), so
                # a tunnel crash doesn't reset the 5k-game quota. The replay
                # snapshot may lag the crash by < save_replay_interval games
                # — the quota then overshoots slightly, never undershoots.
                at_ckpt = self._games_at_last_ckpt()
                if at_ckpt is not None:
                    already = max(0, self.replay.num_games_added - at_ckpt)
                resumed = False
            if self.multihost and first:
                already = self._mh.global_game_count(already, self.mesh)
            self.selfplay_until(max(0, target - already))
            first = False
            self.train_generation()
            self.run_evaluation()
            if on_checkpoint is not None:
                on_checkpoint(self)
        self.finish_async_evaluator()
        self.actor_writer.close()
        self.train_writer.close()
        self.eval_writer.close()


def train(cfg: AlphaZeroConfig, **kwargs) -> Trainer:
    trainer = Trainer(cfg)
    trainer.run(**kwargs)
    return trainer
