"""``python -m alpha_zero_tpu.cli.play`` — play against a trained agent.

Replaces the reference's eval CLIs (`eval_play/eval_agent_go.py`,
``eval_agent_go_cmd.py``, gomoku variants): terminal GTP-style input or the
Tk GUI (``--gui``). Human plays black by default (``--white`` to switch).
"""

from __future__ import annotations

import argparse
import time

import jax
import numpy as np

from alpha_zero_tpu.cli.common import enable_compile_cache, add_config_args, resolve_config
from alpha_zero_tpu.envs.host import GoEnv, GomokuEnv
from alpha_zero_tpu.eval.evaluator import make_eval_move_fn
from alpha_zero_tpu.models.resnet import build_network
from alpha_zero_tpu.training import checkpoint as ckpt_lib
from alpha_zero_tpu.training import learner as learner_lib
from alpha_zero_tpu.training.pipeline import build_engine
from alpha_zero_tpu.utils.logging import create_logger


def load_variables(cfg, ckpt_path):
    net = build_network(cfg.env, cfg.network)
    n = cfg.env.board_size
    tx, _ = learner_lib.make_optimizer(
        cfg.train.init_lr, cfg.train.lr_decay, cfg.train.lr_milestones
    )
    state = learner_lib.create_train_state(
        net, jax.random.PRNGKey(0), (n, n, cfg.env.num_planes), tx
    )
    if ckpt_path:
        state = ckpt_lib.restore_checkpoint(ckpt_path, state)
    return net, {"params": state.params, "batch_stats": state.batch_stats}


def build_host_env(cfg):
    if cfg.env.game == "go":
        return GoEnv(board_size=cfg.env.board_size, komi=cfg.env.komi,
                     num_stack=cfg.env.num_stack)
    return GomokuEnv(board_size=cfg.env.board_size, num_to_win=cfg.env.num_to_win,
                     num_stack=cfg.env.num_stack)


def terminal_play(cfg, ckpt_path, human_is_black: bool) -> None:
    """GTP-input terminal loop (parity: eval_agent_go_cmd.py:120-146)."""
    logger = create_logger()
    engine = build_engine(cfg.env)
    net, variables = load_variables(cfg, ckpt_path)
    move_fn = make_eval_move_fn(engine, net, cfg.search)
    env = build_host_env(cfg)
    human = env.black_player if human_is_black else env.white_player
    env.reset()
    env.render()
    search_times = []
    while not env.is_game_over():
        if env.to_play == human:
            action = None
            while action is None:
                raw = input('Enter your move (e.g. "D4", "pass", "resign"): ').strip()
                if raw.lower() == "resign" and env.has_resign_move:
                    action = env.resign_move
                    break
                action = env.gtp_to_action(raw)
                if action is None:
                    print("Invalid or illegal move.")
            env.step(action)
        else:
            t0 = time.time()
            _, move = move_fn(variables, env.state)
            search_times.append(time.time() - t0)
            env.step(int(move))
        env.render()
    logger.info(f"Result: {env.get_result_string()}")
    if search_times:
        logger.info(f"Avg time per AI move: {np.mean(search_times):.2f}s")


def main(argv=None) -> None:
    enable_compile_cache()
    parser = argparse.ArgumentParser(description=__doc__)
    add_config_args(parser)
    parser.add_argument("--ckpt", default="", help="checkpoint path (untrained net if empty)")
    parser.add_argument("--white", action="store_true", help="human plays white")
    parser.add_argument("--gui", action="store_true", help="use the Tk GUI")
    parser.add_argument("--ai_vs_ai", action="store_true", help="watch the agent play itself (GUI)")
    args = parser.parse_args(argv)
    cfg = resolve_config(args.config, args.set)

    if args.gui or args.ai_vs_ai:
        from alpha_zero_tpu.cli.gui import gui_play

        gui_play(cfg, args.ckpt, human_is_black=not args.white, ai_vs_ai=args.ai_vs_ai)
    else:
        terminal_play(cfg, args.ckpt, human_is_black=not args.white)


if __name__ == "__main__":
    main()
