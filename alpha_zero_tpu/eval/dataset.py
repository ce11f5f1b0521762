"""Pro-game evaluation dataset builder (SGF -> tensors), host-side.

Functional port of the reference builder (`alpha_zero/core/eval_dataset.py:80-277`)
using our own SGF parser and the JAX-backed host GoEnv. Filters preserved:
board-size match, a valid non-timeout result, minimum Elo 2100 when ratings
are recoverable, duplicate-game detection, at most 200 games per player.
Each surviving game is replayed through the engine to produce
(observation, one-hot human move, +-1 value) tuples, and the engine's score is
cross-checked against the SGF result (mismatch accounting preserved).

Observations are stored NHWC int8 (device layout) rather than CHW float.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from alpha_zero_tpu.envs.host import GoEnv
from alpha_zero_tpu.utils import sgf as sgf_lib
from alpha_zero_tpu.utils.logging import create_logger


@dataclass
class EvalDataset:
    states: np.ndarray     # [M, N, N, C] int8 (NHWC)
    target_pi: np.ndarray  # [M, A] float32 one-hot human moves
    target_v: np.ndarray   # [M] float32 +-1 outcomes
    num_games: int = 0
    mismatch_stats: Dict[str, int] = field(default_factory=dict)

    def __len__(self) -> int:
        return len(self.target_v)


def get_sgf_files(games_dir: str) -> List[str]:
    results = []
    if os.path.exists(games_dir):
        for root, _, filenames in os.walk(games_dir):
            for f in filenames:
                if f.endswith(".sgf"):
                    results.append(os.path.join(root, f))
    return sorted(results)


def _player_str(player: Optional[str]) -> str:
    player = player or ""
    player = re.sub(r"\([^)]*\)", "", player)
    player = re.sub(r"[^a-zA-Z0-9 ]", "", player)
    return player.strip()


def _extract_ratings(black_player, white_player, black_rank, white_rank) -> List[int]:
    """Elo from rank props ('BR[2345]') or embedded in names ('PW[Bob (2435)]');
    dan/kyu/pro ranks like '9d' are skipped (eval_dataset.py:56-76)."""
    ratings: List[int] = []
    if all(
        rank is not None and rank != "" and "k" not in rank and "d" not in rank and "p" not in rank
        for rank in (black_rank, white_rank)
    ):
        for rank in (black_rank, white_rank):
            try:
                ratings.append(int(re.sub(r"[^0-9]", "", rank)))
            except Exception:
                pass
    elif all(
        p is not None and "(" in p and ")" in p for p in (black_player, white_player)
    ):
        for player_id in (black_player, white_player):
            elo = re.search(r"\((\d+)\)", player_id)
            if elo:
                ratings.append(int(elo.group(1)))
    return ratings


class DatasetBuilder:
    """Stateful builder (dedup + per-player caps live across files)."""

    def __init__(self, board_size: int, num_stack: int, logger=None,
                 min_elo: int = 2100, max_games_per_player: int = 200,
                 skip_n: int = 0) -> None:
        self.board_size = board_size
        self.num_stack = num_stack
        self.logger = logger or create_logger()
        self.min_elo = min_elo
        self.max_games_per_player = max_games_per_player
        self.skip_n = skip_n
        self.game_counts: Dict[str, int] = {}
        self.matches: set = set()
        self.mismatch = {
            "winner_mismatch": 0,
            "score_mismatch": 0,
            "score_mismatch_le_1": 0,
            "score_mismatch_gt_1_le_2": 0,
            "score_mismatch_gt_2_le_4": 0,
            "score_mismatch_gt_4": 0,
        }

    def replay_sgf(self, sgf_file: str) -> Optional[List[Tuple[np.ndarray, np.ndarray, float]]]:
        try:
            with open(sgf_file) as f:
                content = f.read()
            game = sgf_lib.parse_sgf(content)
        except Exception:
            return None

        if game.board_size is None or game.board_size != self.board_size:
            return None
        result_str = game.result
        if result_str is None or len(result_str) < 3:
            return None
        if re.search(r"\+T", result_str):  # timeout: no natural winner
            return None

        black_player = game.prop("PB")
        white_player = game.prop("PW")
        ratings = _extract_ratings(black_player, white_player,
                                   game.prop("BR"), game.prop("WR"))
        if ratings and any(v < self.min_elo for v in ratings):
            return None

        black_id = _player_str(black_player)
        white_id = _player_str(white_player)
        num_moves = len(game.moves)
        match_str = f"{black_id}-{white_id}-{num_moves}-{result_str}"
        if match_str in self.matches:
            return None
        self.matches.add(match_str)

        for pid in (black_id, white_id):
            if self.game_counts.get(pid, 0) > self.max_games_per_player:
                return None
            self.game_counts[pid] = self.game_counts.get(pid, 0) + 1

        komi = game.komi or 0.0
        env = GoEnv(board_size=self.board_size, komi=komi, num_stack=self.num_stack)
        winner = sgf_lib.parse_game_result(result_str)

        history: List[Tuple[np.ndarray, np.ndarray, float]] = []
        obs_nhwc = np.transpose(env.observation(), (1, 2, 0))
        for color, sgf_coord in game.moves:
            player = env.black_player if color == "B" else env.white_player
            move = env.cc.to_flat(env.cc.from_sgf(sgf_coord))
            if not env.is_legal_move(move):
                return None
            if env.to_play != player:  # handicap / out-of-turn games
                return None
            value = 0.0
            if winner != 0:
                value = 1.0 if (winner == 1) == (player == env.black_player) else -1.0
            if env.steps > self.skip_n:
                one_hot = np.zeros(env.action_dim, np.float32)
                one_hot[move] = 1.0
                history.append((obs_nhwc.astype(np.int8), one_hot, value))
            try:
                obs_chw, _, _, _ = env.step(move)
            except Exception:
                return None
            obs_nhwc = np.transpose(obs_chw, (1, 2, 0))

        if env.steps != num_moves:
            return None

        self._check_mismatch(env, result_str, sgf_file)
        return history

    def _check_mismatch(self, env: GoEnv, result_str: str, sgf_file: str) -> None:
        env_result = env.get_result_string().upper()
        result_str = result_str.upper()
        if re.search(r"\+T", result_str) or re.search(r"\+R", result_str):
            return
        if env_result[:2] != result_str[:2]:
            self.mismatch["winner_mismatch"] += 1
            return
        sgf_score = re.findall(r"[-+]?\d*\.\d+|\d+", result_str)
        env_score = re.findall(r"[-+]?\d*\.\d+|\d+", env_result)
        sgf_val = float(sgf_score[0]) if sgf_score else None
        env_val = float(env_score[0]) if env_score else None
        if sgf_val != env_val:
            self.mismatch["score_mismatch"] += 1
            delta = abs((sgf_val or 0) - (env_val or 0))
            if delta <= 1:
                self.mismatch["score_mismatch_le_1"] += 1
            elif delta <= 2:
                self.mismatch["score_mismatch_gt_1_le_2"] += 1
            elif delta <= 4:
                self.mismatch["score_mismatch_gt_2_le_4"] += 1
            else:
                self.mismatch["score_mismatch_gt_4"] += 1


def build_eval_dataset(games_dir: str, board_size: int, num_stack: int,
                       logger=None, **kwargs) -> EvalDataset:
    logger = logger or create_logger()
    builder = DatasetBuilder(board_size, num_stack, logger, **kwargs)
    states, target_pi, target_v = [], [], []
    valid_games = 0
    for sgf_file in get_sgf_files(games_dir):
        history = builder.replay_sgf(sgf_file)
        if history is None:
            continue
        valid_games += 1
        for s, p, v in history:
            states.append(s)
            target_pi.append(p)
            target_v.append(v)

    if not states:
        n = board_size
        c = 2 * num_stack + 1
        return EvalDataset(
            states=np.zeros((0, n, n, c), np.int8),
            target_pi=np.zeros((0, n * n + 1), np.float32),
            target_v=np.zeros((0,), np.float32),
            num_games=0,
            mismatch_stats=builder.mismatch,
        )
    dataset = EvalDataset(
        states=np.stack(states),
        target_pi=np.stack(target_pi),
        target_v=np.asarray(target_v, np.float32),
        num_games=valid_games,
        mismatch_stats=builder.mismatch,
    )
    logger.info(f"Finished loading {len(dataset)} positions from {valid_games} games")
    return dataset
