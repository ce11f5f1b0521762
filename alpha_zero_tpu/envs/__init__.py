from alpha_zero_tpu.envs.types import GameState, BLACK, WHITE, EMPTY  # noqa: F401
from alpha_zero_tpu.envs.go import GoEngine  # noqa: F401
from alpha_zero_tpu.envs.gomoku import GomokuEngine  # noqa: F401
from alpha_zero_tpu.envs.host import GoEnv, GomokuEnv  # noqa: F401
