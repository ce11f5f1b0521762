"""Test configuration: force a virtual 8-device CPU platform.

Multi-chip sharding paths are exercised on a fake mesh of 8 CPU devices
(standing in for a TPU slice), as recommended for host-level testing of
``jax.sharding`` programs. Must run before JAX initializes its backends.
"""

import os

# Force-override: the session environment pre-sets JAX_PLATFORMS=axon (the
# tunneled TPU) and its sitecustomize imports jax at interpreter startup, so
# plain env-var assignment is too late — use jax.config.update instead.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (xla_flags + " --xla_force_host_platform_device_count=8").strip()

import sys  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: makes repeated test runs fast.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

REFERENCE_PATH = "/root/reference"


def install_reference_shims():
    """Installs tiny stand-ins for 'gym' and 'sgf' so the reference envs and
    mcts_v2 import as test oracles (those packages aren't in this image)."""
    import types

    if "gym" not in sys.modules:
        gym = types.ModuleType("gym")
        spaces = types.ModuleType("gym.spaces")

        class Env:
            def reset(self, **kwargs):
                return None

            def close(self):
                return None

        class Box:
            def __init__(self, low=None, high=None, shape=None, dtype=None):
                self.shape = shape

        class Discrete:
            def __init__(self, n):
                self.n = n

        gym.Env = Env
        spaces.Box = Box
        spaces.Discrete = Discrete
        gym.spaces = spaces
        sys.modules["gym"] = gym
        sys.modules["gym.spaces"] = spaces

    if "sgf" not in sys.modules:
        sgf = types.ModuleType("sgf")

        def parse(_):
            raise NotImplementedError("sgf parsing shim")

        sgf.parse = parse
        sys.modules["sgf"] = sgf


def reference_go_engine(board_size: int):
    """Import the reference Go engine as a move-for-move parity oracle.

    The reference reads the board size from the BOARD_SIZE env var at import
    time (go_engine.py:31), so we reload the module per requested size.
    """
    import importlib

    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    os.environ["BOARD_SIZE"] = str(board_size)
    import alpha_zero.envs.go_engine as go_engine  # type: ignore

    if go_engine.N != board_size:
        go_engine = importlib.reload(go_engine)
    assert go_engine.N == board_size
    return go_engine
