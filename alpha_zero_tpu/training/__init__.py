from alpha_zero_tpu.training.replay import Transition, UniformReplay  # noqa: F401
