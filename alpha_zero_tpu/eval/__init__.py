from alpha_zero_tpu.eval.elo import EloRating, get_k_factor  # noqa: F401
