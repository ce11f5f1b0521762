from alpha_zero_tpu.ops.symmetry import (  # noqa: F401
    NUM_TRANSFORMS,
    apply_random_transformation,
    apply_transform,
)
