from alpha_zero_tpu.models.resnet import AlphaZeroNet, NetworkOutputs  # noqa: F401
