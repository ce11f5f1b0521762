"""AlphaZero policy/value ResNet in Flax.

Head-for-head mirror of the reference network (`alpha_zero/core/network.py:85-173`):
conv stem (3x3, padding 1; padding 3 for Gomoku to fix edge blindness,
network.py:100-105) -> K residual blocks (Conv3x3-BN-ReLU x2 + skip) ->
policy head (1x1 conv to 2ch -> BN -> ReLU -> FC to num_actions) and
value head (1x1 conv to 1ch -> BN -> ReLU -> FC -> ReLU -> FC(1) -> tanh).
Kaiming-uniform init, zero biases (network.py:30-39).

TPU-native deltas:
- NHWC layout (channel-last) so convs tile directly onto the MXU.
- configurable compute dtype (bfloat16 on TPU; fp32 master params).
- the flatten order in the heads is HWC rather than CHW — an equivalent
  permutation of FC inputs (networks are trained from scratch, not ported).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

# torch kaiming_uniform_(nonlinearity='relu'): U(+-sqrt(6 / fan_in)).
kaiming_uniform = nn.initializers.variance_scaling(2.0, "fan_in", "uniform")


class NetworkOutputs(NamedTuple):
    pi_logits: jnp.ndarray  # [B, num_actions]
    value: jnp.ndarray      # [B] in [-1, 1], current player's perspective


class ResNetBlock(nn.Module):
    """Basic residual block (network.py:42-82)."""

    num_filters: int
    dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        residual = x
        y = nn.Conv(self.num_filters, (3, 3), padding=1, use_bias=False,
                    kernel_init=kaiming_uniform, dtype=self.dtype)(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         axis_name=self.bn_axis_name, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.num_filters, (3, 3), padding=1, use_bias=False,
                    kernel_init=kaiming_uniform, dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         axis_name=self.bn_axis_name, dtype=self.dtype)(y)
        return nn.relu(y + residual)


class AlphaZeroNet(nn.Module):
    """Policy + value network over stacked board planes (NHWC int8/float)."""

    num_actions: int
    num_res_blocks: int = 10
    num_filters: int = 128
    num_fc_units: int = 128
    gomoku: bool = False  # padding-3 stem (network.py:100-105)
    dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> NetworkOutputs:
        """x: [B, N, N, C] board planes; returns logits and tanh value."""
        x = x.astype(self.dtype)
        pad = 3 if self.gomoku else 1

        y = nn.Conv(self.num_filters, (3, 3), padding=pad, use_bias=False,
                    kernel_init=kaiming_uniform, dtype=self.dtype)(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         axis_name=self.bn_axis_name, dtype=self.dtype)(y)
        y = nn.relu(y)

        for _ in range(self.num_res_blocks):
            y = ResNetBlock(self.num_filters, dtype=self.dtype,
                            bn_axis_name=self.bn_axis_name)(y, train=train)

        # Policy head.
        p = nn.Conv(2, (1, 1), use_bias=False, kernel_init=kaiming_uniform,
                    dtype=self.dtype)(y)
        p = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         axis_name=self.bn_axis_name, dtype=self.dtype)(p)
        p = nn.relu(p)
        p = p.reshape(p.shape[0], -1)
        pi_logits = nn.Dense(self.num_actions, kernel_init=kaiming_uniform,
                             bias_init=nn.initializers.zeros, dtype=self.dtype)(p)

        # Value head.
        v = nn.Conv(1, (1, 1), use_bias=False, kernel_init=kaiming_uniform,
                    dtype=self.dtype)(y)
        v = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         axis_name=self.bn_axis_name, dtype=self.dtype)(v)
        v = nn.relu(v)
        v = v.reshape(v.shape[0], -1)
        v = nn.Dense(self.num_fc_units, kernel_init=kaiming_uniform,
                     bias_init=nn.initializers.zeros, dtype=self.dtype)(v)
        v = nn.relu(v)
        v = nn.Dense(1, kernel_init=kaiming_uniform,
                     bias_init=nn.initializers.zeros, dtype=self.dtype)(v)
        value = jnp.tanh(v.astype(jnp.float32)).squeeze(-1)

        return NetworkOutputs(pi_logits=pi_logits.astype(jnp.float32), value=value)


def build_network(env_cfg, net_cfg) -> AlphaZeroNet:
    """Constructs the net for an (EnvConfig, NetworkConfig) pair."""
    return AlphaZeroNet(
        num_actions=env_cfg.num_actions,
        num_res_blocks=net_cfg.num_res_blocks,
        num_filters=net_cfg.num_filters,
        num_fc_units=net_cfg.num_fc_units,
        gomoku=net_cfg.gomoku,
        dtype=jnp.dtype(net_cfg.inference_dtype)
        if net_cfg.inference_dtype != "float32" else jnp.float32,
    )


def count_params(params) -> int:
    import jax

    return sum(p.size for p in jax.tree.leaves(params))
