"""Jitted learner: SGD+momentum train step with fused dihedral augmentation.

Parity targets in the reference:
- loss (`compute_losses` pipeline.py:634-653): softmax cross-entropy on the
  policy against the full search distribution + MSE on the tanh value;
- optimizer (training_go.py:267-273): SGD momentum 0.9, L2 weight decay 1e-4
  (applied to every parameter, like torch's SGD weight_decay), MultiStepLR
  becomes an optax piecewise-constant schedule;
- augmentation applied to the sampled batch inside the step
  (pipeline.py:642-643) — here fused on device.

Multi-chip: the train step is sharding-agnostic — shard the batch over a
'dp' mesh axis with NamedSharding and XLA inserts the psum gradient
collectives over ICI (see parallel/mesh.py).
"""

from __future__ import annotations

import functools
from typing import Any, Mapping, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from alpha_zero_tpu.ops.symmetry import apply_random_transformation


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    training_steps: jnp.ndarray  # int32


class TrainMetrics(NamedTuple):
    policy_loss: jnp.ndarray
    value_loss: jnp.ndarray
    learning_rate: jnp.ndarray


def make_lr_schedule(init_lr: float, lr_decay: float, milestones) -> optax.Schedule:
    """MultiStepLR equivalent: multiply by ``lr_decay`` at each milestone."""
    return optax.piecewise_constant_schedule(
        init_value=init_lr,
        boundaries_and_scales={int(m): lr_decay for m in milestones},
    )


def make_optimizer(init_lr: float, lr_decay: float, milestones,
                   momentum: float = 0.9, weight_decay: float = 1e-4):
    """SGD + momentum + L2, matching torch.optim.SGD semantics: the decay
    term enters the gradient *before* the momentum buffer."""
    schedule = make_lr_schedule(init_lr, lr_decay, milestones)
    tx = optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.trace(decay=momentum, nesterov=False),
        optax.scale_by_learning_rate(schedule),
    )
    return tx, schedule


def create_train_state(net, rng: jax.Array, obs_shape: Tuple[int, ...], tx) -> TrainState:
    dummy = jnp.zeros((1,) + tuple(obs_shape), jnp.int8)
    variables = net.init(rng, dummy, train=False)
    return TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        training_steps=jnp.int32(0),
    )


def loss_fn(params, batch_stats, net, states, target_pi, target_v, rng,
            argument_data: bool):
    if argument_data:
        states, target_pi, target_v = apply_random_transformation(
            rng, states.astype(jnp.float32), target_pi, target_v
        )
    out, mutated = net.apply(
        {"params": params, "batch_stats": batch_stats},
        states, train=True, mutable=["batch_stats"],
    )
    # Cross-entropy with a full distribution target (F.cross_entropy on prob
    # targets, pipeline.py:648).
    log_probs = jax.nn.log_softmax(out.pi_logits, axis=-1)
    policy_loss = -(target_pi * log_probs).sum(axis=-1).mean()
    value_loss = jnp.mean(jnp.square(out.value - target_v))
    total = policy_loss + value_loss
    return total, (policy_loss, value_loss, mutated["batch_stats"])


def make_train_step(net, tx, schedule, argument_data: bool = True):
    """Returns jitted ``train_step(state, batch, rng) -> (state, metrics)``.

    ``batch`` = (states int8 NHWC, target_pi f32, target_v f32). Buffers are
    donated; shard the batch over 'dp' for multi-chip data parallelism.
    """

    def train_step(state: TrainState, states, target_pi, target_v, rng):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (pi_l, v_l, new_bs)), grads = grad_fn(
            state.params, state.batch_stats, net, states, target_pi, target_v,
            rng, argument_data,
        )
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt_state,
            training_steps=state.training_steps + 1,
        )
        metrics = TrainMetrics(
            policy_loss=pi_l,
            value_loss=v_l,
            learning_rate=schedule(state.training_steps),
        )
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,))
