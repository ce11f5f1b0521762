"""Dihedral-symmetry data augmentation, fused into the jitted train step.

The reference applies a random board transform on the host with torchvision
(`alpha_zero/utils/transformation.py:160-167`: with p=0.5, one of
{h_flip, v_flip, rot90, rot180, rot270}); here the same transform runs on
device inside the training step (pure ``jnp.flip``/``rot90`` + ``lax.switch``),
with the pass-move probability preserved as the last policy element
(transformation.py:21-31). The full 8-element dihedral group is also available.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

# Transform ids. 0 is identity; 1-5 match the reference's choice set
# (transformation.py:148-157); 6-7 complete the dihedral group D4.
IDENTITY, H_FLIP, V_FLIP, ROT90, ROT180, ROT270, TRANSPOSE, ANTI_TRANSPOSE = range(8)
NUM_TRANSFORMS = 8
REFERENCE_TRANSFORMS = (H_FLIP, V_FLIP, ROT90, ROT180, ROT270)


def _spatial(x: jnp.ndarray, tid: int) -> jnp.ndarray:
    """Applies transform ``tid`` (static) over axes (1, 2) of [B, N, N, ...]."""
    if tid == IDENTITY:
        return x
    if tid == H_FLIP:
        return jnp.flip(x, axis=2)
    if tid == V_FLIP:
        return jnp.flip(x, axis=1)
    if tid == ROT90:
        return jnp.rot90(x, 1, axes=(1, 2))
    if tid == ROT180:
        return jnp.rot90(x, 2, axes=(1, 2))
    if tid == ROT270:
        return jnp.rot90(x, 3, axes=(1, 2))
    if tid == TRANSPOSE:
        return jnp.swapaxes(x, 1, 2)
    if tid == ANTI_TRANSPOSE:
        return jnp.flip(jnp.flip(jnp.swapaxes(x, 1, 2), 1), 2)
    raise ValueError(f"bad transform id {tid}")


def _split_pi(pi: jnp.ndarray, n: int) -> Tuple[jnp.ndarray, jnp.ndarray | None]:
    """[B, N*N(+1)] -> ([B, N, N], pass column or None)."""
    has_pass = pi.shape[-1] == n * n + 1
    if has_pass:
        return pi[..., :-1].reshape(-1, n, n), pi[..., -1:]
    return pi.reshape(-1, n, n), None


def apply_transform(
    states: jnp.ndarray, pi: jnp.ndarray, tid: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Applies one (static) transform to NHWC states and flat policies."""
    n = states.shape[1]
    board_pi, pass_prob = _split_pi(pi, n)
    states_t = _spatial(states, tid)
    board_t = _spatial(board_pi[..., None], tid)[..., 0].reshape(pi.shape[0], -1)
    if pass_prob is not None:
        board_t = jnp.concatenate([board_t, pass_prob], axis=-1)
    return states_t, board_t


def apply_random_transformation(
    rng: jax.Array,
    states: jnp.ndarray,
    pi: jnp.ndarray,
    values: jnp.ndarray,
    full_group: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Random augmentation with the reference's distribution: identity with
    p=0.5, else uniform over the 5 reference transforms (or all 7 non-identity
    transforms when ``full_group``). One transform per batch, like the
    reference (transformation.py:163-165)."""
    rng_do, rng_pick = jax.random.split(rng)
    choices = list(REFERENCE_TRANSFORMS) if not full_group else list(range(1, 8))
    pick = jax.random.randint(rng_pick, (), 0, len(choices))
    tid = jnp.where(jax.random.bernoulli(rng_do, 0.5), 0, pick + 1)

    branches = [
        (lambda t: lambda ops: apply_transform(ops[0], ops[1], t))(t)
        for t in [0] + choices
    ]
    states_t, pi_t = jax.lax.switch(tid, branches, (states, pi))
    return states_t, pi_t, values
