"""Dihedral augmentation tests (parity: unit_tests/utils/transformation_test.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alpha_zero_tpu.ops import symmetry


def make_data(n=5, has_pass=True, batch=3, channels=4, seed=0):
    rng = np.random.RandomState(seed)
    states = rng.rand(batch, n, n, channels).astype(np.float32)
    a = n * n + (1 if has_pass else 0)
    pi = rng.rand(batch, a).astype(np.float32)
    pi /= pi.sum(-1, keepdims=True)
    values = rng.rand(batch).astype(np.float32)
    return jnp.asarray(states), jnp.asarray(pi), jnp.asarray(values)


@pytest.mark.parametrize("tid", range(symmetry.NUM_TRANSFORMS))
@pytest.mark.parametrize("has_pass", [True, False])
def test_state_and_policy_transform_consistently(tid, has_pass):
    """The policy board plane must undergo the same spatial map as the state."""
    n = 5
    states, pi, _ = make_data(n=n, has_pass=has_pass)
    states_t, pi_t = symmetry.apply_transform(states, pi, tid)

    # Re-derive: transform the pi board exactly like a state plane.
    board_pi = pi[:, : n * n].reshape(-1, n, n, 1)
    expected_board = symmetry._spatial(board_pi, tid)[..., 0].reshape(pi.shape[0], -1)
    np.testing.assert_allclose(np.asarray(pi_t[:, : n * n]), np.asarray(expected_board))
    if has_pass:
        np.testing.assert_allclose(np.asarray(pi_t[:, -1]), np.asarray(pi[:, -1]))
    np.testing.assert_allclose(
        np.asarray(states_t), np.asarray(symmetry._spatial(states, tid))
    )


@pytest.mark.parametrize("tid", range(symmetry.NUM_TRANSFORMS))
def test_transforms_are_bijections(tid):
    n = 5
    states, pi, _ = make_data(n=n)
    states_t, pi_t = symmetry.apply_transform(states, pi, tid)
    # Policy mass preserved, state multiset preserved.
    np.testing.assert_allclose(np.asarray(pi_t.sum(-1)), np.asarray(pi.sum(-1)), rtol=1e-6)
    np.testing.assert_allclose(
        np.sort(np.asarray(states_t).reshape(3, -1), -1),
        np.sort(np.asarray(states).reshape(3, -1), -1),
    )


def test_hflip_golden():
    n = 3
    states = jnp.arange(9, dtype=jnp.float32).reshape(1, 3, 3, 1)
    pi = jnp.arange(10, dtype=jnp.float32).reshape(1, 10)
    states_t, pi_t = symmetry.apply_transform(states, pi, symmetry.H_FLIP)
    np.testing.assert_array_equal(
        np.asarray(states_t[0, :, :, 0]),
        np.array([[2, 1, 0], [5, 4, 3], [8, 7, 6]], np.float32),
    )
    np.testing.assert_array_equal(
        np.asarray(pi_t[0]), np.array([2, 1, 0, 5, 4, 3, 8, 7, 6, 9], np.float32)
    )


def test_random_transformation_identity_half_the_time():
    states, pi, values = make_data()
    n_identity = 0
    trials = 60
    fn = jax.jit(symmetry.apply_random_transformation)
    for i in range(trials):
        rng = jax.random.PRNGKey(i)
        s_t, p_t, v_t = fn(rng, states, pi, values)
        if np.allclose(np.asarray(s_t), np.asarray(states)):
            n_identity += 1
        np.testing.assert_allclose(np.asarray(v_t), np.asarray(values))
    assert 0.35 < n_identity / trials < 0.65


def test_random_transformation_jits():
    states, pi, values = make_data()
    fn = jax.jit(symmetry.apply_random_transformation)
    s_t, p_t, v_t = fn(jax.random.PRNGKey(3), states, pi, values)
    assert s_t.shape == states.shape and p_t.shape == pi.shape
