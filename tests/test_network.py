"""Network shape/structure tests (the reference has none; parity via config)."""

import jax
import jax.numpy as jnp
import numpy as np

from alpha_zero_tpu.models.resnet import AlphaZeroNet, count_params


def test_forward_shapes_go9():
    net = AlphaZeroNet(num_actions=82, num_res_blocks=2, num_filters=32, num_fc_units=32)
    x = jnp.zeros((4, 9, 9, 17), jnp.int8)
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    out = net.apply(variables, x, train=False)
    assert out.pi_logits.shape == (4, 82)
    assert out.value.shape == (4,)
    assert np.all(np.abs(np.asarray(out.value)) <= 1.0)


def test_gomoku_padding_stem():
    # Padding-3 stem grows the spatial dims by 4 (reference network.py:100-105).
    net = AlphaZeroNet(num_actions=81, num_res_blocks=1, num_filters=16,
                       num_fc_units=16, gomoku=True)
    x = jnp.zeros((2, 9, 9, 17), jnp.int8)
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    out = net.apply(variables, x, train=False)
    assert out.pi_logits.shape == (2, 81)
    # policy FC input = 2 * (9+4)^2 = 338
    pol_dense = variables["params"]["Dense_0"]["kernel"]
    assert pol_dense.shape == (2 * 13 * 13, 81)


def test_param_count_matches_reference_11b128():
    """The trained 9x9 Go config (10 blocks x 128 filters) must have the same
    parameter count as the reference torch model (az_analysis.py counts)."""
    net = AlphaZeroNet(num_actions=82, num_res_blocks=10, num_filters=128, num_fc_units=128)
    x = jnp.zeros((1, 9, 9, 17), jnp.int8)
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    n_params = count_params(variables["params"])

    # Reference count: stem conv 17*128*9 + bn 2*128
    # 10 blocks * (2 * (128*128*9 + 2*128))
    # policy: 128*2 + 2*2 + (2*81)*82 + 82
    # value: 128*1 + 2*1 + 81*128 + 128 + 128*1 + 1
    expected = (
        17 * 128 * 9 + 2 * 128
        + 10 * 2 * (128 * 128 * 9 + 2 * 128)
        + (128 * 2 + 2 * 2 + 2 * 81 * 82 + 82)
        + (128 * 1 + 2 * 1 + 81 * 128 + 128 + 128 * 1 + 1)
    )
    assert n_params == expected


def test_batchnorm_updates_in_train_mode():
    net = AlphaZeroNet(num_actions=26, num_res_blocks=1, num_filters=8, num_fc_units=8)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 5, 5, 17))
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    out, mutated = net.apply(variables, x, train=True, mutable=["batch_stats"])
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(mutated["batch_stats"])
    assert any(not np.allclose(b, a) for b, a in zip(before, after))
