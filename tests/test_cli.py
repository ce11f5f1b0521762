"""CLI config resolution and override tests."""

import pytest

from alpha_zero_tpu.cli.common import apply_override, resolve_config
from alpha_zero_tpu import config as config_lib


def test_named_configs_resolve():
    for name in config_lib.CONFIGS:
        cfg = resolve_config(name, [])
        assert cfg.env.board_size > 0


def test_dotted_overrides():
    cfg = resolve_config("go9", [
        "train.batch_size=256",
        "env.board_size=13",
        "search.num_simulations=100",
        "train.argument_data=false",
        "train.lr_milestones=1000,2000",
        "run.log_level=DEBUG",
    ])
    assert cfg.train.batch_size == 256
    assert cfg.env.board_size == 13
    assert cfg.search.num_simulations == 100
    assert cfg.train.argument_data is False
    assert cfg.train.lr_milestones == (1000, 2000)
    assert cfg.run.log_level == "DEBUG"


def test_override_preserves_other_fields():
    base = config_lib.go9()
    cfg = apply_override(base, "train.init_lr", "0.2")
    assert cfg.train.init_lr == 0.2
    assert cfg.train.batch_size == base.train.batch_size
    assert cfg.env == base.env


def test_bad_override_raises():
    with pytest.raises(ValueError):
        resolve_config("go9", ["not_an_override"])
    with pytest.raises(AttributeError):
        resolve_config("go9", ["train.nonexistent_field=3"])


def test_unknown_config_raises():
    with pytest.raises(KeyError):
        resolve_config("nope", [])
