"""Coordinate conversion tests (mirrors reference unit_tests/envs coverage)."""

import pytest

from alpha_zero_tpu.utils.coords import CoordsConvertor


@pytest.mark.parametrize("n", [5, 9, 13, 19])
def test_flat_round_trip(n):
    cc = CoordsConvertor(n)
    for flat in range(n * n):
        assert cc.to_flat(cc.from_flat(flat)) == flat
    assert cc.from_flat(n * n) is None
    assert cc.to_flat(None) == n * n


def test_gtp_9x9():
    cc = CoordsConvertor(9)
    # GTP skips 'I'; rows count from the bottom.
    assert cc.from_gtp("A9") == (0, 0)
    assert cc.from_gtp("J9") == (0, 8)
    assert cc.from_gtp("A1") == (8, 0)
    assert cc.from_gtp("D4") == (5, 3)
    assert cc.to_gtp((0, 0)) == "A9"
    assert cc.to_gtp((8, 8)) == "J1"
    assert cc.from_gtp("pass") is None
    assert cc.to_gtp(None) == "pass"


def test_gtp_19x19():
    cc = CoordsConvertor(19)
    assert cc.from_gtp("A19") == (0, 0)
    assert cc.from_gtp("T19") == (0, 18)
    assert cc.to_gtp((0, 18)) == "T19"


def test_sgf():
    cc = CoordsConvertor(19)
    assert cc.from_sgf("aa") == (0, 0)
    assert cc.to_sgf((0, 0)) == "aa"
    assert cc.from_sgf("") is None
    assert cc.from_sgf("tt") is None  # pass for N <= 19
    assert cc.to_sgf(None) == ""
    assert cc.from_sgf("sa") == (0, 18)


def test_gtp_round_trip_all_points():
    cc = CoordsConvertor(9)
    for flat in range(81):
        coord = cc.from_flat(flat)
        assert cc.from_gtp(cc.to_gtp(coord)) == coord
