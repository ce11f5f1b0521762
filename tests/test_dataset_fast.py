"""Fast (batched lockstep) dataset builder must match the per-game host path
on real pro-game SGFs from the reference corpus."""

import os
import shutil

import numpy as np
import pytest

from alpha_zero_tpu.eval import dataset as dataset_lib

CORPUS = "/root/reference/games/pro_games/go/9x9"


@pytest.mark.skipif(not os.path.isdir(CORPUS), reason="reference corpus unavailable")
def test_fast_matches_slow_on_real_corpus(tmp_path):
    files = sorted(
        os.path.join(root, f)
        for root, _, fs in os.walk(CORPUS)
        for f in fs if f.endswith(".sgf")
    )[:40]
    assert files, "no SGF files found"
    for f in files:
        shutil.copy(f, tmp_path / os.path.basename(f))

    slow = dataset_lib.build_eval_dataset(str(tmp_path), board_size=9, num_stack=8,
                                          fast=False)
    fast = dataset_lib.build_eval_dataset(str(tmp_path), board_size=9, num_stack=8,
                                          fast=True)
    assert fast.num_games == slow.num_games
    assert len(fast) == len(slow)
    # Chunks are length-sorted so row order may differ; compare as multisets
    # via a canonical sort of (value, move-index, obs bytes).
    def canon(ds):
        keys = [
            (float(v), int(p.argmax()), s.tobytes())
            for s, p, v in zip(ds.states, ds.target_pi, ds.target_v)
        ]
        return sorted(keys)

    assert canon(fast) == canon(slow)
    assert fast.mismatch_stats == slow.mismatch_stats
