from alpha_zero_tpu.search.mcts import (  # noqa: F401
    SearchResult,
    Tree,
    batched_search,
    policy_from_counts,
    sample_move,
)
