"""Overlay the matched-config go9 run's evaluation curves on the reference's.

Produces the learning-curve-parity figure VERDICT r4 asked for: pro-move
top-1/3/5 accuracy, value MSE, and policy entropy from THIS repo's
``evaluation.csv`` against the reference's committed curves
(/root/reference/logs/go/9x9/evaluation.csv), aligned BOTH by
``training_steps`` and by ``total_games`` (games are joined in from each
run's training.csv, which logs total_games per step).

Usage:
  python tools/overlay_curves.py --ours logs/go/9x9_matched \
      --ref /root/reference/logs/go/9x9 --out logs/go/9x9_matched/overlay.png
"""

from __future__ import annotations

import argparse
import os
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import pandas as pd  # noqa: E402

# Categorical slots 1/2 of the validated default palette (CVD-checked pair).
C_OURS = "#2a78d6"   # blue — this repo (TPU)
C_REF = "#eb6834"    # orange — reference fleet
INK = "#0b0b0b"
INK2 = "#52514e"
GRID = "#e6e5e1"


def load(run_dir: str):
    ev = pd.read_csv(os.path.join(run_dir, "evaluation.csv"))
    # Merge in offline-backfilled rows (tools/backfill_eval.py) for
    # checkpoints whose in-run evaluation was lost to a tunnel crash.
    bf_path = os.path.join(run_dir, "evaluation_backfill.csv")
    if os.path.exists(bf_path):
        bf = pd.read_csv(bf_path)
        missing = bf[~bf["training_steps"].isin(ev["training_steps"])]
        ev = pd.concat([ev, missing], ignore_index=True)
    ev = ev.sort_values("training_steps").reset_index(drop=True)
    tr = pd.read_csv(os.path.join(run_dir, "training.csv"))
    games = tr.groupby("training_steps")["total_games"].max()
    # Counter-reset correction: total_games mirrors replay.num_games_added,
    # which restarts from ~0 if a crash loses the replay snapshot; the games
    # were still PLAYED, so accumulate across resets like any monotonic
    # counter.
    vals = games.to_list()
    offset, prev, corr = 0, None, []
    for v in vals:
        if prev is not None and v < prev:
            offset += prev
        corr.append(v + offset)
        prev = v
    games = pd.Series(corr, index=games.index)
    ev["total_games"] = ev["training_steps"].map(
        lambda s: float(games.reindex(games.index.union([s]))
                        .interpolate("index").loc[s]))
    return ev


def style(ax, title, xlabel):
    ax.set_title(title, fontsize=10, color=INK, loc="left")
    ax.set_xlabel(xlabel, fontsize=8, color=INK2)
    ax.tick_params(labelsize=8, colors=INK2)
    ax.grid(True, color=GRID, linewidth=0.6)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    for s in ("left", "bottom"):
        ax.spines[s].set_color(GRID)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--ours", default="logs/go/9x9_matched")
    p.add_argument("--ref", default="/root/reference/logs/go/9x9")
    p.add_argument("--out", default="logs/go/9x9_matched/overlay.png")
    p.add_argument("--max-steps", type=int, default=0,
                   help="clip both runs to this many training steps "
                        "(0 = ours' max)")
    args = p.parse_args()

    ours = load(args.ours)
    ref = load(args.ref)
    max_steps = args.max_steps or int(ours["training_steps"].max())
    ours = ours[ours["training_steps"] <= max_steps]
    refc = ref[ref["training_steps"] <= max_steps]
    max_games = float(ours["total_games"].max())
    refg = ref[ref["total_games"] <= max_games * 1.05]

    fig, axes = plt.subplots(2, 3, figsize=(12.5, 7), dpi=160)
    fig.patch.set_facecolor("#fcfcfb")
    for ax in axes.ravel():
        ax.set_facecolor("#fcfcfb")

    panels = [
        ("policy_top_1_accuracy", "Pro-move top-1 accuracy"),
        ("value_mse_error", "Value MSE on pro games"),
        ("policy_entropy", "Policy entropy"),
    ]
    for col, (field, title) in enumerate(panels):
        # Row 0: aligned by optimizer steps.
        ax = axes[0][col]
        ax.plot(refc["training_steps"], refc[field], color=C_REF, lw=2,
                label="reference (GPU fleet)")
        ax.plot(ours["training_steps"], ours[field], color=C_OURS, lw=2,
                label="this repo (TPU)")
        style(ax, title, "training steps")
        # Row 1: aligned by self-play games consumed.
        ax = axes[1][col]
        ax.plot(refg["total_games"], refg[field], color=C_REF, lw=2)
        ax.plot(ours["total_games"], ours[field], color=C_OURS, lw=2)
        style(ax, title, "total self-play games")

    axes[0][0].legend(fontsize=8, frameon=False, loc="upper left",
                      labelcolor=INK)
    fig.suptitle(
        f"go9 matched-config learning curves - this repo vs reference "
        f"(to step {max_steps:,})",
        fontsize=12, color=INK, x=0.01, ha="left")
    fig.tight_layout(rect=(0, 0, 1, 0.96))
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    fig.savefig(args.out, facecolor=fig.get_facecolor())
    print(f"wrote {args.out}")

    # Numeric verdict rows at the last shared checkpoints.
    for label, (o_key, r_df, r_key) in {
        "steps": ("training_steps", refc, "training_steps"),
        "games": ("total_games", refg, "total_games"),
    }.items():
        if not len(r_df):
            continue
        o_last = ours.iloc[-1]
        r_last = r_df.iloc[(r_df[r_key] - o_last[o_key]).abs().argmin()]
        print(f"[{label}-aligned] ours @{o_last[o_key]:.0f}: "
              f"top1={o_last['policy_top_1_accuracy']:.3f} "
              f"mse={o_last['value_mse_error']:.3f} | "
              f"ref @{r_last[r_key]:.0f}: "
              f"top1={r_last['policy_top_1_accuracy']:.3f} "
              f"mse={r_last['value_mse_error']:.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
