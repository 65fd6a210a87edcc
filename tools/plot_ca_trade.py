"""Arrivals-vs-collisions trade curve for the CA robust recipe (VERDICT r4
next-#7): every population candidate's selection-time eval (arrival rate vs
collision rate, averaged over the select keys) from the round-5 extension
invocations, with winners marked, plus the round-4 invocations' winner-level
points — one picture of what the 93%+ arrivals band costs in collisions.

Form per the dataviz method: scatter (two measures across entities), one
axis each, a single categorical hue (candidates) with winners distinguished
by marker SHAPE + direct label (identity never color-alone).

Usage: python tools/plot_ca_trade.py [--out docs/artifacts/ca_trade_curve_r5.png]
"""

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import argparse
import json


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ext", default="docs/artifacts/ppo_ca_robust_r5_ext.json")
    p.add_argument("--r4", default="docs/artifacts/ppo_ca_robust_r4.json")
    p.add_argument("--out", default="docs/artifacts/ca_trade_curve_r5.png")
    args = p.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    ext = json.loads(Path(args.ext).read_text())
    cand_x, cand_y, win_x, win_y, win_lbl = [], [], [], [], []
    for inv in ext["invocations"]:
        for s in inv["selection"] or []:
            st = s.get("select_stats_mean") or {}
            ep = st.get("episodes", 0) or 1
            arr = st.get("arriveds", 0) / ep
            col = st.get("collisions", 0) / ep
            if s["seed"] == inv["winner_seed"]:
                win_x.append(col), win_y.append(arr)
                win_lbl.append(f"b{inv['base_seed']}")
            else:
                cand_x.append(col), cand_y.append(arr)

    r4_x, r4_y = [], []
    if Path(args.r4).exists():
        r4 = json.loads(Path(args.r4).read_text())
        for inv in r4["invocations"]:
            r4_x.append(inv["collision_mean"])
            r4_y.append(inv["arrival_mean"])

    ink = "#1f1f1f"
    muted = "#8a8a8a"
    hue = "#4f6bd5"  # one categorical hue; winners differ by SHAPE

    fig, ax = plt.subplots(figsize=(6.4, 4.6), dpi=150)
    ax.scatter(cand_x, cand_y, s=46, marker="o", facecolor="none",
               edgecolor=hue, linewidth=1.6, label="population candidate")
    ax.scatter(win_x, win_y, s=78, marker="D", color=hue,
               label="selected winner (r5 invocations)")
    for x, y, t in zip(win_x, win_y, win_lbl):
        ax.annotate(t, (x, y), textcoords="offset points", xytext=(6, 5),
                    fontsize=8, color=ink)
    if r4_x:
        ax.scatter(r4_x, r4_y, s=64, marker="s", facecolor="none",
                   edgecolor=ink, linewidth=1.4,
                   label="r4 invocation winners")

    ax.set_xlabel("collision rate at selection", color=ink)
    ax.set_ylabel("arrival rate at selection", color=ink)
    ax.set_title("CA --recipe robust: arrivals vs collisions across "
                 "population candidates", fontsize=10, color=ink)
    ax.grid(True, linewidth=0.5, color="#e3e3e3")
    ax.set_axisbelow(True)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    for s in ("left", "bottom"):
        ax.spines[s].set_color(muted)
    ax.tick_params(colors=muted, labelsize=8)
    ax.legend(fontsize=8, frameon=False)
    fig.tight_layout()
    fig.savefig(args.out)
    print(f"wrote {args.out}: {len(cand_x) + len(win_x)} r5 candidates, "
          f"{len(r4_x)} r4 winners")


if __name__ == "__main__":
    main()
