"""Tabulate stabilizer-ablation arms (scripts/runs/run_ablations_r4.sh).

Reads each ``runs/ablations_r4/<arm>/metrics_train.jsonl`` and prints one
row per arm: peak / final fine accuracy, final loss, collapse verdict and
the epoch the collapse started.  Collapse = fine accuracy falling to
<= max(1.5 * chance, 0.4 * running peak) after having exceeded 3x chance,
or the tanh term saturating at its -log(eps) ceiling for 3+ epochs.
Emits a markdown table for ROADMAP.md.
"""

import glob
import json
import os
import sys


def load(run_dir):
    rows = []
    p = os.path.join(run_dir, "metrics_train.jsonl")
    if not os.path.exists(p):
        return rows
    with open(p) as f:
        for line in f:
            rows.append(json.loads(line))
    return rows


def analyze(rows, n_classes=190):
    chance = 1.0 / n_classes
    peak, peak_ep, collapse_ep = 0.0, None, None
    sat_run = 0
    for d in rows:
        acc, ep = d.get("fine_accuracy", 0.0), d["epoch"]
        if acc > peak:
            peak, peak_ep = acc, ep
        if (collapse_ep is None and peak > 3 * chance
                and acc <= max(1.5 * chance, 0.4 * peak)):
            collapse_ep = ep
        tanh = d.get("loss/tanh")
        sat_run = sat_run + 1 if (tanh is not None and tanh > 3.2) else 0
        if collapse_ep is None and sat_run >= 3:
            collapse_ep = ep - 2
    last = rows[-1] if rows else {}
    return {
        "peak_acc": peak, "peak_ep": peak_ep,
        "final_acc": last.get("fine_accuracy", 0.0),
        "final_loss": last.get("loss", float("nan")),
        "final_epoch": last.get("epoch"),
        "collapse_ep": collapse_ep,
    }


def main(base="runs/ablations_r4", since="0"):
    """``since`` drops epochs <= N — continuation arms copy the base run's
    metric history, which would otherwise trip the saturation rule on the
    base run's (survived) plateau epochs."""
    since = int(since)
    print("| arm | epochs | peak acc (ep) | final acc | final loss | verdict |")
    print("|---|---|---|---|---|---|")
    for d in sorted(glob.glob(os.path.join(base, "*"))):
        rows = [r for r in load(d) if r["epoch"] > since]
        if not rows:
            continue
        a = analyze(rows)
        verdict = (f"COLLAPSED @ ep {a['collapse_ep']}" if a["collapse_ep"]
                   else "survived")
        print(f"| {os.path.basename(d)} | {a['final_epoch']} "
              f"| {a['peak_acc']:.3f} ({a['peak_ep']}) "
              f"| {a['final_acc']:.3f} | {a['final_loss']:.2f} | {verdict} |")


if __name__ == "__main__":
    main(*sys.argv[1:])
