"""Training-curve figures from a run directory's run.log.

Parses the `epoch N: key=val ...` lines the train loops emit
(train/loop.py, train/staged.py) into a CSV plus a small-multiples PNG:
losses, rotation error, translation error, and AP metrics each get their
own axis (never a dual-axis plot). Used to record training evidence in
BASELINE.md — e.g. the round-3 rotation-learning runs.

Usage:
  python scripts/plot_run.py RUN_DIR [--out PREFIX] [--metrics k1,k2,...]

Writes PREFIX.png and PREFIX.csv (default: RUN_DIR/curves.{png,csv}).
"""

import argparse
import csv
import pathlib
import re
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

# Categorical series colors in fixed assignment order (validated palette;
# identity never comes from color alone — every axis also has a legend).
SERIES = ["#2a78d6", "#eb6834", "#1baf7a", "#eda100", "#e87ba4"]
TEXT_2 = "#52514e"

_EPOCH_RE = re.compile(r"epoch (\d+): (.*)$")
_KV_RE = re.compile(r"([A-Za-z0-9_./]+)=([-+0-9.einfa]+)")

# Each panel: (title, y-label, [metric keys present-if-available])
PANELS = [
    ("Validation loss", "loss", ["val_loss"]),
    ("Rotation error", "degrees",
     ["degree_error_geodesic", "degree_error"]),
    ("Translation error", "cm", ["offset_error"]),
    ("Average precision", "%",
     ["iou_3d_mAP_0.25", "offset_error_AP_5cm", "degree_error_AP_5"]),
]


def parse_run_log(path: pathlib.Path):
    """-> (sorted epoch list, {metric: {epoch: value}})."""
    series: dict = {}
    epochs: set = set()
    for line in path.read_text().splitlines():
        m = _EPOCH_RE.search(line)
        if not m:
            continue
        epoch = int(m.group(1))
        epochs.add(epoch)
        for key, val in _KV_RE.findall(m.group(2)):
            try:
                series.setdefault(key, {})[epoch] = float(val)
            except ValueError:
                continue
    return sorted(epochs), series


def write_csv(out: pathlib.Path, epochs, series) -> None:
    keys = sorted(series)
    with out.open("w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["epoch"] + keys)
        for e in epochs:
            w.writerow([e] + [series[k].get(e, "") for k in keys])


def _plot_panel(ax, epochs, series, title, ylabel, keys) -> bool:
    drawn = 0
    for key in keys:
        if key not in series:
            continue
        pts = sorted(series[key].items())
        ax.plot([e for e, _ in pts], [v for _, v in pts],
                color=SERIES[drawn % len(SERIES)], linewidth=1.6, label=key)
        drawn += 1
    if not drawn:
        ax.set_visible(False)
        return False
    ax.set_title(title, fontsize=10, color="#0b0b0b")
    ax.set_xlabel("epoch", fontsize=8, color=TEXT_2)
    ax.set_ylabel(ylabel, fontsize=8, color=TEXT_2)
    ax.grid(True, color="#e8e7e4", linewidth=0.6)  # recessive grid
    for side in ("top", "right"):
        ax.spines[side].set_visible(False)
    for side in ("left", "bottom"):
        ax.spines[side].set_color("#c3c2b7")
    ax.tick_params(labelsize=7, colors=TEXT_2)
    ax.legend(fontsize=7, frameon=False)
    return True


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("run_dir", type=pathlib.Path)
    p.add_argument("--out", type=pathlib.Path, default=None,
                   help="output prefix (default RUN_DIR/curves)")
    p.add_argument("--metrics", default=None,
                   help="comma-separated extra metric keys, one extra "
                        "panel each")
    args = p.parse_args(argv)

    log = args.run_dir / "run.log"
    if args.run_dir.name == "run.log":
        log, args.run_dir = args.run_dir, args.run_dir.parent
    if not log.exists():
        sys.exit(f"no run.log under {args.run_dir}")
    epochs, series = parse_run_log(log)
    if not epochs:
        sys.exit(f"no epoch lines parsed from {log}")

    prefix = args.out or (args.run_dir / "curves")
    prefix.parent.mkdir(parents=True, exist_ok=True)
    write_csv(prefix.with_suffix(".csv"), epochs, series)

    panels = list(PANELS)
    if args.metrics:
        for key in args.metrics.split(","):
            panels.append((key, key, [key]))
    ncols = 2
    nrows = -(-len(panels) // ncols)
    fig, axes = plt.subplots(
        nrows, ncols, figsize=(5.0 * ncols, 3.0 * nrows), dpi=140,
    )
    fig.patch.set_facecolor("#fcfcfb")
    flat = axes.ravel() if hasattr(axes, "ravel") else [axes]
    for ax, (title, ylabel, keys) in zip(flat, panels):
        ax.set_facecolor("#fcfcfb")
        _plot_panel(ax, epochs, series, title, ylabel, keys)
    for ax in flat[len(panels):]:
        ax.set_visible(False)
    fig.suptitle(args.run_dir.name, fontsize=11, color="#0b0b0b")
    fig.tight_layout(rect=(0, 0, 1, 0.96))
    fig.savefig(prefix.with_suffix(".png"))
    print(f"wrote {prefix.with_suffix('.png')} and "
          f"{prefix.with_suffix('.csv')} "
          f"({len(epochs)} epochs, {len(series)} metrics)")


if __name__ == "__main__":
    main()
