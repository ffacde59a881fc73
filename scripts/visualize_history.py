#!/usr/bin/env python
"""Plot training history (loss curves + NLP scores) from the
``<checkpoint>.json`` history files train.py writes.

CLI replacement for notebooks/visualize_history.ipynb (cells 0-5):

    python scripts/visualize_history.py checkpoints/MSVD/*.json [-o out.png]
    python scripts/visualize_history.py h.json --print          # cells 1,4
    python scripts/visualize_history.py --dedup-metadata datasets/MSVD/metadata
                                                                # cell 5

The history dict layout matches the reference Trainer's
(``train_loss``/``val_loss`` as lists of per-term dicts, ``val_score`` as
lists of NLP-score dicts; reference src/train.py:110-117).
"""

from __future__ import annotations

import argparse
import json
import os

# The metric series the notebook prints (cell 4) — plus METEOR, which our
# scorer stack always produces (reference losses.py:140-160 keys).
METRICS = ["Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4", "METEOR", "ROUGE_L", "CIDEr"]


def _loss_series(entries):
    return [e["total"] if isinstance(e, dict) else e for e in entries]


def _score_series(history, metric, phase="val_score"):
    return [s.get(metric) for s in history.get(phase, []) if isinstance(s, dict)]


def dedup_metadata(metadata_dir: str) -> None:
    """Drop duplicate (VideoID, Start, End, Description) rows in the split
    CSVs, in place — notebook cell 5's one-time cleanup."""
    import pandas as pd

    for filename in ("train.csv", "val.csv", "test.csv"):
        csv_file = os.path.join(metadata_dir, filename)
        if not os.path.isfile(csv_file):
            print(f"{filename}: missing, skipped")
            continue
        df = pd.read_csv(csv_file)
        before = len(df)
        df = df.drop_duplicates(["VideoID", "Start", "End", "Description"])
        df.to_csv(csv_file, index=False)
        print(f"{filename}: {before} -> {len(df)} rows")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("histories", nargs="*", help="history JSON files")
    ap.add_argument("-o", "--out", default="history.png")
    ap.add_argument("--metrics", default=",".join(METRICS),
                    help="comma list of score series to plot")
    ap.add_argument("--print", dest="print_series", action="store_true",
                    help="print the raw loss/score series (nb cells 1-4)")
    ap.add_argument("--dedup-metadata", metavar="DIR",
                    help="drop duplicate caption rows in DIR/{train,val,test}.csv (nb cell 5)")
    args = ap.parse_args()

    if args.dedup_metadata:
        dedup_metadata(args.dedup_metadata)
        if not args.histories:
            return
    if not args.histories:
        ap.error("no history files given")

    metrics = [m for m in args.metrics.split(",") if m]
    loaded = []
    for path in args.histories:
        with open(path) as f:
            h = json.load(f)
        loaded.append((os.path.splitext(os.path.basename(path))[0], h))

    if args.print_series:
        for name, h in loaded:
            print(f"== {name}")
            for key in ("train_loss", "val_loss"):
                series = _loss_series(h.get(key, []))
                print(f"{key}: {series} ({len(series)})")
            for metric in metrics:
                print(metric, _score_series(h, metric))

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n_panels = 1 + len(metrics)
    ncols = min(4, n_panels)
    nrows = (n_panels + ncols - 1) // ncols
    fig, axes = plt.subplots(nrows, ncols, figsize=(4 * ncols, 3.2 * nrows),
                             squeeze=False)
    flat = [ax for row in axes for ax in row]

    ax = flat[0]
    for name, h in loaded:
        ax.plot(_loss_series(h.get("train_loss", [])), label=f"{name} train")
        ax.plot(_loss_series(h.get("val_loss", [])), "--", label=f"{name} val")
    ax.set_title("loss"); ax.set_xlabel("epoch"); ax.legend(fontsize=7)

    for ax, metric in zip(flat[1:], metrics):
        for name, h in loaded:
            series = _score_series(h, metric)
            if series:
                ax.plot(series, label=name)
        ax.set_title(f"val {metric}"); ax.set_xlabel("eval")
        ax.legend(fontsize=7)
    for ax in flat[n_panels:]:
        ax.axis("off")

    fig.tight_layout()
    fig.savefig(args.out, dpi=120)
    print(f"Wrote {args.out}")


if __name__ == "__main__":
    main()
