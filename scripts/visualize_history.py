#!/usr/bin/env python
"""Plot training history (loss curves + NLP scores) from the
``<checkpoint>.json`` history files train.py writes.

CLI replacement for notebooks/visualize_history.ipynb:

    python scripts/visualize_history.py checkpoints/MSVD/*.json [-o out.png]
"""

from __future__ import annotations

import argparse
import json
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("histories", nargs="+", help="history JSON files")
    ap.add_argument("-o", "--out", default="history.png")
    ap.add_argument("--metric", default="CIDEr")
    args = ap.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(12, 4))
    for path in args.histories:
        with open(path) as f:
            h = json.load(f)
        name = os.path.splitext(os.path.basename(path))[0]
        train_loss = [e["total"] if isinstance(e, dict) else e for e in h.get("train_loss", [])]
        val_loss = [e["total"] if isinstance(e, dict) else e for e in h.get("val_loss", [])]
        axes[0].plot(train_loss, label=f"{name} train")
        axes[0].plot(val_loss, "--", label=f"{name} val")
        val_scores = [s.get(args.metric) for s in h.get("val_score", []) if isinstance(s, dict)]
        if val_scores:
            axes[1].plot(val_scores, label=name)

    axes[0].set_title("loss"); axes[0].set_xlabel("epoch"); axes[0].legend(fontsize=7)
    axes[1].set_title(f"val {args.metric}"); axes[1].set_xlabel("eval"); axes[1].legend(fontsize=7)
    fig.tight_layout()
    fig.savefig(args.out, dpi=120)
    print(f"Wrote {args.out}")


if __name__ == "__main__":
    main()
