#!/usr/bin/env python
"""Frame grids with generated vs ground-truth captions.

CLI replacement for notebooks/visualize_results.ipynb:

    python scripts/visualize_results.py --dataset datasets/MSVD \
        --captions results/MSVD/captions_<tag>_val_direct.csv -n 6 -o grid.png
"""

from __future__ import annotations

import argparse
import csv
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", required=True, help="dataset root with videos/")
    ap.add_argument("--captions", required=True, help="captions CSV from predict_captions.py")
    ap.add_argument("-n", "--num", default=6, type=int)
    ap.add_argument("-o", "--out", default="results_grid.png")
    args = ap.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from mvc_tpu.extract.video_io import load_frames

    rows = list(csv.DictReader(open(args.captions)))[: args.num]
    fig, axes = plt.subplots(len(rows), 1, figsize=(6, 3 * len(rows)))
    if len(rows) == 1:
        axes = [axes]
    videos_dir = os.path.join(args.dataset, "videos")
    candidates = {os.path.splitext(f)[0]: f for f in os.listdir(videos_dir)}
    for ax, row in zip(axes, rows):
        vid = row["video_id"]
        fname = candidates.get(vid)
        if fname:
            frames, _ = load_frames(os.path.join(videos_dir, fname), frame_size=(160, 120), fps=None)
            ax.imshow(frames[len(frames) // 2])
        ax.set_title(f"[{row['generated']}]\n({row['ground_truth'].split(' | ')[0]})", fontsize=8)
        ax.axis("off")
    fig.tight_layout()
    fig.savefig(args.out, dpi=120)
    print(f"Wrote {args.out}")


if __name__ == "__main__":
    main()
