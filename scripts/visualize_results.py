#!/usr/bin/env python
"""Frame strips with generated vs ground-truth captions, plus a text
example printer.

CLI replacement for notebooks/visualize_results.ipynb:

    # grid figure: N videos x a strip of --frames sampled frames each
    python scripts/visualize_results.py --dataset datasets/MSVD \
        --captions results/MSVD/captions_<tag>_val_direct.csv -n 6 -o grid.png

    # text mode (nb cells 3, 9): print generated vs all true captions
    python scripts/visualize_results.py --captions <csv> --print -n 10

    # one video's strip saved under figures/ (nb cell 10)
    python scripts/visualize_results.py --dataset datasets/MSVD \
        --captions <csv> --video-id n_Z0-giaspE_62_78

The captions CSV comes from scripts/predict_captions.py (columns video_id /
generated / ground_truth with " | "-joined refs — the reference's results
CSVs use "/"-joined, nb cell 2; both separators are accepted).
"""

from __future__ import annotations

import argparse
import csv
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _read_rows(path):
    rows = list(csv.DictReader(open(path)))
    for row in rows:
        gt = row.get("ground_truth", "")
        sep = " | " if " | " in gt else "/"
        row["refs"] = [c.strip() for c in str(gt).split(sep) if c.strip()]
    return rows


def print_example(row) -> None:
    """nb cell 3's per-example text block."""
    print()
    print("-" * 50)
    print(f"Example: {row['video_id']}")
    print("-" * 50)
    print("\nGenerated caption:")
    print(row["generated"])
    print("\nTrue captions:")
    for c in row["refs"]:
        print(c)


def _sample_frames(path, take_n, frame_size=(160, 120)):
    """Evenly-strided sample of take_n decoded frames (nb cell 6's
    ``total//take_n + 1`` stride)."""
    from mvc_tpu.extract.video_io import load_frames

    frames, _ = load_frames(path, frame_size=frame_size, fps=None)
    total = len(frames)
    if take_n and total > take_n:
        idx = range(0, total, total // take_n + 1)
        frames = [frames[i] for i in idx]
    return frames


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", help="dataset root with videos/ (omit for --print)")
    ap.add_argument("--captions", required=True,
                    help="captions CSV from predict_captions.py")
    ap.add_argument("-n", "--num", default=6, type=int)
    ap.add_argument("--frames", default=5, type=int,
                    help="frames sampled per video strip (nb take_n)")
    ap.add_argument("--video-id", help="render just this video's strip")
    ap.add_argument("--print", dest="print_text", action="store_true",
                    help="print text examples instead of / before plotting")
    ap.add_argument("-o", "--out", default="results_grid.png")
    args = ap.parse_args()

    rows = _read_rows(args.captions)
    if args.video_id:
        rows = [r for r in rows if r["video_id"] == args.video_id]
        if not rows:
            raise SystemExit(f"video_id {args.video_id!r} not in {args.captions}")
    rows = rows[: args.num]

    if args.print_text:
        for row in rows:
            print_example(row)
        if not args.dataset:
            return
    if not args.dataset:
        raise SystemExit("--dataset is required unless --print is used alone")

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    videos_dir = os.path.join(args.dataset, "videos")
    candidates = {os.path.splitext(f)[0]: f for f in os.listdir(videos_dir)}

    ncols = max(1, args.frames)
    fig, axes = plt.subplots(len(rows), ncols,
                             figsize=(2.2 * ncols, 2.6 * len(rows)),
                             squeeze=False)
    for r, row in enumerate(rows):
        fname = candidates.get(row["video_id"])
        frames = (_sample_frames(os.path.join(videos_dir, fname), args.frames)
                  if fname else [])
        for c in range(ncols):
            ax = axes[r][c]
            if c < len(frames):
                ax.imshow(frames[c])
            ax.axis("off")
        ref0 = row["refs"][0] if row["refs"] else ""
        axes[r][0].set_title(f"[{row['generated']}]\n({ref0})",
                             fontsize=8, loc="left")
    fig.tight_layout()
    out = args.out
    if args.video_id and args.out == "results_grid.png":
        os.makedirs("figures", exist_ok=True)
        out = os.path.join("figures", f"{args.video_id}.png")
    fig.savefig(out, dpi=120)
    print(f"Wrote {out}")


if __name__ == "__main__":
    main()
