#!/usr/bin/env python
"""Checkpoint -> captions CSV -> NLP-scores CSV.

CLI replacement for the reference's notebooks/predict_captions.ipynb flow
(load best checkpoint, run eval over splits, aggregate scores into
results/<dataset>/NLP_score_<dataset>.csv).

    python scripts/predict_captions.py --dataset MSVD \
        --checkpoint checkpoints/MSVD/SA-LSTM_..._best.ckpt \
        [--splits val test] [--mode direct|beam] [--beam_width 5]

Accepts our checkpoints or reference torch .ckpt files (converted on load).
"""

from __future__ import annotations

import argparse
import csv
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="MSVD", choices=["MSVD", "MSR-VTT"])
    ap.add_argument("--data_root", default="datasets")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--splits", nargs="+", default=["val", "test"])
    ap.add_argument("--mode", default="direct", choices=["direct", "beam"])
    ap.add_argument("--beam_width", default=5, type=int)
    ap.add_argument("--beam_alpha", default=0.0, type=float)
    ap.add_argument("--max_caption_len", default=30, type=int)
    ap.add_argument("--batch_size", default=64, type=int)
    ap.add_argument("--reconstructor", default="none", choices=["none", "local", "global"])
    ap.add_argument("--video_only", action="store_true")
    ap.add_argument("--out_dir", default=None)
    ap.add_argument("--pallas", action="store_true",
                    help="fused Pallas decode kernels (TPU only; same as MVC_PALLAS=1)")
    args = ap.parse_args()

    import jax
    import numpy as np

    if args.pallas:
        from mvc_tpu.ops.dispatch import enable_pallas

        enable_pallas(True)

    from mvc_tpu.data import Vocabulary, get_loader, video_dataset_to_video_captions_loader
    from mvc_tpu.evalcap import NLPScore
    from mvc_tpu.models import AVCaptioningDual
    from mvc_tpu.models.captioning import captions_from_tokens
    from mvc_tpu.training.checkpoint import load_checkpoint

    dataset_folder = os.path.join(args.data_root, args.dataset)
    vocab_path = os.path.join(dataset_folder, "metadata", "vocab.json")
    if not os.path.isfile(vocab_path):
        vocab_path = os.path.join(dataset_folder, "metadata", "vocab.pkl")
    vocab = Vocabulary.load(vocab_path)

    # our checkpoint or a reference torch .ckpt
    ckpt = load_checkpoint(args.checkpoint)
    if ckpt is None or "params" not in ckpt:
        from mvc_tpu.utils import convert_reference_checkpoint

        ckpt = convert_reference_checkpoint(args.checkpoint)
        print(f"Converted reference checkpoint (epoch {ckpt['epoch']})")
    params = ckpt["params"]

    model = AVCaptioningDual(vocab_size=len(vocab), reconstructor_type=args.reconstructor)

    out_dir = args.out_dir or os.path.join("results", args.dataset)
    os.makedirs(out_dir, exist_ok=True)
    ckpt_tag = os.path.splitext(os.path.basename(args.checkpoint))[0]

    # Direct mode stops once every row has emitted EOS — caption text is
    # identical (PARITY.md) and real-data batches finish at their longest
    # caption instead of max_caption_len.
    extra = {"stop_at_all_eos": True} if args.mode == "direct" else {}
    predict = jax.jit(
        lambda p, a, v, m: model.predict_tokens(
            p, a, v, max_caption_len=args.max_caption_len, mode=args.mode,
            beam_alpha=args.beam_alpha, beam_width=args.beam_width, feat_mask=m,
            **extra,
        )
    )

    score_rows = []
    for split in args.splits:
        _, ds = get_loader(
            root_dir=dataset_folder, dataset=args.dataset, split=split,
            batch_size=args.batch_size, vocab_path=vocab_path,
            video_only=args.video_only, verbose=False,
        )
        loader = video_dataset_to_video_captions_loader(
            ds, batch_size=args.batch_size, video_only=args.video_only
        )
        vid_gt, vid_gen = {}, {}
        for batch in loader:
            import jax.numpy as jnp

            tokens = np.asarray(predict(
                params, jnp.asarray(batch["audio"]), jnp.asarray(batch["visual"]),
                jnp.asarray(batch["feat_mask"]),
            ))
            caps = captions_from_tokens(vocab, tokens)
            for vid, gt, cap in zip(batch["video_ids"], batch["captions"], caps):
                vid_gt[vid] = list(gt)
                vid_gen[vid] = [cap]

        cap_csv = os.path.join(out_dir, f"captions_{ckpt_tag}_{split}_{args.mode}.csv")
        with open(cap_csv, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["video_id", "generated", "ground_truth"])
            for vid in vid_gen:
                w.writerow([vid, vid_gen[vid][0], " | ".join(vid_gt[vid])])
        print(f"Wrote {cap_csv}")

        scores = NLPScore(vid_gt, vid_gen)
        print(split, scores)
        score_rows.append({"split": split, "mode": args.mode, "checkpoint": ckpt_tag, **scores})

    score_csv = os.path.join(out_dir, f"NLP_score_{args.dataset}.csv")
    exists = os.path.isfile(score_csv)
    with open(score_csv, "a", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(score_rows[0].keys()))
        if not exists:
            w.writeheader()
        w.writerows(score_rows)
    print(f"Appended scores to {score_csv}")


if __name__ == "__main__":
    main()
