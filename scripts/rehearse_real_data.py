#!/usr/bin/env python
"""Real-data rehearsal: weights -> features -> train -> scores, one command.

The MSVD/MSR-VTT media and the pretrained Inception-v3 / VGGish checkpoints
the reference downloads (reference src/models/visual_encoder.py:28,
src/models/audio_encoder.py:13) cannot be fetched in this container.  This
script is the "mount and go" path for the moment they exist:

    MVC_WEIGHTS_DIR=/mnt/weights MVC_DATA_DIR=/mnt/msvd \\
        python scripts/rehearse_real_data.py --epochs 50

  MVC_WEIGHTS_DIR  directory with ``inception_v3.pth`` (torchvision
                   Inception-v3 state_dict) and ``vggish.pth`` (torchvggish
                   hub state_dict).  Absent -> random-weight torch oracles
                   (mvc_tpu/utils/torch_oracles.py) stand in, exercising the
                   identical conversion path.
  MVC_DATA_DIR     dataset root with ``videos/`` (+ optional ``audios/``
                   WAV sidecars) and ``metadata/{train,val,test}.csv``
                   (VideoID,Start,End,Source,Description).  Absent -> a
                   synthetic clip set + caption metadata is generated.

Pipeline (mirrors reference src/extract_features.py:109-166 +
src/train.py:351-549 end to end):
  1. convert torch checkpoints -> our params (inception_v3 BN-fold converter,
     vggish converter)
  2. batched feature extraction for every clip missing features
  3. vocabulary build from the train split (if no vocab.json)
  4. Trainer.fit for --epochs with beam eval, device feature cache
  5. print final val/test scores as one JSON line

The whole path runs under pytest with the synthetic stand-ins in
tests/test_scripts.py, so the rehearsal is known-green before real data
ever mounts.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def resolve_encoder_params(weights_dir: str | None):
    """(inception_params, vggish_params) from real checkpoints or oracles."""
    from mvc_tpu.models import inception_v3 as iv3
    from mvc_tpu.models import vggish as vg

    if weights_dir:
        import torch

        inc_sd = torch.load(os.path.join(weights_dir, "inception_v3.pth"),
                            map_location="cpu")
        vgg_sd = torch.load(os.path.join(weights_dir, "vggish.pth"),
                            map_location="cpu")
        print("converting real checkpoints from", weights_dir)
    else:
        from mvc_tpu.utils.torch_oracles import (
            build_torch_inception_v3,
            build_torch_vggish,
        )

        print("MVC_WEIGHTS_DIR not set: using random-weight torch oracles "
              "(conversion path identical; quality numbers meaningless)")
        inc_sd = build_torch_inception_v3().state_dict()
        m = build_torch_vggish()
        vgg_sd = {f"features.{k}": v for k, v in m.features.state_dict().items()}
        vgg_sd.update(
            {f"embeddings.{k}": v for k, v in m.embeddings.state_dict().items()}
        )
    return (
        iv3.convert_torchvision_state_dict(inc_sd),
        vg.convert_torch_state_dict(vgg_sd),
    )


def resolve_dataset(data_dir: str | None, out_dir: str, n_clips: int = 12,
                    clip_seconds: float = 6.0):
    """Returns the dataset root; generates a synthetic one when unset."""
    if data_dir:
        return data_dir
    import pandas as pd

    from mvc_tpu.extract.synthetic import make_clip_set

    root = os.path.join(out_dir, "synthetic_msvd")
    videos = os.path.join(root, "videos")
    if not (os.path.isdir(videos) and len(os.listdir(videos)) >= n_clips):
        print("MVC_DATA_DIR not set: generating a synthetic clip set")
        make_clip_set(root, n_clips, seconds=clip_seconds)
    captions = [
        "a man is playing a guitar", "a woman is cooking food",
        "a dog runs across a field", "a cat sits on a couch",
        "two men ride bikes down the street", "children play in the water",
    ]
    os.makedirs(os.path.join(root, "metadata"), exist_ok=True)
    rows = []
    for i, f in enumerate(sorted(os.listdir(videos))):
        name = os.path.splitext(f)[0]                 # clipNNN_0_6
        vid, start, end = name.rsplit("_", 2)
        for c in range(2):
            rows.append({"VideoID": vid, "Start": int(start), "End": int(end),
                         "Source": "clean",
                         "Description": captions[(2 * i + c) % len(captions)]})
    df = pd.DataFrame(rows)
    for split in ("train", "val", "test"):
        df.to_csv(os.path.join(root, "metadata", f"{split}.csv"), index=False)
    return root


def extract_features(root: str, inception_params, vggish_params,
                     batch_size: int = 16, frame_buckets=(64, 128, 256)) -> dict:
    from mvc_tpu.extract import FeatureExtractor

    fe = FeatureExtractor(
        inception_params=inception_params, vggish_params=vggish_params, fps=1,
        frame_buckets=frame_buckets,
    )
    return fe.extract_dataset(
        os.path.join(root, "videos"), os.path.join(root, "features"),
        batch_size=batch_size,
    )


def ensure_vocab(root: str) -> str:
    import pandas as pd

    from mvc_tpu.data.vocabulary import Vocabulary

    vocab_path = os.path.join(root, "metadata", "vocab.json")
    if not os.path.isfile(vocab_path):
        df = pd.read_csv(os.path.join(root, "metadata", "train.csv"))
        vocab = Vocabulary(freq_threshold=1)
        vocab.build_vocabulary([str(d) for d in df["Description"]])
        vocab.save(vocab_path)
        print(f"built vocab ({len(vocab)} words) -> {vocab_path}")
    return vocab_path


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/mvc_rehearsal")
    ap.add_argument("--epochs", default=2, type=int)
    ap.add_argument("--batch_size", default=8, type=int)
    ap.add_argument("--lr", default=3e-3, type=float)
    ap.add_argument("--dataset", default="MSVD", choices=["MSVD", "MSR-VTT"])
    ap.add_argument("--reconstructor", default="global",
                    choices=["none", "local", "global"])
    ap.add_argument("--eval_mode", default="beam", choices=["direct", "beam"])
    ap.add_argument("--n_clips", default=12, type=int,
                    help="synthetic stand-in clip count (ignored with MVC_DATA_DIR)")
    ap.add_argument("--clip_seconds", default=6.0, type=float)
    ap.add_argument("--frame_bucket", default=0, type=int,
                    help="smallest extraction frame bucket override (0: default "
                         "ladder); small values keep the CPU test cheap")
    args = ap.parse_args(argv)
    os.makedirs(args.out, exist_ok=True)

    import jax

    from mvc_tpu.config import TrainerConfig
    from mvc_tpu.data import get_loader
    from mvc_tpu.models import AVCaptioningDual
    from mvc_tpu.training import Trainer

    weights_dir = os.environ.get("MVC_WEIGHTS_DIR") or None
    data_dir = os.environ.get("MVC_DATA_DIR") or None

    inception_params, vggish_params = resolve_encoder_params(weights_dir)
    root = resolve_dataset(data_dir, args.out, n_clips=args.n_clips,
                           clip_seconds=args.clip_seconds)
    buckets = ((args.frame_bucket, 64, 128, 256) if args.frame_bucket
               else (64, 128, 256))
    stats = extract_features(root, inception_params, vggish_params,
                             frame_buckets=buckets)
    print("extraction:", stats)
    vocab_path = ensure_vocab(root)

    kw = dict(root_dir=root, dataset=args.dataset, vocab_path=vocab_path,
              batch_size=args.batch_size, verbose=False)
    train_loader, _ = get_loader(split="train", shuffle=True, **kw)
    val_loader, _ = get_loader(split="val", shuffle=False, **kw)
    test_loader, _ = get_loader(split="test", shuffle=False, **kw)
    vocab = train_loader.dataset.vocab

    model = AVCaptioningDual(
        vocab_size=len(vocab), reconstructor_type=args.reconstructor
    )
    params = model.init(jax.random.PRNGKey(0))

    cfg = TrainerConfig(
        epochs=args.epochs, batch_size=args.batch_size, lr=args.lr,
        device_feature_cache=True, eval_mode=args.eval_mode,
    )
    trainer = Trainer(
        checkpoint_name=os.path.join(args.out, "rehearsal.ckpt"),
        log_dir=None, eval_freq=max(1, args.epochs),
    )
    params, _opt_state, history = trainer.fit(
        model, params, train_loader, val_loader, test_loader, cfg
    )

    summary = {
        "extracted": stats, "epochs": args.epochs,
        "final_train_loss": float(history["train_loss"][-1]["total"]),
        "val_score": {k: float(v) for k, v in history["val_score"][-1].items()}
        if history["val_score"] else {},
        "real_weights": bool(weights_dir), "real_data": bool(data_dir),
    }
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()
