#!/usr/bin/env python
"""Feature-extraction CLI (reference src/extract_features.py:109-166 surface):

    python extract_features.py --dataset datasets/MSVD [--gpu -1]
                               [--batch_size 8] [--fps 1]
                               [--inception_weights W.pkl] [--vggish_weights W.pkl]

Writes ``features/video/<clip>.npy`` [T, 2048] and ``features/audio/<clip>.npy``
[N, 128], skipping clips whose features already exist.  Weights files are
pickled torch state_dicts (converted on load); without them the encoders run
with random init (useful only for pipeline testing — extraction quality needs
real pretrained weights).
"""

from __future__ import annotations

import argparse
import os
import pickle


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", required=True, help="dataset root containing videos/")
    ap.add_argument("--gpu", default="-1", help="ignored (interface compat)")
    ap.add_argument("--batch_size", default=8, type=int, help="clips per device batch (8 keeps the decode thread overlapped with the H2D+encode of the previous chunk)")
    ap.add_argument("--fps", default=1, type=float)
    ap.add_argument("--inception_weights", default=None,
                    help="pickled torch state_dict for the selected visual model")
    ap.add_argument("--vggish_weights", default=None)
    ap.add_argument("--visual_model", default="inception_v3",
                    choices=("inception_v3", "resnet"),
                    help="visual backbone (reference VisualEncoder's model switch; "
                         "resnet = ResNet-101 at 224px, 1000-d logit features — PARITY.md)")
    args = ap.parse_args()

    assert os.path.isdir(args.dataset), "The specified directory does not exist"
    videos_dir = os.path.join(args.dataset, "videos")
    features_dir = os.path.join(args.dataset, "features")
    assert os.path.isdir(videos_dir), f"no videos directory at {videos_dir}"

    from mvc_tpu.extract import FeatureExtractor
    from mvc_tpu.models import inception_v3 as iv3
    from mvc_tpu.models import vggish as vg

    inception_params = None
    if args.inception_weights:
        with open(args.inception_weights, "rb") as f:
            sd = pickle.load(f)
        if args.visual_model == "resnet":
            from mvc_tpu.models import resnet as rn

            inception_params = rn.convert_torchvision_state_dict(sd)
        else:
            inception_params = iv3.convert_torchvision_state_dict(sd)
    vggish_params = None
    if args.vggish_weights:
        with open(args.vggish_weights, "rb") as f:
            payload = pickle.load(f)
        sd = payload.get("state_dict", payload) if isinstance(payload, dict) else payload
        vggish_params = vg.convert_torch_state_dict(sd, payload.get("pca") if isinstance(payload, dict) else None)
    if inception_params is None or vggish_params is None:
        print("WARNING: running with randomly initialized encoder weights "
              "(pass --inception_weights/--vggish_weights for real features)")

    fe = FeatureExtractor(
        inception_params=inception_params,
        vggish_params=vggish_params,
        fps=args.fps,
        visual_model=args.visual_model,
    )
    stats = fe.extract_dataset(videos_dir, features_dir, batch_size=args.batch_size)
    print(stats)


if __name__ == "__main__":
    main()
