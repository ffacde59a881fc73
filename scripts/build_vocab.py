#!/usr/bin/env python
"""One-time vocabulary build CLI (reference src/get_loader.py:92-114,451-453).

    python scripts/build_vocab.py --dataset MSVD [--data_root datasets]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mvc_tpu.data.vocabulary import build_msr_vtt_vocab, build_msvd_vocab


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", required=True, choices=["MSVD", "MSR-VTT"])
    ap.add_argument("--data_root", default="datasets")
    args = ap.parse_args()

    folder = os.path.join(args.data_root, args.dataset)
    if args.dataset == "MSVD":
        vocab = build_msvd_vocab(folder)
    else:
        vocab = build_msr_vtt_vocab(folder)
    print(f"Vocab built: {len(vocab)} entries -> {folder}/metadata/vocab.json")


if __name__ == "__main__":
    main()
