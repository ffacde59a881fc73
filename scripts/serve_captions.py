#!/usr/bin/env python
"""Serve captions over HTTP from a checkpoint (online continuous batching).

The online counterpart of scripts/predict_captions.py (the reference's only
inference surface is the offline notebooks/predict_captions.ipynb flow —
SURVEY.md §3.5; serving is a first-class extension of this framework):

    python scripts/serve_captions.py --dataset MSVD \
        --checkpoint checkpoints/MSVD/..._best.ckpt \
        [--mode direct|beam] [--port 8000] [--max_batch 64] [--pallas]

Accepts our checkpoints or reference torch .ckpt files (converted on load).
Endpoints: POST /caption, POST /caption_batch, GET /stats, GET /healthz —
see mvc_tpu/serving/http.py for the JSON shapes.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="MSVD", choices=["MSVD", "MSR-VTT"])
    ap.add_argument("--data_root", default="datasets")
    ap.add_argument("--vocab", default=None,
                    help="explicit vocab path (default: <data_root>/<dataset>/metadata/vocab.*)")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--reconstructor", default="none", choices=["none", "local", "global"])
    ap.add_argument("--mode", default="direct", choices=["direct", "beam"])
    ap.add_argument("--beam_width", default=5, type=int)
    ap.add_argument("--beam_alpha", default=0.0, type=float)
    ap.add_argument("--max_caption_len", default=30, type=int)
    ap.add_argument("--max_batch", default=64, type=int)
    ap.add_argument("--max_wait_ms", default=5.0, type=float)
    ap.add_argument("--transfer", default="f32", choices=["f32", "bf16", "int8"],
                    help="feature H2D wire format (see ServiceConfig.transfer)")
    ap.add_argument("--pipeline_depth", default=2, type=int)
    ap.add_argument("--frame_buckets", nargs="+", type=int, default=[8, 16, 32, 48, 64])
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", default=8000, type=int)
    ap.add_argument("--no_warmup", action="store_true",
                    help="skip the ahead-of-traffic compile of every frame bucket")
    ap.add_argument("--pallas", action="store_true",
                    help="fused Pallas decode kernels (TPU only; same as MVC_PALLAS=1)")
    args = ap.parse_args()

    if args.pallas:
        from mvc_tpu.ops.dispatch import enable_pallas

        enable_pallas(True)

    from mvc_tpu.data import Vocabulary
    from mvc_tpu.models import AVCaptioningDual
    from mvc_tpu.serving import CaptionService, ServiceConfig, make_http_server
    from mvc_tpu.training.checkpoint import load_checkpoint

    vocab_path = args.vocab
    if vocab_path is None:
        dataset_folder = os.path.join(args.data_root, args.dataset)
        vocab_path = os.path.join(dataset_folder, "metadata", "vocab.json")
        if not os.path.isfile(vocab_path):
            vocab_path = os.path.join(dataset_folder, "metadata", "vocab.pkl")
    vocab = Vocabulary.load(vocab_path)

    ckpt = load_checkpoint(args.checkpoint)
    if ckpt is None or "params" not in ckpt:
        from mvc_tpu.utils import convert_reference_checkpoint

        ckpt = convert_reference_checkpoint(args.checkpoint)
        print(f"Converted reference checkpoint (epoch {ckpt['epoch']})")
    params = ckpt["params"]

    model = AVCaptioningDual(vocab_size=len(vocab), reconstructor_type=args.reconstructor)
    service = CaptionService(model, params, vocab, ServiceConfig(
        max_batch=args.max_batch,
        max_wait_ms=args.max_wait_ms,
        frame_buckets=tuple(args.frame_buckets),
        max_caption_len=args.max_caption_len,
        mode=args.mode,
        beam_width=args.beam_width,
        beam_alpha=args.beam_alpha,
        transfer=args.transfer,
        pipeline_depth=args.pipeline_depth,
    ))
    if not args.no_warmup:
        print("Warming up (one compile per frame bucket)...", flush=True)
        warmed = service.warmup()
        service.reset_stats()
        print(f"Warmed t_pads: {warmed}")

    server = make_http_server(service, host=args.host, port=args.port)
    host, port = server.server_address[:2]
    print(f"Serving on http://{host}:{port}  (POST /caption, GET /stats)", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()
        service.close()


if __name__ == "__main__":
    main()
