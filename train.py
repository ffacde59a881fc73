#!/usr/bin/env python
"""Training CLI.

Same surface as the reference (reference src/train.py:351-549):

    python train.py --dataset {MSVD,MSR-VTT} [--epochs N] [--batch_size N] [--lr F]

plus TPU-native extensions: --dp/--tp mesh axes, --dtype, --reconstructor /
--video_only / --single to select one experiment instead of the sweep, and
--data_root to point at the datasets directory.

With no experiment-selection flags this runs the reference's experiment sweep:
{AV model, visual-recon lambda 0.5} and {AV model, both-recon} x
{none, local, global} reconstructors (reference src/train.py:407-469 — the
reference's nested-list bug is fixed: all six experiments actually run).
"""

from __future__ import annotations

import argparse
import json
import os


def build_experiments(args):
    """The reference's experiment arrays (reference src/train.py:407-467)."""
    exps = []
    for audio_lambda, tag in ((0.0, "video"), (0.00005, "video_audio")):
        for rec in ("none", "local", "global"):
            exps.append(
                {
                    "model": {"teacher_forcing_ratio": 1.0, "reconstructor_type": rec},
                    "training": {"batch_size": args.batch_size, "epochs": args.epochs, "lr": args.lr},
                    "loss": {
                        "reg_lambda": 0.0005,
                        "audio_recon_lambda": audio_lambda,
                        "visual_recon_lambda": 0.5,
                    },
                    "checkpoint_name": f"SA-LSTM_{args.epochs}_epochs_{tag}_{rec}_{args.lr}",
                    "log_dir": os.path.join("logs", args.dataset, f"SA-LSTM_{args.epochs}_epochs_{tag}_{rec}_{args.lr}"),
                }
            )
    return exps


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--gpu", default="-1", help="ignored (interface compat); device selection is JAX's")
    parser.add_argument("--dataset", default="MSVD", choices=["MSVD", "MSR-VTT"])
    parser.add_argument("--epochs", default=50, type=int)
    parser.add_argument("--batch_size", default=128, type=int)
    parser.add_argument("--lr", default=1e-4, type=float)
    parser.add_argument("--data_root", default="datasets")
    parser.add_argument("--split_train", default="train")
    # experiment selection (default: the reference sweep)
    parser.add_argument("--reconstructor", choices=["none", "local", "global"], default=None,
                        help="run a single experiment with this reconstructor")
    parser.add_argument("--video_only", action="store_true")
    parser.add_argument("--single", action="store_true", help="single-stream AVCaptioning instead of dual")
    parser.add_argument("--model", default="rnn", choices=["rnn", "transformer"],
                        help="captioner family (transformer is a working version of the reference's dead code)")
    parser.add_argument("--eval_freq", default=1, type=int)
    # TPU extensions
    parser.add_argument("--dp", default=-1, type=int, help="data-parallel mesh axis (-1: all devices)")
    parser.add_argument("--tp", default=1, type=int, help="tensor-parallel mesh axis")
    parser.add_argument("--sp", default=1, type=int,
                        help="sequence-parallel mesh axis (shards the frame axis T)")
    parser.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    parser.add_argument("--adam_state_dtype", choices=["bfloat16"], default=None,
                        help="opt-in non-parity: store Adam moments in bf16 "
                             "(halves the largest optimizer HBM stream; PARITY.md)")
    parser.add_argument("--seed", default=0, type=int)
    parser.add_argument("--device_feature_cache", action="store_true",
                        help="keep all clip features resident in HBM; per-step H2D "
                             "is caption ids + row indices only (datasets that fit)")
    parser.add_argument("--meteor_synonyms", default=None,
                        help="path to a synonym table (one whitespace-separated group "
                             "per line) enabling METEOR's stage-3 matcher")
    parser.add_argument("--meteor_paraphrases", default=None,
                        help="path to a paraphrase table (one 'phrase ||| phrase' pair "
                             "per line) enabling METEOR's stage-4 span matcher")
    parser.add_argument("--meteor_function_words", default=None,
                        help="path to a function-word list (one word per line) enabling "
                             "METEOR's en-task delta=0.75 content/function weighting")
    parser.add_argument("--eval_mode", default="direct", choices=["direct", "beam"],
                        help="fit-time eval decoding (reference uses direct, "
                             "src/train.py:323-325; beam uses width 5)")
    parser.add_argument("--pallas", action="store_true",
                        help="route decode/eval prediction through the fused Pallas "
                             "kernels (TPU only; same as MVC_PALLAS=1 — token parity "
                             "with the XLA path asserted in tests/test_pallas.py)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    if args.pallas:
        from mvc_tpu.ops.dispatch import enable_pallas

        enable_pallas(True)

    from mvc_tpu.config import TrainerConfig
    from mvc_tpu.data import Vocabulary, get_loader
    from mvc_tpu.models import AVCaptioning, AVCaptioningDual
    from mvc_tpu.parallel import make_mesh
    from mvc_tpu.training import Trainer

    dataset_folder = os.path.join(args.data_root, args.dataset)
    vocab_path = os.path.join(dataset_folder, "metadata", "vocab.json")
    if not os.path.isfile(vocab_path):
        legacy = os.path.join(dataset_folder, "metadata", "vocab.pkl")
        if os.path.isfile(legacy):
            vocab_path = legacy
        else:
            raise SystemExit(
                f"No vocabulary at {vocab_path}; build one with scripts/build_vocab.py"
            )
    vocab = Vocabulary.load(vocab_path)
    print(f"Vocab size: {len(vocab)}")

    checkpoints_dir = os.path.join("checkpoints", args.dataset)
    mesh = make_mesh(dp=args.dp, tp=args.tp, sp=args.sp)
    print(f"Mesh: {mesh}")
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    if args.reconstructor is not None or args.video_only or args.single:
        rec = args.reconstructor or "none"
        experiments = [
            {
                "model": {"teacher_forcing_ratio": 1.0, "reconstructor_type": rec},
                "training": {"batch_size": args.batch_size, "epochs": args.epochs, "lr": args.lr},
                "loss": {
                    "reg_lambda": 0.0005,
                    "audio_recon_lambda": 0.0 if args.video_only else 0.00005,
                    "visual_recon_lambda": 0.5,
                },
                "checkpoint_name": f"{args.model}_{args.epochs}_epochs_custom_{rec}_{args.lr}",
                "log_dir": os.path.join("logs", args.dataset, f"{args.model}_custom_{rec}_{args.lr}"),
                "video_only": args.video_only,
            }
        ]
    else:
        experiments = build_experiments(args)

    print(f"\nPerforming {len(experiments)} experiments\n")

    for exp in experiments:
        cfg = TrainerConfig()
        cfg.batch_size = exp["training"]["batch_size"]
        cfg.epochs = exp["training"]["epochs"]
        cfg.lr = exp["training"]["lr"]
        cfg.reg_lambda = exp["loss"]["reg_lambda"]
        cfg.audio_recon_lambda = exp["loss"]["audio_recon_lambda"]
        cfg.visual_recon_lambda = exp["loss"]["visual_recon_lambda"]
        cfg.seed = args.seed
        cfg.compute_dtype = args.dtype
        cfg.adam_state_dtype = args.adam_state_dtype
        cfg.device_feature_cache = args.device_feature_cache
        cfg.meteor_synonyms = args.meteor_synonyms
        cfg.meteor_paraphrases = args.meteor_paraphrases
        cfg.meteor_function_words = args.meteor_function_words
        cfg.eval_mode = args.eval_mode
        video_only = exp.get("video_only", False)

        loader_kwargs = dict(
            root_dir=dataset_folder,
            dataset=args.dataset,
            batch_size=cfg.batch_size,
            vocab_path=vocab_path,
            video_only=video_only,
            frame_buckets=tuple(cfg.frame_buckets),
            caption_buckets=tuple(cfg.caption_buckets),
        )
        train_loader, _ = get_loader(split=args.split_train, **loader_kwargs)
        val_loader, _ = get_loader(split="val", **loader_kwargs)
        # The reference aliases test -> val ("MSR-VTT test fails" FIXME,
        # reference src/train.py:504-507); kept for interface parity.
        test_loader, _ = get_loader(split="val", **loader_kwargs)

        if args.model == "transformer":
            from mvc_tpu.models.transformer import TransformerCaptioning

            model = TransformerCaptioning(vocab_size=len(vocab), dtype=dtype)
        else:
            model_cls = AVCaptioning if args.single else AVCaptioningDual
            model = model_cls(
                vocab_size=len(vocab),
                teacher_forcing_ratio=exp["model"]["teacher_forcing_ratio"],
                reconstructor_type=exp["model"]["reconstructor_type"],
                dtype=dtype,
            )
        params = model.init(jax.random.PRNGKey(cfg.seed))

        print("Start training")
        print(json.dumps(exp, sort_keys=True, indent=4))

        os.makedirs(exp["log_dir"], exist_ok=True)
        checkpoint_name = os.path.join(checkpoints_dir, exp["checkpoint_name"] + ".ckpt")
        trainer = Trainer(
            checkpoint_name=checkpoint_name, log_dir=exp["log_dir"],
            eval_freq=args.eval_freq, mesh=mesh,
        )
        params, _, history = trainer.fit(
            model, params, train_loader, val_loader, test_loader, cfg
        )

        with open(checkpoint_name.replace(".ckpt", ".json"), "w") as f:
            json.dump(history, f)


if __name__ == "__main__":
    main()
