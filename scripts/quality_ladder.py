#!/usr/bin/env python
"""Quality-evidence ladder on synthetic data (VERDICT r3 item 4).

Runs the production 6-experiment sweep (modality-lambda x reconstructor —
train.py build_experiments, mirroring the reference sweep with its
nested-list bug fixed, reference src/train.py:407-469) on a LEARNABLE
synthetic MSVD-shaped corpus, for BOTH frameworks:

- ours: mvc_tpu models + Trainer-step semantics (optax Adam(amsgrad, wd),
  value-clip 5.0) on CPU
- reference: the torch AVCaptioningDual + the reference Trainer's step
  semantics (src/train.py:176-244), imported read-only from /root/reference

Both sides start from IDENTICAL weights (the reference's torch init,
converted with utils/checkpoint_convert) and see identical batch order.
After training, each framework greedy-decodes the held-out val split with
its own predict path and scores CIDEr with its own scorer stack (ours:
mvc_tpu.evalcap; reference: its vendored pycocoevalcap) against the same
ground truth.  The modality x reconstructor pivot for both frameworks is
written to QUALITY_LADDER.md (the predict_captions.ipynb artifact, nb cells
3-5), with per-cell agreement and relative-ordering checks.

Usage:  python scripts/quality_ladder.py [--epochs 30] [--out QUALITY_LADDER.md]
"""

from __future__ import annotations

import argparse
import os
import sys
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

# ---------------------------------------------------------------- corpus
# 12 clip classes; each class has a distinct caption and a distinct feature
# signature in both modalities.  A framework that learns the class->caption
# mapping generalizes to held-out clips of the same classes.
CLASS_CAPTIONS = [
    "a man is playing a guitar",
    "a woman is cooking food in a kitchen",
    "a dog runs across a green field",
    "a cat sits on a red couch",
    "two men ride bikes down the street",
    "children play in the water",
    "a man drives a car down the road",
    "a girl sings a song on stage",
    "a chef cuts vegetables with a knife",
    "a boy kicks a ball into the net",
    "a horse walks along the beach",
    "people dance at a party",
]
PARAPHRASES = [
    "the man plays a guitar",
    "a woman cooks food",
    "the dog is running on the grass",
    "the cat is sitting on the sofa",
    "the men are riding bikes",
    "the children are playing in water",
    "the man is driving a car",
    "the girl is singing",
    "the chef is cutting vegetables",
    "the boy shoots the ball",
    "the horse is walking on sand",
    "the people are dancing",
]

A_DIM, V_DIM, T_CONST = 10, 18, 6
TRAIN_PER_CLASS, VAL_PER_CLASS = 5, 2
BATCH = 10


def build_corpus(root: str, seed: int = 11) -> None:
    import pandas as pd

    from mvc_tpu.data.vocabulary import Vocabulary

    gen = np.random.default_rng(seed)
    os.makedirs(f"{root}/metadata", exist_ok=True)
    os.makedirs(f"{root}/features/video", exist_ok=True)
    os.makedirs(f"{root}/features/audio", exist_ok=True)
    v_sig = gen.normal(size=(len(CLASS_CAPTIONS), V_DIM)).astype(np.float32) * 2.0
    a_sig = gen.normal(size=(len(CLASS_CAPTIONS), A_DIM)).astype(np.float32) * 2.0

    rows = {"train": [], "val": [], "test": []}
    vid = 0
    for cls, caption in enumerate(CLASS_CAPTIONS):
        for split, n in (("train", TRAIN_PER_CLASS), ("val", VAL_PER_CLASS)):
            for _ in range(n):
                name = f"vid{vid:03d}_0_10"
                vf = v_sig[cls][None, :] + 0.3 * gen.normal(size=(T_CONST, V_DIM))
                af = a_sig[cls][None, :] + 0.3 * gen.normal(size=(T_CONST, A_DIM))
                np.save(f"{root}/features/video/{name}.npy", vf.astype(np.float32))
                np.save(f"{root}/features/audio/{name}.npy", af.astype(np.float32))
                for cap in (caption, PARAPHRASES[cls]):
                    rows[split].append({
                        "VideoID": f"vid{vid:03d}", "Start": 0, "End": 10,
                        "Source": "clean", "Description": cap,
                    })
                vid += 1
    rows["test"] = rows["val"]
    for split in ("train", "val", "test"):
        pd.DataFrame(rows[split]).to_csv(f"{root}/metadata/{split}.csv", index=False)
    Vocabulary.prebuild(
        [r["Description"] for r in rows["train"] + rows["val"]],
        f"{root}/metadata/vocab.json", freq_threshold=1,
    )


# ---------------------------------------------------------------- reference
REFERENCE_SRC = "/root/reference/src"


def _reference_imports():
    for p in (REFERENCE_SRC, os.path.dirname(REFERENCE_SRC)):
        if p not in sys.path:
            sys.path.insert(0, p)
    if "torchvision" not in sys.modules:
        try:
            import torchvision  # noqa: F401
        except ImportError:
            tv = types.ModuleType("torchvision")
            tv.models = types.ModuleType("torchvision.models")
            tv.transforms = types.ModuleType("torchvision.transforms")
            sys.modules["torchvision"] = tv
            sys.modules["torchvision.models"] = tv.models
            sys.modules["torchvision.transforms"] = tv.transforms
    import models.captioning as ref_cap

    return ref_cap


def _ref_model(ref_cap, vocab, rec_type, seed=0):
    import torch

    small_v = dict(ref_cap.VISUAL_DECODER_CONFIG, in_feature_size=V_DIM,
                   rnn_hidden_size=16, embedding_size=8, attn_size=6)
    small_a = dict(ref_cap.AUDIO_DECODER_CONFIG, in_feature_size=A_DIM,
                   rnn_hidden_size=16, embedding_size=8, attn_size=6)
    old = ref_cap.VISUAL_DECODER_CONFIG, ref_cap.AUDIO_DECODER_CONFIG
    ref_cap.VISUAL_DECODER_CONFIG, ref_cap.AUDIO_DECODER_CONFIG = small_v, small_a
    try:
        torch.manual_seed(seed)
        return ref_cap.AVCaptioningDual(
            vocab=vocab, teacher_forcing_ratio=1.0,
            reconstructor_type=rec_type, device="cpu",
        )
    finally:
        ref_cap.VISUAL_DECODER_CONFIG, ref_cap.AUDIO_DECODER_CONFIG = old


def _batches(loader):
    import torch

    for b in loader:
        yield (torch.tensor(b["audio"]), torch.tensor(b["visual"]),
               torch.tensor(b["captions"].astype(np.int64)),
               b)


def train_reference(ref, loader, lambdas, epochs, lr):
    import torch
    from losses import ModalityWiseReconstructionLossBuilder as RefBuilder

    loss_fn = RefBuilder(rec_type=ref.reconstructor_type or "none", **lambdas)
    opt = torch.optim.Adam(ref.parameters(), lr=lr, weight_decay=1e-5, amsgrad=True)
    ref.train()
    for _ in range(epochs):
        for audio, visual, captions, _ in _batches(loader):
            opt.zero_grad()
            outputs, a_rec, v_rec = ref(audio, visual, captions)
            loss, *_ = loss_fn(outputs, captions, audio, a_rec, visual, v_rec)
            loss.mean().backward()
            torch.nn.utils.clip_grad_value_(ref.parameters(), clip_value=5.0)
            opt.step()
    ref.eval()


def train_ours(model, init_params, loader, lambdas, epochs, lr):
    import jax
    import jax.numpy as jnp

    import mvc_tpu
    from mvc_tpu.config import TrainerConfig
    from mvc_tpu.training.losses import ModalityWiseReconstructionLossBuilder
    from mvc_tpu.training.optimizer import make_optimizer

    loss_fn = ModalityWiseReconstructionLossBuilder(
        rec_type=model.reconstructor_type, **lambdas)
    cfg = TrainerConfig(batch_size=BATCH, lr=lr)
    optimizer = make_optimizer(cfg)
    params = jax.tree.map(jnp.asarray, init_params)
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state, batch, rng):
        def loss_of(p):
            outputs, a_rec, v_rec = model.forward(
                p, batch["audio"], batch["visual"], batch["captions"], rng=rng)
            loss, *_ = loss_fn(
                outputs, batch["captions"], batch["audio"], a_rec,
                batch["visual"], v_rec,
                sample_mask=batch.get("sample_mask"),
            )
            return loss

        loss, grads = jax.value_and_grad(loss_of)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return jax.tree.map(lambda p, u: p + u, params, updates), opt_state, loss

    rng = jax.random.PRNGKey(0)
    for _ in range(epochs):
        for b in loader:
            batch = {k: jnp.asarray(v) for k, v in b.items()
                     if isinstance(v, np.ndarray)}
            params, opt_state, _ = step(params, opt_state, batch, rng)
    return params


# The pivot scores every metric BOTH frameworks can compute here: BLEU_4,
# ROUGE_L, CIDEr.  The reference's METEOR needs meteor-1.5.jar — a missing
# LFS blob even upstream (pycocoevalcap/meteor/meteor.py:19-25) — so a
# two-sided METEOR column is impossible by construction; ours is exercised
# in tests/test_meteor_alignment.py instead.
METRICS = ("CIDEr", "BLEU_4", "ROUGE_L")


def _our_scores(gts, res):
    from mvc_tpu.evalcap.bleu import Bleu
    from mvc_tpu.evalcap.cider import Cider
    from mvc_tpu.evalcap.rouge import Rouge

    bleu, _ = Bleu(4).compute_score(gts, res)
    rouge, _ = Rouge().compute_score(gts, res)
    cider, _ = Cider().compute_score(gts, res)
    return {"CIDEr": float(cider), "BLEU_4": float(bleu[3]),
            "ROUGE_L": float(rouge)}


def _ref_scores(gts, res):
    from pycocoevalcap.bleu.bleu import Bleu as RefBleu
    from pycocoevalcap.cider.cider import Cider as RefCider
    from pycocoevalcap.rouge.rouge import Rouge as RefRouge

    bleu, _ = RefBleu(4).compute_score(gts, res)
    rouge, _ = RefRouge().compute_score(gts, res)
    cider, _ = RefCider().compute_score(gts, res)
    return {"CIDEr": float(cider), "BLEU_4": float(bleu[3]),
            "ROUGE_L": float(rouge)}


def eval_ours(model, params, vidcap_loader, vocab, max_len=16):
    import jax.numpy as jnp

    from mvc_tpu.models.captioning import captions_from_tokens

    gts, res = {}, {}
    for batch in vidcap_loader:
        tokens = model.predict_tokens(
            params, jnp.asarray(batch["audio"]), jnp.asarray(batch["visual"]),
            max_caption_len=max_len, mode="direct")
        caps = captions_from_tokens(vocab, np.asarray(tokens))
        for vid, gen, gt, real in zip(
                batch["video_ids"], caps, batch["captions"],
                batch.get("sample_mask", [True] * len(caps))):
            if not real:
                continue
            gts[vid] = list(gt)
            res[vid] = [gen]
    return _our_scores(gts, res), res, gts


def eval_reference(ref, vidcap_loader, max_len=16):
    import torch

    gts, res = {}, {}
    with torch.no_grad():
        for batch in vidcap_loader:
            caps = ref.predict(torch.tensor(batch["audio"]),
                               torch.tensor(batch["visual"]),
                               max_caption_len=max_len, mode="direct")
            for vid, gen, gt, real in zip(
                    batch["video_ids"], caps, batch["captions"],
                    batch.get("sample_mask", [True] * len(caps))):
                if not real:
                    continue
                gts[vid] = list(gt)
                res[vid] = [gen]
    return _ref_scores(gts, res), res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--root", default="/tmp/quality_ladder/MSVD")
    ap.add_argument("--out", default=os.path.join(REPO, "QUALITY_LADDER.md"))
    ap.add_argument("--tolerance", type=float, default=0.35,
                    help="max |ours - ref| CIDEr per cell")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from mvc_tpu.config import DecoderConfig
    from mvc_tpu.data import get_loader
    from mvc_tpu.data.dataset import video_dataset_to_video_captions_loader
    from mvc_tpu.data.vocabulary import Vocabulary
    from mvc_tpu.models.captioning import AVCaptioningDual
    from mvc_tpu.utils.checkpoint_convert import (
        convert_decoder_state_dict, convert_reconstructor_state_dict,
    )

    if not os.path.isdir(args.root):
        build_corpus(args.root)
    vocab = Vocabulary.load(f"{args.root}/metadata/vocab.json")
    ref_cap = _reference_imports()

    def loaders(video_only):
        train_loader, _ = get_loader(
            root_dir=args.root, dataset="MSVD", split="train", batch_size=BATCH,
            shuffle=False, verbose=False, video_only=video_only,
            vocab_path=f"{args.root}/metadata/vocab.json",
            frame_buckets=(T_CONST,), caption_buckets=(12,),
        )
        _, val_ds = get_loader(
            root_dir=args.root, dataset="MSVD", split="val", batch_size=BATCH,
            shuffle=False, verbose=False, video_only=video_only,
            vocab_path=f"{args.root}/metadata/vocab.json",
            frame_buckets=(T_CONST,), caption_buckets=(12,),
        )
        vidcap = video_dataset_to_video_captions_loader(
            val_ds, BATCH, frame_buckets=(T_CONST,))
        return train_loader, vidcap

    # The reference sweep's modality axis is the dataset's video_only switch
    # (audio zeroed at load, src/get_loader.py:264-266 / src/train.py:377-430),
    # crossed with the reconstructor type.
    sweep = []
    for video_only, tag in ((True, "video"), (False, "video_audio")):
        for rec in ("none", "local", "global"):
            sweep.append((tag, video_only, rec,
                          dict(reg_lambda=0.0005,
                               audio_recon_lambda=0.0 if video_only else 0.00005,
                               visual_recon_lambda=0.5)))

    results = {}
    for tag, video_only, rec, lambdas in sweep:
        print(f"=== {tag} / {rec} ===", flush=True)
        ref = _ref_model(ref_cap, vocab, rec)
        init = {
            "v_decoder": convert_decoder_state_dict(ref.v_decoder.state_dict()),
            "a_decoder": convert_decoder_state_dict(ref.a_decoder.state_dict()),
            "v_reconstructor": convert_reconstructor_state_dict(
                ref.v_reconstructor.state_dict() if ref.v_reconstructor else None),
            "a_reconstructor": convert_reconstructor_state_dict(
                ref.a_reconstructor.state_dict() if ref.a_reconstructor else None),
        }
        ours = AVCaptioningDual(
            vocab_size=len(vocab), teacher_forcing_ratio=1.0,
            reconstructor_type=rec,
            visual_decoder_config=DecoderConfig(
                in_feature_size=V_DIM, rnn_hidden_size=16,
                embedding_size=8, attn_size=6),
            audio_decoder_config=DecoderConfig(
                in_feature_size=A_DIM, rnn_hidden_size=16,
                embedding_size=8, attn_size=6),
        )

        train_loader, vidcap = loaders(video_only)
        params = train_ours(ours, init, train_loader, lambdas, args.epochs,
                            lr=1e-3)
        our_scores, our_res, _ = eval_ours(ours, params, vidcap, vocab)

        train_loader, vidcap = loaders(video_only)
        train_reference(ref, train_loader, lambdas, args.epochs, lr=1e-3)
        ref_scores, ref_res = eval_reference(ref, vidcap)

        agree = np.mean([our_res[k] == ref_res[k] for k in our_res])
        results[(tag, rec)] = (our_scores, ref_scores, float(agree))
        print("  " + "  ".join(
            f"{m}: ours={our_scores[m]:.3f} ref={ref_scores[m]:.3f}"
            for m in METRICS) + f"  identical-caption rate={agree:.2f}",
            flush=True)

    # ---------------- pivot + assertions ----------------
    header = "| modality | reconstructor | " + " | ".join(
        f"ours {m} | ref {m}" for m in METRICS) + " | identical captions |"
    lines = [
        "# Quality ladder — 6-experiment sweep, synthetic corpus "
        "(VERDICT r3 item 4)",
        "",
        f"Corpus: {len(CLASS_CAPTIONS)} clip classes x "
        f"{TRAIN_PER_CLASS} train / {VAL_PER_CLASS} val clips, T={T_CONST}, "
        f"2 captions/clip; both frameworks trained {args.epochs} epochs from "
        "IDENTICAL converted init weights, identical batch order, lr 1e-3, "
        "reference step semantics on torch CPU vs our step on jax CPU; "
        "every metric via each framework's OWN scorer stack "
        "(mvc_tpu.evalcap vs vendored pycocoevalcap).  METEOR is absent "
        "because the reference side cannot compute it at all (meteor-1.5.jar "
        "is a missing LFS blob upstream); ours is parity-tested in "
        "tests/test_meteor_alignment.py.",
        "",
        header,
        "|" + "---|" * (2 + 2 * len(METRICS) + 1),
    ]
    for (tag, rec), (o, r, a) in results.items():
        cells_txt = " | ".join(f"{o[m]:.3f} | {r[m]:.3f}" for m in METRICS)
        lines.append(f"| {tag} | {rec} | {cells_txt} | {a:.2f} |")

    cells = list(results.values())
    max_diff = {m: max(abs(o[m] - r[m]) for o, r, _ in cells)
                for m in METRICS}
    ours_order = np.argsort([o["CIDEr"] for o, _, _ in cells])
    ref_order = np.argsort([r["CIDEr"] for _, r, _ in cells])
    order_agree = (ours_order == ref_order).mean()
    lines += [
        "",
        "Max per-cell |ours - ref|: " + ", ".join(
            f"{m} {max_diff[m]:.3f}" for m in METRICS)
        + f" (CIDEr tolerance {args.tolerance})",
        f"CIDEr ordering agreement across the 6 cells: {order_agree:.2f} "
        "(argsort positions equal)",
    ]
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    assert max_diff["CIDEr"] <= args.tolerance, (
        f"per-cell CIDEr divergence {max_diff['CIDEr']} exceeds "
        f"{args.tolerance}")


if __name__ == "__main__":
    main()
