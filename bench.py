#!/usr/bin/env python
"""Headline benchmark: batched beam-search decode throughput (captions/sec).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline = the PyTorch reference's beam search (imported read-only from
/root/reference, torch CPU — its only runnable form here), same decoder
dimensions and workload, normalized to captions/sec.  The measured baseline is
cached in BENCH_BASELINE.json so later rounds compare against the same number.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
BASELINE_CACHE = os.path.join(REPO, "BENCH_BASELINE.json")

VOCAB = 4000
B = 64          # clips per batch
T = 16          # frames
WIDTH = 5
MAX_LEN = 30


def bench_ours() -> float:
    import jax
    import jax.numpy as jnp

    from mvc_tpu.utils.runtime import setup_compile_cache

    setup_compile_cache()

    from mvc_tpu.models import AVCaptioningDual

    model = AVCaptioningDual(vocab_size=VOCAB, dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0))

    gen = np.random.default_rng(0)
    audio = jnp.asarray(gen.normal(size=(B, T, 128)).astype(np.float32))
    visual = jnp.asarray(gen.normal(size=(B, T, 2048)).astype(np.float32))

    from mvc_tpu.ops.pallas_beam import beam_decode_pallas

    xla_beam = jax.jit(
        lambda p, a, v: model.predict_tokens(
            p, a, v, max_caption_len=MAX_LEN, mode="beam", beam_width=WIDTH
        )
    )
    # Fused whole-search Pallas kernel (ops/pallas_beam.py) — the production
    # MVC_PALLAS=1 path; token parity vs the scan is asserted in
    # tests/test_pallas.py, perf study in BENCH_NOTES.md.
    pallas_beam = jax.jit(
        lambda p, a, v: beam_decode_pallas(
            [p["v_decoder"], p["a_decoder"]], [v, a],
            max_caption_len=MAX_LEN, beam_width=WIDTH,
            weight_dtype="bfloat16",
        )
    )

    def rate(predict, iters=50):
        np.asarray(predict(params, audio, visual))   # compile + hard sync
        t0 = time.perf_counter()
        for _ in range(iters):
            out = predict(params, audio, visual)
        np.asarray(out)                              # device_get = hard sync
        return B * iters / (time.perf_counter() - t0)

    best = rate(xla_beam)
    try:
        best = max(best, rate(pallas_beam))
    except Exception as e:                           # pragma: no cover
        print(f"pallas beam path failed ({e}); reporting XLA path", file=sys.stderr)
    return best


def bench_reference_baseline() -> float:
    """Reference beam_search_predict on torch CPU, same dims; captions/sec."""
    sys.path.insert(0, os.path.join("/root/reference", "src"))
    import torch

    # The reference's models package imports torchvision/torch.hub encoders we
    # don't need for the decoder benchmark; stub them if absent.
    import types

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

    from models.features_captioning import FeaturesCaptioning  # reference import

    class VocabShim:
        stoi = {"<SOS>": 1, "<EOS>": 2}

        def __len__(self):
            return VOCAB

    torch.set_num_threads(os.cpu_count() or 8)
    v_dec = FeaturesCaptioning(
        in_feature_size=2048, output_size=VOCAB, rnn_type="LSTM",
        rnn_hidden_size=512, embedding_size=300, attn_size=256, device="cpu",
    ).eval()
    gen = np.random.default_rng(0)
    b_ref = 16  # smaller batch; normalized to captions/sec
    visual = torch.tensor(gen.normal(size=(b_ref, T, 2048)).astype(np.float32))
    with torch.no_grad():
        v_dec.beam_search_predict(visual[:2], VocabShim(), 5, 0, WIDTH)  # warmup
        t0 = time.perf_counter()
        v_dec.beam_search_predict(visual, VocabShim(), MAX_LEN, 0, WIDTH)
        dt = time.perf_counter() - t0
    return b_ref / dt


def get_baseline() -> float:
    if os.path.isfile(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)["captions_per_sec"]
    try:
        base = bench_reference_baseline()
        with open(BASELINE_CACHE, "w") as f:
            json.dump({"captions_per_sec": base, "workload": {
                "B": B, "T": T, "width": WIDTH, "max_len": MAX_LEN, "vocab": VOCAB,
                "note": "reference beam_search_predict, torch CPU (only runnable form)",
            }}, f, indent=1)
        return base
    except Exception as e:
        print(f"baseline measurement failed: {e}", file=sys.stderr)
        return float("nan")


def _wait_for_device(delay: float = 30.0, max_relaunches: int = 10):
    """The axon tunnel grants the chip to one process at a time; the claim
    happens at interpreter startup (sitecustomize) and cannot be retried
    in-process — re-exec after a delay if it failed."""
    import time

    import jax

    try:
        jax.devices()
        return
    except RuntimeError as e:
        n = int(os.environ.get("MVC_BENCH_RELAUNCH", "0"))
        if n >= max_relaunches:
            raise
        print(f"device claim failed ({e}); re-exec {n + 1}/{max_relaunches}", file=sys.stderr)
        time.sleep(delay)
        os.environ["MVC_BENCH_RELAUNCH"] = str(n + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)


def main():
    _wait_for_device()
    ours = bench_ours()
    base = get_baseline()
    vs = ours / base if np.isfinite(base) and base > 0 else None
    print(json.dumps({
        "metric": "captions/sec (beam decode, width 5, dual model)",
        "value": round(ours, 2),
        "unit": "captions/s",
        "vs_baseline": round(vs, 2) if vs else None,
    }))


if __name__ == "__main__":
    main()
