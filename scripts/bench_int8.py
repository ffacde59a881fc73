#!/usr/bin/env python
"""int8 weight-only decode study: bf16 vs int8 weight streams on the
XLA-scan decode paths at large batch (ops/quant.py).

Measured outcome (BENCH_NOTES round 3): ~1.0x — the dequant is
loop-invariant, so XLA hoists it out of the scan and streams the
materialized bf16 weights; and after the tokens-only greedy fix the
large-batch path's bytes are dominated by per-step [B, V] logits, not
weights.  Kept as the reproduction harness for that negative result (it
also reports token agreement under random-weight worst-case conditioning).

Usage (one TPU process at a time):
    python scripts/bench_int8.py [--mode greedy|beam] [--iters 30]
Prints one JSON line per configuration.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VOCAB, T, MAX_LEN = 4000, 16, 30


def measure(fn, args, iters):
    np.asarray(fn(*args))                         # compile + sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="greedy", choices=["greedy", "beam"])
    ap.add_argument("--batches", default="256,1024")
    ap.add_argument("--width", default=5, type=int)
    ap.add_argument("--iters", default=30, type=int)
    ap.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mvc_tpu.models import AVCaptioningDual
    from mvc_tpu.ops.quant import quantize_model_params
    from mvc_tpu.utils.runtime import setup_compile_cache

    setup_compile_cache()
    model = AVCaptioningDual(vocab_size=VOCAB, dtype=getattr(jnp, args.dtype))
    params = model.init(jax.random.PRNGKey(0))
    qparams = quantize_model_params(params)
    gen = np.random.default_rng(0)

    mode = "direct" if args.mode == "greedy" else "beam"
    W = args.width if args.mode == "beam" else 1
    for B in (int(b) for b in args.batches.split(",")):
        audio = jnp.asarray(gen.normal(size=(B, T, 128)).astype(np.float32))
        visual = jnp.asarray(gen.normal(size=(B, T, 2048)).astype(np.float32))
        fn = jax.jit(lambda p, a, v: model.predict_tokens(
            p, a, v, max_caption_len=MAX_LEN, mode=mode, beam_width=W))
        row = {"mode": args.mode, "B": B, "W": W, "dtype": args.dtype}
        base = measure(fn, (params, audio, visual), args.iters)
        q = measure(fn, (qparams, audio, visual), args.iters)
        row["base_ms"] = round(base * 1e3, 2)
        row["int8_ms"] = round(q * 1e3, 2)
        row["base_captions_per_sec"] = round(B / base, 1)
        row["int8_captions_per_sec"] = round(B / q, 1)
        row["speedup"] = round(base / q, 2)
        # token agreement (random weights = worst-case conditioning)
        tok_b = np.asarray(fn(params, audio, visual))
        tok_q = np.asarray(fn(qparams, audio, visual))
        row["token_agreement"] = round(float((tok_b == tok_q).mean()), 4)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
