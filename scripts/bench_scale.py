#!/usr/bin/env python
"""Decode-kernel scale study: fused Pallas vs XLA scan across batch and
beam width (VERDICT r2 #7).

The round-2 headline (1.65x beam, 1.4x greedy at B=64) compares two
latency-bound programs; this sweep measures where the streaming kernel
design pays or saturates as the batch grows (B=64..1024) and the beam
widens (W=5, 10), to pick defaults.  Results table lives in BENCH_NOTES.md.

Usage (one TPU process at a time):
    python scripts/bench_scale.py [--mode beam|greedy] [--iters 30]
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
    ap.add_argument("--mode", default="beam", choices=["beam", "greedy"])
    ap.add_argument("--batches", default="64,256,1024")
    ap.add_argument("--widths", default="5,10")
    ap.add_argument("--iters", default=30, type=int)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mvc_tpu.models import AVCaptioningDual
    from mvc_tpu.ops import dispatch
    from mvc_tpu.utils.runtime import setup_compile_cache

    setup_compile_cache()
    model = AVCaptioningDual(vocab_size=VOCAB, dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0))
    gen = np.random.default_rng(0)

    widths = [int(w) for w in args.widths.split(",")] if args.mode == "beam" else [1]
    for B in (int(b) for b in args.batches.split(",")):
        audio = jnp.asarray(gen.normal(size=(B, T, 128)).astype(np.float32))
        visual = jnp.asarray(gen.normal(size=(B, T, 2048)).astype(np.float32))
        for W in widths:
            from mvc_tpu.ops.pallas_beam import fits_vmem

            row = {"mode": args.mode, "B": B, "W": W,
                   # False -> the dispatch gate routes even MVC_PALLAS=1 to
                   # the XLA scan (expect speedup ~1.0 in that row)
                   "pallas_gate": fits_vmem(
                       [params["v_decoder"], params["a_decoder"]],
                       [visual, audio], beam_width=W,
                       rnn_types=("LSTM", "LSTM"))}
            for use_pallas in (False, True):
                dispatch.enable_pallas(use_pallas)
                try:
                    if args.mode == "beam":
                        fn = jax.jit(lambda p, a, v: model.predict_tokens(
                            p, a, v, max_caption_len=MAX_LEN, mode="beam",
                            beam_width=W))
                    else:
                        fn = jax.jit(lambda p, a, v: model.predict_tokens(
                            p, a, v, max_caption_len=MAX_LEN, mode="direct"))
                    dt = measure(fn, (params, audio, visual), args.iters)
                    key = "pallas" if use_pallas else "xla"
                    row[f"{key}_ms"] = round(dt * 1e3, 2)
                    row[f"{key}_captions_per_sec"] = round(B / dt, 1)
                except Exception as e:
                    row["pallas_error" if use_pallas else "xla_error"] = str(e)[:200]
                finally:
                    dispatch.enable_pallas(False)
            if "pallas_ms" in row and "xla_ms" in row:
                row["speedup"] = round(row["xla_ms"] / row["pallas_ms"], 2)
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
