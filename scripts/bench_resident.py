#!/usr/bin/env python
"""Resident-weight vs streaming-tile fused greedy kernel on hardware.

The streaming kernel re-reads wi/wout from HBM every decode step
(double-buffered tiles); at reference shapes the whole weight set fits VMEM,
so the resident variant reads it once and runs each step as two full-width
matmuls (ops/pallas_decode.py).  This script measures both plus the XLA scan
at the production single-decoder greedy shape.  Results -> BENCH_NOTES.md.

Usage (one TPU process at a time):
    python scripts/bench_resident.py [--batches 32,64,96] [--iters 50]
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
    ap.add_argument("--mode", default="greedy",
                    choices=["greedy", "dual", "beam"])
    ap.add_argument("--beam_width", default=5, type=int)
    ap.add_argument("--batches", default="32,64,96")
    ap.add_argument("--iters", default=50, type=int)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mvc_tpu.config import DecoderConfig
    from mvc_tpu.models import decoder as dec
    from mvc_tpu.utils.runtime import setup_compile_cache

    setup_compile_cache()
    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    gen = np.random.default_rng(0)

    if args.mode in ("dual", "beam"):
        from mvc_tpu.models import AVCaptioningDual
        from mvc_tpu.ops.pallas_dual_greedy import dual_greedy_decode_pallas

        model = AVCaptioningDual(vocab_size=VOCAB, dtype=jnp.bfloat16)
        mparams = model.init(jax.random.PRNGKey(0))
        vp = jax.tree.map(lambda x: x.astype(jnp.bfloat16), mparams["v_decoder"])
        ap_ = jax.tree.map(lambda x: x.astype(jnp.bfloat16), mparams["a_decoder"])
    else:
        # the production single-model greedy decoder (concat A+V features)
        cfg = DecoderConfig(output_size=VOCAB)
        params = dec.init_decoder(jax.random.PRNGKey(0), cfg)
        params = jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                              if x.dtype == jnp.float32 else x, params)

    for B in (int(b) for b in args.batches.split(",")):
        row = {"mode": args.mode, "B": B, "T": T, "L": MAX_LEN, "V": VOCAB}
        if args.mode == "beam":
            from mvc_tpu.ops.pallas_beam import beam_decode_pallas

            W = args.beam_width
            row["W"] = W
            vfeats = jnp.asarray(gen.normal(size=(B, T, 2048)).astype(np.float32))
            afeats = jnp.asarray(gen.normal(size=(B, T, 128)).astype(np.float32))
            for name, res in (("streaming", False), ("resident", True)):
                fn = jax.jit(lambda v, a, res=res: beam_decode_pallas(
                    [vp, ap_], [v, a], max_caption_len=MAX_LEN, beam_width=W,
                    weight_dtype="bfloat16", resident=res))
                best = min(measure(fn, (vfeats, afeats), args.iters)
                           for _ in range(3))
                row[f"{name}_ms"] = best * 1e3
                row[f"{name}_captions_per_s"] = B / best
        elif args.mode == "dual":
            vfeats = jnp.asarray(gen.normal(size=(B, T, 2048)).astype(np.float32))
            afeats = jnp.asarray(gen.normal(size=(B, T, 128)).astype(np.float32))
            for name, res in (("streaming", False), ("resident", True)):
                fn = jax.jit(lambda v, a, res=res: dual_greedy_decode_pallas(
                    [vp, ap_], [v, a], max_caption_len=MAX_LEN,
                    weight_dtype="bfloat16", resident=res))
                best = min(measure(fn, (vfeats, afeats), args.iters)
                           for _ in range(3))
                row[f"{name}_ms"] = best * 1e3
                row[f"{name}_captions_per_s"] = B / best
        else:
            from mvc_tpu.ops.pallas_decode import greedy_decode_pallas

            feats = jnp.asarray(
                gen.normal(size=(B, T, cfg.in_feature_size)).astype(np.float32))
            xla = jax.jit(lambda p, f: dec.greedy_tokens(
                dec.decode(p, cfg, f, captions=None, max_caption_len=MAX_LEN,
                           dtype=jnp.bfloat16)[0]))
            row["xla_ms"] = measure(xla, (params, feats), args.iters) * 1e3
            for name, res in (("streaming", False), ("resident", True)):
                fn = jax.jit(lambda p, f, res=res: greedy_decode_pallas(
                    p, f, max_caption_len=MAX_LEN, weight_dtype="bfloat16",
                    resident=res))
                best = min(measure(fn, (params, feats), args.iters)
                           for _ in range(3))
                row[f"{name}_ms"] = best * 1e3
                row[f"{name}_captions_per_s"] = B / best
        row["resident_vs_streaming"] = row["streaming_ms"] / row["resident_ms"]
        print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                          for k, v in row.items()}), flush=True)


if __name__ == "__main__":
    main()
