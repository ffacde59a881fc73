"""Measure the fused chunked-vocab loss vs the materializing path on TPU.

Runs the production jitted train step (Trainer._build_train_step) at the
bench workload (AVCaptioningDual, B=128, T=28, L=8, V=4000, global recon,
bf16 compute) with cfg.fused_loss True/False and reports samples/s plus XLA
cost-analysis bytes for each — the ablation VERDICT r4 item 1 asks for.

Usage:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_fused_loss.py
        [--iters 100] [--tile_v 512 1024 4096] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import time

ap = argparse.ArgumentParser()
ap.add_argument("--iters", type=int, default=100)
ap.add_argument("--cpu", action="store_true")
ap.add_argument("--tile_v", type=int, nargs="*", default=[512])
ap.add_argument("--adam_state", action="store_true",
                help="also ablate adam_state_dtype f32 vs bfloat16")
ap.add_argument("--B", type=int, default=128)
ap.add_argument("--T", type=int, default=28)
ap.add_argument("--L", type=int, default=8)
ap.add_argument("--V", type=int, default=4000)
args = ap.parse_args()

import jax

if args.cpu:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from mvc_tpu.config import TrainerConfig
from mvc_tpu.models import AVCaptioningDual
from mvc_tpu.training import optimizer as opt_lib
from mvc_tpu.training.trainer import Trainer

B, T, L, V = args.B, args.T, args.L, args.V


def build(fused: bool, adam_state_dtype=None):
    cfg = TrainerConfig(batch_size=B, fused_loss=fused,
                        adam_state_dtype=adam_state_dtype)
    model = AVCaptioningDual(vocab_size=V, reconstructor_type="global",
                             dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0))
    tr = Trainer("bench", log_dir=None)
    tr._optimizer = opt_lib.make_optimizer(cfg)
    train_step, _ = tr._build_train_step(model, cfg)
    opt_state = tr._optimizer.init(params)
    return train_step, params, opt_state


gen = np.random.default_rng(0)
batch = {
    "audio": jnp.asarray(gen.normal(size=(B, T, 128)).astype(np.float32)),
    "visual": jnp.asarray(gen.normal(size=(B, T, 2048)).astype(np.float32)),
    "captions": jnp.asarray(np.concatenate([
        np.full((1, B), 1, np.int32),
        gen.integers(3, V, size=(L - 1, B), dtype=np.int32),
    ])),
    "feat_mask": jnp.ones((B, T), bool),
}
rng = jax.random.PRNGKey(1)


def cost(jfn, *a):
    try:
        an = jfn.lower(*a).compile().cost_analysis()
        if isinstance(an, list):
            an = an[0]
        return an.get("flops", 0.0), an.get("bytes accessed", 0.0)
    except Exception as e:  # pragma: no cover
        print("cost_analysis failed:", e)
        return 0.0, 0.0


def measure(name, fused, tile_v=512, adam_state_dtype=None):
    # The trainer imports ce_entropy_from_hiddens at trace time, so a patched
    # default tile size must stay applied through compile+timing.
    import functools

    from mvc_tpu.training import fused_loss as fl

    orig = fl.ce_entropy_from_hiddens
    if fused and tile_v != 512:
        fl.ce_entropy_from_hiddens = functools.partial(orig, tile_v=tile_v)
    try:
        step, params, opt_state = build(fused, adam_state_dtype)
        flops, byts = cost(step, params, opt_state, batch, rng)
    finally:
        fl.ce_entropy_from_hiddens = orig
    t0 = time.perf_counter()
    params, opt_state, m = step(params, opt_state, batch, rng)
    total0 = float(np.asarray(m["total"]))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(args.iters):
        params, opt_state, m = step(params, opt_state, batch, rng)
    np.asarray(m["total"])
    dt = time.perf_counter() - t0
    rate = B * args.iters / dt
    rec = {"name": name, "samples_per_sec": round(rate, 1),
           "ms_per_step": round(1e3 * dt / args.iters, 3),
           "first_loss": round(total0, 5),
           "flops": flops, "bytes": byts, "compile_s": round(compile_s, 1)}
    print(json.dumps(rec), flush=True)
    return rec


base = measure("materializing", False)
for tv in args.tile_v:
    r = measure(f"fused_tile{tv}", True, tv)
    print(json.dumps({"speedup": round(r["samples_per_sec"] / base["samples_per_sec"], 3),
                      "tile_v": tv}), flush=True)

if args.adam_state:
    # Opt-in non-parity lever (PARITY #11): bf16 Adam moment storage. The
    # first-step loss must match f32 moments exactly (moments are consumed
    # only from step 2 on); round-5 measured +21% samples/s on one v5e.
    f32 = measure("fused_adam_f32", True)
    bf16 = measure("fused_adam_bf16", True, adam_state_dtype="bfloat16")
    print(json.dumps({
        "adam_state_speedup": round(
            bf16["samples_per_sec"] / f32["samples_per_sec"], 3),
        "first_loss_equal": bf16["first_loss"] == f32["first_loss"],
    }), flush=True)
