"""Multi-host bring-up worker: one jax.distributed process of a dp-sharded
training step.

Run one instance per host/process:

    python scripts/multihost_worker.py \
        --coordinator localhost:12345 --num-processes 2 --process-id 0 \
        --data-root /path/to/msvd --local-devices 4

Each process loads its disjoint dataset shard via
``DataLoader(process_index, process_count)``, assembles the global batch over
the all-process mesh (``make_global_mesh``), runs ONE jitted train step
(gradients all-reduced across processes by GSPMD collectives), and prints a
JSON line with the globally-replicated loss and updated-parameter norm —
identical across processes, and identical to a single-process run over the
same global batch (tests/test_multihost.py asserts both).

The reference has no distributed layer (SURVEY.md §2.3); this is the
framework's multi-host (DCN) smoke path.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_T0 = time.time()


def _mark(msg: str) -> None:
    """Phase timestamps to stderr — the cross-process stagger at any Gloo
    rendezvous must stay under XLA's hardcoded 30 s KV-store timeout, and
    these marks are how a timeout gets attributed (single-CPU starvation vs
    a real bug)."""
    print(f"[mh {os.environ.get('MH_PID', '?')} +{time.time() - _T0:7.2f}s] {msg}",
          file=sys.stderr, flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--local-devices", type=int, default=0,
                    help="provision this many virtual CPU devices (0 = use real devices)")
    ap.add_argument("--batch-size", type=int, default=4, help="LOCAL batch size")
    ap.add_argument("--tp", type=int, default=1)
    args = ap.parse_args()

    if args.local_devices:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.local_devices)
    else:
        import jax

    from mvc_tpu.utils.runtime import setup_compile_cache

    setup_compile_cache()

    from mvc_tpu.config import TrainerConfig
    from mvc_tpu.data import get_loader
    from mvc_tpu.parallel import initialize, make_global_mesh, param_shardings
    from mvc_tpu.parallel.mesh import shard_batch
    from mvc_tpu.parallel.smoke import (
        make_smoke_loss, make_smoke_model, make_smoke_train_step,
    )
    from mvc_tpu.training.optimizer import make_optimizer

    os.environ["MH_PID"] = str(args.process_id)
    _mark("imports done, initializing jax.distributed")
    process_index, process_count = initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    _mark("jax.distributed up")
    mesh = make_global_mesh(dp=-1, tp=args.tp)

    loader, ds = get_loader(
        root_dir=args.data_root, dataset="MSVD", split="train",
        batch_size=args.batch_size, shuffle=False, verbose=False,
        vocab_path=os.path.join(args.data_root, "metadata", "vocab.json"),
        frame_buckets=(8,), caption_buckets=(12,),
        process_index=process_index, process_count=process_count,
    )
    batch = next(iter(loader))
    _mark("local batch loaded")

    a_dim = batch["audio"].shape[-1]
    v_dim = batch["visual"].shape[-1]
    model = make_smoke_model(len(ds.vocab), a_dim, v_dim)
    params = model.init(jax.random.PRNGKey(0))
    params = jax.device_put(params, param_shardings(mesh, params))
    optimizer = make_optimizer(TrainerConfig())
    opt_state = optimizer.init(params)

    gbatch = shard_batch(mesh, batch)
    _mark("params + batch sharded")
    train_step = make_smoke_train_step(model, make_smoke_loss(), optimizer)
    step = jax.jit(train_step, donate_argnums=(0, 1))
    compiled = step.lower(params, opt_state, gbatch, jax.random.PRNGKey(1)).compile()
    _mark("train step compiled")
    params, opt_state, loss, gnorm, pnorm = compiled(
        params, opt_state, gbatch, jax.random.PRNGKey(1)
    )
    loss = float(loss)
    _mark("train step executed")
    print(json.dumps({
        "process_index": process_index,
        "process_count": process_count,
        "global_devices": jax.device_count(),
        "local_batch": int(batch["audio"].shape[0]),
        "loss": float(loss),
        "grad_norm": float(gnorm),
        "param_norm": float(pnorm),
    }), flush=True)


if __name__ == "__main__":
    sys.exit(main())
