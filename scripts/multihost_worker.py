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

    # Persistent compile cache: on a contended single-CPU host a cold compile
    # can outlast the Gloo collective timeout of the peer process; a warm
    # cache makes the step dispatch immediately.
    try:
        os.makedirs("/root/.jax_cache", exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass

    from mvc_tpu.config import DecoderConfig, TrainerConfig
    from mvc_tpu.data import get_loader
    from mvc_tpu.models import AVCaptioningDual
    from mvc_tpu.parallel import initialize, make_global_mesh, param_shardings
    from mvc_tpu.parallel.mesh import shard_batch
    from mvc_tpu.training.losses import ModalityWiseReconstructionLossBuilder
    from mvc_tpu.training.optimizer import make_optimizer

    import jax.numpy as jnp

    process_index, process_count = initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    mesh = make_global_mesh(dp=-1, tp=args.tp)

    loader, ds = get_loader(
        root_dir=args.data_root, dataset="MSVD", split="train",
        batch_size=args.batch_size, shuffle=False, verbose=False,
        vocab_path=os.path.join(args.data_root, "metadata", "vocab.json"),
        frame_buckets=(8,), caption_buckets=(12,),
        process_index=process_index, process_count=process_count,
    )
    batch = next(iter(loader))

    a_dim = batch["audio"].shape[-1]
    v_dim = batch["visual"].shape[-1]
    model = AVCaptioningDual(
        vocab_size=len(ds.vocab), teacher_forcing_ratio=1.0, reconstructor_type="global",
        visual_decoder_config=DecoderConfig(in_feature_size=v_dim, rnn_hidden_size=16,
                                            embedding_size=8, attn_size=6),
        audio_decoder_config=DecoderConfig(in_feature_size=a_dim, rnn_hidden_size=16,
                                           embedding_size=8, attn_size=6),
    )
    params = model.init(jax.random.PRNGKey(0))
    params = jax.device_put(params, param_shardings(mesh, params))
    optimizer = make_optimizer(TrainerConfig())
    opt_state = optimizer.init(params)
    loss_fn = ModalityWiseReconstructionLossBuilder(
        reg_lambda=0.0005, audio_recon_lambda=0.00005, visual_recon_lambda=0.5,
        rec_type="global",
    )

    gbatch = shard_batch(mesh, batch)

    def train_step(params, opt_state, batch, rng):
        def loss_of(p):
            outputs, a_rec, v_rec = model.forward(
                p, batch["audio"], batch["visual"], batch["captions"],
                rng=rng, feat_mask=batch["feat_mask"],
            )
            loss, *_ = loss_fn(outputs, batch["captions"], batch["audio"], a_rec,
                               batch["visual"], v_rec, feat_mask=batch["feat_mask"])
            return loss

        loss, grads = jax.value_and_grad(loss_of)(params)
        gnorm = jnp.sqrt(sum(jnp.sum(g * g) for g in jax.tree.leaves(grads)))
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        pnorm = jnp.sqrt(sum(jnp.sum(p * p) for p in jax.tree.leaves(params)))
        return params, opt_state, loss, gnorm, pnorm

    step = jax.jit(train_step, donate_argnums=(0, 1))
    params, opt_state, loss, gnorm, pnorm = step(
        params, opt_state, gbatch, jax.random.PRNGKey(1)
    )
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
