"""Training / evaluation engine.

The reference's Trainer (reference src/train.py:35-348) rebuilt TPU-first:

- one jitted, sharding-annotated train step per (T, L) shape bucket:
  forward + loss + grad + optimizer in a single XLA program with donated
  params/opt_state (vs. eager per-op dispatch in torch)
- data-parallel batches over the mesh's ``dp`` axis; the gradient all-reduce
  is inserted by XLA (GSPMD) — there is no hand-written comms code
- greedy eval decode is a jitted program too; only caption ids return to host
- identical observable surface: history dict with the same six keys,
  TensorBoard scalars with the same tag names, 10 example captions per eval,
  checkpoint triggers on best val-CIDEr and best val-loss, ``eval_freq``
  cadence (reference src/train.py:110-173)
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mvc_tpu.config import TrainerConfig
from mvc_tpu.data.dataset import video_dataset_to_video_captions_loader
from mvc_tpu.evalcap import NLPScore
from mvc_tpu.parallel import mesh as mesh_lib
from mvc_tpu.training import losses as loss_lib
from mvc_tpu.training import optimizer as opt_lib
from mvc_tpu.training.checkpoint import (
    AsyncSaver,
    load_checkpoint,
    restore_params_like,
    save_checkpoint,
)

LOSS_KEYS = ("total", "ce", "e", "a_recon", "v_recon")


@jax.jit
def _dequant_int8(q, scale):
    return q.astype(jnp.float32) * scale


class _NullWriter:
    def add_scalar(self, *a, **k):
        pass

    def close(self):
        pass


def _make_writer(log_dir: Optional[str]):
    if not log_dir:
        return _NullWriter()
    try:
        from tensorboardX import SummaryWriter

        return SummaryWriter(log_dir)
    except Exception:
        return _NullWriter()


class Trainer:
    def __init__(
        self,
        checkpoint_name: str,
        log_dir: str = "logs",
        display_freq: int = 10,
        eval_freq: int = 10,
        mesh=None,
    ):
        self.checkpoint_name = checkpoint_name
        self.display_freq = display_freq
        self.eval_freq = eval_freq
        self.mesh = mesh
        if mesh is not None:
            # Register the mesh so the Pallas fast path shards its fused
            # kernels over it (ops/sharded.py) instead of GSPMD gathering a
            # dp-sharded predict batch onto one device.
            from mvc_tpu.ops.dispatch import set_mesh

            set_mesh(mesh)
        self.summary_writer = _make_writer(log_dir)
        self._predict_cache: Dict = {}
        self._transfer_dtype = None
        self._transfer_int8 = False
        self._device_prefetch = False
        self._meteor_synonyms = None
        self._meteor_paraphrases = None
        self._meteor_function_words = None
        self._saver = AsyncSaver()

    # ------------------------------------------------------------ jit builds
    def _build_train_step(self, model, cfg: TrainerConfig):
        loss_fn = loss_lib.ModalityWiseReconstructionLossBuilder(
            reg_lambda=cfg.reg_lambda,
            audio_recon_lambda=cfg.audio_recon_lambda,
            visual_recon_lambda=cfg.visual_recon_lambda,
            rec_type=model.reconstructor_type,
            compat_batch_axis_entropy=getattr(cfg, "compat_batch_axis_entropy", False),
        )
        mask_feats = cfg.mask_padded_features
        # Mixed precision: when the model computes in bf16, cast the f32
        # master params to bf16 ONCE per step, outside the decode/reconstruct
        # scans.  The per-use .astype inside the scan bodies then becomes a
        # no-op, so the dominant HBM traffic (decoder + reconstructor weights
        # re-streamed every scan step, forward and backward) moves at half
        # width.  Gradients flow through the cast back to the f32 masters;
        # Adam state stays f32.  Relying on XLA to hoist the in-scan casts
        # does NOT achieve this: measured on v5e at the bench workload
        # (B=128, T=28, dual+global recon), in-scan casts win 3% over f32
        # while this pre-cast wins 27% (7.7 -> 6.05 ms/step), with final
        # loss parity to ~1e-3 over 100 steps (BENCH_NOTES round 3).
        compute = jnp.dtype(model.dtype)

        def cast_params(params):
            if compute != jnp.dtype(jnp.bfloat16):
                return params
            return jax.tree.map(
                lambda p: p.astype(compute) if p.dtype == jnp.float32 else p,
                params,
            )

        # Fused chunked-vocab loss (training/fused_loss.py): compute CE +
        # entropy from decoder hiddens in vocab tiles — neither forward nor
        # backward materializes a [L, B, V] log-prob stack.  Falls back to
        # the materializing path for the batch-axis entropy bug-compat mode,
        # for tp>1 (the vocab projection is sharded over tp; the tile scan
        # would gather it), and for model families without forward_hiddens.
        tp = 1 if self.mesh is None else self.mesh.shape.get("tp", 1)
        use_fused = (
            getattr(cfg, "fused_loss", True)
            and not getattr(cfg, "compat_batch_axis_entropy", False)
            and tp == 1
            and hasattr(model, "forward_hiddens")
        )

        def compute_loss(params, batch, rng, tf_ratio):
            feat_mask = batch["feat_mask"] if mask_feats else None
            sample_mask = batch.get("sample_mask")
            p = cast_params(params)
            # Bucketed collators pad partial batches and pad_batch_to_multiple
            # pads for the dp axis: drop those rows from every batch-mean so
            # the loss matches the reference's (never-batch-padded) math
            # exactly — without the mask the entropy/global-recon terms dilute
            # by n_real/B and local-recon MSE reads the zero rows (losses.py).
            if use_fused:
                from mvc_tpu.training import fused_loss as fused_lib

                h_list, outs, a_rec, v_rec = model.forward_hiddens(
                    p, batch["audio"], batch["visual"], batch["captions"],
                    rng=rng, teacher_forcing_ratio=tf_ratio, feat_mask=feat_mask,
                )
                ce, ent = fused_lib.ce_entropy_from_hiddens(
                    h_list, outs, batch["captions"],
                    sample_mask=sample_mask, compute_dtype=compute,
                )
                a_l = loss_lib._single_reconstruction_loss(
                    batch["captions"], batch["audio"], a_rec,
                    model.reconstructor_type, feat_mask, sample_mask)
                v_l = loss_lib._single_reconstruction_loss(
                    batch["captions"], batch["visual"], v_rec,
                    model.reconstructor_type, feat_mask, sample_mask)
                loss = (ce + cfg.reg_lambda * ent
                        + cfg.audio_recon_lambda * a_l
                        + cfg.visual_recon_lambda * v_l)
            else:
                outputs, a_rec, v_rec = model.forward(
                    p, batch["audio"], batch["visual"], batch["captions"],
                    rng=rng, teacher_forcing_ratio=tf_ratio, feat_mask=feat_mask,
                )
                loss, ce, ent, a_l, v_l = loss_fn(
                    outputs, batch["captions"],
                    batch["audio"], a_rec, batch["visual"], v_rec,
                    feat_mask=feat_mask,
                    sample_mask=sample_mask,
                )
            metrics = {"total": loss, "ce": ce, "e": ent, "a_recon": a_l, "v_recon": v_l}
            return loss, metrics

        def train_step(params, opt_state, batch, rng):
            (loss, metrics), grads = jax.value_and_grad(
                lambda p: compute_loss(p, batch, rng, None), has_aux=True
            )(params)
            updates, opt_state = self._optimizer.update(grads, opt_state, params)
            params = jax.tree.map(lambda p, u: p + u, params, updates)
            return params, opt_state, metrics

        def eval_loss_step(params, batch, rng):
            _, metrics = compute_loss(params, batch, rng, 0.0)
            return metrics

        # Device-feature-cache variants: the batch carries caption ids + cache
        # row indices only; features/frame-mask are gathered on device (the
        # per-step H2D payload drops from ~MBs of features to ~KBs of ids).
        from mvc_tpu.data.feature_cache import gather_features

        def _with_features(batch, cache_arrays, t_pad):
            audio, visual, feat_mask = gather_features(
                cache_arrays, batch["video_rows"], t_pad,
                sample_mask=batch.get("sample_mask"),
            )
            full = dict(batch)
            full.update(audio=audio, visual=visual, feat_mask=feat_mask)
            return full

        # Close over the raw python functions, not the jitted versions bound
        # below — nesting the donating jit inside another trace would void
        # its donate_argnums and re-trace pointlessly.
        raw_train_step, raw_eval_loss_step = train_step, eval_loss_step

        def train_step_cached(params, opt_state, batch, cache_arrays, rng, t_pad):
            return raw_train_step(params, opt_state,
                                  _with_features(batch, cache_arrays, t_pad), rng)

        def eval_loss_step_cached(params, batch, cache_arrays, rng, t_pad):
            return raw_eval_loss_step(
                params, _with_features(batch, cache_arrays, t_pad), rng)

        # Sharding is carried by the input placements (params via
        # param_shardings, batches via shard_batch); GSPMD propagates it.
        self._train_step_cached = jax.jit(
            train_step_cached, donate_argnums=(0, 1), static_argnums=(5,)
        )
        self._eval_loss_step_cached = jax.jit(eval_loss_step_cached, static_argnums=(4,))
        train_step = jax.jit(train_step, donate_argnums=(0, 1))
        eval_loss_step = jax.jit(eval_loss_step)
        return train_step, eval_loss_step

    def _get_predict_fn(self, model, max_caption_len: int, mode: str = "direct",
                        beam_width: int = 5, beam_alpha: float = 0.0):
        # Key by the model's *configuration*, not id(model): models are
        # stateless config holders, so two instances with equal configs trace
        # identically — and a recycled id() from a GC'd model must not alias
        # a stale cache entry.
        import jax.numpy as jnp

        model_key = (
            type(model).__name__,
            getattr(model, "decoder_config", None),
            getattr(model, "v_config", None),
            getattr(model, "a_config", None),
            getattr(model, "fused_scan", None),
            jnp.dtype(model.dtype).name,
        )
        # Direct-mode eval stops once every row has emitted EOS: caption
        # TEXT (and therefore every metric) is identical — decode_indexes
        # never reads past the first EOS — while real-data eval stops at
        # the batch's longest caption instead of max_caption_len (PARITY.md;
        # transformer predicts don't take the hint).
        import inspect

        stop_eos = (mode == "direct" and "stop_at_all_eos" in
                    inspect.signature(model.predict_tokens).parameters)
        key = (model_key, max_caption_len, mode, beam_width, beam_alpha, stop_eos)
        if key not in self._predict_cache:
            kw = {"stop_at_all_eos": True} if stop_eos else {}
            self._predict_cache[key] = jax.jit(
                lambda p, a, v, m: model.predict_tokens(
                    p, a, v, max_caption_len=max_caption_len, mode=mode,
                    beam_width=beam_width, beam_alpha=beam_alpha, feat_mask=m,
                    **kw,
                )
            )
        return self._predict_cache[key]

    def _put_batch(self, batch):
        """Host batch -> device arrays (sharded over dp when a mesh is set).
        Feature tensors are optionally downcast on the host first — H2D
        bandwidth is the train-loop bottleneck off-host (BENCH_NOTES.md)."""
        arrays = {
            k: v for k, v in batch.items() if isinstance(v, np.ndarray)
        }
        n_real = int(batch["sample_mask"].sum()) if "sample_mask" in batch else None
        quant_scales = {}
        if self._transfer_int8:
            # int8 feature transfer: per-(sample, frame) max-abs scales; the
            # quarter-size payload is dequantized on device right after the
            # copy (4x fewer H2D bytes than f32)
            from mvc_tpu.data.feature_cache import quantize_int8

            for k in ("audio", "visual"):
                if k in arrays:
                    arrays[k], quant_scales[f"{k}_scale"] = quantize_int8(arrays[k])
            arrays.update(quant_scales)
        elif self._transfer_dtype is not None:
            arrays = {
                k: (v.astype(self._transfer_dtype) if v.dtype == np.float32 else v)
                for k, v in arrays.items()
            }
        if self.mesh is not None:
            # Each process pads its LOCAL batch to its share of the dp axis;
            # shard_batch assembles the global array across processes.
            dp = self.mesh.shape["dp"]
            pcount = jax.process_count()
            assert dp % pcount == 0, f"dp={dp} not divisible by {pcount} processes"
            arrays = mesh_lib.pad_batch_to_multiple(arrays, dp // pcount)
            arrays = mesh_lib.shard_batch(self.mesh, arrays)
        else:
            arrays = {k: jnp.asarray(v) for k, v in arrays.items()}
        if self._transfer_int8:
            # dequantize on device (one cheap fused multiply per feature tensor)
            for k in ("audio", "visual"):
                if k in arrays:
                    arrays[k] = _dequant_int8(arrays[k], arrays.pop(f"{k}_scale"))
        out = dict(batch)
        out.update(arrays)
        for k in ("audio_scale", "visual_scale"):
            out.pop(k, None)
        if n_real is not None:
            out["_n_real"] = n_real
        return out

    def _device_batches(self, dataloader):
        """Iterate device-resident batches, staging the next H2D copy on a
        background thread while the current step computes."""
        if not self._device_prefetch:
            for batch in dataloader:
                yield self._put_batch(batch)
            return

        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=2)
        sentinel = object()
        err = []

        def stage():
            try:
                for batch in dataloader:
                    q.put(self._put_batch(batch))
            except BaseException as e:
                err.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=stage, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                if err:
                    raise err[0]
                return
            yield item

    # ------------------------------------------------------------ chkpt
    def _main_payload(self, epoch, params, opt_state):
        import copy

        return {
            "epoch": epoch,
            "params": params,
            "opt_state": opt_state,
            "scheduler": self.lr_scheduler.state_dict(),
            "history": copy.deepcopy(self.history),
            "best_loss": self.best_loss,
            "best_CIDEr": self.best_CIDEr,
        }

    def _load(self, params):
        ckpt = load_checkpoint(self.checkpoint_name)
        if ckpt is None:
            print("No checkpoint found, using default parameters...")
            return params, None
        print(f"Resuming training from checkpoint: {self.checkpoint_name}")
        try:
            params = restore_params_like(params, ckpt["params"])
        except (ValueError, TypeError) as e:
            # structure mismatch (different model family at this path) — train
            # fresh, like the reference's swallow-and-continue (train.py:45-62)
            print(f"Error loading from checkpoint: {self.checkpoint_name} ({e}).\n"
                  "Using default parameters...")
            return params, None
        return params, ckpt

    # ------------------------------------------------------------ fit
    def fit(self, model, params, train_loader, val_loader, test_loader, train_config: TrainerConfig):
        cfg = train_config
        td = getattr(cfg, "transfer_dtype", None)
        self._transfer_int8 = td == "int8"
        if td and not self._transfer_int8:
            self._transfer_dtype = jnp.dtype(td)
        self._device_prefetch = bool(getattr(cfg, "device_prefetch", False))
        self._meteor_synonyms = getattr(cfg, "meteor_synonyms", None)
        self._meteor_paraphrases = getattr(cfg, "meteor_paraphrases", None)
        self._meteor_function_words = getattr(cfg, "meteor_function_words", None)
        self._optimizer = opt_lib.make_optimizer(cfg)
        self.lr_scheduler = opt_lib.PlateauScheduler(
            lr=cfg.lr, factor=cfg.lr_decay_gamma, patience=cfg.lr_decay_patience,
            min_lr=cfg.min_lr, mode=cfg.plateau_mode,
        )
        self.history = {
            "train_loss": [], "train_score": [], "val_loss": [],
            "val_score": [], "test_loss": [], "test_score": [],
        }
        self.previous_epochs = 0
        self.best_loss = 1e6
        self.best_CIDEr = 0.0

        self._vocab = train_loader.dataset.vocab

        params, ckpt = self._load(params)
        if self.mesh is not None:
            # Replicate (dp) / shard (tp) the parameters onto the mesh; the
            # optimizer state inherits the placement from params at init.
            params = jax.device_put(params, mesh_lib.param_shardings(self.mesh, params))
        opt_state = self._optimizer.init(params)
        if ckpt is not None:
            self.previous_epochs = ckpt.get("epoch", 0)
            self.history = ckpt.get("history", self.history)
            self.best_loss = ckpt.get("best_loss", self.best_loss)
            self.best_CIDEr = ckpt.get("best_CIDEr", self.best_CIDEr)
            if ckpt.get("scheduler"):
                self.lr_scheduler.load_state_dict(ckpt["scheduler"])
            if ckpt.get("opt_state") is not None:
                try:
                    opt_state = jax.tree.map(
                        lambda t, h: jnp.asarray(h), opt_state, ckpt["opt_state"]
                    )
                except Exception as e:
                    print(f"Optimizer state not restored ({e}); reinitializing")
        opt_state = opt_lib.set_learning_rate(opt_state, self.lr_scheduler.lr)

        self._train_step, self._eval_loss_step = self._build_train_step(model, cfg)

        # Device-resident feature cache (opt-in): all unique clips' features
        # go to HBM once; per-step transfer is caption ids + row indices.
        if getattr(cfg, "device_feature_cache", False):
            from mvc_tpu.data.feature_cache import DeviceFeatureCache

            dtype = getattr(cfg, "transfer_dtype", None) or "float32"
            caches = {}
            for loader in (train_loader, val_loader):
                if not hasattr(loader, "attach_feature_cache"):
                    continue
                key = id(loader.dataset)
                if key not in caches:
                    # The cache's frame capacity must cover the ladder the
                    # LOADER collates with (not cfg's, which can differ) —
                    # otherwise the bucket clamp re-opens the padding-parity
                    # bug under mask_padded_features=False.
                    caches[key] = DeviceFeatureCache(
                        loader.dataset, dtype=dtype, mesh=self.mesh,
                        frame_buckets=tuple(loader.frame_buckets),
                    )
                    print(f"Device feature cache: {caches[key].nbytes() / 1e6:.1f} MB "
                          f"({len(caches[key].row_of)} clips, T_top={caches[key].t_top})")
                loader.attach_feature_cache(caches[key])

        eval_kwargs = dict(
            batch_size=cfg.batch_size, frame_buckets=tuple(cfg.frame_buckets)
        )
        train_vidcap = video_dataset_to_video_captions_loader(
            train_loader.dataset, video_only=train_loader.dataset.video_only, **eval_kwargs
        )
        val_vidcap = video_dataset_to_video_captions_loader(
            val_loader.dataset, video_only=val_loader.dataset.video_only, **eval_kwargs
        )
        test_vidcap = video_dataset_to_video_captions_loader(
            test_loader.dataset, video_only=test_loader.dataset.video_only, **eval_kwargs
        )

        base_rng = jax.random.PRNGKey(cfg.seed)

        for epoch in range(self.previous_epochs + 1, cfg.epochs + 1):
            print(f"\nEpoch {epoch}/{cfg.epochs}:")
            epoch_rng = jax.random.fold_in(base_rng, epoch)

            t0 = time.time()
            params, opt_state, train_loss = self.train(
                model, params, opt_state, train_loader, epoch, epoch_rng
            )
            val_loss = self.test(model, params, val_loader, "val", epoch)
            self.history["train_loss"].append(train_loss)
            self.history["val_loss"].append(val_loss)

            save_main = False
            save_best = False
            if epoch % self.eval_freq == 0 or epoch == cfg.epochs:
                eval_kw = dict(
                    max_caption_len=cfg.eval_max_caption_len,
                    mode=getattr(cfg, "eval_mode", "direct"),
                    beam_width=cfg.eval_beam_width,
                    beam_alpha=cfg.eval_beam_alpha,
                )
                train_score, _, _ = self.eval(
                    model, params, train_vidcap, "train", epoch, **eval_kw
                )
                val_score, _, _ = self.eval(
                    model, params, val_vidcap, "val", epoch, **eval_kw
                )
                self.history["train_score"].append(train_score)
                self.history["val_score"].append(val_score)

                new_lr = self.lr_scheduler.step(val_score["CIDEr"])
                opt_state = opt_lib.set_learning_rate(opt_state, new_lr)

                if val_score["CIDEr"] > self.best_CIDEr:
                    print(f"CIDEr improved from {self.best_CIDEr} to {val_score['CIDEr']}.")
                    print(f"Saving checkpoint to: {self.checkpoint_name}")
                    self.best_CIDEr = val_score["CIDEr"]
                    save_main = save_best = True

            if val_loss["total"] < self.best_loss:
                print(f"Validation loss improved from {self.best_loss} to {val_loss['total']}.")
                print(f"Saving checkpoint to: {self.checkpoint_name}")
                self.best_loss = val_loss["total"]
                save_main = True

            # One device-state snapshot per epoch regardless of how many
            # triggers fired; the D2H fetch + pickle run on the saver thread
            # so the next epoch starts immediately (the reference both blocks
            # and double-saves here, src/train.py:156-173).
            if (save_main or save_best) and jax.process_index() == 0:
                import copy

                jobs = []
                if save_main:
                    jobs.append((self.checkpoint_name,
                                 self._main_payload(epoch, params, opt_state)))
                if save_best:
                    jobs.append((self.checkpoint_name.replace(".ckpt", "_best.ckpt"),
                                 {"epoch": epoch, "params": params,
                                  "history": copy.deepcopy(self.history)}))
                self._saver.submit(jobs)

            print(f"Epoch time: {time.time() - t0:.1f}s")

        if jax.process_index() == 0:
            self._saver.submit([(
                self.checkpoint_name.replace(".ckpt", "_last.ckpt"),
                {"epoch": cfg.epochs, "params": params,
                 "history": self.history},
            )])
        self._saver.wait()
        self.summary_writer.close()
        return params, opt_state, self.history

    # ------------------------------------------------------------ loops
    def train(self, model, params, opt_state, dataloader, epoch, rng):
        sums = {k: 0.0 for k in LOSS_KEYS}
        n_batches = 0
        n_samples = 0
        # Per-step metric scalars stay ON DEVICE until the epoch ends: a
        # float() per step is a full host round-trip (tunnel RTT dominates
        # off-host), and it also blocks async dispatch pipelining.  One
        # device_get fetches the whole epoch; TB step scalars are then
        # written retroactively with the same tags/step numbers.
        step_metrics = []

        # Optional profiler trace of this epoch (SURVEY.md §5: tracing hooks).
        profile_dir = os.environ.get("MVC_PROFILE_DIR")
        do_profile = bool(profile_dir) and epoch == self.previous_epochs + 1
        if do_profile:
            jax.profiler.start_trace(profile_dir)

        cache = getattr(dataloader, "feature_cache", None)
        t0 = time.time()
        for i, batch in enumerate(self._device_batches(dataloader)):
            n_samples += batch.pop("_n_real", batch["captions"].shape[1])
            step_rng = jax.random.fold_in(rng, i)
            if cache is not None:
                t_pad = batch.pop("t_pad")
                params, opt_state, metrics = self._train_step_cached(
                    params, opt_state, batch, cache.arrays(), step_rng, t_pad
                )
            else:
                params, opt_state, metrics = self._train_step(params, opt_state, batch, step_rng)

            step_metrics.append(metrics)
            n_batches += 1
        for i, m in enumerate(jax.device_get(step_metrics)):
            self._log_metrics("train", epoch * len(dataloader) + i, m, sums)
        dt = time.time() - t0
        if do_profile:
            jax.profiler.stop_trace()

        n = max(n_batches, 1)
        avg = {k: sums[k] / n for k in LOSS_KEYS}
        for k in LOSS_KEYS:
            tag = "train_epoch/loss" if k == "total" else f"train_epoch/loss/{k}"
            self.summary_writer.add_scalar(tag, avg[k], epoch)
        throughput = n_samples / max(dt, 1e-9)
        self.summary_writer.add_scalar("train_epoch/samples_per_sec", throughput, epoch)
        print("TRAIN", {k: round(v, 4) for k, v in avg.items()},
              f"[{throughput:.1f} samples/s]")
        return params, opt_state, avg

    def _log_metrics(self, phase, step_no, metrics, sums):
        vals = {k: float(metrics[k]) for k in LOSS_KEYS}
        for k, v in vals.items():
            tag = f"{phase}/loss" if k == "total" else f"{phase}/loss/{k}"
            self.summary_writer.add_scalar(tag, v, step_no)
            sums[k] += v

    def test(self, model, params, dataloader, phase, epoch):
        """Validation/test loss pass with teacher forcing off
        (reference src/train.py:246-314)."""
        sums = {k: 0.0 for k in LOSS_KEYS}
        n_batches = 0
        rng = jax.random.PRNGKey(0)
        cache = getattr(dataloader, "feature_cache", None)
        step_metrics = []
        for i, batch in enumerate(self._device_batches(dataloader)):
            batch.pop("_n_real", None)
            if cache is not None:
                t_pad = batch.pop("t_pad")
                metrics = self._eval_loss_step_cached(
                    params, batch, cache.arrays(), rng, t_pad
                )
            else:
                metrics = self._eval_loss_step(params, batch, rng)
            step_metrics.append(metrics)
            n_batches += 1
        for i, m in enumerate(jax.device_get(step_metrics)):
            self._log_metrics(phase, epoch * len(dataloader) + i, m, sums)
        n = max(n_batches, 1)
        avg = {k: sums[k] / n for k in LOSS_KEYS}
        for k in LOSS_KEYS:
            tag = f"{phase}_epoch/loss" if k == "total" else f"{phase}_epoch/loss/{k}"
            self.summary_writer.add_scalar(tag, avg[k], epoch)
        print("TEST ", {k: round(v, 4) for k, v in avg.items()})
        return avg

    def eval(self, model, params, videocaptions_loader, phase, epoch,
             mode="direct", get_scores=True, max_caption_len=30,
             beam_width=5, beam_alpha=0.0):
        """Caption-generation eval (reference src/train.py:316-348); ``mode``
        may be "direct" (greedy, the reference's fit-time setting) or "beam"
        (batched jitted beam)."""
        vocab = getattr(videocaptions_loader.dataset, "vocab", None)
        if vocab is None:
            vocab = self._vocab
        vid_gt, vid_gen = {}, {}
        predict = self._get_predict_fn(model, max_caption_len, mode, beam_width, beam_alpha)
        t0 = time.time()
        for batch in videocaptions_loader:
            b = self._put_batch(batch)
            tokens = np.asarray(predict(params, b["audio"], b["visual"], b["feat_mask"]))
            for row, vid, caps in zip(tokens, batch["video_ids"], batch["captions"]):
                vid_gt[vid] = list(caps)
                vid_gen[vid] = [vocab.decode_indexes(row[1:])]
        captions_per_sec = len(vid_gen) / max(time.time() - t0, 1e-9)
        self.summary_writer.add_scalar(f"{phase}/captions_per_sec", captions_per_sec, epoch)

        print("\nExample captions: key >> [generated] (ground_truth)")
        for i, key in enumerate(vid_gt):
            print(f"{key} >> [{vid_gen[key][0]}] ({vid_gt[key][0]})")
            if i >= 10:
                break
        print()

        scores = None
        if get_scores:
            scores = NLPScore(vid_gt, vid_gen, meteor_synonyms=self._meteor_synonyms,
                              meteor_paraphrases=self._meteor_paraphrases,
                              meteor_function_words=self._meteor_function_words)
            # The reference logs exactly Bleu_1..4/ROUGE_L/CIDEr
            # (src/train.py:340-345); METEOR is computed by NLPScore either
            # way, so we additionally expose it as a scalar.
            for name in ("Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4", "ROUGE_L", "CIDEr", "METEOR"):
                self.summary_writer.add_scalar(
                    f"{phase}/score/{mode}/{name}", scores[name], epoch
                )
            print(scores)
        return scores, vid_gt, vid_gen

    def set_vocab(self, vocab):
        self._vocab = vocab
