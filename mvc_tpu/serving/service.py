"""Continuous-batching caption service.

Design (TPU-first):

- **Static shapes only.** Every device call is ``[max_batch, t_pad, D]``
  where ``t_pad`` comes from the same frame-bucket ladder the data pipeline
  uses (``mvc_tpu.data.dataset._bucket``) and the batch axis is always padded
  to the configured ``max_batch``.  One jit compile per distinct ``t_pad`` —
  the executable set is bounded by ``len(frame_buckets)`` no matter what
  traffic looks like, and ``warmup()`` can pay for all of them before the
  first request arrives.
- **One worker, one chip.** A single background thread owns the device
  (matching the one-process-per-chip axon rule); callers block on a
  ``concurrent.futures.Future``.  Batching is time-and-size windowed: the
  worker waits ``max_wait_ms`` after the first queued request (or until
  ``max_batch`` requests are in hand) before launching, so throughput under
  load comes from real batching, not from stacking device calls.
- **Row independence is the correctness contract.** Padded rows carry
  ``feat_mask=False`` / zero features exactly like the eval collator
  (``collate_eval_batch``), and every model op is batched with masked
  attention, so a request's caption is identical whether it shared a batch
  or rode alone — asserted by tests/test_serving.py.

The model side is the ordinary predict contract (``predict_tokens`` on
AVCaptioning / AVCaptioningDual / TransformerCaptioner): direct mode uses the
text-identical all-EOS early exit (PARITY.md) so latency tracks the longest
caption in the batch, not ``max_caption_len``.
"""

from __future__ import annotations

import collections
import dataclasses
import queue
import threading
import time
from concurrent.futures import Future
from typing import Dict, List, Optional, Sequence

import numpy as np

from mvc_tpu.data.dataset import _bucket


@dataclasses.dataclass(frozen=True)
class ServiceConfig:
    """Batching/decode knobs for :class:`CaptionService`."""

    max_batch: int = 64
    max_wait_ms: float = 5.0
    frame_buckets: Sequence[int] = (8, 16, 32, 48, 64)
    max_caption_len: int = 30
    mode: str = "direct"  # "direct" | "beam"
    beam_width: int = 5
    beam_alpha: float = 0.0
    audio_dim: int = 128
    visual_dim: int = 2048
    # direct mode stops once every row has emitted EOS — caption text is
    # identical (PARITY.md); beam has no such switch.
    stop_at_all_eos: bool = True
    latency_window: int = 2048  # latencies kept for the percentile stats
    # in-flight device batches: JAX dispatch is async, so the worker can
    # collect+launch batch k+1 while batch k still computes / transfers —
    # the completion thread owns the sync.  1 = fully serial (launch, sync,
    # repeat); 2 overlaps host batching + D2H with device compute.
    pipeline_depth: int = 2
    # feature H2D wire format — the serving bottleneck whenever transfer is
    # slower than decode (measured tunnel-bound in BENCH_NOTES round 4):
    #   "f32"  — full precision (default)
    #   "bf16" — half the bytes; BITWISE-identical captions for a bf16-dtype
    #            model (decode casts inputs to the model dtype on entry,
    #            models/captioning.py:185,256 — the cast just moves host-side)
    #   "int8" — quarter the bytes via the trainer's shared per-frame max-abs
    #            quantization (data/feature_cache.quantize_int8, <=1/127
    #            relative error; dequantized on device inside the jit)
    transfer: str = "f32"
    # Overload policy (None = unbounded queue, never sheds — the pre-round-5
    # behavior).  With a bound, an arriving request either gets a slot, gets
    # one by EVICTING the worst queued request (strictly lower priority —
    # larger number — then youngest; the victim's future fails with
    # ServiceOverloaded), or is rejected with ServiceOverloaded.
    max_queue: Optional[int] = None


_SHUTDOWN = object()   # completion-queue sentinel


class ServiceOverloaded(RuntimeError):
    """Raised to the shed party when the bounded queue is full (HTTP 503)."""


class DeadlineExceeded(RuntimeError):
    """A request's deadline_ms elapsed before it reached a device batch
    (HTTP 504); it is dropped at collection time, not launched."""


class _Request:
    __slots__ = ("audio", "visual", "future", "t_submit", "priority", "seq",
                 "deadline")

    def __init__(self, audio: np.ndarray, visual: np.ndarray,
                 priority: int = 0, seq: int = 0,
                 deadline_ms: Optional[float] = None):
        self.audio = audio
        self.visual = visual
        self.future: Future = Future()
        self.t_submit = time.perf_counter()
        self.priority = int(priority)
        self.seq = seq
        self.deadline = (
            self.t_submit + deadline_ms / 1e3 if deadline_ms is not None else None
        )


class CaptionService:
    """Thread-safe online captioner over a jitted model predict path.

    ``mesh`` scales one replica across chips: params are placed with the
    training-side shardings (``parallel.mesh.param_shardings``) and every
    batch is dp-sharded (``batch_sharding``), so GSPMD splits the decode
    across the mesh exactly like the training/eval paths — ``max_batch``
    must divide the dp axis.  Without a mesh the replica owns one chip.
    """

    def __init__(self, model, params, vocab, config: Optional[ServiceConfig] = None,
                 mesh=None):
        self.model = model
        self.params = params
        self.vocab = vocab
        self.config = config or ServiceConfig()
        if self.config.mode not in ("direct", "beam"):
            raise ValueError(f"unknown mode {self.config.mode!r}")
        if self.config.transfer not in ("f32", "bf16", "int8"):
            raise ValueError(f"unknown transfer {self.config.transfer!r}")
        self.mesh = mesh
        self._batch_sharding = None
        if mesh is not None:
            import jax

            from mvc_tpu.parallel.mesh import batch_sharding, param_shardings

            dp = mesh.shape.get("dp", 1)
            if self.config.max_batch % dp:
                raise ValueError(
                    f"max_batch={self.config.max_batch} must divide the "
                    f"mesh dp axis ({dp})"
                )
            self._batch_sharding = batch_sharding(mesh)
            self.params = jax.device_put(params, param_shardings(mesh, params))

        # priority queue: a plain list + condition (sizes are small — the
        # bound is the point); best = min (priority, seq), victim = max
        self._pending: List[_Request] = []
        self._qcond = threading.Condition()
        self._seq = 0
        self._shutdown = False
        self._n_shed = 0
        self._n_expired = 0
        self._predict_by_tpad: Dict[int, object] = {}
        self._lock = threading.Lock()
        self._latencies = collections.deque(maxlen=self.config.latency_window)
        self._n_requests = 0
        self._n_batches = 0
        self._n_rows = 0  # real (non-padding) rows launched
        self._t_start = time.perf_counter()
        self._closed = False
        # bounded in-flight queue = backpressure: the batching worker blocks
        # once pipeline_depth device batches are unsynced
        self._completions: "queue.Queue" = queue.Queue(
            maxsize=max(1, self.config.pipeline_depth)
        )
        self._worker = threading.Thread(
            target=self._run, name="caption-service-worker", daemon=True
        )
        self._completer = threading.Thread(
            target=self._complete_loop, name="caption-service-completer", daemon=True
        )
        self._worker.start()
        self._completer.start()

    # ------------------------------------------------------------- client API

    def submit(self, visual: np.ndarray, audio: Optional[np.ndarray] = None,
               priority: int = 0,
               deadline_ms: Optional[float] = None) -> Future:
        """Enqueue one clip's features; resolves to the caption string.

        ``visual`` is ``[T, visual_dim]``; ``audio`` is ``[T, audio_dim]`` or
        None for video-only traffic (zero-filled, matching the dataset's
        ``video_only`` contract, reference src/get_loader.py:243-246).

        ``priority``: smaller = more urgent; batches are filled in priority
        (then arrival) order.  ``deadline_ms``: drop the request (future
        fails with DeadlineExceeded) if it hasn't reached a device batch
        within this budget.  Under a full bounded queue (cfg.max_queue) the
        arriving request either evicts a strictly-lower-priority victim or
        raises ServiceOverloaded.
        """
        if self._closed:
            raise RuntimeError("service is closed")
        visual = np.asarray(visual, dtype=np.float32)
        if visual.ndim != 2 or visual.shape[1] != self.config.visual_dim:
            raise ValueError(
                f"visual must be [T, {self.config.visual_dim}], got {visual.shape}"
            )
        t = visual.shape[0]
        if t < 1:
            raise ValueError("empty clip: T must be >= 1")
        if audio is None:
            audio = np.zeros((t, self.config.audio_dim), dtype=np.float32)
        else:
            audio = np.asarray(audio, dtype=np.float32)
            if audio.shape != (t, self.config.audio_dim):
                raise ValueError(
                    f"audio must be [T={t}, {self.config.audio_dim}], got {audio.shape}"
                )
        victim = None
        with self._qcond:
            self._seq += 1
            req = _Request(audio, visual, priority=priority, seq=self._seq,
                           deadline_ms=deadline_ms)
            bound = self.config.max_queue
            if bound is not None and len(self._pending) >= bound:
                # victim = lowest priority class (largest number), youngest
                # within it (largest seq) — LIFO shedding preserves FIFO
                # fairness for the work that stays
                worst = (max(self._pending, key=lambda r: (r.priority, r.seq))
                         if self._pending else None)
                if worst is not None and worst.priority > req.priority:
                    self._pending.remove(worst)
                    victim = worst
                else:
                    with self._lock:
                        self._n_shed += 1
                    raise ServiceOverloaded(
                        f"queue full ({bound}) and no lower-priority victim "
                        f"(incoming priority {req.priority})"
                    )
            self._pending.append(req)
            self._qcond.notify()
        if victim is not None:
            with self._lock:
                self._n_shed += 1
            victim.future.set_exception(ServiceOverloaded(
                f"evicted by a priority-{req.priority} arrival "
                f"(own priority {victim.priority})"
            ))
        return req.future

    def caption(self, visual: np.ndarray, audio: Optional[np.ndarray] = None,
                timeout: Optional[float] = None) -> str:
        """Blocking convenience wrapper around :meth:`submit`."""
        return self.submit(visual, audio).result(timeout=timeout)

    def warmup(self, t_lengths: Optional[Sequence[int]] = None) -> List[int]:
        """Compile the device executables ahead of traffic.

        Runs one dummy batch per distinct frame bucket implied by
        ``t_lengths`` (default: every rung of the configured ladder) and
        returns the list of warmed ``t_pad`` values.
        """
        lengths = list(t_lengths) if t_lengths is not None else list(self.config.frame_buckets)
        warmed = []
        for t_pad in sorted({_bucket(t, self.config.frame_buckets) for t in lengths}):
            dummy_v = np.zeros((t_pad, self.config.visual_dim), dtype=np.float32)
            self.submit(dummy_v).result()
            warmed.append(t_pad)
        return warmed

    def reset_stats(self) -> None:
        """Zero the counters/latency window (e.g. right after warmup)."""
        with self._lock:
            self._latencies.clear()
            self._n_requests = self._n_batches = self._n_rows = 0
            self._t_start = time.perf_counter()

    def stats(self) -> Dict[str, object]:
        with self._lock:
            lat = sorted(self._latencies)
            n_requests, n_batches, n_rows = self._n_requests, self._n_batches, self._n_rows
            t_start = self._t_start

        def pct(p: float) -> Optional[float]:
            if not lat:
                return None
            return 1e3 * lat[min(len(lat) - 1, int(p * len(lat)))]

        elapsed = time.perf_counter() - t_start
        return {
            "requests": n_requests,
            "batches": n_batches,
            "mean_batch_occupancy": (n_rows / n_batches) if n_batches else None,
            "latency_ms_p50": pct(0.50),
            "latency_ms_p95": pct(0.95),
            "latency_ms_p99": pct(0.99),
            "requests_per_s": n_requests / elapsed if elapsed > 0 else None,
            "compiled_t_pads": sorted(self._predict_by_tpad),
            "queue_depth": len(self._pending),
            "shed": self._n_shed,
            "deadline_expired": self._n_expired,
            "mode": self.config.mode,
            "max_batch": self.config.max_batch,
            "transfer": self.config.transfer,
        }

    def close(self) -> None:
        if self._closed:
            return
        self._closed = True
        with self._qcond:
            self._shutdown = True
            self._qcond.notify_all()
        self._worker.join()
        self._completions.put(_SHUTDOWN)
        self._completer.join()

    def __enter__(self) -> "CaptionService":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    # ---------------------------------------------------------------- worker

    def _predict_fn(self, t_pad: int):
        fn = self._predict_by_tpad.get(t_pad)
        if fn is None:
            import jax
            import jax.numpy as jnp

            import inspect

            cfg = self.config
            # capability-detect like the trainer (trainer.py): the
            # transformer family has no all-EOS early-exit switch
            supports_stop = (
                "stop_at_all_eos"
                in inspect.signature(self.model.predict_tokens).parameters
            )
            extra = (
                {"stop_at_all_eos": True}
                if cfg.mode == "direct" and cfg.stop_at_all_eos and supports_stop
                else {}
            )

            def predict(p, a, v, m):
                return self.model.predict_tokens(
                    p, a, v,
                    max_caption_len=cfg.max_caption_len,
                    mode=cfg.mode,
                    beam_alpha=cfg.beam_alpha,
                    beam_width=cfg.beam_width,
                    feat_mask=m,
                    **extra,
                )

            if cfg.transfer == "int8":
                # dequantize on device, then the ordinary predict
                fn = jax.jit(
                    lambda p, qa, sa, qv, sv, m: predict(
                        p,
                        qa.astype(jnp.float32) * sa,
                        qv.astype(jnp.float32) * sv,
                        m,
                    )
                )
            else:  # f32 / bf16 arrive ready to use
                fn = jax.jit(predict)
            self._predict_by_tpad[t_pad] = fn
        return fn

    def _pop_best_locked(self) -> Optional[_Request]:
        """Highest-priority (then oldest) live request; expired ones are
        failed with DeadlineExceeded and skipped.  Caller holds _qcond."""
        now = time.perf_counter()
        while self._pending:
            best = min(self._pending, key=lambda r: (r.priority, r.seq))
            self._pending.remove(best)
            if best.deadline is not None and now > best.deadline:
                with self._lock:
                    self._n_expired += 1
                best.future.set_exception(DeadlineExceeded(
                    f"deadline elapsed after "
                    f"{1e3 * (now - best.t_submit):.1f} ms in queue"))
                continue
            return best
        return None

    def _collect(self) -> Optional[List[_Request]]:
        """Block for the first request, then window for more — filled in
        priority (then arrival) order."""
        with self._qcond:
            while True:
                first = self._pop_best_locked()
                if first is not None:
                    break
                if self._shutdown:
                    return None
                self._qcond.wait()
        batch = [first]
        deadline = time.perf_counter() + self.config.max_wait_ms / 1e3
        while len(batch) < self.config.max_batch:
            remaining = deadline - time.perf_counter()
            if remaining <= 0:
                break
            with self._qcond:
                nxt = self._pop_best_locked()
                if nxt is None:
                    if self._shutdown:
                        break
                    self._qcond.wait(timeout=remaining)
                    nxt = self._pop_best_locked()
            if nxt is None:
                continue
            batch.append(nxt)
        return batch

    def _launch(self, batch: List[_Request]) -> None:
        """Pad, dispatch (async), and enqueue for completion."""
        cfg = self.config
        t_pad = _bucket(max(r.visual.shape[0] for r in batch), cfg.frame_buckets)
        audio = np.zeros((cfg.max_batch, t_pad, cfg.audio_dim), dtype=np.float32)
        visual = np.zeros((cfg.max_batch, t_pad, cfg.visual_dim), dtype=np.float32)
        feat_mask = np.zeros((cfg.max_batch, t_pad), dtype=bool)
        for i, r in enumerate(batch):
            t = r.visual.shape[0]
            audio[i, :t] = r.audio
            visual[i, :t] = r.visual
            feat_mask[i, :t] = True

        # JAX dispatch is async: this returns device arrays immediately and
        # the completion thread pays for the sync — batch k+1 is collected
        # and launched while batch k computes (bounded by pipeline_depth).
        if cfg.transfer == "int8":
            from mvc_tpu.data.feature_cache import quantize_int8

            qa, sa = quantize_int8(audio)
            qv, sv = quantize_int8(visual)
            args = (qa, sa, qv, sv, feat_mask)
        else:
            if cfg.transfer == "bf16":
                import jax.numpy as jnp

                audio = audio.astype(jnp.bfloat16)
                visual = visual.astype(jnp.bfloat16)
            args = (audio, visual, feat_mask)
        if self._batch_sharding is not None:
            import jax

            # dp-shard every batch-leading array; GSPMD propagates from here
            args = tuple(jax.device_put(a, self._batch_sharding) for a in args)
        tokens_dev = self._predict_fn(t_pad)(self.params, *args)
        self._completions.put((tokens_dev, batch))

    def _complete(self, tokens_dev, batch: List[_Request]) -> None:
        from mvc_tpu.models.captioning import captions_from_tokens

        n = len(batch)
        # np.asarray is the materialization point (block_until_ready is a
        # no-op through the axon tunnel — CLAUDE.md).
        tokens = np.asarray(tokens_dev)
        captions = captions_from_tokens(self.vocab, tokens[:n])
        now = time.perf_counter()
        with self._lock:
            for r in batch:
                self._latencies.append(now - r.t_submit)
            self._n_requests += n
            self._n_batches += 1
            self._n_rows += n
        for r, cap in zip(batch, captions):
            r.future.set_result(cap)

    @staticmethod
    def _fail(batch: List[_Request], e: BaseException) -> None:
        for r in batch:
            if not r.future.done():
                r.future.set_exception(e)

    def _run(self) -> None:
        while True:
            batch = self._collect()
            if batch is None:
                return
            try:
                self._launch(batch)
            except BaseException as e:  # resolve futures; keep serving
                self._fail(batch, e)

    def _complete_loop(self) -> None:
        while True:
            item = self._completions.get()
            if item is _SHUTDOWN:
                return
            tokens_dev, batch = item
            try:
                self._complete(tokens_dev, batch)
            except BaseException as e:
                self._fail(batch, e)
