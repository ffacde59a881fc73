#!/usr/bin/env python
"""Headline benchmarks with roofline accounting.  Prints ONE JSON line:

    {"metric", "value", "unit", "vs_baseline",      # headline = beam decode
     "metrics": {<name>: {value, unit, vs_baseline, gflops_per_call,
                          achieved_tflops, mfu_pct, hbm_gbps, bound}, ...}}

Covers the full BASELINE.json metric set:
  beam_captions_per_sec    — batched beam decode, dual model (headline)
  greedy_captions_per_sec  — batched greedy decode, single model
  bulk_greedy_captions_per_sec — tokens-only dual greedy at B=1024 (the
                             best sustained offline-scoring throughput)
  train_samples_per_sec    — jitted train step, device-resident features
                             (the device_feature_cache regime)
  extract_clips_per_sec    — decode->Inception+VGGish sweep on real clips

Outage behavior (round-3 postmortem: BENCH_r03 captured rc=124 and nothing
else because a dead axon tunnel hangs ~25 min per backend-init attempt and
the old code printed only after all metrics): the last-good consolidated
payload (BENCH_LASTGOOD.json) is printed IMMEDIATELY at startup marked
"stale": true, the device claim runs under a hard deadline
(MVC_BENCH_BUDGET_S, default 900 s across re-execs), and each metric prints
a full consolidated-so-far JSON line as it lands — so the driver's tail
always ends in a parseable artifact no matter where we die.

Baselines are the REFERENCE's own implementations, torch CPU (their only
runnable form here), measured once and cached in BENCH_BASELINE.json:
beam/greedy = FeaturesCaptioning beam_search_predict/decode, train = the
reference Trainer's step semantics on AVCaptioningDual (forward ->
ModalityWiseReconstructionLoss -> backward -> clip -> Adam step,
reference src/train.py:176-244), extract = the reference FeatureExtractor's
one-clip-at-a-time loop (src/extract_features.py:140-161) under the torch
oracle stubs (mvc_tpu/utils/torch_oracles.py).

FLOPs and bytes come from XLA's own compiled-executable cost analysis;
MFU is reported against the v5e bf16 peak (f32-compute paths are therefore
a conservative lower bound), and each path is classified MXU/HBM/latency
bound from achieved intensity vs the ridge point.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
BASELINE_CACHE = os.path.join(REPO, "BENCH_BASELINE.json")

VOCAB = 4000
B = 64          # clips per batch (decode paths)
T = 16          # frames
WIDTH = 5
MAX_LEN = 30

TRAIN_B, TRAIN_T, TRAIN_L = 128, 28, 8   # BENCH_NOTES round-2 conditions
N_CLIPS, CLIP_SECONDS = 16, 10.0         # ours; baseline uses fewer (cached)
N_CLIPS_BASELINE = 6

# v5e, one chip: 197 TFLOP/s bf16 MXU peak, ~819 GB/s HBM.
PEAK_TFLOPS_BF16 = 197.0
PEAK_HBM_GBPS = 819.0


# ------------------------------------------------------------------ roofline
def _cost(jfn, *args):
    """(flops, bytes) of the compiled executable, or (None, None)."""
    try:
        ca = jfn.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0)) or None
        byts = float(ca.get("bytes accessed", 0.0)) or None
        return flops, byts
    except Exception as e:                           # pragma: no cover
        print(f"cost_analysis unavailable ({e})", file=sys.stderr)
        return None, None


_MEASURED = {"peak_hbm_gbps": None}


def _measure_peak_hbm(iters: int = 30) -> float:
    """MEASURED achievable HBM bandwidth on this chip: a saturating triad
    (y = a*x + b over 256 MiB f32, bytes = read + write) — the denominator
    every utilization figure is held to.  XLA cost-analysis bytes are
    estimates that undercount scan bodies (counted once, not x trip count —
    BENCH_NOTES round 5) and round-4 numbers exceeded the datasheet peak;
    a measured envelope keeps every reported number <= 100%."""
    x = jnp.zeros((64, 1024, 1024), jnp.float32)         # 256 MiB
    passes = 40                                          # ~20 GB per call

    def triad(x):
        # optimization_barrier between passes: an elementwise chain would
        # otherwise fuse to ONE read+write; per-call work must dwarf the
        # host->device dispatch latency (a tunnel RTT here costs ~ms — an
        # unamortized 0.65 ms kernel measured 315 GB/s on an 819 GB/s part)
        def body(_, y):
            return jax.lax.optimization_barrier(y * 1.0001 + 0.5)

        return jax.lax.fori_loop(0, passes, body, x)

    f = jax.jit(triad)
    y = f(x)
    np.asarray(y[0, 0, :1])                              # compile + sync
    t0 = time.perf_counter()
    for _ in range(max(1, iters // 10)):
        y = f(x)
    np.asarray(y[0, 0, :1])
    dt = time.perf_counter() - t0
    return 2 * x.nbytes * passes * max(1, iters // 10) / dt / 1e9


def _device_busy_pct(run_once, sync, iters: int = 5):
    """MEASURED device-busy fraction from a jax.profiler trace: the busiest
    device-plane line's summed event time over the traced wall window.
    ``run_once`` is a thunk (donation-safe); best-effort (None when the
    backend exposes no usable plane)."""
    import glob
    import tempfile

    try:
        from jax.profiler import ProfileData

        with tempfile.TemporaryDirectory() as d:
            t0 = time.perf_counter()
            with jax.profiler.trace(d):
                out = None
                for _ in range(iters):
                    out = run_once()
                sync(out)
            wall_ns = (time.perf_counter() - t0) * 1e9
            paths = glob.glob(d + "/**/*.xplane.pb", recursive=True)
            if not paths:
                return None
            pd = ProfileData.from_serialized_xspace(open(paths[0], "rb").read())
            busy = 0
            for plane in pd.planes:
                if plane.name.startswith("/host:") and "TPU" not in plane.name:
                    # host plane: only the device-client line counts
                    lines = [ln for ln in plane.lines
                             if "PjRt" in ln.name or "Client" in ln.name]
                else:
                    lines = list(plane.lines)
                for ln in lines:
                    total = sum(ev.duration_ns for ev in ln.events
                                if not ev.name.startswith("end:"))
                    busy = max(busy, total)
            return round(100.0 * busy / wall_ns, 1) if busy else None
    except Exception as e:                               # pragma: no cover
        print(f"profiler trace unavailable ({e})", file=sys.stderr)
        return None


def _roofline(entry: dict, flops, byts, calls_per_sec) -> dict:
    """Annotate a metric entry: achieved TFLOP/s + MFU from cost-ESTIMATED
    flops, plus estimated-vs-measured HBM accounting.  ``hbm_gbps`` is the
    estimate clamped to the MEASURED achievable peak (no reported number may
    exceed it); the raw estimate stays in ``hbm_gbps_est`` with a flag when
    the cost model overcounted."""
    if not flops or not calls_per_sec:
        return entry
    tflops = flops * calls_per_sec / 1e12
    entry["gflops_per_call"] = round(flops / 1e9, 2)
    entry["achieved_tflops"] = round(tflops, 2)
    entry["mfu_pct"] = round(100.0 * tflops / PEAK_TFLOPS_BF16, 2)
    peak = _MEASURED.get("peak_hbm_gbps") or PEAK_HBM_GBPS
    if byts:
        hbm_est = byts * calls_per_sec / 1e9
        entry["hbm_gbps_est"] = round(hbm_est, 1)
        entry["hbm_gbps"] = round(min(hbm_est, peak), 1)
        if hbm_est > peak:
            entry["est_exceeds_measured_peak"] = True
        ridge = PEAK_TFLOPS_BF16 * 1e12 / (peak * 1e9)   # flops/byte
        intensity = flops / byts
        if entry["mfu_pct"] >= 40.0:
            entry["bound"] = "MXU"
        elif entry["hbm_gbps"] >= 0.4 * peak:
            entry["bound"] = "HBM"
        elif intensity < ridge:
            entry["bound"] = "latency (low intensity, HBM under-driven)"
        else:
            entry["bound"] = "latency/overhead"
    return entry


# ------------------------------------------------------------------ ours
def _rate(predict, args, per_call: float, iters: int = 50) -> float:
    """calls/s * per_call units; device_get is the only reliable sync here."""
    np.asarray(jax.tree_util.tree_leaves(predict(*args))[0])  # compile + sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = predict(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return per_call * iters / (time.perf_counter() - t0)


def bench_beam() -> dict:
    from mvc_tpu.models import AVCaptioningDual
    from mvc_tpu.ops import dispatch

    model = AVCaptioningDual(vocab_size=VOCAB, dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0))
    gen = np.random.default_rng(0)
    audio = jnp.asarray(gen.normal(size=(B, T, 128)).astype(np.float32))
    visual = jnp.asarray(gen.normal(size=(B, T, 2048)).astype(np.float32))

    fn = jax.jit(lambda p, a, v: model.predict_tokens(
        p, a, v, max_caption_len=MAX_LEN, mode="beam", beam_width=WIDTH))
    dispatch.enable_pallas(False)
    rate = _rate(fn, (params, audio, visual), B)
    flops, byts = _cost(fn, params, audio, visual)
    best = {"rate": rate, "flops": flops, "bytes": byts}
    try:
        dispatch.enable_pallas(True)
        pfn = jax.jit(lambda p, a, v: model.predict_tokens(
            p, a, v, max_caption_len=MAX_LEN, mode="beam", beam_width=WIDTH))
        prate = _rate(pfn, (params, audio, visual), B)
        if prate > rate:
            pf, pb = _cost(pfn, params, audio, visual)
            best = {"rate": prate, "flops": pf or flops, "bytes": pb or byts}
    except Exception as e:                           # pragma: no cover
        print(f"pallas beam path failed ({e}); reporting XLA path", file=sys.stderr)
    finally:
        dispatch.enable_pallas(False)
    return best


def bench_greedy() -> dict:
    from mvc_tpu.models.captioning import AVCaptioning
    from mvc_tpu.ops import dispatch

    model = AVCaptioning(vocab_size=VOCAB, dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0))
    gen = np.random.default_rng(0)
    audio = jnp.asarray(gen.normal(size=(B, T, 128)).astype(np.float32))
    visual = jnp.asarray(gen.normal(size=(B, T, 2048)).astype(np.float32))

    fn = jax.jit(lambda p, a, v: model.predict_tokens(
        p, a, v, max_caption_len=MAX_LEN, mode="direct"))
    dispatch.enable_pallas(False)
    rate = _rate(fn, (params, audio, visual), B)
    flops, byts = _cost(fn, params, audio, visual)
    best = {"rate": rate, "flops": flops, "bytes": byts}
    try:
        dispatch.enable_pallas(True)
        pfn = jax.jit(lambda p, a, v: model.predict_tokens(
            p, a, v, max_caption_len=MAX_LEN, mode="direct"))
        prate = _rate(pfn, (params, audio, visual), B)
        if prate > rate:
            pf, pb = _cost(pfn, params, audio, visual)
            best = {"rate": prate, "flops": pf or flops, "bytes": pb or byts}
    except Exception as e:                           # pragma: no cover
        print(f"pallas greedy path failed ({e}); reporting XLA path", file=sys.stderr)
    finally:
        dispatch.enable_pallas(False)
    return best


BULK_B = 1024


def bench_bulk_greedy() -> dict:
    """Tokens-only dual greedy at offline-scoring batch (B=1024): the
    batch-tiled resident kernel (grid over batch tiles, weights loaded once
    — ops/pallas_dual_greedy, round 5) vs the XLA tokens-only scan; reports
    the better of the two (the [L,B,V] stack never materializes on either)."""
    from mvc_tpu.models import AVCaptioningDual
    from mvc_tpu.ops import dispatch

    model = AVCaptioningDual(vocab_size=VOCAB, dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0))
    gen = np.random.default_rng(0)
    audio = jnp.asarray(gen.normal(size=(BULK_B, T, 128)).astype(np.float32))
    visual = jnp.asarray(gen.normal(size=(BULK_B, T, 2048)).astype(np.float32))

    fn = jax.jit(lambda p, a, v: model.predict_tokens(
        p, a, v, max_caption_len=MAX_LEN, mode="direct"))
    dispatch.enable_pallas(False)
    rate = _rate(fn, (params, audio, visual), BULK_B, iters=30)
    flops, byts = _cost(fn, params, audio, visual)
    best = {"rate": rate, "flops": flops, "bytes": byts, "path": "xla_scan"}
    # The batch-tiled Pallas rate is measured by a KILLABLE pre-claim
    # subprocess (see _probe_bulk_pallas: the Mosaic compile at B=1024 can
    # pathologically exceed any budget through the remote-compile tunnel and
    # an in-thread compile cannot be interrupted — it must not eat the run).
    sub = _BULK_SUBPROC.get("result")
    if sub and sub.get("rate", 0) > best["rate"]:
        # no cost analysis for the subprocess path: omit roofline fields
        # rather than annotate the Pallas rate with the XLA program's bytes
        best = {"rate": sub["rate"], "flops": None, "bytes": None,
                "path": "pallas_tiled"}
    return best


_BULK_SUBPROC: dict = {}


def _probe_bulk_pallas(budget: int) -> None:
    """Measure the batch-tiled Pallas bulk decode in a subprocess BEFORE this
    process claims the chip (one process holds it at a time); a timeout kills
    a pathological Mosaic compile instead of the whole bench run."""
    import subprocess

    code = (
        "import json, time, bench, jax, numpy as np, jax.numpy as jnp\n"
        "from mvc_tpu.models import AVCaptioningDual\n"
        "from mvc_tpu.ops import dispatch\n"
        "from mvc_tpu.utils.runtime import setup_compile_cache\n"
        "setup_compile_cache()\n"
        "model = AVCaptioningDual(vocab_size=bench.VOCAB, dtype=jnp.bfloat16)\n"
        "params = model.init(jax.random.PRNGKey(0))\n"
        "gen = np.random.default_rng(0)\n"
        "a = jnp.asarray(gen.normal(size=(bench.BULK_B, bench.T, 128)).astype(np.float32))\n"
        "v = jnp.asarray(gen.normal(size=(bench.BULK_B, bench.T, 2048)).astype(np.float32))\n"
        "dispatch.enable_pallas(True)\n"
        "fn = jax.jit(lambda p, a, v: model.predict_tokens("
        "p, a, v, max_caption_len=bench.MAX_LEN, mode='direct'))\n"
        "np.asarray(fn(params, a, v))\n"
        "t0 = time.perf_counter()\n"
        "for _ in range(30): tok = fn(params, a, v)\n"
        "np.asarray(tok)\n"
        "print(json.dumps({'rate': bench.BULK_B * 30 / (time.perf_counter() - t0)}))\n"
    )
    try:
        probe = subprocess.run(
            [sys.executable, "-c", code], cwd=REPO, timeout=budget,
            capture_output=True, text=True, env=dict(os.environ), check=False,
        )
        if probe.returncode == 0:
            line = probe.stdout.strip().splitlines()[-1]
            _BULK_SUBPROC["result"] = json.loads(line)
            print(f"bulk pallas subprocess: {_BULK_SUBPROC['result']}",
                  file=sys.stderr)
            return
        note = probe.stderr[-300:]
    except subprocess.TimeoutExpired:
        note = f"probe exceeded {budget}s"
    except Exception as e:                               # pragma: no cover
        note = str(e)
    print(f"bulk pallas probe failed; XLA scan only ({note})", file=sys.stderr)


def bench_train() -> dict:
    """Production jitted train step (Trainer._build_train_step), batch
    device-resident — the per-step program of the device_feature_cache
    regime, which BENCH_NOTES measured compute-bound end to end."""
    from mvc_tpu.config import TrainerConfig
    from mvc_tpu.models import AVCaptioningDual
    from mvc_tpu.training import optimizer as opt_lib
    from mvc_tpu.training.trainer import Trainer

    cfg = TrainerConfig(batch_size=TRAIN_B)
    # Production fast path (--dtype bfloat16): f32 master params, bf16
    # compute via the trainer's one-per-step param pre-cast — 1.27x the f32
    # step at this workload with ~1e-3 loss parity (BENCH_NOTES round 3,
    # tests/test_trainer.py::test_bf16_compute_train_step_parity).
    model = AVCaptioningDual(vocab_size=VOCAB, reconstructor_type="global",
                             dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0))
    tr = Trainer("bench", log_dir=None)
    tr._optimizer = opt_lib.make_optimizer(cfg)
    train_step, _ = tr._build_train_step(model, cfg)
    opt_state = tr._optimizer.init(params)

    gen = np.random.default_rng(0)
    batch = {
        "audio": jnp.asarray(gen.normal(size=(TRAIN_B, TRAIN_T, 128)).astype(np.float32)),
        "visual": jnp.asarray(gen.normal(size=(TRAIN_B, TRAIN_T, 2048)).astype(np.float32)),
        "captions": jnp.asarray(
            np.concatenate([
                np.full((1, TRAIN_B), 1, np.int32),
                gen.integers(3, VOCAB, size=(TRAIN_L - 1, TRAIN_B), dtype=np.int32),
            ])
        ),
        "feat_mask": jnp.ones((TRAIN_B, TRAIN_T), bool),
    }
    rng = jax.random.PRNGKey(1)
    flops, byts = _cost(train_step, params, opt_state, batch, rng)
    params, opt_state, m = train_step(params, opt_state, batch, rng)
    np.asarray(m["total"])                           # compile + sync
    iters = 100
    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt_state, m = train_step(params, opt_state, batch, rng)
    np.asarray(m["total"])
    rate = TRAIN_B * iters / (time.perf_counter() - t0)
    state = {"p": params, "o": opt_state}

    def run_once():
        state["p"], state["o"], m = train_step(state["p"], state["o"], batch, rng)
        return m

    busy = _device_busy_pct(run_once, lambda m: np.asarray(m["total"]))
    return {"rate": rate, "flops": flops, "bytes": byts,
            "device_busy_pct": busy}


def bench_extract(clip_root: str) -> dict:
    """Batched pipelined sweep (mvc_tpu/extract/features.py) over N_CLIPS
    real MJPG clips at fps=1, including host decode; clips/s."""
    import shutil

    from mvc_tpu.extract import FeatureExtractor
    from mvc_tpu.extract.synthetic import make_clip_set

    videos = os.path.join(clip_root, "videos")
    if not os.path.isdir(videos) or len(os.listdir(videos)) < N_CLIPS:
        make_clip_set(clip_root, N_CLIPS, seconds=CLIP_SECONDS)
    fe = FeatureExtractor(fps=1)
    feat_dir = os.path.join(clip_root, "features")
    shutil.rmtree(feat_dir, ignore_errors=True)
    fe.extract_dataset(videos, feat_dir, batch_size=8, verbose=False)  # warmup/compile
    shutil.rmtree(feat_dir, ignore_errors=True)
    t0 = time.perf_counter()
    stats = fe.extract_dataset(videos, feat_dir, batch_size=8, verbose=False)
    dt = time.perf_counter() - t0
    assert stats["done"] == N_CLIPS, stats
    # Measured host-decode vs device-encode busy time (the stages overlap via
    # the extractor's pipeline) — makes the "host-bound" claim a measurement
    # (VERDICT r4 weak #7) instead of an inference from low MFU.
    split = {
        "host_decode_s": stats.get("decode_s"),
        "device_encode_s": stats.get("encode_s"),
    }
    if stats.get("decode_s"):
        split["host_decode_frac_of_wall"] = round(stats["decode_s"] / dt, 3)
        split["measured_bound"] = (
            "host decode" if stats["decode_s"] >= (stats.get("encode_s") or 0.0)
            else "device encode")

    # FLOPs per clip from the two encode programs at their bucket shapes.
    frames_per_clip = int(CLIP_SECONDS)              # fps=1
    fbucket = 256 if frames_per_clip * N_CLIPS > 128 else 128
    f_in = jnp.zeros((fbucket, 299, 299, 3), jnp.uint8)
    if_flops, if_bytes = _cost(fe._encode_frames, fe.inception_params, f_in)
    abucket = 64
    a_in = jnp.zeros((abucket, 96, 64), jnp.float32)
    af_flops, af_bytes = _cost(fe._encode_audio, fe.vggish_params, a_in)
    flops = byts = None
    if if_flops and af_flops:
        flops = (if_flops / fbucket + af_flops / abucket) * frames_per_clip
        byts = (if_bytes / fbucket + af_bytes / abucket) * frames_per_clip \
            if (if_bytes and af_bytes) else None
    return {"rate": stats["done"] / dt, "flops": flops, "bytes": byts,
            "extra": {"host_device_split": split}}


# ------------------------------------------------------------------ baselines
class _ItosDict(dict):
    """decode_indexes maps every emitted id through itos (reference
    get_loader.py:79-89); random-weight argmaxes hit the whole vocab."""

    def __missing__(self, k):
        return f"w{k}"


class _VocabShim:
    stoi = {"<PAD>": 0, "<SOS>": 1, "<EOS>": 2, "<UNK>": 3}
    itos = _ItosDict({v: k for k, v in stoi.items()})

    def __len__(self):
        return VOCAB

    def decode_indexes(self, indexes):
        # Reference get_loader.py:79-89 — itos map, stop at EOS=2.
        words = []
        for idx in indexes:
            idx = int(idx)
            if idx == 2:
                break
            words.append(self.itos[idx])
        return " ".join(words)


def _reference_on_path():
    # src for the models, the repo root for its vendored pycocoevalcap
    # (imported transitively by the reference's losses module).
    sys.path.insert(0, "/root/reference")
    sys.path.insert(0, os.path.join("/root/reference", "src"))
    from mvc_tpu.utils.torch_oracles import install_reference_extractor_stubs

    install_reference_extractor_stubs()


def baseline_beam() -> float:
    import torch
    from models.features_captioning import FeaturesCaptioning

    torch.set_num_threads(os.cpu_count() or 8)
    dec = FeaturesCaptioning(
        in_feature_size=2048, output_size=VOCAB, rnn_type="LSTM",
        rnn_hidden_size=512, embedding_size=300, attn_size=256, device="cpu",
    ).eval()
    gen = np.random.default_rng(0)
    b_ref = 16  # smaller batch; normalized to captions/sec
    visual = torch.tensor(gen.normal(size=(b_ref, T, 2048)).astype(np.float32))
    with torch.no_grad():
        dec.beam_search_predict(visual[:2], _VocabShim(), 5, 0, WIDTH)  # warmup
        t0 = time.perf_counter()
        dec.beam_search_predict(visual, _VocabShim(), MAX_LEN, 0, WIDTH)
        dt = time.perf_counter() - t0
    return b_ref / dt


def baseline_greedy() -> float:
    import torch
    from models.features_captioning import FeaturesCaptioning

    torch.set_num_threads(os.cpu_count() or 8)
    dec = FeaturesCaptioning(
        in_feature_size=2048, output_size=VOCAB, rnn_type="LSTM",
        rnn_hidden_size=512, embedding_size=300, attn_size=256, device="cpu",
    ).eval()
    gen = np.random.default_rng(0)
    b_ref = 32
    visual = torch.tensor(gen.normal(size=(b_ref, T, 2048)).astype(np.float32))
    with torch.no_grad():
        dec.decode(visual[:2], None, 5, 0)           # warmup
        t0 = time.perf_counter()
        dec.decode(visual, None, MAX_LEN, 0)
        dt = time.perf_counter() - t0
    return b_ref / dt


def baseline_bulk_greedy() -> float:
    """Reference dual-model direct predict (src/models/captioning.py:266-291)
    — the reference's bulk offline-scoring path — torch CPU, normalized to
    captions/sec from a smaller batch."""
    import models.captioning as ref_cap
    import torch

    torch.set_num_threads(os.cpu_count() or 8)
    torch.manual_seed(0)
    ref = ref_cap.AVCaptioningDual(
        vocab=_VocabShim(), teacher_forcing_ratio=1.0,
        reconstructor_type="none", device="cpu",
    ).eval()
    gen = np.random.default_rng(0)
    b_ref = 16
    audio = torch.tensor(gen.normal(size=(b_ref, T, 128)).astype(np.float32))
    visual = torch.tensor(gen.normal(size=(b_ref, T, 2048)).astype(np.float32))
    with torch.no_grad():
        ref.predict(audio[:2], visual[:2], 5, mode="direct")   # warmup
        t0 = time.perf_counter()
        ref.predict(audio, visual, MAX_LEN, mode="direct")
        dt = time.perf_counter() - t0
    return b_ref / dt


def baseline_train() -> float:
    """Reference training step semantics on AVCaptioningDual at reference
    dims: forward -> ModalityWiseReconstructionLoss -> mean().backward ->
    clip_grad_value_(5.0) -> Adam(amsgrad, wd) (reference src/train.py:
    86-97, 176-244)."""
    import models.captioning as ref_cap
    import torch
    from losses import ModalityWiseReconstructionLossBuilder as RefBuilder

    torch.set_num_threads(os.cpu_count() or 8)
    torch.manual_seed(0)
    ref = ref_cap.AVCaptioningDual(
        vocab=_VocabShim(), teacher_forcing_ratio=1.0,
        reconstructor_type="global", device="cpu",
    )
    loss_fn = RefBuilder(rec_type="global", reg_lambda=0.001,
                         audio_recon_lambda=10.0, visual_recon_lambda=10.0)
    opt = torch.optim.Adam(ref.parameters(), lr=1e-4, weight_decay=1e-5, amsgrad=True)
    gen = np.random.default_rng(0)
    b_ref = 16  # smaller batch; normalized to samples/sec
    audio = torch.tensor(gen.normal(size=(b_ref, TRAIN_T, 128)).astype(np.float32))
    visual = torch.tensor(gen.normal(size=(b_ref, TRAIN_T, 2048)).astype(np.float32))
    captions = torch.tensor(np.concatenate([
        np.full((1, b_ref), 1, np.int64),
        gen.integers(3, VOCAB, size=(TRAIN_L - 1, b_ref), dtype=np.int64),
    ]))

    def step():
        opt.zero_grad()
        outputs, a_rec, v_rec = ref(audio, visual, captions)
        loss, *_ = loss_fn(outputs, captions, audio, a_rec, visual, v_rec)
        loss.mean().backward()
        torch.nn.utils.clip_grad_value_(ref.parameters(), clip_value=5.0)
        opt.step()

    ref.train()
    step()                                           # warmup
    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        step()
    return b_ref * iters / (time.perf_counter() - t0)


def baseline_extract(clip_root: str) -> float:
    """Reference FeatureExtractor, one clip at a time, synchronous
    (src/extract_features.py:140-161); random weights — throughput is
    weight-independent."""
    from mvc_tpu.extract.synthetic import make_clip_set

    videos = os.path.join(clip_root, "videos")
    if not os.path.isdir(videos) or len(os.listdir(videos)) < N_CLIPS_BASELINE:
        make_clip_set(clip_root, N_CLIPS_BASELINE, seconds=CLIP_SECONDS)
    names = sorted(os.listdir(videos))[:N_CLIPS_BASELINE]

    from extract_features import FeatureExtractor as RefExtractor  # reference

    fe = RefExtractor()
    fe.extract(os.path.join(videos, names[0]))       # warmup
    t0 = time.perf_counter()
    for f in names:
        fe.extract(os.path.join(videos, f), to_numpy=True)
    return len(names) / (time.perf_counter() - t0)


def get_baselines(measure_missing: bool = True) -> dict:
    cache = {}
    if os.path.isfile(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            cache = json.load(f)
    need = {
        "captions_per_sec": baseline_beam,
        "greedy_captions_per_sec": baseline_greedy,
        "bulk_greedy_captions_per_sec": baseline_bulk_greedy,
        "train_samples_per_sec": baseline_train,
        "extract_clips_per_sec": lambda: baseline_extract("/tmp/mvc_bench_clips_ref"),
    }
    missing = [k for k in need if k not in cache]
    if missing and measure_missing:
        _reference_on_path()
        for k in missing:
            try:
                cache[k] = round(need[k](), 4)
                print(f"measured baseline {k} = {cache[k]}", file=sys.stderr)
            except Exception as e:
                print(f"baseline {k} failed: {e}", file=sys.stderr)
        cache.setdefault("workload", {
            "B": B, "T": T, "width": WIDTH, "max_len": MAX_LEN, "vocab": VOCAB,
            "note": "reference implementations, torch CPU (only runnable form "
                    "here); beam/greedy/train normalized to per-sec from "
                    "smaller batches",
        })
        cache["workload_train"] = {"B": TRAIN_B, "T": TRAIN_T, "L": TRAIN_L,
                                   "recon": "global"}
        cache["workload_extract"] = {"n_clips": N_CLIPS_BASELINE,
                                     "seconds": CLIP_SECONDS, "fps": 1}
        with open(BASELINE_CACHE, "w") as f:
            json.dump(cache, f, indent=1)
    return cache


# ------------------------------------------------------------------ driver
LASTGOOD = os.path.join(REPO, "BENCH_LASTGOOD.json")
ROOFLINE_NOTE = {"peak_tflops_bf16": PEAK_TFLOPS_BF16,
                 "peak_hbm_gbps_datasheet": PEAK_HBM_GBPS,
                 "note": "MFU vs one-chip v5e bf16 peak; f32-compute "
                         "paths are a conservative lower bound; hbm_gbps "
                         "clamps XLA cost-analysis byte ESTIMATES (which "
                         "undercount scan bodies and overcounted round-4 "
                         "train >100% of peak) to the chip's MEASURED triad "
                         "bandwidth (peak_hbm_gbps_measured; raw estimate "
                         "kept in hbm_gbps_est)"}


def _consolidated(metrics: dict) -> dict:
    """Full output payload from whatever metrics exist so far — every
    printed line is a complete, parseable artifact."""
    head_name = ("beam_captions_per_sec" if "beam_captions_per_sec" in metrics
                 else next(iter(metrics), None))
    head = metrics.get(head_name, {})
    label = ("captions/sec (beam decode, width 5, dual model)"
             if head_name == "beam_captions_per_sec" else head_name)
    return {
        "metric": label,
        "value": head.get("value"),
        "unit": head.get("unit", "captions/s"),
        "vs_baseline": head.get("vs_baseline"),
        "metrics": metrics,
        "roofline": ROOFLINE_NOTE,
    }


# Real stdout is reserved for the JSON artifact lines: library code prints
# model banners (models/captioning.py "Initializing Model...") that would
# otherwise interleave with them, so main() points sys.stdout at stderr and
# _emit writes here.
_OUT = sys.stdout


def _emit(payload: dict) -> None:
    print(json.dumps(payload), file=_OUT, flush=True)


def _load_lastgood() -> dict | None:
    try:
        with open(LASTGOOD) as f:
            return json.load(f)
    except Exception:
        return None


def _emit_stale_and_exit(reason: str) -> None:
    last = _load_lastgood()
    if last is not None:
        _emit({**last, "stale": True, "stale_reason": reason})
    else:
        _emit({"metric": "captions/sec (beam decode, width 5, dual model)",
               "value": None, "unit": "captions/s", "vs_baseline": None,
               "metrics": {}, "error": reason})
    _OUT.flush()
    sys.stderr.flush()
    # The hung backend-init thread (if any) is unkillable; exit hard.
    os._exit(0)


def _deadline() -> float:
    """Hard wall-clock deadline for the DEVICE CLAIM, shared across
    re-execs via MVC_BENCH_T0 (epoch seconds of the first launch)."""
    budget = float(os.environ.get("MVC_BENCH_BUDGET_S", "900"))
    t0 = float(os.environ.setdefault("MVC_BENCH_T0", repr(time.time())))
    return t0 + budget


def _wait_for_device(relaunch_delay: float = 45.0, max_relaunches: int = 3):
    """Claim the chip under a hard deadline.  The axon tunnel grants the
    chip to one process at a time and the claim cannot be retried
    in-process (re-exec on fast failure); a DEAD tunnel instead hangs
    ~25 min inside backend init (round-3 postmortem), so the claim runs on
    a daemon thread and we bail to the stale-cache artifact on timeout."""
    import threading

    import jax as _jax

    deadline = _deadline()
    remaining = deadline - time.time()
    if remaining <= 0:
        _emit_stale_and_exit("device-claim budget exhausted before claim")

    result: dict = {}

    def claim():
        try:
            result["devices"] = _jax.devices()
        except Exception as e:                       # noqa: BLE001
            result["error"] = e

    th = threading.Thread(target=claim, daemon=True)
    th.start()
    th.join(timeout=remaining)
    if th.is_alive():
        _emit_stale_and_exit(
            f"backend init still hung after {remaining:.0f}s (tunnel down)")
    if "devices" in result:
        return
    e = result["error"]
    n = int(os.environ.get("MVC_BENCH_RELAUNCH", "0"))
    if n >= max_relaunches or time.time() + relaunch_delay >= deadline:
        _emit_stale_and_exit(f"device claim failed: {e}")
    print(f"device claim failed ({e}); re-exec {n + 1}/{max_relaunches}",
          file=sys.stderr)
    time.sleep(relaunch_delay)
    os.environ["MVC_BENCH_RELAUNCH"] = str(n + 1)
    os.execv(sys.executable, [sys.executable] + sys.argv)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="beam,greedy,bulk,train,extract",
                    help="comma list of beam,greedy,bulk,train,extract")
    args = ap.parse_args()
    which = set(args.only.split(","))
    sys.stdout = sys.stderr   # JSON-only real stdout; see _OUT

    # First output: the last driver-verified numbers, marked stale.  If the
    # tunnel is up this line is superseded below; if anything hangs or dies
    # from here on, the driver's tail still ends in a parseable artifact.
    last = _load_lastgood()
    if last is not None:
        _emit({**last, "stale": True,
               "stale_reason": "startup placeholder; superseded by the "
                               "fresh lines below if the run completes"})

    # Pallas bulk probe runs BEFORE the device claim (it needs the chip to
    # itself; MVC_BULK_PALLAS_PROBE_S=0 disables).
    if "bulk" in which:
        budget = int(os.environ.get("MVC_BULK_PALLAS_PROBE_S", "600"))
        if budget > 0:
            _probe_bulk_pallas(budget)

    _wait_for_device()
    global jax, jnp
    import jax
    import jax.numpy as jnp

    from mvc_tpu.utils.runtime import setup_compile_cache

    setup_compile_cache()
    if os.environ.get("MVC_TRIAD", "1") != "0":
        try:
            _MEASURED["peak_hbm_gbps"] = round(_measure_peak_hbm(), 1)
            ROOFLINE_NOTE["peak_hbm_gbps_measured"] = _MEASURED["peak_hbm_gbps"]
            print(f"measured triad HBM: {_MEASURED['peak_hbm_gbps']} GB/s",
                  file=sys.stderr)
        except Exception as e:                           # pragma: no cover
            print(f"triad HBM measurement failed ({e}); using datasheet peak",
                  file=sys.stderr)
    else:
        print("MVC_TRIAD=0: utilization vs datasheet peak", file=sys.stderr)
    base = get_baselines()

    def entry(res, unit, per, base_key):
        bval = base.get(base_key)
        e = {"value": round(res["rate"], 2), "unit": unit}
        if bval:
            e["vs_baseline"] = round(res["rate"] / bval, 2)
        if res.get("device_busy_pct") is not None:
            e["device_busy_pct_measured"] = res["device_busy_pct"]
        if res.get("path"):
            e["path"] = res["path"]
        e = _roofline(e, res.get("flops"), res.get("bytes"),
                      res["rate"] / per)
        e.update(res.get("extra") or {})
        return e

    plan = []
    if "beam" in which:
        plan.append(("beam_captions_per_sec",
                     lambda: entry(bench_beam(), "captions/s", B,
                                   "captions_per_sec")))
    if "greedy" in which:
        plan.append(("greedy_captions_per_sec",
                     lambda: entry(bench_greedy(), "captions/s", B,
                                   "greedy_captions_per_sec")))
    if "bulk" in which:
        plan.append(("bulk_greedy_captions_per_sec",
                     lambda: entry(bench_bulk_greedy(), "captions/s", BULK_B,
                                   "bulk_greedy_captions_per_sec")))
    if "train" in which:
        plan.append(("train_samples_per_sec",
                     lambda: entry(bench_train(), "samples/s", TRAIN_B,
                                   "train_samples_per_sec")))
    if "extract" in which:
        plan.append(("extract_clips_per_sec",
                     lambda: entry(bench_extract("/tmp/mvc_bench_clips"),
                                   "clips/s", 1, "extract_clips_per_sec")))

    metrics = {}
    for name, fn in plan:
        try:
            metrics[name] = fn()
        except Exception as e:                       # noqa: BLE001
            print(f"metric {name} failed: {e}", file=sys.stderr)
            continue
        # One full consolidated line per metric as it lands (the driver
        # records the tail), and persist last-good for the outage fallback.
        payload = _consolidated(metrics)
        _emit(payload)
        if os.environ.get("MVC_BENCH_NO_CACHE") != "1":
            try:
                full = dict(payload)
                if last is not None and "metrics" in last:
                    # keep metrics this run didn't re-measure
                    merged = dict(last["metrics"])
                    merged.update(metrics)
                    full = _consolidated(merged)
                with open(LASTGOOD, "w") as f:
                    json.dump(full, f, indent=1)
            except Exception as e:                   # noqa: BLE001
                print(f"lastgood write failed: {e}", file=sys.stderr)

    if not metrics:
        _emit_stale_and_exit("all requested metrics failed")


if __name__ == "__main__":
    main()
