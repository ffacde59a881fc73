#!/usr/bin/env python
"""Serving load test — closed-loop throughput + open-loop latency percentiles.

Measures mvc_tpu.serving.CaptionService at the bench.py headline decode
conditions (dual model, V=4000, bf16, T=16 frames, max_len 30):

    python scripts/bench_serving.py [--mode direct|beam] [--max_batch 64]
        [--concurrency 1 16 64 256] [--qps-fracs 0.25 0.5 0.9] [--pallas]

Phases, one stdout JSON line each (prose on stderr, bench.py discipline):

1. closed-loop: at most C requests outstanding (semaphore clients) — the
   max-sustained-throughput curve and where batching saturates;
   pipeline_depth 1 vs the default is measured at the top C.
2. open-loop: Poisson arrivals at fractions of the measured max — the
   latency-under-load percentiles a capacity planner actually wants.

Context for reading the numbers on THIS rig: every serving batch pays a
fresh [max_batch, T, 2048+128] f32 H2D (~8.9 MB at B=64) through the axon
tunnel (~50 MB/s, CLAUDE.md) — unlike bench.py's decode metrics, whose
inputs are pre-staged on device.  The JSON carries h2d_mb_per_batch so the
transfer-bound ceiling is explicit; a real TPU host's PCIe moves the same
batch in <1 ms.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VOCAB, T, A_DIM, V_DIM, MAX_LEN, WIDTH = 4000, 16, 128, 2048, 30, 5


def log(*a):
    print(*a, file=sys.stderr, flush=True)


class _ItosDict(dict):
    def __missing__(self, k):
        return f"w{k}"


class _VocabShim:
    """Same shim bench.py uses: ids -> words, stop at EOS=2."""

    itos = _ItosDict({0: "<PAD>", 1: "<SOS>", 2: "<EOS>", 3: "<UNK>"})

    def __len__(self):
        return VOCAB

    def decode_indexes(self, indexes):
        words = []
        for idx in indexes:
            idx = int(idx)
            if idx == 2:
                break
            words.append(self.itos[idx])
        return " ".join(words)


def pct(lat, p):
    if not lat:
        return None
    lat = sorted(lat)
    return 1e3 * lat[min(len(lat) - 1, int(p * len(lat)))]


def closed_loop(svc, reqs, concurrency: int, n_total: int):
    """At most `concurrency` outstanding requests; returns (rate, latencies)."""
    svc.reset_stats()
    sem = threading.Semaphore(concurrency)
    lat, lock = [], threading.Lock()
    t0 = time.perf_counter()

    def on_done(t_submit):
        def cb(fut):
            fut.result()  # re-raise
            with lock:
                lat.append(time.perf_counter() - t_submit)
            sem.release()
        return cb

    for i in range(n_total):
        sem.acquire()
        visual, audio = reqs[i % len(reqs)]
        ts = time.perf_counter()
        svc.submit(visual, audio).add_done_callback(on_done(ts))
    for _ in range(concurrency):  # drain
        sem.acquire()
    elapsed = time.perf_counter() - t0
    return n_total / elapsed, lat, svc.stats()


def open_loop_cb(svc, reqs, qps: float, n_total: int, rng):
    """Poisson arrivals at `qps`; latency measured by future callbacks."""
    svc.reset_stats()
    lat, lock = [], threading.Lock()
    done = threading.Semaphore(0)

    def on_done(ts):
        def cb(fut):
            fut.result()
            with lock:
                lat.append(time.perf_counter() - ts)
            done.release()
        return cb

    t0 = time.perf_counter()
    next_t = t0
    for i in range(n_total):
        next_t += rng.exponential(1.0 / qps)
        delay = next_t - time.perf_counter()
        if delay > 0:
            time.sleep(delay)
        visual, audio = reqs[i % len(reqs)]
        ts = time.perf_counter()
        svc.submit(visual, audio).add_done_callback(on_done(ts))
    t_last_arrival = time.perf_counter()
    for _ in range(n_total):
        done.acquire()
    # arrival rate actually offered (sleep/submit overhead can undershoot
    # the target); completions are all drained by now
    achieved = n_total / (t_last_arrival - t0)
    return achieved, lat


def http_load(svc, reqs, n_clients: int, n_per_client: int):
    """Genuinely concurrent HTTP clients against the stdlib front end
    (VERDICT r4 item 6): every request is a real POST over a loopback
    socket — JSON encode, TCP, ThreadingHTTPServer handler thread, service
    queue — not an in-process submit().  Returns (rate, latencies, codes)."""
    import json as _json
    import urllib.error
    import urllib.request

    from mvc_tpu.serving import make_http_server

    server = make_http_server(svc, port=0)
    host, port = server.server_address[:2]
    base = f"http://{host}:{port}"
    t_srv = threading.Thread(target=server.serve_forever, daemon=True)
    t_srv.start()
    payloads = [
        _json.dumps({"visual": v.tolist(), "audio": a.tolist()}).encode()
        for v, a in reqs[: max(8, n_clients)]
    ]
    lat, codes = [], []
    lock = threading.Lock()

    def client(cid):
        for i in range(n_per_client):
            body = payloads[(cid + i) % len(payloads)]
            req = urllib.request.Request(
                base + "/caption", data=body,
                headers={"Content-Type": "application/json"}, method="POST")
            t0 = time.perf_counter()
            try:
                with urllib.request.urlopen(req, timeout=600) as resp:
                    resp.read()
                    code = resp.status
            except urllib.error.HTTPError as e:
                code = e.code
            dt = time.perf_counter() - t0
            with lock:
                lat.append(dt)
                codes.append(code)

    threads = [threading.Thread(target=client, args=(i,)) for i in range(n_clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    server.shutdown()
    server.server_close()
    ok = sum(1 for c in codes if c == 200)
    return ok / wall, sorted(lat), codes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="direct", choices=["direct", "beam"])
    ap.add_argument("--max_batch", type=int, default=64)
    ap.add_argument("--max_wait_ms", type=float, default=2.0)
    ap.add_argument("--concurrency", type=int, nargs="+", default=[1, 16, 64, 256])
    ap.add_argument("--qps-fracs", type=float, nargs="*", default=[0.25, 0.5, 0.9])
    ap.add_argument("--n", type=int, default=2000, help="requests per closed-loop point")
    ap.add_argument("--n-open", type=int, default=1000)
    ap.add_argument("--transfer", default="f32", choices=["f32", "bf16", "int8"],
                    help="feature H2D wire format (ServiceConfig.transfer)")
    ap.add_argument("--pipeline-depth", type=int, default=2,
                    help="in-flight device batches (ServiceConfig.pipeline_depth)")
    ap.add_argument("--skip-ablation", action="store_true",
                    help="skip the pipeline_depth=1 re-measurement")
    ap.add_argument("--pallas", action="store_true")
    ap.add_argument("--http-clients", type=int, default=16,
                    help="concurrent HTTP client threads for the http phase")
    ap.add_argument("--http-n", type=int, default=25,
                    help="requests per HTTP client")
    ap.add_argument("--skip-http", action="store_true")
    args = ap.parse_args()

    if args.pallas:
        from mvc_tpu.ops.dispatch import enable_pallas

        enable_pallas(True)

    import jax.numpy as jnp
    import jax

    from mvc_tpu.models import AVCaptioningDual
    from mvc_tpu.serving import CaptionService, ServiceConfig

    log(f"devices: {jax.devices()}")
    model = AVCaptioningDual(vocab_size=VOCAB, dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0))
    vocab = _VocabShim()

    rng = np.random.default_rng(0)
    reqs = [(rng.normal(size=(T, V_DIM)).astype(np.float32),
             rng.normal(size=(T, A_DIM)).astype(np.float32)) for _ in range(64)]
    bytes_per_el = {"f32": 4, "bf16": 2, "int8": 1}[args.transfer]
    h2d_mb = args.max_batch * T * (V_DIM + A_DIM) * bytes_per_el / 1e6
    if args.transfer == "int8":  # plus the per-frame f32 scales
        h2d_mb += args.max_batch * T * 2 * 4 / 1e6

    def make(depth):
        return CaptionService(model, params, vocab, ServiceConfig(
            max_batch=args.max_batch, max_wait_ms=args.max_wait_ms,
            frame_buckets=(T,), max_caption_len=MAX_LEN, mode=args.mode,
            beam_width=WIDTH, audio_dim=A_DIM, visual_dim=V_DIM,
            pipeline_depth=depth, transfer=args.transfer,
        ))

    results = []
    with make(depth=args.pipeline_depth) as svc:
        log("warmup (one compile)...")
        svc.warmup([T])
        best = 0.0
        for c in args.concurrency:
            rate, lat, stats = closed_loop(svc, reqs, c, max(args.n, 4 * c))
            best = max(best, rate)
            entry = {
                "phase": "closed_loop", "mode": args.mode, "concurrency": c,
                "captions_per_s": round(rate, 1),
                "p50_ms": round(pct(lat, 0.5), 2), "p95_ms": round(pct(lat, 0.95), 2),
                "p99_ms": round(pct(lat, 0.99), 2),
                "mean_batch_occupancy": round(stats["mean_batch_occupancy"], 2),
                "batches": stats["batches"], "h2d_mb_per_batch": round(h2d_mb, 2),
                "max_batch": args.max_batch, "pipeline_depth": args.pipeline_depth,
                "transfer": args.transfer,
            }
            results.append(entry)
            print(json.dumps(entry), flush=True)

        for frac in args.qps_fracs:
            qps = frac * best
            achieved, lat = open_loop_cb(svc, reqs, qps, args.n_open, rng)
            entry = {
                "phase": "open_loop", "mode": args.mode,
                "target_qps": round(qps, 1), "achieved_qps": round(achieved, 1),
                "frac_of_max": frac,
                "p50_ms": round(pct(lat, 0.5), 2), "p95_ms": round(pct(lat, 0.95), 2),
                "p99_ms": round(pct(lat, 0.99), 2),
                "max_batch": args.max_batch, "pipeline_depth": args.pipeline_depth,
                "transfer": args.transfer,
            }
            results.append(entry)
            print(json.dumps(entry), flush=True)

    # real concurrent HTTP clients (loopback sockets, ThreadingHTTPServer)
    if not args.skip_http:
        with make(depth=args.pipeline_depth) as svc:
            svc.warmup([T])
            rate, lat, codes = http_load(svc, reqs, args.http_clients, args.http_n)
            entry = {
                "phase": "http_closed_loop", "mode": args.mode,
                "clients": args.http_clients, "n": len(codes),
                "captions_per_s": round(rate, 1),
                "p50_ms": round(pct(lat, 0.5), 2),
                "p95_ms": round(pct(lat, 0.95), 2),
                "p99_ms": round(pct(lat, 0.99), 2),
                "http_200": sum(1 for c in codes if c == 200),
                "non_200": sum(1 for c in codes if c != 200),
                "max_batch": args.max_batch, "transfer": args.transfer,
            }
            results.append(entry)
            print(json.dumps(entry), flush=True)

        # overload phase: zero-capacity queue + max_batch 1 -> anything that
        # cannot launch immediately is shed with 503 (eviction policy is
        # unit-tested in tests/test_serving.py; this measures the shed path
        # under real HTTP concurrency)
        from mvc_tpu.serving import ServiceConfig as _SC

        over_cfg = _SC(
            max_batch=1, max_wait_ms=0.5, frame_buckets=(T,),
            max_caption_len=MAX_LEN, mode=args.mode, beam_width=WIDTH,
            audio_dim=A_DIM, visual_dim=V_DIM, pipeline_depth=1,
            transfer=args.transfer, max_queue=1,
        )
        with CaptionService(model, params, vocab, over_cfg) as svc:
            svc.warmup([T])
            rate, lat, codes = http_load(svc, reqs, args.http_clients, args.http_n)
            st = svc.stats()
            entry = {
                "phase": "http_overload", "mode": args.mode,
                "clients": args.http_clients, "n": len(codes),
                "served_per_s": round(rate, 1),
                "http_200": sum(1 for c in codes if c == 200),
                "http_503_shed": sum(1 for c in codes if c == 503),
                "shed_counter": st["shed"], "max_queue": 1,
            }
            results.append(entry)
            print(json.dumps(entry), flush=True)

    # pipeline ablation at the top concurrency
    if args.skip_ablation:
        log("done:", len(results), "measurement points")
        return
    with make(depth=1) as svc:
        svc.warmup([T])
        c = max(args.concurrency)
        rate, lat, stats = closed_loop(svc, reqs, c, max(args.n, 4 * c))
        entry = {
            "phase": "closed_loop", "mode": args.mode, "concurrency": c,
            "captions_per_s": round(rate, 1),
            "p50_ms": round(pct(lat, 0.5), 2), "p95_ms": round(pct(lat, 0.95), 2),
            "p99_ms": round(pct(lat, 0.99), 2),
            "mean_batch_occupancy": round(stats["mean_batch_occupancy"], 2),
            "batches": stats["batches"], "h2d_mb_per_batch": round(h2d_mb, 2),
            "max_batch": args.max_batch, "pipeline_depth": 1,
            "transfer": args.transfer,
        }
        results.append(entry)
        print(json.dumps(entry), flush=True)

    log("done:", len(results), "measurement points")


if __name__ == "__main__":
    main()
