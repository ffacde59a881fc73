"""Online serving layer (mvc_tpu/serving/): continuous batching correctness.

The contract under test: a request's caption is IDENTICAL whether it rode a
shared padded batch through the service or a solo padded batch through
``predict_tokens`` directly (row independence via feat_mask — same contract
as collate_eval_batch), the compiled-shape set stays bounded by the frame
bucket ladder, and the stdlib HTTP front end round-trips JSON.
"""

import json
import threading
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest

from mvc_tpu.config import DecoderConfig
from mvc_tpu.data import Vocabulary
from mvc_tpu.data.dataset import _bucket
from mvc_tpu.models import AVCaptioningDual
from mvc_tpu.models.captioning import captions_from_tokens
from mvc_tpu.serving import CaptionService, ServiceConfig, make_http_server

A_DIM, V_DIM = 8, 16
BUCKETS = (4, 8)

TINY_V = DecoderConfig(rnn_type="LSTM", in_feature_size=V_DIM, rnn_hidden_size=12,
                       embedding_size=8, attn_size=6, output_size=1)
TINY_A = DecoderConfig(rnn_type="LSTM", in_feature_size=A_DIM, rnn_hidden_size=10,
                       embedding_size=8, attn_size=6, output_size=1)


@pytest.fixture(scope="module")
def tiny():
    vocab = Vocabulary(freq_threshold=1)
    vocab.build_vocabulary([
        "a man plays a guitar",
        "a dog runs on grass",
        "someone slices a tomato",
    ])
    model = AVCaptioningDual(vocab_size=len(vocab), reconstructor_type="none",
                             visual_decoder_config=TINY_V, audio_decoder_config=TINY_A)
    params = model.init(jax.random.PRNGKey(0))
    return model, params, vocab


def _requests(rng, n, t_lo=2, t_hi=8):
    out = []
    for _ in range(n):
        t = int(rng.integers(t_lo, t_hi + 1))
        out.append((
            rng.normal(size=(t, V_DIM)).astype(np.float32),
            rng.normal(size=(t, A_DIM)).astype(np.float32),
        ))
    return out


def _expected(model, params, vocab, visual, audio, cfg: ServiceConfig):
    """Solo-batch oracle with the service's exact padding semantics."""
    t = visual.shape[0]
    t_pad = _bucket(t, cfg.frame_buckets)
    a = np.zeros((1, t_pad, cfg.audio_dim), dtype=np.float32)
    v = np.zeros((1, t_pad, cfg.visual_dim), dtype=np.float32)
    m = np.zeros((1, t_pad), dtype=bool)
    a[0, :t], v[0, :t], m[0, :t] = audio, visual, True
    tokens = model.predict_tokens(
        params, a, v, max_caption_len=cfg.max_caption_len, mode=cfg.mode,
        beam_alpha=cfg.beam_alpha, beam_width=cfg.beam_width, feat_mask=m,
    )
    return captions_from_tokens(vocab, np.asarray(tokens))[0]


@pytest.mark.parametrize("mode", ["direct", "beam"])
def test_batched_captions_match_solo_oracle(tiny, rng, mode):
    model, params, vocab = tiny
    cfg = ServiceConfig(max_batch=4, max_wait_ms=300.0, frame_buckets=BUCKETS,
                        max_caption_len=6, mode=mode, beam_width=3,
                        audio_dim=A_DIM, visual_dim=V_DIM)
    # one frame bucket (T in 5..8 -> t_pad 8) so the solo oracle shares the
    # service's padded shape no matter how requests coalesce into batches
    reqs = _requests(rng, 6, t_lo=5, t_hi=8)
    with CaptionService(model, params, vocab, cfg) as svc:
        futures = [svc.submit(v, a) for v, a in reqs]
        got = [f.result(timeout=300) for f in futures]
        stats = svc.stats()

    for (visual, audio), cap in zip(reqs, got):
        assert cap == _expected(model, params, vocab, visual, audio, cfg)
    # continuous batching actually happened (6 requests, window 300 ms)
    assert stats["requests"] == 6
    assert stats["batches"] < 6
    assert stats["mean_batch_occupancy"] > 1.0
    assert stats["latency_ms_p50"] is not None


def test_compiled_shape_set_is_bounded_by_buckets(tiny, rng):
    model, params, vocab = tiny
    cfg = ServiceConfig(max_batch=3, max_wait_ms=1.0, frame_buckets=BUCKETS,
                        max_caption_len=5, audio_dim=A_DIM, visual_dim=V_DIM)
    with CaptionService(model, params, vocab, cfg) as svc:
        warmed = svc.warmup()
        assert warmed == [4, 8]
        svc.reset_stats()
        for visual, audio in _requests(rng, 8, t_lo=1, t_hi=8):
            svc.submit(visual, audio).result(timeout=300)
        stats = svc.stats()
    # 8 mixed-length requests never grew the executable set past the ladder
    assert stats["compiled_t_pads"] == [4, 8]
    assert stats["requests"] == 8


def test_above_ladder_lengths_extend_like_the_collator(tiny, rng):
    model, params, vocab = tiny
    cfg = ServiceConfig(max_batch=2, max_wait_ms=1.0, frame_buckets=BUCKETS,
                        max_caption_len=5, audio_dim=A_DIM, visual_dim=V_DIM)
    visual, audio = _requests(rng, 1, t_lo=11, t_hi=11)[0]
    with CaptionService(model, params, vocab, cfg) as svc:
        cap = svc.submit(visual, audio).result(timeout=300)
        assert svc.stats()["compiled_t_pads"] == [16]  # next multiple of 8
    assert cap == _expected(model, params, vocab, visual, audio, cfg)


def test_submit_validates_shapes(tiny):
    model, params, vocab = tiny
    cfg = ServiceConfig(audio_dim=A_DIM, visual_dim=V_DIM)
    with CaptionService(model, params, vocab, cfg) as svc:
        with pytest.raises(ValueError):
            svc.submit(np.zeros((3, V_DIM + 1), np.float32))
        with pytest.raises(ValueError):
            svc.submit(np.zeros((3, V_DIM), np.float32),
                       np.zeros((2, A_DIM), np.float32))
        with pytest.raises(ValueError):
            svc.submit(np.zeros((0, V_DIM), np.float32))
    with pytest.raises(RuntimeError):
        svc.submit(np.zeros((3, V_DIM), np.float32))  # closed


def test_video_only_requests_zero_fill_audio(tiny, rng):
    model, params, vocab = tiny
    cfg = ServiceConfig(max_batch=2, max_wait_ms=1.0, frame_buckets=BUCKETS,
                        max_caption_len=5, audio_dim=A_DIM, visual_dim=V_DIM)
    visual = rng.normal(size=(5, V_DIM)).astype(np.float32)
    with CaptionService(model, params, vocab, cfg) as svc:
        cap = svc.submit(visual).result(timeout=300)
    zeros = np.zeros((5, A_DIM), np.float32)
    assert cap == _expected(model, params, vocab, visual, zeros, cfg)


def test_bf16_transfer_is_bitwise_for_bf16_models(rng):
    """decode casts inputs to the model dtype on entry, so host-side bf16
    casting just moves the cast across the wire — captions identical."""
    import jax.numpy as jnp

    vocab = Vocabulary(freq_threshold=1)
    vocab.build_vocabulary(["a man plays a guitar", "a dog runs on grass"])
    model = AVCaptioningDual(vocab_size=len(vocab), reconstructor_type="none",
                             visual_decoder_config=TINY_V,
                             audio_decoder_config=TINY_A, dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0))
    reqs = _requests(rng, 4, t_lo=5, t_hi=8)
    caps = {}
    for transfer in ("f32", "bf16"):
        cfg = ServiceConfig(max_batch=2, max_wait_ms=1.0, frame_buckets=BUCKETS,
                            max_caption_len=6, audio_dim=A_DIM, visual_dim=V_DIM,
                            transfer=transfer)
        with CaptionService(model, params, vocab, cfg) as svc:
            futures = [svc.submit(v, a) for v, a in reqs]
            caps[transfer] = [f.result(timeout=300) for f in futures]
    assert caps["f32"] == caps["bf16"]


def test_int8_transfer_matches_dequantized_oracle(tiny, rng):
    """int8 wire format == the trainer's quantize_int8: captions equal a
    direct predict on the host-dequantized features."""
    from mvc_tpu.data.feature_cache import quantize_int8

    model, params, vocab = tiny
    cfg = ServiceConfig(max_batch=2, max_wait_ms=1.0, frame_buckets=BUCKETS,
                        max_caption_len=6, audio_dim=A_DIM, visual_dim=V_DIM,
                        transfer="int8")
    reqs = _requests(rng, 3, t_lo=5, t_hi=8)
    with CaptionService(model, params, vocab, cfg) as svc:
        got = [svc.submit(v, a).result(timeout=300) for v, a in reqs]
    for (visual, audio), cap in zip(reqs, got):
        t, t_pad = visual.shape[0], 8
        a = np.zeros((1, t_pad, A_DIM), np.float32)
        v = np.zeros((1, t_pad, V_DIM), np.float32)
        m = np.zeros((1, t_pad), bool)
        a[0, :t], v[0, :t], m[0, :t] = audio, visual, True
        qa, sa = quantize_int8(a)
        qv, sv = quantize_int8(v)
        tokens = model.predict_tokens(
            params, qa.astype(np.float32) * sa, qv.astype(np.float32) * sv,
            max_caption_len=6, mode="direct", feat_mask=m)
        assert cap == captions_from_tokens(vocab, np.asarray(tokens))[0]


@pytest.mark.parametrize("depth", [1, 3])
def test_pipeline_depth_does_not_change_results(tiny, rng, depth):
    """Launch/sync overlap is an ordering detail: any pipeline_depth yields
    the same captions as the solo oracle."""
    model, params, vocab = tiny
    cfg = ServiceConfig(max_batch=2, max_wait_ms=1.0, frame_buckets=BUCKETS,
                        max_caption_len=5, audio_dim=A_DIM, visual_dim=V_DIM,
                        pipeline_depth=depth)
    reqs = _requests(rng, 5, t_lo=5, t_hi=8)
    with CaptionService(model, params, vocab, cfg) as svc:
        futures = [svc.submit(v, a) for v, a in reqs]
        got = [f.result(timeout=300) for f in futures]
    for (visual, audio), cap in zip(reqs, got):
        assert cap == _expected(model, params, vocab, visual, audio, cfg)


def test_mesh_sharded_service_matches_single_device(tiny, rng):
    """One serving replica across a dp mesh: params placed with the training
    shardings, every batch dp-sharded — captions identical to unsharded."""
    from mvc_tpu.parallel.mesh import make_mesh

    model, params, vocab = tiny
    mesh = make_mesh(dp=4)
    cfg = ServiceConfig(max_batch=4, max_wait_ms=1.0, frame_buckets=BUCKETS,
                        max_caption_len=6, audio_dim=A_DIM, visual_dim=V_DIM)
    reqs = _requests(rng, 5, t_lo=5, t_hi=8)
    with CaptionService(model, params, vocab, cfg, mesh=mesh) as svc:
        got = [svc.submit(v, a).result(timeout=300) for v, a in reqs]
    for (visual, audio), cap in zip(reqs, got):
        assert cap == _expected(model, params, vocab, visual, audio, cfg)

    # max_batch must divide dp
    with pytest.raises(ValueError):
        CaptionService(model, params, vocab,
                       ServiceConfig(max_batch=3, audio_dim=A_DIM,
                                     visual_dim=V_DIM), mesh=mesh)


def test_transformer_family_is_servable(rng):
    """CaptionService capability-detects stop_at_all_eos (the transformer
    has no such switch) — any model with the predict_tokens contract serves."""
    from mvc_tpu.models.transformer import TransformerCaptioning, TransformerConfig

    vocab = Vocabulary(freq_threshold=1)
    vocab.build_vocabulary(["a man plays a guitar", "a dog runs on grass"])
    cfg_t = TransformerConfig(d_model=16, num_heads=2, num_layers=1, d_ff=32,
                              max_len=32, visual_dim=V_DIM, audio_dim=A_DIM)
    model = TransformerCaptioning(vocab_size=len(vocab), config=cfg_t)
    params = model.init(jax.random.PRNGKey(0))
    cfg = ServiceConfig(max_batch=2, max_wait_ms=1.0, frame_buckets=BUCKETS,
                        max_caption_len=6, audio_dim=A_DIM, visual_dim=V_DIM)
    reqs = _requests(rng, 3, t_lo=5, t_hi=8)
    with CaptionService(model, params, vocab, cfg) as svc:
        got = [svc.submit(v, a).result(timeout=300) for v, a in reqs]
    for (visual, audio), cap in zip(reqs, got):
        assert cap == _expected(model, params, vocab, visual, audio, cfg)


def test_caption_is_invariant_to_frame_padding(tiny, rng):
    """The property the service's bucketing leans on: with feat_mask set,
    the caption doesn't depend on which bucket the clip was padded to (so a
    request may share a longer batch's t_pad freely)."""
    model, params, vocab = tiny
    for _ in range(5):
        visual = rng.normal(size=(3, V_DIM)).astype(np.float32)
        audio = rng.normal(size=(3, A_DIM)).astype(np.float32)
        caps = {
            _expected(model, params, vocab, visual, audio,
                      ServiceConfig(frame_buckets=(t_pad,), max_caption_len=6,
                                    audio_dim=A_DIM, visual_dim=V_DIM))
            for t_pad in (4, 8, 16)
        }
        assert len(caps) == 1


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    with urllib.request.urlopen(req, timeout=300) as resp:
        return resp.status, json.loads(resp.read())


def test_http_server_roundtrip(tiny, rng):
    model, params, vocab = tiny
    cfg = ServiceConfig(max_batch=3, max_wait_ms=50.0, frame_buckets=BUCKETS,
                        max_caption_len=5, audio_dim=A_DIM, visual_dim=V_DIM)
    reqs = _requests(rng, 3, t_lo=5, t_hi=8)  # single bucket; see above
    with CaptionService(model, params, vocab, cfg) as svc:
        server = make_http_server(svc, port=0)  # ephemeral port
        host, port = server.server_address[:2]
        base = f"http://{host}:{port}"
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            with urllib.request.urlopen(base + "/healthz", timeout=60) as resp:
                assert json.loads(resp.read()) == {"ok": True}

            visual, audio = reqs[0]
            status, body = _post(base + "/caption",
                                 {"visual": visual.tolist(), "audio": audio.tolist()})
            assert status == 200
            assert body["caption"] == _expected(model, params, vocab, visual, audio, cfg)
            assert body["latency_ms"] > 0

            status, body = _post(base + "/caption_batch", {"items": [
                {"visual": v.tolist(), "audio": a.tolist()} for v, a in reqs
            ]})
            assert status == 200
            assert body["captions"] == [
                _expected(model, params, vocab, v, a, cfg) for v, a in reqs
            ]

            with urllib.request.urlopen(base + "/stats", timeout=60) as resp:
                stats = json.loads(resp.read())
            assert stats["requests"] == 4

            # malformed request -> 400, server keeps serving
            with pytest.raises(urllib.error.HTTPError) as ei:
                _post(base + "/caption", {"audio": [[0.0]]})
            assert ei.value.code == 400
            with urllib.request.urlopen(base + "/healthz", timeout=60) as resp:
                assert resp.status == 200
        finally:
            server.shutdown()
            server.server_close()


# ---------------------------------------------------------------- overload
# (round 5: priority classes, bounded-queue eviction, deadlines, routing)

def _blocked_service(monkeypatch, tiny, **cfg_kw):
    """Service whose _launch blocks on an Event — requests pile up in the
    priority queue deterministically."""
    import threading as th

    from mvc_tpu.serving import service as service_mod

    model, params, vocab = tiny
    gate = th.Event()
    real_launch = service_mod.CaptionService._launch

    def gated(self, batch):
        gate.wait(timeout=120)
        return real_launch(self, batch)

    monkeypatch.setattr(service_mod.CaptionService, "_launch", gated)
    cfg = ServiceConfig(max_batch=1, max_wait_ms=1.0, frame_buckets=BUCKETS,
                        max_caption_len=5, audio_dim=A_DIM, visual_dim=V_DIM,
                        pipeline_depth=1, **cfg_kw)
    svc = CaptionService(model, params, vocab, cfg)
    return svc, gate


def test_priority_order_and_eviction(monkeypatch, tiny, rng):
    from mvc_tpu.serving import ServiceOverloaded

    svc, gate = _blocked_service(monkeypatch, tiny, max_queue=2)
    try:
        reqs = _requests(rng, 6, t_lo=4, t_hi=4)
        # r0 is consumed by the (blocked) worker; the queue is empty again
        f0 = svc.submit(*reqs[0])
        import time as _t

        _t.sleep(0.2)
        # fill the bound with two low-priority requests
        f_low1 = svc.submit(*reqs[1], priority=5)
        f_low2 = svc.submit(*reqs[2], priority=5)
        # same-priority arrival: no strictly-lower victim -> rejected
        with pytest.raises(ServiceOverloaded):
            svc.submit(*reqs[3], priority=5)
        # higher-priority arrival evicts the YOUNGEST lowest-priority victim
        f_hi = svc.submit(*reqs[4], priority=0)
        with pytest.raises(ServiceOverloaded):
            f_low2.result(timeout=5)
        st = svc.stats()
        assert st["shed"] == 2 and st["queue_depth"] == 2
        gate.set()
        # everything still queued completes; priority 0 bypassed priority 5
        assert isinstance(f_hi.result(timeout=120), str)
        assert isinstance(f_low1.result(timeout=120), str)
        assert isinstance(f0.result(timeout=120), str)
    finally:
        gate.set()
        svc.close()


def test_priority_classes_are_served_in_order(monkeypatch, tiny, rng):
    svc, gate = _blocked_service(monkeypatch, tiny)
    try:
        reqs = _requests(rng, 4, t_lo=4, t_hi=4)
        svc.submit(*reqs[0])                      # absorbed by blocked worker
        import time as _t

        _t.sleep(0.2)
        done = []
        futs = {}
        for name, prio, r in (("p3", 3, reqs[1]), ("p1", 1, reqs[2]),
                              ("p2", 2, reqs[3])):
            f = svc.submit(*r, priority=prio)
            f.add_done_callback(lambda _f, n=name: done.append(n))
            futs[name] = f
        gate.set()
        for f in futs.values():
            f.result(timeout=120)
        assert done == ["p1", "p2", "p3"]
    finally:
        gate.set()
        svc.close()


def test_deadline_expiry(monkeypatch, tiny, rng):
    from mvc_tpu.serving import DeadlineExceeded

    svc, gate = _blocked_service(monkeypatch, tiny)
    try:
        reqs = _requests(rng, 2, t_lo=4, t_hi=4)
        svc.submit(*reqs[0])                      # absorbed by blocked worker
        import time as _t

        _t.sleep(0.2)
        f = svc.submit(*reqs[1], deadline_ms=30.0)
        _t.sleep(0.2)                             # let the deadline elapse
        gate.set()
        with pytest.raises(DeadlineExceeded):
            f.result(timeout=120)
        assert svc.stats()["deadline_expired"] == 1
    finally:
        gate.set()
        svc.close()


def test_router_routes_and_http_overload_codes(tiny, rng):
    from mvc_tpu.serving import CaptionRouter

    model, params, vocab = tiny
    cfg = ServiceConfig(max_batch=2, max_wait_ms=20.0, frame_buckets=BUCKETS,
                        max_caption_len=5, audio_dim=A_DIM, visual_dim=V_DIM)
    # a second model variant: same family, different init -> the router must
    # genuinely dispatch (captions generally differ between the two)
    model2 = AVCaptioningDual(vocab_size=len(vocab), reconstructor_type="none",
                              visual_decoder_config=TINY_V,
                              audio_decoder_config=TINY_A)
    params2 = model2.init(jax.random.PRNGKey(42))
    # the overloadable variant: zero-capacity queue -> every request that
    # can't preempt is shed
    cfg_full = ServiceConfig(max_batch=1, max_wait_ms=1.0, frame_buckets=BUCKETS,
                             max_caption_len=5, audio_dim=A_DIM,
                             visual_dim=V_DIM, max_queue=0)
    router = CaptionRouter({
        "rnn": CaptionService(model, params, vocab, cfg),
        "rnn_b": CaptionService(model2, params2, vocab, cfg),
        "tiny_queue": CaptionService(model, params, vocab, cfg_full),
    }, default="rnn")
    visual, audio = _requests(rng, 1, t_lo=4, t_hi=4)[0]
    with router:
        exp_a = _expected(model, params, vocab, visual, audio, cfg)
        exp_b = _expected(model2, params2, vocab, visual, audio, cfg)
        assert router.caption(visual, audio) == exp_a            # default
        assert router.caption(visual, audio, model="rnn_b") == exp_b
        with pytest.raises(KeyError):
            router.submit(visual, audio, model="nope")
        st = router.stats()
        assert set(st["models"]) == {"rnn", "rnn_b", "tiny_queue"}
        assert st["default"] == "rnn"

        server = make_http_server(router, port=0)
        host, port = server.server_address[:2]
        base = f"http://{host}:{port}"
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            status, body = _post(base + "/caption", {
                "visual": visual.tolist(), "audio": audio.tolist(),
                "model": "rnn_b", "priority": 1})
            assert status == 200 and body["caption"] == exp_b

            with pytest.raises(urllib.error.HTTPError) as ei:
                _post(base + "/caption", {"visual": visual.tolist(),
                                          "model": "nope"})
            assert ei.value.code == 404

            # the zero-capacity service sheds whatever cannot launch
            # immediately: saturate it and expect at least one 503
            codes = []

            def hit():
                try:
                    codes.append(_post(base + "/caption", {
                        "visual": visual.tolist(), "model": "tiny_queue"})[0])
                except urllib.error.HTTPError as e:
                    codes.append(e.code)

            threads = [threading.Thread(target=hit) for _ in range(6)]
            for th_ in threads:
                th_.start()
            for th_ in threads:
                th_.join(timeout=120)
            assert 503 in codes or all(c == 200 for c in codes)
            # (all-200 is possible only if the worker kept up; with
            # max_queue=0 and 6 concurrent posts that is effectively
            # impossible — keep the assert robust to a miracle scheduler)
            with urllib.request.urlopen(base + "/healthz", timeout=60) as resp:
                assert resp.status == 200
        finally:
            server.shutdown()
            server.server_close()
