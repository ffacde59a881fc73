"""Pallas fused kernels composed with the device mesh (ops/sharded.py):
token parity of the shard_map-dispatched kernels vs the unsharded XLA scan
on the 8-virtual-device CPU mesh, interpret mode, through the FULL dispatch
path (MVC_PALLAS=1 + MVC_PALLAS_INTERPRET=1 + an active mesh) — the
composition VERDICT r2 flagged as never exercised."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from mvc_tpu.config import DecoderConfig
from mvc_tpu.ops import dispatch, sharded
from mvc_tpu.parallel import make_mesh, param_shardings


def _tiny_dual(vocab=32):
    from mvc_tpu.models import AVCaptioningDual

    v_cfg = DecoderConfig(in_feature_size=24, rnn_hidden_size=16,
                          embedding_size=8, attn_size=8, output_size=vocab)
    a_cfg = DecoderConfig(in_feature_size=8, rnn_hidden_size=16,
                          embedding_size=8, attn_size=8, output_size=vocab)
    return AVCaptioningDual(vocab_size=vocab, visual_decoder_config=v_cfg,
                            audio_decoder_config=a_cfg)


def _tiny_single(vocab=32):
    from mvc_tpu.models import AVCaptioning

    cfg = DecoderConfig(in_feature_size=32, rnn_hidden_size=16,
                        embedding_size=8, attn_size=8, output_size=vocab)
    return AVCaptioning(vocab_size=vocab, decoder_config=cfg)


def _inputs(rng, B, T):
    audio = jnp.asarray(rng.normal(size=(B, T, 8)).astype(np.float32))
    visual = jnp.asarray(rng.normal(size=(B, T, 24)).astype(np.float32))
    mask = np.ones((B, T), bool)
    mask[1, T - 1:] = False
    return audio, visual, jnp.asarray(mask)


@pytest.fixture
def pallas_mesh(monkeypatch):
    """dp=4 x tp=2 mesh with the Pallas dispatch fully enabled (interpret)."""
    monkeypatch.setenv("MVC_PALLAS", "1")
    monkeypatch.setenv("MVC_PALLAS_INTERPRET", "1")
    mesh = make_mesh(dp=4, tp=2)
    dispatch.set_mesh(mesh)
    yield mesh
    dispatch.set_mesh(None)


def _spy_sharded(monkeypatch):
    calls = []
    orig = sharded.sharded_decode

    def spy(mesh, axes, kernel, params, feats_list, feat_mask):
        calls.append(axes)
        return orig(mesh, axes, kernel, params, feats_list, feat_mask)

    monkeypatch.setattr(sharded, "sharded_decode", spy)
    return calls


def test_batch_axes_rules():
    mesh = make_mesh(dp=4, tp=2)
    assert sharded.batch_axes(None, 64) == ()
    assert sharded.batch_axes(mesh, 16) == ("dp", "tp")    # divides mesh.size
    assert sharded.batch_axes(mesh, 4) == ("dp",)          # divides dp only
    assert sharded.batch_axes(mesh, 6) is None             # divides neither
    assert sharded.axes_size(mesh, ("dp", "tp")) == 8
    assert sharded.axes_size(mesh, ("dp",)) == 4
    assert sharded.axes_size(mesh, ()) == 1


def test_sharded_dual_beam_token_parity(rng, pallas_mesh, monkeypatch):
    """--pallas + dp=4/tp=2 mesh: the fused joint beam shards over every
    mesh axis and reproduces the XLA scan's tokens exactly (f32 weights,
    interpret mode), with tp-sharded vocab tables on the way in."""
    calls = _spy_sharded(monkeypatch)
    model = _tiny_dual()
    params = model.init(jax.random.PRNGKey(1))
    B, T, L, W = 8, 4, 7, 3
    audio, visual, mask = _inputs(rng, B, T)

    dispatch.set_mesh(None)                      # XLA reference, no mesh
    monkeypatch.setenv("MVC_PALLAS", "0")
    ref = np.asarray(model.predict_tokens(
        params, audio, visual, max_caption_len=L, mode="beam",
        beam_width=W, feat_mask=mask,
    ))
    monkeypatch.setenv("MVC_PALLAS", "1")
    dispatch.set_mesh(pallas_mesh)

    bsh = NamedSharding(pallas_mesh, P("dp"))
    a = jax.device_put(audio, bsh)
    v = jax.device_put(visual, bsh)
    m = jax.device_put(mask, bsh)
    p = jax.device_put(params, param_shardings(pallas_mesh, params))  # tp-sharded vocab

    predict = jax.jit(lambda p, a, v, m: model.predict_tokens(
        p, a, v, max_caption_len=L, mode="beam", beam_width=W, feat_mask=m,
    ))
    tok = np.asarray(predict(p, a, v, m))
    np.testing.assert_array_equal(tok, ref)
    assert calls == [("dp", "tp")], f"kernel did not shard: {calls}"


def test_sharded_single_greedy_and_beam_token_parity(rng, pallas_mesh, monkeypatch):
    calls = _spy_sharded(monkeypatch)
    model = _tiny_single()
    params = model.init(jax.random.PRNGKey(2))
    B, T, L = 8, 4, 7
    audio, visual, mask = _inputs(rng, B, T)

    dispatch.set_mesh(None)
    monkeypatch.setenv("MVC_PALLAS", "0")
    ref_g = np.asarray(model.predict_tokens(
        params, audio, visual, max_caption_len=L, mode="direct", feat_mask=mask))
    ref_b = np.asarray(model.predict_tokens(
        params, audio, visual, max_caption_len=L, mode="beam",
        beam_width=3, feat_mask=mask))
    monkeypatch.setenv("MVC_PALLAS", "1")
    dispatch.set_mesh(pallas_mesh)

    bsh = NamedSharding(pallas_mesh, P("dp"))
    a, v, m = (jax.device_put(x, bsh) for x in (audio, visual, mask))
    p = jax.device_put(params, NamedSharding(pallas_mesh, P()))

    tok_g = np.asarray(jax.jit(lambda p, a, v, m: model.predict_tokens(
        p, a, v, max_caption_len=L, mode="direct", feat_mask=m))(p, a, v, m))
    tok_b = np.asarray(jax.jit(lambda p, a, v, m: model.predict_tokens(
        p, a, v, max_caption_len=L, mode="beam", beam_width=3, feat_mask=m))(p, a, v, m))
    np.testing.assert_array_equal(tok_g, ref_g)
    np.testing.assert_array_equal(tok_b, ref_b)
    assert calls == [("dp", "tp"), ("dp", "tp")], calls


def test_sharded_dual_greedy_token_parity(rng, pallas_mesh, monkeypatch):
    calls = _spy_sharded(monkeypatch)
    model = _tiny_dual()
    params = model.init(jax.random.PRNGKey(3))
    B, T, L = 4, 4, 7                            # divides dp=4 but not size=8
    audio, visual, mask = _inputs(rng, B, T)

    dispatch.set_mesh(None)
    monkeypatch.setenv("MVC_PALLAS", "0")
    ref = np.asarray(model.predict_tokens(
        params, audio, visual, max_caption_len=L, mode="direct", feat_mask=mask))
    monkeypatch.setenv("MVC_PALLAS", "1")
    dispatch.set_mesh(pallas_mesh)

    bsh = NamedSharding(pallas_mesh, P("dp"))
    a, v, m = (jax.device_put(x, bsh) for x in (audio, visual, mask))
    p = jax.device_put(params, NamedSharding(pallas_mesh, P()))
    tok = np.asarray(jax.jit(lambda p, a, v, m: model.predict_tokens(
        p, a, v, max_caption_len=L, mode="direct", feat_mask=m))(p, a, v, m))
    np.testing.assert_array_equal(tok, ref)
    assert calls == [("dp",)], f"expected dp-only sharding: {calls}"


def test_indivisible_batch_falls_back_to_xla(rng, pallas_mesh, monkeypatch):
    """B=6 divides neither mesh.size=8 nor dp=4: the dispatch must take the
    XLA scan (GSPMD handles the sharded inputs), never replicate the kernel."""
    calls = _spy_sharded(monkeypatch)
    model = _tiny_dual()
    params = model.init(jax.random.PRNGKey(4))
    B, T, L = 6, 4, 7
    audio, visual, mask = _inputs(rng, B, T)

    dispatch.set_mesh(None)
    monkeypatch.setenv("MVC_PALLAS", "0")
    ref = np.asarray(model.predict_tokens(
        params, audio, visual, max_caption_len=L, mode="beam",
        beam_width=3, feat_mask=mask))
    monkeypatch.setenv("MVC_PALLAS", "1")
    dispatch.set_mesh(pallas_mesh)

    tok = np.asarray(jax.jit(lambda p, a, v, m: model.predict_tokens(
        p, a, v, max_caption_len=L, mode="beam", beam_width=3, feat_mask=m,
    ))(params, audio, visual, mask))
    np.testing.assert_array_equal(tok, ref)
    assert calls == [], f"kernel must not run on an indivisible batch: {calls}"
