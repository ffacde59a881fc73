"""int8 weight-only decode (ops/quant.py): a library-level capability whose
measured TPU speedup is ~1.0x (XLA hoists the loop-invariant dequant out of
the scan — PARITY.md / BENCH_NOTES round 3), so no CLI exposes it.  Training
and default eval never see quantized params; these tests pin dequant math,
decode correctness under well-conditioned decisions, and the
Pallas-dispatch fallback."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvc_tpu.config import EOS_ID
from mvc_tpu.models import AVCaptioning, AVCaptioningDual
from mvc_tpu.ops import quant


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_quantize_dequantize_error_bound(rng):
    w = rng.normal(size=(64, 48)).astype(np.float32) * rng.uniform(0.1, 10, size=(1, 48)).astype(np.float32)
    qd = quant.quantize_weight(jnp.asarray(w))
    assert qd["q"].dtype == jnp.int8
    back = np.asarray(quant.wmat(qd, jnp.float32))
    # symmetric per-channel: error <= scale/2 = amax/254 per element
    bound = np.abs(w).max(axis=0, keepdims=True) / 254.0 + 1e-8
    assert (np.abs(back - w) <= bound).all()
    # plain arrays pass through
    np.testing.assert_array_equal(np.asarray(quant.wmat(jnp.asarray(w), jnp.float32)), w)


def test_quantize_zero_column_safe():
    w = jnp.zeros((8, 4), jnp.float32)
    qd = quant.quantize_weight(w)
    assert np.isfinite(np.asarray(qd["s"])).all()
    np.testing.assert_array_equal(np.asarray(quant.wmat(qd, jnp.float32)), np.zeros((8, 4)))


def _well_conditioned_params(model, key, bias_gain=8.0):
    """Init + a strong deterministic vocab-bias pattern so greedy/beam token
    decisions have gaps far above the int8 perturbation (the same
    conditioning argument as hardware bitwise parity, CLAUDE.md)."""
    params = model.init(key)
    for name in ("decoder", "v_decoder", "a_decoder"):
        if name in params:
            b = params[name]["out"]["b"]
            V = b.shape[0]
            pattern = jnp.sin(jnp.arange(V, dtype=jnp.float32) * 0.7) * bias_gain
            pattern = pattern.at[EOS_ID].set(-bias_gain)  # keep captions running
            params[name]["out"] = dict(params[name]["out"], b=pattern)
    return params


@pytest.mark.parametrize("mode", ["direct", "beam"])
def test_int8_decode_token_parity_when_conditioned(mode):
    model = AVCaptioningDual(vocab_size=120, reconstructor_type="none")
    params = _well_conditioned_params(model, jax.random.PRNGKey(0))
    qparams = quant.quantize_model_params(params)

    gen = np.random.default_rng(1)
    audio = jnp.asarray(gen.normal(size=(4, 6, 128)).astype(np.float32))
    visual = jnp.asarray(gen.normal(size=(4, 6, 2048)).astype(np.float32))

    ref = np.asarray(model.predict_tokens(params, audio, visual, max_caption_len=8, mode=mode, beam_width=3))
    got = np.asarray(model.predict_tokens(qparams, audio, visual, max_caption_len=8, mode=mode, beam_width=3))
    assert got.shape == ref.shape
    np.testing.assert_array_equal(got, ref)


def test_int8_single_model_and_jit():
    model = AVCaptioning(vocab_size=90, reconstructor_type="none")
    params = _well_conditioned_params(model, jax.random.PRNGKey(2))
    qparams = quant.quantize_model_params(params)
    gen = np.random.default_rng(3)
    audio = jnp.asarray(gen.normal(size=(3, 5, 128)).astype(np.float32))
    visual = jnp.asarray(gen.normal(size=(3, 5, 2048)).astype(np.float32))
    fn = jax.jit(lambda p, a, v: model.predict_tokens(p, a, v, max_caption_len=6))
    ref = np.asarray(fn(params, audio, visual))
    got = np.asarray(fn(qparams, audio, visual))
    np.testing.assert_array_equal(got, ref)


def test_quantized_params_skip_pallas_dispatch(monkeypatch):
    """MVC_PALLAS on + quantized params must fall back to the XLA scan (the
    fused kernels stream plain tiles), still producing correct tokens."""
    from mvc_tpu.ops import dispatch

    model = AVCaptioningDual(vocab_size=120, reconstructor_type="none")
    params = _well_conditioned_params(model, jax.random.PRNGKey(0))
    qparams = quant.quantize_model_params(params)
    gen = np.random.default_rng(1)
    audio = jnp.asarray(gen.normal(size=(4, 6, 128)).astype(np.float32))
    visual = jnp.asarray(gen.normal(size=(4, 6, 2048)).astype(np.float32))
    ref = np.asarray(model.predict_tokens(params, audio, visual, max_caption_len=8, mode="beam", beam_width=3))

    monkeypatch.setenv("MVC_PALLAS_INTERPRET", "1")
    dispatch.enable_pallas(True)
    try:
        calls = []
        import mvc_tpu.ops.pallas_beam as pb

        orig = pb.beam_decode_pallas

        def spy(*a, **kw):
            calls.append(1)
            return orig(*a, **kw)

        monkeypatch.setattr(pb, "beam_decode_pallas", spy)
        got = np.asarray(model.predict_tokens(
            qparams, audio, visual, max_caption_len=8, mode="beam", beam_width=3
        ))
    finally:
        dispatch.enable_pallas(False)
    assert not calls, "quantized params must not reach the Pallas kernel"
    np.testing.assert_array_equal(got, ref)
