"""Fused chunked-vocab CE + entropy (training/fused_loss.py) vs the
materializing losses.py path: values AND gradients must agree to float
precision, for single- and dual-stream forms, PAD patterns, sample masks,
bf16 compute, and non-dividing vocab tile sizes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvc_tpu.config import PAD_ID, TrainerConfig
from mvc_tpu.training import losses as loss_lib
from mvc_tpu.training.fused_loss import ce_entropy_from_hiddens


def _mk_stream(rng, L, B, H, V, scale=0.1):
    h = jnp.asarray(rng.normal(size=(L, B, H)).astype(np.float32)).at[0].set(0.0)
    return h, {
        "w": jnp.asarray(rng.normal(size=(H, V)).astype(np.float32)) * scale,
        "b": jnp.asarray(rng.normal(size=(V,)).astype(np.float32)) * scale,
    }


def _mk_captions(rng, L, B, V):
    caps = rng.integers(3, V, size=(L, B)).astype(np.int32)
    caps[0] = 1
    caps[L // 2:, : B // 3] = PAD_ID          # ragged PAD tails
    return jnp.asarray(caps)


def _materialized(h_list, outs, caps, sample_mask, cdtype):
    outputs = sum(
        jax.nn.log_softmax(
            (h.astype(cdtype) @ o["w"].astype(cdtype)
             + o["b"].astype(cdtype)).astype(jnp.float32), axis=-1)
        for h, o in zip(h_list, outs)
    )
    outputs = outputs.at[0].set(0.0)
    ce = loss_lib.nll_loss(outputs, caps)
    ent = loss_lib.entropy_loss(outputs[1:], caps[1:] == PAD_ID,
                                sample_mask=sample_mask)
    return ce, ent


@pytest.mark.parametrize("n_streams", [1, 2])
@pytest.mark.parametrize("use_sm", [False, True])
@pytest.mark.parametrize("tile_v", [128, 192, 512])
def test_values_match(n_streams, use_sm, tile_v):
    rng = np.random.default_rng(0)
    L, B, V = 7, 12, 450                     # V=450 exercises the padded tile
    hs, outs = zip(*[_mk_stream(rng, L, B, 48 + 16 * d, V)
                     for d in range(n_streams)])
    caps = _mk_captions(rng, L, B, V)
    sm = jnp.asarray(rng.random(B) > 0.25) if use_sm else None

    ce_r, ent_r = _materialized(hs, outs, caps, sm, jnp.float32)
    ce_f, ent_f = ce_entropy_from_hiddens(
        hs, outs, caps, sample_mask=sm, compute_dtype=jnp.float32, tile_v=tile_v)
    np.testing.assert_allclose(ce_f, ce_r, rtol=2e-6, atol=2e-6)
    np.testing.assert_allclose(ent_f, ent_r, rtol=2e-6, atol=2e-6)


@pytest.mark.parametrize("n_streams", [1, 2])
def test_grads_match(n_streams):
    rng = np.random.default_rng(1)
    L, B, V, lam = 6, 10, 300, 0.3
    hs, outs = zip(*[_mk_stream(rng, L, B, 40, V) for _ in range(n_streams)])
    caps = _mk_captions(rng, L, B, V)
    sm = jnp.asarray(rng.random(B) > 0.3)

    def ref(hs, outs):
        ce, ent = _materialized(hs, outs, caps, sm, jnp.float32)
        return ce + lam * ent

    def fused(hs, outs):
        ce, ent = ce_entropy_from_hiddens(
            hs, outs, caps, sample_mask=sm, compute_dtype=jnp.float32, tile_v=128)
        return ce + lam * ent

    g_r = jax.grad(ref, argnums=(0, 1))(hs, outs)
    g_f = jax.grad(fused, argnums=(0, 1))(hs, outs)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-7),
        g_r, g_f,
    )


def test_bf16_compute_close():
    """bf16 tile GEMMs are column slices of the full bf16 projection —
    identical accumulation per element; only the lse merge order differs."""
    rng = np.random.default_rng(2)
    L, B, V = 6, 8, 300
    hs, outs = zip(*[_mk_stream(rng, L, B, 32, V) for _ in range(2)])
    caps = _mk_captions(rng, L, B, V)
    ce_r, ent_r = _materialized(hs, outs, caps, None, jnp.bfloat16)
    ce_f, ent_f = ce_entropy_from_hiddens(
        hs, outs, caps, compute_dtype=jnp.bfloat16, tile_v=128)
    np.testing.assert_allclose(ce_f, ce_r, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(ent_f, ent_r, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("dual", [True, False])
@pytest.mark.parametrize("tf", [1.0, 0.5])
def test_train_step_parity(dual, tf):
    """Full trainer step: fused_loss=True and False produce the same loss
    trajectory and metrics (the decoder trajectories are identical; the loss
    differs only in float summation order)."""
    from mvc_tpu.models import AVCaptioning, AVCaptioningDual
    from mvc_tpu.training import optimizer as opt_lib
    from mvc_tpu.training.trainer import Trainer

    def run(fused):
        cfg = TrainerConfig(batch_size=6, fused_loss=fused)
        cls = AVCaptioningDual if dual else AVCaptioning
        model = cls(vocab_size=220, reconstructor_type="global",
                    teacher_forcing_ratio=tf, dtype=jnp.float32)
        params = model.init(jax.random.PRNGKey(0))
        tr = Trainer("t", log_dir=None)
        tr._optimizer = opt_lib.make_optimizer(cfg)
        train_step, eval_step = tr._build_train_step(model, cfg)
        opt_state = tr._optimizer.init(params)
        gen = np.random.default_rng(0)
        B, T, L = 6, 5, 6
        sm = np.ones(B, bool)
        sm[-1] = False
        batch = {
            "audio": jnp.asarray(gen.normal(size=(B, T, 128)).astype(np.float32)),
            "visual": jnp.asarray(gen.normal(size=(B, T, 2048)).astype(np.float32)),
            "captions": jnp.asarray(np.concatenate([
                np.full((1, B), 1, np.int32),
                gen.integers(3, 220, size=(L - 1, B), dtype=np.int32)])),
            "feat_mask": jnp.ones((B, T), bool),
            "sample_mask": jnp.asarray(sm),
        }
        ms = []
        for i in range(3):
            params, opt_state, m = train_step(
                params, opt_state, batch, jax.random.fold_in(jax.random.PRNGKey(7), i))
            ms.append(jax.device_get(m))
        ev = jax.device_get(eval_step(params, batch, jax.random.PRNGKey(0)))
        return ms, ev

    ms_f, ev_f = run(True)
    ms_m, ev_m = run(False)
    for a, b in zip(ms_f + [ev_f], ms_m + [ev_m]):
        for k in a:
            np.testing.assert_allclose(a[k], b[k], rtol=5e-4, atol=1e-5,
                                       err_msg=f"metric {k}")


def test_compat_mode_falls_back():
    """compat_batch_axis_entropy must route to the materializing path (the
    fused kernel computes vocab-axis entropy only): with the compat flag on,
    fused_loss=True and False must run the SAME program — bitwise-equal
    metrics — whereas the vocab-axis fused entropy would differ grossly."""
    from mvc_tpu.models import AVCaptioningDual
    from mvc_tpu.training import optimizer as opt_lib
    from mvc_tpu.training.trainer import Trainer

    def step_metrics(fused):
        cfg = TrainerConfig(batch_size=4, fused_loss=fused,
                            compat_batch_axis_entropy=True)
        model = AVCaptioningDual(vocab_size=150, reconstructor_type="none",
                                 teacher_forcing_ratio=1.0)
        params = model.init(jax.random.PRNGKey(0))
        tr = Trainer("t", log_dir=None)
        tr._optimizer = opt_lib.make_optimizer(cfg)
        train_step, _ = tr._build_train_step(model, cfg)
        opt_state = tr._optimizer.init(params)
        gen = np.random.default_rng(0)
        B, T, L = 4, 4, 5
        batch = {
            "audio": jnp.asarray(gen.normal(size=(B, T, 128)).astype(np.float32)),
            "visual": jnp.asarray(gen.normal(size=(B, T, 2048)).astype(np.float32)),
            "captions": jnp.asarray(np.concatenate([
                np.full((1, B), 1, np.int32),
                gen.integers(3, 150, size=(L - 1, B), dtype=np.int32)])),
            "feat_mask": jnp.ones((B, T), bool),
        }
        _, _, m = train_step(params, opt_state, batch, jax.random.PRNGKey(0))
        return jax.device_get(m)

    a, b = step_metrics(True), step_metrics(False)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=f"metric {k}")
