"""Data-parallel correctness: one optimizer step over an 8-way dp mesh must
produce the same updated parameters as the same step on a single device —
the comms layer (XLA-inserted all-reduce) changes nothing numerically."""

import numpy as np
import jax
import jax.numpy as jnp

from mvc_tpu.config import DecoderConfig, SOS_ID, TrainerConfig
from mvc_tpu.models.captioning import AVCaptioningDual
from mvc_tpu.parallel import make_mesh, param_shardings
from mvc_tpu.parallel.mesh import shard_batch
from mvc_tpu.training.losses import ModalityWiseReconstructionLossBuilder
from mvc_tpu.training.optimizer import make_optimizer

V = 19
V_CFG = DecoderConfig(in_feature_size=12, rnn_hidden_size=8, embedding_size=6, attn_size=4)
A_CFG = DecoderConfig(in_feature_size=6, rnn_hidden_size=8, embedding_size=6, attn_size=4)


def test_dp8_step_equals_single_device(rng):
    model = AVCaptioningDual(
        vocab_size=V, teacher_forcing_ratio=1.0, reconstructor_type="global",
        visual_decoder_config=V_CFG, audio_decoder_config=A_CFG,
    )
    params = model.init(jax.random.PRNGKey(0))
    cfg = TrainerConfig()
    optimizer = make_optimizer(cfg)
    loss_fn = ModalityWiseReconstructionLossBuilder(0.001, 0.1, 0.1, rec_type="global")

    B, T, L = 16, 4, 6
    audio = rng.normal(size=(B, T, 6)).astype(np.float32)
    visual = rng.normal(size=(B, T, 12)).astype(np.float32)
    captions = rng.integers(3, V, size=(L, B)).astype(np.int32)
    captions[0] = SOS_ID
    mask = np.ones((B, T), bool)

    def train_step(params, opt_state, batch, rng_key):
        def loss_of(p):
            out, ar, vr = model.forward(
                p, batch["audio"], batch["visual"], batch["captions"],
                rng=rng_key, feat_mask=batch["feat_mask"],
            )
            return loss_fn(out, batch["captions"], batch["audio"], ar,
                           batch["visual"], vr, feat_mask=batch["feat_mask"])[0]

        loss, grads = jax.value_and_grad(loss_of)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return jax.tree.map(lambda p, u: p + u, params, updates), loss

    key = jax.random.PRNGKey(3)

    # single device
    opt_state = optimizer.init(params)
    batch1 = {"audio": jnp.asarray(audio), "visual": jnp.asarray(visual),
              "captions": jnp.asarray(captions), "feat_mask": jnp.asarray(mask)}
    p1, loss1 = jax.jit(train_step)(params, opt_state, batch1, key)

    # 8-way dp mesh
    mesh = make_mesh(dp=8, tp=1)
    p_sh = jax.device_put(params, param_shardings(mesh, params))
    opt_state8 = optimizer.init(p_sh)
    batch8 = shard_batch(mesh, {"audio": audio, "visual": visual,
                                "captions": captions, "feat_mask": mask})
    p8, loss8 = jax.jit(train_step)(p_sh, opt_state8, batch8, key)

    np.testing.assert_allclose(float(loss1), float(loss8), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6)


def test_dp_tp_step_equals_single_device(rng):
    """Same check with a 4x2 (dp, tp) mesh — vocab-dim tensor parallelism
    included."""
    model = AVCaptioningDual(
        vocab_size=V + 1,  # even vocab splits over tp=2... (20)
        teacher_forcing_ratio=1.0, reconstructor_type="none",
        visual_decoder_config=V_CFG, audio_decoder_config=A_CFG,
    )
    params = model.init(jax.random.PRNGKey(1))
    cfg = TrainerConfig()
    optimizer = make_optimizer(cfg)
    loss_fn = ModalityWiseReconstructionLossBuilder(0.001, 0.0, 0.0, rec_type="none")

    B, T, L = 8, 3, 5
    audio = rng.normal(size=(B, T, 6)).astype(np.float32)
    visual = rng.normal(size=(B, T, 12)).astype(np.float32)
    captions = rng.integers(3, V, size=(L, B)).astype(np.int32)
    captions[0] = SOS_ID
    mask = np.ones((B, T), bool)

    def train_step(params, opt_state, batch, rng_key):
        def loss_of(p):
            out, _, _ = model.forward(
                p, batch["audio"], batch["visual"], batch["captions"],
                rng=rng_key, feat_mask=batch["feat_mask"],
            )
            return loss_fn(out, batch["captions"])[0]

        loss, grads = jax.value_and_grad(loss_of)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return jax.tree.map(lambda p, u: p + u, params, updates), loss

    key = jax.random.PRNGKey(4)
    opt_state = optimizer.init(params)
    batch1 = {"audio": jnp.asarray(audio), "visual": jnp.asarray(visual),
              "captions": jnp.asarray(captions), "feat_mask": jnp.asarray(mask)}
    p1, loss1 = jax.jit(train_step)(params, opt_state, batch1, key)

    mesh = make_mesh(dp=4, tp=2)
    p_sh = jax.device_put(params, param_shardings(mesh, params))
    opt_state_m = optimizer.init(p_sh)
    batch_m = shard_batch(mesh, {"audio": audio, "visual": visual,
                                 "captions": captions, "feat_mask": mask})
    pm, loss_m = jax.jit(train_step)(p_sh, opt_state_m, batch_m, key)

    np.testing.assert_allclose(float(loss1), float(loss_m), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(pm)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6)
