"""Shared pieces of the multi-host bring-up smoke path.

Used by both ``scripts/multihost_worker.py`` (one jax.distributed process)
and tests/test_multihost.py's single-process expectation — the equivalence
check is only meaningful when both sides run literally the same model, loss,
and step, so they import it from here instead of keeping copies in sync.

The reference has no distributed layer (SURVEY.md §2.3); this smoke path is
part of the framework's first-class distributed addition.
"""

from __future__ import annotations

SMOKE_LAMBDAS = dict(reg_lambda=0.0005, audio_recon_lambda=0.00005,
                     visual_recon_lambda=0.5)


def make_smoke_model(vocab_size: int, a_dim: int, v_dim: int):
    """Tiny dual captioner (hidden 16 / emb 8 / attn 6, global recon)."""
    from mvc_tpu.config import DecoderConfig
    from mvc_tpu.models import AVCaptioningDual

    return AVCaptioningDual(
        vocab_size=vocab_size, teacher_forcing_ratio=1.0,
        reconstructor_type="global",
        visual_decoder_config=DecoderConfig(in_feature_size=v_dim,
                                            rnn_hidden_size=16,
                                            embedding_size=8, attn_size=6),
        audio_decoder_config=DecoderConfig(in_feature_size=a_dim,
                                           rnn_hidden_size=16,
                                           embedding_size=8, attn_size=6),
    )


def make_smoke_loss():
    from mvc_tpu.training.losses import ModalityWiseReconstructionLossBuilder

    return ModalityWiseReconstructionLossBuilder(rec_type="global", **SMOKE_LAMBDAS)


def make_smoke_train_step(model, loss_fn, optimizer):
    """Returns step(params, opt_state, batch, rng) ->
    (params, opt_state, loss, grad_norm, param_norm) — the norms are the
    cross-process equivalence observables."""
    import jax
    import jax.numpy as jnp

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

    return train_step
