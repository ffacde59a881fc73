"""Training objective: NLL + entropy regularizer + MSE reconstruction.

Pure-function equivalents of the reference's losses (reference src/losses.py):

- cross-entropy = NLL over already-log-softmaxed outputs, positions [1:],
  PAD ignored (reference src/losses.py:50-52,112)
- entropy regularizer, PAD-masked, summed over words / meaned over batch
  (reference src/losses.py:12-17).  NOTE: the reference computes its
  softmax over the *batch* axis (``dim=1`` on an [L,B,V] tensor —
  src/losses.py:13), which is almost certainly a transposition bug.  We
  default to the entropy of the word distribution (vocab axis); pass
  ``compat_batch_axis=True`` to reproduce the reference bit-for-bit.
  Documented in PARITY.md.
- global reconstruction loss: MSE between the time-mean of the input features
  and the caption-masked mean of the reconstructions; the keep-mask is
  ``captions != PAD`` (EOS *included*, unlike the reconstructor's own mask —
  reference src/losses.py:20-36,61,104)
- local reconstruction loss: plain MSE (reference src/losses.py:39-40)

Static-shape addition: every function takes an optional ``feat_mask`` so that
zero-padded frames can be excluded from feature means/MSE.  With
``feat_mask=None`` the math matches the reference's padded-batch behavior
exactly (padding participates, as it does under torch pad_sequence).

Second static-shape addition: ``sample_mask`` ([B] bool, True on real rows)
excludes BATCH-padding rows (bucketed collators pad every partial batch;
``pad_batch_to_multiple`` pads for the dp mesh axis).  The reference never
batch-pads, so exact parity with it on a partial batch requires dropping the
padded rows from every batch-mean: without the mask the entropy and global-
reconstruction terms are diluted by ``n_real/B`` and the local-reconstruction
MSE is contaminated by the reconstructor's output on the zero rows.  With
``sample_mask=None`` (or all-True) the math is the reference's.  NLL needs no
mask: padded rows are all-PAD and self-exclude (tests/test_losses.py).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from mvc_tpu.config import PAD_ID


def nll_loss(outputs: jnp.ndarray, captions: jnp.ndarray) -> jnp.ndarray:
    """Mean NLL of gold tokens over non-PAD positions [1:].

    outputs: [L, B, V] log-probs; captions: [L, B] int.
    (reference src/losses.py:50-52 — F.nll_loss(ignore_index=PAD))."""
    logp = outputs[1:]
    gold = captions[1:]
    picked = jnp.take_along_axis(logp, gold[:, :, None], axis=2)[:, :, 0]
    mask = (gold != PAD_ID).astype(logp.dtype)
    return -(picked * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def entropy_loss(
    outputs_tail: jnp.ndarray,      # [L-1, B, V] log-probs (outputs[1:])
    ignore_mask: jnp.ndarray,       # [L-1, B] bool, True = ignore (PAD)
    compat_batch_axis: bool = False,
    sample_mask: Optional[jnp.ndarray] = None,   # [B] bool, True = real row
) -> jnp.ndarray:
    """-sum_words mean_batch sum_vocab p*log p (reference src/losses.py:12-17).
    The batch mean runs over real rows only when ``sample_mask`` is given."""
    x = outputs_tail
    axis = 1 if compat_batch_axis else 2
    logp = jax.nn.log_softmax(x, axis=axis)
    p = jnp.exp(logp)
    b = (p * logp).sum(axis=2)
    b = jnp.where(ignore_mask, 0.0, b)
    per_row = b.sum(axis=0)
    if sample_mask is None:
        return -1.0 * per_row.mean()
    sm = sample_mask.astype(per_row.dtype)
    return -1.0 * (per_row * sm).sum() / jnp.maximum(sm.sum(), 1.0)


def _masked_time_mean(x: jnp.ndarray, feat_mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """[B, T, F] -> [B, F] mean over real frames (all frames when no mask)."""
    if feat_mask is None:
        return x.mean(axis=1)
    m = feat_mask.astype(x.dtype)[:, :, None]
    return (x * m).sum(axis=1) / jnp.maximum(m.sum(axis=1), 1.0)


def global_reconstruction_loss(
    features: jnp.ndarray,          # [B, T, F]
    recons: jnp.ndarray,            # [B, L, F]
    keep_mask: jnp.ndarray,         # [L, B] bool (captions != PAD)
    feat_mask: Optional[jnp.ndarray] = None,
    sample_mask: Optional[jnp.ndarray] = None,   # [B] bool, True = real row
) -> jnp.ndarray:
    """(reference src/losses.py:20-36)."""
    x = _masked_time_mean(features, feat_mask)                       # [B, F]
    m = keep_mask.T.astype(recons.dtype)[:, :, None]                 # [B, L, 1]
    caption_len = keep_mask.sum(axis=0).astype(recons.dtype)[:, None]
    x_recon = (recons * m).sum(axis=1) / jnp.maximum(caption_len, 1.0)
    sq = (x - x_recon) ** 2
    if sample_mask is None:
        return jnp.mean(sq)
    sm = sample_mask.astype(sq.dtype)[:, None]
    return (sq * sm).sum() / jnp.maximum(sm.sum() * sq.shape[1], 1.0)


def local_reconstruction_loss(
    features: jnp.ndarray,          # [B, T, F]
    recons: jnp.ndarray,            # [B, T, F]
    feat_mask: Optional[jnp.ndarray] = None,
    sample_mask: Optional[jnp.ndarray] = None,   # [B] bool, True = real row
) -> jnp.ndarray:
    """Plain MSE (reference src/losses.py:39-40); masked variants average
    only over real frames / real rows."""
    if feat_mask is None and sample_mask is None:
        return jnp.mean((features - recons) ** 2)
    if feat_mask is None:
        m = jnp.broadcast_to(
            sample_mask.astype(features.dtype)[:, None, None], features.shape[:2] + (1,)
        )
    else:
        m = feat_mask.astype(features.dtype)[:, :, None]
        if sample_mask is not None:
            m = m * sample_mask.astype(features.dtype)[:, None, None]
    sq = ((features - recons) ** 2) * m
    return sq.sum() / jnp.maximum(m.sum() * features.shape[2], 1.0)


def _single_reconstruction_loss(
    captions, features, recons, rec_type: str, feat_mask=None, sample_mask=None
) -> jnp.ndarray:
    if recons is None or rec_type not in ("global", "local"):
        return jnp.zeros(())
    if rec_type == "global":
        return global_reconstruction_loss(
            features, recons, keep_mask=(captions != PAD_ID),
            feat_mask=feat_mask, sample_mask=sample_mask,
        )
    return local_reconstruction_loss(
        features, recons, feat_mask=feat_mask, sample_mask=sample_mask
    )


def total_reconstruction_loss(
    outputs: jnp.ndarray,
    captions: jnp.ndarray,
    features: Optional[jnp.ndarray] = None,
    features_recons: Optional[jnp.ndarray] = None,
    reg_lambda: float = 0.0,
    recon_lambda: float = 0.0,
    reconstruction_type: str = "global",
    feat_mask: Optional[jnp.ndarray] = None,
    compat_batch_axis_entropy: bool = False,
    sample_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Single-feature path (reference src/losses.py:43-69).
    Returns (loss, ce, entropy, recon)."""
    ce = nll_loss(outputs, captions)
    ent = entropy_loss(outputs[1:], captions[1:] == PAD_ID,
                       compat_batch_axis_entropy, sample_mask=sample_mask)
    rec = _single_reconstruction_loss(
        captions, features, features_recons, reconstruction_type, feat_mask,
        sample_mask,
    )
    loss = ce + reg_lambda * ent + recon_lambda * rec
    return loss, ce, ent, rec


def modality_wise_reconstruction_loss(
    outputs: jnp.ndarray,
    captions: jnp.ndarray,
    audio_features: Optional[jnp.ndarray] = None,
    audio_features_recons: Optional[jnp.ndarray] = None,
    visual_features: Optional[jnp.ndarray] = None,
    visual_features_recons: Optional[jnp.ndarray] = None,
    reg_lambda: float = 0.0,
    audio_recon_lambda: float = 0.0,
    visual_recon_lambda: float = 0.0,
    rec_type: str = "none",
    feat_mask: Optional[jnp.ndarray] = None,
    compat_batch_axis_entropy: bool = False,
    sample_mask: Optional[jnp.ndarray] = None,
):
    """Dual-modality loss (reference src/losses.py:86-126).
    Returns (loss, ce, entropy, audio_recon, visual_recon)."""
    ce = nll_loss(outputs, captions)
    ent = entropy_loss(outputs[1:], captions[1:] == PAD_ID,
                       compat_batch_axis_entropy, sample_mask=sample_mask)
    a_rec = _single_reconstruction_loss(
        captions, audio_features, audio_features_recons, rec_type, feat_mask,
        sample_mask,
    )
    v_rec = _single_reconstruction_loss(
        captions, visual_features, visual_features_recons, rec_type, feat_mask,
        sample_mask,
    )
    loss = ce + reg_lambda * ent + audio_recon_lambda * a_rec + visual_recon_lambda * v_rec
    return loss, ce, ent, a_rec, v_rec


def ModalityWiseReconstructionLossBuilder(
    reg_lambda: float,
    audio_recon_lambda: float,
    visual_recon_lambda: float,
    rec_type: str = "none",
    compat_batch_axis_entropy: bool = False,
):
    """Partial application mirroring the reference's builder API
    (reference src/losses.py:129-137)."""
    assert rec_type in ("none", "global", "local"), (
        "Wrong mode specified, must be one of ['none', 'global', 'local']"
    )
    return partial(
        modality_wise_reconstruction_loss,
        reg_lambda=reg_lambda,
        audio_recon_lambda=audio_recon_lambda,
        visual_recon_lambda=visual_recon_lambda,
        rec_type=rec_type,
        compat_batch_axis_entropy=compat_batch_axis_entropy,
    )
