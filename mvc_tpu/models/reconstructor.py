"""RecNet reconstructors: regenerate the input features from decoder hiddens.

Functional equivalents of the reference's Local/GlobalReconstructor
(reference src/models/reconstructor.py:9-194), with the per-step Python loops
rewritten as ``lax.scan`` and the local reconstructor's attention keys hoisted
out of the scan.

Contracts (1-layer unidirectional, like every reference config):
  decoder_hiddens [L, B, H]   (the decoder's collected h-states)
  caption_mask    [L, B] bool (token != PAD and != EOS; reference
                               build_caption_mask, src/models/reconstructor.py:197-206)
  global output   [B, L, F]   with output[:, 0] == 0
  local  output   [B, T, F]
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from mvc_tpu.config import EOS_ID, PAD_ID, ReconstructorConfig
from mvc_tpu.models import attention as attn
from mvc_tpu.models import rnn


def build_caption_mask(outputs: jnp.ndarray, captions: Optional[jnp.ndarray]) -> jnp.ndarray:
    """[L, B] bool mask — True on real (non-PAD, non-EOS) tokens.  Falls back
    to the argmax of the decoder outputs when no gold captions are given
    (reference src/models/reconstructor.py:197-206)."""
    if captions is None:
        captions = jnp.argmax(outputs, axis=2)
    return (captions != PAD_ID) & (captions != EOS_ID)


def init_global_reconstructor(key, cfg: ReconstructorConfig, dtype=jnp.float32):
    return {
        "rnn": rnn.init_rnn(key=key, rnn_type=cfg.rnn_type,
                            in_size=cfg.decoder_size * 2,
                            hidden_size=cfg.hidden_size, dtype=dtype),
    }


def init_local_reconstructor(key, cfg: ReconstructorConfig, dtype=jnp.float32):
    k_rnn, k_att = jax.random.split(key)
    return {
        "rnn": rnn.init_rnn(key=k_rnn, rnn_type=cfg.rnn_type,
                            in_size=cfg.decoder_size,
                            hidden_size=cfg.hidden_size, dtype=dtype),
        "attention": attn.init_attention(
            k_att, cfg.hidden_size, cfg.decoder_size, cfg.attn_size, dtype
        ),
    }


def init_reconstructor(key, cfg: ReconstructorConfig, dtype=jnp.float32):
    if cfg.type == "global":
        return init_global_reconstructor(key, cfg, dtype)
    if cfg.type == "local":
        return init_local_reconstructor(key, cfg, dtype)
    return None


def global_reconstruct(
    params,
    cfg: ReconstructorConfig,
    decoder_hiddens: jnp.ndarray,   # [L, B, H]
    caption_mask: jnp.ndarray,      # [L, B] bool
    dtype=jnp.float32,
) -> jnp.ndarray:
    """RecNet-global: RNN over [h_t ; masked-mean-pool(h)] reproducing one
    global feature per step (reference src/models/reconstructor.py:142-186).
    Returns [B, L, F]."""
    L, B, H = decoder_hiddens.shape
    hiddens = decoder_hiddens.astype(dtype)
    mask = caption_mask.astype(dtype)[:, :, None]                  # [L, B, 1]
    caption_lens = jnp.sum(caption_mask.astype(dtype), axis=0)     # [B]
    # max(.,1) guard: batch-padding rows have empty caption masks and would
    # otherwise poison the pool with 0/0 NaNs.
    pooled = jnp.sum(hiddens * mask, axis=0) / jnp.maximum(caption_lens, 1.0)[:, None]

    init_state = rnn.init_state(cfg.rnn_type, B, cfg.hidden_size, dtype)

    # The whole input sequence [h_t ; pooled] is known before the scan, so
    # the input-side GEMM runs ONCE over all timesteps; the scan streams only
    # the recurrent ``wh`` per step (rnn.rnn_input_preact).  At the reference
    # dual+global config this removes the [2H, 4H'] wi re-read every step —
    # the single largest weight stream in the train step (BENCH_NOTES).
    x_all = jnp.concatenate(
        [hiddens[1:], jnp.broadcast_to(pooled[None], (L - 1, B, H))], axis=-1)
    gi_all = rnn.rnn_input_preact(params["rnn"], cfg.rnn_type, x_all)

    # The reference loops t = 1..L-1, leaving recons[0] = 0
    # (src/models/reconstructor.py:178-183).  rnn_scan_pre is the custom-vjp
    # scan whose backward forms dwh as ONE stacked GEMM — at this module's
    # [2048, 8192] recurrent weight, lax.scan's per-step f32 grad
    # accumulator was the largest single HBM stream in the train step
    # (~1.07 GB/step, BENCH_NOTES round 5).
    recons = rnn.rnn_scan_pre(
        params["rnn"], cfg.rnn_type, gi_all, init_state).astype(jnp.float32)
    recons = jnp.concatenate([jnp.zeros((1, B, cfg.hidden_size), jnp.float32), recons], axis=0)
    return recons.transpose(1, 0, 2)                               # [B, L, F]


def local_reconstruct(
    params,
    cfg: ReconstructorConfig,
    decoder_hiddens: jnp.ndarray,   # [L, B, H]
    caption_mask: jnp.ndarray,      # [L, B] bool
    feat_len: int,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """RecNet-local: per output frame, attend over the decoder hiddens (masked
    by caption positions) and step an RNN whose hidden size is the feature dim
    (reference src/models/reconstructor.py:67-92).  Returns [B, T, F]."""
    L, B, H = decoder_hiddens.shape
    seq = decoder_hiddens.transpose(1, 0, 2).astype(dtype)          # [B, L, H]
    attn_mask = caption_mask.T                                      # [B, L]
    keys = attn.precompute_keys(params["attention"], seq)

    init_state = rnn.init_state(cfg.rnn_type, B, cfg.hidden_size, dtype)

    def step(state, _):
        h = rnn.state_hidden(cfg.rnn_type, state)
        context, _ = attn.attend(params["attention"], h, seq, keys=keys, mask=attn_mask)
        _, new_state = rnn.rnn_step(params["rnn"], cfg.rnn_type, context.astype(dtype), state)
        return new_state, rnn.state_hidden(cfg.rnn_type, new_state).astype(jnp.float32)

    _, recons = jax.lax.scan(step, init_state, None, length=feat_len)  # [T, B, F]
    return recons.transpose(1, 0, 2)


def reconstruct(
    params,
    cfg: ReconstructorConfig,
    decoder_hiddens: jnp.ndarray,
    outputs: jnp.ndarray,
    captions: Optional[jnp.ndarray],
    feat_len: int,
    dtype=jnp.float32,
) -> Optional[jnp.ndarray]:
    """Dispatch matching the reference's ``reconstruct`` API
    (src/models/reconstructor.py:94-97,188-194)."""
    if params is None or cfg.type not in ("global", "local"):
        return None
    mask = build_caption_mask(outputs, captions)
    if cfg.type == "global":
        return global_reconstruct(params, cfg, decoder_hiddens, mask, dtype)
    return local_reconstruct(params, cfg, decoder_hiddens, mask, feat_len, dtype)
