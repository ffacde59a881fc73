"""End-to-end captioning models.

- ``AVCaptioning``      — single-stream early fusion: concat audio+visual
  features, one decoder, one reconstructor
  (reference src/models/captioning.py:58-144)
- ``AVCaptioningDual``  — dual-stream late fusion: per-modality decoders whose
  log-probs are summed, per-modality reconstructors
  (reference src/models/captioning.py:147-291)

Both are stateless config holders; parameters live in explicit pytrees so the
train step jits/shards them freely.  ``predict_tokens`` is fully jittable
(greedy and beam); string decoding is a host-side helper.

Differences from the reference, documented in PARITY.md:
- the dual model's beam search actually works (the reference's is an
  unimplemented FIXME, src/models/captioning.py:269-277) — it steps both
  decoders jointly and fuses their log-probs per step
- the reference's dead ``output_fc`` fusion layer (src/models/captioning.py:185)
  is not allocated
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from mvc_tpu.config import (
    AUDIO_DECODER_CONFIG,
    SINGLE_DECODER_CONFIG,
    VISUAL_DECODER_CONFIG,
    DecoderConfig,
    ReconstructorConfig,
)
from mvc_tpu.models import beam as beam_mod
from mvc_tpu.models import decoder as dec
from mvc_tpu.models import reconstructor as rec
from mvc_tpu.models import attention as attn
from mvc_tpu.models import rnn
from mvc_tpu.ops import quant


def _beam_init_state(rnn_type: str, B: int, W: int, H: int, dtype):
    h = jnp.zeros((B, W, H), dtype)
    return (h, h) if rnn_type == "LSTM" else h


def _pallas_dispatch(params_list, feats_list, feat_mask, rnn_types,
                     beam_width, make_kernel, dtype=None):
    """Shared gate for the fused-kernel fast path: Pallas enabled, the batch
    shardable over the active mesh (ops/sharded.py; no mesh = direct call),
    and the VMEM pre-flight passing at the PER-SHARD batch.  Returns the
    kernel's tokens, or None — the caller then takes the XLA scan path,
    which GSPMD shards freely (the kernel is never silently replicated or
    gathered onto one device)."""
    from mvc_tpu.ops import sharded
    from mvc_tpu.ops.dispatch import active_mesh, use_pallas
    from mvc_tpu.ops.pallas_beam import fits_vmem
    from mvc_tpu.ops.quant import is_quantized_decoder

    if not use_pallas():
        return None
    # int8 weight-only decode (ops/quant.py) targets the large-batch XLA
    # scan; the fused kernels stream plain tiles and can't take quantized
    # trees.
    if any(is_quantized_decoder(p) for p in params_list):
        return None
    if dtype is not None:
        # Pre-cast f32 master params to the kernels' weight dtype HERE so
        # the wrappers' tile prep (reorder/pad/transpose, keys, P) runs at
        # half width — measured 1.41 -> 0.97 ms on the greedy kernel when
        # the trainer hands f32 masters to a bf16 model.
        params_list = [dec.cast_params_for_decode(p, dtype) for p in params_list]
    mesh = active_mesh()
    axes = sharded.batch_axes(mesh, feats_list[0].shape[0])
    if axes is None:
        return None
    if not fits_vmem(params_list, feats_list, beam_width=beam_width,
                     rnn_types=rnn_types,
                     batch_div=sharded.axes_size(mesh, axes),
                     # bulk direct decodes grid-tile the batch over the
                     # resident kernels (pallas_decode/_dual_greedy) — admit
                     # shapes whose batch TILE fits
                     allow_batch_tiling=(beam_width == 1)):
        return None
    kernel = make_kernel()
    if axes:
        return sharded.sharded_decode(
            mesh, axes, kernel, params_list, feats_list, feat_mask
        )
    return kernel(params_list, feats_list, feat_mask)


def _dual_tf_hoisted_hiddens(
    v_params, a_params, v_cfg, a_cfg,
    v_feats, a_feats, captions, feat_mask, dtype, v_keys, a_keys,
):
    """Hidden-state core of ``_dual_tf_hoisted``: returns (v_hids, a_hids)
    [L-1, B, H] f32 tails without the vocab projections — shared by the
    fused-loss path (training/fused_loss.py), which projects in vocab
    tiles instead."""
    from mvc_tpu.config import SOS_ID as SOS_ID_
    from mvc_tpu.ops.pallas_beam import _use_factored

    L, B = captions.shape

    def prep(params, cfg, feats):
        E = cfg.embedding_size
        F = feats.shape[2]
        wi = params["rnn"]["wi"]
        fed = jnp.concatenate(
            [jnp.full((1, B), SOS_ID_, captions.dtype), captions[1:-1]], axis=0)
        emb_all = params["embedding"]["table"][fed].astype(dtype)
        gi = (jnp.einsum("lbe,eh->lbh", emb_all, wi[:E].astype(dtype))
              + params["rnn"]["bi"].astype(dtype))
        # Training amortization rule — see decoder._decode_tf_hoisted.
        factored = (feats.shape[1] < L - 1
                    and _use_factored(B * feats.shape[1], F, wi.shape[1]))
        P = (feats @ wi[E:].astype(dtype)) if factored else None
        return gi, P, factored, wi, E

    v_gi, v_P, v_fac, v_wi, v_E = prep(v_params, v_cfg, v_feats)
    a_gi, a_P, a_fac, a_wi, a_E = prep(a_params, a_cfg, a_feats)

    def substep(params, cfg, feats, keys, P, fac, wi, E, state, gi_t):
        h = rnn.state_hidden(cfg.rnn_type, state)
        _, weights = attn.attend(
            params["attention"], h, feats, keys=keys, mask=feat_mask)
        if fac:
            gi = gi_t + jnp.einsum("bt,bth->bh", weights, P)
        else:
            context = jnp.einsum("bt,btf->bf", weights, feats)
            gi = gi_t + context.astype(dtype) @ wi[E:].astype(dtype)
        _, new_state = rnn.rnn_step_pre(params["rnn"], cfg.rnn_type, gi, state)
        return new_state

    init = (
        rnn.init_state(v_cfg.rnn_type, B, v_cfg.rnn_hidden_size, dtype),
        rnn.init_state(a_cfg.rnn_type, B, a_cfg.rnn_hidden_size, dtype),
    )

    def step(carry, xs):
        v_state, a_state = carry
        v_gt, a_gt = xs
        v_new = substep(v_params, v_cfg, v_feats, v_keys, v_P, v_fac, v_wi, v_E, v_state, v_gt)
        a_new = substep(a_params, a_cfg, a_feats, a_keys, a_P, a_fac, a_wi, a_E, a_state, a_gt)
        return (v_new, a_new), (
            rnn.state_hidden(v_cfg.rnn_type, v_new).astype(jnp.float32),
            rnn.state_hidden(a_cfg.rnn_type, a_new).astype(jnp.float32),
        )

    _, (v_hids, a_hids) = jax.lax.scan(step, init, (v_gi, a_gi))
    return v_hids, a_hids


def _dual_tf_hoisted(
    v_params, a_params, v_cfg, a_cfg,
    v_feats, a_feats, captions, feat_mask, dtype, v_keys, a_keys,
):
    """Fused dual decode under full teacher forcing with hoisted GEMMs —
    the dual-scan counterpart of ``decoder._decode_tf_hoisted`` (embedded
    input GEMMs and vocab projections leave the scan; wide-feature context
    rows ride P = feats @ wi_ctx).  Each scan step streams only the two
    recurrent ``wh`` matrices."""
    L, B = captions.shape
    v_hids, a_hids = _dual_tf_hoisted_hiddens(
        v_params, a_params, v_cfg, a_cfg,
        v_feats, a_feats, captions, feat_mask, dtype, v_keys, a_keys,
    )

    def outs(params, hids):
        logits = (hids.astype(dtype) @ quant.wmat(params["out"]["w"], dtype)
                  + params["out"]["b"].astype(dtype)).astype(jnp.float32)
        return jax.nn.log_softmax(logits, axis=-1)

    def pad0(x, width):
        return jnp.concatenate([jnp.zeros((1, B, width), jnp.float32), x], axis=0)

    return (
        pad0(outs(v_params, v_hids), v_cfg.output_size),
        pad0(v_hids, v_cfg.rnn_hidden_size),
        pad0(outs(a_params, a_hids), a_cfg.output_size),
        pad0(a_hids, a_cfg.rnn_hidden_size),
    )


def dual_decode_fused(
    v_params, a_params, v_cfg, a_cfg,
    visual, audio, captions,
    teacher_forcing_ratio: float,
    rng, feat_mask, dtype=jnp.float32,
    max_caption_len: Optional[int] = None,
):
    """Both decoders stepped inside ONE lax.scan — halves the scan overhead
    and lets XLA overlap the two decoders' matmuls.  Numerically identical to
    two independent decodes: each decoder keeps its own teacher-forcing coins
    (split from ``rng`` exactly like AVCaptioningDual.forward) and feeds its
    own argmax when not forced.

    Returns (v_outputs, v_hiddens, a_outputs, a_hiddens), each [L, B, *]."""
    rnn_mod = rnn
    B = visual.shape[0]
    L = int(captions.shape[0]) if captions is not None else int(max_caption_len)
    v_feats = visual.astype(dtype)
    a_feats = audio.astype(dtype)
    v_keys = attn.precompute_keys(v_params["attention"], v_feats)
    a_keys = attn.precompute_keys(a_params["attention"], a_feats)

    if (captions is not None and teacher_forcing_ratio >= 1.0 and L > 1
            and not quant.is_quantized(v_params["rnn"]["wi"])
            and not quant.is_quantized(a_params["rnn"]["wi"])):
        return _dual_tf_hoisted(
            v_params, a_params, v_cfg, a_cfg,
            v_feats, a_feats, captions, feat_mask, dtype, v_keys, a_keys,
        )

    if captions is not None and teacher_forcing_ratio > 0:
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        rng_v, rng_a = jax.random.split(rng)
        use_tf_v = jax.random.bernoulli(rng_v, teacher_forcing_ratio, (L,))
        use_tf_a = jax.random.bernoulli(rng_a, teacher_forcing_ratio, (L,))
    else:
        use_tf_v = use_tf_a = jnp.zeros((L,), dtype=bool)

    gold = captions if captions is not None else jnp.zeros((L, B), dtype=jnp.int32)
    init = (
        jnp.full((B,), 1, dtype=jnp.int32),  # SOS
        rnn.init_state(v_cfg.rnn_type, B, v_cfg.rnn_hidden_size, dtype),
        jnp.full((B,), 1, dtype=jnp.int32),
        rnn.init_state(a_cfg.rnn_type, B, a_cfg.rnn_hidden_size, dtype),
    )

    def step(carry, xs):
        v_prev, v_state, a_prev, a_state = carry
        gold_t, tf_v, tf_a = xs
        v_logp, v_new, _ = dec.decoder_step(v_params, v_cfg, v_prev, v_state, v_feats, v_keys, feat_mask, dtype)
        a_logp, a_new, _ = dec.decoder_step(a_params, a_cfg, a_prev, a_state, a_feats, a_keys, feat_mask, dtype)
        v_next = jnp.where(tf_v, gold_t, jnp.argmax(v_logp, -1).astype(jnp.int32))
        a_next = jnp.where(tf_a, gold_t, jnp.argmax(a_logp, -1).astype(jnp.int32))
        v_h = rnn_mod.state_hidden(v_cfg.rnn_type, v_new).astype(jnp.float32)
        a_h = rnn_mod.state_hidden(a_cfg.rnn_type, a_new).astype(jnp.float32)
        return (v_next, v_new, a_next, a_new), (v_logp, v_h, a_logp, a_h)

    xs = (gold[1:], use_tf_v[1:], use_tf_a[1:])
    _, (v_outs, v_hids, a_outs, a_hids) = jax.lax.scan(step, init, xs)

    def pad0(x, width):
        return jnp.concatenate([jnp.zeros((1, B, width), jnp.float32), x], axis=0)

    return (
        pad0(v_outs, v_cfg.output_size), pad0(v_hids, v_cfg.rnn_hidden_size),
        pad0(a_outs, a_cfg.output_size), pad0(a_hids, a_cfg.rnn_hidden_size),
    )


def dual_decode_hiddens(
    v_params, a_params, v_cfg, a_cfg,
    visual, audio, captions,
    teacher_forcing_ratio: float,
    rng, feat_mask, dtype=jnp.float32,
):
    """Hiddens-only training decode for the dual model: identical decoder
    trajectories to ``dual_decode_fused`` (same per-decoder teacher-forcing
    coins, same argmax feeds) but the two per-step [B, V] log-probs are
    consumed in-scan for token selection only and never stacked — the
    fused-loss path (training/fused_loss.py).

    Returns (v_hiddens, a_hiddens), each [L, B, H] f32 with row 0 zeroed."""
    B = visual.shape[0]
    L = int(captions.shape[0])
    v_feats = visual.astype(dtype)
    a_feats = audio.astype(dtype)
    v_keys = attn.precompute_keys(v_params["attention"], v_feats)
    a_keys = attn.precompute_keys(a_params["attention"], a_feats)

    if (teacher_forcing_ratio >= 1.0 and L > 1
            and not quant.is_quantized(v_params["rnn"]["wi"])
            and not quant.is_quantized(a_params["rnn"]["wi"])):
        v_hids, a_hids = _dual_tf_hoisted_hiddens(
            v_params, a_params, v_cfg, a_cfg,
            v_feats, a_feats, captions, feat_mask, dtype, v_keys, a_keys,
        )
    else:
        if teacher_forcing_ratio > 0:
            rng = rng if rng is not None else jax.random.PRNGKey(0)
            rng_v, rng_a = jax.random.split(rng)
            use_tf_v = jax.random.bernoulli(rng_v, teacher_forcing_ratio, (L,))
            use_tf_a = jax.random.bernoulli(rng_a, teacher_forcing_ratio, (L,))
        else:
            use_tf_v = use_tf_a = jnp.zeros((L,), dtype=bool)
        init = (
            jnp.full((B,), 1, dtype=jnp.int32),  # SOS
            rnn.init_state(v_cfg.rnn_type, B, v_cfg.rnn_hidden_size, dtype),
            jnp.full((B,), 1, dtype=jnp.int32),
            rnn.init_state(a_cfg.rnn_type, B, a_cfg.rnn_hidden_size, dtype),
        )

        def step(carry, xs):
            v_prev, v_state, a_prev, a_state = carry
            gold_t, tf_v, tf_a = xs
            v_logp, v_new, _ = dec.decoder_step(
                v_params, v_cfg, v_prev, v_state, v_feats, v_keys, feat_mask, dtype)
            a_logp, a_new, _ = dec.decoder_step(
                a_params, a_cfg, a_prev, a_state, a_feats, a_keys, feat_mask, dtype)
            v_next = jnp.where(tf_v, gold_t, jnp.argmax(v_logp, -1).astype(jnp.int32))
            a_next = jnp.where(tf_a, gold_t, jnp.argmax(a_logp, -1).astype(jnp.int32))
            return (v_next, v_new, a_next, a_new), (
                rnn.state_hidden(v_cfg.rnn_type, v_new).astype(jnp.float32),
                rnn.state_hidden(a_cfg.rnn_type, a_new).astype(jnp.float32),
            )

        xs = (captions[1:], use_tf_v[1:], use_tf_a[1:])
        _, (v_hids, a_hids) = jax.lax.scan(step, init, xs)

    def pad0(x, width):
        return jnp.concatenate([jnp.zeros((1, B, width), jnp.float32), x], axis=0)

    return (pad0(v_hids, v_cfg.rnn_hidden_size),
            pad0(a_hids, a_cfg.rnn_hidden_size))


def dual_greedy_tokens_fused(
    v_params, a_params, v_cfg, a_cfg,
    visual, audio,
    max_caption_len: int,
    feat_mask, dtype=jnp.float32,
    stop_at_all_eos: bool = False,
) -> jnp.ndarray:
    """Tokens-only dual direct decode (one scan, both decoders): each decoder
    free-runs on its own argmax while the output stream argmaxes the fused
    log-probs per step (reference src/models/captioning.py:279-288) — same
    math as ``greedy_tokens(a_outputs + v_outputs)`` over the stacked decode,
    but the two [L, B, V] log-prob stacks never materialize (the dominant
    HBM traffic at bulk offline-scoring batch sizes, BENCH_NOTES round 3).

    Returns [B, L] int32 tokens (position 0 = 0, the stacked contract)."""
    B = visual.shape[0]
    L = int(max_caption_len)
    v_params = dec.cast_params_for_decode(v_params, dtype)
    a_params = dec.cast_params_for_decode(a_params, dtype)
    v_feats = visual.astype(dtype)
    a_feats = audio.astype(dtype)
    v_keys = attn.precompute_keys(v_params["attention"], v_feats)
    a_keys = attn.precompute_keys(a_params["attention"], a_feats)
    v_P = dec.factored_P(v_params, v_feats, dtype)
    a_P = dec.factored_P(a_params, a_feats, dtype)
    init = (
        jnp.full((B,), 1, dtype=jnp.int32),   # SOS
        rnn.init_state(v_cfg.rnn_type, B, v_cfg.rnn_hidden_size, dtype),
        jnp.full((B,), 1, dtype=jnp.int32),
        rnn.init_state(a_cfg.rnn_type, B, a_cfg.rnn_hidden_size, dtype),
    )

    def one_step(carry):
        v_prev, v_state, a_prev, a_state = carry
        v_logp, v_new, _ = dec.decoder_step(
            v_params, v_cfg, v_prev, v_state, v_feats, v_keys, feat_mask, dtype, P=v_P)
        a_logp, a_new, _ = dec.decoder_step(
            a_params, a_cfg, a_prev, a_state, a_feats, a_keys, feat_mask, dtype, P=a_P)
        v_next = jnp.argmax(v_logp, -1).astype(jnp.int32)
        a_next = jnp.argmax(a_logp, -1).astype(jnp.int32)
        fused = jnp.argmax(v_logp + a_logp, -1).astype(jnp.int32)
        return (v_next, v_new, a_next, a_new), fused

    if stop_at_all_eos:
        # Stop once every row's FUSED stream has emitted EOS: later output
        # positions hold 0, which decode_indexes never reads (text-identical;
        # the decoders' own feeds are irrelevant past that point).
        from mvc_tpu.config import EOS_ID

        def cond(c):
            t, seen = c[0], c[1]
            return jnp.logical_and(t < L - 1, jnp.logical_not(jnp.all(seen)))

        def body(c):
            t, seen, carry, toks = c
            carry, fused = one_step(carry)
            toks = jax.lax.dynamic_update_index_in_dim(toks, fused, t, axis=0)
            return (t + 1, seen | (fused == EOS_ID), carry, toks)

        out = jax.lax.while_loop(cond, body, (
            jnp.asarray(0, jnp.int32), jnp.zeros((B,), bool), init,
            jnp.zeros((L - 1, B), jnp.int32)))
        toks = out[3]
    else:
        def step(carry, _):
            return one_step(carry)

        _, toks = jax.lax.scan(step, init, None, length=L - 1)
    zeros = jnp.zeros((1, B), jnp.int32)
    return jnp.concatenate([zeros, toks], axis=0).T


def captions_from_tokens(vocab, tokens) -> List[str]:
    """[B, L] token ids -> caption strings; drops position 0 and stops at EOS
    (reference src/models/captioning.py:143)."""
    import numpy as np

    tokens = np.asarray(tokens)
    return [vocab.decode_indexes(row[1:]) for row in tokens]


class AVCaptioning:
    """Single-stream concat-fusion captioner."""

    def __init__(
        self,
        vocab_size: int,
        teacher_forcing_ratio: float = 0.0,
        reconstructor_type: str = "none",
        decoder_config: Optional[DecoderConfig] = None,
        reconstructor_config: Optional[ReconstructorConfig] = None,
        dtype=jnp.float32,
    ):
        self.vocab_size = vocab_size
        self.teacher_forcing_ratio = teacher_forcing_ratio
        self.reconstructor_type = reconstructor_type
        self.dtype = dtype
        base = decoder_config or SINGLE_DECODER_CONFIG
        self.decoder_config = base.replace(output_size=vocab_size)
        rbase = reconstructor_config or ReconstructorConfig()
        # The model builder overwrites these exactly like the reference
        # (src/models/captioning.py:72-75).
        self.reconstructor_config = rbase.replace(
            type=reconstructor_type,
            decoder_size=self.decoder_config.rnn_hidden_size,
            hidden_size=self.decoder_config.in_feature_size,
        )
        # Model banner (reference src/models/captioning.py:94-106).
        cfg = self.decoder_config
        print("Initializing Model...")
        print("Decoder      :", cfg.rnn_type, "In:", cfg.in_feature_size,
              "Out:", cfg.output_size, "Hidden:", cfg.rnn_hidden_size)
        print("Reconstuctor :", reconstructor_type)

    def init(self, key):
        k_dec, k_rec = jax.random.split(key)
        return {
            "decoder": dec.init_decoder(k_dec, self.decoder_config),
            "reconstructor": rec.init_reconstructor(k_rec, self.reconstructor_config),
        }

    def forward(
        self,
        params,
        audio: jnp.ndarray,             # [B, T, 128]
        visual: jnp.ndarray,            # [B, T, 2048]
        captions: jnp.ndarray,          # [L, B]
        rng: Optional[jax.Array] = None,
        teacher_forcing_ratio: Optional[float] = None,
        feat_mask: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], Optional[jnp.ndarray]]:
        """Returns (outputs [L,B,V], audio_recons, visual_recons)
        (reference src/models/captioning.py:108-129)."""
        tf = teacher_forcing_ratio if teacher_forcing_ratio is not None else self.teacher_forcing_ratio
        features = jnp.concatenate([audio, visual], axis=-1)
        outputs, hiddens = dec.decode(
            params["decoder"], self.decoder_config, features,
            captions=captions, max_caption_len=captions.shape[0],
            teacher_forcing_ratio=tf, rng=rng, feat_mask=feat_mask, dtype=self.dtype,
        )
        recons = rec.reconstruct(
            params["reconstructor"], self.reconstructor_config,
            hiddens, outputs, captions, feat_len=features.shape[1], dtype=self.dtype,
        )
        if recons is None:
            return outputs, None, None
        a_dim = audio.shape[2]
        return outputs, recons[:, :, :a_dim], recons[:, :, a_dim:]

    def forward_hiddens(
        self,
        params,
        audio: jnp.ndarray,
        visual: jnp.ndarray,
        captions: jnp.ndarray,
        rng: Optional[jax.Array] = None,
        teacher_forcing_ratio: Optional[float] = None,
        feat_mask: Optional[jnp.ndarray] = None,
    ):
        """Fused-loss training forward: identical decoder trajectory and
        reconstructions to ``forward`` but the [L, B, V] outputs never
        materialize (training/fused_loss.py projects the vocab in tiles).

        Returns (hiddens_tuple, out_params_tuple, audio_recons, visual_recons)
        where hiddens are [L, B, H] (row 0 zeroed) and out_params are the
        matching {"w", "b"} vocab projections."""
        tf = teacher_forcing_ratio if teacher_forcing_ratio is not None else self.teacher_forcing_ratio
        features = jnp.concatenate([audio, visual], axis=-1)
        hiddens = dec.decode_hiddens(
            params["decoder"], self.decoder_config, features, captions,
            teacher_forcing_ratio=tf, rng=rng, feat_mask=feat_mask, dtype=self.dtype,
        )
        recons = rec.reconstruct(
            params["reconstructor"], self.reconstructor_config,
            hiddens, None, captions, feat_len=features.shape[1], dtype=self.dtype,
        )
        outs = (params["decoder"]["out"],)
        if recons is None:
            return (hiddens,), outs, None, None
        a_dim = audio.shape[2]
        return (hiddens,), outs, recons[:, :, :a_dim], recons[:, :, a_dim:]

    def predict_tokens(
        self,
        params,
        audio: jnp.ndarray,
        visual: jnp.ndarray,
        max_caption_len: int = 30,
        mode: str = "direct",
        beam_alpha: float = 0.0,
        beam_width: int = 5,
        feat_mask: Optional[jnp.ndarray] = None,
        stop_at_all_eos: bool = False,
    ) -> jnp.ndarray:
        """Jittable prediction -> token ids [B, L]
        (reference src/models/captioning.py:131-144).

        ``stop_at_all_eos`` (direct mode, XLA path): stop the decode loop
        once every row has emitted EOS — caption text identical, post-EOS
        token positions hold 0 (PARITY.md); ignored by the fused kernels
        (fixed schedule) and by beam mode (which has its own early exit)."""
        features = jnp.concatenate([audio, visual], axis=-1)
        if mode == "direct":
            def make_kernel():
                # Whole-decode fused kernel (ops/pallas_decode.py): weights
                # stream as double-buffered tiles in the model's compute
                # dtype; tokens-only output.  1.4x the XLA scan at the
                # headline decode shape (BENCH_NOTES.md round 2).
                from mvc_tpu.ops.dispatch import interpret_mode
                from mvc_tpu.ops.pallas_decode import greedy_decode_pallas

                return lambda p, fl, m: greedy_decode_pallas(
                    p[0], fl[0], feat_mask=m,
                    max_caption_len=max_caption_len,
                    weight_dtype=jnp.dtype(self.dtype).name,
                    rnn_type=self.decoder_config.rnn_type,
                    interpret=interpret_mode(),
                )

            tokens = _pallas_dispatch(
                [params["decoder"]], [features], feat_mask,
                (self.decoder_config.rnn_type,), 1, make_kernel, self.dtype,
            )
            if tokens is not None:
                return tokens
            return dec.decode_greedy_tokens(
                params["decoder"], self.decoder_config, features,
                max_caption_len=max_caption_len,
                feat_mask=feat_mask, dtype=self.dtype,
                stop_at_all_eos=stop_at_all_eos,
            )
        if mode != "beam":
            raise ValueError(f"mode must be 'direct' or 'beam', got {mode}")

        B = features.shape[0]
        cfg = self.decoder_config

        def make_kernel():
            # Fused whole-search kernel (ops/pallas_beam.py): token-id parity
            # with the scan path is asserted in tests/test_pallas.py.
            from mvc_tpu.ops.dispatch import interpret_mode
            from mvc_tpu.ops.pallas_beam import beam_decode_pallas

            return lambda p, fl, m: beam_decode_pallas(
                p, fl, feat_mask=m,
                max_caption_len=max_caption_len, beam_width=beam_width,
                beam_alpha=beam_alpha, weight_dtype=jnp.dtype(self.dtype).name,
                rnn_types=(cfg.rnn_type,), interpret=interpret_mode(),
            )

        tokens = _pallas_dispatch(
            [params["decoder"]], [features], feat_mask,
            (cfg.rnn_type,), beam_width, make_kernel, self.dtype,
        )
        if tokens is not None:
            return tokens
        dec_params = dec.cast_params_for_decode(params["decoder"], self.dtype)
        feats = features.astype(self.dtype)
        keys = attn.precompute_keys(dec_params["attention"], feats)
        P = dec.factored_P(dec_params, feats, self.dtype)

        def step_fn(prev, state):
            return dec.decoder_beam_step(
                dec_params, cfg, prev, state, feats, keys, feat_mask, self.dtype, P=P
            )

        init_state = _beam_init_state(cfg.rnn_type, B, beam_width, cfg.rnn_hidden_size, self.dtype)
        return beam_mod.beam_search(
            step_fn, init_state, B, self.vocab_size,
            max_caption_len=max_caption_len, beam_alpha=beam_alpha, beam_width=beam_width,
        )

    def predict(self, params, vocab, audio, visual, max_caption_len=30, mode="direct",
                beam_alpha=0.0, beam_width=5, feat_mask=None) -> List[str]:
        tokens = self.predict_tokens(
            params, audio, visual, max_caption_len, mode, beam_alpha, beam_width, feat_mask
        )
        return captions_from_tokens(vocab, tokens)


class AVCaptioningDual:
    """Dual-stream late-fusion captioner — the model the reference actually
    trains (``dual=True``, reference src/train.py:375,513-519).  Fusion is an
    elementwise sum of the two decoders' log-probs
    (reference src/models/captioning.py:260-264)."""

    def __init__(
        self,
        vocab_size: int,
        teacher_forcing_ratio: float = 0.0,
        reconstructor_type: str = "none",
        visual_decoder_config: Optional[DecoderConfig] = None,
        audio_decoder_config: Optional[DecoderConfig] = None,
        reconstructor_config: Optional[ReconstructorConfig] = None,
        dtype=jnp.float32,
        fused_scan: bool = True,
    ):
        self.vocab_size = vocab_size
        self.teacher_forcing_ratio = teacher_forcing_ratio
        self.reconstructor_type = reconstructor_type
        self.dtype = dtype
        self.fused_scan = fused_scan
        v_base = visual_decoder_config or VISUAL_DECODER_CONFIG
        a_base = audio_decoder_config or AUDIO_DECODER_CONFIG
        self.v_config = v_base.replace(output_size=vocab_size)
        self.a_config = a_base.replace(output_size=vocab_size)
        rbase = reconstructor_config or ReconstructorConfig()
        self.v_rec_config = rbase.replace(
            type=reconstructor_type,
            decoder_size=self.v_config.rnn_hidden_size,
            hidden_size=self.v_config.in_feature_size,
        )
        self.a_rec_config = rbase.replace(
            type=reconstructor_type,
            decoder_size=self.a_config.rnn_hidden_size,
            hidden_size=self.a_config.in_feature_size,
        )
        # Model banner (reference src/models/captioning.py:209-221).
        v, a = self.v_config, self.a_config
        print("Initializing Model...")
        print("Decoder (V,A)     :", (v.rnn_type, a.rnn_type),
              "In:", (v.in_feature_size, a.in_feature_size),
              "Out:", (v.output_size, a.output_size),
              "Hidden:", (v.rnn_hidden_size, a.rnn_hidden_size))
        print("Reconstuctor (V,A):", (reconstructor_type, reconstructor_type))

    def init(self, key):
        kv, ka, kvr, kar = jax.random.split(key, 4)
        return {
            "v_decoder": dec.init_decoder(kv, self.v_config),
            "a_decoder": dec.init_decoder(ka, self.a_config),
            "v_reconstructor": rec.init_reconstructor(kvr, self.v_rec_config),
            "a_reconstructor": rec.init_reconstructor(kar, self.a_rec_config),
        }

    def forward(
        self,
        params,
        audio: jnp.ndarray,
        visual: jnp.ndarray,
        captions: jnp.ndarray,
        rng: Optional[jax.Array] = None,
        teacher_forcing_ratio: Optional[float] = None,
        feat_mask: Optional[jnp.ndarray] = None,
    ):
        """(reference src/models/captioning.py:223-257).  Each decoder draws
        its own teacher-forcing coins, as in the reference where each calls
        forward_sentence independently."""
        tf = teacher_forcing_ratio if teacher_forcing_ratio is not None else self.teacher_forcing_ratio

        if self.fused_scan:
            v_outputs, v_hiddens, a_outputs, a_hiddens = dual_decode_fused(
                params["v_decoder"], params["a_decoder"], self.v_config, self.a_config,
                visual, audio, captions, tf, rng, feat_mask, self.dtype,
            )
        else:
            rng_v, rng_a = jax.random.split(rng) if rng is not None else (None, None)
            v_outputs, v_hiddens = dec.decode(
                params["v_decoder"], self.v_config, visual,
                captions=captions, max_caption_len=captions.shape[0],
                teacher_forcing_ratio=tf, rng=rng_v, feat_mask=feat_mask, dtype=self.dtype,
            )
            a_outputs, a_hiddens = dec.decode(
                params["a_decoder"], self.a_config, audio,
                captions=captions, max_caption_len=captions.shape[0],
                teacher_forcing_ratio=tf, rng=rng_a, feat_mask=feat_mask, dtype=self.dtype,
            )
        outputs = a_outputs + v_outputs

        audio_recons = rec.reconstruct(
            params["a_reconstructor"], self.a_rec_config,
            a_hiddens, a_outputs, captions, feat_len=audio.shape[1], dtype=self.dtype,
        )
        visual_recons = rec.reconstruct(
            params["v_reconstructor"], self.v_rec_config,
            v_hiddens, v_outputs, captions, feat_len=visual.shape[1], dtype=self.dtype,
        )
        return outputs, audio_recons, visual_recons

    def forward_hiddens(
        self,
        params,
        audio: jnp.ndarray,
        visual: jnp.ndarray,
        captions: jnp.ndarray,
        rng: Optional[jax.Array] = None,
        teacher_forcing_ratio: Optional[float] = None,
        feat_mask: Optional[jnp.ndarray] = None,
    ):
        """Fused-loss training forward: identical decoder trajectories and
        reconstructions to ``forward`` but neither decoder's [L, B, V]
        log-prob stack materializes (training/fused_loss.py handles the
        summed-log-softmax fusion of the two streams analytically).

        Returns (hiddens_tuple, out_params_tuple, audio_recons, visual_recons).
        """
        tf = teacher_forcing_ratio if teacher_forcing_ratio is not None else self.teacher_forcing_ratio
        v_hiddens, a_hiddens = dual_decode_hiddens(
            params["v_decoder"], params["a_decoder"], self.v_config, self.a_config,
            visual, audio, captions, tf, rng, feat_mask, self.dtype,
        )
        audio_recons = rec.reconstruct(
            params["a_reconstructor"], self.a_rec_config,
            a_hiddens, None, captions, feat_len=audio.shape[1], dtype=self.dtype,
        )
        visual_recons = rec.reconstruct(
            params["v_reconstructor"], self.v_rec_config,
            v_hiddens, None, captions, feat_len=visual.shape[1], dtype=self.dtype,
        )
        outs = (params["v_decoder"]["out"], params["a_decoder"]["out"])
        return (v_hiddens, a_hiddens), outs, audio_recons, visual_recons

    def predict_tokens(
        self,
        params,
        audio: jnp.ndarray,
        visual: jnp.ndarray,
        max_caption_len: int = 30,
        mode: str = "direct",
        beam_alpha: float = 0.0,
        beam_width: int = 5,
        feat_mask: Optional[jnp.ndarray] = None,
        stop_at_all_eos: bool = False,
    ) -> jnp.ndarray:
        if mode == "direct":
            # Each decoder free-runs on its own argmax, then the fused
            # log-probs are argmaxed (reference src/models/captioning.py:279-288).
            def make_kernel():
                # Whole-decode fused dual kernel (ops/pallas_dual_greedy.py);
                # parity asserted in tests/test_pallas.py.
                from mvc_tpu.ops.dispatch import interpret_mode
                from mvc_tpu.ops.pallas_dual_greedy import dual_greedy_decode_pallas

                return lambda p, fl, m: dual_greedy_decode_pallas(
                    p, fl, feat_mask=m, max_caption_len=max_caption_len,
                    weight_dtype=jnp.dtype(self.dtype).name,
                    rnn_types=(self.v_config.rnn_type, self.a_config.rnn_type),
                    interpret=interpret_mode(),
                )

            tokens = _pallas_dispatch(
                [params["v_decoder"], params["a_decoder"]], [visual, audio],
                feat_mask, (self.v_config.rnn_type, self.a_config.rnn_type),
                1, make_kernel, self.dtype,
            )
            if tokens is not None:
                return tokens
            return dual_greedy_tokens_fused(
                params["v_decoder"], params["a_decoder"], self.v_config,
                self.a_config, visual, audio, max_caption_len=max_caption_len,
                feat_mask=feat_mask, dtype=self.dtype,
                stop_at_all_eos=stop_at_all_eos,
            )
        if mode != "beam":
            raise ValueError(f"mode must be 'direct' or 'beam', got {mode}")

        # Joint fused-logit beam — a working implementation of the path the
        # reference leaves as FIXME (src/models/captioning.py:269-277).
        def make_kernel():
            # Fused whole-search kernel over both decoders' summed log-probs
            # (ops/pallas_beam.py); parity asserted in tests/test_pallas.py.
            from mvc_tpu.ops.dispatch import interpret_mode
            from mvc_tpu.ops.pallas_beam import beam_decode_pallas

            return lambda p, fl, m: beam_decode_pallas(
                p, fl, feat_mask=m, max_caption_len=max_caption_len,
                beam_width=beam_width, beam_alpha=beam_alpha,
                weight_dtype=jnp.dtype(self.dtype).name,
                rnn_types=(self.v_config.rnn_type, self.a_config.rnn_type),
                interpret=interpret_mode(),
            )

        if self.v_config.attn_size == self.a_config.attn_size:
            tokens = _pallas_dispatch(
                [params["v_decoder"], params["a_decoder"]], [visual, audio],
                feat_mask, (self.v_config.rnn_type, self.a_config.rnn_type),
                beam_width, make_kernel, self.dtype,
            )
            if tokens is not None:
                return tokens
        B = visual.shape[0]
        v_params = dec.cast_params_for_decode(params["v_decoder"], self.dtype)
        a_params = dec.cast_params_for_decode(params["a_decoder"], self.dtype)
        v_feats = visual.astype(self.dtype)
        a_feats = audio.astype(self.dtype)
        v_keys = attn.precompute_keys(v_params["attention"], v_feats)
        a_keys = attn.precompute_keys(a_params["attention"], a_feats)
        v_P = dec.factored_P(v_params, v_feats, self.dtype)
        a_P = dec.factored_P(a_params, a_feats, self.dtype)

        def step_fn(prev, state):
            v_state, a_state = state
            v_logp, v_new = dec.decoder_beam_step(
                v_params, self.v_config, prev, v_state, v_feats, v_keys,
                feat_mask, self.dtype, P=v_P,
            )
            a_logp, a_new = dec.decoder_beam_step(
                a_params, self.a_config, prev, a_state, a_feats, a_keys,
                feat_mask, self.dtype, P=a_P,
            )
            return v_logp + a_logp, (v_new, a_new)

        init_state = (
            _beam_init_state(self.v_config.rnn_type, B, beam_width, self.v_config.rnn_hidden_size, self.dtype),
            _beam_init_state(self.a_config.rnn_type, B, beam_width, self.a_config.rnn_hidden_size, self.dtype),
        )
        return beam_mod.beam_search(
            step_fn, init_state, B, self.vocab_size,
            max_caption_len=max_caption_len, beam_alpha=beam_alpha, beam_width=beam_width,
        )

    def predict(self, params, vocab, audio, visual, max_caption_len=30, mode="direct",
                beam_alpha=0.0, beam_width=5, feat_mask=None) -> List[str]:
        tokens = self.predict_tokens(
            params, audio, visual, max_caption_len, mode, beam_alpha, beam_width, feat_mask
        )
        return captions_from_tokens(vocab, tokens)
