"""SoftAttention-RNN caption decoder.

Functional equivalent of the reference's FeaturesCaptioning
(reference src/models/features_captioning.py:9-129), redesigned for TPU:

- the word-by-word Python loop (reference :91-119) becomes a single
  ``lax.scan`` over the time axis — one compiled program, static shapes
- the attention key projection is hoisted out of the scan (see attention.py)
- teacher forcing draws ONE Bernoulli per timestep for the whole batch,
  replicating the reference's ``torch.rand(1) < ratio`` semantics
  (reference :116) — not per-sample
- logits are log-softmaxed in float32 regardless of compute dtype

Output contract (the reference's tensor contract, see SURVEY.md §7):
  outputs [L, B, V] log-probabilities with outputs[0] == 0
  hiddens [L, B, H] decoder h-states with hiddens[0] == 0
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from mvc_tpu.config import DecoderConfig, SOS_ID
from mvc_tpu.models import attention as attn
from mvc_tpu.models import rnn
from mvc_tpu.models.initializers import embedding_params, linear_params
from mvc_tpu.ops import quant


def cast_params_for_decode(params, dtype):
    """Pre-cast a decoder tree to the compute dtype ONCE, before the scan.

    XLA does not hoist per-use ``astype`` casts out of scan bodies, so a
    bf16 decode over f32 master params would re-stream f32 weights AND cast
    them every step (the trainer learned this on the train step — BENCH_NOTES
    round 3 mixed-precision section); after this cast the in-scan casts are
    no-ops.  Identity for f32.  int8-quantized leaves (ops/quant.py) keep
    their storage dtype and f32 scales."""
    if dtype == jnp.float32 or jnp.dtype(dtype) == jnp.float32:
        return params

    def cast(x):
        if quant.is_quantized(x):
            return x
        return x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x

    return jax.tree.map(cast, params, is_leaf=quant.is_quantized)


def init_decoder(key, cfg: DecoderConfig, dtype=jnp.float32):
    k_emb, k_att, k_rnn, k_out = jax.random.split(key, 4)
    return {
        "embedding": embedding_params(k_emb, cfg.output_size, cfg.embedding_size, dtype),
        "attention": attn.init_attention(
            k_att, cfg.rnn_hidden_size, cfg.in_feature_size, cfg.attn_size, dtype
        ),
        "rnn": rnn.init_rnn(key=k_rnn, rnn_type=cfg.rnn_type,
                            in_size=cfg.embedding_size + cfg.in_feature_size,
                            hidden_size=cfg.rnn_hidden_size, dtype=dtype),
        "out": linear_params(k_out, cfg.rnn_hidden_size, cfg.output_size, dtype=dtype),
    }


def factored_P(params, feats, dtype):
    """P = feats @ wi_ctx for the factored-context decode scans, or None when
    the direct path is cheaper (``ops.pallas_beam._use_factored`` rule) or
    the weights are int8-quantized (quant targets the direct matmuls)."""
    from mvc_tpu.ops.pallas_beam import _use_factored

    wi = params["rnn"]["wi"]
    if quant.is_quantized(wi):
        return None
    E = params["embedding"]["table"].shape[1]
    B, T, F = feats.shape
    if not _use_factored(B * T, F, wi.shape[1]):
        return None
    return feats.astype(dtype) @ wi[E:].astype(dtype)          # [B, T, G*H]


def decoder_step(
    params,
    cfg: DecoderConfig,
    prev_tokens: jnp.ndarray,        # [B] int32
    state,                           # rnn state ((h,c) or h), each [B, H]
    feats: jnp.ndarray,              # [B, T, F]
    keys: jnp.ndarray,               # [B, T, A] precomputed attention keys
    feat_mask: Optional[jnp.ndarray],  # [B, T] bool or None
    dtype=jnp.float32,
    P: Optional[jnp.ndarray] = None,  # [B, T, G*H] factored_P (or None)
) -> Tuple[jnp.ndarray, object, jnp.ndarray]:
    """One word step (reference forward_word, src/models/features_captioning.py:77-89).
    Returns (log_probs [B, V] float32, new_state, attn_weights [B, T]).

    Always the XLA path: this step sits inside differentiated training scans,
    and per-step Pallas cells measured SLOWER than XLA at this granularity
    (BENCH_NOTES.md round 1; the kernels were removed in round 2).
    MVC_PALLAS routes the inference-only whole-decode kernels in
    models/captioning.py instead.

    With ``P`` (factored context-gates, see ``factored_P``) the context rows
    of ``wi`` never stream through the scan: the attention-weighted sum runs
    over P and the cell steps from the input preactivation."""
    embedded = params["embedding"]["table"][prev_tokens].astype(dtype)
    h = rnn.state_hidden(cfg.rnn_type, state)
    context, weights = attn.attend(params["attention"], h, feats, keys=keys, mask=feat_mask)
    if P is not None:
        E = embedded.shape[-1]
        wi = params["rnn"]["wi"]
        gi = (embedded @ wi[:E].astype(dtype) + params["rnn"]["bi"].astype(dtype)
              + jnp.einsum("bt,bth->bh", weights, P))
        _, new_state = rnn.rnn_step_pre(params["rnn"], cfg.rnn_type, gi, state)
    else:
        x = jnp.concatenate([embedded, context.astype(dtype)], axis=-1)
        _, new_state = rnn.rnn_step(params["rnn"], cfg.rnn_type, x, state)
    h_new = rnn.state_hidden(cfg.rnn_type, new_state)
    logits = (h_new @ quant.wmat(params["out"]["w"], dtype)
              + params["out"]["b"].astype(dtype)).astype(jnp.float32)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    return log_probs, new_state, weights


def _tf_hoisted_hiddens(
    params, cfg: DecoderConfig, feats, captions, feat_mask, dtype, keys,
) -> jnp.ndarray:
    """Hidden-state core of ``_decode_tf_hoisted``: returns [L-1, B, H] f32
    (no vocab projection) — shared by the fused-loss path, which projects
    inside ``training/fused_loss.py`` in vocab tiles instead."""
    L, B = captions.shape
    E = cfg.embedding_size
    F = feats.shape[2]
    wi = params["rnn"]["wi"]
    H4 = wi.shape[1]

    # The generic path always feeds SOS at step 0 regardless of captions[0]
    # (the data contract puts SOS there, but stay exactly faithful).
    fed = jnp.concatenate(
        [jnp.full((1, B), SOS_ID, captions.dtype), captions[1:-1]], axis=0)
    emb_all = params["embedding"]["table"][fed].astype(dtype)             # [L-1, B, E]
    gi_emb = (jnp.einsum("lbe,eh->lbh", emb_all, wi[:E].astype(dtype))
              + params["rnn"]["bi"].astype(dtype))                       # [L-1, B, H4]
    from mvc_tpu.ops.pallas_beam import _use_factored

    # TRAINING amortization rule: P's build GEMM (2*BT*F*H4, plus ~2x more
    # in its backward) must pay for itself over only L-1 scan steps of
    # 2*B*F*H4 context-gate savings — unlike decode's L~30 forward-only
    # steps.  Break-even is ~T < L-1, false at every reference config
    # (T=28 frames vs L-1 = 7..29 caption steps), so the context rows stay
    # in the scan stream here.
    factored = (feats.shape[1] < L - 1
                and _use_factored(B * feats.shape[1], F, H4))
    P = (feats @ wi[E:].astype(dtype)) if factored else None             # [B, T, H4]

    init_state = rnn.init_state(cfg.rnn_type, B, cfg.rnn_hidden_size, dtype)

    def step(state, gi_t):
        h = rnn.state_hidden(cfg.rnn_type, state)
        _, weights = attn.attend(
            params["attention"], h, feats, keys=keys, mask=feat_mask
        )  # the unused context einsum is dead-coded in the factored branch
        if factored:
            gi = gi_t + jnp.einsum("bt,bth->bh", weights, P)
        else:
            context = jnp.einsum("bt,btf->bf", weights, feats)
            gi = gi_t + context.astype(dtype) @ wi[E:].astype(dtype)
        _, new_state = rnn.rnn_step_pre(params["rnn"], cfg.rnn_type, gi, state)
        return new_state, rnn.state_hidden(cfg.rnn_type, new_state).astype(jnp.float32)

    _, hiddens = jax.lax.scan(step, init_state, gi_emb)                  # [L-1, B, H]
    return hiddens


def _decode_tf_hoisted(
    params, cfg: DecoderConfig, feats, captions, feat_mask, dtype, keys,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Teacher-forced (ratio >= 1) decode with every hoistable GEMM hoisted.

    Under full teacher forcing the fed tokens are the gold captions and the
    in-scan argmax is dead code, so three of the four weight streams leave
    the scan (same observable contract as the generic path):

    - the embedded-side input GEMM runs once over all timesteps
      (``rnn.rnn_input_preact``) instead of re-streaming ``wi`` per step
    - the context rows of ``wi`` either ride the same hoisted GEMM through
      P = feats @ wi_ctx (wide features, ``ops.pallas_beam._use_factored``
      rule) or stay per-step for narrow features where P would inflate reads
    - the vocab projection runs once over the stacked hiddens after the scan

    The scan streams only ``wh`` per step.  Float summation order differs
    from the generic path in the last ulps (preactivation adds reassociate);
    tokens/losses agree to test tolerances (tests/test_decoder.py)."""
    L, B = captions.shape
    hiddens = _tf_hoisted_hiddens(params, cfg, feats, captions, feat_mask, dtype, keys)

    logits = (hiddens.astype(dtype) @ quant.wmat(params["out"]["w"], dtype)
              + params["out"]["b"].astype(dtype)).astype(jnp.float32)
    outs = jax.nn.log_softmax(logits, axis=-1)

    zeros_out = jnp.zeros((1, B, cfg.output_size), jnp.float32)
    zeros_h = jnp.zeros((1, B, cfg.rnn_hidden_size), jnp.float32)
    return (jnp.concatenate([zeros_out, outs], axis=0),
            jnp.concatenate([zeros_h, hiddens], axis=0))


def decode(
    params,
    cfg: DecoderConfig,
    feats: jnp.ndarray,                    # [B, T, F]
    captions: Optional[jnp.ndarray] = None,  # [L, B] int32 gold tokens (or None)
    max_caption_len: int = 30,
    teacher_forcing_ratio: float = 1.0,
    rng: Optional[jax.Array] = None,
    feat_mask: Optional[jnp.ndarray] = None,
    dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full-sentence decode as one ``lax.scan``
    (reference decode/forward_sentence, src/models/features_captioning.py:91-129).

    Returns (outputs [L, B, V] log-probs, hiddens [L, B, H])."""
    B = feats.shape[0]
    L = int(captions.shape[0]) if captions is not None else int(max_caption_len)
    feats = feats.astype(dtype)
    keys = attn.precompute_keys(params["attention"], feats)

    if (captions is not None and teacher_forcing_ratio >= 1.0 and L > 1
            and not quant.is_quantized(params["rnn"]["wi"])):
        return _decode_tf_hoisted(params, cfg, feats, captions, feat_mask, dtype, keys)

    # One teacher-forcing coin per timestep for the whole batch
    # (reference src/models/features_captioning.py:116).
    if captions is not None and teacher_forcing_ratio > 0:
        if rng is None:
            rng = jax.random.PRNGKey(0)
        use_tf = jax.random.bernoulli(rng, teacher_forcing_ratio, (L,))
    else:
        use_tf = jnp.zeros((L,), dtype=bool)

    gold = captions if captions is not None else jnp.zeros((L, B), dtype=jnp.int32)
    init_state = rnn.init_state(cfg.rnn_type, B, cfg.rnn_hidden_size, dtype)
    init_prev = jnp.full((B,), SOS_ID, dtype=jnp.int32)

    def step(carry, xs):
        prev, state = carry
        gold_t, tf_t = xs
        log_probs, new_state, _ = decoder_step(
            params, cfg, prev, state, feats, keys, feat_mask, dtype
        )
        top1 = jnp.argmax(log_probs, axis=-1).astype(jnp.int32)
        next_prev = jnp.where(tf_t, gold_t, top1)
        h = rnn.state_hidden(cfg.rnn_type, new_state).astype(jnp.float32)
        return (next_prev, new_state), (log_probs, h)

    xs = (gold[1:], use_tf[1:]) if L > 1 else (gold[:0], use_tf[:0])
    (_, _), (outs, hiddens) = jax.lax.scan(step, (init_prev, init_state), xs)

    zeros_out = jnp.zeros((1, B, cfg.output_size), jnp.float32)
    zeros_h = jnp.zeros((1, B, cfg.rnn_hidden_size), jnp.float32)
    outputs = jnp.concatenate([zeros_out, outs], axis=0)
    hidden_states = jnp.concatenate([zeros_h, hiddens], axis=0)
    return outputs, hidden_states


def decode_hiddens(
    params,
    cfg: DecoderConfig,
    feats: jnp.ndarray,                    # [B, T, F]
    captions: jnp.ndarray,                 # [L, B] int32 gold tokens
    teacher_forcing_ratio: float = 1.0,
    rng: Optional[jax.Array] = None,
    feat_mask: Optional[jnp.ndarray] = None,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Hiddens-only training decode: identical decoder trajectory to
    ``decode`` (same teacher-forcing coins, same argmax feeds) but the
    per-step [B, V] log-probs are consumed in-scan for token selection only
    and never stacked — the fused-loss path (training/fused_loss.py)
    recomputes the vocab projection in tiles instead.

    Returns hiddens [L, B, H] f32 with row 0 zeroed (the stacked contract).
    """
    B = feats.shape[0]
    L = int(captions.shape[0])
    feats = feats.astype(dtype)
    keys = attn.precompute_keys(params["attention"], feats)

    if (teacher_forcing_ratio >= 1.0 and L > 1
            and not quant.is_quantized(params["rnn"]["wi"])):
        hiddens = _tf_hoisted_hiddens(params, cfg, feats, captions, feat_mask, dtype, keys)
    else:
        # Same coin stream as ``decode`` (one Bernoulli per timestep).
        if teacher_forcing_ratio > 0:
            if rng is None:
                rng = jax.random.PRNGKey(0)
            use_tf = jax.random.bernoulli(rng, teacher_forcing_ratio, (L,))
        else:
            use_tf = jnp.zeros((L,), dtype=bool)
        init_state = rnn.init_state(cfg.rnn_type, B, cfg.rnn_hidden_size, dtype)
        init_prev = jnp.full((B,), SOS_ID, dtype=jnp.int32)

        def step(carry, xs):
            prev, state = carry
            gold_t, tf_t = xs
            log_probs, new_state, _ = decoder_step(
                params, cfg, prev, state, feats, keys, feat_mask, dtype
            )
            top1 = jnp.argmax(log_probs, axis=-1).astype(jnp.int32)
            next_prev = jnp.where(tf_t, gold_t, top1)
            h = rnn.state_hidden(cfg.rnn_type, new_state).astype(jnp.float32)
            return (next_prev, new_state), h

        xs = (captions[1:], use_tf[1:]) if L > 1 else (captions[:0], use_tf[:0])
        (_, _), hiddens = jax.lax.scan(step, (init_prev, init_state), xs)

    zeros_h = jnp.zeros((1, B, cfg.rnn_hidden_size), jnp.float32)
    return jnp.concatenate([zeros_h, hiddens], axis=0)


def greedy_tokens(outputs: jnp.ndarray) -> jnp.ndarray:
    """[L, B, V] log-probs -> [B, L] argmax tokens
    (reference src/models/captioning.py:140)."""
    return jnp.argmax(outputs, axis=2).T


def decode_greedy_tokens(
    params,
    cfg: DecoderConfig,
    feats: jnp.ndarray,                    # [B, T, F]
    max_caption_len: int = 30,
    feat_mask: Optional[jnp.ndarray] = None,
    dtype=jnp.float32,
    stop_at_all_eos: bool = False,
) -> jnp.ndarray:
    """Tokens-only greedy decode: the same per-step math as
    ``greedy_tokens(decode(captions=None)[0])`` but the argmax runs inside
    the scan and only [L, B] token ids ever leave it — the [L, B, V]
    log-prob stack (30 x 1024 x 4000 f32 = 492 MB per decoder at the bulk
    offline-scoring shape) is never materialized.  Bitwise-identical tokens:
    position 0 is the stacked contract's argmax-of-zeros = 0.

    ``stop_at_all_eos``: stop decoding once every row has emitted EOS;
    later positions hold 0 instead of the reference's free-running
    continuation.  Caption TEXT is identical (``decode_indexes`` stops at
    the first EOS), so this is a pure wall-clock win for real-data eval —
    but token arrays differ post-EOS, hence opt-in (PARITY.md).

    Returns [B, L] int32 (same contract as ``greedy_tokens``)."""
    B = feats.shape[0]
    L = int(max_caption_len)
    params = cast_params_for_decode(params, dtype)
    feats = feats.astype(dtype)
    keys = attn.precompute_keys(params["attention"], feats)
    P = factored_P(params, feats, dtype)
    init_state = rnn.init_state(cfg.rnn_type, B, cfg.rnn_hidden_size, dtype)
    init_prev = jnp.full((B,), SOS_ID, dtype=jnp.int32)

    def one_step(prev, state):
        log_probs, new_state, _ = decoder_step(
            params, cfg, prev, state, feats, keys, feat_mask, dtype, P=P
        )
        top1 = jnp.argmax(log_probs, axis=-1).astype(jnp.int32)
        return top1, new_state

    if stop_at_all_eos:
        from mvc_tpu.config import EOS_ID

        def cond(c):
            t, seen = c[0], c[1]
            return jnp.logical_and(t < L - 1, jnp.logical_not(jnp.all(seen)))

        def body(c):
            t, seen, prev, state, toks = c
            top1, new_state = one_step(prev, state)
            toks = jax.lax.dynamic_update_index_in_dim(toks, top1, t, axis=0)
            return (t + 1, seen | (top1 == EOS_ID), top1, new_state, toks)

        out = jax.lax.while_loop(cond, body, (
            jnp.asarray(0, jnp.int32), jnp.zeros((B,), bool),
            init_prev, init_state, jnp.zeros((L - 1, B), jnp.int32)))
        toks = out[4]
    else:
        def step(carry, _):
            prev, state = carry
            top1, new_state = one_step(prev, state)
            return (top1, new_state), top1

        _, toks = jax.lax.scan(step, (init_prev, init_state), None, length=L - 1)
    zeros = jnp.zeros((1, B), jnp.int32)
    return jnp.concatenate([zeros, toks], axis=0).T


def decoder_beam_step(
    params,
    cfg: DecoderConfig,
    prev_tokens: jnp.ndarray,        # [B, W] int32
    state,                           # rnn state with [B, W, H] leaves
    feats: jnp.ndarray,              # [B, T, F]
    keys: jnp.ndarray,               # [B, T, A]
    feat_mask: Optional[jnp.ndarray],  # [B, T] or None
    dtype=jnp.float32,
    P: Optional[jnp.ndarray] = None,  # [B, T, G*H] factored_P (or None)
):
    """Beam-batched word step.  The attention keys are broadcast over the
    beam axis (no [B*W, T, F] feature copies in HBM); the RNN cell operates
    directly on [B, W, *] tensors since it is pure matmul + elementwise.

    Returns (log_probs [B, W, V] f32, new_state)."""
    ap = params["attention"]
    embedded = params["embedding"]["table"][prev_tokens].astype(dtype)   # [B, W, E]
    h = rnn.state_hidden(cfg.rnn_type, state)                            # [B, W, H]
    query = h @ ap["W"].astype(dtype)                                    # [B, W, A]
    energies = jnp.tanh(
        query[:, :, None, :] + keys[:, None, :, :] + ap["b"].astype(dtype)
    ) @ ap["w"].astype(dtype)                                            # [B, W, T]
    mask = feat_mask[:, None, :] if feat_mask is not None else None
    weights = attn.masked_softmax(energies, mask, axis=-1)
    if P is not None:
        E = embedded.shape[-1]
        wi = params["rnn"]["wi"]
        gi = (embedded @ wi[:E].astype(dtype) + params["rnn"]["bi"].astype(dtype)
              + jnp.einsum("bwt,bth->bwh", weights, P))
        _, new_state = rnn.rnn_step_pre(params["rnn"], cfg.rnn_type, gi, state)
    else:
        context = jnp.einsum("bwt,btf->bwf", weights, feats)             # [B, W, F]
        x = jnp.concatenate([embedded, context.astype(dtype)], axis=-1)
        _, new_state = rnn.rnn_step(params["rnn"], cfg.rnn_type, x, state)
    h_new = rnn.state_hidden(cfg.rnn_type, new_state)
    logits = (h_new @ quant.wmat(params["out"]["w"], dtype)
              + params["out"]["b"].astype(dtype)).astype(jnp.float32)
    return jax.nn.log_softmax(logits, axis=-1), new_state
