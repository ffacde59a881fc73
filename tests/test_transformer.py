"""Transformer captioner: shape/contract tests, causality, greedy/beam decode,
loss-contract compatibility, and trainability (the reference's transformer is
dead code that would crash — ours must actually work)."""

import numpy as np
import jax
import jax.numpy as jnp

from mvc_tpu.config import SOS_ID
from mvc_tpu.models.transformer import TransformerCaptioning, TransformerConfig
from mvc_tpu.training.losses import ModalityWiseReconstructionLossBuilder

CFG = TransformerConfig(d_model=32, num_heads=4, num_layers=2, d_ff=64, max_len=64)
V = 29


def _setup(rng, B=2, T=5, L=8):
    model = TransformerCaptioning(vocab_size=V, config=CFG)
    params = model.init(jax.random.PRNGKey(0))
    audio = jnp.asarray(rng.normal(size=(B, T, 128)).astype(np.float32))
    visual = jnp.asarray(rng.normal(size=(B, T, 2048)).astype(np.float32))
    captions = rng.integers(3, V, size=(L, B)).astype(np.int32)
    captions[0] = SOS_ID
    return model, params, audio, visual, jnp.asarray(captions)


def test_forward_contract(rng):
    model, params, audio, visual, captions = _setup(rng)
    outputs, a_rec, v_rec = model.forward(params, audio, visual, captions)
    L, B = captions.shape
    assert outputs.shape == (L, B, V)
    assert a_rec is None and v_rec is None
    assert np.all(np.asarray(outputs[0]) == 0)
    # fused log-probs: exp sums to 1 only per modality; fused is an average of
    # two log-softmaxes, still finite and <= 0 after each component
    assert np.all(np.isfinite(np.asarray(outputs)))


def test_causality(rng):
    """Changing a later caption token must not affect earlier outputs."""
    model, params, audio, visual, captions = _setup(rng)
    out1, _, _ = model.forward(params, audio, visual, captions)
    captions2 = np.asarray(captions).copy()
    captions2[-1] = (captions2[-1] + 1) % (V - 3) + 3
    out2, _, _ = model.forward(params, audio, visual, jnp.asarray(captions2))
    L = captions.shape[0]
    np.testing.assert_allclose(
        np.asarray(out1[: L - 1]), np.asarray(out2[: L - 1]), rtol=1e-5, atol=1e-6
    )


def test_greedy_and_beam_decode(rng):
    model, params, audio, visual, _ = _setup(rng)
    greedy = model.predict_tokens(params, audio, visual, max_caption_len=6, mode="direct")
    assert greedy.shape == (2, 6)
    assert np.all(np.asarray(greedy)[:, 0] == SOS_ID)
    beam = model.predict_tokens(params, audio, visual, max_caption_len=6, mode="beam", beam_width=2)
    assert beam.shape == (2, 8)
    # width-1 beam follows the greedy trajectory until EOS
    beam1 = np.asarray(model.predict_tokens(params, audio, visual, max_caption_len=6,
                                            mode="beam", beam_width=1))
    g = np.asarray(greedy)
    for b in range(2):
        for t in range(1, 6):
            assert beam1[b, t] == g[b, t]
            if beam1[b, t] == 2:
                break


def test_feat_mask_equals_truncation(rng):
    model, params, audio, visual, captions = _setup(rng, B=2, T=6)
    T_real = 4
    audio_p = np.asarray(audio).copy(); audio_p[:, T_real:] = 0
    visual_p = np.asarray(visual).copy(); visual_p[:, T_real:] = 0
    mask = np.zeros((2, 6), bool); mask[:, :T_real] = True

    out_masked, _, _ = model.forward(
        params, jnp.asarray(audio_p), jnp.asarray(visual_p), captions,
        feat_mask=jnp.asarray(mask),
    )
    out_trunc, _, _ = model.forward(
        params, audio[:, :T_real], visual[:, :T_real], captions
    )
    np.testing.assert_allclose(
        np.asarray(out_masked), np.asarray(out_trunc), rtol=1e-4, atol=1e-5
    )


def test_trains_with_shared_loss(rng):
    model, params, audio, visual, captions = _setup(rng)
    loss_fn = ModalityWiseReconstructionLossBuilder(0.0005, 0.0, 0.0, rec_type="none")

    def loss_of(p):
        outputs, _, _ = model.forward(p, audio, visual, captions)
        return loss_fn(outputs, captions)[0]

    l0 = float(loss_of(params))
    grads = jax.grad(loss_of)(params)
    gnorm = sum(float(jnp.sum(g ** 2)) for g in jax.tree.leaves(grads)) ** 0.5
    assert np.isfinite(l0) and gnorm > 0
    # one SGD step reduces the loss
    params2 = jax.tree.map(lambda p, g: p - 0.05 * g, params, grads)
    assert float(loss_of(params2)) < l0


def test_incremental_greedy_matches_full_prefix(rng):
    """The KV-cached incremental greedy decode must produce the exact tokens
    of a full-prefix re-decode at every step (ROADMAP #6)."""
    import jax.numpy as jnp

    from mvc_tpu.config import SOS_ID

    model, params, audio, visual, _ = _setup(rng)
    mask = np.ones(audio.shape[:2], bool)
    mask[1, 2:] = False
    mask = jnp.asarray(mask)
    L = 7

    tokens = np.asarray(model.predict_tokens(
        params, audio, visual, max_caption_len=L, mode="direct", feat_mask=mask))

    # full-prefix oracle: re-decode the whole token matrix per step
    a_mem, v_mem, cross_mask = model._encode(params, audio, visual, mask)
    B = visual.shape[0]
    full = np.full((B, L), SOS_ID, dtype=np.int32)
    for t in range(1, L):
        logp = np.asarray(model._decode_logits(
            params, jnp.asarray(full), a_mem, v_mem, cross_mask))
        full[:, t] = logp[:, t - 1].argmax(-1)

    np.testing.assert_array_equal(tokens, full)


def test_cached_beam_matches_full_prefix(rng):
    """The KV-cached beam must produce the exact tokens of the full-prefix
    beam formulation (the caches travel [B, W, Lh, D] through beam_search's
    regather, so beam reordering must permute them correctly)."""
    from mvc_tpu.models import beam as beam_mod

    model, params, audio, visual, _ = _setup(rng, B=3, T=5)
    mask = np.ones(audio.shape[:2], bool)
    mask[2, 3:] = False
    mask = jnp.asarray(mask)

    for alpha, W, L in ((0.0, 3, 7), (0.7, 4, 6)):
        tokens = np.asarray(model.predict_tokens(
            params, audio, visual, max_caption_len=L, mode="beam",
            beam_width=W, beam_alpha=alpha, feat_mask=mask))

        # full-prefix oracle: the pre-cache step_fn (re-decode the whole
        # token matrix each step, pick position t)
        a_mem, v_mem, cross_mask = model._encode(params, audio, visual, mask)
        B = visual.shape[0]
        a_rep = jnp.repeat(a_mem, W, axis=0)
        v_rep = jnp.repeat(v_mem, W, axis=0)
        c_rep = jnp.repeat(cross_mask, W, axis=0)
        Lh = L + 2

        def step_fn(prev, state):
            toks, t = state
            toks = jax.lax.dynamic_update_index_in_dim(toks, prev, t, 2)
            flat = toks.reshape(B * W, Lh)
            logp = model._decode_logits(params, flat, a_rep, v_rep, c_rep)
            logp_t = jax.lax.dynamic_index_in_dim(logp, t, axis=1, keepdims=False)
            return logp_t.reshape(B, W, -1), (toks, t + 1)

        init_tokens = jnp.full((B, W, Lh), SOS_ID, dtype=jnp.int32)
        ref = np.asarray(beam_mod.beam_search(
            step_fn, (init_tokens, jnp.asarray(0, jnp.int32)), B, V,
            max_caption_len=L, beam_alpha=alpha, beam_width=W))

        np.testing.assert_array_equal(tokens, ref)
