"""Whole-decode fused Pallas kernels vs the XLA scan paths — exact token
parity in interpret mode on CPU (hardware parity is conditioning-limited;
see BENCH_NOTES.md)."""

import numpy as np
import jax
import jax.numpy as jnp


def test_pallas_fused_greedy_decode_matches_xla(rng):
    """Whole-decode fused kernel (ops/pallas_decode.py) must produce the
    exact greedy token ids of the XLA scan path (f32 weights, interpret)."""
    from mvc_tpu.config import DecoderConfig
    from mvc_tpu.models import decoder as dec
    from mvc_tpu.ops.pallas_decode import greedy_decode_pallas

    cfg = DecoderConfig(in_feature_size=24, rnn_hidden_size=16, embedding_size=8,
                        attn_size=8, output_size=31)
    params = dec.init_decoder(jax.random.PRNGKey(1), cfg)
    B, T, L = 4, 5, 9
    feats = jnp.asarray(rng.normal(size=(B, T, 24)).astype(np.float32))
    mask = np.ones((B, T), bool)
    mask[1, 3:] = False
    mask = jnp.asarray(mask)

    outputs, _ = dec.decode(params, cfg, feats, captions=None,
                            max_caption_len=L, feat_mask=mask)
    ref_tokens = np.asarray(dec.greedy_tokens(outputs))
    tok = np.asarray(greedy_decode_pallas(
        params, feats, feat_mask=mask, max_caption_len=L,
        weight_dtype="float32", interpret=True,
    ))
    np.testing.assert_array_equal(tok, ref_tokens)

    # unmasked + non-default tiles (still clamped to the tiny dims)
    out2, _ = dec.decode(params, cfg, feats, captions=None, max_caption_len=L)
    tok2 = np.asarray(greedy_decode_pallas(
        params, feats, max_caption_len=L, tile_g=8, tile_v=256,
        weight_dtype="float32", interpret=True,
    ))
    np.testing.assert_array_equal(tok2, np.asarray(dec.greedy_tokens(out2)))


def test_pallas_fused_beam_single_decoder_matches_xla(rng):
    """Whole-search fused beam kernel (ops/pallas_beam.py) must produce the
    exact token ids of the XLA scan beam (f32 weights, interpret mode)."""
    from mvc_tpu.config import DecoderConfig
    from mvc_tpu.models import beam as beam_mod
    from mvc_tpu.models import decoder as dec
    from mvc_tpu.models.captioning import _beam_init_state
    from mvc_tpu.ops.pallas_beam import beam_decode_pallas

    cfg = DecoderConfig(in_feature_size=24, rnn_hidden_size=16, embedding_size=8,
                        attn_size=8, output_size=31)
    params = dec.init_decoder(jax.random.PRNGKey(1), cfg)
    B, T, L, W = 3, 4, 9, 3
    feats = jnp.asarray(rng.normal(size=(B, T, 24)).astype(np.float32))
    mask = np.ones((B, T), bool)
    mask[2, 2:] = False
    mask = jnp.asarray(mask)
    keys = __import__("mvc_tpu.models.attention", fromlist=["precompute_keys"]).precompute_keys(
        params["attention"], feats
    )

    def step_fn(prev, state):
        return dec.decoder_beam_step(params, cfg, prev, state, feats, keys, mask, jnp.float32)

    init_state = _beam_init_state(cfg.rnn_type, B, W, cfg.rnn_hidden_size, jnp.float32)
    ref = np.asarray(beam_mod.beam_search(
        step_fn, init_state, B, 31, max_caption_len=L, beam_alpha=0.0, beam_width=W,
    ))
    tok = np.asarray(beam_decode_pallas(
        [params], [feats], feat_mask=mask, max_caption_len=L, beam_width=W,
        beam_alpha=0.0, weight_dtype="float32", interpret=True,
    ))
    np.testing.assert_array_equal(tok, ref)


def test_pallas_fused_beam_dual_matches_xla(rng):
    """Dual-decoder (summed log-probs) fused beam, masked, alpha 0 and >0."""
    from mvc_tpu.config import DecoderConfig
    from mvc_tpu.models import attention as attn
    from mvc_tpu.models import beam as beam_mod
    from mvc_tpu.models import decoder as dec
    from mvc_tpu.models.captioning import _beam_init_state
    from mvc_tpu.ops.pallas_beam import beam_decode_pallas

    vcfg = DecoderConfig(in_feature_size=24, rnn_hidden_size=16, embedding_size=8,
                         attn_size=8, output_size=29)
    acfg = DecoderConfig(in_feature_size=12, rnn_hidden_size=16, embedding_size=10,
                         attn_size=8, output_size=29)
    vp = dec.init_decoder(jax.random.PRNGKey(1), vcfg)
    ap = dec.init_decoder(jax.random.PRNGKey(2), acfg)
    B, T, L, W = 4, 6, 11, 4
    vfeats = jnp.asarray(rng.normal(size=(B, T, 24)).astype(np.float32))
    afeats = jnp.asarray(rng.normal(size=(B, T, 12)).astype(np.float32))
    mask = np.ones((B, T), bool)
    mask[1, 4:] = False
    mask[3, 2:] = False
    mask = jnp.asarray(mask)
    vkeys = attn.precompute_keys(vp["attention"], vfeats)
    akeys = attn.precompute_keys(ap["attention"], afeats)

    for alpha in (0.0, 0.7):
        def step_fn(prev, state):
            vs, as_ = state
            vlp, vnew = dec.decoder_beam_step(vp, vcfg, prev, vs, vfeats, vkeys, mask, jnp.float32)
            alp, anew = dec.decoder_beam_step(ap, acfg, prev, as_, afeats, akeys, mask, jnp.float32)
            return vlp + alp, (vnew, anew)

        init_state = (
            _beam_init_state("LSTM", B, W, 16, jnp.float32),
            _beam_init_state("LSTM", B, W, 16, jnp.float32),
        )
        ref = np.asarray(beam_mod.beam_search(
            step_fn, init_state, B, 29, max_caption_len=L, beam_alpha=alpha, beam_width=W,
        ))
        tok = np.asarray(beam_decode_pallas(
            [vp, ap], [vfeats, afeats], feat_mask=mask, max_caption_len=L,
            beam_width=W, beam_alpha=alpha, weight_dtype="float32", interpret=True,
        ))
        np.testing.assert_array_equal(tok, ref)


def test_pallas_fused_dual_greedy_matches_xla(rng):
    """Whole-decode fused dual-direct kernel (ops/pallas_dual_greedy.py):
    each decoder free-runs on its own argmax, the output stream argmaxes the
    fused log-probs — exact token parity vs the XLA dual path."""
    import jax.numpy as jnp

    from mvc_tpu.config import DecoderConfig
    from mvc_tpu.models import decoder as dec
    from mvc_tpu.models.captioning import dual_decode_fused
    from mvc_tpu.ops.pallas_dual_greedy import dual_greedy_decode_pallas

    vcfg = DecoderConfig(in_feature_size=24, rnn_hidden_size=16, embedding_size=8,
                         attn_size=8, output_size=29)
    acfg = DecoderConfig(in_feature_size=12, rnn_hidden_size=32, embedding_size=10,
                         attn_size=16, output_size=29)
    vp = dec.init_decoder(jax.random.PRNGKey(3), vcfg)
    ap = dec.init_decoder(jax.random.PRNGKey(4), acfg)
    B, T, L = 5, 4, 9
    vfeats = jnp.asarray(rng.normal(size=(B, T, 24)).astype(np.float32))
    afeats = jnp.asarray(rng.normal(size=(B, T, 12)).astype(np.float32))
    mask = np.ones((B, T), bool)
    mask[2, 3:] = False
    mask = jnp.asarray(mask)

    v_out, _, a_out, _ = dual_decode_fused(
        vp, ap, vcfg, acfg, vfeats, afeats, captions=None,
        teacher_forcing_ratio=0.0, rng=None, feat_mask=mask,
        dtype=jnp.float32, max_caption_len=L,
    )
    ref = np.asarray(dec.greedy_tokens(v_out + a_out))
    tok = np.asarray(dual_greedy_decode_pallas(
        [vp, ap], [vfeats, afeats], feat_mask=mask, max_caption_len=L,
        weight_dtype="float32", interpret=True,
    ))
    np.testing.assert_array_equal(tok, ref)


def test_dispatch_enable_pallas_override():
    """enable_pallas() beats the env var; both gate on a TPU backend (tests
    run on CPU, so use_pallas stays False either way — the TPU-only guard)."""
    import os

    from mvc_tpu.ops import dispatch

    try:
        dispatch.enable_pallas(True)
        assert dispatch.use_pallas() is False        # CPU backend: gated off
        os.environ["MVC_PALLAS"] = "1"
        dispatch.enable_pallas(False)
        assert dispatch.use_pallas() is False        # override beats env var
    finally:
        os.environ.pop("MVC_PALLAS", None)
        dispatch._override = None


def test_pallas_fused_beam_early_exit_parity(rng):
    """EOS-heavy weights finish all beams early; the kernel's early exit
    (stop after one step that begins all-finished) must stay token-identical
    to the full-L XLA scan."""
    from mvc_tpu.config import EOS_ID, DecoderConfig
    from mvc_tpu.models import attention as attn
    from mvc_tpu.models import beam as beam_mod
    from mvc_tpu.models import decoder as dec
    from mvc_tpu.models.captioning import _beam_init_state
    from mvc_tpu.ops.pallas_beam import beam_decode_pallas

    cfg = DecoderConfig(in_feature_size=24, rnn_hidden_size=16, embedding_size=8,
                        attn_size=8, output_size=31)
    params = dec.init_decoder(jax.random.PRNGKey(5), cfg)
    # strong EOS bias: beams finish within a few steps of the 20-step budget
    params["out"]["b"] = params["out"]["b"].at[EOS_ID].add(4.0)
    B, T, L, W = 4, 4, 20, 3
    feats = jnp.asarray(rng.normal(size=(B, T, 24)).astype(np.float32))
    keys = attn.precompute_keys(params["attention"], feats)

    def step_fn(prev, state):
        return dec.decoder_beam_step(params, cfg, prev, state, feats, keys, None, jnp.float32)

    init_state = _beam_init_state(cfg.rnn_type, B, W, cfg.rnn_hidden_size, jnp.float32)
    ref = np.asarray(beam_mod.beam_search(
        step_fn, init_state, B, 31, max_caption_len=L, beam_alpha=0.7, beam_width=W,
    ))
    tok = np.asarray(beam_decode_pallas(
        [params], [feats], max_caption_len=L, beam_width=W, beam_alpha=0.7,
        weight_dtype="float32", interpret=True,
    ))
    # sanity: EOS actually fired well before L (the early exit is exercised)
    assert (ref[:, 1:] == EOS_ID).any(axis=1).all()
    np.testing.assert_array_equal(tok, ref)


def test_pallas_fused_greedy_gru_matches_xla(rng):
    """GRU-cell variant of the fused greedy kernel: exact token parity with
    the XLA scan (torch GRU semantics — the recurrent n-gate bias stays
    inside the reset product)."""
    from mvc_tpu.config import DecoderConfig
    from mvc_tpu.models import decoder as dec
    from mvc_tpu.ops.pallas_decode import greedy_decode_pallas

    cfg = DecoderConfig(in_feature_size=20, rnn_hidden_size=16, embedding_size=12,
                        attn_size=8, output_size=33, rnn_type="GRU")
    params = dec.init_decoder(jax.random.PRNGKey(2), cfg)
    B, T, L = 4, 5, 9
    feats = jnp.asarray(rng.normal(size=(B, T, 20)).astype(np.float32))
    mask = np.ones((B, T), bool)
    mask[1, 3:] = False
    mask = jnp.asarray(mask)

    out, _ = dec.decode(params, cfg, feats, captions=None, max_caption_len=L,
                        feat_mask=mask, dtype=jnp.float32)
    ref = np.asarray(dec.greedy_tokens(out))
    tok = np.asarray(greedy_decode_pallas(
        params, feats, feat_mask=mask, max_caption_len=L,
        weight_dtype="float32", interpret=True, rnn_type="GRU",
    ))
    np.testing.assert_array_equal(tok, ref)


def test_pallas_fused_dual_greedy_gru_matches_xla(rng):
    """Dual-direct fused kernel with a GRU visual decoder and an LSTM audio
    decoder (mixed cells): exact token parity with the XLA dual path."""
    import jax.numpy as jnp

    from mvc_tpu.config import DecoderConfig
    from mvc_tpu.models import decoder as dec
    from mvc_tpu.models.captioning import dual_decode_fused
    from mvc_tpu.ops.pallas_dual_greedy import dual_greedy_decode_pallas

    vcfg = DecoderConfig(in_feature_size=24, rnn_hidden_size=16, embedding_size=8,
                         attn_size=8, output_size=29, rnn_type="GRU")
    acfg = DecoderConfig(in_feature_size=12, rnn_hidden_size=32, embedding_size=10,
                         attn_size=16, output_size=29, rnn_type="LSTM")
    vp = dec.init_decoder(jax.random.PRNGKey(7), vcfg)
    ap = dec.init_decoder(jax.random.PRNGKey(8), acfg)
    B, T, L = 4, 4, 8
    vfeats = jnp.asarray(rng.normal(size=(B, T, 24)).astype(np.float32))
    afeats = jnp.asarray(rng.normal(size=(B, T, 12)).astype(np.float32))

    v_out, _, a_out, _ = dual_decode_fused(
        vp, ap, vcfg, acfg, vfeats, afeats, captions=None,
        teacher_forcing_ratio=0.0, rng=None, feat_mask=None,
        dtype=jnp.float32, max_caption_len=L,
    )
    ref = np.asarray(dec.greedy_tokens(v_out + a_out))
    tok = np.asarray(dual_greedy_decode_pallas(
        [vp, ap], [vfeats, afeats], max_caption_len=L,
        weight_dtype="float32", interpret=True, rnn_types=("GRU", "LSTM"),
    ))
    np.testing.assert_array_equal(tok, ref)


def test_pallas_fused_beam_gru_matches_xla(rng):
    """Beam kernel with GRU decoders (wi-only streaming, VMEM-resident wh):
    exact token parity vs the XLA scan beam, single and mixed dual."""
    from mvc_tpu.config import DecoderConfig
    from mvc_tpu.models import attention as attn
    from mvc_tpu.models import beam as beam_mod
    from mvc_tpu.models import decoder as dec
    from mvc_tpu.models.captioning import _beam_init_state
    from mvc_tpu.ops.pallas_beam import beam_decode_pallas

    gcfg = DecoderConfig(in_feature_size=24, rnn_hidden_size=16, embedding_size=8,
                         attn_size=8, output_size=29, rnn_type="GRU")
    lcfg = DecoderConfig(in_feature_size=12, rnn_hidden_size=32, embedding_size=10,
                         attn_size=8, output_size=29, rnn_type="LSTM")
    gp = dec.init_decoder(jax.random.PRNGKey(9), gcfg)
    lp = dec.init_decoder(jax.random.PRNGKey(10), lcfg)
    B, T, L, W = 3, 4, 8, 3
    gfeats = jnp.asarray(rng.normal(size=(B, T, 24)).astype(np.float32))
    lfeats = jnp.asarray(rng.normal(size=(B, T, 12)).astype(np.float32))
    mask = np.ones((B, T), bool)
    mask[0, 2:] = False
    mask = jnp.asarray(mask)
    gkeys = attn.precompute_keys(gp["attention"], gfeats)
    lkeys = attn.precompute_keys(lp["attention"], lfeats)

    # single GRU decoder
    def g_step(prev, state):
        return dec.decoder_beam_step(gp, gcfg, prev, state, gfeats, gkeys, mask, jnp.float32)

    ref = np.asarray(beam_mod.beam_search(
        g_step, _beam_init_state("GRU", B, W, 16, jnp.float32), B, 29,
        max_caption_len=L, beam_alpha=0.0, beam_width=W,
    ))
    tok = np.asarray(beam_decode_pallas(
        [gp], [gfeats], feat_mask=mask, max_caption_len=L, beam_width=W,
        weight_dtype="float32", interpret=True, rnn_types=("GRU",),
    ))
    np.testing.assert_array_equal(tok, ref)

    # mixed GRU + LSTM dual, alpha > 0
    def d_step(prev, state):
        gs, ls = state
        glp, gnew = dec.decoder_beam_step(gp, gcfg, prev, gs, gfeats, gkeys, mask, jnp.float32)
        llp, lnew = dec.decoder_beam_step(lp, lcfg, prev, ls, lfeats, lkeys, mask, jnp.float32)
        return glp + llp, (gnew, lnew)

    init = (_beam_init_state("GRU", B, W, 16, jnp.float32),
            _beam_init_state("LSTM", B, W, 32, jnp.float32))
    ref2 = np.asarray(beam_mod.beam_search(
        d_step, init, B, 29, max_caption_len=L, beam_alpha=0.7, beam_width=W,
    ))
    tok2 = np.asarray(beam_decode_pallas(
        [gp, lp], [gfeats, lfeats], feat_mask=mask, max_caption_len=L,
        beam_width=W, beam_alpha=0.7, weight_dtype="float32", interpret=True,
        rnn_types=("GRU", "LSTM"),
    ))
    np.testing.assert_array_equal(tok2, ref2)
