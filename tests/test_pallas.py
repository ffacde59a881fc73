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
    for resident in (False, True):     # streaming-tile AND resident-weight kernels
        tok = np.asarray(greedy_decode_pallas(
            params, feats, feat_mask=mask, max_caption_len=L,
            weight_dtype="float32", interpret=True, resident=resident,
        ))
        np.testing.assert_array_equal(tok, ref_tokens)

    # unmasked + non-default tiles (still clamped to the tiny dims)
    out2, _ = dec.decode(params, cfg, feats, captions=None, max_caption_len=L)
    tok2 = np.asarray(greedy_decode_pallas(
        params, feats, max_caption_len=L, tile_g=8, tile_v=256,
        weight_dtype="float32", interpret=True, resident=False,
    ))
    np.testing.assert_array_equal(tok2, np.asarray(dec.greedy_tokens(out2)))


def test_pallas_greedy_resident_unfactored_and_auto(rng):
    """Resident-weight kernel on the UNFACTORED slab path (narrow features:
    the context rows live inside the resident wi), plus the auto rule:
    the headline shape selects resident; small batches (measured crossover,
    BENCH_NOTES round 4b) and absurd vocabs don't."""
    from mvc_tpu.config import DecoderConfig
    from mvc_tpu.models import decoder as dec
    from mvc_tpu.ops.pallas_decode import _resident_fits, greedy_decode_pallas

    # F=4, H=16 -> BT*H4 >= BT*F + F*H4 -> factored False
    cfg = DecoderConfig(in_feature_size=4, rnn_hidden_size=16, embedding_size=8,
                        attn_size=8, output_size=27)
    params = dec.init_decoder(jax.random.PRNGKey(3), cfg)
    B, T, L = 4, 6, 8
    from mvc_tpu.ops.pallas_beam import _use_factored
    assert not _use_factored(B * T, 4, 64)
    feats = jnp.asarray(rng.normal(size=(B, T, 4)).astype(np.float32))
    mask = np.ones((B, T), bool)
    mask[2, 1:] = False
    mask = jnp.asarray(mask)

    out, _ = dec.decode(params, cfg, feats, captions=None, max_caption_len=L,
                        feat_mask=mask)
    ref = np.asarray(dec.greedy_tokens(out))
    for resident in (False, True, None):   # None = auto (streaming at B=4)
        tok = np.asarray(greedy_decode_pallas(
            params, feats, feat_mask=mask, max_caption_len=L,
            weight_dtype="float32", interpret=True, resident=resident,
        ))
        np.testing.assert_array_equal(tok, ref)

    # auto rule: the headline shape fits; small batch (measured crossover)
    # and a 2M-row vocab projection don't
    assert _resident_fits(B=64, T=16, Fslab=2048, A=256, E=300, H=512,
                          H4=2048, Vp=4096, Kp=512, itemsize=2)
    assert not _resident_fits(B=32, T=16, Fslab=2048, A=256, E=300, H=512,
                              H4=2048, Vp=4096, Kp=512, itemsize=2)
    assert not _resident_fits(B=64, T=16, Fslab=2048, A=256, E=300, H=512,
                              H4=2048, Vp=2_000_000, Kp=512, itemsize=2)


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
    for resident in (False, True):   # streaming-tile AND resident-weight kernels
        tok = np.asarray(beam_decode_pallas(
            [params], [feats], feat_mask=mask, max_caption_len=L, beam_width=W,
            beam_alpha=0.0, weight_dtype="float32", interpret=True,
            resident=resident,
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
        for resident in (False, True):
            tok = np.asarray(beam_decode_pallas(
                [vp, ap], [vfeats, afeats], feat_mask=mask, max_caption_len=L,
                beam_width=W, beam_alpha=alpha, weight_dtype="float32",
                interpret=True, resident=resident,
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
    for resident in (False, True):     # streaming-tile AND resident-weight kernels
        tok = np.asarray(dual_greedy_decode_pallas(
            [vp, ap], [vfeats, afeats], feat_mask=mask, max_caption_len=L,
            weight_dtype="float32", interpret=True, resident=resident,
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
    # sanity: EOS actually fired well before L (the early exit is exercised)
    assert (ref[:, 1:] == EOS_ID).any(axis=1).all()
    for resident in (False, True):
        tok = np.asarray(beam_decode_pallas(
            [params], [feats], max_caption_len=L, beam_width=W, beam_alpha=0.7,
            weight_dtype="float32", interpret=True, resident=resident,
        ))
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
    for resident in (False, True):     # streaming-tile AND resident-weight kernels
        tok = np.asarray(greedy_decode_pallas(
            params, feats, feat_mask=mask, max_caption_len=L,
            weight_dtype="float32", interpret=True, rnn_type="GRU",
            resident=resident,
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
    for resident in (False, True):     # mixed cells on both kernel variants
        tok = np.asarray(dual_greedy_decode_pallas(
            [vp, ap], [vfeats, afeats], max_caption_len=L,
            weight_dtype="float32", interpret=True, rnn_types=("GRU", "LSTM"),
            resident=resident,
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
    for resident in (False, True):
        tok = np.asarray(beam_decode_pallas(
            [gp], [gfeats], feat_mask=mask, max_caption_len=L, beam_width=W,
            weight_dtype="float32", interpret=True, rnn_types=("GRU",),
            resident=resident,
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
    for resident in (False, True):
        tok2 = np.asarray(beam_decode_pallas(
            [gp, lp], [gfeats, lfeats], feat_mask=mask, max_caption_len=L,
            beam_width=W, beam_alpha=0.7, weight_dtype="float32",
            interpret=True, rnn_types=("GRU", "LSTM"), resident=resident,
        ))
        np.testing.assert_array_equal(tok2, ref2)


def test_fits_vmem_contract_sweep(rng):
    """VERDICT r3 item 8: fuzz the VMEM pre-flight against its documented
    contract over exotic shapes through the PRODUCTION dispatch gate
    (models/captioning._pallas_dispatch): fits_vmem False => the dispatch
    returns None without ever building a kernel (callers take the XLA scan);
    True => the fused beam kernel builds, runs (interpret mode), and matches
    the XLA beam token-for-token.  Covers huge T, V >> 4000, GRU+LSTM mixes,
    and W=10."""
    import os

    from mvc_tpu.config import DecoderConfig
    from mvc_tpu.models import beam as beam_mod
    from mvc_tpu.models import attention as attn
    from mvc_tpu.models import decoder as dec
    from mvc_tpu.models.captioning import _beam_init_state, _pallas_dispatch
    from mvc_tpu.ops import dispatch
    from mvc_tpu.ops.pallas_beam import beam_decode_pallas, fits_vmem

    # (label, per-decoder (F, H, E, A, rnn_type), B, T, L, W, expect_fit)
    cases = [
        ("huge_T", [(24, 16, 8, 8, "LSTM")], 2, 128, 4, 2, True),
        ("huge_V_8192", [(16, 16, 8, 8, "LSTM")], 2, 4, 3, 2, True),
        ("gru_lstm_mix", [(24, 16, 8, 8, "GRU"), (12, 32, 10, 8, "LSTM")],
         3, 5, 5, 3, True),
        ("w10_dual", [(24, 16, 8, 8, "LSTM"), (12, 16, 8, 8, "LSTM")],
         2, 4, 4, 10, True),
        ("over_budget", [(8, 16, 8, 8, "LSTM")], 1024, 64, 2, 10, False),
    ]
    os.environ["MVC_PALLAS_INTERPRET"] = "1"
    dispatch.enable_pallas(True)
    dispatch.set_mesh(None)
    try:
        for label, decs, B, T, L, W, expect_fit in cases:
            V = 8192 if label == "huge_V_8192" else (512 if label == "over_budget" else 48)
            params_list, feats_list, cfgs = [], [], []
            for i, (F, H, E, A, cell) in enumerate(decs):
                cfg = DecoderConfig(in_feature_size=F, rnn_hidden_size=H,
                                    embedding_size=E, attn_size=A,
                                    output_size=V, rnn_type=cell)
                cfgs.append(cfg)
                params_list.append(dec.init_decoder(jax.random.PRNGKey(20 + i), cfg))
                feats_list.append(jnp.asarray(
                    rng.normal(size=(B, T, F)).astype(np.float32)))
            rnn_types = tuple(c.rnn_type for c in cfgs)

            assert fits_vmem(params_list, feats_list, beam_width=W,
                             rnn_types=rnn_types) is expect_fit, label

            built = []

            def make_kernel():
                built.append(True)
                return lambda p, fl, m: beam_decode_pallas(
                    p, fl, feat_mask=m, max_caption_len=L, beam_width=W,
                    beam_alpha=0.0, weight_dtype="float32",
                    rnn_types=rnn_types, interpret=True,
                )

            tok = _pallas_dispatch(params_list, feats_list, None, rnn_types,
                                   W, make_kernel, None)
            if not expect_fit:
                # contract: False => no kernel built, caller falls back
                assert tok is None and not built, label
                continue
            assert tok is not None and built, label

            # XLA beam reference at the same shapes
            keys = [attn.precompute_keys(p["attention"], f)
                    for p, f in zip(params_list, feats_list)]

            def step_fn(prev, state):
                lps, new = None, []
                for p, c, f, k, s in zip(params_list, cfgs, feats_list, keys, state):
                    lp, ns = dec.decoder_beam_step(p, c, prev, s, f, k, None,
                                                   jnp.float32)
                    lps = lp if lps is None else lps + lp
                    new.append(ns)
                return lps, tuple(new)

            init = tuple(_beam_init_state(c.rnn_type, B, W, c.rnn_hidden_size,
                                          jnp.float32) for c in cfgs)
            ref = np.asarray(beam_mod.beam_search(
                step_fn, init, B, V, max_caption_len=L, beam_alpha=0.0,
                beam_width=W,
            ))
            np.testing.assert_array_equal(np.asarray(tok), ref, err_msg=label)
    finally:
        os.environ.pop("MVC_PALLAS_INTERPRET", None)
        dispatch._override = None


def test_pallas_beam_stored_topw_matches_streaming(rng):
    """The stored-logits top-W layout (one W-pass extract-max over a VMEM
    [BW, Vp] scratch after the tile loop) must be token-identical to the
    streaming layout (running top-W folded per tile) — same candidate set,
    same min-global-index tie-break.  Dual + mask + alpha>0, and GRU single."""
    from mvc_tpu.config import DecoderConfig
    from mvc_tpu.models import decoder as dec
    from mvc_tpu.ops.pallas_beam import beam_decode_pallas

    gcfg = DecoderConfig(in_feature_size=24, rnn_hidden_size=16, embedding_size=8,
                         attn_size=8, output_size=31)
    lcfg = DecoderConfig(in_feature_size=12, rnn_hidden_size=32, embedding_size=10,
                         attn_size=8, output_size=31)
    gp = dec.init_decoder(jax.random.PRNGKey(9), gcfg)
    lp = dec.init_decoder(jax.random.PRNGKey(10), lcfg)
    B, T, L, W = 3, 4, 8, 3
    gfeats = jnp.asarray(rng.normal(size=(B, T, 24)).astype(np.float32))
    lfeats = jnp.asarray(rng.normal(size=(B, T, 12)).astype(np.float32))
    mask = np.ones((B, T), bool)
    mask[0, 2:] = False
    mask = jnp.asarray(mask)
    kw = dict(feat_mask=mask, max_caption_len=L, beam_width=W, beam_alpha=0.7,
              weight_dtype="float32", interpret=True)
    a = np.asarray(beam_decode_pallas([gp, lp], [gfeats, lfeats],
                                      topw="streaming", **kw))
    b = np.asarray(beam_decode_pallas([gp, lp], [gfeats, lfeats],
                                      topw="stored", **kw))
    np.testing.assert_array_equal(a, b)

    ggcfg = DecoderConfig(in_feature_size=24, rnn_hidden_size=16, embedding_size=8,
                          attn_size=8, output_size=29, rnn_type="GRU")
    ggp = dec.init_decoder(jax.random.PRNGKey(4), ggcfg)
    kw2 = dict(max_caption_len=6, beam_width=4, weight_dtype="float32",
               interpret=True, rnn_types=("GRU",))
    a2 = np.asarray(beam_decode_pallas([ggp], [gfeats], topw="streaming", **kw2))
    b2 = np.asarray(beam_decode_pallas([ggp], [gfeats], topw="stored", **kw2))
    np.testing.assert_array_equal(a2, b2)


def test_pallas_batch_tiled_greedy_matches_untiled(rng):
    """Grid-tiled resident greedy (batch_tile knob / bulk auto rule) must be
    token-identical to the whole-batch resident kernel and the XLA scan."""
    from mvc_tpu.config import DecoderConfig
    from mvc_tpu.models import decoder as dec
    from mvc_tpu.ops import pallas_decode as pd

    cfg = DecoderConfig(in_feature_size=24, rnn_hidden_size=16, embedding_size=8,
                        attn_size=8, output_size=31)
    params = dec.init_decoder(jax.random.PRNGKey(1), cfg)
    B, T, L = 128, 5, 9
    feats = jnp.asarray(rng.normal(size=(B, T, 24)).astype(np.float32))
    mask = np.ones((B, T), bool)
    mask[1, 3:] = False
    mask[70, 2:] = False
    mask = jnp.asarray(mask)

    outputs, _ = dec.decode(params, cfg, feats, captions=None,
                            max_caption_len=L, feat_mask=mask)
    ref_tokens = np.asarray(dec.greedy_tokens(outputs))
    tok = np.asarray(pd.greedy_decode_pallas(
        params, feats, feat_mask=mask, max_caption_len=L,
        weight_dtype="float32", interpret=True, batch_tile=64))
    np.testing.assert_array_equal(tok, ref_tokens)

    # auto rule: when the whole batch doesn't fit, a dividing tile is picked
    orig = pd._resident_fits
    pd._resident_fits = lambda *a: False
    try:
        tok_auto = np.asarray(pd.greedy_decode_pallas(
            params, feats, feat_mask=mask, max_caption_len=L + 1,
            weight_dtype="float32", interpret=True))
    finally:
        pd._resident_fits = orig
    np.testing.assert_array_equal(tok_auto[:, :L], ref_tokens)


def test_pallas_batch_tiled_dual_matches_untiled(rng):
    """Grid-tiled resident DUAL greedy must match the whole-batch kernel and
    the XLA dual direct path (mixed LSTM+GRU cells)."""
    from mvc_tpu.config import DecoderConfig
    from mvc_tpu.models import decoder as dec
    from mvc_tpu.models.captioning import dual_greedy_tokens_fused
    from mvc_tpu.ops.pallas_dual_greedy import dual_greedy_decode_pallas

    v_cfg = DecoderConfig(in_feature_size=24, rnn_hidden_size=16,
                          embedding_size=8, attn_size=8, output_size=29)
    a_cfg = DecoderConfig(in_feature_size=12, rnn_hidden_size=16,
                          embedding_size=8, attn_size=8, output_size=29,
                          rnn_type="GRU")
    v_params = dec.init_decoder(jax.random.PRNGKey(5), v_cfg)
    a_params = dec.init_decoder(jax.random.PRNGKey(6), a_cfg)
    B, T, L = 96, 4, 8
    v_feats = jnp.asarray(rng.normal(size=(B, T, 24)).astype(np.float32))
    a_feats = jnp.asarray(rng.normal(size=(B, T, 12)).astype(np.float32))
    mask = np.ones((B, T), bool)
    mask[3, 2:] = False
    mask = jnp.asarray(mask)

    ref = np.asarray(dual_greedy_tokens_fused(
        v_params, a_params, v_cfg, a_cfg, v_feats, a_feats,
        max_caption_len=L, feat_mask=mask))
    for bt in (32, 48):
        tok = np.asarray(dual_greedy_decode_pallas(
            [v_params, a_params], [v_feats, a_feats], feat_mask=mask,
            max_caption_len=L, weight_dtype="float32",
            rnn_types=("LSTM", "GRU"), interpret=True, batch_tile=bt))
        np.testing.assert_array_equal(tok, ref)


def test_fits_vmem_batch_tiling_gate(rng):
    """allow_batch_tiling admits bulk direct shapes whose batch tile fits,
    but never beam shapes (tiling is greedy/dual-direct only)."""
    from mvc_tpu.config import DecoderConfig
    from mvc_tpu.models import decoder as dec
    from mvc_tpu.ops.pallas_beam import fits_vmem

    cfg = DecoderConfig(in_feature_size=2048, rnn_hidden_size=512,
                        embedding_size=468, attn_size=256, output_size=4000)
    params = dec.init_decoder(jax.random.PRNGKey(0), cfg)
    feats = jnp.zeros((1024, 16, 2048), jnp.bfloat16)
    assert not fits_vmem([params], [feats], beam_width=1)
    assert fits_vmem([params], [feats], beam_width=1, allow_batch_tiling=True)
    assert not fits_vmem([params], [feats], beam_width=5,
                         allow_batch_tiling=True)
