"""Loss golden parity vs a torch oracle implementing the reference formulas
(NLL-ignore-PAD over [1:], PAD-masked entropy, masked-mean global MSE, plain
local MSE), with the production tensor contract
(outputs [L,B,V], captions [L,B], features [B,T,D])."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as tF

from mvc_tpu.config import PAD_ID
from mvc_tpu.training import losses

L, B, V, T, F = 9, 4, 25, 5, 12


def _data(rng, with_pad=True):
    x = rng.normal(size=(L, B, V)).astype(np.float32)
    outputs = np.asarray(jnp.log(jnp.asarray(np.exp(x) / np.exp(x).sum(-1, keepdims=True))))
    captions = rng.integers(3, V, size=(L, B)).astype(np.int64)
    captions[0] = 1
    if with_pad:
        captions[-2:, :2] = PAD_ID
    feats = rng.normal(size=(B, T, F)).astype(np.float32)
    recons_g = rng.normal(size=(B, L, F)).astype(np.float32)
    recons_l = rng.normal(size=(B, T, F)).astype(np.float32)
    return outputs, captions, feats, recons_g, recons_l


def torch_reference_losses(outputs, captions, feats, recons, rec_type, entropy_dim=2):
    """In-test torch oracle of the reference loss formulas."""
    outputs = torch.tensor(outputs)
    captions = torch.tensor(captions)
    ce = tF.nll_loss(outputs[1:].reshape(-1, V), captions[1:].reshape(-1), ignore_index=PAD_ID)

    x = outputs[1:]
    b = tF.softmax(x, dim=entropy_dim) * tF.log_softmax(x, dim=entropy_dim)
    b = b.sum(dim=2)
    b[captions[1:] == PAD_ID] = 0
    ent = -1.0 * b.sum(dim=0).mean()

    if rec_type == "global":
        ft = torch.tensor(feats)
        rc = torch.tensor(recons)
        keep = (captions != PAD_ID)
        x_mean = ft.mean(dim=1)
        cl = keep.sum(dim=0).unsqueeze(1).float()
        m = keep.transpose(0, 1).unsqueeze(2).float()
        r = (rc * m).sum(dim=1) / cl
        rec = tF.mse_loss(x_mean, r)
    elif rec_type == "local":
        rec = tF.mse_loss(torch.tensor(feats), torch.tensor(recons))
    else:
        rec = torch.tensor(0.0)
    return ce.item(), ent.item(), rec.item()


def test_nll_matches_torch(rng):
    outputs, captions, *_ = _data(rng)
    ours = float(losses.nll_loss(jnp.asarray(outputs), jnp.asarray(captions)))
    ce, _, _ = torch_reference_losses(outputs, captions, None, None, "none")
    np.testing.assert_allclose(ours, ce, rtol=1e-5)


def test_entropy_matches_torch_sane_axis(rng):
    outputs, captions, *_ = _data(rng)
    ours = float(
        losses.entropy_loss(jnp.asarray(outputs[1:]), jnp.asarray(captions[1:] == PAD_ID))
    )
    _, ent, _ = torch_reference_losses(outputs, captions, None, None, "none", entropy_dim=2)
    np.testing.assert_allclose(ours, ent, rtol=1e-4)


def test_entropy_compat_batch_axis(rng):
    # bug-compat mode reproduces the reference's dim=1 softmax
    outputs, captions, *_ = _data(rng)
    ours = float(
        losses.entropy_loss(
            jnp.asarray(outputs[1:]), jnp.asarray(captions[1:] == PAD_ID), compat_batch_axis=True
        )
    )
    _, ent, _ = torch_reference_losses(outputs, captions, None, None, "none", entropy_dim=1)
    np.testing.assert_allclose(ours, ent, rtol=1e-4)


def test_global_reconstruction_matches_torch(rng):
    outputs, captions, feats, recons_g, _ = _data(rng)
    ours = float(
        losses.global_reconstruction_loss(
            jnp.asarray(feats), jnp.asarray(recons_g), jnp.asarray(captions != PAD_ID)
        )
    )
    _, _, rec = torch_reference_losses(outputs, captions, feats, recons_g, "global")
    np.testing.assert_allclose(ours, rec, rtol=1e-5)


def test_local_reconstruction_matches_torch(rng):
    outputs, captions, feats, _, recons_l = _data(rng)
    ours = float(losses.local_reconstruction_loss(jnp.asarray(feats), jnp.asarray(recons_l)))
    _, _, rec = torch_reference_losses(outputs, captions, feats, recons_l, "local")
    np.testing.assert_allclose(ours, rec, rtol=1e-5)


def test_modality_wise_total(rng):
    outputs, captions, feats, recons_g, _ = _data(rng)
    a_feats, a_recons = feats[:, :, :6], recons_g[:, :, :6]
    v_feats, v_recons = feats[:, :, 6:], recons_g[:, :, 6:]
    loss, ce, ent, a_rec, v_rec = losses.modality_wise_reconstruction_loss(
        jnp.asarray(outputs), jnp.asarray(captions),
        jnp.asarray(a_feats), jnp.asarray(a_recons),
        jnp.asarray(v_feats), jnp.asarray(v_recons),
        reg_lambda=0.5, audio_recon_lambda=2.0, visual_recon_lambda=3.0, rec_type="global",
    )
    np.testing.assert_allclose(
        float(loss),
        float(ce) + 0.5 * float(ent) + 2.0 * float(a_rec) + 3.0 * float(v_rec),
        rtol=1e-6,
    )
    # each component individually matches the torch oracle
    _, _, a_expected = torch_reference_losses(outputs, captions, a_feats, a_recons, "global")
    np.testing.assert_allclose(float(a_rec), a_expected, rtol=1e-5)


def test_rec_type_none_gives_zero(rng):
    outputs, captions, feats, recons_g, _ = _data(rng)
    fn = losses.ModalityWiseReconstructionLossBuilder(0.1, 1.0, 1.0, rec_type="none")
    loss, ce, ent, a_rec, v_rec = fn(jnp.asarray(outputs), jnp.asarray(captions))
    assert float(a_rec) == 0.0 and float(v_rec) == 0.0
    np.testing.assert_allclose(float(loss), float(ce) + 0.1 * float(ent), rtol=1e-6)


def test_masked_equals_truncated(rng):
    """feat_mask over zero-padded frames == computing on the truncated batch."""
    outputs, captions, feats, recons_g, recons_l = _data(rng)
    T_real = 3
    feats_p = feats.copy(); feats_p[:, T_real:] = 0
    recons_lp = recons_l.copy(); recons_lp[:, T_real:] = 0
    mask = np.zeros((B, T), dtype=bool); mask[:, :T_real] = True

    g_masked = float(losses.global_reconstruction_loss(
        jnp.asarray(feats_p), jnp.asarray(recons_g), jnp.asarray(captions != PAD_ID),
        feat_mask=jnp.asarray(mask)))
    g_trunc = float(losses.global_reconstruction_loss(
        jnp.asarray(feats[:, :T_real]), jnp.asarray(recons_g), jnp.asarray(captions != PAD_ID)))
    np.testing.assert_allclose(g_masked, g_trunc, rtol=1e-5)

    l_masked = float(losses.local_reconstruction_loss(
        jnp.asarray(feats_p), jnp.asarray(recons_lp), feat_mask=jnp.asarray(mask)))
    l_trunc = float(losses.local_reconstruction_loss(
        jnp.asarray(feats[:, :T_real]), jnp.asarray(recons_l[:, :T_real])))
    np.testing.assert_allclose(l_masked, l_trunc, rtol=1e-5)


def test_sample_mask_matches_unpadded_loss(rng):
    """VERDICT r3 item 7 (uneven-per-host-batch edge): batch-padding rows
    (sample_mask=False) must drop out of EVERY loss term — the padded batch
    scores exactly what the reference would compute on the unpadded one.
    Without the mask, entropy/global-recon dilute by n_real/B and local-recon
    MSE reads the reconstructor's output on the zero rows."""
    import jax
    import numpy as np

    from mvc_tpu.parallel.mesh import pad_batch_to_multiple
    from mvc_tpu.training.losses import modality_wise_reconstruction_loss

    L, B, V, T, AF, VF = 6, 5, 17, 4, 3, 7
    caps = rng.integers(3, V, size=(L, B)).astype(np.int32)
    caps[0] = 1
    caps[-1, :2] = 0                       # some real PAD inside real rows
    outputs = jax.nn.log_softmax(
        jnp.asarray(rng.normal(size=(L, B, V)).astype(np.float32)), axis=2)
    audio = rng.normal(size=(B, T, AF)).astype(np.float32)
    visual = rng.normal(size=(B, T, VF)).astype(np.float32)
    a_rec_g = rng.normal(size=(B, L, AF)).astype(np.float32)
    v_rec_g = rng.normal(size=(B, L, VF)).astype(np.float32)
    a_rec_l = rng.normal(size=(B, T, AF)).astype(np.float32)
    v_rec_l = rng.normal(size=(B, T, VF)).astype(np.float32)
    feat_mask = np.ones((B, T), bool)
    feat_mask[1, 2:] = False

    def pad_rows(x, n, axis=0):
        shape = list(x.shape)
        shape[axis] = n
        return np.concatenate([np.asarray(x), np.zeros(shape, np.asarray(x).dtype)], axis=axis)

    PAD_N = 3
    for rec_type, a_r, v_r in (("global", a_rec_g, v_rec_g),
                               ("local", a_rec_l, v_rec_l)):
        for fm in (feat_mask, None):
            ref = modality_wise_reconstruction_loss(
                outputs, jnp.asarray(caps), jnp.asarray(audio), jnp.asarray(a_r),
                jnp.asarray(visual), jnp.asarray(v_r),
                reg_lambda=0.3, audio_recon_lambda=0.7, visual_recon_lambda=0.9,
                rec_type=rec_type,
                feat_mask=None if fm is None else jnp.asarray(fm),
            )
            # pad rows: zero features/captions, RANDOM recons on the pad rows
            # (the reconstructor emits garbage there — it must not leak in)
            pad_recons_a = pad_rows(a_r, PAD_N)
            pad_recons_a[B:] = rng.normal(size=(PAD_N,) + a_r.shape[1:])
            pad_recons_v = pad_rows(v_r, PAD_N)
            pad_recons_v[B:] = rng.normal(size=(PAD_N,) + v_r.shape[1:])
            sm = np.concatenate([np.ones(B, bool), np.zeros(PAD_N, bool)])
            got = modality_wise_reconstruction_loss(
                jnp.asarray(pad_rows(np.asarray(outputs), PAD_N, axis=1)),
                jnp.asarray(pad_rows(caps, PAD_N, axis=1)),
                jnp.asarray(pad_rows(audio, PAD_N)), jnp.asarray(pad_recons_a),
                jnp.asarray(pad_rows(visual, PAD_N)), jnp.asarray(pad_recons_v),
                reg_lambda=0.3, audio_recon_lambda=0.7, visual_recon_lambda=0.9,
                rec_type=rec_type,
                feat_mask=None if fm is None else jnp.asarray(pad_rows(fm, PAD_N)),
                sample_mask=jnp.asarray(sm),
            )
            for a, b, name in zip(got, ref, ("loss", "ce", "ent", "a_rec", "v_rec")):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6,
                    err_msg=f"{rec_type}/feat_mask={fm is not None}/{name}")

    # pad_batch_to_multiple produces exactly this layout
    batch = {"audio": audio, "visual": visual, "captions": caps,
             "feat_mask": feat_mask, "sample_mask": np.ones(B, bool)}
    padded = pad_batch_to_multiple(batch, 4)
    assert padded["audio"].shape[0] == 8
    assert padded["sample_mask"].sum() == B
    assert not padded["sample_mask"][B:].any()
