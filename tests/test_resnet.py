"""ResNet-101 visual-encoder parity (reference src/models/visual_encoder.py:23-25:
the ``model="resnet"`` branch of VisualEncoder — torchvision resnet101 at
224x224 whose final fc is NOT replaced, so features are 1000-d logits)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from mvc_tpu.models import resnet as rn


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_resnet_forward_shapes():
    params = rn.init_resnet101(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 224, 224, 3), jnp.float32)
    logits = rn.resnet101_features(params, x)
    assert logits.shape == (1, 1000)
    trunk = rn.resnet101_features(params, x, with_fc=False)
    assert trunk.shape == (1, 2048)


def test_state_dict_conversion_structure():
    """Converted torch state dict reproduces init's pytree structure."""
    from mvc_tpu.utils.torch_oracles import build_torch_resnet101

    oracle = build_torch_resnet101()
    params = rn.convert_torchvision_state_dict(oracle.state_dict())
    init = rn.init_resnet101(jax.random.PRNGKey(0))
    ts = jax.tree.structure(params)
    assert ts == jax.tree.structure(init)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(init)):
        assert a.shape == b.shape, (a.shape, b.shape)


@pytest.mark.slow
def test_resnet_converted_weights_match_torch_oracle(rng):
    """End-to-end converter parity: torchvision-architecture resnet101 with
    random weights AND random BN running stats, converted via
    convert_torchvision_state_dict, must match the torch forward.  ResNet is
    fully convolutional up to the adaptive pool, so a 96x96 input exercises
    every block at a fraction of the 224px CPU cost."""
    from mvc_tpu.utils.torch_oracles import build_torch_resnet101

    oracle = build_torch_resnet101()
    params = rn.convert_torchvision_state_dict(oracle.state_dict())

    x = rng.uniform(-1, 1, size=(2, 96, 96, 3)).astype(np.float32)
    ours = np.asarray(rn.resnet101_features(params, jnp.asarray(x)))
    with torch.no_grad():
        expected = oracle(torch.tensor(np.transpose(x, (0, 3, 1, 2)))).numpy()
    assert ours.shape == expected.shape == (2, 1000)
    np.testing.assert_allclose(ours, expected, rtol=2e-3, atol=2e-4)

    trunk = np.asarray(rn.resnet101_features(params, jnp.asarray(x), with_fc=False))
    with torch.no_grad():
        t = oracle.avgpool(
            oracle.layer4(oracle.layer3(oracle.layer2(oracle.layer1(
                oracle.maxpool(oracle.relu(oracle.bn1(oracle.conv1(
                    torch.tensor(np.transpose(x, (0, 3, 1, 2)))))))))))
        ).flatten(1).numpy()
    np.testing.assert_allclose(trunk, t, rtol=2e-3, atol=2e-4)


@pytest.mark.slow
def test_extractor_mesh_sharded_matches_single_device(tmp_path, rng):
    """FeatureExtractor(mesh=...) shards the flattened frame/example batch
    over every mesh device (extraction is clip-parallel, SURVEY §2.3) and
    must reproduce the unsharded extractor's features — same params, same
    jitted math, just a batch-axis NamedSharding."""
    from mvc_tpu.extract import FeatureExtractor
    from mvc_tpu.extract.synthetic import make_clip_set
    from mvc_tpu.parallel import make_mesh

    make_clip_set(str(tmp_path), n_clips=3, seconds=2.0, fps=5, size=(64, 48))
    clips = sorted(str(p) for p in (tmp_path / "videos").iterdir())

    kw = dict(frame_buckets=(8,), audio_buckets=(4,), decode_workers=1)
    plain = FeatureExtractor(**kw)
    sharded = FeatureExtractor(
        mesh=make_mesh(dp=4, tp=2),
        inception_params=plain.inception_params,
        vggish_params=plain.vggish_params,
        **kw,
    )
    assert sharded._n_shards == 8
    ref = plain.extract_batch(clips)
    got = sharded.extract_batch(clips)
    # Per-row convolutions are independent along the batch axis, but shard
    # boundaries change XLA's fusion/reduction order (measured: ~5e-5 rel on
    # a handful of elements) — tolerance covers reassociation, not math bugs.
    for (rv, ra), (gv, ga) in zip(ref, got):
        np.testing.assert_allclose(rv, gv, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(ra, ga, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_extractor_resnet_backbone(tmp_path, rng):
    """FeatureExtractor(visual_model='resnet') decodes at 224px and writes
    [T, 1000] visual features (the reference quirk: fc kept — PARITY.md)."""
    from mvc_tpu.extract import FeatureExtractor
    from mvc_tpu.extract.synthetic import make_clip_set

    make_clip_set(str(tmp_path), n_clips=1, seconds=3.0, fps=5, size=(64, 48))
    fe = FeatureExtractor(
        visual_model="resnet", frame_buckets=(4,), audio_buckets=(4,),
        decode_workers=1,
    )
    assert fe.frame_size == (224, 224)
    clip = tmp_path / "videos" / "clip000_0_3.avi"
    video_f, audio_f = fe.extract(str(clip))
    assert video_f.shape == (3, 1000)
    assert audio_f.shape[1] == 128
