"""ResNet-101 visual encoder in pure JAX (NHWC), inference path.

The reference's ``VisualEncoder`` accepts ``model="resnet"`` (reference
src/models/visual_encoder.py:23-25): ``torchvision.models.resnet101`` with
input 224x224.  Quirk replicated here: the reference does NOT replace the
final ``fc`` for the resnet branch (only the inception branch gets
``fc = Identity``, src/models/visual_encoder.py:29), so the "features" it
emits are the 1000-d ImageNet logit vector, not the 2048-d pooled trunk.
``resnet101_features`` exposes both: ``with_fc=True`` (reference behavior,
default) returns [N, 1000]; ``with_fc=False`` returns the [N, 2048] trunk.

As with Inception-v3 (inception_v3.py), the extractor is inference-only in
the reference (``trainable=False`` -> ``eval()``), so BatchNorm folds into
per-channel (scale, shift) at conversion time and every block lowers to
conv + affine (+ relu) — one MXU matmul with a fused epilogue each.

Weight layout follows torchvision's module names via
``convert_torchvision_state_dict`` so real pretrained weights drop in when
available (zero-egress here; tests validate conversion against a
state-dict-identical torch oracle, tests/test_resnet.py).
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

# Bottleneck counts per stage for resnet101 (torchvision layers=[3, 4, 23, 3]).
LAYERS = (3, 4, 23, 3)
EXPANSION = 4


# ----------------------------------------------------------------- primitives
def _affine_conv_init(key, kh, kw, cin, cout, dtype=jnp.float32):
    fan_in = kh * kw * cin
    w = jax.random.normal(key, (kh, kw, cin, cout), dtype) * jnp.sqrt(2.0 / fan_in)
    return {"w": w, "scale": jnp.ones((cout,), dtype), "shift": jnp.zeros((cout,), dtype)}


def _affine_conv(params, x, stride=(1, 1), padding="VALID"):
    """conv (no bias) + folded-BN affine — NO relu (bottlenecks add before it)."""
    y = jax.lax.conv_general_dilated(
        x, params["w"], window_strides=stride, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y * params["scale"] + params["shift"]


def _pad(p):
    return [(p, p), (p, p)]


# ----------------------------------------------------------------- bottleneck
def _bottleneck_init(key, cin, planes, downsample: bool, dtype=jnp.float32):
    k = jax.random.split(key, 4)
    p = {
        "conv1": _affine_conv_init(k[0], 1, 1, cin, planes, dtype),
        "conv2": _affine_conv_init(k[1], 3, 3, planes, planes, dtype),
        "conv3": _affine_conv_init(k[2], 1, 1, planes, planes * EXPANSION, dtype),
    }
    if downsample:
        p["downsample"] = _affine_conv_init(k[3], 1, 1, cin, planes * EXPANSION, dtype)
    return p


def _bottleneck(params, x, stride):
    identity = x
    y = jax.nn.relu(_affine_conv(params["conv1"], x))
    y = jax.nn.relu(_affine_conv(params["conv2"], y, stride=(stride, stride), padding=_pad(1)))
    y = _affine_conv(params["conv3"], y)
    if "downsample" in params:
        identity = _affine_conv(params["downsample"], x, stride=(stride, stride))
    return jax.nn.relu(y + identity)


def _stage_init(key, cin, planes, blocks, dtype=jnp.float32) -> List[Dict]:
    ks = jax.random.split(key, blocks)
    out = [_bottleneck_init(ks[0], cin, planes, downsample=True, dtype=dtype)]
    for i in range(1, blocks):
        out.append(_bottleneck_init(ks[i], planes * EXPANSION, planes, downsample=False, dtype=dtype))
    return out


def _stage(params: List[Dict], x, first_stride):
    x = _bottleneck(params[0], x, first_stride)
    for p in params[1:]:
        x = _bottleneck(p, x, 1)
    return x


# ----------------------------------------------------------------- network
def init_resnet101(key, dtype=jnp.float32) -> Dict:
    k = jax.random.split(key, 6)
    fc_w = jax.random.normal(k[5], (512 * EXPANSION, 1000), dtype) * jnp.sqrt(
        1.0 / (512 * EXPANSION)
    )
    return {
        "conv1": _affine_conv_init(k[0], 7, 7, 3, 64, dtype),
        "layer1": _stage_init(k[1], 64, 64, LAYERS[0], dtype),
        "layer2": _stage_init(k[2], 256, 128, LAYERS[1], dtype),
        "layer3": _stage_init(k[3], 512, 256, LAYERS[2], dtype),
        "layer4": _stage_init(k[4], 1024, 512, LAYERS[3], dtype),
        "fc": {"w": fc_w, "b": jnp.zeros((1000,), dtype)},
    }


def resnet101_features(params, x: jnp.ndarray, with_fc: bool = True) -> jnp.ndarray:
    """x: [N, H, W, 3] (already normalized; reference uses 224x224) ->
    [N, 1000] logits (reference behavior: fc kept, src/models/visual_encoder.py:23-25)
    or the [N, 2048] pooled trunk with ``with_fc=False``."""
    x = jax.nn.relu(_affine_conv(params["conv1"], x, stride=(2, 2), padding=_pad(3)))
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    x = _stage(params["layer1"], x, 1)
    x = _stage(params["layer2"], x, 2)
    x = _stage(params["layer3"], x, 2)
    x = _stage(params["layer4"], x, 2)
    x = jnp.mean(x, axis=(1, 2))                       # adaptive avg pool -> [N, 2048]
    if not with_fc:
        return x
    return x @ params["fc"]["w"] + params["fc"]["b"]


# ----------------------------------------------------------------- conversion
def convert_torchvision_state_dict(state_dict: Dict[str, np.ndarray]) -> Dict:
    """torchvision resnet101 state_dict -> our params, BatchNorm folded into
    (scale, shift).  Accepts torch tensors or numpy arrays as values.
    torchvision BatchNorm2d default eps=1e-5 (vs Inception's BasicConv2d 1e-3)."""

    def arr(name):
        v = state_dict[name]
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    def fold(conv_prefix, bn_prefix):
        w = arr(f"{conv_prefix}.weight")               # [out, in, kh, kw]
        gamma = arr(f"{bn_prefix}.weight")
        beta = arr(f"{bn_prefix}.bias")
        mean = arr(f"{bn_prefix}.running_mean")
        var = arr(f"{bn_prefix}.running_var")
        eps = 1e-5
        scale = gamma / np.sqrt(var + eps)
        shift = beta - mean * scale
        return {
            "w": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),   # OIHW -> HWIO
            "scale": jnp.asarray(scale),
            "shift": jnp.asarray(shift),
        }

    params: Dict = {"conv1": fold("conv1", "bn1")}
    for li, blocks in enumerate(LAYERS, start=1):
        stage = []
        for b in range(blocks):
            pre = f"layer{li}.{b}"
            block = {
                "conv1": fold(f"{pre}.conv1", f"{pre}.bn1"),
                "conv2": fold(f"{pre}.conv2", f"{pre}.bn2"),
                "conv3": fold(f"{pre}.conv3", f"{pre}.bn3"),
            }
            if f"{pre}.downsample.0.weight" in state_dict:
                block["downsample"] = fold(f"{pre}.downsample.0", f"{pre}.downsample.1")
            stage.append(block)
        params[f"layer{li}"] = stage
    params["fc"] = {
        "w": jnp.asarray(arr("fc.weight").T),          # [1000, 2048] -> [2048, 1000]
        "b": jnp.asarray(arr("fc.bias")),
    }
    return params
