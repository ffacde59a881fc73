"""Inception-v3 visual encoder in pure JAX (NHWC), inference path.

Replaces the reference's ``torchvision.models.inception_v3`` feature extractor
(reference src/models/visual_encoder.py:27-30: ``aux_logits=False``, ``fc``
replaced by identity -> 2048-d pooled features).  Weight layout follows
torchvision's module names via ``convert_torchvision_state_dict`` so real
pretrained weights drop in when available (this environment has no network
egress, so tests validate structure/conversion, not ImageNet values).

BatchNorm is folded into per-channel (scale, shift) at conversion time — the
extractor is inference-only in the reference too (``trainable=False``,
src/models/visual_encoder.py:40-41) — so each block is conv + affine + relu,
which XLA fuses into one MXU matmul + epilogue.

The torchvision pretrained model applies ``transform_input`` channel
rescaling; preprocessing helpers below replicate the reference's exact
pipeline, including its 0..255-input Normalize quirk (PARITY.md).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


# ----------------------------------------------------------------- primitives
def conv_block_init(key, kh, kw, cin, cout, dtype=jnp.float32):
    fan_in = kh * kw * cin
    w = jax.random.normal(key, (kh, kw, cin, cout), dtype) * jnp.sqrt(2.0 / fan_in)
    return {"w": w, "scale": jnp.ones((cout,), dtype), "shift": jnp.zeros((cout,), dtype)}


def conv_block(params, x, stride=(1, 1), padding="VALID"):
    """conv (no bias) + folded-BN affine + relu."""
    y = jax.lax.conv_general_dilated(
        x, params["w"], window_strides=stride, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return jax.nn.relu(y * params["scale"] + params["shift"])


def _pad2(p):
    if isinstance(p, int):
        p = (p, p)
    return [(p[0], p[0]), (p[1], p[1])]


def max_pool(x, k=3, stride=2, padding=0):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, stride, stride, 1),
        [(0, 0), *_pad2(padding), (0, 0)],
    )


def avg_pool_3x3(x):
    """3x3 stride-1 pad-1 average pool, count_include_pad=True (torch default)."""
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), [(0, 0), (1, 1), (1, 1), (0, 0)]
    )
    return s / 9.0


# ----------------------------------------------------------------- blocks
# Each block init returns {branch_name: [conv_block params...]} and the apply
# functions concatenate branches in torchvision's channel order.

def _inception_a_init(key, cin, pool_features):
    k = jax.random.split(key, 7)
    return {
        "branch1x1": [conv_block_init(k[0], 1, 1, cin, 64)],
        "branch5x5": [conv_block_init(k[1], 1, 1, cin, 48), conv_block_init(k[2], 5, 5, 48, 64)],
        "branch3x3dbl": [
            conv_block_init(k[3], 1, 1, cin, 64),
            conv_block_init(k[4], 3, 3, 64, 96),
            conv_block_init(k[5], 3, 3, 96, 96),
        ],
        "branch_pool": [conv_block_init(k[6], 1, 1, cin, pool_features)],
    }


def _inception_a(params, x):
    b1 = conv_block(params["branch1x1"][0], x)
    b5 = conv_block(params["branch5x5"][0], x)
    b5 = conv_block(params["branch5x5"][1], b5, padding=_pad2(2))
    b3 = conv_block(params["branch3x3dbl"][0], x)
    b3 = conv_block(params["branch3x3dbl"][1], b3, padding=_pad2(1))
    b3 = conv_block(params["branch3x3dbl"][2], b3, padding=_pad2(1))
    bp = conv_block(params["branch_pool"][0], avg_pool_3x3(x))
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _inception_b_init(key, cin):
    k = jax.random.split(key, 4)
    return {
        "branch3x3": [conv_block_init(k[0], 3, 3, cin, 384)],
        "branch3x3dbl": [
            conv_block_init(k[1], 1, 1, cin, 64),
            conv_block_init(k[2], 3, 3, 64, 96),
            conv_block_init(k[3], 3, 3, 96, 96),
        ],
    }


def _inception_b(params, x):
    b3 = conv_block(params["branch3x3"][0], x, stride=(2, 2))
    bd = conv_block(params["branch3x3dbl"][0], x)
    bd = conv_block(params["branch3x3dbl"][1], bd, padding=_pad2(1))
    bd = conv_block(params["branch3x3dbl"][2], bd, stride=(2, 2))
    bp = max_pool(x, 3, 2)
    return jnp.concatenate([b3, bd, bp], axis=-1)


def _inception_c_init(key, cin, c7):
    k = jax.random.split(key, 10)
    return {
        "branch1x1": [conv_block_init(k[0], 1, 1, cin, 192)],
        "branch7x7": [
            conv_block_init(k[1], 1, 1, cin, c7),
            conv_block_init(k[2], 1, 7, c7, c7),
            conv_block_init(k[3], 7, 1, c7, 192),
        ],
        "branch7x7dbl": [
            conv_block_init(k[4], 1, 1, cin, c7),
            conv_block_init(k[5], 7, 1, c7, c7),
            conv_block_init(k[6], 1, 7, c7, c7),
            conv_block_init(k[7], 7, 1, c7, c7),
            conv_block_init(k[8], 1, 7, c7, 192),
        ],
        "branch_pool": [conv_block_init(k[9], 1, 1, cin, 192)],
    }


def _inception_c(params, x):
    b1 = conv_block(params["branch1x1"][0], x)
    b7 = conv_block(params["branch7x7"][0], x)
    b7 = conv_block(params["branch7x7"][1], b7, padding=_pad2((0, 3)))
    b7 = conv_block(params["branch7x7"][2], b7, padding=_pad2((3, 0)))
    bd = conv_block(params["branch7x7dbl"][0], x)
    bd = conv_block(params["branch7x7dbl"][1], bd, padding=_pad2((3, 0)))
    bd = conv_block(params["branch7x7dbl"][2], bd, padding=_pad2((0, 3)))
    bd = conv_block(params["branch7x7dbl"][3], bd, padding=_pad2((3, 0)))
    bd = conv_block(params["branch7x7dbl"][4], bd, padding=_pad2((0, 3)))
    bp = conv_block(params["branch_pool"][0], avg_pool_3x3(x))
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _inception_d_init(key, cin):
    k = jax.random.split(key, 6)
    return {
        "branch3x3": [conv_block_init(k[0], 1, 1, cin, 192), conv_block_init(k[1], 3, 3, 192, 320)],
        "branch7x7x3": [
            conv_block_init(k[2], 1, 1, cin, 192),
            conv_block_init(k[3], 1, 7, 192, 192),
            conv_block_init(k[4], 7, 1, 192, 192),
            conv_block_init(k[5], 3, 3, 192, 192),
        ],
    }


def _inception_d(params, x):
    b3 = conv_block(params["branch3x3"][0], x)
    b3 = conv_block(params["branch3x3"][1], b3, stride=(2, 2))
    b7 = conv_block(params["branch7x7x3"][0], x)
    b7 = conv_block(params["branch7x7x3"][1], b7, padding=_pad2((0, 3)))
    b7 = conv_block(params["branch7x7x3"][2], b7, padding=_pad2((3, 0)))
    b7 = conv_block(params["branch7x7x3"][3], b7, stride=(2, 2))
    bp = max_pool(x, 3, 2)
    return jnp.concatenate([b3, b7, bp], axis=-1)


def _inception_e_init(key, cin):
    k = jax.random.split(key, 9)
    return {
        "branch1x1": [conv_block_init(k[0], 1, 1, cin, 320)],
        "branch3x3": [
            conv_block_init(k[1], 1, 1, cin, 384),
            conv_block_init(k[2], 1, 3, 384, 384),   # _2a
            conv_block_init(k[3], 3, 1, 384, 384),   # _2b
        ],
        "branch3x3dbl": [
            conv_block_init(k[4], 1, 1, cin, 448),
            conv_block_init(k[5], 3, 3, 448, 384),
            conv_block_init(k[6], 1, 3, 384, 384),   # _3a
            conv_block_init(k[7], 3, 1, 384, 384),   # _3b
        ],
        "branch_pool": [conv_block_init(k[8], 1, 1, cin, 192)],
    }


def _inception_e(params, x):
    b1 = conv_block(params["branch1x1"][0], x)
    b3 = conv_block(params["branch3x3"][0], x)
    b3 = jnp.concatenate([
        conv_block(params["branch3x3"][1], b3, padding=_pad2((0, 1))),
        conv_block(params["branch3x3"][2], b3, padding=_pad2((1, 0))),
    ], axis=-1)
    bd = conv_block(params["branch3x3dbl"][0], x)
    bd = conv_block(params["branch3x3dbl"][1], bd, padding=_pad2(1))
    bd = jnp.concatenate([
        conv_block(params["branch3x3dbl"][2], bd, padding=_pad2((0, 1))),
        conv_block(params["branch3x3dbl"][3], bd, padding=_pad2((1, 0))),
    ], axis=-1)
    bp = conv_block(params["branch_pool"][0], avg_pool_3x3(x))
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


# ----------------------------------------------------------------- network
def init_inception_v3(key, dtype=jnp.float32) -> Dict:
    k = jax.random.split(key, 17)
    return {
        "Conv2d_1a_3x3": conv_block_init(k[0], 3, 3, 3, 32, dtype),
        "Conv2d_2a_3x3": conv_block_init(k[1], 3, 3, 32, 32, dtype),
        "Conv2d_2b_3x3": conv_block_init(k[2], 3, 3, 32, 64, dtype),
        "Conv2d_3b_1x1": conv_block_init(k[3], 1, 1, 64, 80, dtype),
        "Conv2d_4a_3x3": conv_block_init(k[4], 3, 3, 80, 192, dtype),
        "Mixed_5b": _inception_a_init(k[5], 192, 32),
        "Mixed_5c": _inception_a_init(k[6], 256, 64),
        "Mixed_5d": _inception_a_init(k[7], 288, 64),
        "Mixed_6a": _inception_b_init(k[8], 288),
        "Mixed_6b": _inception_c_init(k[9], 768, 128),
        "Mixed_6c": _inception_c_init(k[10], 768, 160),
        "Mixed_6d": _inception_c_init(k[11], 768, 160),
        "Mixed_6e": _inception_c_init(k[12], 768, 192),
        "Mixed_7a": _inception_d_init(k[13], 768),
        "Mixed_7b": _inception_e_init(k[14], 1280),
        "Mixed_7c": _inception_e_init(k[15], 2048),
    }


def transform_input(x: jnp.ndarray) -> jnp.ndarray:
    """torchvision's pretrained-model input re-transform (transform_input=True)."""
    ch0 = x[..., 0:1] * (0.229 / 0.5) + (0.485 - 0.5) / 0.5
    ch1 = x[..., 1:2] * (0.224 / 0.5) + (0.456 - 0.5) / 0.5
    ch2 = x[..., 2:3] * (0.225 / 0.5) + (0.406 - 0.5) / 0.5
    return jnp.concatenate([ch0, ch1, ch2], axis=-1)


def inception_v3_features(params, x: jnp.ndarray, apply_transform_input: bool = True) -> jnp.ndarray:
    """x: [N, 299, 299, 3] (already normalized) -> [N, 2048] pooled features."""
    if apply_transform_input:
        x = transform_input(x)
    x = conv_block(params["Conv2d_1a_3x3"], x, stride=(2, 2))
    x = conv_block(params["Conv2d_2a_3x3"], x)
    x = conv_block(params["Conv2d_2b_3x3"], x, padding=_pad2(1))
    x = max_pool(x, 3, 2)
    x = conv_block(params["Conv2d_3b_1x1"], x)
    x = conv_block(params["Conv2d_4a_3x3"], x)
    x = max_pool(x, 3, 2)
    x = _inception_a(params["Mixed_5b"], x)
    x = _inception_a(params["Mixed_5c"], x)
    x = _inception_a(params["Mixed_5d"], x)
    x = _inception_b(params["Mixed_6a"], x)
    x = _inception_c(params["Mixed_6b"], x)
    x = _inception_c(params["Mixed_6c"], x)
    x = _inception_c(params["Mixed_6d"], x)
    x = _inception_c(params["Mixed_6e"], x)
    x = _inception_d(params["Mixed_7a"], x)
    x = _inception_e(params["Mixed_7b"], x)
    x = _inception_e(params["Mixed_7c"], x)
    return jnp.mean(x, axis=(1, 2))            # adaptive avg pool -> [N, 2048]


def imagenet_normalize(frames: jnp.ndarray, scale_to_unit: bool = False) -> jnp.ndarray:
    """Per-channel ImageNet normalization.  ``scale_to_unit=False`` replicates
    the reference quirk of normalizing raw 0..255 frames without dividing by
    255 (reference src/models/visual_encoder.py:17 applied to
    src/extract_features.py's uint8 frames — PARITY.md)."""
    x = frames.astype(jnp.float32)
    if scale_to_unit:
        x = x / 255.0
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)
    return (x - mean) / std


# ----------------------------------------------------------------- conversion
def convert_torchvision_state_dict(state_dict: Dict[str, np.ndarray]) -> Dict:
    """torchvision InceptionV3 state_dict (numpy arrays) -> our params, with
    BatchNorm folded into (scale, shift).  Accepts either torch tensors or
    numpy arrays as values."""

    def arr(name):
        v = state_dict[name]
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    def fold(prefix):
        w = arr(f"{prefix}.conv.weight")            # [out, in, kh, kw]
        gamma = arr(f"{prefix}.bn.weight")
        beta = arr(f"{prefix}.bn.bias")
        mean = arr(f"{prefix}.bn.running_mean")
        var = arr(f"{prefix}.bn.running_var")
        eps = 1e-3                                  # torchvision BasicConv2d bn eps=0.001
        scale = gamma / np.sqrt(var + eps)
        shift = beta - mean * scale
        return {
            "w": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),   # OIHW -> HWIO
            "scale": jnp.asarray(scale),
            "shift": jnp.asarray(shift),
        }

    def fold_list(prefix, names):
        return [fold(f"{prefix}.{n}") for n in names]

    params: Dict = {}
    for stem in ("Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3", "Conv2d_3b_1x1", "Conv2d_4a_3x3"):
        params[stem] = fold(stem)
    for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):
        params[name] = {
            "branch1x1": fold_list(name, ["branch1x1"]),
            "branch5x5": fold_list(name, ["branch5x5_1", "branch5x5_2"]),
            "branch3x3dbl": fold_list(name, ["branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3"]),
            "branch_pool": fold_list(name, ["branch_pool"]),
        }
    params["Mixed_6a"] = {
        "branch3x3": fold_list("Mixed_6a", ["branch3x3"]),
        "branch3x3dbl": fold_list("Mixed_6a", ["branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3"]),
    }
    for name in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
        params[name] = {
            "branch1x1": fold_list(name, ["branch1x1"]),
            "branch7x7": fold_list(name, ["branch7x7_1", "branch7x7_2", "branch7x7_3"]),
            "branch7x7dbl": fold_list(
                name, ["branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3", "branch7x7dbl_4", "branch7x7dbl_5"]
            ),
            "branch_pool": fold_list(name, ["branch_pool"]),
        }
    params["Mixed_7a"] = {
        "branch3x3": fold_list("Mixed_7a", ["branch3x3_1", "branch3x3_2"]),
        "branch7x7x3": fold_list(
            "Mixed_7a", ["branch7x7x3_1", "branch7x7x3_2", "branch7x7x3_3", "branch7x7x3_4"]
        ),
    }
    for name in ("Mixed_7b", "Mixed_7c"):
        params[name] = {
            "branch1x1": fold_list(name, ["branch1x1"]),
            "branch3x3": fold_list(name, ["branch3x3_1", "branch3x3_2a", "branch3x3_2b"]),
            "branch3x3dbl": fold_list(
                name, ["branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3a", "branch3x3dbl_3b"]
            ),
            "branch_pool": fold_list(name, ["branch_pool"]),
        }
    return params
