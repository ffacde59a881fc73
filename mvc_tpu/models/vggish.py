"""VGGish audio encoder in pure JAX (NHWC).

Replaces the reference's torch.hub VGGish (reference
src/models/audio_encoder.py:13, harritaylor/torchvggish): 4 conv stages
(64, 128, 256x2, 512x2) with 2x2 max pools over [96, 64] log-mel examples,
then FC 4096 -> 4096 -> 128.  One 128-d embedding per 0.96 s example.

Includes the optional PCA/quantization postprocessor the hub model applies by
default (params loadable via the converter; identity when absent —
PARITY.md).  The torch state_dict layout (``features.N`` / ``embeddings.N``)
converts via ``convert_torch_state_dict``.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

EMBEDDING_SIZE = 128
_FLAT = 6 * 4 * 512     # H x W x channels after 4 pools of [96, 64] (HWC flatten, as torchvggish)


def _conv_init(key, kh, kw, cin, cout):
    fan_in = kh * kw * cin
    kw_, kb = jax.random.split(key)
    bound = float(np.sqrt(1.0 / fan_in))
    return {
        "w": jax.random.uniform(kw_, (kh, kw, cin, cout), jnp.float32, -bound, bound),
        "b": jax.random.uniform(kb, (cout,), jnp.float32, -bound, bound),
    }


def _fc_init(key, cin, cout):
    kw_, kb = jax.random.split(key)
    bound = float(np.sqrt(1.0 / cin))
    return {
        "w": jax.random.uniform(kw_, (cin, cout), jnp.float32, -bound, bound),
        "b": jax.random.uniform(kb, (cout,), jnp.float32, -bound, bound),
    }


def init_vggish(key) -> Dict:
    k = jax.random.split(key, 9)
    return {
        "conv1": _conv_init(k[0], 3, 3, 1, 64),
        "conv2": _conv_init(k[1], 3, 3, 64, 128),
        "conv3_1": _conv_init(k[2], 3, 3, 128, 256),
        "conv3_2": _conv_init(k[3], 3, 3, 256, 256),
        "conv4_1": _conv_init(k[4], 3, 3, 256, 512),
        "conv4_2": _conv_init(k[5], 3, 3, 512, 512),
        "fc1_1": _fc_init(k[6], _FLAT, 4096),
        "fc1_2": _fc_init(k[7], 4096, 4096),
        "fc2": _fc_init(k[8], 4096, EMBEDDING_SIZE),
        "pca": None,
    }


def _conv_relu(p, x):
    y = jax.lax.conv_general_dilated(
        x, p["w"], (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return jax.nn.relu(y + p["b"])


def _max_pool_2x2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def vggish_embeddings(params, examples: jnp.ndarray, postprocess: bool = True) -> jnp.ndarray:
    """examples: [N, 96, 64] log-mel -> [N, 128] embeddings."""
    x = examples[..., None]                       # NHWC, C=1
    x = _max_pool_2x2(_conv_relu(params["conv1"], x))
    x = _max_pool_2x2(_conv_relu(params["conv2"], x))
    x = _conv_relu(params["conv3_1"], x)
    x = _max_pool_2x2(_conv_relu(params["conv3_2"], x))
    x = _conv_relu(params["conv4_1"], x)
    x = _max_pool_2x2(_conv_relu(params["conv4_2"], x))
    # torchvggish permutes NCHW->NHWC before flattening (vggish.py
    # transpose(1,3)+transpose(1,2), keeping the TF original's HWC order),
    # so our native NHWC layout flattens directly — converted FC weights
    # line up without any transpose.
    x = x.reshape(x.shape[0], -1)
    x = jax.nn.relu(x @ params["fc1_1"]["w"] + params["fc1_1"]["b"])
    x = jax.nn.relu(x @ params["fc1_2"]["w"] + params["fc1_2"]["b"])
    x = jax.nn.relu(x @ params["fc2"]["w"] + params["fc2"]["b"])
    if postprocess and params.get("pca") is not None:
        x = pca_postprocess(params["pca"], x)
    return x


def pca_postprocess(pca: Dict, embeddings: jnp.ndarray) -> jnp.ndarray:
    """AudioSet postprocessor: PCA whiten + clip + 8-bit quantize-dequantize
    (what the hub model applies by default)."""
    x = (pca["matrix"] @ (embeddings.T - pca["means"])).T
    x = jnp.clip(x, -2.0, 2.0)
    q = jnp.round((x + 2.0) * (255.0 / 4.0))
    return jnp.clip(q, 0.0, 255.0)


_TORCH_FEATURE_IDX = {  # torchvggish nn.Sequential indices of conv layers
    "conv1": 0, "conv2": 3, "conv3_1": 6, "conv3_2": 8, "conv4_1": 11, "conv4_2": 13,
}
_TORCH_FC_IDX = {"fc1_1": 0, "fc1_2": 2, "fc2": 4}


def convert_torch_state_dict(state_dict, pca_params: Optional[Dict] = None) -> Dict:
    """torchvggish state_dict -> our params (NHWC / in-out layouts)."""

    def arr(name):
        v = state_dict[name]
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    params: Dict = {}
    for ours, idx in _TORCH_FEATURE_IDX.items():
        w = arr(f"features.{idx}.weight")          # [out, in, kh, kw]
        params[ours] = {
            "w": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
            "b": jnp.asarray(arr(f"features.{idx}.bias")),
        }
    for ours, idx in _TORCH_FC_IDX.items():
        params[ours] = {
            "w": jnp.asarray(arr(f"embeddings.{idx}.weight").T),
            "b": jnp.asarray(arr(f"embeddings.{idx}.bias")),
        }
    params["pca"] = None
    if pca_params is not None:
        params["pca"] = {
            "matrix": jnp.asarray(np.asarray(pca_params["matrix"], np.float32)),
            "means": jnp.asarray(np.asarray(pca_params["means"], np.float32).reshape(-1, 1)),
        }
    return params
