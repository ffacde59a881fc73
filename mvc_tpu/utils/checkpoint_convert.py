"""Convert a reference torch checkpoint into our parameter pytree.

The reference saves ``{epoch, v_decoder, a_decoder, v_reconstructor,
a_reconstructor, history}`` of torch state_dicts (reference
src/train.py:65-80).  Layout mapping per module:

FeaturesCaptioning (reference src/models/features_captioning.py:36-56):
    embedding.weight      [V, E]    -> embedding.table          [V, E]
    attention.W.weight    [A, H]    -> attention.W (transposed) [H, A]
    attention.U.weight    [A, F]    -> attention.U (transposed) [F, A]
    attention.b           [A]       -> attention.b
    attention.w.weight    [1, A]    -> attention.w              [A]
    rnn.weight_ih_l0      [G*H, in] -> rnn.wi (transposed)      [in, G*H]
    rnn.weight_hh_l0      [G*H, H]  -> rnn.wh (transposed)      [H, G*H]
    rnn.bias_ih_l0 / bias_hh_l0     -> rnn.bi / rnn.bh
    out.weight            [V, H]    -> out.w (transposed)       [H, V]
    out.bias              [V]       -> out.b

Reconstructors use the same rnn/attention mappings
(reference src/models/reconstructor.py:33-46,122-129).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def _arr(v) -> np.ndarray:
    return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v, np.float32)


def _convert_rnn(sd: Dict, prefix: str) -> Dict:
    return {
        "wi": _arr(sd[f"{prefix}.weight_ih_l0"]).T.copy(),
        "wh": _arr(sd[f"{prefix}.weight_hh_l0"]).T.copy(),
        "bi": _arr(sd[f"{prefix}.bias_ih_l0"]),
        "bh": _arr(sd[f"{prefix}.bias_hh_l0"]),
    }


def _convert_attention(sd: Dict, prefix: str) -> Dict:
    return {
        "W": _arr(sd[f"{prefix}.W.weight"]).T.copy(),
        "U": _arr(sd[f"{prefix}.U.weight"]).T.copy(),
        "b": _arr(sd[f"{prefix}.b"]),
        "w": _arr(sd[f"{prefix}.w.weight"])[0],
    }


def _to_jax(tree):
    import jax
    import jax.numpy as jnp

    return jax.tree.map(jnp.asarray, tree)


def convert_decoder_state_dict(sd: Dict) -> Dict:
    return _to_jax({
        "embedding": {"table": _arr(sd["embedding.weight"])},
        "attention": _convert_attention(sd, "attention"),
        "rnn": _convert_rnn(sd, "rnn"),
        "out": {"w": _arr(sd["out.weight"]).T.copy(), "b": _arr(sd["out.bias"])},
    })


def convert_reconstructor_state_dict(sd: Optional[Dict]) -> Optional[Dict]:
    if sd is None:
        return None
    out = {"rnn": _convert_rnn(sd, "rnn")}
    if any(k.startswith("attention.") for k in sd):
        out["attention"] = _convert_attention(sd, "attention")
    return _to_jax(out)


def convert_reference_checkpoint(path: str) -> Dict:
    """Load a reference ``.ckpt`` (torch pickle) and return
    ``{epoch, params, history}`` with our dual-model parameter layout."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    params = {
        "v_decoder": convert_decoder_state_dict(ckpt["v_decoder"]),
        "a_decoder": convert_decoder_state_dict(ckpt["a_decoder"]),
        "v_reconstructor": convert_reconstructor_state_dict(ckpt.get("v_reconstructor")),
        "a_reconstructor": convert_reconstructor_state_dict(ckpt.get("a_reconstructor")),
    }
    return {"epoch": ckpt.get("epoch", 0), "params": params, "history": ckpt.get("history")}
