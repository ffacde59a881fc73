"""Weight-only int8 quantization for the decode hot loop (opt-in).

Large-batch decode sits on the HBM roof (BENCH_NOTES round 3: greedy B=1024
at 78% of peak, beam B=256 on the XLA scan) and the dominant bytes are the
per-step re-streams of each decoder's big matrices — ``rnn.wi`` / ``rnn.wh``
and the vocab projection ``out.w``.  Storing those as int8 with per-output-
channel f32 scales halves (vs bf16) or quarters (vs f32) the stream; XLA
fuses the dequantize (``q.astype(dtype) * s``) into the matmul operand read,
so HBM traffic is int8 while the MXU still sees the compute dtype.

This is a THROUGHPUT knob, not a parity path: quantization perturbs logits
by ~1e-2 relative, which can flip tokens on near-ties (the same conditioning
story as bf16-vs-f32 on hardware, CLAUDE.md).  It is therefore opt-in at
predict time only — training and default eval never see it.  The fused
Pallas kernels stream plain tiles and do not accept quantized trees; the
dispatch gate (models/captioning._pallas_dispatch) detects quantized params
and takes the freely-shardable XLA scan, which is exactly the large-batch
regime where int8 pays (the reference has no analogue: its beam is a Python
loop, src/models/features_captioning.py:131-228).

Only 2-D matmul weights quantize.  Embedding tables are row-GATHERED (one
row per live token), attention projections are [H,A]/[F,A] with A=256 —
neither is a meaningful stream; both stay in the model dtype.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp


def quantize_weight(w: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """[in, out] float matrix -> {"q": int8 [in, out], "s": f32 [1, out]}
    (symmetric per-output-channel; zero columns get scale 1 to avoid 0/0)."""
    w = jnp.asarray(w, jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=0, keepdims=True)
    s = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    return {"q": q, "s": s}


def is_quantized(w) -> bool:
    return isinstance(w, dict) and "q" in w and "s" in w


def wmat(w, dtype) -> jnp.ndarray:
    """A weight as a compute-dtype matrix: dequantize int8 (XLA fuses the
    convert+scale into the matmul read) or plain ``astype``."""
    if is_quantized(w):
        return w["q"].astype(dtype) * w["s"].astype(dtype)
    return w.astype(dtype)


def quantize_decoder_params(dec_params: Dict) -> Dict:
    """A decoder param tree (models/decoder.init_decoder layout) with the
    streamed hot-loop matrices int8-quantized; everything else shared."""
    out = dict(dec_params)
    out["rnn"] = dict(dec_params["rnn"])
    out["rnn"]["wi"] = quantize_weight(dec_params["rnn"]["wi"])
    out["rnn"]["wh"] = quantize_weight(dec_params["rnn"]["wh"])
    out["out"] = dict(dec_params["out"])
    out["out"]["w"] = quantize_weight(dec_params["out"]["w"])
    return out


def is_quantized_decoder(dec_params: Dict) -> bool:
    return is_quantized(dec_params.get("rnn", {}).get("wi"))


def quantize_model_params(params: Dict) -> Dict:
    """Quantize every decoder subtree of a model param tree
    (``decoder`` for AVCaptioning; ``v_decoder``/``a_decoder`` for the dual
    model).  Reconstructors are untouched — they only run in training."""
    out = dict(params)
    for name in ("decoder", "v_decoder", "a_decoder"):
        if name in out and out[name] is not None:
            out[name] = quantize_decoder_params(out[name])
    return out
