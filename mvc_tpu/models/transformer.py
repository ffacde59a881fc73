"""Multimodal transformer captioner.

The reference ships an MDVC-derived audio+video transformer that is dead code
and would crash if called (its generator is invoked with the wrong arity —
reference src/models/transformer.py:245,338; never imported by
models/__init__.py).  This is a working TPU-native realization of that
capability: per-modality encoders, a shared caption decoder with causal
self-attention + per-modality cross-attention, and late-fusion log-prob
averaging, all pre-norm (the reference's ResidualConnection is pre-norm,
src/models/transformer.py:143-153).

API-compatible with the RNN captioners where it matters: ``forward`` returns
``[L, B, V]`` log-probs with row 0 zeroed (same loss contract), ``predict_tokens``
supports greedy and beam via the shared beam machinery, reconstructors are
N/A (``reconstructor_type == "none"``).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mvc_tpu.config import AUDIO_FEATURE_DIM, SOS_ID, VISUAL_FEATURE_DIM
from mvc_tpu.models import beam as beam_mod
from mvc_tpu.models.initializers import embedding_params, linear_params


@dataclasses.dataclass(frozen=True)
class TransformerConfig:
    vocab_size: int = 1024
    d_model: int = 512
    num_heads: int = 8
    num_layers: int = 2
    d_ff: int = 2048
    visual_dim: int = VISUAL_FEATURE_DIM
    audio_dim: int = AUDIO_FEATURE_DIM
    max_len: int = 3660     # positional-encoding cap (reference transformer.py:52)

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


# ----------------------------------------------------------------- primitives
def _layernorm_init(d):
    return {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))}


def _layernorm(p, x, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _mha_init(key, d_model):
    k = jax.random.split(key, 4)
    return {n: linear_params(kk, d_model, d_model) for n, kk in zip(("q", "k", "v", "o"), k)}


def _mha(p, q_in, kv_in, num_heads, mask=None):
    """q_in: [B, Lq, D], kv_in: [B, Lk, D], mask broadcastable to
    [B, heads, Lq, Lk] (True = attendable)."""
    B, Lq, D = q_in.shape
    Lk = kv_in.shape[1]
    hd = D // num_heads

    def proj(pp, x):
        return (x @ pp["w"] + pp["b"]).reshape(B, -1, num_heads, hd).transpose(0, 2, 1, 3)

    q = proj(p["q"], q_in)
    k = proj(p["k"], kv_in)
    v = proj(p["v"], kv_in)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(hd)
    if mask is not None:
        logits = jnp.where(mask, logits, -1e9)
    weights = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", weights, v)
    out = out.transpose(0, 2, 1, 3).reshape(B, Lq, D)
    return out @ p["o"]["w"] + p["o"]["b"]


def _ffn_init(key, d_model, d_ff):
    k1, k2 = jax.random.split(key)
    return {"in": linear_params(k1, d_model, d_ff), "out": linear_params(k2, d_ff, d_model)}


def _ffn(p, x):
    return jax.nn.relu(x @ p["in"]["w"] + p["in"]["b"]) @ p["out"]["w"] + p["out"]["b"]


def positional_encoding(max_len: int, d_model: int) -> np.ndarray:
    pos = np.arange(max_len)[:, None]
    i = np.arange(d_model)[None, :]
    angle = pos / np.power(10000.0, (2 * (i // 2)) / d_model)
    pe = np.where(i % 2 == 0, np.sin(angle), np.cos(angle))
    return pe.astype(np.float32)


# ----------------------------------------------------------------- stacks
def _encoder_layer_init(key, cfg):
    k = jax.random.split(key, 4)
    return {
        "ln1": _layernorm_init(cfg.d_model), "attn": _mha_init(k[0], cfg.d_model),
        "ln2": _layernorm_init(cfg.d_model), "ffn": _ffn_init(k[1], cfg.d_model, cfg.d_ff),
    }


def _encoder_layer(p, x, cfg, mask):
    x = x + _mha(p["attn"], _layernorm(p["ln1"], x), _layernorm(p["ln1"], x), cfg.num_heads, mask)
    x = x + _ffn(p["ffn"], _layernorm(p["ln2"], x))
    return x


def _decoder_layer_init(key, cfg):
    k = jax.random.split(key, 3)
    return {
        "ln1": _layernorm_init(cfg.d_model), "self": _mha_init(k[0], cfg.d_model),
        "ln2": _layernorm_init(cfg.d_model), "cross": _mha_init(k[1], cfg.d_model),
        "ln3": _layernorm_init(cfg.d_model), "ffn": _ffn_init(k[2], cfg.d_model, cfg.d_ff),
    }


def _decoder_layer(p, x, memory, cfg, self_mask, cross_mask):
    h = _layernorm(p["ln1"], x)
    x = x + _mha(p["self"], h, h, cfg.num_heads, self_mask)
    x = x + _mha(p["cross"], _layernorm(p["ln2"], x), memory, cfg.num_heads, cross_mask)
    x = x + _ffn(p["ffn"], _layernorm(p["ln3"], x))
    return x


# ------------------------------------------------- incremental (KV-cached)
def _proj(pp, x):
    return x @ pp["w"] + pp["b"]


def _heads(x, num_heads):
    B, L, D = x.shape
    return x.reshape(B, L, num_heads, D // num_heads).transpose(0, 2, 1, 3)


def _mha_cached(p, q_in, k_cache, v_cache, num_heads, mask):
    """One-query attention against cached K/V.  q_in: [B, 1, D];
    k_cache/v_cache: [B, Lk, D] (already projected); mask broadcastable to
    [B, heads, 1, Lk]."""
    B, _, D = q_in.shape
    hd = D // num_heads
    q = _heads(_proj(p["q"], q_in), num_heads)            # [B, h, 1, hd]
    k = _heads(k_cache, num_heads)
    v = _heads(v_cache, num_heads)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(hd)
    if mask is not None:
        logits = jnp.where(mask, logits, -1e9)
    weights = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", weights, v)
    out = out.transpose(0, 2, 1, 3).reshape(B, 1, D)
    return _proj(p["o"], out)


def _decoder_layer_step(p, x_t, t, cache, mem_kv, cfg, cross_mask):
    """One decode position through one layer with cached self K/V and
    precomputed cross K/V.  x_t: [B, 1, D]; cache: {"k","v"} [B, Lh, D];
    returns (x_t', cache')."""
    h = _layernorm(p["ln1"], x_t)
    cdt = cache["k"].dtype        # keep the cache dtype under bf16 models
    cache = {
        "k": jax.lax.dynamic_update_slice_in_dim(
            cache["k"], _proj(p["self"]["k"], h).astype(cdt), t, 1),
        "v": jax.lax.dynamic_update_slice_in_dim(
            cache["v"], _proj(p["self"]["v"], h).astype(cdt), t, 1),
    }
    Lh = cache["k"].shape[1]
    self_mask = (jnp.arange(Lh) <= t)[None, None, None, :]
    x_t = x_t + _mha_cached(p["self"], h, cache["k"], cache["v"], cfg.num_heads, self_mask)
    x_t = x_t + _mha_cached(
        p["cross"], _layernorm(p["ln2"], x_t), mem_kv["k"], mem_kv["v"],
        cfg.num_heads, cross_mask,
    )
    x_t = x_t + _ffn(p["ffn"], _layernorm(p["ln3"], x_t))
    return x_t, cache


class TransformerCaptioning:
    """Audio+video transformer captioner with late log-prob fusion."""

    reconstructor_type = "none"

    def __init__(self, vocab_size: int, config: Optional[TransformerConfig] = None,
                 teacher_forcing_ratio: float = 1.0, dtype=jnp.float32):
        del teacher_forcing_ratio  # transformers always teacher-force in training
        base = config or TransformerConfig()
        self.cfg = base.replace(vocab_size=vocab_size)
        self.vocab_size = vocab_size
        self.dtype = dtype
        self._pe = jnp.asarray(positional_encoding(self.cfg.max_len, self.cfg.d_model))

    def init(self, key) -> Dict:
        cfg = self.cfg
        keys = jax.random.split(key, 8 + 4 * cfg.num_layers)
        params = {
            "embedding": embedding_params(keys[0], cfg.vocab_size, cfg.d_model),
            "visual_in": linear_params(keys[1], cfg.visual_dim, cfg.d_model),
            "audio_in": linear_params(keys[2], cfg.audio_dim, cfg.d_model),
            "v_encoder": [], "a_encoder": [], "v_decoder": [], "a_decoder": [],
            "ln_v": _layernorm_init(cfg.d_model),
            "ln_a": _layernorm_init(cfg.d_model),
            "generator": linear_params(keys[3], cfg.d_model, cfg.vocab_size),
        }
        ki = 4
        for _ in range(cfg.num_layers):
            params["v_encoder"].append(_encoder_layer_init(keys[ki], self.cfg)); ki += 1
            params["a_encoder"].append(_encoder_layer_init(keys[ki], self.cfg)); ki += 1
            params["v_decoder"].append(_decoder_layer_init(keys[ki], self.cfg)); ki += 1
            params["a_decoder"].append(_decoder_layer_init(keys[ki], self.cfg)); ki += 1
        return params

    # ------------------------------------------------------------ encode
    def _encode(self, params, audio, visual, feat_mask):
        cfg = self.cfg
        T = visual.shape[1]
        v = (visual.astype(self.dtype) @ params["visual_in"]["w"] + params["visual_in"]["b"])
        a = (audio.astype(self.dtype) @ params["audio_in"]["w"] + params["audio_in"]["b"])
        v = v + self._pe[:T]
        a = a + self._pe[:T]
        enc_mask = None
        if feat_mask is not None:
            enc_mask = feat_mask[:, None, None, :]
        for vl, al in zip(params["v_encoder"], params["a_encoder"]):
            v = _encoder_layer(vl, v, cfg, enc_mask)
            a = _encoder_layer(al, a, cfg, enc_mask)
        return a, v, enc_mask

    def _decode_logits(self, params, tokens, a_mem, v_mem, cross_mask):
        """tokens: [B, L] -> fused log-probs [B, L, V]."""
        cfg = self.cfg
        B, L = tokens.shape
        x = params["embedding"]["table"][tokens].astype(self.dtype) + self._pe[:L]
        causal = jnp.tril(jnp.ones((L, L), bool))[None, None]
        xv, xa = x, x
        for vl, al in zip(params["v_decoder"], params["a_decoder"]):
            xv = _decoder_layer(vl, xv, v_mem, cfg, causal, cross_mask)
            xa = _decoder_layer(al, xa, a_mem, cfg, causal, cross_mask)
        g = params["generator"]
        v_logp = jax.nn.log_softmax((_layernorm(params["ln_v"], xv) @ g["w"] + g["b"]).astype(jnp.float32), -1)
        a_logp = jax.nn.log_softmax((_layernorm(params["ln_a"], xa) @ g["w"] + g["b"]).astype(jnp.float32), -1)
        # late fusion: average of the modality log-probs (a working version of
        # the reference's broken generator fusion, transformer.py:236-249)
        return 0.5 * (v_logp + a_logp)

    # ------------------------------------------------------------ api
    def forward(self, params, audio, visual, captions, rng=None,
                teacher_forcing_ratio=None, feat_mask=None):
        """captions: [L, B] -> (outputs [L, B, V] log-probs with row 0 zeroed,
        None, None) — the RNN captioners' loss contract."""
        del rng, teacher_forcing_ratio
        a_mem, v_mem, cross_mask = self._encode(params, audio, visual, feat_mask)
        tokens = captions.T                                   # [B, L]
        logp = self._decode_logits(params, tokens[:, :-1], a_mem, v_mem, cross_mask)
        # position t predicts token t+1; align to the [L, B, V] contract
        out = jnp.transpose(logp, (1, 0, 2))                  # [L-1, B, V]
        zeros = jnp.zeros((1,) + out.shape[1:], out.dtype)
        return jnp.concatenate([zeros, out], axis=0), None, None

    def _cross_kv(self, params, a_mem, v_mem):
        """Per-layer cross-attention K/V of the encoder memories, projected
        once per sequence (they are step-invariant)."""
        def kv(layers, mem):
            return [
                {"k": _proj(l["cross"]["k"], mem), "v": _proj(l["cross"]["v"], mem)}
                for l in layers
            ]
        return kv(params["a_decoder"], a_mem), kv(params["v_decoder"], v_mem)

    def _fused_logp_1(self, params, xv, xa):
        g = params["generator"]
        v_logp = jax.nn.log_softmax(
            (_layernorm(params["ln_v"], xv) @ g["w"] + g["b"]).astype(jnp.float32), -1)
        a_logp = jax.nn.log_softmax(
            (_layernorm(params["ln_a"], xa) @ g["w"] + g["b"]).astype(jnp.float32), -1)
        return 0.5 * (v_logp + a_logp)

    def predict_tokens(self, params, audio, visual, max_caption_len=30,
                       mode="direct", beam_alpha=0.0, beam_width=5, feat_mask=None):
        # Pre-cast f32 master params to the compute dtype ONCE: the layers use
        # params raw, so a bf16 model fed f32 params would otherwise promote
        # every matmul to f32 and re-stream f32 weights per decode step (the
        # same trap decoder.cast_params_for_decode fixes for the RNN paths).
        from mvc_tpu.models.decoder import cast_params_for_decode

        params = cast_params_for_decode(params, self.dtype)
        a_mem, v_mem, cross_mask = self._encode(params, audio, visual, feat_mask)
        B = visual.shape[0]
        L = int(max_caption_len)
        cfg = self.cfg

        if mode == "direct":
            # Incremental KV-cached decode (ROADMAP #6): O(L) per step
            # instead of re-running the O(L^2) prefix.  Exact-token parity
            # with the full-prefix path (tests/test_transformer.py).
            a_kv, v_kv = self._cross_kv(params, a_mem, v_mem)
            D = cfg.d_model

            def empty_caches():
                return [
                    {"k": jnp.zeros((B, L, D), self.dtype),
                     "v": jnp.zeros((B, L, D), self.dtype)}
                    for _ in range(cfg.num_layers)
                ]

            def step(carry, t):
                prev, v_caches, a_caches = carry
                pe_t = jax.lax.dynamic_slice_in_dim(self._pe, t, 1, 0)
                x_t = params["embedding"]["table"][prev].astype(self.dtype)[:, None, :] + pe_t
                xv, xa = x_t, x_t
                new_v, new_a = [], []
                for i in range(cfg.num_layers):
                    xv, cv = _decoder_layer_step(
                        params["v_decoder"][i], xv, t, v_caches[i], v_kv[i], cfg, cross_mask)
                    xa, ca = _decoder_layer_step(
                        params["a_decoder"][i], xa, t, a_caches[i], a_kv[i], cfg, cross_mask)
                    new_v.append(cv)
                    new_a.append(ca)
                logp = self._fused_logp_1(params, xv, xa)[:, 0]     # [B, V]
                nxt = jnp.argmax(logp, axis=-1).astype(jnp.int32)
                return (nxt, new_v, new_a), nxt

            prev0 = jnp.full((B,), SOS_ID, dtype=jnp.int32)
            _, toks = jax.lax.scan(
                step, (prev0, empty_caches(), empty_caches()), jnp.arange(L - 1)
            )
            tokens0 = jnp.full((B, 1), SOS_ID, dtype=jnp.int32)
            return jnp.concatenate([tokens0, toks.T], axis=1)   # [B, L]
        if mode != "beam":
            raise ValueError(f"mode must be 'direct' or 'beam', got {mode}")

        # KV-cached beam: O(L) per step like the greedy path.  Caches are
        # [B, W, Lh, D] pytree leaves, so beam_search's regather permutes
        # them across beams automatically.  Exact-token parity with the
        # full-prefix formulation is asserted in tests/test_transformer.py.
        W = beam_width
        BW = B * W
        D = cfg.d_model
        Lh = max_caption_len + 1                   # beam_search step count
        a_kv, v_kv = self._cross_kv(params, a_mem, v_mem)
        a_kv = jax.tree.map(lambda x: jnp.repeat(x, W, axis=0), a_kv)
        v_kv = jax.tree.map(lambda x: jnp.repeat(x, W, axis=0), v_kv)
        c_rep = jnp.repeat(cross_mask, W, axis=0) if cross_mask is not None else None

        def empty_caches():
            return [
                {"k": jnp.zeros((B, W, Lh, D), self.dtype),
                 "v": jnp.zeros((B, W, Lh, D), self.dtype)}
                for _ in range(cfg.num_layers)
            ]

        def step_fn(prev, state):
            v_caches, a_caches, t = state
            pe_t = jax.lax.dynamic_slice_in_dim(self._pe, t, 1, 0)
            x_t = (params["embedding"]["table"][prev.reshape(BW)]
                   .astype(self.dtype)[:, None, :] + pe_t)
            xv, xa = x_t, x_t
            new_v, new_a = [], []
            for i in range(cfg.num_layers):
                cv = jax.tree.map(lambda x: x.reshape(BW, Lh, D), v_caches[i])
                ca = jax.tree.map(lambda x: x.reshape(BW, Lh, D), a_caches[i])
                xv, cv = _decoder_layer_step(
                    params["v_decoder"][i], xv, t, cv, v_kv[i], cfg, c_rep)
                xa, ca = _decoder_layer_step(
                    params["a_decoder"][i], xa, t, ca, a_kv[i], cfg, c_rep)
                new_v.append(jax.tree.map(lambda x: x.reshape(B, W, Lh, D), cv))
                new_a.append(jax.tree.map(lambda x: x.reshape(B, W, Lh, D), ca))
            logp = self._fused_logp_1(params, xv, xa)[:, 0]     # [BW, V]
            return logp.reshape(B, W, -1), (new_v, new_a, t + 1)

        return beam_mod.beam_search(
            step_fn, (empty_caches(), empty_caches(), jnp.asarray(0, jnp.int32)),
            B, self.vocab_size,
            max_caption_len=max_caption_len, beam_alpha=beam_alpha, beam_width=beam_width,
        )

    def predict(self, params, vocab, audio, visual, **kw):
        from mvc_tpu.models.captioning import captions_from_tokens

        return captions_from_tokens(vocab, self.predict_tokens(params, audio, visual, **kw))
