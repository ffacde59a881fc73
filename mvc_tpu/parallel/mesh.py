"""Device mesh + sharding rules.

The reference has no distributed layer at all (single process, one GPU —
SURVEY.md §2.3); this module IS the framework's comms layer.  Parallelism is
expressed as a 2-D ``jax.sharding.Mesh``:

- ``dp`` — data parallel: the batch axis of every input is sharded; XLA
  inserts the gradient all-reduce (psum) over ICI
- ``tp`` — tensor parallel: the vocab axis of each decoder's embedding table,
  output projection, and hence the logits is sharded; XLA inserts the
  all-gather / reduce-scatter around the log-softmax
- ``sp`` — sequence parallel (optional 3rd axis): the frame/time axis T of
  the feature tensors and the frame mask is sharded; the attention softmax's
  max/sum over T and the context weighted-sum become XLA collectives over
  ICI.  Useful when clips are long (T ≫ caption length) — attention keys,
  energies, and the reconstruction targets then live T/sp-sharded for the
  whole step.

Everything routes through ``jax.jit`` with NamedShardings (GSPMD), so the
same train step runs single-chip, multi-chip ICI, or multi-slice DCN
unchanged.  Axes the model family has no use for are intentionally absent:
pipeline parallelism has no stage structure to cut (the captioner is two
1-layer RNN decoders — see docs/ARCHITECTURE.md §parallelism for the
transformer family's story) and expert parallelism has no experts (no MoE
anywhere in the reference, SURVEY.md §2).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mvc_tpu.config import MeshConfig


def make_mesh(dp: int = -1, tp: int = 1, sp: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a ("dp", "tp") mesh — or ("dp", "tp", "sp") when ``sp > 1``.
    ``dp=-1`` consumes all remaining devices.  ``sp`` stays innermost so its
    softmax/context collectives ride the fastest ICI hops."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp == -1:
        assert n % (tp * sp) == 0, f"{n} devices not divisible by tp*sp={tp * sp}"
        dp = n // (tp * sp)
    assert dp * tp * sp <= n, f"mesh {dp}x{tp}x{sp} needs more than {n} devices"
    if sp > 1:
        grid = np.asarray(devices[: dp * tp * sp]).reshape(dp, tp, sp)
        return Mesh(grid, ("dp", "tp", "sp"))
    grid = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(grid, ("dp", "tp"))


def mesh_from_config(cfg: MeshConfig, devices=None) -> Mesh:
    return make_mesh(dp=cfg.dp, tp=cfg.tp, sp=getattr(cfg, "sp", 1), devices=devices)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Inputs sharded on the leading (batch) axis over dp."""
    return NamedSharding(mesh, P("dp"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _decoder_param_spec(path: str, leaf) -> P:
    """Partition rules for decoder/reconstructor parameter leaves.

    Vocab-sized dims shard over tp:
      embedding table [V, E]  -> P("tp", None)
      out.w           [H, V]  -> P(None, "tp")
      out.b           [V]     -> P("tp")
    Everything else replicates.
    """
    if "embedding" in path and leaf.ndim == 2:
        return P("tp", None)
    if path.endswith("out/w"):
        return P(None, "tp")
    if path.endswith("out/b"):
        return P("tp")
    return P()


def param_shardings(mesh: Mesh, params) -> object:
    """NamedSharding pytree for a model parameter tree."""

    def walk(tree, prefix):
        if isinstance(tree, dict):
            return {k: walk(v, f"{prefix}/{k}" if prefix else k) for k, v in tree.items()}
        if tree is None:
            return None
        return NamedSharding(mesh, _decoder_param_spec(prefix, tree))

    return walk(params, "")


_SP_TIME_AXIS = {"audio": 1, "visual": 1, "feat_mask": 1}  # [B, T, ...] keys


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Device-put a host batch with the batch axis over dp.  Time-first
    caption arrays ([L, B]) shard their second axis.  On an sp mesh, the
    frame axis T of the feature tensors and the frame mask additionally
    shards over sp (when T divides it); captions never shard on L — that is
    the decode scan axis.

    Multi-process (jax.distributed): each process passes its LOCAL shard of
    the batch (rows for its own devices, e.g. from
    ``DataLoader(process_index, process_count)``) and the global array is
    assembled across processes."""
    multiprocess = jax.process_count() > 1
    sp = mesh.shape.get("sp", 1)
    out = {}
    for k, v in batch.items():
        if not hasattr(v, "ndim"):
            out[k] = v
            continue
        if k == "captions":            # [L, B] time-first
            spec = P(None, "dp")
        elif (sp > 1 and k in _SP_TIME_AXIS
              and v.ndim > _SP_TIME_AXIS[k]
              and v.shape[_SP_TIME_AXIS[k]] % sp == 0):
            spec = P("dp", "sp")       # [B, T, ...]: batch over dp, frames over sp
        else:                          # [B, ...]
            spec = P("dp")
        sharding = NamedSharding(mesh, spec)
        if multiprocess:
            out[k] = jax.make_array_from_process_local_data(sharding, np.asarray(v))
        else:
            out[k] = jax.device_put(v, sharding)
    return out


def pad_batch_to_multiple(batch: dict, multiple: int) -> dict:
    """Pad the batch axis so it divides the dp mesh axis (padding rows carry
    sample_mask=False and drop out of every loss)."""
    import numpy as np

    ref_key = "audio" if "audio" in batch else "video_rows"
    b = batch[ref_key].shape[0]
    target = ((b + multiple - 1) // multiple) * multiple
    if target == b:
        return batch
    pad = target - b
    out = {}
    for k, v in batch.items():
        if not hasattr(v, "ndim"):
            out[k] = v
        elif k == "captions":
            out[k] = np.concatenate([v, np.zeros((v.shape[0], pad), v.dtype)], axis=1)
        else:
            out[k] = np.concatenate([v, np.zeros((pad, *v.shape[1:]), v.dtype)], axis=0)
    return out
