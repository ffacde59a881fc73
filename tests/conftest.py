"""Test configuration: force JAX onto CPU with 8 virtual devices so
multi-chip sharding paths are exercised without TPU hardware
(SURVEY.md §4 — the reference has no test suite at all; this pyramid is new).
"""

import os

# Hard override onto CPU: the driver environment pins JAX_PLATFORMS=axon (a
# remote TPU tunnel) and a sitecustomize partially imports jax at interpreter
# startup, so the env var alone is captured too early to change — we must also
# update the live jax config before any backend is initialized.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
# XLA:CPU aborts the whole process ("Termination timeout ... exceeded.
# Exiting to ensure a consistent program state", rendezvous.cc) when an
# 8-virtual-device collective's participant threads starve past 40 s — easy
# on this 1-core box whenever anything else competes for the CPU.  Raise the
# rendezvous timeouts; these are DebugOptions parsed from XLA_FLAGS at first
# backend init, so they must be set here, before jax imports.
if "collective_call_terminate_timeout" not in _flags:
    _flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
               " --xla_cpu_collective_call_terminate_timeout_seconds=600")
os.environ["XLA_FLAGS"] = _flags

import jax

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: the suite is dominated by CPU XLA compiles, which
# are identical across runs.  The dir is keyed by host CPU identity + jaxlib
# version: cached XLA:CPU AOT executables are machine-code for the compiling
# host, and loading one compiled on a different machine can SIGILL/abort
# (observed as a mid-suite "Fatal Python error: Aborted" when the repo — and
# its cache — outlived the machine it was built on).
import hashlib
import platform

try:
    with open("/proc/cpuinfo") as _f:
        _cpu = next((l for l in _f if l.startswith("flags")), platform.machine())
except OSError:
    _cpu = platform.machine()
import jaxlib

_host_key = hashlib.sha1(
    (_cpu + jaxlib.__version__).encode()
).hexdigest()[:10]
_cache_dir = os.path.join(os.path.dirname(__file__), f".jax_test_cache-{_host_key}")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np
import pytest

assert jax.default_backend() == "cpu", "tests must run on the virtual CPU mesh"
assert jax.device_count() == 8, "expected 8 virtual CPU devices for sharding tests"


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


CAPTIONS = [
    "a man is playing a guitar",
    "a man plays the guitar",
    "someone is playing music on a guitar",
    "a woman is cooking food in a kitchen",
    "a woman cooks a meal",
    "a person is slicing vegetables",
    "a dog is running in the park",
    "the dog runs across a field",
    "a cat is sitting on a couch",
    "two men are riding bikes down the street",
    "a man is riding a bike",
    "children are playing in the water",
    "a kid plays with a ball",
    "a man is driving a car",
    "the car drives down the road",
    "a group of people are dancing",
]


@pytest.fixture(scope="session")
def synthetic_msvd(tmp_path_factory):
    """A tiny on-disk MSVD-shaped dataset: features/{video,audio}/*.npy +
    metadata/{train,val,test,tiny}.csv + a prebuilt vocab."""
    import pandas as pd

    from mvc_tpu.data.vocabulary import Vocabulary

    root = tmp_path_factory.mktemp("msvd")
    (root / "metadata").mkdir()
    (root / "features" / "video").mkdir(parents=True)
    (root / "features" / "audio").mkdir(parents=True)

    gen = np.random.default_rng(1234)
    n_videos = 12
    rows = []
    for v in range(n_videos):
        vid = f"vid{v:03d}_0_10"
        t = int(gen.integers(3, 9))
        np.save(root / "features" / "video" / f"{vid}.npy", gen.normal(size=(t, 2048)).astype(np.float32))
        # Every third clip gets a mismatched/1-frame audio to exercise the
        # reshape + min-truncation quick fixes.
        if v % 3 == 0:
            np.save(root / "features" / "audio" / f"{vid}.npy", gen.normal(size=(128,)).astype(np.float32))
        else:
            np.save(root / "features" / "audio" / f"{vid}.npy", gen.normal(size=(t + 1, 128)).astype(np.float32))
        for c in range(2):
            cap = CAPTIONS[(2 * v + c) % len(CAPTIONS)]
            rows.append(
                {"VideoID": f"vid{v:03d}", "Start": 0, "End": 10, "Source": "clean", "Description": cap}
            )
    # One unverified row + one row whose features are missing (dropped by the
    # integrity filter).
    rows.append({"VideoID": "vid000", "Start": 0, "End": 10, "Source": "unverified", "Description": "bad row"})
    rows.append({"VideoID": "ghost", "Start": 0, "End": 10, "Source": "clean", "Description": "missing features"})

    df = pd.DataFrame(rows)
    for split in ("train", "val", "test"):
        df.to_csv(root / "metadata" / f"{split}.csv", index=False)
    df.head(6).to_csv(root / "metadata" / "tiny.csv", index=False)

    vocab = Vocabulary(freq_threshold=1)
    vocab.build_vocabulary([r["Description"] for r in rows])
    vocab.save(str(root / "metadata" / "vocab.json"))
    return root
