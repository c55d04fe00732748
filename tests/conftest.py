"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding correctness is
validated on host CPU devices (the driver separately dry-runs the
multi-chip path via __graft_entry__.dryrun_multichip).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment pins JAX_PLATFORMS=axon (the TPU tunnel); override for tests.
jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: repeated suite runs skip the big compiles
import pathlib as _pathlib  # noqa: E402

_cache = _pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"
_cache.mkdir(exist_ok=True)
jax.config.update("jax_compilation_cache_dir", str(_cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture()
def tmp_data_root(tmp_path):
    from lameness_tpu.core.config import Config
    cfg = Config.load(data_root=str(tmp_path / "data"))
    cfg.dirs.ensure()
    return cfg


GOLDEN_CLIPS = [
    "/root/reference/data/canonical/5c3864af-b292-43e7-a319-becb0e98c230_canonical.mp4",
    "/root/reference/data/canonical/7e41cf93-185b-459b-8d53-e3c9aba9a97e_canonical.mp4",
]


@pytest.fixture(scope="session")
def golden_clip_path():
    import pathlib
    p = pathlib.Path(GOLDEN_CLIPS[0])
    if not p.exists():
        pytest.skip("golden canonical clip not available")
    return p
