"""Ensemble (MC-dropout) parallelism: shard the sample axis over a mesh.

No model in this system is mixture-of-experts (SURVEY §2.8), so classic
expert parallelism has no weights to shard.  What the workload DOES have
is an embarrassingly-parallel ensemble axis: the temporal heads estimate
uncertainty with n-sample MC dropout (``tcn-pipeline/app/main.py:169-195``,
10 stochastic forwards per clip).  On a pod slice those samples are the
natural extra parallel axis once dp over clips is exhausted — e.g. a
single latency-critical clip can spread its 8 MC samples over 8 chips.

Each sample's dropout mask is a pure function of its PRNG key, and
sharding the key/sample axis changes placement, not keys — values match
the single-device vmap to float reassociation (~1e-7; the partitioned
program fuses differently).  ``tests/test_ensemble_parallel.py`` pins
this on a virtual 8-CPU mesh.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ENSEMBLE_AXIS = "ensemble"


def make_ensemble_mesh(n_devices: Optional[int] = None,
                       devices: Optional[Sequence[jax.Device]] = None
                       ) -> Mesh:
    """1-D mesh whose single axis carries MC/ensemble samples."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    return Mesh(np.array(list(devices)[:n_devices]), (ENSEMBLE_AXIS,))


def mc_dropout_sharded(apply_one: Callable, mesh: Mesh, rng: jax.Array,
                       n_samples: int):
    """Run ``apply_one(key)`` for n_samples PRNG keys with the sample
    axis sharded over ``mesh``.

    apply_one: key -> pytree (one stochastic forward; close over params
    and inputs — they are replicated).  n_samples must be a multiple of
    the mesh size so every device owns the same number of samples.

    Returns the stacked pytree with leading axis n_samples, sharded over
    the mesh (callers reducing to mean/std pull only scalars to host).
    """
    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    assert n_samples % n_dev == 0, \
        f"n_samples={n_samples} not a multiple of mesh size {n_dev}"
    keys = jax.random.split(rng, n_samples)
    key_sharding = NamedSharding(mesh, P(ENSEMBLE_AXIS))
    out_sharding = NamedSharding(mesh, P(ENSEMBLE_AXIS))
    fn = jax.jit(jax.vmap(apply_one),
                 in_shardings=(key_sharding,),
                 out_shardings=out_sharding)
    return fn(jax.device_put(keys, key_sharding))
