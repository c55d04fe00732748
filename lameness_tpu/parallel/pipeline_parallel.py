"""Pipeline parallelism: GPipe-style microbatching over a ``stage`` mesh axis.

Complements the dp/tp axes in ``pipeline/train.py``: a layer-partitioned
model runs as a ``shard_map`` over a ``stage`` axis where every device
holds its own layer block's weights, microbatches flow through the ring
via ``jax.lax.ppermute``, and the schedule is a ``lax.scan`` over
S + M − 1 ticks (S stages, M microbatches) — the classic fill/drain
pipeline with no data-dependent control flow.

Numerically exact vs the sequential model (unit-tested on the CPU mesh).
Useful when a model's layers do not fit one chip's HBM — the ViT encoders
here fit comfortably, so the engine defaults to dp×tp; this module is the
scaling path beyond that.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

STAGE_AXIS = "stage"


def make_stage_mesh(n_stages: int, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    return Mesh(np.array(devices[:n_stages]), (STAGE_AXIS,))


def stack_stage_params(per_stage_params: list) -> Any:
    """List of per-stage param pytrees (same structure) -> stacked pytree
    with a leading stage axis."""
    return jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *per_stage_params)


def pipeline_apply(stage_fn: Callable[[Any, jnp.ndarray], jnp.ndarray],
                   stacked_params: Any, x: jnp.ndarray, mesh: Mesh,
                   num_microbatches: int) -> jnp.ndarray:
    """Run ``stage_fn`` S times over the stage ring, microbatched.

    stage_fn(params_for_stage, micro_x) -> micro_y (same shape as micro_x).
    stacked_params: pytree with leading stage axis S.
    x: (B, ...) with B divisible by num_microbatches.

    Schedule: at tick t, stage s computes microbatch (t - s) if it is in
    range; outputs circulate to the next stage via ppermute.  After
    S + M - 1 ticks, the last stage has emitted every microbatch.
    """
    n_stages = mesh.shape[STAGE_AXIS]
    b = x.shape[0]
    assert b % num_microbatches == 0, (b, num_microbatches)
    mb = b // num_microbatches
    micro = x.reshape(num_microbatches, mb, *x.shape[1:])

    def per_stage(params_s, micro_in):
        """Runs on ONE device; params_s has the stage leading axis removed
        by shard_map, micro_in is the full microbatch stack (replicated)."""
        stage = jax.lax.axis_index(STAGE_AXIS)
        params_local = jax.tree_util.tree_map(lambda p: p[0], params_s)
        ticks = n_stages + num_microbatches - 1

        def tick(carry, t):
            incoming, outputs = carry
            # stage 0 reads microbatch t from the input stack; others use
            # what arrived over the ring last tick
            mb_idx = jnp.clip(t, 0, num_microbatches - 1)
            first_in = micro_in[0][mb_idx]
            current = jnp.where(stage == 0, first_in, incoming)
            active = (t - stage >= 0) & (t - stage < num_microbatches)
            out = stage_fn(params_local, current)
            out = jnp.where(active, out, jnp.zeros_like(out))
            # the LAST stage records its finished microbatch (index t-S+1)
            rec_idx = jnp.clip(t - (n_stages - 1), 0, num_microbatches - 1)
            record = active & (stage == n_stages - 1)
            outputs = jax.lax.cond(
                record,
                lambda o: o.at[rec_idx].set(out),
                lambda o: o, outputs)
            # circulate to the next stage
            nxt = jax.lax.ppermute(
                out, STAGE_AXIS,
                [(i, (i + 1) % n_stages) for i in range(n_stages)])
            return (nxt, outputs), None

        init_in = jnp.zeros_like(micro_in[0][0])
        init_out = jnp.zeros_like(micro_in[0])
        (_, outputs), _ = jax.lax.scan(
            tick, (init_in, init_out), jnp.arange(ticks))
        # only the last stage ever writes into `outputs`; psum propagates
        # its stack to every stage (the rest contributed zeros)
        outputs = jax.lax.psum(outputs, STAGE_AXIS)
        return outputs[None]

    shard_map = jax.shard_map
    stage_spec = jax.tree_util.tree_map(lambda _: P(STAGE_AXIS),
                                        stacked_params)
    fn = shard_map(per_stage, mesh=mesh,
                   in_specs=(stage_spec, P(STAGE_AXIS)),
                   out_specs=P(STAGE_AXIS),
                   check_vma=False)
    micro_rep = jnp.broadcast_to(micro[None],
                                 (n_stages, *micro.shape))
    outputs = fn(stacked_params, micro_rep)     # (S, M, mb, ...)
    # the psum already merged results; take stage 0's copy
    return outputs[0].reshape(b, *x.shape[1:])


def sequential_reference(stage_fn, per_stage_params: list,
                         x: jnp.ndarray) -> jnp.ndarray:
    """Ground truth: apply the stages one after another."""
    for p in per_stage_params:
        x = stage_fn(p, x)
    return x
