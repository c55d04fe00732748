"""Multi-chip training step for the lameness heads.

The reference has zero distributed training (SURVEY.md §2.5); this module
is the TPU-native story: one jitted train step over a (data, model) mesh —

- **dp**: the clip batch is sharded over the ``data`` axis; gradients are
  averaged by XLA's automatic collectives (no psum written by hand).
- **tp**: the DINO ViT encoder's attention QKV/out and MLP weights are
  sharded over the ``model`` axis (column/row parallel), so activations
  all-reduce over ICI inside each block.
- The sequence heads (TCN + GaitTransformer) are replicated — at 64-d
  width, sharding them would be all overhead.

Loss: BCE of both heads' clip-level probabilities against labels, plus the
DINO-embedding regulariser that keeps the encoder fine-tunable end to end.
``make_train_state``/``train_step`` are what ``__graft_entry__
.dryrun_multichip`` compiles over an N-device mesh.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import dino as dino_mod
from ..models import sequence_features as seqf
from ..models.gait_transformer import GaitTransformer
from ..models.tcn import TCN
from ..parallel.mesh import DATA_AXIS, MODEL_AXIS


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def _dino_param_spec(path: Tuple, leaf) -> P:
    """Tensor-parallel layout for the ViT: QKV/MLP-in column-sharded,
    out/MLP-out row-sharded over the model axis.  Canonical
    implementation lives in parallel.mesh (shared with tp inference)."""
    from ..parallel.mesh import dino_tp_spec
    return dino_tp_spec(path, leaf)


def make_models(hidden: int = 64, layers: int = 2, heads: int = 4,
                dino_patch: int = 14):
    dino = dino_mod.DinoV2(hidden_size=hidden, num_layers=layers,
                           num_heads=heads, patch_size=dino_patch,
                           pos_grid=4, ls_init=1.0)
    tcn = TCN(input_dim=44)
    gait = GaitTransformer(input_dim=44)
    return dino, tcn, gait


def init_train_state(rng: jax.Array, mesh: Mesh, models,
                     image_size: int = 56,
                     lr: float = 1e-4) -> Tuple[TrainState, optax.GradientTransformation]:
    dino, tcn, gait = models
    k1, k2, k3 = jax.random.split(rng, 3)
    params = {
        "dino": dino.init(k1, jnp.zeros((1, image_size, image_size, 3))),
        "tcn": tcn.init(k2, jnp.zeros((1, seqf.TARGET_LEN, 44))),
        "gait": gait.init(k3, jnp.zeros((1, seqf.TARGET_LEN, 44)),
                          jnp.zeros((1, seqf.TARGET_LEN), bool)),
    }
    tx = optax.adamw(lr)
    opt_state = tx.init(params)

    def shard_leaf(path, leaf):
        names = [getattr(p, "key", str(p)) for p in path]
        if names and names[0] == "dino":
            spec = _dino_param_spec(tuple(path[1:]), leaf)
        else:
            spec = P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    params = jax.tree_util.tree_map_with_path(shard_leaf, params)
    opt_state = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P()))
        if hasattr(x, "shape") else x, opt_state)
    return TrainState(params, opt_state, jnp.zeros((), jnp.int32)), tx


def make_train_step(mesh: Mesh, models, tx, state_shardings=None):
    """Jitted train step + batch shardings.

    ``state_shardings`` (a TrainState-shaped tree of NamedShardings,
    e.g. ``parallel.fsdp.state_shardings(fstate)``) pins the step's
    state input AND output layouts.  Without it, GSPMD picks output
    layouts freely and can silently re-replicate an FSDP-sharded state
    on the way out (caught by tests/test_fsdp.py); with it, the updated
    state is guaranteed to keep the given (e.g. ZeRO-3) placement."""
    dino, tcn, gait = models

    def loss_fn(params, batch, rng):
        frames = batch["frames"]                       # (B, S, S, 3)
        feats = batch["seq_features"]                  # (B, 125, 44)
        mask = batch["seq_mask"]                       # (B, 125)
        labels = batch["labels"]                       # (B,)
        k1, k2 = jax.random.split(rng)
        emb = dino.apply(params["dino"], frames)["pooled"]
        tcn_p = tcn.apply(params["tcn"], feats, deterministic=False,
                          rngs={"dropout": k1})[:, 0]
        gait_p = gait.apply(params["gait"], feats, mask, deterministic=False,
                            rngs={"dropout": k2})["probability"][:, 0]

        def bce(p):
            p = jnp.clip(p, 1e-6, 1 - 1e-6)
            return -(labels * jnp.log(p) + (1 - labels) * jnp.log(1 - p))
        loss = bce(tcn_p).mean() + bce(gait_p).mean() \
            + 1e-4 * (emb ** 2).mean()
        return loss, {"tcn_prob": tcn_p.mean(), "gait_prob": gait_p.mean(),
                      "emb_norm": jnp.linalg.norm(emb, axis=-1).mean()}

    def train_step(state: TrainState, batch, rng):
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, batch, rng)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(new_params, new_opt, state.step + 1), loss, metrics

    batch_sharding = {
        "frames": NamedSharding(mesh, P(DATA_AXIS)),
        "seq_features": NamedSharding(mesh, P(DATA_AXIS)),
        "seq_mask": NamedSharding(mesh, P(DATA_AXIS)),
        "labels": NamedSharding(mesh, P(DATA_AXIS)),
    }
    if state_shardings is not None:
        step = jax.jit(
            train_step,
            in_shardings=(state_shardings, batch_sharding, None),
            out_shardings=(state_shardings, None, None))
    else:
        step = jax.jit(train_step)
    return step, batch_sharding


def make_batch(rng: np.random.Generator, batch: int, image_size: int = 56
               ) -> Dict[str, np.ndarray]:
    return {
        "frames": rng.standard_normal(
            (batch, image_size, image_size, 3)).astype(np.float32),
        "seq_features": rng.standard_normal(
            (batch, seqf.TARGET_LEN, 44)).astype(np.float32),
        "seq_mask": np.zeros((batch, seqf.TARGET_LEN), bool),
        "labels": (rng.random(batch) < 0.5).astype(np.float32),
    }
