"""Training loop for the sequence lameness heads (TCN + GaitTransformer).

The reference never trains its DL heads in-service — they load
``*_lameness.pt`` if present and otherwise run random-initialised
(SURVEY.md §2.8).  This module closes that gap: given labeled videos
(``data/training/labels``) whose tleap results exist, it builds the 44-d
125-frame sequence dataset, trains both heads jointly with optax (BCE,
AdamW, early stopping), and checkpoints them where the engine's
load-if-exists restore picks them up.

Runs data-parallel over a device mesh when one is supplied (the batch is
sharded over the data axis; params replicated — the heads are 64-wide, so
dp is the only axis worth using).
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import sequence_features as seqf
from ..models.gait_transformer import GaitTransformer
from ..models.tcn import TCN
from .checkpoint import save_params


def build_dataset(dirs) -> Optional[Dict[str, np.ndarray]]:
    """Labeled videos × tleap results -> (features, masks, labels)."""
    labels_dir = dirs.training / "labels"
    if not labels_dir.exists():
        return None
    feats, masks, labels, vids = [], [], [], []
    for label_file in sorted(labels_dir.glob("*_label.json")):
        vid = label_file.stem.replace("_label", "")
        try:
            label = json.load(open(label_file)).get("label")
        except Exception:
            continue
        if label is None:
            continue
        tleap_file = dirs.results_for("tleap") / f"{vid}_tleap.json"
        if not tleap_file.exists():
            continue
        tleap = json.load(open(tleap_file))
        f, m = seqf.extract_from_pose_sequences(
            tleap.get("pose_sequences", []))
        if f is None:
            continue
        f, m = seqf.pad_or_truncate(f, m)
        feats.append(f)
        masks.append(m)
        labels.append(int(label))
        vids.append(vid)
    if len(labels) < 2 or len(set(labels)) < 2:
        return None
    return {"features": np.stack(feats), "masks": np.stack(masks),
            "labels": np.asarray(labels, np.float32), "video_ids": vids}


def train_heads(dirs, models_dir: Path, epochs: int = 50,
                batch_size: int = 16, lr: float = 1e-3,
                seed: int = 0, mesh=None,
                dataset: Optional[Dict[str, np.ndarray]] = None
                ) -> Dict[str, Any]:
    """Joint BCE training of TCN + GaitTransformer; checkpoints the best."""
    data = dataset if dataset is not None else build_dataset(dirs)
    if data is None:
        return {"status": "failed",
                "error": "need >=2 labeled videos covering both classes "
                         "with tleap results"}
    n = len(data["labels"])
    tcn = TCN(input_dim=44)
    gait = GaitTransformer(input_dim=44)
    rng = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(rng, 3)
    params = {
        "tcn": tcn.init(k1, jnp.zeros((1, seqf.TARGET_LEN, 44))),
        "gait": gait.init(k2, jnp.zeros((1, seqf.TARGET_LEN, 44)),
                          jnp.zeros((1, seqf.TARGET_LEN), bool)),
    }
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(lr))
    opt_state = tx.init(params)

    def loss_fn(p, batch, key):
        ka, kb = jax.random.split(key)
        tp = tcn.apply(p["tcn"], batch["x"], deterministic=False,
                       rngs={"dropout": ka})[:, 0]
        gp = gait.apply(p["gait"], batch["x"], batch["m"],
                        deterministic=False,
                        rngs={"dropout": kb})["probability"][:, 0]
        y = batch["y"]

        def bce(pr):
            pr = jnp.clip(pr, 1e-6, 1 - 1e-6)
            return -(y * jnp.log(pr) + (1 - y) * jnp.log(1 - pr)).mean()
        return bce(tp) + bce(gp), (tp, gp)

    @jax.jit
    def step(p, o, batch, key):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            p, batch, key)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        from ..parallel.mesh import DATA_AXIS
        data_sh = NamedSharding(mesh, P(DATA_AXIS))
        rep = NamedSharding(mesh, P())
        params = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, rep), params)
    x_all = jnp.asarray(data["features"])
    m_all = jnp.asarray(data["masks"])
    y_all = jnp.asarray(data["labels"])

    history = []
    np_rng = np.random.default_rng(seed)
    best = {"loss": np.inf, "params": params, "epoch": -1}
    for epoch in range(epochs):
        order = np_rng.permutation(n)
        epoch_loss = 0.0
        steps = 0
        for i in range(0, n, batch_size):
            idx = order[i:i + batch_size]
            batch = {"x": x_all[idx], "m": m_all[idx], "y": y_all[idx]}
            if mesh is not None and len(idx) % mesh.shape[
                    list(mesh.shape)[0]] == 0:
                batch = {k: jax.device_put(v, data_sh)
                         for k, v in batch.items()}
            rng, key = jax.random.split(rng)
            params, opt_state, loss = step(params, opt_state, batch, key)
            epoch_loss += float(loss)
            steps += 1
        epoch_loss /= max(1, steps)
        history.append(epoch_loss)
        if epoch_loss < best["loss"]:
            best = {"loss": epoch_loss, "params": params, "epoch": epoch}
        # early stop: no improvement for 10 epochs
        if epoch - best["epoch"] >= 10:
            break

    # final train accuracy with the best params
    tp = tcn.apply(best["params"]["tcn"], x_all)[:, 0]
    gp = gait.apply(best["params"]["gait"], x_all, m_all)["probability"][:, 0]
    acc_tcn = float(((np.asarray(tp) > 0.5) == (np.asarray(y_all) > 0.5)
                     ).mean())
    acc_gait = float(((np.asarray(gp) > 0.5) == (np.asarray(y_all) > 0.5)
                      ).mean())
    save_params(models_dir, "tcn", best["params"]["tcn"])
    save_params(models_dir, "gait", best["params"]["gait"])
    return {"status": "completed", "num_samples": n,
            "epochs_run": len(history), "best_epoch": best["epoch"],
            "best_loss": best["loss"], "final_loss": history[-1],
            "train_accuracy": {"tcn": acc_tcn, "gait": acc_gait},
            "loss_history": history[:200]}
