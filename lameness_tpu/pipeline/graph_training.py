"""Training loop for the relational heads (GraphGPS + Graphormer).

The reference loads ``*_lameness.pt`` graph checkpoints if present and
otherwise runs random-initialised (SURVEY §2.8).  Here both dense heads
train on the labeled cow graph: node features come from the per-video
result files (the same 50-d assembly the inference runner uses), the
dense kNN+temporal graph is rebuilt each epoch-shuffle, and the loss is
masked BCE over the labeled nodes plus graph-level BCE against the mean
label.  Checkpoints land under models_dir/{gnn,graphormer}.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..graph import build as gb
from ..models.graphgps import EnhancedGraphGPS
from ..models.graphormer import CowLamenessGraphormer
from ..serve.graph_runner import (GraphHeadRunner, embedding_for_video,
                                  node_features_for_video)
from .checkpoint import save_params


def build_graph_dataset(dirs, max_nodes: int = 64
                        ) -> Optional[Dict[str, Any]]:
    """Labeled videos with features -> one dense padded graph + label mask."""
    labels_dir = dirs.training / "labels"
    if not labels_dir.exists():
        return None
    vids, feats, embs, labels = [], [], [], []
    for label_file in sorted(labels_dir.glob("*_label.json")):
        vid = label_file.stem.replace("_label", "")
        try:
            label = json.load(open(label_file)).get("label")
        except Exception:
            continue
        nf = node_features_for_video(dirs, vid)
        emb = embedding_for_video(dirs, vid)
        if label is None or nf is None or emb is None:
            continue
        vids.append(vid)
        feats.append(nf)
        embs.append(emb[:32])
        labels.append(float(label))
    if len(vids) < 2 or len(set(labels)) < 2:
        return None
    vids = vids[:max_nodes]
    g = gb.build_dense_graph(np.stack(feats)[:max_nodes],
                             np.stack(embs)[:max_nodes],
                             video_ids=vids, max_nodes=max_nodes)
    y = np.zeros(max_nodes, np.float32)
    y[:len(labels[:max_nodes])] = labels[:max_nodes]
    label_mask = np.zeros(max_nodes, bool)
    label_mask[:len(vids)] = True
    g["x"] = gb.standardize_features(g["x"], g["node_mask"])
    g["labels"] = y
    g["label_mask"] = label_mask
    g["lap_pe"] = gb.laplacian_pe(g["edge_mask"], g["node_mask"], 8)
    g["rw_pe"] = gb.random_walk_pe(g["edge_mask"], g["node_mask"], 16)
    g["spd"] = gb.shortest_path_dense(g["edge_mask"], g["node_mask"], 10)
    g["din"], g["dout"] = gb.degrees(g["edge_mask"], g["node_mask"])
    g["video_ids"] = vids
    return g


def _bce(p, y, mask):
    p = jnp.clip(p, 1e-6, 1 - 1e-6)
    per = -(y * jnp.log(p) + (1 - y) * jnp.log(1 - p))
    mask = jnp.asarray(mask)
    return (per * mask).sum() / jnp.maximum(mask.sum(), 1)


def train_graph_heads(dirs, models_dir: Path, epochs: int = 600,
                      lr: float = 3e-4, seed: int = 0,
                      patience: int = 150,
                      dataset: Optional[Dict[str, Any]] = None
                      ) -> Dict[str, Any]:
    g = dataset if dataset is not None else build_graph_dataset(dirs)
    if g is None:
        return {"status": "failed",
                "error": "need >=2 labeled videos of both classes with "
                         "dinov3 results"}
    gnn = EnhancedGraphGPS()
    gt = CowLamenessGraphormer()
    gnn_args = GraphHeadRunner._gnn_args(g)
    gt_args = GraphHeadRunner._gt_args(g)
    y = jnp.asarray(g["labels"])
    lm = jnp.asarray(g["label_mask"].astype(np.float32))
    mean_label = float((g["labels"] * g["label_mask"]).sum()
                       / max(1, g["label_mask"].sum()))
    mask = g["label_mask"]

    def fit(model, args, node_key, graph_key, seed_key):
        """Each head trains independently — sharing one clipped optimizer
        would let whichever model has larger gradients starve the other."""
        params = jax.jit(model.init)(seed_key, *args)
        # clip: the first full-batch steps carry ~80+ global grad norm,
        # which kills the relu heads (outputs collapse to exactly 0.5)
        tx = optax.chain(optax.clip_by_global_norm(0.5), optax.adamw(lr))
        opt_state = tx.init(params)

        def loss_fn(p):
            # deterministic training: in the full-batch small-graph regime
            # dropout noise swamps the 10-node loss signal; the dropout
            # params still exist, so MC-dropout inference is unaffected
            out = model.apply(p, *args)
            loss = _bce(out[node_key][:, 0], y, lm)
            gp = out[graph_key].reshape(-1)[0]
            return loss + 0.2 * _bce(gp, mean_label, 1.0)

        @jax.jit
        def step(p, o):
            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, o = tx.update(grads, o, p)
            return optax.apply_updates(p, updates), o, loss

        history = []
        best = {"loss": np.inf, "params": params, "epoch": -1}
        for epoch in range(epochs):
            params, opt_state, loss = step(params, opt_state)
            loss = float(loss)
            history.append(loss)
            if loss < best["loss"]:
                best = {"loss": loss, "params": params, "epoch": epoch}
            if epoch - best["epoch"] >= patience:
                break
        node = np.asarray(model.apply(best["params"], *args)[node_key])[:, 0]
        acc = float(((node > 0.5) == (g["labels"] > 0.5))[mask].mean())
        return best, history, acc

    k = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(k)
    best_gnn, hist_gnn, acc_gnn = fit(gnn, gnn_args, "node_pred",
                                      "graph_pred", k1)
    best_gt, hist_gt, acc_gt = fit(gt, gt_args, "node_pred",
                                   "graph_pred", k2)
    save_params(models_dir, "gnn", best_gnn["params"])
    save_params(models_dir, "graphormer", best_gt["params"])
    history = hist_gnn
    best = {"loss": best_gnn["loss"] + best_gt["loss"]}
    return {"status": "completed", "num_nodes": int(mask.sum()),
            "epochs_run": {"gnn": len(hist_gnn), "graphormer": len(hist_gt)},
            "best_loss": best["loss"],
            "train_accuracy": {"gnn": acc_gnn, "graphormer": acc_gt},
            "loss_history": (hist_gnn + hist_gt)[:200]}
