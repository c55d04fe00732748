"""Cross-video graph-head runner: GraphGPS + Graphormer over the cow graph.

Rebuilds the graph-service behavior (``gnn-pipeline/app/main.py:1121-1490``,
``graph-transformer-pipeline/app/main.py:245-442``): on every new video,
assemble the 50-d node features for all known videos from their result
files (pose 10 + silhouette 5 + embedding 32 + metadata 3), build the
kNN + per-cow-temporal dense graph, and run both heads with MC-dropout,
writing the gnn / graph_transformer result JSONs.

Quirk §2.9.2 note: with our dinov3 writer the top-level ``embedding`` key
exists, so the kNN graph is real (in the reference it degenerates to zero
vectors for these consumers).
"""
from __future__ import annotations

import json
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import Config
from ..graph import build as gb
from ..io import schemas
from ..models.graphgps import EnhancedGraphGPS
from ..models.graphormer import CowLamenessGraphormer
from ..utils.logging import get_logger

LOG = get_logger("graph_runner")


def node_features_for_video(dirs, video_id: str) -> Optional[np.ndarray]:
    """50-d node feature vector (gnn:1292-1369): pose 10 + silhouette 5 +
    embedding 32 (first components) + metadata 3."""
    feats = np.zeros(50, np.float32)

    def read(p):
        f = dirs.results_for(p) / f"{video_id}_{p}.json"
        if f.exists():
            try:
                return json.load(open(f))
            except Exception:
                return None
        return None

    tleap = read("tleap")
    loco = (tleap or {}).get("locomotion_features", {})
    pose_keys = ("back_arch_mean", "back_arch_std", "back_arch_score",
                 "head_bob_magnitude", "head_bob_frequency", "head_bob_score",
                 "stride_fl_mean", "stride_fr_mean", "front_leg_asymmetry",
                 "rear_leg_asymmetry")
    for i, k in enumerate(pose_keys):
        feats[i] = loco.get(k, 0.0)

    sam = read("sam3")
    sf = (sam or {}).get("aggregated_features", {})
    for i, k in enumerate(("avg_mask_area", "avg_area_ratio",
                           "avg_circularity", "avg_aspect_ratio")):
        feats[10 + i] = sf.get(k, 0.0)
    yolo = read("yolo")
    feats[14] = (yolo or {}).get("features", {}).get("detection_rate", 0.0)

    dino = read("dinov3")
    emb = (dino or {}).get("embedding")
    if emb:
        e = np.asarray(emb, np.float32)
        feats[15:15 + 32] = e[:32] / (np.linalg.norm(e) + 1e-8) * 10
    feats[47] = (dino or {}).get("neighbor_evidence", 0.5)
    feats[48] = len((dino or {}).get("similar_cases", []))
    feats[49] = (yolo or {}).get("features", {}).get("avg_confidence", 0.0)

    if tleap is None and dino is None and yolo is None:
        return None
    return feats


def embedding_for_video(dirs, video_id: str) -> Optional[np.ndarray]:
    f = dirs.results_for("dinov3") / f"{video_id}_dinov3.json"
    if not f.exists():
        return None
    data = json.load(open(f))
    emb = data.get("embedding")
    if emb is None and data.get("canonical_frames"):
        emb = np.mean([c["embedding"] for c in data["canonical_frames"]],
                      axis=0)
    return np.asarray(emb, np.float32) if emb is not None else None


class GraphHeadRunner:
    def __init__(self, config: Config, bus=None,
                 max_nodes: Optional[int] = None):
        self.config = config
        self.dirs = config.dirs
        self.bus = bus
        # the padding bound is a LIVE config knob (graphgps.max_nodes);
        # an explicit argument still wins (tests size it down)
        self.max_nodes = int(max_nodes if max_nodes is not None
                             else config.graphgps.max_nodes)
        self.gnn = EnhancedGraphGPS()
        self.gt = CowLamenessGraphormer()
        self._params: Dict[str, Any] = {}
        self._jits: Dict[str, Any] = {}

    def _ensure_params(self, n: int):
        if "gnn" in self._params:
            return
        key = jax.random.PRNGKey(0)
        g = self._dummy_graph(n)
        self._params["gnn"] = jax.jit(self.gnn.init)(
            key, *self._gnn_args(g))
        self._params["gt"] = jax.jit(self.gt.init)(
            key, *self._gt_args(g))
        self._jits["gnn"] = jax.jit(
            lambda p, a, k: jax.vmap(
                lambda kk: self.gnn.apply(p, *a, deterministic=False,
                                          rngs={"dropout": kk})["node_pred"]
            )(jax.random.split(k, 10)))
        self._jits["gnn_det"] = jax.jit(lambda p, a: self.gnn.apply(p, *a))
        self._jits["gt"] = jax.jit(
            lambda p, a, k: jax.vmap(
                lambda kk: self.gt.apply(p, *a, deterministic=False,
                                         rngs={"dropout": kk})["graph_pred"]
            )(jax.random.split(k, 10)))
        self._jits["gt_det"] = jax.jit(lambda p, a: self.gt.apply(p, *a))

    def _dummy_graph(self, n):
        rng = np.random.default_rng(0)
        return gb.build_dense_graph(
            rng.standard_normal((2, 50)).astype(np.float32),
            rng.standard_normal((2, 32)).astype(np.float32),
            max_nodes=n)

    @staticmethod
    def _gnn_args(g):
        lap = gb.laplacian_pe(g["edge_mask"], g["node_mask"], 8)
        rw = gb.random_walk_pe(g["edge_mask"], g["node_mask"], 16)
        return (jnp.asarray(g["x"]), jnp.asarray(lap), jnp.asarray(rw),
                jnp.asarray(g["edge_attr"]), jnp.asarray(g["edge_mask"]),
                jnp.asarray(g["node_mask"]))

    @staticmethod
    def _gt_args(g):
        spd = gb.shortest_path_dense(g["edge_mask"], g["node_mask"], 10)
        din, dout = gb.degrees(g["edge_mask"], g["node_mask"])
        return (jnp.asarray(g["x"]), jnp.asarray(spd),
                jnp.asarray(g["edge_attr"]), jnp.asarray(g["edge_mask"]),
                jnp.asarray(din), jnp.asarray(dout),
                jnp.asarray(g["timestamps"]), jnp.asarray(g["node_mask"]))

    # ------------------------------------------------------------------
    def _cow_for(self, vid: str) -> Optional[str]:
        tr_file = self.dirs.results_for("tracking") / f"{vid}_tracking.json"
        if tr_file.exists():
            try:
                tr = json.load(open(tr_file))
                for r in tr.get("reid_results", []):
                    if r.get("cow_id"):
                        return r["cow_id"]
            except Exception:
                pass
        return None

    def collect_graph(self, target_video: str):
        """Per-cow graph when the target video maps to a cow (only that
        cow's videos, gnn:1442-1453), else the global graph of all known
        videos — the reference's exact fallback semantics."""
        video_ids: List[str] = []
        feats: List[np.ndarray] = []
        embs: List[np.ndarray] = []
        cow_ids: List[Optional[str]] = []
        timestamps: List[float] = []
        dino_dir = self.dirs.results_for("dinov3")
        candidates = sorted(f.stem.replace("_dinov3", "")
                            for f in dino_dir.glob("*_dinov3.json")) \
            if dino_dir.exists() else []
        if target_video not in candidates:
            candidates.append(target_video)
        target_cow = self._cow_for(target_video)
        if target_cow is not None:
            candidates = [v for v in candidates
                          if v == target_video or
                          self._cow_for(v) == target_cow]
        # the node cap must never evict the TARGET: with > max_nodes
        # known videos a lexicographically-early target would slice out
        # of its own graph and get no gnn/graph_transformer results
        others = [v for v in candidates if v != target_video]
        selected = others[-(self.max_nodes - 1):] + [target_video]
        dropped = len(others) - (len(selected) - 1)
        if dropped > 0:
            # no silent caps: the reference enumerates EVERY known video
            # (gnn:1432-1453) — surface what the dense padding bound cut
            LOG.warning("graph.node_cap_truncated", video_id=target_video,
                        max_nodes=self.max_nodes,
                        candidates=len(others) + 1, dropped=dropped,
                        kept="newest by name order")
        for vid in selected:
            nf = node_features_for_video(self.dirs, vid)
            emb = embedding_for_video(self.dirs, vid)
            if nf is None or emb is None:
                continue
            cow = self._cow_for(vid)
            mtime = (self.dirs.results_for("dinov3")
                     / f"{vid}_dinov3.json").stat().st_mtime
            video_ids.append(vid)
            feats.append(nf)
            embs.append(emb[:32])
            cow_ids.append(cow)
            timestamps.append(mtime)
        return video_ids, feats, embs, cow_ids, timestamps

    def process_video(self, video_id: str) -> Optional[Dict[str, Any]]:
        video_ids, feats, embs, cow_ids, ts = self.collect_graph(video_id)
        if video_id not in video_ids or len(video_ids) < 1:
            return None
        n_pad = self.max_nodes
        self._ensure_params(n_pad)
        g = gb.build_dense_graph(
            np.stack(feats), np.stack(embs), video_ids=video_ids,
            cow_ids=cow_ids, timestamps=ts,
            k=self.config.graphgps.k_nn, max_nodes=n_pad)
        g["x"] = gb.standardize_features(g["x"], g["node_mask"])
        target_idx = video_ids.index(video_id)
        target_cow = cow_ids[target_idx]
        # stable seed: builtin hash() is salted per process
        # (PYTHONHASHSEED), which would make the MC-dropout uncertainty
        # numbers differ across runs — result JSONs must be idempotent
        import zlib
        rng = jax.random.PRNGKey(zlib.crc32(video_id.encode()) % (2 ** 31))

        # --- GraphGPS -----------------------------------------------------
        args = self._gnn_args(g)
        preds = np.asarray(self._jits["gnn"](self._params["gnn"], args, rng))
        node_mean = preds.mean(axis=0)[:, 0]
        node_std = preds.std(axis=0, ddof=1)[:, 0]
        det = self._jits["gnn_det"](self._params["gnn"], args)
        node_score = float(node_mean[target_idx])
        uncertainty = float(node_std[target_idx])
        cow_score = float(np.asarray(det["graph_pred"])[0])
        neighbor_scores = []
        em = g["edge_mask"]
        for src in range(len(video_ids)):
            if em[src, target_idx]:
                neighbor_scores.append({"video_id": video_ids[src],
                                        "score": float(node_mean[src])})
        n_edges = int(g["edge_mask"].sum())
        gnn_result = schemas.gnn_result(
            video_id, target_cow, "EnhancedGraphGPS", node_score, cow_score,
            uncertainty,
            {"num_nodes": len(video_ids), "num_edges": n_edges,
             "k_neighbors": self.config.graphgps.k_nn,
             "has_edge_features": True,
             "has_temporal_edges": target_cow is not None,
             "num_heads": 8, "hierarchical_pooling": True,
             "per_cow_graph": target_cow is not None},
            neighbor_scores, video_ids)
        path = schemas.write_result(
            self.dirs.results_for("gnn") / f"{video_id}_gnn.json", gnn_result)
        if self.bus is not None:
            self.bus.publish_sync(self.config.subjects.pipeline_gnn, {
                "video_id": video_id, "pipeline": "gnn",
                "results_path": str(path),
                "severity_score": node_score})

        # --- Graphormer ---------------------------------------------------
        gt_args = self._gt_args(g)
        gt_preds = np.asarray(self._jits["gt"](self._params["gt"],
                                               gt_args, rng))
        gt_graph_mean = float(gt_preds.mean())
        gt_graph_std = float(gt_preds.std(ddof=1))
        gt_det = self._jits["gt_det"](self._params["gt"], gt_args)
        gt_node = float(np.asarray(gt_det["node_pred"])[target_idx, 0])
        attn = np.asarray(gt_det["attention_weights"])      # (H, N, N)
        attn_to_target = attn[:, :, target_idx].mean(axis=0)
        order = np.argsort(attn_to_target)[::-1]
        top_attending = [
            {"video_id": video_ids[i], "attention": float(attn_to_target[i])}
            for i in order[:6] if i < len(video_ids) and i != target_idx][:5]
        gt_result = schemas.graph_transformer_result(
            video_id, target_cow, gt_node, gt_graph_mean, gt_graph_std,
            {"num_nodes": len(video_ids), "num_edges": n_edges,
             "num_layers": self.gt.num_layers, "num_heads": self.gt.heads,
             "hidden_dim": self.gt.hidden_dim,
             "has_temporal_edges": target_cow is not None,
             "per_cow_graph": target_cow is not None},
            {"top_attending_nodes": top_attending}, video_ids)
        path = schemas.write_result(
            self.dirs.results_for("graph_transformer")
            / f"{video_id}_graph_transformer.json", gt_result)
        if self.bus is not None:
            self.bus.publish_sync(
                self.config.subjects.pipeline_graph_transformer, {
                    "video_id": video_id, "pipeline": "graph_transformer",
                    "results_path": str(path),
                    "graph_prediction": gt_graph_mean})
        return {"gnn": gnn_result, "graph_transformer": gt_result}
