"""Typed configuration tree for the whole framework.

Every constant that is hard-coded inside a reference class body is lifted
here into one frozen dataclass tree (reference sites cited per field group;
see SURVEY.md §5.6).  The tree is a pytree-friendly plain-dataclass design:
construct once at startup, thread through functions explicitly.

Reference citations:
- NATS subject registry: ``shared/config/config.yaml:3-30``
- curation constants + window weights: ``services/clip-curation/app/main.py:74-78,379-386``
- fusion weights: ``services/fusion-service/app/main.py:102-109``
- ByteTrack thresholds: ``services/tracking-service/app/tracker/bytetrack.py:44-66``
- Re-ID thresholds: ``services/tracking-service/app/reid/matcher.py:52-54``
- rater tier thresholds: ``services/rater-reliability/app/main.py:297-308``
- Elo constants: ``admin-interface/backend/app/routers/elo_ranking.py:37-92``
"""
from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import yaml


# ---------------------------------------------------------------------------
# Bus subjects (the system's true API — shared/config/config.yaml:5-30)
# ---------------------------------------------------------------------------
@dataclass(frozen=True)
class Subjects:
    video_uploaded: str = "video.uploaded"
    video_preprocessed: str = "video.preprocessed"
    video_curated: str = "video.curated"
    pipeline_yolo: str = "pipeline.yolo"
    pipeline_sam3: str = "pipeline.sam3"
    pipeline_dinov3: str = "pipeline.dinov3"
    pipeline_tleap: str = "pipeline.tleap"
    pipeline_tcn: str = "pipeline.tcn"
    pipeline_transformer: str = "pipeline.transformer"
    pipeline_ml: str = "pipeline.ml"
    pipeline_gnn: str = "pipeline.gnn"
    pipeline_graph_transformer: str = "pipeline.graph_transformer"
    pipeline_fusion: str = "pipeline.fusion"
    tracking_complete: str = "tracking.complete"
    tracking_reid_match: str = "tracking.reid.match"
    tracking_lameness_update: str = "tracking.lameness.update"
    analysis_complete: str = "analysis.complete"
    # explanation (re)generation requests — NOT in the reference's
    # registry (its generate endpoint is a no-op ack,
    # analysis.py:299-313); a dedicated subject keeps requests off
    # analysis.complete, whose subscribers treat messages as finished
    # analyses
    explanation_requested: str = "explanation.requested"
    training_data_added: str = "training.data.added"
    training_yolo_requested: str = "training.yolo.requested"
    training_ml_requested: str = "training.ml.requested"
    training_completed: str = "training.completed"
    hitl_comparison_requested: str = "hitl.comparison.requested"
    hitl_comparison_submitted: str = "hitl.comparison.submitted"
    rater_reliability_updated: str = "rater.reliability.updated"
    cow_prediction_updated: str = "cow.prediction.updated"

    def as_dict(self) -> Dict[str, str]:
        return dataclasses.asdict(self)


# ---------------------------------------------------------------------------
# Data directories (shared/config/config.yaml:41-47)
# ---------------------------------------------------------------------------
@dataclass(frozen=True)
class DataDirs:
    root: str = "data"

    @property
    def videos(self) -> Path: return Path(self.root) / "videos"
    @property
    def processed(self) -> Path: return Path(self.root) / "processed"
    @property
    def canonical(self) -> Path: return Path(self.root) / "canonical"
    @property
    def training(self) -> Path: return Path(self.root) / "training"
    @property
    def results(self) -> Path: return Path(self.root) / "results"
    @property
    def quality_reports(self) -> Path: return Path(self.root) / "quality_reports"
    @property
    def rater_reliability(self) -> Path: return Path(self.root) / "rater_reliability"
    @property
    def models(self) -> Path: return Path(self.root) / "models"

    def results_for(self, pipeline: str) -> Path:
        return self.results / pipeline

    def ensure(self) -> "DataDirs":
        for p in (self.videos, self.processed, self.canonical, self.training,
                  self.results, self.quality_reports, self.rater_reliability,
                  self.models):
            p.mkdir(parents=True, exist_ok=True)
        return self


# ---------------------------------------------------------------------------
# Clip curation (clip-curation/app/main.py:74-78 and 379-386)
# ---------------------------------------------------------------------------
@dataclass(frozen=True)
class CurationConfig:
    target_fps: int = 25
    target_width: int = 1280
    target_height: int = 720
    target_duration_s: float = 5.0
    min_pass_frames: int = 30
    window_step_frac: float = 0.25      # slide step = 25% of window
    # six-part weighted window score (clip-curation:379-386)
    w_framing: float = 0.25
    w_steadiness: float = 0.25
    w_straightness: float = 0.15
    w_visual: float = 0.15
    w_occlusion: float = 0.10
    w_progress: float = 0.10

    @property
    def clip_frames(self) -> int:
        return int(round(self.target_fps * self.target_duration_s))  # 125


# ---------------------------------------------------------------------------
# Detection / segmentation / embedding / pose stage configs
# ---------------------------------------------------------------------------
@dataclass(frozen=True)
class YoloConfig:
    """YOLOv8-style detector (yolo-pipeline/app/main.py:37,67)."""
    confidence_threshold: float = 0.5
    sample_fps: int = 2                 # process 2 frames / second
    num_classes: int = 80               # COCO fallback; cow class id 19
    cow_class_id: int = 19
    max_detections: int = 32            # fixed-K padded NMS output
    nms_iou_threshold: float = 0.45
    reg_max: int = 16                   # DFL bins
    width_mult: float = 0.25            # yolov8n
    depth_mult: float = 0.34            # yolov8n (rounds 3->1, 6->2)
    input_size: int = 640


@dataclass(frozen=True)
class SamConfig:
    """SAM ViT encoder + mask decoder (sam3-pipeline/app/main.py:51-100)."""
    sample_fps: int = 2
    variant: str = "vit_b"              # vit_b / vit_l / vit_h
    image_size: int = 1024
    patch_size: int = 16
    prompt_embed_dim: int = 256
    mask_threshold: float = 0.0
    # encode the detection frames in sub-batches of this size (0 = one
    # batched call): single-chip activation-memory governor that lets
    # vit_h run batch 8 (EngineSpec.sam_encode_chunk carries it)
    encode_chunk: int = 0
    # per-layer activation checkpointing in the ViTDet encoder — the
    # fine-tune memory knob (inference uses encode_chunk instead)
    encoder_remat: bool = False


@dataclass(frozen=True)
class DinoConfig:
    """DINOv2-base ViT embeddings (dinov3-pipeline/app/main.py:30-36,95-127)."""
    sample_fps: int = 1
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    top_k_similar: int = 5


@dataclass(frozen=True)
class PoseConfig:
    """20-keypoint cow pose, 5 FPS sampling (tleap-pipeline/app/main.py:43-64,469)."""
    sample_fps: int = 5
    num_keypoints: int = 20
    conf_threshold: float = 0.3


# ---------------------------------------------------------------------------
# Predictor heads
# ---------------------------------------------------------------------------
@dataclass(frozen=True)
class TcnConfig:
    """TCN: 4 levels x 64 ch, k=3, dilation 2^i (tcn-pipeline/app/main.py:90-167)."""
    in_features: int = 44               # 20 kp x (x,y) + 4 extra
    channels: Tuple[int, ...] = (64, 64, 64, 64)
    kernel_size: int = 3
    dropout: float = 0.2
    seq_len: int = 125                  # 5 s @ 25 FPS (tcn:316-328)
    mc_samples: int = 10


@dataclass(frozen=True)
class GaitTransformerConfig:
    """d=64 / 4 heads / 4 layers pre-norm (transformer-pipeline/app/main.py:101-194)."""
    in_features: int = 44
    d_model: int = 64
    num_heads: int = 4
    num_layers: int = 4
    ffn_dim: int = 256
    dropout: float = 0.2
    max_seq_len: int = 150              # transformer:120
    seq_len: int = 125
    conf_mask_threshold: float = 0.3    # transformer:370
    mc_samples: int = 10


@dataclass(frozen=True)
class GraphGPSConfig:
    """EnhancedGraphGPS 128-d / 8 heads / 4 layers (gnn-pipeline/app/main.py:835-1002)."""
    node_features: int = 50             # pose10 + silhouette5 + embed32 + meta3
    hidden_dim: int = 128
    num_heads: int = 8
    num_layers: int = 4
    k_nn: int = 5
    pe_dim: int = 8                     # Laplacian PE eigenvectors
    rw_steps: int = 8                   # random-walk PE powers
    edge_dim: int = 3
    dropout: float = 0.1
    mc_samples: int = 10
    max_nodes: int = 128                # dense padding bound (graphs are tiny)


@dataclass(frozen=True)
class GraphormerConfig:
    """Graphormer 128-d / 6 layers / 8 heads / ffn 512 + virtual node
    (graph-transformer-pipeline/app/model/graphormer.py:23-261)."""
    node_features: int = 50
    hidden_dim: int = 128
    num_layers: int = 6
    num_heads: int = 8
    ffn_dim: int = 512
    k_nn: int = 5
    max_degree: int = 32
    max_spd: int = 16                   # shortest-path-distance buckets
    temporal_tau_days: float = 1.0      # exp(-dt/1day) temporal edge weight
    dropout: float = 0.1
    mc_samples: int = 10
    max_nodes: int = 128


# ---------------------------------------------------------------------------
# Tracking (bytetrack.py:44-66, track.py:13-104, matcher.py:52-54)
# ---------------------------------------------------------------------------
@dataclass(frozen=True)
class TrackingConfig:
    high_conf_threshold: float = 0.6
    low_conf_threshold: float = 0.1
    match_iou_threshold: float = 0.3
    reactivation_appearance_weight: float = 0.7
    min_hits_confirm: int = 3
    max_missed_lost: int = 30
    max_missed_delete: int = 90
    max_tracks: int = 16                # fixed-slot device tracker state


@dataclass(frozen=True)
class ReidConfig:
    strong_match_threshold: float = 0.85
    match_threshold: float = 0.75
    weak_match_threshold: float = 0.65
    momentum: float = 0.9
    embedding_dim: int = 768
    collection_embeddings: str = "cow_embeddings"
    collection_identities: str = "cow_identities"
    # Qdrant-REST vector server (config.yaml:60 QDRANT_URL analog); None =
    # in-process store.  A stock Qdrant or io/qdrant_wire.QdrantRestServer.
    vector_url: Optional[str] = None


# ---------------------------------------------------------------------------
# Database (admin-interface/backend/app/database.py:16)
# ---------------------------------------------------------------------------
@dataclass(frozen=True)
class DbConfig:
    # DATABASE_URL analog: a postgres:// URL opens the Database facade
    # over the first-party wire driver (io/pg_wire.py — point it at a
    # stock Postgres or `python -m lameness_tpu pg-server`); None = the
    # SQLite file under the data root.  Config.load honors the
    # DATABASE_URL env var like the reference does.
    url: Optional[str] = None


# ---------------------------------------------------------------------------
# Fusion (fusion-service/app/main.py:102-109, 226-314, 457-607)
# ---------------------------------------------------------------------------
@dataclass(frozen=True)
class FusionConfig:
    w_ml: float = 0.15
    w_tcn: float = 0.12
    w_transformer: float = 0.12
    w_gnn: float = 0.08
    w_graph_transformer: float = 0.18
    w_human: float = 0.35
    severity_mild: float = 0.3
    severity_moderate: float = 0.5
    severity_severe: float = 0.7

    def weights(self) -> Dict[str, float]:
        return {
            "ml": self.w_ml, "tcn": self.w_tcn,
            "transformer": self.w_transformer, "gnn": self.w_gnn,
            "graph_transformer": self.w_graph_transformer,
            "human": self.w_human,
        }


# ---------------------------------------------------------------------------
# HITL (rater-reliability:297-308; elo_ranking.py:37-92)
# ---------------------------------------------------------------------------
@dataclass(frozen=True)
class RaterConfig:
    gold_tier_threshold: float = 0.85
    silver_tier_threshold: float = 0.70
    gold_weight: float = 1.5
    silver_weight: float = 1.0
    bronze_weight: float = 0.5


@dataclass(frozen=True)
class EloConfig:
    initial_rating: float = 1500.0
    initial_uncertainty: float = 350.0
    base_k: float = 32.0
    min_k: float = 10.0
    logistic_scale: float = 400.0


# ---------------------------------------------------------------------------
# ML (tabular ensemble) + training (config.yaml:60-68)
# ---------------------------------------------------------------------------
@dataclass(frozen=True)
class MLConfig:
    # reference defaults: training-service/app/main.py:205-219 (100 rounds
    # for all three GBDTs) + routers/ml_config.py Field defaults
    n_estimators: int = 100
    learning_rate: float = 0.1
    max_depth: int = 6
    cv_folds: int = 5
    min_new_videos: int = 10


@dataclass(frozen=True)
class ComputeConfig:
    """Device/precision policy for the fused engine."""
    dtype: str = "bfloat16"             # activations/weights on the MXU
    accum_dtype: str = "float32"
    mesh_data_axis: str = "data"
    mesh_model_axis: str = "model"
    data_parallel: int = 1              # set from available devices
    model_parallel: int = 1
    use_pallas_attention: bool = True


@dataclass(frozen=True)
class Config:
    subjects: Subjects = field(default_factory=Subjects)
    dirs: DataDirs = field(default_factory=DataDirs)
    curation: CurationConfig = field(default_factory=CurationConfig)
    yolo: YoloConfig = field(default_factory=YoloConfig)
    sam: SamConfig = field(default_factory=SamConfig)
    dino: DinoConfig = field(default_factory=DinoConfig)
    pose: PoseConfig = field(default_factory=PoseConfig)
    tcn: TcnConfig = field(default_factory=TcnConfig)
    gait: GaitTransformerConfig = field(default_factory=GaitTransformerConfig)
    graphgps: GraphGPSConfig = field(default_factory=GraphGPSConfig)
    graphormer: GraphormerConfig = field(default_factory=GraphormerConfig)
    tracking: TrackingConfig = field(default_factory=TrackingConfig)
    reid: ReidConfig = field(default_factory=ReidConfig)
    fusion: FusionConfig = field(default_factory=FusionConfig)
    rater: RaterConfig = field(default_factory=RaterConfig)
    elo: EloConfig = field(default_factory=EloConfig)
    ml: MLConfig = field(default_factory=MLConfig)
    compute: ComputeConfig = field(default_factory=ComputeConfig)
    db: DbConfig = field(default_factory=DbConfig)

    @staticmethod
    def load(path: Optional[str] = None, data_root: Optional[str] = None) -> "Config":
        """Build config, optionally overlaying a YAML file compatible with the
        reference's shared/config/config.yaml key layout."""
        cfg = Config()
        if data_root is None:
            data_root = os.environ.get("LAMENESS_DATA_ROOT", "data")
        cfg = dataclasses.replace(cfg, dirs=DataDirs(root=data_root))
        if os.environ.get("DATABASE_URL"):
            cfg = dataclasses.replace(
                cfg, db=DbConfig(url=os.environ["DATABASE_URL"]))
        if path and Path(path).exists():
            with open(path) as f:
                raw: Dict[str, Any] = yaml.safe_load(f) or {}
            y = raw.get("models", {}).get("yolo", {})
            if "confidence_threshold" in y:
                cfg = dataclasses.replace(
                    cfg, yolo=dataclasses.replace(
                        cfg.yolo, confidence_threshold=float(y["confidence_threshold"])))
            d = raw.get("data", {})
            if "videos_dir" in d:
                root = str(Path(d["videos_dir"]).parent)
                cfg = dataclasses.replace(cfg, dirs=DataDirs(root=root))
        return cfg


DEFAULT_CONFIG = Config()
