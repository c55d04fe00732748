"""Model checkpointing: orbax for params, load-if-exists per sub-model.

The reference loads each model's weights if the file exists and falls back
otherwise (SURVEY.md §2.8 table); this module keeps that contract for the
engine's param tree — per-sub-model orbax checkpoints under
``shared_models_dir/{name}/`` with graceful degradation, plus torch
``state_dict`` conversion hooks for the reference's .pt/.pth formats.
"""
from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
    _HAS_ORBAX = True
except ImportError:  # pragma: no cover
    _HAS_ORBAX = False


def save_params(models_dir: Path, name: str, params: Any) -> Path:
    """Save one sub-model's param tree."""
    path = (Path(models_dir) / name / "params").resolve()
    path.parent.mkdir(parents=True, exist_ok=True)
    if _HAS_ORBAX:
        ckpt = ocp.StandardCheckpointer()
        params_np = jax.tree_util.tree_map(np.asarray, params)
        if path.exists():
            import shutil
            shutil.rmtree(path)
        ckpt.save(path, params_np)
        ckpt.wait_until_finished()
    else:
        import pickle
        with open(str(path) + ".pkl", "wb") as f:
            pickle.dump(jax.tree_util.tree_map(np.asarray, params), f)
    return path


def load_params(models_dir: Path, name: str,
                template: Any) -> Optional[Any]:
    """Load-if-exists (returns None when absent, like the reference)."""
    path = (Path(models_dir) / name / "params").resolve()
    if _HAS_ORBAX and path.exists():
        ckpt = ocp.StandardCheckpointer()
        template_np = jax.tree_util.tree_map(np.asarray, template)
        return ckpt.restore(path, template_np)
    pkl = Path(str(path) + ".pkl")
    if pkl.exists():
        import pickle
        return pickle.load(open(pkl, "rb"))
    return None


def try_load_torch(models_dir: Path, name: str) -> Optional[Dict[str, Any]]:
    """Reference-format weights: torch state dicts under the shared models
    dir (shared/models/{yolo,sam3,...}/*.pt[h]).  Returns the state dict
    (weights_only) or None."""
    d = Path(models_dir) / name
    if not d.exists():
        return None
    for pattern in ("*.pt", "*.pth", "*.bin"):
        for f in sorted(d.glob(pattern)):
            try:
                import torch
                obj = torch.load(f, map_location="cpu", weights_only=True)
                if isinstance(obj, dict):
                    return obj
            except Exception:
                continue
    return None


def restore_engine(engine, models_dir: Path) -> Dict[str, bool]:
    """Install whatever checkpoints exist into the engine (per-model
    load-if-exists).  Orbax first, then torch-format conversion."""
    loaded = {}
    for name in ("yolo", "dino", "sam", "tcn", "gait"):
        if name not in engine.params:
            continue
        restored = load_params(models_dir, name, engine.params[name])
        if restored is not None:
            engine.params[name] = restored
            engine.loaded_weights[name] = True
            loaded[name] = True
            continue
        sd = try_load_torch(models_dir, name)
        if sd is not None and name in ("yolo", "dino", "sam"):
            try:
                engine.load_torch_weights(name, sd)
                loaded[name] = True
                continue
            except Exception:
                pass
        loaded[name] = False
    # trained pose model (tleap:122-137): the engine has no pose params
    # until installed, so the template is built on demand
    pose_dir = Path(models_dir) / "pose"
    if pose_dir.exists() and not engine.spec.pose_pixels:
        print("restore_engine: pose checkpoint present but the engine "
              "spec has pose_pixels=False (heuristic-pose wire trim) — "
              "NOT installing; rebuild with pose_pixels=True to use it",
              flush=True)
        loaded["pose"] = False
    elif pose_dir.exists():
        from ..models import pose as pose_mod
        from ..models.yolo import YoloV8, init_params
        tmpl_model = YoloV8(variant="n", num_classes=1,
                            num_keypoints=pose_mod.NUM_KEYPOINTS)
        template = init_params(tmpl_model, img=engine.spec.pose_size)
        restored = load_params(models_dir, "pose", template)
        if restored is not None:
            engine.install_pose_params(restored)
            loaded["pose"] = True
        else:
            sd = try_load_torch(models_dir, "pose")
            if sd is not None:
                try:
                    engine.load_torch_weights("pose", sd)
                    loaded["pose"] = True
                except Exception:
                    loaded["pose"] = False
    engine._build_jits()
    return loaded
