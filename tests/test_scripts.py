"""Dataset/ops scripts: prepare -> analyze -> compare chain + schema sync."""
import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]
SCRIPTS = REPO / "scripts"


def _run(args, **kw):
    return subprocess.run([sys.executable, *args], capture_output=True,
                          text=True, cwd=REPO, timeout=600, **kw)


def test_init_db_sql_in_sync():
    """scripts/init_db.sql must carry the exact DDL db.py executes."""
    from lameness_tpu.io import db as dbmod
    sql = (SCRIPTS / "init_db.sql").read_text()
    assert dbmod._SCHEMA.strip() in sql


def _coco_dataset(root: Path, n=6, img=96, facing_right=True):
    """Tiny synthetic COCO-keypoints set with AP-10K (17-kp) names."""
    import cv2
    (root / "images").mkdir(parents=True)
    sys.path.insert(0, str(SCRIPTS))
    from prepare_pose_dataset import AP10K_NAMES
    rng = np.random.default_rng(0)
    images, anns = [], []
    for i in range(1, n + 1):
        im = np.full((img, img, 3), 50, np.uint8)
        x1, y1, w, h = 10, 20, 60, 40
        im[y1:y1 + h, x1:x1 + w] = 200
        cv2.imwrite(str(root / "images" / f"i{i}.jpg"), im)
        images.append({"id": i, "file_name": f"i{i}.jpg",
                       "width": img, "height": img})
        k = np.zeros((17, 3), np.float32)
        k[:, 0] = rng.uniform(x1, x1 + w, 17)
        k[:, 1] = rng.uniform(y1, y1 + h, 17)
        k[:, 2] = 2
        # nose right of tail => facing right
        k[2, 0] = x1 + (w - 2 if facing_right else 2)
        k[4, 0] = x1 + (2 if facing_right else w - 2)
        anns.append({"id": i, "image_id": i, "category_id": 1,
                     "bbox": [x1, y1, w, h],
                     "keypoints": [float(v) for v in k.ravel()],
                     "num_keypoints": 17})
    json.dump({"images": images, "annotations": anns,
               "categories": [{"id": 1, "name": "cow",
                               "keypoints": AP10K_NAMES}]},
              open(root / "ann.json", "w"))
    return root / "ann.json", root / "images"


@pytest.mark.slow
def test_prepare_analyze_compare_chain(tmp_path):
    ann, imgs = _coco_dataset(tmp_path / "src")
    out = tmp_path / "ds"

    r = _run([SCRIPTS / "prepare_pose_dataset.py", "coco", str(ann),
              str(imgs), "--out", str(out)])
    assert r.returncode == 0, r.stderr
    doc = json.load(open(out / "annotations.json"))
    assert len(doc["images"]) == 6 and len(doc["annotations"]) == 6
    # AP-10K nose landed in the old-name nose slot (index 2), 20 slots
    k = np.asarray(doc["annotations"][0]["keypoints"]).reshape(20, 3)
    assert k.shape == (20, 3) and k[2, 2] > 0

    r = _run([SCRIPTS / "analyze_training_orientation.py", str(out)])
    assert r.returncode == 0, r.stderr
    assert "facing right" in r.stdout and "imbalance: 100%" in r.stdout

    r = _run([SCRIPTS / "analyze_training_orientation.py", str(out),
              "--fix"])
    assert r.returncode == 0, r.stderr
    r = _run([SCRIPTS / "analyze_training_orientation.py", str(out)])
    assert "imbalance: 0%" in r.stdout, r.stdout

    # heuristic baseline always reports; no checkpoint -> graceful skip
    r = _run([SCRIPTS / "compare_pose_models.py", str(out),
              "--model", str(tmp_path / "nothing"),
              "--img-size", "96", "--limit", "8"],
             env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin",
                  "PYTHONPATH": str(REPO)})
    assert r.returncode == 0, r.stderr
    assert "heuristic" in r.stdout and "no pose checkpoint" in r.stdout


@pytest.mark.slow
def test_collect_extract_import_roundtrip(tmp_path, tmp_data_root):
    import cv2
    from tests.test_video import _synthetic_walk_video
    cfg = tmp_data_root
    _synthetic_walk_video(cfg.dirs.videos / "w1.mp4", n_frames=30,
                          w=160, h=90, fps=5)
    sess = tmp_path / "sess"
    r = _run([SCRIPTS / "collect_cow_pose_data.py", "extract",
              "--data", str(cfg.dirs.root), "--out", str(sess),
              "--per-video", "4"],
             env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin",
                  "PYTHONPATH": str(REPO)})
    assert r.returncode == 0, r.stderr
    man = json.load(open(sess / "manifest.json"))
    assert man["frames"], "no frames extracted"
    assert len(man["frames"][0]["keypoints"]) == 20

    out = tmp_path / "ds"
    r = _run([SCRIPTS / "collect_cow_pose_data.py", "import", str(sess),
              "--out", str(out)],
             env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin",
                  "PYTHONPATH": str(REPO)})
    assert r.returncode == 0, r.stderr
    doc = json.load(open(out / "annotations.json"))
    assert len(doc["images"]) == len(man["frames"])
    # importable by the trainer's loader
    from lameness_tpu.pipeline.pose_training import load_coco_pose_dataset
    images, boxes, kpts = load_coco_pose_dataset(out, img_size=64)
    assert kpts.shape[1:] == (20, 3)


def test_deploy_sh_parses():
    r = subprocess.run(["bash", "-n", str(SCRIPTS / "deploy.sh")],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    r = subprocess.run(["bash", "-n", str(SCRIPTS / "monitor_training.sh")],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
