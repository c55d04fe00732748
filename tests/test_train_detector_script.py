"""train_detector script: loader + synthetic smoke path."""
import json
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent))

from scripts.train_detector import load_coco_detection, synthetic_dataset


def test_synthetic_dataset_shapes():
    images, labels, boxes, masks, nc = synthetic_dataset(n=6, img_size=96)
    assert images.shape == (6, 96, 96, 3)
    assert boxes.shape == (6, 2, 4) and masks.shape == (6, 2)
    assert nc == 1
    assert masks[:, 0].all() and not masks[:, 1].any()
    # boxes frame the bright square
    for i in range(6):
        x1, y1, x2, y2 = boxes[i, 0].astype(int)
        assert images[i, (y1 + y2) // 2, (x1 + x2) // 2, 0] > 0.8


def test_coco_detection_loader(tmp_path):
    import cv2
    (tmp_path / "images").mkdir()
    im = np.zeros((60, 80, 3), np.uint8)
    im[10:40, 20:60] = 200
    cv2.imwrite(str(tmp_path / "images" / "a.jpg"), im)
    ann = {
        "images": [{"id": 1, "file_name": "a.jpg", "height": 60,
                    "width": 80}],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 7,
             "bbox": [20, 10, 40, 30]},
            {"id": 2, "image_id": 1, "category_id": 9,
             "bbox": [0, 0, 10, 10]},
        ],
        "categories": [{"id": 7}, {"id": 9}],
    }
    json.dump(ann, open(tmp_path / "annotations.json", "w"))
    images, labels, boxes, masks, nc = load_coco_detection(
        tmp_path, img_size=160)
    assert images.shape == (1, 160, 160, 3)
    assert nc == 2
    assert masks[0, :2].all() and not masks[0, 2:].any()
    # bbox scaled: x*2, y*8/3
    np.testing.assert_allclose(boxes[0, 0], [40, 160 / 6 * 1, 120,
                                             160 / 6 * 4], rtol=1e-5)
    assert labels[0, 0] == 0 and labels[0, 1] == 1   # category ids remapped
