"""YOLOv8 flax: shapes, decode math, detect postprocess, conversion layout."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lameness_tpu.models.yolo import (
    YoloV8, decode_predictions, detect, init_params, _anchors_for)


@pytest.fixture(scope="module")
def yolo_n():
    m = YoloV8(variant="n", num_classes=80)
    params = init_params(m, img=64)
    return m, params


def test_backbone_level_shapes(yolo_n):
    m, params = yolo_n
    out = m.apply(params, jnp.zeros((2, 64, 64, 3)))
    levels = out["levels"]
    assert len(levels) == 3
    # strides 8/16/32 over 64px input
    assert levels[0]["box"].shape == (2, 8, 8, 64)
    assert levels[1]["box"].shape == (2, 4, 4, 64)
    assert levels[2]["box"].shape == (2, 2, 2, 64)
    assert levels[0]["cls"].shape == (2, 8, 8, 80)


def test_pose_head_shapes():
    m = YoloV8(variant="n", num_classes=1, num_keypoints=20)
    params = init_params(m, img=64)
    out = m.apply(params, jnp.zeros((1, 64, 64, 3)))
    assert out["levels"][0]["kpt"].shape == (1, 8, 8, 60)
    assert out["levels"][0]["cls"].shape == (1, 8, 8, 1)


def test_dfl_decode_math():
    # Hand-build one level: put all mass on bin 2 for l,t and bin 4 for r,b
    h = w = 2
    reg_max = 16
    box = np.full((1, h, w, 4 * reg_max), -20.0, np.float32)
    box = box.reshape(1, h, w, 4, reg_max)
    box[..., 0, 2] = 20.0   # l = 2 cells
    box[..., 1, 2] = 20.0   # t = 2
    box[..., 2, 4] = 20.0   # r = 4
    box[..., 3, 4] = 20.0   # b = 4
    box = box.reshape(1, h, w, 4 * reg_max)
    cls = np.zeros((1, h, w, 3), np.float32)
    levels = [{"box": jnp.asarray(box), "cls": jnp.asarray(cls)}]
    boxes, scores, _ = decode_predictions(levels, strides=(8,))
    # anchor (0.5, 0.5): box = ((0.5-2)*8, (0.5-2)*8, (0.5+4)*8, (0.5+4)*8)
    assert np.allclose(boxes[0, 0], [-12, -12, 36, 36], atol=1e-4)
    assert np.allclose(scores[0, 0], 0.5, atol=1e-6)


def test_anchor_grid():
    anchors, strides = _anchors_for((2, 3), 16)
    assert anchors.shape == (6, 2)
    assert np.allclose(anchors[0], [0.5, 0.5])
    assert np.allclose(anchors[-1], [2.5, 1.5])
    assert np.all(np.asarray(strides) == 16.0)


def test_detect_end_to_end(yolo_n):
    m, params = yolo_n
    out = m.apply(params, jnp.zeros((1, 64, 64, 3)))
    det = detect(out["levels"], conf_threshold=0.0, max_det=8)
    assert det["boxes"].shape == (1, 8, 4)
    assert det["valid"].dtype == jnp.bool_


def test_pose_detect_carries_keypoints():
    m = YoloV8(variant="n", num_classes=1, num_keypoints=20)
    params = init_params(m, img=64)
    out = m.apply(params, jnp.zeros((1, 64, 64, 3)))
    det = detect(out["levels"], conf_threshold=0.0, max_det=4)
    assert det["keypoints"].shape == (1, 4, 20, 3)


def test_conversion_layout_roundtrip(yolo_n):
    """Synthesize an ultralytics-style state dict from our params and convert
    back — verifies the name mapping is a bijection on the n-variant tree."""
    from lameness_tpu.models.yolo import convert_ultralytics_state_dict
    m, params = yolo_n

    sd = {}

    def emit_conv_bn(t, node):
        sd[f"{t}.conv.weight"] = np.transpose(
            np.asarray(node["conv"]["kernel"]), (3, 2, 0, 1))
        sd[f"{t}.bn.weight"] = np.asarray(node["bn"]["scale"])
        sd[f"{t}.bn.bias"] = np.asarray(node["bn"]["bias"])
        sd[f"{t}.bn.running_mean"] = np.asarray(node["bn"]["mean"])
        sd[f"{t}.bn.running_var"] = np.asarray(node["bn"]["var"])

    def emit_plain(t, node):
        sd[f"{t}.weight"] = np.transpose(np.asarray(node["kernel"]), (3, 2, 0, 1))
        sd[f"{t}.bias"] = np.asarray(node["bias"])

    p = params["params"]
    from lameness_tpu.models.yolo import _BACKBONE_MAP
    for ours, idx in _BACKBONE_MAP:
        node = p[ours]
        if "cv1" in node:     # c2f or sppf
            emit_conv_bn(f"{idx}.cv1", node["cv1"])
            emit_conv_bn(f"{idx}.cv2", node["cv2"])
            for k in node:
                if k.startswith("m"):
                    emit_conv_bn(f"{idx}.m.{k[1:]}.cv1", node[k]["cv1"])
                    emit_conv_bn(f"{idx}.m.{k[1:]}.cv2", node[k]["cv2"])
        else:
            emit_conv_bn(idx, node)
    for i in range(3):
        d = p[f"detect{i}"]
        emit_conv_bn(f"22.cv2.{i}.0", d["box0"])
        emit_conv_bn(f"22.cv2.{i}.1", d["box1"])
        emit_plain(f"22.cv2.{i}.2", d["box2"])
        emit_conv_bn(f"22.cv3.{i}.0", d["cls0"])
        emit_conv_bn(f"22.cv3.{i}.1", d["cls1"])
        emit_plain(f"22.cv3.{i}.2", d["cls2"])

    converted = convert_ultralytics_state_dict(sd, variant="n")
    flat_a = jax.tree_util.tree_leaves_with_path(params["params"])
    flat_b = {jax.tree_util.keystr(k): v for k, v in
              jax.tree_util.tree_leaves_with_path(converted["params"])}
    for k, v in flat_a:
        ks = jax.tree_util.keystr(k)
        assert ks in flat_b, ks
        np.testing.assert_allclose(np.asarray(v), flat_b[ks], err_msg=ks)
