"""The weight-drop parity harness runs end-to-end on synthetic
checkpoints written in the REAL torch file layouts (VERDICT r4 item 3):
HF SamModel .pth, original segment-anything .pth, HF Dinov2
save_pretrained dir, ultralytics detect/pose .pt.  The real-weight gates
themselves are environment-blocked (no egress); this proves the one-run
harness works the moment weights are obtainable.
"""
import json
import re
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent))


# -- HF -> segment-anything key rename (inverse of sa_to_hf_state_dict) ------
_HF_TO_SA = [
    (r"^vision_encoder\.patch_embed\.projection\.",
     "image_encoder.patch_embed.proj."),
    (r"^vision_encoder\.layers\.(\d+)\.layer_norm([12])\.",
     r"image_encoder.blocks.\1.norm\2."),
    (r"^vision_encoder\.layers\.(\d+)\.", r"image_encoder.blocks.\1."),
    (r"^vision_encoder\.neck\.conv1\.", "image_encoder.neck.0."),
    (r"^vision_encoder\.neck\.layer_norm1\.", "image_encoder.neck.1."),
    (r"^vision_encoder\.neck\.conv2\.", "image_encoder.neck.2."),
    (r"^vision_encoder\.neck\.layer_norm2\.", "image_encoder.neck.3."),
    (r"^vision_encoder\.", "image_encoder."),
    (r"^prompt_encoder\.shared_embedding\.positional_embedding$",
     "prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"),
    (r"^prompt_encoder\.point_embed\.", "prompt_encoder.point_embeddings."),
    (r"^prompt_encoder\.mask_embed\.conv1\.",
     "prompt_encoder.mask_downscaling.0."),
    (r"^prompt_encoder\.mask_embed\.layer_norm1\.",
     "prompt_encoder.mask_downscaling.1."),
    (r"^prompt_encoder\.mask_embed\.conv2\.",
     "prompt_encoder.mask_downscaling.3."),
    (r"^prompt_encoder\.mask_embed\.layer_norm2\.",
     "prompt_encoder.mask_downscaling.4."),
    (r"^prompt_encoder\.mask_embed\.conv3\.",
     "prompt_encoder.mask_downscaling.6."),
    (r"^mask_decoder\.transformer\.layer_norm_final_attn\.",
     "mask_decoder.transformer.norm_final_attn."),
    (r"^mask_decoder\.transformer\.layers\.(\d+)\.layer_norm([1-4])\.",
     r"mask_decoder.transformer.layers.\1.norm\2."),
    (r"^mask_decoder\.upscale_conv1\.", "mask_decoder.output_upscaling.0."),
    (r"^mask_decoder\.upscale_layer_norm\.",
     "mask_decoder.output_upscaling.1."),
    (r"^mask_decoder\.upscale_conv2\.", "mask_decoder.output_upscaling.3."),
    (r"^(mask_decoder\.(?:output_hypernetworks_mlps\.\d+|"
     r"iou_prediction_head))\.proj_in\.", r"\1.layers.0."),
    (r"^(mask_decoder\.(?:output_hypernetworks_mlps\.\d+|"
     r"iou_prediction_head))\.layers\.0\.", r"\1.layers.1."),
    (r"^(mask_decoder\.(?:output_hypernetworks_mlps\.\d+|"
     r"iou_prediction_head))\.proj_out\.", r"\1.layers.2."),
]


def hf_to_sa(sd):
    out = {}
    for k, v in sd.items():
        if k.startswith("shared_image_embedding."):
            continue                 # SA has the single pe_layer matrix
        nk = k
        for pat, rep in _HF_TO_SA:
            nk2 = re.sub(pat, rep, nk)
            if nk2 != nk:
                nk = nk2
                break
        out[nk] = v
    return out


@pytest.fixture(scope="module")
def tiny_sam_sd():
    torch = pytest.importorskip("torch")
    from transformers import SamConfig, SamModel
    cfg = SamConfig(
        vision_config=dict(hidden_size=64, num_hidden_layers=2,
                           num_attention_heads=4, image_size=128,
                           patch_size=16, global_attn_indexes=[1],
                           window_size=14, output_channels=256),
        prompt_encoder_config=dict(image_size=128, image_embedding_size=8))
    torch.manual_seed(0)
    return SamModel(cfg).eval().state_dict()


def test_sa_rename_roundtrip(tiny_sam_sd):
    """segment-anything -> HF key rename is the exact inverse of the
    HF -> SA rename over a real HF SamModel state dict (the SAME tensors
    under both names)."""
    from lameness_tpu.models.sam import (detect_sam_layout,
                                         sa_to_hf_state_dict)
    hf_keys = {k for k in tiny_sam_sd
               if not k.startswith("shared_image_embedding.")}
    sa = hf_to_sa(tiny_sam_sd)
    assert detect_sam_layout(sa) == "sa"
    assert not any(k.startswith("vision_encoder.") for k in sa)
    back = sa_to_hf_state_dict(sa)
    assert set(back) == hf_keys
    for k in hf_keys:
        assert back[k] is tiny_sam_sd[k], k


def _drop_config():
    return {
        "sam": {"encoder_heads": 4, "global_attn_indexes": [1],
                "img_size": 128, "window_size": 14},
        "dino": {"num_heads": 4, "patch_size": 14},
        "yolo": {"img": 64},
        "pose": {"img": 64, "num_classes": 1},
    }


def _write_drop(tmp_path, tiny_sam_sd, kinds, sam_layout="hf"):
    torch = pytest.importorskip("torch")
    drop = tmp_path / "drop"
    drop.mkdir()
    (drop / "parity_config.json").write_text(json.dumps(_drop_config()))
    if "sam" in kinds:
        sd = tiny_sam_sd if sam_layout == "hf" else hf_to_sa(tiny_sam_sd)
        torch.save(sd, drop / "sam_vit_t.pth")
    if "dino" in kinds:
        from transformers import Dinov2Config, Dinov2Model
        cfg = Dinov2Config(hidden_size=64, num_hidden_layers=2,
                           num_attention_heads=4, intermediate_size=256,
                           patch_size=14, image_size=56,
                           layerscale_value=1.0)
        torch.manual_seed(1)
        Dinov2Model(cfg).eval().save_pretrained(drop / "dinov2-tiny")
    if "yolo" in kinds:
        from lameness_tpu.models.yolo import (YoloV8,
                                              export_ultralytics_state_dict,
                                              init_params)
        m = YoloV8(variant="n", num_classes=3)
        p = init_params(m, img=64)
        sd = {k: torch.as_tensor(np.asarray(v)) for k, v in
              export_ultralytics_state_dict(p).items()}
        torch.save(sd, drop / "yolov8n.pt")
    if "pose" in kinds:
        from lameness_tpu.models.yolo import (YoloV8,
                                              export_ultralytics_state_dict,
                                              init_params)
        m = YoloV8(variant="n", num_classes=1, num_keypoints=20)
        p = init_params(m, img=64)
        sd = {k: torch.as_tensor(np.asarray(v)) for k, v in
              export_ultralytics_state_dict(p, has_pose=True).items()}
        torch.save(sd, drop / "cow_pose_roboflow.pt")
    return drop


def _run(drop, tmp_path, extra=()):
    import scripts.parity_drop as pd
    report = tmp_path / "report.json"
    out = tmp_path / "models"
    argv = ["parity_drop.py", str(drop), "--out", str(out),
            "--report", str(report), *extra]
    old = sys.argv
    sys.argv = argv
    try:
        rc = pd.main()
    finally:
        sys.argv = old
    return rc, json.loads(report.read_text()), out


@pytest.mark.slow
def test_harness_full_drop_hf(tmp_path, tiny_sam_sd):
    """One invocation over a 4-model drop: every gate that can run on
    synthetic checkpoints passes, checkpoints land where restore_engine
    reads them."""
    drop = _write_drop(tmp_path, tiny_sam_sd,
                       ("sam", "dino", "yolo", "pose"))
    rc, rep, out = _run(drop, tmp_path)
    assert rc == 0, json.dumps(rep, indent=1)
    assert rep["status"] == "pass"
    g = rep["models"]["sam"]["gates"]
    assert g["mask_iou_vs_torch"]["pass"] and \
        g["mask_iou_vs_torch"]["value"] >= 0.99
    assert g["iou_pred_abs_diff"]["pass"]
    assert g["rect_canvas_mask_iou"]["value"] >= 0.97
    assert rep["models"]["dino"]["gates"][
        "embedding_cosine_vs_torch"]["value"] >= 0.999
    for kind in ("yolo", "pose"):
        gk = rep["models"][kind]["gates"]
        assert gk["conversion_lossless"]["pass"], gk
        assert gk["forward_finite"]["pass"]
        assert "ultralytics" in gk["ultralytics_parity"]["detail"]
    # checkpoints written under the restore_engine layout
    for kind in ("sam", "dino", "yolo", "pose"):
        p = Path(rep["models"][kind]["checkpoint"])
        assert p.exists() or Path(str(p) + ".pkl").exists()


@pytest.mark.slow
def test_harness_sa_layout_drop(tmp_path, tiny_sam_sd):
    """The original segment-anything .pth layout (the reference
    registry's actual files) converts and gates identically."""
    drop = _write_drop(tmp_path, tiny_sam_sd, ("sam",), sam_layout="sa")
    rc, rep, out = _run(drop, tmp_path, extra=("--skip-rect",))
    assert rc == 0, json.dumps(rep, indent=1)
    assert rep["models"]["sam"]["layout"] == "sa"
    assert rep["models"]["sam"]["gates"]["mask_iou_vs_torch"]["pass"]


def test_harness_corrupt_checkpoint_fails_cleanly(tmp_path):
    """A tensor-corrupted drop must FAIL the gate, not pass vacuously."""
    torch = pytest.importorskip("torch")
    drop = tmp_path / "drop"
    drop.mkdir()
    (drop / "parity_config.json").write_text(json.dumps(_drop_config()))
    from lameness_tpu.models.yolo import (YoloV8,
                                          export_ultralytics_state_dict,
                                          init_params)
    m = YoloV8(variant="n", num_classes=3)
    sd = export_ultralytics_state_dict(init_params(m, img=64))
    del sd["22.cv3.0.2.weight"]          # truncated file: a head tensor gone
    torch.save({k: torch.as_tensor(np.asarray(v)) for k, v in sd.items()},
               drop / "yolov8n.pt")
    rc, rep, _ = _run(drop, tmp_path)
    assert rc == 1
    assert rep["status"] == "fail"


def test_harness_empty_drop_fails(tmp_path):
    drop = tmp_path / "empty"
    drop.mkdir()
    rc, rep, _ = _run(drop, tmp_path)
    assert rc == 1 and "no recognizable" in rep.get("error", "")
