"""SAM variant coverage: vit_b / vit_l / vit_h geometry end-to-end.

The reference's registry selects the variant by checkpoint name
(services/sam3-pipeline/app/main.py:51-72) and canonical SAM is vit_h;
config.sam.variant must therefore actually steer the built geometry,
and the HF conversion must accept 24/32-layer encoders (depth is
inferred from the state dict).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lameness_tpu.models.sam import (SAM_VARIANTS, Sam, build_sam,
                                     convert_hf_state_dict, infer_variant)


def test_variant_table_matches_segment_anything_build():
    # canonical segment_anything build_sam geometries
    assert SAM_VARIANTS["vit_b"] == dict(
        encoder_dim=768, encoder_depth=12, encoder_heads=12,
        global_attn_indexes=(2, 5, 8, 11))
    assert SAM_VARIANTS["vit_l"] == dict(
        encoder_dim=1024, encoder_depth=24, encoder_heads=16,
        global_attn_indexes=(5, 11, 17, 23))
    assert SAM_VARIANTS["vit_h"] == dict(
        encoder_dim=1280, encoder_depth=32, encoder_heads=16,
        global_attn_indexes=(7, 15, 23, 31))
    # head_dim: 64 / 64 / 80
    for name, hd in [("vit_b", 64), ("vit_l", 64), ("vit_h", 80)]:
        g = SAM_VARIANTS[name]
        assert g["encoder_dim"] // g["encoder_heads"] == hd


def test_infer_variant():
    assert infer_variant(768) == "vit_b"
    assert infer_variant(1024) == "vit_l"
    assert infer_variant(1280) == "vit_h"
    with pytest.raises(ValueError):
        infer_variant(512)


def test_build_sam_unknown_variant():
    with pytest.raises(ValueError, match="unknown SAM variant"):
        build_sam("vit_xxl")


def _template(model: Sam):
    return jax.eval_shape(model.init, jax.random.PRNGKey(0),
                          jnp.zeros((1, model.img_size, model.img_size, 3)),
                          jnp.zeros((1, 4)))


@pytest.mark.parametrize("variant", ["vit_l", "vit_h"])
def test_variant_eval_shapes(variant):
    """eval_shape of the full-size variant init: layer count, rel-pos
    table geometry (global layers use the 64-token grid, windowed the
    14-token window), decoder unchanged."""
    geo = SAM_VARIANTS[variant]
    model = build_sam(variant)
    tpl = _template(model)["params"]
    ve = tpl["vision_encoder"]
    depth, dim = geo["encoder_depth"], geo["encoder_dim"]
    hd = dim // geo["encoder_heads"]
    assert ve["pos_embed"].shape == (1, 64, 64, dim)
    layers = [k for k in ve if k.startswith("layer")]
    assert len(layers) == depth
    for i in range(depth):
        at = ve[f"layer{i}"]["attn"]
        size = 64 if i in geo["global_attn_indexes"] else 14
        assert at["rel_pos_h"].shape == (2 * size - 1, hd), (variant, i)
        assert at["qkv"]["kernel"].shape == (dim, 3 * dim)
    # prompt encoder / mask decoder geometry is variant-independent
    assert tpl["mask_decoder"]["iou_token"].shape == (1, 256)
    assert ve["neck_conv1"]["kernel"].shape == (1, 1, dim, 256)


def _shape_map(tree):
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {jax.tree_util.keystr(k): tuple(np.shape(v)) for k, v in flat}


def _synthetic_encoder_sd(dim, depth, heads, global_idx):
    """HF SamModel vision_encoder state-dict entries at a variant
    geometry (np.zeros: lazy pages, so vit_h's 630M params cost ~0)."""
    hd = dim // heads
    sd = {
        "vision_encoder.patch_embed.projection.weight":
            np.zeros((dim, 3, 16, 16), np.float32),
        "vision_encoder.patch_embed.projection.bias":
            np.zeros((dim,), np.float32),
        "vision_encoder.pos_embed": np.zeros((1, 64, 64, dim), np.float32),
        "vision_encoder.neck.conv1.weight":
            np.zeros((256, dim, 1, 1), np.float32),
        "vision_encoder.neck.layer_norm1.weight": np.zeros(256, np.float32),
        "vision_encoder.neck.layer_norm1.bias": np.zeros(256, np.float32),
        "vision_encoder.neck.conv2.weight":
            np.zeros((256, 256, 3, 3), np.float32),
        "vision_encoder.neck.layer_norm2.weight": np.zeros(256, np.float32),
        "vision_encoder.neck.layer_norm2.bias": np.zeros(256, np.float32),
    }
    for i in range(depth):
        t = f"vision_encoder.layers.{i}"
        size = 64 if i in global_idx else 14
        sd.update({
            f"{t}.layer_norm1.weight": np.zeros(dim, np.float32),
            f"{t}.layer_norm1.bias": np.zeros(dim, np.float32),
            f"{t}.layer_norm2.weight": np.zeros(dim, np.float32),
            f"{t}.layer_norm2.bias": np.zeros(dim, np.float32),
            f"{t}.attn.qkv.weight": np.zeros((3 * dim, dim), np.float32),
            f"{t}.attn.qkv.bias": np.zeros(3 * dim, np.float32),
            f"{t}.attn.proj.weight": np.zeros((dim, dim), np.float32),
            f"{t}.attn.proj.bias": np.zeros(dim, np.float32),
            f"{t}.attn.rel_pos_h": np.zeros((2 * size - 1, hd), np.float32),
            f"{t}.attn.rel_pos_w": np.zeros((2 * size - 1, hd), np.float32),
            f"{t}.mlp.lin1.weight": np.zeros((4 * dim, dim), np.float32),
            f"{t}.mlp.lin1.bias": np.zeros(4 * dim, np.float32),
            f"{t}.mlp.lin2.weight": np.zeros((dim, 4 * dim), np.float32),
            f"{t}.mlp.lin2.bias": np.zeros(dim, np.float32),
        })
    return sd


@pytest.mark.parametrize("variant", ["vit_l", "vit_h"])
def test_convert_variant_state_dict_shapes(variant):
    """Full-architecture conversion gate at vit_l / vit_h geometry:
    prompt-encoder/decoder keys come from a real `transformers.SamModel`
    (key-name contract, random weights), the encoder from a synthetic
    state dict at the variant geometry (HF names, np.zeros).  Depth is
    INFERRED — no geometry argument — and every converted leaf matches
    the eval_shape template exactly."""
    torch = pytest.importorskip("torch")
    from transformers import SamConfig, SamModel
    with torch.no_grad():
        base = SamModel(SamConfig()).eval().state_dict()
    geo = SAM_VARIANTS[variant]
    sd = {k: v for k, v in base.items()
          if not k.startswith("vision_encoder.")}
    sd.update(_synthetic_encoder_sd(
        geo["encoder_dim"], geo["encoder_depth"], geo["encoder_heads"],
        geo["global_attn_indexes"]))
    params = convert_hf_state_dict(sd)        # depth inferred from keys
    assert _shape_map(params) == _shape_map(_template(build_sam(variant)))


def test_engine_reads_config_variant(monkeypatch):
    """config.sam.variant steers the engine's built geometry (the round-3
    dead knob).  A tiny variant is injected so the test stays cheap; the
    real tables are pinned by the shape tests above."""
    from lameness_tpu.core.config import Config, SamConfig
    from lameness_tpu.models import sam as sam_mod
    from lameness_tpu.pipeline.engine import EngineSpec, LamenessEngine
    monkeypatch.setitem(sam_mod.SAM_VARIANTS, "vit_t", dict(
        encoder_dim=64, encoder_depth=3, encoder_heads=4,
        global_attn_indexes=(1,)))
    cfg = Config(sam=SamConfig(variant="vit_t"))
    spec = EngineSpec(clip_frames=25, frame_height=72, frame_width=128,
                      yolo_size=64, pose_size=64, dino_size=28,
                      sam_size=128, sam_mask_size=32)
    eng = LamenessEngine(config=cfg, spec=spec)
    assert eng.sam.encoder_dim == 64
    assert eng.sam.encoder_depth == 3
    assert eng.sam.global_attn_indexes == (1,)
    # the built params actually carry the 3-layer tree
    ve = eng.params["sam"]["params"]["vision_encoder"]
    assert sorted(k for k in ve if k.startswith("layer")) == \
        ["layer0", "layer1", "layer2"]


def test_load_torch_weights_switches_variant(monkeypatch):
    """Installing a checkpoint of a different geometry rebuilds the Sam
    module to match (reference behavior: variant follows the checkpoint,
    sam3:51-72)."""
    from lameness_tpu.core.config import Config, SamConfig
    from lameness_tpu.models import sam as sam_mod
    from lameness_tpu.pipeline.engine import EngineSpec, LamenessEngine
    torch = pytest.importorskip("torch")
    from transformers import SamConfig as HfSamConfig, SamModel
    monkeypatch.setitem(sam_mod.SAM_VARIANTS, "vit_t", dict(
        encoder_dim=64, encoder_depth=2, encoder_heads=4,
        global_attn_indexes=(1,)))
    spec = EngineSpec(clip_frames=25, frame_height=72, frame_width=128,
                      yolo_size=64, pose_size=64, dino_size=28,
                      sam_size=1024, sam_mask_size=64)
    eng = LamenessEngine(config=Config(sam=SamConfig(variant="vit_t")),
                         spec=spec)
    assert eng.sam.encoder_dim == 64
    with torch.no_grad():
        sd = SamModel(HfSamConfig()).eval().state_dict()   # vit_b geometry
    eng.load_torch_weights("sam", sd)
    assert eng.sam.encoder_dim == 768 and eng.sam.encoder_depth == 12
    assert eng.loaded_weights["sam"]
    # installed params fit the switched module: shapes line up exactly
    tpl = jax.eval_shape(
        eng.sam.init, jax.random.PRNGKey(0),
        jnp.zeros((1, 1024, 1024, 3)), jnp.zeros((1, 4)))
    assert _shape_map(tpl) == _shape_map(eng.params["sam"])


@pytest.mark.slow
def test_small_geometry_engine_vit_h_head_dim():
    """End-to-end small-geometry engine run at vit_h's head_dim 80 and
    16-head layout (tiny depth/size so CPU stays fast): the full
    detect→sam→dino→heads pipeline produces finite outputs."""
    from lameness_tpu.core.config import Config, SamConfig
    from lameness_tpu.models import sam as sam_mod
    from lameness_tpu.pipeline.engine import EngineSpec, LamenessEngine
    import unittest.mock as mock
    with mock.patch.dict(sam_mod.SAM_VARIANTS, {"vit_h_mini": dict(
            encoder_dim=160, encoder_depth=3, encoder_heads=2,
            global_attn_indexes=(1,))}):
        cfg = Config(sam=SamConfig(variant="vit_h_mini"))
        spec = EngineSpec(clip_frames=25, frame_height=72, frame_width=128,
                          yolo_size=64, pose_size=64, dino_size=28,
                          sam_size=128, sam_mask_size=32)
        eng = LamenessEngine(config=cfg, spec=spec)
        assert eng.sam.encoder_dim // eng.sam.encoder_heads == 80
        rng = np.random.default_rng(0)
        frames = rng.integers(0, 255, (1, 25, 72, 128, 3), np.uint8)
        out = eng.process_clip_batch(frames)
        assert np.isfinite(np.asarray(out["tcn_probability"])).all()
        assert out["masks"].shape[-1] == 32
