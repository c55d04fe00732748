"""DINOv2 ViT in flax — the embedding backbone of the identity layer.

TPU-native equivalent of the reference's HF ``facebook/dinov2-base`` usage
(``services/dinov3-pipeline/app/main.py:30-36,95-115``): a ViT whose
mean-pooled last hidden state is the 768-d per-frame embedding.  The
attention runs through the Pallas block-attention kernel on TPU.

Weight layout mirrors the HF ``Dinov2Model`` so torch checkpoints convert
one-to-one (``convert_hf_state_dict``); parity vs the torch model is
unit-tested with randomly initialised weights (no download needed).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import flash_attention


class Mlp(nn.Module):
    hidden: int
    out: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.out, name="fc2")(x)
        return x


class Attention(nn.Module):
    dim: int
    heads: int
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, x):
        b, s, d = x.shape
        hd = self.dim // self.heads
        q = nn.Dense(self.dim, name="query")(x)
        k = nn.Dense(self.dim, name="key")(x)
        v = nn.Dense(self.dim, name="value")(x)

        def split(t):
            return t.reshape(b, s, self.heads, hd).transpose(0, 2, 1, 3)

        out = flash_attention(split(q), split(k), split(v),
                              use_pallas=self.use_pallas)
        out = out.transpose(0, 2, 1, 3).reshape(b, s, d)
        return nn.Dense(self.dim, name="out")(out)


class Block(nn.Module):
    dim: int
    heads: int
    mlp_ratio: int = 4
    ls_init: float = 1.0
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, x):
        ls1 = self.param("ls1", nn.initializers.constant(self.ls_init),
                         (self.dim,))
        ls2 = self.param("ls2", nn.initializers.constant(self.ls_init),
                         (self.dim,))
        h = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        h = Attention(self.dim, self.heads, self.use_pallas, name="attn")(h)
        x = x + h * ls1
        h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        h = Mlp(self.dim * self.mlp_ratio, self.dim, name="mlp")(h)
        return x + h * ls2


class DinoV2(nn.Module):
    """ViT-B/14 by default (facebook/dinov2-base geometry)."""
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    patch_size: int = 14
    pos_grid: int = 37              # pretrain grid: 518 / 14
    mlp_ratio: int = 4
    ls_init: float = 1.0e-5
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """pixel_values: (B, H, W, 3) normalized.  Returns dict with
        ``last_hidden_state`` (B, 1+N, D) and ``pooled`` (B, D) mean-pool."""
        b, h, w, _ = pixel_values.shape
        gh, gw = h // self.patch_size, w // self.patch_size

        x = nn.Conv(self.hidden_size,
                    (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size),
                    padding="VALID", name="patch_embed")(pixel_values)
        x = x.reshape(b, gh * gw, self.hidden_size)

        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, self.hidden_size))
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, 1 + self.pos_grid ** 2, self.hidden_size))
        pos_patch = pos[:, 1:, :]
        if (gh, gw) != (self.pos_grid, self.pos_grid):
            # HF interpolate_pos_encoding: bicubic, no antialias
            pos_patch = pos_patch.reshape(
                1, self.pos_grid, self.pos_grid, self.hidden_size)
            pos_patch = jax.image.resize(
                pos_patch, (1, gh, gw, self.hidden_size), method="bicubic")
            pos_patch = pos_patch.reshape(1, gh * gw, self.hidden_size)
        x = x + pos_patch
        cls_tok = jnp.tile(cls + pos[:, :1, :], (b, 1, 1))
        x = jnp.concatenate([cls_tok, x], axis=1)

        for i in range(self.num_layers):
            x = Block(self.hidden_size, self.num_heads, self.mlp_ratio,
                      self.ls_init, self.use_pallas, name=f"block{i}")(x)
        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        return {"last_hidden_state": x, "pooled": x.mean(axis=1)}


# ---------------------------------------------------------------------------
# torch -> flax weight conversion (HF Dinov2Model layout)
# ---------------------------------------------------------------------------
def _lin(sd, prefix):
    return {"kernel": np.asarray(sd[prefix + ".weight"]).T,
            "bias": np.asarray(sd[prefix + ".bias"])}


def _ln(sd, prefix):
    return {"scale": np.asarray(sd[prefix + ".weight"]),
            "bias": np.asarray(sd[prefix + ".bias"])}


def convert_hf_state_dict(sd: Dict[str, Any], num_layers: int = 12) -> Dict:
    """Map a torch ``Dinov2Model.state_dict()`` into this module's params."""
    sd = {k: v.detach().cpu().numpy() if hasattr(v, "detach") else v
          for k, v in sd.items()}
    p: Dict[str, Any] = {}
    p["patch_embed"] = {
        # torch conv OIHW -> flax HWIO
        "kernel": np.transpose(
            sd["embeddings.patch_embeddings.projection.weight"], (2, 3, 1, 0)),
        "bias": sd["embeddings.patch_embeddings.projection.bias"],
    }
    p["cls_token"] = sd["embeddings.cls_token"]
    p["pos_embed"] = sd["embeddings.position_embeddings"]
    for i in range(num_layers):
        t = f"encoder.layer.{i}"
        p[f"block{i}"] = {
            "norm1": _ln(sd, f"{t}.norm1"),
            "norm2": _ln(sd, f"{t}.norm2"),
            "ls1": sd[f"{t}.layer_scale1.lambda1"],
            "ls2": sd[f"{t}.layer_scale2.lambda1"],
            "attn": {
                "query": _lin(sd, f"{t}.attention.attention.query"),
                "key": _lin(sd, f"{t}.attention.attention.key"),
                "value": _lin(sd, f"{t}.attention.attention.value"),
                "out": _lin(sd, f"{t}.attention.output.dense"),
            },
            "mlp": {
                "fc1": _lin(sd, f"{t}.mlp.fc1"),
                "fc2": _lin(sd, f"{t}.mlp.fc2"),
            },
        }
    p["norm"] = _ln(sd, "layernorm")
    return {"params": p}


def preprocess_frames(frames: jnp.ndarray) -> jnp.ndarray:
    """Replicate the HF BitImageProcessor path the reference uses
    (``dinov3:107``): resize shortest edge to 256 (bicubic), center-crop 224,
    imagenet-normalize.  frames: (B, H, W, 3) uint8/float RGB."""
    from ..ops.preprocess import IMAGENET_MEAN, IMAGENET_STD, normalize
    if frames.dtype == jnp.uint8:
        frames = frames.astype(jnp.float32) / 255.0
    b, h, w, c = frames.shape
    if h < w:
        nh, nw = 256, max(1, int(round(w * 256 / h)))
    else:
        nh, nw = max(1, int(round(h * 256 / w))), 256
    frames = jax.image.resize(frames, (b, nh, nw, c), method="bicubic")
    top, left = (nh - 224) // 2, (nw - 224) // 2
    frames = jax.lax.dynamic_slice(frames, (0, top, left, 0), (b, 224, 224, c))
    return normalize(frames, IMAGENET_MEAN, IMAGENET_STD)
