"""SAM (Segment Anything) in flax — box-prompted cow silhouette masks.

TPU-native equivalent of the reference's ``segment_anything`` usage
(``services/sam3-pipeline/app/main.py:51-100``): ViTDet image encoder
(windowed + global attention with decomposed relative positions), prompt
encoder (box prompts), and the two-way-transformer mask decoder.

Weight layout converts one-to-one from HF ``SamModel`` state dicts
(``convert_hf_state_dict``) so real ``facebook/sam-vit-*`` checkpoints load
directly; decoder/encoder parity vs torch is unit-tested with random
weights.  The mask-IoU ≥ 0.99 north-star gate rides on this conversion.

Everything is NHWC and jit/vmap friendly; the 64×64-token global-attention
layers are the heaviest single op in the whole system (SURVEY.md §3.1) and
keep f32 islands for parity while running bf16 elsewhere.
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------
class LayerNorm2d(nn.Module):
    """Channel-wise LayerNorm over the last (channel) axis of NHWC, matching
    SAM's LayerNorm2d (mean/var over C only)."""
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        # stats in f32 even for bf16 activations (bf16 variance loses ~3
        # decimal digits); output dtype follows the f32 params as before
        x32 = x.astype(jnp.float32)
        mean = x32.mean(axis=-1, keepdims=True)
        var = ((x32 - mean) ** 2).mean(axis=-1, keepdims=True)
        x32 = (x32 - mean) / jnp.sqrt(var + self.eps)
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        b = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        return x32 * w + b


class MlpBlock(nn.Module):
    hidden: int
    out: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, name="lin1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.out, name="lin2")(x)


def _rel_pos_bias(q_hw: Tuple[int, int], rel_pos_h: jnp.ndarray,
                  rel_pos_w: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Decomposed relative-position bias (ViTDet).  q: (B, H*W, nH, hd).
    Returns bias (B, nH, H*W, H*W)."""
    h, w = q_hw
    # rel index for equal q/k sizes: (i - j) + (size - 1)
    idx_h = (np.arange(h)[:, None] - np.arange(h)[None, :]) + (h - 1)
    idx_w = (np.arange(w)[:, None] - np.arange(w)[None, :]) + (w - 1)
    rh = rel_pos_h[idx_h]          # (h, h, hd)
    rw = rel_pos_w[idx_w]          # (w, w, hd)
    b = q.shape[0]
    nh = q.shape[2]
    qr = q.reshape(b, h, w, nh, -1)
    # einsum over head_dim: bias_h (b, nh, h, w, h') ; bias_w (b, nh, h, w, w')
    bias_h = jnp.einsum("bhwnd,hkd->bnhwk", qr, rh)
    bias_w = jnp.einsum("bhwnd,wkd->bnhwk", qr, rw)
    bias = bias_h[:, :, :, :, :, None] + bias_w[:, :, :, :, None, :]
    return bias.reshape(b, nh, h * w, h * w)


class VisionAttention(nn.Module):
    dim: int
    heads: int
    input_size: Tuple[int, int]    # param-table (H, W): the PRETRAINED
                                   # grid; the runtime q grid may be
                                   # smaller (rect canvases, sam_rect)
    fused: Optional[bool] = None   # None = auto (Pallas kernel on TPU for
                                   # large global grids)

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, C) -> (B, H, W, C).  H/W may be smaller than
        input_size (rect canvas): rel-pos tables are center-sliced to the
        needed offset range — offsets -(H-1)..H-1 are exactly rows
        [S-H, S+H-1) of the 2S-1-row pretrained table (an exact slice,
        no interpolation)."""
        b, h, w, c = x.shape
        hd = self.dim // self.heads
        qkv = nn.Dense(self.dim * 3, name="qkv")(x.reshape(b, h * w, c))
        qkv = qkv.reshape(b, h * w, 3, self.heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, N, nH, hd)

        sh, sw = self.input_size
        assert h <= sh and w <= sw, ((h, w), self.input_size)
        rel_h = self.param("rel_pos_h", nn.initializers.zeros,
                           (2 * sh - 1, hd))
        rel_w = self.param("rel_pos_w", nn.initializers.zeros,
                           (2 * sw - 1, hd))
        if h != sh:
            rel_h = jax.lax.slice_in_dim(rel_h, sh - h, sh + h - 1, axis=0)
        if w != sw:
            rel_w = jax.lax.slice_in_dim(rel_w, sw - w, sw + w - 1, axis=0)

        use_fused = self.fused
        if use_fused is None:
            use_fused = (jax.default_backend() == "tpu"
                         and min(h, w) >= 32)
        import os
        use_fused_win = (self.fused is not False
                         and h == w == sh and h <= 16
                         and os.environ.get("LAMENESS_FUSED_WIN") != "0"
                         and (jax.default_backend() == "tpu"
                              or self.fused is True))
        win_kernel = os.environ.get("LAMENESS_WIN_KERNEL", "v3")
        if hd + 2 * h > 128 and win_kernel in ("v3", "v5"):
            # head-last window kernels pack [q|rh|rw] into one 128-lane
            # group per head (hd + 2*win); all SAM_VARIANTS fit
            # (hd<=80, win=14 -> <=108) but fall back for exotic dims
            win_kernel = "v1"
        if use_fused_win and win_kernel in ("v3", "v5"):
            # transpose-free default: head-last layouts end-to-end, the
            # kernel reads 128-lane-aligned per-head slices directly.
            # On-chip (b=1100 windows, bf16): 46 -> 33 ms real module
            # time vs the transpose-based v1 path, bitwise-identical
            # (docs/PROBES_r03.json attnmod_*).  LAMENESS_WIN_KERNEL=v1
            # (or v2) reverts to the transpose-based kernels; v5 is the
            # software-pipelined head-loop variant (probe-gated).
            from ..ops.sam_attention import (project_rel_tables_hl,
                                             sam_window_attention_v3,
                                             sam_window_attention_v5)
            interp = jax.default_backend() != "tpu"
            rh4, rw4 = project_rel_tables_hl(q, rel_h, rel_w, h)
            fn = sam_window_attention_v5 if win_kernel == "v5" \
                else sam_window_attention_v3
            of = fn(q, k, v, rh4, rw4, interpret=interp)
            out = of.reshape(b, h, w, self.dim)
            return nn.Dense(self.dim, name="proj")(out)
        elif use_fused_win:
            # fused windowed path: one Pallas program per window fuses
            # bias + softmax + both matmuls for all heads (the windowed
            # layers are ~91% of SAM encoder compute)
            from ..ops.sam_attention import (project_rel_tables,
                                             sam_window_attention)
            interp = jax.default_backend() != "tpu"
            qf = q.transpose(0, 2, 1, 3).reshape(b * self.heads, h * w, hd)
            rh, rw = project_rel_tables(qf, rel_h, rel_w, h)
            rh = rh.reshape(b, self.heads, h * w, h)
            rw = rw.reshape(b, self.heads, h * w, h)
            of = sam_window_attention(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3), rh, rw, interpret=interp)
            out = of.transpose(0, 2, 1, 3)                  # (B, N, nH, hd)
        elif (use_fused and os.environ.get("LAMENESS_GLB_KERNEL") == "v3"
              and hd + h <= 128):
            # (head-last global packing needs hd + G <= 128: true for
            # hd=64 variants at G=64, NOT for vit_h's hd=80 — those fall
            # through to the default v4 kernel below)
            # transpose-free head-last global path (opt-in): the grid's
            # lane-block axis selects the head, no HLO transposes
            from ..ops.sam_attention import (project_rel_tables_hl,
                                             sam_global_attention_v3)
            interp = jax.default_backend() != "tpu"
            rh4, rw4 = project_rel_tables_hl(q, rel_h, rel_w, h, w)
            of = sam_global_attention_v3(q, k, v, rh4, rw4,
                                         interpret=interp)
            out = of.reshape(b, h, w, self.dim)
            return nn.Dense(self.dim, name="proj")(out)
        elif use_fused:
            # fused Pallas path: never materialises the (N, N) bias
            from ..ops.sam_attention import (project_rel_tables,
                                             sam_global_attention)
            interp = jax.default_backend() != "tpu"
            qf = q.transpose(0, 2, 1, 3).reshape(b * self.heads, h * w, hd)
            kf = k.transpose(0, 2, 1, 3).reshape(b * self.heads, h * w, hd)
            vf = v.transpose(0, 2, 1, 3).reshape(b * self.heads, h * w, hd)
            rh, rw = project_rel_tables(qf, rel_h, rel_w, h, w)
            of = sam_global_attention(qf, kf, vf, rh, rw, interpret=interp)
            out = of.reshape(b, self.heads, h * w, hd).transpose(0, 2, 1, 3)
        else:
            bias = _rel_pos_bias((h, w), rel_h, rel_w, q)
            scale = hd ** -0.5
            attn = jnp.einsum("bqnd,bknd->bnqk", q * scale, k,
                              preferred_element_type=jnp.float32)
            attn = jax.nn.softmax(attn + bias, axis=-1).astype(x.dtype)
            out = jnp.einsum("bnqk,bknd->bqnd", attn, v)
        out = out.reshape(b, h, w, self.dim)
        return nn.Dense(self.dim, name="proj")(out)


def window_partition(x: jnp.ndarray, win: int):
    """(B, H, W, C) -> (B·nW, win, win, C), plus padded (Hp, Wp)."""
    b, h, w, c = x.shape
    pad_h = (-h) % win
    pad_w = (-w) % win
    x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = h + pad_h, w + pad_w
    x = x.reshape(b, hp // win, win, wp // win, win, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, win, win, c)
    return x, (hp, wp)


def window_unpartition(x: jnp.ndarray, win: int, padded_hw, orig_hw):
    hp, wp = padded_hw
    h, w = orig_hw
    b = x.shape[0] // ((hp // win) * (wp // win))
    x = x.reshape(b, hp // win, wp // win, win, win, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


class VisionLayer(nn.Module):
    dim: int
    heads: int
    mlp_ratio: float
    window_size: int               # 0 => global attention
    global_input_size: Tuple[int, int]
    fused_global: Optional[bool] = None

    @nn.compact
    def __call__(self, x):
        shortcut = x
        h = nn.LayerNorm(epsilon=1e-6, name="ln1")(x)
        if self.window_size > 0:
            orig_hw = (h.shape[1], h.shape[2])
            h, padded = window_partition(h, self.window_size)
            size = (self.window_size, self.window_size)
        else:
            size = self.global_input_size
        fused = self.fused_global      # None=auto / True=force / False=off
                                       # — window kernel picks by size
        h = VisionAttention(self.dim, self.heads, size, fused,
                            name="attn")(h)
        if self.window_size > 0:
            h = window_unpartition(h, self.window_size, padded, orig_hw)
        x = shortcut + h
        h = nn.LayerNorm(epsilon=1e-6, name="ln2")(x)
        h = MlpBlock(int(self.dim * self.mlp_ratio), self.dim, name="mlp")(h)
        return x + h


class SamVisionEncoder(nn.Module):
    """ViTDet encoder: (B, 1024, 1024, 3) -> (B, 64, 64, 256)."""
    img_size: int = 1024
    patch_size: int = 16
    dim: int = 768
    depth: int = 12
    heads: int = 12
    mlp_ratio: float = 4.0
    out_chans: int = 256
    window_size: int = 14
    global_attn_indexes: Sequence[int] = (2, 5, 8, 11)
    fused_global: Optional[bool] = None
    # activation checkpointing per transformer layer: trades ~1 extra
    # forward of FLOPs in the backward pass for O(depth) less live
    # activation memory — the fine-tune knob for the 32-layer vit_h
    # encoder.  Inference memory is bounded by EngineSpec.sam_encode_chunk
    # instead (no backward pass to save).
    remat: bool = False

    @nn.compact
    def __call__(self, x, content_rows: int = 0):
        """x: (B, H, W, 3) with H, W ≤ img_size, multiples of patch_size.
        H < W (or W < H) is the rect-canvas serving mode (sam_rect): the
        pad-free token grid keeps the absolute pos-embed slice the content
        tokens would get on the padded square canvas.

        content_rows (static): number of token rows covering image
        content on a bottom-padded square canvas (0 = whole grid).  The
        pad rows below are IDENTICAL across the batch (zero pixels →
        constant after normalize → constant patch embed + pos embed),
        and windowed attention is per-window, so until the first global
        layer mixes content into them, whole pad window-rows can be
        computed ONCE and broadcast instead of per-image — bit-exact
        (same per-window math, different window-batch index) and ~35%
        less work in the pre-global windowed layers at 16:9 ingest
        (content 36 of 64 rows ⇒ 3 of 5 window-rows per-image)."""
        g = self.img_size // self.patch_size
        x = nn.Conv(self.dim, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size),
                    padding="VALID", name="patch_embed")(x)     # (B, gh, gw, D)
        gh, gw = x.shape[1], x.shape[2]
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, g, g, self.dim))
        x = x + (pos if (gh, gw) == (g, g) else pos[:, :gh, :gw])
        first_global = min(self.global_attn_indexes) \
            if self.global_attn_indexes else self.depth
        layer_cls = nn.remat(VisionLayer) if self.remat else VisionLayer
        for i in range(self.depth):
            win = 0 if i in self.global_attn_indexes else self.window_size
            layer = layer_cls(self.dim, self.heads, self.mlp_ratio, win,
                              (g, g), self.fused_global, name=f"layer{i}")
            split = 0
            if (win and content_rows and i < first_global
                    and (gh, gw) == (g, g) and x.shape[0] > 1):
                # content window-rows span, rounded up to whole windows
                # (the straddling window-row is content-dependent)
                split = -(-content_rows // win) * win
            if split and split < gh:
                xc = layer(x[:, :split])
                xp = layer(x[:1, split:])           # image-independent rows
                x = jnp.concatenate(
                    [xc, jnp.broadcast_to(xp, (x.shape[0],) + xp.shape[1:])],
                    axis=1)
            else:
                x = layer(x)
        # neck: 1x1 conv (no bias) -> LN2d -> 3x3 conv (no bias) -> LN2d
        x = nn.Conv(self.out_chans, (1, 1), use_bias=False, name="neck_conv1")(x)
        x = LayerNorm2d(name="neck_ln1")(x)
        x = nn.Conv(self.out_chans, (3, 3), padding=1, use_bias=False,
                    name="neck_conv2")(x)
        x = LayerNorm2d(name="neck_ln2")(x)
        return x


# ---------------------------------------------------------------------------
# prompt encoder
# ---------------------------------------------------------------------------
class SamPositionalEmbedding(nn.Module):
    """Random-Fourier positional encoding shared by prompt encoder/decoder."""
    num_pos_feats: int = 128
    scale: float = 1.0

    @nn.compact
    def __call__(self, coords):                      # (..., 2) in [0, 1]
        g = self.param("positional_embedding",
                       lambda key, shape: self.scale
                       * jax.random.normal(key, shape),
                       (2, self.num_pos_feats))
        coords = 2.0 * coords - 1.0
        coords = coords.astype(jnp.float32) @ g
        coords = 2.0 * jnp.pi * coords
        return jnp.concatenate([jnp.sin(coords), jnp.cos(coords)], axis=-1)


class SamPromptEncoder(nn.Module):
    """Box (and point) prompts -> sparse/dense embeddings.

    Only the paths the pipeline uses are implemented: box prompts and the
    no-mask dense embedding (the reference prompts with YOLO boxes only,
    sam3-pipeline/app/main.py:74-92).
    """
    embed_dim: int = 256
    image_embedding_size: int = 64
    input_image_size: int = 1024

    def setup(self):
        self.shared_embedding = SamPositionalEmbedding(self.embed_dim // 2)
        # 4 point embeddings: pos point, neg point, box TL, box BR
        self.point_embed = [
            self.param(f"point_embed_{i}", nn.initializers.normal(1.0),
                       (1, self.embed_dim)) for i in range(4)]
        self.not_a_point_embed = self.param(
            "not_a_point_embed", nn.initializers.normal(1.0),
            (1, self.embed_dim))
        self.no_mask_embed = self.param(
            "no_mask_embed", nn.initializers.normal(1.0), (1, self.embed_dim))

    def embed_boxes(self, boxes: jnp.ndarray) -> jnp.ndarray:
        """boxes: (B, 4) xyxy in input-image pixels -> (B, 2, 256)."""
        coords = boxes.reshape(-1, 2, 2) + 0.5
        coords = coords / self.input_image_size
        corner = self.shared_embedding(coords)       # (B, 2, 256)
        corner = corner.at[:, 0, :].add(self.point_embed[2][0])
        corner = corner.at[:, 1, :].add(self.point_embed[3][0])
        return corner

    def embed_points(self, points: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
        """points: (B, N, 2) pixel coords; labels: (B, N) in {-1, 0, 1}."""
        coords = (points + 0.5) / self.input_image_size
        pe = self.shared_embedding(coords)
        pe = jnp.where(labels[..., None] == -1,
                       self.not_a_point_embed[0], pe)
        pe = jnp.where(labels[..., None] == 0,
                       pe + self.point_embed[1][0], pe)
        pe = jnp.where(labels[..., None] == 1,
                       pe + self.point_embed[0][0], pe)
        return pe

    def dense_no_mask(self, batch: int, gh: int = None,
                      gw: int = None) -> jnp.ndarray:
        e = self.image_embedding_size
        gh = e if gh is None else gh
        gw = e if gw is None else gw
        return jnp.tile(self.no_mask_embed.reshape(1, 1, 1, -1),
                        (batch, gh, gw, 1))

    def image_pe(self, gh: int = None, gw: int = None) -> jnp.ndarray:
        """Image-wide positional grid for the decoder: (1, gh, gw, 256).
        Rect grids (sam_rect) normalize by the SQUARE embedding size, so
        a (gh, gw) grid is exactly the top-left slice of the square PE —
        content tokens keep the coordinates they'd have on the padded
        canvas, matching the box-prompt normalization (/input_image_size)."""
        e = self.image_embedding_size
        gh = e if gh is None else gh
        gw = e if gw is None else gw
        grid = jnp.ones((gh, gw), dtype=jnp.float32)
        y = (jnp.cumsum(grid, axis=0) - 0.5) / e
        x = (jnp.cumsum(grid, axis=1) - 0.5) / e
        return self.shared_embedding(jnp.stack([x, y], axis=-1))[None]

    def __call__(self, boxes: jnp.ndarray):
        """Convenience: box prompts -> (sparse (B,2,256), dense (B,64,64,256))."""
        sparse = self.embed_boxes(boxes)
        dense = self.dense_no_mask(boxes.shape[0])
        return sparse, dense


# ---------------------------------------------------------------------------
# mask decoder
# ---------------------------------------------------------------------------
class DecoderAttention(nn.Module):
    dim: int
    heads: int
    downsample: int = 1

    @nn.compact
    def __call__(self, q, k, v):
        inner = self.dim // self.downsample
        hd = inner // self.heads
        qp = nn.Dense(inner, name="q_proj")(q)
        kp = nn.Dense(inner, name="k_proj")(k)
        vp = nn.Dense(inner, name="v_proj")(v)

        def split(t):
            return t.reshape(t.shape[0], t.shape[1], self.heads, hd
                             ).transpose(0, 2, 1, 3)

        a = jnp.einsum("bhqd,bhkd->bhqk", split(qp), split(kp),
                       preferred_element_type=jnp.float32) / math.sqrt(hd)
        a = jax.nn.softmax(a, axis=-1).astype(q.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", a, split(vp))
        out = out.transpose(0, 2, 1, 3).reshape(q.shape[0], q.shape[1], inner)
        return nn.Dense(self.dim, name="out_proj")(out)


class TwoWayLayer(nn.Module):
    dim: int = 256
    heads: int = 8
    mlp_dim: int = 2048
    skip_first_layer_pe: bool = False

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        if self.skip_first_layer_pe:
            queries = DecoderAttention(self.dim, self.heads, name="self_attn")(
                queries, queries, queries)
        else:
            q = queries + query_pe
            attn = DecoderAttention(self.dim, self.heads, name="self_attn")(
                q, q, queries)
            queries = queries + attn
        queries = nn.LayerNorm(epsilon=1e-6, name="ln1")(queries)

        q = queries + query_pe
        k = keys + key_pe
        attn = DecoderAttention(self.dim, self.heads, 2,
                                name="cross_attn_t2i")(q, k, keys)
        queries = queries + attn
        queries = nn.LayerNorm(epsilon=1e-6, name="ln2")(queries)

        mlp = TwoWayMlp(self.mlp_dim, self.dim, name="mlp")(queries)
        queries = queries + mlp
        queries = nn.LayerNorm(epsilon=1e-6, name="ln3")(queries)

        q = queries + query_pe
        k = keys + key_pe
        attn = DecoderAttention(self.dim, self.heads, 2,
                                name="cross_attn_i2t")(k, q, queries)
        keys = keys + attn
        keys = nn.LayerNorm(epsilon=1e-6, name="ln4")(keys)
        return queries, keys


class ReluFeedForward(nn.Module):
    """SAM's MLP head: proj_in -> relu -> hidden layers -> proj_out."""
    hidden: int
    out: int
    num_layers: int = 3
    sigmoid_output: bool = False

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(self.hidden, name="proj_in")(x))
        for i in range(self.num_layers - 2):
            x = nn.relu(nn.Dense(self.hidden, name=f"layer{i}")(x))
        x = nn.Dense(self.out, name="proj_out")(x)
        if self.sigmoid_output:
            x = nn.sigmoid(x)
        return x


class TwoWayMlp(nn.Module):
    """Decoder transformer MLP: lin1 -> relu -> lin2 (SAM uses ReLU here)."""
    hidden: int
    out: int

    @nn.compact
    def __call__(self, x):
        return nn.Dense(self.out, name="lin2")(
            nn.relu(nn.Dense(self.hidden, name="lin1")(x)))


class SamMaskDecoder(nn.Module):
    dim: int = 256
    depth: int = 2
    heads: int = 8
    mlp_dim: int = 2048
    num_multimask: int = 3
    iou_head_depth: int = 3
    iou_head_hidden: int = 256

    @nn.compact
    def __call__(self, image_embeddings, image_pe, sparse_prompt, dense_prompt,
                 multimask_output: bool = False):
        """image_embeddings: (B, 64, 64, 256); sparse_prompt: (B, P, 256);
        dense_prompt: (B, 64, 64, 256).  Returns (masks (B, M, 256, 256),
        iou_pred (B, M))."""
        b = sparse_prompt.shape[0]
        num_mask_tokens = self.num_multimask + 1
        iou_token = self.param("iou_token", nn.initializers.normal(1.0),
                               (1, self.dim))
        mask_tokens = self.param("mask_tokens", nn.initializers.normal(1.0),
                                 (num_mask_tokens, self.dim))
        output_tokens = jnp.concatenate([iou_token, mask_tokens], axis=0)
        tokens = jnp.concatenate(
            [jnp.tile(output_tokens[None], (b, 1, 1)), sparse_prompt], axis=1)

        src = image_embeddings + dense_prompt
        h, w = src.shape[1], src.shape[2]
        src = src.reshape(b, h * w, self.dim)
        pos = jnp.tile(image_pe.reshape(1, h * w, self.dim), (b, 1, 1))

        queries, keys = tokens, src
        for i in range(self.depth):
            queries, keys = TwoWayLayer(
                self.dim, self.heads, self.mlp_dim,
                skip_first_layer_pe=(i == 0), name=f"layer{i}")(
                    queries, keys, tokens, pos)
        q = queries + tokens
        k = keys + pos
        attn = DecoderAttention(self.dim, self.heads, 2,
                                name="final_attn")(q, k, keys)
        queries = queries + attn
        queries = nn.LayerNorm(epsilon=1e-6, name="ln_final")(queries)

        iou_out = queries[:, 0]
        mask_out = queries[:, 1:1 + num_mask_tokens]

        src = keys.reshape(b, h, w, self.dim)
        # upscaling: ConvT(256->64, k2 s2) -> LN2d -> GELU -> ConvT(64->32) -> GELU
        up1 = self.param("upscale_conv1",
                         nn.initializers.lecun_normal(),
                         (self.dim, self.dim // 4, 2, 2))
        up1_b = self.param("upscale_conv1_bias", nn.initializers.zeros,
                           (self.dim // 4,))
        up2 = self.param("upscale_conv2",
                         nn.initializers.lecun_normal(),
                         (self.dim // 4, self.dim // 8, 2, 2))
        up2_b = self.param("upscale_conv2_bias", nn.initializers.zeros,
                           (self.dim // 8,))

        def conv_t2x(x, wgt, bias):
            # ConvTranspose2d(k=2, s=2) == per-pixel 2x2 expansion (exact)
            out = jnp.einsum("bhwc,cokl->bhkwlo", x, wgt)
            bb, hh, _, ww, _, oo = out.shape
            return out.reshape(bb, hh * 2, ww * 2, oo) + bias

        u = conv_t2x(src, up1, up1_b)
        u = LayerNorm2d(name="upscale_ln")(u)
        u = nn.gelu(u, approximate=False)
        u = conv_t2x(u, up2, up2_b)
        u = nn.gelu(u, approximate=False)             # (B, 256, 256, 32)

        hyper = jnp.stack([
            ReluFeedForward(self.dim, self.dim // 8, name=f"hyper{i}")(
                mask_out[:, i]) for i in range(num_mask_tokens)], axis=1)
        masks = jnp.einsum("bmc,bhwc->bmhw", hyper, u)
        iou_pred = ReluFeedForward(self.iou_head_hidden, num_mask_tokens,
                                   self.iou_head_depth, name="iou_head")(iou_out)
        if multimask_output:
            return masks[:, 1:], iou_pred[:, 1:]
        return masks[:, :1], iou_pred[:, :1]


# ---------------------------------------------------------------------------
# full model
# ---------------------------------------------------------------------------
# Encoder geometry per SAM variant.  The reference's registry loads
# vit_h / vit_l / vit_b by checkpoint name
# (services/sam3-pipeline/app/main.py:51-72); these are the canonical
# ``segment_anything`` build_sam geometries (prompt encoder / mask
# decoder are identical across variants).
SAM_VARIANTS: Dict[str, Dict[str, Any]] = {
    "vit_b": dict(encoder_dim=768, encoder_depth=12, encoder_heads=12,
                  global_attn_indexes=(2, 5, 8, 11)),
    "vit_l": dict(encoder_dim=1024, encoder_depth=24, encoder_heads=16,
                  global_attn_indexes=(5, 11, 17, 23)),
    "vit_h": dict(encoder_dim=1280, encoder_depth=32, encoder_heads=16,
                  global_attn_indexes=(7, 15, 23, 31)),
}


def infer_variant(encoder_dim: int) -> str:
    """Checkpoint geometry -> variant name (dims are unique per variant);
    analog of the reference's by-checkpoint-name selection (sam3:57-63)."""
    for name, geo in SAM_VARIANTS.items():
        if geo["encoder_dim"] == encoder_dim:
            return name
    raise ValueError(f"no SAM variant has encoder_dim={encoder_dim}")


def build_sam(variant: str = "vit_b", img_size: int = 1024,
              fused_global: Optional[bool] = None,
              encoder_remat: bool = False) -> "Sam":
    """Variant-geometry Sam constructor (config.sam.variant -> module).

    head_dim is 64 for vit_b/vit_l and 80 for vit_h; the Pallas
    attention kernels handle both (window v3 packs hd + 2*win = 108
    lanes at hd=80; global v4 contracts K = hd + G = 144 over two MXU
    tiles — the head-last v3 global kernel requires hd + G <= 128 and
    falls back automatically, see VisionAttention).
    """
    try:
        geo = SAM_VARIANTS[variant]
    except KeyError:
        raise ValueError(
            f"unknown SAM variant {variant!r}; expected one of "
            f"{sorted(SAM_VARIANTS)}") from None
    return Sam(img_size=img_size, fused_global=fused_global,
               encoder_remat=encoder_remat, **geo)


class Sam(nn.Module):
    """Encoder + prompt encoder + decoder.  Apply via sub-methods to avoid
    re-encoding the image per prompt."""
    img_size: int = 1024
    encoder_dim: int = 768
    encoder_depth: int = 12
    encoder_heads: int = 12
    global_attn_indexes: Sequence[int] = (2, 5, 8, 11)
    window_size: int = 14
    fused_global: Optional[bool] = None
    encoder_remat: bool = False      # per-layer activation checkpointing

    def setup(self):
        self.vision_encoder = SamVisionEncoder(
            img_size=self.img_size, dim=self.encoder_dim,
            depth=self.encoder_depth, heads=self.encoder_heads,
            global_attn_indexes=self.global_attn_indexes,
            window_size=self.window_size, fused_global=self.fused_global,
            remat=self.encoder_remat)
        self.prompt_encoder = SamPromptEncoder(
            input_image_size=self.img_size,
            image_embedding_size=self.img_size // 16)
        self.mask_decoder = SamMaskDecoder()

    def encode(self, images, content_rows: int = 0):
        return self.vision_encoder(images, content_rows)

    def decode_boxes(self, image_embeddings, boxes, multimask_output=False):
        gh, gw = image_embeddings.shape[1], image_embeddings.shape[2]
        sparse = self.prompt_encoder.embed_boxes(boxes)
        dense = self.prompt_encoder.dense_no_mask(boxes.shape[0], gh, gw)
        image_pe = self.prompt_encoder.image_pe(gh, gw)
        return self.mask_decoder(image_embeddings, image_pe, sparse, dense,
                                 multimask_output)

    def __call__(self, images, boxes):
        emb = self.encode(images)
        return self.decode_boxes(emb, boxes)


def postprocess_mask(low_res_mask: jnp.ndarray, ratio: float,
                     orig_hw: Tuple[int, int],
                     img_size: int = 1024) -> jnp.ndarray:
    """(256, 256) logits -> boolean mask at original resolution, replicating
    the reference predictor's unpad+resize path."""
    up = jax.image.resize(low_res_mask, (img_size, img_size), "linear")
    new_h = int(round(orig_hw[0] * ratio))
    new_w = int(round(orig_hw[1] * ratio))
    up = up[:new_h, :new_w]
    out = jax.image.resize(up, orig_hw, "linear")
    return out > 0.0


# ---------------------------------------------------------------------------
# torch (HF SamModel) -> flax conversion
# ---------------------------------------------------------------------------
def _lin(sd, prefix):
    return {"kernel": np.asarray(sd[prefix + ".weight"]).T,
            "bias": np.asarray(sd[prefix + ".bias"])}


def _ln(sd, prefix):
    return {"scale": np.asarray(sd[prefix + ".weight"]),
            "bias": np.asarray(sd[prefix + ".bias"])}


def _ln2d(sd, prefix):
    return {"weight": np.asarray(sd[prefix + ".weight"]),
            "bias": np.asarray(sd[prefix + ".bias"])}


def _attn(sd, prefix):
    return {"q_proj": _lin(sd, prefix + ".q_proj"),
            "k_proj": _lin(sd, prefix + ".k_proj"),
            "v_proj": _lin(sd, prefix + ".v_proj"),
            "out_proj": _lin(sd, prefix + ".out_proj")}


def _ffn(sd, prefix, num_layers=3):
    out = {"proj_in": _lin(sd, prefix + ".proj_in"),
           "proj_out": _lin(sd, prefix + ".proj_out")}
    for i in range(num_layers - 2):
        out[f"layer{i}"] = _lin(sd, f"{prefix}.layers.{i}")
    return out


def sa_to_hf_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Rename an original ``segment-anything`` checkpoint (the
    ``sam_vit_{b,l,h}_*.pth`` files the reference registry loads,
    services/sam3-pipeline/app/main.py:51-72) into the HF ``SamModel``
    key naming that :func:`convert_hf_state_dict` reads.

    Tensor VALUES are identical between the two layouts (HF's SamModel
    was converted from these checkpoints) — this is purely a key rename,
    so a dropped reference checkpoint converts without the
    segment-anything package installed.
    """
    import re
    rules = [
        (r"^image_encoder\.patch_embed\.proj\.",
         "vision_encoder.patch_embed.projection."),
        (r"^image_encoder\.blocks\.(\d+)\.norm1\.",
         r"vision_encoder.layers.\1.layer_norm1."),
        (r"^image_encoder\.blocks\.(\d+)\.norm2\.",
         r"vision_encoder.layers.\1.layer_norm2."),
        (r"^image_encoder\.blocks\.(\d+)\.", r"vision_encoder.layers.\1."),
        (r"^image_encoder\.neck\.0\.", "vision_encoder.neck.conv1."),
        (r"^image_encoder\.neck\.1\.", "vision_encoder.neck.layer_norm1."),
        (r"^image_encoder\.neck\.2\.", "vision_encoder.neck.conv2."),
        (r"^image_encoder\.neck\.3\.", "vision_encoder.neck.layer_norm2."),
        (r"^image_encoder\.", "vision_encoder."),
        (r"^prompt_encoder\.pe_layer\.positional_encoding_gaussian_matrix$",
         "prompt_encoder.shared_embedding.positional_embedding"),
        (r"^prompt_encoder\.point_embeddings\.",
         "prompt_encoder.point_embed."),
        # mask_downscaling is unused on the box-prompt path but mapped so
        # a torch-side SamModel.load_state_dict can be key-complete
        (r"^prompt_encoder\.mask_downscaling\.0\.",
         "prompt_encoder.mask_embed.conv1."),
        (r"^prompt_encoder\.mask_downscaling\.1\.",
         "prompt_encoder.mask_embed.layer_norm1."),
        (r"^prompt_encoder\.mask_downscaling\.3\.",
         "prompt_encoder.mask_embed.conv2."),
        (r"^prompt_encoder\.mask_downscaling\.4\.",
         "prompt_encoder.mask_embed.layer_norm2."),
        (r"^prompt_encoder\.mask_downscaling\.6\.",
         "prompt_encoder.mask_embed.conv3."),
        (r"^mask_decoder\.transformer\.norm_final_attn\.",
         "mask_decoder.transformer.layer_norm_final_attn."),
        (r"^mask_decoder\.transformer\.layers\.(\d+)\.norm([1-4])\.",
         r"mask_decoder.transformer.layers.\1.layer_norm\2."),
        (r"^mask_decoder\.output_upscaling\.0\.",
         "mask_decoder.upscale_conv1."),
        (r"^mask_decoder\.output_upscaling\.1\.",
         "mask_decoder.upscale_layer_norm."),
        (r"^mask_decoder\.output_upscaling\.3\.",
         "mask_decoder.upscale_conv2."),
        # 3-layer MLPs: SA uses layers.{0,1,2}; HF names them
        # proj_in / layers.0 / proj_out
        (r"^(mask_decoder\.(?:output_hypernetworks_mlps\.\d+|"
         r"iou_prediction_head))\.layers\.0\.", r"\1.proj_in."),
        (r"^(mask_decoder\.(?:output_hypernetworks_mlps\.\d+|"
         r"iou_prediction_head))\.layers\.1\.", r"\1.layers.0."),
        (r"^(mask_decoder\.(?:output_hypernetworks_mlps\.\d+|"
         r"iou_prediction_head))\.layers\.2\.", r"\1.proj_out."),
    ]
    out: Dict[str, Any] = {}
    for k, v in sd.items():
        nk = k
        for pat, rep in rules:
            nk2 = re.sub(pat, rep, nk)
            if nk2 != nk:
                nk = nk2
                break
        out[nk] = v
    return out


def detect_sam_layout(sd: Dict[str, Any]) -> str:
    """'hf' (transformers SamModel), 'sa' (original segment-anything),
    or raises for anything else."""
    if any(k.startswith("vision_encoder.") for k in sd):
        return "hf"
    if any(k.startswith("image_encoder.") for k in sd):
        return "sa"
    raise ValueError("state dict is neither HF SamModel nor "
                     "segment-anything layout")


def convert_sa_state_dict(sd: Dict[str, Any],
                          depth: Optional[int] = None,
                          decoder_depth: int = 2) -> Dict:
    """Convert an original segment-anything checkpoint (key rename +
    :func:`convert_hf_state_dict`)."""
    return convert_hf_state_dict(sa_to_hf_state_dict(sd), depth=depth,
                                 decoder_depth=decoder_depth)


def convert_hf_state_dict(sd: Dict[str, Any], depth: Optional[int] = None,
                          decoder_depth: int = 2) -> Dict:
    """Map ``SamModel.state_dict()`` to this module tree's params.

    ``depth`` defaults to the number of encoder layers present in the
    state dict, so vit_b/l/h checkpoints (12/24/32 layers,
    SAM_VARIANTS) all convert without a geometry argument — matching
    the reference's by-checkpoint-name variant selection
    (services/sam3-pipeline/app/main.py:51-72).
    """
    sd = {k: v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
          for k, v in sd.items()}
    if depth is None:
        depth = 1 + max(
            int(k.split(".")[2]) for k in sd
            if k.startswith("vision_encoder.layers."))
    ve: Dict[str, Any] = {
        "patch_embed": {
            "kernel": np.transpose(
                sd["vision_encoder.patch_embed.projection.weight"],
                (2, 3, 1, 0)),
            "bias": sd["vision_encoder.patch_embed.projection.bias"],
        },
        "pos_embed": sd["vision_encoder.pos_embed"],
        "neck_conv1": {"kernel": np.transpose(
            sd["vision_encoder.neck.conv1.weight"], (2, 3, 1, 0))},
        "neck_ln1": _ln2d(sd, "vision_encoder.neck.layer_norm1"),
        "neck_conv2": {"kernel": np.transpose(
            sd["vision_encoder.neck.conv2.weight"], (2, 3, 1, 0))},
        "neck_ln2": _ln2d(sd, "vision_encoder.neck.layer_norm2"),
    }
    for i in range(depth):
        t = f"vision_encoder.layers.{i}"
        ve[f"layer{i}"] = {
            "ln1": _ln(sd, f"{t}.layer_norm1"),
            "ln2": _ln(sd, f"{t}.layer_norm2"),
            "attn": {
                "qkv": _lin(sd, f"{t}.attn.qkv"),
                "proj": _lin(sd, f"{t}.attn.proj"),
                "rel_pos_h": sd[f"{t}.attn.rel_pos_h"],
                "rel_pos_w": sd[f"{t}.attn.rel_pos_w"],
            },
            "mlp": {"lin1": _lin(sd, f"{t}.mlp.lin1"),
                    "lin2": _lin(sd, f"{t}.mlp.lin2")},
        }

    pe: Dict[str, Any] = {
        "shared_embedding": {"positional_embedding":
                             sd["prompt_encoder.shared_embedding.positional_embedding"]},
        "not_a_point_embed": sd["prompt_encoder.not_a_point_embed.weight"],
        "no_mask_embed": sd["prompt_encoder.no_mask_embed.weight"],
    }
    for i in range(4):
        pe[f"point_embed_{i}"] = sd[f"prompt_encoder.point_embed.{i}.weight"]

    md: Dict[str, Any] = {
        "iou_token": sd["mask_decoder.iou_token.weight"],
        "mask_tokens": sd["mask_decoder.mask_tokens.weight"],
        "ln_final": _ln(sd, "mask_decoder.transformer.layer_norm_final_attn"),
        "final_attn": _attn(sd, "mask_decoder.transformer.final_attn_token_to_image"),
        # torch ConvTranspose2d weight (in, out, kh, kw) -> ours (in, out, kh, kw)
        "upscale_conv1": sd["mask_decoder.upscale_conv1.weight"],
        "upscale_conv1_bias": sd["mask_decoder.upscale_conv1.bias"],
        "upscale_conv2": sd["mask_decoder.upscale_conv2.weight"],
        "upscale_conv2_bias": sd["mask_decoder.upscale_conv2.bias"],
        "upscale_ln": _ln2d(sd, "mask_decoder.upscale_layer_norm"),
        "iou_head": _ffn(sd, "mask_decoder.iou_prediction_head"),
    }
    for i in range(4):
        md[f"hyper{i}"] = _ffn(sd, f"mask_decoder.output_hypernetworks_mlps.{i}")
    for i in range(decoder_depth):
        t = f"mask_decoder.transformer.layers.{i}"
        md[f"layer{i}"] = {
            "self_attn": _attn(sd, f"{t}.self_attn"),
            "cross_attn_t2i": _attn(sd, f"{t}.cross_attn_token_to_image"),
            "cross_attn_i2t": _attn(sd, f"{t}.cross_attn_image_to_token"),
            "ln1": _ln(sd, f"{t}.layer_norm1"),
            "ln2": _ln(sd, f"{t}.layer_norm2"),
            "ln3": _ln(sd, f"{t}.layer_norm3"),
            "ln4": _ln(sd, f"{t}.layer_norm4"),
            "mlp": {"lin1": _lin(sd, f"{t}.mlp.lin1"),
                    "lin2": _lin(sd, f"{t}.mlp.lin2")},
        }
    return {"params": {"vision_encoder": ve, "prompt_encoder": pe,
                       "mask_decoder": md}}
