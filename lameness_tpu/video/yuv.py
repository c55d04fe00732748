"""YUV420 (I420) transfer format: halve host→HBM bytes for frame ingest.

Source videos are stored yuv420p (the reference re-encodes every upload
with ``-pix_fmt yuv420p``, services/video-preprocessing; our encoder in
``video/decode.py`` does the same), so 4:2:0 chroma is what the decoder
natively produces — shipping RGB to the device carries 3 bytes/pixel of
which half the chroma information is interpolated.  On bandwidth-limited
links (the axon tunnel moves ~30-50 MB/s; host→HBM dominates end-to-end
clip latency) shipping the I420 planes instead (1.5 bytes/pixel) halves
the transfer, and the device rebuilds RGB with one tiny fused elementwise
program (~0.2 ms at 720p on v5e — HBM-bandwidth-bound, negligible).

Layout: standard I420 in a single (..., H*3//2, W) uint8 plane —
Y rows [0, H), then U (H/2 × W/2) packed two chroma rows per buffer row
in [H, H+H/4), then V likewise in [H+H/4, H*3/2).

Conversion is ITU-R BT.601 limited-range (the matrix cv2/swscale use for
4:2:0 video) with nearest-neighbour chroma upsampling; the device result
matches ``cv2.cvtColor(..., COLOR_YUV2RGB_I420)`` within ±2 LSB
(fixed-point vs float rounding — tests/test_yuv.py pins the bound).
Host-authoritative outputs keep using decoder RGB; the device path is a
transfer format, not a contract change, and ``LAMENESS_YUV_INGEST=0``
kills it.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

__all__ = ["rgb_to_i420", "i420_to_rgb_device", "i420_shape",
           "pack_i420_flat", "i420_flat_to_rgb_device",
           "pack_i420_rows", "i420_rows_to_rgb_device"]


def i420_shape(h: int, w: int) -> tuple:
    assert h % 2 == 0 and w % 2 == 0, f"I420 needs even dims, got {h}x{w}"
    return (h * 3 // 2, w)


def rgb_to_i420(frames: np.ndarray) -> np.ndarray:
    """Host-side (..., H, W, 3) uint8 RGB → (..., H*3//2, W) uint8 I420.

    Uses cv2's SIMD converter per frame (~1-2 ms at 720p); in the serving
    path this replaces ~2 bytes/pixel of tunnel transfer per converted
    byte, so it pays for itself ~500× over on a 40 MB/s link.
    """
    import cv2
    frames = np.asarray(frames)
    h, w = frames.shape[-3], frames.shape[-2]
    lead = frames.shape[:-3]
    flat = frames.reshape((-1, h, w, 3))
    out = np.empty((flat.shape[0],) + i420_shape(h, w), np.uint8)
    for i in range(flat.shape[0]):
        out[i] = cv2.cvtColor(flat[i], cv2.COLOR_RGB2YUV_I420)
    return out.reshape(lead + i420_shape(h, w))


def pack_i420_flat(tree):
    """Host-side: I420 array (or dict of them, e.g. split-ingest hi/lo)
    → one contiguous 1-D uint8 buffer + a static layout.

    The tunnel's effective host→device rate depends on transfer SIZE:
    a single 64 MB put reaches ~90 MB/s while the split dict's two
    ~35 MB puts reach only ~50 MB/s (ld_put_idle vs ld_link,
    docs/PROBES_r03.json) — per-transfer setup/flow-control dominates
    below ~64 MB.  Packing the whole batch into ONE buffer restores
    the link rate; the device unpacks with free static slices inside
    the same fused I420→RGB program (``i420_flat_to_rgb_device``).

    Returns (flat, layout); layout is hashable and keys the jitted
    device-side unpacker.  A bare array gets the sentinel key "".
    """
    if not isinstance(tree, dict):
        arr = np.ascontiguousarray(tree)
        return arr.reshape(-1), (("", arr.shape),)
    keys = sorted(tree)
    layout = tuple((k, tuple(tree[k].shape)) for k in keys)
    flat = np.concatenate(
        [np.ascontiguousarray(tree[k]).reshape(-1) for k in keys])
    return flat, layout


def i420_flat_to_rgb_device(flat: jnp.ndarray, layout) -> jnp.ndarray:
    """Traceable: flat uint8 buffer from ``pack_i420_flat`` → RGB tree.

    layout must be static (close over it before jitting).  Slicing a
    1-D buffer at static offsets is free for XLA; the conversion fuses
    into one elementwise program per entry.
    """
    out = {}
    off = 0
    for k, shape in layout:
        n = int(np.prod(shape))
        out[k] = i420_to_rgb_device(flat[off:off + n].reshape(shape))
        off += n
    if len(layout) == 1 and layout[0][0] == "":
        return out[""]
    return out


def pack_i420_rows(tree):
    """Batch-major sibling of ``pack_i420_flat`` for SHARDED (multi-chip)
    ingest: I420 array/dict with (B, T, H*3//2, W) leaves → one
    (B, row_bytes) uint8 buffer where row b carries ALL of clip b's
    bytes (every leaf's, in sorted-key order).

    ``jax.device_put`` with a batch NamedSharding then delivers each
    chip exactly its own clips' bytes over its own host link — no
    cross-chip redistribution of ingest data — and the device unpacker
    (``i420_rows_to_rgb_device``) slices columns per leaf, so the batch
    axis stays sharded end-to-end.  Returns (rows, layout); layout is
    hashable and keys the jitted unpacker.
    """
    if not isinstance(tree, dict):
        tree = {"": np.asarray(tree)}
    keys = sorted(tree)
    b = next(iter(tree.values())).shape[0]
    layout = tuple((k, tuple(tree[k].shape)) for k in keys)
    rows = np.concatenate(
        [np.ascontiguousarray(tree[k]).reshape(b, -1) for k in keys],
        axis=1)
    return rows, layout


def i420_rows_to_rgb_device(rows: jnp.ndarray, layout):
    """Traceable inverse of ``pack_i420_rows``: (B, row_bytes) → RGB tree.

    Static column slices + the fused BT.601 conversion; every reshape
    keeps the (sharded) batch axis leading, so XLA partitions the whole
    program over the data axis with zero collectives.
    """
    out = {}
    off = 0
    for k, shape in layout:
        n = int(np.prod(shape[1:]))
        out[k] = i420_to_rgb_device(
            rows[:, off:off + n].reshape((rows.shape[0],) + shape[1:]))
        off += n
    if len(layout) == 1 and layout[0][0] == "":
        return out[""]
    return out


def i420_to_rgb_device(yuv: jnp.ndarray) -> jnp.ndarray:
    """Traceable (..., H*3//2, W) uint8 I420 → (..., H, W, 3) uint8 RGB.

    BT.601 limited-range in f32; XLA fuses the whole thing into one
    elementwise program over the output.  Chroma is upsampled by
    replication (what cv2's I420 converter does).
    """
    h15, w = yuv.shape[-2], yuv.shape[-1]
    h = h15 * 2 // 3
    lead = yuv.shape[:-2]
    y = yuv[..., :h, :].astype(jnp.float32)
    # U then V planes as a flat byte stream after the Y rows (the planes
    # do NOT align to W-wide buffer rows when H/2 is odd)
    chroma = yuv[..., h:, :].reshape(lead + (h * w // 2,))
    u = chroma[..., : h * w // 4].reshape(lead + (h // 2, w // 2))
    v = chroma[..., h * w // 4:].reshape(lead + (h // 2, w // 2))
    # nearest ×2 upsample on both axes
    u = jnp.repeat(jnp.repeat(u, 2, axis=-2), 2, axis=-1).astype(jnp.float32)
    v = jnp.repeat(jnp.repeat(v, 2, axis=-2), 2, axis=-1).astype(jnp.float32)
    c = 1.164383 * (y - 16.0)
    d = u - 128.0
    e = v - 128.0
    r = c + 1.596027 * e
    g = c - 0.391762 * d - 0.812968 * e
    b = c + 2.017232 * d
    rgb = jnp.stack([r, g, b], axis=-1)
    return jnp.clip(jnp.round(rgb), 0.0, 255.0).astype(jnp.uint8)
