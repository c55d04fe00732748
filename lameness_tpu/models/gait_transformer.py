"""Gait Transformer lameness head in flax.

Capability-parity rebuild of the reference GaitTransformer
(``services/transformer-pipeline/app/main.py:24-237``): input projection →
sinusoidal positional encoding → 4 pre-norm encoder layers (d=64, 4 heads,
ffn 256) → masked mean pool → sigmoid head.  Low-confidence frames are
key-padding-masked (conf < 0.3, transformer:370) and the final layer's
head-averaged attention, column-summed, is the temporal saliency surfaced
in the result JSON (transformer:437-441).

MC-dropout runs as one vmapped batched forward
(see ``tcn.predict_with_uncertainty`` — shared helper).
"""
from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def sinusoidal_pe(max_len: int, d_model: int) -> np.ndarray:
    pe = np.zeros((max_len, d_model), np.float32)
    pos = np.arange(max_len, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float32)
                 * (-math.log(10000.0) / d_model))
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe


class MHA(nn.Module):
    """Self-attention that also returns head-averaged attention probs."""
    d_model: int
    heads: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, key_padding_mask=None, deterministic=True):
        hd = self.d_model // self.heads
        qkv = nn.DenseGeneral((3, self.heads, hd), name="qkv")(x)
        q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(hd)
        if key_padding_mask is not None:
            s = jnp.where(key_padding_mask[:, None, None, :], -1e30, s)
        p = jax.nn.softmax(s, axis=-1)
        p_drop = nn.Dropout(self.dropout)(p, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", p_drop, v)
        out = nn.DenseGeneral(self.d_model, axis=(-2, -1), name="out")(out)
        return out, p.mean(axis=1)               # (B, T, d), (B, T, T)


class EncoderLayer(nn.Module):
    d_model: int = 64
    heads: int = 4
    ffn_dim: int = 256
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, key_padding_mask=None, deterministic=True):
        h = nn.LayerNorm(name="norm1")(x)
        attn_out, attn_probs = MHA(self.d_model, self.heads, self.dropout,
                                   name="mha")(h, key_padding_mask,
                                               deterministic)
        x = x + nn.Dropout(self.dropout)(attn_out, deterministic=deterministic)
        h = nn.LayerNorm(name="norm2")(x)
        h = nn.Dense(self.ffn_dim, name="ffn1")(h)
        h = nn.gelu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.d_model, name="ffn2")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return x + h, attn_probs


class GaitTransformer(nn.Module):
    input_dim: int = 44
    d_model: int = 64
    heads: int = 4
    num_layers: int = 4
    ffn_dim: int = 256
    dropout: float = 0.1
    max_seq_len: int = 150

    @nn.compact
    def __call__(self, x, key_padding_mask=None, deterministic=True):
        """x: (B, T, F); key_padding_mask: (B, T) True = masked.
        Returns dict(probability (B, 1), pooled (B, d), saliency (B, T))."""
        b, t, _ = x.shape
        x = nn.Dense(self.d_model, name="input_projection")(x)
        pe = jnp.asarray(sinusoidal_pe(self.max_seq_len, self.d_model))
        x = x + pe[None, :t, :]
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        last_attn = None
        for i in range(self.num_layers):
            x, attn = EncoderLayer(self.d_model, self.heads, self.ffn_dim,
                                   self.dropout, name=f"layer{i}")(
                x, key_padding_mask, deterministic)
            last_attn = attn
        x = nn.LayerNorm(name="final_norm")(x)
        if key_padding_mask is not None:
            keep = (~key_padding_mask)[..., None].astype(x.dtype)
            pooled = (x * keep).sum(axis=1) / jnp.maximum(keep.sum(axis=1), 1.0)
        else:
            pooled = x.mean(axis=1)
        h = nn.relu(nn.Dense(32, name="fc1")(pooled))
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        prob = nn.sigmoid(nn.Dense(1, name="fc2")(h))
        # temporal saliency: attention received per timestep (column sums)
        saliency = last_attn.sum(axis=1)
        return {"probability": prob, "pooled": pooled, "saliency": saliency}
