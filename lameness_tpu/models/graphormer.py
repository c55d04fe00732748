"""CowLamenessGraphormer in flax — dense, masked, jittable.

Capability-parity rebuild of the reference Graphormer
(``graph-transformer-pipeline/app/model/``): input projection →
centrality (degree-embedding) + temporal (sinusoidal days) node encodings
(encodings.py:18-80, 178-235) → 6 pre-LN layers of graph-biased MHA
(attention.py:14-145) with SPD-bucket + edge-MLP attention biases
(encodings.py:83-175, 238-300) and a per-layer virtual-node attention pass
(attention.py:147-231) → mean/virtual/attention-pool readout
(layers.py:206-285) → sigmoid graph and node heads (graphormer.py:108-126).

TPU-native: all-pairs shortest paths come in as a precomputed dense (N, N)
bucket matrix (min-plus product, graph/build.py) instead of a NetworkX BFS
loop; padded nodes are key-masked; MC-dropout is one vmapped forward.
"""
from __future__ import annotations

import math
from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e30


class BiasedMHA(nn.Module):
    """Multi-head attention with additive (N, N, H) structural bias."""
    hidden_dim: int = 128
    heads: int = 8
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, attention_bias=None, key_padding_mask=None,
                 deterministic=True):
        hd = self.hidden_dim // self.heads
        q = nn.DenseGeneral((self.heads, hd), name="q")(x)
        k = nn.DenseGeneral((self.heads, hd), name="k")(x)
        v = nn.DenseGeneral((self.heads, hd), name="v")(x)
        s = jnp.einsum("qhd,khd->hqk", q, k) * (hd ** -0.5)
        if attention_bias is not None:
            s = s + attention_bias.transpose(2, 0, 1)
        if key_padding_mask is not None:
            s = jnp.where(key_padding_mask[None, None, :], NEG_INF, s)
        p = jax.nn.softmax(s, axis=-1)
        p = nn.Dropout(self.dropout)(p, deterministic=deterministic)
        out = jnp.einsum("hqk,khd->qhd", p, v)
        out = nn.DenseGeneral(self.hidden_dim, axis=(-2, -1), name="out")(out)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out, p


class GraphormerLayer(nn.Module):
    hidden_dim: int = 128
    heads: int = 8
    ffn_dim: int = 512
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, attention_bias, key_padding_mask,
                 deterministic=True):
        h = nn.LayerNorm(name="norm1")(x)
        attn, probs = BiasedMHA(self.hidden_dim, self.heads, self.dropout,
                                name="attn")(h, attention_bias,
                                             key_padding_mask, deterministic)
        x = x + attn
        h = nn.LayerNorm(name="norm2")(x)
        h = nn.Dense(self.ffn_dim, name="ffn1")(h)
        h = nn.gelu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.hidden_dim, name="ffn2")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return x + h, probs


class VirtualNode(nn.Module):
    """Prepends a learnable virtual node, attends over [vn; nodes], and
    updates the virtual node through an MLP (attention.py:147-231)."""
    hidden_dim: int = 128
    heads: int = 8
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, attention_bias, key_padding_mask,
                 deterministic=True):
        n = x.shape[0]
        vn0 = self.param("virtual_node", nn.initializers.normal(0.02),
                         (1, self.hidden_dim))
        x_ext = jnp.concatenate([vn0, x], axis=0)
        if attention_bias is not None:
            ext_bias = jnp.zeros((n + 1, n + 1, attention_bias.shape[-1]),
                                 attention_bias.dtype)
            ext_bias = ext_bias.at[1:, 1:].set(attention_bias)
        else:
            ext_bias = None
        mask_ext = jnp.concatenate(
            [jnp.zeros((1,), bool), key_padding_mask], axis=0)
        out, _ = BiasedMHA(self.hidden_dim, self.heads, self.dropout,
                           name="attn")(x_ext, ext_bias, mask_ext,
                                        deterministic)
        vn_out = out[0:1]
        # Residual on the real nodes — a deliberate fix over the reference,
        # whose VirtualNodeAttention OVERWRITES node features with the
        # attention output (attention.py:216-226).  Non-residual overwrite
        # makes the stack untrainable (signal washes out over 6 layers);
        # the reference never trains this model, so the flaw is latent there.
        x_out = x + out[1:]
        h = nn.Dense(self.hidden_dim * 2, name="vn_fc1")(vn_out)
        h = nn.gelu(h)
        h = nn.Dense(self.hidden_dim, name="vn_fc2")(h)
        vn_out = nn.LayerNorm(name="vn_ln")(h)
        return x_out, vn_out


class Readout(nn.Module):
    """Mean + virtual-node + attention pooling (layers.py:206-285)."""
    hidden_dim: int = 128

    @nn.compact
    def __call__(self, x, vn, node_mask):
        m = node_mask[:, None].astype(x.dtype)
        mean_pool = (x * m).sum(axis=0, keepdims=True) / jnp.maximum(
            m.sum(), 1.0)
        a = nn.Dense(self.hidden_dim // 2, name="attn_fc1")(x)
        a = jnp.tanh(a)
        a = nn.Dense(1, name="attn_fc2")(a)
        a = jnp.where(node_mask[:, None], a, NEG_INF)
        w = jax.nn.softmax(a, axis=0)
        attn_pool = (w * x).sum(axis=0, keepdims=True)
        combined = jnp.concatenate([mean_pool, vn, attn_pool], axis=-1)
        h = nn.Dense(self.hidden_dim, name="combine_fc")(combined)
        h = nn.relu(h)
        return nn.LayerNorm(name="combine_ln")(h)


class CowLamenessGraphormer(nn.Module):
    input_dim: int = 50
    hidden_dim: int = 128
    num_layers: int = 6
    heads: int = 8
    ffn_dim: int = 512
    edge_dim: int = 3
    dropout: float = 0.1
    max_degree: int = 50
    max_spd: int = 10
    max_time_days: float = 365.0

    @nn.compact
    def __call__(self, x, spd, edge_attr, edge_mask, degrees_in, degrees_out,
                 timestamps, node_mask,
                 deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        """x (N, F); spd (N, N) int buckets [0..max_spd+1, -shifted below];
        edge_attr (N, N, 3); edge_mask (N, N); degrees (N,) int;
        timestamps (N,) seconds; node_mask (N,)."""
        n = x.shape[0]
        key_padding = ~node_mask

        # input projection
        h = nn.Dense(self.hidden_dim, name="input_fc")(x)
        h = nn.LayerNorm(name="input_ln")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)

        # centrality encoding (encodings.py:18-80)
        deg_table = self.param("degree_embed", nn.initializers.normal(0.02),
                               (self.max_degree + 1, self.hidden_dim))
        out_table = self.param("out_degree_embed",
                               nn.initializers.normal(0.02),
                               (self.max_degree + 1, self.hidden_dim))
        din = jnp.clip(degrees_in, 0, self.max_degree)
        dout = jnp.clip(degrees_out, 0, self.max_degree)
        centrality = deg_table[din] + out_table[dout]

        # temporal encoding: sinusoidal days from min timestamp
        ts_valid = jnp.where(node_mask, timestamps, jnp.inf)
        t0 = jnp.min(ts_valid)
        t0 = jnp.where(jnp.isfinite(t0), t0, 0.0)
        days = jnp.clip((timestamps - t0) / 86400.0, 0.0, self.max_time_days)
        div = jnp.exp(jnp.arange(0, self.hidden_dim, 2)
                      * (-math.log(10000.0) / self.hidden_dim))
        pe = jnp.zeros((n, self.hidden_dim))
        pe = pe.at[:, 0::2].set(jnp.sin(days[:, None] * div[None, :]))
        pe = pe.at[:, 1::2].set(jnp.cos(days[:, None] * div[None, :]))
        temporal = nn.Dense(self.hidden_dim, name="time_proj")(pe)

        h = (h + centrality + temporal) * node_mask[:, None]

        # attention biases: SPD buckets + edge-feature MLP
        spd_table = self.param("spd_bias", nn.initializers.zeros,
                               (self.max_spd + 2, self.heads))
        spd_shifted = jnp.clip(spd + 1, 0, self.max_spd + 1)
        spatial_bias = spd_table[spd_shifted]            # (N, N, H)
        eb = nn.Dense(self.heads * 2, name="edge_fc1")(edge_attr)
        eb = nn.relu(eb)
        eb = nn.Dense(self.heads, name="edge_fc2")(eb)
        edge_bias = eb * edge_mask[..., None]
        bias = spatial_bias + edge_bias

        attn_probs = None
        vn = jnp.zeros((1, self.hidden_dim))
        for i in range(self.num_layers):
            h, attn_probs = GraphormerLayer(
                self.hidden_dim, self.heads, self.ffn_dim, self.dropout,
                name=f"layer{i}")(h, bias, key_padding, deterministic)
            h, vn = VirtualNode(self.hidden_dim, self.heads, self.dropout,
                                name=f"vnode{i}")(h, bias, key_padding,
                                                  deterministic)
        h = nn.LayerNorm(name="final_norm")(h) * node_mask[:, None]

        graph_repr = Readout(self.hidden_dim, name="readout")(h, vn, node_mask)

        g = nn.Dense(self.hidden_dim // 2, name="head_fc1")(graph_repr)
        g = nn.relu(g)
        g = nn.Dropout(self.dropout)(g, deterministic=deterministic)
        g = nn.Dense(self.hidden_dim // 4, name="head_fc2")(g)
        g = nn.relu(g)
        g = nn.Dropout(self.dropout)(g, deterministic=deterministic)
        graph_pred = nn.sigmoid(nn.Dense(1, name="head_fc3")(g))

        np_ = nn.Dense(self.hidden_dim // 2, name="node_fc1")(h)
        np_ = nn.relu(np_)
        np_ = nn.Dropout(self.dropout)(np_, deterministic=deterministic)
        node_pred = nn.sigmoid(nn.Dense(1, name="node_fc2")(np_))

        return {"graph_pred": graph_pred, "node_pred": node_pred,
                "attention_weights": attn_probs}
