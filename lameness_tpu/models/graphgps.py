"""EnhancedGraphGPS lameness head in flax — dense, masked, jittable.

Capability-parity rebuild of the reference EnhancedGraphGPS
(``gnn-pipeline/app/main.py:835-1002``): input projection reserving PE
channels, learned Laplacian + random-walk PEs (gnn:227-380), GatedGCN local
message passing with edge-feature gating (gnn:419-496), 8-head global
attention (gnn:499-561), GPS layers with the reference's exact residual
wiring (gnn:603-623), SAGPool hierarchical pooling + multi-scale readout
(gnn:630-738), and the attention-weighted prediction head (gnn:745-832).

TPU-native differences: the graph is a dense padded (N, N) adjacency with
node/edge masks (graphs are ≤ ~100 nodes, SURVEY.md §7 step 8); sparse
scatter becomes masked matmuls on the MXU; SAGPool keeps static shapes by
masking instead of physically shrinking; MC-dropout is a vmapped batched
forward.  BatchNorms run in inference mode with stored running stats.
"""
from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

NEG_INF = -1e30


class InferenceBN(nn.Module):
    """BatchNorm1d at eval time: running stats stored as params."""
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mean = self.param("mean", nn.initializers.zeros, (c,))
        var = self.param("var", nn.initializers.ones, (c,))
        return (x - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias


class PETransform(nn.Module):
    """Linear -> ReLU -> Linear -> LN over raw PE columns (gnn:242-247)."""
    hidden_dim: int

    @nn.compact
    def __call__(self, pe_raw):
        h = nn.Dense(self.hidden_dim * 2, name="fc1")(pe_raw)
        h = nn.relu(h)
        h = nn.Dense(self.hidden_dim, name="fc2")(h)
        return nn.LayerNorm(name="ln")(h)


class EdgeEncoder(nn.Module):
    """(N, N, 3) raw edge attrs -> (N, N, D) (gnn:387-412)."""
    hidden_dim: int

    @nn.compact
    def __call__(self, edge_attr):
        h = nn.Dense(self.hidden_dim // 2, name="fc1")(edge_attr)
        h = nn.relu(h)
        h = nn.Dense(self.hidden_dim, name="fc2")(h)
        return nn.LayerNorm(name="ln")(h)


class GatedGCN(nn.Module):
    """Dense masked GatedGCN with edge gating + edge update (gnn:419-496).

    sigma_ij = sigmoid(C·e_ij + D·x_dst + E·x_src); messages mean-aggregated
    over incoming edges; edge features updated via [Dx_dst, Ex_src, Ce] MLP.
    Edge layout: edge axis order is (src, dst) i.e. e[i, j] = edge i -> j.
    """
    out_dim: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, edge_feat, edge_mask, node_mask,
                 deterministic=True):
        ax = nn.Dense(self.out_dim, name="A")(x)
        bx = nn.Dense(self.out_dim, name="B")(x)
        dx = nn.Dense(self.out_dim, name="D")(x)
        ex = nn.Dense(self.out_dim, name="E")(x)
        ce = nn.Dense(self.out_dim, name="C")(edge_feat)

        # per-edge gate: (N_src, N_dst, D)
        gate = nn.sigmoid(ce + dx[None, :, :] + ex[:, None, :])
        em = edge_mask[..., None].astype(x.dtype)
        msg = gate * bx[:, None, :] * em           # message src -> dst
        agg = msg.sum(axis=0)                       # (N_dst, D)
        deg = jnp.maximum(edge_mask.sum(axis=0), 1)[:, None].astype(x.dtype)
        agg = agg / deg

        h = ax + agg
        h = InferenceBN(name="bn_node")(h)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)

        edge_in = jnp.concatenate(
            [jnp.broadcast_to(dx[None, :, :], gate.shape),
             jnp.broadcast_to(ex[:, None, :], gate.shape), ce], axis=-1)
        e_new = nn.Dense(self.out_dim, name="edge_fc1")(edge_in)
        e_new = nn.relu(e_new)
        e_new = nn.Dense(self.out_dim, name="edge_fc2")(e_new)
        e_new = InferenceBN(name="bn_edge")(e_new)
        e_new = e_new * em
        return h * node_mask[:, None], e_new


class GlobalAttention(nn.Module):
    """Masked 8-head self-attention with post-norm residual (gnn:499-561)."""
    hidden_dim: int
    heads: int = 8
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, node_mask, deterministic=True):
        hd = self.hidden_dim // self.heads
        qkv = nn.DenseGeneral((3, self.heads, hd), name="qkv")(x)
        q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]
        s = jnp.einsum("qhd,khd->hqk", q, k) / jnp.sqrt(float(hd))
        s = jnp.where(node_mask[None, None, :], s, NEG_INF)
        p = jax.nn.softmax(s, axis=-1)
        p = nn.Dropout(self.dropout)(p, deterministic=deterministic)
        out = jnp.einsum("hqk,khd->qhd", p, v)
        out = nn.DenseGeneral(self.hidden_dim, axis=(-2, -1), name="out")(out)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return nn.LayerNorm(name="norm")(x + out) * node_mask[:, None]


class GPSLayer(nn.Module):
    """Local GatedGCN + global attention + FFN with the reference's residual
    pattern (gnn:603-623)."""
    hidden_dim: int
    heads: int = 8
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, edge_feat, edge_mask, node_mask,
                 deterministic=True):
        xn = nn.LayerNorm(name="norm1")(x)
        h_local, e_new = GatedGCN(self.hidden_dim, self.dropout,
                                  name="local")(xn, edge_feat, edge_mask,
                                                node_mask, deterministic)
        x = x + h_local
        xn = nn.LayerNorm(name="norm2")(x)
        h_global = GlobalAttention(self.hidden_dim, self.heads, self.dropout,
                                   name="global")(xn, node_mask, deterministic)
        x = x + (h_global - xn)        # reference's residual form (gnn:617)
        xn = nn.LayerNorm(name="norm3")(x)
        h = nn.Dense(self.hidden_dim * 4, name="ffn1")(xn)
        h = nn.gelu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.hidden_dim, name="ffn2")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return (x + h) * node_mask[:, None], e_new


class SAGPool(nn.Module):
    """Dense SAGPooling: GraphConv node scores, keep top-`ratio` of valid
    nodes, multiply kept features by tanh(score) (gnn:630-677).  Static
    shapes: "pooling" returns an updated node mask + gated features.
    """
    hidden_dim: int
    ratio: float = 0.5

    @nn.compact
    def __call__(self, x, edge_mask, node_mask):
        # GraphConv score: W1 x + sum_{j->i} W2 x_j
        s_self = nn.Dense(1, name="w_self")(x)
        s_nbr = nn.Dense(1, name="w_nbr", use_bias=False)(x)
        em = edge_mask.astype(x.dtype)
        agg = em.T @ s_nbr                      # sum over incoming src
        score = (s_self + agg).squeeze(-1)
        score = jnp.where(node_mask, score, NEG_INF)

        n_valid = node_mask.sum()
        n_keep = jnp.ceil(self.ratio * n_valid).astype(jnp.int32)
        order = jnp.argsort(-score)
        rank = jnp.argsort(order)               # rank of each node by score
        keep = (rank < n_keep) & node_mask

        gated = x * jnp.tanh(score)[:, None] * keep[:, None]
        h = nn.Dense(self.hidden_dim, name="proj_fc")(gated)
        h = nn.relu(h)
        h = nn.LayerNorm(name="proj_ln")(h) * keep[:, None]
        new_edge_mask = edge_mask & keep[:, None] & keep[None, :]
        return h, new_edge_mask, keep


def masked_mean(x, mask):
    m = mask[:, None].astype(x.dtype)
    return (x * m).sum(axis=0) / jnp.maximum(m.sum(), 1.0)


class MultiScaleReadout(nn.Module):
    """Attention-weighted combination of per-scale mean pools (gnn:680-738)."""
    hidden_dim: int
    num_scales: int = 2

    @nn.compact
    def __call__(self, reps):
        pools = [masked_mean(x, m) for x, m in reps]
        concat = jnp.concatenate(pools, axis=-1)
        w = nn.Dense(self.hidden_dim, name="attn_fc1")(concat)
        w = nn.relu(w)
        w = nn.Dense(self.num_scales, name="attn_fc2")(w)
        w = jax.nn.softmax(w, axis=-1)
        mixed = sum(w[i] * pools[i] for i in range(self.num_scales))
        h = nn.Dense(self.hidden_dim, name="out_fc")(mixed)
        h = nn.relu(h)
        return nn.LayerNorm(name="out_ln")(h)


class PredictionHead(nn.Module):
    """Attention-weighted + mean pooling head (gnn:745-832)."""
    hidden_dim: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, node_mask, deterministic=True):
        a = nn.Dense(self.hidden_dim // 2, name="attn_fc1")(x)
        a = jnp.tanh(a)
        a = nn.Dense(1, name="attn_fc2")(a).squeeze(-1)
        a = jnp.where(node_mask, a, NEG_INF)
        attn = jax.nn.softmax(a, axis=0)
        weighted_pool = (x * attn[:, None]).sum(axis=0)
        mean_pool = masked_mean(x, node_mask)
        g = jnp.concatenate([mean_pool, weighted_pool], axis=-1)
        h = nn.Dense(self.hidden_dim, name="cls_fc1")(g)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.hidden_dim // 2, name="cls_fc2")(h)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        graph_pred = nn.sigmoid(nn.Dense(1, name="cls_fc3")(h))
        n = nn.Dense(self.hidden_dim // 2, name="node_fc1")(x)
        n = nn.relu(n)
        n = nn.Dropout(self.dropout)(n, deterministic=deterministic)
        node_pred = nn.sigmoid(nn.Dense(1, name="node_fc2")(n))
        return {"graph_pred": graph_pred, "node_pred": node_pred,
                "attention_weights": attn}


class EnhancedGraphGPS(nn.Module):
    input_dim: int = 50
    hidden_dim: int = 128
    num_layers: int = 4
    heads: int = 8
    dropout: float = 0.1
    pe_dim: int = 16
    pooling_ratio: float = 0.5
    use_hierarchical_pooling: bool = True

    @nn.compact
    def __call__(self, x, lap_pe_raw, rw_pe_raw, edge_attr, edge_mask,
                 node_mask, deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        """x (N, 50); lap_pe_raw (N, 8); rw_pe_raw (N, 16);
        edge_attr (N, N, 3); edge_mask (N, N); node_mask (N,)."""
        pe_total = self.pe_dim * 2
        h = nn.Dense(self.hidden_dim - pe_total, name="input_proj")(x)
        lap = PETransform(self.pe_dim, name="lap_pe")(jnp.abs(lap_pe_raw))
        rw = PETransform(self.pe_dim, name="rw_pe")(rw_pe_raw)
        pe = jnp.concatenate([lap, rw], axis=-1)
        h = jnp.concatenate([h, pe], axis=-1) * node_mask[:, None]

        e = EdgeEncoder(self.hidden_dim, name="edge_encoder")(edge_attr)
        e = e * edge_mask[..., None]

        n_pre = self.num_layers // 2 if self.use_hierarchical_pooling \
            else self.num_layers
        for i in range(n_pre):
            h, e = GPSLayer(self.hidden_dim, self.heads, self.dropout,
                            name=f"pre{i}")(h, e, edge_mask, node_mask,
                                            deterministic)
        reps = [(h, node_mask)]

        if self.use_hierarchical_pooling:
            hp, em_p, keep = SAGPool(self.hidden_dim, self.pooling_ratio,
                                     name="pool")(h, edge_mask, node_mask)
            ep = e * em_p[..., None]
            for i in range(self.num_layers - n_pre):
                hp, ep = GPSLayer(self.hidden_dim, self.heads, self.dropout,
                                  name=f"post{i}")(hp, ep, em_p, keep,
                                                   deterministic)
            reps.append((hp, keep))
            # reference only pools graphs with > 3 nodes (gnn:935)
            use_pool = node_mask.sum() > 3
            readout_pooled = MultiScaleReadout(
                self.hidden_dim, 2, name="ms_readout")(reps)
        else:
            use_pool = False
            readout_pooled = None

        h = nn.LayerNorm(name="final_norm")(h) * node_mask[:, None]
        out = PredictionHead(self.hidden_dim, self.dropout,
                             name="pred_head")(h, node_mask, deterministic)
        if readout_pooled is not None:
            out["multi_scale_repr"] = jnp.where(use_pool, readout_pooled,
                                                jnp.zeros_like(readout_pooled))
        return out
