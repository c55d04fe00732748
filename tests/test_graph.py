"""Graph builders + GraphGPS + Graphormer heads."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lameness_tpu.graph import build as gb
from lameness_tpu.models.graphgps import EnhancedGraphGPS
from lameness_tpu.models.graphormer import CowLamenessGraphormer


# ---------------------------------------------------------------- builders --
def test_knn_edges_topk(rng):
    emb = np.eye(6, 8).astype(np.float32)
    emb[5] = emb[0] + 0.01 * rng.standard_normal(8)
    mask = np.ones(6, bool)
    em, w = gb.knn_edges_dense(emb, mask, k=2)
    assert em[0, 5] and em[5, 0]          # near-duplicates are neighbours
    assert em.sum(axis=1).max() <= 2      # top-k out-degree
    assert not em.diagonal().any()


def test_knn_edges_small_n():
    emb = np.random.default_rng(0).standard_normal((2, 4)).astype(np.float32)
    em, _ = gb.knn_edges_dense(emb, np.ones(2, bool), k=5)
    assert em[0, 1] and em[1, 0]          # k shrinks to n-1


def test_temporal_edges_chains():
    cow_ids = ["A", "B", "A", None, "A"]
    ts = [100.0, 50.0, 300.0, 0.0, 200.0]
    em, dt = gb.temporal_edges_dense(cow_ids, ts, np.ones(5, bool))
    # A's chain sorted by ts: 0 (100) -> 4 (200) -> 2 (300)
    assert em[0, 4] and em[4, 0] and em[4, 2] and em[2, 4]
    assert not em[0, 2]                   # non-consecutive not linked
    assert dt[0, 4] == 100.0 and dt[4, 0] == -100.0
    assert not em[1].any()                # B alone, no edges
    assert not em[3].any()                # None cow_id ignored


def test_build_dense_graph_edge_attr_layout(rng):
    feats = rng.standard_normal((4, 5)).astype(np.float32)
    emb = rng.standard_normal((4, 8)).astype(np.float32)
    g = gb.build_dense_graph(feats, emb, cow_ids=["A", "A", "B", "B"],
                             timestamps=[0.0, 86400.0, 0.0, 43200.0],
                             k=2, max_nodes=8)
    assert g["x"].shape == (8, 5) and g["edge_attr"].shape == (8, 8, 3)
    assert g["node_mask"].sum() == 4
    # temporal edge 0->1 has tanh(1 day / 1 day) weight unless kNN overrides
    if not g["edge_attr"][0, 1, 1]:
        assert g["edge_attr"][0, 1, 0] == pytest.approx(np.tanh(1.0), abs=1e-5)
        assert g["edge_attr"][0, 1, 2] == 1.0
    # kNN + temporal indicators are mutually exclusive one-hots
    assert np.all(g["edge_attr"][..., 1] + g["edge_attr"][..., 2] <= 1.0 + 1e-6)
    # no edges touch padded nodes
    assert not g["edge_mask"][4:].any() and not g["edge_mask"][:, 4:].any()


def test_laplacian_pe_matches_reference_math():
    # path graph 0-1-2 (directed both ways)
    em = np.zeros((3, 3), bool)
    em[0, 1] = em[1, 0] = em[1, 2] = em[2, 1] = True
    pe = gb.laplacian_pe(em, np.ones(3, bool), k=2)
    assert pe.shape == (3, 2)
    # verify against direct eigh of normalized laplacian w/ self loops
    a = em.astype(float) + np.eye(3)
    d = a.sum(1)
    lap = np.eye(3) - a / np.sqrt(np.outer(d, d))
    w, v = np.linalg.eigh(lap)
    assert np.allclose(np.abs(pe[:, 0]), np.abs(v[:, 1]), atol=1e-5)


def test_random_walk_pe_probabilities():
    em = np.zeros((2, 2), bool)
    em[0, 1] = em[1, 0] = True
    pe = gb.random_walk_pe(em, np.ones(2, bool), walk_length=3)
    # with self-loops: P = [[.5, .5], [.5, .5]] -> diag(P^k) = 0.5 for all k
    assert np.allclose(pe, 0.5, atol=1e-6)


def test_shortest_path_dense():
    # chain 0-1-2-3, isolated 4
    em = np.zeros((5, 5), bool)
    for a, b in [(0, 1), (1, 2), (2, 3)]:
        em[a, b] = True                   # directed; SPD symmetrises
    mask = np.ones(5, bool)
    spd = gb.shortest_path_dense(em, mask, max_spd=10)
    assert spd[0, 3] == 3 and spd[3, 0] == 3
    assert spd[0, 0] == 0
    assert spd[0, 4] == 11                # unreachable -> max_spd + 1
    # clipping
    em2 = np.zeros((8, 8), bool)
    for i in range(7):
        em2[i, i + 1] = True
    spd2 = gb.shortest_path_dense(em2, np.ones(8, bool), max_spd=3)
    assert spd2[0, 7] == 4                # clipped to max_spd + 1? no: dist 7 > 3
    assert spd2[0, 3] == 3
    assert spd2[0, 2] == 2


def test_degrees():
    em = np.zeros((3, 3), bool)
    em[0, 1] = em[0, 2] = em[1, 2] = True
    din, dout = gb.degrees(em, np.ones(3, bool))
    assert list(dout) == [2, 1, 0]
    assert list(din) == [0, 1, 2]


# --------------------------------------------------------------- GraphGPS ---
@pytest.fixture(scope="module")
def small_graph():
    rng = np.random.default_rng(0)
    n, n_valid = 16, 10
    feats = rng.standard_normal((n_valid, 50)).astype(np.float32)
    emb = rng.standard_normal((n_valid, 32)).astype(np.float32)
    g = gb.build_dense_graph(feats, emb,
                             cow_ids=["A"] * 5 + ["B"] * 5,
                             timestamps=list(range(n_valid)),
                             k=3, max_nodes=n)
    g["lap_pe"] = gb.laplacian_pe(g["edge_mask"], g["node_mask"], 8)
    g["rw_pe"] = gb.random_walk_pe(g["edge_mask"], g["node_mask"], 16)
    g["spd"] = gb.shortest_path_dense(g["edge_mask"], g["node_mask"], 10)
    g["din"], g["dout"] = gb.degrees(g["edge_mask"], g["node_mask"])
    return g


def test_graphgps_forward(small_graph):
    g = small_graph
    m = EnhancedGraphGPS()
    args = (jnp.asarray(g["x"]), jnp.asarray(g["lap_pe"]),
            jnp.asarray(g["rw_pe"]), jnp.asarray(g["edge_attr"]),
            jnp.asarray(g["edge_mask"]), jnp.asarray(g["node_mask"]))
    params = m.init(jax.random.PRNGKey(0), *args)
    out = m.apply(params, *args)
    assert out["graph_pred"].shape == (1,)
    assert out["node_pred"].shape == (16, 1)
    probs = np.asarray(out["node_pred"])
    assert np.all((probs >= 0) & (probs <= 1))
    # attention over padded nodes is zero
    aw = np.asarray(out["attention_weights"])
    assert aw[10:].max() < 1e-6
    assert aw.sum() == pytest.approx(1.0, abs=1e-5)


def test_graphgps_padding_invariance(small_graph):
    """Garbage in padded node slots must not change predictions."""
    g = small_graph
    m = EnhancedGraphGPS()
    args = [jnp.asarray(g[k]) for k in
            ("x", "lap_pe", "rw_pe", "edge_attr", "edge_mask", "node_mask")]
    params = m.init(jax.random.PRNGKey(0), *args)
    out1 = m.apply(params, *args)
    x2 = np.asarray(g["x"]).copy()
    x2[10:] = 1e3
    args2 = list(args)
    args2[0] = jnp.asarray(x2)
    out2 = m.apply(params, *args2)
    np.testing.assert_allclose(np.asarray(out1["graph_pred"]),
                               np.asarray(out2["graph_pred"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out1["node_pred"][:10]),
                               np.asarray(out2["node_pred"][:10]), atol=1e-5)


def test_graphgps_mc_dropout(small_graph):
    from lameness_tpu.models.tcn import mc_dropout
    g = small_graph
    m = EnhancedGraphGPS(dropout=0.3)
    args = [jnp.asarray(g[k]) for k in
            ("x", "lap_pe", "rw_pe", "edge_attr", "edge_mask", "node_mask")]
    params = m.init(jax.random.PRNGKey(0), *args)
    mean, std = mc_dropout(
        lambda k: m.apply(params, *args, deterministic=False,
                          rngs={"dropout": k})["node_pred"],
        jax.random.PRNGKey(1), n_samples=8)
    assert mean.shape == (16, 1)
    assert float(np.asarray(std)[:10].mean()) > 0


# -------------------------------------------------------------- Graphormer --
def test_graphormer_forward(small_graph):
    g = small_graph
    m = CowLamenessGraphormer()
    args = (jnp.asarray(g["x"]), jnp.asarray(g["spd"]),
            jnp.asarray(g["edge_attr"]), jnp.asarray(g["edge_mask"]),
            jnp.asarray(g["din"]), jnp.asarray(g["dout"]),
            jnp.asarray(g["timestamps"]), jnp.asarray(g["node_mask"]))
    params = m.init(jax.random.PRNGKey(0), *args)
    out = m.apply(params, *args)
    assert out["graph_pred"].shape == (1, 1)
    assert out["node_pred"].shape == (16, 1)
    assert out["attention_weights"].shape == (8, 16, 16)
    # padded keys receive no attention
    aw = np.asarray(out["attention_weights"])
    assert aw[:, :10, 10:].max() < 1e-6


def test_graphormer_padding_invariance(small_graph):
    g = small_graph
    m = CowLamenessGraphormer()
    args = [jnp.asarray(g[k]) for k in
            ("x", "spd", "edge_attr", "edge_mask", "din", "dout",
             "timestamps", "node_mask")]
    params = m.init(jax.random.PRNGKey(0), *args)
    out1 = m.apply(params, *args)
    x2 = np.asarray(g["x"]).copy()
    x2[10:] = -1e3
    args2 = list(args)
    args2[0] = jnp.asarray(x2)
    out2 = m.apply(params, *args2)
    np.testing.assert_allclose(np.asarray(out1["graph_pred"]),
                               np.asarray(out2["graph_pred"]), atol=1e-5)
