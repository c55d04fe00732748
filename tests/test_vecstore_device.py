"""Device top-k path of the vector store agrees with the host path."""
import numpy as np

from lameness_tpu.io.vecstore import VectorStore


def _fill(store, n=100, d=32, seed=0):
    rng = np.random.default_rng(seed)
    store.create_collection("c", d)
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    for i in range(n):
        store.upsert("c", f"p{i}", vecs[i], {"i": i})
    return vecs, rng


def test_device_topk_matches_host():
    store = VectorStore()
    vecs, rng = _fill(store)
    for _ in range(5):
        q = rng.standard_normal(32).astype(np.float32)
        host = store.search("c", q, top_k=7)
        dev = store.search("c", q, top_k=7, use_device=True)
        assert [p.id for p in host] == [p.id for p in dev]
        np.testing.assert_allclose([p.score for p in host],
                                   [p.score for p in dev], rtol=1e-5,
                                   atol=1e-6)
        assert dev[0].payload == host[0].payload


def test_device_topk_k_larger_than_collection():
    store = VectorStore()
    store.create_collection("c", 8)
    for i in range(3):
        v = np.zeros(8, np.float32)
        v[i] = 1.0
        store.upsert("c", f"p{i}", v, {})
    out = store.search("c", np.ones(8, np.float32), top_k=10,
                       use_device=True)
    assert len(out) == 3


def test_device_topk_nonpow2_padding_excluded():
    """Padded rows (zero vectors) must never appear in results."""
    store = VectorStore()
    _fill(store, n=13, d=16, seed=1)
    q = np.ones(16, np.float32)
    out = store.search("c", q, top_k=13, use_device=True)
    assert len(out) == 13
    assert {p.id for p in out} == {f"p{i}" for i in range(13)}
