"""First-party Qdrant REST wire: server/client round trip over a real
socket, parity vs the in-process store, and the Re-ID flow end-to-end."""
import numpy as np
import pytest

from lameness_tpu.io.qdrant_wire import QdrantRestServer, QdrantRestStore
from lameness_tpu.io.vecstore import VectorStore, make_store


@pytest.fixture()
def server():
    srv = QdrantRestServer()
    srv.start()
    yield srv
    srv.stop()


def test_round_trip_over_socket(server, rng):
    cl = QdrantRestStore(f"http://127.0.0.1:{server.port}")
    assert cl.ping()
    cl.create_collection("emb", 8)
    assert cl.has_collection("emb")
    assert "emb" in cl.collection_names()
    v1 = rng.standard_normal(8)
    cl.upsert("emb", "vid-1", v1, payload={"video_id": "vid-1"})
    cl.upsert("emb", "vid-2", rng.standard_normal(8), payload={"k": 2})
    assert cl.count("emb") == 2
    p = cl.retrieve("emb", "vid-1")
    assert p is not None and p.payload == {"video_id": "vid-1"}
    # vectors come back normalised (store semantics)
    np.testing.assert_allclose(np.linalg.norm(p.vector), 1.0, atol=1e-5)
    hits = cl.search("emb", v1, top_k=2)
    assert hits[0].id == "vid-1" and hits[0].score > 0.999
    cl.set_payload("emb", "vid-1", {"label": "lame"})
    assert cl.retrieve("emb", "vid-1").payload["label"] == "lame"
    # unknown collection/point behave like the local store
    assert cl.retrieve("nope", "x") is None
    assert not cl.has_collection("nope")
    assert cl.count("nope") == 0


def test_parity_with_local_store(server, rng):
    """Identical operations through the socket and in-process give
    identical search results (ids, order, scores)."""
    cl = QdrantRestStore(f"http://127.0.0.1:{server.port}")
    local = VectorStore()
    for s in (cl, local):
        s.create_collection("c", 16)
    for i in range(20):
        v = rng.standard_normal(16)
        for s in (cl, local):
            s.upsert("c", f"p{i}", v, payload={"i": i})
    q = rng.standard_normal(16)
    remote_hits = cl.search("c", q, top_k=7)
    local_hits = local.search("c", q, top_k=7)
    assert [h.id for h in remote_hits] == [h.id for h in local_hits]
    np.testing.assert_allclose([h.score for h in remote_hits],
                               [h.score for h in local_hits], atol=1e-6)


def test_make_store_selects_backend(server, tmp_path):
    remote = make_store(url=f"http://127.0.0.1:{server.port}")
    assert isinstance(remote, QdrantRestStore)
    # unreachable url degrades to the local store
    local = make_store(url="http://127.0.0.1:1",
                       persist_path=tmp_path / "v.json")
    assert isinstance(local, VectorStore)


def test_reid_flow_over_socket(server, rng):
    """CowReIDMatcher runs unchanged against the wire store: create two
    identities, then a near-duplicate embedding matches the right cow."""
    from lameness_tpu.track.reid import CowReIDMatcher
    cl = QdrantRestStore(f"http://127.0.0.1:{server.port}")
    m = CowReIDMatcher(cl, embedding_dim=32)
    e1 = rng.standard_normal(32)
    e2 = rng.standard_normal(32)
    m1 = m.match_or_create(e1, "v1", track_id=1)
    m2 = m.match_or_create(e2, "v2", track_id=2)
    assert m1.is_new_identity and m2.is_new_identity
    assert m1.identity_id != m2.identity_id
    assert m1.cow_id.startswith("COW-")
    noisy = e1 / np.linalg.norm(e1) + 0.01 * rng.standard_normal(32)
    m3 = m.match_or_create(noisy, "v3", track_id=3)
    assert not m3.is_new_identity
    assert m3.identity_id == m1.identity_id and m3.similarity > 0.9


def test_ping_rejects_non_qdrant_http(server, tmp_path):
    """A generic HTTP service answering 404s must NOT pass ping —
    make_store would otherwise keep a remote store whose every upsert
    silently no-ops."""
    from lameness_tpu.io.db import Database
    from lameness_tpu.io.bus import MessageBus
    from lameness_tpu.serve.api import AdminContext, make_server
    from lameness_tpu.core.config import Config
    cfg = Config.load(data_root=str(tmp_path / "d"))
    cfg.dirs.ensure()
    admin = make_server(AdminContext(cfg, Database(tmp_path / "a.db"),
                                     MessageBus()))
    admin.start()
    try:
        not_qdrant = QdrantRestStore(f"http://127.0.0.1:{admin.port}")
        assert not not_qdrant.ping()
        real = QdrantRestStore(f"http://127.0.0.1:{server.port}")
        assert real.ping()
        assert isinstance(make_store(
            url=f"http://127.0.0.1:{admin.port}"), VectorStore)
    finally:
        admin.stop()


def test_export_collection_over_wire(server, rng):
    """Scroll-backed bulk read matches the local store (feeds the
    similarity-map PCA when the remote store is configured)."""
    cl = QdrantRestStore(f"http://127.0.0.1:{server.port}")
    local = VectorStore()
    for s in (cl, local):
        s.create_collection("e", 8)
    for i in range(300):           # > one scroll page
        v = rng.standard_normal(8)
        for s in (cl, local):
            s.upsert("e", f"p{i}", v, payload={"i": i})
    remote = cl.export_collection("e")
    ref = local.export_collection("e")
    assert remote["ids"] == ref["ids"]
    np.testing.assert_allclose(remote["vectors"], ref["vectors"], atol=1e-6)
    assert remote["payloads"]["p7"] == {"i": 7}
    assert cl.export_collection("missing") is None
