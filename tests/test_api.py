"""Admin REST API over a live stdlib server: auth, routers, WS broadcast."""
import json
import socket
import threading

import numpy as np
import pytest

try:
    import httpx
except ImportError:  # pragma: no cover
    httpx = None

from lameness_tpu.core.config import Subjects
from lameness_tpu.io.bus import MessageBus
from lameness_tpu.io.db import Database
from lameness_tpu.io.vecstore import VectorStore
from lameness_tpu.serve.api import AdminContext, make_server
from lameness_tpu.serve.http import hash_password, verify_password, TokenCodec

pytestmark = pytest.mark.skipif(httpx is None, reason="httpx unavailable")


@pytest.fixture()
def server(tmp_data_root, tmp_path):
    cfg = tmp_data_root
    db = Database(tmp_path / "api.db")
    bus = MessageBus()
    from lameness_tpu.hitl.reliability import RaterReliabilityService
    rel = RaterReliabilityService(cfg.dirs.rater_reliability, bus=bus,
                                  subjects=Subjects())
    ctx = AdminContext(cfg, db, bus, reliability=rel,
                       store=VectorStore())
    ctx.seed_users(password="testpw")
    srv = make_server(ctx)
    port = srv.start()
    yield f"http://127.0.0.1:{port}", ctx
    srv.stop()


def _login(base, username="admin", password="testpw"):
    r = httpx.post(f"{base}/api/auth/login",
                   json={"username": username, "password": password})
    assert r.status_code == 200, r.text
    return r.json()["access_token"]


def _auth(token):
    return {"Authorization": f"Bearer {token}"}


def test_password_and_token_primitives():
    h = hash_password("secret")
    assert verify_password("secret", h)
    assert not verify_password("wrong", h)
    tc = TokenCodec()
    tok = tc.encode({"sub": "u1", "role": "admin"})
    assert tc.decode(tok)["sub"] == "u1"
    assert tc.decode(tok + "x") is None
    assert TokenCodec().decode(tok) is None       # different secret


def test_register_is_rater_only(server):
    """Self-registration must not mint privileged accounts (ADVICE r1 high;
    reference routers/auth.py allows only 'rater')."""
    base, ctx = server
    r = httpx.post(f"{base}/api/auth/register",
                   json={"email": "evil@x", "username": "evil",
                         "password": "pw", "role": "admin"})
    assert r.status_code == 403
    r = httpx.post(f"{base}/api/auth/register",
                   json={"email": "ok@x", "username": "ok", "password": "pw"})
    assert r.status_code == 200 and r.json()["role"] == "rater"
    # role escalation only via the admin-only PATCH route
    tok = _login(base)
    r = httpx.patch(f"{base}/api/auth/users/{r.json()['id']}",
                    json={"role": "researcher"}, headers=_auth(tok))
    assert r.status_code == 200


def test_seed_users_random_passwords(tmp_data_root, tmp_path, capsys):
    """Without an explicit password, seeded accounts get random printed
    passwords — no 'admin123' defaults (ADVICE r1 low)."""
    db = Database(tmp_path / "seed.db")
    ctx = AdminContext(tmp_data_root, db, MessageBus(),
                       store=VectorStore())
    ctx.seed_users()
    printed = capsys.readouterr().out
    assert "initial password" in printed and "admin123" not in printed
    admin = db.one("SELECT * FROM users WHERE username='admin'")
    assert not verify_password("admin123", admin["password_hash"])


def test_literal_routes_beat_parameterized(server):
    """/api/analysis/similarity/map must not be swallowed by
    /api/analysis/{video_id}/{pipeline} (router precedence regression)."""
    base, ctx = server
    tok = _login(base)
    r = httpx.get(f"{base}/api/analysis/similarity/map", headers=_auth(tok))
    assert "unknown pipeline" not in r.text
    assert r.status_code in (200, 404, 503)


def test_auth_flow(server):
    base, ctx = server
    token = _login(base)
    me = httpx.get(f"{base}/api/auth/me", headers=_auth(token)).json()
    assert me["username"] == "admin" and me["role"] == "admin"
    # bad credentials
    r = httpx.post(f"{base}/api/auth/login",
                   json={"username": "admin", "password": "nope"})
    assert r.status_code == 401
    # role gating: rater cannot start training
    rater_tok = _login(base, "rater", "testpw")
    r = httpx.post(f"{base}/api/training/start/ml",
                   headers=_auth(rater_tok))
    assert r.status_code == 403
    # admin can
    r = httpx.post(f"{base}/api/training/start/ml", headers=_auth(token))
    assert r.status_code == 200
    assert ctx.bus.messages_on("training.ml.requested")


def test_video_upload_and_label(server):
    base, ctx = server
    token = _login(base)
    r = httpx.post(f"{base}/api/videos/upload?filename=test.mp4",
                   content=b"fakevideo")
    assert r.status_code == 200
    vid = r.json()["video_id"]
    listing = httpx.get(f"{base}/api/videos").json()
    assert listing["total"] >= 1           # reference envelope
    assert any(v["id"] == vid and v["video_id"] == vid
               for v in listing["videos"])
    r = httpx.post(f"{base}/api/videos/{vid}/label",
                   json={"label": 1}, headers=_auth(token))
    assert r.status_code == 200
    row = httpx.get(f"{base}/api/videos/{vid}").json()
    assert row["label"] == 1
    assert (ctx.dirs.training / "labels" / f"{vid}_label.json").exists()
    # invalid label rejected
    r = httpx.post(f"{base}/api/videos/{vid}/label",
                   json={"label": 7}, headers=_auth(token))
    assert r.status_code == 422


def test_elo_comparison_and_hierarchy(server):
    base, ctx = server
    token = _login(base)
    for v1, v2, w in (("a", "b", 1), ("b", "c", 1), ("a", "c", 1),
                      ("a", "b", 1)):
        r = httpx.post(f"{base}/api/elo/comparison",
                       json={"video_id_1": v1, "video_id_2": v2,
                             "winner": w, "degree": 2},
                       headers=_auth(token))
        assert r.status_code == 200, r.text
    h = httpx.get(f"{base}/api/elo/hierarchy").json()
    ranking = {row["video_id"]: row["rank"] for row in h["ranking"]}
    assert ranking["a"] < ranking["b"] < ranking["c"]
    assert h["total_comparisons"] == 4
    stats = httpx.get(f"{base}/api/elo/stats").json()
    assert stats["total_videos"] == 3
    hist = httpx.get(f"{base}/api/elo/history/a").json()
    assert len(hist) == 3
    # snapshot + recalculate round-trips
    r = httpx.post(f"{base}/api/elo/snapshot", json={"name": "s1"},
                   headers=_auth(token))
    assert r.status_code == 200
    r = httpx.post(f"{base}/api/elo/recalculate", headers=_auth(token))
    assert r.json()["recalculated"] == 4


def test_pipeline_heartbeat_and_health(server):
    base, ctx = server
    r = httpx.post(f"{base}/api/pipeline/heartbeat",
                   json={"service_name": "engine", "status": "healthy",
                         "active_jobs": 1})
    assert r.status_code == 200
    status = httpx.get(f"{base}/api/pipeline/status").json()
    assert status[0]["service_name"] == "engine"
    overview = httpx.get(f"{base}/api/health/overview").json()
    assert overview["disk"]["status"] in ("healthy", "warning", "critical")
    assert overview["services"]["engine"] == "healthy"
    tp = httpx.get(f"{base}/api/health/throughput").json()
    assert "videos_per_hour" in tp


def test_ml_config_roundtrip(server):
    base, ctx = server
    token = _login(base, "researcher", "testpw")
    cfg = httpx.get(f"{base}/api/ml-config").json()
    # reference default: ml_config.py CatBoostConfig iterations=100
    assert cfg["config"]["catboost"]["n_estimators"] == 100
    assert "catboost.n_estimators" in cfg["schema"]
    r = httpx.put(f"{base}/api/ml-config",
                  json={"catboost": {"n_estimators": 300}},
                  headers=_auth(token))
    assert r.status_code == 200
    cfg2 = httpx.get(f"{base}/api/ml-config").json()
    assert cfg2["config"]["catboost"]["n_estimators"] == 300
    r = httpx.put(f"{base}/api/ml-config", json={"bogus": {}},
                  headers=_auth(token))
    assert r.status_code == 422


def test_analysis_and_cows_endpoints(server):
    base, ctx = server
    from lameness_tpu.io import schemas
    schemas.write_result(ctx.dirs.results_for("tcn") / "vidX_tcn.json",
                         {"video_id": "vidX", "severity_score": 0.8})
    r = httpx.get(f"{base}/api/analysis/vidX/tcn").json()
    assert r["severity_score"] == 0.8
    allr = httpx.get(f"{base}/api/analysis/vidX").json()
    assert "tcn" in allr
    assert httpx.get(f"{base}/api/analysis/nothere").status_code == 404

    ctx.db.record_sighting("COW-0001", "vidX", 0, 0.9, 0, 50, 0.8)
    cows = httpx.get(f"{base}/api/cows").json()
    assert cows["cows"][0]["cow_id"] == "COW-0001"   # reference envelope
    detail = httpx.get(f"{base}/api/cows/COW-0001").json()
    assert detail["total_sightings"] == 1
    token = _login(base)
    r = httpx.patch(f"{base}/api/cows/COW-0001",
                    json={"tag_number": "T42"}, headers=_auth(token))
    assert r.json()["tag_number"] == "T42"
    summary = httpx.get(f"{base}/api/cows/summary/stats").json()
    assert summary["total_cows"] == 1


def test_tutorial_gold_tasks(server):
    base, ctx = server
    token = _login(base, "researcher", "testpw")
    r = httpx.post(f"{base}/api/tutorial/tasks",
                   json={"video_id_1": "a", "video_id_2": "b",
                         "correct_winner": 1, "is_tutorial": True,
                         "hint": "look at the back arch"},
                   headers=_auth(token))
    assert r.status_code == 200
    tasks = httpx.get(f"{base}/api/tutorial/tasks").json()["tasks"]
    assert len(tasks) == 1 and tasks[0]["hint"] == "look at the back arch"
    tid = tasks[0]["id"]
    httpx.delete(f"{base}/api/tutorial/tasks/{tid}", headers=_auth(token))
    assert httpx.get(f"{base}/api/tutorial/tasks").json()["tasks"] == []


def test_websocket_broadcast(server):
    base, ctx = server
    import base64 as b64
    host, port = base.replace("http://", "").split(":")
    s = socket.create_connection((host, int(port)))
    key = b64.b64encode(b"0123456789abcdef").decode()
    s.sendall((f"GET /api/ws/pipeline HTTP/1.1\r\nHost: {host}\r\n"
               f"Upgrade: websocket\r\nConnection: Upgrade\r\n"
               f"Sec-WebSocket-Key: {key}\r\n"
               f"Sec-WebSocket-Version: 13\r\n\r\n").encode())
    resp = s.recv(1024).decode()
    assert "101" in resp.split("\r\n")[0]
    import time
    deadline = time.time() + 2
    while ctx.ws.connection_count("pipeline") == 0 and time.time() < deadline:
        time.sleep(0.02)
    n = ctx.ws.broadcast("pipeline", {"type": "test", "x": 1})
    assert n == 1
    frame = s.recv(1024)
    assert frame[0] == 0x81                      # text frame
    payload = frame[2:2 + (frame[1] & 0x7F)]
    assert json.loads(payload) == {"type": "test", "x": 1}
    s.close()


def _ws_connect(base: str, channel: str) -> socket.socket:
    import base64 as b64
    host, port = base.replace("http://", "").split(":")
    s = socket.create_connection((host, int(port)))
    key = b64.b64encode(b"0123456789abcdef").decode()
    s.sendall((f"GET /api/ws/{channel} HTTP/1.1\r\nHost: {host}\r\n"
               f"Upgrade: websocket\r\nConnection: Upgrade\r\n"
               f"Sec-WebSocket-Key: {key}\r\n"
               f"Sec-WebSocket-Version: 13\r\n\r\n").encode())
    assert "101" in s.recv(1024).decode().split("\r\n")[0]
    return s


def _ws_read_text(s: socket.socket) -> str:
    def exact(n):
        data = b""
        while len(data) < n:
            chunk = s.recv(n - len(data))
            assert chunk, "socket closed mid-frame"
            data += chunk
        return data
    head = exact(2)
    assert head[0] == 0x81
    n = head[1] & 0x7F
    if n == 126:                       # extended 16-bit length
        n = int.from_bytes(exact(2), "big")
    elif n == 127:
        n = int.from_bytes(exact(8), "big")
    return exact(n).decode()


def _ws_send_text(s: socket.socket, text: str) -> None:
    """One masked client text frame (servers require masking)."""
    data = text.encode()
    mask = b"\x01\x02\x03\x04"
    s.sendall(bytes([0x81, 0x80 | len(data)]) + mask +
              bytes(b ^ mask[i % 4] for i, b in enumerate(data)))


def _ws_wait(ctx, channel: str) -> None:
    import time
    deadline = time.time() + 2
    while ctx.ws.connection_count(channel) == 0 and time.time() < deadline:
        time.sleep(0.02)


def test_ws_ping_pong_reference_convention(server):
    """Bare-text ping -> bare-text pong, exactly the reference's
    keepalive (websocket/handler.py:197-199) — NOT a JSON envelope."""
    base, ctx = server
    s = _ws_connect(base, "pipeline")
    _ws_wait(ctx, "pipeline")
    _ws_send_text(s, "ping")
    assert _ws_read_text(s) == "pong"
    s.close()


def test_ws_heartbeat_pushes_reference_pipeline_status_shape(server):
    """POST /api/pipeline/heartbeat must push the reference's
    pipeline_status message (handler.py:133-138 via pipeline.py:454-458):
    type/service/status/details{active_jobs}."""
    base, ctx = server
    s = _ws_connect(base, "pipeline")
    _ws_wait(ctx, "pipeline")
    httpx.post(f"{base}/api/pipeline/heartbeat",
               json={"service_name": "engine", "status": "healthy",
                     "active_jobs": 3})
    msg = json.loads(_ws_read_text(s))
    assert msg == {"type": "pipeline_status", "service": "engine",
                   "status": "healthy", "details": {"active_jobs": 3}}
    s.close()


def test_ws_comparison_pushes_reference_rater_update_shape(server):
    """Elo comparison submission pushes the reference's rater_update
    message (handler.py:162-168): type/event/data."""
    base, ctx = server
    token = _login(base)
    va = httpx.post(f"{base}/api/videos/upload?filename=wa.mp4",
                    content=b"\x00" * 16).json()["video_id"]
    vb = httpx.post(f"{base}/api/videos/upload?filename=wb.mp4",
                    content=b"\x00" * 16).json()["video_id"]
    s = _ws_connect(base, "rater")
    _ws_wait(ctx, "rater")
    httpx.post(f"{base}/api/elo/comparison", headers=_auth(token),
               json={"video_id_1": va, "video_id_2": vb,
                     "winner": 1, "degree": 2})
    msg = json.loads(_ws_read_text(s))
    assert msg["type"] == "rater_update"
    assert msg["event"] == "comparison"
    assert msg["data"]["video_id_1"] == va
    assert msg["data"]["rater"] == "admin"
    s.close()


def test_unknown_route_404(server):
    base, _ = server
    assert httpx.get(f"{base}/api/nope").status_code == 404
    assert httpx.get(f"{base}/health").json()["status"] == "healthy"


def test_ws_recv_survives_short_reads():
    """TCP can deliver a WS frame one byte at a time (proxies, slow
    links); every fixed-size field must be read with an exact loop."""
    import threading
    import time as _t
    from lameness_tpu.serve.http import ws_recv

    a, b = socket.socketpair()
    payload = json.dumps({"channel": "pipeline", "n": 7}).encode()
    mask = bytes([1, 2, 3, 4])
    masked = bytes(c ^ mask[i % 4] for i, c in enumerate(payload))
    frame = bytes([0x81, 0x80 | len(payload)]) + mask + masked

    def drip():
        for byte in frame:
            a.sendall(bytes([byte]))
            _t.sleep(0.002)
    t = threading.Thread(target=drip)
    t.start()
    out = ws_recv(b)
    t.join()
    assert out is not None and json.loads(out) == {"channel": "pipeline",
                                                   "n": 7}
    # EOF mid-frame -> clean None, not an exception
    a2, b2 = socket.socketpair()
    a2.sendall(frame[:3])
    a2.close()
    assert ws_recv(b2) is None
    for s in (a, b, b2):
        s.close()
