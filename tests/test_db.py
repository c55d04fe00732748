"""Relational store: schema contract + domain helpers."""
import pytest

from lameness_tpu.io.db import Database, TABLES


@pytest.fixture()
def db(tmp_path):
    return Database(tmp_path / "test.db")


def test_all_reference_tables_exist(db):
    names = {r["name"] for r in db.query(
        "SELECT name FROM sqlite_master WHERE type='table'")}
    for t in TABLES:
        assert t in names, t
    assert len(TABLES) == 14


def test_user_role_constraint(db):
    db.insert("users", {"email": "a@b.c", "username": "a",
                        "password_hash": "x", "role": "admin"})
    with pytest.raises(Exception):
        db.insert("users", {"email": "b@b.c", "username": "b",
                            "password_hash": "x", "role": "superuser"})


def test_heartbeat_upsert(db):
    db.upsert_heartbeat("yolo-pipeline", "healthy", active_jobs=2)
    db.upsert_heartbeat("yolo-pipeline", "degraded", error_count=1)
    rows = db.query("SELECT * FROM service_heartbeats")
    assert len(rows) == 1
    assert rows[0]["status"] == "degraded"
    assert rows[0]["error_count"] == 1


def test_elo_lifecycle(db):
    r = db.get_or_create_elo("v1")
    assert r["elo_rating"] == 1500.0 and r["elo_uncertainty"] == 350.0
    db.update_elo("v1", 1516.0, 343.0, "win")
    r2 = db.get_or_create_elo("v1")
    assert r2["wins"] == 1 and r2["total_comparisons"] == 1
    assert r2["elo_rating"] == 1516.0
    hist = db.query("SELECT * FROM elo_history WHERE video_id='v1'")
    assert len(hist) == 1 and hist[0]["elo_rating"] == 1516.0


def test_cow_registry_and_lameness_records(db):
    db.record_sighting("COW-0001", "v1", 0, 0.9, 0, 100, 0.85)
    db.record_sighting("COW-0001", "v2", 0, 0.92, 5, 80, 0.8)
    cow = db.one("SELECT * FROM cow_identities WHERE cow_id='COW-0001'")
    assert cow["total_sightings"] == 2
    tracks = db.query("SELECT * FROM track_history")
    assert len(tracks) == 2

    rid = db.add_lameness_record("COW-0001", "v1", {
        "final_probability": 0.82, "final_prediction": 1, "confidence": 0.7,
    }, {"tcn": {"probability": 0.8}, "ml": {"probability": 0.85}})
    assert rid is not None
    hist = db.lameness_history("COW-0001")
    assert len(hist) == 1
    assert hist[0]["severity_level"] == "severe"
    assert hist[0]["tcn_score"] == 0.8
    assert hist[0]["is_lame"] == 1
    # unknown cow -> no record (matches fusion:345-347 behavior)
    assert db.add_lameness_record("COW-9999", "v1", {}, {}) is None


def test_pairwise_comparison_constraints(db):
    db.insert("pairwise_comparisons", {"video_id_1": "a", "video_id_2": "b",
                                       "winner": 1, "degree": 2})
    with pytest.raises(Exception):
        db.insert("pairwise_comparisons",
                  {"video_id_1": "a", "video_id_2": "b", "winner": 5})


def test_threaded_access(db):
    import threading
    errs = []

    def work(i):
        try:
            db.insert("elo_history", {"video_id": f"v{i}",
                                      "elo_rating": 1500.0,
                                      "comparison_count": i,
                                      "recorded_at": "now"})
        except Exception as e:
            errs.append(e)

    threads = [threading.Thread(target=work, args=(i,)) for i in range(16)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    assert len(db.query("SELECT * FROM elo_history")) == 16
