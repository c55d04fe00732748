"""Postgres driver-swap validation for the Database facade.

The reference runs async Postgres
(admin-interface/backend/app/database.py:43-335); our ``io/db.py``
renders the same 14-table contract in portable SQL and claims a
Postgres deployment is "a driver swap on this facade".  These tests
make that claim falsifiable without a Postgres server in the image:

* ``FakePostgresDriver`` is a DB-API driver with psycopg's paramstyle
  (``format``/``%s``) and tuple rows that REJECTS sqlite-only syntax
  (PRAGMA, AUTOINCREMENT, INSERT OR REPLACE, sqlite date functions)
  and any un-rewritten ``?`` placeholder, then executes on an
  in-memory sqlite engine.  Running the full facade through it proves
  the placeholder rewriting, reflection switch, schema bootstrap, and
  tuple-row handling all work against Postgres driver semantics.
* Every SQL literal in the serve layer (``serve/api.py``,
  ``serve/app.py``) is AST-extracted and (a) linted against the
  portable subset, (b) prepared against the real schema — so a
  sqlite-ism sneaking into a router query fails CI, not the deploy.
"""
import ast
import re
import sqlite3
from pathlib import Path

import pytest

from lameness_tpu.io import db as dbmod
from lameness_tpu.io.db import _SCHEMA, TABLES, Database

REPO = Path(__file__).resolve().parent.parent

# sqlite-only constructs that would break on Postgres.  `PRAGMA` is
# allowed only inside the sqlite branch of the facade, never in facade
# callers or the schema.
_SQLITEISMS = re.compile(
    r"\b(PRAGMA|AUTOINCREMENT|INSERT\s+OR\s+REPLACE|INSERT\s+OR\s+IGNORE|"
    r"strftime|julianday|randomblob|GROUP_CONCAT|ifnull|iif|"
    r"datetime\s*\(|AUTOINCR)\b"
    # 2-arg scalar min()/max() is sqlite-only (Postgres: LEAST/GREATEST);
    # the comma distinguishes it from the aggregate forms
    r"|\b(?:min|max)\s*\([^()]*,", re.IGNORECASE)


class _StrictCursor:
    def __init__(self, conn):
        self._c = conn

    def execute(self, sql, params=()):
        assert "?" not in sql, f"qmark placeholder reached pg driver: {sql}"
        bad = _SQLITEISMS.search(sql)
        assert bad is None, f"sqlite-only syntax reached pg driver: {bad.group(0)}"
        self._cur = self._c.execute(sql.replace("%s", "?"), params)
        return self

    @property
    def description(self):
        return self._cur.description

    def fetchall(self):
        # psycopg returns plain tuples by default
        return [tuple(r) for r in self._cur.fetchall()]

    @property
    def lastrowid(self):
        return self._cur.lastrowid


class _StrictConn:
    """Postgres-semantics connection backed by in-memory sqlite."""

    def __init__(self):
        self._c = sqlite3.connect(":memory:", check_same_thread=False)
        self.executed = []

    def execute(self, sql, params=()):
        self.executed.append(sql)
        cur = _StrictCursor(self._c)
        if "information_schema.columns" in sql:
            # emulate Postgres reflection on the sqlite engine
            (table,) = params
            cols = self._c.execute(f"PRAGMA table_info({table})").fetchall()
            class _R:
                def __init__(self, rows):
                    self.description = [("column_name",)]
                    self._rows = rows
                def fetchall(self):
                    return self._rows
            cur._cur = _R([(c[1],) for c in cols])
            return cur
        return cur.execute(sql, params)

    def commit(self):
        self._c.commit()


class FakePostgresDriver:
    paramstyle = "format"

    def __init__(self):
        self._conn = _StrictConn()

    def connect(self, path):
        return self._conn


@pytest.fixture()
def pgdb():
    return Database(":memory:", driver=FakePostgresDriver())


def test_schema_bootstraps_without_sqliteisms(pgdb):
    assert _SQLITEISMS.search(_SCHEMA) is None
    for t in TABLES:
        assert pgdb.query(f"SELECT COUNT(*) AS n FROM {t}")[0]["n"] == 0


def test_full_facade_workout_matches_sqlite(pgdb):
    """Run every domain helper through both drivers; results must agree."""
    ref = Database(":memory:")
    for d in (ref, pgdb):
        uid = d.insert("users", {"email": "a@b.c", "username": "ann",
                                 "password_hash": "x", "role": "rater"})
        d.update("users", uid, {"rater_tier": "gold", "is_active": True})
        vid = d.insert("videos", {"filename": "v.mp4", "file_size": 10,
                                  "status": "uploaded"})
        d.upsert_heartbeat("yolo-pipeline", "healthy", active_jobs=2,
                           extra={"queue": 3})
        d.upsert_heartbeat("yolo-pipeline", "degraded", error_count=1)
        d.get_or_create_elo(vid)
        d.update_elo(vid, 1512.0, 340.0, "win")
        d.update_elo(vid, 1500.5, 330.0, "tie")
        d.get_or_create_cow("cow-7", tag_number="T7")
        d.record_sighting("cow-7", vid, track_id=3, reid_confidence=0.9,
                          start_frame=0, end_frame=99, avg_confidence=0.8)
        d.add_lameness_record("cow-7", vid, {
            "final_probability": 0.81, "final_prediction": 1,
            "confidence": 0.77,
        }, {"tcn": {"probability": 0.8}, "tleap": {"lameness_score": 0.6}})

    def snapshot(d):
        out = {}
        for t in TABLES:
            rows = d.query(f"SELECT * FROM {t}")
            # strip ids/timestamps (uuids differ per run)
            out[t] = [
                {k: v for k, v in r.items()
                 if k not in ("id", "job_id") and not k.endswith("_id")
                 and not k.endswith("_at") and not k.endswith("_seen")
                 and k not in ("last_heartbeat", "last_activity",
                               "observation_date", "recorded_at")}
                for r in rows]
        return out

    assert snapshot(ref) == snapshot(pgdb)
    hb = pgdb.one("SELECT * FROM service_heartbeats WHERE service_name=?",
                  ("yolo-pipeline",))
    assert hb["status"] == "degraded" and hb["active_jobs"] == 0
    elo = pgdb.one("SELECT * FROM video_elo_ratings")
    assert elo["wins"] == 1 and elo["ties"] == 1
    assert elo["total_comparisons"] == 2
    hist = pgdb.lameness_history("cow-7")
    assert len(hist) == 1 and hist[0]["severity_level"] == "severe"


def _iter_sql_literals(path: Path):
    """Yield every string literal passed to db execute/query/one calls."""
    tree = ast.parse(path.read_text())
    for node in ast.walk(tree):
        if not isinstance(node, ast.Call) or not node.args:
            continue
        fn = node.func
        name = fn.attr if isinstance(fn, ast.Attribute) else getattr(
            fn, "id", "")
        if name not in ("execute", "query", "one"):
            continue
        arg = node.args[0]
        # literal or implicit-concat literal
        if isinstance(arg, ast.Constant) and isinstance(arg.value, str):
            yield arg.value
        elif isinstance(arg, ast.JoinedStr):
            pytest.fail(f"f-string SQL in {path.name}:{node.lineno} — "
                        "not statically checkable for portability")


def test_serve_layer_sql_is_portable_and_prepares():
    conn = sqlite3.connect(":memory:")
    conn.executescript(_SCHEMA)
    checked = 0
    for src in ("lameness_tpu/serve/api.py", "lameness_tpu/serve/app.py"):
        for sql in _iter_sql_literals(REPO / src):
            if not re.match(r"\s*(SELECT|INSERT|UPDATE|DELETE|WITH)\b",
                            sql, re.IGNORECASE):
                continue            # non-SQL strings hitting same-named APIs
            assert _SQLITEISMS.search(sql) is None, f"sqlite-ism: {sql}"
            params = tuple("x" * sql.count("?"))
            # EXPLAIN-prepare validates syntax + table/column references
            conn.execute(f"EXPLAIN {sql}", params)
            checked += 1
    assert checked >= 40, f"only {checked} serve-layer SQL literals found"


def test_qmark_rewrite_only_for_format_drivers():
    d = Database(":memory:")
    assert d._sql("SELECT ?") == "SELECT ?"
    pg = Database(":memory:", driver=FakePostgresDriver())
    assert pg._sql("SELECT ?") == "SELECT %s"
