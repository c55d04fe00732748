"""Response-SHAPE parity with the reference admin backend (VERDICT r3
item 2).

test_every_reference_endpoint_path_resolves (test_api_extra.py) proves
the (method, path) table matches; this sweep goes one level deeper: for
every reference GET handler it extracts the response's top-level keys
from the reference source itself (pydantic response_model fields or the
returned dict literals — routers/*.py under
/root/reference/services/admin-interface/backend/app) and asserts OUR
live response carries those keys on a seeded world.  A drop-in client
of the reference must find every field it would read.

Dict-literal extraction takes the INTERSECTION of all `return {...}`
keysets in a handler, so branch-dependent extras don't create false
demands.  Documented, justified deviations live in EXCEPTIONS.
"""
import ast
import json
import re
from pathlib import Path

import numpy as np
import pytest

try:
    import httpx
except ImportError:
    httpx = None

from lameness_tpu.io.bus import MessageBus
from lameness_tpu.io.db import Database
from lameness_tpu.io.vecstore import VectorStore
from lameness_tpu.serve.api import AdminContext, make_server

pytestmark = pytest.mark.skipif(httpx is None, reason="httpx unavailable")

REF_APP = Path("/root/reference/services/admin-interface/backend/app")

# Justified deviations: route -> (missing keys we deliberately do not
# serve, reason).  Keep SHORT — every entry is a standing parity gap.
EXCEPTIONS = {
}


# ---------------------------------------------------------------------------
# reference response-shape extraction
# ---------------------------------------------------------------------------
def _dict_keys(node):
    """String keys of a dict literal, or None if any key is dynamic."""
    if not isinstance(node, ast.Dict):
        return None
    ks = []
    for k in node.keys:
        if isinstance(k, ast.Constant) and isinstance(k.value, str):
            ks.append(k.value)
        else:
            return None
    return ks


def reference_get_shapes(methods=("get",)):
    """[(route_path, kind, keys)] (plus the method when several are
    asked for) for every reference handler of the given HTTP methods
    whose response shape is statically extractable.  kind: 'dict'
    (object with the keys) or 'list' (array of objects with the keys)."""
    main_src = (REF_APP / "main.py").read_text()
    prefixes = dict(re.findall(
        r'include_router\((\w+)\.router,\s*prefix="([^"]*)"', main_src))
    out = []
    for f in sorted((REF_APP / "routers").glob("*.py")):
        tree = ast.parse(f.read_text())
        models = {}
        for n in ast.walk(tree):
            if isinstance(n, ast.ClassDef):
                fields = [s.target.id for s in n.body
                          if isinstance(s, ast.AnnAssign)
                          and isinstance(s.target, ast.Name)]
                if fields:
                    models[n.name] = fields
        for n in tree.body:
            if not isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef)):
                continue
            for dec in n.decorator_list:
                if not (isinstance(dec, ast.Call)
                        and isinstance(dec.func, ast.Attribute)
                        and dec.func.attr in methods):
                    continue
                if not (dec.args and isinstance(dec.args[0], ast.Constant)):
                    continue
                path = (prefixes.get(f.stem, "")
                        + dec.args[0].value).rstrip("/") or "/"
                kind, keys = None, None
                for kw in dec.keywords:
                    if kw.arg == "response_model":
                        v = kw.value
                        if isinstance(v, ast.Name) and v.id in models:
                            kind, keys = "dict", models[v.id]
                        elif isinstance(v, ast.Subscript) and \
                                isinstance(v.slice, ast.Name) and \
                                v.slice.id in models:
                            kind, keys = "list", models[v.slice.id]
                if keys is None:
                    assigns, keysets = {}, []
                    for b in ast.walk(n):
                        if isinstance(b, ast.Assign) and \
                                len(b.targets) == 1 and \
                                isinstance(b.targets[0], ast.Name):
                            dk = _dict_keys(b.value)
                            if dk is not None:
                                assigns[b.targets[0].id] = dk
                        if isinstance(b, ast.Return) and b.value is not None:
                            dk = _dict_keys(b.value)
                            if dk is None and isinstance(b.value, ast.Name):
                                dk = assigns.get(b.value.id)
                            if dk:
                                keysets.append(set(dk))
                    if keysets:
                        kind = "dict"
                        keys = sorted(set.intersection(*keysets))
                if keys:
                    if methods == ("get",):
                        out.append((path, kind, keys))
                    else:
                        out.append((dec.func.attr.upper(), path, kind,
                                    keys))
    return out


# ---------------------------------------------------------------------------
# seeded live server
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def shaped_server(tmp_path_factory):
    from lameness_tpu.core.config import Config
    from lameness_tpu.io import schemas

    tmp = tmp_path_factory.mktemp("shapes")
    cfg = Config.load(data_root=str(tmp / "data"))
    cfg.dirs.ensure()
    ctx = AdminContext(cfg, Database(tmp / "x.db"), MessageBus(),
                       store=VectorStore())
    ctx.seed_users(password="testpw")
    srv = make_server(ctx)
    srv.start()
    base = f"http://127.0.0.1:{srv.port}"

    tok = httpx.post(f"{base}/api/auth/login",
                     json={"username": "admin", "password": "testpw"}
                     ).json()["access_token"]
    h = {"Authorization": f"Bearer {tok}"}

    # -- videos + labels + results ------------------------------------------
    vid = httpx.post(f"{base}/api/videos/upload?filename=walk.mp4",
                     content=b"\x00" * 64).json()["video_id"]
    vb = httpx.post(f"{base}/api/videos/upload?filename=b.mp4",
                    content=b"\x00" * 64).json()["video_id"]
    vc = httpx.post(f"{base}/api/videos/upload?filename=c.mp4",
                    content=b"\x00" * 64).json()["video_id"]
    httpx.post(f"{base}/api/videos/{vid}/label", json={"label": 1},
               headers=h)
    res = ctx.dirs
    for name, payload in {
        "yolo": {"video_id": vid, "detections": [
            {"frame": 0, "time": 0.0, "bbox": [1, 2, 30, 40],
             "confidence": 0.9, "class": "cow"}],
            "features": {"avg_confidence": 0.9},
            "position_stability": 0.8},
        "sam3": {"video_id": vid, "segmentations": [
            {"frame": 0, "mask_area_frac": 0.2, "bbox": [1, 2, 30, 40]}],
            "aggregated": {"mean_area": 0.2}},
        "dinov3": {"video_id": vid, "embedding": [0.1] * 8,
                   "similar_videos": []},
        "tleap": {"video_id": vid, "keypoints": [
            {"frame": 0, "points": [[1, 2, 0.9]] * 20}],
            "locomotion_features": {"stride": 1.0}},
        "tcn": {"video_id": vid, "severity_score": 0.7,
                "probability": 0.7, "uncertainty": 0.1},
        "transformer": {"video_id": vid, "probability": 0.6,
                        "severity_score": 0.6},
        "fusion": {"video_id": vid, "final_probability": 0.65,
                   "final_prediction": 1,
                   "pipeline_contributions": {"tcn": 0.5}},
        "ml": {"video_id": vid, "features": [0.2, 0.8, 0.5],
               "feature_names": ["stride", "sway", "head_bob"],
               "predictions": {"ensemble": {"probability": 0.6}}},
        "graph_transformer": {"video_id": vid, "graph_prediction": 0.55,
                              "node_prediction": 0.6, "prediction": 1},
    }.items():
        d = res.results_for(name)
        d.mkdir(parents=True, exist_ok=True)
        schemas.write_result(d / f"{vid}_{name}.json", payload)

    # -- cows + lameness records + aggregated prediction ----------------------
    for i in range(3):
        ctx.db.record_sighting("COW-0001", vid, i, 0.9, 0.0, 50.0, 0.8)
    rec_id = ctx.db.add_lameness_record(
        "COW-0001", vid, {"final_probability": 0.65, "final_prediction": 1},
        {"tcn": {"probability": 0.7}})
    pred_dir = res.results / "cow_predictions"
    pred_dir.mkdir(parents=True, exist_ok=True)
    schemas.write_result(pred_dir / "COW-0001_prediction.json", {
        "prediction": {"aggregated_score": 0.65, "severity_level":
                       "moderate", "num_videos": 1},
        "last_updated": "2026-01-01T00:00:00", "latest_video": vid})

    # -- elo comparisons + snapshot -------------------------------------------
    for v1, v2, w in ((vid, vb, 1), (vb, vc, 1), (vid, vc, 1)):
        httpx.post(f"{base}/api/elo/comparison", headers=h,
                   json={"video_id_1": v1, "video_id_2": v2,
                         "winner": w, "degree": 2})
    sid = httpx.post(f"{base}/api/elo/snapshot", json={"name": "s1"},
                     headers=h).json().get("snapshot_id", 1)

    # -- pipeline heartbeat + tutorial + learn progress -----------------------
    httpx.post(f"{base}/api/pipeline/heartbeat",
               json={"service_name": "engine", "status": "healthy",
                     "active_jobs": 1})
    httpx.post(f"{base}/api/tutorial/tasks", headers=h,
               json={"video_id_1": vid, "video_id_2": "vb",
                     "correct_winner": 1, "is_tutorial": True,
                     "hint": "back arch"})
    httpx.put(f"{base}/api/training/learn/progress", headers=h,
              json={"total_score": 10, "total_attempts": 4,
                    "correct_count": 3, "streak": 2, "current_level": 1})

    subs = {"video_id": vid, "cow_id": "COW-0001", "frame_num": "0",
            "snapshot_id": str(sid), "service_name": "engine",
            "record_id": str(rec_id), "user_id": "1", "pipeline": "tcn"}
    yield base, h, subs
    srv.stop()


def _fill(path: str, subs) -> str:
    return re.sub(r"\{(\w+)\}", lambda m: subs.get(m.group(1), "pv"), path)


def _page_consumptions():
    """Statically extract, per SPA page, how each GET api() result is
    consumed: ('envelope', key) when the page destructures `r.key`, or
    ('array',) when the awaited result is used with .map/.length/etc.
    These are the exact patterns that broke twice (snapshots/videos
    envelopes) — VERDICT r3 Weak #1 mitigation."""
    static = (Path(__file__).parent.parent / "lameness_tpu" / "serve"
              / "static" / "pages")
    out = []    # (page, raw_path, kind, key-or-None)
    for p in sorted(static.glob("*.js")):
        src = p.read_text()
        # api("/x").then(r => r.key …)   — envelope access
        for path, _q, param, key in re.findall(
                r'api\([`"](/api/[^`"?]+)(\?[^`"]*)?[`"]\)\s*'
                r'\.then\(\s*\(?(\w+)\)?\s*=>\s*(?:\3)\.(\w+)', src):
            out.append((p.name, path, "envelope", key))
        # (await api("/x")).key          — envelope access
        for path, _q, key in re.findall(
                r'\(await api\([`"](/api/[^`"?]+)(\?[^`"]*)?[`"]\)\)'
                r'\.(\w+)', src):
            out.append((p.name, path, "envelope", key))
        # api("/x").catch(() => [])     — array default implies array shape
        for path in re.findall(
                r'api\([`"](/api/[^`"?]+)(?:\?[^`"]*)?[`"]\)\s*'
                r'\.catch\(\(\)\s*=>\s*\[\]\)', src):
            out.append((p.name, path, "array", None))
        # const X = await api("/x");  …  X.map( / X.length / [...X]
        for name, path in re.findall(
                r'(?:const|let)\s+(\w+)\s*=\s*await\s+api\('
                r'[`"](/api/[^`"?]+)(?:\?[^`"]*)?[`"]\)\s*'
                r'(?:\.catch\([^;]*\))?\s*;', src):
            if re.search(rf'(\b{name}\.(map|filter|forEach|slice|length)\b'
                         rf'|\.\.\.{name}\b|\b{name}\[0\])', src):
                out.append((p.name, path, "array", None))
    return out


def test_page_api_consumption_matches_live_shapes(shaped_server):
    """Every page-side consumption of a GET response must match what the
    live server actually returns: `.then(r => r.key)` requires `key` in
    the object, array-style use requires an actual JSON array.  No JS
    runtime ships in this image — this is the static+live stand-in that
    catches envelope mismatches a browser would surface as TypeErrors."""
    base, h, subs = shaped_server
    cons = _page_consumptions()
    assert len(cons) >= 12, cons        # extraction must stay broad
    failures, checked = [], 0
    for page, raw, kind, key in cons:
        def sub(m):
            expr = m.group(1).lower()
            if "cow" in expr:
                return subs["cow_id"]
            if "user" in expr:
                return subs["user_id"]
            return subs["video_id"]
        url = re.sub(r"\$\{([^}]+)\}", sub, raw)
        r = httpx.get(base + url, headers=h)
        if r.status_code != 200:
            continue                     # unseeded resource: nothing to check
        body = r.json()
        checked += 1
        if kind == "array" and not isinstance(body, list):
            failures.append((page, raw, "page consumes an array but the "
                             f"server returns {type(body).__name__}"))
        elif kind == "envelope" and (not isinstance(body, dict)
                                     or key not in body):
            failures.append((page, raw, f"page reads .{key} but response "
                             f"has {sorted(body)[:8] if isinstance(body, dict) else type(body).__name__}"))
    assert not failures, "\n".join(map(str, failures))
    assert checked >= 10, (checked, cons)


def test_reference_get_response_keys(shaped_server):
    base, h, subs = shaped_server
    shapes = reference_get_shapes()
    assert len(shapes) >= 60          # extraction must stay broad (~87%)
    failures = []
    checked = 0
    for path, kind, keys in shapes:
        url = _fill(path, subs)
        exc = EXCEPTIONS.get(path, (set(), ""))[0]
        r = httpx.get(base + url, headers=h)
        if r.status_code != 200:
            failures.append((path, f"status {r.status_code}"))
            continue
        try:
            body = r.json()
        except Exception:
            failures.append((path, "non-JSON response"))
            continue
        if kind == "list":
            if not isinstance(body, list):
                failures.append((path, f"expected array, got "
                                 f"{type(body).__name__}"))
                continue
            if not body:
                continue               # nothing seeded for this list
            body = body[0]
        if not isinstance(body, dict):
            failures.append((path, f"expected object, got "
                             f"{type(body).__name__}"))
            continue
        missing = [k for k in keys if k not in body and k not in exc]
        if missing:
            failures.append((path, f"missing keys {missing}"))
        checked += 1
    assert not failures, (
        f"{len(failures)} of {len(shapes)} reference GET shapes unmet:\n"
        + "\n".join(f"  {p}: {msg}" for p, msg in failures))
    assert checked >= 50


# Reference-shaped request bodies per mutating route (pydantic request
# models in routers/*.py) — a drop-in client sends exactly these.
# Defined LAST in this module: mutations run against the module-scoped
# seeded server only after the read-only sweeps above.
def _mutation_bodies(subs):
    vid = subs["video_id"]
    return {
        ("POST", "/api/analysis/batch"): [vid],        # List[str] body
        ("POST", "/api/analysis/{video_id}/explanation/generate"): {},
        ("POST", "/api/auth/logout"): {},
        ("POST", "/api/elo/comparison"): {
            "video_id_1": vid, "video_id_2": "vb2", "winner": 1,
            "degree": 2, "confidence": "confident"},
        ("POST", "/api/elo/snapshot"): {"name": "mut-snap"},
        ("POST", "/api/elo/recalculate"): {},
        ("PUT", "/api/ml-config/xgboost"): {"n_estimators": 50},
        ("PUT", "/api/ml-config/lightgbm"): {"n_estimators": 50},
        ("PUT", "/api/ml-config/catboost"): {"iterations": 50},
        ("PUT", "/api/ml-config/ensemble"): {
            "weights": {"catboost": 0.4, "xgboost": 0.3,
                        "lightgbm": 0.3}},
        ("PUT", "/api/ml-config/training"): {"cv_folds": 3},
        ("POST", "/api/ml-config/reset"): {},
        ("POST", "/api/models/parameters"): {
            "xgboost": {"n_estimators": 80}},
        ("POST", "/api/pipeline/{service_name}/trigger/{video_id}"): {},
        ("POST", "/api/pipeline/batch/reprocess"): {
            "video_ids": [vid], "pipelines": ["yolo"]},
        ("POST", "/api/pipeline/heartbeat"): {
            "service_name": "engine", "status": "healthy",
            "active_jobs": 0},
        ("POST", "/api/shap/what-if"): {
            "video_id": vid, "feature_changes": {"stride": 0.9}},
        ("POST", "/api/training/videos/{video_id}/label"): {
            "label": 1, "confidence": "certain"},
        ("POST", "/api/training/pairwise"): {
            "video_id_1": vid, "video_id_2": "vb2", "winner": 2,
            "confidence": "confident"},
        ("POST", "/api/training/triplet"): {
            "reference_id": vid, "comparison_a_id": "vb2",
            "comparison_b_id": "vc2", "selected_answer": "A",
            "confidence": "medium", "task_type": "similarity"},
        ("POST", "/api/tutorial/examples/auto-generate"): {"count": 1},
        ("POST", "/api/tutorial/tasks"): {
            "video_id_1": vid, "video_id_2": "vb2", "correct_winner": 1,
            "correct_degree": 2, "difficulty": "easy",
            "hint": "mut hint", "is_tutorial": True},
        ("POST", "/api/videos/upload-url"): {
            "filename": "mut.mp4", "content_type": "video/mp4"},
    }


def test_reference_mutation_response_keys(shaped_server):
    """POST/PUT response-shape parity: for every reference mutating
    handler with a statically-extractable response shape, send the
    reference-shaped request body and assert our 200 response carries
    the reference's keys.  Routes whose preconditions cannot be met
    in-image (training starts without data, S3 confirm without a real
    bucket, raw-bytes upload) are skipped by status, with a floor on
    how many must succeed."""
    base, h, subs = shaped_server
    shapes = [(m, p, kind, keys) for m, p, kind, keys in
              reference_get_shapes(methods=("post", "put"))]
    assert len(shapes) >= 30
    bodies = _mutation_bodies(subs)
    failures, checked = [], 0
    for method, path, kind, keys in shapes:
        body = bodies.get((method, path))
        if body is None:
            continue                    # no in-image recipe for this route
        url = _fill(path, subs)
        r = httpx.request(method, base + url, headers=h, json=body)
        if r.status_code != 200:
            failures.append((method, path, f"status {r.status_code}: "
                             f"{r.text[:100]}"))
            continue
        resp = r.json()
        if not isinstance(resp, dict):
            failures.append((method, path, "non-object response"))
            continue
        missing = [k for k in keys if k not in resp]
        if missing:
            failures.append((method, path, f"missing keys {missing}"))
        else:
            checked += 1
    assert not failures, "\n".join(map(str, failures))
    assert checked >= 20, (checked, len(bodies))
