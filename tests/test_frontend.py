"""Frontend contract smoke: every page module loads over HTTP and every
endpoint a page calls resolves to a real route on the live server.

No browser/JS runtime exists in this image, so this is the automated
stand-in for a browser smoke test: it validates (a) the SPA shell + all
ES modules are served with the right mime, (b) module structure (default
export, resolvable /static imports), and (c) the full set of api() calls
each page makes against the live router — a typo'd endpoint fails here.
"""
import re
from pathlib import Path

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

pytestmark = pytest.mark.skipif(httpx is None, reason="httpx unavailable")

STATIC = Path(__file__).parent.parent / "lameness_tpu" / "serve" / "static"

# the 20-page reference set (frontend/src/pages/*.tsx); Login lives in app.js
EXPECTED_PAGES = {
    "dashboard", "video_upload", "video_results", "video_analysis",
    "pairwise_review", "triplet_comparison", "hierarchy_visualization",
    "similarity_map", "training_module", "training_queue",
    "tutorial_management", "ml_configuration", "pipeline_monitor",
    "pipeline_analysis", "system_health", "cow_list", "cow_detail",
    "user_management", "settings",
}


@pytest.fixture()
def server(tmp_data_root, tmp_path):
    cfg = tmp_data_root
    db = Database(tmp_path / "fe.db")
    bus = MessageBus()
    from lameness_tpu.hitl.reliability import RaterReliabilityService
    rel = RaterReliabilityService(cfg.dirs.rater_reliability, bus=bus,
                                  subjects=Subjects())
    ctx = AdminContext(cfg, db, bus, reliability=rel, store=VectorStore())
    ctx.seed_users(password="testpw")
    srv = make_server(ctx)
    port = srv.start()
    yield f"http://127.0.0.1:{port}", ctx
    srv.stop()


def _token(base):
    return httpx.post(f"{base}/api/auth/login",
                      json={"username": "admin",
                            "password": "testpw"}).json()["access_token"]


def test_page_set_matches_reference(server):
    names = {p.stem for p in (STATIC / "pages").glob("*.js")}
    assert names == EXPECTED_PAGES, names ^ EXPECTED_PAGES


def test_shell_and_modules_served(server):
    base, _ = server
    r = httpx.get(base + "/")
    assert r.status_code == 200 and "/static/app.js" in r.text
    r = httpx.get(base + "/static/app.js")
    assert r.status_code == 200
    assert "text/javascript" in r.headers["content-type"]
    for p in (STATIC / "pages").glob("*.js"):
        rr = httpx.get(f"{base}/static/pages/{p.name}")
        assert rr.status_code == 200, p.name
        assert "text/javascript" in rr.headers["content-type"]
        src = p.read_text()
        assert "export default" in src, p.name
        # every static import resolves
        for imp in re.findall(r'from\s+"(/static/[^"]+)"', src):
            assert httpx.get(base + imp).status_code == 200, (p.name, imp)


def test_no_path_traversal(server):
    base, _ = server
    for evil in ("/static/../api.py", "/static/..%2fapi.py",
                 "/static/pages/../../__init__.py"):
        assert httpx.get(base + evil).status_code in (404, 422), evil


def _js_balance(src, name):
    """Best-effort syntax check (no JS engine in this image): brackets must
    balance outside strings/comments/regex-free template literals."""
    stack = []
    pairs = {")": "(", "]": "[", "}": "{"}
    i, n = 0, len(src)
    mode = []          # nested contexts: "`" template, "${" interpolation
    while i < n:
        c = src[i]
        top = mode[-1] if mode else None
        if top == "line-comment":
            if c == "\n":
                mode.pop()
        elif top == "block-comment":
            if src.startswith("*/", i):
                mode.pop(); i += 1
        elif top in ("'", '"'):
            if c == "\\":
                i += 1
            elif c == top or c == "\n":
                mode.pop()
        elif top == "`":
            if c == "\\":
                i += 1
            elif c == "`":
                mode.pop()
            elif src.startswith("${", i):
                # remember stack depth so the matching } is unambiguous
                mode.append(("${", len(stack))); i += 1
        else:
            if src.startswith("//", i):
                mode.append("line-comment"); i += 1
            elif src.startswith("/*", i):
                mode.append("block-comment"); i += 1
            elif c == "/":
                # regex literal when preceded by an operator/opening context
                j = i - 1
                while j >= 0 and src[j] in " \t\n":
                    j -= 1
                if j < 0 or src[j] in "(,=:[!&|?{};":
                    i += 1
                    in_class = False
                    while i < n:
                        if src[i] == "\\":
                            i += 1
                        elif src[i] == "[":
                            in_class = True
                        elif src[i] == "]":
                            in_class = False
                        elif src[i] == "/" and not in_class:
                            break
                        elif src[i] == "\n":
                            break
                        i += 1
            elif c in "'\"`":
                mode.append(c)
            elif c in "([{":
                stack.append((c, i))
            elif c in ")]}":
                interp = isinstance(top, tuple) and top[0] == "${"
                if interp and c == "}" and len(stack) == top[1]:
                    mode.pop()
                else:
                    assert stack, f"{name}: unmatched {c} at {i}"
                    o, _ = stack.pop()
                    assert o == pairs[c], \
                        f"{name}: mismatched {o}…{c} near offset {i}"
        i += 1
    assert not stack, f"{name}: unclosed {stack[-3:]}"
    assert not mode, f"{name}: unterminated {mode}"


def test_js_modules_are_balanced():
    for p in [STATIC / "app.js"] + sorted((STATIC / "pages").glob("*.js")):
        _js_balance(p.read_text(), p.name)


def _page_sources():
    return {p.name: p.read_text()
            for p in sorted((STATIC / "pages").glob("*.js"))}


def test_dom_hooks_exist_in_templates():
    """Every literal `getElementById("x")` / `querySelector("#x")` a page
    makes must have a matching `id="x"` in that page's own templates (or
    the shared shell) — a renamed element id would otherwise only fail at
    runtime, and no JS runtime ships in this image."""
    shell = (STATIC / "app.js").read_text()
    shell += (STATIC / "index.html").read_text() \
        if (STATIC / "index.html").exists() else ""
    missing = []
    for name, src in _page_sources().items():
        wanted = set(re.findall(r'getElementById\("([\w-]+)"\)', src))
        wanted |= set(re.findall(r'querySelector\("#([\w-]+)"\)', src))
        ids = set(re.findall(r'id="([\w-]+)"', src + shell))
        # ids built inside template interpolations, e.g. id="ans${i}"
        dyn_prefixes = [m for m in re.findall(r'id="([\w-]*)\$\{', src)]
        for w in wanted:
            if w in ids:
                continue
            if any(pre and w.startswith(pre) for pre in dyn_prefixes):
                continue
            missing.append((name, w))
    assert missing == [], missing


def test_ws_channels_are_served():
    """Every WS channel a page subscribes to must be a channel the server
    actually runs (serve/http.py WebSocketManager.CHANNELS)."""
    from lameness_tpu.serve.http import WebSocketManager
    for name, src in _page_sources().items():
        for chan in re.findall(r'\bws\("([\w-]+)"', src):
            assert chan in WebSocketManager.CHANNELS, (name, chan)


def test_click_handlers_reference_real_pages():
    """Every go('page', …) navigation target must be a registered route
    in the app.js PAGES table."""
    shell = (STATIC / "app.js").read_text()
    pages = set(re.findall(r'^\s*(\w+):\s*\["', shell, re.M))
    assert len(pages) >= 18, pages
    for name, src in _page_sources().items():
        for target in re.findall(r"go\('([\w-]+)'", src):
            assert target in pages, (name, target)


def _route_exists(base, path, headers):
    """A route exists if SOME method gives a non-router-404 response."""
    for method in ("GET", "POST", "PATCH", "PUT", "DELETE"):
        r = httpx.request(method, base + path, headers=headers)
        if not (r.status_code == 404 and "Not found:" in r.text):
            return True
    return False


def test_every_page_endpoint_resolves(server):
    base, _ = server
    headers = {"Authorization": "Bearer " + _token(base)}
    vid = "00000000-0000-0000-0000-000000000000"
    missing = []
    for p in sorted((STATIC / "pages").glob("*.js")) + [STATIC / "app.js"]:
        src = p.read_text()
        calls = re.findall(r'api\("(/api/[^"?]+)[?"]', src)
        calls += [re.sub(r"\$\{[^}]+\}", vid, m) for m in
                  re.findall(r'api\(`(/api/[^`?]+)[`?]', src)]
        calls += re.findall(r'fetch\(\s*[`"](/api/[^`"?]+)[`"?]', src)
        for path in set(calls):
            path = re.sub(r"\$\{[^}]+\}", vid, path)
            if not _route_exists(base, path, headers):
                missing.append((p.name, path))
    assert missing == [], missing
