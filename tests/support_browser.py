"""Browser host environment for executing the SPA in esinterp.

Supplies what serve/static/**.js expects from a browser: a DOM tree
(innerHTML parsing via html.parser, query selectors, event handlers),
``fetch`` bridged to the live admin server over httpx (synchronous —
the interpreter's promises resolve eagerly), localStorage, location,
a WebSocket stub, and a manual timer queue.

This is test scaffolding, not a browser: layout, CSS, and real event
loops don't exist.  What it DOES give: the page modules execute for
real — real template rendering, real api() consumption of live server
responses, real DOM mutation — so a runtime TypeError in an exercised
branch fails the suite (VERDICT r4 item 9).
"""
from __future__ import annotations

import re
from html.parser import HTMLParser
from pathlib import Path
from typing import Any, Dict, List, Optional

from lameness_tpu.utils.esinterp import (UNDEF, Interp, JSError, JSObject,
                                         Promise, _call, js_str, js_truthy,
                                         make_error)

STATIC = Path(__file__).parent.parent / "lameness_tpu" / "serve" / "static"

_VOID = frozenset("area base br col embed hr img input link meta source "
                  "track wbr".split())


class Element:
    def __init__(self, tag: str, doc: "Document"):
        self.tag = tag.lower()
        self.doc = doc
        self.attrs: Dict[str, Any] = {}
        self.children: List[Any] = []       # Elements and text strings
        self.parent: Optional[Element] = None
        self.props: Dict[str, Any] = {}     # JS-assigned props (handlers…)

    # -- tree helpers ---------------------------------------------------------
    def _append_node(self, node):
        if isinstance(node, Element):
            node.parent = self
        self.children.append(node)

    def walk(self):
        for c in self.children:
            if isinstance(c, Element):
                yield c
                yield from c.walk()

    @property
    def text(self) -> str:
        out = []
        for c in self.children:
            out.append(c.text if isinstance(c, Element) else c)
        return "".join(out)

    def matches(self, part: str) -> bool:
        m = re.fullmatch(
            r"(?P<tag>[a-zA-Z][\w-]*)?(?P<id>#[\w-]+)?"
            r"(?P<cls>(?:\.[\w-]+)+)?"
            r"(?P<attrs>(?:\[[\w-]+(?:=(?:\"[^\"]*\"|[^\]]*))?\])*)",
            part)
        if not m or not part:
            return False
        if m.group("tag") and self.tag != m.group("tag").lower():
            return False
        if m.group("id") and self.attrs.get("id") != m.group("id")[1:]:
            return False
        if m.group("cls"):
            classes = set(str(self.attrs.get("class", "")).split())
            wanted = [c for c in m.group("cls").split(".") if c]
            if not set(wanted) <= classes:
                return False
        for am in re.finditer(
                r"\[([\w-]+)(?:=(?:\"([^\"]*)\"|([^\]]*)))?\]",
                m.group("attrs") or ""):
            k = am.group(1)
            want = am.group(2) if am.group(2) is not None else am.group(3)
            if k not in self.attrs:
                return False
            if want is not None and str(self.attrs[k]) != want:
                return False
        return True

    def query_all(self, sel: str) -> List["Element"]:
        # comma-separated selector groups union their results
        if "," in sel:
            out, seen = [], set()
            for sub in sel.split(","):
                for el in self.query_all(sub.strip()):
                    if id(el) not in seen:
                        seen.add(id(el))
                        out.append(el)
            return out
        parts = sel.strip().split()
        matched = [self]
        for part in parts:
            nxt, seen = [], set()
            for base in matched:
                for el in base.walk():
                    if id(el) not in seen and el.matches(part):
                        seen.add(id(el))
                        nxt.append(el)
            matched = nxt
        return matched

    def serialize(self) -> str:
        attrs = "".join(f' {k}="{v}"' for k, v in self.attrs.items())
        if self.tag in _VOID:
            return f"<{self.tag}{attrs}>"
        inner = "".join(c.serialize() if isinstance(c, Element) else c
                        for c in self.children)
        return f"<{self.tag}{attrs}>{inner}</{self.tag}>"

    # -- events ---------------------------------------------------------------
    def fire(self, etype: str, **fields):
        """Dispatch an event with BUBBLING, like a browser: every
        handler on this element (on<type> prop, inline attribute,
        addEventListener registrations), then the ancestor chain until
        stopPropagation()."""
        stopped = {"v": False}

        def _stop():
            stopped["v"] = True
            return UNDEF

        ev = JSObject({"type": etype, "target": self,
                       "stopPropagation": _stop,
                       "preventDefault": lambda: UNDEF, **fields})
        fired = False
        node: Optional[Element] = self
        while node is not None and not stopped["v"]:
            fired = node._dispatch(etype, ev) or fired
            node = node.parent
        return fired

    def _dispatch(self, etype: str, ev) -> bool:
        fired = False
        handler = self.props.get("on" + etype)
        if handler is not None and handler is not UNDEF:
            _call(handler, [ev])
            fired = True
        attr = self.attrs.get("on" + etype)
        if isinstance(attr, str) and attr.strip():
            self.doc.browser.interp.eval_snippet(attr, {"event": ev})
            fired = True
        for lt, fn in list(self.props.get("__listeners__", [])):
            if lt == etype:
                _call(fn, [ev])
                fired = True
        return fired

    def click(self):
        return self.fire("click")

    # -- JS property surface ---------------------------------------------------
    def js_get(self, name):
        if name in self.props:
            return self.props[name]
        if name == "innerHTML":
            return "".join(c.serialize() if isinstance(c, Element) else c
                           for c in self.children)
        if name == "outerHTML":
            return self.serialize()
        if name == "textContent":
            return self.text
        if name == "id":
            return self.attrs.get("id", "")
        if name == "value":
            if "value" in self.props:
                return self.props["value"]
            if "value" in self.attrs:
                return self.attrs["value"]
            if self.tag == "select":
                # browser semantics: an un-set select reads as the
                # option carrying `selected`, else the first option
                first = None
                for el in self.walk():
                    if el.tag == "option":
                        if "selected" in el.attrs:
                            return el.attrs.get("value", el.text)
                        if first is None:
                            first = el.attrs.get("value", el.text)
                return first if first is not None else ""
            return ""
        if name == "checked":
            return js_truthy(self.props.get(
                "checked", "checked" in self.attrs))
        if name == "disabled":
            return js_truthy(self.props.get(
                "disabled", "disabled" in self.attrs))
        if name == "dataset":
            return _Dataset(self)
        if name == "classList":
            return _ClassList(self)
        if name == "style":
            return self.props.setdefault("style", JSObject())
        if name == "parentElement" or name == "parentNode":
            return self.parent or UNDEF
        if name == "tagName":
            return self.tag.upper()
        if name == "append" or name == "appendChild":
            def _append(*nodes):
                for n in nodes:
                    if isinstance(n, Element):
                        self._append_node(n)
                    else:
                        self.children.append(js_str(n))
                return nodes[-1] if name == "appendChild" and nodes \
                    else UNDEF
            return _append
        if name == "prepend":
            def _prepend(*nodes):
                for n in reversed(nodes):
                    if isinstance(n, Element):
                        n.parent = self
                        self.children.insert(0, n)
                    else:
                        self.children.insert(0, js_str(n))
                return UNDEF
            return _prepend
        if name == "remove":
            def _remove():
                if self.parent is not None:
                    self.parent.children = [
                        c for c in self.parent.children if c is not self]
                    self.parent = None
                return UNDEF
            return _remove
        if name == "querySelector":
            def _qs(sel):
                r = self.query_all(sel)
                return r[0] if r else None
            return _qs
        if name == "querySelectorAll":
            return lambda sel: self.query_all(sel)
        if name == "getAttribute":
            return lambda k: self.attrs.get(js_str(k), None)
        if name == "setAttribute":
            def _sa(k, v):
                self.attrs[js_str(k)] = js_str(v)
                return UNDEF
            return _sa
        if name == "addEventListener":
            def _ael(t, fn, *a):
                self.props.setdefault("__listeners__", []).append(
                    (js_str(t), fn))
                return UNDEF
            return _ael
        if name == "removeEventListener":
            return lambda *a: UNDEF
        if name == "focus" or name == "blur" or name == "scrollIntoView":
            return lambda *a: UNDEF
        if name == "click":
            return lambda: self.click()
        if name == "closest":
            def _closest(sel):
                el = self
                while el is not None:
                    if el.matches(sel):
                        return el
                    el = el.parent
                return None
            return _closest
        if name == "insertAdjacentHTML":
            def _iah(where, html):
                frag = self.doc.parse_fragment(js_str(html))
                if js_str(where) == "beforeend":
                    for n in frag:
                        self._append_node(n) if isinstance(n, Element) \
                            else self.children.append(n)
                else:
                    for n in reversed(frag):
                        if isinstance(n, Element):
                            n.parent = self
                        self.children.insert(0, n)
                return UNDEF
            return _iah
        if name == "children":
            return [c for c in self.children if isinstance(c, Element)]
        if name == "offsetWidth" or name == "offsetHeight" \
                or name == "clientWidth" or name == "clientHeight":
            return 800.0
        if name == "getBoundingClientRect":
            return lambda: JSObject({"left": 0.0, "top": 0.0,
                                     "width": 800.0, "height": 600.0,
                                     "right": 800.0, "bottom": 600.0})
        if name == "files":
            return self.props.get("files", [])
        if name == "getContext":         # canvas pages degrade gracefully
            return lambda *a: _FakeCanvasCtx()
        if name == "play" or name == "pause" or name == "load":
            return lambda *a: UNDEF
        if name == "currentTime" or name == "duration":
            return 0.0
        return UNDEF

    def js_set(self, name, value):
        if name == "innerHTML":
            self.children = self.doc.parse_fragment(js_str(value))
            for c in self.children:
                if isinstance(c, Element):
                    c.parent = self
            return
        if name == "textContent":
            self.children = [js_str(value)]
            return
        if name == "id":
            self.attrs["id"] = js_str(value)
            return
        if name == "src" and self.tag in ("img", "script"):
            # browser semantics: assigning src queues a load; the timer
            # queue delivers onload, so `await new Promise(res =>
            # img.onload = res)` completes via the interpreter's pump
            self.props[name] = js_str(value)
            self.doc.browser.set_timeout(lambda: self.fire("load"))
            return
        self.props[name] = value

    def __repr__(self):
        ident = f"#{self.attrs['id']}" if "id" in self.attrs else ""
        return f"<{self.tag}{ident}>"


class _Dataset:
    def __init__(self, el: Element):
        self._el = el

    def js_get(self, name):
        return self._el.attrs.get(
            "data-" + _camel_to_kebab(name),
            self._el.props.get("data::" + name, UNDEF))

    def js_set(self, name, value):
        self._el.attrs["data-" + _camel_to_kebab(name)] = js_str(value)
        self._el.props["data::" + name] = value


def _camel_to_kebab(s: str) -> str:
    return re.sub(r"([A-Z])", lambda m: "-" + m.group(1).lower(), s)


class _ClassList:
    def __init__(self, el: Element):
        self._el = el

    def _classes(self) -> List[str]:
        return str(self._el.attrs.get("class", "")).split()

    def _store(self, cs: List[str]):
        self._el.attrs["class"] = " ".join(cs)

    def js_get(self, name):
        if name == "add":
            def _add(*cs):
                cur = self._classes()
                for c in cs:
                    if js_str(c) not in cur:
                        cur.append(js_str(c))
                self._store(cur)
                return UNDEF
            return _add
        if name == "remove":
            def _rm(*cs):
                bad = {js_str(c) for c in cs}
                self._store([c for c in self._classes() if c not in bad])
                return UNDEF
            return _rm
        if name == "toggle":
            def _tg(c, force=UNDEF):
                c = js_str(c)
                cur = self._classes()
                want = (c not in cur) if force is UNDEF else js_truthy(force)
                if want and c not in cur:
                    cur.append(c)
                if not want and c in cur:
                    cur.remove(c)
                self._store(cur)
                return want
            return _tg
        if name == "contains":
            return lambda c: js_str(c) in self._classes()
        return UNDEF


class _FakeCanvasCtx:
    def js_get(self, name):
        if name in ("measureText",):
            return lambda *a: JSObject({"width": 10.0})
        return lambda *a: UNDEF

    def js_set(self, name, value):
        pass


class _DOMBuilder(HTMLParser):
    def __init__(self, doc: "Document"):
        super().__init__(convert_charrefs=True)
        self.doc = doc
        self.root: List[Any] = []
        self.stack: List[Element] = []

    def _add(self, node):
        if self.stack:
            self.stack[-1]._append_node(node)
        else:
            self.root.append(node)

    def handle_starttag(self, tag, attrs):
        el = Element(tag, self.doc)
        for k, v in attrs:
            el.attrs[k] = v if v is not None else ""
        self._add(el)
        if tag not in _VOID:
            self.stack.append(el)

    def handle_startendtag(self, tag, attrs):
        el = Element(tag, self.doc)
        for k, v in attrs:
            el.attrs[k] = v if v is not None else ""
        self._add(el)

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, -1, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data):
        if data:
            self._add(data)


class Document:
    def __init__(self, browser: "Browser"):
        self.browser = browser
        self.root = Element("html", self)
        self.body = Element("body", self)
        self.root._append_node(self.body)
        self.documentElement = self.root
        self.props: Dict[str, Any] = {}    # document.onkeydown etc.

    def fire(self, etype: str, **fields):
        """Dispatch a document-level event to the on<type> prop AND all
        addEventListener registrations (browser semantics)."""
        target = fields.pop("target", None) or self.body
        ev = JSObject({"type": etype, "target": target,
                       "preventDefault": lambda: UNDEF,
                       "stopPropagation": lambda: UNDEF, **fields})
        fired = False
        h = self.props.get("on" + etype)
        if h not in (None, UNDEF):
            _call(h, [ev])
            fired = True
        for lt, fn in list(self.props.get("__listeners__", [])):
            if lt == etype:
                _call(fn, [ev])
                fired = True
        return fired

    def parse_fragment(self, html: str) -> List[Any]:
        b = _DOMBuilder(self)
        b.feed(html)
        b.close()
        return b.root

    def js_get(self, name):
        if name in self.props:
            return self.props[name]
        if name == "getElementById":
            def _gid(i):
                for el in self.root.walk():
                    if el.attrs.get("id") == js_str(i):
                        return el
                return None
            return _gid
        if name == "querySelector":
            def _qs(sel):
                r = self.root.query_all(sel)
                return r[0] if r else None
            return _qs
        if name == "querySelectorAll":
            return lambda sel: self.root.query_all(sel)
        if name == "createElement":
            return lambda tag: Element(js_str(tag), self)
        if name == "createTextNode":
            return lambda t: js_str(t)
        if name == "body":
            return self.body
        if name == "documentElement":
            return self.documentElement
        if name == "addEventListener":
            def _ael(t, fn, *a):
                self.props.setdefault("__listeners__", []).append(
                    (js_str(t), fn))
                return UNDEF
            return _ael
        if name == "removeEventListener":
            return lambda *a: UNDEF
        if name == "title":
            return self.browser.title
        return UNDEF

    def js_set(self, name, value):
        if name == "title":
            self.browser.title = js_str(value)
            return
        self.props[name] = value


class WebSocketStub:
    OPEN = 1

    def __init__(self, browser: "Browser", url: str):
        self.browser = browser
        self.url = js_str(url)
        self.sent: List[str] = []
        self.readyState = 1.0
        self.props: Dict[str, Any] = {}
        browser.sockets.append(self)

    def js_get(self, name):
        if name == "send":
            def _send(data):
                self.sent.append(js_str(data))
                return UNDEF
            return _send
        if name == "close":
            def _close(*a):
                self.readyState = 3.0
                h = self.props.get("onclose")
                if h not in (None, UNDEF):
                    _call(h, [JSObject({"code": 1000.0})])
                return UNDEF
            return _close
        if name == "url":
            return self.url
        if name == "readyState":
            return self.readyState
        return self.props.get(name, UNDEF)

    def js_set(self, name, value):
        self.props[name] = value

    # host-side: simulate a server push
    def receive(self, data: str):
        h = self.props.get("onmessage")
        if h not in (None, UNDEF):
            _call(h, [JSObject({"data": data})])

    def open(self):
        h = self.props.get("onopen")
        if h not in (None, UNDEF):
            _call(h, [JSObject({})])


class Browser:
    """The host: wires esinterp globals to the DOM + live HTTP server."""

    def __init__(self, base_url: str, module_root: Path = STATIC):
        import httpx
        self.http = httpx.Client(base_url=base_url, timeout=30)
        self.base_url = base_url
        self.module_root = module_root
        self.title = ""
        self.sockets: List[WebSocketStub] = []
        self.timers: List[Any] = []       # (id, fn, args)
        self._timer_id = 0
        self.storage: Dict[str, str] = {}
        self.document = Document(self)
        host = base_url.split("://", 1)[1]
        self.location = JSObject({
            "hash": "", "protocol": "http:", "host": host,
            "origin": base_url, "pathname": "/",
            "reload": lambda *a: UNDEF})
        self.window = JSObject({
            "location": self.location,
            "addEventListener": lambda *a: UNDEF,
            "innerWidth": 1280.0, "innerHeight": 800.0,
            "scrollTo": lambda *a: UNDEF,
            "confirm": lambda *a: True,
            "alert": lambda *a: UNDEF,
            "prompt": lambda *a: None,
            "open": lambda *a: UNDEF,
        })
        self.interp = Interp(self._globals(), self._load_module)
        # window properties become bare globals lazily (window.go = nav)
        gv = self.interp.global_env.vars
        gv["go"] = lambda *a: _call(self.window.get("go"), list(a))
        gv["globalThis"] = self.window
        # the index shell: the real served page provides #main/#nav/#user
        r = self.http.get("/")
        body = re.search(r"<body[^>]*>(.*)</body>", r.text, re.S)
        self.document.body.children = self.document.parse_fragment(
            body.group(1) if body else r.text)
        for c in self.document.body.children:
            if isinstance(c, Element):
                c.parent = self.document.body

    # -- module loading ---------------------------------------------------
    def _load_module(self, path: str) -> str:
        assert path.startswith("/static/"), path
        f = self.module_root / path[len("/static/"):]
        return f.read_text()

    # -- timers -------------------------------------------------------------
    def set_timeout(self, fn, delay=0.0, *args):
        self._timer_id += 1
        self.timers.append((self._timer_id, fn, list(args)))
        return float(self._timer_id)

    def flush_timers(self) -> int:
        """Run every queued timeout once; returns how many ran."""
        pending, self.timers = self.timers, []
        for _, fn, args in pending:
            _call(fn, args)
        return len(pending)

    def _pump(self):
        if self.timers:
            _, fn, args = self.timers.pop(0)
            _call(fn, args)
            return True
        return False

    # -- fetch ----------------------------------------------------------------
    def _fetch(self, path, opts=UNDEF):
        import json as _j
        opts = opts if isinstance(opts, dict) else {}
        method = js_str(opts.get("method", "GET")).upper()
        headers = {js_str(k): js_str(v)
                   for k, v in (opts.get("headers") or {}).items()}
        body = opts.get("body", UNDEF)
        kwargs: Dict[str, Any] = {"headers": headers}
        if body is not UNDEF and body is not None:
            if isinstance(body, (str, bytes)):
                kwargs["content"] = body
            elif isinstance(body, FormDataStub):
                kwargs["files"] = body.files
                kwargs["data"] = body.fields
            else:
                kwargs["content"] = js_str(body)
        r = self.http.request(method, js_str(path), **kwargs)

        def _json():
            try:
                from lameness_tpu.utils.esinterp import _std_globals
                parse = self.interp.global_env.vars["JSON"]["parse"]
                return Promise(parse(r.text))
            except JSError as e:
                p = Promise(resolved=True)
                p.error = e.value
                return p

        return Promise(JSObject({
            "status": float(r.status_code),
            "ok": 200 <= r.status_code < 300,
            "statusText": r.reason_phrase,
            "url": js_str(path),
            "json": _json,
            "text": lambda: Promise(r.text),
            "headers": JSObject({"get": lambda k: r.headers.get(
                js_str(k), None)}),
        }))

    # -- globals ---------------------------------------------------------------
    def _globals(self) -> Dict[str, Any]:
        storage = self.storage

        local_storage = JSObject({
            "getItem": lambda k: storage.get(js_str(k), None),
            "setItem": lambda k, v: storage.__setitem__(js_str(k),
                                                        js_str(v)) or UNDEF,
            "removeItem": lambda k: storage.pop(js_str(k), None) and UNDEF,
            "clear": lambda: storage.clear() or UNDEF,
        })

        class _WSCtor:
            js_name = "WebSocket"

            def __init__(s2):
                pass

            def js_construct(s2, url, *a):
                return WebSocketStub(self, url)

            def js_get(s2, name):
                return 1.0 if name == "OPEN" else UNDEF

        class _FormDataCtor:
            js_name = "FormData"

            def js_construct(s2, *a):
                return FormDataStub()

            def js_get(s2, name):
                return UNDEF

        return {
            "document": self.document,
            "window": self.window,
            "location": self.location,
            "localStorage": local_storage,
            "sessionStorage": JSObject({
                "getItem": lambda k: None, "setItem": lambda k, v: UNDEF,
                "removeItem": lambda k: UNDEF}),
            "fetch": self._fetch,
            "WebSocket": _WSCtor(),
            "FormData": _FormDataCtor(),
            "setTimeout": self.set_timeout,
            "clearTimeout": lambda tid=UNDEF: UNDEF,
            "setInterval": lambda fn, d=0.0, *a: self.set_timeout(fn, d),
            "clearInterval": lambda tid=UNDEF: UNDEF,
            "requestAnimationFrame": lambda fn: self.set_timeout(fn, 0),
            "navigator": JSObject({"clipboard": JSObject({
                "writeText": lambda t: Promise(UNDEF)})}),
            "URLSearchParams": _URLSearchParamsCtor(),
            "URL": JSObject({"createObjectURL": lambda b: "blob:stub",
                             "revokeObjectURL": lambda u: UNDEF}),
            "Blob": lambda *a: JSObject({"size": 0.0}),
            "__pump__": self._pump,
        }

    # -- convenience for tests --------------------------------------------------
    def boot(self):
        """Execute the real app.js module (login shell, router, nav)."""
        return self.interp.run_module("/static/app.js")

    def login(self, username: str, password: str):
        """Seed the session the way the browser would hold it."""
        r = self.http.post("/api/auth/login",
                           json={"username": username, "password": password})
        r.raise_for_status()
        data = r.json()
        self.storage["token"] = data["access_token"]
        import json as _j
        self.storage["user"] = _j.dumps(data["user"])
        return data

    def by_id(self, i: str) -> Optional[Element]:
        for el in self.document.root.walk():
            if el.attrs.get("id") == i:
                return el
        return None

    def page_text(self) -> str:
        main = self.by_id("main")
        return main.text if main is not None else self.document.body.text


class URLSearchParamsStub:
    def __init__(self, init=UNDEF):
        from urllib.parse import parse_qsl
        self.pairs: List[List[str]] = []
        if isinstance(init, str):
            self.pairs = [[k, v] for k, v in
                          parse_qsl(init.lstrip("?"))]
        elif isinstance(init, dict):
            self.pairs = [[k, js_str(v)] for k, v in init.items()]

    def js_get(self, name):
        if name == "set":
            def _set(k, v):
                k = js_str(k)
                self.pairs = [p for p in self.pairs if p[0] != k]
                self.pairs.append([k, js_str(v)])
                return UNDEF
            return _set
        if name == "append":
            def _append(k, v):
                self.pairs.append([js_str(k), js_str(v)])
                return UNDEF
            return _append
        if name == "get":
            def _get_(k):
                for a, b2 in self.pairs:
                    if a == js_str(k):
                        return b2
                return None
            return _get_
        if name == "delete":
            def _del(k):
                self.pairs = [p for p in self.pairs if p[0] != js_str(k)]
                return UNDEF
            return _del
        if name == "toString":
            return lambda: str(self)
        return UNDEF

    def __str__(self):           # "…?" + q  string-concats through js_str
        from urllib.parse import urlencode
        return urlencode([tuple(x) for x in self.pairs])


class _URLSearchParamsCtor:
    js_name = "URLSearchParams"

    def js_construct(self, init=UNDEF):
        return URLSearchParamsStub(init)

    def js_get(self, name):
        return UNDEF

    def __call__(self, init=UNDEF):
        return URLSearchParamsStub(init)


class FormDataStub:
    def __init__(self):
        self.files: Dict[str, Any] = {}
        self.fields: Dict[str, str] = {}

    def js_get(self, name):
        if name == "append":
            def _append(k, v, filename=UNDEF):
                if isinstance(v, JSObject) and "__file__" in v:
                    self.files[js_str(k)] = (js_str(v.get("name", "f")),
                                             v["__file__"])
                else:
                    self.fields[js_str(k)] = js_str(v)
                return UNDEF
            return _append
        return UNDEF
