"""JS-semantics regressions in the ES interpreter — each test pins a
finding from the round-5 high-effort review of esinterp/eslex/
support_browser (ASI, optional-chain short-circuit, ToInt32, regex
match, promise chaining, spread-in-new, selectors, select value)."""
import numpy as np
import pytest

from lameness_tpu.utils.esinterp import (UNDEF, Interp, JSObject, Promise,
                                         _call, js_str)


def run(src, **globs):
    interp = Interp(dict(globs), lambda p: {"/m.js": src}[p])
    return interp.run_module("/m.js")


def test_return_asi_newline_terminates():
    """A newline after `return` ends the statement (ASI): the guard
    must NOT swallow and execute the next line."""
    mod = run("""
let ran = false;
function f(skip) {
  if (skip) return
  ran = true;
}
export function probe() { ran = false; f(true); return ran; }
export function probe2() { ran = false; f(false); return ran; }
""")
    assert mod["probe"]() is False       # guard bailed; ran untouched
    assert mod["probe2"]() is True


def test_optional_chain_short_circuits_whole_chain():
    mod = run("""
export function f(a) { return a?.items.length; }
export function g(a) { return a?.items.map(x => x)[0]; }
export function h(a) { return a?.fn(); }
""")
    assert mod["f"](None) is UNDEF
    assert mod["f"](UNDEF) is UNDEF
    assert mod["f"](JSObject({"items": [1, 2]})) == 2.0
    assert mod["g"](None) is UNDEF
    assert mod["h"](None) is UNDEF


def test_bitwise_toint32_on_nan_and_infinity():
    mod = run("""
export const a = undefined | 0;
export const b = ~NaN;
export const c = Infinity >> 1;
export const d = (1 << 31);
export const e = ("abc" | 0) + (3.9 | 0);
""")
    assert mod["a"] == 0.0
    assert mod["b"] == -1.0
    assert mod["c"] == 0.0
    assert mod["d"] == -2147483648.0
    assert mod["e"] == 3.0


def test_string_match_global_with_groups_returns_full_matches():
    mod = run("""
export const m = "a1b2".match(/([a-z])(\\d)/g);
export const one = "x9y8".match(/([a-z])\\d/g);
export const none = "zz".match(/\\d/g);
""")
    assert mod["m"] == ["a1", "b2"]
    assert mod["one"] == ["x9", "y8"]
    assert mod["none"] is None


def test_pending_promise_then_unwraps_and_rejects():
    mod = run("""
export function chain(p, fn) { return p.then(fn); }
""")
    p = Promise(resolved=False)
    inner = Promise(resolved=True)
    inner.value = 42.0
    derived = _call(mod["chain"], [p, lambda v: inner])
    assert not derived.resolved
    p.resolve(1.0)
    assert derived.resolved and derived.value == 42.0


def test_spread_into_new():
    mod = run("""
export const m = new Map(...[[["k", 7]]]);
export const got = m.get("k");
export const d = new Set(...[[1, 2, 2]]).size;
""")
    assert mod["got"] == 7.0
    assert mod["d"] == 2.0


def test_template_unicode_escapes():
    mod = run(r"""
export const t = `✓ ok\x21`;
export const s = "✓";
""")
    assert mod["t"] == "✓ ok!"
    assert mod["s"] == "✓"


def test_dom_compound_selectors_and_select_value():
    from tests.support_browser import Browser, Document, Element

    class _B:                               # minimal stand-in browser
        pass

    doc = Document.__new__(Document)
    doc.browser = _B()
    doc.props = {}
    doc.root = Element("html", doc)
    doc.body = Element("body", doc)
    doc.root._append_node(doc.body)
    doc.documentElement = doc.root
    doc.body.children = doc.parse_fragment(
        '<div><button class="a b" data-id="3">x</button>'
        '<button class="a">y</button>'
        '<select id="s"><option value="one">one</option>'
        '<option value="two" selected>two</option></select></div>')
    for c in doc.body.children:
        c.parent = doc.body
    root = doc.body
    assert len(root.query_all("button.a.b")) == 1
    assert len(root.query_all("button.a")) == 2
    assert len(root.query_all('[data-id="3"]')) == 1
    assert len(root.query_all("[data-id=3]")) == 1       # unquoted
    assert len(root.query_all("button.a, select")) == 3
    sel = root.query_all("select")[0]
    assert sel.js_get("value") == "two"                  # selected attr


def test_document_addeventlistener_dispatches():
    from tests.support_browser import Document

    doc = Document.__new__(Document)
    doc.props = {}
    seen = []
    ael = None

    class _B:
        pass
    doc.browser = _B()
    from tests.support_browser import Element
    doc.root = Element("html", doc)
    doc.body = Element("body", doc)
    doc.root._append_node(doc.body)
    doc.documentElement = doc.root
    doc.js_get("addEventListener")("keydown", lambda ev: seen.append(
        js_str(ev["key"])))
    assert doc.fire("keydown", key="3")
    assert seen == ["3"]
