"""Selector engine unit tests, ported from the reference's test doc shape
(HTMLSelectorTests.m:20-44) with per-selector expected id lists (:83-93),
nth-expression table (:49-81) and error cases (:239-252)."""

import pytest

from sparkhtml.dom import FlatDOM
from sparkhtml.selector import (
    CompiledSelector, SelectorError, parse_nth, select,
)

# structure shaped like HTMLSelectorTests.m:20-44 (root/parent/sibling ids)
DOC = """<!DOCTYPE html><html id=root><head id=head></head><body id=body>
<div id=d1 class="box first" lang=en-US>
  <p id=p1 class=box>one</p>
  <p id=p2>two</p>
  <span id=s1></span>
  <p id=p3 data-x="hello world">three</p>
</div>
<div id=d2>
  <input id=i1 type=checkbox checked>
  <input id=i2 disabled>
  <a id=a1 href="http://example.com/page.html">link</a>
</div>
</body></html>"""


@pytest.fixture(scope="module")
def dom():
    return FlatDOM.from_html(DOC)


def ids(dom, sel):
    return [dom.get_attr(i, "id") for i in select(dom, sel)]


CASES = [
    ("p", ["p1", "p2", "p3"]),
    ("*", None),  # presence only
    ("#p2", ["p2"]),
    (".box", ["d1", "p1"]),
    (".box.first", ["d1"]),
    ("div p", ["p1", "p2", "p3"]),
    ("div > p", ["p1", "p2", "p3"]),
    ("body > p", []),
    ("p + p", ["p2"]),
    ("span + p", ["p3"]),
    ("p ~ span", ["s1"]),
    ("p ~ p", ["p2", "p3"]),
    ("[data-x]", ["p3"]),
    ('[data-x="hello world"]', ["p3"]),
    ("[data-x~=hello]", ["p3"]),
    ("[data-x^=hel]", ["p3"]),
    ("[data-x$=world]", ["p3"]),
    ("[data-x*='lo wo']", ["p3"]),
    ("[lang|=en]", ["d1"]),
    ("p:first-child", ["p1"]),
    ("p:last-child", ["p3"]),
    ("span:nth-child(3)", ["s1"]),
    ("p:nth-child(2n)", ["p2", "p3"]),
    ("p:nth-child(odd)", ["p1"]),
    ("p:nth-last-child(1)", ["p3"]),
    ("p:nth-of-type(2)", ["p2"]),
    ("p:nth-of-type(3)", ["p3"]),
    ("span:first-of-type", ["s1"]),
    ("span:only-of-type", ["s1"]),
    ("div p:not(.box)", ["p2", "p3"]),
    ("p:not(#p1):not(#p2)", ["p3"]),
    ("span:empty", ["s1"]),
    ("p:empty", []),
    (":root", ["root"]),
    (":checked", ["i1"]),
    (":disabled", ["i2"]),
    ("input:enabled", ["i1"]),
    (":link", ["a1"]),
    (":visited", []),
    ("p, span", ["p1", "p2", "s1", "p3"]),  # tree order
    ("#d1 > :nth-child(2)", ["p2"]),
    # ≥2-combinator chains (round-5 fix: the old right-to-left loop kept
    # the mask anchored at the rightmost compound, so intermediate links
    # never had to connect and ancestor order was ignored)
    ("body>div>p", ["p1", "p2", "p3"]),
    ("html>body>div>p", ["p1", "p2", "p3"]),
    ("body>p>div", []),             # wrong order must not match
    ("div body p", []),             # unordered ancestors must not match
    ("html body div p", ["p1", "p2", "p3"]),
    ("body > div > input", ["i1", "i2"]),
    ("#root #body #d1 #p2", ["p2"]),
    ("div > p + p ~ p", ["p3"]),    # chain through both sibling kinds
    ("body > div p + span", ["s1"]),
    ("head body div", []),          # head is not an ancestor of div
]


@pytest.mark.parametrize("sel,expected", CASES, ids=[c[0] for c in CASES])
def test_selector(dom, sel, expected):
    got = ids(dom, sel)
    if expected is None:
        assert len(got) > 5
    else:
        assert got == expected, f"{sel}: {got} != {expected}"


# nth-expression table (HTMLSelectorTests.m:49-81)
NTH = [
    ("odd", (2, 1)),
    ("even", (2, 0)),
    ("2n+1", (2, 1)),
    ("2n", (2, 0)),
    ("n", (1, 0)),
    ("-n+3", (-1, 3)),
    ("3", (0, 3)),
    ("+5", (0, 5)),
    ("-5", (0, -5)),
    ("10n-1", (10, -1)),
    ("10n+9", (10, 9)),
    (" 3n + 1 ", (3, 1)),
]


@pytest.mark.parametrize("expr,expected", NTH, ids=[n[0] for n in NTH])
def test_nth(expr, expected):
    assert parse_nth(expr) == expected


@pytest.mark.parametrize(
    "bad", ["", "p >", "[x=", ":nth-child(foo)", "p::before", "{", "6n+2n"]
)
def test_selector_errors(bad):
    with pytest.raises(SelectorError):
        CompiledSelector(bad)


def test_first_id(dom):
    cs = CompiledSelector("p")
    assert dom.get_attr(cs.first_id(dom), "id") == "p1"


def test_compiled_reuse(dom):
    cs = CompiledSelector("div > p.box")
    assert [dom.get_attr(i, "id") for i in cs.match_ids(dom)] == ["p1"]
    dom2 = FlatDOM.from_html("<div><p class=box id=q>x</p></div>")
    assert [dom2.get_attr(i, "id") for i in cs.match_ids(dom2)] == ["q"]
