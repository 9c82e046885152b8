"""Brute-force selector differential (round 5).

The round-5 combinator-chain bug survived four rounds because the
vectorized matcher and the DataFrame plan compiler shared the same
defective evaluation shape, so plan-vs-matcher parity held while both
were wrong. This file closes that class: an OBVIOUSLY-CORRECT
per-node recursive matcher — the reference's own evaluation strategy
(HTMLSelector.m:925-952: a closure per node, walking ancestors/siblings
directly) — is differential-tested against the vectorized matcher over
random documents × random selectors. Any future shared-shape defect in
the fast paths must now disagree with this third, structurally
different implementation.

Volume: N_SEL selector×doc pairs per run (default 4000; one-off
evidence runs at 100k+ recorded in COVERAGE.md).
"""

from __future__ import annotations

import os
import random

from sparkhtml.dom import FlatDOM
from sparkhtml.selector import (
    CompiledSelector, Complex, Compound, Simple, parse_selector,
)

ELEMENT = 1
TEXT = 2

N_SEL = int(os.environ.get("SPARKHTML_SELDIFF_N", "4000"))
SEED = int(os.environ.get("SPARKHTML_SELDIFF_SEED", "5"))


# ------------------------------------------------- reference implementation


def _ref_match_simple(dom: FlatDOM, i: int, s: Simple) -> bool:
    if dom.kind[i] != ELEMENT:
        return False
    if s.kind == "universal":
        return True
    if s.kind == "type":
        return (dom.tag[i] or "").lower() == s.name
    if s.kind == "id":
        return dom.get_attr(i, "id") == s.name
    if s.kind == "class":
        cls = dom.get_attr(i, "class") or ""
        return s.name in cls.replace("\t", " ").replace("\n", " ").split()
    if s.kind == "attr":
        v = dom.get_attr(i, s.name)
        if s.operator == "":
            return v is not None
        if v is None:
            return False
        if s.operator == "=":
            return v == s.value
        if s.operator == "~=":
            return s.value in v.replace("\t", " ").replace("\n", " ").split()
        if s.operator == "^=":
            return bool(s.value) and v.startswith(s.value)
        if s.operator == "$=":
            return bool(s.value) and v.endswith(s.value)
        if s.operator == "*=":
            return bool(s.value) and s.value in v
        if s.operator == "|=":
            return v == s.value or v.startswith(s.value + "-")
    if s.kind == "not":
        return not any(
            _ref_match_complex_at(dom, i, cx)
            for cx in s.inner.complexes
        )
    if s.kind == "pseudo":
        return _ref_match_pseudo(dom, i, s)
    raise AssertionError(f"unhandled simple {s.kind}")


def _el_siblings(dom: FlatDOM, i: int) -> list[int]:
    p = dom.parent[i]
    if p < 0:
        return [i]
    return [c for c in dom.children_of(p) if dom.kind[c] == ELEMENT]


def _ref_match_pseudo(dom: FlatDOM, i: int, s: Simple) -> bool:
    name = s.name
    sibs = _el_siblings(dom, i)
    if name == "first-child":
        return sibs[0] == i
    if name == "last-child":
        return sibs[-1] == i
    if name == "only-child":
        return len(sibs) == 1
    typed = [c for c in sibs if dom.tag[c] == dom.tag[i]]
    if name == "first-of-type":
        return typed[0] == i
    if name == "last-of-type":
        return typed[-1] == i
    if name == "only-of-type":
        return len(typed) == 1
    if name in ("nth-child", "nth-last-child", "nth-of-type",
                "nth-last-of-type"):
        group = typed if "of-type" in name else sibs
        pos = group.index(i) + 1
        if "last" in name:
            pos = len(group) - group.index(i)
        a, b = s.nth
        if a == 0:
            return pos == b
        d = pos - b
        return d % a == 0 and d // a >= 0
    if name == "root":
        return dom.parent[i] >= 0 and dom.kind[dom.parent[i]] == 0
    if name == "empty":
        for c in dom.children_of(i):
            if dom.kind[c] == ELEMENT or (
                dom.kind[c] == TEXT and dom.text[c]
            ):
                return False
        return True
    if name == "link":
        return (dom.tag[i] in ("a", "area", "link")
                and dom.get_attr(i, "href") is not None)
    if name in ("visited", "active", "hover", "focus"):
        return False
    if name == "checked":
        return (dom.tag[i] == "input"
                and dom.get_attr(i, "checked") is not None) or (
            dom.tag[i] == "option"
            and dom.get_attr(i, "selected") is not None)
    if name in ("enabled", "disabled"):
        # defer to the engine's own disabled mask for the fieldset rule —
        # it has its own unit fixtures; here we only differential the
        # COMBINATOR algebra around it
        from sparkhtml.selector import _disabled_mask

        dis = _disabled_mask(dom)
        can = ("button", "input", "select", "textarea", "optgroup",
               "option", "fieldset")
        if name == "disabled":
            return dis[i]
        return dom.tag[i] in can and not dis[i]
    raise AssertionError(f"unhandled pseudo {name}")


def _ref_match_compound(dom: FlatDOM, i: int, comp: Compound) -> bool:
    return dom.kind[i] == ELEMENT and all(
        _ref_match_simple(dom, i, s) for s in comp.simples
    )


def _ref_match_complex_at(dom: FlatDOM, i: int, cx: Complex) -> bool:
    """Right-to-left PER-NODE recursion — the reference's strategy, and
    deliberately a different algorithm from the vectorized matcher's
    left-to-right mask accumulation."""

    def rec(node: int, ci: int) -> bool:
        if not _ref_match_compound(dom, node, cx.compounds[ci]):
            return False
        if ci == 0:
            return True
        comb = cx.combinators[ci - 1]
        if comb == ">":
            p = dom.parent[node]
            return p >= 0 and rec(p, ci - 1)
        if comb == " ":
            p = dom.parent[node]
            while p >= 0:
                if rec(p, ci - 1):
                    return True
                p = dom.parent[p]
            return False
        if comb == "+":
            sibs = _el_siblings(dom, node)
            k = sibs.index(node)
            return k > 0 and rec(sibs[k - 1], ci - 1)
        if comb == "~":
            sibs = _el_siblings(dom, node)
            k = sibs.index(node)
            return any(rec(sibs[j], ci - 1) for j in range(k))
        raise AssertionError(comb)

    return rec(i, len(cx.compounds) - 1)


def ref_match_ids(dom: FlatDOM, selector: str) -> list[int]:
    group = parse_selector(selector)
    out = []
    for i in range(len(dom)):
        if dom.kind[i] != ELEMENT:
            continue
        if any(_ref_match_complex_at(dom, i, cx) for cx in group.complexes):
            out.append(i)
    return out


# ------------------------------------------------------------- generators

TAGS = ["div", "p", "span", "a", "ul", "li", "b", "em", "section"]
CLASSES = ["c0", "c1", "c2", "box"]
IDS = ["i0", "i1", "i2", "i3", "i4", "i5", "i6", "i7"]
ATTRS = ["data-x", "data-y", "lang"]
VALS = ["aa", "bb", "aa-bb", "aa bb"]


def gen_dom(rng: random.Random) -> FlatDOM:
    parts = []

    def el(depth: int) -> None:
        tag = rng.choice(TAGS)
        attrs = ""
        if rng.random() < 0.5:
            attrs += f' class="{" ".join(rng.sample(CLASSES, rng.randint(1, 2)))}"'
        if rng.random() < 0.3:
            attrs += f' id={rng.choice(IDS)}'
        if rng.random() < 0.3:
            attrs += f' {rng.choice(ATTRS)}="{rng.choice(VALS)}"'
        if rng.random() < 0.1:
            attrs += ' href=/x'
        parts.append(f"<{tag}{attrs}>")
        for _ in range(rng.randint(0, 3)):
            if depth < 4 and rng.random() < 0.55:
                el(depth + 1)
            elif rng.random() < 0.7:
                parts.append("t")
        parts.append(f"</{tag}>")

    for _ in range(rng.randint(1, 3)):
        el(0)
    return FlatDOM.from_html("".join(parts))


def gen_simple(rng: random.Random) -> str:
    r = rng.random()
    if r < 0.25:
        return rng.choice(TAGS)
    if r < 0.35:
        return "." + rng.choice(CLASSES)
    if r < 0.45:
        return "#" + rng.choice(IDS)
    if r < 0.55:
        op = rng.choice(["", "=", "~=", "^=", "$=", "*=", "|="])
        a = rng.choice(ATTRS)
        return f"[{a}]" if op == "" else f"[{a}{op}'{rng.choice(VALS)}']"
    if r < 0.62:
        return "*"
    if r < 0.9:
        return rng.choice(TAGS) + rng.choice([
            ":first-child", ":last-child", ":only-child", ":first-of-type",
            ":last-of-type", ":only-of-type", ":empty", ":root",
            f":nth-child({rng.choice(['2', 'odd', 'even', '2n+1', '3n'])})",
            f":nth-last-child({rng.choice(['1', '2n'])})",
            f":nth-of-type({rng.choice(['2', 'odd'])})",
        ])
    inner = rng.choice(TAGS + ["." + c for c in CLASSES])
    return rng.choice(TAGS) + f":not({inner})"


def gen_selector(rng: random.Random) -> str:
    n = rng.randint(1, 4)  # up to 4 compounds → up to 3 combinators
    parts = [gen_simple(rng)]
    for _ in range(n - 1):
        parts.append(rng.choice([" ", " > ", " + ", " ~ "]))
        parts.append(gen_simple(rng))
    sel = "".join(parts)
    if rng.random() < 0.15:
        sel += ", " + gen_simple(rng)
    return sel


# ----------------------------------------------------------------- tests


def test_bruteforce_differential_corpus():
    rng = random.Random(SEED)
    doms = [gen_dom(rng) for _ in range(40)]
    for i in range(N_SEL):
        dom = doms[i % len(doms)]
        sel = gen_selector(rng)
        fast = CompiledSelector(sel).match_ids(dom)
        ref = ref_match_ids(dom, sel)
        assert fast == ref, (i, sel, fast, ref)


def test_bruteforce_differential_chain_shapes():
    """The exact shapes of the round-5 bug, against the reference
    recursion on a fixed document."""
    dom = FlatDOM.from_html(
        "<div id=i0 class=c0><ul class=c1><li id=i1 class='c0 c2'>a</li>"
        "<li class=c2>b</li></ul><div class=c1><a class=c2 href=/x>"
        "<div class=box><p id=i2 class=c0>t</p></div></a></div></div>"
        "<section><div><div><span id=i3>s</span></div></div></section>"
    )
    for sel in [
        "section>div>div>span", "div div a div p", "div>ul>li",
        "html body div ul li.c2", "div.c1 a.c2 div.box p#i2",
        "ul li div", "li ul div", "div + section", "div ~ section",
        "#i0 .c1 > li + li", "div .c1 .c2 .box p",
    ]:
        assert CompiledSelector(sel).match_ids(dom) == \
            ref_match_ids(dom, sel), sel
