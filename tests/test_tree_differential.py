"""Independent-implementation TREE-CONSTRUCTION differential (round 6,
VERDICT r5 next-round #3).

The round-5 stdlib differential covered tokenizer EVENTS only; tree
construction still rested on self-generated goldens plus fused-vs-pull
self-differentials (two same-author realizations can share a defect —
the round-5 selector-chain bug proved it). This closes the gap as far
as the sandbox allows: over a CONSTRAINED well-formed-nesting grammar,
CPython's ``html.parser`` plus a trivial push/pop stack yields the
UNAMBIGUOUS element skeleton — every start tag opens exactly one
element where it stands, every end tag closes the top — so the WHATWG
algorithm must produce the identical tree, and any divergence is a real
bug in one side's tag/attr/text/structure handling.

Grammar constraints (what makes the skeleton unambiguous):
  - explicit tight scaffolding: ``<!DOCTYPE html><html><head>...</head>
    <body>...</body></html>``, no inter-tag whitespace at the top level
  - every non-void element explicitly closed, properly nested
  - no constructs where WHATWG inserts anywhere other than write-order:
    no tables (foster parenting), no p-followed-by-block or li/dd/dt
    sibling chains (implied end tags), no misnesting (adoption agency),
    no <a> inside <a>, no nested same-name headings, ul children are
    only li
  - character references with semicolons only; comments without ``--``;
    script/style rawtext without ``</``; no bare ``<``, NUL, or CR

Error-recovery paths excluded here are pinned independently by the
hand-derived WHATWG spec goldens (whatwg_spec.dat, spec §13.2.10 +
derived cases, expected trees worked out on paper from the spec
algorithm). The reference runs upstream html5lib-tests
(HTMLTreeConstructionTests.m:32-258); this is the sandbox analogue.
Volume: N_DOCS per run (default 2000); the 100k evidence run is
recorded in COVERAGE.md.
"""

from __future__ import annotations

import os
import random
from html.parser import HTMLParser

from sparkhtml.treebuilder import COMMENT, DOCTYPE, ELEMENT, TEXT, parse

N_DOCS = int(os.environ.get("SPARKHTML_DIFF_DOCS", "2000"))
SEED = int(os.environ.get("SPARKHTML_DIFF_SEED", "6"))

VOIDS = {"br", "img", "hr", "input", "wbr", "col"}
RAW = ["script", "style"]
BLOCK = ["div", "section", "article", "blockquote", "ul", "h1", "h2", "p",
         "table", "dl", "pre", "form"]
INLINE = ["span", "b", "i", "em", "strong", "a", "code", "small"]
WORDS = ["alpha", "beta", "gamma", "delta", "words", "Héllo", "naïve", "42",
         "mixed CASE", "tail"]
ENTS = ["&amp;", "&lt;", "&gt;", "&quot;", "&#65;", "&#x41;", "&eacute;",
        "&hellip;"]
ATTR_NAMES = ["class", "id", "data-x", "href", "title", "lang"]


def _text(rng: random.Random) -> str:
    parts = []
    for _ in range(rng.randint(1, 4)):
        parts.append(rng.choice(WORDS))
        if rng.random() < 0.35:
            parts.append(rng.choice(ENTS))
    return " ".join(parts)


def _attrs(rng: random.Random) -> str:
    out = []
    for name in rng.sample(ATTR_NAMES, rng.randint(0, 3)):
        style = rng.random()
        val = rng.choice(WORDS).replace(" ", "-") + (
            rng.choice(ENTS) if rng.random() < 0.3 else "")
        if style < 0.15:
            out.append(name)
        elif style < 0.55:
            out.append(f'{name}="{val}"')
        elif style < 0.8:
            out.append(f"{name}='{val}'")
        else:
            out.append(f"{name}={val}")
    return (" " + " ".join(out)) if out else ""


def _inline(rng: random.Random, depth: int, in_a: bool) -> str:
    parts = []
    for _ in range(rng.randint(1, 3)):
        r = rng.random()
        if r < 0.5 or depth > 3:
            parts.append(_text(rng))
        elif r < 0.6:
            parts.append(f"<{rng.choice(('br', 'img', 'wbr'))}{_attrs(rng)}>")
        elif r < 0.68:
            parts.append(f"<!--{rng.choice(WORDS)} {rng.choice(WORDS)}-->")
        else:
            tags = [t for t in INLINE if not (in_a and t == "a")]
            tag = rng.choice(tags)
            parts.append(
                f"<{tag}{_attrs(rng)}>"
                f"{_inline(rng, depth + 1, in_a or tag == 'a')}</{tag}>"
            )
    return "".join(parts)


def _table(rng: random.Random, depth: int) -> str:
    """Fully-explicit table markup: every structural element written and
    closed, NO text directly inside table/tbody/tr (the only shapes
    where WHATWG inserts anywhere other than write-order are the
    implied/fostered ones the grammar excludes)."""
    parts = [f"<table{_attrs(rng)}>"]
    if rng.random() < 0.3:
        parts.append(f"<caption>{_inline(rng, depth + 2, False)}</caption>")
    if rng.random() < 0.25:
        cols = "".join(f"<col{_attrs(rng)}>" for _ in range(rng.randint(1, 2)))
        parts.append(f"<colgroup>{cols}</colgroup>")
    parts.append("<tbody>")
    for _ in range(rng.randint(1, 3)):
        parts.append("<tr>")
        for _ in range(rng.randint(1, 3)):
            cell = rng.choice(("td", "th"))
            parts.append(
                f"<{cell}{_attrs(rng)}>{_flow(rng, depth + 3)}</{cell}>"
            )
        parts.append("</tr>")
    parts.append("</tbody></table>")
    return "".join(parts)


def _flow(rng: random.Random, depth: int) -> str:
    parts = []
    for _ in range(rng.randint(1, 4)):
        r = rng.random()
        if r < 0.3 or depth > 3:
            parts.append(_text(rng))
        elif r < 0.38:
            parts.append(f"<{rng.choice(('hr', 'input', 'img'))}{_attrs(rng)}>")
        elif r < 0.45:
            parts.append(f"<!--{rng.choice(WORDS)}-->")
        elif r < 0.52:
            tag = rng.choice(RAW)
            body = " ".join(rng.choice(WORDS) for _ in range(3))
            if rng.random() < 0.5:
                body += " if (a<b) { x = a && b; }"
            parts.append(f"<{tag}>{body}</{tag}>")
        else:
            tag = rng.choice(BLOCK + INLINE)
            if tag == "ul":
                items = "".join(
                    f"<li{_attrs(rng)}>{_flow(rng, depth + 2)}</li>"
                    for _ in range(rng.randint(1, 3))
                )
                parts.append(f"<ul{_attrs(rng)}>{items}</ul>")
            elif tag == "table":
                parts.append(_table(rng, depth))
            elif tag == "dl":
                items = "".join(
                    f"<dt{_attrs(rng)}>{_inline(rng, depth + 2, False)}</dt>"
                    f"<dd{_attrs(rng)}>{_flow(rng, depth + 2)}</dd>"
                    for _ in range(rng.randint(1, 2))
                )
                parts.append(f"<dl{_attrs(rng)}>{items}</dl>")
            elif tag == "pre":
                # content must not START with \n (spec skips it; the
                # stdlib does not) — _text never leads with a newline
                parts.append(f"<pre{_attrs(rng)}>{_text(rng)}</pre>")
            elif tag == "form":
                # forms never nest (the form-element pointer ignores an
                # inner <form>) — strip form from the inner choices by
                # bumping depth into the inline-only regime at random
                parts.append(
                    f"<form{_attrs(rng)}>{_inline(rng, depth + 1, False)}"
                    "</form>"
                )
            elif tag in ("p", "h1", "h2") or tag in INLINE:
                parts.append(
                    f"<{tag}{_attrs(rng)}>"
                    f"{_inline(rng, depth + 1, tag == 'a')}</{tag}>"
                )
            else:
                parts.append(
                    f"<{tag}{_attrs(rng)}>{_flow(rng, depth + 1)}</{tag}>"
                )
    # two adjacent text parts would merge unpredictably mid-generation;
    # the builders both coalesce, so that's fine — no fixup needed
    return "".join(parts)


def gen_doc(rng: random.Random) -> str:
    title = rng.choice(WORDS)
    return (
        "<!DOCTYPE html><html><head>"
        f"<title>{title}</title></head>"
        f"<body>{_flow(rng, 0)}</body></html>"
    )


# ----------------------------------------------------- stdlib skeleton


class _StackBuilder(HTMLParser):
    """html.parser events + the trivial stack: the unambiguous skeleton
    for the cooperative grammar. Any grammar leak (unbalanced tag)
    raises — a generator bug, not a differential diff."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root: list = ["#root", (), []]
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = [tag, tuple(sorted((k, v or "") for k, v in attrs)), []]
        self.stack[-1][2].append(node)
        if tag not in VOIDS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self.stack[-1][2].append(
            [tag, tuple(sorted((k, v or "") for k, v in attrs)), []]
        )

    def handle_endtag(self, tag):
        assert self.stack[-1][0] == tag, (tag, self.stack[-1][0])
        self.stack.pop()

    def handle_data(self, data):
        kids = self.stack[-1][2]
        if kids and kids[-1][0] == "#text":
            kids[-1][1] += data
        else:
            kids.append(["#text", data])

    def handle_comment(self, data):
        self.stack[-1][2].append(["#comment", data])


def stdlib_skeleton(doc: str):
    p = _StackBuilder()
    p.feed(doc)
    p.close()
    assert len(p.stack) == 1, "generator emitted unbalanced tags"
    return _freeze(p.root[2])


def _freeze(kids):
    out = []
    for k in kids:
        if k[0] == "#text":
            out.append(("#text", k[1]))
        elif k[0] == "#comment":
            out.append(("#comment", k[1]))
        else:
            out.append((k[0], k[1], _freeze(k[2])))
    return tuple(out)


def our_skeleton(doc: str, use_turbo: bool = True):
    tb = parse(doc, use_turbo=use_turbo, collect_errors=True)
    assert not tb.errors, (tb.errors, doc)

    def walk(node):
        out = []
        for c in node.children:
            if c.kind == TEXT:
                out.append(("#text", c.text))
            elif c.kind == COMMENT:
                out.append(("#comment", c.text))
            elif c.kind == ELEMENT:
                out.append(
                    (c.tag, tuple(sorted((k, v) for k, v in c.attrs)),
                     walk(c))
                )
            elif c.kind == DOCTYPE:
                pass
        return tuple(out)

    return walk(tb.document)


def test_tree_skeleton_differential_corpus():
    rng = random.Random(SEED)
    for i in range(N_DOCS):
        doc = gen_doc(rng)
        ours = our_skeleton(doc)
        std = stdlib_skeleton(doc)
        assert ours == std, (i, doc)


def test_tree_skeleton_handpicked():
    cases = [
        "<!DOCTYPE html><html><head><title>t</title></head><body>"
        "<div class='a'><span id=b>x &amp; y</span><br>tail</div>"
        "</body></html>",
        "<!DOCTYPE html><html><head><title>t</title></head><body>"
        "<ul><li>one</li><li><b><i>two</i></b></li></ul><!--c-->"
        "</body></html>",
        "<!DOCTYPE html><html><head><title>t</title></head><body>"
        "<script>if (a<b) { x = a && b; }</script>"
        "<p>para <a href='u?a=1&amp;b=2'>link</a> &eacute;</p>"
        "</body></html>",
        "<!DOCTYPE html><html><head><title>t</title></head><body>"
        "<h1>h</h1><section><article>deep<hr><code>c&#x41;d</code>"
        "</article></section></body></html>",
    ]
    for doc in cases:
        assert our_skeleton(doc, True) == stdlib_skeleton(doc), doc
        assert our_skeleton(doc, False) == stdlib_skeleton(doc), doc
