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
    no foster parenting (tables fully explicit), no misnesting (adoption
    agency), no <a> inside <a>, no nested same-name headings
  - round-6b EXTENSION into the implied-end-tag family: unclosed
    <li>/<dt>/<dd>/<p> chains ARE generated; the stdlib side resolves
    them with a four-rule pop table (P_CLOSERS/IMPLIED_END below) — a
    trivial, structurally independent realization of "generate implied
    end tags" valid under this grammar, not a port of the algorithm
  - round-6b syntax variation: case-mangled tag/attribute names,
    duplicate attributes (first occurrence wins), self-closing void
    syntax, whitespace before ``>``; plus select/optgroup/option,
    textarea (RCDATA, no leading LF), iframe (rawtext, entity-free),
    details/summary, fieldset/legend, figure/figcaption, button leaves,
    and the main/aside/header/footer/nav sectioning family
  - character references with semicolons only; comments without ``--``;
    script/style rawtext without ``</``; no bare ``<``, NUL, or CR

Also differentialed against the same independent skeleton (round 6b):
the FRAGMENT algorithm (div/span contexts) and the SERIALIZER
(serialize our tree → stdlib reparse → original skeleton required).

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
         "table", "dl", "pre", "form", "main", "aside", "header", "footer",
         "nav", "figure", "fieldset", "details", "select", "textarea",
         "iframe"]
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


def _case(rng: random.Random, name: str) -> str:
    """Randomly case-mangle a tag/attr name (both sides must lowercase:
    WHATWG ASCII-lowercases tag and attribute names; so does
    html.parser)."""
    if rng.random() < 0.85:
        return name
    return "".join(
        c.upper() if rng.random() < 0.5 else c for c in name
    )


def _attrs(rng: random.Random) -> str:
    out = []
    names = rng.sample(ATTR_NAMES, rng.randint(0, 3))
    if names and rng.random() < 0.15:
        # duplicate attribute: the spec drops all but the FIRST
        # occurrence (parse error, value kept from the first)
        names.append(names[0])
    for name in names:
        style = rng.random()
        val = rng.choice(WORDS).replace(" ", "-") + (
            rng.choice(ENTS) if rng.random() < 0.3 else "")
        name = _case(rng, name)
        if style < 0.15:
            out.append(name)
        elif style < 0.55:
            out.append(f'{name}="{val}"')
        elif style < 0.8:
            out.append(f"{name}='{val}'")
        else:
            out.append(f"{name}={val}")
    return (" " + " ".join(out)) if out else ""


def _tag(rng: random.Random, tag: str, attrs: str = "", void: bool = False) -> str:
    """Start tag with optional case-mangling, trailing space, and (voids
    only — on non-voids the spec treats ``/>`` as a plain start tag while
    html.parser does not) self-closing slash."""
    pad = " " if rng.random() < 0.1 else ""
    slash = "/" if (void and rng.random() < 0.3) else ""
    return f"<{_case(rng, tag)}{attrs}{pad}{slash}>"


def _etag(rng: random.Random, tag: str) -> str:
    pad = " " if rng.random() < 0.1 else ""
    return f"</{_case(rng, tag)}{pad}>"


def _inline(rng: random.Random, depth: int, in_a: bool) -> str:
    parts = []
    for _ in range(rng.randint(1, 3)):
        r = rng.random()
        if r < 0.5 or depth > 3:
            parts.append(_text(rng))
        elif r < 0.6:
            parts.append(_tag(rng, rng.choice(('br', 'img', 'wbr')), _attrs(rng), void=True))
        elif r < 0.68:
            parts.append(f"<!--{rng.choice(WORDS)} {rng.choice(WORDS)}-->")
        elif r < 0.72:
            parts.append(
                f"<button{_attrs(rng)}>{_text(rng)}</button>"
            )
        else:
            tags = [t for t in INLINE if not (in_a and t == "a")]
            tag = rng.choice(tags)
            parts.append(
                f"{_tag(rng, tag, _attrs(rng))}"
                f"{_inline(rng, depth + 1, in_a or tag == 'a')}{_etag(rng, tag)}"
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
            parts.append(_tag(rng, rng.choice(('hr', 'input', 'img')), _attrs(rng), void=True))
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
                if rng.random() < 0.4:
                    # implied </li>: sibling <li> and </ul> both close the
                    # open item (content inline-only keeps it unambiguous)
                    items = "".join(
                        f"<li{_attrs(rng)}>{_inline(rng, depth + 2, False)}"
                        for _ in range(rng.randint(1, 3))
                    )
                else:
                    items = "".join(
                        f"<li{_attrs(rng)}>{_flow(rng, depth + 2)}</li>"
                        for _ in range(rng.randint(1, 3))
                    )
                parts.append(f"<ul{_attrs(rng)}>{items}</ul>")
            elif tag == "table":
                parts.append(_table(rng, depth))
            elif tag == "dl":
                if rng.random() < 0.4:
                    # implied </dt>/</dd> chains
                    items = "".join(
                        f"<dt{_attrs(rng)}>{_inline(rng, depth + 2, False)}"
                        f"<dd{_attrs(rng)}>{_inline(rng, depth + 2, False)}"
                        for _ in range(rng.randint(1, 2))
                    )
                else:
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
            elif tag == "select":
                # "in select" mode inserts in write-order as long as every
                # option/optgroup is explicitly closed and no select nests
                opts = []
                for _ in range(rng.randint(1, 3)):
                    body = "".join(
                        f"<option{_attrs(rng)}>{_text(rng)}</option>"
                        for _ in range(rng.randint(1, 2))
                    )
                    if rng.random() < 0.4:
                        opts.append(
                            f'<optgroup label="{rng.choice(WORDS)}">'
                            f"{body}</optgroup>"
                        )
                    else:
                        opts.append(body)
                parts.append(f"<select{_attrs(rng)}>{''.join(opts)}</select>")
            elif tag == "textarea":
                # RCDATA: charrefs resolve, no '<', content must not start
                # with \n (ignore-first-LF on our side only)
                parts.append(f"<textarea{_attrs(rng)}>{_text(rng)}</textarea>")
            elif tag == "iframe":
                # RAWTEXT: no charref resolution on our side, so content
                # is entity-free plain words (html.parser resolves refs in
                # normal data — keep the two models coincident)
                body = " ".join(rng.choice(WORDS) for _ in range(3))
                parts.append(f"<iframe{_attrs(rng)}>{body}</iframe>")
            elif tag == "fieldset":
                legend = (
                    f"<legend>{_inline(rng, depth + 2, False)}</legend>"
                    if rng.random() < 0.6 else ""
                )
                parts.append(
                    f"<fieldset{_attrs(rng)}>{legend}"
                    f"{_inline(rng, depth + 1, False)}</fieldset>"
                )
            elif tag == "details":
                parts.append(
                    f"<details{_attrs(rng)}><summary>"
                    f"{_inline(rng, depth + 2, False)}</summary>"
                    f"{_flow(rng, depth + 1)}</details>"
                )
            elif tag == "figure":
                cap = (
                    f"<figcaption>{_inline(rng, depth + 2, False)}"
                    "</figcaption>" if rng.random() < 0.5 else ""
                )
                parts.append(
                    f"<figure{_attrs(rng)}>{cap}{_flow(rng, depth + 1)}"
                    "</figure>"
                )
            elif tag == "p" and rng.random() < 0.4:
                # unclosed <p>: whatever follows behaves identically in
                # both models — text/inline/comment flow INTO it, a
                # P_CLOSERS start tag or the parent's end tag closes it
                parts.append(f"<p{_attrs(rng)}>{_inline(rng, depth + 1, False)}")
            elif tag in ("p", "h1", "h2") or tag in INLINE:
                parts.append(
                    f"<{tag}{_attrs(rng)}>"
                    f"{_inline(rng, depth + 1, tag == 'a')}</{tag}>"
                )
            else:
                parts.append(
                    f"{_tag(rng, tag, _attrs(rng))}{_flow(rng, depth + 1)}"
                    f"{_etag(rng, tag)}"
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


# Start tags that implicitly close an open <p> (WHATWG "close a p
# element" callers present in this grammar), plus the self-sibling rules
# for list items / description-list items. These four pop rules are the
# ONLY recovery machinery on the stdlib side — a trivial table, not a
# re-implementation of the algorithm — and they make the implied-end-tag
# constructs below unambiguous.
P_CLOSERS = {
    "p", "div", "section", "article", "blockquote", "ul", "dl", "pre",
    "form", "main", "aside", "header", "footer", "nav", "figure",
    "fieldset", "details", "h1", "h2", "table", "hr",
}
IMPLIED_END = {"p", "li", "dd", "dt"}


class _StackBuilder(HTMLParser):
    """html.parser events + the trivial stack: the unambiguous skeleton
    for the cooperative grammar. Any grammar leak (unbalanced tag)
    raises — a generator bug, not a differential diff."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root: list = ["#root", (), []]
        self.stack = [self.root]

    def _implied_pops(self, tag):
        top = self.stack[-1][0]
        if top == "p" and tag in P_CLOSERS:
            self.stack.pop()
        elif top == "li" and tag == "li":
            self.stack.pop()
        elif top in ("dd", "dt") and tag in ("dd", "dt"):
            self.stack.pop()

    @staticmethod
    def _dedup(attrs):
        # spec: all but the FIRST occurrence of an attribute name dropped
        seen, out = set(), []
        for k, v in attrs:
            if k not in seen:
                seen.add(k)
                out.append((k, v or ""))
        return tuple(sorted(out))

    def handle_starttag(self, tag, attrs):
        self._implied_pops(tag)
        node = [tag, self._dedup(attrs), []]
        self.stack[-1][2].append(node)
        if tag not in VOIDS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self._implied_pops(tag)
        self.stack[-1][2].append([tag, self._dedup(attrs), []])

    def handle_endtag(self, tag):
        while (
            self.stack[-1][0] != tag and self.stack[-1][0] in IMPLIED_END
        ):
            self.stack.pop()
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
    # end-of-input closes any still-open implied-end elements (tree
    # position is already final; only the stack bookkeeping remains)
    while len(p.stack) > 1 and p.stack[-1][0] in IMPLIED_END:
        p.stack.pop()
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


# ------------------------------------------------ fragment + serializer


def _fragment_skeleton(nodes):
    from sparkhtml.treebuilder import Node  # noqa: F401  (doc typing only)

    def walk(children):
        out = []
        for c in children:
            if c.kind == TEXT:
                out.append(("#text", c.text))
            elif c.kind == COMMENT:
                out.append(("#comment", c.text))
            elif c.kind == ELEMENT:
                out.append(
                    (c.tag, tuple(sorted((k, v) for k, v in c.attrs)),
                     walk(c.children))
                )
        return tuple(out)

    return walk(nodes)


def test_fragment_skeleton_differential_corpus():
    """Same unambiguous-grammar argument, applied to the FRAGMENT
    algorithm: parsing grammar flow content in a <div> (or inline content
    in a <span>) context must reproduce the stdlib stack skeleton — an
    independent check on the fragment path (context setup, reset
    insertion mode, fragment-case branches), which the doc-level
    differential never enters."""
    from sparkhtml.treebuilder import parse_fragment

    rng = random.Random(SEED + 1000)
    for i in range(max(N_DOCS // 2, 200)):
        if rng.random() < 0.5:
            frag, ctx = _flow(rng, 0), "div"
        else:
            frag, ctx = _inline(rng, 0, False), "span"
        for turbo in (True, False):
            ours = _fragment_skeleton(parse_fragment(frag, ctx, use_turbo=turbo))
            std = stdlib_skeleton(frag)
            assert ours == std, (i, ctx, turbo, frag)


def test_serialize_reparse_skeleton_differential():
    """Serializer correctness via an independent reader: serialize OUR
    parsed tree, re-read the HTML with the stdlib skeleton builder, and
    require the original skeleton back. Any serializer escaping/quoting
    defect (attr quoting, text escaping, void forms, rawtext bodies)
    surfaces as a skeleton diff — no same-author parser in the loop on
    the read side."""
    from sparkhtml.serializer import serialize

    rng = random.Random(SEED + 2000)
    for i in range(max(N_DOCS // 2, 200)):
        doc = gen_doc(rng)
        tb = parse(doc, collect_errors=True)
        assert not tb.errors, doc
        html = serialize(tb.document)
        assert stdlib_skeleton(html) == our_skeleton(doc), (i, doc, html)
