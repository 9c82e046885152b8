"""HTML serialization + html5lib-format tree dump.

Reference parity: /root/reference/Sources/HTMLSerialization.m —
``-serializedFragment`` / ``-innerHTML`` (:135-176,191-203, attribute
escaping, void elements, raw-text parents, pre/textarea/listing
leading-newline rule) and ``-recursiveDescription`` (:17-35) whose role
here is filled by :func:`html5lib_dump` (the golden format of the
tree-construction conformance corpus, HTMLTreeConstructionTests.m:105-135).
"""

from __future__ import annotations

from .treebuilder import (
    COMMENT, DOCTYPE, DOCUMENT, ELEMENT, NS_HTML, NS_MATHML, NS_SVG, TEXT,
    Node, VOID,
)

# Elements whose text children serialize unescaped
# (HTMLSerialization.m:37-47 "raw-text parents").
RAW_TEXT_PARENTS = frozenset(
    "style script xmp iframe noembed noframes plaintext".split()
)

# pre/textarea/listing re-emit a leading newline on serialization
# (HTMLSerialization.m:152-158).
NEWLINE_PREFIX = frozenset("pre textarea listing".split())


def escape_text(s: str) -> str:
    """Text-node escaping (HTMLSerialization.m:165 / NSString+HTMLEntities)."""
    return (
        s.replace("&", "&amp;")
        .replace("\xa0", "&nbsp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
    )


def escape_attr(s: str) -> str:
    """Attribute-value escaping (HTMLSerialization.m:140-147)."""
    return (
        s.replace("&", "&amp;").replace("\xa0", "&nbsp;").replace('"', "&quot;")
    )


def serialize(node: Node) -> str:
    """outerHTML of a node (``-serializedFragment``)."""
    out: list[str] = []
    _serialize_node(node, out)
    return "".join(out)


def inner_html(node: Node) -> str:
    """innerHTML (``-innerHTML`` getter, HTMLSerialization.m:191-196)."""
    out: list[str] = []
    for child in node.children:
        _serialize_node(child, out)
    return "".join(out)


def _serialize_node(node: Node, out: list[str]) -> None:
    kind = node.kind
    if kind == DOCUMENT:
        for child in node.children:
            _serialize_node(child, out)
        return
    if kind == DOCTYPE:
        out.append(f"<!DOCTYPE {node.tag or ''}>")
        return
    if kind == COMMENT:
        out.append(f"<!--{node.text}-->")
        return
    if kind == TEXT:
        parent = node.parent
        if (
            parent is not None
            and parent.kind == ELEMENT
            and parent.ns == NS_HTML
            and parent.tag in RAW_TEXT_PARENTS
        ):
            out.append(node.text)
        else:
            out.append(escape_text(node.text))
        return
    # element
    out.append("<")
    out.append(node.tag)
    for name, value in node.attrs:
        out.append(" ")
        out.append(name)
        out.append('="')
        out.append(escape_attr(value))
        out.append('"')
    out.append(">")
    if node.ns == NS_HTML and node.tag in VOID:
        return
    if (
        node.ns == NS_HTML
        and node.tag in NEWLINE_PREFIX
        and node.children
        and node.children[0].kind == TEXT
        and node.children[0].text.startswith("\n")
    ):
        out.append("\n")
    for child in node.children:
        _serialize_node(child, out)
    out.append(f"</{node.tag}>")


# ---------------------------------------------------------------------------
# html5lib golden dump (HTMLTreeConstructionTests.m:105-135 format)
# ---------------------------------------------------------------------------

_NS_PREFIX = {NS_MATHML: "math ", NS_SVG: "svg "}


def html5lib_dump(node: Node, indent: int = 0, _out: list[str] | None = None) -> str:
    top = _out is None
    out: list[str] = [] if top else _out
    if node.kind == DOCUMENT:
        for child in node.children:
            html5lib_dump(child, indent, out)
        return "\n".join(out) if top else ""
    pad = "| " + "  " * indent
    if node.kind == DOCTYPE:
        public = node.get_attr("public") or ""
        system = node.get_attr("system") or ""
        if public or system:
            out.append(f'{pad}<!DOCTYPE {node.tag or ""} "{public}" "{system}">')
        else:
            out.append(f"{pad}<!DOCTYPE {node.tag or ''}>")
    elif node.kind == COMMENT:
        out.append(f"{pad}<!-- {node.text} -->")
    elif node.kind == TEXT:
        out.append(f'{pad}"{node.text}"')
    else:
        prefix = _NS_PREFIX.get(node.ns, "")
        out.append(f"{pad}<{prefix}{node.tag}>")
        for name, value in sorted(node.attrs):
            out.append(f'{pad}  {name}="{value}"')
        child_indent = indent + 1
        if node.tag == "template" and not prefix:
            # HTML template contents live in the content fragment
            # (children in this model); html5lib format shows the
            # intervening 'content' pseudo-node
            out.append(f"{pad}  content")
            child_indent = indent + 2
        for child in node.children:
            html5lib_dump(child, child_indent, out)
        return "\n".join(out) if top else ""
    for child in node.children:
        html5lib_dump(child, indent + 1, out)
    return "\n".join(out) if top else ""


def dump_fragment(children: list[Node]) -> str:
    out: list[str] = []
    for child in children:
        html5lib_dump(child, 0, out)
    return "\n".join(out)
