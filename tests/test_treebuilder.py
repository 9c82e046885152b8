"""Tree-construction conformance against html5lib-format .dat goldens.

Harness mirrors the reference's HTMLTreeConstructionTests.m: the golden
``| ``-indented dump format (:105-135), fragment contexts incl. ``svg ``
and ``math `` prefixes (:220-236); parse-error counts logged, not
asserted (:246-255).
"""

import glob
import os

import pytest

from sparkhtml.serializer import dump_fragment, html5lib_dump
from sparkhtml.treebuilder import parse, parse_fragment

FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "fixtures", "tree-construction"
)


def _parse_dat(path):
    cases = []
    current = None
    section = None
    for line in open(path).read().split("\n"):
        if line == "#data":
            if current and current.get("data") is not None:
                cases.append(current)
            current = {"data": [], "document": [], "fragment": None}
            section = "data"
        elif line == "#errors":
            section = "errors"
        elif line == "#document":
            section = "document"
        elif line == "#document-fragment":
            section = "fragment"
        elif current is not None:
            if section == "data":
                current["data"].append(line)
            elif section == "document":
                current["document"].append(line)
            elif section == "fragment" and line:
                current["fragment"] = line
    if current and current.get("data") is not None:
        cases.append(current)
    out = []
    for c in cases:
        data = "\n".join(c["data"])
        doc = "\n".join(c["document"]).rstrip("\n")
        while doc.endswith("\n"):
            doc = doc[:-1]
        out.append((data, doc.rstrip(), c["fragment"]))
    return out


def _load_cases():
    params = []
    for path in sorted(glob.glob(os.path.join(FIXTURE_DIR, "*.dat"))):
        suite = os.path.basename(path)
        for i, (data, expected, fragment) in enumerate(_parse_dat(path)):
            params.append(
                pytest.param(data, expected, fragment, id=f"{suite}:{i}")
            )
    return params


@pytest.mark.parametrize("data,expected,fragment", _load_cases())
def test_tree_construction(data, expected, fragment):
    if fragment:
        nodes = parse_fragment(data, fragment)
        got = dump_fragment(nodes)
    else:
        tb = parse(data)
        got = html5lib_dump(tb.document)
    assert got == expected, f"input={data!r}\n--- expected ---\n{expected}\n--- got ---\n{got}"


def test_implied_cell_boundary_fused_matches_pull():
    """Round-5 turbo fusion of the IMPLIED cell boundary (<td>a<td>b —
    the common web table shape; r4 fused only the explicit </td><td>
    chain): tree + error-multiset equality with the pull path across the
    boundary variants."""
    from sparkhtml.serializer import html5lib_dump
    from sparkhtml.treebuilder import parse

    cases = [
        "<table><tr><td>a<td>b<td>c</table>",
        "<table><tr><td>a<th>b<td>c</tr><tr><td>d</table>",
        "<table><tr><td><b>x<td>y</table>",      # AFE crosses boundary
        "<table><tr><td><p>x<td>y</table>",      # implied </p> first
        "<table><tr><td>a<td/></table>",         # self-closing td
        "<table><tr><td>a<td class=q>b</table>",
        "<table><tbody><tr><td>1<td>2<tr><td>3<td>4</table>",
        "<table><tr><td>a<svg><g/></svg><td>b</table>",
        "<table><tr><td>a<td><table><tr><td>n1<td>n2</table>"
        "<td>after</table>",
        "<table><tr><th>h1<th>h2<tr><td>d1<td>d2</table>",
    ]
    for c in cases:
        fused = parse(c, use_turbo=True)
        pull = parse(c, use_turbo=False)
        assert html5lib_dump(fused.document) == html5lib_dump(pull.document), c
        assert sorted(fused.errors) == sorted(pull.errors), c
