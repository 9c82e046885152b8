"""Unit tests: serializer, escape/unescape, encoding, DOM accessors,
extraction semantics, datagen determinism.

Serializer cases transcribed in the spirit of the reference's
HTMLSerializerTests.m:23-80; escape cases of HTMLEscapingTest.m:14-45;
encoding of HTMLEncodingTests.m / HTMLDocumentTests.m:14-48; DOM of
HTMLNodeTests.m / HTMLTreeEnumeratorTests.m:14-50.
"""

import pandas as pd
import pytest

from sparkhtml.dom import FlatDOM
from sparkhtml.encoding import (
    CERTAIN, IRRELEVANT, TENTATIVE, decode_html_bytes, encoding_for_label,
    sniff_encoding,
)
from sparkhtml.escape import (
    escape_html, escape_series, unescape_html, unescape_series,
)
from sparkhtml.extract import extract_main_text, extract_spans
from sparkhtml.serializer import inner_html, serialize
from sparkhtml.treebuilder import parse

# ------------------------------------------------------------- serializer

SERIALIZE_CASES = [
    ("<p>x</p>", '<html><head></head><body><p>x</p></body></html>'),
    ("<br>", "<html><head></head><body><br></body></html>"),
    ("<input type=text>", '<html><head></head><body><input type="text"></body></html>'),
    ("<p a='1&2'>x", '<html><head></head><body><p a="1&amp;2">x</p></body></html>'),
    ("a &lt; b", "<html><head></head><body>a &lt; b</body></html>"),
    # parser strips the LF after <pre> (HTMLParser.m:726); nothing to re-emit
    ("<pre>\nkeep</pre>", "<html><head></head><body><pre>keep</pre></body></html>"),
    ("<script>a < b</script>", "<html><head><script>a < b</script></head><body></body></html>"),
    ("<!DOCTYPE html><p>x", "<!DOCTYPE html><html><head></head><body><p>x</p></body></html>"),
]


@pytest.mark.parametrize("src,expected", SERIALIZE_CASES)
def test_serialize(src, expected):
    assert serialize(parse(src).document) == expected


def test_inner_html():
    tb = parse("<div><b>x</b>y</div>")
    body = tb.document.children[0].children[1]
    assert inner_html(body.children[0]) == "<b>x</b>y"


def test_pre_leading_newline_roundtrip():
    # tree text "\ntext" serializes with an extra LF so re-parsing strips it
    # back to the same tree (HTMLSerialization.m:152-158 rule)
    tb = parse("<pre>\n\ntext</pre>")
    out = serialize(tb.document)
    assert "<pre>\n\ntext</pre>" in out
    assert serialize(parse(out).document) == out


# ------------------------------------------------------------- escaping

def test_escape_html():
    assert escape_html('<b> & "q" \xa0') == "&lt;b&gt; &amp; &quot;q&quot; &nbsp;"


@pytest.mark.parametrize(
    "src,expected",
    [
        ("&amp;", "&"),
        ("&amp", "&"),
        ("&AMP;", "&"),
        ("&ampx", "&x"),
        ("&#65;&#x42;", "AB"),
        ("&#65", "A"),
        ("&notin;&not;&notit;", "∉¬¬it;"),
        ("&bogus;", "&bogus;"),
        ("no refs", "no refs"),
        ("&#x80;", "€"),
    ],
)
def test_unescape_html(src, expected):
    assert unescape_html(src) == expected


def test_escape_series_matches_scalar():
    vals = ['a<b>"c"&d\xa0e', "", "plain", "&amp; &x"]
    s = pd.Series(vals)
    assert list(escape_series(s)) == [escape_html(v) for v in vals]
    assert list(unescape_series(s)) == [unescape_html(v) for v in vals]


def test_escape_unescape_roundtrip():
    src = 'tricky <&> "text" \xa0 &amp; already'
    assert unescape_html(escape_html(src)) == src


# ------------------------------------------------------------- encoding

def test_labels():
    assert encoding_for_label("UTF-8") == "utf-8"
    assert encoding_for_label(" latin1 ") == "cp1252"
    assert encoding_for_label("unicodeFFFE") == "utf-16be"
    assert encoding_for_label("nope") is None


def test_sniff_bom():
    assert sniff_encoding(b"\xef\xbb\xbfx") == ("utf-8-sig", IRRELEVANT)
    assert sniff_encoding(b"\xfe\xffx") == ("utf-16-be", IRRELEVANT)
    assert sniff_encoding(b"\xff\xfex") == ("utf-16-le", IRRELEVANT)


def test_sniff_header_beats_meta():
    data = b'<meta charset="shift_jis">'
    assert sniff_encoding(data, "text/html; charset=utf-8") == ("utf-8", CERTAIN)
    assert sniff_encoding(data) == ("shift_jis", TENTATIVE)


def test_meta_content_charset():
    data = b'<meta http-equiv=Content-Type content="text/html; charset=koi8-r">'
    assert sniff_encoding(data) == ("koi8-r", TENTATIVE)


def test_decode_fallback():
    text, codec, conf = decode_html_bytes(b"caf\xe9")
    assert text == "café" and codec == "cp1252"


def test_decode_utf8_certain():
    text, codec, conf = decode_html_bytes(
        "héllo".encode(), "text/html; charset=utf-8"
    )
    assert (text, codec, conf) == ("héllo", "utf-8", CERTAIN)


# ------------------------------------------------------------- DOM

def test_dom_accessors():
    dom = FlatDOM.from_html("<!DOCTYPE html><p>a<b>b</b>c</p><p>d</p>")
    root = dom.root_element()
    assert dom.tag[root] == "html"
    body = dom.body_element()
    assert dom.tag[body] == "body"
    assert dom.text_content(body) == "abcd"
    ps = [i for i in dom.iter_elements() if dom.tag[i] == "p"]
    assert dom.text_components(ps[0]) == ["a", "c"]
    assert dom.document_type() is not None
    # tree order == ascending node ids (X1)
    assert dom.parent[ps[0]] == body
    assert sorted(dom.children_of(body)) == dom.children_of(body)


def test_dom_subtree_ranges():
    dom = FlatDOM.from_html("<div><p>a</p><p>b</p></div>")
    div = next(i for i in dom.iter_elements() if dom.tag[i] == "div")
    assert dom.subtree[div] - div == 5  # div, p, text, p, text


# ------------------------------------------------------------- extraction

def test_extract_drops_boilerplate():
    html = (
        "<nav><a href=/>a</a><a href=/2>b</a></nav>"
        "<p>Real content paragraph with enough words present.</p>"
        "<footer>copyright footer</footer>"
    )
    out = extract_main_text(html)
    assert "Real content" in out
    assert "copyright" not in out and ">a<" not in out


def test_extract_link_density():
    html = "<p><a href=1>all</a> <a href=2>links</a> <a href=3>here</a></p>"
    assert extract_main_text(html) == ""


def test_extract_keeps_short_content_tags():
    assert extract_main_text("<h1>Title</h1>") == "Title"
    assert extract_main_text("<div>hi</div>") == ""  # short non-content block


def test_extract_spans_order_and_media():
    spans = [
        {"kind": "media", "text": None, "media_ref": "m2", "offset": 2},
        {"kind": "text", "text": "<p>Words enough to keep this paragraph.</p>",
         "media_ref": None, "offset": 0},
        {"kind": "media", "text": None, "media_ref": "m1", "offset": 1},
        {"kind": "text", "text": "<nav><a href=/>x</a></nav>",
         "media_ref": None, "offset": 3},
    ]
    out = extract_spans(spans)
    assert [(s["kind"], s["media_ref"], s["offset"]) for s in out] == [
        ("text", None, 0), ("media", "m1", 1), ("media", "m2", 2),
    ]


def test_extract_deterministic():
    from datagen.interleaved import make_doc

    d1 = make_doc(7)
    d2 = make_doc(7)
    assert d1 == d2
    assert extract_spans(d1["spans"]) == extract_spans(d2["spans"])


def test_datagen_shape():
    from datagen.interleaved import make_corpus

    docs = list(make_corpus(50))
    assert len(docs) == 50
    assert all(d["doc_id"].startswith("doc-") for d in docs)
    kinds = {s["kind"] for d in docs for s in d["spans"]}
    assert kinds == {"text", "media"}
    # offsets are dense 0..n-1 per doc
    for d in docs:
        assert [s["offset"] for s in d["spans"]] == list(range(len(d["spans"])))


def test_metrics_batch_counts_parse_errors():
    """extract_metrics must report real parse-error counts (regression:
    collect_errors=False silently zeroed n_errors for every document)."""
    import pandas as pd
    from sparkhtml.spark.pipeline import _metrics_batch

    bad = "<b><i>x</b></i><p><table><div></div>"  # misnesting + foster
    good = "<!DOCTYPE html><p>hello world</p>"
    pdf = pd.DataFrame({
        "doc_id": ["bad", "good"],
        "spans": [
            [{"kind": "text", "text": bad, "media_ref": None, "offset": 0}],
            [{"kind": "text", "text": good, "media_ref": None, "offset": 0}],
        ],
    })
    out = pd.concat(list(_metrics_batch(iter([pdf]))))
    by_id = out.set_index("doc_id")
    assert by_id.loc["bad", "n_errors"] > 0
    assert by_id.loc["good", "n_errors"] == 0


def test_whatwg_label_table_complete():
    """Every label in the WHATWG Encoding Standard table (the 219-entry
    set the reference embeds, HTMLEncoding.m:124-360, plus post-2017
    additions) must resolve to the right canonical encoding — real crawl
    data hits the exotic labels."""
    import json
    import os

    from sparkhtml.encoding import decode_html_bytes, encoding_for_label

    # our python-codec name → WHATWG canonical encoding name
    canonical = {
        "utf-8": "UTF-8", "ibm866": "IBM866", "koi8-r": "KOI8-R",
        "koi8-u": "KOI8-U", "mac-roman": "macintosh",
        "cp874": "windows-874", "mac-cyrillic": "x-mac-cyrillic",
        "gbk": "GBK", "gb18030": "gb18030", "big5": "Big5",
        "euc-jp": "EUC-JP", "iso-2022-jp": "ISO-2022-JP",
        "shift_jis": "Shift_JIS", "euc-kr": "EUC-KR",
        "replacement": "replacement", "x-user-defined": "x-user-defined",
        "utf-16be": "UTF-16BE", "utf-16le": "UTF-16LE",
    }
    for i in (2, 3, 4, 5, 6, 7, 8, 10, 13, 14, 15, 16):
        canonical[f"iso-8859-{i}"] = f"ISO-8859-{i}"
    for i in range(1250, 1259):
        canonical[f"cp{i}"] = f"windows-{i}"

    path = os.path.join(
        os.path.dirname(__file__), "fixtures", "whatwg_encoding_labels.json"
    )
    table = json.load(open(path))["labels"]
    assert len(table) >= 219
    for label, want in table.items():
        codec = encoding_for_label(label)
        assert codec is not None, f"label {label!r} unresolved"
        got = canonical[codec]
        # the reference maps iso-8859-8-i labels to ISO-8859-8-I and the
        # x-mac-ukrainian label to x-mac-cyrillic per the standard
        if want in ("ISO-8859-8-I",):
            want = "ISO-8859-8"
        assert got == want, f"{label!r}: {got} != {want}"
        # uppercase + whitespace labels resolve too (spec: ASCII
        # case-insensitive, strip)
        assert encoding_for_label(f"  {label.upper()} ") == codec
    # every mapped codec either decodes bytes or is a handled sentinel
    import codecs as _codecs

    for codec in set(canonical) - {"replacement", "x-user-defined"}:
        assert _codecs.lookup(codec) is not None
        if not codec.startswith(("utf-16", "iso-2022")):
            assert b"ok".decode(codec) == "ok"
    text, codec, _ = decode_html_bytes(
        b"\x80abc", "text/html; charset=x-user-defined"
    )
    assert text == "abc" and codec == "x-user-defined"
    text, codec, _ = decode_html_bytes(b"anything", "text/html; charset=hz-gb-2312")
    assert text == "�" and codec == "replacement"


def test_depth_bomb_with_stray_end_p_does_not_crash():
    """Regression: inside a depth bomb the depth guard drops the recovery
    <p> that a stray </p> inserts; _pop_until then drained the stack and
    crashed (IndexError). Found by profiling the synthetic corpus."""
    html = "<div>" * 2000 + "</p>text after"
    # must not raise, on either the fragment or full-document path
    extract_main_text(html + "</div>" * 5)
    dom = FlatDOM.from_html(html)
    assert len(dom) > 0


def test_prescan_skips_commented_meta():
    """WHATWG prescan ignores <meta charset> inside comments (regression:
    a commented-out utf-16 meta won the sniff)."""
    assert sniff_encoding(
        b'<!-- <meta charset=utf-16> --><meta charset=ibm866>'
    ) == ("ibm866", TENTATIVE)
    # unterminated comment swallows the rest of the prescan window
    assert sniff_encoding(b'<!-- <meta charset=gbk>')[0] == "cp1252"
    # unknown (non-WHATWG) label falls through to the default
    assert sniff_encoding(b'<meta charset=cp874>')[0] == "cp1252"
    # and the real label family works
    assert sniff_encoding(b'<meta charset=windows-874>')[0] == "cp874"
