"""HTMLReader-shaped API facade tests (parity with HTMLNodeTests.m /
HTMLDocumentTests.m / HTMLElementTests usage patterns)."""

from sparkhtml.api import Document, Element, escape_html, unescape_html


def make_doc():
    return Document(
        "<!DOCTYPE html><html><head><title>T</title></head><body>"
        "<div id=main class='a b'><p>one</p><p>two <b>bold</b></p></div>"
        "</body></html>"
    )


def test_document_accessors():
    doc = make_doc()
    assert doc.root.tag_name == "html"
    assert doc.body.tag_name == "body"
    assert doc.head.tag_name == "head"
    assert doc.doctype is not None
    assert doc.quirks_mode == 0
    assert doc.n_parse_errors == 0


def test_from_bytes():
    doc = Document.from_bytes(
        "<p>héllo</p>".encode("utf-8"), "text/html; charset=utf-8"
    )
    assert doc.encoding == "utf-8" and doc.confidence == "certain"
    assert doc.query_selector("p").text_content == "héllo"


def test_query():
    doc = make_doc()
    assert [e.text_content for e in doc.query_selector_all("p")] == [
        "one", "two bold"
    ]
    assert doc.query_selector("#main").get("class") == "a b"
    assert doc.query_selector("nav") is None


def test_text_content_set():
    doc = make_doc()
    p = doc.query_selector("p")
    p.text_content = "replaced"
    assert p.inner_html == "replaced"
    assert "replaced" in doc.body.text_content


def test_inner_html_roundtrip():
    doc = make_doc()
    div = doc.query_selector("#main")
    assert div.inner_html == "<p>one</p><p>two <b>bold</b></p>"
    div.inner_html = "<ul><li>x<li>y</ul>"
    assert [e.tag_name for e in div.child_element_nodes] == ["ul"]
    assert div.text_content == "xy"


def test_classes():
    doc = make_doc()
    div = doc.query_selector("div")
    assert div.has_class("a") and not div.has_class("c")
    div.toggle_class("c")
    assert div.has_class("c")
    div.toggle_class("a")
    assert not div.has_class("a")


def test_mutation():
    doc = make_doc()
    div = doc.query_selector("#main")
    p = div.child_element_nodes[0]
    div.remove_child(p)
    assert [e.text_content for e in div.child_element_nodes] == ["two bold"]
    div.append_child(p)
    assert [e.text_content for e in div.child_element_nodes] == ["two bold", "one"]
    div.insert_string("mid", 1)
    assert div.text_content == "two boldmidone"
    # coalescing with adjacent text (HTMLNode.m:176-196)
    div.insert_string("!", 2)
    assert div.text_components == ["mid!"]


def test_tree_enumerator():
    doc = make_doc()
    tags = [e.tag_name for e in doc.tree_enumerator() if e.kind == 1]
    assert tags == ["html", "head", "title", "body", "div", "p", "p", "b"]
    rev = [e.tag_name for e in doc.tree_enumerator(reversed_=True) if e.kind == 1]
    assert rev == ["html", "body", "div", "p", "b", "p", "head", "title"]


def test_escape_reexports():
    assert escape_html("<") == "&lt;"
    assert unescape_html("&lt;") == "<"


def test_parent_element():
    doc = make_doc()
    b = doc.query_selector("b")
    assert b.parent_element.tag_name == "p"
    assert doc.root.parent_element is None
