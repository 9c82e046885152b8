"""Command-line surface: parse/query/extract without writing code.

    python -m sparkhtml extract page.html          # main-content text
    python -m sparkhtml select 'div > p' page.html # matching nodes' text
    python -m sparkhtml text page.html             # whole-document textContent
    python -m sparkhtml dump page.html             # html5lib tree dump
    echo '<p>hi' | python -m sparkhtml extract -   # stdin

Bytes are decoded with the full sniffing pipeline (BOM → meta → cp1252).
"""

from __future__ import annotations

import argparse
import sys


def _read(path: str) -> bytes:
    if path == "-":
        return sys.stdin.buffer.read()
    with open(path, "rb") as f:
        return f.read()


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="python -m sparkhtml",
                                 description=__doc__,
                                 formatter_class=argparse.RawDescriptionHelpFormatter)
    sub = ap.add_subparsers(dest="cmd", required=True)
    p_extract = sub.add_parser("extract", help="main-content text")
    p_extract.add_argument("file")
    p_select = sub.add_parser("select", help="CSS-select, print textContent per match")
    p_select.add_argument("selector")
    p_select.add_argument("file")
    p_text = sub.add_parser("text", help="whole-document textContent")
    p_text.add_argument("file")
    p_dump = sub.add_parser("dump", help="html5lib-format tree dump")
    p_dump.add_argument("file")
    args = ap.parse_args(argv)

    from .api import Document
    from .extract import extract_main_text
    from .selector import SelectorError

    data = _read(args.file)
    if args.cmd == "extract":
        from .encoding import decode_html_bytes

        text, _codec, _conf = decode_html_bytes(data)
        print(extract_main_text(text, fragment=False))
        return 0
    doc = Document.from_bytes(data)
    if args.cmd == "text":
        print(doc.text_content)
        return 0
    if args.cmd == "dump":
        from .serializer import html5lib_dump

        print(html5lib_dump(doc.node))
        return 0
    # select
    try:
        matches = doc.query_selector_all(args.selector)
    except SelectorError as exc:
        print(f"error: {exc}", file=sys.stderr)
        return 2
    for el in matches:
        print(el.text_content)
    return 0


if __name__ == "__main__":
    sys.exit(main())
