"""HTML entity escape/unescape scalar functions.

Reference parity: /root/reference/Sources/NSString+HTMLEntities.m —
``-html_stringByEscapingForHTML`` (:13-25: ``& \\xa0 " < >``) and
``-html_stringByUnescapingHTML`` (:27-118: numeric & named entities,
missing-semicolon tolerance via longest-prefix match).

Both have vectorized variants for pandas Series (the Spark layer calls
those from Series→Series pandas UDFs; X8/X9 in SURVEY.md §2.5).
"""

from __future__ import annotations

import re

from .entities import consume_char_ref

_ESCAPES = [
    ("&", "&amp;"),
    ("\xa0", "&nbsp;"),
    ('"', "&quot;"),
    ("<", "&lt;"),
    (">", "&gt;"),
]


def escape_html(s: str) -> str:
    """X8: escape ``& \\xa0 " < >`` (NSString+HTMLEntities.m:13-25)."""
    for ch, rep in _ESCAPES:
        s = s.replace(ch, rep)
    return s


def unescape_html(s: str) -> str:
    """X9: resolve all character references, tolerant of missing semicolons
    (NSString+HTMLEntities.m:27-118). Not attribute context: the historical
    ``&xyz=`` suppression rule does not apply."""
    if "&" not in s:
        return s
    out = []
    i = 0
    n = len(s)
    while True:
        j = s.find("&", i)
        if j == -1:
            out.append(s[i:])
            break
        out.append(s[i:j])
        text, i = consume_char_ref(s, j, in_attribute=False, errors=None)
        out.append(text)
    return "".join(out)


# ---------------------------------------------------------------- pandas

def escape_series(series):
    """Vectorized X8 over a pandas Series (chained str.replace, all C-level)."""
    s = series.fillna("")
    for ch, rep in _ESCAPES:
        s = s.str.replace(ch, rep, regex=False)
    return s


_AMP_RE = re.compile(r"&[#a-zA-Z]")


def unescape_series(series):
    """Vectorized X9: only rows containing a candidate reference take the
    Python path; entity-free rows (the common case) pass through untouched."""
    s = series.fillna("")
    mask = s.str.contains(_AMP_RE, regex=True)
    if mask.any():
        s = s.where(~mask, s[mask].map(unescape_html))
    return s
