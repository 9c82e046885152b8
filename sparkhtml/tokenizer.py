"""WHATWG HTML5 tokenizer (spec §13.2.5) — pure Python, bulk-scan optimized.

Reference parity: /root/reference/Sources/HTMLTokenizer.m (68 states, one
method per state dispatched by -resume at :2014-2157; pull enumeration at
:2337-2346) and /root/reference/Sources/HTMLPreprocessedInputStream.m
(CRLF normalization :104-155, bulk text-run scanning :41-58).

Design notes (Spark-first, see SURVEY.md §7.0):

- This module is *library code that runs inside Arrow-batched pandas UDFs* —
  one ``Tokenizer`` per document, exactly the reference's granularity
  (HTMLParser.m:3331-3347). Nothing here is a Spark stage.
- Text runs, attribute values, comments and doctypes are consumed with
  ``str.find`` / precompiled regex bulk scans instead of char-at-a-time —
  the same optimization the reference performs manually with
  ``consumeCharactersUpToFirstPassingTest`` (HTMLPreprocessedInputStream.m:41-58).
- The tokenizer pauses after every emitted token so the tree builder can
  flip its state (RCDATA/RAWTEXT/script-data switches, HTMLParser.m:3272-3277)
  — the tokenizer⇄builder feedback loop noted at SURVEY.md §2.2 T8.

Tokens are tuples:

    ("Character", data)                       # data may be a multi-char run
    ("StartTag", name, attrs, self_closing)   # attrs: list[(name, value)]
    ("EndTag", name, attrs, self_closing)
    ("Comment", data)
    ("DOCTYPE", name, public_id, system_id, force_quirks)
    ("EOF",)

Parse errors are appended to ``Tokenizer.errors`` (error *codes*, counted —
not asserted in order — matching the reference's test posture,
HTMLTokenizerTests.m:165-181).
"""

from __future__ import annotations

from collections import deque

import re
from typing import Callable, Optional

from .entities import consume_char_ref

# ---------------------------------------------------------------------------
# State identifiers (mirrors HTMLTokenizerState.h:10-80; superset per the
# current spec's comment-less-than-sign refinements).
# ---------------------------------------------------------------------------

DATA = "data"
RCDATA = "rcdata"
RAWTEXT = "rawtext"
SCRIPT_DATA = "script-data"
PLAINTEXT = "plaintext"

_WS = "\t\n\x0c "
_ASCII_ALPHA = set("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ")

_RE_TAG_NAME = re.compile(r"[^\t\n\x0c />\0]+")
_RE_ATTR_NAME = re.compile(r"[^\t\n\x0c /=>\0\"'<]+")
_RE_ATTR_VALUE_DQ = re.compile(r"[^\"&\0]+")
_RE_ATTR_VALUE_SQ = re.compile(r"[^'&\0]+")
_RE_ATTR_VALUE_UQ = re.compile(r"[^\t\n\x0c >&\0\"'<=`]+")
_RE_WS = re.compile(r"[\t\n\x0c ]+")
_RE_ALPHA_RUN = re.compile(r"[a-zA-Z]+")
# fast path: a complete attr-less lowercase tag (the overwhelmingly common
# case in real HTML) matched in one step from tag-open / end-tag-open
_RE_SIMPLE_TAG = re.compile(r"([a-z][a-z0-9]*)>")

# Optimistic fast path for tags WITH attributes: matches only shapes whose
# state-machine run is error-free and needs no lowercasing/charref work —
# anything else (uppercase, charrefs in values, NULs, '<' in unquoted,
# duplicate attrs, '/' after an unquoted value, missing inter-attr space)
# fails the match and falls back to the per-state machine. Possessive
# quantifiers (3.11+) keep failure linear — no backtracking blowup.
_RE_FAST_TAG = re.compile(
    r'([a-z][a-z0-9]*+)'
    r'((?:[\t\n\x0c ]++[a-z][a-z0-9_.:-]*+'
    r'(?:=(?:"[^"&\x00]*+"|\x27[^\x27&\x00]*+\x27'
    r'|[^\t\n\x0c "\x27=<>&`\x00/]++))?+)*+)'
    r'([\t\n\x0c ]*+)(/?)>'
)
_RE_FAST_ATTR = re.compile(
    r'[\t\n\x0c ]++([a-z][a-z0-9_.:-]*+)'
    r'(?:=(?:"([^"]*+)"|\x27([^\x27]*+)\x27|([^\t\n\x0c >]++)))?'
)
# unquoted value at the very end of the attr run: '/' would belong to it
_RE_UNQUOTED_TAIL = re.compile(r'=[^\s"\x27]*+$')

_STOP_DATA = re.compile(r"[<&\x00]")
_STOP_RAW = re.compile(r"[<\x00]")
_STOP_SCRIPT_ESC = re.compile(r"[<\x00-]")
_STOP_COMMENT = re.compile(r"[<\x00-]")
_STOP_DT_DQ = re.compile(r"[\">\x00]")
_STOP_DT_SQ = re.compile(r"['>\x00]")

_LOWER = str.maketrans(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz"
)


def match_fast_tag(s: str, i: int):
    """Match a complete, error-free start tag with simple attributes at
    ``s[i:]`` (``i`` just past the ``<``). Returns
    ``(name, attrs, self_closing, end_index)`` or None → caller takes the
    per-state machine. Shared by the tokenizer fast path and the fused
    builder loop (treebuilder._turbo_in_body)."""
    m = _RE_FAST_TAG.match(s, i)
    if m is None:
        return None
    name, attrs_s, ws, slash = m.group(1, 2, 3, 4)
    if slash and not ws and _RE_UNQUOTED_TAIL.search(attrs_s):
        # '/' directly after an unquoted value belongs to the value
        return None
    attrs: list[tuple[str, str]] = []
    if attrs_s:
        seen = set()
        for am in _RE_FAST_ATTR.finditer(attrs_s):
            aname = am.group(1)
            if aname in seen:
                return None  # dup-attr drops + errors: slow path
            seen.add(aname)
            v = am.group(2)
            if v is None:
                v = am.group(3)
            if v is None:
                v = am.group(4)
            attrs.append((aname, v if v is not None else ""))
    return name, attrs, bool(slash), m.end()


class Tokenizer:
    """Pull tokenizer: ``next_token()`` returns one token or None at EOF end.

    The owner (tree builder) may set :attr:`state` between tokens and read
    or seed :attr:`last_start_tag` (fragment parsing, HTMLParser.m:84-99).
    ``cdata_allowed`` is the adjusted-current-node-is-foreign callback
    (HTMLTokenizer.m:1267 weak-parser consultation).
    """

    def __init__(
        self,
        text: str,
        state: str = DATA,
        last_start_tag: Optional[str] = None,
        cdata_allowed: Optional[Callable[[], bool]] = None,
        collect_errors: bool = True,
    ) -> None:
        # Input preprocessing (HTMLPreprocessedInputStream.m:109-155):
        # CRLF/CR → LF once, up front; NULs stay (handled per state).
        if "\r" in text:
            text = text.replace("\r\n", "\n").replace("\r", "\n")
        self.s = text
        self.n = len(text)
        self.i = 0
        self.state = state
        self.last_start_tag = last_start_tag
        self.cdata_allowed = cdata_allowed
        self.errors: list[str] = [] if collect_errors else _NullList()
        self._queue: deque[tuple] = deque()
        self._eof_emitted = False
        # current tag under construction
        self._tag_name = ""
        self._tag_is_end = False
        self._tag_self_closing = False
        self._attrs: list[list[str]] = []  # [name, value] pairs (mutable)
        self._attr_seen: set[str] = set()
        self._attr_dropped = False
        # current comment / doctype
        self._buf = ""
        self._dt_name: Optional[str] = None
        self._dt_public: Optional[str] = None
        self._dt_system: Optional[str] = None
        self._dt_quirks = False
        # temporary buffer (rcdata/rawtext/script end-tag scan)
        self._tmp = ""

    # ------------------------------------------------------------------ api

    def next_token(self) -> Optional[tuple]:
        q = self._queue
        while not q:
            if self._eof_emitted:
                return None
            _STATES[self.state](self)
        return q.popleft()

    def tokens(self):
        while True:
            t = self.next_token()
            if t is None:
                return
            yield t

    # ------------------------------------------------------------- emit

    def _emit_char(self, data: str) -> None:
        if data:
            self._queue.append(("Character", data))

    def _emit_eof(self) -> None:
        self._eof_emitted = True
        self._queue.append(("EOF",))

    def _emit_tag(self) -> None:
        name = self._tag_name
        if self._tag_is_end:
            if self._attrs:
                self.errors.append("end-tag-with-attributes")
            if self._tag_self_closing:
                self.errors.append("end-tag-with-trailing-solidus")
            self._queue.append(("EndTag", name, [], False))
        else:
            self.last_start_tag = name
            attrs = (
                [(a[0], a[1]) for a in self._attrs] if self._attrs else []
            )
            self._queue.append(("StartTag", name, attrs, self._tag_self_closing))

    def _new_tag(self, is_end: bool) -> None:
        self._tag_name = ""
        self._tag_is_end = is_end
        self._tag_self_closing = False
        self._attrs = []
        self._attr_seen = set()
        self._attr_dropped = False

    def _start_attr(self, name: str = "") -> None:
        self._finish_attr_name()
        self._attrs.append([name, ""])
        self._attr_dropped = False

    def _finish_attr_name(self) -> None:
        """Duplicate-attribute check at the end of a name
        (HTMLTokenizer.m:2232-2242)."""
        if self._attrs and not self._attr_dropped:
            name = self._attrs[-1][0]
            if name in self._attr_seen:
                self.errors.append("duplicate-attribute")
                self._attrs.pop()
                self._attrs.append(["￿dup", ""])  # sentinel, dropped at emit
                self._attr_dropped = True
            else:
                self._attr_seen.add(name)

    def _seal_attrs(self) -> None:
        if self._attrs:
            self._finish_attr_name()
            self._attrs = [a for a in self._attrs if a[0] != "￿dup"]

    # ------------------------------------------------------------- states
    # Each method consumes ≥1 char (or emits EOF) then returns; bulk scans
    # consume whole runs. self.i points at the next unconsumed char.

    def _data(self) -> None:
        s, i, n = self.s, self.i, self.n
        if i >= n:
            self._emit_eof()
            return
        c = s[i]
        if c == "<":
            self.i = i + 1
            self.state = "tag-open"
            return
        if c == "&":
            text, self.i = consume_char_ref(s, i, False, self.errors)
            self._emit_char(text)
            return
        if c == "\0":
            self.errors.append("unexpected-null-character")
            self._emit_char("\0")  # data state passes NUL through (spec)
            self.i = i + 1
            return
        # bulk run: single forward scan to the next stop char
        m = _STOP_DATA.search(s, i + 1)
        j = m.start() if m else n
        self._emit_char(s[i:j])
        self.i = j

    def _rcdata(self) -> None:
        s, i, n = self.s, self.i, self.n
        if i >= n:
            self._emit_eof()
            return
        c = s[i]
        if c == "<":
            self.i = i + 1
            self.state = "rcdata-lt"
            return
        if c == "&":
            text, self.i = consume_char_ref(s, i, False, self.errors)
            self._emit_char(text)
            return
        if c == "\0":
            self.errors.append("unexpected-null-character")
            self._emit_char("�")
            self.i = i + 1
            return
        m = _STOP_DATA.search(s, i + 1)
        j = m.start() if m else n
        self._emit_char(s[i:j])
        self.i = j

    def _rawtext(self) -> None:
        self._raw_common("rawtext-lt")

    def _script_data(self) -> None:
        self._raw_common("script-data-lt")

    def _raw_common(self, lt_state: str) -> None:
        s, i, n = self.s, self.i, self.n
        if i >= n:
            self._emit_eof()
            return
        c = s[i]
        if c == "<":
            self.i = i + 1
            self.state = lt_state
            return
        if c == "\0":
            self.errors.append("unexpected-null-character")
            self._emit_char("�")
            self.i = i + 1
            return
        m = _STOP_RAW.search(s, i + 1)
        j = m.start() if m else n
        self._emit_char(s[i:j])
        self.i = j

    def _plaintext(self) -> None:
        s, i, n = self.s, self.i, self.n
        if i >= n:
            self._emit_eof()
            return
        if s[i] == "\0":
            self.errors.append("unexpected-null-character")
            self._emit_char("�")
            self.i = i + 1
            return
        j = s.find("\0", i)
        if j == -1:
            j = n
        self._emit_char(s[i:j])
        self.i = j

    # -- tag open family ------------------------------------------------

    def _tag_open(self) -> None:
        s, i, n = self.s, self.i, self.n
        if i >= n:
            self.errors.append("eof-before-tag-name")
            self._emit_char("<")
            self._emit_eof()
            return
        c = s[i]
        if c == "!":
            self.i = i + 1
            self.state = "markup-declaration-open"
        elif c == "/":
            self.i = i + 1
            self.state = "end-tag-open"
        elif c in _ASCII_ALPHA:
            m = _RE_SIMPLE_TAG.match(s, i)
            if m:
                name = m.group(1)
                self.last_start_tag = name
                self._queue.append(("StartTag", name, [], False))
                self.i = m.end()
                self.state = DATA
                return
            tok = self._try_fast_tag(s, i)
            if tok is not None:
                return
            self._new_tag(False)
            self.state = "tag-name"
        elif c == "?":
            self.errors.append("unexpected-question-mark-instead-of-tag-name")
            self._buf = ""
            self.state = "bogus-comment"
        else:
            self.errors.append("invalid-first-character-of-tag-name")
            self._emit_char("<")
            self.state = DATA

    def _try_fast_tag(self, s: str, i: int):
        """One-regex start tag with simple attributes; None → slow path."""
        hit = match_fast_tag(s, i)
        if hit is None:
            return None
        name, attrs, self_closing, end = hit
        self.last_start_tag = name
        self._queue.append(("StartTag", name, attrs, self_closing))
        self.i = end
        self.state = DATA
        return True

    def _end_tag_open(self) -> None:
        s, i, n = self.s, self.i, self.n
        if i >= n:
            self.errors.append("eof-before-tag-name")
            self._emit_char("</")
            self._emit_eof()
            return
        c = s[i]
        if c in _ASCII_ALPHA:
            m = _RE_SIMPLE_TAG.match(s, i)
            if m:
                self._queue.append(("EndTag", m.group(1), [], False))
                self.i = m.end()
                self.state = DATA
                return
            self._new_tag(True)
            self.state = "tag-name"
        elif c == ">":
            self.errors.append("missing-end-tag-name")
            self.i = i + 1
            self.state = DATA
        else:
            self.errors.append("invalid-first-character-of-tag-name")
            self._buf = ""
            self.state = "bogus-comment"

    def _tag_name(self) -> None:
        s, i, n = self.s, self.i, self.n
        if i >= n:
            self.errors.append("eof-in-tag")
            self._emit_eof()
            return
        m = _RE_TAG_NAME.match(s, i)
        if m:
            chunk = m.group()
            if not chunk.islower():
                chunk = chunk.translate(_LOWER)
            if "\0" in chunk:
                self.errors.append("unexpected-null-character")
                chunk = chunk.replace("\0", "�")
            self._tag_name += chunk
            i = m.end()
            if i >= n:
                self.i = i
                return
        c = s[i]
        if c in _WS:
            self.i = i + 1
            self.state = "before-attribute-name"
        elif c == "/":
            self.i = i + 1
            self.state = "self-closing-start-tag"
        elif c == ">":
            self.i = i + 1
            self._seal_attrs()
            self._emit_tag()
            self.state = DATA
        elif c == "\0":
            self.errors.append("unexpected-null-character")
            self._tag_name += "�"
            self.i = i + 1
        else:  # pragma: no cover — regex covers all else
            self._tag_name += c
            self.i = i + 1

    # -- rcdata/rawtext/script end-tag machinery -------------------------

    def _rcdata_lt(self) -> None:
        self._raw_lt("rcdata-end-tag-open", RCDATA)

    def _rawtext_lt(self) -> None:
        self._raw_lt("rawtext-end-tag-open", RAWTEXT)

    def _raw_lt(self, open_state: str, back: str) -> None:
        s, i, n = self.s, self.i, self.n
        if i < n and s[i] == "/":
            self._tmp = ""
            self.i = i + 1
            self.state = open_state
        else:
            self._emit_char("<")
            self.state = back

    def _rcdata_end_tag_open(self) -> None:
        self._raw_end_tag_open("rcdata-end-tag-name", RCDATA)

    def _rawtext_end_tag_open(self) -> None:
        self._raw_end_tag_open("rawtext-end-tag-name", RAWTEXT)

    def _raw_end_tag_open(self, name_state: str, back: str) -> None:
        s, i, n = self.s, self.i, self.n
        if i < n and s[i] in _ASCII_ALPHA:
            self._new_tag(True)
            self.state = name_state
        else:
            self._emit_char("</")
            self.state = back

    def _raw_end_tag_name(self, back: str) -> None:
        """Shared by rcdata/rawtext/script-data end-tag-name states
        (HTMLTokenizer.m:300-527; appropriate-end-tag check :2225-2230)."""
        s, i, n = self.s, self.i, self.n
        m = _RE_ALPHA_RUN.match(s, i)
        if m:
            self._tag_name += m.group().translate(_LOWER)
            self._tmp += m.group()
            i = m.end()
            self.i = i
        appropriate = self._tag_name == self.last_start_tag
        if i < n:
            c = s[i]
            if appropriate:
                if c in _WS:
                    self.i = i + 1
                    self.state = "before-attribute-name"
                    return
                if c == "/":
                    self.i = i + 1
                    self.state = "self-closing-start-tag"
                    return
                if c == ">":
                    self.i = i + 1
                    self._seal_attrs()
                    self._emit_tag()
                    self.state = DATA
                    return
        # anything else: not an end tag after all
        self._emit_char("</" + self._tmp)
        self.state = back

    def _rcdata_end_tag_name(self) -> None:
        self._raw_end_tag_name(RCDATA)

    def _rawtext_end_tag_name(self) -> None:
        self._raw_end_tag_name(RAWTEXT)

    # -- script data escaped family (HTMLTokenizer.m:529-889) ------------

    def _script_data_lt(self) -> None:
        s, i, n = self.s, self.i, self.n
        if i < n and s[i] == "/":
            self._tmp = ""
            self.i = i + 1
            self.state = "script-data-end-tag-open"
        elif i < n and s[i] == "!":
            self.i = i + 1
            self._emit_char("<!")
            self.state = "script-data-escape-start"
        else:
            self._emit_char("<")
            self.state = SCRIPT_DATA

    def _script_data_end_tag_open(self) -> None:
        self._raw_end_tag_open("script-data-end-tag-name", SCRIPT_DATA)

    def _script_data_end_tag_name(self) -> None:
        self._raw_end_tag_name(SCRIPT_DATA)

    def _script_data_escape_start(self) -> None:
        s, i, n = self.s, self.i, self.n
        if i < n and s[i] == "-":
            self.i = i + 1
            self._emit_char("-")
            self.state = "script-data-escape-start-dash"
        else:
            self.state = SCRIPT_DATA

    def _script_data_escape_start_dash(self) -> None:
        s, i, n = self.s, self.i, self.n
        if i < n and s[i] == "-":
            self.i = i + 1
            self._emit_char("-")
            self.state = "script-data-escaped-dash-dash"
        else:
            self.state = SCRIPT_DATA

    def _script_data_escaped(self) -> None:
        s, i, n = self.s, self.i, self.n
        if i >= n:
            self.errors.append("eof-in-script-html-comment-like-text")
            self._emit_eof()
            return
        c = s[i]
        if c == "-":
            self.i = i + 1
            self._emit_char("-")
            self.state = "script-data-escaped-dash"
        elif c == "<":
            self.i = i + 1
            self.state = "script-data-escaped-lt"
        elif c == "\0":
            self.errors.append("unexpected-null-character")
            self._emit_char("�")
            self.i = i + 1
        else:
            m = _STOP_SCRIPT_ESC.search(s, i + 1)
            j = m.start() if m else n
            self._emit_char(s[i:j])
            self.i = j

    def _script_data_escaped_dash(self) -> None:
        s, i, n = self.s, self.i, self.n
        if i >= n:
            self.errors.append("eof-in-script-html-comment-like-text")
            self._emit_eof()
            return
        c = s[i]
        if c == "-":
            self.i = i + 1
            self._emit_char("-")
            self.state = "script-data-escaped-dash-dash"
        elif c == "<":
            self.i = i + 1
            self.state = "script-data-escaped-lt"
        elif c == "\0":
            self.errors.append("unexpected-null-character")
            self._emit_char("�")
            self.i = i + 1
            self.state = "script-data-escaped"
        else:
            self._emit_char(c)
            self.i = i + 1
            self.state = "script-data-escaped"

    def _script_data_escaped_dash_dash(self) -> None:
        s, i, n = self.s, self.i, self.n
        if i >= n:
            self.errors.append("eof-in-script-html-comment-like-text")
            self._emit_eof()
            return
        c = s[i]
        if c == "-":
            self.i = i + 1
            self._emit_char("-")
        elif c == "<":
            self.i = i + 1
            self.state = "script-data-escaped-lt"
        elif c == ">":
            self.i = i + 1
            self._emit_char(">")
            self.state = SCRIPT_DATA
        elif c == "\0":
            self.errors.append("unexpected-null-character")
            self._emit_char("�")
            self.i = i + 1
            self.state = "script-data-escaped"
        else:
            self._emit_char(c)
            self.i = i + 1
            self.state = "script-data-escaped"

    def _script_data_escaped_lt(self) -> None:
        s, i, n = self.s, self.i, self.n
        if i < n and s[i] == "/":
            self._tmp = ""
            self.i = i + 1
            self.state = "script-data-escaped-end-tag-open"
        elif i < n and s[i] in _ASCII_ALPHA:
            self._tmp = ""
            self._emit_char("<")
            self.state = "script-data-double-escape-start"
        else:
            self._emit_char("<")
            self.state = "script-data-escaped"

    def _script_data_escaped_end_tag_open(self) -> None:
        s, i, n = self.s, self.i, self.n
        if i < n and s[i] in _ASCII_ALPHA:
            self._new_tag(True)
            self.state = "script-data-escaped-end-tag-name"
        else:
            self._emit_char("</")
            self.state = "script-data-escaped"

    def _script_data_escaped_end_tag_name(self) -> None:
        self._raw_end_tag_name("script-data-escaped")

    def _script_data_double_escape_start(self) -> None:
        s, i, n = self.s, self.i, self.n
        if i < n:
            c = s[i]
            if c in _WS or c in "/>":
                self.i = i + 1
                self._emit_char(c)
                self.state = (
                    "script-data-double-escaped"
                    if self._tmp.translate(_LOWER) == "script"
                    else "script-data-escaped"
                )
                return
            if c in _ASCII_ALPHA:
                self._tmp += c
                self._emit_char(c)
                self.i = i + 1
                return
        self.state = "script-data-escaped"

    def _script_data_double_escaped(self) -> None:
        s, i, n = self.s, self.i, self.n
        if i >= n:
            self.errors.append("eof-in-script-html-comment-like-text")
            self._emit_eof()
            return
        c = s[i]
        if c == "-":
            self.i = i + 1
            self._emit_char("-")
            self.state = "script-data-double-escaped-dash"
        elif c == "<":
            self.i = i + 1
            self._emit_char("<")
            self.state = "script-data-double-escaped-lt"
        elif c == "\0":
            self.errors.append("unexpected-null-character")
            self._emit_char("�")
            self.i = i + 1
        else:
            m = _STOP_SCRIPT_ESC.search(s, i + 1)
            j = m.start() if m else n
            self._emit_char(s[i:j])
            self.i = j

    def _script_data_double_escaped_dash(self) -> None:
        s, i, n = self.s, self.i, self.n
        if i >= n:
            self.errors.append("eof-in-script-html-comment-like-text")
            self._emit_eof()
            return
        c = s[i]
        self.i = i + 1
        if c == "-":
            self._emit_char("-")
            self.state = "script-data-double-escaped-dash-dash"
        elif c == "<":
            self._emit_char("<")
            self.state = "script-data-double-escaped-lt"
        elif c == "\0":
            self.errors.append("unexpected-null-character")
            self._emit_char("�")
            self.state = "script-data-double-escaped"
        else:
            self._emit_char(c)
            self.state = "script-data-double-escaped"

    def _script_data_double_escaped_dash_dash(self) -> None:
        s, i, n = self.s, self.i, self.n
        if i >= n:
            self.errors.append("eof-in-script-html-comment-like-text")
            self._emit_eof()
            return
        c = s[i]
        self.i = i + 1
        if c == "-":
            self._emit_char("-")
        elif c == "<":
            self._emit_char("<")
            self.state = "script-data-double-escaped-lt"
        elif c == ">":
            self._emit_char(">")
            self.state = SCRIPT_DATA
        elif c == "\0":
            self.errors.append("unexpected-null-character")
            self._emit_char("�")
            self.state = "script-data-double-escaped"
        else:
            self._emit_char(c)
            self.state = "script-data-double-escaped"

    def _script_data_double_escaped_lt(self) -> None:
        s, i, n = self.s, self.i, self.n
        if i < n and s[i] == "/":
            self._tmp = ""
            self.i = i + 1
            self._emit_char("/")
            self.state = "script-data-double-escape-end"
        else:
            self.state = "script-data-double-escaped"

    def _script_data_double_escape_end(self) -> None:
        s, i, n = self.s, self.i, self.n
        if i < n:
            c = s[i]
            if c in _WS or c in "/>":
                self.i = i + 1
                self._emit_char(c)
                self.state = (
                    "script-data-escaped"
                    if self._tmp.translate(_LOWER) == "script"
                    else "script-data-double-escaped"
                )
                return
            if c in _ASCII_ALPHA:
                self._tmp += c
                self._emit_char(c)
                self.i = i + 1
                return
        self.state = "script-data-double-escaped"

    # -- attributes (HTMLTokenizer.m:891-1247) ----------------------------

    def _before_attribute_name(self) -> None:
        s, i, n = self.s, self.i, self.n
        m = _RE_WS.match(s, i)
        if m:
            i = m.end()
            self.i = i
        if i >= n:
            self.state = "after-attribute-name"
            return
        c = s[i]
        if c in "/>":
            self.state = "after-attribute-name"
        elif c == "=":
            self.errors.append("unexpected-equals-sign-before-attribute-name")
            self._start_attr("=")
            self.i = i + 1
            self.state = "attribute-name"
        else:
            self._start_attr()
            self.state = "attribute-name"

    def _attribute_name(self) -> None:
        s, i, n = self.s, self.i, self.n
        m = _RE_ATTR_NAME.match(s, i)
        if m:
            chunk = m.group()
            if not chunk.islower():
                chunk = chunk.translate(_LOWER)
            self._attrs[-1][0] += chunk
            i = m.end()
            self.i = i
        if i >= n:
            self.state = "after-attribute-name"
            return
        c = s[i]
        if c in _WS or c in "/>":
            self.state = "after-attribute-name"
        elif c == "=":
            self.i = i + 1
            self.state = "before-attribute-value"
        elif c == "\0":
            self.errors.append("unexpected-null-character")
            self._attrs[-1][0] += "�"
            self.i = i + 1
        elif c in "\"'<":
            self.errors.append("unexpected-character-in-attribute-name")
            self._attrs[-1][0] += c
            self.i = i + 1
        else:  # pragma: no cover
            self._attrs[-1][0] += c
            self.i = i + 1

    def _after_attribute_name(self) -> None:
        s, i, n = self.s, self.i, self.n
        m = _RE_WS.match(s, i)
        if m:
            i = m.end()
            self.i = i
        if i >= n:
            self.errors.append("eof-in-tag")
            self._emit_eof()
            return
        c = s[i]
        if c == "/":
            self.i = i + 1
            self.state = "self-closing-start-tag"
        elif c == "=":
            self.i = i + 1
            self.state = "before-attribute-value"
        elif c == ">":
            self.i = i + 1
            self._seal_attrs()
            self._emit_tag()
            self.state = DATA
        else:
            self._start_attr()
            self.state = "attribute-name"

    def _before_attribute_value(self) -> None:
        s, i, n = self.s, self.i, self.n
        m = _RE_WS.match(s, i)
        if m:
            i = m.end()
            self.i = i
        if i >= n:
            self.state = "attribute-value-unquoted"
            return
        c = s[i]
        if c == '"':
            self.i = i + 1
            self.state = "attribute-value-double-quoted"
        elif c == "'":
            self.i = i + 1
            self.state = "attribute-value-single-quoted"
        elif c == ">":
            self.errors.append("missing-attribute-value")
            self.i = i + 1
            self._seal_attrs()
            self._emit_tag()
            self.state = DATA
        else:
            self.state = "attribute-value-unquoted"

    def _attr_value_quoted(self, quote: str, regex, after: str) -> None:
        s, i, n = self.s, self.i, self.n
        if i >= n:
            self.errors.append("eof-in-tag")
            self._emit_eof()
            return
        c = s[i]
        if c == quote:
            self.i = i + 1
            self.state = after
            return
        if c == "&":
            text, self.i = consume_char_ref(s, i, True, self.errors)
            self._attrs[-1][1] += text
            return
        if c == "\0":
            self.errors.append("unexpected-null-character")
            self._attrs[-1][1] += "�"
            self.i = i + 1
            return
        m = regex.match(s, i)
        self._attrs[-1][1] += m.group()
        self.i = m.end()

    def _attribute_value_double_quoted(self) -> None:
        self._attr_value_quoted('"', _RE_ATTR_VALUE_DQ, "after-attribute-value-quoted")

    def _attribute_value_single_quoted(self) -> None:
        self._attr_value_quoted("'", _RE_ATTR_VALUE_SQ, "after-attribute-value-quoted")

    def _attribute_value_unquoted(self) -> None:
        s, i, n = self.s, self.i, self.n
        if i >= n:
            self.errors.append("eof-in-tag")
            self._emit_eof()
            return
        c = s[i]
        if c in _WS:
            self.i = i + 1
            self.state = "before-attribute-name"
            return
        if c == "&":
            text, self.i = consume_char_ref(s, i, True, self.errors)
            self._attrs[-1][1] += text
            return
        if c == ">":
            self.i = i + 1
            self._seal_attrs()
            self._emit_tag()
            self.state = DATA
            return
        if c == "\0":
            self.errors.append("unexpected-null-character")
            self._attrs[-1][1] += "�"
            self.i = i + 1
            return
        if c in "\"'<=`":
            self.errors.append("unexpected-character-in-unquoted-attribute-value")
            self._attrs[-1][1] += c
            self.i = i + 1
            return
        m = _RE_ATTR_VALUE_UQ.match(s, i)
        self._attrs[-1][1] += m.group()
        self.i = m.end()

    def _after_attribute_value_quoted(self) -> None:
        s, i, n = self.s, self.i, self.n
        if i >= n:
            self.errors.append("eof-in-tag")
            self._emit_eof()
            return
        c = s[i]
        if c in _WS:
            self.i = i + 1
            self.state = "before-attribute-name"
        elif c == "/":
            self.i = i + 1
            self.state = "self-closing-start-tag"
        elif c == ">":
            self.i = i + 1
            self._seal_attrs()
            self._emit_tag()
            self.state = DATA
        else:
            self.errors.append("missing-whitespace-between-attributes")
            self.state = "before-attribute-name"

    def _self_closing_start_tag(self) -> None:
        s, i, n = self.s, self.i, self.n
        if i >= n:
            self.errors.append("eof-in-tag")
            self._emit_eof()
            return
        if s[i] == ">":
            self._tag_self_closing = True
            self.i = i + 1
            self._seal_attrs()
            self._emit_tag()
            self.state = DATA
        else:
            self.errors.append("unexpected-solidus-in-tag")
            self.state = "before-attribute-name"

    # -- comments / bogus comments (HTMLTokenizer.m:1249-1453) ------------

    def _bogus_comment(self) -> None:
        s, i, n = self.s, self.i, self.n
        j = s.find(">", i)
        if j == -1:
            self._buf += s[i:n].replace("\0", "�")
            self.i = n
            self._queue.append(("Comment", self._buf))
            self._emit_eof()
            return
        self._buf += s[i:j].replace("\0", "�")
        self.i = j + 1
        self._queue.append(("Comment", self._buf))
        self.state = DATA

    def _markup_declaration_open(self) -> None:
        """HTMLTokenizer.m:1262-1275 — '--', 'DOCTYPE', '[CDATA[' dispatch."""
        s, i, n = self.s, self.i, self.n
        if s.startswith("--", i):
            self.i = i + 2
            self._buf = ""
            self.state = "comment-start"
            return
        if s[i : i + 7].translate(_LOWER) == "doctype":
            self.i = i + 7
            self.state = "doctype"
            return
        if s.startswith("[CDATA[", i):
            if self.cdata_allowed is not None and self.cdata_allowed():
                self.i = i + 7
                self.state = "cdata-section"
                return
            self.errors.append("cdata-in-html-content")
            self._buf = "[CDATA["
            self.i = i + 7
            self.state = "bogus-comment"
            return
        self.errors.append("incorrectly-opened-comment")
        self._buf = ""
        self.state = "bogus-comment"

    def _comment_start(self) -> None:
        s, i, n = self.s, self.i, self.n
        if i < n:
            c = s[i]
            if c == "-":
                self.i = i + 1
                self.state = "comment-start-dash"
                return
            if c == ">":
                self.errors.append("abrupt-closing-of-empty-comment")
                self.i = i + 1
                self._queue.append(("Comment", self._buf))
                self.state = DATA
                return
        self.state = "comment"

    def _comment_start_dash(self) -> None:
        s, i, n = self.s, self.i, self.n
        if i >= n:
            self.errors.append("eof-in-comment")
            self._queue.append(("Comment", self._buf))
            self._emit_eof()
            return
        c = s[i]
        if c == "-":
            self.i = i + 1
            self.state = "comment-end"
        elif c == ">":
            self.errors.append("abrupt-closing-of-empty-comment")
            self.i = i + 1
            self._queue.append(("Comment", self._buf))
            self.state = DATA
        else:
            self._buf += "-"
            self.state = "comment"

    def _comment(self) -> None:
        s, i, n = self.s, self.i, self.n
        if i >= n:
            self.errors.append("eof-in-comment")
            self._queue.append(("Comment", self._buf))
            self._emit_eof()
            return
        c = s[i]
        if c == "<":
            self._buf += "<"
            self.i = i + 1
            self.state = "comment-lt"
            return
        if c == "-":
            self.i = i + 1
            self.state = "comment-end-dash"
            return
        if c == "\0":
            self.errors.append("unexpected-null-character")
            self._buf += "�"
            self.i = i + 1
            return
        m = _STOP_COMMENT.search(s, i + 1)
        j = m.start() if m else n
        self._buf += s[i:j]
        self.i = j

    def _comment_lt(self) -> None:
        s, i, n = self.s, self.i, self.n
        if i < n:
            c = s[i]
            if c == "!":
                self._buf += "!"
                self.i = i + 1
                self.state = "comment-lt-bang"
                return
            if c == "<":
                self._buf += "<"
                self.i = i + 1
                return
        self.state = "comment"

    def _comment_lt_bang(self) -> None:
        s, i, n = self.s, self.i, self.n
        if i < n and s[i] == "-":
            self.i = i + 1
            self.state = "comment-lt-bang-dash"
        else:
            self.state = "comment"

    def _comment_lt_bang_dash(self) -> None:
        s, i, n = self.s, self.i, self.n
        if i < n and s[i] == "-":
            self.i = i + 1
            self.state = "comment-lt-bang-dash-dash"
        else:
            self.state = "comment-end-dash"

    def _comment_lt_bang_dash_dash(self) -> None:
        s, i, n = self.s, self.i, self.n
        if i < n and s[i] != ">":
            self.errors.append("nested-comment")
        self.state = "comment-end"

    def _comment_end_dash(self) -> None:
        s, i, n = self.s, self.i, self.n
        if i >= n:
            self.errors.append("eof-in-comment")
            self._queue.append(("Comment", self._buf))
            self._emit_eof()
            return
        if s[i] == "-":
            self.i = i + 1
            self.state = "comment-end"
        else:
            self._buf += "-"
            self.state = "comment"

    def _comment_end(self) -> None:
        s, i, n = self.s, self.i, self.n
        if i >= n:
            self.errors.append("eof-in-comment")
            self._queue.append(("Comment", self._buf))
            self._emit_eof()
            return
        c = s[i]
        if c == ">":
            self.i = i + 1
            self._queue.append(("Comment", self._buf))
            self.state = DATA
        elif c == "!":
            self.i = i + 1
            self.state = "comment-end-bang"
        elif c == "-":
            self._buf += "-"
            self.i = i + 1
        else:
            self._buf += "--"
            self.state = "comment"

    def _comment_end_bang(self) -> None:
        s, i, n = self.s, self.i, self.n
        if i >= n:
            self.errors.append("eof-in-comment")
            self._queue.append(("Comment", self._buf))
            self._emit_eof()
            return
        c = s[i]
        if c == "-":
            self._buf += "--!"
            self.i = i + 1
            self.state = "comment-end-dash"
        elif c == ">":
            self.errors.append("incorrectly-closed-comment")
            self.i = i + 1
            self._queue.append(("Comment", self._buf))
            self.state = DATA
        else:
            self._buf += "--!"
            self.state = "comment"

    # -- DOCTYPE family (HTMLTokenizer.m:1455-1986) ------------------------

    def _emit_doctype(self) -> None:
        self._queue.append(
            ("DOCTYPE", self._dt_name, self._dt_public, self._dt_system, self._dt_quirks)
        )

    def _doctype(self) -> None:
        s, i, n = self.s, self.i, self.n
        self._dt_name = None
        self._dt_public = None
        self._dt_system = None
        self._dt_quirks = False
        if i >= n:
            self.errors.append("eof-in-doctype")
            self._dt_quirks = True
            self._emit_doctype()
            self._emit_eof()
            return
        c = s[i]
        if c in _WS:
            self.i = i + 1
            self.state = "before-doctype-name"
        elif c == ">":
            self.state = "before-doctype-name"
        else:
            self.errors.append("missing-whitespace-before-doctype-name")
            self.state = "before-doctype-name"

    def _before_doctype_name(self) -> None:
        s, i, n = self.s, self.i, self.n
        m = _RE_WS.match(s, i)
        if m:
            i = m.end()
            self.i = i
        if i >= n:
            self.errors.append("eof-in-doctype")
            self._dt_quirks = True
            self._emit_doctype()
            self._emit_eof()
            return
        c = s[i]
        if c == ">":
            self.errors.append("missing-doctype-name")
            self._dt_quirks = True
            self.i = i + 1
            self._emit_doctype()
            self.state = DATA
        elif c == "\0":
            self.errors.append("unexpected-null-character")
            self._dt_name = "�"
            self.i = i + 1
            self.state = "doctype-name"
        else:
            self._dt_name = c.translate(_LOWER)
            self.i = i + 1
            self.state = "doctype-name"

    def _doctype_name(self) -> None:
        s, i, n = self.s, self.i, self.n
        if i >= n:
            self.errors.append("eof-in-doctype")
            self._dt_quirks = True
            self._emit_doctype()
            self._emit_eof()
            return
        c = s[i]
        if c in _WS:
            self.i = i + 1
            self.state = "after-doctype-name"
        elif c == ">":
            self.i = i + 1
            self._emit_doctype()
            self.state = DATA
        elif c == "\0":
            self.errors.append("unexpected-null-character")
            self._dt_name += "�"
            self.i = i + 1
        else:
            self._dt_name += c.translate(_LOWER)
            self.i = i + 1

    def _after_doctype_name(self) -> None:
        s, i, n = self.s, self.i, self.n
        m = _RE_WS.match(s, i)
        if m:
            i = m.end()
            self.i = i
        if i >= n:
            self.errors.append("eof-in-doctype")
            self._dt_quirks = True
            self._emit_doctype()
            self._emit_eof()
            return
        c = s[i]
        if c == ">":
            self.i = i + 1
            self._emit_doctype()
            self.state = DATA
            return
        word = s[i : i + 6].translate(_LOWER)
        if word == "public":
            self.i = i + 6
            self.state = "after-doctype-public-keyword"
        elif word == "system":
            self.i = i + 6
            self.state = "after-doctype-system-keyword"
        else:
            self.errors.append("invalid-character-sequence-after-doctype-name")
            self._dt_quirks = True
            self.state = "bogus-doctype"

    def _after_doctype_public_keyword(self) -> None:
        s, i, n = self.s, self.i, self.n
        if i >= n:
            self.errors.append("eof-in-doctype")
            self._dt_quirks = True
            self._emit_doctype()
            self._emit_eof()
            return
        c = s[i]
        if c in _WS:
            self.i = i + 1
            self.state = "before-doctype-public-identifier"
        elif c == '"':
            self.errors.append("missing-whitespace-after-doctype-public-keyword")
            self._dt_public = ""
            self.i = i + 1
            self.state = "doctype-public-identifier-double-quoted"
        elif c == "'":
            self.errors.append("missing-whitespace-after-doctype-public-keyword")
            self._dt_public = ""
            self.i = i + 1
            self.state = "doctype-public-identifier-single-quoted"
        elif c == ">":
            self.errors.append("missing-doctype-public-identifier")
            self._dt_quirks = True
            self.i = i + 1
            self._emit_doctype()
            self.state = DATA
        else:
            self.errors.append("missing-quote-before-doctype-public-identifier")
            self._dt_quirks = True
            self.state = "bogus-doctype"

    def _before_doctype_public_identifier(self) -> None:
        s, i, n = self.s, self.i, self.n
        m = _RE_WS.match(s, i)
        if m:
            i = m.end()
            self.i = i
        if i >= n:
            self.errors.append("eof-in-doctype")
            self._dt_quirks = True
            self._emit_doctype()
            self._emit_eof()
            return
        c = s[i]
        if c == '"':
            self._dt_public = ""
            self.i = i + 1
            self.state = "doctype-public-identifier-double-quoted"
        elif c == "'":
            self._dt_public = ""
            self.i = i + 1
            self.state = "doctype-public-identifier-single-quoted"
        elif c == ">":
            self.errors.append("missing-doctype-public-identifier")
            self._dt_quirks = True
            self.i = i + 1
            self._emit_doctype()
            self.state = DATA
        else:
            self.errors.append("missing-quote-before-doctype-public-identifier")
            self._dt_quirks = True
            self.state = "bogus-doctype"

    def _dt_identifier_quoted(self, quote: str, field: str, after: str) -> None:
        s, i, n = self.s, self.i, self.n
        rx = _STOP_DT_DQ if quote == '"' else _STOP_DT_SQ
        m = rx.search(s, i)
        j = m.start() if m else n
        chunk = s[i:j]
        if field == "public":
            self._dt_public += chunk
        else:
            self._dt_system += chunk
        self.i = j
        if j >= n:
            self.errors.append("eof-in-doctype")
            self._dt_quirks = True
            self._emit_doctype()
            self._emit_eof()
            return
        c = s[j]
        if c == quote:
            self.i = j + 1
            self.state = after
        elif c == ">":
            self.errors.append("abrupt-doctype-%s-identifier" % field)
            self._dt_quirks = True
            self.i = j + 1
            self._emit_doctype()
            self.state = DATA
        else:  # NUL
            self.errors.append("unexpected-null-character")
            if field == "public":
                self._dt_public += "�"
            else:
                self._dt_system += "�"
            self.i = j + 1

    def _doctype_public_identifier_double_quoted(self) -> None:
        self._dt_identifier_quoted('"', "public", "after-doctype-public-identifier")

    def _doctype_public_identifier_single_quoted(self) -> None:
        self._dt_identifier_quoted("'", "public", "after-doctype-public-identifier")

    def _after_doctype_public_identifier(self) -> None:
        s, i, n = self.s, self.i, self.n
        if i >= n:
            self.errors.append("eof-in-doctype")
            self._dt_quirks = True
            self._emit_doctype()
            self._emit_eof()
            return
        c = s[i]
        if c in _WS:
            self.i = i + 1
            self.state = "between-doctype-public-and-system-identifiers"
        elif c == ">":
            self.i = i + 1
            self._emit_doctype()
            self.state = DATA
        elif c == '"':
            self.errors.append(
                "missing-whitespace-between-doctype-public-and-system-identifiers"
            )
            self._dt_system = ""
            self.i = i + 1
            self.state = "doctype-system-identifier-double-quoted"
        elif c == "'":
            self.errors.append(
                "missing-whitespace-between-doctype-public-and-system-identifiers"
            )
            self._dt_system = ""
            self.i = i + 1
            self.state = "doctype-system-identifier-single-quoted"
        else:
            self.errors.append("missing-quote-before-doctype-system-identifier")
            self._dt_quirks = True
            self.state = "bogus-doctype"

    def _between_doctype_public_and_system_identifiers(self) -> None:
        s, i, n = self.s, self.i, self.n
        m = _RE_WS.match(s, i)
        if m:
            i = m.end()
            self.i = i
        if i >= n:
            self.errors.append("eof-in-doctype")
            self._dt_quirks = True
            self._emit_doctype()
            self._emit_eof()
            return
        c = s[i]
        if c == ">":
            self.i = i + 1
            self._emit_doctype()
            self.state = DATA
        elif c == '"':
            self._dt_system = ""
            self.i = i + 1
            self.state = "doctype-system-identifier-double-quoted"
        elif c == "'":
            self._dt_system = ""
            self.i = i + 1
            self.state = "doctype-system-identifier-single-quoted"
        else:
            self.errors.append("missing-quote-before-doctype-system-identifier")
            self._dt_quirks = True
            self.state = "bogus-doctype"

    def _after_doctype_system_keyword(self) -> None:
        s, i, n = self.s, self.i, self.n
        if i >= n:
            self.errors.append("eof-in-doctype")
            self._dt_quirks = True
            self._emit_doctype()
            self._emit_eof()
            return
        c = s[i]
        if c in _WS:
            self.i = i + 1
            self.state = "before-doctype-system-identifier"
        elif c == '"':
            self.errors.append("missing-whitespace-after-doctype-system-keyword")
            self._dt_system = ""
            self.i = i + 1
            self.state = "doctype-system-identifier-double-quoted"
        elif c == "'":
            self.errors.append("missing-whitespace-after-doctype-system-keyword")
            self._dt_system = ""
            self.i = i + 1
            self.state = "doctype-system-identifier-single-quoted"
        elif c == ">":
            self.errors.append("missing-doctype-system-identifier")
            self._dt_quirks = True
            self.i = i + 1
            self._emit_doctype()
            self.state = DATA
        else:
            self.errors.append("missing-quote-before-doctype-system-identifier")
            self._dt_quirks = True
            self.state = "bogus-doctype"

    def _before_doctype_system_identifier(self) -> None:
        s, i, n = self.s, self.i, self.n
        m = _RE_WS.match(s, i)
        if m:
            i = m.end()
            self.i = i
        if i >= n:
            self.errors.append("eof-in-doctype")
            self._dt_quirks = True
            self._emit_doctype()
            self._emit_eof()
            return
        c = s[i]
        if c == '"':
            self._dt_system = ""
            self.i = i + 1
            self.state = "doctype-system-identifier-double-quoted"
        elif c == "'":
            self._dt_system = ""
            self.i = i + 1
            self.state = "doctype-system-identifier-single-quoted"
        elif c == ">":
            self.errors.append("missing-doctype-system-identifier")
            self._dt_quirks = True
            self.i = i + 1
            self._emit_doctype()
            self.state = DATA
        else:
            self.errors.append("missing-quote-before-doctype-system-identifier")
            self._dt_quirks = True
            self.state = "bogus-doctype"

    def _doctype_system_identifier_double_quoted(self) -> None:
        self._dt_identifier_quoted('"', "system", "after-doctype-system-identifier")

    def _doctype_system_identifier_single_quoted(self) -> None:
        self._dt_identifier_quoted("'", "system", "after-doctype-system-identifier")

    def _after_doctype_system_identifier(self) -> None:
        s, i, n = self.s, self.i, self.n
        m = _RE_WS.match(s, i)
        if m:
            i = m.end()
            self.i = i
        if i >= n:
            self.errors.append("eof-in-doctype")
            self._dt_quirks = True
            self._emit_doctype()
            self._emit_eof()
            return
        if s[i] == ">":
            self.i = i + 1
            self._emit_doctype()
            self.state = DATA
        else:
            self.errors.append("unexpected-character-after-doctype-system-identifier")
            # NOTE: quirks flag NOT set here (spec)
            self.state = "bogus-doctype"

    def _bogus_doctype(self) -> None:
        s, i, n = self.s, self.i, self.n
        j = s.find(">", i)
        if j == -1:
            self.i = n
            self._emit_doctype()
            self._emit_eof()
            return
        self.i = j + 1
        self._emit_doctype()
        self.state = DATA

    # -- CDATA (HTMLTokenizer.m:1988-2012) --------------------------------

    def _cdata_section(self) -> None:
        s, i, n = self.s, self.i, self.n
        j = s.find("]]>", i)
        if j == -1:
            self.errors.append("eof-in-cdata")
            self._emit_char(s[i:n])
            self.i = n
            self._emit_eof()
            return
        self._emit_char(s[i:j])
        self.i = j + 3
        self.state = DATA


class _NullList(list):
    def append(self, item) -> None:  # noqa: D401 — drop errors when not collected
        pass


_STATES: dict[str, Callable[[Tokenizer], None]] = {
    DATA: Tokenizer._data,
    RCDATA: Tokenizer._rcdata,
    RAWTEXT: Tokenizer._rawtext,
    SCRIPT_DATA: Tokenizer._script_data,
    PLAINTEXT: Tokenizer._plaintext,
    "tag-open": Tokenizer._tag_open,
    "end-tag-open": Tokenizer._end_tag_open,
    "tag-name": Tokenizer._tag_name,
    "rcdata-lt": Tokenizer._rcdata_lt,
    "rcdata-end-tag-open": Tokenizer._rcdata_end_tag_open,
    "rcdata-end-tag-name": Tokenizer._rcdata_end_tag_name,
    "rawtext-lt": Tokenizer._rawtext_lt,
    "rawtext-end-tag-open": Tokenizer._rawtext_end_tag_open,
    "rawtext-end-tag-name": Tokenizer._rawtext_end_tag_name,
    "script-data-lt": Tokenizer._script_data_lt,
    "script-data-end-tag-open": Tokenizer._script_data_end_tag_open,
    "script-data-end-tag-name": Tokenizer._script_data_end_tag_name,
    "script-data-escape-start": Tokenizer._script_data_escape_start,
    "script-data-escape-start-dash": Tokenizer._script_data_escape_start_dash,
    "script-data-escaped": Tokenizer._script_data_escaped,
    "script-data-escaped-dash": Tokenizer._script_data_escaped_dash,
    "script-data-escaped-dash-dash": Tokenizer._script_data_escaped_dash_dash,
    "script-data-escaped-lt": Tokenizer._script_data_escaped_lt,
    "script-data-escaped-end-tag-open": Tokenizer._script_data_escaped_end_tag_open,
    "script-data-escaped-end-tag-name": Tokenizer._script_data_escaped_end_tag_name,
    "script-data-double-escape-start": Tokenizer._script_data_double_escape_start,
    "script-data-double-escaped": Tokenizer._script_data_double_escaped,
    "script-data-double-escaped-dash": Tokenizer._script_data_double_escaped_dash,
    "script-data-double-escaped-dash-dash": Tokenizer._script_data_double_escaped_dash_dash,
    "script-data-double-escaped-lt": Tokenizer._script_data_double_escaped_lt,
    "script-data-double-escape-end": Tokenizer._script_data_double_escape_end,
    "before-attribute-name": Tokenizer._before_attribute_name,
    "attribute-name": Tokenizer._attribute_name,
    "after-attribute-name": Tokenizer._after_attribute_name,
    "before-attribute-value": Tokenizer._before_attribute_value,
    "attribute-value-double-quoted": Tokenizer._attribute_value_double_quoted,
    "attribute-value-single-quoted": Tokenizer._attribute_value_single_quoted,
    "attribute-value-unquoted": Tokenizer._attribute_value_unquoted,
    "after-attribute-value-quoted": Tokenizer._after_attribute_value_quoted,
    "self-closing-start-tag": Tokenizer._self_closing_start_tag,
    "bogus-comment": Tokenizer._bogus_comment,
    "markup-declaration-open": Tokenizer._markup_declaration_open,
    "comment-start": Tokenizer._comment_start,
    "comment-start-dash": Tokenizer._comment_start_dash,
    "comment": Tokenizer._comment,
    "comment-lt": Tokenizer._comment_lt,
    "comment-lt-bang": Tokenizer._comment_lt_bang,
    "comment-lt-bang-dash": Tokenizer._comment_lt_bang_dash,
    "comment-lt-bang-dash-dash": Tokenizer._comment_lt_bang_dash_dash,
    "comment-end-dash": Tokenizer._comment_end_dash,
    "comment-end": Tokenizer._comment_end,
    "comment-end-bang": Tokenizer._comment_end_bang,
    "doctype": Tokenizer._doctype,
    "before-doctype-name": Tokenizer._before_doctype_name,
    "doctype-name": Tokenizer._doctype_name,
    "after-doctype-name": Tokenizer._after_doctype_name,
    "after-doctype-public-keyword": Tokenizer._after_doctype_public_keyword,
    "before-doctype-public-identifier": Tokenizer._before_doctype_public_identifier,
    "doctype-public-identifier-double-quoted": Tokenizer._doctype_public_identifier_double_quoted,
    "doctype-public-identifier-single-quoted": Tokenizer._doctype_public_identifier_single_quoted,
    "after-doctype-public-identifier": Tokenizer._after_doctype_public_identifier,
    "between-doctype-public-and-system-identifiers": Tokenizer._between_doctype_public_and_system_identifiers,
    "after-doctype-system-keyword": Tokenizer._after_doctype_system_keyword,
    "before-doctype-system-identifier": Tokenizer._before_doctype_system_identifier,
    "doctype-system-identifier-double-quoted": Tokenizer._doctype_system_identifier_double_quoted,
    "doctype-system-identifier-single-quoted": Tokenizer._doctype_system_identifier_single_quoted,
    "after-doctype-system-identifier": Tokenizer._after_doctype_system_identifier,
    "bogus-doctype": Tokenizer._bogus_doctype,
    "cdata-section": Tokenizer._cdata_section,
}

STATE_NAMES = {
    "Data state": DATA,
    "RCDATA state": RCDATA,
    "RAWTEXT state": RAWTEXT,
    "Script data state": SCRIPT_DATA,
    "PLAINTEXT state": PLAINTEXT,
    "CDATA section state": "cdata-section",
}
