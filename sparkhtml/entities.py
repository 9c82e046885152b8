"""WHATWG named/numeric character reference resolution.

Reference parity: /root/reference/Sources/HTMLEntities.m (2,231-entry sorted
table, longest-prefix match at :2318-2361; windows-1252 numeric override table
at :13-48) and the character-reference tokenizer states
(/root/reference/Sources/HTMLTokenizer.m:2244-2333).

The named-entity table comes from the Python stdlib (``html.entities.html5``),
which is the same public WHATWG data set (2,231 entries, both with and
without trailing semicolons for the legacy subset).
"""

from __future__ import annotations

import html.entities

# name (may or may not include trailing ';') -> replacement text
ENTITIES: dict[str, str] = html.entities.html5

# Longest entity name including the semicolon (``CounterClockwiseContourIntegral;``).
MAX_ENTITY_LEN: int = max(len(k) for k in ENTITIES)

# Entity names contain ';' only as their final character, so the candidate
# ending at the first ';' in the window is the ONLY possible semicolon-
# terminated match — one dict lookup resolves the common well-formed case.
# Only the ~legacy semicolonless subset needs a longest-prefix scan, and that
# set is small; bucket it by first character, longest first.
_BY_FIRST_LEGACY: dict[str, list[str]] = {}
for _name in ENTITIES:
    if not _name.endswith(";"):
        _BY_FIRST_LEGACY.setdefault(_name[0], []).append(_name)
for _k, _v in _BY_FIRST_LEGACY.items():
    # longest first so the first hit is the longest match
    _v.sort(key=len, reverse=True)

# Numeric character references in 0x80-0x9F map through windows-1252
# (HTMLEntities.m:13-48 "Win1252Entities" / WHATWG §13.2.5.80 table).
WIN1252_OVERRIDES: dict[int, int] = {
    0x80: 0x20AC, 0x82: 0x201A, 0x83: 0x0192, 0x84: 0x201E, 0x85: 0x2026,
    0x86: 0x2020, 0x87: 0x2021, 0x88: 0x02C6, 0x89: 0x2030, 0x8A: 0x0160,
    0x8B: 0x2039, 0x8C: 0x0152, 0x8E: 0x017D, 0x91: 0x2018, 0x92: 0x2019,
    0x93: 0x201C, 0x94: 0x201D, 0x95: 0x2022, 0x96: 0x2013, 0x97: 0x2014,
    0x98: 0x02DC, 0x99: 0x2122, 0x9A: 0x0161, 0x9B: 0x203A, 0x9C: 0x0153,
    0x9E: 0x017E, 0x9F: 0x0178,
}

_HEX_DIGITS = set("0123456789abcdefABCDEF")
_DEC_DIGITS = set("0123456789")
_ALNUM = set(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
)


def map_numeric(cp: int, errors: list[str] | None = None) -> str:
    """Map a parsed numeric code point per WHATWG §13.2.5.80."""
    if cp == 0x00:
        if errors is not None:
            errors.append("null-character-reference")
        return "�"
    if cp > 0x10FFFF:
        if errors is not None:
            errors.append("character-reference-outside-unicode-range")
        return "�"
    if 0xD800 <= cp <= 0xDFFF:
        if errors is not None:
            errors.append("surrogate-character-reference")
        return "�"
    if cp in WIN1252_OVERRIDES:
        if errors is not None:
            errors.append("control-character-reference")
        return chr(WIN1252_OVERRIDES[cp])
    if errors is not None:
        if 0xFDD0 <= cp <= 0xFDEF or (cp & 0xFFFE) == 0xFFFE:
            errors.append("noncharacter-character-reference")
        elif cp == 0x0D or (
            cp < 0x20 and cp not in (0x09, 0x0A, 0x0C)
        ) or (0x7F <= cp <= 0x9F):
            errors.append("control-character-reference")
    return chr(cp)


def consume_char_ref(
    s: str,
    i: int,
    in_attribute: bool,
    errors: list[str] | None = None,
) -> tuple[str, int]:
    """Consume a character reference starting at ``s[i]`` == '&'.

    Returns ``(replacement_text, next_index)``. If no reference is consumed,
    returns ``('&', i + 1)`` (the ampersand stands for itself).

    Semantics follow WHATWG §13.2.5.72-80 == the reference's
    ``HTMLTokenizer.m:2244-2333`` + ``HTMLEntities.m:2318-2361``:

    - numeric ``&#…;`` / ``&#x…;`` with win-1252 overrides, surrogates and
      out-of-range → U+FFFD;
    - named references by longest prefix over the 2,231-entry table,
      missing-semicolon tolerance for the legacy subset;
    - in attribute values, a semicolonless match followed by ``=`` or an
      alphanumeric is NOT a reference (historical attribute rule).
    """
    n = len(s)
    j = i + 1
    if j >= n:
        return "&", j
    c = s[j]
    if c == "#":
        k = j + 1
        is_hex = False
        if k < n and s[k] in "xX":
            is_hex = True
            k += 1
        start = k
        digits = _HEX_DIGITS if is_hex else _DEC_DIGITS
        while k < n and s[k] in digits:
            k += 1
        if k == start:
            # absence-of-digits: emit the consumed chars verbatim
            if errors is not None:
                errors.append("absence-of-digits-in-numeric-character-reference")
            return s[i:k], k
        cp = int(s[start:k], 16 if is_hex else 10)
        if k < n and s[k] == ";":
            k += 1
        elif errors is not None:
            errors.append("missing-semicolon-after-character-reference")
        return map_numeric(cp, errors), k
    if c in _ALNUM:
        window = s[j : j + MAX_ENTITY_LEN]
        best = None
        # Semicolon-terminated candidate: unique, one dict lookup.
        semi = window.find(";")
        if semi != -1 and window[: semi + 1] in ENTITIES:
            best = window[: semi + 1]
        else:
            # Legacy semicolonless subset, longest-prefix (HTMLEntities.m:2318).
            for name in _BY_FIRST_LEGACY.get(c, ()):
                if window.startswith(name):
                    best = name
                    break  # bucket is longest-first
        if best is not None:
            end = j + len(best)
            if not best.endswith(";"):
                if in_attribute and end < n and (s[end] in _ALNUM or s[end] == "="):
                    # historical attribute rule: not a char ref
                    return "&", j
                if errors is not None:
                    errors.append("missing-semicolon-after-character-reference")
            return ENTITIES[best], end
        # chars that *look* like a reference (alnum run then ';') → parse error
        k = j
        while k < n and s[k] in _ALNUM:
            k += 1
        if k > j and k < n and s[k] == ";":
            if errors is not None:
                errors.append("unknown-named-character-reference")
    return "&", j
