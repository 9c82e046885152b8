"""Encoding sniffing & WHATWG label resolution (bytes → str stage).

Reference parity: /root/reference/Sources/HTMLEncoding.m —
``DeterminedStringEncodingForData`` (:19-116: BOM → Content-Type charset →
lossy windows-1252 → ISO-8859-1 fallback) and the WHATWG label table
(:124-360) with binary-search lookup (:433-442). Mid-parse
``<meta charset>`` restarts (HTMLParser.m:446-542) are realized as a cheap
pre-scan of the first 1024 bytes (SURVEY.md §7.3.3) so the per-document
decode is one pass in the common case.

Confidence mirrors ``HTMLStringEncoding.confidence``
(HTMLEncoding+Private.h:8-15): Tentative / Certain / Irrelevant.
"""

from __future__ import annotations

import codecs
import re
from typing import Optional

TENTATIVE, CERTAIN, IRRELEVANT = "tentative", "certain", "irrelevant"

# WHATWG encoding labels → Python codec names. Public data from the WHATWG
# Encoding Standard (the same table the reference embeds at
# HTMLEncoding.m:124-360). Keys are lowercased labels.
_L: dict[str, str] = {}


def _add(codec: str, *labels: str) -> None:
    for lab in labels:
        _L[lab] = codec


_add("utf-8", "unicode-1-1-utf-8", "utf-8", "utf8", "unicode11utf8",
     "unicode20utf8", "x-unicode20utf8")
_add("ibm866", "866", "cp866", "csibm866", "ibm866")
_add("iso-8859-2", "csisolatin2", "iso-8859-2", "iso-ir-101", "iso8859-2",
     "iso88592", "iso_8859-2", "iso_8859-2:1987", "l2", "latin2")
_add("iso-8859-3", "csisolatin3", "iso-8859-3", "iso-ir-109", "iso8859-3",
     "iso88593", "iso_8859-3", "iso_8859-3:1988", "l3", "latin3")
_add("iso-8859-4", "csisolatin4", "iso-8859-4", "iso-ir-110", "iso8859-4",
     "iso88594", "iso_8859-4", "iso_8859-4:1988", "l4", "latin4")
_add("iso-8859-5", "csisolatincyrillic", "cyrillic", "iso-8859-5",
     "iso-ir-144", "iso8859-5", "iso88595", "iso_8859-5", "iso_8859-5:1988")
_add("iso-8859-6", "arabic", "asmo-708", "csiso88596e", "csiso88596i",
     "csisolatinarabic", "ecma-114", "iso-8859-6", "iso-8859-6-e",
     "iso-8859-6-i", "iso-ir-127", "iso8859-6", "iso88596", "iso_8859-6",
     "iso_8859-6:1987")
_add("iso-8859-7", "csisolatingreek", "ecma-118", "elot_928", "greek",
     "greek8", "iso-8859-7", "iso-ir-126", "iso8859-7", "iso88597",
     "iso_8859-7", "iso_8859-7:1987", "sun_eu_greek")
_add("iso-8859-8", "csiso88598e", "csisolatinhebrew", "hebrew", "iso-8859-8",
     "iso-8859-8-e", "iso-ir-138", "iso8859-8", "iso88598", "iso_8859-8",
     "iso_8859-8:1988", "visual")
_add("iso-8859-8", "csiso88598i", "iso-8859-8-i", "logical")  # -i variant
_add("iso-8859-10", "csisolatin6", "iso-8859-10", "iso-ir-157", "iso8859-10",
     "iso885910", "l6", "latin6")
_add("iso-8859-13", "iso-8859-13", "iso8859-13", "iso885913")
_add("iso-8859-14", "iso-8859-14", "iso8859-14", "iso885914")
_add("iso-8859-15", "csisolatin9", "iso-8859-15", "iso8859-15", "iso885915",
     "iso_8859-15", "l9")
_add("iso-8859-16", "iso-8859-16")
_add("koi8-r", "cskoi8r", "koi", "koi8", "koi8-r", "koi8_r")
_add("koi8-u", "koi8-ru", "koi8-u")
_add("mac-roman", "csmacintosh", "mac", "macintosh", "x-mac-roman")
_add("cp874", "dos-874", "iso-8859-11", "iso8859-11", "iso885911",
     "tis-620", "windows-874")
_add("cp1250", "cp1250", "windows-1250", "x-cp1250")
_add("cp1251", "cp1251", "windows-1251", "x-cp1251")
_add("cp1252", "ansi_x3.4-1968", "ascii", "cp1252", "cp819", "csisolatin1",
     "ibm819", "iso-8859-1", "iso-ir-100", "iso8859-1", "iso88591",
     "iso_8859-1", "iso_8859-1:1987", "l1", "latin1", "us-ascii",
     "windows-1252", "x-cp1252")
_add("cp1253", "cp1253", "windows-1253", "x-cp1253")
_add("cp1254", "cp1254", "csisolatin5", "iso-8859-9", "iso-ir-148",
     "iso8859-9", "iso88599", "iso_8859-9", "iso_8859-9:1989", "l5",
     "latin5", "windows-1254", "x-cp1254")
_add("cp1255", "cp1255", "windows-1255", "x-cp1255")
_add("cp1256", "cp1256", "windows-1256", "x-cp1256")
_add("cp1257", "cp1257", "windows-1257", "x-cp1257")
_add("cp1258", "cp1258", "windows-1258", "x-cp1258")
_add("mac-cyrillic", "x-mac-cyrillic", "x-mac-ukrainian")
_add("gbk", "chinese", "csgb2312", "csiso58gb231280", "gb2312", "gb_2312",
     "gb_2312-80", "gbk", "iso-ir-58", "x-gbk")
_add("gb18030", "gb18030")
_add("big5", "big5", "big5-hkscs", "cn-big5", "csbig5", "x-x-big5")
_add("euc-jp", "cseucpkdfmtjapanese", "euc-jp", "x-euc-jp")
_add("iso-2022-jp", "csiso2022jp", "iso-2022-jp")
_add("shift_jis", "csshiftjis", "ms932", "ms_kanji", "shift-jis",
     "shift_jis", "sjis", "windows-31j", "x-sjis")
_add("euc-kr", "cseuckr", "csksc56011987", "euc-kr", "iso-ir-149", "korean",
     "ks_c_5601-1987", "ks_c_5601-1989", "ksc5601", "ksc_5601",
     "windows-949")
# The WHATWG "replacement" encoding: these labels decode any input to a
# single U+FFFD (a defense against cross-charset XSS smuggling). Python has
# no such codec; decode_html_bytes special-cases the sentinel.
_add("replacement", "csiso2022kr", "hz-gb-2312", "iso-2022-cn",
     "iso-2022-cn-ext", "iso-2022-kr", "replacement")
_add("x-user-defined", "x-user-defined")
_add("utf-16be", "unicodefffe", "utf-16be")
_add("utf-16le", "csunicode", "iso-10646-ucs-2", "ucs-2", "unicode",
     "unicodefeff", "utf-16", "utf-16le")

WHATWG_LABELS = _L


def encoding_for_label(label: str) -> Optional[str]:
    """S4: WHATWG label → canonical Python codec (HTMLEncoding.m:433-442).

    ``replacement`` and ``x-user-defined`` are returned as sentinels and
    handled by :func:`decode_html_bytes` (no Python codec exists)."""
    if label is None:
        return None
    codec = _L.get(label.strip().lower())
    if codec is None:
        return None
    if codec in ("replacement", "x-user-defined"):
        return codec
    try:
        codecs.lookup(codec)
    except LookupError:  # pragma: no cover — all mapped codecs exist
        return None
    return codec


def _decode_special(data: bytes, codec: str) -> Optional[str]:
    if codec == "replacement":
        return "\ufffd" if data else ""
    if codec == "x-user-defined":
        # WHATWG: ASCII passthrough, 0x80-0xFF → U+F780 + (b - 0x80)
        return "".join(
            chr(b) if b < 0x80 else chr(0xF780 + b - 0x80) for b in data
        )
    return None


_CHARSET_IN_CONTENT_TYPE = re.compile(
    rb"""charset\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s;"']*))""", re.IGNORECASE
)
_COMMENT_BYTES = re.compile(rb"<!--.*?-->", re.S)
_META_CHARSET = re.compile(
    rb"""<meta[^>]+?(?:charset\s*=\s*["']?\s*([a-zA-Z0-9_\-:.]+)"""
    rb"""|content\s*=\s*["'][^"']*charset=([a-zA-Z0-9_\-:.]+))""",
    re.IGNORECASE,
)


def sniff_encoding(
    data: bytes, content_type: Optional[str] = None
) -> tuple[str, str]:
    """S3: returns ``(python_codec, confidence)`` (HTMLEncoding.m:19-116).

    Order: BOM (Certain/Irrelevant) → Content-Type charset (Certain) →
    ``<meta charset>`` pre-scan of the first 1024 bytes (Tentative; stands
    in for the reference's parse-restart S5, SURVEY.md §7.3.3) →
    windows-1252 (Tentative) — the reference's ISO-8859-1 terminal fallback
    is cp1252 per WHATWG, which decodes any byte sequence.
    """
    if data.startswith(b"\xef\xbb\xbf"):
        return "utf-8-sig", IRRELEVANT
    if data.startswith(b"\xfe\xff"):
        return "utf-16-be", IRRELEVANT
    if data.startswith(b"\xff\xfe"):
        return "utf-16-le", IRRELEVANT
    if content_type:
        m = _CHARSET_IN_CONTENT_TYPE.search(content_type.encode("ascii", "ignore"))
        if m:
            label = (m.group(1) or m.group(2) or m.group(3)).decode("ascii", "ignore")
            codec = encoding_for_label(label)
            if codec:
                return codec, CERTAIN
    head = data[:1024]
    # WHATWG prescan skips comments: a commented-out <meta charset> must
    # not win; an unterminated <!-- swallows the rest of the window
    head = _COMMENT_BYTES.sub(b"", head)
    bang = head.find(b"<!--")
    if bang != -1:
        head = head[:bang]
    m = _META_CHARSET.search(head)
    if m:
        label = (m.group(1) or m.group(2)).decode("ascii", "ignore")
        codec = encoding_for_label(label)
        if codec:
            # per spec, utf-16 meta labels resolve to utf-8
            if codec.startswith("utf-16"):
                codec = "utf-8"
            return codec, TENTATIVE
    return "cp1252", TENTATIVE


def decode_html_bytes(
    data: bytes, content_type: Optional[str] = None
) -> tuple[str, str, str]:
    """S1/S3/S5 combined: bytes → ``(text, codec, confidence)``.

    A tentative decode that hits errors retries as windows-1252 with
    ``errors='replace'`` — document-local, embarrassingly parallel, exactly
    the reference's restart boundary (HTMLParser.m:3336-3344) minus the
    mid-parse abort (we pre-scanned meta).
    """
    codec, confidence = sniff_encoding(data, content_type)
    special = _decode_special(data, codec)
    if special is not None:
        return special, codec, confidence
    try:
        return data.decode(codec), codec, confidence
    except (UnicodeDecodeError, LookupError):
        if confidence == CERTAIN:
            return data.decode(codec, errors="replace"), codec, confidence
        return data.decode("cp1252", errors="replace"), "cp1252", TENTATIVE
