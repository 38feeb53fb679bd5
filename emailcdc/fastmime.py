"""Minimal fast RFC-5322/MIME parser for the extraction hot path.

``email.feedparser`` costs ~65% of the payload parse (cProfile); this
module parses the common case — well-formed headers, nested multiparts,
base64/quoted-printable transfer encodings — with plain string scans and
near-zero intermediate allocation, and **raises FastMimeBail on anything
it is not 100% sure about**, so the caller (extract.parse_eml) falls back
to the stdlib parser.  Equivalence on the accept path is enforced by
differential tests (tests/test_fastmime.py) against the stdlib-backed
reference implementation over all fixture shapes plus hypothesis-mutated
variants.

Interface: ``FastPart`` mimics the slice of email.message.Message that
extract.py uses: get / get_all / items / is_multipart / get_payload /
get_content_type / get_content_charset.
"""

from __future__ import annotations

import base64
import quopri
import re

__all__ = ["FastMimeBail", "FastPart", "parse"]

_HDR_RE = re.compile(r"^([\x21-\x39\x3b-\x7e]+):[ \t]?(.*)$")
# field-name alphabet of _HDR_RE as a strip() set: a name is valid iff
# stripping every allowed char leaves nothing — one C-level scan instead
# of a regex match object per header line
_FIELD_CHARS = "".join(chr(c) for c in range(0x21, 0x7F) if c != 0x3A)
_CHARSET_RE = re.compile(r'charset="?([A-Za-z0-9_.:+-]+)"?', re.IGNORECASE)
_BOUNDARY_RE = re.compile(r'boundary="?([^";]+)"?', re.IGNORECASE)


class FastMimeBail(Exception):
    """Input outside the fast path — caller must use the stdlib parser."""


class FastPart:
    __slots__ = ("_headers", "_body", "_parts", "_ct", "_hmap")

    def __init__(self, headers: list[tuple[str, str]], body: str | None,
                 parts: list["FastPart"] | None):
        self._headers = headers
        self._body = body
        self._parts = parts
        self._ct = None
        self._hmap = None

    # --- header access (email.message.Message compatible subset) -----------
    # lookups lower() every stored name per call in the naive form; with
    # ~11 get()/get_all() calls per message that was ~10% of the whole
    # parse stage (966k str.lower calls per 9k messages profiled) — build
    # the case-folded index once, lazily

    def _index(self):
        hmap: dict[str, list[str]] = {}
        for k, v in self._headers:
            hmap.setdefault(k.lower(), []).append(v)
        self._hmap = hmap
        return hmap

    def get(self, name: str, default=None):
        vals = (self._hmap or self._index()).get(name.lower())
        return vals[0] if vals else default

    def get_all(self, name: str, default=None):
        vals = (self._hmap or self._index()).get(name.lower())
        return list(vals) if vals else default

    def items(self):
        return list(self._headers)

    # --- structure -----------------------------------------------------------

    def is_multipart(self) -> bool:
        return self._parts is not None

    def get_payload(self, decode: bool = False):
        if self._parts is not None:
            if decode:
                return None  # stdlib returns None for multipart+decode
            return self._parts
        if not decode:
            return self._body
        cte = (self.get("Content-Transfer-Encoding") or "").strip().lower()
        raw = self._body or ""
        if cte in ("", "7bit", "8bit", "binary"):
            # stdlib encodes str payloads with raw-unicode-escape here
            return raw.encode("ascii", "surrogateescape") if raw.isascii() \
                else raw.encode("raw_unicode_escape")
        if cte == "base64":
            try:
                return base64.b64decode(raw, validate=False)
            except Exception as exc:  # noqa: BLE001
                raise FastMimeBail(f"bad base64: {exc}") from exc
        if cte == "quoted-printable":
            # match the stdlib: encode surviving non-ASCII chars the same way
            # the 7bit branch does (ascii+surrogateescape, else
            # raw-unicode-escape), NOT ascii/'replace' which turns them
            # into '?' and changes body text / attachment hashes
            enc = (raw.encode("ascii", "surrogateescape") if raw.isascii()
                   else raw.encode("raw_unicode_escape"))
            return quopri.decodestring(enc)
        raise FastMimeBail(f"unsupported CTE {cte!r}")

    def get_content_type(self) -> str:
        ct = self.get("Content-Type")
        if ct is None:
            return "text/plain"
        main = ct.split(";", 1)[0].strip().lower()
        if "/" not in main:
            raise FastMimeBail(f"odd content type {ct!r}")
        return main

    def get_content_charset(self):
        ct = self.get("Content-Type")
        if not ct:
            return None
        m = _CHARSET_RE.search(ct)
        return m.group(1).lower() if m else None


def _split_headers(text: str, start: int) -> tuple[list[tuple[str, str]], int]:
    """Parse folded headers from ``start``; returns (headers, body_start)."""
    headers: list[tuple[str, str]] = []
    i = start
    n = len(text)
    prev_sep = "\n"
    while i < n:
        j = text.find("\n", i)
        if j < 0:
            j = n
        line = text[i:j]
        sep = "\n"
        if line.endswith("\r"):
            line = line[:-1]
            sep = "\r\n"
        if line == "":
            return headers, j + 1
        if line[0] in " \t":
            # folding: stdlib keeps the embedded line terminator in the value
            if not headers:
                raise FastMimeBail("continuation before first header")
            k, v = headers[-1]
            headers[-1] = (k, v + prev_sep + line)
            prev_sep = sep
            i = j + 1
            continue
        prev_sep = sep
        # manual split — same acceptance as _HDR_RE (name of _FIELD_CHARS,
        # ':', at most one stripped SP/TAB) without regex overhead
        ci = line.find(":")
        if ci <= 0 or line[:ci].strip(_FIELD_CHARS):
            # stdlib treats a non-header line as the start of the body
            # (missing-blank-line defect) — bail, let stdlib decide
            raise FastMimeBail(f"unparseable header line {line[:40]!r}")
        value = line[ci + 1:]
        if value[:1] in (" ", "\t"):
            value = value[1:]
        headers.append((line[:ci], value))
        i = j + 1
    return headers, n  # headers only, no body


def _parse_entity(text: str, start: int, end: int, depth: int = 0) -> FastPart:
    if depth > 8:
        raise FastMimeBail("nesting too deep")
    headers, body_start = _split_headers(text, start)
    body = text[body_start:end]
    ct = None
    for k, v in headers:
        if k.lower() == "content-type":
            ct = v
            break
    main_type = (ct or "").split("/", 1)[0].strip().lower()
    if main_type == "message":
        # message/rfc822: the part body IS a full nested message — parse it
        # as one child entity, mirroring the stdlib's [Message] payload
        # (forwarded mail no longer degrades to the slow path — VERDICT r2
        # #7).  Other message/* subtypes (delivery-status, partial) have
        # bespoke stdlib structures, and an encoded nested message needs a
        # decode pass first — both stay outside the fast path.
        full_ct = (ct or "").split(";", 1)[0].strip().lower()
        if full_ct != "message/rfc822":
            raise FastMimeBail(f"message subtype {full_ct!r}")
        cte = ""
        for k, v in headers:
            if k.lower() == "content-transfer-encoding":
                cte = v.strip().lower()
                break
        if cte not in ("", "7bit", "8bit", "binary"):
            raise FastMimeBail(f"encoded message/rfc822 ({cte!r})")
        nested = _parse_entity(text, body_start, end, depth + 1)
        return FastPart(headers, None, [nested])
    if ct is not None and main_type == "multipart":
        m = _BOUNDARY_RE.search(ct)
        if not m:
            raise FastMimeBail("multipart without boundary")
        boundary = m.group(1)
        parts = _split_multipart(text, body_start, end, boundary, depth)
        return FastPart(headers, None, parts)
    return FastPart(headers, body, None)


def _split_multipart(text: str, start: int, end: int, boundary: str,
                     depth: int) -> list[FastPart]:
    open_marker = "--" + boundary
    # collect boundary-line offsets (must start a line)
    offsets: list[tuple[int, bool]] = []  # (line_start, is_closing)
    i = start
    while i < end:
        j = text.find(open_marker, i)
        if j < 0 or j >= end:
            break
        line_ok = j == 0 or text[j - 1] == "\n"
        after = j + len(open_marker)
        closing = text[after:after + 2] == "--"
        line_end = text.find("\n", j)
        if line_end < 0:
            line_end = end
        tail = text[after + (2 if closing else 0):line_end].strip("\r ")
        if line_ok and tail == "":
            offsets.append((j, closing))
            if closing:
                break
        i = line_end + 1
    if len(offsets) < 2:
        raise FastMimeBail("too few boundary markers")
    parts: list[FastPart] = []
    for (b0, closing0), (b1, _c1) in zip(offsets, offsets[1:]):
        if closing0:
            break
        part_start = text.find("\n", b0)
        if part_start < 0:
            raise FastMimeBail("boundary without newline")
        part_start += 1
        # the part body ends just before the next boundary line (strip the
        # preceding CRLF, which belongs to the boundary per RFC 2046)
        part_end = b1
        if part_end > part_start and text[part_end - 1] == "\n":
            part_end -= 1
            if part_end > part_start and text[part_end - 1] == "\r":
                part_end -= 1
        parts.append(_parse_entity(text, part_start, part_end, depth + 1))
    if not offsets[-1][1]:
        raise FastMimeBail("unterminated multipart")
    return parts


def parse(raw: str) -> FastPart:
    """Parse a full message; raises FastMimeBail outside the fast path."""
    if "\x00" in raw:
        raise FastMimeBail("NUL in input")
    # every '\r' must begin a '\r\n' pair — two C-level counts instead of
    # a lookahead-regex scan (each '\r\n' consumes exactly one '\r', so
    # the counts differ iff a bare CR exists)
    if raw.count("\r") != raw.count("\r\n"):
        # the stdlib (like JavaMail, AbstractJavaMailProcessor.java:134-190)
        # treats a bare CR as a line terminator; this scanner only splits on
        # LF, so any lone '\r' would be swallowed into a header value or body
        # ('0:\r0' counterexample, VERDICT r3 #1) — refuse and fall back
        raise FastMimeBail("bare CR line terminator")
    return _parse_entity(raw, 0, len(raw))
