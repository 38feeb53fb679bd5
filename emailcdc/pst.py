"""Pure-Python read-only Outlook PST reader (P3 — ExtractPSTFile.java).

The reference extracts PST archives through java-libpst
(``ExtractPSTFile.java:100-258``: recursive folder walk :157-168, message
field mapping :169-230, attachment emission :236-258).  No PST library
ships in this sandbox, so this module implements the subset of the public
MS-PST format (MS-PST open specification) that the reference exercises:

- NDB layer: Unicode (wVer ≥ 23) AND ANSI (wVer 14/15) headers — the ANSI
  variant is the same structure with 32-bit BIDs/IBs and shifted page/
  trailer offsets (MS-PST §2.2.2) — NBT/BBT block B-trees, data-tree
  blocks (XBLOCK/XXBLOCK), subnode B-trees (SLBLOCK/SIBLOCK), and the
  ``NDB_CRYPT_PERMUTE`` byte-permutation cipher (MS-PST §5.1).  The LTP
  and messaging layers above the NDB are format-independent.
- LTP layer: heap-on-node (HN), BTree-on-heap (BTH), property contexts
  (PC) and table contexts (TC).
- Messaging layer: folder hierarchy/contents tables, message properties,
  recipient tables, attachment tables + attachment data.

Scope notes (documented limits, all raise loudly):
- CRYPT_CYCLIC (bCryptMethod 2) is implemented per MS-PST §5.3 (the
  bid-keyed three-table cipher java-libpst applies transparently,
  ExtractPSTFile.java:118 ``new PSTFile(...)``), with one caveat: this
  sandbox is offline, so the middle table (mpbbS) is reconstructed from
  the public spec rather than transcribed — 237/256 entries recovered and
  cross-checked against the table's structural invariants (it is a
  self-inverse permutation; see _CYCLIC_S), 19 entries are documented
  placeholders.  The NDB reader decrypts strictly: a block whose lookup
  crosses a placeholder raises PstUnverifiableCipherError and
  dead-letters — never silent corruption; round-trip fixtures built with
  this table (strict=False) exercise the full cipher/NDB path either way.
- RTF bodies decompress via ``decompress_rtf`` (MS-OXRTFCP LZFu — the
  golden archive carries none, so the decoder is pinned by constructed
  round-trip tests against the spec's initial dictionary).

Verified against the reference's golden archive ``test_inbox.pst``
(7 messages / 13 non-empty attachments, ExtractPSTFileTest.java:34-50).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

__all__ = ["PstError", "PstUnverifiableCipherError", "PstFile", "PstMessage",
           "PstAttachment", "PstRecipient"]


class PstError(ValueError):
    """Malformed or unsupported PST input."""


class PstUnverifiableCipherError(PstError):
    """A CryptCyclic block routed through an unrecovered mpbbS placeholder
    entry: the decode would be silently wrong, so the archive must
    dead-letter.  Distinct from plain PstError because the tolerant
    structure-walk fallbacks (empty folder name / no children / no
    messages on a malformed table) MUST NOT swallow it — that would turn
    'cannot decrypt' into '0 messages, no error'."""


# MS-PST §5.1 — NDB_CRYPT_PERMUTE decrypt permutation (ciphertext → plain).
# Validated structurally: every node data block in the golden archive
# decrypts to a valid heap header (bSig 0xEC) under this table and none
# matches undecrypted.
_PERMUTE_DEC = bytes([
    0x47, 0xf1, 0xb4, 0xe6, 0x0b, 0x6a, 0x72, 0x48, 0x85, 0x4e, 0x9e, 0xeb,
    0xe2, 0xf8, 0x94, 0x53, 0xe0, 0xbb, 0xa0, 0x02, 0xe8, 0x5a, 0x09, 0xab,
    0xdb, 0xe3, 0xba, 0xc6, 0x7c, 0xc3, 0x10, 0xdd, 0x39, 0x05, 0x96, 0x30,
    0xf5, 0x37, 0x60, 0x82, 0x8c, 0xc9, 0x13, 0x4a, 0x6b, 0x1d, 0xf3, 0xfb,
    0x8f, 0x26, 0x97, 0xca, 0x91, 0x17, 0x01, 0xc4, 0x32, 0x2d, 0x6e, 0x31,
    0x95, 0xff, 0xd9, 0x23, 0xd1, 0x00, 0x5e, 0x79, 0xdc, 0x44, 0x3b, 0x1a,
    0x28, 0xc5, 0x61, 0x57, 0x20, 0x90, 0x3d, 0x83, 0xb9, 0x43, 0xbe, 0x67,
    0xd2, 0x46, 0x42, 0x76, 0xc0, 0x6d, 0x5b, 0x7e, 0xb2, 0x0f, 0x16, 0x29,
    0x3c, 0xa9, 0x03, 0x54, 0x0d, 0xda, 0x5d, 0xdf, 0xf6, 0xb7, 0xc7, 0x62,
    0xcd, 0x8d, 0x06, 0xd3, 0x69, 0x5c, 0x86, 0xd6, 0x14, 0xf7, 0xa5, 0x66,
    0x75, 0xac, 0xb1, 0xe9, 0x45, 0x21, 0x70, 0x0c, 0x87, 0x9f, 0x74, 0xa4,
    0x22, 0x4c, 0x6f, 0xbf, 0x1f, 0x56, 0xaa, 0x2e, 0xb3, 0x78, 0x33, 0x50,
    0xb0, 0xa3, 0x92, 0xbc, 0xcf, 0x19, 0x1c, 0xa7, 0x63, 0xcb, 0x1e, 0x4d,
    0x3e, 0x4b, 0x1b, 0x9b, 0x4f, 0xe7, 0xf0, 0xee, 0xad, 0x3a, 0xb5, 0x59,
    0x04, 0xea, 0x40, 0x55, 0x25, 0x51, 0xe5, 0x7a, 0x89, 0x38, 0x68, 0x52,
    0x7b, 0xfc, 0x27, 0xae, 0xd7, 0xbd, 0xfa, 0x07, 0xf4, 0xcc, 0x8e, 0x5f,
    0xef, 0x35, 0x9c, 0x84, 0x2b, 0x15, 0xd5, 0x77, 0x34, 0x49, 0xb6, 0x12,
    0x0a, 0x7f, 0x71, 0x88, 0xfd, 0x9d, 0x18, 0x41, 0x7d, 0x93, 0xd8, 0x58,
    0x2c, 0xce, 0xfe, 0x24, 0xaf, 0xde, 0xb8, 0x36, 0xc8, 0xa1, 0x80, 0xa6,
    0x99, 0x98, 0xa8, 0x2f, 0x0e, 0x81, 0x65, 0x73, 0xe4, 0xc2, 0xa2, 0x8a,
    0xd4, 0xe1, 0x11, 0xd0, 0x08, 0x8b, 0x2a, 0xf2, 0xed, 0x9a, 0x64, 0x3f,
    0xc1, 0x6c, 0xf9, 0xec,
])

# MS-PST §5.3 — CryptCyclic middle table (mpbbS), a self-inverse
# permutation applied between the R and I permute tables.  Reconstructed
# offline from the public spec: 237/256 entries recovered and verified
# against the table's structural invariants (S == S⁻¹, S is a bijection —
# a random mis-recall cannot satisfy the pairing, so the 210
# constraint-forced entries cross-confirm each other); the 19 positions
# in _CYCLIC_S_PLACEHOLDERS could not be recovered and hold arbitrary
# involution-preserving values.  The NDB reader decodes with strict=True:
# any block whose lookup crosses a placeholder raises PstError and
# dead-letters deterministically (the LTP structural checks cover only a
# handful of header bytes per block and CANNOT reliably catch a wrong
# placeholder decode — ADVICE r4 #1).  The cipher stays exactly
# self-inverse regardless, so round-trip fixtures exercise the true
# algorithm with strict=False.
_CYCLIC_S = bytes([
    0x14, 0x53, 0x0f, 0x56, 0xb3, 0xc8, 0x7a, 0x9c, 0xeb, 0x65, 0x48, 0x17,
    0x16, 0x15, 0x9f, 0x02, 0xcc, 0x54, 0x7c, 0x83, 0x00, 0x0d, 0x0c, 0x0b,
    0xa2, 0x62, 0xa8, 0x76, 0xdb, 0xd9, 0xed, 0xc7, 0xc5, 0xa4, 0xdc, 0xac,
    0x85, 0x74, 0xd6, 0xd0, 0xa7, 0x9b, 0xae, 0x9a, 0x96, 0x71, 0x66, 0xc3,
    0x63, 0x99, 0xb8, 0xdd, 0x73, 0x92, 0x8e, 0x84, 0x7d, 0xa5, 0x5e, 0xd1,
    0x5d, 0x93, 0xb1, 0x57, 0x51, 0x50, 0x80, 0x89, 0x52, 0x94, 0x4f, 0x4e,
    0x0a, 0x6b, 0xbc, 0x8d, 0x7f, 0x6e, 0x47, 0x46, 0x41, 0x40, 0x44, 0x01,
    0x11, 0xcb, 0x03, 0x3f, 0xf7, 0xf4, 0xe1, 0xa9, 0x8f, 0x3c, 0x3a, 0xf9,
    0xfb, 0xf0, 0x19, 0x30, 0x82, 0x09, 0x2e, 0xc9, 0x9d, 0xa0, 0x86, 0x49,
    0xee, 0x6f, 0x4d, 0x6d, 0xc4, 0x2d, 0x81, 0x34, 0x25, 0x87, 0x1b, 0x88,
    0xaa, 0xfc, 0x06, 0xa1, 0x12, 0x38, 0xfd, 0x4c, 0x42, 0x72, 0x64, 0x13,
    0x37, 0x24, 0x6a, 0x75, 0x77, 0x43, 0xff, 0xe6, 0xb4, 0x4b, 0x36, 0x5c,
    0xe4, 0xd8, 0x35, 0x3d, 0x45, 0xb9, 0x2c, 0xec, 0xb7, 0x31, 0x2b, 0x29,
    0x07, 0x68, 0xa3, 0x0e, 0x69, 0x7b, 0x18, 0x9e, 0x21, 0x39, 0xc6, 0x28,
    0x1a, 0x5b, 0x78, 0xf6, 0x23, 0xd3, 0x2a, 0xcd, 0xe0, 0x3e, 0xda, 0x04,
    0x8c, 0xba, 0xd4, 0x98, 0x32, 0x95, 0xb5, 0xfe, 0x4a, 0xc2, 0xfa, 0xf8,
    0xf2, 0xe9, 0xbd, 0x2f, 0x70, 0x20, 0xa6, 0x1f, 0x05, 0x67, 0xef, 0x55,
    0x10, 0xaf, 0xce, 0xd2, 0x27, 0x3b, 0xcf, 0xad, 0xb6, 0xf5, 0x26, 0xf3,
    0x91, 0x1d, 0xb2, 0x1c, 0x22, 0x33, 0xf1, 0xea, 0xb0, 0x5a, 0xe8, 0xe7,
    0x90, 0xe5, 0x8b, 0xe3, 0xe2, 0xc1, 0xdf, 0x08, 0x97, 0x1e, 0x6c, 0xca,
    0x61, 0xde, 0xc0, 0xd7, 0x59, 0xd5, 0xab, 0x58, 0xbf, 0x5f, 0xbe, 0x60,
    0x79, 0x7e, 0xbb, 0x8a,
])

_CYCLIC_S_PLACEHOLDERS = frozenset([
    187, 190, 191, 213, 215, 222, 223, 226, 227, 229, 231, 232, 234, 241,
    243, 245, 248, 250, 254,
])

# numpy mirror for the vectorized strict check in crypt_cyclic (built once)
try:
    import numpy as _np
    _CYCLIC_PLACEHOLDER_ARR = _np.array(sorted(_CYCLIC_S_PLACEHOLDERS),
                                        dtype=_np.uint8)
except ImportError:  # pragma: no cover - numpy ships in this env
    _CYCLIC_PLACEHOLDER_ARR = None

# mpbbR (encode permute table) is by construction the inverse of mpbbI
# (= _PERMUTE_DEC, validated structurally against the golden archive) —
# MS-PST §5.2 defines I as R's inverse, so no independent transcription
# is needed.
_PERMUTE_ENC = bytes(
    {v: i for i, v in enumerate(_PERMUTE_DEC)}[x] for x in range(256))


def crypt_cyclic(data: bytes, dw_key: int, strict: bool = False) -> bytes:
    """MS-PST §5.3 CryptCyclic — self-inverse, so this both encrypts and
    decrypts.  ``dw_key`` is the low DWORD of the block's BID.  The byte
    recurrence is position-dependent (w increments per byte), so unlike
    permute it cannot be a single translate(); vectorized with numpy when
    available (the per-block cost is O(cb) table lookups either way).

    ``strict=True`` (the NDB reader's setting) raises :class:`PstError`
    if ANY byte's mpbbS lookup lands on one of the 19 unrecovered
    placeholder positions (``_CYCLIC_S_PLACEHOLDERS``): a real archive's
    block routed through a placeholder would decode to silently wrong
    bytes that the LTP structural checks (a handful of header bytes per
    block) cannot reliably catch — dead-lettering deterministically is
    the only safe behavior until the true table is transcribed (ADVICE
    r4 #1).  ``strict=False`` keeps the exact self-inverse algorithm for
    round-trip fixtures and the test builder."""
    w0 = (dw_key ^ (dw_key >> 16)) & 0xFFFF
    try:
        import numpy as np
    except ImportError:  # pragma: no cover - numpy ships in this env
        out = bytearray(len(data))
        w = w0
        for i, b in enumerate(data):
            b = (b + w) & 0xFF
            b = _PERMUTE_ENC[b]
            b = (b + (w >> 8)) & 0xFF
            if strict and b in _CYCLIC_S_PLACEHOLDERS:
                raise PstUnverifiableCipherError(
                    "CryptCyclic block routes through an unrecovered mpbbS "
                    f"entry (index {b}) — refusing to emit unverifiable "
                    "bytes")
            b = _CYCLIC_S[b]
            b = (b - (w >> 8)) & 0xFF
            b = _PERMUTE_DEC[b]
            out[i] = (b - w) & 0xFF
            w = (w + 1) & 0xFFFF
        return bytes(out)
    n = len(data)
    w = (w0 + np.arange(n, dtype=np.uint32)) & 0xFFFF
    lob = (w & 0xFF).astype(np.uint8)
    hib = (w >> 8).astype(np.uint8)
    enc = np.frombuffer(_PERMUTE_ENC, dtype=np.uint8)
    mid = np.frombuffer(_CYCLIC_S, dtype=np.uint8)
    dec = np.frombuffer(_PERMUTE_DEC, dtype=np.uint8)
    b = np.frombuffer(data, dtype=np.uint8)
    b = enc[b + lob]
    mid_idx = (b + hib)  # uint8 wraps — the actual mpbbS lookup index
    if strict and np.isin(mid_idx, _CYCLIC_PLACEHOLDER_ARR).any():
        raise PstUnverifiableCipherError(
            "CryptCyclic block routes through an unrecovered mpbbS entry — "
            "refusing to emit unverifiable bytes")
    b = mid[mid_idx]
    b = dec[b - hib]
    return (b - lob).tobytes()

# property ids used by the reference walk (ExtractPSTFile.java:169-230)
P_DISPLAY_NAME = 0x3001
P_CONTENT_COUNT = 0x3602
P_SUBJECT = 0x0037
P_BODY_PLAIN = 0x1000
P_BODY_HTML = 0x1013
P_BODY_RTF = 0x1009
P_SENDER_NAME = 0x0C1A
P_SENDER_EMAIL = 0x0C1F
P_INTERNET_MSG_ID = 0x1035
P_TRANSPORT_HEADERS = 0x007D
P_EMAIL_ADDRESS = 0x3003
P_SMTP_ADDRESS = 0x39FE
P_ATTACH_DATA = 0x3701
P_ATTACH_FILENAME = 0x3704
P_ATTACH_LONG_FILENAME = 0x3707

# MS-OXRTFCP §2.1.2.2 — the fixed 207-byte initial dictionary for the
# LZFu compressed-RTF scheme ("LZFu" magic).  Built from the spec's
# literal; no compressed-RTF sample exists in the sandbox's golden
# archive (all its messages carry PLAIN bodies), so decode is validated
# by constructed round-trip tests against this dictionary.
_LZFU_INIT_DICT = (
    b"{\\rtf1\\ansi\\mac\\deff0\\deftab720{\\fonttbl;}{\\f0\\fnil \\froman "
    b"\\fswiss \\fmodern \\fscript \\fdecor MS Sans SerifSymbolArialTimes"
    b" New RomanCourier{\\colortbl\\red0\\green0\\blue0\r\n\\par "
    b"\\pard\\plain\\f0\\fs20\\b\\i\\u\\tab\\tx"
)

LZFU_MAGIC_COMPRESSED = 0x75465A4C  # "LZFu"
LZFU_MAGIC_RAW = 0x414C454D         # "MELA"


def decompress_rtf(data: bytes) -> bytes:
    """MS-OXRTFCP decompression: LZ with a 4096-byte circular dictionary
    pre-filled with _LZFU_INIT_DICT; control bytes carry 8 LSB-first
    flags, 0 = literal, 1 = 16-bit big-endian (offset:12, length-2:4)
    dictionary reference; a reference whose offset equals the current
    write position terminates the stream."""
    if len(data) < 16:
        raise PstError("compressed RTF shorter than its header")
    _cb_size, magic, raw_size, _crc = struct.unpack_from("<IIII", data, 0)
    if magic == LZFU_MAGIC_RAW:
        return data[16:16 + raw_size]
    if magic != LZFU_MAGIC_COMPRESSED:
        raise PstError(f"bad compressed-RTF magic {magic:#x}")
    dict_buf = bytearray(4096)
    dict_buf[:len(_LZFU_INIT_DICT)] = _LZFU_INIT_DICT
    wpos = len(_LZFU_INIT_DICT)
    out = bytearray()
    i = 16
    n = len(data)
    while i < n and len(out) < raw_size:
        flags = data[i]
        i += 1
        for bit in range(8):
            if i >= n or len(out) >= raw_size:
                break
            if flags & (1 << bit):
                ref = (data[i] << 8) | data[i + 1]  # big-endian
                i += 2
                offset = ref >> 4
                length = (ref & 0x0F) + 2
                if offset == wpos:
                    return bytes(out)  # end-of-stream marker
                for k in range(length):
                    b = dict_buf[(offset + k) % 4096]
                    out.append(b)
                    dict_buf[wpos] = b
                    wpos = (wpos + 1) % 4096
            else:
                b = data[i]
                i += 1
                out.append(b)
                dict_buf[wpos] = b
                wpos = (wpos + 1) % 4096
    return bytes(out)


NID_ROOT_FOLDER = 290  # 0x122
NID_TYPE_HIERARCHY = 0x0D
NID_TYPE_CONTENTS = 0x0E
NID_RECIPIENT_TABLE = 0x0692
NID_ATTACHMENT_TABLE = 0x0671

# block buffer minus BLOCKTRAILER: 16-byte trailer (Unicode) / 12 (ANSI)
_MAX_BLOCK_DATA_UNICODE = 8192 - 16
_MAX_BLOCK_DATA_ANSI = 8192 - 12


@dataclass
class PstRecipient:
    name: str | None
    email_address: str | None


@dataclass
class PstAttachment:
    filename: str | None
    data: bytes


@dataclass
class PstMessage:
    folder: str
    subject: str | None
    body_plain: str | None
    body_html: str | None
    has_rtf_body: bool
    body_rtf: str | None
    sender_name: str | None
    sender_email: str | None
    internet_message_id: str | None
    transport_headers: str | None
    recipients: list[PstRecipient]
    attachments: list[PstAttachment]


class PstFile:
    """Parse an in-memory PST image (Unicode wVer ≥ 23 or ANSI wVer 14/15).

    PSTs arrive as one change event's binary content; per-archive sizes are
    bounded by the source (mail archives, not the corpus), so in-memory
    parsing inside an Arrow-batched UDF is the right scale shape — the
    PARALLELISM is across archives, not within one.

    java-libpst reads both formats transparently (ExtractPSTFile.java:118
    ``new PSTFile(...)``); the ANSI NDB differences are purely structural:
    32-bit BIDs/IBs, 12-byte block trailers, and shifted header/page
    offsets (MS-PST §2.2.2).  Everything from the heap-on-node up is
    format-independent.
    """

    def __init__(self, data: bytes):
        if data[:4] != b"!BDN":
            raise PstError("not a PST file (bad magic)")
        wVer, = struct.unpack_from("<H", data, 10)
        if wVer in (14, 15):
            self._ansi = True
        elif wVer >= 23:
            self._ansi = False
        else:
            raise PstError(f"unknown PST wVer={wVer}")
        self._raw = data
        self._max_block = (_MAX_BLOCK_DATA_ANSI if self._ansi
                           else _MAX_BLOCK_DATA_UNICODE)
        # ANSI header: ROOT at 164 (BREFs of 4-byte bid/ib at +20),
        # bCryptMethod at 0x1CD; Unicode: ROOT at 180 (8-byte BREFs at
        # +36), bCryptMethod at 0x201 (MS-PST §2.2.2.6)
        crypt = data[0x1CD] if self._ansi else data[0x201]
        self._cyclic = False
        if crypt == 0:
            self._dec = None
        elif crypt == 1:
            self._dec = _PERMUTE_DEC
        elif crypt == 2:  # NDB_CRYPT_CYCLIC — bid-keyed, MS-PST §5.3
            self._dec = None
            self._cyclic = True
        else:
            raise PstError(f"unknown bCryptMethod {crypt}")
        if self._ansi:
            _bid_nbt, ib_nbt, _bid_bbt, ib_bbt = struct.unpack_from(
                "<IIII", data, 184)
        else:
            _bid_nbt, ib_nbt, _bid_bbt, ib_bbt = struct.unpack_from(
                "<QQQQ", data, 216)
        self._nbt: dict[int, tuple[int, int]] = {}   # nid -> (bidData, bidSub)
        self._bbt: dict[int, tuple[int, int]] = {}   # bid -> (ib, cb)
        self._read_btree(ib_nbt)
        self._read_btree(ib_bbt)

    # ---- NDB layer -----------------------------------------------------------

    def _read_btree(self, ib_root: int) -> None:
        # BTPAGE layout (MS-PST §2.2.2.7.7.1): metadata (cEnt cMax cbEnt
        # cLevel) at 488 + trailer ptype at 496 (Unicode) / metadata at 496
        # + trailer ptype at 500 (ANSI)
        meta_off, ptype_off = (496, 500) if self._ansi else (488, 496)
        stack = [ib_root]
        while stack:
            ib = stack.pop()
            page = self._raw[ib:ib + 512]
            if len(page) < 512:
                raise PstError("truncated btree page")
            cEnt, _cMax, cbEnt, cLevel = struct.unpack_from(
                "<BBBB", page, meta_off)
            ptype = page[ptype_off]
            for i in range(cEnt):
                off = i * cbEnt
                if cLevel > 0:
                    if self._ansi:  # BTENTRY: btkey(4) BREF(bid 4, ib 4)
                        _key, _bid, child_ib = struct.unpack_from(
                            "<III", page, off)
                    else:
                        _key, _bid, child_ib = struct.unpack_from(
                            "<QQQ", page, off)
                    stack.append(child_ib)
                elif ptype == 0x81:  # NBT leaf
                    if self._ansi:  # nid(4) bidData(4) bidSub(4) parent(4)
                        nid, bid_data, bid_sub, _parent = struct.unpack_from(
                            "<IIII", page, off)
                    else:
                        nid, bid_data, bid_sub, _parent = struct.unpack_from(
                            "<QQQI", page, off)
                    self._nbt[nid & 0xFFFFFFFF] = (bid_data, bid_sub)
                else:  # 0x80 BBT leaf
                    if self._ansi:  # BREF(bid 4, ib 4) cb(2) cRef(2)
                        bid, ib2, cb, _cref = struct.unpack_from(
                            "<IIHH", page, off)
                    else:
                        bid, ib2, cb, _cref = struct.unpack_from(
                            "<QQHH", page, off)
                    self._bbt[bid] = (ib2, cb)

    def _block(self, bid: int) -> bytes:
        """One raw block's data (decrypted iff it is a leaf DATA block —
        XBLOCK/SLBLOCK metadata is never encrypted, MS-PST §2.2.2.8)."""
        try:
            ib, cb = self._bbt[bid]
        except KeyError:
            raise PstError(f"bid {bid} not in block btree") from None
        data = self._raw[ib:ib + cb]
        if not (bid & 2):
            if self._dec is not None:
                data = data.translate(self._dec)
            elif self._cyclic:
                # key = low DWORD of the BID (MS-PST §5.3); strict — a
                # block crossing an unrecovered mpbbS entry dead-letters
                # instead of yielding silently corrupt bytes
                data = crypt_cyclic(data, bid & 0xFFFFFFFF, strict=True)
        return data

    def _data_blocks(self, bid: int) -> list[bytes]:
        """Resolve a data tree: bid → ordered leaf data blocks."""
        if bid == 0:
            return []
        if not (bid & 2):
            return [self._block(bid)]
        meta = self._block(bid)
        btype, cLevel, cEnt = struct.unpack_from("<BBH", meta, 0)
        if btype != 1:
            raise PstError(f"expected XBLOCK, got btype {btype}")
        # rgbid follows lcbTotal(4) at offset 8; 4-byte bids in ANSI
        bids = struct.unpack_from(
            f"<{cEnt}I" if self._ansi else f"<{cEnt}Q", meta, 8)
        out: list[bytes] = []
        for b in bids:
            if cLevel == 1:
                # XBLOCK (cLevel 1) entries MUST be leaf data blocks
                # (MS-PST §2.2.2.8.3.2.1: rgbid is an array of data-block
                # BIDs); an internal bid here is malformed input — raise
                # loudly rather than emit a placeholder that would shift
                # heap block indices (hid >> 16) and silently corrupt
                # heap-on-node addressing (ADVICE r2)
                if b & 2:
                    raise PstError(
                        f"internal bid {b} inside a cLevel-1 XBLOCK")
                out.append(self._block(b))
            else:  # XXBLOCK → XBLOCKs
                out.extend(self._data_blocks(b))
        return out

    def _subnodes(self, bid_sub: int) -> dict[int, tuple[int, int]]:
        """Subnode btree: nid → (bidData, bidSub)."""
        out: dict[int, tuple[int, int]] = {}
        if bid_sub == 0:
            return out
        meta = self._block(bid_sub)
        btype, cLevel, cEnt = struct.unpack_from("<BBH", meta, 0)
        if btype != 2:
            raise PstError(f"expected SLBLOCK, got btype {btype}")
        if cLevel == 0:
            if self._ansi:  # SLENTRY ANSI: nid(4) bidData(4) bidSub(4)
                for i in range(cEnt):
                    nid, bd, bs = struct.unpack_from("<III", meta, 4 + i * 12)
                    out[nid & 0xFFFFFFFF] = (bd, bs)
            else:  # SLENTRY: nid(8) bidData(8) bidSub(8)
                for i in range(cEnt):
                    nid, bd, bs = struct.unpack_from("<QQQ", meta, 8 + i * 24)
                    out[nid & 0xFFFFFFFF] = (bd, bs)
        else:
            if self._ansi:  # SIENTRY ANSI: nid(4) bid(4)
                for i in range(cEnt):
                    _nid, b = struct.unpack_from("<II", meta, 4 + i * 8)
                    out.update(self._subnodes(b))
            else:  # SIENTRY: nid(8) bid(8) → child SLBLOCKs
                for i in range(cEnt):
                    _nid, b = struct.unpack_from("<QQ", meta, 8 + i * 16)
                    out.update(self._subnodes(b))
        return out

    # ---- LTP layer ------------------------------------------------------------

    def _heap(self, blocks: list[bytes]):
        """hid → bytes accessor over a node's heap-on-node blocks."""
        def get(hid: int) -> bytes:
            block_idx = hid >> 16
            alloc_idx = (hid >> 5) & 0x7FF
            if alloc_idx == 0:
                return b""
            try:
                blk = blocks[block_idx]
            except IndexError:
                raise PstError(f"hid block {block_idx} out of range") from None
            ib_pm, = struct.unpack_from("<H", blk, 0)
            c_alloc, _c_free = struct.unpack_from("<HH", blk, ib_pm)
            if alloc_idx > c_alloc:
                raise PstError(f"hid alloc {alloc_idx} > {c_alloc}")
            offs = struct.unpack_from(f"<{c_alloc + 1}H", blk, ib_pm + 4)
            return blk[offs[alloc_idx - 1]:offs[alloc_idx]]
        return get

    def _bth_records(self, heap, header_hid: int) -> list[tuple[bytes, bytes]]:
        """All (key, data) leaf records of a BTree-on-heap."""
        hdr = heap(header_hid)
        if not hdr:
            return []
        btype, cb_key, cb_ent, levels = struct.unpack_from("<BBBB", hdr, 0)
        hid_root, = struct.unpack_from("<I", hdr, 4)
        if btype != 0xB5:
            raise PstError(f"expected BTH header, got {btype:#x}")
        if hid_root == 0:
            return []
        out: list[tuple[bytes, bytes]] = []

        def walk(hid: int, level: int) -> None:
            data = heap(hid)
            if level > 0:  # intermediate: key + hid(4)
                rec = cb_key + 4
                for i in range(len(data) // rec):
                    child, = struct.unpack_from(
                        "<I", data, i * rec + cb_key)
                    walk(child, level - 1)
            else:
                rec = cb_key + cb_ent
                for i in range(len(data) // rec):
                    off = i * rec
                    out.append((data[off:off + cb_key],
                                data[off + cb_key:off + rec]))

        walk(hid_root, levels)
        return out

    def _node_context(self, nid: int,
                      subtree: dict[int, tuple[int, int]] | None = None):
        """(heap accessor, hidUserRoot, client sig, subnode dict) for a node
        found in the NBT or in a parent node's subnode tree."""
        src = subtree if subtree is not None and nid in subtree else self._nbt
        if nid not in src:
            raise PstError(f"nid {nid} not found")
        bid_data, bid_sub = src[nid]
        blocks = self._data_blocks(bid_data)
        if not blocks:
            raise PstError(f"nid {nid} has no data")
        ib_pm, b_sig, client_sig = struct.unpack_from("<HBB", blocks[0], 0)
        if b_sig != 0xEC:
            raise PstError(f"bad heap signature {b_sig:#x}")
        hid_user_root, = struct.unpack_from("<I", blocks[0], 4)
        return self._heap(blocks), hid_user_root, client_sig, self._subnodes(bid_sub)

    # ---- property context ------------------------------------------------------

    def _pc(self, nid: int,
            subtree: dict[int, tuple[int, int]] | None = None) -> dict[int, object]:
        """Property context → {propId: decoded value}."""
        heap, root, sig, subs = self._node_context(nid, subtree)
        if sig != 0xBC:
            raise PstError(f"expected PC (0xBC), got {sig:#x}")
        props: dict[int, object] = {}
        for key, ent in self._bth_records(heap, root):
            prop_id, = struct.unpack_from("<H", key, 0)
            prop_type, = struct.unpack_from("<H", ent, 0)
            raw4 = ent[2:6]
            props[prop_id] = self._decode_prop(prop_type, raw4, heap, subs)
        return props

    def _decode_prop(self, ptype: int, raw4: bytes, heap, subs):
        ival, = struct.unpack("<I", raw4)
        if ptype in (0x0002, 0x0003, 0x000A, 0x000B, 0x0001, 0x0004):
            return ival  # fixed ≤4-byte scalars (bool stored as dword)
        if ptype in (0x0014, 0x0005, 0x0007, 0x0040):  # 8-byte via HNID
            data = self._hnid_bytes(ival, heap, subs)
            return struct.unpack("<Q", data[:8])[0] if len(data) >= 8 else None
        if ptype == 0x001F:  # PT_UNICODE
            return self._hnid_bytes(ival, heap, subs).decode(
                "utf-16-le", errors="replace")
        if ptype == 0x001E:  # PT_STRING8
            return self._hnid_bytes(ival, heap, subs).decode(
                "cp1252", errors="replace")
        if ptype == 0x0102:  # PT_BINARY
            return self._hnid_bytes(ival, heap, subs)
        if ptype == 0x000D:  # PT_OBJECT: {nid, size} into the subnode tree
            data = self._hnid_bytes(ival, heap, subs)
            if len(data) >= 4:
                onid, = struct.unpack_from("<I", data, 0)
                return ("object", onid)
            return None
        return ival  # unknown types: raw dword (not used by the walk)

    def _hnid_bytes(self, hnid: int, heap, subs) -> bytes:
        """HNID resolution: hidType 0 → heap; else NID → subnode data."""
        if hnid == 0:
            return b""
        if (hnid & 0x1F) == 0:
            return heap(hnid)
        nid = hnid & 0xFFFFFFFF
        if nid not in subs:
            raise PstError(f"subnode nid {nid} missing")
        return b"".join(self._data_blocks(subs[nid][0]))

    # ---- table context -----------------------------------------------------------

    def _tc_rows(self, nid: int,
                 subtree: dict[int, tuple[int, int]] | None = None
                 ) -> list[dict[int, object]]:
        """Table context → list of rows ({propTag-id: value}), including the
        row id under key -1, in row-index order."""
        heap, root, sig, subs = self._node_context(nid, subtree)
        if sig != 0x7C:
            raise PstError(f"expected TC (0x7C), got {sig:#x}")
        info = heap(root)
        _btype, c_cols = struct.unpack_from("<BB", info, 0)
        rgib = struct.unpack_from("<4H", info, 2)
        hid_row_index, hnid_rows = struct.unpack_from("<II", info, 10)
        cols = []
        for i in range(c_cols):
            tag, ib_data, cb_data, _ibit = struct.unpack_from(
                "<IHBB", info, 22 + i * 8)
            # property tag dword = (propId << 16) | propType
            cols.append((tag & 0xFFFF, tag >> 16, ib_data, cb_data, i))
        cb_row = rgib[3]  # TCI_bm: full row width
        ceb_off = rgib[2]  # cell-existence bitmap offset

        # row order: dwRowID → dwRowIndex from the rowindex BTH
        order: dict[int, int] = {}
        for key, ent in self._bth_records(heap, hid_row_index):
            row_id, = struct.unpack("<I", key)
            row_idx, = struct.unpack("<I", ent[:4])
            order[row_idx] = row_id
        n_rows = len(order)
        if n_rows == 0:
            return []

        # row matrix bytes: HID → single heap alloc; NID → subnode blocks
        # with floor(8176/cbRow) rows per block, rows never spanning blocks
        def row_bytes(idx: int) -> bytes:
            if (hnid_rows & 0x1F) == 0:
                data = heap(hnid_rows)
                return data[idx * cb_row:(idx + 1) * cb_row]
            blocks = None
            if hnid_rows in subs:
                blocks = self._data_blocks(subs[hnid_rows][0])
            else:
                raise PstError("TC row matrix subnode missing")
            per = self._max_block // cb_row
            blk = blocks[idx // per]
            off = (idx % per) * cb_row
            return blk[off:off + cb_row]

        rows = []
        for idx in range(n_rows):
            data = row_bytes(idx)
            if len(data) < cb_row:
                raise PstError("short TC row")
            ceb = data[ceb_off:ceb_off + (c_cols + 7) // 8]
            row: dict[int, object] = {-1: order.get(idx)}
            for ptype, pid, ib_data, cb_data, i in cols:
                if not (ceb[i // 8] >> (7 - i % 8)) & 1:
                    continue  # cell absent
                cell = data[ib_data:ib_data + cb_data]
                if cb_data == 4:
                    row[pid] = self._decode_prop(ptype, cell, heap, subs)
                elif cb_data == 8:
                    row[pid] = struct.unpack("<Q", cell)[0]
                elif cb_data == 2:
                    row[pid] = struct.unpack("<H", cell)[0]
                else:
                    row[pid] = cell[0] if cell else None
            rows.append(row)
        return rows

    # ---- messaging layer -----------------------------------------------------------

    @staticmethod
    def _clean_subject(subject):
        """PST subjects carry a 2-char prefix-length control header when the
        first char is 0x01 (java-libpst PSTMessage.getSubject)."""
        if subject and subject[0] == "\x01" and len(subject) >= 2:
            return subject[2:]
        return subject

    def folder_name(self, folder_nid: int) -> str:
        try:
            name = self._pc(folder_nid).get(P_DISPLAY_NAME)
            return name if isinstance(name, str) else ""
        except PstUnverifiableCipherError:
            raise
        except PstError:
            return ""

    def child_folders(self, folder_nid: int) -> list[int]:
        """Hierarchy-table row ids = child folder NIDs
        (ExtractPSTFile.java:157-163 recursion source)."""
        hier_nid = ((folder_nid >> 5) << 5) | NID_TYPE_HIERARCHY
        if hier_nid not in self._nbt:
            return []
        try:
            return [r[-1] for r in self._tc_rows(hier_nid) if r[-1]]
        except PstUnverifiableCipherError:
            raise
        except PstError:
            return []

    def message_nids(self, folder_nid: int) -> list[int]:
        """Contents-table row ids = message NIDs (java:165-167 iteration)."""
        cont_nid = ((folder_nid >> 5) << 5) | NID_TYPE_CONTENTS
        if cont_nid not in self._nbt:
            return []
        try:
            return [r[-1] for r in self._tc_rows(cont_nid) if r[-1]]
        except PstUnverifiableCipherError:
            raise
        except PstError:
            return []

    def message(self, msg_nid: int, folder_name: str) -> PstMessage:
        """Field mapping per ExtractPSTFile.java:169-230."""
        props = self._pc(msg_nid)
        _bid_data, bid_sub = self._nbt[msg_nid]
        subs = self._subnodes(bid_sub)

        recipients: list[PstRecipient] = []
        if NID_RECIPIENT_TABLE in subs:
            for row in self._tc_rows(NID_RECIPIENT_TABLE, subs):
                email = row.get(P_SMTP_ADDRESS) or row.get(P_EMAIL_ADDRESS)
                recipients.append(PstRecipient(
                    name=row.get(P_DISPLAY_NAME),
                    email_address=email if isinstance(email, str) else None))

        attachments: list[PstAttachment] = []
        if NID_ATTACHMENT_TABLE in subs:
            for row in self._tc_rows(NID_ATTACHMENT_TABLE, subs):
                att_nid = row[-1]
                if att_nid is None:
                    continue
                ap = self._pc(att_nid, subs)
                blob = ap.get(P_ATTACH_DATA)
                data = blob if isinstance(blob, (bytes, bytearray)) else b""
                attachments.append(PstAttachment(
                    filename=(ap.get(P_ATTACH_LONG_FILENAME)
                              or ap.get(P_ATTACH_FILENAME)),
                    data=bytes(data)))

        body = props.get(P_BODY_PLAIN)
        html = props.get(P_BODY_HTML)
        if isinstance(html, (bytes, bytearray)):
            html = bytes(html).decode("utf-8", errors="replace")
        rtf_blob = props.get(P_BODY_RTF)
        body_rtf = None
        if isinstance(rtf_blob, (bytes, bytearray)):
            try:
                body_rtf = decompress_rtf(bytes(rtf_blob)).decode(
                    "cp1252", errors="replace")
            except PstError:
                body_rtf = None
        return PstMessage(
            folder=folder_name,
            subject=self._clean_subject(props.get(P_SUBJECT)),
            body_plain=body if isinstance(body, str) else None,
            body_html=html if isinstance(html, str) else None,
            has_rtf_body=isinstance(rtf_blob, (bytes, bytearray)),
            body_rtf=body_rtf,
            sender_name=props.get(P_SENDER_NAME),
            sender_email=props.get(P_SENDER_EMAIL),
            internet_message_id=props.get(P_INTERNET_MSG_ID),
            transport_headers=props.get(P_TRANSPORT_HEADERS),
            recipients=recipients,
            attachments=attachments,
        )

    def walk_messages(self) -> list[PstMessage]:
        """Depth-first folder walk, children before the folder's own
        contents — the reference's processFolder order (java:157-168)."""
        out: list[PstMessage] = []

        def walk(folder_nid: int) -> None:
            for child in self.child_folders(folder_nid):
                walk(child)
            name = self.folder_name(folder_nid)
            for mn in self.message_nids(folder_nid):
                out.append(self.message(mn, name))

        walk(NID_ROOT_FOLDER)
        return out


def parse_pst(data: bytes) -> list[PstMessage]:
    """Parse a PST image → messages in the reference's folder-walk order."""
    return PstFile(data).walk_messages()
