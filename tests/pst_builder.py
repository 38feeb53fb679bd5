"""Minimal PST writer for reader tests — emits BOTH Unicode (wVer 23) and
ANSI (wVer 15) images of the same logical mailbox so emailcdc.pst can be
differentially tested across formats (the golden archive is Unicode-only).

Writes only what the reader consumes (MS-PST subset): header magic/wVer/
bCryptMethod/BREFs, one NBT + one BBT leaf page, heap-on-node blocks with
BTH-based property contexts and table contexts, and per-message SLBLOCK
subnode trees carrying recipient/attachment tables.  No CRCs, AMaps or
block trailers — the reader never touches them.
"""

from __future__ import annotations

import struct

from emailcdc import pst as pstmod

P_DISPLAY_NAME = 0x3001
P_SUBJECT = 0x0037
P_BODY_PLAIN = 0x1000
P_SENDER_NAME = 0x0C1A
P_SENDER_EMAIL = 0x0C1F
P_INTERNET_MSG_ID = 0x1035
P_EMAIL_ADDRESS = 0x3003
P_ATTACH_DATA = 0x3701
P_ATTACH_LONG_FILENAME = 0x3707

PT_UNICODE = 0x001F
PT_BINARY = 0x0102

NID_ROOT = 0x122
NID_HIER = 0x12D
NID_CONT = 0x12E
NID_RECIP_TABLE = 0x0692
NID_ATTACH_TABLE = 0x0671


def _hid(i: int) -> int:
    return i << 5  # hidType 0, block 0


def _heap_block(client_sig: int, allocs: list[bytes]) -> bytes:
    """HN block: 12-byte header, allocations, HNPAGEMAP."""
    body = b"".join(allocs)
    ib_pm = 12 + len(body)
    header = struct.pack("<HBBI", ib_pm, 0xEC, client_sig, _hid(1)) + b"\0" * 4
    offs = [12]
    for a in allocs:
        offs.append(offs[-1] + len(a))
    pagemap = struct.pack("<HH", len(allocs), 0)
    pagemap += struct.pack(f"<{len(allocs) + 1}H", *offs)
    return header + body + pagemap


def _bth_header(cb_key: int, cb_ent: int, hid_root: int) -> bytes:
    return struct.pack("<BBBBI", 0xB5, cb_key, cb_ent, 0, hid_root)


def _pc_block(props: dict[int, tuple[int, object]]) -> bytes:
    """Property-context heap block.  props: propId → (propType, value);
    PT_UNICODE values are str (stored in their own heap alloc), PT_BINARY
    values are bytes, scalars are ints stored inline."""
    value_allocs: list[bytes] = []
    records = b""
    next_idx = 3  # alloc 1 = BTH header, 2 = records, 3+ = values
    for pid in sorted(props):
        ptype, val = props[pid]
        if ptype == PT_UNICODE:
            value_allocs.append(str(val).encode("utf-16-le"))
            raw4 = _hid(next_idx)
            next_idx += 1
        elif ptype == PT_BINARY:
            value_allocs.append(bytes(val))
            raw4 = _hid(next_idx)
            next_idx += 1
        else:
            raw4 = int(val)
        records += struct.pack("<HHI", pid, ptype, raw4)
    allocs = [_bth_header(2, 6, _hid(2) if records else 0), records]
    allocs += value_allocs
    return _heap_block(0xBC, allocs)


def _tc_block(columns: list[tuple[int, int]],
              rows: list[tuple[int, dict[int, object]]]) -> bytes:
    """Table-context heap block.  columns: (propId, propType) — PT_UNICODE
    cells only (4-byte HNIDs); rows: (row_id, {propId: str_value})."""
    n_cols = len(columns)
    data_w = 4 * n_cols
    ceb_off = data_w
    cb_row = data_w + (n_cols + 7) // 8 if n_cols else 4
    # alloc plan: 1 TCINFO, 2 rowidx BTH header, 3 rowidx records (if any),
    # 4 row matrix (if any), 5+ string cells
    have_rows = bool(rows)
    rowidx_records = b"".join(
        struct.pack("<II", rid, idx) for idx, (rid, _) in enumerate(rows))
    str_allocs: list[bytes] = []
    next_idx = 5 if have_rows else 3
    matrix = b""
    for rid, cells in rows:
        row = bytearray(cb_row)
        ceb = bytearray((n_cols + 7) // 8)
        for i, (pid, ptype) in enumerate(columns):
            if pid not in cells:
                continue
            str_allocs.append(str(cells[pid]).encode("utf-16-le"))
            struct.pack_into("<I", row, 4 * i, _hid(next_idx))
            next_idx += 1
            ceb[i // 8] |= 1 << (7 - i % 8)
        row[ceb_off:ceb_off + len(ceb)] = ceb
        matrix += bytes(row)
    col_descs = b""
    for i, (pid, ptype) in enumerate(columns):
        col_descs += struct.pack("<IHBB", (pid << 16) | ptype, 4 * i, 4, i)
    tcinfo = struct.pack(
        "<BB4HIII", 0x7C, n_cols, data_w, data_w, ceb_off, cb_row,
        _hid(2), _hid(4) if have_rows else 0, 0) + col_descs
    allocs = [tcinfo,
              _bth_header(4, 4, _hid(3) if have_rows else 0)]
    if have_rows:
        allocs += [rowidx_records, matrix]
    allocs += str_allocs
    return _heap_block(0x7C, allocs)


def build_pst(messages: list[dict], *, ansi: bool,
              folder: str = "Inbox", crypt: int = 0) -> bytes:
    """One-folder PST with the given messages.  Each message dict:
    subject, body, sender_name, sender_email, message_id (strs),
    recipients: [(name, email)], attachments: [(filename, bytes)].
    ``crypt``: bCryptMethod — 0 none, 1 NDB_CRYPT_PERMUTE, 2
    NDB_CRYPT_CYCLIC (leaf data blocks encrypted; internal blocks never,
    MS-PST §2.2.2.8)."""
    blocks: list[tuple[int, bytes]] = []   # (bid, data)
    nbt: list[tuple[int, int, int]] = []   # (nid, bidData, bidSub)
    next_bid = [4]

    def add_block(data: bytes, *, internal: bool = False) -> int:
        bid = next_bid[0] | (2 if internal else 0)
        next_bid[0] += 4
        blocks.append((bid, data))
        return bid

    # root folder PC + empty hierarchy + contents table
    nbt.append((NID_ROOT,
                add_block(_pc_block({P_DISPLAY_NAME: (PT_UNICODE, folder)})),
                0))
    nbt.append((NID_HIER, add_block(_tc_block([], [])), 0))
    msg_nids = [(i + 1) << 5 | 0x04 for i in range(len(messages))]
    nbt.append((NID_CONT,
                add_block(_tc_block([], [(n, {}) for n in msg_nids])), 0))

    for nid, msg in zip(msg_nids, messages):
        subnodes: list[tuple[int, int]] = []   # (nid, bidData)
        recips = msg.get("recipients") or []
        if recips:
            rows = [(0x10 | 0x1F | ((i + 1) << 5),
                     {P_DISPLAY_NAME: nm, P_EMAIL_ADDRESS: em})
                    for i, (nm, em) in enumerate(recips)]
            subnodes.append((NID_RECIP_TABLE, add_block(_tc_block(
                [(P_DISPLAY_NAME, PT_UNICODE), (P_EMAIL_ADDRESS, PT_UNICODE)],
                rows))))
        atts = msg.get("attachments") or []
        if atts:
            att_nids = [0x8005 + (i << 5) for i in range(len(atts))]
            for anid, (fname, data) in zip(att_nids, atts):
                subnodes.append((anid, add_block(_pc_block({
                    P_ATTACH_LONG_FILENAME: (PT_UNICODE, fname),
                    P_ATTACH_DATA: (PT_BINARY, data),
                }))))
            subnodes.append((NID_ATTACH_TABLE, add_block(_tc_block(
                [], [(anid, {}) for anid in att_nids]))))
        bid_sub = 0
        if subnodes:
            if ansi:
                sl = struct.pack("<BBH", 2, 0, len(subnodes))
                for snid, sbid in subnodes:
                    sl += struct.pack("<III", snid, sbid, 0)
            else:
                sl = struct.pack("<BBH", 2, 0, len(subnodes)) + b"\0" * 4
                for snid, sbid in subnodes:
                    sl += struct.pack("<QQQ", snid, sbid, 0)
            bid_sub = add_block(sl, internal=True)
        props = {
            P_SUBJECT: (PT_UNICODE, msg.get("subject", "")),
            P_BODY_PLAIN: (PT_UNICODE, msg.get("body", "")),
            P_SENDER_NAME: (PT_UNICODE, msg.get("sender_name", "")),
            P_SENDER_EMAIL: (PT_UNICODE, msg.get("sender_email", "")),
            P_INTERNET_MSG_ID: (PT_UNICODE, msg.get("message_id", "")),
        }
        nbt.append((nid, add_block(_pc_block(props)), bid_sub))

    # ---- assemble file: header, NBT page, BBT page, blocks ----------------
    nbt_ib, bbt_ib, data_ib = 1024, 1536, 2048  # header pad to 1 KiB
    # (the Unicode header alone runs past 512: bCryptMethod at 0x201)
    bbt: list[tuple[int, int, int]] = []
    blob = b""
    for bid, data in blocks:
        if crypt and not (bid & 2):  # leaf data blocks only
            if crypt == 1:
                data = data.translate(pstmod._PERMUTE_ENC)
            elif crypt == 2:  # self-inverse, keyed by low DWORD of bid
                data = pstmod.crypt_cyclic(data, bid & 0xFFFFFFFF)
            else:
                raise ValueError(f"unknown crypt {crypt}")
        bbt.append((bid, data_ib + len(blob), len(data)))
        blob += data

    def page(entries: list[bytes], cb_ent: int, ptype: int) -> bytes:
        pg = bytearray(512)
        pg[0:sum(len(e) for e in entries)] = b"".join(entries)
        meta_off, ptype_off = (496, 500) if ansi else (488, 496)
        struct.pack_into("<BBBB", pg, meta_off, len(entries), 0, cb_ent, 0)
        pg[ptype_off] = ptype
        return bytes(pg)

    if ansi:
        nbt_page = page([struct.pack("<IIII", n, bd, bs, 0)
                         for n, bd, bs in nbt], 16, 0x81)
        bbt_page = page([struct.pack("<IIHH", b, ib, cb, 1)
                         for b, ib, cb in bbt], 12, 0x80)
    else:
        nbt_page = page([struct.pack("<QQQI", n, bd, bs, 0) + b"\0" * 4
                         for n, bd, bs in nbt], 32, 0x81)
        bbt_page = page([struct.pack("<QQHH", b, ib, cb, 1) + b"\0" * 4
                         for b, ib, cb in bbt], 24, 0x80)

    hdr = bytearray(1024)
    hdr[0:4] = b"!BDN"
    struct.pack_into("<H", hdr, 10, 15 if ansi else 23)
    if ansi:
        struct.pack_into("<IIII", hdr, 184, 0, nbt_ib, 0, bbt_ib)
        hdr[0x1CD] = crypt
    else:
        struct.pack_into("<QQQQ", hdr, 216, 0, nbt_ib, 0, bbt_ib)
        hdr[0x201] = crypt
    return bytes(hdr) + nbt_page + bbt_page + blob
