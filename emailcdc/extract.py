"""Vectorized email/calendar extraction payload.

Re-expresses the reference bundle's per-record transforms as pure-Python
functions driven from Arrow-batched pandas UDFs (``mapInPandas``) — no
per-row Python UDFs (``F.udf``) anywhere.

Reference parity map (file:line cites relative to /root/reference/):
- ``split_address``   ← AbstractJavaMailProcessor.java:118-132 (E1)
- ``parse_eml``       ← AbstractJavaMailProcessor.java:134-290 (E2-E4, A1-A2)
- ``split_mbox``      ← ExtractMBoxFile.java:103-130 (P2)
- ``parse_ics``       ← ExtractICal.java:109-174 (P4, E8, K2)

Documented deliberate deviations (each has a parity test pinning it):
1. Attachment filename fallback: the reference uses ``UUID.randomUUID() +
   ".png"`` when the content-type has no ``name=`` part
   (AbstractJavaMailProcessor.java:268-272).  Random names break
   exactly-once replay, so we derive ``sha256(folder|message_id|part_index)
   [:32] + ".png"`` — deterministic, collision-safe.
2. Inline-body flush order: the reference flushes its ``inlineBodies``
   HashMap in JVM hash order; we use discovery (insertion) order, which is
   deterministic and test-pinned.
3. The reference's ``findBody`` aborts the whole walk (``return``) when an
   attachment's content is an unsupported type
   (AbstractJavaMailProcessor.java:226-233); we skip just that part.

Quirks reproduced exactly:
- ``In-Reply-To`` matched case-SENSITIVELY, internal ``message-id``
  case-INSENSITIVELY (AbstractJavaMailProcessor.java:168-171).
- Inline text parts get ``body_type`` = literal ``text/plain``/``text/html``
  while non-inline bodies get enum ``PLAIN``/``HTML``
  (AbstractJavaMailProcessor.java:236-249,255-262).
- ``message_id`` field = the message *number* as string (JavaMail
  ``getMessageNumber()``: 0 for a bare MimeMessage/EML, 1-based for mbox)
  — AbstractJavaMailProcessor.java:147; the RFC Message-ID header only
  feeds attachment back-references.
- Blank subject → ``""`` (java:137); missing From → ``""`` through E1,
  which yields name="" email_address="" (the no-angle-bracket branch).
- E1 failure path (≥2 ``<`` tokens) yields an *empty* SenderReceiverDetails
  struct (both fields null) but the recipient row is still appended
  (java:149-158).
- ``handleAttachement`` filename = naive ``split(';')[1].replace('name=','')
  .trim()`` of the content-type — quotes are NOT stripped (java:266-272).
- ICal ``record.count`` counts ALL calendar components, not just VEVENTs
  (ExtractICal.java:128); ``name`` = the component name literal ``VEVENT``
  (ical4j ``event.getName()``, ExtractICal.java:149).
"""

from __future__ import annotations

import base64
import hashlib
import re
from datetime import datetime, timedelta, timezone
from email import policy
from email.message import Message
from email.parser import Parser

__all__ = [
    "split_address",
    "parse_eml",
    "split_mbox",
    "parse_ics",
    "extract_event",
    "sha256_hex",
]

_ADDR_SPLIT = re.compile(r"\s*<")
_QUOTE = re.compile(r'"')
_ANGLE_QUOTE = re.compile(r'[<>"]')


def sha256_hex(text: str) -> str:
    return hashlib.sha256(text.encode("utf-8", errors="surrogateescape")).hexdigest()


def split_address(email: str) -> dict:
    """E1 — ``handleEmailAddress`` (AbstractJavaMailProcessor.java:118-132).

    Returns {name, email_address}; the failure path (≠2 tokens after
    splitting on ``\\s*<``) returns both fields None — the caller still
    appends the empty struct, matching the Java MapRecord behavior.
    """
    if "<" in email and ">" in email:
        split = _ADDR_SPLIT.split(email)
        if len(split) != 2:
            return {"name": None, "email_address": None}
        return {
            "name": _QUOTE.sub("", split[0]),
            "email_address": _ANGLE_QUOTE.sub("", split[1]),
        }
    return {"name": email, "email_address": email}


def _deterministic_filename(folder: str, message_id: str | None, part_index: int) -> str:
    """Deviation 1: replayable replacement for the reference's uuid4 fallback."""
    key = f"{folder}|{message_id}|{part_index}".encode()
    return hashlib.sha256(key).hexdigest()[:32] + ".png"


def _attachment_attrs(content_type: str, folder: str, message_id: str | None,
                      part_index: int) -> tuple[str, str]:
    """A1 filename/mime parse — AbstractJavaMailProcessor.java:266-276.

    Naive ``;`` split; parts[1] keeps everything after removing the literal
    ``name=`` (quotes preserved, exactly like the Java ``String.replace``).
    """
    parts = content_type.split(";")
    if len(parts) == 1:
        filename = _deterministic_filename(folder, message_id, part_index)
    else:
        filename = parts[1].replace("name=", "").strip()
    return filename, parts[0].strip()


def _part_text(part: Message) -> str:
    payload = part.get_payload(decode=True)
    if payload is None:
        payload_obj = part.get_payload()
        return payload_obj if isinstance(payload_obj, str) else ""
    charset = part.get_content_charset() or "utf-8"
    try:
        return payload.decode(charset, errors="replace")
    except LookupError:
        return payload.decode("utf-8", errors="replace")


def _walk_multipart(folder: str, rfc_message_id: str | None, parts: list[Message],
                    bodies: list, attachments: list, part_counter: list[int]) -> None:
    """E4 — ``findBody`` (AbstractJavaMailProcessor.java:205-264)."""
    inline_bodies: dict[str, str] = {}
    for part in parts:
        # raw header reads; get_content_type()/get_content_disposition() walk
        # the param parser and cost ~30% of the whole parse when used as an
        # (eagerly-evaluated) default
        raw_disp = part.get("Content-Disposition")
        disposition = raw_disp.split(";", 1)[0].strip().lower() if raw_disp else ""
        ct = part.get("Content-Type") or part.get_content_type()
        part_counter[0] += 1
        idx = part_counter[0]
        if disposition == "attachment":
            raw = part.get_payload(decode=True)
            if raw is None:
                inner = part.get_payload()
                if isinstance(inner, str):
                    raw = inner.encode("utf-8", errors="replace")
                elif isinstance(inner, list) and inner and inner[0].get_content_type().startswith("text"):
                    # nested message/rfc822 whose content is a string (java:219-226)
                    raw = _part_text(inner[0]).encode("utf-8", errors="replace")
                else:
                    continue  # deviation 3: skip part, don't abort walk
            filename, mime = _attachment_attrs(ct, folder, rfc_message_id, idx)
            attachments.append(
                {
                    "filename": filename,
                    "mime.type": mime,
                    "messageId": rfc_message_id,
                    "folder": folder,
                    "_bytes": raw,
                }
            )
        elif disposition == "inline":
            if ct.startswith("text/plain"):
                inline_bodies["text/plain"] = _part_text(part)
            elif ct.startswith("text/html"):
                inline_bodies["text/html"] = _part_text(part)
            elif part.get("Content-Transfer-Encoding", "").lower() == "base64":
                # inline binary (BASE64DecoderStream branch, java:239-241)
                raw = part.get_payload(decode=True) or b""
                filename, mime = _attachment_attrs(ct, folder, rfc_message_id, idx)
                attachments.append(
                    {
                        "filename": filename,
                        "mime.type": mime,
                        "messageId": rfc_message_id,
                        "folder": folder,
                        "_bytes": raw,
                    }
                )
        elif raw_disp is None:
            if part.is_multipart() and not ct.lower().lstrip().startswith("message/"):
                _walk_multipart(folder, rfc_message_id, part.get_payload(),
                                bodies, attachments, part_counter)
            else:
                body_type = "HTML" if "html" in ct.lower() else "PLAIN"
                bodies.append({"body": _part_text(part), "body_type": body_type})
    # inline flush (java:255-263); deviation 2: insertion order
    for key, value in inline_bodies.items():
        bodies.append({"body": value, "body_type": key})


def parse_eml(raw: str, folder: str = "", message_number: int = 0,
              _fast: bool = True) -> dict:
    """Parse one RFC-5322 message → EmailMessage dict (E2/E3/E4/A1/A2).

    ``message_number`` reproduces JavaMail ``getMessageNumber()`` (0 for a
    bare EML, 1-based within an mbox).

    Hot path: fastmime (plain string scans — email.feedparser is ~65% of
    the stdlib parse cost); it bails on anything outside the well-formed
    common case and we fall back to the stdlib parser.  Differential tests
    (tests/test_fastmime.py) pin accept-path equality.
    """
    if _fast:
        from . import fastmime
        try:
            msg = fastmime.parse(raw)
            return _assemble_message(msg, folder, message_number)
        except fastmime.FastMimeBail:
            pass
        except Exception:  # noqa: BLE001 — never let the fast path change totality
            pass
    msg = Parser(policy=policy.compat32).parsestr(raw)
    return _assemble_message(msg, folder, message_number)


def _assemble_message(msg, folder: str, message_number: int) -> dict:

    subject = msg.get("Subject")
    subject = "" if subject is None or subject.strip() == "" else str(subject)

    from_header = msg.get("From")
    sender = str(from_header) if from_header is not None else ""
    sender_details = split_address(sender)

    recipients = []
    for hdr in ("To", "Cc", "Bcc"):
        for value in msg.get_all(hdr, []):
            for addr in _split_address_list(str(value)):
                recipients.append(split_address(addr))

    headers: dict[str, str] = {}
    in_reply_to = None
    rfc_message_id = None
    for name, value in msg.items():
        headers[name] = str(value)  # HashMap.put → last-one-wins
        if name == "In-Reply-To":  # case-SENSITIVE (java:168)
            in_reply_to = str(value)
        elif name.lower() == "message-id":  # case-INSENSITIVE (java:170)
            rfc_message_id = str(value)

    bodies: list = []
    attachments: list = []
    if msg.is_multipart():
        _walk_multipart(folder, rfc_message_id, msg.get_payload(),
                        bodies, attachments, [0])
    else:
        bodies.append({"body": _part_text(msg), "body_type": "PLAIN"})

    return {
        "folder": folder,
        "message_id": str(message_number),
        "subject": subject,
        "sender_details": sender_details,
        "recipients": recipients,
        "in_reply_to": in_reply_to,
        "headers": headers,
        "bodies": bodies,
        "attachments": attachments,  # each carries _bytes for the blob sink
    }


def _split_address_list(value: str) -> list[str]:
    """Split a To/Cc header into individual addresses the way JavaMail's
    ``getAllRecipients`` yields one Address per entry (comma-separated,
    commas inside angle brackets or quotes respected)."""
    out, depth, quoted, cur = [], 0, False, []
    for ch in value:
        if ch == '"':
            quoted = not quoted
        elif ch == "<" and not quoted:
            depth += 1
        elif ch == ">" and not quoted:
            depth = max(0, depth - 1)
        elif ch == "," and depth == 0 and not quoted:
            token = "".join(cur).strip()
            if token:
                out.append(token)
            cur = []
            continue
        cur.append(ch)
    token = "".join(cur).strip()
    if token:
        out.append(token)
    return out


_FROM_LINE = re.compile(r"^From .*$", re.MULTILINE)


def split_mbox(raw: str) -> list[str]:
    """P2 — split an mbox file into per-message RFC-5322 texts.

    The mstor/JavaMail store iterates messages delimited by ``From ``
    separator lines (ExtractMBoxFile.java:103-130); message numbers are
    1-based in file order.
    """
    messages = []
    starts = [m.start() for m in _FROM_LINE.finditer(raw)]

    # Only 'From ' lines at position 0 or preceded by a BLANK LINE are true
    # separators (mboxrd convention; body 'From ' lines are usually quoted).
    # The blank line is "\n\n" (LF files) or "\r\n\r\n" (CRLF files) — a
    # bare preceding "\r\n" is just any CRLF line ending, and accepting it
    # split every CRLF body line starting 'From ' into a bogus message
    # (ADVICE r1).
    def _is_separator(s: int) -> bool:
        if s == 0:
            return True
        if s >= 2 and raw[s - 2:s] == "\n\n":
            return True
        return s >= 4 and raw[s - 4:s] == "\r\n\r\n"

    true_starts = [s for s in starts if _is_separator(s)]
    for i, start in enumerate(true_starts):
        end = true_starts[i + 1] if i + 1 < len(true_starts) else len(raw)
        chunk = raw[start:end]
        # drop the From_ line itself
        nl = chunk.find("\n")
        body = chunk[nl + 1:] if nl >= 0 else ""
        messages.append(body.rstrip("\n") + "\n")
    return messages


# --- iCalendar (P4/E8) ------------------------------------------------------

_ICS_DT_FORMATS = ("%Y%m%dT%H%M%SZ", "%Y%m%dT%H%M%S", "%Y%m%d")


def _ics_unfold(raw: str) -> list[str]:
    lines: list[str] = []
    for line in raw.replace("\r\n", "\n").replace("\r", "\n").split("\n"):
        if line[:1] in (" ", "\t") and lines:
            lines[-1] += line[1:]
        else:
            lines.append(line)
    return [l for l in lines if l]


_ICS_WEEKDAYS = {"MO": 0, "TU": 1, "WE": 2, "TH": 3, "FR": 4, "SA": 5, "SU": 6}


def _ics_offset(value: str) -> "timedelta | None":
    from datetime import timedelta

    m = re.fullmatch(r"([+-])(\d{2})(\d{2})(\d{2})?", value.strip())
    if not m:
        return None
    sign = 1 if m.group(1) == "+" else -1
    return sign * timedelta(hours=int(m.group(2)), minutes=int(m.group(3)),
                            seconds=int(m.group(4) or 0))


class _VtzRules:
    """DST-aware custom timezone: the STANDARD/DAYLIGHT sections'
    ``RRULE:FREQ=YEARLY;BYMONTH=m;BYDAY=±nXX`` transitions evaluated the
    way ical4j resolves TZID datetimes (ExtractICal.java:140-146 via
    DateProperty.getDate()).  Month + nth-weekday covers real-world feeds
    (US/EU civil rules); transition comparison is on local wall clock."""

    def __init__(self, rules: list[dict]):
        self.rules = rules  # {offset_to, month, weekday, nth, tod_seconds}

    @staticmethod
    def _nth_weekday(year: int, month: int, weekday: int, nth: int) -> "datetime":
        import calendar

        if nth > 0:
            first = datetime(year, month, 1)
            days = (weekday - first.weekday()) % 7 + (nth - 1) * 7
            return first + timedelta(days=days)
        last = datetime(year, month, calendar.monthrange(year, month)[1])
        days = (last.weekday() - weekday) % 7 + (-nth - 1) * 7
        return last - timedelta(days=days)

    def offset_at(self, dt: "datetime") -> "timedelta":
        transitions = []
        for r in self.rules:
            for year in (dt.year - 1, dt.year):
                t = (self._nth_weekday(year, r["month"], r["weekday"], r["nth"])
                     + timedelta(seconds=r["tod_seconds"]))
                transitions.append((t, r["offset_to"]))
        transitions.sort(key=lambda t: t[0])
        off = transitions[0][1]
        for t, o in transitions:
            if t <= dt:
                off = o
        return off


def _ics_vtimezones(lines: list[str]) -> dict[str, object]:
    """Custom timezone map from VTIMEZONE components: TZID → either a fixed
    ``timedelta`` (STANDARD TZOFFSETTO, when the zone defines no evaluable
    DST rules) or a ``_VtzRules`` evaluating the STANDARD/DAYLIGHT yearly
    nth-weekday transitions (VERDICT r2 #4 — ical4j applies them).
    IANA-named TZIDs never reach this map (zoneinfo handles them,
    DST-correct)."""
    from datetime import timedelta

    out: dict[str, object] = {}
    sections: dict[str, list[dict]] = {}
    tzid: str | None = None
    section: str | None = None
    cur: dict | None = None
    in_vtz = False
    for line in lines:
        key_part, _, value = line.partition(":")
        key = key_part.split(";")[0].upper()
        v = value.strip().upper()
        if key == "BEGIN" and v == "VTIMEZONE":
            in_vtz, tzid = True, None
            sections = {}
        elif key == "END" and v == "VTIMEZONE":
            in_vtz = False
            if tzid:
                out[tzid] = _resolve_vtz(sections)
        elif in_vtz:
            if key == "TZID":
                tzid = value.strip()
            elif key == "BEGIN":
                section = v
                cur = {}
                sections.setdefault(section, []).append(cur)
            elif key == "END":
                section, cur = None, None
            elif cur is not None:
                cur[key] = value.strip()
    return {t: o for t, o in out.items() if o is not None}


def _resolve_vtz(sections: dict[str, list[dict]]) -> object | None:
    """One VTIMEZONE's sections → fixed timedelta or _VtzRules."""
    std = (sections.get("STANDARD") or [{}])[0]
    std_off = _ics_offset(std.get("TZOFFSETTO", ""))
    rules = []
    for sec_list in sections.values():
        for sec in sec_list:
            off = _ics_offset(sec.get("TZOFFSETTO", ""))
            rr = sec.get("RRULE", "")
            parts = dict(p.split("=", 1) for p in rr.split(";") if "=" in p)
            m = re.fullmatch(r"(-?\d+)?([A-Z]{2})",
                             parts.get("BYDAY", "").strip())
            if (off is None or parts.get("FREQ") != "YEARLY"
                    or not parts.get("BYMONTH", "").isdigit() or not m
                    or m.group(2) not in _ICS_WEEKDAYS):
                continue
            tod = 2 * 3600  # RFC 5545 default when DTSTART is absent
            dtstart = sec.get("DTSTART", "")
            tm = re.search(r"T(\d{2})(\d{2})(\d{2})", dtstart)
            if tm:
                tod = (int(tm.group(1)) * 3600 + int(tm.group(2)) * 60
                       + int(tm.group(3)))
            rules.append({
                "offset_to": off,
                "month": int(parts["BYMONTH"]),
                "weekday": _ICS_WEEKDAYS[m.group(2)],
                "nth": int(m.group(1) or 1),
                "tod_seconds": tod,
            })
    if len(rules) >= 2:
        return _VtzRules(rules)
    return std_off  # no evaluable DST pair → fixed STANDARD offset


def _ics_fixed_dt(value: str) -> tuple[datetime, bool] | None:
    """strptime-free parse of the three fixed ICS shapes
    (_ICS_DT_FORMATS) — strptime was ~13% of the ICS stage.  Returns
    (naive datetime, utc-instant-or-date?) or None; out-of-range fields
    raise ValueError inside datetime() exactly where strptime would."""
    n = len(value)
    try:
        if n == 16 and value[8] == "T" and value[15] == "Z" \
                and value[:8].isdigit() and value[9:15].isdigit():
            return datetime(int(value[:4]), int(value[4:6]), int(value[6:8]),
                            int(value[9:11]), int(value[11:13]),
                            int(value[13:15])), True
        if n == 15 and value[8] == "T" \
                and value[:8].isdigit() and value[9:15].isdigit():
            return datetime(int(value[:4]), int(value[4:6]), int(value[6:8]),
                            int(value[9:11]), int(value[11:13]),
                            int(value[13:15])), False
        if n == 8 and value.isdigit():
            return datetime(int(value[:4]), int(value[4:6]),
                            int(value[6:8])), True
    except ValueError:
        return None
    return None


def _ics_datetime(value: str, params: dict[str, str] | None = None,
                  vtz: dict | None = None) -> datetime | None:
    """DTSTART/DTEND/CREATED value → aware UTC datetime.

    ical4j semantics (ExtractICal.java:140-146 via DateProperty.getDate()):
    - trailing 'Z'                → UTC instant
    - ``TZID=<zone>`` parameter   → local time in that zone (IANA name via
      zoneinfo, DST-correct), converted to UTC; custom TZIDs defined by a
      VTIMEZONE block use its STANDARD offset (``_ics_vtimezones``)
    - ``VALUE=DATE`` / bare date  → midnight UTC (ical4j's Date type is
      UTC-anchored)
    - floating local time         → UTC (documented deviation: ical4j uses
      the JVM default zone, which is deployment-dependent; pinning UTC
      keeps replays deterministic)
    """
    value = value.strip()
    params = params or {}
    tzid = params.get("TZID")
    parsed = _ics_fixed_dt(value)
    if parsed is not None:
        dt, is_instant = parsed
        if is_instant:
            return dt.replace(tzinfo=timezone.utc)
        if tzid:
            try:
                from zoneinfo import ZoneInfo
                return dt.replace(tzinfo=ZoneInfo(tzid)).astimezone(timezone.utc)
            except Exception:  # noqa: BLE001 — not an IANA name
                pass
            if vtz and tzid in vtz:
                off = vtz[tzid]
                if isinstance(off, _VtzRules):
                    off = off.offset_at(dt)  # DST-aware custom TZID
                return (dt - off).replace(tzinfo=timezone.utc)
        return dt.replace(tzinfo=timezone.utc)
    return None


def parse_ics(raw: str) -> tuple[list[dict], int]:
    """Parse VCALENDAR text → (VEVENT records, total component count).

    Returns the ``record.count`` quirk value: TOTAL components in the
    calendar (VEVENT or not), per ExtractICal.java:128.  Field mapping per
    ``buildEvent`` (ExtractICal.java:148-174): name = component name
    literal, attendees = ATTENDEE values with ``mailto:`` prefix stripped,
    dates → epoch-millis timestamps.
    """
    lines = _ics_unfold(raw)
    vtz = _ics_vtimezones(lines)
    events: list[dict] = []
    component_count = 0
    current: dict | None = None
    depth_stack: list[str] = []
    for line in lines:
        if ":" not in line:
            continue
        key_part, _, value = line.partition(":")
        key_tokens = key_part.split(";")
        key = key_tokens[0].upper()
        params = {}
        for tok in key_tokens[1:]:
            pname, _, pval = tok.partition("=")
            params[pname.strip().upper()] = pval.strip()
        if key == "BEGIN":
            comp = value.strip().upper()
            if comp != "VCALENDAR":
                if not depth_stack:
                    component_count += 1
                depth_stack.append(comp)
                if comp == "VEVENT" and len(depth_stack) == 1:
                    current = {
                        "name": "VEVENT",
                        "description": None,
                        "summary": None,
                        "date_created": None,
                        "start_date": None,
                        "end_date": None,
                        "url": None,
                        "attendees": [],
                    }
            continue
        if key == "END":
            comp = value.strip().upper()
            if depth_stack and depth_stack[-1] == comp:
                depth_stack.pop()
                if comp == "VEVENT" and not depth_stack and current is not None:
                    events.append(current)
                    current = None
            continue
        if current is None or depth_stack[-1:] != ["VEVENT"]:
            continue
        if key == "SUMMARY":
            current["summary"] = value
        elif key == "DESCRIPTION":
            current["description"] = value
        elif key == "URL":
            current["url"] = value
        elif key == "CREATED":
            current["date_created"] = _ics_datetime(value, params, vtz)
        elif key == "DTSTART":
            current["start_date"] = _ics_datetime(value, params, vtz)
        elif key == "DTEND":
            current["end_date"] = _ics_datetime(value, params, vtz)
        elif key == "ATTENDEE":
            v = value.strip()
            if v.startswith("mailto:"):
                v = v.replace("mailto:", "", 1)
            current["attendees"].append(v)
    return events, component_count


# --- PST semantic layer (E5/E6/E7) -------------------------------------------
# The binary PST container needs java-libpst/pypff (not in this sandbox);
# these functions carry the reference's PST *semantics* for a pre-extracted
# PST row source (SURVEY.md §2.1 P3/E5/E6/E7), with parity tests.

_PST_DATE_HEADER = "Date"


def pst_body_precedence(plain: str | None, html: str | None,
                        rtf: str | None) -> dict:
    """E5 — first non-null of PLAIN > HTML > RTF; all null raises (the
    reference throws ProcessException("Missing body."), ExtractPSTFile
    .java:174-185)."""
    if plain is not None:
        return {"body": plain, "body_type": "PLAIN"}
    if html is not None:
        return {"body": html, "body_type": "HTML"}
    if rtf is not None:
        return {"body": rtf, "body_type": "RTF"}
    raise ValueError("Missing body.")


def parse_transport_headers(raw: str | None) -> dict[str, str]:
    """E6 — PST transport-header parse (ExtractPSTFile.java:204-227).

    Split on CR/LF, skip empties, split each line on ``:\\s+`` keeping
    2-token pairs only (the reference logs-and-continues on ≠2 tokens but
    then still indexes split[1] — a latent IndexOutOfBounds for valueless
    headers; we keep the documented "pairs only" intent instead of the
    crash — SURVEY.md §2.1 E6 deviation).  Date header quirk reproduced:
    if the value has 4 comma-separated tokens, keep only the first two
    (ExtractPSTFile.java:217-223)."""
    headers: dict[str, str] = {}
    if not raw:
        return headers
    for line in re.split(r"[\r\n]+", raw):
        if not line.strip():
            continue
        parts = re.split(r":\s+", line)  # no limit — exactly Java's split()
        if len(parts) != 2:
            continue
        name, value = parts[0], parts[1]
        if name == _PST_DATE_HEADER:
            tokens = value.split(",")
            if len(tokens) == 4:
                value = ",".join(tokens[:2])
        headers[name] = value
    return headers


def pst_message_to_email(msg) -> dict:
    """Map a parsed PST message (pst.PstMessage) onto the EmailMessage dict
    shape — field mapping per ExtractPSTFile.java:169-230:

    - bodies: ALWAYS one PLAIN entry.  java-libpst's ``getStringItem``
      returns "" (never null) for an absent body, so the reference's
      HTML/RTF precedence branches (java:176-185) are unreachable at
      runtime — the golden archive's bodyless LocalFreebusy message still
      emits a PLAIN/"" body and never the "Missing body." failure.  The
      declared precedence lives on in ``pst_body_precedence`` (E5) for
      pre-extracted row sources.
    - sender_details taken directly from the PST sender props
      (java:187-190) — NOT through the E1 address split.
    - message_id = the Internet message id (java:202) — unlike the
      EML/mbox path, which uses the JavaMail message number.
    - headers from the transport headers with the 4-token Date rewrite
      (java:207-227 — parse_transport_headers, E6).
    """
    def s(v):  # java-libpst getStringItem: absent → ""
        return v if isinstance(v, str) else ""

    return {
        "folder": s(msg.folder),
        "message_id": s(msg.internet_message_id),
        "subject": s(msg.subject),
        "sender_details": {"name": s(msg.sender_name),
                           "email_address": s(msg.sender_email)},
        "recipients": [
            {"name": r.name, "email_address": r.email_address}
            for r in msg.recipients
        ],
        "in_reply_to": None,
        "headers": parse_transport_headers(msg.transport_headers),
        "bodies": [{"body": s(msg.body_plain), "body_type": "PLAIN"}],
        "attachments": [
            {
                "filename": a.filename,
                # the reference's PST attachment FlowFiles carry no mime
                # attribute (java:236-258: filename/source.pst.file/
                # source.message.id only)
                "mime.type": None,
                "messageId": s(msg.internet_message_id),
                "folder": s(msg.folder),
                "_bytes": a.data,
            }
            for a in msg.attachments
        ],
    }


# --- per-event dispatch (used by the engine's mapInPandas stage) ------------


def validate_missing_field_config(strategy: str, substitution: str | None) -> None:
    """R3 config validation — parity with customValidate
    (ExtractMBoxFile.java:60-76, AbstractJavaMailProcessor.java:69-93):
    strategy 'value' requires a non-blank substitution."""
    if strategy not in ("error", "empty", "value"):
        raise ValueError(f"invalid missing-field strategy: {strategy!r}")
    if strategy == "value" and (substitution is None or not substitution.strip()):
        raise ValueError(
            "missing-field strategy 'value' requires a non-empty substitution value")


def apply_missing_field_strategy(message: dict, strategy: str,
                                 substitution: str | None) -> dict | None:
    """R3 — handle an absent sender per the configured strategy.

    NOTE: the reference *declares* this property but never consumes it in
    processing code (only customValidate); the processing default is the
    'empty' behavior (missing From → "" through E1).  We implement the
    declared contract: 'empty' keeps "" (reference behavior), 'value'
    substitutes, 'error' returns None → caller dead-letters the message.
    """
    sd = message.get("sender_details") or {}
    missing = not (sd.get("email_address") or "").strip()
    if not missing:
        return message
    if strategy == "empty":
        return message
    if strategy == "value":
        message["sender_details"] = {"name": substitution,
                                     "email_address": substitution}
        return message
    return None  # error strategy


def extract_event(repo: str, path: str, offset, commit: str | None,
                  lang: str | None, content: str | None,
                  error_strategy: str = "continue",
                  missing_field_strategy: str = "empty",
                  missing_field_substitution: str | None = None,
                  folder_override: str | None = None) -> dict:
    """Process one change event's content → {messages, attachments,
    calendar_entries, failures} lists of dicts (schemas.py shapes).

    ``lang`` selects the extractor the way NiFi flow design routes FlowFiles
    to a processor: eml → P1, mbox → P2, ics → P4, pst → P3; other langs
    yield no payload rows (the sink still upserts the key).
    ``error_strategy`` implements R2 (AbstractJavaMailProcessor.java:96-107):
    ``continue`` isolates per-message errors, ``failure`` dead-letters the
    whole event.  ``folder_override`` is the evaluated FOLDER_IDENTIFIER
    expression (AbstractJavaMailProcessor.java:58-67 — an EL expression
    over FlowFile attributes; here a Spark SQL expression over the event
    columns, evaluated JVM-side in udfs.extract_envelope); absent, the
    defaults mirror the reference flows: mbox → filename (= path), eml →
    "".
    """
    out = {"messages": [], "attachments": [], "calendar_entries": [], "failures": []}
    # sha only matters for rows we actually emit — skip it for source-code
    # langs (they produce no payload rows; the snapshot sha is computed
    # JVM-side with F.sha2 in the engine).
    sha = (sha256_hex(content)
           if content is not None and lang in ("eml", "mbox", "ics", "pst")
           else None)

    def _fail(err: str) -> None:
        out["failures"].append(
            {"repo": repo, "path": path, "event_offset": offset,
             "lang": lang, "error": err, "content_sha256": sha}
        )

    if content is None:
        return out

    base = {"repo": repo, "path": path, "event_offset": offset,
            "commit": commit, "lang": lang}

    def _emit_message(parsed: dict, seq: int) -> None:
        if missing_field_strategy != "empty":
            handled = apply_missing_field_strategy(
                parsed, missing_field_strategy, missing_field_substitution)
            if handled is None:  # R3 'error': dead-letter this message
                _fail(f"message {seq}: missing sender")
                return
            parsed = handled
        atts = parsed.pop("attachments")
        att_refs = []
        for att in atts:
            raw = att.pop("_bytes", b"") or b""
            att_refs.append({k: att[k] for k in ("filename", "mime.type", "messageId", "folder")})
            out["attachments"].append(
                {
                    "repo": repo, "path": path, "event_offset": offset,
                    "message_seq": seq,
                    "message_id": att["messageId"],
                    "folder": att["folder"],
                    "filename": att["filename"],
                    "mime_type": att["mime.type"],
                    "size": len(raw),
                    "sha256": hashlib.sha256(raw).hexdigest(),
                    # raw bytes — matches the reference's FlowFile-content
                    # model (AbstractJavaMailProcessor.java:266-288); the
                    # base64 view exists only at the oracle-facing contract
                    # surface (udfs.attachments_b64_view)
                    "content": raw,
                }
            )
        out["messages"].append(
            {**base, "message_seq": seq, **parsed, "attachments": att_refs,
             "content_sha256": sha}
        )

    try:
        if lang == "eml":
            folder = folder_override if folder_override is not None else ""
            _emit_message(parse_eml(content, folder=folder, message_number=0), 0)
        elif lang == "mbox":
            # default FOLDER_IDENTIFIER ≈ ${filename} (ExtractMBoxFileTest.java:30-32)
            folder = folder_override if folder_override is not None else path
            chunks = split_mbox(content)
            for i, chunk in enumerate(chunks, start=1):
                try:
                    _emit_message(parse_eml(chunk, folder=folder, message_number=i), i)
                except Exception as exc:  # noqa: BLE001 — R2 continue path
                    if error_strategy == "failure":
                        raise
                    _fail(f"message {i}: {exc}")
        elif lang == "pst":
            # P3 — binary PST archive, base64-encoded in the (string)
            # event content; 1→N messages in reference folder-walk order,
            # message_seq 1-based like mbox
            from .pst import parse_pst
            msgs = parse_pst(base64.b64decode(content))
            for i, m in enumerate(msgs, start=1):
                try:
                    _emit_message(pst_message_to_email(m), i)
                except Exception as exc:  # noqa: BLE001 — R2 continue path
                    if error_strategy == "failure":
                        raise
                    _fail(f"message {i}: {exc}")
        elif lang == "ics":
            events, _count = parse_ics(content)
            for ev in events:
                out["calendar_entries"].append(
                    {"repo": repo, "path": path, "event_offset": offset,
                     **ev, "content_sha256": sha}
                )
        # other langs: no extraction payload (source-code files)
    except Exception as exc:  # noqa: BLE001 — R2 failure path: whole event
        out["messages"] = []
        out["attachments"] = []
        out["calendar_entries"] = []
        _fail(str(exc))
    return out
