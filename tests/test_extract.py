"""Payload parity tests — pure Python, no Spark.

Golden values derive from the reference's unit tests (SURVEY.md §5):
- EML: 1 message, 3 attachments (ExtractEMLFileTest.java:23-26)
- mbox: 213 messages (ExtractMBoxFileTest.java:51)
- ICal: record.count == 1 (ExtractICalTest.java:30)
plus the E1 vectors from AbstractJavaMailProcessor.java:118-132 and the
body_type / header-case quirks documented in extract.py.
"""

from datetime import datetime, timezone

import pytest

from emailcdc.extract import (
    extract_event,
    parse_eml,
    parse_ics,
    sha256_hex,
    split_address,
    split_mbox,
)
from emailcdc.fixtures import make_eml, make_ics, make_mbox


class TestSplitAddress:
    """E1 — handleEmailAddress (AbstractJavaMailProcessor.java:118-132)."""

    @pytest.mark.parametrize(
        "raw,name,email",
        [
            ("Pat Example <pat@example.org>", "Pat Example", "pat@example.org"),
            ('"Pat Q. Example" <pat@example.org>', "Pat Q. Example", "pat@example.org"),
            # no angle brackets → name == email == raw
            ("pat@example.org", "pat@example.org", "pat@example.org"),
            ("", "", ""),
            # '<' without '>' → no-bracket branch (needs BOTH)
            ("broken <pat", "broken <pat", "broken <pat"),
            # trailing > is stripped from the address token
            ("X <a@b.c>", "X", "a@b.c"),
        ],
    )
    def test_vectors(self, raw, name, email):
        assert split_address(raw) == {"name": name, "email_address": email}

    def test_failure_path_yields_empty_struct(self):
        # two '<' → 3 tokens → reference logs error and leaves the struct
        # empty (java:121-124); the row is still appended by the caller.
        assert split_address("a <b< <c@x.org>") == {
            "name": None,
            "email_address": None,
        }


class TestParseEml:
    def test_golden_counts(self):
        m = parse_eml(make_eml(5))
        assert len(m["attachments"]) == 3  # 2 inline GIFs + 1 attachment
        assert [a["filename"] for a in m["attachments"]] == [
            "img0.gif", "img1.gif", "attach0.txt",
        ]
        assert [a["mime.type"] for a in m["attachments"]] == [
            "image/gif", "image/gif", "text/plain",
        ]

    def test_bodies_are_alternative_pair(self):
        m = parse_eml(make_eml(5))
        assert [b["body_type"] for b in m["bodies"]] == ["PLAIN", "HTML"]

    def test_sender_and_recipients(self):
        m = parse_eml(make_eml(5))
        assert m["sender_details"] == {
            "name": "Pat Example", "email_address": "pat5@example.org",
        }
        assert m["recipients"] == [
            {"name": "dev-list@example.org", "email_address": "dev-list@example.org"}
        ]

    def test_message_id_is_message_number(self):
        # JavaMail getMessageNumber(): 0 for bare EML (java:147)
        assert parse_eml(make_eml(1))["message_id"] == "0"
        assert parse_eml(make_eml(1), message_number=7)["message_id"] == "7"

    def test_blank_subject_becomes_empty_string(self):
        m = parse_eml(make_eml(1, subject=None))
        assert m["subject"] == ""

    def test_missing_from_empty_sender(self):
        raw = "To: a@b.c\r\nSubject: x\r\n\r\nbody\r\n"
        m = parse_eml(raw)
        assert m["sender_details"] == {"name": "", "email_address": ""}

    def test_in_reply_to_case_sensitive(self):
        # 'In-Reply-To' matched with equals(); 'in-reply-to' must NOT set the
        # field (java:168) but still lands in the headers map.
        raw = "From: a@b.c\r\nin-reply-to: <x@y>\r\n\r\nbody\r\n"
        m = parse_eml(raw)
        assert m["in_reply_to"] is None
        assert m["headers"]["in-reply-to"] == "<x@y>"
        raw2 = "From: a@b.c\r\nIn-Reply-To: <x@y>\r\n\r\nbody\r\n"
        assert parse_eml(raw2)["in_reply_to"] == "<x@y>"

    def test_message_id_header_case_insensitive(self):
        # internal messageId (attachment back-ref) matches ignore-case (java:170)
        raw = (
            "From: a@b.c\r\nMESSAGE-ID: <mid@y>\r\n"
            "Content-Type: multipart/mixed; boundary=B\r\n\r\n"
            "--B\r\nContent-Type: text/plain; name=f.txt\r\n"
            "Content-Disposition: attachment\r\n\r\npayload\r\n--B--\r\n"
        )
        m = parse_eml(raw)
        assert m["attachments"][0]["messageId"] == "<mid@y>"

    def test_inline_text_body_type_quirk(self):
        # inline text parts get literal 'text/plain'/'text/html' body_type,
        # NOT the PLAIN/HTML enum (java:236-238,255-262).
        raw = (
            "From: a@b.c\r\nContent-Type: multipart/mixed; boundary=B\r\n\r\n"
            "--B\r\nContent-Type: text/plain\r\n"
            "Content-Disposition: inline\r\n\r\ninline plain\r\n"
            "--B\r\nContent-Type: text/html\r\n"
            "Content-Disposition: inline\r\n\r\n<p>inline html</p>\r\n"
            "--B--\r\n"
        )
        types = [b["body_type"] for b in parse_eml(raw)["bodies"]]
        assert sorted(types) == ["text/html", "text/plain"]

    def test_inline_last_one_wins_per_type(self):
        raw = (
            "From: a@b.c\r\nContent-Type: multipart/mixed; boundary=B\r\n\r\n"
            "--B\r\nContent-Type: text/plain\r\n"
            "Content-Disposition: inline\r\n\r\nfirst\r\n"
            "--B\r\nContent-Type: text/plain\r\n"
            "Content-Disposition: inline\r\n\r\nsecond\r\n"
            "--B--\r\n"
        )
        bodies = parse_eml(raw)["bodies"]
        assert len(bodies) == 1
        assert bodies[0]["body"].strip() == "second"

    def test_non_multipart_plain(self):
        m = parse_eml(make_eml(2, multipart=False))
        assert len(m["bodies"]) == 1
        assert m["bodies"][0]["body_type"] == "PLAIN"
        assert m["attachments"] == []

    def test_attachment_without_name_gets_deterministic_fallback(self):
        raw = (
            "From: a@b.c\r\nMessage-ID: <m@x>\r\n"
            "Content-Type: multipart/mixed; boundary=B\r\n\r\n"
            "--B\r\nContent-Type: application/octet-stream\r\n"
            "Content-Disposition: attachment\r\n\r\nblob\r\n--B--\r\n"
        )
        a1 = parse_eml(raw)["attachments"][0]
        a2 = parse_eml(raw)["attachments"][0]
        assert a1["filename"] == a2["filename"]  # deterministic, not uuid4
        assert a1["filename"].endswith(".png")  # reference suffix quirk
        assert a1["mime.type"] == "application/octet-stream"

    def test_headers_last_one_wins(self):
        raw = "From: a@b.c\r\nX-Dup: one\r\nX-Dup: two\r\n\r\nbody\r\n"
        assert parse_eml(raw)["headers"]["X-Dup"] == "two"


class TestMbox:
    def test_golden_213(self):
        msgs = split_mbox(make_mbox(213))
        assert len(msgs) == 213

    def test_message_numbers_one_based(self):
        msgs = split_mbox(make_mbox(3))
        parsed = [parse_eml(m, folder="f.mbox", message_number=i)
                  for i, m in enumerate(msgs, start=1)]
        assert [p["message_id"] for p in parsed] == ["1", "2", "3"]
        assert all(p["folder"] == "f.mbox" for p in parsed)

    def test_body_from_lines_not_split(self):
        raw = ("From a@b Mon Jan 01 00:00:00 2024\n"
               "From: a@b.c\nSubject: s\n\n"
               "text\nFrom here on this is body text glued to prev line\n")
        assert len(split_mbox(raw)) == 1

    def test_crlf_body_from_line_not_split(self):
        # ADVICE r1: a CRLF mbox with an unquoted 'From ' body line is ONE
        # message — a bare preceding \r\n is a line ending, not a blank line
        raw = ("From a@b Mon Jan 01 00:00:00 2024\r\n"
               "From: a@b.c\r\nSubject: s\r\n\r\n"
               "text line one\r\n"
               "From here this is body text, not a separator\r\n")
        msgs = split_mbox(raw)
        assert len(msgs) == 1
        assert "not a separator" in msgs[0]

    def test_crlf_blank_line_separator_splits(self):
        raw = ("From a@b Mon Jan 01 00:00:00 2024\r\n"
               "From: a@b.c\r\nSubject: one\r\n\r\nbody one\r\n\r\n"
               "From c@d Mon Jan 01 00:00:01 2024\r\n"
               "From: c@d.e\r\nSubject: two\r\n\r\nbody two\r\n")
        msgs = split_mbox(raw)
        assert len(msgs) == 2
        assert parse_eml(msgs[1], message_number=2)["subject"] == "two"


class TestIcal:
    def test_golden_single_event(self):
        events, count = parse_ics(make_ics(1, n_events=1))
        assert len(events) == 1
        assert count == 1  # record.count quirk value

    def test_record_count_counts_non_vevents(self):
        # ExtractICal.java:128 uses the FULL component list size
        events, count = parse_ics(make_ics(1, n_events=1, n_todos=2))
        assert len(events) == 1
        assert count == 3

    def test_component_name_literal(self):
        events, _ = parse_ics(make_ics(2))
        assert events[0]["name"] == "VEVENT"

    def test_mailto_stripped(self):
        events, _ = parse_ics(make_ics(2))
        assert events[0]["attendees"] == ["att0a@example.org", "att0b@example.org"]

    def test_dates_epoch_millis_utc(self):
        events, _ = parse_ics(make_ics(0))
        assert events[0]["start_date"] == datetime(2024, 1, 1, tzinfo=timezone.utc)
        assert events[0]["end_date"] == datetime(2024, 1, 1, 2, tzinfo=timezone.utc)
        assert events[0]["date_created"] == datetime(2023, 12, 29, tzinfo=timezone.utc)

    def test_date_only_format(self):
        raw = ("BEGIN:VCALENDAR\r\nBEGIN:VEVENT\r\nSUMMARY:x\r\n"
               "DTSTART:20181231\r\nDTEND:20191231\r\nEND:VEVENT\r\nEND:VCALENDAR\r\n")
        events, _ = parse_ics(raw)
        assert events[0]["start_date"] == datetime(2018, 12, 31, tzinfo=timezone.utc)


class TestExtractEvent:
    def test_eml_event(self):
        content = make_eml(9)
        r = extract_event("r", "p", 1, "c", "eml", content)
        assert len(r["messages"]) == 1
        assert len(r["attachments"]) == 3
        assert r["messages"][0]["content_sha256"] == sha256_hex(content)
        # attachment back-refs embedded on the message (A2)
        assert len(r["messages"][0]["attachments"]) == 3
        assert set(r["messages"][0]["attachments"][0]) == {
            "filename", "mime.type", "messageId", "folder",
        }

    def test_attachment_content_is_raw_bytes(self):
        """Attachment payloads are BinaryType raw bytes (the reference's
        FlowFile-content model, AbstractJavaMailProcessor.java:266-288) —
        sha256 over exactly those bytes."""
        import hashlib

        r = extract_event("r", "p", 1, "c", "eml", make_eml(9))
        for a in r["attachments"]:
            assert isinstance(a["content"], bytes)
            assert a["size"] == len(a["content"])
            assert a["sha256"] == hashlib.sha256(a["content"]).hexdigest()

    def test_delete_event_no_payload(self):
        r = extract_event("r", "p", 1, None, "eml", None)
        assert r == {"messages": [], "attachments": [],
                     "calendar_entries": [], "failures": []}

    def test_source_code_lang_no_messages(self):
        r = extract_event("r", "p", 1, "c", "py", "print('hi')")
        assert r["messages"] == [] and r["failures"] == []

    def test_error_strategy_continue_isolates_bad_message(self, monkeypatch):
        import emailcdc.extract as ex
        real = ex.parse_eml

        def flaky(raw, folder="", message_number=0):
            if message_number == 2:
                raise ValueError("boom")
            return real(raw, folder=folder, message_number=message_number)

        monkeypatch.setattr(ex, "parse_eml", flaky)
        content = make_mbox(3)
        r = ex.extract_event("r", "p", 1, "c", "mbox", content, "continue")
        assert len(r["messages"]) == 2
        assert len(r["failures"]) == 1
        assert "message 2" in r["failures"][0]["error"]

    def test_error_strategy_failure_dead_letters_whole_event(self, monkeypatch):
        import emailcdc.extract as ex
        real = ex.parse_eml

        def flaky(raw, folder="", message_number=0):
            if message_number == 2:
                raise ValueError("boom")
            return real(raw, folder=folder, message_number=message_number)

        monkeypatch.setattr(ex, "parse_eml", flaky)
        content = make_mbox(3)
        r = ex.extract_event("r", "p", 1, "c", "mbox", content, "failure")
        assert r["messages"] == []
        assert len(r["failures"]) == 1


class TestIcalTzid:
    """ExtractICal.java:140-146 — ical4j DateProperty.getDate() honors
    TZID-parameterized and VALUE=DATE datetimes; epoch-millis contract."""

    def _single_event(self, dtstart_line):
        raw = ("BEGIN:VCALENDAR\r\nBEGIN:VEVENT\r\nSUMMARY:tz\r\n"
               f"{dtstart_line}\r\nEND:VEVENT\r\nEND:VCALENDAR\r\n")
        events, _ = parse_ics(raw)
        assert len(events) == 1
        return events[0]["start_date"]

    def test_tzid_converted_to_utc(self):
        # noon New York winter time == 17:00 UTC
        dt = self._single_event("DTSTART;TZID=America/New_York:20240101T120000")
        assert dt.strftime("%Y-%m-%d %H:%M") == "2024-01-01 17:00"

    def test_tzid_dst_aware(self):
        # noon New York summer time == 16:00 UTC
        dt = self._single_event("DTSTART;TZID=America/New_York:20240701T120000")
        assert dt.strftime("%Y-%m-%d %H:%M") == "2024-07-01 16:00"

    def test_value_date_is_utc_midnight(self):
        dt = self._single_event("DTSTART;VALUE=DATE:20240315")
        assert dt.strftime("%Y-%m-%d %H:%M") == "2024-03-15 00:00"

    def test_zulu_still_utc(self):
        dt = self._single_event("DTSTART:20240101T080000Z")
        assert dt.strftime("%Y-%m-%d %H:%M") == "2024-01-01 08:00"

    def test_unknown_tzid_falls_back_to_utc(self):
        dt = self._single_event("DTSTART;TZID=Not/AZone:20240101T080000")
        assert dt.strftime("%Y-%m-%d %H:%M") == "2024-01-01 08:00"


class TestFolderExpression:
    """FOLDER_IDENTIFIER (AbstractJavaMailProcessor.java:58-67) as an
    explicit override on the pure-Python path."""

    def test_override_applies_to_mbox(self):
        from emailcdc.fixtures import make_mbox
        out = extract_event("r", "p.mbox", 0, "c", "mbox", make_mbox(2),
                            folder_override="CUSTOM")
        assert all(m["folder"] == "CUSTOM" for m in out["messages"])

    def test_override_applies_to_eml(self):
        out = extract_event("r", "p.eml", 0, "c", "eml", make_eml(1),
                            folder_override="CUSTOM")
        assert out["messages"][0]["folder"] == "CUSTOM"

    def test_default_mbox_folder_is_path(self):
        from emailcdc.fixtures import make_mbox
        out = extract_event("r", "p.mbox", 0, "c", "mbox", make_mbox(2))
        assert all(m["folder"] == "p.mbox" for m in out["messages"])


class TestIcalVtimezone:
    """Custom TZIDs defined by a VTIMEZONE block: STANDARD/DAYLIGHT RRULE
    transitions are evaluated like ical4j (VERDICT r2 #4); zones without an
    evaluable DST pair fall back to the fixed STANDARD offset."""

    US_STYLE_VTZ = (
        "BEGIN:VTIMEZONE\r\nTZID:Corp/East\r\n"
        "BEGIN:DAYLIGHT\r\nTZOFFSETFROM:-0500\r\nTZOFFSETTO:-0400\r\n"
        "DTSTART:20070311T020000\r\n"
        "RRULE:FREQ=YEARLY;BYMONTH=3;BYDAY=2SU\r\nEND:DAYLIGHT\r\n"
        "BEGIN:STANDARD\r\nTZOFFSETFROM:-0400\r\nTZOFFSETTO:-0500\r\n"
        "DTSTART:20071104T020000\r\n"
        "RRULE:FREQ=YEARLY;BYMONTH=11;BYDAY=1SU\r\nEND:STANDARD\r\n"
        "END:VTIMEZONE\r\n")

    def _event_utc(self, vtz, dtstart_line):
        raw = ("BEGIN:VCALENDAR\r\n" + vtz +
               "BEGIN:VEVENT\r\nSUMMARY:s\r\n" + dtstart_line +
               "\r\nEND:VEVENT\r\nEND:VCALENDAR\r\n")
        events, _ = parse_ics(raw)
        assert len(events) == 1
        return events[0]["start_date"].strftime("%Y-%m-%d %H:%M")

    def test_custom_tzid_summer_uses_daylight_offset(self):
        got = self._event_utc(self.US_STYLE_VTZ,
                              "DTSTART;TZID=Corp/East:20240701T120000")
        assert got == "2024-07-01 16:00"  # noon EDT (-0400)

    def test_custom_tzid_winter_uses_standard_offset(self):
        got = self._event_utc(self.US_STYLE_VTZ,
                              "DTSTART;TZID=Corp/East:20240101T120000")
        assert got == "2024-01-01 17:00"  # noon EST (-0500)

    def test_transition_boundary_second_sunday_march(self):
        # 2024-03-10 is the 2nd Sunday: 01:30 local is still standard,
        # 03:00 local is daylight
        before = self._event_utc(self.US_STYLE_VTZ,
                                 "DTSTART;TZID=Corp/East:20240310T013000")
        after = self._event_utc(self.US_STYLE_VTZ,
                                "DTSTART;TZID=Corp/East:20240310T030000")
        assert before == "2024-03-10 06:30"
        assert after == "2024-03-10 07:00"

    def test_last_sunday_rule_eu_style(self):
        vtz = ("BEGIN:VTIMEZONE\r\nTZID:Corp/EU\r\n"
               "BEGIN:DAYLIGHT\r\nTZOFFSETFROM:+0100\r\nTZOFFSETTO:+0200\r\n"
               "DTSTART:19810329T020000\r\n"
               "RRULE:FREQ=YEARLY;BYMONTH=3;BYDAY=-1SU\r\nEND:DAYLIGHT\r\n"
               "BEGIN:STANDARD\r\nTZOFFSETFROM:+0200\r\nTZOFFSETTO:+0100\r\n"
               "DTSTART:19961027T030000\r\n"
               "RRULE:FREQ=YEARLY;BYMONTH=10;BYDAY=-1SU\r\nEND:STANDARD\r\n"
               "END:VTIMEZONE\r\n")
        # 2024: DST starts Mar 31 (last Sunday), ends Oct 27
        assert self._event_utc(
            vtz, "DTSTART;TZID=Corp/EU:20240715T120000") == "2024-07-15 10:00"
        assert self._event_utc(
            vtz, "DTSTART;TZID=Corp/EU:20241215T120000") == "2024-12-15 11:00"
        assert self._event_utc(
            vtz, "DTSTART;TZID=Corp/EU:20241027T020000") == "2024-10-27 00:00"
        assert self._event_utc(
            vtz, "DTSTART;TZID=Corp/EU:20241027T040000") == "2024-10-27 03:00"

    def test_custom_tzid_standard_offset(self):
        raw = ("BEGIN:VCALENDAR\r\n"
               "BEGIN:VTIMEZONE\r\nTZID:Corp/HQ\r\n"
               "BEGIN:STANDARD\r\nTZOFFSETTO:+0530\r\nEND:STANDARD\r\n"
               "END:VTIMEZONE\r\n"
               "BEGIN:VEVENT\r\nSUMMARY:s\r\n"
               "DTSTART;TZID=Corp/HQ:20240101T120000\r\n"
               "END:VEVENT\r\nEND:VCALENDAR\r\n")
        events, count = parse_ics(raw)
        assert len(events) == 1
        # VTIMEZONE is a component too → record.count quirk counts it
        assert count == 2
        # noon at +05:30 == 06:30 UTC
        assert events[0]["start_date"].strftime("%H:%M") == "06:30"

    def test_negative_offset(self):
        raw = ("BEGIN:VCALENDAR\r\n"
               "BEGIN:VTIMEZONE\r\nTZID:X\r\n"
               "BEGIN:STANDARD\r\nTZOFFSETTO:-0700\r\nEND:STANDARD\r\n"
               "END:VTIMEZONE\r\n"
               "BEGIN:VEVENT\r\nSUMMARY:s\r\n"
               "DTSTART;TZID=X:20240101T120000\r\nEND:VEVENT\r\nEND:VCALENDAR\r\n")
        events, _ = parse_ics(raw)
        assert events[0]["start_date"].strftime("%H:%M") == "19:00"

    def test_iana_tzid_unaffected_by_vtimezone(self):
        # an IANA TZID keeps DST-correct zoneinfo handling even when a
        # VTIMEZONE with the same id declares a bogus offset
        raw = ("BEGIN:VCALENDAR\r\n"
               "BEGIN:VTIMEZONE\r\nTZID:America/New_York\r\n"
               "BEGIN:STANDARD\r\nTZOFFSETTO:+0900\r\nEND:STANDARD\r\n"
               "END:VTIMEZONE\r\n"
               "BEGIN:VEVENT\r\nSUMMARY:s\r\n"
               "DTSTART;TZID=America/New_York:20240701T120000\r\n"
               "END:VEVENT\r\nEND:VCALENDAR\r\n")
        events, _ = parse_ics(raw)
        assert events[0]["start_date"].strftime("%H:%M") == "16:00"  # EDT
