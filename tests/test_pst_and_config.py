"""PST semantic layer (E5/E6) and R2/R3 configuration tests."""

import pytest

from emailcdc.extract import (
    apply_missing_field_strategy,
    extract_event,
    parse_transport_headers,
    pst_body_precedence,
    validate_missing_field_config,
)
from emailcdc.fixtures import make_eml


class TestPstBodyPrecedence:
    """E5 — ExtractPSTFile.java:174-185: PLAIN > HTML > RTF, all-null throws."""

    def test_precedence_order(self):
        assert pst_body_precedence("p", "h", "r") == {"body": "p", "body_type": "PLAIN"}
        assert pst_body_precedence(None, "h", "r") == {"body": "h", "body_type": "HTML"}
        assert pst_body_precedence(None, None, "r") == {"body": "r", "body_type": "RTF"}

    def test_missing_body_raises(self):
        with pytest.raises(ValueError, match="Missing body."):
            pst_body_precedence(None, None, None)

    def test_empty_string_is_present(self):
        # java checks null, not blank — "" is a valid PLAIN body
        assert pst_body_precedence("", "h", None)["body_type"] == "PLAIN"


class TestTransportHeaders:
    """E6 — ExtractPSTFile.java:204-227."""

    def test_basic_pairs(self):
        raw = "From: a@b.c\r\nTo: d@e.f\r\n\r\nSubject: hi there"
        assert parse_transport_headers(raw) == {
            "From": "a@b.c", "To": "d@e.f", "Subject": "hi there",
        }

    def test_non_pair_lines_skipped(self):
        # ':\\s+' split without limit: a second ': ' yields 3 tokens → skipped
        raw = "X: a: b\r\nGood: value"
        assert parse_transport_headers(raw) == {"Good": "value"}

    def test_valueless_header_skipped_not_crashed(self):
        # the reference has a latent IndexOutOfBounds here; we keep the
        # documented pairs-only intent (SURVEY.md §2.1 E6 deviation)
        assert parse_transport_headers("NoColonValue\r\nA: b") == {"A": "b"}

    def test_date_four_token_rewrite(self):
        # 4 comma tokens → keep only first two (java:217-223)
        raw = "Date: Mon, 1 Jan 2024, 10:00, +0000"
        assert parse_transport_headers(raw) == {"Date": "Mon, 1 Jan 2024"}

    def test_date_other_token_counts_untouched(self):
        raw = "Date: Mon, 1 Jan 2024 10:00:00 +0000"
        # note ':\\s+' also splits on ': ' inside... no — '10:00:00' has no
        # space after ':', so the line splits only at 'Date: '
        assert parse_transport_headers(raw) == {"Date": "Mon, 1 Jan 2024 10:00:00 +0000"}

    def test_empty_input(self):
        assert parse_transport_headers(None) == {}
        assert parse_transport_headers("") == {}


class TestMissingFieldStrategy:
    """R3 — declared at AbstractJavaMailProcessor.java:69-93; validation
    parity with ExtractMBoxFile.java:60-76."""

    def test_validation(self):
        validate_missing_field_config("empty", None)
        validate_missing_field_config("error", None)
        validate_missing_field_config("value", "unknown@x.org")
        with pytest.raises(ValueError):
            validate_missing_field_config("value", None)
        with pytest.raises(ValueError):
            validate_missing_field_config("value", "   ")
        with pytest.raises(ValueError):
            validate_missing_field_config("bogus", None)

    def test_empty_keeps_blank_sender(self):
        msg = {"sender_details": {"name": "", "email_address": ""}}
        assert apply_missing_field_strategy(msg, "empty", None) is msg

    def test_value_substitutes(self):
        msg = {"sender_details": {"name": "", "email_address": ""}}
        out = apply_missing_field_strategy(msg, "value", "sub@x.org")
        assert out["sender_details"] == {"name": "sub@x.org",
                                         "email_address": "sub@x.org"}

    def test_error_returns_none(self):
        msg = {"sender_details": {"name": "", "email_address": ""}}
        assert apply_missing_field_strategy(msg, "error", None) is None

    def test_present_sender_untouched(self):
        msg = {"sender_details": {"name": "P", "email_address": "p@x.org"}}
        assert apply_missing_field_strategy(msg, "error", None) == msg

    def test_extract_event_error_strategy_dead_letters(self):
        raw = "To: a@b.c\r\nSubject: x\r\n\r\nbody\r\n"
        r = extract_event("r", "p", 1, "c", "eml", raw,
                          missing_field_strategy="error")
        assert r["messages"] == []
        assert len(r["failures"]) == 1
        assert "missing sender" in r["failures"][0]["error"]

    def test_extract_event_value_strategy(self):
        raw = "To: a@b.c\r\nSubject: x\r\n\r\nbody\r\n"
        r = extract_event("r", "p", 1, "c", "eml", raw,
                          missing_field_strategy="value",
                          missing_field_substitution="unknown@x.org")
        assert r["messages"][0]["sender_details"]["email_address"] == "unknown@x.org"

    def test_extract_event_default_matches_reference(self):
        # reference processing behavior: missing From → "" (E2)
        raw = "To: a@b.c\r\nSubject: x\r\n\r\nbody\r\n"
        r = extract_event("r", "p", 1, "c", "eml", raw)
        assert r["messages"][0]["sender_details"] == {"name": "", "email_address": ""}

    def test_normal_message_unaffected(self):
        r = extract_event("r", "p", 1, "c", "eml", make_eml(3),
                          missing_field_strategy="error")
        assert len(r["messages"]) == 1 and r["failures"] == []
