"""Property-based robustness tests (hypothesis): the payload functions must
never crash on arbitrary input and must satisfy their structural
invariants — the R2 'continue' contract depends on per-message totality."""

from hypothesis import given, settings
from hypothesis import strategies as st

from emailcdc.extract import (
    extract_event,
    parse_eml,
    parse_ics,
    split_address,
    split_mbox,
    parse_transport_headers,
)

text = st.text(max_size=400)


class TestSplitAddressProperties:
    @given(text)
    @settings(max_examples=300, deadline=None, derandomize=True)
    def test_total_and_shape(self, s):
        out = split_address(s)
        assert set(out) == {"name", "email_address"}

    @given(text)
    @settings(max_examples=300, deadline=None, derandomize=True)
    def test_no_brackets_identity(self, s):
        # the no-angle-bracket branch returns the input verbatim in BOTH
        # fields (java:128-131) — requires missing '<' or missing '>'
        if not ("<" in s and ">" in s):
            assert split_address(s) == {"name": s, "email_address": s}

    @given(text)
    @settings(max_examples=300, deadline=None, derandomize=True)
    def test_bracket_branch_strips_quotes(self, s):
        out = split_address(s)
        if "<" in s and ">" in s and out["name"] is not None:
            assert '"' not in out["name"]
            assert all(c not in out["email_address"] for c in '<>"')


class TestParserTotality:
    @given(text)
    @settings(max_examples=150, deadline=None, derandomize=True)
    def test_parse_eml_total(self, s):
        m = parse_eml(s)
        assert isinstance(m["headers"], dict)
        assert isinstance(m["bodies"], list)
        assert m["subject"] is not None

    @given(text)
    @settings(max_examples=150, deadline=None, derandomize=True)
    def test_parse_ics_total(self, s):
        events, count = parse_ics(s)
        assert count >= len([e for e in events])

    @given(text)
    @settings(max_examples=150, deadline=None, derandomize=True)
    def test_split_mbox_total(self, s):
        chunks = split_mbox(s)
        assert isinstance(chunks, list)

    @given(text)
    @settings(max_examples=150, deadline=None, derandomize=True)
    def test_transport_headers_total(self, s):
        assert isinstance(parse_transport_headers(s), dict)

    @given(st.sampled_from(["eml", "mbox", "ics", "py", None]), text)
    @settings(max_examples=150, deadline=None, derandomize=True)
    def test_extract_event_never_raises(self, lang, content):
        out = extract_event("r", "p", 0, "c", lang, content)
        assert set(out) == {"messages", "attachments", "calendar_entries", "failures"}
        for m in out["messages"]:
            assert m["content_sha256"] is not None
