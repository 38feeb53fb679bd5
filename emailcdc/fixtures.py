"""Deterministic synthetic fixtures: EML/mbox/ics payloads, the repos
source table, and the CDC change-event log.

Shapes follow FIXTURES.md; the EML mirrors the *structure* of the
reference's ``test_sample_message.eml`` (multipart/mixed → related →
alternative, text/plain + text/html alternative pair, 2 inline base64
GIFs, 1 attachment → golden: 1 message, 3 attachments —
ExtractEMLFileTest.java:23-26) without copying its text.  Everything is
seeded — no wall clock, no uuid4.
"""

from __future__ import annotations

import base64
import hashlib
import random
from datetime import datetime, timedelta, timezone

EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)

# a 1x1 transparent GIF, deterministic binary payload for inline parts
_GIF = base64.b64encode(
    b"GIF89a\x01\x00\x01\x00\x80\x00\x00\x00\x00\x00\xff\xff\xff!"
    b"\xf9\x04\x01\x00\x00\x00\x00,\x00\x00\x00\x00\x01\x00\x01\x00\x00"
    b"\x02\x02D\x01\x00;"
).decode("ascii")


def make_eml(
    seq: int,
    *,
    sender: str = 'Pat Example <pat{n}@example.org>',
    recipients: tuple[str, ...] = ("dev-list@example.org",),
    n_inline_images: int = 2,
    n_attachments: int = 1,
    subject: str | None = "report {n}",
    multipart: bool = True,
) -> str:
    """One RFC-5322 message with the reference fixture's nesting."""
    n = seq
    sender = sender.format(n=n)
    subj = "" if subject is None else subject.format(n=n)
    date = (EPOCH + timedelta(seconds=n * 61)).strftime("%a, %d %b %Y %H:%M:%S +0000")
    headers = [
        f"Return-Path: <bounce{n}@example.org>",
        f"To: {', '.join(recipients)}",
        f"From: {sender}",
        f"Reply-To: reply{n}@example.org",
        f"Message-ID: <msg-{n:06d}@example.org>",
        f"Date: {date}",
        "MIME-Version: 1.0",
        "X-Mailer: emailcdc-fixture/1.0",
    ]
    if subj:
        headers.insert(2, f"Subject: {subj}")
    if n % 3 == 0:
        headers.append(f"In-Reply-To: <msg-{max(0, n - 1):06d}@example.org>")

    plain = f"Plain body of message {n}.\nNumbers: {n * 7}, {n * 13}.\n"
    html = f"<html><body><p>HTML body of message <b>{n}</b>.</p></body></html>\n"

    if not multipart:
        headers.append('Content-Type: text/plain; charset=us-ascii')
        return "\r\n".join(headers) + "\r\n\r\n" + plain

    headers.append('Content-Type: multipart/mixed; boundary=MIX')
    parts = [
        "\r\n".join(headers),
        "",
        "--MIX",
        "Content-Type: multipart/related; boundary=REL",
        "",
        "--REL",
        "Content-Type: multipart/alternative; boundary=ALT",
        "",
        "--ALT",
        "Content-Type: text/plain; charset=us-ascii",
        "",
        plain,
        "--ALT",
        "Content-Type: text/html; charset=us-ascii",
        "",
        html,
        "--ALT--",
    ]
    for i in range(n_inline_images):
        parts += [
            "--REL",
            f"Content-Type: image/gif; name=img{i}.gif",
            "Content-Transfer-Encoding: base64",
            f"Content-ID: <img{i}@msg{n}>",
            f"Content-Disposition: inline; filename=img{i}.gif",
            "",
            _GIF,
        ]
    parts += ["--REL--"]
    for i in range(n_attachments):
        body = f"attachment {i} of message {n}\n"
        parts += [
            "--MIX",
            f"Content-Type: text/plain; name=attach{i}.txt",
            "Content-Disposition: attachment; filename=attach{i}.txt".format(i=i),
            "",
            body,
        ]
    parts += ["--MIX--", ""]
    return "\r\n".join(parts)


def make_mbox(n_messages: int, start_seq: int = 1) -> str:
    """Mbox file: messages joined with ``From `` separator lines (mstor
    iteration order = file order, ExtractMBoxFile.java:119-121)."""
    chunks = []
    for i in range(n_messages):
        seq = start_seq + i
        date = (EPOCH + timedelta(seconds=seq * 61)).strftime("%a %b %d %H:%M:%S %Y")
        msg = make_eml(seq, n_inline_images=0, n_attachments=0,
                       multipart=(seq % 2 == 0))
        chunks.append(f"From pat{seq}@example.org {date}\n" + msg.replace("\r\n", "\n"))
    return "\n\n".join(chunks) + "\n"


def make_ics(seq: int, *, n_events: int = 1, n_todos: int = 0) -> str:
    lines = [
        "BEGIN:VCALENDAR",
        "VERSION:2.0",
        "PRODID:-//emailcdc//fixture//EN",
        "CALSCALE:GREGORIAN",
    ]
    for i in range(n_events):
        start = EPOCH + timedelta(days=(seq + i) % 3650)  # bounded: no overflow at large seq
        end = start + timedelta(hours=2)
        lines += [
            "BEGIN:VEVENT",
            f"SUMMARY:Planning session {seq}-{i}",
            f"UID:ev-{seq:04d}-{i}",
            f"DTSTART:{start.strftime('%Y%m%dT%H%M%SZ')}",
            f"DTEND:{end.strftime('%Y%m%dT%H%M%SZ')}",
            f"CREATED:{(start - timedelta(days=3)).strftime('%Y%m%dT%H%M%SZ')}",
            f"DESCRIPTION:Agenda for session {seq}-{i}",
            "URL:https://example.org/cal",
            f"ATTENDEE;CN=A{i}:mailto:att{i}a@example.org",
            f"ATTENDEE;CN=B{i}:mailto:att{i}b@example.org",
            "END:VEVENT",
        ]
    for i in range(n_todos):  # non-VEVENT components: record.count quirk food
        lines += ["BEGIN:VTODO", f"SUMMARY:todo {i}", "END:VTODO"]
    lines += ["END:VCALENDAR", ""]
    return "\r\n".join(lines)


# --- repos table + change-event log -----------------------------------------

LANGS = ("eml", "mbox", "ics", "java", "py", "txt")


def _commit_hex(repo: str, path: str, version: int) -> str:
    return hashlib.sha1(f"{repo}|{path}|{version}".encode()).hexdigest()


def _content_for(lang: str, key_seq: int, version: int) -> str:
    seq = key_seq * 31 + version
    if lang == "eml":
        return make_eml(seq)
    if lang == "mbox":
        return make_mbox(3 + (key_seq % 4), start_seq=seq)
    if lang == "ics":
        return make_ics(seq, n_events=1 + key_seq % 2, n_todos=key_seq % 2)
    return f"// {lang} source file\nint v{seq} = {seq};\n" * (1 + key_seq % 5)


def key_fields(i: int, n_keys: int, hot_fraction: float = 0.3,
               n_hot_repos: int = 2, n_repos: int = 20, seed: int = 42,
               langs: tuple = LANGS) -> dict:
    """Key i of the universe as a pure function of the index — O(1), no
    driver-side key list, so distributed generators ship no closure state
    (a 500k-entry key dict per task OOMed the 10^6-event bench)."""
    n_hot = int(n_keys * hot_fraction)
    if i < n_hot:
        repo = f"org0/hot{i % n_hot_repos}"
    else:
        rrepo = int(hashlib.sha1(f"{seed}|{i}".encode()).hexdigest()[:8], 16) % n_repos
        repo = f"org{1 + i % 7}/repo{rrepo}"
    lang = langs[i % len(langs)]
    path = f"mail/fixtures/msg_{i:05d}.{lang}"
    return {"repo": repo, "path": path, "lang": lang, "key_seq": i}


def make_keys(n_keys: int, hot_fraction: float = 0.3, n_hot_repos: int = 2,
              n_repos: int = 20, seed: int = 42) -> list[dict]:
    """(repo, path, lang) key universe with 1-2 hot repos holding
    ~``hot_fraction`` of keys (skew knob per FIXTURES.md §1)."""
    return [key_fields(i, n_keys, hot_fraction, n_hot_repos, n_repos, seed)
            for i in range(n_keys)]


def make_change_events(n_keys: int = 60, n_events: int | None = None,
                       seed: int = 42, hot_fraction: float = 0.3,
                       delete_fraction: float = 0.1) -> list[dict]:
    """Deterministic CDC log: per key I first, then U*, optional terminal D;
    LWW by offset (FIXTURES.md §2).  Returns rows in offset order."""
    rng = random.Random(seed * 7 + 1)
    keys = make_keys(n_keys, hot_fraction=hot_fraction, seed=seed)
    if n_events is None:
        n_events = n_keys * 3
    # schedule: each key gets 1 insert + geometric updates + maybe delete
    ops: list[tuple[dict, str, int]] = []
    for k in keys:
        ops.append((k, "I", 0))
        version = 0
        while len(ops) < n_events and rng.random() < 0.55:
            version += 1
            ops.append((k, "U", version))
        if rng.random() < delete_fraction:
            ops.append((k, "D", version + 1))
    rng.shuffle(ops)
    # re-impose per-key causal order (I < U… < D) while keeping global shuffle
    per_key_counter: dict[tuple[str, str], list] = {}
    for k, op, v in ops:
        per_key_counter.setdefault((k["repo"], k["path"]), []).append((op, v, k))
    for entries in per_key_counter.values():
        entries.sort(key=lambda e: e[1])
    # interleave deterministically
    order = sorted(per_key_counter.items(), key=lambda kv: kv[0])
    lanes = [list(v) for _, v in order]
    events, offset = [], 0
    rng2 = random.Random(seed * 13 + 5)
    while any(lanes):
        lane = rng2.choice([l for l in lanes if l])
        op, version, k = lane.pop(0)
        content = None if op == "D" else _content_for(k["lang"], k["key_seq"], version)
        events.append(
            {
                "offset": offset,
                "op": op,
                "ts": EPOCH + timedelta(seconds=offset),
                "repo": k["repo"],
                "path": k["path"],
                "commit": None if op == "D" else _commit_hex(k["repo"], k["path"], version),
                "lang": k["lang"],
                "content": content,
            }
        )
        offset += 1
    return events


def distributed_events_df(spark, n_events: int, n_keys: int,
                          hot_fraction: float = 0.3, seed: int = 42,
                          partitions: int | None = None,
                          langs: tuple = LANGS):
    """Distributed deterministic change-event generator for benchmarks.

    Unlike ``make_change_events`` (driver-side list, test-sized), this
    builds the log with ``spark.range`` + one Arrow-batched pass, so a
    10^7+-event log never materializes on the driver.  Layout: event j of
    key i sits at offset j*n_keys + i (round-robin interleave — dense,
    per-key monotone, so I<U<D causality holds by construction).  Ops:
    version 0 = I, last version of every 7th key = D, else U.  Content is
    the same seeded payload as the test fixtures.
    """
    import pandas as pd
    from pyspark.sql import functions as F

    from . import schemas

    n_versions = (n_events + n_keys - 1) // n_keys

    def gen(batches):
        for pdf in batches:
            rows = []
            for offset in pdf["id"]:
                offset = int(offset)
                i = offset % n_keys
                version = offset // n_keys
                k = key_fields(i, n_keys, hot_fraction=hot_fraction,
                               seed=seed, langs=langs)
                is_last = version == n_versions - 1
                if version == 0:
                    op = "I"
                elif is_last and i % 7 == 0:
                    op = "D"
                else:
                    op = "U"
                content = None if op == "D" else _content_for(k["lang"], i, version)
                rows.append(
                    {
                        "offset": offset,
                        "op": op,
                        "ts": EPOCH + timedelta(seconds=offset),
                        "repo": k["repo"],
                        "path": k["path"],
                        "commit": None if op == "D" else _commit_hex(k["repo"], k["path"], version),
                        "lang": k["lang"],
                        "content": content,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in schemas.CHANGE_EVENTS.fields])

    # 4× the cluster slots by default: the replay consumer batches by
    # offset RANGE, and each generator partition is one contiguous range
    # → one output file → one (unsplittable) row group, so a replay batch
    # covering 1/k of the log sees only 1/k of the files.  At the bench's
    # 2-batch split, cores×1 files meant HALF the cores sat idle through
    # the parse stage; cores×4 files give every batch ≥ 2 waves of evenly
    # sized splits (guide §6 — input split sizing), and the parse stage's
    # per-lang cost skew averages out across more, smaller tasks.
    rng = spark.range(0, n_events, numPartitions=partitions or
                      4 * spark.sparkContext.defaultParallelism)
    return rng.mapInPandas(gen, schema=schemas.CHANGE_EVENTS)


def expected_final_state(events: list[dict]) -> dict[tuple[str, str], dict]:
    """Oracle: replay the log sequentially (LWW, D deletes the key)."""
    state: dict[tuple[str, str], dict] = {}
    for ev in sorted(events, key=lambda e: e["offset"]):
        key = (ev["repo"], ev["path"])
        if ev["op"] == "D":
            state.pop(key, None)
        else:
            state[key] = ev
    return state
