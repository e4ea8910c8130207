"""IMAP connector (S3): UID-cursor incremental enumeration against a
fake imaplib-compatible client (the reference tests its connector the
same way — no live server)."""

from __future__ import annotations

import pytest

from semantik_spark.sources.imap import (
    enumerate_mailbox, mailbox_documents, next_cursor,
)


def _msg(uid: int, subject: str, body: str) -> bytes:
    return (
        f"From: a@example.com\r\nTo: b@example.com\r\n"
        f"Subject: {subject}\r\nDate: Mon, 10 Aug 2026 0{uid % 10}:00:00 +0000\r\n"
        f"Content-Type: text/plain; charset=utf-8\r\n\r\n{body}\r\n"
    ).encode()


class FakeImap:
    """Minimal imaplib.IMAP4 stand-in: select / uid search / uid fetch."""

    def __init__(self, messages: dict[int, bytes]):
        self.messages = dict(messages)
        self.selected = None

    def select(self, mailbox, readonly=True):
        self.selected = mailbox
        return "OK", [str(len(self.messages)).encode()]

    def uid(self, command, *args):
        if command == "search":
            criterion = args[-1]
            uids = sorted(self.messages)
            if criterion != "ALL":
                lo = int(criterion.split()[1].split(":")[0])
                hit = [u for u in uids if u >= lo]
                # real servers answer `N:*` with the newest message even
                # when N exceeds it — emulate that quirk
                uids = hit or uids[-1:]
            return "OK", [" ".join(map(str, uids)).encode()]
        if command == "fetch":
            uid_set, _spec = args
            out = []
            for u in (int(x) for x in uid_set.split(",")):
                raw = self.messages.get(u)
                if raw is not None:
                    out.append((f"{u} (UID {u} RFC822 {{{len(raw)}}}".encode(), raw))
                    out.append(b")")
            return "OK", out
        raise AssertionError(f"unexpected command {command}")


@pytest.fixture()
def client():
    return FakeImap({
        3: _msg(3, "first", "body three"),
        7: _msg(7, "second", "body seven"),
        9: _msg(9, "third", "body nine"),
    })


def test_full_enumeration(spark, client):
    df = enumerate_mailbox(spark, client, "mail.example.com")
    rows = {r.uid: r for r in df.collect()}
    assert set(rows) == {3, 7, 9}
    assert rows[7].uri == "imap://mail.example.com/INBOX;uid=7"
    assert rows[7].change_hint == "7"
    assert rows[7].source_type == "imap"
    assert next_cursor(df) == 9


def test_incremental_cursor(spark, client):
    df = enumerate_mailbox(spark, client, "h", last_seen_uid=3)
    assert {r.uid for r in df.collect()} == {7, 9}
    # fully caught up: the N:* quirk returns the newest uid, the cursor
    # guard must drop it
    df2 = enumerate_mailbox(spark, client, "h", last_seen_uid=9)
    assert df2.count() == 0
    assert next_cursor(df2, last_seen_uid=9) == 9


def test_mailbox_documents_parsed(spark, client):
    docs = {r.uid: r for r in
            mailbox_documents(spark, client, "h").collect()}
    assert docs[3].subject == "first"
    assert docs[3].text.strip() == "body three"
    assert docs[3].parse_status == "parsed"
    assert docs[9].sent_at.startswith("2026-08-10T09:00:00")


class CrashingImap(FakeImap):
    """Fetch raises on its Nth call the first time through — the
    mid-enumeration kill (connection drop / worker OOM) the UID-cursor
    contract must survive (reference imap.py:213-229)."""

    def __init__(self, messages, crash_on_fetch: int):
        super().__init__(messages)
        self.crash_on_fetch = crash_on_fetch
        self.fetch_calls = 0
        self.crashed = False

    def uid(self, command, *args):
        if command == "fetch":
            self.fetch_calls += 1
            if not self.crashed and self.fetch_calls == self.crash_on_fetch:
                self.crashed = True
                raise ConnectionError("simulated mid-batch connection drop")
        return super().uid(command, *args)


def test_kill_mid_enumeration_then_rerun_is_exactly_once(spark):
    """VERDICT r12 item 5: kill the connector mid-batch, re-run, and
    the cursor contract must yield exactly-once document rows — the
    crashed attempt advanced NO cursor (next_cursor derives from the
    run's OUTPUT, which never materialized), so the retry re-reads
    everything above the old cursor, once."""
    msgs = {u: _msg(u, f"s{u}", f"body {u}") for u in (3, 7, 9, 12, 15)}
    client = CrashingImap(msgs, crash_on_fetch=2)
    cursor = 3
    with pytest.raises(ConnectionError):
        # batch_size=2 -> fetch #1 gets (7, 9), fetch #2 crashes before
        # (12, 15); the run dies, the caller's cursor stays 3
        enumerate_mailbox(spark, client, "h", last_seen_uid=cursor,
                          batch_size=2).collect()
    # retry against the recovered connection, SAME cursor
    df = enumerate_mailbox(spark, client, "h", last_seen_uid=cursor,
                           batch_size=2)
    rows = [r.uid for r in df.collect()]
    assert sorted(rows) == [7, 9, 12, 15]      # full coverage
    assert len(rows) == len(set(rows))         # no duplicates
    cursor = next_cursor(df, cursor)
    assert cursor == 15
    # caught up: a third run above the committed cursor is empty
    assert enumerate_mailbox(spark, client, "h", last_seen_uid=cursor,
                             batch_size=2).count() == 0
