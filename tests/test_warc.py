"""WARC (ISO 28500 / Common Crawl) source: framing, gzip members,
HTTP split, corrupt-archive posture, and the directory scan."""

from __future__ import annotations

import gzip

import pytest

from garmin_data_pipeline_spark.sources.warc import (
    encode_warc,
    http_response_body,
    parse_warc,
    records_from_archives,
    scan_warc,
)


def _resp(i: int) -> dict:
    return {
        "type": "response",
        "uri": f"http://x/{i}",
        "date": "2026-01-01T00:00:00Z",
        "content": (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n"
            + f"body {i}".encode()
        ),
    }


def test_golden_record_framing_by_hand():
    # hand-assembled single record, independent of encode_warc
    content = b"hello"
    payload = (
        b"WARC/1.0\r\n"
        b"WARC-Type: resource\r\n"
        b"WARC-Target-URI: http://g/1\r\n"
        b"Content-Length: 5\r\n"
        b"\r\n" + content + b"\r\n\r\n"
    )
    recs = parse_warc(payload)
    assert len(recs) == 1
    assert recs[0]["headers"]["WARC-Type"] == "resource"
    assert recs[0]["content"] == b"hello"


@pytest.mark.parametrize("gz", [True, False])
def test_multi_record_roundtrip(gz):
    records = [_resp(i) for i in range(7)]
    out = parse_warc(encode_warc(records, gzip_members=gz))
    assert len(out) == 7
    for i, rec in enumerate(out):
        assert rec["headers"]["WARC-Target-URI"] == f"http://x/{i}"
        status, body = http_response_body(rec["content"])
        assert status == 200 and body == f"body {i}".encode()


def test_gzip_members_are_independent():
    # the CC layout: each record its own gzip member — a member
    # boundary is a gzip header, and members decode independently
    payload = encode_warc([_resp(0), _resp(1)], gzip_members=True)
    assert payload[:2] == b"\x1f\x8b"
    # find the second member's header and decode it alone
    second = payload.index(b"\x1f\x8b", 2)
    solo = parse_warc(payload[second:])
    assert len(solo) == 1
    assert solo[0]["headers"]["WARC-Target-URI"] == "http://x/1"


def test_corrupt_archives_raise_valueerror():
    good = encode_warc([_resp(0)], gzip_members=False)
    gz = encode_warc([_resp(0)], gzip_members=True)
    # flip a byte INSIDE the deflate stream (past the 10-byte gzip
    # header) so zlib itself errors — exercising the zlib.error ->
    # ValueError branch, not the Content-Length one
    bad_deflate = bytearray(gz)
    bad_deflate[14] ^= 0xFF
    bad_deflate[15] ^= 0xFF
    for bad in (
        b"NOT A WARC",
        good[:-12],                 # truncated record body
        good.replace(b"Content-Length: ", b"Content-Length: x"),
        bytes(bad_deflate),         # corrupt deflate bytes
    ):
        with pytest.raises(ValueError):
            parse_warc(bad)
    with pytest.raises(ValueError):
        http_response_body(b"not http at all")


def test_truncated_gzip_member_is_an_error_not_silent_loss():
    # cut the archive inside the SECOND member: the first member
    # still decodes cleanly, so a decoder that doesn't check eof
    # would return record 0 and silently drop record 1
    payload = encode_warc([_resp(0), _resp(1)], gzip_members=True)
    second = payload.index(b"\x1f\x8b", 2)
    truncated = payload[: second + 20]
    with pytest.raises(ValueError, match="truncated WARC gzip member"):
        parse_warc(truncated)


def test_empty_and_recordless_payloads_yield_error_rows(spark):
    rows = [
        (1, None),
        (2, bytearray(b"")),
        (3, bytearray(gzip.compress(b""))),  # valid gzip, no records
    ]
    df = spark.createDataFrame(rows, "archive_id int, payload binary")
    out = records_from_archives(df, "payload").collect()
    # every archive is accounted for: one error row each, no silent
    # disappearance
    assert len(out) == 3
    assert all(r["parse_error"] is not None for r in out)


def test_records_from_archives_error_rows(spark):
    rows = [
        (1, bytearray(encode_warc([_resp(0), _resp(1)]))),
        (2, bytearray(b"junk, not a warc")),
    ]
    df = spark.createDataFrame(rows, "archive_id int, payload binary")
    out = records_from_archives(df, "payload").collect()
    good = [r for r in out if r["parse_error"] is None]
    bad = [r for r in out if r["parse_error"] is not None]
    assert len(good) == 2 and len(bad) == 1
    assert {r["target_uri"] for r in good} == {"http://x/0", "http://x/1"}
    assert bad[0]["content"] is None


def test_scan_warc_directory(spark, tmp_path):
    d = tmp_path / "crawl"
    d.mkdir()
    (d / "a.warc.gz").write_bytes(encode_warc([_resp(0), _resp(1)]))
    (d / "b.warc.gz").write_bytes(encode_warc([_resp(2)]))
    (d / "ignored.txt").write_text("nope")
    out = scan_warc(spark, str(d)).collect()
    assert len(out) == 3
    uris = sorted(r["target_uri"] for r in out)
    assert uris == ["http://x/0", "http://x/1", "http://x/2"]
    assert all(r["archive"].endswith(".warc.gz") for r in out)


def test_iter_warc_records_streams_per_member():
    """The iterator yields records lazily per gzip member: an archive
    whose FIRST member is valid and SECOND member is corrupt still
    yields record 0 before raising — proof the parser never buffers
    the whole decompressed archive up front (an eager implementation
    would raise before yielding anything)."""
    from garmin_data_pipeline_spark.sources.warc import iter_warc_records

    payload = encode_warc([_resp(0), _resp(1)], gzip_members=True)
    second = payload.index(b"\x1f\x8b", 2)
    broken = payload[: second + 20]  # member 2 truncated
    it = iter_warc_records(broken)
    first = next(it)
    assert first["headers"]["WARC-Target-URI"] == "http://x/0"
    with pytest.raises(ValueError, match="truncated WARC gzip member"):
        next(it)


def test_gzip_member_bomb_guard():
    """A member inflating past the cap is a ValueError (error row
    upstream), never an unbounded allocation."""
    record = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        + b"Content-Length: " + str(64 * 1024 * 1024).encode()
        + b"\r\n\r\n" + b"\x00" * (64 * 1024 * 1024) + b"\r\n\r\n"
    )
    bomb = gzip.compress(record, mtime=0)  # ~64 KB compressed
    assert len(bomb) < 1 << 20
    with pytest.raises(ValueError, match="bomb guard"):
        parse_warc(bomb, max_member_bytes=1 << 20)
    # under a cap that admits it, the same archive parses fine
    recs = parse_warc(bomb, max_member_bytes=1 << 27)
    assert len(recs) == 1 and len(recs[0]["content"]) == 64 * 1024 * 1024
