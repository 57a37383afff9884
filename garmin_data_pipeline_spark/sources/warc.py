"""WARC (Web ARChive, ISO 28500) source — the container format of
Common Crawl, i.e. THE wire format an LLM training-data pipeline
ingests first.

Implemented for real in pure stdlib: record framing per the spec
(version line, header block, ``Content-Length``-framed body, CRLF CRLF
record separator), plain and **per-record-gzip-member** archives (the
Common Crawl layout: each record its own gzip member, so members can
be located and decoded independently), and HTTP response payload
splitting (status line + headers vs body). An encoder ships alongside
for round-trip and golden tests, exactly like the media codecs in
``functions/codecs.py``.

Certification: ``s14_warc_scan`` builds real multi-record gzip WARCs
from the documents table inside the query, re-ingests them through
this parser, and hash-matches body lengths and md5s against an oracle
that predicts them from the raw text without ever framing a record.

100 TB notes: Common Crawl ships ~1 GB ``.warc.gz`` files — the FILE
is the split unit (``binaryFile`` scan, one task per archive), which
matches how every production CC reader works; within a task the
gzip stream decodes ONE member at a time (records never span members
in the CC layout), so the DECOMPRESSION BUFFER is one member — the
old implementation additionally held the whole joined ~3-4 GB
decompressed archive — and each member's inflate is bounded by
``MAX_MEMBER_BYTES`` (gzip-bomb guard; beyond it is a ValueError,
i.e. an error row). Honest sizing note: ``records_from_archives``
still accumulates the archive's RECORD CONTENTS before emitting
(its all-records-or-one-error-row contract requires it), so its peak
is raw payload + record payloads; only direct ``iter_warc_records``
consumers get true record-at-a-time streaming. Payload bytes go
row-wise into the DataFrame (never driver-side). Corrupt records
follow the multimodal posture: a malformed archive yields an error
row, not a dead job.
"""

from __future__ import annotations

import gzip
import hashlib
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_CRLF = b"\r\n"


def encode_warc(
    records: list[dict],
    gzip_members: bool = True,
    compresslevel: int = 6,
) -> bytes:
    """Encode records as a WARC/1.0 archive.

    Each record dict: ``{'type': 'response', 'uri': ..., 'date':
    ..., 'content': bytes}``. ``gzip_members=True`` writes the
    Common Crawl layout (one gzip member per record); False writes a
    plain concatenated archive. Record IDs are deterministic (md5 of
    uri+date) so archives are byte-reproducible (for a given
    ``compresslevel``).

    ``compresslevel`` trades encode CPU for archive size exactly like
    ``gzip(1)``; the decoded records are identical at every level.
    The default matches gzip's own (6). The r14 optimization pass
    dropped the former implicit level 9 — Python's ``gzip.compress``
    default — which bought nothing here (guide §1.2 step 2: the
    in-query WARC fixtures spent a third of their encode kernel in
    deflate's exhaustive match search).
    """
    out = bytearray()
    for r in records:
        content = r["content"]
        rid = hashlib.md5(
            (r.get("uri", "") + r.get("date", "")).encode()
        ).hexdigest()
        head = (
            b"WARC/1.0" + _CRLF
            + b"WARC-Type: " + r.get("type", "response").encode() + _CRLF
            + b"WARC-Record-ID: <urn:md5:" + rid.encode() + b">" + _CRLF
            + b"WARC-Target-URI: " + r.get("uri", "").encode() + _CRLF
            + b"WARC-Date: "
            + r.get("date", "2026-01-01T00:00:00Z").encode() + _CRLF
            + b"Content-Length: " + str(len(content)).encode() + _CRLF
            + _CRLF
        )
        record = head + content + _CRLF + _CRLF
        out += (
            gzip.compress(record, compresslevel, mtime=0)
            if gzip_members
            else record
        )
    return bytes(out)


# Per-member decompressed-size cap. A Common Crawl member is one
# record (a web page, typically well under a few MB compressed);
# 1 GiB decompressed per member is far above anything legitimate but
# stops a crafted gzip bomb from inflating without bound inside a
# Spark task. The whole ARCHIVE is never buffered decompressed —
# members stream one at a time (see _gzip_members).
MAX_MEMBER_BYTES = 1 << 30


def _gzip_members(
    payload: bytes, max_member_bytes: int
) -> Iterator[bytes]:
    """Walk a multi-member gzip stream yielding one decompressed
    member at a time — peak memory is ONE member (plus the shared
    compressed buffer), not the whole decompressed archive, and each
    member's inflate is bounded by ``max_member_bytes``."""
    view = memoryview(payload)
    n = len(view)
    feed_chunk = 1 << 20
    pos = 0
    while pos < n:
        d = zlib.decompressobj(wbits=31)
        chunks: list[bytes] = []
        total = 0
        feed_pos = pos
        try:
            while not d.eof:
                if d.unconsumed_tail:
                    data: bytes | memoryview = d.unconsumed_tail
                else:
                    if feed_pos >= n:
                        break
                    data = view[feed_pos : feed_pos + feed_chunk]
                    feed_pos += len(data)
                out = d.decompress(data, max_member_bytes + 1 - total)
                if out:
                    total += len(out)
                    if total > max_member_bytes:
                        raise ValueError(
                            "WARC gzip member inflates beyond "
                            f"{max_member_bytes} bytes (bomb guard)"
                        )
                    chunks.append(out)
        except zlib.error as e:
            raise ValueError(f"corrupt WARC gzip member: {e}") from e
        if not d.eof:
            # a member cut mid-stream decompresses to a prefix
            # WITHOUT a zlib.error — accepting it would silently
            # drop every record after the cut
            raise ValueError(
                "truncated WARC gzip member (stream ended "
                "before the member's end marker)"
            )
        tail = d.flush()
        if tail:
            chunks.append(tail)
        yield b"".join(chunks)
        pos = feed_pos - len(d.unused_data)


def iter_warc_records(
    payload: bytes, max_member_bytes: int = MAX_MEMBER_BYTES
) -> Iterator[dict]:
    """Lazily parse a WARC archive (plain or multi-member gzip),
    yielding ``{'headers': {name: value}, 'content': bytes}`` per
    record as the archive is walked.

    Gzip archives decode member-by-member (the Common Crawl layout
    puts each record in its own member precisely so readers can do
    this); records are framed WITHIN a member, so end-to-end peak
    memory is one decompressed member, never the whole archive. A
    record that spans gzip members is out of spec for the CC layout
    and raises.
    """
    if payload[:2] == b"\x1f\x8b":
        for member in _gzip_members(payload, max_member_bytes):
            yield from _parse_frames(member)
    else:
        yield from _parse_frames(payload)


def parse_warc(
    payload: bytes, max_member_bytes: int = MAX_MEMBER_BYTES
) -> list[dict]:
    """Eager form of :func:`iter_warc_records` (framing per the
    spec: headers run to the first blank line, the body is exactly
    ``Content-Length`` bytes, and the record ends with CRLF CRLF)."""
    return list(iter_warc_records(payload, max_member_bytes))


def _parse_frames(payload: bytes) -> Iterator[dict]:
    pos = 0
    n = len(payload)
    while pos < n:
        # tolerate inter-record padding
        while pos < n and payload[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            break
        if not payload.startswith(b"WARC/", pos):
            raise ValueError(
                f"bad WARC version line at offset {pos}"
            )
        head_end = payload.find(_CRLF + _CRLF, pos)
        if head_end == -1:
            raise ValueError("truncated WARC header block")
        lines = payload[pos:head_end].split(_CRLF)
        headers: dict[str, str] = {}
        for line in lines[1:]:
            k, _, v = line.partition(b":")
            headers[k.decode().strip()] = v.decode().strip()
        try:
            length = int(headers["Content-Length"])
        except (KeyError, ValueError) as e:
            raise ValueError(f"bad WARC Content-Length: {e}") from e
        body_start = head_end + 4
        if body_start + length > n:
            raise ValueError("truncated WARC record body")
        yield {
            "headers": headers,
            "content": payload[body_start : body_start + length],
        }
        pos = body_start + length


def http_response_body(content: bytes) -> tuple[int, bytes]:
    """Split an HTTP response payload into (status_code, body) — the
    standard second framing layer inside a WARC ``response`` record."""
    sep = content.find(b"\r\n\r\n")
    if sep == -1 or not content.startswith(b"HTTP/"):
        raise ValueError("not an HTTP response payload")
    status_line = content[: content.find(_CRLF)].decode(
        "ascii", "replace"
    )
    parts = status_line.split(None, 2)
    if len(parts) < 2 or not parts[1].isdigit():
        raise ValueError(f"bad HTTP status line {status_line!r}")
    return int(parts[1]), content[sep + 4 :]


WARC_RECORD_SCHEMA = (
    "archive string, warc_type string, target_uri string, "
    "warc_date string, content binary, content_length bigint, "
    "parse_error string"
)


def records_from_archives(
    df: DataFrame,
    payload_col: str = "payload",
    name_col: str | None = None,
) -> DataFrame:
    """Explode WARC archive payloads into one row per record via an
    Arrow-batched kernel (the scan-side half; pair with a
    ``binaryFile`` read for directories of .warc.gz files).

    A corrupt archive yields ONE row with ``parse_error`` set and
    NULL content — a 100 TB crawl ingest must not die on one bad
    file; filter/route on ``parse_error`` downstream.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                name = str(r[name_col]) if name_col else ""
                p = r[payload_col]
                try:
                    if p is None or len(p) == 0:
                        raise ValueError("empty WARC payload")
                    # consume INSIDE the try: the iterator raises
                    # lazily (per gzip member), and the contract is
                    # all-records-or-one-error-row per archive
                    recs = list(iter_warc_records(bytes(p)))
                    if not recs:
                        raise ValueError("WARC archive with no records")
                except ValueError as e:
                    rows.append((name, None, None, None, None, None, str(e)))
                    continue
                for rec in recs:
                    h = rec["headers"]
                    rows.append(
                        (
                            name,
                            h.get("WARC-Type"),
                            h.get("WARC-Target-URI"),
                            h.get("WARC-Date"),
                            rec["content"],
                            len(rec["content"]),
                            None,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "archive", "warc_type", "target_uri", "warc_date",
                    "content", "content_length", "parse_error",
                ],
            ).astype({"content_length": "Int64"})

    return df.mapInPandas(kernel, schema=WARC_RECORD_SCHEMA)


def scan_warc(
    spark: SparkSession, path: str, glob: str = "*.warc*"
) -> DataFrame:
    """Directory scan for WARC archives: ``binaryFile`` (one task per
    archive — the Common Crawl parallelism unit) → per-record rows."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", "content")
        .withColumnRenamed("content", "payload")
    )
    return records_from_archives(files, "payload", name_col="path")
