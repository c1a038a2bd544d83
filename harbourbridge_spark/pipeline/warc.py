"""WARC (ISO 28500 / Common Crawl) container ingestion.

Web-scale training corpora START as WARC: Common Crawl publishes
~90k `.warc.gz` files per monthly crawl (~1 GiB each), where every
WARC record is its OWN gzip member so readers can split mid-file.
This module is the ingestion end of the LLM-data pipeline — the step
that turns crawl archives into the `documents` relation everything
downstream (dedup, curation, quality) operates on.  Reference parity
note: the reference migrates relational rows and has no crawl-archive
surface; this family is beyond-parity pipeline surface, like the
codec modules.

- `parse_warc(content)`: sequential record walk over one WARC file's
  bytes, plain or gzip (multi-member or whole-file).  Framing is by
  the mandatory `Content-Length` header (the spec's rule — record
  payloads are arbitrary bytes, so delimiter scanning is wrong by
  construction), with the `\\r\\n\\r\\n` record separator verified
  after each payload.  For `application/http` response records the
  HTTP status line, headers, and body are parsed out of the payload.
- `warc_records(files)`: the Spark kernel — Arrow-batched
  `mapInPandas` over `(file_id, content)` rows, one task per file.
  100 TB shape: a crawl is ~100k independent files, so parallelism
  is file-granular (and record-granular within a file via the
  per-record gzip members); there is NO cross-file state and NO
  shuffle — the scan is embarrassingly parallel, exactly how
  Common Crawl intends WARC to be read.
- `synth_warc_files(docs, n_files, gzip_members)`: fixture muxer —
  groups the documents table into `n_files` WARC files (warcinfo
  record + one HTTP-response record per doc wrapping the text in
  deterministic HTML), optionally with each record its own gzip
  member (the Common Crawl layout).  Every header and length is
  closed-form in doc_id/text, so the DuckDB oracle reconstructs the
  expected parse with pure SQL.

Malformed bytes raise ValueError; the Spark kernel degrades a bad
file to zero rows, the codec-family convention.
"""

from __future__ import annotations

import gzip
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

N_WARC_FILES = 64

WARCINFO_PAYLOAD = b"software: harbourbridge-spark\r\nformat: WARC/1.0\r\n"

WARC_SCHEMA = T.StructType([
    T.StructField("file_id", T.LongType(), False),
    T.StructField("rec_idx", T.LongType(), False),
    T.StructField("warc_type", T.StringType(), False),
    T.StructField("target_uri", T.StringType(), False),
    T.StructField("warc_date", T.StringType(), False),
    T.StructField("http_status", T.LongType(), False),
    T.StructField("mime", T.StringType(), False),
    T.StructField("content_length", T.LongType(), False),
    T.StructField("body", T.StringType(), False),
])


# ---------------------------------------------------------------------------
# fixture muxer
# ---------------------------------------------------------------------------

def _html_escape(text: str) -> str:
    # & first, then the angle brackets — same order the oracle uses
    return (text.replace("&", "&amp;")
            .replace("<", "&lt;").replace(">", "&gt;"))


def _doc_html(doc_id: int, text: str) -> bytes:
    return ("<html><head><title>Doc %d</title></head><body><p>%s"
            "</p></body></html>" % (doc_id, _html_escape(text))
            ).encode("utf-8")


def _record(headers: list[tuple[str, str]], payload: bytes) -> bytes:
    head = "WARC/1.0\r\n" + "".join(
        f"{k}: {v}\r\n" for k, v in headers
    ) + f"Content-Length: {len(payload)}\r\n\r\n"
    return head.encode("utf-8") + payload + b"\r\n\r\n"


def _response_record(doc_id: int, text: str) -> bytes:
    html = _doc_html(doc_id, text)
    http = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            "Content-Length: %d\r\n\r\n" % len(html)
            ).encode("utf-8") + html
    return _record([
        ("WARC-Type", "response"),
        ("WARC-Record-ID", f"<urn:doc:{doc_id}>"),
        ("WARC-Date", _doc_date(doc_id)),
        ("WARC-Target-URI", _doc_uri(doc_id)),
        ("Content-Type", "application/http; msgtype=response"),
    ], http)


def _doc_uri(doc_id: int) -> str:
    return f"http://h{doc_id % 7}.example.com/doc/{doc_id}"


def _doc_date(doc_id: int) -> str:
    return f"2024-01-01T00:00:{doc_id % 60:02d}Z"


def build_warc_file(file_id: int, docs: list[tuple[int, str]],
                    gzip_members: bool = False) -> bytes:
    """One WARC file: warcinfo + one response record per doc (sorted
    by doc_id).  ``gzip_members`` emits each record as its own gzip
    member (Common Crawl's layout — the property that makes a 1 GiB
    crawl file splittable mid-stream)."""
    records = [_record([
        ("WARC-Type", "warcinfo"),
        ("WARC-Record-ID", f"<urn:warcinfo:{file_id}>"),
        ("WARC-Date", _doc_date(0)),
        ("Content-Type", "application/warc-fields"),
    ], WARCINFO_PAYLOAD)]
    for doc_id, text in sorted(docs):
        records.append(_response_record(doc_id, text))
    if gzip_members:
        return b"".join(gzip.compress(r, mtime=0) for r in records)
    return b"".join(records)


def synth_warc_files(docs: DataFrame, n_files: int = N_WARC_FILES,
                     gzip_members: bool = False) -> DataFrame:
    """documents -> (file_id, content) WARC files, file per
    ``doc_id % n_files`` group.  One groupBy shuffle builds the
    fixture; real ingestion reads files straight off storage."""
    import pyspark.sql.functions as F

    out_schema = T.StructType([
        T.StructField("file_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), False),
    ])

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        fid = int(pdf["file_id"].iloc[0])
        pairs = list(zip((int(d) for d in pdf["doc_id"]),
                         (str(t) for t in pdf["text"])))
        blob = build_warc_file(fid, pairs, gzip_members=gzip_members)
        return pd.DataFrame({"file_id": [fid], "content": [blob]})

    keyed = docs.select(
        (F.col("doc_id") % n_files).alias("file_id"),
        "doc_id", "text")
    return keyed.groupBy("file_id").applyInPandas(build, out_schema)


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------

def _gunzip_members(content: bytes) -> bytes:
    """Concatenated-member gzip -> raw bytes (handles the Common
    Crawl record-per-member layout and plain single-member files).
    The inflater is fed bounded chunks and the walk advances by a
    consumed-bytes OFFSET: handing it the whole remaining buffer
    would copy the tail into unused_data once per member —
    O(file_bytes) memcpy per record, quadratic over the file
    (measured: a 38 MB / 120k-member crawl file took minutes; this
    walk takes seconds)."""
    out, pos = [], 0
    while pos < len(content):
        d = zlib.decompressobj(wbits=47)
        while not d.eof and pos < len(content):
            seg = content[pos:pos + _GZ_FEED]
            out.append(d.decompress(seg))
            pos += len(seg)
        out.append(d.flush())
        if not d.eof:
            raise ValueError("warc: truncated gzip member")
        pos -= len(d.unused_data)
    return b"".join(out)


def _parse_one(content: bytes, pos: int) -> tuple[tuple, int]:
    """Parse the record starting at ``pos`` -> ((warc_type, uri,
    date, status, mime, content_length, body), next_pos).  Raises
    ValueError on any framing violation."""
    if not content.startswith(b"WARC/", pos):
        # a cut buffer may leave 0-4 bytes of the next record's
        # version prefix visible — that is truncation, not junk
        tail = len(content) - pos
        if tail < 5 and content[pos:] == b"WARC/"[:tail]:
            raise ValueError("warc: record exceeds buffer")
        raise ValueError("warc: bad record header")
    end = content.find(b"\r\n\r\n", pos)
    if end < 0:
        # valid version prefix but the header never terminates in
        # this buffer: window truncation to a ranged caller, plain
        # corruption at EOF
        raise ValueError("warc: record exceeds buffer")
    head_lines = content[pos:end].decode("utf-8").split("\r\n")
    if head_lines[0] not in ("WARC/1.0", "WARC/1.1"):
        raise ValueError("warc: unsupported version " + head_lines[0])
    hdrs = {}
    for line in head_lines[1:]:
        k, _, v = line.partition(":")
        hdrs[k.strip().lower()] = v.strip()
    try:
        clen = int(hdrs["content-length"])
    except (KeyError, ValueError):
        raise ValueError("warc: missing Content-Length") from None
    body_start = end + 4
    if body_start + clen + 4 > len(content):
        # distinct message: a windowed caller must WIDEN, not reject
        raise ValueError("warc: record exceeds buffer")
    payload = content[body_start:body_start + clen]
    if content[body_start + clen:
               body_start + clen + 4] != b"\r\n\r\n":
        raise ValueError("warc: bad record framing")
    wtype = hdrs.get("warc-type", "")
    status, mime, body = 0, hdrs.get("content-type", ""), payload
    if wtype == "response" and mime.startswith("application/http"):
        status, mime, body = _parse_http_response(payload)
    return ((wtype, hdrs.get("warc-target-uri", ""),
             hdrs.get("warc-date", ""), status, mime, clen,
             body.decode("utf-8", errors="replace")),
            body_start + clen + 4)


def parse_warc(content: bytes) -> list[tuple]:
    """WARC file bytes -> list of WARC_SCHEMA tuples (sans file_id).
    Content-Length framing per ISO 28500 §4; `\\r\\n\\r\\n` record
    separator verified after each payload."""
    if content[:2] == b"\x1f\x8b":
        content = _gunzip_members(content)
    rows, pos, rec_idx = [], 0, 0
    while pos < len(content):
        row, pos = _parse_one(content, pos)
        rows.append((rec_idx,) + row)
        rec_idx += 1
    return rows


def _parse_http_response(payload: bytes) -> tuple[int, str, bytes]:
    end = payload.find(b"\r\n\r\n")
    if end < 0:
        raise ValueError("warc: bad http payload")
    lines = payload[:end].decode("utf-8", errors="replace").split("\r\n")
    parts = lines[0].split(" ", 2)
    if len(parts) < 2 or not parts[0].startswith("HTTP/"):
        raise ValueError("warc: bad http status line")
    status = int(parts[1])
    mime = ""
    for line in lines[1:]:
        k, _, v = line.partition(":")
        if k.strip().lower() == "content-type":
            mime = v.strip()
    return status, mime, payload[end + 4:]


# ---------------------------------------------------------------------------
# closed-form DuckDB oracles (reconstruct the expected parse from the
# documents table with pure SQL: every fixture header and length is a
# function of doc_id/text, including the nested Content-Length-digit
# term — record length = 62 fixed HTTP-header bytes + the digits of
# the html byte length + the html bytes themselves)
# ---------------------------------------------------------------------------

_ORACLE_RESP = """
    SELECT doc_id % {n} AS file_id,
           ROW_NUMBER() OVER (PARTITION BY doc_id % {n}
                              ORDER BY doc_id) AS rec_idx,
           'response' AS warc_type,
           'http://h' || (doc_id % 7) || '.example.com/doc/' || doc_id
               AS target_uri,
           '2024-01-01T00:00:' ||
               lpad(CAST(doc_id % 60 AS VARCHAR), 2, '0') || 'Z'
               AS warc_date,
           CAST(200 AS BIGINT) AS http_status,
           'text/html' AS mime,
           CAST(62 + length(CAST(hlen AS VARCHAR)) + hlen AS BIGINT)
               AS content_length,
           html AS body
    FROM (SELECT doc_id, html, octet_length(encode(html)) AS hlen
          FROM (SELECT doc_id,
                       '<html><head><title>Doc ' || doc_id ||
                       '</title></head><body><p>' ||
                       replace(replace(replace(text, '&', '&amp;'),
                               '<', '&lt;'), '>', '&gt;') ||
                       '</p></body></html>' AS html
                FROM documents))
"""

_ORACLE_INFO = """
    SELECT DISTINCT doc_id % {n} AS file_id,
           CAST(0 AS BIGINT) AS rec_idx,
           'warcinfo' AS warc_type,
           '' AS target_uri,
           '2024-01-01T00:00:00Z' AS warc_date,
           CAST(0 AS BIGINT) AS http_status,
           'application/warc-fields' AS mime,
           CAST(49 AS BIGINT) AS content_length,
           'software: harbourbridge-spark' || chr(13) || chr(10) ||
               'format: WARC/1.0' || chr(13) || chr(10) AS body
    FROM documents
"""


def warc_records_oracle_sql(n_files: int = N_WARC_FILES) -> str:
    return (_ORACLE_INFO.format(n=n_files) + " UNION ALL "
            + _ORACLE_RESP.format(n=n_files))


def warc_stats_oracle_sql(n_files: int = N_WARC_FILES) -> str:
    return f"""
    SELECT doc_id % {n_files} AS file_id,
           CAST(COUNT(*) + 1 AS BIGINT) AS n_records,
           CAST(COUNT(*) AS BIGINT) AS n_responses,
           CAST(49 + SUM(62 + length(CAST(hlen AS VARCHAR)) + hlen)
                AS BIGINT) AS payload_bytes
    FROM (SELECT doc_id,
                 octet_length(encode(
                     '<html><head><title>Doc ' || doc_id ||
                     '</title></head><body><p>' ||
                     replace(replace(replace(text, '&', '&amp;'),
                             '<', '&lt;'), '>', '&gt;') ||
                     '</p></body></html>')) AS hlen
          FROM documents)
    GROUP BY doc_id % {n_files}
    """


# ---------------------------------------------------------------------------
# byte-range distributed scan of ONE large archive (the sub-file
# split the per-record gzip-member layout exists to permit)
# ---------------------------------------------------------------------------

WARC_OFFSET_SCHEMA = T.StructType(
    [T.StructField("offset", T.LongType(), False)]
    + WARC_SCHEMA.fields[2:])

# windowed-read margin past a range's end: must exceed the largest
# single record (Common Crawl truncates payloads at 5 MB; 64 MiB is
# 12x margin).  Tasks that detect window truncation double it.
WARC_RANGE_OVERSHOOT = 64 << 20


# inflater feed granularity for the member-by-member gzip walk
_GZ_FEED = 256 << 10


class _WindowTruncated(Exception):
    """A record/member STARTING in-range ran past the read window —
    the caller must widen the window and rescan (never silently
    drop)."""


def scan_plain_range(content: bytes, start: int, end: int,
                     eof: bool = True) -> list[tuple]:
    """Records STARTING in [start, end) of an uncompressed archive.
    Resync: candidate 'WARC/' sync at-or-after ``start`` is VALIDATED
    by chain-parsing records until the chain crosses ``end`` (or
    EOF); a payload-embedded fake record chains into the surrounding
    payload's tail and fails, so the candidate is rejected and the
    scan moves to the next sync (differential-tested against the
    sequential parse, adversarial embedded-record payload included).
    -> [(offset, warc_type, uri, date, status, mime, clen, body)]."""
    pos = content.find(b"WARC/", start)
    while 0 <= pos < min(end, len(content)):
        rows, p = [], pos
        try:
            while p < min(end, len(content)):
                # records STARTING past the range end belong to the
                # next task — the chain is valid once it reaches one
                # (checked BEFORE parsing: the past-end record may
                # extend beyond this task's window)
                row, nxt = _parse_one(content, p)
                rows.append((p,) + row)
                p = nxt
            if p < len(content):
                # confirmation parse of the first past-end record:
                # a near-end fake whose chain jumps past the range
                # boundary must still land on a real record.  Being
                # cut by the window ("exceeds buffer") is fine — the
                # next task validates its own range.
                try:
                    _parse_one(content, p)
                except ValueError as err:
                    if "exceeds buffer" not in str(err):
                        raise
            return rows
        except ValueError as err:
            # an in-range record that ran off the buffer demands a
            # WIDER window, never a silent candidate rejection
            # (``eof`` callers pass the full file: EOF is the truth
            # there and the candidate is simply invalid)
            if not eof and p < end \
                    and "exceeds buffer" in str(err):
                raise _WindowTruncated(p) from None
            pos = content.find(b"WARC/", pos + 1)
    return []


def scan_gzip_range(content: bytes, start: int, end: int,
                    eof: bool = True) -> list[tuple]:
    """Gzip-member twin: candidate 0x1F8B08 magics in [start, end)
    validate by decompressing ONE member and parsing its record —
    magic triples inside compressed data fail inflation and are
    skipped.  Offsets are compressed member starts."""
    rows = []
    pos = content.find(b"\x1f\x8b\x08", start)
    while 0 <= pos < min(end, len(content)):
        try:
            # feed the inflater in bounded chunks: handing it the
            # whole remaining window would COPY the tail into
            # unused_data once per member — O(range_bytes) memcpy
            # per record, quadratic over the range (observed: a
            # 9.6 MB range of ~700-byte members never finished)
            d = zlib.decompressobj(wbits=47)
            chunks, p2 = [], pos
            while not d.eof and p2 < len(content):
                seg = content[p2:p2 + _GZ_FEED]
                chunks.append(d.decompress(seg))
                p2 += len(seg)
            raw = b"".join(chunks) + d.flush()
            member_end = p2 - len(d.unused_data)
            if not d.eof:
                # a valid deflate prefix consuming the whole tail is
                # a member cut by the window — widen, don't drop
                if not eof:
                    raise _WindowTruncated(pos)
                raise ValueError("truncated member")
            # normally ONE record per member (the splittable layout);
            # a whole-file single-member archive decompresses to many
            # records here — emit them all at pos + uncompressed
            # offset (unique; globally ordered for the single-member
            # and record-per-member layouts, which is every real one)
            p, member_rows = 0, []
            while p < len(raw):
                row, nxt = _parse_one(raw, p)
                member_rows.append((pos + p,) + row)
                p = nxt
            rows.extend(member_rows)
            # jump to the next member boundary (skip embedded magics)
            pos = member_end
            if pos >= end:
                break
            if content[pos:pos + 3] != b"\x1f\x8b\x08":
                pos = content.find(b"\x1f\x8b\x08", pos)
        except (ValueError, zlib.error, UnicodeDecodeError):
            pos = content.find(b"\x1f\x8b\x08", pos + 1)
    return rows


def warc_records_distributed(spark, path: str, n_splits: int = 32,
                             overshoot0: int = WARC_RANGE_OVERSHOOT
                             ) -> DataFrame:
    """Distributed byte-range scan of ONE large .warc/.warc.gz on
    shared storage — the 100 TB shape when a single archive is
    bigger than a task should own (Common Crawl's record-per-member
    gzip layout exists exactly so readers can resync mid-file).
    Each task seeks into its range and emits records STARTING there;
    ranges need no coordination and the scan is shuffle-free.
    Differential-tested row-identical to the staged ``parse_warc``
    on both container modes."""
    import os

    size = os.path.getsize(path)
    is_gzip = open(path, "rb").read(3)[:2] == b"\x1f\x8b"
    step = max(1, (size + n_splits - 1) // n_splits)
    bounds = [(i * step, min(size, (i + 1) * step))
              for i in range(n_splits) if i * step < size]
    cols = [f.name for f in WARC_OFFSET_SCHEMA.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # WINDOWED reads: each task seeks to its range and reads
        # range + overshoot only — a task never holds the archive.
        # A record/member cut by the window edge raises
        # _WindowTruncated from the scanner (never a silent drop)
        # and the window doubles until the record fits or the read
        # reaches EOF, where truncation becomes plain corruption.
        scan = scan_gzip_range if is_gzip else scan_plain_range
        with open(path, "rb") as f:
            for pdf in batches:
                out = {k: [] for k in cols}
                for s, e in zip(pdf["start"], pdf["end"]):
                    s, e = int(s), int(e)
                    overshoot = overshoot0
                    while True:
                        f.seek(s)
                        window = f.read((e - s) + overshoot)
                        at_eof = s + len(window) >= size
                        try:
                            rows = scan(window, 0, e - s,
                                        eof=at_eof)
                            break
                        except _WindowTruncated:
                            overshoot *= 2
                    for row in rows:
                        out[cols[0]].append(s + row[0])
                        for k, v in zip(cols[1:], row[1:]):
                            out[k].append(v)
                yield pd.DataFrame(out)

    ranges = spark.createDataFrame(bounds, "start long, end long") \
        .repartition(len(bounds))
    return ranges.mapInPandas(run, schema=WARC_OFFSET_SCHEMA)


def warc_records_from_paths(spark, paths: list[str],
                            batch_size: int = 1) -> DataFrame:
    """File-parallel ingestion that OPENS paths inside the tasks —
    the 32 GiB rehearsal measured the binaryFile route (archive
    bytes shipped JVM -> Python before the kernel sees them) at
    2.2x slower than direct reads; this variant keeps file-granular
    parallelism and reads from shared storage like
    warc_records_distributed does.  Output matches warc_records with
    file_id = xxhash64 of the path string AS GIVEN (binaryFile's
    `path` column is a file: URI, so keys differ across routes —
    join on content-derived columns when mixing them).  A corrupt or
    unreadable file contributes zero rows."""
    import pyspark.sql.functions as F

    cols = [f.name for f in WARC_SCHEMA.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in cols}
            for fid, path in zip(pdf["file_id"], pdf["path"]):
                try:
                    with open(path, "rb") as fh:
                        rows = parse_warc(fh.read())
                except (OSError, ValueError, UnicodeDecodeError):
                    continue
                for r in rows:
                    out["file_id"].append(int(fid))
                    for k, v in zip(cols[1:], r):
                        out[k].append(v)
                    if len(out["file_id"]) >= 5000:
                        yield pd.DataFrame(out)
                        out = {k: [] for k in cols}
            if out["file_id"]:
                yield pd.DataFrame(out)

    files = (spark.createDataFrame([(p,) for p in paths], "path string")
             .repartition(max(1, len(paths)))
             .select(F.xxhash64("path").alias("file_id"), "path"))
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch",
                   str(batch_size))
    return files.mapInPandas(run, schema=WARC_SCHEMA)


def warc_records(files: DataFrame, batch_size: int = 4) -> DataFrame:
    """(file_id, content) -> WARC_SCHEMA rows.  Arrow-batched; one
    kernel invocation parses whole files, so task granularity IS file
    granularity (the Common Crawl scale shape — see module doc).
    A corrupt file contributes zero rows."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in WARC_SCHEMA.fields]
        for pdf in batches:
            out = {k: [] for k in cols}
            for fid, content in zip(pdf["file_id"], pdf["content"]):
                if content is None:
                    continue
                try:
                    rows = parse_warc(bytes(content))
                except (ValueError, UnicodeDecodeError):
                    continue
                for r in rows:
                    out["file_id"].append(int(fid))
                    for k, v in zip(cols[1:], r):
                        out[k].append(v)
                    # bounded output frames: a 1 GiB crawl file is
                    # ~1 M records x ~2 KB bodies — one frame per
                    # FILE would hold the whole expansion (measured
                    # 500 MB+ at the 32 GiB rehearsal); flush every
                    # few thousand rows instead
                    if len(out["file_id"]) >= 5000:
                        yield pd.DataFrame(out)
                        out = {k: [] for k in cols}
            if out["file_id"]:
                yield pd.DataFrame(out)

    spark = files.sparkSession
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch",
                   str(batch_size))
    return files.mapInPandas(run, schema=WARC_SCHEMA)
