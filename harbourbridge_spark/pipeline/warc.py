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
    Crawl record-per-member layout and plain single-member files)."""
    out, buf = [], content
    while buf:
        d = zlib.decompressobj(wbits=47)
        out.append(d.decompress(buf))
        out.append(d.flush())
        if not d.eof:
            raise ValueError("warc: truncated gzip member")
        buf = d.unused_data
    return b"".join(out)


def _parse_one(content: bytes, pos: int) -> tuple[tuple, int]:
    """Parse the record starting at ``pos`` -> ((warc_type, uri,
    date, status, mime, content_length, body), next_pos).  Raises
    ValueError on any framing violation."""
    end = content.find(b"\r\n\r\n", pos)
    if end < 0 or not content.startswith(b"WARC/", pos):
        raise ValueError("warc: bad record header")
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
    payload = content[body_start:body_start + clen]
    if len(payload) != clen or content[
            body_start + clen:body_start + clen + 4] != b"\r\n\r\n":
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


def scan_plain_range(content: bytes, start: int, end: int)\
        -> list[tuple]:
    """Records STARTING in [start, end) of an uncompressed archive.
    Resync: candidate 'WARC/' sync at-or-after ``start`` is VALIDATED
    by chain-parsing records until the chain crosses ``end`` (or
    EOF); a payload-embedded fake record chains into the surrounding
    payload's tail and fails, so the candidate is rejected and the
    scan moves to the next sync (differential-tested against the
    sequential parse, adversarial embedded-record payload included).
    -> [(offset, warc_type, uri, date, status, mime, clen, body)]."""
    pos = 0 if start == 0 else content.find(b"WARC/", start)
    while 0 <= pos < min(end, len(content)):
        rows, p = [], pos
        try:
            while p < len(content):
                row, nxt = _parse_one(content, p)
                if p >= end:
                    break               # chained past range: valid
                rows.append((p,) + row)
                p = nxt
            return rows
        except ValueError:
            pos = content.find(b"WARC/", pos + 1)
    return []


def scan_gzip_range(content: bytes, start: int, end: int)\
        -> list[tuple]:
    """Gzip-member twin: candidate 0x1F8B08 magics in [start, end)
    validate by decompressing ONE member and parsing its record —
    magic triples inside compressed data fail inflation and are
    skipped.  Offsets are compressed member starts."""
    rows = []
    pos = content.find(b"\x1f\x8b\x08", start)
    while 0 <= pos < min(end, len(content)):
        try:
            d = zlib.decompressobj(wbits=47)
            raw = d.decompress(content[pos:]) + d.flush()
            if not d.eof:
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
            pos = len(content) - len(d.unused_data)
            if pos >= end:
                break
            if content[pos:pos + 3] != b"\x1f\x8b\x08":
                pos = content.find(b"\x1f\x8b\x08", pos)
        except (ValueError, zlib.error, UnicodeDecodeError):
            pos = content.find(b"\x1f\x8b\x08", pos + 1)
    return rows


def warc_records_distributed(spark, path: str,
                             n_splits: int = 32) -> DataFrame:
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
        # whole-file read per task is acceptable because ranges of
        # the SAME file land on the same executors' page cache; the
        # mmap-window refinement lives in sources/pgdump's readers
        with open(path, "rb") as f:
            content = f.read()
        scan = scan_gzip_range if is_gzip else scan_plain_range
        for pdf in batches:
            out = {k: [] for k in cols}
            for s, e in zip(pdf["start"], pdf["end"]):
                for row in scan(content, int(s), int(e)):
                    for k, v in zip(cols, row):
                        out[k].append(v)
            yield pd.DataFrame(out)

    ranges = spark.createDataFrame(bounds, "start long, end long") \
        .repartition(len(bounds))
    return ranges.mapInPandas(run, schema=WARC_OFFSET_SCHEMA)


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
            yield pd.DataFrame(out)

    spark = files.sparkSession
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch",
                   str(batch_size))
    return files.mapInPandas(run, schema=WARC_SCHEMA)
