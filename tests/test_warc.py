"""WARC container ingestion + HTML extraction tests: byte-level
round-trips (plain / per-record-gzip / whole-file-gzip), spec framing
rejections, the Spark kernel end-to-end, and HAND-COMPUTED HTML strip
semantics on both engines."""

import gzip

import pytest

from harbourbridge_spark.pipeline import html as H
from harbourbridge_spark.pipeline.warc import (WARCINFO_PAYLOAD,
                                               build_warc_file,
                                               parse_warc,
                                               synth_warc_files,
                                               warc_records)

DOCS = [(5, "hello & <world>\nline2"), (69, "plain text"),
        (133, "a" * 500), (197, "tab\there & &amp; edge")]


def test_warc_roundtrip_plain_and_gzip_members():
    for gz in (False, True):
        rows = parse_warc(build_warc_file(5, DOCS, gzip_members=gz))
        assert [r[1] for r in rows] == ["warcinfo"] + ["response"] * 4
        assert rows[0][6] == len(WARCINFO_PAYLOAD)
        assert rows[0][7] == WARCINFO_PAYLOAD.decode()
        r = rows[1]
        assert r[2] == "http://h5.example.com/doc/5"
        assert r[3] == "2024-01-01T00:00:05Z"
        assert r[4] == 200 and r[5] == "text/html"
        html = r[7]
        assert html == ("<html><head><title>Doc 5</title></head>"
                        "<body><p>hello &amp; &lt;world&gt;\nline2"
                        "</p></body></html>")
        # the oracle's closed-form record length: 62 fixed HTTP-header
        # bytes + digits-of-body-length + body bytes
        hlen = len(html.encode())
        assert r[6] == 62 + len(str(hlen)) + hlen
        # rec_idx ordering is doc_id order within the file
        assert [x[0] for x in rows] == [0, 1, 2, 3, 4]


def test_warc_whole_file_gzip():
    """A single-member gzip of the entire file (legal, if
    non-splittable) parses identically to plain."""
    plain = build_warc_file(1, DOCS)
    assert parse_warc(gzip.compress(plain, mtime=0)) == parse_warc(plain)


def test_warc_framing_rejections():
    blob = bytearray(build_warc_file(1, DOCS))
    blob[0] ^= 0xFF
    with pytest.raises(ValueError, match="record header"):
        parse_warc(bytes(blob))
    # shrink a Content-Length so the trailing \r\n\r\n lands wrong
    blob = build_warc_file(1, DOCS)
    i = blob.index(b"Content-Length: ")
    j = blob.index(b"\r\n", i)
    n = int(blob[i + 16:j])
    bad = blob[:i] + b"Content-Length: %d" % (n - 1) + blob[j:]
    with pytest.raises(ValueError, match="framing"):
        parse_warc(bad)
    with pytest.raises(ValueError, match="gzip"):
        parse_warc(gzip.compress(build_warc_file(1, DOCS))[:-4])
    with pytest.raises(ValueError, match="version"):
        parse_warc(b"WARC/9.9\r\nContent-Length: 0\r\n\r\n\r\n\r\n")


def test_warc_spark_kernel_e2e(spark):
    """documents -> synth files -> parse, both container modes: same
    records, one warcinfo per file, bad file degrades to zero rows."""
    rows = [(i, f"text body {i} & <tag>", "en", "s", 20)
            for i in range(23)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long").select("doc_id", "text")
    got = {}
    for gz in (False, True):
        files = synth_warc_files(docs, n_files=4, gzip_members=gz)
        pdf = (warc_records(files).toPandas()
               .sort_values(["file_id", "rec_idx"])
               .reset_index(drop=True))
        got[gz] = pdf
        assert len(pdf) == 23 + 4
        assert (pdf[pdf.rec_idx == 0].warc_type == "warcinfo").all()
        assert (pdf[pdf.rec_idx > 0].http_status == 200).all()
    assert got[False].equals(got[True])
    # corrupt file -> a counted dropped-meta row, not a task failure
    # and never a silent zero (the r11 verdict's observability ask)
    import pyspark.sql.functions as F
    bad = spark.createDataFrame([(9,)], "file_id long").select(
        "file_id", F.lit(b"not a warc").alias("content"))
    got = warc_records(bad).collect()
    assert [(r.rec_idx, r.warc_type, r.content_length) for r in got] \
        == [(-1, "__dropped__", 1)]


HTML_CASES = [
    # (raw html, expected stripped text) — hand-computed
    ("<p>hello</p>", "hello"),
    ("<!-- <div>fake</div> --><b>x</b>", "x"),
    ("<script>if (a<b) { x=\"<p>\"; }</script>ok", "ok"),
    ("<style>p { margin:0 }</style>a  \n b", "a b"),
    ("<p>x &amp; y &lt;z&gt; &quot;q&quot;</p>", 'x & y <z> "q"'),
    ("<a href=\"/x\">l1</a><img src=\"i\"/>tail", "l1 tail"),
    # escaped-entity round-trip hazards: &amp;lt; must NOT double-decode
    ("<p>&amp;lt;</p>", "&lt;"),
]


def test_html_strip_hand_computed_both_engines(spark):
    import duckdb
    spark.conf.set("spark.sql.parser.escapedStringLiterals", "true")
    for raw, want in HTML_CASES:
        lit = "'" + raw.replace("'", "''") + "'"
        got_s = spark.sql(
            f"SELECT {H.strip_html_expr(lit, 'spark')} AS t").first().t
        got_d = duckdb.sql(
            f"SELECT {H.strip_html_expr(lit, 'duckdb')} AS t"
        ).fetchone()[0]
        assert got_s == got_d == want, (raw, got_s, got_d)


def test_entity_escape_unescape_inverse(spark):
    """unescape_entities(escape(text)) == text for hostile inputs —
    the warc_to_documents closed-form oracle's load-bearing fact."""
    spark.conf.set("spark.sql.parser.escapedStringLiterals", "true")
    for t in ["a<b>c", "&lt;", "&amp;", "&amp;lt;", "x && <<>> y",
              "plain", "&quot;q&quot;"]:
        lit = "'" + t.replace("'", "''") + "'"
        esc = (f"replace(replace(replace({lit}, '&', '&amp;'), "
               "'<', '&lt;'), '>', '&gt;')")
        got = spark.sql(
            f"SELECT {H.unescape_entities(esc)} AS t").first().t
        assert got == t, (t, got)


def test_warc_streaming_ingest_e2e(spark, tmp_path):
    """Crawl files arriving one per micro-batch: binaryFile
    readStream -> warc parse -> HTML strip -> DOCUMENTS_SCHEMA rows
    byte-exact vs the original documents, across plain AND
    gzip-member archives, with deterministic per-file epochs."""
    import gzip as _gz

    from harbourbridge_spark.pipeline.warc import build_warc_file
    from harbourbridge_spark.streaming.corpus import \
        warc_document_stream

    docs = {i: f"stream body {i} & <tag> text" for i in range(12)}
    warc_dir = tmp_path / "warc"
    warc_dir.mkdir()
    for fid in range(3):
        pairs = [(i, docs[i]) for i in range(12) if i % 3 == fid]
        blob = build_warc_file(fid, pairs, gzip_members=(fid == 1))
        ext = "warc.gz" if fid == 1 else "warc"
        (warc_dir / f"crawl-{fid}.{ext}").write_bytes(blob)

    stream = warc_document_stream(spark, str(warc_dir))
    out = (stream.writeStream.format("parquet")
           .option("path", str(tmp_path / "out"))
           .option("checkpointLocation", str(tmp_path / "ckpt"))
           .trigger(availableNow=True).start())
    out.processAllAvailable()
    out.stop()
    got = {r.doc_id: r for r in
           spark.read.parquet(str(tmp_path / "out")).collect()}
    assert len(got) == 12
    for i, text in docs.items():
        assert got[i].text == text, (i, got[i].text)
        assert got[i].source == f"h{i % 7}.example.com"


def _staged_rows(blob):
    """Sequential parse -> offset-free comparable row set."""
    return sorted(r[1:] for r in parse_warc(blob))


def test_byte_range_scan_differential(spark, tmp_path):
    """Distributed byte-range scan == sequential parse, row-identical,
    on BOTH container modes at several split counts — including an
    ADVERSARIAL payload embedding a complete well-formed WARC record
    (the false-sync a delimiter scanner would trip on: chain
    validation must reject it because the fake record chains into
    the surrounding payload's tail)."""
    from harbourbridge_spark.pipeline.warc import (
        _record, warc_records_distributed)

    # the trap's payload has NO escapable chars, so the fixture's
    # entity escaping leaves the embedded record's Content-Length
    # framing VALID — rejection must come from CHAIN validation (the
    # record parses, then the chain hits the outer payload's tail)
    fake = _record([("WARC-Type", "resource"),
                    ("WARC-Record-ID", "trap:1")],
                   b"plain trap payload with no markup").decode()
    from harbourbridge_spark.pipeline.warc import _parse_one
    esc_html = ("<p>prefix " + fake + " suffix</p>").replace(
        "&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    # sanity: inside the ESCAPED outer payload the trap still parses
    i = esc_html.encode().find(b"WARC/1.0")
    _row, _nxt = _parse_one(esc_html.encode(), i)   # must NOT raise
    docs = [(i, f"body {i} " + "x" * (i % 37)) for i in range(120)]
    docs.append((500, "prefix " + fake + " suffix"))
    for gz, name in ((False, "big.warc"), (True, "big.warc.gz")):
        blob = build_warc_file(3, docs, gzip_members=gz)
        path = tmp_path / name
        path.write_bytes(blob)
        want = _staged_rows(blob)
        for n_splits in (1, 7, 16):
            got = warc_records_distributed(spark, str(path),
                                           n_splits).collect()
            rows = sorted(tuple(r)[1:] for r in got)
            assert rows == want, (gz, n_splits, len(rows), len(want))
            offs = [r.offset for r in got]
            assert len(set(offs)) == len(offs)


def test_byte_range_scan_whole_file_gzip(spark, tmp_path):
    """A single-member whole-file gzip is non-splittable, but the
    scanner must still recover every record exactly once (range 0
    owns the one member; other ranges find no valid member)."""
    import gzip as _gz

    from harbourbridge_spark.pipeline.warc import \
        warc_records_distributed

    blob = build_warc_file(1, [(i, f"t {i}") for i in range(30)])
    path = tmp_path / "whole.warc.gz"
    path.write_bytes(_gz.compress(blob, mtime=0))
    want = _staged_rows(blob)
    got = warc_records_distributed(spark, str(path), 8).collect()
    assert sorted(tuple(r)[1:] for r in got) == want


def test_byte_range_window_truncation_retry(spark, tmp_path):
    """A tiny initial overshoot forces records/members to be cut by
    the read window: the scanner must raise for a wider window (not
    silently drop) and the runner's doubling must converge to the
    exact sequential row set — both container modes."""
    from harbourbridge_spark.pipeline.warc import \
        warc_records_distributed

    docs = [(i, "v" * 3000 + f" doc {i}") for i in range(40)]
    for gz, name in ((False, "t.warc"), (True, "t.warc.gz")):
        blob = build_warc_file(2, docs, gzip_members=gz)
        path = tmp_path / name
        path.write_bytes(blob)
        want = _staged_rows(blob)
        got = warc_records_distributed(spark, str(path), n_splits=9,
                                       overshoot0=256).collect()
        assert sorted(tuple(r)[1:] for r in got) == want, (gz,)


def test_warc_records_from_paths_matches_sequential(spark, tmp_path):
    """The direct-read file-parallel route (the 2.2x rehearsal win
    over binaryFile) reproduces the sequential parse per file, both
    container modes; unreadable paths degrade to zero rows."""
    from harbourbridge_spark.pipeline.warc import \
        warc_records_from_paths

    paths, want = [], []
    for fid in range(4):
        docs = [(fid * 50 + i, f"pp body {fid}-{i}") for i in range(9)]
        blob = build_warc_file(fid, docs, gzip_members=(fid % 2 == 1))
        p = tmp_path / f"f{fid}.warc{'.gz' if fid % 2 else ''}"
        p.write_bytes(blob)
        paths.append(str(p))
        want.extend(r[1:] for r in parse_warc(blob))
    paths.append(str(tmp_path / "missing.warc"))
    got = warc_records_from_paths(spark, paths).collect()
    meta = [r for r in got if r.rec_idx == -1]
    data = [r for r in got if r.rec_idx != -1]
    assert sorted(tuple(r)[2:] for r in data) == sorted(want)
    assert len({r.file_id for r in data}) == 4
    # the unreadable path surfaces as ONE dropped-meta row (-1 =
    # whole file unusable), never a silent zero
    assert [(r.warc_type, r.content_length) for r in meta] \
        == [("__dropped__", -1)]
