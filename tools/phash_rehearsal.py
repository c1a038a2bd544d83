#!/usr/bin/env python
"""Volume rehearsal for the r15 perceptual-dedup family.

The oracle fixtures exercise phash at ~1.5k media rows; this drives
the SAME code (synth -> decode -> dHash -> store / asymmetric probe)
at million-media volume in the shape a real crawl ingest has: an
indexing wave builds the persisted phash store, then successive
batch waves probe it with admit=True, so the store GROWS while the
per-wave batch size stays fixed.  The claims this pins:

1. probe cost is BATCH-sized, not store-sized — wave probe times
   stay ~flat while the store grows by an indexing wave per probe;
2. the MAX_BUCKET star-degrade carries the adversarial class shape
   (every class bucket is thousands of rows deep at this volume —
   far past the 256 cap, so the star path IS the measured path);
3. verdict accounting is EXACT at volume: every batch media of wave
   w must flag, and its dup_of must be the class-min media of the
   wave-0 index (dup_of = 3 * ((media_id // 3) % 200) by
   construction) — asserted for every row, not sampled;
4. whole-run PSS stays bounded (one long-lived session spans every
   wave, so the claim covers the cumulative volume).

Usage:  python tools/phash_rehearsal.py
Env:    PHASH_WAVE_DOCS   docs per wave (default 250_000 -> 750k
                          media per wave at 3 variants/doc)
        PHASH_WAVES       total waves incl. the indexing wave
                          (default 4 -> 1M docs / 3M media total)
        REHEARSAL_MAX_PSS_GIB  gate (default 48)
        REHEARSAL_TMP     workdir root (default tempfile's)
        SPARK_GRAFT_CPUS  (default 32)

Prints one JSON line for SCALE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ingest_rehearsal import PeakSampler  # noqa: E402


def main() -> int:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from harbourbridge_spark.pipeline.multimodal import (
        phash_probe_against_store, phash_store_write, synth_media)

    wave_docs = int(os.environ.get("PHASH_WAVE_DOCS", "250000"))
    n_waves = int(os.environ.get("PHASH_WAVES", "4"))
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    max_pss_gib = float(os.environ.get("REHEARSAL_MAX_PSS_GIB", "48"))

    work = tempfile.mkdtemp(prefix="phash_rehearsal_",
                            dir=os.environ.get("REHEARSAL_TMP"))
    store = os.path.join(work, "phash_store")

    sampler = PeakSampler()
    sampler.start()
    waves = []
    try:
        spark = (SparkSession.builder.master(f"local[{cpus}]")
                 .config("spark.sql.shuffle.partitions", cpus)
                 .config("spark.ui.enabled", "false")
                 .config("spark.ui.showConsoleProgress", "false")
                 .config("spark.driver.memory", "16g")
                 # creation-time Arrow input bound (ADVICE r14)
                 .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                         "256")
                 .getOrCreate())
        spark.sparkContext.setLogLevel("ERROR")
        spark.range(64).repartition(64).mapInPandas(
            lambda it: it, "id long").count()

        def media_for(doc_lo: int, doc_hi: int):
            ids = spark.range(doc_lo, doc_hi).selectExpr(
                "explode(sequence(id * 3, id * 3 + 2)) AS media_id")
            return synth_media(ids, "image", fmt="phash")

        t_run = time.time()
        # wave 0: index — the persisted store
        t0 = time.time()
        phash_store_write(spark, media_for(0, wave_docs), store)
        index_sec = round(time.time() - t0, 1)
        store_rows = spark.read.parquet(store).count()
        assert store_rows == 3 * wave_docs, store_rows
        waves.append({"wave": 0, "kind": "index",
                      "media": 3 * wave_docs, "sec": index_sec,
                      "media_per_sec": round(3 * wave_docs / index_sec)})

        for w in range(1, n_waves):
            lo, hi = w * wave_docs, (w + 1) * wave_docs
            store_before = store_rows
            t0 = time.time()
            verdicts = phash_probe_against_store(
                spark, store, media_for(lo, hi), admit=True)
            # EXACT accounting, every row: each batch media must flag
            # with the wave-0 class-min media (3 * class)
            bad = verdicts.filter(
                F.col("dup_of")
                != (F.col("media_id") / 3).cast("long") % 200 * 3
            ).count()
            n_verd = verdicts.count()
            probe_sec = round(time.time() - t0, 1)
            assert bad == 0, f"wave {w}: {bad} wrong dup_of rows"
            assert n_verd == 3 * wave_docs, (w, n_verd)
            store_rows = spark.read.parquet(store).count()
            assert store_rows == store_before + 3 * wave_docs
            waves.append({"wave": w, "kind": "probe+admit",
                          "media": 3 * wave_docs, "sec": probe_sec,
                          "store_rows_before": store_before,
                          "media_per_sec": round(
                              3 * wave_docs / probe_sec)})

        total_sec = round(time.time() - t_run, 1)
        spark.stop()
    finally:
        sampler.stop.set()
        shutil.rmtree(work, ignore_errors=True)

    peak_pss_gib = round(sampler.peak_pss_kb / (1 << 20), 2)
    peak_rss_gib = round(sampler.peak_kb / (1 << 20), 2)
    out = {
        "metric": "phash_rehearsal",
        "docs_total": wave_docs * n_waves,
        "media_total": 3 * wave_docs * n_waves,
        "waves": waves,
        "total_sec": total_sec,
        "peak_pss_gib": peak_pss_gib,
        "peak_rss_gib": peak_rss_gib,
        "pss_gate_gib": max_pss_gib,
        "pss_ok": peak_pss_gib <= max_pss_gib,
    }
    print(json.dumps(out))
    return 0 if peak_pss_gib <= max_pss_gib else 1


if __name__ == "__main__":
    sys.exit(main())
