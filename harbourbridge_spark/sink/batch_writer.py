"""Batched, error-isolating writer (K1/K2).

Re-expresses the reference's BatchWriter
(/root/reference/spanner/batchwriter.go) in Spark's execution model:

- the reference buffers rows on one machine and cuts batches at 10,000
  mutations / 20 MB (batchwriter.go:35-38), running <=40 concurrent
  async writes (conversion/conversion.go:92-97). In Spark, *task
  parallelism replaces the async write pool*: each partition runs the
  same batching loop independently, so total in-flight writes =
  number of concurrent tasks (bounded by executor slots, not a
  hand-rolled semaphore).
- error isolation keeps the reference's retry-splitting semantics
  (doWriteAndHandleErrors, batchwriter.go:248-280): a failing batch is
  split into 10 sub-batches, recursing down to single rows so only the
  truly-bad rows are dropped; a per-writer retry budget bounds work.
- dropped-row counts and samples surface through Spark accumulators
  (the analogue of droppedRowsFirstN / stats counters,
  batchwriter.go:217-244).

The write target is any picklable callable ``write(rows) -> None``
that raises on failure — the same injection seam the reference's tests
use (batchwriter_test.go:32-234).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame

# Thresholds mirror spanner/batchwriter.go:35-38 (Spanner hard limits
# are 20,000 mutations / 100 MB per op; we cut at half / a fifth).
DEFAULT_COUNT_THRESHOLD = 10_000
DEFAULT_BYTE_THRESHOLD = 20 * 1024 * 1024
DEFAULT_RETRY_LIMIT = 1_000
SPLIT_FACTOR = 10  # split failing batches into 10 sub-batches


@dataclass
class BatchWriterConfig:
    count_threshold: int = DEFAULT_COUNT_THRESHOLD
    byte_threshold: int = DEFAULT_BYTE_THRESHOLD
    retry_limit: int = DEFAULT_RETRY_LIMIT


MAX_DROP_SAMPLES = 100      # first-N dropped-row samples (the writer
                            # analogue of droppedRowsFirstN / K7's cap)


@dataclass
class WriteStats:
    batches: int
    rows_written: int
    rows_dropped: int
    retries: int
    dropped_samples: list = None


def _row_bytes(row) -> int:
    # cheap byte estimate, mirroring the reference's rowSize accounting
    n = 0
    for v in row:
        if v is None:
            continue
        if isinstance(v, (bytes, bytearray, str)):
            n += len(v)
        else:
            n += 8
    return n


def write_with_batching(df: DataFrame,
                        write: Callable[[list], None],
                        config: Optional[BatchWriterConfig] = None
                        ) -> WriteStats:
    """Run the batching+bisection write over every partition of ``df``.

    ``write`` executes on executors; it must be picklable and
    idempotent-enough for retries (the reference assumes insert
    semantics where duplicate writes surface AlreadyExists,
    batchwriter.go:98-140).
    """
    from pyspark.accumulators import AccumulatorParam

    class _SampleAcc(AccumulatorParam):
        def zero(self, v):
            return []

        def addInPlace(self, a, b):
            if len(a) < MAX_DROP_SAMPLES:
                a.extend(b[:MAX_DROP_SAMPLES - len(a)])
            return a

    cfg = config or BatchWriterConfig()
    sc = df.sparkSession.sparkContext
    acc_batches = sc.accumulator(0)
    acc_written = sc.accumulator(0)
    acc_dropped = sc.accumulator(0)
    acc_retries = sc.accumulator(0)
    acc_samples = sc.accumulator([], _SampleAcc())

    count_threshold = cfg.count_threshold
    byte_threshold = cfg.byte_threshold
    retry_limit = cfg.retry_limit

    def handle_partition(rows_iter) -> None:
        budget = [retry_limit]

        def write_and_handle(rows: list) -> None:
            """batchwriter.go:248-280: try the batch; on failure split
            into SPLIT_FACTOR sub-batches and recurse; single failing
            rows are dropped (counted)."""
            if not rows:
                return
            try:
                write(rows)
                acc_batches.add(1)
                acc_written.add(len(rows))
                return
            except Exception:
                pass
            if len(rows) == 1 or budget[0] <= 0:
                acc_dropped.add(len(rows))
                acc_samples.add(
                    [tuple(r) for r in rows[:MAX_DROP_SAMPLES]])
                return
            step = max(1, (len(rows) + SPLIT_FACTOR - 1) // SPLIT_FACTOR)
            for i in range(0, len(rows), step):
                budget[0] -= 1
                acc_retries.add(1)
                write_and_handle(rows[i:i + step])

        batch: list = []
        nbytes = 0
        for row in rows_iter:
            batch.append(row)
            nbytes += _row_bytes(row)
            if len(batch) >= count_threshold or nbytes >= byte_threshold:
                write_and_handle(batch)
                batch, nbytes = [], 0
        write_and_handle(batch)

    df.foreachPartition(handle_partition)
    return WriteStats(batches=acc_batches.value,
                      rows_written=acc_written.value,
                      rows_dropped=acc_dropped.value,
                      retries=acc_retries.value,
                      dropped_samples=acc_samples.value)
