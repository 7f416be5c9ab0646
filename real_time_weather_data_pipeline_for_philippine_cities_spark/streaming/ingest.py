"""Structured Streaming shell (SURVEY.md §2.9, §7.5).

The reference's "real time" is periodic batch re-execution via Task
Scheduler (README.md:24-25) with an xlsx snapshot as inter-run state. The
genuine streaming equivalents:

  scheduled batch run       → trigger(availableNow=True) per invocation
                              (or processingTime for a resident stream)
  xlsx snapshot state       → checkpointed sink + snapshot parquet table
                              re-read per foreachBatch epoch
  outer-merge change diff   → anti-join against the snapshot inside
                              foreachBatch (deterministic, oracle-testable
                              — chosen over dropDuplicates state per
                              SURVEY.md §7.7.5)
  insert-whatever-arrives   → append output mode; watermark bounds late
                              data (an improvement the reference lacks,
                              wdf.py:296-330)

Every transformation is the SAME batch function from plans/ — foreachBatch
reuses the tested batch plan verbatim, so streaming correctness reduces to
batch correctness plus delivery semantics.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

from ..session import materialize


def stream_observations(
    spark: SparkSession,
    landing_dir: str,
    schema: StructType,
    event_time_col: str = "data_datetime",
    watermark: str = "1 hour",
    fmt: str = "json",
) -> DataFrame:
    """readStream on a landing directory of API-snapshot files.

    Explicit schema always (streaming sources cannot infer; PSGC-style code
    strings must never be inferred anyway — SURVEY.md §1.3). The watermark
    bounds state for downstream windowed aggregates.
    """
    reader = spark.readStream.format(fmt).schema(schema)
    return reader.load(landing_dir).withWatermark(event_time_col, watermark)


def foreach_batch_pipeline(
    batch_transform: Callable[[DataFrame], DataFrame],
    sink_path: str,
    mode: str = "append",
) -> Callable[[DataFrame, int], None]:
    """Wrap a tested batch transform as a foreachBatch epoch function.

    Exactly-once per epoch comes from the checkpoint + idempotent parquet
    append (Structured Streaming replays an epoch only wholesale).
    """

    def run(batch_df: DataFrame, epoch_id: int) -> None:
        out = batch_transform(batch_df).withColumn("epoch_id", F.lit(epoch_id))
        out.write.mode(mode).parquet(sink_path)

    return run


def run_available_now(
    stream_df: DataFrame,
    epoch_fn: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
) -> StreamingQuery:
    """One incremental pass over whatever has landed — the streaming twin
    of the reference's scheduled batch run."""
    return (
        stream_df.writeStream.foreachBatch(epoch_fn)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def foreach_batch_change_detect(
    spark: SparkSession,
    key_cols: tuple[str, ...],
    snapshot_path: str,
    novel_sink_path: str,
) -> Callable[[DataFrame, int], None]:
    """§2.9: the reference's xlsx-diff state machine as a streaming epoch.

    Per epoch: anti-join the micro-batch against the persisted snapshot
    (rows whose key tuple is already known are dropped), append the novel
    rows to the sink, and fold them into the snapshot. This is the
    deterministic, oracle-testable alternative to ``dropDuplicates`` state
    chosen in SURVEY.md §7.7.5 — snapshot state lives in a parquet table,
    not an opaque state store, so it survives checkpoint loss, is
    inspectable, and is bounded by |distinct keys| regardless of stream
    length.

    The anti-join shuffles only the micro-batch (small) against the
    snapshot scan; at scale the snapshot side prunes to the join keys via
    column pruning, and a date/bucket layout on ``snapshot_path`` keeps
    the scan incremental.

    Snapshot durability (round 7, aligned with operators/promote): the
    epoch resolves the snapshot by its COMMIT MARKER, never by "the read
    happened to work" — a half-written snapshot left by a crashed epoch
    must not be mistaken for the first epoch (which would re-emit every
    known key as novel on replay). ``recover`` first completes any
    interrupted promote (the committed ``_next`` IS the state), then the
    epoch writes the folded snapshot ONCE to ``_next`` and promotes it
    with two O(1) directory renames — no second data write, the same
    protocol as the SCD2 dimension merge.
    """

    def run(batch_df: DataFrame, epoch_id: int) -> None:
        from ..operators.promote import committed, promote, recover

        recover(snapshot_path)
        batch_keys = batch_df.dropDuplicates(list(key_cols))
        if committed(snapshot_path):
            snapshot = spark.read.parquet(snapshot_path).select(*key_cols)
            novel = batch_keys.join(snapshot, list(key_cols), "left_anti")
        else:
            # First epoch: no committed snapshot anywhere — everything is
            # novel (wdf.py:392-396, the no-prior-xlsx branch).
            novel = batch_keys
        # Materialize before the snapshot promote invalidates the plan's
        # source; novel batches are micro-batch-sized by construction.
        novel = novel.transform(materialize)
        novel.withColumn("epoch_id", F.lit(epoch_id)).write.mode("append").parquet(
            novel_sink_path
        )
        merged = novel.select(*key_cols)
        if committed(snapshot_path):
            merged = spark.read.parquet(snapshot_path).select(*key_cols).unionByName(merged)
        merged.dropDuplicates(list(key_cols)).write.mode("overwrite").parquet(
            snapshot_path + "_next"
        )
        promote(snapshot_path)

    return run


def foreach_batch_jdbc(
    table: str,
    options: dict[str, str],
    *,
    batchsize: int = 10_000,
    num_partitions: int = 32,
) -> Callable[[DataFrame, int], None]:
    """Stream → RDBMS epoch function: append each micro-batch to a JDBC
    fact table (the streaming twin of the reference's per-run INSERT loop,
    wdf.py:296-330, via sinks/jdbc.append_fact_jdbc).

    Exactly-once across epoch REPLAYS: plain JDBC append is not
    transactional with the checkpoint, so a crash between the DB commit
    and the checkpoint commit would re-run the epoch and double-insert.
    Every row carries ``epoch_id`` and the epoch function consults the
    table's max committed epoch first — a replayed epoch (id <= committed
    high-water mark) is skipped wholesale. One scalar query per epoch
    (`SELECT max(epoch_id)` pushed down to the DB), no driver-side data.

    Failure honesty: the absent-table probe catches any error (dialects
    disagree on their "no such table" signal), so a TRANSIENT failure of
    the high-water-mark query on an existing table degrades that one
    epoch to at-least-once. Deduplicate on (epoch_id, business key)
    downstream if the target table cannot tolerate that.
    """
    from ..sinks.jdbc import append_fact_jdbc, read_jdbc

    def run(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        try:
            # ANSI-quoted column: Spark quotes identifiers when it creates
            # the table, so unquoted epoch_id would upcase and miss on
            # case-sensitive dialects (Derby); double quotes are ANSI and
            # MSSQL honours them under its default QUOTED_IDENTIFIER ON.
            committed = (
                read_jdbc(
                    spark, f'(SELECT max("epoch_id") AS m FROM {table}) hw', options
                ).collect()[0][0]
            )
        except Exception:
            committed = None  # table absent: first epoch creates it
        if committed is not None and epoch_id <= committed:
            return  # replayed epoch — already in the DB
        out = batch_df.withColumn("epoch_id", F.lit(epoch_id))
        append_fact_jdbc(
            out, table, options, batchsize=batchsize, num_partitions=num_partitions
        )

    return run
