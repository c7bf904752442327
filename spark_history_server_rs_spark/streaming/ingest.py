"""Structured Streaming ingest — the idiomatic replacement for the
reference's poll loop (SURVEY.md §2.10).

The reference polls every ``update_interval_seconds`` and re-reads grown
files with at-least-once semantics (``main.rs:292-312``,
``event_processor.rs:239-258``). Structured Streaming's file source +
checkpoint gives exactly-once for immutable files with zero custom state;
the ``availableNow`` trigger is the batch-drain mode (process everything
new, then stop — the cron-friendly equivalent of one poll tick). Growing
``.inprogress`` files are the one case the file source cannot re-read —
those stay on the manifest path (:mod:`..sources.event_logs`).

Also provides a windowed streaming aggregate (per-app activity with
watermarked event-time windows) — the reference has no windowed/stateful
operators at all (SURVEY §2.10: "no watermarks, no event-time windows"),
so this is a beyond-reference capability, exercised by the test suite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..sources.event_logs import read_event_logs


def _normalize_stream(raw: DataFrame) -> DataFrame:
    """Reuse the batch normalization logic on a streaming DataFrame.

    ``read_event_logs`` is pure column algebra over ``spark.read.text``
    output, so the same projection applies verbatim to ``readStream`` —
    one code path for batch and streaming (the Spark-first property the
    reference's dual ingest pipelines lacked)."""
    from ..sources import event_logs as el

    # Build the projection by calling the batch builder's column logic on
    # the streaming frame: identical code path, streaming-legal operators
    # only (projections + filters).
    raw = raw.withColumnRenamed("value", "raw_data").withColumn(
        "src_file", F.input_file_name()
    )
    # Delegate: read_event_logs accepts a DataFrame-shaped entry below.
    return el._project_events(raw, streaming=True)  # type: ignore[attr-defined]


def stream_ingest(
    spark: SparkSession,
    log_glob: str,
    sink_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Exactly-once streaming ingest of (immutable) event-log files into
    the date-partitioned parquet sink. ``availableNow`` drains the backlog
    and stops; pass ``available_now=False`` for a continuous micro-batch
    daemon (the reference's poll loop, minus the duplicates)."""
    raw = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", 64)  # bound micro-batch size at scale
        .load(log_glob)
    )
    events = _normalize_stream(raw)
    writer = (
        events.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("event_date")
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="10 seconds")
    return writer.start()


def stream_app_activity(
    events: DataFrame,
    window: str = "1 minute",
    watermark: str = "5 minutes",
) -> DataFrame:
    """Beyond-reference: watermarked event-time windowed per-app activity
    (tasks + failures per app per window). Late events beyond the
    watermark are dropped — a declared late-data policy, which the
    reference lacks entirely."""
    return (
        events.withWatermark("event_ts", watermark)
        .groupBy(F.window("event_ts", window).alias("w"), F.col("app_id"))
        .agg(
            F.count("*").alias("events"),
            F.count(F.when(F.col("is_task"), 1)).alias("tasks"),
            F.count(F.when(F.col("is_task") & ~F.col("is_success"), 1)).alias(
                "failed_tasks"
            ),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "app_id",
            "events",
            "tasks",
            "failed_tasks",
        )
    )
