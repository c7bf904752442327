"""The normalized events model — the engine's single wide fact table.

The reference stores one DuckDB table ``events`` with 4 "hot" typed columns
and re-parses JSON at query time (reference ``src/storage/duckdb_store.rs:141-163``,
``duckdb_store_backup.rs:331-342``). Per SURVEY.md §4 we normalize further:
*every* metric any catalog query touches is extracted once at ingest into a
typed column, so no query-time JSON parsing remains and Catalyst can prune
columns / push predicates all the way into the parquet scan.

Two sources produce this exact schema:

- :mod:`..sources.event_logs`  — real Spark event-log JSON lines.
- :mod:`..sources.generic`     — the driver's synthetic ``events`` table
  (``TESTDATA.md``), used by the DuckDB-oracle correctness gate.

Boolean role flags (``is_task`` …) abstract over the event-type vocabulary so
the catalog is written once: real logs set them from ``SparkListener*`` types
(reference ``src/spark_events.rs:21-97``), the generic binding from its own
5-value domain (see ``sources/generic.py``).
"""

from __future__ import annotations

from pyspark.sql.types import (
    BooleanType,
    DateType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: Canonical normalized schema. Metric columns are nullable doubles in MB/ms
#: units (the reference's queries all divide bytes to MB/GB at query time;
#: normalizing the unit at ingest keeps every expression a plain arithmetic
#: column op). ``raw_data`` keeps the original JSON line for schema-on-read
#: of fields we did not normalize (reference keeps it too,
#: ``duckdb_store.rs:148``).
EVENTS_SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("app_id", StringType(), False),
        StructField("event_type", StringType(), False),
        StructField("event_ts", TimestampType(), False),
        StructField("event_date", DateType(), False),
        # role flags (derived from event_type once at ingest)
        StructField("is_task", BooleanType(), False),
        StructField("is_app_start", BooleanType(), False),
        StructField("is_app_end", BooleanType(), False),
        StructField("is_exec_add", BooleanType(), False),
        StructField("is_exec_remove", BooleanType(), False),
        StructField("is_success", BooleanType(), False),
        # hot ids
        StructField("job_id", LongType(), True),
        StructField("stage_id", LongType(), True),
        StructField("task_id", LongType(), True),
        # task metrics (TaskEnd rows; reference JSON paths in SURVEY §2.8)
        StructField("duration_ms", DoubleType(), True),
        StructField("cpu_ms", DoubleType(), True),
        StructField("gc_ms", DoubleType(), True),
        StructField("peak_memory_mb", DoubleType(), True),
        StructField("jvm_heap_mb", DoubleType(), True),
        StructField("mem_spill_mb", DoubleType(), True),
        StructField("disk_spill_mb", DoubleType(), True),
        StructField("input_mb", DoubleType(), True),
        StructField("output_mb", DoubleType(), True),
        StructField("shuffle_read_mb", DoubleType(), True),
        StructField("shuffle_write_mb", DoubleType(), True),
        StructField("total_cores", DoubleType(), True),
        # placement
        StructField("executor_id", StringType(), True),
        StructField("host", StringType(), True),
        StructField("locality", StringType(), True),
        # original payload
        StructField("raw_data", StringType(), True),
    ]
)

#: Columns every catalog query may assume exist.
CANONICAL_COLUMNS = [f.name for f in EVENTS_SCHEMA.fields]
