"""Bind the driver's generic ``events`` testdata table to the normalized model.

``TESTDATA.md`` / ``FIXTURES.md §1`` define the mapping contract: the synthetic
table (``event_id, ts, user_id, event_type, value, props``) stands in for the
Spark-event fact table (``event_id→id, ts→timestamp, user_id→app_id,
value→duration_ms, props→raw_data``), and the oracle harness parameterizes
column names. This module is that parameterization, **written once as SQL
text and rendered for both engines** (PySpark ``selectExpr`` and the DuckDB
oracle CTE), so the two sides cannot drift.

Role-flag mapping over the generic 5-value event_type domain
(click/view/purchase/signup/error):

=============== ==========================================================
role            generic predicate
=============== ==========================================================
task (TaskEnd)  ``event_type IN ('click','error')`` — 'error' = failed task
app start       ``event_type = 'view'``
app end         ``event_type = 'signup'``
executor add    ``event_type = 'purchase' AND event_id % 2 = 0``
executor remove ``event_type = 'purchase' AND event_id % 2 = 1``
success         ``event_type <> 'error'``
=============== ==========================================================

Metric bindings derive from ``value`` (the duration analog) and
``k = CAST(json($.k) AS DOUBLE)`` with fixed arithmetic chosen so every CASE
ladder in the catalog (ratings, spill branches, efficiency categories) is
exercised by the sf0.01 data.

Determinism invariant: **every metric column is an integer-valued double**
(snapped with FLOOR((x) + 0.5) at the row level, where both engines see identical
input bits). Integer-valued doubles sum exactly in IEEE arithmetic, so
SUM/AVG are independent of Spark's partial-aggregation order and the oracle's
sequential order — the root cause of cross-engine half-ulp rounding flips.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# Engine-specific spellings. Everything else below is engine-shared SQL.
# Spark reads the parquet TIMESTAMP(NANOS) column as int64 nanos (see
# session.py); DIV 1000 truncates ns→µs exactly like DuckDB's TIMESTAMP read.
_SPARK_SUBS = {
    "K": "CAST(get_json_object(props, '$.k') AS DOUBLE)",
    "TS": "timestamp_micros(ts DIV 1000)",
    "STR": "STRING",
}
_SPARK_SUBS_TSNATIVE = {
    "K": "CAST(get_json_object(props, '$.k') AS DOUBLE)",
    "TS": "CAST(ts AS TIMESTAMP)",
    "STR": "STRING",
}
_DUCKDB_SUBS = {
    "K": "CAST(json_extract_string(props, '$.k') AS DOUBLE)",
    "TS": "ts",
    "STR": "VARCHAR",
}

#: (column_name, shared SQL expression) — the single source of truth for the
#: generic→canonical binding. ``{K}``/``{TS}`` are the only per-engine parts.
_BINDINGS: list[tuple[str, str]] = [
    ("id", "event_id"),
    ("app_id", "CAST(user_id AS {STR})"),
    ("event_type", "event_type"),
    ("event_ts", "{TS}"),
    ("event_date", "CAST({TS} AS DATE)"),
    ("is_task", "event_type IN ('click','error')"),
    ("is_app_start", "event_type = 'view'"),
    ("is_app_end", "event_type = 'signup'"),
    ("is_exec_add", "event_type = 'purchase' AND event_id % 2 = 0"),
    ("is_exec_remove", "event_type = 'purchase' AND event_id % 2 = 1"),
    ("is_success", "event_type <> 'error'"),
    ("job_id", "CASE WHEN event_type IN ('click','error') THEN event_id % 25 END"),
    ("stage_id", "CASE WHEN event_type IN ('click','error') THEN event_id % 5 END"),
    ("task_id", "CASE WHEN event_type IN ('click','error') THEN event_id END"),
    ("duration_ms", "CASE WHEN event_type IN ('click','error') THEN FLOOR((value * 100.0) + 0.5) END"),
    (
        "cpu_ms",
        "CASE WHEN event_type IN ('click','error') THEN "
        "FLOOR((FLOOR((value * 100.0) + 0.5) * {K} / 100.0) + 0.5) END",
    ),
    ("gc_ms", "CASE WHEN event_type IN ('click','error') THEN {K} * 10.0 END"),
    ("peak_memory_mb", "CASE WHEN event_type IN ('click','error') THEN {K} * 50.0 END"),
    ("jvm_heap_mb", "CASE WHEN event_type IN ('click','error') THEN 1024.0 + {K} * 20.0 END"),
    (
        "mem_spill_mb",
        "CASE WHEN event_type IN ('click','error') THEN "
        "(CASE WHEN {K} > 90 THEN {K} * 5.0 ELSE 0.0 END) END",
    ),
    (
        "disk_spill_mb",
        "CASE WHEN event_type IN ('click','error') THEN "
        "(CASE WHEN {K} > 80 THEN {K} * 20.0 ELSE 0.0 END) END",
    ),
    ("input_mb", "CASE WHEN event_type IN ('click','error') THEN {K} END"),
    ("output_mb", "CASE WHEN event_type IN ('click','error') THEN {K} * 5.0 END"),
    ("shuffle_read_mb", "CASE WHEN event_type IN ('click','error') THEN {K} * 3.0 END"),
    ("shuffle_write_mb", "CASE WHEN event_type IN ('click','error') THEN {K} * 2.0 END"),
    (
        "total_cores",
        "CASE WHEN event_type IN ('click','error','purchase') THEN "
        "1.0 + (CAST(FLOOR({K}) AS BIGINT) % 8) END",
    ),
    (
        "executor_id",
        "CASE WHEN event_type IN ('click','error','purchase') THEN "
        "CAST(user_id % 10 AS {STR}) END",
    ),
    (
        "host",
        "CASE WHEN event_type IN ('click','error','purchase') THEN "
        "'host-' || CAST(user_id % 20 AS {STR}) END",
    ),
    (
        "locality",
        "CASE WHEN event_type IN ('click','error') THEN "
        "(CASE CAST(FLOOR({K}) AS BIGINT) % 4 WHEN 0 THEN 'PROCESS_LOCAL' "
        "WHEN 1 THEN 'NODE_LOCAL' WHEN 2 THEN 'RACK_LOCAL' ELSE 'ANY' END) END",
    ),
    ("raw_data", "props"),
]


def _render(subs: dict[str, str]) -> list[tuple[str, str]]:
    return [(name, expr.format(**subs)) for name, expr in _BINDINGS]


def load_events(
    spark: SparkSession, sf_dir: str, parallelism: int | None = None
) -> DataFrame:
    """Read ``{sf_dir}/events.parquet`` and normalize to EVENTS_SCHEMA columns.

    ``parallelism`` repartitions the raw scan before the (JSON-parsing)
    projection — useful when the input is a single small file that would
    otherwise normalize on one task. A real 100 TB corpus arrives as many
    files/row-groups and needs no repartition (it would be a full shuffle
    of the raw data); leave it None there.
    """
    from ..session import pin_session_conf

    pin_session_conf(spark)
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    if parallelism:
        raw = raw.repartition(parallelism)
    return normalize_events(raw)


def normalize_events(raw: DataFrame) -> DataFrame:
    """Apply the generic→canonical binding to a raw events frame —
    batch or STREAMING (the projection is stateless, so the rollup's
    streaming maintenance normalizes each micro-batch with exactly the
    code the batch path runs; dtypes are static metadata, available on
    a streaming DataFrame)."""
    ts_is_long = dict(raw.dtypes)["ts"] == "bigint"
    subs = _SPARK_SUBS if ts_is_long else _SPARK_SUBS_TSNATIVE
    exprs = [f"{expr} AS {name}" for name, expr in _render(subs)]
    return raw.selectExpr(*exprs)


def duckdb_events_cte(view: str = "events") -> str:
    """The DuckDB CTE prelude mirroring :func:`load_events` cell-for-cell.

    Every oracle SQL string for the analytics catalog starts with this, so a
    query reads ``WITH ev AS (...) SELECT ... FROM ev``.
    """
    cols = ",\n    ".join(f"{expr} AS {name}" for name, expr in _render(_DUCKDB_SUBS))
    return f"WITH ev AS (\n  SELECT\n    {cols}\n  FROM {view}\n)"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read any testdata table (region/nation/.../documents/embeddings)."""
    from ..session import pin_session_conf

    pin_session_conf(spark)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
