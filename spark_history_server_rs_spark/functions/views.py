"""Per-call unique temp views.

One shared SparkSession serves concurrent callers (the REST layer runs
under ThreadingHTTPServer), so a fixed temp-view name races between two
callers registering DIFFERENT frames — one caller silently computes over
the other's data. This helper gives every call its own name and drops it
immediately after use: ``spark.sql`` inlines the view's plan at analysis
time, so the returned DataFrame never references the catalog entry
again. Keep the subtle drop-ordering invariant here, in one place.
"""

from __future__ import annotations

import uuid
from contextlib import contextmanager

from pyspark.sql import DataFrame


@contextmanager
def scoped_temp_view(df: DataFrame, prefix: str):
    """Register ``df`` under a unique temp-view name; yield the name;
    drop the view on exit (safe once the consuming ``spark.sql`` has
    analyzed — do NOT hold the name past the with-block).

    The drop goes through ``SessionCatalog.dropTempView`` (the name
    table only), NOT the ``spark.catalog.dropTempView`` API: the API
    call also UNCACHES every cached plan the view definition matches
    (cascading in Spark 4) — and the view definition here IS the
    wrapped DataFrame's plan, so dropping a scoped view over a
    persisted frame silently unpersisted that frame. Measured fallout
    before the r14 fix: every ``_materialized_df`` derived relation
    (SimHash fingerprints, shingles, band keys, the BPE word table)
    and even caller-persisted corpus frames (the bench's ``docs`` /
    ``emb`` / ``ev``) lost their storage on the FIRST operator call
    that viewed them — every warm run recomputed fingerprint folds
    from the parquet scan (plan showed ``Scan parquet`` +
    round-robin ``Exchange`` instead of ``InMemoryTableScan``;
    ``dedup_simhash`` warm 7.3 s → 0.9 s at sf0.1 once fixed).
    Skipping the uncache is semantically safe: cache entries are keyed
    on plan equality and the data under the plan is unchanged by a
    name drop; the caches' own invalidation contracts
    (``clear_materialized_caches``, explicit ``unpersist``) are
    untouched. Falls back to the public API if the internal session
    catalog is unreachable."""
    view = f"{prefix}_{uuid.uuid4().hex}"
    df.createOrReplaceTempView(view)
    try:
        yield view
    finally:
        spark = df.sparkSession
        try:
            spark._jsparkSession.sessionState().catalog().dropTempView(view)
        except Exception:
            spark.catalog.dropTempView(view)
