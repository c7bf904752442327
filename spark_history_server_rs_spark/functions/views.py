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
    analyzed — do NOT hold the name past the with-block)."""
    view = f"{prefix}_{uuid.uuid4().hex}"
    df.createOrReplaceTempView(view)
    try:
        yield view
    finally:
        df.sparkSession.catalog.dropTempView(view)
