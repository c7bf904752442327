"""PySpark-native analytics engine with the query and data-processing
capabilities of ``zemin-piao/spark-history-server-rs``.

The reference is an analytics-first Spark History Server: it ingests Spark
event logs (JSON-lines) into one wide fact table and answers ~20 fixed
cross-application analytics queries over it (SURVEY.md §2). This package
re-expresses that engine Spark-first:

- ``sources``   — event-log discovery/parse/normalize (scan → fact table),
                  plus the generic testdata binding used by the oracle gate.
- ``operators`` — the analytics query catalog (one implementation over the
                  normalized events model) + large-scale data-pipeline
                  operators (dedup, similarity search, text analysis,
                  multimodal columns).
- ``functions`` — shared column-expression helpers.
- ``streaming`` — incremental / Structured Streaming ingest.
- ``plans``     — plan-inspection helpers used by tests to assert pushdown,
                  broadcast, and codegen properties.
"""

__version__ = "0.1.0"
