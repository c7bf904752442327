"""Property-based differential testing (hypothesis): random event tables →
run the same queries on Spark and DuckDB → exact multiset equality.

This goes beyond the reference's test strategy (SURVEY.md §5 notes it has
no property-based/differential testing) and beyond the fixed seed-42
tables: hypothesis explores degenerate shapes — empty tables, single rows,
all-one-app, duplicate timestamps, boundary metric values — where
cross-engine semantics (NULL aggregation, rounding, tie-breaks) most
often diverge."""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from spark_history_server_rs_spark.operators import catalog
from spark_history_server_rs_spark.sources.generic import load_events
from spark_history_server_rs_spark.testing import compare, open_oracle

EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]

# one shared tmp dir per test run; each example overwrites the parquet
_DIRS: dict = {}


@st.composite
def event_rows(draw):
    n = draw(st.integers(min_value=0, max_value=60))
    rows = []
    for i in range(n):
        rows.append(
            {
                "event_id": i,
                # microsecond timestamps across a few days incl. duplicates
                "ts": 1704067200_000_000
                + draw(st.integers(0, 3 * 86400)) * 1_000_000,
                "user_id": draw(st.integers(0, 5)),
                "event_type": draw(st.sampled_from(EVENT_TYPES)),
                "value": draw(
                    st.floats(
                        min_value=0.0,
                        max_value=1000.0,
                        allow_nan=False,
                        allow_infinity=False,
                    )
                ),
                "props": json.dumps(
                    {
                        "k": draw(
                            st.floats(
                                min_value=0.0,
                                max_value=100.0,
                                allow_nan=False,
                                allow_infinity=False,
                            )
                        )
                    }
                ),
            }
        )
    return rows


def _write_events(tmpdir: str, rows: list[dict]) -> None:
    table = pa.table(
        {
            "event_id": pa.array([r["event_id"] for r in rows], pa.int64()),
            "ts": pa.array([r["ts"] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r["user_id"] for r in rows], pa.int64()),
            "event_type": pa.array([r["event_type"] for r in rows], pa.string()),
            "value": pa.array([r["value"] for r in rows], pa.float64()),
            "props": pa.array([r["props"] for r in rows], pa.string()),
        }
    )
    pq.write_table(table, f"{tmpdir}/events.parquet")


CHECKED_QUERIES = [
    catalog.applications,
    catalog.cross_app_summary,
    catalog.task_distribution,
    catalog.performance_trends,
]


@pytest.fixture(scope="module")
def prop_dir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("prop-events"))


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=event_rows())
def test_random_events_match_oracle(rows, spark, prop_dir):
    import duckdb

    _write_events(prop_dir, rows)
    ev = load_events(spark, prop_dir)
    con = duckdb.connect()
    con.execute(
        f"CREATE OR REPLACE VIEW events AS "
        f"SELECT * FROM read_parquet('{prop_dir}/events.parquet')"
    )
    import __spark_entry__ as entrymod

    oracles = entrymod.oracle_sql()
    for fn, name in [
        (catalog.applications, "applications"),
        (catalog.cross_app_summary, "cross_app_summary"),
        (catalog.task_distribution, "task_distribution"),
        (catalog.performance_trends, "performance_trends"),
    ]:
        ok, report = compare(fn(ev), con, oracles[name])
        assert ok, f"{name} on {len(rows)} random rows: {report}"
    con.close()
