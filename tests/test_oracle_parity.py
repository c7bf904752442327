"""Differential test: every declared query vs its DuckDB oracle at sf0.01.

This mirrors the driver's t2 correctness gate (BASELINE.json): identical
column sets, row counts, and canonicalized value multisets.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from spark_history_server_rs_spark.testing import compare
from tests.conftest import SF_ORACLE

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def test_every_query_has_oracle_or_is_declared():
    missing = [k for k in QUERIES if k not in ORACLES]
    # non-SQL-expressible ops may omit an oracle; keep the list explicit
    allowed_missing: set[str] = {
        # engine-specific mergeable sketch; tolerance-pinned against the
        # exact percentile variant instead (tests/test_plans.py)
        "task_duration_percentiles_approx",
    }
    assert set(missing) <= allowed_missing


@pytest.mark.parametrize("name", sorted(k for k in QUERIES if k in ORACLES))
def test_query_matches_oracle(name, spark, oracle):
    df = QUERIES[name](spark, SF_ORACLE)
    ok, report = compare(df, oracle, ORACLES[name])
    assert ok, f"{name}: {report}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert "app_id" in df.columns
