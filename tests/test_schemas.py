"""Schema hygiene for the driver's correctness gate: the driver compares
row counts + schemas + value hashes, so Spark outputs must not leak
DecimalType (DuckDB oracles produce DOUBLE) and every query must analyze
without execution at all scale factors."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from pyspark.sql.types import DecimalType
from tests.conftest import SF_ORACLE, SF_SMALL

QUERIES = entrymod.queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_decimal_columns_and_analyzes(name, spark):
    df = QUERIES[name](spark, SF_ORACLE)
    decimals = [
        f.name for f in df.schema.fields if isinstance(f.dataType, DecimalType)
    ]
    assert not decimals, f"{name}: DecimalType leaked into {decimals}"


def test_all_analyze_at_small_sf(spark):
    for name, fn in QUERIES.items():
        fn(spark, SF_SMALL).schema  # forces Catalyst analysis only


def test_documents_text_is_ascii():
    """Byte-vs-char contract for the multimodal operators: the Spark side
    slices UTF-8 bytes while the DuckDB oracle slices characters (this
    DuckDB build has no BLOB substring). They agree only for pure-ASCII
    text — pin that property of the synthetic corpus so any future
    non-ASCII testdata fails loudly here instead of silently diverging."""
    import duckdb

    for sf in (SF_SMALL, SF_ORACLE):
        n = duckdb.sql(
            f"SELECT COUNT(*) FROM read_parquet('{sf}/documents.parquet') "
            "WHERE strlen(text) <> length(text)"
        ).fetchone()[0]
        assert n == 0, f"{sf}: {n} non-ASCII documents"
