"""Differential-testing harness: Spark result vs DuckDB oracle.

Replicates (strictly) what the correctness driver does: run the Spark
DataFrame and the oracle SQL on the same parquet tables, sort columns by
name, canonicalize cells, and compare the two row multisets exactly.
"""

from __future__ import annotations

import datetime
import decimal
import math
from typing import Any

TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def open_oracle(sf_dir: str):
    """DuckDB connection with the testdata parquet files as views (the same
    pre-registration the driver does)."""
    import duckdb

    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def canon_cell(v: Any) -> str:
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        if v == 0.0:
            return "f:0.0"  # normalize -0.0
        return f"f:{v!r}"
    if isinstance(v, decimal.Decimal):
        return canon_cell(float(v))
    if isinstance(v, datetime.datetime):
        return f"t:{v.replace(tzinfo=None).isoformat()}"
    if isinstance(v, datetime.date):
        return f"t:{v.isoformat()}"
    if isinstance(v, (list, tuple)):
        return "l:[" + ",".join(canon_cell(x) for x in v) + "]"
    return f"s:{v}"


def canon_rows(columns: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(canon_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def compare(spark_df, con, sql: str) -> tuple[bool, str]:
    """Return (ok, report). Exact multiset equality after canonicalization."""
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    cur = con.execute(sql)
    d_cols = [d[0] for d in cur.description]
    d_rows = cur.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"

    sc = canon_rows(s_cols, s_rows)
    dc = canon_rows(d_cols, d_rows)
    if sc == dc:
        return True, f"OK ({len(s_rows)} rows)"

    diffs = []
    sset, dset = set(sc), set(dc)
    cols_sorted = sorted(s_cols)
    for r in list(sset - dset)[:3]:
        diffs.append(f"  spark-only:  {dict(zip(cols_sorted, r))}")
    for r in list(dset - sset)[:3]:
        diffs.append(f"  duckdb-only: {dict(zip(cols_sorted, r))}")
    return False, "value mismatch:\n" + "\n".join(diffs)
