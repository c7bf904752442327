"""Physical-plan introspection — the tooling behind the engine's
scale-quality gates (SURVEY.md §4).

The reference delegates all optimization to DuckDB; here Catalyst does it,
and these helpers make the resulting plans *assertable*: tests pin the
properties that matter at 100 TB (filter pushdown into the parquet scan,
column pruning, broadcast joins for small sides, whole-stage codegen,
no accidental cartesian products) so a regression in plan shape fails CI
the same way a wrong result would.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The full explain output as a string (what ``df.explain`` prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def executed_plan(df: DataFrame) -> str:
    """Post-AQE executed plan string (runs no jobs; final plan may still
    change at runtime under AQE — use after an action for the真 final)."""
    return df._jdf.queryExecution().executedPlan().toString()


def scan_read_schema(df: DataFrame) -> list[str]:
    """Column names that reach the parquet scan (ReadSchema) — the
    column-pruning witness."""
    text = explain_str(df)
    cols: list[str] = []
    for line in text.splitlines():
        if "ReadSchema:" in line:
            schema = line.split("ReadSchema:", 1)[1]
            inner = schema[schema.find("<") + 1 : schema.rfind(">")]
            depth = 0
            field = ""
            for ch in inner:
                if ch == "<":
                    depth += 1
                elif ch == ">":
                    depth -= 1
                elif ch == "," and depth == 0:
                    cols.append(field.split(":", 1)[0])
                    field = ""
                    continue
                field += ch
            if field:
                cols.append(field.split(":", 1)[0])
    return cols


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters section of the scan (predicate-pushdown witness)."""
    text = explain_str(df)
    return "\n".join(l for l in text.splitlines() if "PushedFilters" in l)


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df, "simple")


def has_cartesian(df: DataFrame) -> bool:
    s = explain_str(df, "simple")
    return "CartesianProduct" in s


_PY_WORKER_MARKERS = (
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "PythonMapInArrow",
    "MapInArrow",
)


def has_python_worker(df: DataFrame) -> bool:
    """True if the plan spawns a Python worker (row-at-a-time UDF, Pandas
    UDF, mapInPandas/applyInPandas, ...). The hot-path operators are gated
    on this being False — Python in the plan means Arrow/pickle transfer
    and a second runtime per executor core."""
    s = explain_str(df, "simple")
    return any(marker in s for marker in _PY_WORKER_MARKERS)


def strip_cached_subtrees(text: str) -> str:
    """Plan text with every ``InMemoryRelation``'s rendered child
    removed. A cached relation renders its BUILD plan inline, but that
    plan ran once when the cache was populated — it is not this query's
    serving-time work, so gates about a query's own plan must not see
    markers from inside the cache (e.g. the sanctioned Arrow kernel
    that builds the materialized kNN graph)."""

    def depth(line: str) -> int:
        return len(line) - len(line.lstrip(" :+-*("))

    out = []
    skip_deeper_than = None
    for line in text.splitlines():
        d = depth(line)
        if skip_deeper_than is not None:
            if d > skip_deeper_than:
                continue
            skip_deeper_than = None
        out.append(line)
        if "InMemoryRelation" in line:
            skip_deeper_than = d
    return "\n".join(out)


def has_python_worker_outside_cache(df: DataFrame) -> bool:
    """:func:`has_python_worker`, ignoring cached relations' rendered
    build plans — the gate for queries SERVED from a populated cache."""
    s = strip_cached_subtrees(explain_str(df, "simple"))
    return any(marker in s for marker in _PY_WORKER_MARKERS)


def single_partition_windows(df: DataFrame) -> int:
    """Number of Window operators fed by an ``Exchange SinglePartition``
    — i.e. unpartitioned window functions, which funnel their whole input
    relation through ONE task. Over an unbounded (fact-sized) relation
    that is the canonical 100 TB scale-killer; over a provably tiny
    derived relation (bucket counts, yearly rollups) it is fine. Tests
    allowlist the sanctioned sites by query name so the class cannot
    silently reappear."""
    text = executed_plan(df)

    def depth(line: str) -> int:
        return len(line) - len(line.lstrip(" :+-*("))

    lines = text.splitlines()
    n = 0
    # Walk each Window's direct input spine: through the operators Spark
    # plans between a window and its partitioning exchange (Sort, group
    # limit, trivial projections). The first other node decides: an
    # Exchange SinglePartition there IS the window's distribution; any
    # other node (join, aggregate, another exchange) means the window is
    # partitioned and deeper single-partition exchanges belong to
    # subtrees (e.g. a scalar-aggregate broadcast branch), not to it.
    passthrough = ("Sort ", "WindowGroupLimit", "Project", "Filter")
    for i, line in enumerate(lines):
        body = line.lstrip(" :+-*(1234567890) ")
        if not (body.startswith("Window") or body.startswith("RunningWindow")):
            continue
        d = depth(line)
        for nxt in lines[i + 1 :]:
            if not nxt.strip() or depth(nxt) <= d:
                break
            nb = nxt.lstrip(" :+-*(1234567890) ")
            if nb.startswith(passthrough):
                continue
            if nb.startswith("Exchange SinglePartition"):
                n += 1
            break
    return n


def codegen_stage_count(df: DataFrame, run: bool = True) -> int:
    """Number of whole-stage-codegen spans (wider is better — more of the
    plan runs as generated JVM code). Under AQE the codegen decision lands
    only in the *final* executed plan, where codegen'd operators carry a
    ``*(N)`` prefix — so by default this executes the query first."""
    import re

    if run:
        df.collect()
    text = executed_plan(df)
    return len(set(re.findall(r"\*\((\d+)\)", text)))
