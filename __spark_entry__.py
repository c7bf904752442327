"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (smoke check at sf0.001).
``queries()`` — one callable per implemented operator from SURVEY.md §2.
``oracle_sql()`` — DuckDB twin for each query (t2 correctness gate).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from spark_history_server_rs_spark.operators import catalog
from spark_history_server_rs_spark.operators.oracles import ORACLE_SQL
from spark_history_server_rs_spark.sources.generic import load_events


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: A1 application listing — the minimum end-to-end slice
    (scan → normalize → group → agg → sort → limit, SURVEY.md §7 phase 0)."""
    ev = load_events(spark, "/root/testdata/sf0.001")
    return catalog.applications(ev)


def _q(fn) -> Callable[[SparkSession, str], DataFrame]:
    return lambda spark, sf_dir: fn(load_events(spark, sf_dir))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "applications": _q(catalog.applications),
        "count_events": _q(catalog.count_events),
        "resource_usage_summary": _q(catalog.resource_usage_summary),
        "executor_summary": _q(catalog.executor_summary),
        "performance_trends": _q(catalog.performance_trends),
        "gc_time_trends": _q(catalog.gc_time_trends),
        "cpu_utilization": _q(catalog.cpu_utilization),
        "memory_usage": _q(catalog.memory_usage),
        "cross_app_summary": _q(catalog.cross_app_summary),
        "task_distribution": _q(catalog.task_distribution),
        "executor_utilization": _q(catalog.executor_utilization),
        "resource_utilization_metrics": _q(catalog.resource_utilization_metrics),
        "top_resource_consumers": _q(catalog.top_resource_consumers),
        "efficiency_analysis": _q(catalog.efficiency_analysis),
        "capacity_trends": _q(catalog.capacity_trends),
        "cost_optimization": _q(catalog.cost_optimization),
        "application_info": _q(catalog.application_info),
        "task_duration_percentiles": _q(catalog.task_duration_percentiles),
        "event_search": _q(catalog.event_search),
    }


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
