"""S17 metrics rollup — lifecycle + exactness suite.

The load-bearing claim: every rollup-served twin is BIT-IDENTICAL to its
raw-scan catalog sibling (two-level algebraic re-aggregation of partial
states, exact because the generic binding pins every metric to an
integer-valued double — the A9 two-level-rewrite argument). The oracle
differential in test_oracle_parity.py re-proves it against DuckDB per
session; here we pin the lifecycle: durable round-trip, streaming
maintenance (incl. at-least-once retries and restarts onto a batch
build), tombstone deletion/revive, compaction, crash orderings, and the
plans (no raw-event scan when serving, day partition pruning).
"""

from __future__ import annotations

import glob
import shutil

import pytest
from pyspark.sql import functions as F

from spark_history_server_rs_spark.operators import catalog
from spark_history_server_rs_spark.plans import inspect as I
from spark_history_server_rs_spark.sources import metrics_rollup as mr
from spark_history_server_rs_spark.sources.generic import (
    load_events,
    normalize_events,
)

SF_SMALL = "/root/testdata/sf0.001"

RAW_TWINS = {
    "performance_trends": catalog.performance_trends,
    "gc_time_trends": catalog.gc_time_trends,
    "cpu_utilization": catalog.cpu_utilization,
    "memory_usage": catalog.memory_usage,
    "top_resource_consumers": catalog.top_resource_consumers,
    "efficiency_analysis": catalog.efficiency_analysis,
    "capacity_trends": catalog.capacity_trends,
    "cost_optimization": catalog.cost_optimization,
    "applications": catalog.applications,
    "executor_summary": catalog.executor_summary,
    "executor_utilization": catalog.executor_utilization,
    "resource_utilization_metrics": catalog.resource_utilization_metrics,
    # r13: the last three raw-scan analytics (VERDICT r12 missing #2) —
    # A3 from the v2 all-events grain, A9 from task + all-events,
    # A10 from the per-stage relation
    "resource_usage_summary": catalog.resource_usage_summary,
    "cross_app_summary": catalog.cross_app_summary,
    "task_distribution": catalog.task_distribution,
}


def _rows(df):
    return [tuple(r) for r in df.collect()]


# --------------------------------------------------------------------------
# exactness: partials → twins ≡ raw scans
# --------------------------------------------------------------------------
@pytest.mark.parametrize("name", sorted(RAW_TWINS))
def test_from_partials_bit_identical(spark, name):
    ev = load_events(spark, SF_SMALL)
    raw = _rows(RAW_TWINS[name](ev))
    served = _rows(getattr(mr, f"{name}_rollup")(ev))
    assert raw == served
    assert raw  # non-vacuous


def test_registered_rollup_twins_schema(spark):
    """Registered *_rollup queries carry exactly the raw twins' column
    names and types (the driver compare sorts columns by name before
    hashing). Nullability legitimately differs — COUNT(*) is
    non-nullable while the re-aggregated SUM of counts is nullable in
    the type system (never in the data: every served group merges ≥1
    partial cell) — so the pin is on (name, dataType)."""
    ev = load_events(spark, SF_SMALL)
    for name, raw_fn in RAW_TWINS.items():
        rollup_fn = getattr(mr, f"{name}_rollup")
        assert [(f.name, f.dataType) for f in rollup_fn(ev).schema] == [
            (f.name, f.dataType) for f in raw_fn(ev).schema
        ]


# --------------------------------------------------------------------------
# durable round-trip + plans
# --------------------------------------------------------------------------
def test_rollup_disk_roundtrip_and_plans(spark, tmp_path):
    ev = load_events(spark, SF_SMALL)
    path = str(tmp_path / "rollup")
    mr.write_metrics_rollup(ev, path)
    mr.refresh_rollup_manifest(spark, path)

    for name, raw_fn in RAW_TWINS.items():
        served = getattr(mr, f"{name}_from_rollup")(spark, path)
        assert _rows(raw_fn(ev)) == _rows(served)
        # the serving plan must read ONLY the rollup relation — the
        # entire point of S17 is that no raw-event scan survives. Warm
        # serves ride the fingerprint-keyed materialized cache, so the
        # input shows as an InMemoryTableScan of the partials build
        plan = I.explain_str(served, "formatted")
        assert "events.parquet" not in plan
        assert "partials" in plan or "InMemoryTableScan" in plan

    # day filters prune partitions: the partial relation is partitioned
    # by event_date, so a dashboard's time window reads only its days.
    # Clear the materialized cache first — Spark substitutes the cached
    # serving relation into the matching subplan, which would hide the
    # parquet-level PartitionFilters this gate pins
    from spark_history_server_rs_spark.operators.dedup import (
        clear_materialized_caches,
    )

    clear_materialized_caches()
    one_day = mr.read_rollup_partials(spark, path).filter(
        F.col("event_date") == "2024-01-05"
    )
    plan = I.explain_str(one_day, "formatted")
    assert "PartitionFilters" in plan and "event_date" in plan

    # batch-built rows carry the build marker; the cell count is
    # pre-served (one row, no scans on the status path)
    p = spark.read.parquet(f"{path}/partials")
    assert p.select("ingest_batch").distinct().collect()[0][0] == -1
    n_cells = spark.read.parquet(f"{path}/counts").collect()[0]["n_cells"]
    assert n_cells == p.select(*mr.GRAIN).distinct().count()

    # manifest attests both relations (deleted_apps not yet created)
    bad = mr.validate_metrics_rollup(spark, path).filter(
        "NOT content_ok OR actual_rows IS NULL OR manifest_rows IS NULL"
    )
    assert bad.count() == 0


def test_rollup_partials_single_exchange(spark):
    """The INDEX-phase aggregation is one map-side-combined shuffle:
    partial + final HashAggregate around a single key Exchange — the
    plan that scales (combine before shuffle, cells not rows move)."""
    from spark_history_server_rs_spark.operators.dedup import (
        clear_materialized_caches,
    )

    # an earlier test's session-cached partials would otherwise replace
    # this plan's aggregate with an InMemoryTableScan
    clear_materialized_caches()
    ev = load_events(spark, SF_SMALL)
    plan = I.explain_str(mr.rollup_partials(ev), "simple")
    assert plan.count("Exchange") == 1
    assert plan.count("HashAggregate") == 2


# --------------------------------------------------------------------------
# streaming maintenance
# --------------------------------------------------------------------------
def _stream_dir_from(spark, tmp_path, halves=2):
    """Split the sf0.001 raw events into N parquet files in a flat dir
    (one file per micro-batch under maxFilesPerTrigger=1)."""
    raw = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    src = tmp_path / "ev_stream_src"
    src.mkdir(parents=True, exist_ok=True)
    for i in range(halves):
        part_dir = tmp_path / f"_half{i}"
        raw.filter(F.col("event_id") % halves == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(part_dir))
        [f] = glob.glob(str(part_dir / "part-*.parquet"))
        shutil.copy(f, src / f"batch_{i}.parquet")
    return src


def _events_stream(spark, src):
    raw = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    return normalize_events(raw)


def test_stream_rollup_maintenance(spark, tmp_path):
    """Blind per-batch partial appends across micro-batches serve the
    same answers as a batch build over everything — and the stale-count
    invariant holds (counts/ dies before the first append and is NOT
    maintained per batch)."""
    src = _stream_dir_from(spark, tmp_path)
    path = str(tmp_path / "stream_rollup")
    q = mr.stream_update_metrics_rollup(
        _events_stream(spark, src), path, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    ev = load_events(spark, SF_SMALL)
    for name, raw_fn in RAW_TWINS.items():
        assert _rows(raw_fn(ev)) == _rows(
            getattr(mr, f"{name}_from_rollup")(spark, path)
        )
    # two batches appended cells for overlapping (day, app, executor)
    # keys — the on-disk relation holds MORE rows than the cell count,
    # and serving merged them (that's the no-read-modify-write design)
    p = spark.read.parquet(f"{path}/partials")
    assert p.count() > p.select(*mr.GRAIN).distinct().count()
    assert sorted(
        r[0] for r in p.select("ingest_batch").distinct().collect()
    ) == [0, 1]
    # stream updater invalidates the pre-count and leaves it absent
    from spark_history_server_rs_spark.sources.index_manifest import (
        path_exists,
    )

    assert not path_exists(spark, f"{path}/counts")


def test_stream_onto_batch_build(spark, tmp_path):
    """Batch-build from the first half, stream the second half on top:
    serving equals the full-corpus raw twins (the incremental-ingest
    composition S9/S10 established, applied to the rollup)."""
    raw = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    ev_half = normalize_events(raw.filter(F.col("event_id") % 2 == 0))
    path = str(tmp_path / "mixed_rollup")
    mr.write_metrics_rollup(ev_half, path)

    src = _stream_dir_from(spark, tmp_path)
    # stream only the second half's file
    (src / "batch_0.parquet").unlink()
    q = mr.stream_update_metrics_rollup(
        _events_stream(spark, src), path, str(tmp_path / "ckpt2")
    )
    q.awaitTermination(120)

    ev = load_events(spark, SF_SMALL)
    assert _rows(catalog.performance_trends(ev)) == _rows(
        mr.performance_trends_from_rollup(spark, path)
    )


def test_stream_retry_idempotent_at_serve(spark, tmp_path):
    """At-least-once simulation: re-append one batch's partial rows
    verbatim (what a foreachBatch retry writes — deterministic partials
    under replayed offsets). Serving de-duplicates on
    (grain, ingest_batch), so every twin's answer is unchanged; a raw
    re-aggregation WITHOUT the key-dedup would double-count, which the
    test also asserts to keep the guard honest."""
    src = _stream_dir_from(spark, tmp_path)
    path = str(tmp_path / "retry_rollup")
    q = mr.stream_update_metrics_rollup(
        _events_stream(spark, src), path, str(tmp_path / "ckpt3")
    )
    q.awaitTermination(120)

    before = _rows(mr.gc_time_trends_from_rollup(spark, path))
    retry = spark.read.parquet(f"{path}/partials").filter(
        F.col("ingest_batch") == 0
    )
    retry.write.mode("append").partitionBy("event_date").parquet(
        f"{path}/partials"
    )
    assert _rows(mr.gc_time_trends_from_rollup(spark, path)) == before
    # the dedup is load-bearing: merging without it would double batch 0
    naive = mr.gc_time_trends_from_partials(
        spark.read.parquet(f"{path}/partials").withColumn(
            "event_date", F.col("event_date").cast("string")
        )
    )
    assert _rows(naive) != before


# --------------------------------------------------------------------------
# deletion / revive / compaction
# --------------------------------------------------------------------------
def test_delete_suppression_and_bounded_retry(spark, tmp_path):
    ev = load_events(spark, SF_SMALL)
    path = str(tmp_path / "del_rollup")
    mr.write_metrics_rollup(ev, path)

    victim = spark.createDataFrame([("3",)], "app_id string")
    assert mr.delete_from_metrics_rollup(spark, path, victim) == 1
    # retried delete appends NOTHING (bounded tombstones, ADVICE r11)
    assert mr.delete_from_metrics_rollup(spark, path, victim) == 0
    assert spark.read.parquet(f"{path}/deleted_apps").count() == 1

    ev_minus = ev.filter(F.col("app_id") != "3")
    for name, raw_fn in RAW_TWINS.items():
        assert _rows(raw_fn(ev_minus)) == _rows(
            getattr(mr, f"{name}_from_rollup")(spark, path)
        )
    # live cell count excludes the suppressed app
    n_cells = spark.read.parquet(f"{path}/counts").collect()[0]["n_cells"]
    assert n_cells == mr.read_rollup_partials(spark, path).select(
        *mr.GRAIN
    ).distinct().count()


def test_revive_on_rearrival(spark, tmp_path):
    """A tombstoned app re-arriving through the stream retires its
    tombstone (latest wins — the S13 revive shape). Not-yet-compacted
    history resurfaces with it: run compaction right after a delete
    when the intent is erasure rather than retention."""
    raw = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    ev = load_events(spark, SF_SMALL)
    path = str(tmp_path / "revive_rollup")
    mr.write_metrics_rollup(ev, path)
    mr.delete_from_metrics_rollup(
        spark, path, spark.createDataFrame([("3",)], "app_id string")
    )

    # stream a batch containing ONLY app 3's rows
    src = tmp_path / "revive_src"
    src.mkdir()
    part_dir = tmp_path / "_app3"
    raw.filter(F.col("user_id") == 3).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(part_dir))
    [f] = glob.glob(str(part_dir / "part-*.parquet"))
    shutil.copy(f, src / "batch_0.parquet")
    q = mr.stream_update_metrics_rollup(
        _events_stream(spark, src), path, str(tmp_path / "ckpt4")
    )
    q.awaitTermination(120)

    assert spark.read.parquet(f"{path}/deleted_apps").count() == 0
    # full history (batch build + streamed duplicate partials) serves;
    # the streamed cells duplicate the batch-built ones at different
    # ingest_batch, so serving MERGES them — compare against the raw
    # twin over the events union (app 3 counted twice)
    ev_doubled = ev.unionByName(
        normalize_events(raw.filter(F.col("user_id") == 3))
    )
    assert _rows(catalog.performance_trends(ev_doubled)) == _rows(
        mr.performance_trends_from_rollup(spark, path)
    )


def test_compaction_folds_and_erases(spark, tmp_path):
    """Compaction: one row per grain cell (ingest_batch=-1), suppressed
    cells physically gone, tombstones retired to an empty attestable
    set, manifest refreshed, serving unchanged."""
    src = _stream_dir_from(spark, tmp_path)
    path = str(tmp_path / "compact_rollup")
    q = mr.stream_update_metrics_rollup(
        _events_stream(spark, src), path, str(tmp_path / "ckpt5")
    )
    q.awaitTermination(120)
    mr.delete_from_metrics_rollup(
        spark, path, spark.createDataFrame([("3",)], "app_id string")
    )
    before = {
        name: _rows(getattr(mr, f"{name}_from_rollup")(spark, path))
        for name in RAW_TWINS
    }

    stats = mr.compact_metrics_rollup(spark, path)
    by_rel = {s["relation"]: s["rows_after"] for s in stats}
    assert by_rel["deleted_apps"] == 0  # tombstones retired

    p = spark.read.parquet(f"{path}/partials")
    assert p.count() == by_rel["partials"]
    assert p.count() == p.select(*mr.GRAIN).distinct().count()  # folded
    assert p.select("ingest_batch").distinct().collect()[0][0] == -1
    assert p.filter(F.col("app_id") == "3").count() == 0  # erased

    for name in RAW_TWINS:
        assert before[name] == _rows(
            getattr(mr, f"{name}_from_rollup")(spark, path)
        )
    bad = mr.validate_metrics_rollup(spark, path).filter(
        "NOT content_ok OR actual_rows IS NULL OR manifest_rows IS NULL"
    )
    assert bad.count() == 0

    # post-compaction revive starts from zero for the erased app: its
    # cells are gone, so the GDPR intent (delete + compact) holds even
    # if the app later re-arrives
    assert (
        mr.read_rollup_partials(spark, path)
        .filter(F.col("app_id") == "3").count() == 0
    )


# --------------------------------------------------------------------------
# crash orderings
# --------------------------------------------------------------------------
def test_rebuild_retires_tombstones_last(spark, tmp_path, monkeypatch):
    """A crash mid-rebuild must never resurrect a deleted app: the
    builder overwrites partials FIRST and retires tombstones LAST, so
    every crash window still serves with suppression applied (the
    ADVICE-r11 ordering, S17 edition)."""
    ev = load_events(spark, SF_SMALL)
    path = str(tmp_path / "crash_rollup")
    mr.write_metrics_rollup(ev, path)
    mr.delete_from_metrics_rollup(
        spark, path, spark.createDataFrame([("3",)], "app_id string")
    )

    calls = {"n": 0}

    def boom(*a, **k):
        calls["n"] += 1
        raise RuntimeError("crash before tombstone retirement")

    import spark_history_server_rs_spark.sources.dedup_index as di

    monkeypatch.setattr(di, "compact_relation_swap", boom)
    with pytest.raises(RuntimeError):
        mr.write_metrics_rollup(ev, path)
    assert calls["n"] == 1
    monkeypatch.undo()

    # the crash window: fresh partials on disk, tombstones still live —
    # app 3 stays suppressed (never resurrected); counts/ absent (died
    # first), so reads fall back to counting
    from spark_history_server_rs_spark.sources.index_manifest import (
        path_exists,
    )

    assert not path_exists(spark, f"{path}/counts")
    assert (
        mr.read_rollup_partials(spark, path)
        .filter(F.col("app_id") == "3").count() == 0
    )
    # the idempotent re-run clears the residual window
    mr.write_metrics_rollup(ev, path)
    assert spark.read.parquet(f"{path}/deleted_apps").count() == 0
    assert _rows(catalog.memory_usage(ev)) == _rows(
        mr.memory_usage_from_rollup(spark, path)
    )


def test_percentiles_not_servable_documented():
    """Guard the scope line: the rollup serves only algebraic twins —
    holistic aggregates (exact percentiles) must not grow a silent
    partial-served variant without a design change. FROM_PARTIALS maps
    the single-relation task-partial twins; the multi-relation twins
    (A1/A4/A12 need the app/exec relations) are covered by RAW_TWINS'
    serving-name convention instead."""
    assert set(mr.FROM_PARTIALS) == {
        "performance_trends", "gc_time_trends", "cpu_utilization",
        "memory_usage", "top_resource_consumers", "efficiency_analysis",
        "capacity_trends", "cost_optimization",
    }
    assert "task_duration_percentiles" not in mr.FROM_PARTIALS
    for name in RAW_TWINS:
        assert callable(getattr(mr, f"{name}_from_rollup"))
        assert callable(getattr(mr, f"{name}_rollup"))


# --------------------------------------------------------------------------
# replay-after-compaction (the ADVICE-r12 exactly-once closure)
# --------------------------------------------------------------------------
def test_replay_after_compaction_skipped_by_watermark(spark, tmp_path):
    """The hole the folded-batch high-watermark closes: a batch lands,
    the checkpoint commit is lost, compaction folds the rows into
    ingest_batch=-1, the restarted stream replays the batch — without
    the watermark the replay re-appends rows the serve-time
    (grain, batch) dedup can no longer recognize and every answer
    double-counts. Simulated with a fresh checkpoint over the same
    source (same batch ids, same offsets — the replay shape)."""
    src = _stream_dir_from(spark, tmp_path)
    path = str(tmp_path / "hwm_rollup")
    q = mr.stream_update_metrics_rollup(
        _events_stream(spark, src), path, str(tmp_path / "ckpt_a")
    )
    q.awaitTermination(120)
    mr.compact_metrics_rollup(spark, path)
    assert mr._read_folded_hwm(spark, path) == {
        rel: 1 for rel in mr._REL_GRAINS
    }

    # replay: fresh checkpoint re-delivers the same files as batches 0/1
    q = mr.stream_update_metrics_rollup(
        _events_stream(spark, src), path, str(tmp_path / "ckpt_b")
    )
    q.awaitTermination(120)

    p = spark.read.parquet(f"{path}/partials")
    assert sorted(
        r[0] for r in p.select("ingest_batch").distinct().collect()
    ) == [-1]  # nothing re-appended
    ev = load_events(spark, SF_SMALL)
    for name in ("performance_trends", "cross_app_summary"):
        assert _rows(RAW_TWINS[name](ev)) == _rows(
            getattr(mr, f"{name}_from_rollup")(spark, path)
        )


def test_replay_partial_batch_appends_only_missing_relations(spark, tmp_path):
    """The watermark is PER RELATION because a crashed attempt can land
    only some relations: here batch 1's partials landed (the crash
    came after that append), compaction folded them, and the replay
    must skip partials while still appending the relations batch 1
    never wrote — a batch-global skip would lose them forever."""
    src = _stream_dir_from(spark, tmp_path)
    extra = src / "batch_1.parquet"
    held_back = tmp_path / "held_batch_1.parquet"
    shutil.move(str(extra), str(held_back))

    path = str(tmp_path / "partial_rollup")
    ckpt = str(tmp_path / "ckpt_partial")
    q = mr.stream_update_metrics_rollup(_events_stream(spark, src), path, ckpt)
    q.awaitTermination(120)

    # the crashed attempt of batch 1: partials appended, everything
    # else (exec/stage/app relations) never written, checkpoint lost
    raw = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    half1 = normalize_events(raw.filter(F.col("event_id") % 2 == 1))
    mr.rollup_partials(half1).withColumn(
        "ingest_batch", F.lit(1).cast("long")
    ).repartition(F.col("event_date")).write.mode("append").partitionBy(
        "event_date"
    ).parquet(f"{path}/partials")

    mr.compact_metrics_rollup(spark, path)
    hwm = mr._read_folded_hwm(spark, path)
    assert hwm["partials"] == 1 and hwm["app_events"] == 0

    # restart delivers batch 1 (same checkpoint, file now visible)
    shutil.move(str(held_back), str(extra))
    q = mr.stream_update_metrics_rollup(_events_stream(spark, src), path, ckpt)
    q.awaitTermination(120)

    p = spark.read.parquet(f"{path}/partials")
    assert sorted(
        r[0] for r in p.select("ingest_batch").distinct().collect()
    ) == [-1]  # partials replay skipped — no double count
    a = spark.read.parquet(f"{path}/app_events")
    assert 1 in {
        r[0] for r in a.select("ingest_batch").distinct().collect()
    }  # the missing relation DID land on replay
    ev = load_events(spark, SF_SMALL)
    for name in RAW_TWINS:
        assert _rows(RAW_TWINS[name](ev)) == _rows(
            getattr(mr, f"{name}_from_rollup")(spark, path)
        )


def test_delete_erase_is_revive_proof(spark, tmp_path):
    """erase=True (the GDPR intent): tombstone + inline compaction in
    one call, so a later re-arrival revives an app whose history is
    already physically gone — only the re-arrived data serves."""
    raw = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    ev = load_events(spark, SF_SMALL)
    path = str(tmp_path / "erase_rollup")
    mr.write_metrics_rollup(ev, path)
    n = mr.delete_from_metrics_rollup(
        spark, path, spark.createDataFrame([("3",)], "app_id string"),
        erase=True,
    )
    assert n == 1
    p = spark.read.parquet(f"{path}/partials")
    assert p.filter(F.col("app_id") == "3").count() == 0  # physically gone
    assert spark.read.parquet(f"{path}/deleted_apps").count() == 0  # retired

    # app 3 re-arrives: the revive serves exactly ONE copy of the
    # streamed data (the erased history stays erased — compare against
    # the full corpus, whose app-3 rows the stream re-delivered once)
    src = tmp_path / "erase_src"
    src.mkdir()
    part_dir = tmp_path / "_app3e"
    raw.filter(F.col("user_id") == 3).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(part_dir))
    [f] = glob.glob(str(part_dir / "part-*.parquet"))
    shutil.copy(f, src / "batch_0.parquet")
    q = mr.stream_update_metrics_rollup(
        _events_stream(spark, src), path, str(tmp_path / "ckpt_e")
    )
    q.awaitTermination(120)
    assert _rows(catalog.performance_trends(ev)) == _rows(
        mr.performance_trends_from_rollup(spark, path)
    )


def test_delete_on_never_built_rollup(spark, tmp_path):
    """Deletion invoked against a path the builder never touched (the
    ADVICE-r12 edge): tombstones land, the cell count writes 0, no
    crash on the absent partials relation — for both intents."""
    path = str(tmp_path / "fresh_rollup")
    n = mr.delete_from_metrics_rollup(
        spark, path, spark.createDataFrame([("9",)], "app_id string")
    )
    assert n == 1
    assert spark.read.parquet(f"{path}/counts").collect()[0]["n_cells"] == 0

    path2 = str(tmp_path / "fresh_rollup2")
    n = mr.delete_from_metrics_rollup(
        spark, path2, spark.createDataFrame([("9",)], "app_id string"),
        erase=True,
    )
    assert n == 1
    assert spark.read.parquet(f"{path2}/counts").collect()[0]["n_cells"] == 0
