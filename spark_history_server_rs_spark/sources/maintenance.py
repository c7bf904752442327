"""The periodic maintenance slot — one call that services every durable
artifact this engine writes.

Each durable surface ships with the same production arc: streaming
appends are at-least-once, a compactor is the exactly-once repair, and
an integrity manifest attests what is on disk. Deployments run those in
one closed-date slot (no concurrent writers); this module is that slot,
so operators cron ONE entry point instead of remembering three
compactors and three manifest refreshes in the right order:

- dedup index (S13):  ``compact_dedup_index`` → manifest → validator
- ANN index (S14):    ``compact_ann_index``   → manifest → validator
- training shards (S15): ``compact_training_shards`` (refreshes its own
  manifest) → validator
- kNN graph (S16):    ``compact_knn_graph``   → manifest → validator

Per artifact the slot returns ``{artifact, compaction, valid,
discrepancies}``; ``valid`` is the validator verdict AFTER compaction +
refresh, so a False here means corruption the slot could not repair
(vanished partitions, bit rot) — re-derive the artifact. Artifacts not
attached (path=None) are skipped.

Run it with writers quiesced, exactly like each compactor documents
individually — the delete→rename swap windows are theirs, unchanged.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def run_retention_pass(
    spark: SparkSession,
    losers,
    dedup_index_path: str | None = None,
    ann_index_path: str | None = None,
    knn_graph_path: str | None = None,
    training_shards_path: str | None = None,
) -> dict:
    """The dedup-driven retention step — the reason the index deletion
    APIs exist: after a dedup decision drops documents from the corpus,
    every durable index must forget them too, or serving twins refuse
    (coverage counts drift) and recall evals quietly measure against
    ghosts. ``losers`` is a ``(doc_id)`` frame — typically
    ``operators.corpus.dedup_retention_ids`` (the C7 keep rule's drop
    side), but any retention decision (TTL, GDPR erasure, expired
    crawl) fits the same contract. For the vector indexes the same ids
    are the ``vec_id`` key (the shared id space the testdata models:
    a document's embedding row carries its doc_id).

    Each attached artifact takes its family's delete: S13 tombstone
    suppression, S14 sequenced tombstones, S16 eager adjacency repair,
    S15 partition-pruned shard rewrite (shard membership is a pure
    function of doc_id, so only the shards actually holding retracted
    docs rewrite) — every one exact, every one crash-safe per its own
    contract. Run
    this BEFORE :func:`run_maintenance_slot` in the same quiesced
    slot, so the compactors materialize the deletions and retire the
    tombstones in one pass. Returns per-index deletion stats."""
    from concurrent.futures import ThreadPoolExecutor

    losers = losers.select("doc_id").distinct().persist()
    try:
        out: dict = {"n_losers": losers.count()}
        vec_ids = losers.selectExpr("doc_id AS vec_id")
        # The four families touch four DISJOINT durable paths and share
        # only the persisted loser frame (read-only), so their deletes
        # are independent jobs — run them overlapped (guide §2.6) so one
        # family's straggler tail back-fills with another family's
        # tasks instead of idling the cluster between sequential passes
        # (measured: the sequential pass left most cores idle during
        # each family's planning/verify scans). Each family keeps its
        # own crash contract unchanged; a crash mid-pass now leaves an
        # arbitrary subset (not a prefix) of families deleted, which the
        # same idempotent re-run repairs — ``dead`` recomputes from what
        # is still stored in every family.
        tasks: list[tuple[str, object]] = []
        if dedup_index_path is not None:
            from .dedup_index import delete_from_dedup_index

            tasks.append((
                "dedup_index_deleted",
                lambda: delete_from_dedup_index(
                    spark, dedup_index_path, losers
                ),
            ))
        if ann_index_path is not None:
            from .ann_index import delete_from_ann_index

            tasks.append((
                "ann_index_deleted",
                lambda: delete_from_ann_index(spark, ann_index_path, vec_ids),
            ))
        if knn_graph_path is not None:
            from .knn_graph import delete_from_knn_graph

            tasks.append((
                "knn_graph",
                lambda: delete_from_knn_graph(spark, knn_graph_path, vec_ids),
            ))
        if training_shards_path is not None:
            from .training_shards import retract_from_training_shards

            tasks.append((
                "training_shards",
                lambda: retract_from_training_shards(
                    spark, training_shards_path, losers
                ),
            ))
        if tasks:
            with ThreadPoolExecutor(max_workers=len(tasks)) as pool:
                futures = [(key, pool.submit(fn)) for key, fn in tasks]
                errs = []
                for key, fut in futures:
                    try:
                        out[key] = fut.result()
                    except Exception as exc:  # noqa: BLE001 — re-raised below
                        errs.append(exc)
                if errs:
                    # fail like the sequential pass did: the first
                    # family's error propagates (others completed or
                    # failed independently; the retry is idempotent)
                    raise errs[0]
    finally:
        losers.unpersist()
    return out


def retention_losers(docs, predicate: str):
    """Derive a retention loser frame from a PREDICATE over the corpus
    — the age/TTL rider on :func:`run_retention_pass` (reference
    analog: the metadata store pruning files that vanished or aged
    out, ``metadata_store.rs:91-134``). ``predicate`` is any SQL
    boolean over the docs columns selecting the rows to FORGET, e.g.
    ``"crawl_ts < timestamp'2026-01-01'"`` or ``"source = 'expired'"``.
    Returns the ``(doc_id)`` frame every index deletion API takes; the
    filter is a pushed-down scan predicate, so at 100 TB the cost is
    one pruned column scan — no join, no shuffle beyond the distinct
    the retention pass itself applies."""
    return docs.where(predicate).select("doc_id")


def run_ttl_retention(
    spark: SparkSession,
    docs,
    predicate: str,
    **index_paths,
) -> dict:
    """Predicate-derived retention across every attached durable
    artifact: compose :func:`retention_losers` with
    :func:`run_retention_pass`. ``index_paths`` forwards the same
    ``dedup_index_path`` / ``ann_index_path`` / ``knn_graph_path`` /
    ``training_shards_path`` keywords."""
    return run_retention_pass(
        spark, retention_losers(docs, predicate), **index_paths
    )


def run_app_retention(
    spark: SparkSession,
    app_ids,
    events_sink_dir: str | None = None,
    metrics_rollup_path: str | None = None,
    erase: bool = False,
) -> dict:
    """The APPLICATION-keyed retention pass — the events-domain sibling
    of the document-keyed :func:`run_retention_pass`. One ``(app_id)``
    frame fans to both halves of the fact-table lineage: the S9 sink
    (partition-pruned physical erasure,
    ``event_logs.erase_apps_from_sink`` — fail-loud verified) and the
    S17 metrics rollup. Run it in the quiesced slot, before
    :func:`run_maintenance_slot`, exactly like the document pass.
    Returns per-artifact stats.

    The ``erase`` intent (ADVICE r12): with the default False, the
    rollup half is a TOMBSTONE — durable only until the app re-arrives
    through the stream, whose revive retires the tombstone and
    resurrects all not-yet-compacted history. That window closes at the
    next :func:`run_maintenance_slot` (its compaction drops the cells);
    run the slot in the same quiesced window, as documented above, and
    the pending erasure never meets a re-arrival. For GDPR-grade calls
    that cannot rely on the slot following, pass ``erase=True``: the
    rollup delete runs S17 compaction inline, matching the sink half's
    physical erasure in the same call (note a retried erase=True pass
    re-tombstones the now-cell-less app — data-idempotent, but
    ``metrics_rollup_deleted`` reports the re-append, unlike the
    tombstone path's strict retry-zeros)."""
    app_ids = app_ids.where("app_id IS NOT NULL").select("app_id").distinct()
    app_ids = app_ids.persist()
    try:
        out: dict = {"n_apps": app_ids.count()}
        if events_sink_dir is not None:
            from .event_logs import erase_apps_from_sink

            out["events_sink"] = erase_apps_from_sink(
                spark, events_sink_dir, app_ids
            )
        if metrics_rollup_path is not None:
            from .metrics_rollup import delete_from_metrics_rollup

            out["metrics_rollup_deleted"] = delete_from_metrics_rollup(
                spark, metrics_rollup_path, app_ids, erase=erase
            )
    finally:
        app_ids.unpersist()
    return out


def aged_app_ids(
    spark: SparkSession, metrics_rollup_path: str, cutoff_date: str
):
    """Derive the app-grain TTL loser frame FROM THE ROLLUP: apps whose
    entire history predates ``cutoff_date`` ('yyyy-MM-dd') — that is,
    ``max(event_date) < cutoff`` over the all-events cells. The
    events-domain analog of :func:`retention_losers`, and the Spark
    shape of the reference pruning applications whose logs vanished or
    aged out (``metadata_store.rs:91-134``).

    Reading the ROLLUP rather than the sink is the point at 100 TB:
    the candidate set comes from a cells-sized relation (one bounded
    groupBy), not a fact-table scan; the sink is then touched only for
    the partition-pruned erasure of the apps that actually aged out.
    Tombstone suppression is already applied by the serving read, so
    previously-erased apps never re-derive."""
    from pyspark.sql import functions as F

    from .metrics_rollup import materialized_rollup_relation

    app_p = materialized_rollup_relation(
        spark, metrics_rollup_path, "app_events"
    )
    return (
        app_p.groupBy("app_id")
        .agg(F.max("event_date").alias("last_day"))
        .filter(F.col("last_day") < cutoff_date)
        .select("app_id")
    )


def run_app_ttl_retention(
    spark: SparkSession,
    metrics_rollup_path: str,
    cutoff_date: str,
    events_sink_dir: str | None = None,
    erase: bool = True,
) -> dict:
    """Age-driven application retention in one call: derive the aged
    app set from the rollup (:func:`aged_app_ids`), then fan it to the
    sink + rollup erasure (:func:`run_app_retention`). Idempotent by
    construction — after the pass the aged apps are gone from the
    rollup, so a retry derives an empty set and returns ``n_apps=0``."""
    return run_app_retention(
        spark,
        aged_app_ids(spark, metrics_rollup_path, cutoff_date),
        events_sink_dir=events_sink_dir,
        metrics_rollup_path=metrics_rollup_path,
        erase=erase,
    )


def run_maintenance_slot(
    spark: SparkSession,
    dedup_index_path: str | None = None,
    ann_index_path: str | None = None,
    training_shards_path: str | None = None,
    knn_graph_path: str | None = None,
    metrics_rollup_path: str | None = None,
) -> list[dict]:
    """Service every attached durable artifact: compact, refresh its
    manifest, validate. Returns one report dict per artifact."""
    from .ann_index import (
        compact_ann_index,
        refresh_ann_index_manifest,
        validate_ann_index,
    )
    from .dedup_index import (
        compact_dedup_index,
        refresh_dedup_index_manifest,
        validate_dedup_index,
    )
    from .knn_graph import (
        compact_knn_graph,
        refresh_knn_graph_manifest,
        validate_knn_graph,
    )
    from .training_shards import (
        compact_training_shards,
        validate_training_shards,
    )

    from concurrent.futures import ThreadPoolExecutor

    # each family's compact→refresh→validate chain stays strictly
    # ordered WITHIN the family, but the five families touch five
    # disjoint artifact paths — overlap them across families (guide
    # §2.6, the run_retention_pass pattern) so the slot's wall clock
    # approaches the slowest family instead of the sum of all five
    slots: list[tuple] = []

    def _entry(artifact, compaction, refresh, validate):
        slots.append((artifact, compaction, refresh, validate))

    def _run(entry) -> dict:
        artifact, compaction, refresh, validate = entry
        stats = compaction()
        if refresh is not None:
            # unconditional: the slot's contract is to LEAVE attested
            # state, even for a layout that never had a manifest (the
            # compactors alone only refresh an existing one)
            refresh()
        disc = [r.asDict() for r in validate().collect()]
        return {
            "artifact": artifact,
            "compaction": stats,
            "valid": not disc,
            "discrepancies": disc,
        }

    if dedup_index_path is not None:
        _entry(
            "dedup_index",
            lambda: compact_dedup_index(spark, dedup_index_path),
            lambda: refresh_dedup_index_manifest(spark, dedup_index_path),
            lambda: validate_dedup_index(spark, dedup_index_path),
        )
    if ann_index_path is not None:
        _entry(
            "ann_index",
            lambda: compact_ann_index(spark, ann_index_path),
            lambda: refresh_ann_index_manifest(spark, ann_index_path),
            lambda: validate_ann_index(spark, ann_index_path),
        )
    if training_shards_path is not None:
        _entry(
            "training_shards",
            lambda: compact_training_shards(spark, training_shards_path),
            None,  # its compactor refreshes the shard manifest itself
            lambda: validate_training_shards(spark, training_shards_path),
        )
    if knn_graph_path is not None:
        _entry(
            "knn_graph",
            lambda: compact_knn_graph(spark, knn_graph_path),
            lambda: refresh_knn_graph_manifest(spark, knn_graph_path),
            lambda: validate_knn_graph(spark, knn_graph_path),
        )
    if metrics_rollup_path is not None:
        from .metrics_rollup import (
            compact_metrics_rollup,
            validate_metrics_rollup,
        )

        _entry(
            "metrics_rollup",
            lambda: compact_metrics_rollup(spark, metrics_rollup_path),
            None,  # its compactor refreshes the rollup manifest itself
            lambda: validate_metrics_rollup(spark, metrics_rollup_path),
        )
    if not slots:
        return []
    with ThreadPoolExecutor(max_workers=len(slots)) as pool:
        futures = [pool.submit(_run, entry) for entry in slots]
        # report order stays the declared family order regardless of
        # completion order; the first family error propagates as before
        return [f.result() for f in futures]
