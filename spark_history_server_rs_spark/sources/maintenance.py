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


def run_maintenance_slot(
    spark: SparkSession,
    dedup_index_path: str | None = None,
    ann_index_path: str | None = None,
    training_shards_path: str | None = None,
    knn_graph_path: str | None = None,
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

    report: list[dict] = []

    def _entry(artifact, compaction, refresh, validate):
        stats = compaction()
        if refresh is not None:
            # unconditional: the slot's contract is to LEAVE attested
            # state, even for a layout that never had a manifest (the
            # compactors alone only refresh an existing one)
            refresh()
        disc = [r.asDict() for r in validate().collect()]
        report.append(
            {
                "artifact": artifact,
                "compaction": stats,
                "valid": not disc,
                "discrepancies": disc,
            }
        )

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
    return report
