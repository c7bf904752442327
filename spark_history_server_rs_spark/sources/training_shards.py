"""S15: deterministic training-shard sink + integrity manifest.

The last mile of the training-data pipeline: after filtering / dedup /
packing, the corpus ships to the trainer as N shards whose membership
must be STABLE (re-running the export on a different cluster size, or
after an idempotent retry, must produce the same shard for every doc —
data loaders checkpoint by shard and resume mid-epoch). Layout::

    path/shards/shard=<i>/...parquet   (doc rows, xxhash64-assigned)
    path/manifest/...parquet           (shard, n_docs, n_tokens, content_hash)
    path/meta/...parquet               (n_shards)  the declared modulus

Shard assignment is ``pmod(xxhash64(doc_id), n_shards)`` — a pure
function of the row, independent of partitioning, task order, or
cluster size. The manifest carries an ORDER-INDEPENDENT content hash
per shard (sum of per-row 64-bit hashes in DECIMAL(38,0) — commutative,
so aggregation order cannot change it), which makes the export
self-verifying: ``validate_training_shards`` recomputes the stats from
the written files and reports any shard whose counts or content hash
drifted (partial writes, manual edits, bit rot).

At 100 TB: the export is one hash projection + a partitioned write (no
global shuffle beyond the shard exchange); validation is one scan of
the shards with a map-side-combined aggregate per shard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.checkpoints import durable_checkpoint
from pyspark.sql import functions as F

N_SHARDS = 8

#: whitespace tokens, as everywhere in the corpus operators
_TOKENS = "filter(split(text, ' '), x -> x <> '')"


def _shard_stats(rows: DataFrame) -> DataFrame:
    """Per-shard (n_docs, n_tokens, content_hash) — the hash sums
    per-row xxhash64(doc_id, text) in DECIMAL(38,0) so it is
    order-independent and cannot overflow at any corpus size."""
    return rows.groupBy("shard").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.coalesce(
            F.sum(F.expr(f"size({_TOKENS})")), F.lit(0)
        ).cast("long").alias("n_tokens"),
        F.sum(
            F.xxhash64("doc_id", "text").cast("decimal(38,0)")
        ).cast("decimal(38,0)").alias("content_hash"),
    )


def write_training_shards(
    docs: DataFrame, path: str, n_shards: int = N_SHARDS
) -> None:
    """Export ``docs`` as ``n_shards`` stable shards + manifest.
    Idempotent overwrite: re-running produces byte-equivalent shard
    MEMBERSHIP and an identical manifest.

    The modulus is PERSISTED (``meta/``, one row) because it cannot be
    safely recovered from the layout: ``partitionBy`` writes no
    directory for an empty shard, so an export whose TOP shard(s)
    happen to be empty under-reports ``max(shard=)+1`` — and a
    retraction running with the wrong modulus computes the wrong
    affected set and silently misses its targets (ADVICE r11, the
    GDPR-path failure). Meta is written FIRST: a crash mid-export
    leaves a declared modulus with partial shards (the validator
    flags), never shards without their modulus."""
    spark = docs.sparkSession
    spark.createDataFrame([(int(n_shards),)], "n_shards bigint").write.mode(
        "overwrite"
    ).parquet(f"{path}/meta")
    sharded = docs.withColumn(
        "shard", F.pmod(F.xxhash64("doc_id"), F.lit(n_shards))
    )
    (
        sharded.repartition(n_shards, "shard")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(f"{path}/shards")
    )
    # manifest computed from the WRITTEN files, not the input plan —
    # it attests what landed on disk
    written = spark.read.parquet(f"{path}/shards")
    _shard_stats(written).write.mode("overwrite").parquet(f"{path}/manifest")


def _read_meta_n_shards(spark: SparkSession, path: str) -> int | None:
    """The export's declared modulus (one-row ``meta/`` read,
    fingerprint-cached — see ``read_meta_rows_cached``), or None for a
    legacy export written before meta existed."""
    from .dedup_index import read_meta_rows_cached

    rows = read_meta_rows_cached(spark, path)
    if not rows or "n_shards" not in rows[0]:
        return None
    return int(rows[0]["n_shards"])


def stream_append_training_shards(
    docs_stream: DataFrame,
    path: str,
    checkpoint: str,
    n_shards: int = N_SHARDS,
):
    """Streaming S15 maintenance: arriving documents land in their
    stable shard per micro-batch (membership is the same pure row
    function as the batch writer, so a doc's shard never depends on
    WHEN it arrived). The manifest is refreshed separately
    (:func:`refresh_shard_manifest`) — per-batch read-modify-write of a
    manifest would race with readers and retries.

    Semantics: at-least-once under retries (a re-run batch appends its
    rows twice); :func:`compact_training_shards` is the periodic
    exactly-once repair (run it in the same maintenance slot as the
    index compactions — it refreshes the manifest itself). Returns the
    started StreamingQuery.

    Refuses a modulus that contradicts the export's declared one
    (``meta/``): appending with a different ``n_shards`` would scatter
    the same doc_id across two membership functions, breaking the
    stable-shard contract AND every later partition-pruned
    retraction."""
    spark = docs_stream.sparkSession
    declared = _read_meta_n_shards(spark, path)
    if declared is not None and declared != int(n_shards):
        raise ValueError(
            f"shard export at {path} declares n_shards={declared} but the "
            f"stream was started with n_shards={n_shards} — membership "
            "would fork; pass the declared modulus"
        )

    def _append_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn(
                "shard", F.pmod(F.xxhash64("doc_id"), F.lit(n_shards))
            )
            .write.mode("append")
            .partitionBy("shard")
            .parquet(f"{path}/shards")
        )

    return (
        docs_stream.writeStream.foreachBatch(_append_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def compact_training_shards(spark: SparkSession, path: str) -> list[dict]:
    """Periodic DISTINCT compaction of streamed shard appends — the S15
    twin of ``compact_dedup_index`` / ``compact_ann_index`` (shared
    ``compact_relation_swap`` commit).

    ``stream_append_training_shards`` is at-least-once: a micro-batch
    retried after a failure appends its document rows twice — BYTE
    -IDENTICAL rows, because shard membership and every payload column
    are pure functions of the document. The repair is therefore a
    full-row DISTINCT rewrite per shard (for retry duplicates this IS
    the promised distinct-on-doc_id: duplicate doc_ids carry duplicate
    payloads), preserving the ``shard=`` partitioning so shard-pruned
    reads survive compaction, sorted within partitions so a second
    compaction of an already-compact export rewrites identical content
    (idempotent, pinned by test). Two rows sharing a doc_id with
    DIFFERENT payloads are not a retry artifact but an upstream
    pipeline error — compaction keeps both (a silent arbitrary-winner
    drop would hide the bug) and the refreshed manifest attests
    whatever is actually on disk.

    Ends by refreshing the manifest, so ``validate_training_shards``
    is clean immediately after. Returns per-shard-relation stats
    ``{relation, rows_before, rows_after}``.
    """
    from .dedup_index import compact_relation_swap
    from .index_manifest import path_exists

    src = f"{path}/shards"
    if not path_exists(spark, src):
        # vanished export: nothing to compact, and the manifest is NOT
        # refreshed — it stays as the validator's evidence of what the
        # export should have contained (flag, not crash)
        return [
            {"relation": "shards", "rows_before": None, "rows_after": None}
        ]
    raw = spark.read.parquet(src)
    # shard last: it is the partition column; sort on every column so
    # the rewrite is deterministic row-for-row
    cols = [c for c in raw.columns if c != "shard"] + ["shard"]
    raw = raw.select(*cols)
    rows_before = raw.count()
    rows_after = compact_relation_swap(
        spark, raw.distinct(), src, "shard", sort_cols=cols
    )
    refresh_shard_manifest(spark, path)
    return [
        {"relation": "shards", "rows_before": rows_before,
         "rows_after": rows_after}
    ]


def _list_shard_ids(spark: SparkSession, path: str) -> list[int]:
    """The shard ids present on disk (FS listing of ``shard=<i>``
    child directories — no file footers touched)."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(f"{path}/shards")
    fs = p.getFileSystem(conf)
    if not fs.exists(p):
        return []
    out = []
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith("shard="):
            out.append(int(name.split("=", 1)[1]))
    return sorted(out)


def retract_from_training_shards(
    spark: SparkSession,
    path: str,
    ids: DataFrame,
    n_shards: int | None = None,
) -> dict:
    """DELETE phase for the shard export — the GDPR-erasure arc the
    other durable artifacts already have, shaped by S15's one design
    invariant: shard membership is a PURE FUNCTION of ``doc_id``
    (``pmod(xxhash64(doc_id), n_shards)``), so the shards a retraction
    touches compute from the ids alone — no scan, no manifest lookup —
    and only those partitions rewrite. Cost scales with
    |affected shards| × shard size, never the export; a retraction of
    one document rewrites exactly one shard.

    Per affected shard: anti-join the retracted ids and swap the
    rewritten partition in (the shared ``compact_relation_swap``
    commit — sorted, so retracting already-absent ids rewrites
    identical content: idempotent). A shard left EMPTY keeps its
    (empty, readable) directory; its manifest row drops with its
    stats, which is exactly how the validator reads an empty shard.
    The manifest rewrites LAST — unaffected rows carried, affected
    rows recomputed from the rewritten partitions — so a crash
    mid-retraction leaves a stale manifest the validator FLAGS
    (detection, the S15 contract) rather than attesting a
    half-applied erasure; the repair is re-running the retraction.

    ``n_shards`` resolves explicit arg → the export's declared
    ``meta/`` row → the on-disk layout (max ``shard=`` dir + 1). The
    disk inference is the DANGEROUS branch (``partitionBy`` writes no
    directory for an empty shard, so a legacy export whose top shards
    are empty under-reports the modulus and the pmod-computed affected
    set points at the wrong shards); when it is taken, this function
    verifies AFTER the rewrite that no retracted id survives anywhere
    in the export — one semi-join scan, legacy exports only — and
    fails loud instead of returning a silent erasure miss (ADVICE
    r11). Returns per-step stats."""
    from .dedup_index import compact_relation_swap, release_local_checkpoint
    from .index_manifest import path_exists

    disk_shards = _list_shard_ids(spark, path)
    if not disk_shards:
        raise ValueError(
            f"no shard export at {path}/shards — nothing to retract from"
        )
    inferred_modulus = False
    if n_shards is None:
        n_shards = _read_meta_n_shards(spark, path)
    if n_shards is None:
        n_shards = max(disk_shards) + 1
        inferred_modulus = True
    # localCheckpoint, not persist: the retention pass runs family
    # deletes overlapped and several derive semantically equal tombstone
    # plans — a shared CacheManager entry's concurrent unpersist cascade
    # can corrupt unrelated cached relations (see compact_relation_swap)
    tomb = durable_checkpoint(
        ids.where("doc_id IS NOT NULL").select("doc_id").distinct()
    )
    try:
        # ONE planning job (r13 — was a count + a distinct-collect):
        # per-shard id counts carry both the id total and the affected
        # set, ≤ n_shards rows of driver payload
        shard_counts = (
            tomb.groupBy(
                F.expr(
                    f"pmod(xxhash64(doc_id), {int(n_shards)})"
                ).alias("s")
            )
            .count()
            .collect()
        )
        n_ids = sum(r["count"] for r in shard_counts)
        affected = sorted(
            int(r["s"]) for r in shard_counts if r["s"] in set(disk_shards)
        )
        # The affected shards are DISJOINT directories sharing only the
        # persisted (read-only) tombstone frame, so their rewrites are
        # independent jobs — run them overlapped (r14, guide §2.6) so
        # one shard's count/write/swap tail back-fills with the next
        # shard's tasks instead of idling the cluster between
        # sequential per-shard rewrites (measured: the sequential loop
        # was wall = Σ(shards) of mostly-idle sub-second jobs; each
        # shard stages at its own __retracting tmp, so no path is
        # shared). Bounded pool: enough in-flight jobs to fill the
        # tail, not so many they fight (guide's 2-3 rule, widened to 4
        # for these tiny jobs). Crash semantics unchanged in kind — a
        # crash mid-retraction leaves an arbitrary subset (not a
        # prefix) of shards rewritten with the manifest still stale,
        # which the validator flags and the idempotent re-run repairs,
        # exactly as before.
        from concurrent.futures import ThreadPoolExecutor

        def _rewrite_shard(s: int) -> dict:
            src = f"{path}/shards/shard={s}"
            raw = spark.read.parquet(src)
            survivors = raw.join(tomb, "doc_id", "left_anti")
            before = raw.count()
            after = compact_relation_swap(
                spark, survivors, src, None, sort_cols=list(raw.columns),
                # stage OUTSIDE shards/: a crashed swap must not leave
                # a non-partition directory inside the Hive layout
                tmp=f"{path}/__retracting_shard_{s}",
            )
            return {"shard": s, "rows_before": before, "rows_after": after}

        rewritten = []
        if affected:
            with ThreadPoolExecutor(
                max_workers=min(4, len(affected))
            ) as pool:
                rewritten = list(pool.map(_rewrite_shard, affected))
        # manifest last: recompute ONLY the affected shards (partition-
        # pruned read), carry the untouched rows verbatim
        if path_exists(spark, f"{path}/manifest") and affected:
            # the manifest is ≤ n_shards rows — round-trip the kept
            # rows through the driver (Spark refuses to overwrite a
            # path its own plan reads from)
            kept_rows = [
                (r["shard"], r["n_docs"], r["n_tokens"], r["content_hash"])
                for r in spark.read.parquet(f"{path}/manifest").collect()
                if r["shard"] not in set(affected)
            ]
            schema = (
                "shard bigint, n_docs long, n_tokens long,"
                " content_hash decimal(38,0)"
            )
            keep = spark.createDataFrame(kept_rows, schema)
            fresh = _shard_stats(
                spark.read.parquet(f"{path}/shards").where(
                    "shard IN (" + ",".join(map(str, affected)) + ")"
                )
            ).selectExpr(
                "CAST(shard AS BIGINT) AS shard", "n_docs", "n_tokens",
                "content_hash",
            )
            keep.unionByName(fresh).write.mode("overwrite").parquet(
                f"{path}/manifest"
            )
        if inferred_modulus and n_ids:
            # legacy export, modulus guessed from the layout: prove the
            # erasure actually landed (a wrong guess leaves targets in
            # shards outside the affected set, with the validator still
            # green — fail loud, never report a phantom success)
            leftover = (
                spark.read.parquet(f"{path}/shards")
                .join(tomb, "doc_id", "left_semi")
                .count()
            )
            if leftover:
                raise RuntimeError(
                    f"retraction verification failed at {path}: {leftover} "
                    "retracted row(s) survive outside the inferred-modulus "
                    "affected set — the export's true n_shards differs from "
                    f"the layout-inferred {n_shards}; re-run with the "
                    "export's real n_shards"
                )
    finally:
        release_local_checkpoint(tomb)
    return {
        "n_ids": n_ids,
        "shards_rewritten": rewritten,
        "n_shards": int(n_shards),
    }


def refresh_shard_manifest(spark: SparkSession, path: str) -> None:
    """Recompute the manifest from what is on disk (the maintenance
    step after streaming appends — validation is only meaningful
    against a manifest that attests the current shard contents)."""
    _shard_stats(spark.read.parquet(f"{path}/shards")).write.mode(
        "overwrite"
    ).parquet(f"{path}/manifest")


def validate_training_shards(spark: SparkSession, path: str) -> DataFrame:
    """Recompute per-shard stats from the shard files and diff against
    the manifest. Returns the discrepancy relation — 0 rows = intact;
    each row names the shard and which of (docs, tokens, content) moved
    (a shard present only on one side reports NULLs on the other)."""
    from .index_manifest import path_exists

    _empty = "shard bigint, n_docs long, n_tokens long, content_hash decimal(38,0)"
    if path_exists(spark, f"{path}/shards"):
        actual = _shard_stats(spark.read.parquet(f"{path}/shards"))
    else:
        # the whole export vanished: every manifest row becomes a
        # discrepancy with NULL actuals (flag, not crash)
        actual = spark.createDataFrame([], _empty)
    actual = actual.alias("a")
    if path_exists(spark, f"{path}/manifest"):
        manifest = spark.read.parquet(f"{path}/manifest")
    else:
        # missing/never-written manifest: every on-disk shard reports
        # with NULL manifest-side values
        manifest = spark.createDataFrame([], _empty)
    manifest = manifest.alias("m")
    # eqNullSafe is defensive full_outer-join hygiene only: a NULL
    # doc_id does NOT produce a NULL shard — Spark's xxhash64 SKIPS
    # NULL inputs, so xxhash64(NULL) = 42 (the seed) and NULL doc_ids
    # land in the concrete shard pmod(42, n_shards). NULL shard values
    # can therefore only come from a manifest written by an external
    # tool; matching them to themselves (instead of two phantom
    # discrepancy rows) is still the right join semantics.
    joined = actual.join(
        manifest, F.col("a.shard").eqNullSafe(F.col("m.shard")), "full_outer"
    )
    return (
        joined.select(
            F.coalesce(F.col("a.shard"), F.col("m.shard")).alias("shard"),
            F.col("a.n_docs").alias("actual_docs"),
            F.col("m.n_docs").alias("manifest_docs"),
            F.col("a.n_tokens").alias("actual_tokens"),
            F.col("m.n_tokens").alias("manifest_tokens"),
            (
                F.col("a.content_hash").eqNullSafe(F.col("m.content_hash"))
            ).alias("content_ok"),
        )
        .where(
            "NOT (content_ok AND actual_docs <=> manifest_docs"
            " AND actual_tokens <=> manifest_tokens)"
        )
        .orderBy("shard")
    )
