"""Durable dedup index — persist the derived dedup relations to parquet
and serve pair-finding FROM the index, without the source text.

The in-session materialized-view cache (``operators/dedup.py``) gives
index-once/serve-many within one SparkSession; this module makes the
split durable: a nightly INDEX job writes shingles / MinHash band keys /
passage window-hashes once, and any number of downstream QUERY jobs (in
other sessions, on other clusters) find duplicate pairs by reading only
the index — document text is never re-tokenized, never even read.

At 100 TB this is the production layout: the index is a small multiple
of the doc-id space (hashes + ids, no text), band keys are written
partitioned by ``band_idx`` so a band-collision probe prunes to one
partition per band, and every downstream join is keyed on uniform
md5-derived values (unskewable by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.dedup import (
    JACCARD_THRESHOLD,
    _MINHASH_POST,
    _PASSAGE_WINS_SPARK,
    _BANDKV_SPARK,
    _minhash_bandkv_sql,
    _SHINGLES_SPARK,
)


def write_dedup_index(docs: DataFrame, path: str) -> None:
    """INDEX phase: compute and persist the three derived relations.

    Layout::

        path/shingles/     (doc_id, shingle)             zstd parquet
        path/band_keys/    (doc_id, band_key) PARTITIONED BY band_idx
        path/passages/     (doc_id, pos, phash)

    One pass over the text builds shingles; band keys aggregate from the
    shingles plan (Catalyst reuses the projection); passage windows are
    an independent projection. All three writes are append-free
    overwrites — re-running the index job is idempotent.
    """
    spark = docs.sparkSession
    docs.createOrReplaceTempView("_dedup_docs")
    shingles = spark.sql(_SHINGLES_SPARK.format(src="_dedup_docs"))
    shingles.write.mode("overwrite").parquet(f"{path}/shingles")
    bandkv = spark.sql(
        "WITH shingles AS (SELECT doc_id, shingle FROM "
        f"parquet.`{path}/shingles`),\n"
        + _minhash_bandkv_sql(_BANDKV_SPARK).lstrip()
        + "\nSELECT doc_id, band_idx, band_key FROM bandkv"
    )
    bandkv.write.mode("overwrite").partitionBy("band_idx").parquet(
        f"{path}/band_keys"
    )
    passages = spark.sql(_PASSAGE_WINS_SPARK.format(src="_dedup_docs"))
    passages.write.mode("overwrite").parquet(f"{path}/passages")


def read_dedup_index(spark: SparkSession, path: str) -> dict[str, DataFrame]:
    """Open the three persisted relations."""
    return {
        "shingles": spark.read.parquet(f"{path}/shingles"),
        "band_keys": spark.read.parquet(f"{path}/band_keys"),
        "passages": spark.read.parquet(f"{path}/passages"),
    }


def minhash_lsh_pairs_from_index(spark: SparkSession, path: str) -> DataFrame:
    """QUERY phase: D3's near-dup pairs computed ENTIRELY from the
    persisted index — band-collision candidates from ``band_keys``
    (partition-pruned per band), exact-Jaccard verification from
    ``shingles``. Result-identical to the live operator (pinned by
    test), but no document text is touched in this session."""
    idx = read_dedup_index(spark, path)
    idx["shingles"].createOrReplaceTempView("_idx_shingles")
    idx["band_keys"].createOrReplaceTempView("_idx_bandkv")
    return spark.sql(
        "WITH shingles AS (SELECT doc_id, shingle FROM _idx_shingles),\n"
        "bandkv AS (SELECT doc_id, band_idx, band_key FROM _idx_bandkv),"
        + _MINHASH_POST.format(thr=JACCARD_THRESHOLD)
    )
