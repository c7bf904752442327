"""Durable ANN index — persist the IVFADC artifacts to parquet and
answer queries from the index, reading no corpus vectors.

The IVFADC operator (``operators/similarity.ann_ivf_pq``) states the
whole system — coarse quantizer, PQ codebook, codes, ADC — as one plan
over the live embeddings. Production splits it: a nightly INDEX job
writes the centroids (coarse quantizer), the PQ codebook, and each
vector's 4-byte code + cell assignment; the QUERY job reads only those
plus the query vectors. At 100 TB the float corpus (256 B/vector) never
leaves cold storage at query time — the scan payload is the code table
(codes partitioned by cell → a cell probe is partition pruning).

Layout::

    path/centroids/  (label, centroid double[])      the coarse quantizer
    path/codebook/   (codeword, subspace, dim, sv)   PQ codebook elements
    path/codes/      (vec_id, code_0..code_{M-1}) PARTITIONED BY label
    path/meta/       (cell_rule, train_steps)        how cells are assigned
    path/counts/     (n_codes)                 pre-counted live membership
    path/tombstones/ (vec_id, tombstone_seq)   deletions awaiting compaction

``cell_rule`` is ``label`` (original label-mean quantizer) or
``nearest`` (Lloyd-trained centroids via ``train_steps > 0`` — cells
are cosine-nearest content cells, which roughly doubles probe recall on
corpora whose labels carry no geometry; measured in test). Streaming
maintenance follows the persisted rule, so batch and stream always
agree on which cell a vector joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.checkpoints import durable_checkpoint

from ..operators.similarity import (
    _IVF_SPARK,
    _PQ_CODE_CTES,
    _PQ_SCALE,
    _PQ_UNNEST_SPARK,
    N_QUERIES,
    NPROBE,
    PQ_K,
    PQ_M,
    PQ_SUBDIM,
    TOP_K,
)
from ..operators.dedup import cosine_expr_spark


def _pq_ctes(src: str) -> str:
    return _PQ_CODE_CTES.format(
        scale=_PQ_SCALE,
        subdim=PQ_SUBDIM,
        pqk=PQ_K,
        unnested=_PQ_UNNEST_SPARK.format(src=src),
    ).strip().rstrip(",")


#: nearest-cell assignment over a persisted centroid relation — shared
#: by the trained batch build and streaming maintenance on a trained
#: index, so the two can never disagree on which cell a vector joins
_NEAREST_CELL_SQL = """
cand AS (
  SELECT e.vec_id, ct.label,
         {cos} AS cs
  FROM {src} e JOIN {cents} ct ON 1 = 1
),
cells AS (
  SELECT vec_id, label FROM (
    SELECT vec_id, label,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY cs DESC, label) AS rnk
    FROM cand) rr WHERE rnk = 1
)"""


def _index_meta(spark: SparkSession, path: str) -> dict:
    """The index's persisted build parameters with back-compat defaults:
    ``cell_rule`` — ``label`` (label-mean quantizer) or ``nearest``
    (Lloyd-trained centroids, cosine-nearest assignment); ``encoding``
    — ``raw`` (PQ over x) or ``residual`` (PQ over r = x − q1(x), the
    Jégou et al. 2011 §IV.A codec). Pre-meta indexes are label/raw by
    construction."""
    from .dedup_index import read_meta_rows_cached

    # fingerprint-cached (r14): the encoding/cell-rule gate runs on
    # every serving call — a warm call on an unchanged index must not
    # pay a Spark job for this one-row read
    rows = read_meta_rows_cached(spark, path)
    row = rows[0] if rows else {}
    return {
        "cell_rule": row.get("cell_rule", "label"),
        "train_steps": row.get("train_steps", 0),
        "encoding": row.get("encoding", "raw"),
    }


def _cell_rule(spark: SparkSession, path: str) -> str:
    return _index_meta(spark, path)["cell_rule"]


#: residual codebook + per-vector residual codes over (elems, cdim,
#: cells) CTEs — the Jégou et al. 2011 §IV.A codec persisted: PQ
#: quantizes r = x − q1(x) instead of x, spending the identical
#: PQ_M × PQ_K byte budget on the much smaller-variance residual
#: distribution (strictly lower quantization error at equal bytes —
#: pinned at the index level by test). Integer discipline matches the
#: live X8b operator exactly: centroid dims re-enter as micro BIGINTs
#: (FLOOR(c·1e6+0.5) recovers the snap exactly), residual elements are
#: exact BIGINT differences, squared-diff sums use the proven milli
#: down-snap.
_RESIDUAL_CODE_CTES = """
relems AS (
  SELECT e.vec_id, e.dim, e.sv - c.csv AS rsv
  FROM elems e
  JOIN cells vl ON vl.vec_id = e.vec_id
  JOIN cdim c ON c.label = vl.label AND c.dim = e.dim
),
rsub AS (
  SELECT vec_id, CAST(FLOOR(dim / {subdim}.0) AS BIGINT) AS subspace,
         dim, rsv
  FROM relems
),
rcb AS ({rcb}),
rdists AS (
  SELECT s.vec_id, s.subspace, c.codeword,
         CAST(SUM(CAST(FLOOR(CAST(s.rsv - c.sv AS DOUBLE) / 1000.0) AS BIGINT)
                  * CAST(FLOOR(CAST(s.rsv - c.sv AS DOUBLE) / 1000.0) AS BIGINT))
              AS BIGINT) AS d
  FROM rsub s JOIN rcb c ON s.subspace = c.subspace AND s.dim = c.dim
  GROUP BY s.vec_id, s.subspace, c.codeword
),
assigned AS (
  SELECT vec_id, subspace, codeword FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, subspace
                                 ORDER BY d, codeword) AS rnk
    FROM rdists
  ) WHERE rnk = 1
)"""

#: the codebook's own rows stated as residual subvectors of the seed
#: vectors (vec_id < PQ_K) — used at build time; streaming re-encodes
#: read the PERSISTED codebook instead
_RCB_FROM_RSUB = (
    "SELECT vec_id AS codeword, subspace, dim, rsv AS sv"
    " FROM rsub WHERE vec_id < {pqk}"
)

_ELEMS_CTE = (
    "elems AS (SELECT vec_id, pos AS dim,"
    " CAST(FLOOR(CAST(v AS DOUBLE) * {scale} + 0.5) AS BIGINT) AS sv"
    " FROM {src} LATERAL VIEW posexplode(embedding) t AS pos, v)"
)

#: micro-int centroid dims from the persisted (label, centroid double[])
#: relation — posexplode is 0-based, matching elems' dim
_CDIM_CTE = (
    "cdim AS (SELECT label, pos AS dim,"
    " CAST(FLOOR(c * {scale} + 0.5) AS BIGINT) AS csv"
    " FROM {cents} LATERAL VIEW posexplode(centroid) t AS pos, c)"
)


def write_ann_index(
    emb: DataFrame, path: str, train_steps: int = 0, residual: bool = False
) -> None:
    """INDEX phase: persist coarse centroids, PQ codebook, and per-vector
    codes (partitioned by cell). Idempotent overwrite.

    ``train_steps=0`` (default) keeps the original label-mean coarse
    quantizer: cells are the stored ``label`` column. ``train_steps>0``
    replaces it with Lloyd-TRAINED centroids
    (:func:`..operators.llmprep.km_trained_centroids_df` — the L8b loop)
    and assigns every vector to its cosine-nearest trained centroid —
    content-based cells, which is what makes a cosine cell probe
    actually find neighbors when labels carry no geometry (pinned by
    the recall test).

    ``residual=True`` persists the paper-faithful IVFADC codec (Jégou
    et al. 2011 §IV.A): the codebook and codes quantize the residual
    r = x − q1(x) instead of x — strictly finer codes at identical
    bytes/vector (pinned at the index level), served by
    :func:`ann_ivf_pq_residual_from_index`. Both the rule and the
    encoding land in ``meta/`` so streaming maintenance encodes
    arriving vectors the same way."""
    from ..functions.views import scoped_temp_view
    from .dedup_index import invalidate_count_row, write_count_row

    spark = emb.sparkSession
    # stale-count-never-serves, across this builder's own crash
    # windows: delete any previous build's pre-counted membership
    # BEFORE the codes are overwritten; rewrite it at the end (the
    # write_dedup_index meta ordering, mirrored)
    invalidate_count_row(spark, path)
    # same source contract as every vector operator: NULL embeddings
    # (failed encodes) never enter the index
    with scoped_temp_view(
        emb.where("embedding IS NOT NULL"), "_sim_emb"
    ) as ev:
        if train_steps > 0:
            from ..operators.llmprep import _retire_anchor, km_trained_centroids_df

            # the trained quantizer stays executor-side end to end: the
            # Lloyd loop joins centroids as a DataFrame (no SQL literals,
            # no k × dims driver collect) and the final frame writes
            # straight to parquet
            cents_df = km_trained_centroids_df(emb, train_steps)
            cents_df.write.mode("overwrite").parquet(f"{path}/centroids")
            _retire_anchor(cents_df)
        else:
            spark.sql(
                "WITH "
                + _IVF_SPARK.format(src=ev).strip().rstrip(",")
                + "\nSELECT label, centroid FROM centroids"
            ).write.mode("overwrite").parquet(f"{path}/centroids")
        code_cols = ",\n       ".join(
            f"MAX(CASE WHEN subspace = {s} THEN codeword END) AS code_{s}"
            for s in range(PQ_M)
        )
        with scoped_temp_view(
            spark.read.parquet(f"{path}/centroids"), "_ann_cents"
        ) as ctv:
            if train_steps > 0:
                cells_cte = _NEAREST_CELL_SQL.format(
                    src=ev,
                    cents=ctv,
                    cos=cosine_expr_spark("e.embedding", "ct.centroid"),
                ).strip().lstrip()
            else:
                cells_cte = f"cells AS (SELECT vec_id, label FROM {ev})"
            if residual:
                common = (
                    "WITH "
                    + _ELEMS_CTE.format(scale=_PQ_SCALE, src=ev)
                    + ",\n"
                    + _CDIM_CTE.format(scale=_PQ_SCALE, cents=ctv)
                    + ",\n"
                    + cells_cte
                    + ","
                    + _RESIDUAL_CODE_CTES.format(
                        subdim=PQ_SUBDIM,
                        rcb=_RCB_FROM_RSUB.format(pqk=PQ_K),
                    )
                )
                spark.sql(
                    common + "\nSELECT codeword, subspace, dim, sv FROM rcb"
                ).write.mode("overwrite").parquet(f"{path}/codebook")
                spark.sql(
                    common
                    + f"""
SELECT a.vec_id, c.label,
       {code_cols},
       CAST(0 AS BIGINT) AS ingest_seq
FROM assigned a JOIN cells c ON a.vec_id = c.vec_id
GROUP BY a.vec_id, c.label
"""
                ).write.mode("overwrite").partitionBy("label").parquet(
                    f"{path}/codes"
                )
            else:
                spark.sql(
                    "WITH "
                    + _pq_ctes(ev)
                    + "\nSELECT codeword, subspace, dim, sv FROM cb"
                ).write.mode("overwrite").parquet(f"{path}/codebook")
                spark.sql(
                    "WITH "
                    + _pq_ctes(ev)
                    + ",\n"
                    + cells_cte
                    + f"""
SELECT a.vec_id, c.label,
       {code_cols},
       CAST(0 AS BIGINT) AS ingest_seq
FROM assigned a JOIN cells c ON a.vec_id = c.vec_id
GROUP BY a.vec_id, c.label
"""
                ).write.mode("overwrite").partitionBy("label").parquet(
                    f"{path}/codes"
                )
        spark.createDataFrame(
            [(
                "nearest" if train_steps > 0 else "label",
                train_steps,
                "residual" if residual else "raw",
            )],
            "cell_rule string, train_steps int, encoding string",
        ).write.mode("overwrite").parquet(f"{path}/meta")
    # the serving twins' drift refusal reads this one row instead of
    # distinct-scanning codes/ per call — same DISTINCT non-NULL
    # semantics as the check itself
    write_count_row(
        spark, path, "n_codes",
        spark.read.parquet(f"{path}/codes")
        .where("vec_id IS NOT NULL")
        .select("vec_id").distinct().count(),
    )


def ann_ivf_pq_from_index(
    spark: SparkSession, path: str, queries: DataFrame, nprobe: int = NPROBE
) -> DataFrame:
    """QUERY phase: IVFADC answered from the persisted index. The only
    vectors read are the QUERY vectors (asymmetric distance needs them);
    the corpus side is centroids (tiny), codebook (tiny, broadcast), and
    the code table pruned to the probed cells. Result-identical to the
    live ``ann_ivf_pq`` operator on the same data (pinned by test).

    ``nprobe`` is the serving-time recall/cost knob (default matches the
    live operator): more cells probed = more candidates, and the codes
    scan stays dynamically partition-pruned to exactly that many cells
    per query (plan-gated) — ``ann_nprobe_recall`` is the offline sweep
    that picks the value."""
    from ..functions.views import scoped_temp_view

    meta = _index_meta(spark, path)
    if meta["encoding"] != "raw":
        # a residual codebook fed into raw ADC tables would return
        # plausible-looking garbage — fail loud instead
        raise ValueError(
            f"index at {path} is '{meta['encoding']}'-encoded; serve it"
            " with ann_ivf_pq_residual_from_index"
        )
    codes_df = spark.read.parquet(f"{path}/codes")
    if "ingest_seq" not in codes_df.columns:
        # index persisted before sequence tracking: every row is the
        # batch build — exactly what seq 0 means
        codes_df = codes_df.selectExpr("*", "CAST(0 AS BIGINT) AS ingest_seq")
    qc_cos = cosine_expr_spark("q.embedding", "ct.centroid")
    # unpivot the persisted code columns back to (vec_id, subspace, codeword)
    code_pairs = ", ".join(f"{s}, code_{s}" for s in range(PQ_M))
    # same NULL-drop source contract as every vector entry point —
    # explicit, not incidental (a NULL query must not rank over NULL
    # centroid cosines in the probes CTE)
    with scoped_temp_view(
        spark.read.parquet(f"{path}/centroids"), "_annidx_centroids"
    ) as ctv, scoped_temp_view(
        spark.read.parquet(f"{path}/codebook"), "_annidx_cb"
    ) as cbv, scoped_temp_view(
        codes_df, "_annidx_codes"
    ) as cdv, scoped_temp_view(
        queries.where("embedding IS NOT NULL"), "_annidx_queries"
    ) as qv:
        return spark.sql(f"""
WITH probes AS (
  SELECT query_id, label FROM (
    SELECT q.vec_id AS query_id, ct.label,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
                              ORDER BY {qc_cos} DESC, ct.label) AS crank
    FROM {qv} q JOIN {ctv} ct ON 1 = 1
    WHERE q.vec_id < {N_QUERIES}
  ) WHERE crank <= {int(nprobe)}
),
qelems AS (
  SELECT vec_id, pos AS dim,
         CAST(FLOOR(CAST(v AS DOUBLE) * {_PQ_SCALE} + 0.5) AS BIGINT) AS sv
  FROM {qv} LATERAL VIEW posexplode(embedding) t AS pos, v
  WHERE vec_id < {N_QUERIES}
),
dtable AS (
  -- per-query ADC lookup table over the persisted codebook
  SELECT q.vec_id AS query_id, c.subspace, c.codeword,
         CAST(SUM(CAST(FLOOR(CAST(q.sv - c.sv AS DOUBLE) / 1000.0) AS BIGINT)
                  * CAST(FLOOR(CAST(q.sv - c.sv AS DOUBLE) / 1000.0) AS BIGINT))
              AS BIGINT) AS d
  FROM qelems q JOIN {cbv} c ON q.dim = c.dim
  GROUP BY q.vec_id, c.subspace, c.codeword
),
codes AS (
  -- latest-wins + DISTINCT: a streaming update retried after a failure
  -- appends a batch's code rows twice (at-least-once — byte-identical,
  -- DISTINCT absorbs them), and a vector RE-STREAMED with a changed
  -- embedding leaves two DIFFERENT codes under the same vec_id — the
  -- ADC sum adds one term per (subspace, codeword) row, so both
  -- surviving would corrupt every distance for that vector. Each row
  -- carries its ingest_seq (0 = the batch index build; streamed
  -- micro-batches write 1 + the index's own max, monotonic even
  -- across checkpoint resets); only the newest sequence per vec_id
  -- counts.
  -- The max is computed from the NARROW un-expanded relation (two
  -- small columns, map-side-combined aggregate), NOT the stacked
  -- expansion, so the expanded code scan below keeps its label
  -- partition pruning; after compact_ann_index the aggregate runs
  -- over already-unique vec_ids. compact materializes the same rule.
  -- Tombstoned vectors (delete_from_ann_index) are filtered by the
  -- same subquery when a tombstones/ relation exists.
  SELECT DISTINCT c.vec_id, c.label, s.subspace, s.codeword
  FROM {_latest_seq_subquery(spark, path, cdv)} m
  JOIN {cdv} c
    ON c.vec_id = m.vec_id AND c.ingest_seq = m.max_seq
  LATERAL VIEW stack({PQ_M}, {code_pairs}) s AS subspace, codeword
),
adc AS (
  SELECT p.query_id, x.vec_id AS neighbor_id, x.label AS probed_label,
         CAST(SUM(d.d) AS BIGINT) AS approx_d
  FROM codes x
  JOIN probes p ON p.label = x.label
  JOIN dtable d ON d.query_id = p.query_id
              AND d.subspace = x.subspace AND d.codeword = x.codeword
  WHERE x.vec_id <> p.query_id
  GROUP BY p.query_id, x.vec_id, x.label
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY approx_d, neighbor_id) AS rank
  FROM adc
)
SELECT query_id, probed_label, neighbor_id, approx_d, rank
FROM ranked WHERE rank <= {TOP_K}
ORDER BY query_id, rank
""")


def ann_ivf_pq_residual_from_index(
    spark: SparkSession, path: str, queries: DataFrame, nprobe: int = NPROBE
) -> DataFrame:
    """QUERY phase for a ``residual=True`` index: IVFADC with residual
    encoding answered from the persisted artifacts — result-identical to
    the live ``ann_ivf_pq_residual`` operator on the same data (pinned
    by test). Corpus-side reads are identical to the raw path (codes
    pruned to probed cells, floats never read); the query side builds
    its ADC tables per (query, PROBED CELL) because the query's residual
    differs per cell — nq × nprobe × M × K entries, broadcast-sized."""
    from ..functions.views import scoped_temp_view

    meta = _index_meta(spark, path)
    if meta["encoding"] != "residual":
        raise ValueError(
            f"index at {path} is '{meta['encoding']}'-encoded; serve it"
            " with ann_ivf_pq_from_index (or rebuild with residual=True)"
        )
    codes_df = spark.read.parquet(f"{path}/codes")
    qc_cos = cosine_expr_spark("q.embedding", "ct.centroid")
    code_pairs = ", ".join(f"{s}, code_{s}" for s in range(PQ_M))
    with scoped_temp_view(
        spark.read.parquet(f"{path}/centroids"), "_annidx_centroids"
    ) as ctv, scoped_temp_view(
        spark.read.parquet(f"{path}/codebook"), "_annidx_cb"
    ) as cbv, scoped_temp_view(
        codes_df, "_annidx_codes"
    ) as cdv, scoped_temp_view(
        queries.where("embedding IS NOT NULL"), "_annidx_queries"
    ) as qv:
        return spark.sql(f"""
WITH probes AS (
  SELECT query_id, label FROM (
    SELECT q.vec_id AS query_id, ct.label,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
                              ORDER BY {qc_cos} DESC, ct.label) AS crank
    FROM {qv} q JOIN {ctv} ct ON 1 = 1
    WHERE q.vec_id < {N_QUERIES}
  ) WHERE crank <= {int(nprobe)}
),
qelems AS (
  SELECT vec_id, pos AS dim,
         CAST(FLOOR(CAST(v AS DOUBLE) * {_PQ_SCALE} + 0.5) AS BIGINT) AS sv
  FROM {qv} LATERAL VIEW posexplode(embedding) t AS pos, v
  WHERE vec_id < {N_QUERIES}
),
{_CDIM_CTE.format(scale=_PQ_SCALE, cents=ctv)},
qrelems AS (
  -- the query's residual w.r.t. EACH probed cell's centroid
  SELECT p.query_id, p.label, e.dim, e.sv - c.csv AS rsv
  FROM probes p
  JOIN qelems e ON e.vec_id = p.query_id
  JOIN cdim c ON c.label = p.label AND c.dim = e.dim
),
qtab AS (
  -- per-(query, probed cell) ADC table over the persisted residual
  -- codebook
  SELECT q.query_id, q.label, b.subspace, b.codeword,
         CAST(SUM(CAST(FLOOR(CAST(q.rsv - b.sv AS DOUBLE) / 1000.0) AS BIGINT)
                  * CAST(FLOOR(CAST(q.rsv - b.sv AS DOUBLE) / 1000.0) AS BIGINT))
              AS BIGINT) AS d
  FROM qrelems q JOIN {cbv} b ON b.dim = q.dim
  GROUP BY q.query_id, q.label, b.subspace, b.codeword
),
codes AS (
  -- latest-wins + DISTINCT + tombstone filter: identical semantics to
  -- the raw serving path (see ann_ivf_pq_from_index's block comment)
  SELECT DISTINCT c.vec_id, c.label, s.subspace, s.codeword
  FROM {_latest_seq_subquery(spark, path, cdv)} m
  JOIN {cdv} c
    ON c.vec_id = m.vec_id AND c.ingest_seq = m.max_seq
  LATERAL VIEW stack({PQ_M}, {code_pairs}) s AS subspace, codeword
),
adc AS (
  SELECT t.query_id, x.vec_id AS neighbor_id, x.label AS probed_label,
         CAST(SUM(t.d) AS BIGINT) AS approx_d
  FROM codes x
  JOIN probes p ON p.label = x.label
  JOIN qtab t ON t.query_id = p.query_id AND t.label = x.label
             AND t.subspace = x.subspace AND t.codeword = x.codeword
  WHERE x.vec_id <> t.query_id
  GROUP BY t.query_id, x.vec_id, x.label
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY approx_d, neighbor_id) AS rank
  FROM adc
)
SELECT query_id, probed_label, neighbor_id, approx_d, rank
FROM ranked WHERE rank <= {TOP_K}
ORDER BY query_id, rank
""")


#: encode a batch of vectors against a PERSISTED codebook (streaming
#: maintenance: the codebook/centroids are frozen between re-trains)
_ENCODE_AGAINST_CB = """
WITH elems AS (
  SELECT vec_id, pos AS dim,
         CAST(FLOOR(CAST(v AS DOUBLE) * {scale} + 0.5) AS BIGINT) AS sv
  FROM {src} LATERAL VIEW posexplode(embedding) t AS pos, v
),
sub AS (
  SELECT vec_id, CAST(FLOOR(dim / {subdim}.0) AS BIGINT) AS subspace, dim, sv
  FROM elems
),
dists AS (
  SELECT s.vec_id, s.subspace, c.codeword,
         CAST(SUM(CAST(FLOOR(CAST(s.sv - c.sv AS DOUBLE) / 1000.0) AS BIGINT)
                  * CAST(FLOOR(CAST(s.sv - c.sv AS DOUBLE) / 1000.0) AS BIGINT))
              AS BIGINT) AS d
  FROM sub s JOIN {cb} c ON s.subspace = c.subspace AND s.dim = c.dim
  GROUP BY s.vec_id, s.subspace, c.codeword
),
assigned AS (
  SELECT vec_id, subspace, codeword FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, subspace
                                 ORDER BY d, codeword) AS rnk
    FROM dists
  ) WHERE rnk = 1
),
{cells_cte}
SELECT a.vec_id, c.label,
       {code_cols},
       CAST({seq} AS BIGINT) AS ingest_seq
FROM assigned a JOIN cells c ON a.vec_id = c.vec_id
GROUP BY a.vec_id, c.label
"""


def _tombstones_exist(spark: SparkSession, path: str) -> bool:
    from .index_manifest import path_exists

    return path_exists(spark, f"{path}/tombstones")


def _latest_seq_subquery(spark: SparkSession, path: str, cdv: str) -> str:
    """The per-vector latest-ingest subquery the serving twins key
    their latest-wins rule on — tombstone-aware when a ``tombstones/``
    relation exists: a vector whose newest code row is not newer than
    its newest tombstone is DEAD and never reaches the ADC join. With
    no tombstones (every index between compactions that followed a
    delete, and every pre-deletion index) the SQL is byte-identical to
    the original form, so existing plans don't change shape."""
    if not _tombstones_exist(spark, path):
        return (
            f"(SELECT vec_id, MAX(ingest_seq) AS max_seq FROM {cdv}\n"
            "        GROUP BY vec_id)"
        )
    return (
        "(SELECT m0.vec_id, m0.max_seq\n"
        f"   FROM (SELECT vec_id, MAX(ingest_seq) AS max_seq FROM {cdv}\n"
        "         GROUP BY vec_id) m0\n"
        "   LEFT JOIN (SELECT vec_id, MAX(tombstone_seq) AS ts\n"
        f"              FROM parquet.`{path}/tombstones`\n"
        "              GROUP BY vec_id) tb\n"
        "     ON tb.vec_id = m0.vec_id\n"
        "   WHERE tb.vec_id IS NULL OR m0.max_seq > tb.ts)"
    )


def _live_vec_ids(spark: SparkSession, path: str) -> DataFrame:
    """The index's LIVE membership: distinct non-NULL vec_ids whose
    newest code row out-sequences any tombstone — the DataFrame twin of
    :func:`_latest_seq_subquery`, used for the drift-refusal counts."""
    from pyspark.sql import functions as F

    codes = spark.read.parquet(f"{path}/codes")
    if "ingest_seq" not in codes.columns:
        codes = codes.selectExpr("*", "CAST(0 AS BIGINT) AS ingest_seq")
    m = (
        codes.where("vec_id IS NOT NULL")
        .groupBy("vec_id")
        .agg(F.max("ingest_seq").alias("max_seq"))
    )
    if not _tombstones_exist(spark, path):
        return m.select("vec_id")
    tb = (
        spark.read.parquet(f"{path}/tombstones")
        .groupBy("vec_id")
        .agg(F.max("tombstone_seq").alias("ts"))
    )
    return (
        m.join(tb, "vec_id", "left")
        .where("ts IS NULL OR max_seq > ts")
        .select("vec_id")
    )


def delete_from_ann_index(
    spark: SparkSession, path: str, ids: DataFrame
) -> int:
    """DELETE phase — the index-lifecycle piece appends alone can't
    give (real pipelines remove vectors: GDPR erasure, dedup-driven
    retention, expired crawls; the reference's own metadata store
    prunes vanished files, ``metadata_store.rs:91-134``). ``ids`` is a
    ``(vec_id)`` frame; each id gets a TOMBSTONE row at the next
    ingest sequence — the same monotonic counter the stream updater
    uses, so adds and deletes share one total order per vector:
    latest wins, whichever kind it is. A vector re-streamed AFTER its
    deletion serves again (its new code rows out-sequence the
    tombstone); deleting then re-running the delete is idempotent
    (byte-different seq, same suppression).

    Readers honor tombstones declaratively (see
    :func:`_latest_seq_subquery`) — no rewrite happens here, so a
    delete is O(|ids|) — and :func:`compact_ann_index` is where the
    dead rows physically leave the code table (tombstones drop with
    them: after a compaction every surviving row out-sequences every
    tombstone by construction). The pre-counted ``counts/n_codes``
    follows the same crash-safe ordering as every membership change:
    invalidated BEFORE the tombstones land, rewritten (live count)
    after. Returns the number of ids tombstoned."""
    from .dedup_index import (
        invalidate_count_row,
        release_local_checkpoint,
        write_count_row,
    )

    codes = spark.read.parquet(f"{path}/codes")
    if "ingest_seq" in codes.columns:
        max_code = codes.selectExpr("max(ingest_seq) AS m").first().m or 0
    else:
        max_code = 0  # pre-sequence-tracking index = batch build (seq 0)
    max_tomb = 0
    if _tombstones_exist(spark, path):
        max_tomb = (
            spark.read.parquet(f"{path}/tombstones")
            .selectExpr("max(tombstone_seq) AS m").first().m or 0
        )
    seq = max(int(max_code), int(max_tomb)) + 1
    invalidate_count_row(spark, path)
    tomb = durable_checkpoint(
        ids.where("vec_id IS NOT NULL")
        .select("vec_id").distinct()
        .selectExpr("vec_id", f"CAST({seq} AS BIGINT) AS tombstone_seq")
        # checkpoint, not persist: overlapped retention deletes must
        # not share/mutate CacheManager entries (see compact_relation_swap)
    )
    try:
        n_ids = tomb.count()
        tomb.write.mode("append").parquet(f"{path}/tombstones")
    finally:
        release_local_checkpoint(tomb)
    write_count_row(
        spark, path, "n_codes", _live_vec_ids(spark, path).count()
    )
    return n_ids


def _check_codes_cover_corpus(
    spark: SparkSession, path: str, corpus: DataFrame, why: str
) -> DataFrame:
    """Fail loud when a caller's corpus frame has grown (or shrunk)
    past the indexed codes — the shared drift refusal for serving twins
    whose result would otherwise silently bend (the S13 sweep's
    membership assertion, mirrored). Returns the codes frame
    (``ingest_seq`` defaulted for pre-sequence-tracking indexes).

    Cost shape (VERDICT r10 #1): the INDEX side never re-scans the
    codes on a warm call — the count is meta-served
    (``counts/n_codes``, written at build/compact time, deleted by the
    stream updater before membership grows) behind the file-listing
    fingerprint cache, so an unchanged index costs zero Spark jobs
    here and only the bounded caller-frame count runs per call. Both
    sides count the same thing — DISTINCT non-NULL vec_ids — so
    duplicate or NULL-id rows in the caller frame can't trigger a
    spurious refusal against the index's DISTINCT semantics."""
    from .dedup_index import indexed_distinct_count
    from .index_manifest import CorpusDriftError

    codes_df = spark.read.parquet(f"{path}/codes")
    if "ingest_seq" not in codes_df.columns:
        codes_df = codes_df.selectExpr(
            "*", "CAST(0 AS BIGINT) AS ingest_seq"
        )
    n_emb = (
        corpus.where("vec_id IS NOT NULL")
        .select("vec_id").distinct().count()
    )
    n_codes = indexed_distinct_count(
        spark, path, "codes", "vec_id", "n_codes",
        # a deletion changes the LIVE set without touching codes/ —
        # tombstones join the staleness fingerprint, and the no-counts
        # fallback counts live ids, not raw code rows
        extra_rels=("tombstones",),
        fallback=lambda: _live_vec_ids(spark, path).count(),
    )
    if n_emb != n_codes:
        raise CorpusDriftError(
            f"ann index at {path} codes {n_codes} vectors but the "
            f"corpus frame has {n_emb} — {why}; re-run write_ann_index "
            "or stream the delta first"
        )
    return codes_df


#: the candidate-accumulation CTE body for a RESIDUAL-encoded system:
#: the ADC table is per-(query, probed cell) — the query's residual
#: differs per cell — so the table join carries the probed label
#: (mirrors ``ann_ivf_pq_residual_from_index``'s adc, swept over np)
_NPROBE_ADC_RESIDUAL = """
  SELECT n.np, p.query_id, a.vec_id AS neighbor_id,
         CAST(SUM(t.d) AS BIGINT) AS approx_d
  FROM probes p
  JOIN nps n ON p.crank <= n.np
  JOIN vec_cells l ON l.label = p.label
  JOIN assigned a ON a.vec_id = l.vec_id
  JOIN qtab t ON t.query_id = p.query_id AND t.label = p.label
             AND t.subspace = a.subspace AND t.codeword = a.codeword
  WHERE a.vec_id <> p.query_id
  GROUP BY n.np, p.query_id, a.vec_id
"""


def ann_nprobe_recall_from_index(
    spark: SparkSession, path: str, emb: DataFrame
) -> DataFrame:
    """X10b (the nprobe tuning sweep) served from the persisted S14
    index, for EVERY index configuration — (label, raw), Lloyd-trained
    cells, residual encoding: the candidate side — coarse centroids,
    PQ codebook, per-vector codes AND cell assignments — reads the
    index (latest-wins + DISTINCT over ``ingest_seq``, the same
    at-least-once repair as the other serving twins), so a cold sweep
    never rebuilds an IVFADC from the corpus. Only the query vectors
    and the exact-eval side read ``emb`` — unavoidable, the curve
    MEASURES recall against the exact top-k. The curve states the
    INDEX's own system: for (label, raw) that is result-identical to
    the live ``ann_nprobe_recall`` (pinned by test, REST-level too);
    for trained/residual builds every per-np level is pinned against
    the already-identity-pinned fixed-np serving twins plus an
    independent exact side (no live twin states those systems).

    Corpus drift fails loud: if ``emb`` has grown (or shrunk) past the
    indexed codes, the candidate side would silently miss vectors the
    exact side ranks — the same refusal class as the S13 sweep's
    membership assertion. The repair is re-indexing or streaming the
    delta; the REST route falls back to the live operator."""
    from ..functions.views import scoped_temp_view
    from ..operators.similarity import (
        _NPROBE_ADC_RAW,
        _NPROBE_RECALL_TAIL,
        NPROBE_MAX,
    )

    meta = _index_meta(spark, path)
    corpus = emb.where("embedding IS NOT NULL")
    codes_df = _check_codes_cover_corpus(
        spark, path, corpus,
        "sweeping would mix an exact side over one corpus with a "
        "candidate side over another",
    )
    code_pairs = ", ".join(f"{s}, code_{s}" for s in range(PQ_M))
    with scoped_temp_view(
        spark.read.parquet(f"{path}/centroids"), "_annidx_centroids"
    ) as ctv, scoped_temp_view(
        spark.read.parquet(f"{path}/codebook"), "_annidx_cb"
    ) as cbv, scoped_temp_view(
        codes_df, "_annidx_codes"
    ) as cdv, scoped_temp_view(
        corpus, "_annidx_queries"
    ) as qv:
        # the live tail unchanged; its `pq_ctes` hole is filled with
        # index-backed relations — `elems` stays corpus-wide (the exact
        # side needs it), the ADC tables restrict to the query rows the
        # tail ever joins, `latest`/`assigned` unpivot the persisted
        # codes, `vec_cells` reads the INDEX's cell assignments (the
        # sweep states the persisted system, whatever its cell rule)
        common = f"""elems AS (
  SELECT vec_id, dim,
         CAST(FLOOR(v * {_PQ_SCALE} + 0.5) AS BIGINT) AS sv
  FROM ({_PQ_UNNEST_SPARK.format(src=qv)})
),
latest AS (
  -- latest-wins + the tombstone filter (delete_from_ann_index) — the
  -- sweep states the index's LIVE system
  SELECT c.* FROM {_latest_seq_subquery(spark, path, cdv)} m
  JOIN {cdv} c ON c.vec_id = m.vec_id AND c.ingest_seq = m.max_seq
),
assigned AS (
  SELECT DISTINCT vec_id, s.subspace, s.codeword
  FROM latest LATERAL VIEW stack({PQ_M}, {code_pairs}) s AS subspace, codeword
)"""
        if meta["encoding"] == "residual":
            pq_idx = common + f""",
{_CDIM_CTE.format(scale=_PQ_SCALE, cents=ctv)},
qrelems AS (
  SELECT p.query_id, p.label, e.dim, e.sv - c.csv AS rsv
  FROM probes p
  JOIN elems e ON e.vec_id = p.query_id
  JOIN cdim c ON c.label = p.label AND c.dim = e.dim
),
qtab AS (
  SELECT q.query_id, q.label, b.subspace, b.codeword,
         CAST(SUM(CAST(FLOOR(CAST(q.rsv - b.sv AS DOUBLE) / 1000.0) AS BIGINT)
                  * CAST(FLOOR(CAST(q.rsv - b.sv AS DOUBLE) / 1000.0) AS BIGINT))
              AS BIGINT) AS d
  FROM qrelems q JOIN {cbv} b ON b.dim = q.dim
  GROUP BY q.query_id, q.label, b.subspace, b.codeword
)"""
            adc = _NPROBE_ADC_RESIDUAL
        else:
            pq_idx = common + f""",
qsub AS (
  SELECT vec_id, CAST(FLOOR(dim / {PQ_SUBDIM}.0) AS BIGINT) AS subspace,
         dim, sv
  FROM elems WHERE vec_id < {N_QUERIES}
),
dists AS (
  SELECT s.vec_id, s.subspace, c.codeword,
         CAST(SUM(CAST(FLOOR(CAST(s.sv - c.sv AS DOUBLE) / 1000.0) AS BIGINT)
                  * CAST(FLOOR(CAST(s.sv - c.sv AS DOUBLE) / 1000.0) AS BIGINT))
              AS BIGINT) AS d
  FROM qsub s JOIN {cbv} c ON s.subspace = c.subspace AND s.dim = c.dim
  GROUP BY s.vec_id, s.subspace, c.codeword
)"""
            adc = _NPROBE_ADC_RAW
        return spark.sql(
            f"WITH centroids AS (SELECT label, centroid FROM {ctv})"
            + _NPROBE_RECALL_TAIL.format(
                qc_cos=cosine_expr_spark("q.embedding", "ct.centroid"),
                src=qv,
                nq=N_QUERIES,
                npmax=NPROBE_MAX,
                k=TOP_K,
                pq_ctes=pq_idx,
                vec_cells="SELECT DISTINCT vec_id, label FROM latest",
                adc=adc,
                nps=f"SELECT explode(sequence(1, {NPROBE_MAX})) AS np",
            )
        )


def ann_crossencoder_rerank_from_index(
    spark: SparkSession, path: str, emb: DataFrame
) -> DataFrame:
    """X14's serving twin: the retrieval shortlist comes from the
    persisted S14 index — raw or residual, whichever system the index
    states (the meta dispatch the fixed-np servers enforce) — and the
    rerank stage (exact-refine scorer + displacement tail) is the SAME
    code the live operator runs, so for a (label, raw) index the
    output is result-identical to the live ``ann_crossencoder_rerank``
    (pinned by test). Only the shortlist's nq × k pair rows ever reach
    the scorer — the index supplies the candidates without reading a
    corpus float, and the scorer joins back exactly 2·nq·k vectors.

    Corpus drift fails loud (same refusal as the nprobe sweep): the
    scorer joins shortlist ids back to ``emb``, so an index covering a
    different corpus would silently DROP drifted pairs and re-rank the
    remainder; the REST route falls back to the live operator."""
    from ..functions.views import scoped_temp_view
    from ..operators.dedup import cosine_expr_spark
    from ..operators.similarity import (
        _RERANK_SCORED_SQL,
        _rerank_over_scored,
    )

    meta = _index_meta(spark, path)
    _check_codes_cover_corpus(
        spark, path, emb.where("embedding IS NOT NULL"),
        "the rerank joins shortlist ids back to the corpus frame and "
        "would silently drop drifted pairs",
    )
    if meta["encoding"] == "residual":
        cand = ann_ivf_pq_residual_from_index(spark, path, emb)
    else:
        cand = ann_ivf_pq_from_index(spark, path, emb)
    with scoped_temp_view(
        cand, "_annidx_rerank_cand"
    ) as cv, scoped_temp_view(
        emb.where("embedding IS NOT NULL"), "_annidx_rerank_emb"
    ) as ev:
        scored = spark.sql(
            _RERANK_SCORED_SQL.format(
                cand=cv,
                src=ev,
                cos=cosine_expr_spark("q.embedding", "x.embedding"),
            )
        )
        return _rerank_over_scored(scored)


#: the embedding-health audits the S14 layout can persist alongside the
#: IVFADC artifacts — full-corpus scans a dashboard should read as
#: parquet, not recompute per cold call
ANN_AUDIT_NAMES = ("int8_audit", "anisotropy", "abtt")


def write_ann_audits(emb: DataFrame, path: str) -> None:
    """Persist the corpus-scan embedding-health audits (L7b int8
    quantization audit, the exact pairwise-cosine anisotropy audit, the
    ABTT mean-removal audit) under ``path/audits/`` — each is the live
    operator's own output written verbatim, so an audit-serving route
    is row-identical to the live one by construction (pinned at REST
    level). Re-run in the same slot as the index build; audits describe
    the corpus AT INDEX TIME (that staleness is the same contract as
    the codes themselves)."""
    from ..operators.llmprep import (
        embedding_abtt_audit,
        embedding_anisotropy,
        embedding_int8_audit,
    )

    for name, fn in (
        ("int8_audit", embedding_int8_audit),
        ("anisotropy", embedding_anisotropy),
        ("abtt", embedding_abtt_audit),
    ):
        fn(emb).write.mode("overwrite").parquet(f"{path}/audits/{name}")


def read_ann_audit(spark: SparkSession, path: str, name: str) -> DataFrame:
    """One persisted audit relation, in the live operator's row order
    (int8 is per-dimension — re-sorted by dim; the others are one-row)."""
    if name not in ANN_AUDIT_NAMES:
        raise ValueError(f"unknown audit {name!r}; have {ANN_AUDIT_NAMES}")
    df = spark.read.parquet(f"{path}/audits/{name}")
    return df.orderBy("dim") if name == "int8_audit" else df


def has_ann_audit(spark: SparkSession, path: str, name: str) -> bool:
    from .index_manifest import path_exists

    return path_exists(spark, f"{path}/audits/{name}")


def stream_update_ann_index(emb_stream: DataFrame, path: str, checkpoint: str):
    """Streaming INDEX maintenance (the S14 parity twin of the dedup
    index's ``stream_update_dedup_index``): arriving embeddings are
    PQ-encoded against the EXISTING persisted codebook and appended to
    ``codes/`` per micro-batch, partitioned by cell. A query through
    :func:`ann_ivf_pq_from_index` then finds neighbors ingested batches
    ago with no re-index — and still never reads a corpus float.

    Assignment drift: the persisted centroids and codebook are FROZEN
    between re-trains, so as the distribution shifts, cell means go
    stale (probe ranking degrades gracefully — recall, not
    correctness) and codeword assignments become suboptimal
    (quantization error creeps up). The periodic batch job is
    :func:`write_ann_index` re-run over the full corpus — the standard
    IVF/PQ production split (Jégou et al. 2011 train/add separation).

    Semantics: ``foreachBatch`` + parquet append is at-least-once — a
    retried batch can append its code rows twice. The read path
    de-duplicates (``SELECT DISTINCT`` over the unpivoted codes), and
    :func:`compact_ann_index` is the periodic exactly-once repair.

    Returns the started StreamingQuery (availableNow-compatible).
    """

    def _encode_batch(batch_df: DataFrame, batch_id: int) -> None:
        from ..functions.views import scoped_temp_view
        from .dedup_index import invalidate_count_row

        spark = batch_df.sparkSession
        batch_df = batch_df.where("embedding IS NOT NULL").persist()
        try:
            if not batch_df.take(1):
                return
            # the pre-counted membership is DELETED before the codes
            # grow (S13's meta ordering): a crash between the delete
            # and the append leaves no count — the drift refusal falls
            # back to counting codes/ — never a stale one
            invalidate_count_row(spark, path)
            code_cols = ",\n       ".join(
                f"MAX(CASE WHEN subspace = {s} THEN codeword END) AS code_{s}"
                for s in range(PQ_M)
            )
            # seq from DURABLE state, never batch_id: batch ids restart
            # at 0 when a checkpoint directory is reset or replaced, so
            # a re-streamed vector with a CHANGED embedding could land
            # at a seq <= its existing rows — at an equal seq both code
            # sets survive latest-wins + DISTINCT and the ADC sum adds
            # two terms per subspace, corrupting every distance for that
            # vector. 1 + max(ingest_seq) over codes/ is monotonic
            # across checkpoint lineages (0 = the batch index build);
            # the read is a single-column aggregate the parquet
            # row-group stats answer without touching code columns. A
            # retried batch whose first attempt landed re-appends at a
            # HIGHER seq with identical codes — absorbed by latest-wins,
            # and a partially-written first attempt is superseded whole.
            prev = spark.read.parquet(f"{path}/codes")
            if "ingest_seq" in prev.columns:
                max_seq = prev.selectExpr(
                    "max(ingest_seq) AS m"
                ).first().m
            else:
                max_seq = 0  # pre-sequence-tracking index = batch build
            # tombstones share the per-vector sequence total order: a
            # vector re-streamed AFTER its deletion must land at a seq
            # ABOVE its tombstone, or it would stay dead
            if _tombstones_exist(spark, path):
                max_tomb = (
                    spark.read.parquet(f"{path}/tombstones")
                    .selectExpr("max(tombstone_seq) AS m").first().m
                )
                max_seq = max(int(max_seq or 0), int(max_tomb or 0))
            with scoped_temp_view(
                batch_df, "_stream_ann_emb"
            ) as ev, scoped_temp_view(
                spark.read.parquet(f"{path}/codebook"), "_stream_ann_cb"
            ) as cbv, scoped_temp_view(
                spark.read.parquet(f"{path}/centroids"), "_stream_ann_ct"
            ) as ctv:
                # cell rule AND encoding follow the index's persisted
                # meta: a TRAINED index assigns arriving vectors to
                # their cosine-nearest persisted centroid (same SQL as
                # the batch build), a label index keeps the stored
                # label; a RESIDUAL index encodes the residual against
                # the frozen codebook — stream and batch can never
                # disagree on cells or codec
                meta = _index_meta(spark, path)
                if meta["cell_rule"] == "nearest":
                    cells_cte = _NEAREST_CELL_SQL.format(
                        src=ev,
                        cents=ctv,
                        cos=cosine_expr_spark(
                            "e.embedding", "ct.centroid"
                        ),
                    ).strip().lstrip()
                else:
                    cells_cte = (
                        f"cells AS (SELECT vec_id, label FROM {ev})"
                    )
                if meta["encoding"] == "residual":
                    sql = (
                        "WITH "
                        + _ELEMS_CTE.format(scale=_PQ_SCALE, src=ev)
                        + ",\n"
                        + _CDIM_CTE.format(scale=_PQ_SCALE, cents=ctv)
                        + ",\n"
                        + cells_cte
                        + ","
                        + _RESIDUAL_CODE_CTES.format(
                            subdim=PQ_SUBDIM,
                            rcb=(
                                "SELECT codeword, subspace, dim, sv"
                                f" FROM {cbv}"
                            ),
                        )
                        + f"""
SELECT a.vec_id, c.label,
       {code_cols},
       CAST({(max_seq or 0) + 1} AS BIGINT) AS ingest_seq
FROM assigned a JOIN cells c ON a.vec_id = c.vec_id
GROUP BY a.vec_id, c.label
"""
                    )
                else:
                    sql = _ENCODE_AGAINST_CB.format(
                        src=ev,
                        cb=cbv,
                        scale=_PQ_SCALE,
                        subdim=PQ_SUBDIM,
                        code_cols=code_cols,
                        seq=(max_seq or 0) + 1,
                        cells_cte=cells_cte,
                    )
                spark.sql(sql).write.mode("append").partitionBy(
                    "label"
                ).parquet(f"{path}/codes")
        finally:
            batch_df.unpersist()

    return (
        emb_stream.writeStream.foreachBatch(_encode_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def refresh_ann_index_manifest(spark: SparkSession, path: str) -> None:
    """Write/refresh the S14 integrity manifest (per-relation row count
    + order-independent content hash — see ``index_manifest``); the
    array-typed centroid/codebook rows hash via their deterministic
    JSON serialization. :func:`compact_ann_index` refreshes an existing
    manifest automatically."""
    from .index_manifest import ANN_INDEX_RELATIONS, refresh_index_manifest

    refresh_index_manifest(spark, path, ANN_INDEX_RELATIONS)


def validate_ann_index(spark: SparkSession, path: str) -> DataFrame:
    """Diff the on-disk index relations against the manifest — 0 rows =
    intact. Detection only: the repair is re-running
    :func:`write_ann_index` (or the streaming re-encode for codes)."""
    from .index_manifest import ANN_INDEX_RELATIONS, validate_index

    return validate_index(spark, path, ANN_INDEX_RELATIONS)


def compact_ann_index(spark: SparkSession, path: str) -> dict:
    """Periodic compaction of the streamed code relation — the same
    exactly-once repair as ``compact_dedup_index`` (shared swap helper):
    the read path's latest-wins-per-vector rule is MATERIALIZED (stale
    codes from re-streamed vectors dropped, byte-duplicate retry rows
    collapsed, tombstoned vectors physically removed and their
    tombstones retired — see :func:`delete_from_ann_index`), the
    ``label`` (cell) partitioning is preserved so a cell probe stays
    partition pruning, and re-compacting an already-compact index is a
    no-op. Centroids and codebook are overwrite-only (re-train
    artifacts) and never need compaction. Returns
    (rows_before, rows_after)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from .dedup_index import compact_relation_swap
    from .index_manifest import path_exists

    src = f"{path}/codes"
    if not path_exists(spark, src):
        # vanished codes relation: nothing to compact — leave the stale
        # manifest as the validator's evidence (flag, not crash)
        return {"relation": "codes", "rows_before": None,
                "rows_after": None}
    cols = (
        ["vec_id"]
        + [f"code_{s}" for s in range(PQ_M)]
        + ["ingest_seq", "label"]
    )
    raw = spark.read.parquet(src)
    if "ingest_seq" not in raw.columns:
        # pre-sequence-tracking index: every row is the batch build
        raw = raw.selectExpr("*", "CAST(0 AS BIGINT) AS ingest_seq")
    raw = raw.select(*cols)
    rows_before = raw.count()
    latest = (
        raw.withColumn(
            "max_seq", F.max("ingest_seq").over(Window.partitionBy("vec_id"))
        )
        .where("ingest_seq = max_seq")
        .drop("max_seq")
    )
    if _tombstones_exist(spark, path):
        # materialize the tombstone suppression (delete_from_ann_index):
        # dead vectors' rows leave the code table here, and the
        # tombstones drop WITH them — post-compaction every surviving
        # row out-sequences every tombstone by construction, so keeping
        # them would only re-suppress nothing (a re-streamed vector
        # re-enters at 1 + max regardless)
        tmax = (
            spark.read.parquet(f"{path}/tombstones")
            .groupBy("vec_id")
            .agg(F.max("tombstone_seq").alias("__ts"))
        )
        latest = (
            latest.join(tmax, "vec_id", "left")
            .where("__ts IS NULL OR ingest_seq > __ts")
            .drop("__ts")
        )
    rows_after = compact_relation_swap(
        spark, latest.distinct(), src, "label", sort_cols=cols
    )
    if _tombstones_exist(spark, path):
        from .dedup_index import _delete_path

        _delete_path(spark, f"{path}/tombstones")
    # restore the pre-counted membership the stream updater
    # invalidated (one count over the freshly compacted relation —
    # same DISTINCT non-NULL semantics as the drift refusal)
    from .dedup_index import write_count_row

    write_count_row(
        spark, path, "n_codes",
        spark.read.parquet(src)
        .where("vec_id IS NOT NULL")
        .select("vec_id").distinct().count(),
    )
    from .index_manifest import path_exists

    if path_exists(spark, f"{path}/manifest"):
        refresh_ann_index_manifest(spark, path)
    return {"relation": "codes", "rows_before": rows_before,
            "rows_after": rows_after}
