"""Corpus-level training-data operators: dedup-cluster resolution
(connected components over near-dup pairs), deterministic train/val/test
splits, vocabulary building, and TF-IDF term scoring.

These complete the dedup story (pair-finding lives in :mod:`.dedup`; a real
pipeline must then *resolve clusters* and keep one representative) and add
the corpus-statistics operators every large-scale text pipeline needs.

Scale design:

- **connected components** is iterative min-label propagation over the
  (tiny relative to the corpus) near-dup edge set: each iteration is one
  join + groupBy keyed on doc_id, converging in O(diameter) rounds —
  the standard large-graph CC under hash partitioning. The DuckDB oracle
  states the same fixpoint as a recursive CTE, so the iterative Spark
  result is checked against a declarative ground truth.
- **hash split** is a pure projection (md5-bucket) — deterministic,
  leakage-free by construction, no shuffle.
- **vocabulary / tf-idf** are explode → groupBy pipelines with bounded
  result sizes (vocab top-k; per-doc top terms via window rank).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..functions.checkpoints import durable_checkpoint
from pyspark.sql import functions as F

from ..functions.views import scoped_temp_view
from .dedup import _SHINGLES_DUCK, _TOKENS_DUCK, _TOKENS_SPARK
from .dedup import JACCARD_THRESHOLD, shingles_cte

MAX_CC_ITERATIONS = 20
CC_CHECKPOINT_EVERY = 5  # localCheckpoint cadence: truncate lineage growth
TRAIN_PCT, VAL_PCT = 80, 10  # md5-bucket split (out of 100)
VOCAB_TOP_K = 50
TFIDF_TOP_TERMS = 3


# ==========================================================================
# C1 — dedup cluster resolution (connected components over jaccard pairs)
# ==========================================================================
_EDGE_CTES = """
sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common_shingles
  FROM shingles a JOIN shingles b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
edges AS (
  SELECT doc_a, doc_b FROM common
  JOIN sizes x ON doc_a = x.doc_id
  JOIN sizes y ON doc_b = y.doc_id
  WHERE FLOOR((CAST(common_shingles AS DOUBLE) / (x.n + y.n - common_shingles)) * 10000.0 + 0.5)
           / CAST(10000.0 AS DOUBLE) >= {thr}
)"""
_EDGES_TAIL = _EDGE_CTES + """
SELECT doc_a, doc_b FROM edges
"""


def _cluster_labels(docs: DataFrame) -> DataFrame:
    """Iterative min-label propagation over the Jaccard near-dup edge set.
    Returns the unsorted (doc_id, label) frame for docs that appear in at
    least one edge — the shared core of C1 (cluster listing) and C7
    (canonical selection).

    label(v) ← min(label(v), min over neighbors) until no change
    (≤ MAX_CC_ITERATIONS — near-dup components are shallow). Each round is
    a shuffle keyed on doc_id over the edge set only.

    The converged labels go through the keyed materialized-view cache
    (same policy as shingles/band-keys/fingerprints): C1, C7 and the
    training manifest all consume this relation, and re-running the
    iterative loop per caller would repeat its ~iteration-count Spark
    jobs — label resolution is index-once/serve-many.
    """
    from .dedup import _materialized_df

    spark = docs.sparkSession
    key = docs.semanticHash()
    return _materialized_df(
        spark, "_cc_labels_mat", key, lambda: _propagate_labels(docs)
    )


def _propagate_labels(docs: DataFrame) -> DataFrame:
    spark = docs.sparkSession
    with shingles_cte(docs) as hdr:
        edges = spark.sql(
            hdr.rstrip().rstrip(",")
            + ",\n"
            + _EDGES_TAIL.format(thr=JACCARD_THRESHOLD)
        )
    # undirected adjacency
    adj = edges.selectExpr("doc_a AS src", "doc_b AS dst").union(
        edges.selectExpr("doc_b AS src", "doc_a AS dst")
    )
    adj = adj.cache()
    labels = (
        adj.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
    )
    # Each round: eagerly localCheckpoint the stepped frame — materializes
    # it once (MEMORY_AND_DISK on executors) AND truncates lineage to an
    # RDD scan, so both plan depth and driver-side re-analysis cost stay
    # O(1) per round instead of growing with the iteration count (the
    # 100 TB recompute cliff flagged in r1). The convergence check is a
    # single aggregate over the checkpointed frame — no separate take().
    # localCheckpoint trades executor-loss fault tolerance for speed; on a
    # real cluster a reliable-checkpoint cadence (CC_CHECKPOINT_EVERY) to
    # HDFS would back it — the standard iterative-graph pattern.
    for _ in range(MAX_CC_ITERATIONS):
        # candidate labels arriving over edges
        incoming = (
            adj.join(labels, adj["src"] == labels["doc_id"])
            .groupBy(F.col("dst").alias("doc_id"))
            .agg(F.min("label").alias("nbr_label"))
        )
        stepped = labels.join(incoming, "doc_id", "left").select(
            "doc_id",
            F.least(
                F.col("label"), F.coalesce("nbr_label", F.col("label"))
            ).alias("label"),
            (F.coalesce("nbr_label", F.col("label")) < F.col("label"))
            .cast("long")
            .alias("chg"),
        )
        stepped = durable_checkpoint(stepped)
        n_changed = stepped.agg(F.sum("chg")).first()[0] or 0
        labels = stepped.select("doc_id", "label")
        if n_changed == 0:
            break
    adj.unpersist()
    return labels


def dedup_clusters(docs: DataFrame) -> DataFrame:
    """C1: resolve near-dup pairs (n-gram Jaccard ≥ τ) into clusters via
    min-label propagation; keeper = cluster id = min doc_id. Returns one
    row per clustered document (cluster_id, doc_id, cluster_size,
    is_keeper), ordered."""
    labels = _cluster_labels(docs)
    sizes = labels.groupBy(F.col("label").alias("cluster_id")).agg(
        F.count("*").alias("cluster_size")
    )
    return (
        labels.join(sizes, labels["label"] == sizes["cluster_id"])
        .select(
            "cluster_id",
            "doc_id",
            "cluster_size",
            (F.col("doc_id") == F.col("cluster_id")).alias("is_keeper"),
        )
        .orderBy("cluster_id", "doc_id")
    )


#: the recursive connected-components CTE chain (shared with the
#: training-manifest composition in :mod:`.llmprep`)
CC_ORACLE_CTES = """
undirected AS (
  SELECT doc_a AS src, doc_b AS dst FROM edges
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM edges
),
reach(a, b) AS (
  SELECT src, src FROM undirected
  UNION
  SELECT r.a, u.dst FROM reach r JOIN undirected u ON r.b = u.src
),
clustered AS (
  SELECT a AS doc_id, MIN(b) AS cluster_id FROM reach GROUP BY a
)"""

ORACLE_DEDUP_CLUSTERS = (
    "WITH RECURSIVE shingles AS ("
    + _SHINGLES_DUCK
    + "),\n"
    + _EDGE_CTES.format(thr=JACCARD_THRESHOLD)
    + ","
    + CC_ORACLE_CTES
    + """,
cluster_sizes AS (SELECT cluster_id, COUNT(*) AS cluster_size
          FROM clustered GROUP BY cluster_id)
SELECT c.cluster_id, c.doc_id, s.cluster_size,
       (c.doc_id = c.cluster_id) AS is_keeper
FROM clustered c JOIN cluster_sizes s USING (cluster_id)
ORDER BY cluster_id, doc_id
"""
)


# ==========================================================================
# C1b — dedup-cluster audit summary (one-row dashboard metric)
# ==========================================================================
def dedup_cluster_stats(docs: DataFrame) -> DataFrame:
    """C1b: one-row near-dup audit — corpus size, docs caught in near-dup
    clusters, cluster count, the largest cluster (a runaway largest
    cluster is THE dedup-quality alarm: a too-low τ chains the corpus
    together), redundant docs (what keep-canonical would drop), and the
    redundant fraction. The number a corpus dashboard tracks per drop.

    Scale shape: rides C1's label propagation (shared shingle/edge
    caches); the stats are two one-row aggregates cross-joined."""
    cl = dedup_clusters(docs)
    cs = cl.groupBy("cluster_id").agg(F.count("*").alias("n"))
    agg = cs.agg(
        F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("n_clustered_docs"),
        F.count("*").cast("long").alias("n_clusters"),
        F.coalesce(F.max("n"), F.lit(0)).cast("long").alias("largest_cluster"),
    )
    tot = docs.agg(F.count("*").cast("long").alias("n_docs"))
    return tot.crossJoin(agg).selectExpr(
        "n_docs",
        "n_clustered_docs",
        "n_clusters",
        "largest_cluster",
        "n_clustered_docs - n_clusters AS n_redundant_docs",
        "CASE WHEN n_docs = 0 THEN CAST(0.0 AS DOUBLE)"
        " ELSE FLOOR((CAST(n_clustered_docs - n_clusters AS DOUBLE) / n_docs)"
        " * 10000.0 + 0.5) / CAST(10000.0 AS DOUBLE) END AS dup_doc_frac",
    )


ORACLE_DEDUP_CLUSTER_STATS = (
    "WITH RECURSIVE shingles AS ("
    + _SHINGLES_DUCK
    + "),\n"
    + _EDGE_CTES.format(thr=JACCARD_THRESHOLD)
    + ","
    + CC_ORACLE_CTES
    + """,
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
cs AS (SELECT cluster_id, COUNT(*) AS n FROM clustered GROUP BY cluster_id),
agg AS (SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) AS n_clustered_docs,
               CAST(COUNT(*) AS BIGINT) AS n_clusters,
               CAST(COALESCE(MAX(n), 0) AS BIGINT) AS largest_cluster
        FROM cs)
SELECT t.n_docs, a.n_clustered_docs, a.n_clusters, a.largest_cluster,
       a.n_clustered_docs - a.n_clusters AS n_redundant_docs,
       CASE WHEN t.n_docs = 0 THEN CAST(0.0 AS DOUBLE)
            ELSE FLOOR((CAST(a.n_clustered_docs - a.n_clusters AS DOUBLE)
                        / t.n_docs) * 10000.0 + 0.5)
                 / CAST(10000.0 AS DOUBLE) END AS dup_doc_frac
FROM tot t CROSS JOIN agg a
"""
)


# ==========================================================================
# C7 — canonical-document selection (cluster → keep best by quality)
# ==========================================================================
def _quality_ctes(for_spark: bool, src: str) -> str:
    """(doc_id, quality_score) CTE chain — the T3 scoring formula inlined
    from :mod:`.textprep` so the keep-rule is the same model users already
    run standalone. Engine-specific only in the token/regexp spellings."""
    from .textprep import _QUALITY_EXPR, _R4, QUALITY_STOPWORDS, _in_list

    stop = _in_list(QUALITY_STOPWORDS)
    toks = _TOKENS_SPARK if for_spark else _TOKENS_DUCK
    if for_spark:
        counts = (
            f"size({toks}) AS n_tokens,"
            f" size(array_distinct({toks})) AS n_distinct_tokens,"
            f" size(filter({toks}, x -> x IN ({stop}))) AS stop_hits"
        )
        punct = "regexp_replace(text, '[^a-z0-9 ]', '')"
    else:
        counts = (
            f"len({toks}) AS n_tokens,"
            f" len(list_distinct({toks})) AS n_distinct_tokens,"
            f" len(list_filter({toks}, x -> x IN ({stop}))) AS stop_hits"
        )
        punct = "regexp_replace(text, '[^a-z0-9 ]', '', 'g')"
    # empty/NULL-text guards mirror textprep's T3 exactly (zero-length
    # text and zero-token docs ratio to 0.0 — Spark's ANSI mode throws
    # on the raw division; this inlined copy missed the guard once)
    punct_ratio = (
        "CASE WHEN length(text) = 0 OR text IS NULL THEN CAST(0.0 AS DOUBLE)"
        " ELSE "
        + _R4.format(
            x=f"CAST(length(text) - length({punct}) AS DOUBLE) / length(text)"
        )
        + " END"
    )
    stop_ratio = (
        "CASE WHEN n_tokens = 0 THEN CAST(0.0 AS DOUBLE) ELSE "
        + _R4.format(x="CAST(stop_hits AS DOUBLE) / n_tokens")
        + " END"
    )
    return f"""
qbase AS (
  SELECT doc_id, {counts}, {punct_ratio} AS punct_ratio FROM {src}
),
qratio AS (SELECT *, {stop_ratio} AS stop_ratio FROM qbase),
quality AS (SELECT doc_id, {_QUALITY_EXPR} AS quality_score FROM qratio)"""


#: the C7 ranking chain (assigned/csizes/ranked) — shared by the per-doc
#: keep report (C7) and the per-source survivorship fold (C7b)
_CANON_CTES = """
assigned AS (
  SELECT q.doc_id, COALESCE(c.cluster_id, q.doc_id) AS cluster_id,
         q.quality_score
  FROM quality q LEFT JOIN clustered c ON c.doc_id = q.doc_id
),
csizes AS (
  SELECT cluster_id, COUNT(*) AS cluster_size FROM assigned GROUP BY cluster_id
),
ranked AS (
  SELECT a.*, ROW_NUMBER() OVER (PARTITION BY a.cluster_id
                                 ORDER BY a.quality_score DESC, a.doc_id) AS rnk
  FROM assigned a
)"""

_CANON_TAIL = _CANON_CTES + """
SELECT r.doc_id, r.cluster_id, s.cluster_size, r.quality_score,
       (r.rnk = 1) AS is_canonical
FROM ranked r JOIN csizes s ON s.cluster_id = r.cluster_id
ORDER BY r.doc_id
"""

_SURV_TAIL = _CANON_CTES + """,
surv AS (
  SELECT d.source, r.rnk, q.n_tokens
  FROM ranked r
  JOIN {src} d ON r.doc_id = d.doc_id
  JOIN qratio q ON q.doc_id = r.doc_id
),
sagg AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(CASE WHEN rnk = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_docs_kept,
         CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) AS n_tokens,
         CAST(COALESCE(SUM(CASE WHEN rnk = 1 THEN n_tokens END), 0)
              AS BIGINT) AS n_tokens_kept
  FROM surv GROUP BY source
)
SELECT source, n_docs, n_docs_kept,
       FLOOR(CAST(n_docs_kept AS DOUBLE) * 10000.0 / n_docs + 0.5)
         / CAST(10000.0 AS DOUBLE) AS doc_kept_rate,
       n_tokens, n_tokens_kept,
       CASE WHEN n_tokens = 0 THEN CAST(0.0 AS DOUBLE)
            ELSE FLOOR(CAST(n_tokens_kept AS DOUBLE) * 10000.0
                       / n_tokens + 0.5) / CAST(10000.0 AS DOUBLE)
       END AS token_kept_rate
FROM sagg
ORDER BY source
"""


def dedup_keep_canonical(docs: DataFrame) -> DataFrame:
    """C7: the end-to-end dedup keep-rule — near-dup clusters (C1's
    min-label propagation over the Jaccard edge set) joined with the T3
    quality score; each cluster keeps its highest-quality member (ties:
    lowest doc_id), singletons keep themselves. One row per document with
    its cluster, the cluster size, and the keep decision — what a real
    pipeline materializes before the drop pass.

    Scale shape: labels exist only for docs with at least one near-dup
    edge (a small fraction of the corpus), so the label join is a
    broadcast against the full-corpus quality projection; the rank window
    shuffles (doc_id, cluster_id, score) triples only — document text
    never moves. The oracle states the same fixpoint declaratively
    (recursive CTE) — an independent plan checking the iterative result.
    """
    spark = docs.sparkSession
    labels = _cluster_labels(docs).selectExpr(
        "doc_id", "label AS cluster_id"
    )
    with scoped_temp_view(docs, "_corpus_docs") as dv, scoped_temp_view(
        labels, "_cc_labels"
    ) as lv:
        return spark.sql(
            f"WITH clustered AS (SELECT doc_id, cluster_id FROM {lv}),"
            + _quality_ctes(for_spark=True, src=dv)
            + ","
            + _CANON_TAIL
        )


ORACLE_KEEP_CANONICAL = (
    "WITH RECURSIVE shingles AS ("
    + _SHINGLES_DUCK
    + "),\n"
    + _EDGE_CTES.format(thr=JACCARD_THRESHOLD)
    + ","
    + CC_ORACLE_CTES
    + ","
    + _quality_ctes(for_spark=False, src="documents")
    + ","
    + _CANON_TAIL
)


def dedup_survivorship(docs: DataFrame) -> DataFrame:
    """C7b: per-source survivorship under the C7 keep rule — how many
    documents and whitespace tokens each source retains once every
    near-dup cluster keeps only its best member. The table a mix
    planner reads next to C13/C15: a source whose token_kept_rate
    collapses is mostly recycled content, and its raw size overstates
    its contribution to the training budget.

    Scale shape: rides C7's chain unchanged (labels exist only for
    edge-bearing docs; the rank window shuffles id/score triples,
    never text), then joins the rank relation back to (doc_id, source)
    and folds to #sources rows. NULL source is a real group."""
    spark = docs.sparkSession
    labels = _cluster_labels(docs).selectExpr(
        "doc_id", "label AS cluster_id"
    )
    with scoped_temp_view(docs, "_corpus_docs") as dv, scoped_temp_view(
        labels, "_cc_labels"
    ) as lv:
        return spark.sql(
            f"WITH clustered AS (SELECT doc_id, cluster_id FROM {lv}),"
            + _quality_ctes(for_spark=True, src=dv)
            + ","
            + _SURV_TAIL.format(src=dv)
        )


def dedup_retention_ids(docs: DataFrame) -> DataFrame:
    """C7c: the DROP side of the C7 keep rule — the ``(doc_id)`` set of
    near-dup cluster LOSERS (every clustered doc except its cluster's
    highest-quality member). This is the frame a real pipeline feeds to
    the index deletion APIs after a dedup decision:
    ``sources.maintenance.run_retention_pass`` hands it to
    ``delete_from_dedup_index`` / ``delete_from_ann_index`` /
    ``delete_from_knn_graph`` so every durable index forgets exactly
    what the corpus dropped.

    Scale shape: C7's chain unchanged (labels exist only for edge-
    bearing docs; the rank window shuffles id/score triples, never
    text) with a rank>1 filter — singletons and canonicals never
    surface, so the result is bounded by the clustered fraction."""
    return (
        dedup_keep_canonical(docs)
        .where("NOT is_canonical")
        .select("doc_id")
        .orderBy("doc_id")
    )


ORACLE_RETENTION_IDS = (
    "SELECT doc_id FROM ("
    + ORACLE_KEEP_CANONICAL
    + ") WHERE NOT is_canonical ORDER BY doc_id"
)


ORACLE_DEDUP_SURVIVORSHIP = (
    "WITH RECURSIVE shingles AS ("
    + _SHINGLES_DUCK
    + "),\n"
    + _EDGE_CTES.format(thr=JACCARD_THRESHOLD)
    + ","
    + CC_ORACLE_CTES
    + ","
    + _quality_ctes(for_spark=False, src="documents")
    + ","
    + _SURV_TAIL.format(src="documents")
)


# ==========================================================================
# C2 — deterministic hash split (train/val/test)
# ==========================================================================
def _split_case(bucket_expr: str) -> str:
    return (
        f"CASE WHEN {bucket_expr} < {TRAIN_PCT} THEN 'train' "
        f"WHEN {bucket_expr} < {TRAIN_PCT + VAL_PCT} THEN 'val' "
        f"ELSE 'test' END"
    )


# md5 first 2 hex chars → 0..255 → % 100; identical text in both engines
_BUCKET = (
    "(((position(substr(md5(CAST(doc_id AS {STR})), 1, 1) IN '0123456789abcdef') - 1) * 16"
    " + (position(substr(md5(CAST(doc_id AS {STR})), 2, 1) IN '0123456789abcdef') - 1)) % 100)"
)


def hash_split(docs: DataFrame) -> DataFrame:
    """C2: leakage-free deterministic split — md5(doc_id) buckets into
    {t}% train / {v}% val / rest test; summary per (lang, split). A pure
    projection + one small groupBy: stable under re-runs, re-shards, and
    engine changes (the property random() splits lack).""".format(
        t=TRAIN_PCT, v=VAL_PCT
    )
    bucket = _BUCKET.format(STR="STRING")
    return (
        docs.selectExpr("lang", f"{_split_case(bucket)} AS split")
        .groupBy("lang", "split")
        .count()
        .withColumnRenamed("count", "n_docs")
        .orderBy("lang", "split")
    )


ORACLE_HASH_SPLIT = f"""
SELECT lang, {_split_case(_BUCKET.format(STR="VARCHAR"))} AS split,
       COUNT(*) AS n_docs
FROM documents
GROUP BY lang, 2
ORDER BY lang, split
"""


# ==========================================================================
# C3 — vocabulary builder (global token stats, top-k)
# ==========================================================================
_VOCAB_TAIL = """
tok AS ({tokens}),
stats AS (
  SELECT tok AS token,
         COUNT(*) AS term_count,
         COUNT(DISTINCT doc_id) AS doc_freq
  FROM tok GROUP BY tok
),
topk AS (
  -- top-k FIRST (Spark: distributed TakeOrderedAndProject), THEN rank
  -- the <=k survivors. Ranking before limiting would single-partition
  -- the entire distinct-token relation through one ROW_NUMBER window —
  -- hundreds of millions of rows through one partition at 100 TB.
  SELECT token, term_count, doc_freq
  FROM stats
  ORDER BY term_count DESC, token
  LIMIT {k}
)
SELECT token, term_count, doc_freq,
       ROW_NUMBER() OVER (ORDER BY term_count DESC, token) AS rank
FROM topk
ORDER BY rank
"""


def vocabulary(docs: DataFrame) -> DataFrame:
    """C3: global token counts + document frequency, top-{k} by count.
    One explode + one groupBy (map-side combine); vocab result is bounded
    by LIMIT regardless of corpus size.""".format(k=VOCAB_TOP_K)
    with scoped_temp_view(docs, "_corpus_docs") as dv:
        tokens = (
            "SELECT doc_id, tok FROM (SELECT doc_id, "
            f"posexplode({_TOKENS_SPARK}) AS (pos, tok) FROM {dv})"
        )
        return docs.sparkSession.sql(
            "WITH " + _VOCAB_TAIL.format(tokens=tokens, k=VOCAB_TOP_K)
        )


ORACLE_VOCABULARY = "WITH " + _VOCAB_TAIL.format(
    tokens=f"SELECT doc_id, unnest({_TOKENS_DUCK}) AS tok FROM documents",
    k=VOCAB_TOP_K,
)


# ==========================================================================
# C4 — TF-IDF top terms per document
# ==========================================================================
_TFIDF_TAIL = """
tok AS ({tokens}),
tf AS (SELECT doc_id, tok AS token, COUNT(*) AS tf FROM tok GROUP BY doc_id, tok),
df AS (SELECT token, COUNT(*) AS doc_freq FROM tf GROUP BY token),
n AS (SELECT COUNT(*) AS n_docs FROM {docsrc}),
scored AS (
  SELECT tf.doc_id, tf.token, tf.tf, df.doc_freq,
         FLOOR((tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.doc_freq)) * 1000000.0 + 0.5)
           / CAST(1000000.0 AS DOUBLE) AS tfidf
  FROM tf JOIN df ON tf.token = df.token CROSS JOIN n
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY tfidf DESC, token) AS rnk
  FROM scored
)
SELECT doc_id, token, tf, doc_freq, tfidf, rnk
FROM ranked WHERE rnk <= {top}
ORDER BY doc_id, rnk
"""


def tfidf_top_terms(docs: DataFrame) -> DataFrame:
    """C4: classic TF-IDF, top-{t} terms per document. tf/df are two
    groupBys over the exploded tokens; idf joins the (vocab-sized) df
    table — broadcast at any corpus scale.""".format(t=TFIDF_TOP_TERMS)
    with scoped_temp_view(docs, "_corpus_docs") as dv:
        tokens = (
            "SELECT doc_id, tok FROM (SELECT doc_id, "
            f"posexplode({_TOKENS_SPARK}) AS (pos, tok) FROM {dv})"
        )
        return docs.sparkSession.sql(
            "WITH "
            + _TFIDF_TAIL.format(
                tokens=tokens, docsrc=dv, top=TFIDF_TOP_TERMS
            )
        )


ORACLE_TFIDF = "WITH " + _TFIDF_TAIL.format(
    tokens=f"SELECT doc_id, unnest({_TOKENS_DUCK}) AS tok FROM documents",
    docsrc="documents",
    top=TFIDF_TOP_TERMS,
)


# ==========================================================================
# C5 — per-document OOV rate vs the corpus top-K vocabulary
# ==========================================================================
#: closed-vocabulary size for the OOV eval — smaller than the synthetic
#: corpus's distinct-token count (31) so real OOV mass exists; at
#: production scale this is the tokenizer's vocab loaded as a table.
OOV_VOCAB_K = 20

_OOV_TAIL = """
counts AS (SELECT tok AS token, COUNT(*) AS term_count FROM tok GROUP BY tok),
vocab AS (
  SELECT token FROM (
    SELECT token,
           ROW_NUMBER() OVER (ORDER BY term_count DESC, token) AS rank
    FROM counts
  ) WHERE rank <= {k}
),
per_doc AS (
  SELECT t.doc_id,
         COUNT(*) AS n_tokens,
         COUNT(*) - COUNT(v.token) AS n_oov
  FROM tok t LEFT JOIN vocab v ON v.token = t.tok
  GROUP BY t.doc_id
)
SELECT doc_id, n_tokens, n_oov,
       FLOOR((CAST(n_oov AS DOUBLE) / CAST(n_tokens AS DOUBLE))
             * 10000.0 + 0.5) / CAST(10000.0 AS DOUBLE) AS oov_frac
FROM per_doc
ORDER BY doc_id
"""


def oov_rate(docs: DataFrame) -> DataFrame:
    """C5: per-document out-of-vocabulary rate against the corpus's own
    top-{k} token vocabulary — the tokenizer-coverage eval a training
    pipeline runs before committing to a vocab (high-OOV docs are noise
    or the wrong language/domain).

    Scale shape: the token relation is built ONCE and persisted (it feeds
    both the vocabulary ranking and the coverage join — Spark would
    inline-recompute the explode otherwise); the vocabulary is top-{k}
    rows → the coverage join broadcasts it. Wide exchanges are keyed on
    token (for the bounded vocab agg) and doc_id only.""".format(k=OOV_VOCAB_K)
    spark = docs.sparkSession
    # keyed cache (not ad-hoc persist): a bare .persist() is matched by
    # Spark's CacheManager on logical-plan equality, which serves stale
    # rows if the same path is rewritten — see dedup.clear_materialized_caches
    tok = _materialized_tok_df(docs)
    with scoped_temp_view(tok, "_corpus_tok") as tv:
        return spark.sql(
            f"WITH tok AS (SELECT doc_id, tok FROM {tv}),\n"
            + _OOV_TAIL.format(k=OOV_VOCAB_K)
        )


ORACLE_OOV_RATE = (
    f"WITH tok AS (SELECT doc_id, unnest({_TOKENS_DUCK}) AS tok FROM documents),\n"
    + _OOV_TAIL.format(k=OOV_VOCAB_K)
)


# ==========================================================================
# C6 — per-document unigram LM surprisal (CCNet-style quality signal)
# ==========================================================================
# Per-token negative log-probability is snapped to integer micro-nats
# BEFORE the per-document SUM: integer sums are exact in any aggregation
# order, so the (order-sensitive) float accumulation that would differ
# between Spark's partial aggregates and DuckDB's single-node scan never
# happens. The only float ops are the ln() and the final divisions, both
# over identical inputs in both engines.
_UNIGRAM_CTES = """
counts AS (SELECT tok AS token, COUNT(*) AS c FROM tok GROUP BY tok),
total AS (SELECT SUM(c) AS n FROM counts),
scored AS (
  SELECT t.doc_id,
         CAST(FLOOR(-ln(CAST(c.c AS DOUBLE) / CAST(tt.n AS DOUBLE))
                    * 1000000.0 + 0.5) AS BIGINT) AS nll_micro
  FROM tok t JOIN counts c ON c.token = t.tok CROSS JOIN total tt
),
per_doc AS (
  -- CAST: DuckDB SUM(BIGINT) yields HUGEINT (harness-canonicalized as
  -- float); Spark yields BIGINT. Pin both engines to BIGINT.
  SELECT doc_id, COUNT(*) AS n_tokens,
         CAST(SUM(nll_micro) AS BIGINT) AS total_nll_micro
  FROM scored GROUP BY doc_id
)"""

_UNIGRAM_TAIL = _UNIGRAM_CTES + """
SELECT doc_id, n_tokens, total_nll_micro,
       FLOOR((CAST(total_nll_micro AS DOUBLE) / CAST(n_tokens AS DOUBLE)
              / 1000000.0) * 10000.0 + 0.5) / CAST(10000.0 AS DOUBLE) AS avg_nll,
       FLOOR((CAST(total_nll_micro AS DOUBLE) / CAST(n_tokens AS DOUBLE)
              / 1000000.0 / ln(2.0)) * 10000.0 + 0.5) / CAST(10000.0 AS DOUBLE)
         AS bits_per_token
FROM per_doc
ORDER BY doc_id
"""


def unigram_logprob(docs: DataFrame) -> DataFrame:
    """C6: per-document average surprisal under the corpus's own unigram
    LM — the CCNet-style perplexity quality signal (docs whose tokens are
    improbable under the corpus distribution are noise/outliers; docs of
    pure boilerplate score abnormally low).

    Scale shape: the token relation is built once and persisted (shared
    with C5's keyed cache); the LM table is vocab-sized → the scoring join
    broadcasts it; the scalar corpus total broadcasts trivially. Wide
    exchanges are keyed on token (bounded vocab agg) and doc_id only —
    document text itself never shuffles.
    """
    spark = docs.sparkSession
    tok = _materialized_tok_df(docs)
    with scoped_temp_view(tok, "_corpus_tok") as tv:
        return spark.sql(
            f"WITH tok AS (SELECT doc_id, tok FROM {tv}),\n" + _UNIGRAM_TAIL
        )


ORACLE_UNIGRAM_LOGPROB = (
    f"WITH tok AS (SELECT doc_id, unnest({_TOKENS_DUCK}) AS tok FROM documents),\n"
    + _UNIGRAM_TAIL
)


# ==========================================================================
# C10 — CCNet-style perplexity buckets (head / middle / tail)
# ==========================================================================
# CCNet (Wenzek et al. 2020, public arXiv:1911.00359) splits a crawled
# corpus into head/middle/tail TERTILES by language-model perplexity and
# trains preferentially on the head. Here the LM is C6's own unigram
# model (self-contained — no external artifact), the metric is integer
# micro-nats per token, and the tertile boundary comes from an exact
# corpus-wide rank computed with the same two-level bucket rank as C8:
# rank within a 0.1-nat coarse bucket (partitioned window) plus the
# bucket's offset (window over the tiny bucket-count relation) — no
# corpus-wide single-partition window. Ties break by doc_id, so both
# engines bucket identically even at tertile boundaries.
#: the per-doc coarse-bucketed surprisal relation (everything above the
#: rank fold) — split out so the Spark side can MATERIALIZE it once per
#: corpus (see :func:`perplexity_buckets`); `_PPL_TAIL` concatenates the
#: two halves back, so the oracle spelling is byte-identical to r14's
_PPL_COARSE_CTES = _UNIGRAM_CTES + """,
permetric AS (
  SELECT doc_id, n_tokens, total_nll_micro,
         CAST(FLOOR(CAST(total_nll_micro AS DOUBLE) / n_tokens) AS BIGINT)
           AS nll_per_tok_micro
  FROM per_doc
),
coarse AS (
  SELECT *, CAST(FLOOR(CAST(nll_per_tok_micro AS DOUBLE) / 100000.0) AS BIGINT)
              AS cb
  FROM permetric
)"""

_PPL_BUCKET_TAIL = """,
bcounts AS (SELECT cb, COUNT(*) AS c FROM coarse GROUP BY cb),
boffsets AS (
  SELECT cb, CAST(COALESCE(SUM(c) OVER (ORDER BY cb ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS off
  FROM bcounts
),
ranked AS (
  SELECT c.doc_id, c.n_tokens, c.nll_per_tok_micro,
         ROW_NUMBER() OVER (PARTITION BY c.cb
                            ORDER BY c.nll_per_tok_micro, c.doc_id) + o.off
           AS rnk
  FROM coarse c JOIN boffsets o ON c.cb = o.cb
),
tot AS (SELECT COUNT(*) AS n FROM ranked)
SELECT doc_id, n_tokens, nll_per_tok_micro, rnk AS ppl_rank,
       CASE WHEN rnk <= CAST(FLOOR(n / 3.0) AS BIGINT) THEN 'head'
            WHEN rnk <= CAST(FLOOR(2.0 * n / 3.0) AS BIGINT) THEN 'middle'
            ELSE 'tail' END AS ppl_bucket
FROM ranked CROSS JOIN tot
ORDER BY doc_id
"""

_PPL_TAIL = _PPL_COARSE_CTES + _PPL_BUCKET_TAIL


def _materialized_ppl_coarse(docs: DataFrame) -> DataFrame:
    """The per-doc (doc_id, n_tokens, nll_per_tok_micro, cb) relation —
    the whole unigram-LM chain above the rank fold — built ONCE per
    corpus and persisted through the module cache. The single-WITH
    spelling re-inlined the chain at every downstream CTE reference
    (coarse ×2, ranked ×2 — measured 97 parquet-scan mentions and
    ~4.5 s warm at sf0.1; the same WithCTE cache-blindness the r14
    serving twins were composed around), so the rank fold now runs over
    this docs-count-sized cached relation instead."""
    from .dedup import _materialized_df

    spark = docs.sparkSession

    def build():
        tok = _materialized_tok_df(docs)
        with scoped_temp_view(tok, "_corpus_tok") as tv:
            return spark.sql(
                f"WITH tok AS (SELECT doc_id, tok FROM {tv}),\n"
                + _PPL_COARSE_CTES
                + "\nSELECT doc_id, n_tokens, nll_per_tok_micro, cb"
                  " FROM coarse"
            )

    return _materialized_df(
        spark, "_corpus_ppl_coarse", docs.semanticHash(), build
    )


def perplexity_buckets(docs: DataFrame) -> DataFrame:
    """C10: CCNet-style head/middle/tail perplexity tertiles under the
    corpus's own unigram LM — the standard quality partitioning a crawl
    pipeline applies before sampling. See the block comment for the
    ranking scheme and determinism invariants.

    The per-doc surprisal relation is materialized once per corpus
    (:func:`_materialized_ppl_coarse`) and the rank fold is
    DataFrame-composed, NOT a WITH query — the cache manager refuses to
    substitute InMemoryRelations anywhere in a plan containing a WithCTE
    node (the r14 serving-twin finding), so the CTE spelling re-ran the
    whole unigram chain at every downstream reference. Expressions are
    copied verbatim from ``_PPL_BUCKET_TAIL``; the oracle keeps the
    one-WITH spelling, so the two formulations differentially check
    each other (pytest parity + driver window)."""
    from pyspark.sql import functions as F

    coarse = _materialized_ppl_coarse(docs)
    bcounts = coarse.groupBy("cb").agg(F.expr("COUNT(*) AS c"))
    boffsets = bcounts.selectExpr(
        "cb",
        "CAST(COALESCE(SUM(c) OVER (ORDER BY cb ASC"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)"
        " AS BIGINT) AS off",
    )
    ranked = coarse.join(boffsets, "cb").selectExpr(
        "doc_id",
        "n_tokens",
        "nll_per_tok_micro",
        "ROW_NUMBER() OVER (PARTITION BY cb"
        " ORDER BY nll_per_tok_micro, doc_id) + off AS rnk",
    )
    # the SQL tail's `tot` counts FROM ranked; the inner join preserves
    # coarse's cardinality exactly (boffsets carries every cb once), so
    # counting the CACHED coarse relation is the same number without a
    # second pass over the ranked plan
    tot = coarse.agg(F.expr("COUNT(*) AS n"))
    return (
        ranked.crossJoin(F.broadcast(tot))
        .selectExpr(
            "doc_id",
            "n_tokens",
            "nll_per_tok_micro",
            "rnk AS ppl_rank",
            "CASE WHEN rnk <= CAST(FLOOR(n / 3.0) AS BIGINT) THEN 'head'"
            " WHEN rnk <= CAST(FLOOR(2.0 * n / 3.0) AS BIGINT)"
            " THEN 'middle' ELSE 'tail' END AS ppl_bucket",
        )
        .orderBy("doc_id")
    )


ORACLE_PPL_BUCKETS = (
    f"WITH tok AS (SELECT doc_id, unnest({_TOKENS_DUCK}) AS tok FROM documents),\n"
    + _PPL_TAIL
)


# ==========================================================================
# C16 — curriculum stages (the difficulty-staged sampling schedule)
# ==========================================================================
#: Curriculum learning (Bengio et al. 2009, public ICML) orders training
#: easy→hard; for text the standard difficulty proxy is LM surprisal
#: (the C6/C10 signal). This op emits the artifact a curriculum run
#: hands to its sampler: documents exactly-quartiled by per-token
#: surprisal into {s} stages, folded to per-(stage, source) cells with
#: doc/token budgets, mean difficulty, and each source's token share
#: WITHIN its stage — the interaction per-doc buckets (C10) and global
#: mixes (C13/C15) both miss: "is stage 1 (easy) secretly 90% one
#: source?", which would make early training a single-domain fit.
#:
#: Ranking is the proven two-level exact rank (coarse 0.1-nat bucket
#: window + bucket-offset fold — never a corpus-wide single-partition
#: window); stage = ⌊(rank−1)·S/n⌋+1 clamped to S, identical in both
#: engines (exact small-int products into one double division).
#: Token-less documents carry no surprisal evidence and are excluded.
CURRICULUM_STAGES = 4

_CURRICULUM_TAIL = _UNIGRAM_CTES + """,
permetric AS (
  SELECT doc_id, n_tokens,
         CAST(FLOOR(CAST(total_nll_micro AS DOUBLE) / n_tokens) AS BIGINT)
           AS nll_per_tok_micro
  FROM per_doc
),
coarse AS (
  SELECT *, CAST(FLOOR(CAST(nll_per_tok_micro AS DOUBLE) / 100000.0)
                 AS BIGINT) AS cb
  FROM permetric
),
bcounts AS (SELECT cb, COUNT(*) AS c FROM coarse GROUP BY cb),
boffsets AS (
  SELECT cb, CAST(COALESCE(SUM(c) OVER (ORDER BY cb ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS off
  FROM bcounts
),
ranked AS (
  SELECT c.doc_id, c.n_tokens, c.nll_per_tok_micro,
         ROW_NUMBER() OVER (PARTITION BY c.cb
                            ORDER BY c.nll_per_tok_micro, c.doc_id) + o.off
           AS rnk
  FROM coarse c JOIN boffsets o ON c.cb = o.cb
),
tot AS (SELECT COUNT(*) AS n FROM ranked),
staged AS (
  SELECT r.doc_id, r.n_tokens, r.nll_per_tok_micro,
         CAST(LEAST(FLOOR((r.rnk - 1) * {stages}.0 / t.n) + 1, {stages})
              AS BIGINT) AS stage
  FROM ranked r CROSS JOIN tot t
),
cells AS (
  SELECT s.stage, d.source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(s.n_tokens) AS BIGINT) AS n_tokens,
         CAST(SUM(s.nll_per_tok_micro) AS BIGINT) AS nll_sum
  FROM staged s JOIN {docsrc} d ON s.doc_id = d.doc_id
  GROUP BY s.stage, d.source
)
SELECT stage, source, n_docs, n_tokens,
       FLOOR((CAST(nll_sum AS DOUBLE) / n_docs / 1000000.0)
             * 10000.0 + 0.5) / CAST(10000.0 AS DOUBLE) AS mean_difficulty,
       -- stage totals via a stage-partitioned window over the tiny cells
       -- relation (NOT a stage_tot self-join: Spark inlines CTEs, so a
       -- second reference to `cells` would duplicate the entire upstream
       -- chain — measured 2x the bucket window + 2x the corpus scans)
       FLOOR((CAST(n_tokens AS DOUBLE)
              / CAST(SUM(n_tokens) OVER (PARTITION BY stage) AS DOUBLE))
             * 10000.0 + 0.5) / CAST(10000.0 AS DOUBLE) AS stage_token_share
FROM cells
ORDER BY stage, source NULLS FIRST
"""


def curriculum_stages(docs: DataFrame) -> DataFrame:
    """C16: the difficulty-staged sampling schedule — exact surprisal
    quartiles × source provenance with per-cell doc/token budgets and
    within-stage token shares (see the block comment for why the
    stage × source interaction is the audit per-doc buckets and global
    mixes both miss).

    Scale shape: rides C6's shared materialized token cache; the only
    corpus-keyed exchanges are the per-doc surprisal SUM and the
    doc_id provenance join; ranking is the two-level bucket rank (no
    global window); output is ≤ stages × sources cells."""
    spark = docs.sparkSession
    tok = _materialized_tok_df(docs)
    with scoped_temp_view(tok, "_corpus_tok") as tv, scoped_temp_view(
        docs, "_corpus_docs"
    ) as dv:
        return spark.sql(
            f"WITH tok AS (SELECT doc_id, tok FROM {tv}),\n"
            + _CURRICULUM_TAIL.format(stages=CURRICULUM_STAGES, docsrc=dv)
        )


ORACLE_CURRICULUM_STAGES = (
    f"WITH tok AS (SELECT doc_id, unnest({_TOKENS_DUCK}) AS tok FROM documents),\n"
    + _CURRICULUM_TAIL.format(stages=CURRICULUM_STAGES, docsrc="documents")
)


# ==========================================================================
# C9 — split-leakage audit (near-dup pairs straddling train/val/test)
# ==========================================================================
# The eval-integrity check every pipeline needs after splitting: a
# near-duplicate pair with one member in train and the other in val/test
# leaks the held-out answer into training. Composes C2's deterministic
# md5 split with the C1 Jaccard edge set: count near-dup pairs per
# unordered (split, split) cell; off-diagonal cells are leaks. The md5
# split makes leaks *possible* only through near-duplicate text (the
# split itself can't leak by construction) — this op measures exactly
# that residual channel.
#
# Scale shape: edges come from the banded/materialized shingle relation
# (corpus-sized but built once, shared via the keyed cache); the split
# label is a pure projection; the two label joins key on doc_id; the
# final groupBy has ≤ 6 cells.
def _leak_tail(docsrc: str, for_spark: bool) -> str:
    bucket = _BUCKET.format(STR="STRING" if for_spark else "VARCHAR")
    return (
        _EDGE_CTES.format(thr=JACCARD_THRESHOLD)
        + f""",
splits AS (
  SELECT doc_id, {_split_case(bucket)} AS split FROM {docsrc}
),
labeled AS (
  SELECT LEAST(sa.split, sb.split) AS split_a,
         GREATEST(sa.split, sb.split) AS split_b
  FROM edges e
  JOIN splits sa ON e.doc_a = sa.doc_id
  JOIN splits sb ON e.doc_b = sb.doc_id
)
SELECT split_a, split_b, COUNT(*) AS n_pairs,
       (split_a <> split_b) AS is_leak
FROM labeled
GROUP BY split_a, split_b
ORDER BY split_a, split_b
"""
    )


def split_leakage(docs: DataFrame) -> DataFrame:
    """C9: near-dup split-leakage audit — Jaccard near-dup pairs bucketed
    by the (unordered) train/val/test cell of their two members;
    off-diagonal cells are evaluation leaks. See the block comment for
    the channel being measured and the 100 TB shape."""
    spark = docs.sparkSession
    with shingles_cte(docs) as hdr, scoped_temp_view(
        docs, "_corpus_docs"
    ) as dv:
        return spark.sql(
            hdr.rstrip().rstrip(",")
            + ",\n"
            + _leak_tail(dv, for_spark=True)
        )


ORACLE_SPLIT_LEAKAGE = (
    "WITH shingles AS ("
    + _SHINGLES_DUCK
    + "),\n"
    + _leak_tail("documents", for_spark=False)
)


# ==========================================================================
# C8 — DSIR-style importance weighting (hashed-unigram domain selection)
# ==========================================================================
# Data Selection via Importance Resampling (Xie et al., NeurIPS 2023,
# public arXiv:2302.03169): score every raw document by the log-likelihood
# ratio of a *target-domain* bag-of-hashed-ngrams model vs the raw-corpus
# model, then keep the top fraction. Here the target distribution is the
# corpus's own `lang = 'en'` slice (the stand-in for "looks like the
# high-quality target domain"), features are word unigrams hashed into
# {b} md5 buckets, both models are add-one smoothed, and selection is the
# deterministic top-{p}% by total score (the zero-temperature limit of
# DSIR's Gumbel resampling — reproducible across engines and re-runs,
# which the sampled variant is not).
#
# Determinism: the ln() argument is an exact small-integer rational
# ((ct+1)(R+B)) / ((cr+1)(T+B)) — products stay < 2^53 at test scale, so
# both engines feed ln identical doubles; the per-bucket log-ratio snaps
# to integer micro-nats BEFORE the per-doc SUM (exact in any aggregation
# order — same invariant as C6).
#
# Scale shape: token relation built once (C5/C6's keyed cache); bucket
# models are {b}-row aggregates with map-side partial combine; the weight
# table is {b} rows → the scoring join broadcasts it; the per-doc SUM is
# the only doc-keyed exchange. Document text never shuffles.
DSIR_BUCKETS = 256
DSIR_KEEP_PCT = 20
DSIR_TARGET_LANG = "en"

_DSIR_BUCKET = (
    "((position(substr(md5(tok), 1, 1) IN '0123456789abcdef') - 1) * 16"
    " + (position(substr(md5(tok), 2, 1) IN '0123456789abcdef') - 1))"
)

_DSIR_TAIL = """
langs AS (SELECT doc_id, lang FROM {docsrc}),
target_counts AS (
  SELECT f.bucket, COUNT(*) AS ct
  FROM feat f JOIN langs l ON f.doc_id = l.doc_id
  WHERE l.lang = '{target}' GROUP BY f.bucket
),
raw_counts AS (SELECT bucket, COUNT(*) AS cr FROM feat GROUP BY bucket),
totals AS (
  SELECT (SELECT COALESCE(SUM(ct), 0) FROM target_counts) AS t_tot,
         (SELECT SUM(cr) FROM raw_counts) AS r_tot
),
weights AS (
  SELECT r.bucket,
         CAST(FLOOR(ln(
             (CAST(COALESCE(t.ct, 0) + 1 AS DOUBLE) * (tt.r_tot + {b}.0))
             / (CAST(r.cr + 1 AS DOUBLE) * (tt.t_tot + {b}.0))
           ) * 1000000.0 + 0.5) AS BIGINT) AS lw_micro
  FROM raw_counts r
  LEFT JOIN target_counts t ON r.bucket = t.bucket
  CROSS JOIN totals tt
),
scored AS (
  -- CAST: DuckDB SUM(BIGINT) yields HUGEINT; pin to BIGINT for the
  -- cross-engine hash compare.
  SELECT f.doc_id, COUNT(*) AS n_tokens,
         CAST(SUM(w.lw_micro) AS BIGINT) AS score_micro
  FROM feat f JOIN weights w ON f.bucket = w.bucket
  GROUP BY f.doc_id
),
coarse AS (
  -- two-level exact rank: an unpartitioned ROW_NUMBER over all docs
  -- would single-partition the corpus (WindowExec warns exactly this);
  -- instead rank WITHIN 10-nat score buckets (partitioned window) and
  -- add the bucket's global offset (a window over the tiny bucket-count
  -- relation — bounded by the score range in 10-nat steps, not by docs)
  SELECT s.doc_id, s.n_tokens, s.score_micro,
         CAST(FLOOR(CAST(s.score_micro AS DOUBLE) / 10000000.0) AS BIGINT)
           AS cb
  FROM scored s
),
bcounts AS (SELECT cb, COUNT(*) AS c FROM coarse GROUP BY cb),
boffsets AS (
  SELECT cb, CAST(COALESCE(SUM(c) OVER (ORDER BY cb DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS off
  FROM bcounts
),
ranked AS (
  SELECT c.doc_id, c.n_tokens, c.score_micro,
         ROW_NUMBER() OVER (PARTITION BY c.cb
                            ORDER BY c.score_micro DESC, c.doc_id) + o.off
           AS rnk
  FROM coarse c JOIN boffsets o ON c.cb = o.cb
),
tot_docs AS (SELECT COUNT(*) AS n FROM ranked)
SELECT r.doc_id, l.lang, r.n_tokens, r.score_micro,
       FLOOR((CAST(r.score_micro AS DOUBLE) / r.n_tokens / 1000000.0)
             * 10000.0 + 0.5) / CAST(10000.0 AS DOUBLE) AS avg_log_ratio,
       (rnk <= CAST(FLOOR(n * {p}.0 / 100.0 + 0.5) AS BIGINT)) AS selected
FROM ranked r JOIN langs l ON r.doc_id = l.doc_id CROSS JOIN tot_docs
ORDER BY r.doc_id
"""


def _dsir_tail(docsrc: str) -> str:
    return _DSIR_TAIL.format(
        bucket=_DSIR_BUCKET,
        docsrc=docsrc,
        target=DSIR_TARGET_LANG,
        b=DSIR_BUCKETS,
        p=DSIR_KEEP_PCT,
    )


def dsir_select(docs: DataFrame) -> DataFrame:
    """C8: DSIR-style hashed-ngram importance weighting — per-document
    target-vs-raw log-likelihood ratio and a deterministic top-{p}% keep
    flag. See the module-level block comment for the derivation, the
    determinism invariants, and the 100 TB shape.

    The hashed-bucket relation (feat) feeds THREE consumers (target
    model, raw model, per-doc scoring); like the shingle relation it
    goes through the keyed materialized-view cache so the explode+md5
    pass over the corpus runs once, not three times.""".format(
        p=DSIR_KEEP_PCT
    )
    from .dedup import _materialized_df

    spark = docs.sparkSession
    tok = _materialized_tok_df(docs)

    def build_feat():
        with scoped_temp_view(tok, "_corpus_tok_src") as tv:
            return spark.sql(
                f"SELECT doc_id, {_DSIR_BUCKET} AS bucket FROM {tv}"
            )

    feat = _materialized_df(
        spark, "_corpus_feat", docs.semanticHash(), build_feat
    )
    # DataFrame-composed, NOT the oracle's WITH query (r15): the cache
    # manager refuses InMemoryRelation substitution anywhere in a
    # WithCTE plan, so the CTE spelling re-ran the feat chain (and tok
    # under it) at each of its three references — measured 2.8 s warm
    # at sf0.1 vs ~1 s composed. Expressions copied verbatim from
    # _DSIR_TAIL; the oracle keeps the single-WITH spelling, so the two
    # formulations differentially check each other. The per-doc scored
    # relation (coarse) is additionally materialized once per corpus —
    # the rank fold references it three times (bcounts/ranked/total).
    langs = docs.selectExpr("doc_id", "lang")

    def build_coarse():
        target_counts = (
            feat.join(
                langs.where(f"lang = '{DSIR_TARGET_LANG}'"), "doc_id"
            )
            .groupBy("bucket")
            .agg(F.expr("COUNT(*) AS ct"))
        )
        raw_counts = feat.groupBy("bucket").agg(F.expr("COUNT(*) AS cr"))
        totals = (
            target_counts.agg(F.expr("COALESCE(SUM(ct), 0) AS t_tot"))
            .crossJoin(raw_counts.agg(F.expr("SUM(cr) AS r_tot")))
        )
        b = DSIR_BUCKETS
        weights = (
            raw_counts.join(target_counts, "bucket", "left")
            .crossJoin(F.broadcast(totals))
            .selectExpr(
                "bucket",
                "CAST(FLOOR(ln("
                f"(CAST(COALESCE(ct, 0) + 1 AS DOUBLE) * (r_tot + {b}.0))"
                f" / (CAST(cr + 1 AS DOUBLE) * (t_tot + {b}.0))"
                ") * 1000000.0 + 0.5) AS BIGINT) AS lw_micro",
            )
        )
        return (
            feat.join(weights, "bucket")
            .groupBy("doc_id")
            .agg(
                F.expr("COUNT(*) AS n_tokens"),
                F.expr("CAST(SUM(lw_micro) AS BIGINT) AS score_micro"),
            )
            .selectExpr(
                "doc_id", "n_tokens", "score_micro",
                "CAST(FLOOR(CAST(score_micro AS DOUBLE) / 10000000.0)"
                " AS BIGINT) AS cb",
            )
        )

    coarse = _materialized_df(
        spark, "_corpus_dsir_coarse", docs.semanticHash(), build_coarse
    )
    bcounts = coarse.groupBy("cb").agg(F.expr("COUNT(*) AS c"))
    boffsets = bcounts.selectExpr(
        "cb",
        "CAST(COALESCE(SUM(c) OVER (ORDER BY cb DESC"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)"
        " AS BIGINT) AS off",
    )
    ranked = coarse.join(boffsets, "cb").selectExpr(
        "doc_id", "n_tokens", "score_micro",
        "ROW_NUMBER() OVER (PARTITION BY cb"
        " ORDER BY score_micro DESC, doc_id) + off AS rnk",
    )
    tot = coarse.agg(F.expr("COUNT(*) AS n"))
    return (
        ranked.join(langs, "doc_id")
        .crossJoin(F.broadcast(tot))
        .selectExpr(
            "doc_id", "lang", "n_tokens", "score_micro",
            "FLOOR((CAST(score_micro AS DOUBLE) / n_tokens / 1000000.0)"
            " * 10000.0 + 0.5) / CAST(10000.0 AS DOUBLE) AS avg_log_ratio",
            f"(rnk <= CAST(FLOOR(n * {DSIR_KEEP_PCT}.0 / 100.0 + 0.5)"
            " AS BIGINT)) AS selected",
        )
        .orderBy("doc_id")
    )


ORACLE_DSIR = (
    f"WITH tok AS (SELECT doc_id, unnest({_TOKENS_DUCK}) AS tok FROM documents),\n"
    + f"feat AS (SELECT doc_id, {_DSIR_BUCKET} AS bucket FROM tok),\n"
    + _dsir_tail("documents")
)


# ==========================================================================
# C11 — Zipf/type-token corpus profile
# ==========================================================================
#: ranks used for the Zipf log-log OLS fit (top of the frequency curve,
#: where Zipf's law holds; public formulation e.g. Piantadosi 2014,
#: "Zipf's word frequency law in natural language").
ZIPF_TOP_K = 50

#: OLS over (ln rank, ln count) with every term snapped to integer
#: micro-units BEFORE summing — integer sums are exact in any
#: aggregation order, so Spark's partial aggregates and DuckDB's
#: single-node scan produce bit-identical slope inputs. ln() runs over
#: identical integer inputs in both engines.
_ZIPF_TAIL = """
tok AS ({tokens}),
stats AS (SELECT tok AS token, COUNT(*) AS c FROM tok GROUP BY tok),
tot AS (
  SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) AS n_tokens,
         COUNT(*) AS n_types
  FROM stats
),
topk AS (
  -- top-k FIRST (distributed TakeOrderedAndProject), rank the <=k
  -- survivors — same no-global-window rule as C3's vocabulary
  SELECT token, c FROM stats ORDER BY c DESC, token LIMIT {k}
),
ranked AS (
  SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, token) AS r FROM topk
),
terms AS (
  SELECT CAST(FLOOR(ln(CAST(r AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS x,
         CAST(FLOOR(ln(CAST(c AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS y
  FROM ranked
),
fit AS (
  SELECT COUNT(*) AS n,
         CAST(COALESCE(SUM(x), 0) AS BIGINT) AS sx,
         CAST(COALESCE(SUM(y), 0) AS BIGINT) AS sy,
         CAST(COALESCE(SUM(x * y), 0) AS BIGINT) AS sxy,
         CAST(COALESCE(SUM(x * x), 0) AS BIGINT) AS sxx
  FROM terms
)
SELECT t.n_tokens, t.n_types,
       CASE WHEN t.n_tokens = 0 THEN CAST(0.0 AS DOUBLE)
            ELSE FLOOR((CAST(t.n_types AS DOUBLE) / t.n_tokens) * 10000.0 + 0.5)
                 / CAST(10000.0 AS DOUBLE)
       END AS type_token_ratio,
       f.n AS zipf_ranks_used,
       CASE WHEN f.n < 2 OR (f.n * f.sxx - f.sx * f.sx) = 0
            THEN CAST(0.0 AS DOUBLE)
            ELSE FLOOR((CAST(f.n * f.sxy - f.sx * f.sy AS DOUBLE)
                        / CAST(f.n * f.sxx - f.sx * f.sx AS DOUBLE))
                       * 10000.0 + 0.5) / CAST(10000.0 AS DOUBLE)
       END AS zipf_slope
FROM tot t CROSS JOIN fit f
"""


def zipf_fit(docs: DataFrame) -> DataFrame:
    """C11: corpus-level frequency-curve profile — total/distinct token
    counts, type-token ratio, and the Zipf exponent (OLS slope of
    ln count vs ln rank over the top-{k} ranks; natural text sits near
    -1, boilerplate/spam corpora deviate hard). The one-row corpus
    health check a data-mix dashboard plots per source/snapshot.

    Scale shape: one token groupBy (map-side combined), a distributed
    top-k, and two one-row aggregates cross-joined — nothing wide ever
    passes through a single partition except the <= {k}-row rank window.
    """.format(k=ZIPF_TOP_K)
    from ..functions.views import scoped_temp_view

    # per-call scoped view: this operator is served concurrently by the
    # REST layer (/api/v1/corpus/zipf) — no fixed catalog names
    with scoped_temp_view(docs, "_corpus_docs") as v:
        tokens = (
            "SELECT doc_id, tok FROM (SELECT doc_id, "
            f"posexplode({_TOKENS_SPARK}) AS (pos, tok) FROM {v})"
        )
        return docs.sparkSession.sql(
            "WITH " + _ZIPF_TAIL.format(tokens=tokens, k=ZIPF_TOP_K)
        )


ORACLE_ZIPF_FIT = "WITH " + _ZIPF_TAIL.format(
    tokens=f"SELECT doc_id, unnest({_TOKENS_DUCK}) AS tok FROM documents",
    k=ZIPF_TOP_K,
)


# ==========================================================================
# C13 — DoReMi-style domain reweighting (one Group-DRO update step)
# ==========================================================================
#: DoReMi (Xie et al. 2023, arXiv:2305.10429) tunes the domain sampling
#: mix by exponentially up-weighting domains with high EXCESS loss under
#: a proxy model. Here the proxy is C6's corpus unigram LM: per-source
#: mean surprisal (exact micro-nat integer sums), excess over the
#: best-scoring source, multiplicative-weights update w ∝ exp(η·excess),
#: weights snapped to integer micro BEFORE the normalizing sum so both
#: engines normalize identical values. The exponent is clamped at 28
#: nats: exp(28)·1e6 ≈ 1.45e18 stays inside BIGINT (uncapped, a ~43-nat
#: excess would overflow the CAST — ANSI Spark throws, DuckDB errors
#: differently), so extreme-excess domains saturate to a dominant
#: weight instead of killing the query.
DOREMI_ETA = 1.0

_DOREMI_BODY = """,
per_src AS (
  SELECT d.source, COUNT(*) AS n_docs,
         CAST(SUM(p.total_nll_micro) AS BIGINT) AS sum_nll_micro,
         CAST(SUM(p.n_tokens) AS BIGINT) AS sum_tokens
  FROM per_doc p JOIN {docsrc} d ON p.doc_id = d.doc_id
  GROUP BY d.source
),
rated AS (
  SELECT source, n_docs,
         CAST(FLOOR(CAST(sum_nll_micro AS DOUBLE) / sum_tokens) AS BIGINT)
           AS nll_per_tok_micro
  FROM per_src
),
ref AS (SELECT MIN(nll_per_tok_micro) AS base FROM rated),
wraw AS (
  SELECT r.source, r.n_docs, r.nll_per_tok_micro,
         r.nll_per_tok_micro - f.base AS excess_micro,
         CAST(FLOOR(exp(LEAST(CAST(r.nll_per_tok_micro - f.base AS DOUBLE)
                              / 1000000.0 * {eta}, 28.0)) * 1000000.0 + 0.5)
              AS BIGINT) AS w_micro
  FROM rated r CROSS JOIN ref f
),
tot AS (SELECT CAST(SUM(w_micro) AS BIGINT) AS tw FROM wraw)"""

_DOREMI_TAIL = _DOREMI_BODY + """
SELECT w.source, w.n_docs, w.nll_per_tok_micro, w.excess_micro,
       FLOOR((CAST(w.w_micro AS DOUBLE) / t.tw) * 10000.0 + 0.5)
         / CAST(10000.0 AS DOUBLE) AS domain_weight
FROM wraw w CROSS JOIN tot t
ORDER BY w.source
"""


def _materialized_tok_df(docs: DataFrame) -> DataFrame:
    """The exploded (doc_id, tok) relation, built once and persisted —
    no catalog names touched (thread-safe for concurrent REST callers).
    Shares the ``_corpus_tok`` cache slot with the fixed-view callers."""
    from ..functions.views import scoped_temp_view
    from .dedup import _materialized_df

    spark = docs.sparkSession

    def build():
        with scoped_temp_view(docs, "_corpus_docs_src") as v:
            return spark.sql(
                "SELECT doc_id, tok FROM (SELECT doc_id, "
                f"posexplode({_TOKENS_SPARK}) AS (pos, tok) FROM {v})"
            )

    return _materialized_df(spark, "_corpus_tok", docs.semanticHash(), build)


def doremi_reweight(docs: DataFrame) -> DataFrame:
    """C13: one DoReMi Group-DRO update of the domain sampling weights
    (Xie et al. 2023): per-source mean surprisal under the corpus's own
    unigram LM (the proxy-model loss), excess over the best source, and
    the multiplicative-weights mix w ∝ exp(η·excess) — high-excess
    domains get up-sampled in the next training round.

    Scale shape: rides C6's token/LM relations (shared materialized
    cache); everything after per_doc is per-source arithmetic on a
    #sources-row relation. One doc-keyed join against the corpus, no
    windows.

    Served concurrently by the REST layer (/api/v1/corpus/domain-weights):
    per-call scoped views over the thread-safe token cache — no fixed
    catalog names."""
    from ..functions.views import scoped_temp_view

    spark = docs.sparkSession
    tok = _materialized_tok_df(docs)
    with scoped_temp_view(tok, "_doremi_tok") as tv, scoped_temp_view(
        docs, "_doremi_docs"
    ) as dv:
        return spark.sql(
            f"WITH tok AS (SELECT doc_id, tok FROM {tv}),\n"
            + _UNIGRAM_CTES
            + _DOREMI_TAIL.format(docsrc=dv, eta=DOREMI_ETA)
        )


ORACLE_DOREMI = (
    f"WITH tok AS (SELECT doc_id, unnest({_TOKENS_DUCK}) AS tok FROM documents),\n"
    + _UNIGRAM_CTES
    + _DOREMI_TAIL.format(docsrc="documents", eta=DOREMI_ETA)
)


# ==========================================================================
# C15 — mix realization: per-source sampling plan for a token budget
# ==========================================================================
#: C13 answers "what should the domain mix BE"; this realizes it: given
#: the global training-token budget, each source's target token count
#: is budget x its DoReMi weight, and its sampling rate is
#: target / available — >1.0 means the source repeats (epochs), <1.0
#: means it is subsampled. The artifact a 100 TB run hands to the
#: sampler: a #sources-row plan, recomputed per mix update, never per
#: document.
MIX_TOKEN_BUDGET = 100_000

_MIX_TAIL = """
SELECT w.source,
       CAST(s.sum_tokens AS BIGINT) AS n_tokens,
       FLOOR((CAST(w.w_micro AS DOUBLE) / t.tw) * 10000.0 + 0.5)
         / CAST(10000.0 AS DOUBLE) AS domain_weight,
       CAST(FLOOR({budget} * (CAST(w.w_micro AS DOUBLE) / t.tw)) AS BIGINT)
         AS target_tokens,
       CASE WHEN s.sum_tokens = 0 THEN CAST(0.0 AS DOUBLE)
            ELSE FLOOR((FLOOR({budget} * (CAST(w.w_micro AS DOUBLE) / t.tw))
                        / s.sum_tokens) * 10000.0 + 0.5)
                 / CAST(10000.0 AS DOUBLE)
       END AS sample_epochs
FROM wraw w CROSS JOIN tot t
JOIN per_src s ON w.source IS NOT DISTINCT FROM s.source
ORDER BY w.source
"""


def mix_plan(docs: DataFrame) -> DataFrame:
    """C15: the per-source sampling plan realizing C13's DoReMi mix
    under a {b}-token budget — available tokens, target tokens
    (budget x weight), and the sampling rate in epochs (>1 = the source
    repeats; <1 = subsampled).

    Scale shape: rides the same per_doc/per_src aggregates as C13
    (shared materialized token cache, one doc-keyed join against the
    corpus); everything after is #sources-row arithmetic. NULL source
    is a real group (IS NOT DISTINCT FROM join).""".format(
        b=MIX_TOKEN_BUDGET
    )
    from ..functions.views import scoped_temp_view

    spark = docs.sparkSession
    tok = _materialized_tok_df(docs)
    with scoped_temp_view(tok, "_mix_tok") as tv, scoped_temp_view(
        docs, "_mix_docs"
    ) as dv:
        return spark.sql(
            f"WITH tok AS (SELECT doc_id, tok FROM {tv}),\n"
            + _UNIGRAM_CTES
            + _DOREMI_BODY.format(docsrc=dv, eta=DOREMI_ETA)
            + _MIX_TAIL.format(budget=MIX_TOKEN_BUDGET)
        )


ORACLE_MIX_PLAN = (
    f"WITH tok AS (SELECT doc_id, unnest({_TOKENS_DUCK}) AS tok FROM documents),\n"
    + _UNIGRAM_CTES
    + _DOREMI_BODY.format(docsrc="documents", eta=DOREMI_ETA)
    + _MIX_TAIL.format(budget=MIX_TOKEN_BUDGET)
)


# ==========================================================================
# C14 — span-level cross-split leakage (passage hashes × hash split)
# ==========================================================================
#: C9 audits leakage at the near-dup DOCUMENT level; this audits it at
#: the exact-PASSAGE level (Lee et al. 2022 find verbatim spans that
#: survive document-level filters): any rolling window whose exact
#: content appears in two different train/val/test cells is an
#: evaluation leak, even when the carrying documents are otherwise
#: unrelated. Diagonal cells (same split, ≥2 docs) report intra-split
#: duplication for context.
_SPAN_LEAKAGE_POST = """
ws AS (
  SELECT w.phash, s.split, COUNT(DISTINCT w.doc_id) AS nd
  FROM wins w JOIN splits s ON w.doc_id = s.doc_id
  WHERE w.phash IS NOT NULL
  GROUP BY w.phash, s.split
),
cells AS (
  SELECT a.phash, a.split AS split_a, b.split AS split_b
  FROM ws a JOIN ws b ON a.phash = b.phash
   AND (a.split < b.split OR (a.split = b.split AND a.nd >= 2))
)
SELECT split_a, split_b,
       COUNT(*) AS n_shared_spans,
       (split_a <> split_b) AS is_leak
FROM cells
GROUP BY split_a, split_b
ORDER BY split_a, split_b
"""


def span_leakage(docs: DataFrame) -> DataFrame:
    """C14: exact-span split-leakage audit — every rolling window hash
    bucketed by the train/val/test cells it appears in; off-diagonal
    cells are spans shared verbatim across splits (eval leaks C9's
    document-level Jaccard can miss), diagonal cells are intra-split
    duplication.

    Scale shape: rides D6/D7's persisted window-hash relation; the
    per-(hash, split) aggregate and the hash-keyed pair join shuffle
    only 32-hex hashes and split labels; output is ≤6 cells."""
    from .dedup import materialized_passage_wins_df

    spark = docs.sparkSession
    wins = materialized_passage_wins_df(docs)
    bucket = _BUCKET.format(STR="STRING")
    with scoped_temp_view(wins, "_corpus_wins") as wv, scoped_temp_view(
        docs, "_corpus_docs"
    ) as dv:
        return spark.sql(
            f"WITH wins AS (SELECT doc_id, pos, phash FROM {wv}),\n"
            f"splits AS (SELECT doc_id, {_split_case(bucket)} AS split"
            f" FROM {dv}),"
            + _SPAN_LEAKAGE_POST
        )


def _oracle_span_leakage() -> str:
    from .dedup import _PASSAGE_WINS_DUCK

    bucket = _BUCKET.format(STR="VARCHAR")
    return (
        "WITH wins AS ("
        + _PASSAGE_WINS_DUCK.format(src="documents")
        + "),\n"
        + f"splits AS (SELECT doc_id, {_split_case(bucket)} AS split"
        " FROM documents),"
        + _SPAN_LEAKAGE_POST
    )


ORACLE_SPAN_LEAKAGE = _oracle_span_leakage()


# ==========================================================================
# C12 — cross-source overlap matrix (source-pair shingle Jaccard)
# ==========================================================================
#: The "how much does snapshot/source A repeat source B" audit every
#: multi-source data mix needs before setting sampling weights (e.g.
#: CommonCrawl snapshot-vs-snapshot overlap in RefinedWeb, Penedo et al.
#: 2023, arXiv:2306.01116 §3). Output is |sources|² bounded — a matrix,
#: not a pair explosion.
#: shared from `sizes` down; both engines build `ssh` with the SAME
#: shingles-join formulation (Spark over the materialized shingle cache,
#: DuckDB over its recursive-CTE shingles) via one {docsrc} template.
_SOURCE_OVERLAP_SSH = """
ssh AS (
  SELECT DISTINCT d.source, s.shingle
  FROM shingles s JOIN {docsrc} d ON s.doc_id = d.doc_id
),"""

_SOURCE_OVERLAP_POST = """
sizes AS (SELECT source, COUNT(*) AS n FROM ssh GROUP BY source),
common AS (
  SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS common_shingles
  FROM ssh a JOIN ssh b ON a.shingle = b.shingle AND a.source < b.source
  GROUP BY a.source, b.source
)
SELECT c.source_a, c.source_b,
       x.n AS shingles_a, y.n AS shingles_b, c.common_shingles,
       FLOOR((CAST(c.common_shingles AS DOUBLE)
              / (x.n + y.n - c.common_shingles)) * 10000.0 + 0.5)
         / CAST(10000.0 AS DOUBLE) AS jaccard
FROM common c
JOIN sizes x ON c.source_a = x.source
JOIN sizes y ON c.source_b = y.source
ORDER BY source_a, source_b
"""


def source_overlap(docs: DataFrame) -> DataFrame:
    """C12: source-pair content overlap — Jaccard over each source's
    distinct shingle set. Reads like D2's pair join but keyed on *source*
    (a handful of values), so the output is matrix-sized at any corpus
    scale.

    Scale shape: rides the materialized (doc_id, shingle) relation the
    whole dedup suite shares (index once, serve many — rebuilding from
    text re-tokenizes the corpus per call, measured 1.6x slower warm);
    the doc_id join attaches `source`, then everything de-dups to
    (source, shingle) — bounded by vocab × #sources — before the
    shingle-keyed pair join whose per-shingle fan-out is capped by
    #sources². Document text never shuffles.

    Served concurrently by the REST layer (/api/v1/corpus/sources):
    per-call scoped views over the thread-safe shingle cache — no fixed
    catalog names."""
    from ..functions.views import scoped_temp_view
    from .dedup import materialized_shingles_df

    spark = docs.sparkSession
    sh = materialized_shingles_df(docs)
    with scoped_temp_view(sh, "_overlap_shingles") as sv, scoped_temp_view(
        docs, "_overlap_docs"
    ) as dv:
        return spark.sql(
            f"WITH shingles AS (SELECT doc_id, shingle FROM {sv}),"
            + _SOURCE_OVERLAP_SSH.format(docsrc=dv)
            + _SOURCE_OVERLAP_POST
        )


ORACLE_SOURCE_OVERLAP = (
    "WITH RECURSIVE shingles AS ("
    + _SHINGLES_DUCK
    + "),"
    + _SOURCE_OVERLAP_SSH.format(docsrc="documents")
    + _SOURCE_OVERLAP_POST
)


# ==========================================================================
# C16 — crawl novelty curve (is more of this crawl still worth ingesting?)
# ==========================================================================
#: ingest-order buckets for the novelty curve; the output is always
#: exactly this many rows (or fewer on tiny corpora).
NOVELTY_BUCKETS = 10

_NOVELTY_TAIL = """
sb AS (
  SELECT DISTINCT md5(s.shingle) AS sh,
         CAST(FLOOR(CAST(s.doc_id AS DOUBLE) * {nb} / (m.mx + 1)) AS INT)
           AS bucket
  FROM shingles s
  JOIN (SELECT MAX(doc_id) AS mx FROM {src}) m ON 1 = 1
),
firstb AS (SELECT sh, MIN(bucket) AS fb FROM sb GROUP BY sh),
per AS (
  SELECT b.bucket,
         CAST(COUNT(*) AS BIGINT) AS n_distinct_shingles,
         CAST(SUM(CASE WHEN f.fb = b.bucket THEN 1 ELSE 0 END) AS BIGINT)
           AS n_new_shingles
  FROM sb b JOIN firstb f ON b.sh = f.sh
  GROUP BY b.bucket
)
SELECT bucket, n_distinct_shingles, n_new_shingles,
       FLOOR(CAST(n_new_shingles AS DOUBLE) * 10000.0
             / n_distinct_shingles + 0.5)
         / CAST(10000.0 AS DOUBLE) AS novelty_rate,
       CAST(SUM(n_new_shingles) OVER (ORDER BY bucket) AS BIGINT)
         AS cumulative_distinct
FROM per
ORDER BY bucket
"""


def novelty_curve(docs: DataFrame) -> DataFrame:
    """C16: the crawl-yield curve — doc_id order read as ingest order,
    the corpus cut into {nb} equal-width id buckets, and each bucket
    scored by how many of its distinct shingles were never seen in any
    earlier bucket. A flattening novelty_rate is the measured answer to
    "is more of this crawl still worth ingesting?" (the data-scaling
    dedup curve); cumulative_distinct is the corpus's distinct-content
    growth.

    Scale shape: rides the shared materialized (doc_id, shingle)
    relation; shingles are md5'd before any shuffle (fixed-width keys,
    never 3-word strings); the bucket map is a broadcast 1-row MAX; the
    two data-sized exchanges key on the hash. The running sum windows
    over the {nb}-row bucket relation only (allowlisted as provably
    tiny). Document text never shuffles. At 100 TB prefer
    :func:`novelty_curve_approx` — same curve from mergeable HLL
    sketches with NO data-sized shuffle at all.""".format(
        nb=NOVELTY_BUCKETS
    )
    from .dedup import materialized_shingles_df

    spark = docs.sparkSession
    sh = materialized_shingles_df(docs)
    with scoped_temp_view(sh, "_novelty_shingles") as sv, scoped_temp_view(
        docs, "_novelty_docs"
    ) as dv:
        return spark.sql(
            f"WITH shingles AS (SELECT doc_id, shingle FROM {sv}),"
            + _NOVELTY_TAIL.format(src=dv, nb=NOVELTY_BUCKETS)
        )


ORACLE_NOVELTY_CURVE = (
    "WITH RECURSIVE shingles AS ("
    + _SHINGLES_DUCK
    + "),"
    + _NOVELTY_TAIL.format(src="documents", nb=NOVELTY_BUCKETS)
)


#: log2(k) for the HLL sketches in the approximate novelty curve
#: (lgk=12 → ~1.6 % relative standard error)
NOVELTY_HLL_LGK = 12


def novelty_curve_approx(docs: DataFrame) -> DataFrame:
    """C16b: the 100 TB path for C16 — the same crawl-yield curve from
    mergeable HLL sketches (``hll_sketch_agg``/``hll_union_agg``)
    instead of exact distinct folds. Per-bucket sketches build as
    map-side partials, so no shuffle ever carries a shingle (C16 moves
    every distinct md5 key twice); the cumulative union runs over the
    10-row sketch relation. Estimates carry ~1.6 % relative error at
    lgk=12 — pytest-pinned against the exact curve (no DuckDB twin
    exists: sketch estimates are algorithm-specific, so this op is
    deliberately NOT in the oracle registry).

    Columns mirror C16 with an ``_est`` suffix; ``n_new_est`` is the
    cumulative-estimate delta and can differ slightly from a direct
    first-seen count — deltas of a monotone union are the only
    consistent decomposition a sketch supports."""
    from .dedup import materialized_shingles_df

    spark = docs.sparkSession
    sh = materialized_shingles_df(docs)
    with scoped_temp_view(sh, "_novelty_shingles") as sv, scoped_temp_view(
        docs, "_novelty_docs"
    ) as dv:
        return spark.sql(f"""
WITH sb AS (
  SELECT s.shingle,
         CAST(FLOOR(CAST(s.doc_id AS DOUBLE) * {NOVELTY_BUCKETS}
                    / (m.mx + 1)) AS INT) AS bucket
  FROM {sv} s JOIN (SELECT MAX(doc_id) AS mx FROM {dv}) m ON 1 = 1
),
pb AS (
  SELECT bucket, hll_sketch_agg(shingle, {NOVELTY_HLL_LGK}) AS sk
  FROM sb GROUP BY bucket
),
pe AS (
  SELECT bucket, CAST(hll_sketch_estimate(sk) AS BIGINT) AS n_distinct_est
  FROM pb
),
cum AS (
  SELECT a.bucket,
         CAST(hll_sketch_estimate(hll_union_agg(b.sk))
              AS BIGINT) AS cumulative_distinct_est
  FROM (SELECT bucket FROM pb) a JOIN pb b ON b.bucket <= a.bucket
  GROUP BY a.bucket
),
curve AS (
  SELECT c.bucket, e.n_distinct_est,
         c.cumulative_distinct_est
           - COALESCE(LAG(c.cumulative_distinct_est)
                      OVER (ORDER BY c.bucket), 0) AS n_new_est,
         c.cumulative_distinct_est
  FROM cum c JOIN pe e ON c.bucket = e.bucket
)
SELECT bucket, n_distinct_est, n_new_est,
       CASE WHEN n_distinct_est = 0 THEN CAST(0.0 AS DOUBLE)
            ELSE FLOOR(CAST(n_new_est AS DOUBLE) * 10000.0
                       / n_distinct_est + 0.5) / CAST(10000.0 AS DOUBLE)
       END AS novelty_rate_est,
       cumulative_distinct_est
FROM curve
ORDER BY bucket
""")


ORACLE_SQL_CORPUS = {
    "dedup_clusters": ORACLE_DEDUP_CLUSTERS,
    "corpus_hash_split": ORACLE_HASH_SPLIT,
    "corpus_vocabulary": ORACLE_VOCABULARY,
    "corpus_tfidf_top_terms": ORACLE_TFIDF,
    "corpus_oov_rate": ORACLE_OOV_RATE,
    "corpus_unigram_logprob": ORACLE_UNIGRAM_LOGPROB,
    "corpus_curriculum_stages": ORACLE_CURRICULUM_STAGES,
    "dedup_keep_canonical": ORACLE_KEEP_CANONICAL,
    "dedup_survivorship": ORACLE_DEDUP_SURVIVORSHIP,
    "dedup_retention_ids": ORACLE_RETENTION_IDS,
    "corpus_dsir_select": ORACLE_DSIR,
    "corpus_split_leakage": ORACLE_SPLIT_LEAKAGE,
    "corpus_perplexity_buckets": ORACLE_PPL_BUCKETS,
    "corpus_zipf_fit": ORACLE_ZIPF_FIT,
    "corpus_source_overlap": ORACLE_SOURCE_OVERLAP,
    "corpus_novelty_curve": ORACLE_NOVELTY_CURVE,
    "corpus_span_leakage": ORACLE_SPAN_LEAKAGE,
    "corpus_doremi_reweight": ORACLE_DOREMI,
    "corpus_mix_plan": ORACLE_MIX_PLAN,
    "dedup_cluster_stats": ORACLE_DEDUP_CLUSTER_STATS,
}
