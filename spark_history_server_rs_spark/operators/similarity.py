"""Similarity search over the ``embeddings`` table — brute-force cosine
top-k (exact baseline), random-hyperplane LSH buckets, and an IVF-style
coarse-quantizer probe. All JVM-side (higher-order-function arithmetic on
``array<float>``), no Python UDFs.

Scale design:

- **brute force**: queries are a tiny fixed set → broadcast them against
  the full corpus; per-partition partial top-k then global
  TakeOrderedAndProject. Linear scan, no shuffle of the corpus.
- **LSH**: each vector maps to a {nb}-bit sign bucket under fixed random
  hyperplanes; search joins query buckets to corpus buckets (equi-join →
  hash partitioned by bucket). At 100 TB the scan is replaced by a bucket
  lookup — 1/2^{nb} of the corpus per probe on average.
- **IVF**: per-``label`` centroids form the coarse quantizer; queries probe
  the NPROBE nearest cells and scan only those cells' vectors (partition
  pruning if the corpus is written partitioned by cell id — the layout this
  operator assumes at scale).

The hyperplane matrix is generated in Python from md5 (deterministic,
seed-free) and inlined as literals into BOTH the Spark plan and the DuckDB
oracle, so the two engines share it by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..functions.planes import EMBEDDING_DIM, md5_planes
from ..functions.views import scoped_temp_view
from .dedup import cosine_expr_duck, cosine_expr_spark

N_QUERIES = 5  # queries = vec_id < 5
TOP_K = 10
N_HYPERPLANES = 4  # → 16 buckets
NPROBE = 2  # IVF cells probed

HYPERPLANES = md5_planes("h", N_HYPERPLANES)


def _plane_array_sql(h: int) -> str:
    vals = ", ".join(f"{v:.1f}" for v in HYPERPLANES[h])
    return f"array({vals})"  # Spark spelling; DuckDB uses [..] below


def _plane_list_duck(h: int) -> str:
    vals = ", ".join(f"{v:.1f}" for v in HYPERPLANES[h])
    return f"[{vals}]"


# ==========================================================================
# X1 — brute-force cosine top-k
# ==========================================================================
#: salt width of the two-phase ranking: the partial top-k window
#: partitions by (query, pmod(neighbor, SALTS)), so no single window
#: partition ever holds more than corpus/SALTS candidates and the final
#: per-query window ranks at most SALTS × k survivors — the standard
#: distributed top-k shape (a plain per-query window funnels the WHOLE
#: corpus's candidates for one query through one task).
TOPK_SALTS = 32

_TOPK_TAIL = """
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {cos} AS cosine
  FROM {qsrc} q JOIN {csrc} c ON c.vec_id <> q.vec_id
  WHERE q.vec_id < {nq}
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine, rank
FROM ranked WHERE rank <= {k}
ORDER BY query_id, rank
"""

#: Spark spelling: two-phase ranking. The global top-k is exactly the
#: top-k of the union of per-salt top-ks (every global winner wins its
#: salt too), so the result is provably identical to the one-window
#: oracle form — the DuckDB twin keeps the single window, making the
#: equivalence differentially checked on every run.
_TOPK_SPARK_TAIL = """
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {cos} AS cosine
  FROM {qsrc} q JOIN {csrc} c ON c.vec_id <> q.vec_id
  WHERE q.vec_id < {nq}
),
partial AS (
  SELECT query_id, neighbor_id, cosine FROM (
    SELECT *, ROW_NUMBER() OVER (
             PARTITION BY query_id, pmod(neighbor_id, {salts})
             ORDER BY cosine DESC, neighbor_id) AS prank
    FROM scored
  ) WHERE prank <= {k}
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS rank
  FROM partial
)
SELECT query_id, neighbor_id, cosine, rank
FROM ranked WHERE rank <= {k}
ORDER BY query_id, rank
"""


def ann_cosine_topk(emb: DataFrame) -> DataFrame:
    """X1: exact top-{k} cosine neighbors for the {nq} probe queries.
    The query side is broadcast (tiny); ranking is TWO-PHASE (see
    TOPK_SALTS): per-(query, salt) partial top-k bounds every window
    partition to corpus/{salts} candidates, then the final per-query
    window ranks ≤ {salts} × {k} survivors — no task ever funnels one
    query's whole candidate set. Result provably identical to the
    single-window form (every global winner wins its salt), which the
    DuckDB oracle keeps — the equivalence is hash-checked every
    run.""".format(k=TOP_K, nq=N_QUERIES, salts=TOPK_SALTS)
    with scoped_temp_view(
        emb.where("embedding IS NOT NULL"), "_sim_emb"
    ) as ev:
        return emb.sparkSession.sql(
            "WITH "
            + _TOPK_SPARK_TAIL.format(
                cos=cosine_expr_spark("q.embedding", "c.embedding"),
                qsrc=ev,
                csrc=ev,
                nq=N_QUERIES,
                k=TOP_K,
                salts=TOPK_SALTS,
            )
        )


ORACLE_ANN_TOPK = "WITH " + _TOPK_TAIL.format(
    cos=cosine_expr_duck("q.embedding", "c.embedding"),
    qsrc="(SELECT * FROM embeddings WHERE embedding IS NOT NULL)",
    csrc="(SELECT * FROM embeddings WHERE embedding IS NOT NULL)",
    nq=N_QUERIES,
    k=TOP_K,
)


# ==========================================================================
# X2 — LSH-bucketed ANN (random hyperplanes)
# ==========================================================================
def _bucket_expr(vec: str, spark: bool) -> str:
    """Sign-bit bucket id: bit h = (r6-rounded projection on plane h) > 0.
    Rounding before the sign comparison keeps both engines' branch
    decisions identical."""
    bits = []
    for h in range(N_HYPERPLANES):
        plane = _plane_array_sql(h) if spark else _plane_list_duck(h)
        if spark:
            proj = (
                f"aggregate(zip_with({vec}, {plane},"
                " (x, y) -> CAST(x AS DOUBLE) * y), 0D, (acc, x) -> acc + x)"
            )
        else:
            proj = f"list_dot_product(CAST({vec} AS DOUBLE[]), {plane})"
        rounded = f"FLOOR(({proj}) * 1000000.0 + 0.5) / CAST(1000000.0 AS DOUBLE)"
        bits.append(f"(CASE WHEN {rounded} > 0 THEN {1 << h} ELSE 0 END)")
    return "(" + " + ".join(bits) + ")"


_LSH_TAIL = """
bucketed AS (
  SELECT vec_id, embedding, {bucket} AS bucket FROM {src}
),
scored AS (
  SELECT q.vec_id AS query_id, q.bucket, c.vec_id AS neighbor_id, {cos} AS cosine
  FROM bucketed q JOIN bucketed c
    ON c.bucket = q.bucket AND c.vec_id <> q.vec_id
  WHERE q.vec_id < {nq}
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, bucket, neighbor_id, cosine, rank
FROM ranked WHERE rank <= {k}
ORDER BY query_id, rank
"""


def ann_lsh_bucketed(emb: DataFrame) -> DataFrame:
    """X2: ANN restricted to the query's {nb}-hyperplane sign bucket —
    the scale path: bucket equi-join instead of full scan. Recall vs X1 is
    measurable by diffing the two results.""".format(nb=N_HYPERPLANES)
    with scoped_temp_view(
        emb.where("embedding IS NOT NULL"), "_sim_emb"
    ) as ev:
        return emb.sparkSession.sql(
            "WITH "
            + _LSH_TAIL.format(
                bucket=_bucket_expr("embedding", spark=True),
                cos=cosine_expr_spark("q.embedding", "c.embedding"),
                src=ev,
                nq=N_QUERIES,
                k=TOP_K,
            )
        )


ORACLE_ANN_LSH = "WITH " + _LSH_TAIL.format(
    bucket=_bucket_expr("embedding", spark=False),
    cos=cosine_expr_duck("q.embedding", "c.embedding"),
    src="(SELECT * FROM embeddings WHERE embedding IS NOT NULL)",
    nq=N_QUERIES,
    k=TOP_K,
)


# ==========================================================================
# X3 — IVF-style probe via per-label centroids
# ==========================================================================
# Centroid components are r6-rounded per dimension, so the (order-sensitive)
# float average cannot produce cross-engine ulp differences downstream.
_IVF_SPARK = """
exploded AS (
  SELECT label, posexplode(embedding) AS (i, x) FROM {src}
),
centroid_dims AS (
  SELECT label, i,
         FLOOR(AVG(CAST(x AS DOUBLE)) * 1000000.0 + 0.5) / CAST(1000000.0 AS DOUBLE) AS c
  FROM exploded GROUP BY label, i
),
centroids AS (
  SELECT label,
         transform(array_sort(collect_list(struct(i, c))), s -> s.c) AS centroid
  FROM centroid_dims GROUP BY label
)
"""

_IVF_DUCK = """
exploded AS (
  SELECT label,
         generate_subscripts(embedding, 1) AS i,
         unnest(embedding) AS x
  FROM {src}
),
centroid_dims AS (
  SELECT label, i,
         FLOOR(AVG(CAST(x AS DOUBLE)) * 1000000.0 + 0.5) / CAST(1000000.0 AS DOUBLE) AS c
  FROM exploded GROUP BY label, i
),
centroids AS (
  SELECT label, list(c ORDER BY i) AS centroid
  FROM centroid_dims GROUP BY label
)
"""

_IVF_TAIL = """,
probes AS (
  SELECT query_id, label FROM (
    SELECT q.vec_id AS query_id, ct.label,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
                              ORDER BY {qc_cos} DESC, ct.label) AS crank
    FROM {src} q JOIN centroids ct ON 1 = 1
    WHERE q.vec_id < {nq}
  ) WHERE crank <= {nprobe}
),
scored AS (
  SELECT q.vec_id AS query_id, c.label AS probed_label,
         c.vec_id AS neighbor_id, {cos} AS cosine
  FROM {src} q
  JOIN probes p ON p.query_id = q.vec_id
  JOIN {src} c ON c.label = p.label AND c.vec_id <> q.vec_id
  WHERE q.vec_id < {nq}
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, probed_label, neighbor_id, cosine, rank
FROM ranked WHERE rank <= {k}
ORDER BY query_id, rank
"""


def ann_ivf(emb: DataFrame) -> DataFrame:
    """X3: IVF probe — coarse quantizer = per-``label`` centroids, queries
    probe the {np} nearest cells and rank only those cells' vectors.
    At 100 TB the corpus is written partitioned by cell id, so the cell
    join becomes partition pruning.""".format(np=NPROBE)
    with scoped_temp_view(
        emb.where("embedding IS NOT NULL"), "_sim_emb"
    ) as ev:
        return emb.sparkSession.sql(
            "WITH "
            + _IVF_SPARK.format(src=ev)
            + _IVF_TAIL.format(
                qc_cos=cosine_expr_spark("q.embedding", "ct.centroid"),
                cos=cosine_expr_spark("q.embedding", "c.embedding"),
                src=ev,
                nq=N_QUERIES,
                nprobe=NPROBE,
                k=TOP_K,
            )
        )


def _ivf_duck_cos(a: str, b: str) -> str:
    # centroid is DOUBLE[] already; embedding needs the cast. Zero-norm
    # guard mirrors cosine_expr_duck: a failed-encode zero vector gets
    # cosine 0.0 in both engines instead of NULL/crash.
    dot = f"list_dot_product(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[]))"
    na = f"sqrt(list_dot_product(CAST({a} AS DOUBLE[]), CAST({a} AS DOUBLE[])))"
    nb = f"sqrt(list_dot_product(CAST({b} AS DOUBLE[]), CAST({b} AS DOUBLE[])))"
    return (
        f"CASE WHEN ({na} * {nb}) = 0 THEN CAST(0.0 AS DOUBLE) ELSE "
        f"FLOOR(({dot} / ({na} * {nb})) * 1000000.0 + 0.5)"
        f" / CAST(1000000.0 AS DOUBLE) END"
    )


ORACLE_ANN_IVF = (
    "WITH "
    + _IVF_DUCK.format(src="(SELECT * FROM embeddings WHERE embedding IS NOT NULL)")
    + _IVF_TAIL.format(
        qc_cos=_ivf_duck_cos("q.embedding", "ct.centroid"),
        cos=_ivf_duck_cos("q.embedding", "c.embedding"),
        src="(SELECT * FROM embeddings WHERE embedding IS NOT NULL)",
        nq=N_QUERIES,
        nprobe=NPROBE,
        k=TOP_K,
    )
)


# ==========================================================================
# X4 — recall evaluation: LSH bucket probe vs exact top-k
# ==========================================================================
#: The eval every ANN deployment runs before trusting the approximate
#: path: per-query |exact ∩ approx| / k. Composes X1 and X2 in one query
#: (CTE-renamed so both pipelines coexist); the oracle recomputes both
#: sides in DuckDB, so the *measurement* is cross-checked, not just the
#: inputs.
_RECALL_TAIL = """
exact_scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {cos} AS cosine
  FROM {src} q JOIN {src} c ON c.vec_id <> q.vec_id
  WHERE q.vec_id < {nq}
),
exact_k AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, neighbor_id) AS rank
    FROM exact_scored
  ) WHERE rank <= {k}
),
lsh_bucketed AS (
  SELECT vec_id, embedding, {bucket} AS bucket FROM {src}
),
lsh_scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {cos} AS cosine
  FROM lsh_bucketed q JOIN lsh_bucketed c
    ON c.bucket = q.bucket AND c.vec_id <> q.vec_id
  WHERE q.vec_id < {nq}
),
lsh_k AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, neighbor_id) AS rank
    FROM lsh_scored
  ) WHERE rank <= {k}
),
overlap AS (
  SELECT e.query_id,
         COUNT(*) AS n_exact,
         COUNT(l.neighbor_id) AS n_overlap
  FROM exact_k e LEFT JOIN lsh_k l
    ON l.query_id = e.query_id AND l.neighbor_id = e.neighbor_id
  GROUP BY e.query_id
),
lsh_counts AS (
  SELECT query_id, COUNT(*) AS n_lsh FROM lsh_k GROUP BY query_id
)
SELECT o.query_id, o.n_exact, COALESCE(c.n_lsh, 0) AS n_lsh, o.n_overlap,
       FLOOR((CAST(o.n_overlap AS DOUBLE) / CAST(o.n_exact AS DOUBLE))
             * 10000.0 + 0.5) / CAST(10000.0 AS DOUBLE) AS recall_at_k
FROM overlap o LEFT JOIN lsh_counts c ON c.query_id = o.query_id
ORDER BY o.query_id
"""


def ann_recall_eval(emb: DataFrame) -> DataFrame:
    """X4: recall@{k} of the LSH bucket probe (X2) against the exact
    scan (X1), per probe query — the accept/reject measurement for
    swapping the approximate path in.

    Scale: the exact side is the expensive input (linear scan per query —
    run on the same bounded probe set X1 uses); everything downstream of
    the two top-k sets is a join of {nq}×{k} rows. At 100 TB this is the
    recurring sampled-eval job, not a per-query cost.""".format(
        k=TOP_K, nq=N_QUERIES
    )
    with scoped_temp_view(
        emb.where("embedding IS NOT NULL"), "_sim_emb"
    ) as ev:
        return emb.sparkSession.sql(
            "WITH "
            + _RECALL_TAIL.format(
                cos=cosine_expr_spark("q.embedding", "c.embedding"),
                bucket=_bucket_expr("embedding", spark=True),
                src=ev,
                nq=N_QUERIES,
                k=TOP_K,
            )
        )


ORACLE_ANN_RECALL = "WITH " + _RECALL_TAIL.format(
    cos=cosine_expr_duck("q.embedding", "c.embedding"),
    bucket=_bucket_expr("embedding", spark=False),
    src="(SELECT * FROM embeddings WHERE embedding IS NOT NULL)",
    nq=N_QUERIES,
    k=TOP_K,
)


# ==========================================================================
# X5 — binary-sketch Hamming prefilter + exact cosine rerank
# ==========================================================================
#: Sketch width. 16 sign bits ≈ 2 bytes/vector: at 100 TB the sketch
#: column is ~0.8% of a 64-dim float corpus, so the prefilter pass scans
#: ONLY the (vec_id, sketch) columns — popcount on packed ints, no float
#: math — and the full embedding column is read just for the survivors.
N_SKETCH_BITS = 16
#: Hamming radius admitted to the exact rerank. 6/16 keeps ~the nearest
#: octant of directions while rejecting the bulk of the corpus.
HAMMING_MAX = 6


# Independent of :data:`HYPERPLANES` (namespaced ``s:``) so the sketch
# and the LSH bucket are uncorrelated probes.
SKETCH_PLANES = md5_planes("s", N_SKETCH_BITS)


def _sketch_expr(vec: str, spark: bool) -> str:
    """Packed {nb}-bit sign sketch (same r6-round-before-sign discipline
    as :func:`_bucket_expr`, so both engines set identical bits)."""
    bits = []
    for h in range(N_SKETCH_BITS):
        vals = ", ".join(f"{v:.1f}" for v in SKETCH_PLANES[h])
        if spark:
            proj = (
                f"aggregate(zip_with({vec}, array({vals}),"
                " (x, y) -> CAST(x AS DOUBLE) * y), 0D, (acc, x) -> acc + x)"
            )
        else:
            proj = f"list_dot_product(CAST({vec} AS DOUBLE[]), [{vals}])"
        rounded = f"FLOOR(({proj}) * 1000000.0 + 0.5) / CAST(1000000.0 AS DOUBLE)"
        bits.append(f"(CASE WHEN {rounded} > 0 THEN {1 << h} ELSE 0 END)")
    return "CAST((" + " + ".join(bits) + ") AS BIGINT)"


_HAMMING_TAIL = """
sk AS (
  SELECT vec_id, embedding, {sketch} AS sketch FROM {src}
),
prefiltered AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         CAST(bit_count({xor}) AS BIGINT) AS hamming,
         q.embedding AS q_emb, c.embedding AS c_emb
  FROM sk q JOIN sk c ON c.vec_id <> q.vec_id
  WHERE q.vec_id < {nq}
),
cand AS (
  SELECT query_id, neighbor_id, hamming, {cos} AS cosine
  FROM prefiltered WHERE hamming <= {hmax}
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS rank
  FROM cand
)
SELECT query_id, neighbor_id, hamming, cosine, rank
FROM ranked WHERE rank <= {k}
ORDER BY query_id, rank
"""


def ann_hamming_rerank(emb: DataFrame) -> DataFrame:
    """X5: binary-quantization ANN — a {nb}-bit sign sketch per vector,
    popcount(XOR) Hamming prefilter (radius {hmax}), then exact cosine
    rerank of the survivors only.

    This is the memory-light 100 TB path the brute-force scan (X1)
    graduates to: the sketch is materialized once at ingest (2 bytes a
    vector), the prefilter scans only (vec_id, sketch) — integer popcount
    inside whole-stage codegen, no float math, column-pruned — and the
    float corpus is touched just for the Hamming survivors. Cosine is
    computed AFTER the radius cut, never for rejected pairs.""".format(
        nb=N_SKETCH_BITS, hmax=HAMMING_MAX
    )
    with scoped_temp_view(
        emb.where("embedding IS NOT NULL"), "_sim_emb"
    ) as ev:
        return emb.sparkSession.sql(
            "WITH "
            + _HAMMING_TAIL.format(
                sketch=_sketch_expr("embedding", spark=True),
                xor="q.sketch ^ c.sketch",
                cos=cosine_expr_spark("q_emb", "c_emb"),
                src=ev,
                nq=N_QUERIES,
                hmax=HAMMING_MAX,
                k=TOP_K,
            )
        )


ORACLE_ANN_HAMMING = "WITH " + _HAMMING_TAIL.format(
    sketch=_sketch_expr("embedding", spark=False),
    xor="xor(q.sketch, c.sketch)",
    cos=cosine_expr_duck("q_emb", "c_emb"),
    src="(SELECT * FROM embeddings WHERE embedding IS NOT NULL)",
    nq=N_QUERIES,
    hmax=HAMMING_MAX,
    k=TOP_K,
)


# ==========================================================================
# X6 — τ-thresholded kNN graph (mutual-neighbor edge list)
# ==========================================================================
#: neighbors kept per vector in the graph.
KNN_GRAPH_K = 5
#: similarity floor for graph edges. Sharing the dedup prefilter's
#: threshold family means the 32-bit sketch cutoff's validated recall
#: margin (dedup.hamming_cutoff) applies unchanged.
KNN_GRAPH_TAU = 0.4

_KNN_EDGE_CTES = """
edges AS (
  SELECT src_id, dst_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY src_id
                            ORDER BY cosine DESC, dst_id) AS rank
  FROM pairs WHERE cosine >= {tau}
),
topk AS (SELECT * FROM edges WHERE rank <= {k})"""

#: the mutual-flag projection over a ``topk`` CTE — shared by the live
#: X6 operator, its oracle, and the S16 index's serving twin
#: (``sources/knn_graph.py``), so all three state the same edge list
_KNN_MUTUAL_SELECT = """
SELECT t.src_id, t.dst_id, t.cosine, t.rank,
       (r.src_id IS NOT NULL) AS is_mutual
FROM topk t LEFT JOIN topk r
  ON r.src_id = t.dst_id AND r.dst_id = t.src_id
ORDER BY t.src_id, t.rank
"""

_KNN_TAIL = _KNN_EDGE_CTES + _KNN_MUTUAL_SELECT


def _knn_pairs_spark(ev: str, parts: int) -> str:
    """The sketch-prefiltered half/mirror pair build (X6's optimized
    Spark header, shared with X12) — ``WITH normed …, half …, pairs …,``."""
    from .dedup import _DOT, _NORM, _dedup_sketch_expr, hamming_cutoff

    return """
WITH normed AS (
  SELECT /*+ REPARTITION({parts}) */ vec_id,
         transform(embedding, x -> CASE WHEN {norm} = 0 THEN CAST(0.0 AS DOUBLE)
                                   ELSE CAST(x AS DOUBLE) / {norm} END) AS nv,
         {sketch} AS sketch
  FROM {src}
),
half AS (
  -- cosine is symmetric: evaluate each unordered pair once (a < b) and
  -- mirror the survivors — halves the dominant n²/2 fold loop. Conjunct
  -- order in the ON clause is load-bearing: BroadcastNestedLoopJoin
  -- short-circuits left-to-right and Catalyst keeps the written order,
  -- so the τ fold runs only on popcount survivors (writing τ as an
  -- outer WHERE lets the optimizer push it in FIRST — measured 2.3×
  -- slower on D5b before the same fix).
  SELECT a.vec_id AS src_id, b.vec_id AS dst_id,
         FLOOR(({dot}) * 1000000.0 + 0.5) / CAST(1000000.0 AS DOUBLE) AS cosine
  FROM normed a JOIN normed b
    ON a.vec_id < b.vec_id
   AND bit_count(a.sketch ^ b.sketch) <= {hmax}
   AND FLOOR(({dot}) * 1000000.0 + 0.5) / CAST(1000000.0 AS DOUBLE) >= {tau}
),
pairs AS (
  -- mirror each survivor in the SAME pass with inline(): a UNION ALL of
  -- two references to `half` would inline the CTE twice and re-run the
  -- whole pair join (Spark only sometimes rescues this via AQE stage
  -- reuse — measured bimodal 0.3 s / 6 s); one reference → one join.
  SELECT inline(array(
           named_struct('src_id', src_id, 'dst_id', dst_id, 'cosine', cosine),
           named_struct('src_id', dst_id, 'dst_id', src_id, 'cosine', cosine)))
  FROM half
),""".format(
        parts=parts,
        src=ev,
        norm=_NORM.format(v="embedding"),
        sketch=_dedup_sketch_expr("embedding"),
        dot=_DOT.format(a="a.nv", b="b.nv"),
        hmax=hamming_cutoff(KNN_GRAPH_TAU),
        tau=KNN_GRAPH_TAU,
    )


#: the (vec_id, nv, sketch) node projection every kernel-backed graph
#: build derives from the embeddings — the SAME normalization/sketch
#: expressions as the SQL pair loop's ``normed`` CTE (one source of
#: truth: ``dedup._NORM`` / ``dedup._dedup_sketch_expr``), so kernel
#: and SQL folds see identical inputs. NULL vec_ids are excluded: the
#: SQL pair loop's ``a.vec_id < b.vec_id`` silently drops them from
#: every edge, so excluding them up front is result-identical (and the
#: kernel's int64 id arrays require it). Shared with the S16 index
#: build (``sources/knn_graph.py``).
_KNN_NODES_SQL = """
SELECT vec_id,
       transform(embedding, x -> CASE WHEN {norm} = 0 THEN CAST(0.0 AS DOUBLE)
                                 ELSE CAST(x AS DOUBLE) / {norm} END) AS nv,
       {sketch} AS sketch
FROM {src}
"""


def _knn_nodes_df(emb: DataFrame) -> DataFrame:
    """The kernel's node relation derived from a raw embeddings frame."""
    from .dedup import _NORM, _dedup_sketch_expr

    with scoped_temp_view(
        emb.where("embedding IS NOT NULL AND vec_id IS NOT NULL"), "_sim_emb"
    ) as ev:
        return emb.sparkSession.sql(
            _KNN_NODES_SQL.format(
                src=ev,
                norm=_NORM.format(v="embedding"),
                sketch=_dedup_sketch_expr("embedding"),
            )
        )


def _knn_topk_from_nodes(nodes: DataFrame) -> DataFrame:
    """X6's τ-thresholded top-k edge relation (src_id, dst_id, cosine,
    rank) from a ``(vec_id, nv, sketch)`` node relation, with candidate
    enumeration through the vectorized block-pair kernel
    (``functions/blockpair``) — result-identical to the SQL pair loop
    (the kernel reproduces its float64 fold bit-for-bit; pinned by
    ``test_blockpair_kernel_modes_agree`` and the S16 identity pins)
    but distributed as balanced equi-join groups instead of one
    BroadcastNestedLoopJoin evaluating O(n²) Catalyst folds. Shared by
    the in-session materialized cache below and the S16 index build."""
    from ..functions.blockpair import pair_edges_blocked
    from .dedup import hamming_cutoff

    pairs = pair_edges_blocked(
        nodes, KNN_GRAPH_TAU, hamming_cutoff(KNN_GRAPH_TAU)
    )
    with scoped_temp_view(pairs, "_sim_knn_pairs") as pv:
        return nodes.sparkSession.sql(
            f"WITH pairs AS (SELECT src_id, dst_id, cosine FROM {pv}),"
            + _KNN_EDGE_CTES.format(tau=KNN_GRAPH_TAU, k=KNN_GRAPH_K)
            + "\nSELECT src_id, dst_id, cosine, rank FROM topk"
        )


def _knn_pairs_duck(src: str) -> str:
    """The all-pairs oracle twin of :func:`_knn_pairs_spark`."""
    from .dedup import _NORMED_DUCK

    return (
        "WITH normed AS ("
        + _NORMED_DUCK.format(src=src)
        + """),
pairs AS (
  SELECT a.vec_id AS src_id, b.vec_id AS dst_id,
         FLOOR((list_dot_product(a.nv, b.nv)) * 1000000.0 + 0.5)
           / CAST(1000000.0 AS DOUBLE) AS cosine
  FROM normed a JOIN normed b ON a.vec_id <> b.vec_id
),"""
    )


def materialized_knn_topk_df(emb: DataFrame) -> DataFrame:
    """X6's τ-thresholded top-k edge relation (src_id, dst_id, cosine,
    rank), built ONCE per corpus and persisted through the module cache
    (``dedup._materialized_df`` — thread-safe, semanticHash-keyed,
    cleared with every other derived relation). The graph is ≤ n·k
    three-scalar rows, so caching it is cheap; NOT caching it is the
    trap: Spark inlines SQL CTEs, so any plan referencing the ``topk``
    CTE twice (X13 hops through it twice) re-runs the WHOLE
    sketch-prefiltered pair loop per reference — measured 13.8 s vs
    4.4 s for the single-reference X12 at sf0.1. The durable
    cross-session form of this cache is the S16 index
    (``sources/knn_graph.py``).

    The BUILD runs through the vectorized block-pair kernel
    (:func:`_knn_topk_from_nodes`) — the same topology as the S16
    index build, no BroadcastNestedLoopJoin (plan-gated). The
    registered ``ann_knn_graph`` keeps the SQL pair-loop form as the
    cross-check lattice's spec member (DuckDB oracle ↔ popcount-BNLJ
    SQL ↔ block kernel); this cache, which every live X12/X13 call
    rides, gets the scale topology."""
    from .dedup import _materialized_df

    spark = emb.sparkSession

    def build():
        return _knn_topk_from_nodes(_knn_nodes_df(emb))

    return _materialized_df(
        spark, "_sim_knn_topk", emb.semanticHash(), build
    )


def ann_knn_graph(emb: DataFrame) -> DataFrame:
    """X6: the corpus-wide kNN graph — for every vector, its top-{k}
    neighbors at cosine ≥ {tau}, with the mutual-kNN flag (the edge set
    SNN/HDBSCAN-style clustering and graph-based near-dup mining consume).
    Thresholding the graph is what makes it buildable at scale: the k-th
    neighbor's similarity is unknown a priori, but edges below τ are
    worthless to the consumers, so the candidate set is exactly the
    τ-qualifying pairs — which the 32-bit sign-sketch popcount prefilter
    (shared with dedup D5b, binomial 4σ cutoff) admits without scanning
    float pairs.

    Scale shape: the pair loop runs on (vec_id, 4-byte sketch) inside
    whole-stage codegen; float folds only for Hamming survivors; the rank
    window shuffles qualifying edges keyed by src_id; the mutual check is
    a self-join of the bounded (≤ n·k rows) top-k edge set. The oracle is
    the ALL-PAIRS form — a different plan must reproduce the graph
    exactly.""".format(k=KNN_GRAPH_K, tau=KNN_GRAPH_TAU)
    parts = emb.sparkSession.sparkContext.defaultParallelism
    with scoped_temp_view(
        emb.where("embedding IS NOT NULL"), "_sim_emb"
    ) as ev:
        return emb.sparkSession.sql(
            _knn_pairs_spark(ev, parts)
            + _KNN_TAIL.format(tau=KNN_GRAPH_TAU, k=KNN_GRAPH_K)
        )


def _oracle_knn_graph() -> str:
    return _knn_pairs_duck(
        "(SELECT * FROM embeddings WHERE embedding IS NOT NULL)"
    ) + _KNN_TAIL.format(tau=KNN_GRAPH_TAU, k=KNN_GRAPH_K)


ORACLE_ANN_KNN_GRAPH = _oracle_knn_graph()

#: Registry metadata mirroring ``dedup.BASELINE_ONLY``: registered ops
#: whose catalog form is the SQL spec of the cross-check lattice (kept
#: runnable at oracle scale), while production serving rides a durable
#: index — each value names the (sources module, build fn, serve fn)
#: triple a catalog user should reach for at scale: S16 (knn_graph)
#: for the graph family, S14 (ann_index) for the IVFADC family.
#: tests/test_oracle_parity.py pins keys registered + siblings existing;
#: ``dedup.INDEX_SERVED`` is the S13 half of the same contract.
INDEX_SERVED: dict[str, tuple[str, str, str]] = {
    "ann_knn_graph": (
        "knn_graph", "write_knn_graph", "ann_knn_graph_from_index"
    ),
    "ann_graph_expand": (
        "knn_graph", "write_knn_graph", "ann_graph_expand_from_index"
    ),
    "ann_graph_expand2": (
        "knn_graph", "write_knn_graph", "ann_graph_expand2_from_index"
    ),
    "ann_ivf_pq": (
        "ann_index", "write_ann_index", "ann_ivf_pq_from_index"
    ),
    "ann_ivf_pq_residual": (
        "ann_index", "write_ann_index", "ann_ivf_pq_residual_from_index"
    ),
    "ann_nprobe_recall": (
        "ann_index", "write_ann_index", "ann_nprobe_recall_from_index"
    ),
    "ann_crossencoder_rerank": (
        "ann_index", "write_ann_index", "ann_crossencoder_rerank_from_index"
    ),
}


# ==========================================================================
# X12 — graph-expansion ANN (bucket seeds + one kNN-graph hop, recall gain)
# ==========================================================================
#: The graph-based ANN family (NSW/HNSW's core move — Malkov & Yashunin
#: 2016, arXiv:1603.09320 — reach better neighbors through neighbors'
#: neighbors) stated as one declarative plan: seed each query with its
#: LSH-bucket members (X2's probe), expand ONE hop through X6's
#: τ-thresholded kNN graph, exact-rerank the union, and report recall
#: BOTH ways — seeds-only vs graph-expanded — from the same scored
#: relation, so the row IS the measured value of the graph hop.
#: Because every ranking uses the same total order (cosine DESC, id),
#: expanding the candidate set can only improve overlap with the exact
#: top-k (any displacing candidate outranks the displaced one and is
#: therefore itself in the exact top-k) — recall_graph ≥ recall_seed is
#: a THEOREM here, pinned per-row by pytest/REST, not a tendency.
#: seed CTEs split out so the S16 serving twin can define `seeds`
#: BEFORE its edge-scan CTEs (the probed-bucket partition filter on the
#: persisted edges references seeds — see ``sources/knn_graph.py``)
_GRAPH_EXPAND_SEEDS = """
bucketed AS (
  SELECT vec_id, embedding, {bucket} AS bucket FROM {src}
),
seeds AS (
  SELECT q.vec_id AS query_id, c.vec_id AS cand_id
  FROM bucketed q JOIN bucketed c
    ON c.bucket = q.bucket AND c.vec_id <> q.vec_id
  WHERE q.vec_id < {nq}
)"""

_GRAPH_EXPAND_AFTER = """,
hop AS (
  SELECT DISTINCT s.query_id, e.dst_id AS cand_id
  FROM seeds s JOIN topk e ON e.src_id = s.cand_id
  WHERE e.dst_id <> s.query_id
),
cands AS (
  SELECT query_id, cand_id, CAST(MAX(is_seed) AS BIGINT) AS is_seed FROM (
    SELECT query_id, cand_id, 1 AS is_seed FROM seeds
    UNION ALL
    SELECT query_id, cand_id, 0 AS is_seed FROM hop
  ) GROUP BY query_id, cand_id
),
scored AS (
  SELECT c.query_id, c.cand_id, c.is_seed, {cos_qc} AS cosine
  FROM cands c
  JOIN {src} q ON q.vec_id = c.query_id
  JOIN {src} x ON x.vec_id = c.cand_id
),
graph_k AS (
  SELECT query_id, cand_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, cand_id) AS rnk
    FROM scored
  ) WHERE rnk <= {k}
),
seed_k AS (
  SELECT query_id, cand_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, cand_id) AS rnk
    FROM scored WHERE is_seed = 1
  ) WHERE rnk <= {k}
),
exact_scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS cand_id, {cos_exact} AS cosine
  FROM {src} q JOIN {src} c ON c.vec_id <> q.vec_id
  WHERE q.vec_id < {nq}
),
exact_k AS (
  SELECT query_id, cand_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, cand_id) AS rnk
    FROM exact_scored
  ) WHERE rnk <= {k}
),
ov AS (
  SELECT e.query_id,
         COUNT(*) AS n_exact,
         COUNT(s.cand_id) AS n_seed_overlap,
         COUNT(g.cand_id) AS n_graph_overlap
  FROM exact_k e
  LEFT JOIN seed_k s ON s.query_id = e.query_id AND s.cand_id = e.cand_id
  LEFT JOIN graph_k g ON g.query_id = e.query_id AND g.cand_id = e.cand_id
  GROUP BY e.query_id
)
SELECT query_id,
       CAST(n_exact AS BIGINT) AS n_exact,
       CAST(n_seed_overlap AS BIGINT) AS n_seed_overlap,
       CAST(n_graph_overlap AS BIGINT) AS n_graph_overlap,
       FLOOR((CAST(n_seed_overlap AS DOUBLE) / n_exact) * 10000.0 + 0.5)
         / CAST(10000.0 AS DOUBLE) AS recall_seed,
       FLOOR((CAST(n_graph_overlap AS DOUBLE) / n_exact) * 10000.0 + 0.5)
         / CAST(10000.0 AS DOUBLE) AS recall_graph
FROM ov
ORDER BY query_id
"""

_GRAPH_EXPAND_BODY = "," + _GRAPH_EXPAND_SEEDS + _GRAPH_EXPAND_AFTER


# ==========================================================================
# X13 — search-depth curve: 2-hop graph expansion (beam-depth vs recall)
# ==========================================================================
#: X12 measures ONE hop; graph-ANN deployments tune search DEPTH (the
#: ef/beam parameter in NSW/HNSW terms): every extra hop widens the
#: candidate set through neighbors-of-neighbors at the cost of another
#: bounded adjacency join. This op reports the whole depth curve —
#: recall at seeds-only, 1 hop, 2 hops — from ONE scored relation (each
#: candidate keeps its MINIMUM hop level; depth-d recall filters
#: hop_level ≤ d), so the curve costs one rerank, not three. Under the
#: shared total order (cosine DESC, id) the candidate sets are nested
#: by construction, so recall_hop2 ≥ recall_hop1 ≥ recall_seed is the
#: same THEOREM as X12's, now pinned across the whole curve.
_GRAPH_EXPAND2_AFTER = """,
hop1 AS (
  SELECT DISTINCT s.query_id, e.dst_id AS cand_id
  FROM seeds s JOIN {topk} e ON e.src_id = s.cand_id
  WHERE e.dst_id <> s.query_id
),
hop2 AS (
  SELECT DISTINCT h.query_id, e.dst_id AS cand_id
  FROM hop1 h JOIN {topk} e ON e.src_id = h.cand_id
  WHERE e.dst_id <> h.query_id
),
cands AS (
  SELECT query_id, cand_id, CAST(MIN(lvl) AS BIGINT) AS hop_level FROM (
    SELECT query_id, cand_id, 0 AS lvl FROM seeds
    UNION ALL
    SELECT query_id, cand_id, 1 AS lvl FROM hop1
    UNION ALL
    SELECT query_id, cand_id, 2 AS lvl FROM hop2
  ) GROUP BY query_id, cand_id
),
ranked AS (
  -- ONE scored relation, three depth ranks as conditional windows
  -- (same partition key → one exchange). Three per-depth top-k CTEs
  -- would each re-inline `scored` and its embedding joins (Spark
  -- inlines SQL CTEs — the same trap the cached graph avoids). A
  -- depth-d rank is valid only on rows with hop_level ≤ d — rows
  -- outside the depth sort after every in-depth row (NULL sort keys),
  -- so in-depth ranks are deterministic and the tail's arbitrary
  -- numbering is never read.
  SELECT query_id, cand_id, hop_level,
         ROW_NUMBER() OVER (PARTITION BY query_id
           ORDER BY CASE WHEN hop_level = 0 THEN cosine END DESC NULLS LAST,
                    CASE WHEN hop_level = 0 THEN cand_id END NULLS LAST) AS r0,
         ROW_NUMBER() OVER (PARTITION BY query_id
           ORDER BY CASE WHEN hop_level <= 1 THEN cosine END DESC NULLS LAST,
                    CASE WHEN hop_level <= 1 THEN cand_id END NULLS LAST) AS r1,
         ROW_NUMBER() OVER (PARTITION BY query_id
           ORDER BY cosine DESC, cand_id) AS r2
  FROM (
    SELECT c.query_id, c.cand_id, c.hop_level, {cos_qc} AS cosine
    FROM cands c
    JOIN {src} q ON q.vec_id = c.query_id
    JOIN {src} x ON x.vec_id = c.cand_id
  )
),
exact_k AS (
  SELECT query_id, cand_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS cand_id, {cos_exact} AS cosine,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
                              ORDER BY {cos_exact} DESC, c.vec_id) AS rnk
    FROM {src} q JOIN {src} c ON c.vec_id <> q.vec_id
    WHERE q.vec_id < {nq}
  ) WHERE rnk <= {k}
),
ov AS (
  -- one join of the exact top-k against the single ranked relation;
  -- each depth's overlap is a conditional count
  SELECT e.query_id,
         COUNT(*) AS n_exact,
         COUNT(CASE WHEN r.hop_level = 0 AND r.r0 <= {k} THEN 1 END)
           AS n_seed_overlap,
         COUNT(CASE WHEN r.hop_level <= 1 AND r.r1 <= {k} THEN 1 END)
           AS n_hop1_overlap,
         COUNT(CASE WHEN r.r2 <= {k} THEN 1 END) AS n_hop2_overlap
  FROM exact_k e
  LEFT JOIN ranked r
    ON r.query_id = e.query_id AND r.cand_id = e.cand_id
  GROUP BY e.query_id
)
SELECT query_id,
       CAST(n_exact AS BIGINT) AS n_exact,
       CAST(n_seed_overlap AS BIGINT) AS n_seed_overlap,
       CAST(n_hop1_overlap AS BIGINT) AS n_hop1_overlap,
       CAST(n_hop2_overlap AS BIGINT) AS n_hop2_overlap,
       FLOOR((CAST(n_seed_overlap AS DOUBLE) / n_exact) * 10000.0 + 0.5)
         / CAST(10000.0 AS DOUBLE) AS recall_seed,
       FLOOR((CAST(n_hop1_overlap AS DOUBLE) / n_exact) * 10000.0 + 0.5)
         / CAST(10000.0 AS DOUBLE) AS recall_hop1,
       FLOOR((CAST(n_hop2_overlap AS DOUBLE) / n_exact) * 10000.0 + 0.5)
         / CAST(10000.0 AS DOUBLE) AS recall_hop2
FROM ov
ORDER BY query_id
"""


def ann_graph_expand2(emb: DataFrame) -> DataFrame:
    """X13: the graph-search DEPTH curve — recall@{k} at seeds-only,
    one hop, and two hops through X6's τ-thresholded kNN graph, from
    ONE scored relation (see the block comment; candidates keep their
    MINIMUM hop level, so depth-d recall is a hop_level ≤ d filter).
    recall_hop2 ≥ recall_hop1 ≥ recall_seed is a theorem under the
    shared tie-break — the X12 monotonicity argument applied across the
    whole curve. This is the ef/beam-depth tuning measurement of the
    NSW/HNSW family (Malkov & Yashunin 2016).

    Scale shape: each hop is one more join against the SAME bounded
    (≤ n·{gk} rows) top-k edge relation — which this op reads from the
    MATERIALIZED in-session graph (:func:`materialized_knn_topk_df`):
    both hops reference ``topk``, and the uncached form would run the
    whole pair loop once per hop (measured 13.8 s vs 2.1 s warm at
    sf0.1 — see the in-function comment for the WithCTE cache-blindness
    this forces the Spark side around). Adjacency rows are three scalars;
    floats are read once for the union's exact rerank; the exact side
    stays the bounded {nq}-query sampled eval. At 100 TB the graph is
    the durable S16 artifact (sources/knn_graph.py), so hops read
    persisted bucket-pruned adjacency.""".format(
        k=TOP_K, gk=KNN_GRAPH_K, nq=N_QUERIES
    )
    topk_df = materialized_knn_topk_df(emb)
    return _graph_expand2_over_topk(emb, lambda prev: topk_df)


#: per-depth output columns: (count alias, recall alias, hop_level
#: predicate — None = all levels). X12 reports (seed, graph); X13 the
#: full three-point curve. The SQL is generated from these, so both ops
#: share one body and their overlapping columns are computed identically.
_DEPTH_LEVELS_X12 = (
    ("n_seed_overlap", "recall_seed", "hop_level = 0"),
    ("n_graph_overlap", "recall_graph", None),
)
_DEPTH_LEVELS_X13 = (
    ("n_seed_overlap", "recall_seed", "hop_level = 0"),
    ("n_hop1_overlap", "recall_hop1", "hop_level <= 1"),
    ("n_hop2_overlap", "recall_hop2", None),
)


def _graph_expand2_over_topk(emb: DataFrame, hop_edges) -> DataFrame:
    """X13's body over a caller-supplied edge source (see
    :func:`_graph_depth_recall`)."""
    return _graph_depth_recall(emb, hop_edges, _DEPTH_LEVELS_X13)


def _graph_depth_recall(emb: DataFrame, hop_edges, levels) -> DataFrame:
    """Shared X12/X13 body over a caller-supplied edge source:
    ``hop_edges(prev)`` returns the top-k edge relation (src_id,
    dst_id, …) to hop from the candidate set ``prev`` — the live ops
    pass the in-session cached graph; the S16 serving twins pass the
    persisted adjacency pruned to ``prev``'s src buckets
    (``sources/knn_graph.py``). ``levels`` defines the reported depth
    points (len(levels) − 1 hops are taken).

    DataFrame-composed + a WITH-free final SQL, NOT the oracle's CTE
    template: the cache manager does not substitute InMemoryRelations
    anywhere in a plan containing a WithCTE node, so ANY ``WITH`` in
    the consuming query silently re-runs the whole cached pair loop per
    ``topk`` reference (measured: 13.8 s vs 2.1 s warm at sf0.1 on
    X13). The oracle keeps the single CTE spelling, so the two
    formulations differentially check each other."""
    from pyspark.sql import functions as F

    spark = emb.sparkSession
    e = emb.where("embedding IS NOT NULL")
    bucketed = e.selectExpr(
        "vec_id",
        "embedding",
        f"{_bucket_expr('embedding', spark=True)} AS bucket",
    )
    seeds = (
        bucketed.alias("q")
        .join(
            bucketed.alias("c"),
            (F.col("c.bucket") == F.col("q.bucket"))
            & (F.col("c.vec_id") != F.col("q.vec_id")),
        )
        .where(F.col("q.vec_id") < N_QUERIES)
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("c.vec_id").alias("cand_id"),
        )
    )

    def one_hop(prev):
        return (
            prev.alias("s")
            .join(
                hop_edges(prev).alias("e"),
                F.col("e.src_id") == F.col("s.cand_id"),
            )
            .where(F.col("e.dst_id") != F.col("s.query_id"))
            .select(
                F.col("s.query_id").alias("query_id"),
                F.col("e.dst_id").alias("cand_id"),
            )
            .distinct()
        )

    frontier = seeds
    tiers = [seeds.select("query_id", "cand_id", F.lit(0).alias("lvl"))]
    for lvl in range(1, len(levels)):
        frontier = one_hop(frontier)
        tiers.append(
            frontier.select("query_id", "cand_id", F.lit(lvl).alias("lvl"))
        )
    from functools import reduce as _reduce

    cands = (
        _reduce(DataFrame.unionAll, tiers)
        .groupBy("query_id", "cand_id")
        .agg(F.min("lvl").cast("bigint").alias("hop_level"))
    )
    cos_qc = cosine_expr_spark("q.embedding", "x.embedding")
    cos_exact = cosine_expr_spark("q.embedding", "c.embedding")
    # one conditional rank column per depth point (shared partition key
    # → one exchange, no per-depth re-inline of the scored relation);
    # rows outside a depth sort after every in-depth row, so in-depth
    # ranks are deterministic and the tail's numbering is never read
    rank_cols = []
    count_cols = []
    out_counts = []
    out_recalls = []
    for i, (n_col, r_col, cond) in enumerate(levels):
        if cond is None:
            rank_cols.append(
                f"           ROW_NUMBER() OVER (PARTITION BY query_id\n"
                f"             ORDER BY cosine DESC, cand_id) AS r{i}"
            )
            count_cols.append(
                f"         COUNT(CASE WHEN r.r{i} <= {TOP_K} THEN 1 END)"
                f" AS {n_col}"
            )
        else:
            rank_cols.append(
                f"           ROW_NUMBER() OVER (PARTITION BY query_id\n"
                f"             ORDER BY CASE WHEN {cond} THEN cosine END"
                f" DESC NULLS LAST,\n"
                f"                      CASE WHEN {cond} THEN cand_id END"
                f" NULLS LAST) AS r{i}"
            )
            count_cols.append(
                f"         COUNT(CASE WHEN r.{cond}"
                f" AND r.r{i} <= {TOP_K} THEN 1 END) AS {n_col}"
            )
        out_counts.append(f"       CAST({n_col} AS BIGINT) AS {n_col}")
        out_recalls.append(
            f"       FLOOR((CAST({n_col} AS DOUBLE) / n_exact) * 10000.0 + 0.5)\n"
            f"         / CAST(10000.0 AS DOUBLE) AS {r_col}"
        )
    with scoped_temp_view(e, "_sim_emb") as ev, scoped_temp_view(
        cands, "_xgraph_cands"
    ) as cv:
        return spark.sql(f"""
SELECT query_id,
       CAST(n_exact AS BIGINT) AS n_exact,
{",".join(out_counts)},
{",".join(out_recalls)}
FROM (
  SELECT e.query_id,
         COUNT(*) AS n_exact,
{",".join(count_cols)}
  FROM (
    SELECT query_id, cand_id FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
             ROW_NUMBER() OVER (PARTITION BY q.vec_id
                                ORDER BY {cos_exact} DESC, c.vec_id) AS rnk
      FROM {ev} q JOIN {ev} c ON c.vec_id <> q.vec_id
      WHERE q.vec_id < {N_QUERIES}
    ) WHERE rnk <= {TOP_K}
  ) e
  LEFT JOIN (
    SELECT query_id, cand_id, hop_level,
{",".join(rank_cols)}
    FROM (
      SELECT c.query_id, c.cand_id, c.hop_level, {cos_qc} AS cosine
      FROM {cv} c
      JOIN {ev} q ON q.vec_id = c.query_id
      JOIN {ev} x ON x.vec_id = c.cand_id
    )
  ) r ON r.query_id = e.query_id AND r.cand_id = e.cand_id
  GROUP BY e.query_id
)
ORDER BY query_id
""")


def _oracle_ann_graph_expand2() -> str:
    src = "(SELECT * FROM embeddings WHERE embedding IS NOT NULL)"
    return (
        _knn_pairs_duck(src)
        + _KNN_EDGE_CTES.format(tau=KNN_GRAPH_TAU, k=KNN_GRAPH_K)
        + ","
        + _GRAPH_EXPAND_SEEDS.format(
            src=src,
            bucket=_bucket_expr("embedding", spark=False),
            nq=N_QUERIES,
        )
        + _GRAPH_EXPAND2_AFTER.format(
            k=TOP_K,
            nq=N_QUERIES,
            src=src,
            topk="topk",
            cos_qc=cosine_expr_duck("q.embedding", "x.embedding"),
            cos_exact=cosine_expr_duck("q.embedding", "c.embedding"),
        )
    )


ORACLE_ANN_GRAPH_EXPAND2 = _oracle_ann_graph_expand2()


def ann_graph_expand(emb: DataFrame) -> DataFrame:
    """X12: graph-expansion ANN — LSH-bucket seeds widened by one hop
    through the τ-thresholded kNN graph, exact-reranked, with
    recall@{k} measured seeds-only AND graph-expanded in the same pass
    (see the block comment: recall_graph ≥ recall_seed is a theorem
    under the shared tie-break, pinned per-row).

    Scale shape: at 100 TB the graph IS the durable S16 artifact
    (``sources/knn_graph.py``: ``write_knn_graph`` runs X6's
    sketch-prefiltered pair loop once, ``ann_graph_expand_from_index``
    serves THIS measurement from the persisted bucket-pruned adjacency
    result-identically — the serving path a deployment uses; this live
    form is the from-scratch twin the index is pinned against) and a
    query touches its bucket + ≤ bucket×{gk} edge rows — the expansion
    joins key on cand_id/src_id, floats are read only for the union's
    exact rerank, and the exact side stays the bounded {nq}-query
    sampled eval. In-session, the traversed graph is the MATERIALIZED
    edge relation (:func:`materialized_knn_topk_df` — EXACTLY X6's
    artifact: τ, per-node k = KNN_GRAPH_K), built once per corpus and
    shared with X13; the rerank top-k is the query-side TOP_K.""".format(
        k=TOP_K, gk=KNN_GRAPH_K, nq=N_QUERIES
    )
    topk_df = materialized_knn_topk_df(emb)
    return _graph_depth_recall(
        emb, lambda prev: topk_df, _DEPTH_LEVELS_X12
    )


def _oracle_ann_graph_expand() -> str:
    src = "(SELECT * FROM embeddings WHERE embedding IS NOT NULL)"
    return (
        _knn_pairs_duck(src)
        + _KNN_EDGE_CTES.format(tau=KNN_GRAPH_TAU, k=KNN_GRAPH_K)
        + _GRAPH_EXPAND_BODY.format(
            k=TOP_K,
            nq=N_QUERIES,
            src=src,
            bucket=_bucket_expr("embedding", spark=False),
            cos_qc=cosine_expr_duck("q.embedding", "x.embedding"),
            cos_exact=cosine_expr_duck("q.embedding", "c.embedding"),
        )
    )


ORACLE_ANN_GRAPH_EXPAND = _oracle_ann_graph_expand()


# ==========================================================================
# X6/X7 — product quantization (PQ codes + ADC recall eval)
# ==========================================================================
#: PQ (Jegou, Douze, Schmid 2011, "Product quantization for nearest
#: neighbor search", IEEE TPAMI — public) is THE memory-scale ANN path:
#: split each vector into PQ_M subvectors, quantize each against a
#: PQ_K-codeword codebook, store M small codes per vector (here 4 bytes
#: vs 256 float bytes — 64x), and answer queries with asymmetric
#: distance computation (ADC): per-query lookup tables over codewords,
#: summed per candidate. Codebook = the subvectors of vec_id 0..PQ_K-1
#: (deterministic seeds, same convention as KMEANS_K / IVF).
PQ_M = 4          # subspaces
PQ_SUBDIM = EMBEDDING_DIM // PQ_M
# dims must split evenly into subspaces: a remainder would land in a
# silent extra subspace that the code pivot drops while its distance
# still folds into quant_err — codes and error would disagree with no
# failure. Fail loud at import instead.
assert EMBEDDING_DIM % PQ_M == 0, (
    f"EMBEDDING_DIM={EMBEDDING_DIM} not divisible by PQ_M={PQ_M}"
)
PQ_K = 16         # codewords per subspace
#: element snap (micro) and diff down-snap (milli) — squared-diff sums
#: stay exact BIGINTs: diff_milli <= ~4e3, squared 1.6e7, x16 dims 2.6e8.
_PQ_SCALE = 1000000.0

_PQ_CODE_CTES = """
elems AS (
  SELECT vec_id, dim,
         CAST(FLOOR(v * {scale} + 0.5) AS BIGINT) AS sv
  FROM ({unnested})
),
sub AS (
  SELECT vec_id, CAST(FLOOR(dim / {subdim}.0) AS BIGINT) AS subspace, dim, sv
  FROM elems
),
cb AS (
  SELECT vec_id AS codeword, subspace, dim, sv FROM sub WHERE vec_id < {pqk}
),
dists AS (
  -- per (vector, subspace, codeword) squared L2 in exact milli ints
  SELECT s.vec_id, s.subspace, c.codeword,
         CAST(SUM(CAST(FLOOR(CAST(s.sv - c.sv AS DOUBLE) / 1000.0) AS BIGINT)
                  * CAST(FLOOR(CAST(s.sv - c.sv AS DOUBLE) / 1000.0) AS BIGINT))
              AS BIGINT) AS d
  FROM sub s JOIN cb c ON s.subspace = c.subspace AND s.dim = c.dim
  GROUP BY s.vec_id, s.subspace, c.codeword
),
assigned AS (
  SELECT vec_id, subspace, codeword, d FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, subspace
                                 ORDER BY d, codeword) AS rnk
    FROM dists
  ) WHERE rnk = 1
)"""

# code pivot derived from PQ_M so raising the subspace count cannot
# silently drop codes from the output
_PQ_CODE_COLS = ",\n       ".join(
    f"MAX(CASE WHEN subspace = {s} THEN codeword END) AS code_{s}"
    for s in range(PQ_M)
)

_PQ_CODES_TAIL = _PQ_CODE_CTES + f"""
SELECT vec_id,
       {_PQ_CODE_COLS},
       CAST(SUM(d) AS BIGINT) AS quant_err
FROM assigned
GROUP BY vec_id
ORDER BY vec_id
"""

_PQ_RECALL_TAIL = _PQ_CODE_CTES + """,
adc AS (
  -- ADC: query q's distance table row (q, subspace, codeword) joined to
  -- each candidate's assigned codeword — M lookups per (q, candidate)
  SELECT d.vec_id AS query_id, a.vec_id AS cand_id,
         CAST(SUM(d.d) AS BIGINT) AS approx_d
  FROM assigned a
  JOIN dists d ON d.subspace = a.subspace AND d.codeword = a.codeword
  WHERE d.vec_id < {nq} AND a.vec_id <> d.vec_id
  GROUP BY d.vec_id, a.vec_id
),
adc_k AS (
  SELECT query_id, cand_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY approx_d, cand_id) AS rank
    FROM adc
  ) WHERE rank <= {k}
),
exact_pairs AS (
  SELECT q.vec_id AS query_id, x.vec_id AS cand_id,
         CAST(SUM(CAST(FLOOR(CAST(q.sv - x.sv AS DOUBLE) / 1000.0) AS BIGINT)
                  * CAST(FLOOR(CAST(q.sv - x.sv AS DOUBLE) / 1000.0) AS BIGINT))
              AS BIGINT) AS exact_d
  FROM elems q JOIN elems x ON q.dim = x.dim AND q.vec_id <> x.vec_id
  WHERE q.vec_id < {nq}
  GROUP BY q.vec_id, x.vec_id
),
exact_k AS (
  SELECT query_id, cand_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY exact_d, cand_id) AS rank
    FROM exact_pairs
  ) WHERE rank <= {k}
),
overlap AS (
  SELECT e.query_id, COUNT(*) AS n_exact, COUNT(a.cand_id) AS n_overlap
  FROM exact_k e LEFT JOIN adc_k a
    ON a.query_id = e.query_id AND a.cand_id = e.cand_id
  GROUP BY e.query_id
)
SELECT query_id, n_exact, n_overlap,
       FLOOR((CAST(n_overlap AS DOUBLE) / n_exact) * 10000.0 + 0.5)
         / CAST(10000.0 AS DOUBLE) AS recall_at_k
FROM overlap
ORDER BY query_id
"""

#: {src}-parametrized: formatted with the caller's scoped view name
_PQ_UNNEST_SPARK = (
    "SELECT vec_id, pos AS dim, CAST(v AS DOUBLE) AS v"
    " FROM {src} LATERAL VIEW posexplode(embedding) t AS pos, v"
)
_PQ_UNNEST_DUCK = (
    "SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,"
    " CAST(unnest(embedding) AS DOUBLE) AS v FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL)"
)


def ann_pq_codes(emb: DataFrame) -> DataFrame:
    """X6: PQ encoding — per vector, the {m} codeword ids (codebook =
    subvectors of vec_id 0..{km1}) and the total quantization error.
    {m} bytes per vector replaces the float payload in the candidate
    phase — the 64x memory cut that makes billion-vector ANN fit RAM
    (Jegou et al. 2011).

    Scale shape: the codebook side of the assignment join is
    PQ_M x PQ_K x PQ_SUBDIM rows — broadcast at any corpus scale; the
    wide aggregations are keyed on (vec_id, subspace). The rank window
    is partitioned per (vector, subspace) — never global.""".format(
        m=PQ_M, km1=PQ_K - 1
    )
    with scoped_temp_view(
        emb.where("embedding IS NOT NULL"), "_sim_emb"
    ) as ev:
        return emb.sparkSession.sql(
            "WITH "
            + _PQ_CODES_TAIL.format(
                scale=_PQ_SCALE, subdim=PQ_SUBDIM, pqk=PQ_K,
                unnested=_PQ_UNNEST_SPARK.format(src=ev),
            )
        )


ORACLE_ANN_PQ_CODES = "WITH " + _PQ_CODES_TAIL.format(
    scale=_PQ_SCALE, subdim=PQ_SUBDIM, pqk=PQ_K, unnested=_PQ_UNNEST_DUCK
)


def ann_pq_recall(emb: DataFrame) -> DataFrame:
    """X7: ADC recall@{k} — approximate distances from the query's
    per-(subspace, codeword) lookup table summed over each candidate's
    PQ code, scored against the exact L2 top-{k} per query. The
    accept/reject measurement for swapping the PQ path in (same eval
    shape as X4's LSH recall).

    Scale: ADC joins the {nq}-query distance table (broadcast:
    {nq} x PQ_M x PQ_K rows) against the per-vector code relation — the
    corpus-side cost is M integer adds per candidate, the whole point
    of PQ. The exact side stays the bounded sampled-eval scan.""".format(
        k=TOP_K, nq=N_QUERIES
    )
    with scoped_temp_view(
        emb.where("embedding IS NOT NULL"), "_sim_emb"
    ) as ev:
        return emb.sparkSession.sql(
            "WITH "
            + _PQ_RECALL_TAIL.format(
                scale=_PQ_SCALE, subdim=PQ_SUBDIM, pqk=PQ_K,
                nq=N_QUERIES, k=TOP_K,
                unnested=_PQ_UNNEST_SPARK.format(src=ev),
            )
        )


ORACLE_ANN_PQ_RECALL = "WITH " + _PQ_RECALL_TAIL.format(
    scale=_PQ_SCALE, subdim=PQ_SUBDIM, pqk=PQ_K,
    nq=N_QUERIES, k=TOP_K, unnested=_PQ_UNNEST_DUCK,
)


# ==========================================================================
# X8 — IVFADC: IVF cell probe + PQ asymmetric-distance ranking
# ==========================================================================
#: The production billion-vector shape from the PQ paper (Jegou et al.
#: 2011 §IV, "IVFADC"): the coarse quantizer (per-label centroids — the
#: same cells X3 probes) prunes the corpus to NPROBE cells, then the
#: fine ranking runs over PQ codes with per-query ADC lookup tables —
#: the corpus-side cost is PQ_M integer adds per candidate and nothing
#: but codes is ever read. At 100 TB: cells = partition pruning, codes =
#: 4 bytes/vector in memory, floats never touched after indexing.
_IVFADC_TAIL = """,
probes AS (
  SELECT query_id, label FROM (
    SELECT q.vec_id AS query_id, ct.label,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
                              ORDER BY {qc_cos} DESC, ct.label) AS crank
    FROM {src} q JOIN centroids ct ON 1 = 1
    WHERE q.vec_id < {nq}
  ) WHERE crank <= {nprobe}
),
{pq_ctes},
vec_cells AS (SELECT vec_id, label FROM {src}),
adc AS (
  SELECT p.query_id, a.vec_id AS neighbor_id, l.label AS probed_label,
         CAST(SUM(d.d) AS BIGINT) AS approx_d
  FROM assigned a
  JOIN vec_cells l ON l.vec_id = a.vec_id
  JOIN probes p ON p.label = l.label
  JOIN dists d ON d.vec_id = p.query_id
              AND d.subspace = a.subspace AND d.codeword = a.codeword
  WHERE a.vec_id <> p.query_id
  GROUP BY p.query_id, a.vec_id, l.label
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY approx_d, neighbor_id) AS rank
  FROM adc
)
SELECT query_id, probed_label, neighbor_id, approx_d, rank
FROM ranked WHERE rank <= {k}
ORDER BY query_id, rank
"""


def ann_ivf_pq(emb: DataFrame) -> DataFrame:
    """X8: IVFADC — probe the {np} nearest IVF cells (X3's coarse
    quantizer), rank ONLY those cells' vectors by PQ asymmetric
    distance (X6's codes + per-query codeword lookup tables). The
    composition is the point: cells bound the candidate set, ADC bounds
    the per-candidate cost to {m} integer adds, and the vectors' floats
    are never read after indexing — the Jegou et al. 2011 IVFADC
    system, stated as one declarative plan.""".format(np=NPROBE, m=PQ_M)
    with scoped_temp_view(
        emb.where("embedding IS NOT NULL"), "_sim_emb"
    ) as ev:
        pq = _PQ_CODE_CTES.format(
            scale=_PQ_SCALE, subdim=PQ_SUBDIM, pqk=PQ_K,
            unnested=_PQ_UNNEST_SPARK.format(src=ev),
        ).strip().rstrip(",")
        return emb.sparkSession.sql(
            "WITH "
            + _IVF_SPARK.format(src=ev)
            + _IVFADC_TAIL.format(
                qc_cos=cosine_expr_spark("q.embedding", "ct.centroid"),
                src=ev,
                nq=N_QUERIES,
                nprobe=NPROBE,
                k=TOP_K,
                pq_ctes=pq,
            )
        )


def _oracle_ann_ivf_pq() -> str:
    pq = _PQ_CODE_CTES.format(
        scale=_PQ_SCALE, subdim=PQ_SUBDIM, pqk=PQ_K,
        unnested=_PQ_UNNEST_DUCK,
    ).strip().rstrip(",")
    return (
        "WITH "
        + _IVF_DUCK.format(src="(SELECT * FROM embeddings WHERE embedding IS NOT NULL)")
        + _IVFADC_TAIL.format(
            qc_cos=_ivf_duck_cos("q.embedding", "ct.centroid"),
            src="(SELECT * FROM embeddings WHERE embedding IS NOT NULL)",
            nq=N_QUERIES,
            nprobe=NPROBE,
            k=TOP_K,
            pq_ctes=pq,
        )
    )


ORACLE_ANN_IVF_PQ = _oracle_ann_ivf_pq()


# ==========================================================================
# X8b — IVFADC with RESIDUAL encoding (the paper's actual codec)
# ==========================================================================
#: X8 quantizes raw vectors; the Jegou et al. 2011 IVFADC system (§IV.A)
#: quantizes the RESIDUAL r = x − q1(x) — the offset from the coarse
#: centroid the vector already paid for by living in that cell. Residuals
#: concentrate near zero, so the same PQ_M × PQ_K code budget spends its
#: codewords on a much smaller-variance distribution — finer codes for
#: identical bytes/vector. The price is query-side only: the ADC lookup
#: table becomes per-(query, PROBED CELL) because the query's residual
#: differs per cell — nq × nprobe × M × K entries, still broadcast-sized
#: at any corpus scale. Corpus-side cost is unchanged (M integer adds
#: per candidate; floats never read after indexing).
#:
#: Exactness: centroid dims re-enter as micro BIGINTs (the same
#: FLOOR(AVG·1e6+0.5) snap X3's green oracle uses — multiplying the
#: micro-rounded double back by 1e6 recovers the integer exactly), so
#: residual elements are exact BIGINT differences; the squared-diff sums
#: then follow X6's proven milli down-snap.
_IVFADC_RESIDUAL_TAIL = """,
elems AS (
  SELECT vec_id, dim, CAST(FLOOR(v * {scale} + 0.5) AS BIGINT) AS sv
  FROM ({unnested})
),
cdim AS (
  -- {cdim_off}: the IVF explode is 0-based in Spark (posexplode) but
  -- 1-based in DuckDB (generate_subscripts); normalize to elems' 0-based
  SELECT label, i - {cdim_off} AS dim,
         CAST(FLOOR(c * {scale} + 0.5) AS BIGINT) AS csv
  FROM centroid_dims
),
vec_cells AS (SELECT vec_id, label FROM {src}),
relems AS (
  SELECT e.vec_id, e.dim, e.sv - c.csv AS rsv
  FROM elems e
  JOIN vec_cells vl ON vl.vec_id = e.vec_id
  JOIN cdim c ON c.label = vl.label AND c.dim = e.dim
),
rsub AS (
  SELECT vec_id, CAST(FLOOR(dim / {subdim}.0) AS BIGINT) AS subspace,
         dim, rsv
  FROM relems
),
rcb AS (
  SELECT vec_id AS codeword, subspace, dim, rsv
  FROM rsub WHERE vec_id < {pqk}
),
rdists AS (
  SELECT s.vec_id, s.subspace, c.codeword,
         CAST(SUM(CAST(FLOOR(CAST(s.rsv - c.rsv AS DOUBLE) / 1000.0) AS BIGINT)
                  * CAST(FLOOR(CAST(s.rsv - c.rsv AS DOUBLE) / 1000.0) AS BIGINT))
              AS BIGINT) AS d
  FROM rsub s JOIN rcb c ON s.subspace = c.subspace AND s.dim = c.dim
  GROUP BY s.vec_id, s.subspace, c.codeword
),
rassigned AS (
  SELECT vec_id, subspace, codeword, d FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, subspace
                                 ORDER BY d, codeword) AS rnk
    FROM rdists
  ) WHERE rnk = 1
),
probes AS (
  SELECT query_id, label FROM (
    SELECT q.vec_id AS query_id, ct.label,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
                              ORDER BY {qc_cos} DESC, ct.label) AS crank
    FROM {src} q JOIN centroids ct ON 1 = 1
    WHERE q.vec_id < {nq}
  ) WHERE crank <= {nprobe}
),
qrelems AS (
  -- the query's residual w.r.t. EACH probed cell's centroid
  SELECT p.query_id, p.label, e.dim, e.sv - c.csv AS rsv
  FROM probes p
  JOIN elems e ON e.vec_id = p.query_id
  JOIN cdim c ON c.label = p.label AND c.dim = e.dim
),
qtab AS (
  -- per-(query, probed cell) ADC lookup table over the residual codebook
  SELECT q.query_id, q.label, b.subspace, b.codeword,
         CAST(SUM(CAST(FLOOR(CAST(q.rsv - b.rsv AS DOUBLE) / 1000.0) AS BIGINT)
                  * CAST(FLOOR(CAST(q.rsv - b.rsv AS DOUBLE) / 1000.0) AS BIGINT))
              AS BIGINT) AS d
  FROM qrelems q JOIN rcb b ON b.dim = q.dim
  GROUP BY q.query_id, q.label, b.subspace, b.codeword
),
adc AS (
  SELECT t.query_id, a.vec_id AS neighbor_id, l.label AS probed_label,
         CAST(SUM(t.d) AS BIGINT) AS approx_d
  FROM rassigned a
  JOIN vec_cells l ON l.vec_id = a.vec_id
  JOIN qtab t ON t.label = l.label AND t.subspace = a.subspace
             AND t.codeword = a.codeword
  WHERE a.vec_id <> t.query_id
  GROUP BY t.query_id, a.vec_id, l.label
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY approx_d, neighbor_id) AS rank
  FROM adc
)
SELECT query_id, probed_label, neighbor_id, approx_d, rank
FROM ranked WHERE rank <= {k}
ORDER BY query_id, rank
"""


def ann_ivf_pq_residual(emb: DataFrame) -> DataFrame:
    """X8b: IVFADC with residual encoding — X8's probe/ADC composition,
    but PQ codes quantize r = x − q1(x) instead of x (Jegou et al. 2011
    §IV.A, the paper's actual production codec). See the block comment
    for why residuals buy finer codes at identical bytes/vector and
    what the per-probed-cell query tables cost.

    Scale shape: identical to X8 on the corpus side (cells = partition
    pruning, M integer adds per candidate, floats never read after
    indexing); the added centroid-dim join is #cells × dim rows —
    broadcast; query lookup tables are nq × nprobe × M × K — broadcast.
    The residual-vs-raw quantization-error win is pinned by pytest
    (tests/test_property_differential.py::
    test_residual_pq_reduces_quantization_error)."""
    with scoped_temp_view(
        emb.where("embedding IS NOT NULL"), "_sim_emb"
    ) as ev:
        return emb.sparkSession.sql(
            "WITH "
            + _IVF_SPARK.format(src=ev)
            + _IVFADC_RESIDUAL_TAIL.format(
                qc_cos=cosine_expr_spark("q.embedding", "ct.centroid"),
                src=ev,
                scale=_PQ_SCALE,
                subdim=PQ_SUBDIM,
                pqk=PQ_K,
                nq=N_QUERIES,
                nprobe=NPROBE,
                k=TOP_K,
                cdim_off=0,
                unnested=_PQ_UNNEST_SPARK.format(src=ev),
            )
        )


ORACLE_ANN_IVF_PQ_RESIDUAL = (
    "WITH "
    + _IVF_DUCK.format(
        src="(SELECT * FROM embeddings WHERE embedding IS NOT NULL)"
    )
    + _IVFADC_RESIDUAL_TAIL.format(
        qc_cos=_ivf_duck_cos("q.embedding", "ct.centroid"),
        src="(SELECT * FROM embeddings WHERE embedding IS NOT NULL)",
        scale=_PQ_SCALE,
        subdim=PQ_SUBDIM,
        pqk=PQ_K,
        nq=N_QUERIES,
        nprobe=NPROBE,
        k=TOP_K,
        cdim_off=1,
        unnested=_PQ_UNNEST_DUCK,
    )
)


# ==========================================================================
# X10b — nprobe quality knob (recall@k vs probed-cell count)
# ==========================================================================
#: the operational question IVFADC deployments tune: how many cells must
#: a probe visit before recall@k is acceptable? One pass answers it for
#: every nprobe in 1..NPROBE_MAX simultaneously — the probe relation is
#: built once at the widest setting with each cell's closeness rank, and
#: narrower settings are crank<=np filters, so the sweep costs one
#: candidate scan, not NPROBE_MAX of them. Ground truth is the exact
#: integer-snapped L2 top-k over the full corpus (the same exact side
#: X7's ADC recall uses), computed once and shared by every sweep level.
NPROBE_MAX = 3

#: the candidate-accumulation CTE body for a RAW-encoded system: one
#: per-query ADC table (``dists``) reused across every probed cell —
#: the default ``{adc}`` fill. A residual-encoded system swaps in a
#: per-(query, probed cell) table join (``sources/ann_index.py``).
_NPROBE_ADC_RAW = """
  SELECT n.np, p.query_id, a.vec_id AS neighbor_id,
         CAST(SUM(d.d) AS BIGINT) AS approx_d
  FROM probes p
  JOIN nps n ON p.crank <= n.np
  JOIN vec_cells l ON l.label = p.label
  JOIN assigned a ON a.vec_id = l.vec_id
  JOIN dists d ON d.vec_id = p.query_id
              AND d.subspace = a.subspace AND d.codeword = a.codeword
  WHERE a.vec_id <> p.query_id
  GROUP BY n.np, p.query_id, a.vec_id
"""

_NPROBE_RECALL_TAIL = """,
probes AS (
  SELECT query_id, label, crank FROM (
    SELECT q.vec_id AS query_id, ct.label,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
                              ORDER BY {qc_cos} DESC, ct.label) AS crank
    FROM {src} q JOIN centroids ct ON 1 = 1
    WHERE q.vec_id < {nq}
  ) WHERE crank <= {npmax}
),
{pq_ctes},
vec_cells AS ({vec_cells}),
nps AS ({nps}),
adc AS ({adc}),
adc_k AS (
  SELECT np, query_id, neighbor_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY np, query_id
                                 ORDER BY approx_d, neighbor_id) AS rank
    FROM adc
  ) WHERE rank <= {k}
),
exact_pairs AS (
  SELECT q.vec_id AS query_id, x.vec_id AS cand_id,
         CAST(SUM(CAST(FLOOR(CAST(q.sv - x.sv AS DOUBLE) / 1000.0) AS BIGINT)
                  * CAST(FLOOR(CAST(q.sv - x.sv AS DOUBLE) / 1000.0) AS BIGINT))
              AS BIGINT) AS exact_d
  FROM elems q JOIN elems x ON q.dim = x.dim AND q.vec_id <> x.vec_id
  WHERE q.vec_id < {nq}
  GROUP BY q.vec_id, x.vec_id
),
exact_k AS (
  SELECT query_id, cand_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY exact_d, cand_id) AS rank
    FROM exact_pairs
  ) WHERE rank <= {k}
),
overlap AS (
  SELECT n.np, e.query_id,
         COUNT(*) AS n_exact, COUNT(a.neighbor_id) AS n_overlap
  FROM exact_k e JOIN nps n ON 1 = 1
  LEFT JOIN adc_k a ON a.np = n.np AND a.query_id = e.query_id
                   AND a.neighbor_id = e.cand_id
  GROUP BY n.np, e.query_id
)
SELECT np AS nprobe, query_id, n_exact, n_overlap,
       FLOOR((CAST(n_overlap AS DOUBLE) / n_exact) * 10000.0 + 0.5)
         / CAST(10000.0 AS DOUBLE) AS recall_at_k
FROM overlap
ORDER BY nprobe, query_id
"""


def ann_nprobe_recall(emb: DataFrame) -> DataFrame:
    """X10b: recall@{k} of IVFADC vs the exact top-{k}, swept over
    nprobe = 1..{npmax} in one plan — the tuning curve that decides how
    many cells a production probe visits. The candidate SET grows
    monotonically with nprobe, but recall@k need not (a new cell can
    contribute low-ADC false positives that displace true neighbors
    from the approximate top-k — quantization error, measured here).

    Scale shape: identical to X8 plus the tiny nps relation ({npmax}
    rows, broadcast); the candidate scan runs ONCE at the widest
    setting, the exact side is the bounded sampled-eval job, and at
    100 TB the cell join is still partition pruning over the codes
    layout (plan-gated).""".format(k=TOP_K, npmax=NPROBE_MAX)
    with scoped_temp_view(
        emb.where("embedding IS NOT NULL"), "_sim_emb"
    ) as ev:
        pq = _PQ_CODE_CTES.format(
            scale=_PQ_SCALE, subdim=PQ_SUBDIM, pqk=PQ_K,
            unnested=_PQ_UNNEST_SPARK.format(src=ev),
        ).strip().rstrip(",")
        return emb.sparkSession.sql(
            "WITH "
            + _IVF_SPARK.format(src=ev)
            + _NPROBE_RECALL_TAIL.format(
                qc_cos=cosine_expr_spark("q.embedding", "ct.centroid"),
                src=ev,
                nq=N_QUERIES,
                npmax=NPROBE_MAX,
                k=TOP_K,
                pq_ctes=pq,
                vec_cells=f"SELECT vec_id, label FROM {ev}",
                adc=_NPROBE_ADC_RAW,
                nps=f"SELECT explode(sequence(1, {NPROBE_MAX})) AS np",
            )
        )


def _oracle_ann_nprobe_recall() -> str:
    pq = _PQ_CODE_CTES.format(
        scale=_PQ_SCALE, subdim=PQ_SUBDIM, pqk=PQ_K,
        unnested=_PQ_UNNEST_DUCK,
    ).strip().rstrip(",")
    src = "(SELECT * FROM embeddings WHERE embedding IS NOT NULL)"
    return (
        "WITH "
        + _IVF_DUCK.format(src=src)
        + _NPROBE_RECALL_TAIL.format(
            qc_cos=_ivf_duck_cos("q.embedding", "ct.centroid"),
            src=src,
            nq=N_QUERIES,
            npmax=NPROBE_MAX,
            k=TOP_K,
            pq_ctes=pq,
            vec_cells=f"SELECT vec_id, label FROM {src}",
            adc=_NPROBE_ADC_RAW,
            nps=(
                f"SELECT unnest(generate_series(1, {NPROBE_MAX})) AS np"
            ),
        )
    )


ORACLE_ANN_NPROBE_RECALL = _oracle_ann_nprobe_recall()


# ==========================================================================
# X11 — truncated-dimension recall (Matryoshka-style storage tradeoff)
# ==========================================================================
#: Matryoshka representation learning (Kusupati et al. 2022,
#: arXiv:2205.13147) stores/searches a PREFIX of each embedding; whether
#: a given corpus's vectors tolerate that is an empirical recall
#: question. This op answers it: recall@k of cosine top-k computed on
#: the first TRUNC_DIM dimensions against the full-dimension exact
#: top-k, per probe query — the same sampled-eval shape as X4/X7, so at
#: 100 TB it is the recurring storage-sizing job, not a per-query cost.
TRUNC_DIM = EMBEDDING_DIM // 2

_TRUNC_RECALL_TAIL = """
base AS (SELECT vec_id, embedding, {trunc} AS trunc FROM {src}),
scored AS (
  -- ONE probe-vs-corpus pair join computing both cosines (the join is
  -- the entire cost of this operator; two copy-paste scored CTEs would
  -- double it)
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {cos_full} AS cos_full, {cos_trunc} AS cos_trunc
  FROM base q JOIN base c ON c.vec_id <> q.vec_id
  WHERE q.vec_id < {nq}
),
exact_k AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY cos_full DESC, neighbor_id) AS rank
    FROM scored
  ) WHERE rank <= {k}
),
trunc_k AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY cos_trunc DESC, neighbor_id) AS rank
    FROM scored
  ) WHERE rank <= {k}
),
overlap AS (
  SELECT e.query_id,
         COUNT(*) AS n_exact,
         COUNT(t.neighbor_id) AS n_overlap
  FROM exact_k e LEFT JOIN trunc_k t
    ON t.query_id = e.query_id AND t.neighbor_id = e.neighbor_id
  GROUP BY e.query_id
)
SELECT query_id, n_exact, n_overlap,
       FLOOR((CAST(n_overlap AS DOUBLE) / CAST(n_exact AS DOUBLE))
             * 10000.0 + 0.5) / CAST(10000.0 AS DOUBLE) AS recall_at_k
FROM overlap
ORDER BY query_id
"""


def ann_truncated_recall(emb: DataFrame) -> DataFrame:
    """X11: recall@{k} of first-{d}-dims cosine top-k vs the full
    {full}-dim exact top-k, per probe query — the measurement that
    decides whether prefix-truncated storage (half the bytes, half the
    dot-product FLOPs) is acceptable for this corpus.

    Scale: both sides run on the bounded probe set (vec_id < {nq}), the
    standard sampled-eval job; downstream of the two top-k sets
    everything is {nq}x{k} rows.""".format(
        k=TOP_K, d=TRUNC_DIM, full=EMBEDDING_DIM, nq=N_QUERIES
    )
    with scoped_temp_view(
        emb.where("embedding IS NOT NULL"), "_sim_emb"
    ) as ev:
        return emb.sparkSession.sql(
            "WITH "
            + _TRUNC_RECALL_TAIL.format(
                trunc=f"slice(embedding, 1, {TRUNC_DIM})",
                cos_full=cosine_expr_spark("q.embedding", "c.embedding"),
                cos_trunc=cosine_expr_spark("q.trunc", "c.trunc"),
                src=ev,
                nq=N_QUERIES,
                k=TOP_K,
            )
        )


ORACLE_ANN_TRUNCATED_RECALL = "WITH " + _TRUNC_RECALL_TAIL.format(
    trunc=f"list_slice(embedding, 1, {TRUNC_DIM})",
    cos_full=cosine_expr_duck("q.embedding", "c.embedding"),
    cos_trunc=cosine_expr_duck("q.trunc", "c.trunc"),
    src="(SELECT * FROM embeddings WHERE embedding IS NOT NULL)",
    nq=N_QUERIES,
    k=TOP_K,
)


# ==========================================================================
# X14 — retrieve-then-rerank (cross-encoder extension point on serving)
# ==========================================================================
#: the rerank stage's input/output contract — shared by the default
#: (exact-refine) scorer and the Arrow-batched model extension point,
#: so a real cross-encoder is a body-only swap
_RERANK_SCORED_SCHEMA = (
    "query_id long, neighbor_id long, approx_rank int, cross_score double"
)

_RERANK_SCORED_SQL = """
SELECT c.query_id, c.neighbor_id, CAST(c.rank AS INT) AS approx_rank,
       {cos} AS cross_score
FROM {cand} c
JOIN {src} q ON q.vec_id = c.query_id
JOIN {src} x ON x.vec_id = c.neighbor_id
"""


def _rerank_over_scored(scored: DataFrame) -> DataFrame:
    """The shared post-scorer tail: re-rank each query's shortlist by
    the cross score (DESC, id tie-break) and report the displacement
    against the retrieval order — identical plumbing whichever scorer
    produced ``cross_score``."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("query_id").orderBy(
        F.col("cross_score").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rerank_rank", F.row_number().over(w))
        .withColumn(
            "displacement", F.col("approx_rank") - F.col("rerank_rank")
        )
        .orderBy("query_id", "rerank_rank")
    )


def ann_crossencoder_rerank(
    emb: DataFrame, use_scorer: bool = False, scorer=None
) -> DataFrame:
    """X14: the two-stage retrieve-then-rerank serving topology every
    production retrieval system deploys (bi-encoder ANN shortlist →
    expensive pairwise re-scorer; Nogueira & Cho 2019,
    arXiv:1901.04085): candidates are IVFADC's top-{k} per query (X8 —
    the fast approximate stage), then ONLY those nq × {k} pairs are
    re-scored against the raw feature vectors and re-ranked, with the
    displacement between retrieval rank and re-ranked rank reported
    per pair.

    The default scorer is the exact r6-snapped cosine over the full
    embeddings — the FAISS-style "refine" stage, fully SQL-expressible
    and therefore DuckDB-oracle-checked. ``use_scorer=True`` switches
    to the Arrow-batched model extension point
    (:func:`_crossencoder_scorer_scored` + ``mapInPandas``), where a
    real cross-encoder drops in as a body-only swap — same input
    relation, same output schema, same rerank tail. ``scorer`` is that
    body: a self-contained callable ``(Q, C) -> scores`` over the
    batch's float64 pair matrices (see :func:`exact_refine_scorer`,
    the deterministic stand-in pinned result-identical to the SQL
    refine default); ``scorer=None`` keeps the raise-through-plumbing
    contract for environments with no model.

    Scale shape: the expensive stage touches exactly nq × {k} rows no
    matter the corpus size — the candidate join is two broadcast hash
    joins against the bounded shortlist, the rerank window partitions
    by query — so at 100 TB the model inference cost is set by the
    shortlist width, never the corpus.""".format(k=TOP_K)
    if use_scorer:
        return _rerank_over_scored(_crossencoder_scorer_scored(emb, scorer))
    from .dedup import cosine_expr_spark

    cand = ann_ivf_pq(emb)
    with scoped_temp_view(
        cand, "_sim_rerank_cand"
    ) as cv, scoped_temp_view(
        emb.where("embedding IS NOT NULL"), "_sim_emb"
    ) as ev:
        scored = emb.sparkSession.sql(
            _RERANK_SCORED_SQL.format(
                cand=cv,
                src=ev,
                cos=cosine_expr_spark("q.embedding", "x.embedding"),
            )
        )
        return _rerank_over_scored(scored)


def exact_refine_scorer():
    """A deterministic stand-in cross-encoder: the exact r6-snapped
    cosine computed in numpy with the SAME per-element op sequence as
    the SQL refine default (float32→float64 element cast, one product
    rounding per dim, strict left-to-right float64 accumulation, then
    ``floor(dot/(na·nc)·1e6+0.5)/1e6`` — the ``cosine_expr_spark``
    contract, the same bit-identity discipline as
    ``functions/blockpair``). Exists so the model extension point's
    ENTIRE path — Arrow batch transfer, scorer execution, schema,
    rerank tail — executes and is pinned result-identical to the SQL
    default (use_scorer=False), not just shape-checked at the raise.

    Returned as a factory-built closure with in-function imports so
    cloudpickle ships it by VALUE (a module-level function would be
    pickled by reference and require this driver-side-only package on
    executor workers)."""

    def scorer(Q, C):
        import numpy as np

        dot = np.zeros(Q.shape[0], dtype=np.float64)
        na = np.zeros(Q.shape[0], dtype=np.float64)
        nc = np.zeros(Q.shape[0], dtype=np.float64)
        for d in range(Q.shape[1]):
            dot += Q[:, d] * C[:, d]
            na += Q[:, d] * Q[:, d]
            nc += C[:, d] * C[:, d]
        denom = np.sqrt(na) * np.sqrt(nc)
        out = np.zeros(Q.shape[0], dtype=np.float64)
        nz = denom != 0  # zero-norm pair: cosine defined as 0.0
        out[nz] = (
            np.floor((dot[nz] / denom[nz]) * 1000000.0 + 0.5) / 1000000.0
        )
        return out

    return scorer


def _crossencoder_scorer_scored(emb: DataFrame, scorer=None) -> DataFrame:
    """Real-model extension point: the bounded shortlist pair relation —
    query and candidate feature vectors side by side, nq × k rows —
    feeds an Arrow-batched ``mapInPandas`` scorer (the multimodal
    ``use_codec`` pattern). ``scorer`` is the model body: a
    SELF-CONTAINED callable (closure over locals with in-function
    imports only — it is cloudpickled to executors) taking the batch's
    (nq×d, nq×d) float64 query/candidate matrices and returning one
    float64 score per pair. ``None`` raises through the Arrow plumbing
    until a cross-encoder model ships; the batch shape, schema, and
    downstream rerank tail are identical either way."""
    cand = ann_ivf_pq(emb)
    live = emb.where("embedding IS NOT NULL")
    pairs = (
        cand.selectExpr(
            "query_id", "neighbor_id", "CAST(rank AS INT) AS approx_rank"
        )
        .join(
            live.selectExpr(
                "vec_id AS query_id", "embedding AS q_embedding"
            ),
            "query_id",
        )
        .join(
            live.selectExpr(
                "vec_id AS neighbor_id", "embedding AS c_embedding"
            ),
            "neighbor_id",
        )
    )

    # NOTE: the closure must be self-contained (locals + in-function
    # imports only) — module-level references would make cloudpickle
    # import this driver-side-only package on executor workers. The
    # scorer callable ships by value inside the closure.
    def score(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if scorer is None:
                # Model slot: pass a scorer (see exact_refine_scorer
                # for the executed contract) once one ships.
                raise NotImplementedError(
                    "no cross-encoder model is available in this "
                    "environment; use ann_crossencoder_rerank("
                    "use_scorer=False) — the exact-refine default"
                )
            if pdf.empty:
                continue
            Q = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf["q_embedding"]]
            )
            C = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf["c_embedding"]]
            )
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"].to_numpy(np.int64),
                    "neighbor_id": pdf["neighbor_id"].to_numpy(np.int64),
                    "approx_rank": pdf["approx_rank"].to_numpy(np.int32),
                    "cross_score": np.asarray(
                        scorer(Q, C), dtype=np.float64
                    ),
                }
            )

    return pairs.mapInPandas(score, _RERANK_SCORED_SCHEMA)


_RERANK_TAIL_SQL = """
SELECT query_id, neighbor_id, approx_rank, cross_score,
       rerank_rank,
       approx_rank - rerank_rank AS displacement
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cross_score DESC, neighbor_id)
              AS rerank_rank
  FROM scored
)
ORDER BY query_id, rerank_rank
"""


def _oracle_ann_crossencoder_rerank() -> str:
    from .dedup import cosine_expr_duck

    return (
        f"WITH cand AS ({ORACLE_ANN_IVF_PQ}),\nscored AS ("
        + _RERANK_SCORED_SQL.format(
            cand="cand",
            src="embeddings",
            cos=cosine_expr_duck("q.embedding", "x.embedding"),
        )
        + ")"
        + _RERANK_TAIL_SQL
    )


ORACLE_ANN_CROSSENCODER_RERANK = _oracle_ann_crossencoder_rerank()


ORACLE_SQL_SIMILARITY = {
    "ann_crossencoder_rerank": ORACLE_ANN_CROSSENCODER_RERANK,
    "ann_knn_graph": ORACLE_ANN_KNN_GRAPH,
    "ann_cosine_topk": ORACLE_ANN_TOPK,
    "ann_lsh_bucketed": ORACLE_ANN_LSH,
    "ann_ivf": ORACLE_ANN_IVF,
    "ann_recall_eval": ORACLE_ANN_RECALL,
    "ann_hamming_rerank": ORACLE_ANN_HAMMING,
    "ann_pq_codes": ORACLE_ANN_PQ_CODES,
    "ann_pq_recall": ORACLE_ANN_PQ_RECALL,
    "ann_ivf_pq": ORACLE_ANN_IVF_PQ,
    "ann_ivf_pq_residual": ORACLE_ANN_IVF_PQ_RESIDUAL,
    "ann_graph_expand": ORACLE_ANN_GRAPH_EXPAND,
    "ann_graph_expand2": ORACLE_ANN_GRAPH_EXPAND2,
    "ann_nprobe_recall": ORACLE_ANN_NPROBE_RECALL,
    "ann_truncated_recall": ORACLE_ANN_TRUNCATED_RECALL,
}
