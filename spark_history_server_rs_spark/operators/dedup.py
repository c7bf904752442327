"""Deduplication operators — exact, n-gram Jaccard, MinHash+LSH, SimHash,
and embedding-cosine near-dup, over the ``documents``/``embeddings`` tables.

The large-scale training-data-pipeline surface. Scale design per operator:

- **exact**: one hash-groupBy on ``md5(text)`` — single shuffle, map-side
  partial agg; the canonical 100 TB dedup primitive.
- **n-gram Jaccard**: inverted-index self-join on shingles (pairs sharing
  ≥1 shingle), then per-pair intersection counts. Worst case quadratic in
  the hottest shingle's posting list — this is the *exact* baseline; the
  scale path is MinHash below (candidates shrink to band collisions).
- **MinHash+LSH**: shingle → ``NUM_HASHES`` signatures (min of md5 with
  per-seed prefix — strings order like integers, no UDFs) → ``BANDS``
  band keys → self-join on band key → verify candidates with exact
  Jaccard. Join cardinality is bucket-bounded; at 100 TB the band join
  shuffles only (doc_id, band_key) pairs, never text.
- **SimHash**: 32-bit fingerprints; candidate pairs via the 4-block
  pigeonhole join (any equal 8-bit block), which is *exact* for Hamming
  radius ≤ 3 — no quadratic scan at any scale.
- **embedding cosine**: exact all-pairs baseline at test scale; the
  bucketed scale path lives in :mod:`.similarity` (LSH hyperplanes).

All hashes are md5-based so both engines compute identical values; every
float exits through the portable FLOOR-rounding (see
``functions/expressions.py``).
"""

from __future__ import annotations

import threading as _threading
from contextlib import contextmanager as _contextmanager

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.views import scoped_temp_view

# --- shared constants -----------------------------------------------------
SHINGLE_K = 3  # words per shingle
NUM_HASHES = 12  # minhash signature length
BANDS = 4  # LSH bands (NUM_HASHES / BANDS rows per band)
ROWS_PER_BAND = NUM_HASHES // BANDS
JACCARD_THRESHOLD = 0.5
# 32-bit fingerprints, 8-bit pigeonhole blocks: at radius ≤3 the 4-block
# join is still exact, while the candidate space per block is 256× finer
# than the 16-bit/4-bit original — measured 1.57M pairs → 83k at sf0.1
# (a 16-bit space saturates on any large corpus: quadratic collisions).
SIMHASH_BITS = 32
SIMHASH_BLOCKS = 4  # pigeonhole blocks → exact for radius ≤ SIMHASH_BLOCKS-1
SIMHASH_RADIUS = 3
COSINE_DUP_THRESHOLD = 0.4  # matched to the synthetic embeddings' similarity range

_TOKENS_SPARK = "filter(split(text, ' '), x -> x <> '')"
_TOKENS_DUCK = "list_filter(string_split(text, ' '), x -> x <> '')"

#: Registry metadata: queries kept ONLY as exact oracle baselines for
#: their scale-safe siblings. They are worst-case quadratic (uncapped
#: inverted-index join / all-pairs cosine) and must not be the op a
#: catalog user reaches for first — the value is the sibling name to use
#: instead at scale. tests/test_oracle_parity.py enforces that every
#: baseline's sibling is registered.
BASELINE_ONLY: dict[str, str] = {
    "dedup_ngram_jaccard": "dedup_ngram_jaccard_capped",
    "dedup_embedding_cosine": "dedup_embedding_cosine_prefiltered",
}

#: The S13 half of ``similarity.INDEX_SERVED``: registered ops whose
#: catalog form stays the oracle-checked SQL spec while production
#: serving rides the durable dedup index — each value names the
#: (sources module, build fn, serve fn) triple to reach for at scale.
#: Same test pin as the similarity map.
INDEX_SERVED: dict[str, tuple[str, str, str]] = {
    "dedup_minhash_lsh": (
        "dedup_index", "write_dedup_index", "minhash_lsh_pairs_from_index"
    ),
    "dedup_threshold_sweep": (
        "dedup_index", "write_dedup_index",
        "dedup_threshold_sweep_from_index",
    ),
}

# The distinct (doc_id, shingle) set. Spark builds it SHUFFLE-FREE: word
# k-grams via slice() over the token array inside one projection (no
# posexplode→window ordering exchange), de-duplicated per doc with
# array_distinct BEFORE the explode — and since doc_id is part of the
# key, per-doc uniqueness IS global uniqueness, so the old corpus-wide
# DISTINCT exchange disappears too. The DuckDB oracle keeps the
# window-lead + DISTINCT formulation, so every shingle consumer's hash
# check differentially proves the two builds identical.
_SHINGLES_SPARK = f"""
SELECT doc_id, shingle FROM (
  SELECT doc_id,
         explode(array_distinct(
           CASE WHEN size(toks) >= {SHINGLE_K}
                THEN transform(sequence(1, size(toks) - {SHINGLE_K} + 1),
                               i -> concat_ws(' ', slice(toks, i, {SHINGLE_K})))
                ELSE CAST(array() AS ARRAY<STRING>)
           END)) AS shingle
  FROM (SELECT doc_id, {_TOKENS_SPARK} AS toks FROM {{src}})
)
"""

_SHINGLES_DUCK = f"""
SELECT DISTINCT doc_id, shingle FROM (
  SELECT doc_id,
         tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w AS shingle
  FROM (
    SELECT doc_id,
           generate_subscripts({_TOKENS_DUCK}, 1) AS pos,
           unnest({_TOKENS_DUCK}) AS tok
    FROM documents
  )
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
) WHERE shingle IS NOT NULL
"""

# Last persisted frame per cache slot, keyed by the input plan's semantic
# hash: MinHash / Jaccard / clusters / contamination over the SAME
# documents frame share one cache instead of each rebuilding it, while a
# different input (test fixtures, another sf) still invalidates.
_SHINGLE_CACHE: dict[str, tuple[int, DataFrame]] = {}
# cache-dict guard + one build lock per slot: a double cache miss from
# two REST threads must build once, not twice (the loser's persist would
# leak and clobber the winner's entry). Slot locks are only taken AFTER
# releasing _CACHE_LOCK. Slot locks DO nest — a derived-relation build
# (bandkv, sigs, labels) calls shingles_cte and so acquires the
# _dedup_shingles lock while holding its own — but every nesting points
# ONE WAY, toward the shingle base. Keep it that way: a builder that
# holds the shingle lock must never call another cached builder, or two
# REST threads deadlock.
_CACHE_LOCK = _threading.Lock()
_SLOT_LOCKS: dict[str, _threading.Lock] = {}


def _materialized_df(spark, slot: str, key: int, build) -> DataFrame:
    """Build-once/persist pattern behind every derived-relation cache in
    this module (shingles, minhash band keys, token explosions), WITHOUT
    registering any catalog name — thread-safe, so concurrent callers
    (the REST layer) can share one cache with no global serialization.
    The eager count fills the cache in a single pass before fan-out
    reads race to build it; a changed input key (or a new session)
    invalidates."""
    with _CACHE_LOCK:
        lock = _SLOT_LOCKS.setdefault(slot, _threading.Lock())
    with lock:
        cached = _SHINGLE_CACHE.get(slot)
        if (
            cached is not None
            and cached[0] == key
            and cached[1].sparkSession is spark  # not from a stopped session
        ):
            return cached[1]
        if cached is not None:
            try:
                cached[1].unpersist()
            except Exception:
                pass  # prior session already gone
            _SHINGLE_CACHE.pop(slot, None)
        df = build().persist()
        df.count()
        _SHINGLE_CACHE[slot] = (key, df)
        return df


#: caches outside this module (e.g. llmprep's learned-merge cache)
#: register a clearer here so one clear call invalidates everything
_EXTRA_CACHE_CLEARERS: list = []


def clear_materialized_caches() -> None:
    """Drop every cached derived relation (shingles, minhash band keys).

    The cache key is the input PLAN's semantic hash, not the data: if the
    files under an unchanged path are rewritten (re-ingest, test fixtures
    overwriting a tmp dir), the key stays equal and the cache would serve
    stale rows — call this after any in-place data change.

    Takes each slot's build lock, not just the dict lock: a build in
    flight on another thread would otherwise insert its (stale-input)
    entry AFTER the clear, resurrecting exactly the cache this call was
    meant to invalidate. Holding the slot lock makes the clear wait for
    the in-flight build and then evict its result."""
    with _CACHE_LOCK:
        slot_locks = list(_SLOT_LOCKS.items())
    for slot, lock in slot_locks:
        with lock:
            cached = _SHINGLE_CACHE.pop(slot, None)
            if cached is not None:
                try:
                    cached[1].unpersist()
                except Exception:
                    pass  # session already gone
    # entries whose slot lock was created after the snapshot (new slots)
    with _CACHE_LOCK:
        leftovers = list(_SHINGLE_CACHE.items())
        _SHINGLE_CACHE.clear()
    for _, (_, df) in leftovers:
        try:
            df.unpersist()
        except Exception:
            pass  # session already gone
    for clearer in list(_EXTRA_CACHE_CLEARERS):
        clearer()


def materialized_shingles_df(docs: DataFrame) -> DataFrame:
    """The distinct (doc_id, shingle) relation, built once and persisted
    — no catalog names touched, so concurrent callers can't race on a
    registration. SQL consumers go through :func:`shingles_cte`."""
    spark = docs.sparkSession

    def build():
        with scoped_temp_view(docs, "_dedup_docs_src") as v:
            return spark.sql(_SHINGLES_SPARK.format(src=v))

    return _materialized_df(spark, "_dedup_shingles", docs.semanticHash(), build)


@_contextmanager
def shingles_cte(docs: DataFrame):
    """Yield the ``WITH shingles AS …,\\n`` SQL header over a PER-CALL
    scoped view of the cached shingle relation.

    Spark inlines SQL CTEs, so a ``shingles`` CTE referenced by ``sigs``,
    ``sizes`` and twice by ``common`` re-runs the whole build sub-plan ~4×
    (measured: dedup_minhash_lsh 11.96 s at sf0.1 pre-materialization).
    Materializing it swaps every reference for a scan of one cached
    InMemoryRelation — the same ingest-once philosophy as the reference's
    hot-field extraction (duckdb_store.rs:708-757). Calls with a
    semantically-identical input frame reuse the live cache (one shingle
    build serves the whole dedup suite in a session).

    The view name is unique per call and dropped on exit (the consuming
    ``spark.sql`` inlines it at analysis) — no fixed catalog names, so
    two pipelines over different corpora on one SparkSession can never
    cross-register, in the library surface exactly as in the REST one.
    """
    df = materialized_shingles_df(docs)
    with scoped_temp_view(df, "_dedup_shingles") as v:
        yield f"WITH shingles AS (SELECT doc_id, shingle FROM {v}),\n"


def materialized_bandkv_df(docs: DataFrame) -> DataFrame:
    """The (doc_id, band_idx, band_key) MinHash band relation, built once
    over the cached shingles and persisted — the index a production LSH
    deployment stores (index-once / probe-many). No catalog names."""
    spark = docs.sparkSession

    def build():
        with shingles_cte(docs) as hdr:
            return spark.sql(
                hdr
                + _minhash_bandkv_sql(_BANDKV_SPARK).lstrip()
                + "\nSELECT doc_id, band_idx, band_key FROM bandkv"
            )

    return _materialized_df(spark, "_dedup_bandkv", docs.semanticHash(), build)


def materialized_passage_wins_df(docs: DataFrame) -> DataFrame:
    """The (doc_id, pos, phash) rolling-window hash relation shared by
    D6/D7 and C14/C16 — one tokenize+hash pass per corpus, persisted
    through the keyed cache. No catalog names."""
    spark = docs.sparkSession

    def build():
        with scoped_temp_view(docs, "_dedup_docs_src") as v:
            return spark.sql(_PASSAGE_WINS_SPARK.format(src=v))

    return _materialized_df(
        spark, "_dedup_passage_wins", docs.semanticHash(), build
    )


# ==========================================================================
# D1 — exact dedup (hash groupBy)
# ==========================================================================
def dedup_exact(docs: DataFrame) -> DataFrame:
    """D1: group documents by content hash; keeper = min doc_id. One
    shuffle keyed on the hash (uniform by construction — md5 cannot skew)."""
    return (
        docs.select(F.md5("text").alias("text_hash"), "doc_id")
        .groupBy("text_hash")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("keeper_doc_id"),
            (F.count("*") - 1).alias("n_duplicates"),
        )
        .orderBy("text_hash")
    )


ORACLE_DEDUP_EXACT = """
SELECT md5(text) AS text_hash,
       COUNT(*) AS n_docs,
       MIN(doc_id) AS keeper_doc_id,
       COUNT(*) - 1 AS n_duplicates
FROM documents
GROUP BY md5(text)
ORDER BY text_hash
"""


# ==========================================================================
# D2 — n-gram Jaccard pairs (exact, inverted-index join)
# ==========================================================================
_JACCARD_TAIL = """
sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common_shingles
  FROM shingles a JOIN shingles b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b, common_shingles,
       FLOOR((CAST(common_shingles AS DOUBLE) / (x.n + y.n - common_shingles)) * 10000.0 + 0.5)
         / CAST(10000.0 AS DOUBLE) AS jaccard
FROM common
JOIN sizes x ON doc_a = x.doc_id
JOIN sizes y ON doc_b = y.doc_id
WHERE FLOOR((CAST(common_shingles AS DOUBLE) / (x.n + y.n - common_shingles)) * 10000.0 + 0.5)
         / CAST(10000.0 AS DOUBLE) >= {thr}
ORDER BY doc_a, doc_b
"""


def ngram_jaccard_pairs(docs: DataFrame) -> DataFrame:
    """D2: exact word-{k}-shingle Jaccard over candidate pairs sharing ≥1
    shingle (inverted index join, the all-pairs-similarity baseline)."""
    with shingles_cte(docs) as hdr:
        return docs.sparkSession.sql(
            hdr + _JACCARD_TAIL.format(thr=JACCARD_THRESHOLD)
        )


ORACLE_NGRAM_JACCARD = (
    "WITH shingles AS (" + _SHINGLES_DUCK + "),\n"
    + _JACCARD_TAIL.format(thr=JACCARD_THRESHOLD)
)


# --------------------------------------------------------------------------
# D2b — stop-shingle-capped Jaccard (the scale guard for D2)
# --------------------------------------------------------------------------
# Exact-Jaccard verification of a `candidates` (doc_a, doc_b) relation
# against the FULL shingle sets — shared by capped-jaccard (stop-shingle-
# pruned candidates) and minhash below (band candidates).
#: shared exact-intersection verification: per-doc set sizes + the
#: common-shingle count per candidate pair. Jaccard (below) and
#: containment (D2c) append different similarity tails to ONE copy of
#: this counting logic.
_PAIR_COMMON_CTES = """
sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
common AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS common_shingles
  FROM candidates c
  JOIN shingles a ON a.doc_id = c.doc_a
  JOIN shingles b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
  GROUP BY c.doc_a, c.doc_b
)"""

_PAIR_VERIFY_POST = _PAIR_COMMON_CTES + """
SELECT doc_a, doc_b, common_shingles,
       FLOOR((CAST(common_shingles AS DOUBLE) / (x.n + y.n - common_shingles)) * 10000.0 + 0.5)
         / CAST(10000.0 AS DOUBLE) AS jaccard
FROM common
JOIN sizes x ON doc_a = x.doc_id
JOIN sizes y ON doc_b = y.doc_id
WHERE FLOOR((CAST(common_shingles AS DOUBLE) / (x.n + y.n - common_shingles)) * 10000.0 + 0.5)
         / CAST(10000.0 AS DOUBLE) >= {thr}
ORDER BY doc_a, doc_b
"""
#: candidate-generation doc-frequency cap: shingles appearing in more
#: documents than this are boilerplate ("stop shingles") and are excluded
#: from the inverted-index join. 6 exercises pruning at every test sf
#: (max shingle doc-freq: 7 at sf0.01, 25 at sf0.1); production sets it
#: relative to corpus size.
HOT_SHINGLE_CAP = 6

_CAPPED_CANDIDATES = """
hot AS (
  SELECT shingle FROM shingles GROUP BY shingle HAVING COUNT(*) > {cap}
),
pruned AS (
  SELECT s.doc_id, s.shingle
  FROM shingles s LEFT JOIN hot h ON s.shingle = h.shingle
  WHERE h.shingle IS NULL
),
candidates AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM pruned a JOIN pruned b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
),"""


def ngram_jaccard_pairs_capped(
    docs: DataFrame, cap: int = HOT_SHINGLE_CAP
) -> DataFrame:
    """D2b: D2 with the standard production guard against its worst case —
    the inverted-index self-join is quadratic in the hottest shingle's
    posting list, so shingles appearing in more than ``cap`` documents
    ("stop shingles": licenses, navigation chrome, boilerplate headers)
    are excluded from CANDIDATE GENERATION only. Surviving pairs are
    verified with exact Jaccard over the FULL shingle sets (same verify
    fragment as MinHash), so reported similarities are unchanged — the
    cap can only drop pairs whose every shared shingle is ubiquitous,
    which at τ={t} means boilerplate-only overlap. Candidate cost falls
    from Σ f² over all shingles to Σ f² over f ≤ cap — bounded per
    shingle, unskewable.""".format(t=JACCARD_THRESHOLD)
    with shingles_cte(docs) as hdr:
        return docs.sparkSession.sql(
            hdr.rstrip().rstrip(",")
            + ","
            + _CAPPED_CANDIDATES.format(cap=cap)
            + _PAIR_VERIFY_POST.format(thr=JACCARD_THRESHOLD)
        )


ORACLE_NGRAM_JACCARD_CAPPED = (
    "WITH shingles AS (" + _SHINGLES_DUCK + "),"
    + _CAPPED_CANDIDATES.format(cap=HOT_SHINGLE_CAP)
    + _PAIR_VERIFY_POST.format(thr=JACCARD_THRESHOLD)
)


# --------------------------------------------------------------------------
# D2d — threshold sweep (the dedup-aggressiveness tuning curve)
# --------------------------------------------------------------------------
#: The question every dedup deployment answers before committing a
#: threshold: how much of the corpus disappears at τ? One pass answers
#: it for every τ in the sweep simultaneously (the X10b nprobe-sweep
#: pattern): candidates are generated once (D2b's stop-shingle-pruned
#: inverted index), exact Jaccard is verified once, and each sweep level
#: is a `jaccard >= thr` filter over that ONE scored relation — the
#: sweep costs one candidate scan, not |sweep| of them.
#:
#: Removal rule: keep-lowest-doc_id per PAIR (a doc is removed at τ iff
#: some ≥τ neighbor has a smaller id) — the standard streaming-friendly
#: LSH-dedup heuristic. It can only over-remove vs D8's exact
#: connected-component canonicalization (a doc whose smaller-id neighbor
#: is itself removed still goes), so the curve is a conservative upper
#: bound on removal volume — the right direction for budget planning.
#: sweep levels span the two regimes every shingle-candidate corpus has:
#: the incidental-overlap mass near 0 (shared phrases) and the true
#: near-dup mode near 1 — low levels size the false-positive exposure of
#: an aggressive τ, high levels the near-dup volume itself
SWEEP_THRESHOLDS = (0.05, 0.1, 0.3, 0.5, 0.7, 0.9)

_SWEEP_THRESHOLDS_SQL = " UNION ALL ".join(
    f"SELECT CAST({t} AS DOUBLE) AS thr" for t in SWEEP_THRESHOLDS
)

_THRESHOLD_SWEEP_POST = _PAIR_COMMON_CTES + """,
scored AS (
  SELECT doc_a, doc_b,
         FLOOR((CAST(common_shingles AS DOUBLE)
                / (x.n + y.n - common_shingles)) * 10000.0 + 0.5)
           / CAST(10000.0 AS DOUBLE) AS jaccard
  FROM common
  JOIN sizes x ON doc_a = x.doc_id
  JOIN sizes y ON doc_b = y.doc_id
),
thresholds AS ({thrs}),
hits AS (
  SELECT t.thr, s.doc_a, s.doc_b
  FROM scored s JOIN thresholds t ON s.jaccard >= t.thr
),
pair_stats AS (
  SELECT thr, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(COUNT(DISTINCT doc_b) AS BIGINT) AS n_docs_removed
  FROM hits GROUP BY thr
),
total AS (SELECT COUNT(*) AS n_docs FROM {docsrc})
SELECT t.thr AS threshold,
       CAST(tt.n_docs AS BIGINT) AS n_docs,
       COALESCE(p.n_pairs, 0) AS n_pairs,
       COALESCE(p.n_docs_removed, 0) AS n_docs_removed,
       CASE WHEN tt.n_docs = 0 THEN CAST(0.0 AS DOUBLE)
            ELSE FLOOR((CAST(COALESCE(p.n_docs_removed, 0) AS DOUBLE)
                        / CAST(tt.n_docs AS DOUBLE)) * 10000.0 + 0.5)
                 / CAST(10000.0 AS DOUBLE) END AS removed_frac
FROM thresholds t
LEFT JOIN pair_stats p ON p.thr = t.thr
CROSS JOIN total tt
ORDER BY threshold
"""


def dedup_threshold_sweep(
    docs: DataFrame, cap: int = HOT_SHINGLE_CAP
) -> DataFrame:
    """D2d: near-dup pair count, docs removed (keep-lowest-id rule) and
    removal fraction at every Jaccard threshold in {ts}, from ONE
    candidate generation + ONE exact verification — see the block
    comment for the sweep trick and the removal rule's bias direction.

    Scale shape: identical to D2b (stop-shingle-pruned candidates,
    hash-keyed joins, text never shuffles) plus a |sweep|-row threshold
    relation broadcast into the scored-pair filter; per-threshold
    aggregates are ≤ |sweep| × pairs rows folded to |sweep| rows.""".format(
        ts=SWEEP_THRESHOLDS
    )
    with shingles_cte(docs) as hdr, scoped_temp_view(
        docs, "_dedup_docs"
    ) as dv:
        return docs.sparkSession.sql(
            hdr.rstrip().rstrip(",")
            + ","
            + _CAPPED_CANDIDATES.format(cap=cap)
            + _THRESHOLD_SWEEP_POST.format(
                thrs=_SWEEP_THRESHOLDS_SQL, docsrc=dv
            )
        )


ORACLE_THRESHOLD_SWEEP = (
    "WITH shingles AS (" + _SHINGLES_DUCK + "),"
    + _CAPPED_CANDIDATES.format(cap=HOT_SHINGLE_CAP)
    + _THRESHOLD_SWEEP_POST.format(
        thrs=_SWEEP_THRESHOLDS_SQL, docsrc="documents"
    )
)


# --------------------------------------------------------------------------
# D2c — asymmetric shingle containment (excerpt/superset detection)
# --------------------------------------------------------------------------
#: containment(A in B) = |A∩B| / |A| (Broder 1997 §2 distinguishes it
#: from resemblance): a short document quoted verbatim inside a long one
#: scores near 1.0 here while its JACCARD stays tiny (|A∪B| is dominated
#: by the long side) — the sub-document duplication class D2/D3 cannot
#: flag at any threshold. Pairs keep both directions; the filter is on
#: the max.
CONTAINMENT_THRESHOLD = 0.8

_CONTAINMENT_POST = _PAIR_COMMON_CTES + """
SELECT doc_a, doc_b, shingles_a, shingles_b, common_shingles,
       containment_a, containment_b
FROM (
  SELECT doc_a, doc_b, x.n AS shingles_a, y.n AS shingles_b,
         common_shingles,
         FLOOR((CAST(common_shingles AS DOUBLE) / x.n) * 10000.0 + 0.5)
           / CAST(10000.0 AS DOUBLE) AS containment_a,
         FLOOR((CAST(common_shingles AS DOUBLE) / y.n) * 10000.0 + 0.5)
           / CAST(10000.0 AS DOUBLE) AS containment_b
  FROM common
  JOIN sizes x ON doc_a = x.doc_id
  JOIN sizes y ON doc_b = y.doc_id
)
WHERE containment_a >= {thr} OR containment_b >= {thr}
ORDER BY doc_a, doc_b
"""


def containment_pairs(
    docs: DataFrame, cap: int = HOT_SHINGLE_CAP
) -> DataFrame:
    """D2c: directional shingle-containment pairs — candidate generation
    is D2b's stop-shingle-pruned inverted-index join (same Σ f², f ≤ cap
    bound), verification computes |A∩B|/|A| and |A∩B|/|B| against the
    FULL shingle sets; pairs where either direction ≥ {thr} survive.
    The excerpt-detection complement to D2/D3: containment-high pairs
    with low Jaccard are quotes/boilerplate-wrapped copies whose union
    is dominated by the longer side.

    Scale shape: identical to D2b — rides the materialized shingle
    relation, hash-keyed joins only, text never shuffles.""".format(
        thr=CONTAINMENT_THRESHOLD
    )
    with shingles_cte(docs) as hdr:
        return docs.sparkSession.sql(
            hdr.rstrip().rstrip(",")
            + ","
            + _CAPPED_CANDIDATES.format(cap=cap)
            + _CONTAINMENT_POST.format(thr=CONTAINMENT_THRESHOLD)
        )


ORACLE_CONTAINMENT = (
    "WITH shingles AS (" + _SHINGLES_DUCK + "),"
    + _CAPPED_CANDIDATES.format(cap=HOT_SHINGLE_CAP)
    + _CONTAINMENT_POST.format(thr=CONTAINMENT_THRESHOLD)
)


# ==========================================================================
# D3 — MinHash + LSH (banded) with exact-Jaccard verification
# ==========================================================================
def _sig_cols_sql() -> list[str]:
    # min over the shingle set of md5('<seed>|'||shingle): a string min is a
    # valid minhash (md5 output orders uniformly); no integer conversion
    # portability risk.
    return [
        f"MIN(md5('{i}|' || shingle)) AS sig{i}" for i in range(NUM_HASHES)
    ]


def _band_cols_sql() -> list[str]:
    cols = []
    for b in range(BANDS):
        parts = " || ".join(
            f"sig{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND)
        )
        cols.append(f"md5({parts}) AS band{b}")
    return cols


# Band-key row expansion, per engine. Spark MUST use stack() (a generator,
# one pass): CTEs are inlined there, so a UNION-ALL expansion would
# recompute the whole signature aggregation once per band — measured 8×+
# slowdown at sf0.1. DuckDB has no stack(); its oracle keeps UNION ALL.
_BANDKV_SPARK = (
    "  SELECT doc_id, band_idx, band_key FROM (\n"
    "    SELECT doc_id, stack("
    + str(BANDS)
    + ", "
    + ", ".join(f"{b}, band{b}" for b in range(BANDS))
    + ") AS (band_idx, band_key) FROM bands\n  )"
)
_BANDKV_DUCK = "\n  UNION ALL\n".join(
    f"  SELECT doc_id, {b} AS band_idx, band{b} AS band_key FROM bands"
    for b in range(BANDS)
)


def _minhash_bandkv_sql(bandkv_body: str) -> str:
    """sigs → bands → bandkv: the signature/band-key derivation from the
    shingle relation."""
    return (
        """
sigs AS (
  SELECT doc_id, """
        + ", ".join(_sig_cols_sql())
        + """
  FROM shingles GROUP BY doc_id
),
bands AS (
  SELECT doc_id, """
        + ", ".join(_band_cols_sql())
        + """
  FROM sigs
),
bandkv AS (
"""
        + bandkv_body
        + """
)"""
    )


# Shared from `candidates` down — references `bandkv` and `shingles`
# however the engine produced them.
_MINHASH_POST = (
    """
candidates AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bandkv a JOIN bandkv b
    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
   AND a.doc_id < b.doc_id
),"""
    + _PAIR_VERIFY_POST
)


def minhash_lsh_pairs(docs: DataFrame) -> DataFrame:
    """D3: MinHash signatures ({n} hashes), {b} LSH bands; candidates =
    band-key collisions; exact-Jaccard verify at τ={t}. The scale path for
    D2: only band collisions are ever paired, so the shuffle carries
    (doc_id, band_key), not document content.

    The (doc_id, band_idx, band_key) relation is materialized alongside
    the shingles (same keyed cache): at serving time repeated calls skip
    the {n}-MIN signature aggregation entirely — the index-once /
    probe-many split every production LSH deployment uses.""".format(
        n=NUM_HASHES, b=BANDS, t=JACCARD_THRESHOLD
    )
    spark = docs.sparkSession
    bk = materialized_bandkv_df(docs)
    with shingles_cte(docs) as hdr, scoped_temp_view(bk, "_dedup_bandkv") as bv:
        return spark.sql(
            hdr
            + f"bandkv AS (SELECT doc_id, band_idx, band_key FROM {bv}),"
            + _MINHASH_POST.format(thr=JACCARD_THRESHOLD)
        )


ORACLE_MINHASH = (
    "WITH shingles AS (" + _SHINGLES_DUCK + "),\n"
    + _minhash_bandkv_sql(_BANDKV_DUCK)
    + ","
    + _MINHASH_POST.format(thr=JACCARD_THRESHOLD)
)


# --------------------------------------------------------------------------
# D3b — MinHash estimator-error eval (est. vs exact Jaccard per candidate)
# --------------------------------------------------------------------------
_SIG_MATCH_SUM = " + ".join(
    f"(CASE WHEN sa.sig{i} = sb.sig{i} THEN 1 ELSE 0 END)"
    for i in range(NUM_HASHES)
)

# No τ filter here: the eval measures estimator quality across the whole
# candidate range, not just accepted pairs. COALESCE guards the (md5-
# collision-only) case of a band collision with zero shared shingles.
_MINHASH_EVAL_POST = f"""
candidates AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bandkv a JOIN bandkv b
    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
   AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
common AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS common_shingles
  FROM candidates c
  JOIN shingles a ON a.doc_id = c.doc_a
  JOIN shingles b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
  GROUP BY c.doc_a, c.doc_b
),
est AS (
  SELECT c.doc_a, c.doc_b,
         ({_SIG_MATCH_SUM}) AS n_sig_matches,
         COALESCE(m.common_shingles, 0) AS common_shingles
  FROM candidates c
  JOIN sigs sa ON sa.doc_id = c.doc_a
  JOIN sigs sb ON sb.doc_id = c.doc_b
  LEFT JOIN common m ON m.doc_a = c.doc_a AND m.doc_b = c.doc_b
),
scored AS (
  SELECT e.doc_a, e.doc_b, e.n_sig_matches, e.common_shingles,
         FLOOR((CAST(e.n_sig_matches AS DOUBLE) / {NUM_HASHES}.0) * 10000.0 + 0.5)
           / CAST(10000.0 AS DOUBLE) AS est_jaccard,
         FLOOR((CAST(e.common_shingles AS DOUBLE)
                / (x.n + y.n - e.common_shingles)) * 10000.0 + 0.5)
           / CAST(10000.0 AS DOUBLE) AS jaccard
  FROM est e
  JOIN sizes x ON e.doc_a = x.doc_id
  JOIN sizes y ON e.doc_b = y.doc_id
)
SELECT doc_a, doc_b, n_sig_matches, common_shingles, est_jaccard, jaccard,
       FLOOR(ABS(est_jaccard - jaccard) * 10000.0 + 0.5)
         / CAST(10000.0 AS DOUBLE) AS abs_err
FROM scored
ORDER BY doc_a, doc_b
"""


def minhash_estimate_eval(docs: DataFrame) -> DataFrame:
    """D3b: estimator-quality eval for the MinHash path — for every LSH
    band-collision candidate pair, the signature-agreement Jaccard
    estimate (matches/{n}) next to the exact shingle-set Jaccard and the
    absolute error. This is the measurement a pipeline runs before
    trusting D3's banding parameters (too-few hashes → high error →
    wrong keep/drop calls near τ), the Jaccard twin of ann_recall_eval.

    Scale shape: reuses the materialized shingle and band-key relations
    (index-once/probe-many); signatures are one {n}-MIN aggregation per
    doc over its shingles; everything pairwise runs only on the bounded
    band-collision candidate set. The oracle recomputes BOTH the estimate
    and the exact side declaratively, so the measurement itself is
    cross-checked.""".format(n=NUM_HASHES)
    spark = docs.sparkSession
    bk = materialized_bandkv_df(docs)

    # the signature table is the index a MinHash deployment stores — like
    # shingles/band keys it serves from the keyed materialized cache
    # (one NUM_HASHES-way MIN aggregation pass, not one per eval call)
    def build_sigs():
        with shingles_cte(docs) as hdr:
            return spark.sql(
                hdr.rstrip().rstrip(",")
                + "\nSELECT doc_id, "
                + ", ".join(_sig_cols_sql())
                + " FROM shingles GROUP BY doc_id"
            )

    sg = _materialized_df(spark, "_dedup_sigs", docs.semanticHash(), build_sigs)
    with shingles_cte(docs) as hdr, scoped_temp_view(
        sg, "_dedup_sigs"
    ) as sv, scoped_temp_view(bk, "_dedup_bandkv") as bv:
        return spark.sql(
            hdr
            + f"sigs AS (SELECT * FROM {sv}),"
            + f"bandkv AS (SELECT doc_id, band_idx, band_key FROM {bv}),"
            + _MINHASH_EVAL_POST
        )


ORACLE_MINHASH_EVAL = (
    "WITH shingles AS (" + _SHINGLES_DUCK + "),\n"
    + _minhash_bandkv_sql(_BANDKV_DUCK)
    + ","
    + _MINHASH_EVAL_POST
)


# ==========================================================================
# D4 — SimHash with pigeonhole block join
# ==========================================================================
def _simhash_bit_sums() -> list[str]:
    # bit j of md5(token): hex digit j/4, bit j%4. contribution ±1 per token
    # occurrence; identical text in both engines.
    cols = []
    for j in range(SIMHASH_BITS):
        digit = f"(position(substr(h, {1 + j // 4}, 1) IN '0123456789abcdef') - 1)"
        bit = f"(({digit} >> {j % 4}) & 1)"
        cols.append(f"SUM(2 * {bit} - 1) AS s{j}")
    return cols


def _simhash_fp() -> str:
    terms = [
        f"(CASE WHEN s{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(SIMHASH_BITS)
    ]
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


_BLOCK_WIDTH = SIMHASH_BITS // SIMHASH_BLOCKS  # 4 bits per block


# Per-engine block expansion (same reasoning as _BANDKV_*: Spark inlines
# CTEs, so UNION ALL would recompute the 16-aggregate simhash per block).
_BLOCKS_SPARK = (
    "  SELECT doc_id, fp, block_idx, (fp >> (block_idx * "
    + str(_BLOCK_WIDTH)
    + f")) & {(1 << _BLOCK_WIDTH) - 1} AS block_val FROM (\n"
    "    SELECT doc_id, fp, explode(array("
    + ", ".join(str(q) for q in range(SIMHASH_BLOCKS))
    + ")) AS block_idx FROM fps\n  )"
)
_BLOCKS_DUCK = "\n  UNION ALL\n".join(
    f"  SELECT doc_id, fp, {q} AS block_idx,"
    f" (fp >> {q * _BLOCK_WIDTH}) & {(1 << _BLOCK_WIDTH) - 1} AS block_val"
    f" FROM fps"
    for q in range(SIMHASH_BLOCKS)
)


def _simhash_post(xor_expr: str, blocks_body: str) -> str:
    """Everything downstream of the ``fps`` relation — shared verbatim by
    both engines (the engines differ only in how fps is produced)."""
    return (
        """blocks AS (
"""
        + blocks_body
        + f"""
),
candidates AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  a.fp AS fp_a, b.fp AS fp_b
  FROM blocks a JOIN blocks b
    ON a.block_idx = b.block_idx AND a.block_val = b.block_val
   AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, fp_a, fp_b,
       bit_count({xor_expr}) AS hamming
FROM candidates
WHERE bit_count({xor_expr}) <= {SIMHASH_RADIUS}
ORDER BY doc_a, doc_b
"""
    )


def simhash_fp_fold_expr() -> str:
    """The SimHash fingerprint as ONE projection expression — a
    higher-order fold over the token array (per-token md5 → ±1 bit
    contributions → sign), bit-identical to the explode+groupBy pipeline
    in :func:`simhash_pairs` (verified doc-by-doc) but with no
    aggregation step, so it is legal in a streaming projection and free
    of shuffle in batch. A token-less document folds to fp=0 (the batch
    aggregation emits no row for it — the only divergence)."""
    return f"""
aggregate(
  zip_with(
    aggregate(
      transform(filter(split(text, ' '), x -> x <> ''), t -> md5(t)),
      array_repeat(0, {SIMHASH_BITS}),
      (acc, h) -> zip_with(
        acc,
        transform(sequence(0, {SIMHASH_BITS - 1}), j ->
          (shiftright(locate(substr(h, CAST(1 + j DIV 4 AS INT), 1),
                             '0123456789abcdef') - 1,
                      CAST(j % 4 AS INT)) & 1)),
        (a, b) -> a + 2 * b - 1)
    ),
    sequence(0, {SIMHASH_BITS - 1}),
    (s, j) -> CASE WHEN s > 0 THEN shiftleft(CAST(1 AS BIGINT), j)
              ELSE CAST(0 AS BIGINT) END
  ),
  CAST(0 AS BIGINT), (acc, x) -> acc + x)
"""


def simhash_pairs(docs: DataFrame) -> DataFrame:
    """D4: 32-bit SimHash near-dup pairs at Hamming radius ≤ {r}. Candidate
    generation is the 4-block pigeonhole join (two fingerprints within
    radius {r} < {b} blocks must agree on ≥1 block) — exact recall without
    an all-pairs scan, the property that makes SimHash the 100 TB
    fingerprint dedup of choice.

    The Spark side computes fingerprints as a shuffle-free fold
    projection (:func:`simhash_fp_fold_expr` — no token explode, no
    per-doc aggregation exchange; the corpus-wide token-hash shuffle was
    this operator's heaviest); the DuckDB oracle keeps the
    explode+GROUP BY pipeline, so the hash check differentially proves
    the two formulations identical. Token-less docs are filtered to
    match the aggregation's emit-no-row semantics.""".format(
        r=SIMHASH_RADIUS, b=SIMHASH_BLOCKS
    )
    spark = docs.sparkSession

    # Materialize the fingerprint relation (keyed cache, same policy as
    # shingles/band-keys): the self-join references `fps` twice and Spark
    # inlines CTEs, so without this the 32-bit fold recomputes per join
    # side — measured 6.2 s → ~1 s at sf0.1. 12 bytes/doc, index-once.
    def build_fps():
        with scoped_temp_view(docs, "_dedup_docs_src") as v:
            return spark.sql(
                "SELECT doc_id, ("
                + simhash_fp_fold_expr()
                + f") AS fp FROM {v} WHERE size({_TOKENS_SPARK}) > 0"
            )

    fp = _materialized_df(spark, "_dedup_fps", docs.semanticHash(), build_fps)
    with scoped_temp_view(fp, "_dedup_fps") as fv:
        return spark.sql(
            f"WITH fps AS (SELECT doc_id, fp FROM {fv}),\n"
            + _simhash_post("fp_a ^ fp_b", _BLOCKS_SPARK)
        )


ORACLE_SIMHASH = (
    "WITH tokens AS (SELECT doc_id, unnest("
    + _TOKENS_DUCK
    + """) AS tok FROM documents),
hashed AS (SELECT doc_id, md5(tok) AS h FROM tokens),
sums AS (
  SELECT doc_id, """
    + ", ".join(_simhash_bit_sums())
    + """
  FROM hashed GROUP BY doc_id
),
fps AS (SELECT doc_id, """
    + _simhash_fp()
    + """ AS fp FROM sums),
"""
    + _simhash_post("xor(fp_a, fp_b)", _BLOCKS_DUCK)
)


# ==========================================================================
# D5 — embedding-cosine near-duplicates (exact baseline)
# ==========================================================================
_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
    " 0D, (acc, x) -> acc + x)"
)
_NORM = (
    "sqrt(aggregate(transform({v}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),"
    " 0D, (acc, x) -> acc + x))"
)


def cosine_expr_spark(a: str, b: str) -> str:
    """r6-rounded cosine similarity between two array<float> columns —
    JVM-side higher-order functions, strict left fold (bit-identical to
    DuckDB's ``list_dot_product`` on DOUBLE[], verified over all sf0.01
    pairs). A zero-norm vector (failed encode — one is enough to exist
    in any 100 TB corpus) has undefined cosine: defined here as 0.0,
    because Spark's ANSI mode otherwise throws DIVIDE_BY_ZERO and kills
    the whole query."""
    dot = _DOT.format(a=a, b=b)
    na = _NORM.format(v=a)
    nb = _NORM.format(v=b)
    return (
        f"CASE WHEN ({na} * {nb}) = 0 THEN CAST(0.0 AS DOUBLE) ELSE "
        f"FLOOR(({dot} / ({na} * {nb})) * 1000000.0 + 0.5)"
        f" / CAST(1000000.0 AS DOUBLE) END"
    )


def cosine_expr_duck(a: str, b: str) -> str:
    dot = f"list_dot_product(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[]))"
    na = f"sqrt(list_dot_product(CAST({a} AS DOUBLE[]), CAST({a} AS DOUBLE[])))"
    nb = f"sqrt(list_dot_product(CAST({b} AS DOUBLE[]), CAST({b} AS DOUBLE[])))"
    return (
        f"CASE WHEN ({na} * {nb}) = 0 THEN CAST(0.0 AS DOUBLE) ELSE "
        f"FLOOR(({dot} / ({na} * {nb})) * 1000000.0 + 0.5)"
        f" / CAST(1000000.0 AS DOUBLE) END"
    )


# Pre-normalize once per vector (one norm fold each), then a pair is a
# single dot-product fold; the cosine is computed ONCE in a subquery (not
# re-evaluated in WHERE). Same element order → same IEEE op sequence in
# both engines. ~6× fewer array folds than the naive form, and the
# repartition hint parallelizes the quadratic pair loop (the non-equi join
# is a nested-loop whose task count follows the left side's partitions).
# The width is NOT hard-coded: callers fill {parts} from the session's
# defaultParallelism so the pair loop scales with the cluster.
# zero-norm vectors normalize to the zero vector (cosine 0 vs anything)
# instead of an ANSI DIVIDE_BY_ZERO crash
_NORMED_SPARK = """
SELECT /*+ REPARTITION({parts}) */ vec_id,
       transform(embedding, x -> CASE WHEN {norm} = 0 THEN CAST(0.0 AS DOUBLE)
                                 ELSE CAST(x AS DOUBLE) / {norm} END) AS nv
FROM {src}
""".format(norm=_NORM.format(v="embedding"), src="{src}", parts="{parts}")

_NORMED_DUCK = """
SELECT vec_id,
       list_transform(CAST(embedding AS DOUBLE[]),
                      x -> CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]),
                                                      CAST(embedding AS DOUBLE[])) = 0
                           THEN CAST(0.0 AS DOUBLE)
                           ELSE x / sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                                          CAST(embedding AS DOUBLE[]))) END) AS nv
FROM {src}
"""

_COS_PAIRS_TAIL = """
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       FLOOR(({dot}) * 1000000.0 + 0.5) / CAST(1000000.0 AS DOUBLE) AS cosine
FROM normed a JOIN normed b
  -- ON-clause conjunct order matters on the Spark side: with the
  -- threshold as an outer WHERE, Catalyst pushes it into the join ahead
  -- of the id ordering and the fold runs on all n² pairs instead of
  -- n²/2 (measured 2.3× on the prefiltered variant D5b carried
  -- before its r09 move to the block kernel)
  ON a.vec_id < b.vec_id
 AND FLOOR(({dot}) * 1000000.0 + 0.5) / CAST(1000000.0 AS DOUBLE) >= {thr}
ORDER BY vec_a, vec_b
"""


def embedding_cosine_dups(emb: DataFrame) -> DataFrame:
    """D5: exact all-pairs cosine near-dup at τ={t}. This is the verify
    baseline; the default scale path is
    :func:`embedding_cosine_dups_prefiltered` below, and the bucketed
    alternative (random-hyperplane LSH) is
    :func:`..operators.similarity.ann_lsh_bucketed`.""".format(
        t=COSINE_DUP_THRESHOLD
    )
    parts = emb.sparkSession.sparkContext.defaultParallelism
    with scoped_temp_view(
        emb.where("embedding IS NOT NULL"), "_dedup_emb"
    ) as ev:
        return emb.sparkSession.sql(
            "WITH normed AS ("
            + _NORMED_SPARK.format(src=ev, parts=parts)
            + ")"
            + _COS_PAIRS_TAIL.format(
                dot=_DOT.format(a="a.nv", b="b.nv"), thr=COSINE_DUP_THRESHOLD
            )
        )


ORACLE_COSINE_DUPS = (
    "WITH normed AS ("
    + _NORMED_DUCK.format(src="(SELECT * FROM embeddings WHERE embedding IS NOT NULL)")
    + ")"
    + _COS_PAIRS_TAIL.format(
        dot="list_dot_product(a.nv, b.nv)", thr=COSINE_DUP_THRESHOLD
    )
)


# --------------------------------------------------------------------------
# D5b — sketch-prefiltered cosine near-dup (the default scale path)
# --------------------------------------------------------------------------
#: Sign-sketch width for the dedup prefilter (wider than similarity.X5's
#: 16 bits because dedup thresholds admit much larger angles than top-k
#: rerank radii, so the Hamming distribution needs finer resolution).
EMBEDDING_SKETCH_BITS = 32


def _dedup_sketch_planes() -> list[list[float]]:
    """Planes namespaced ``e:`` so they are independent of similarity.py's
    ``h:``/``s:`` families; one shared generator keeps the embedding
    dimensionality in sync (see functions/planes.py)."""
    from ..functions.planes import md5_planes

    return md5_planes("e", EMBEDDING_SKETCH_BITS)


_DEDUP_SKETCH_PLANES = _dedup_sketch_planes()


def _dedup_sketch_expr(vec: str) -> str:
    """Packed sign sketch, Spark spelling only — the prefiltered
    operator's oracle is deliberately the all-pairs form, so no DuckDB
    twin of this expression exists (r6-round-before-sign keeps the bit
    decisions portable, the discipline proven by ann_hamming_rerank)."""
    bits = []
    for h in range(EMBEDDING_SKETCH_BITS):
        vals = ", ".join(f"{v:.1f}" for v in _DEDUP_SKETCH_PLANES[h])
        proj = (
            f"aggregate(zip_with({vec}, array({vals}),"
            " (x, y) -> CAST(x AS DOUBLE) * y), 0D, (acc, x) -> acc + x)"
        )
        rounded = f"FLOOR(({proj}) * 1000000.0 + 0.5) / CAST(1000000.0 AS DOUBLE)"
        bits.append(f"(CASE WHEN {rounded} > 0 THEN {1 << h} ELSE 0 END)")
    return "CAST((" + " + ".join(bits) + ") AS BIGINT)"


def hamming_cutoff(threshold: float, bits: int = EMBEDDING_SKETCH_BITS) -> int:
    """Hamming cutoff for a cosine threshold, at the 4σ recall level.

    For sign sketches, P(bit differs) = acos(τ)/π, so the Hamming distance
    of a qualifying pair is Binomial(bits, p); mean + 4σ bounds the
    per-pair drop probability at ~3e-5 — PROBABILISTIC, not exact: on a
    corpus with millions of qualifying pairs a few land past the cutoff,
    the accepted trade of every production sketch prefilter. On the test
    fixtures the margin is comfortable (qualifying-pair max Hamming 18/32
    at sf0.01, 19/32 at sf0.1 vs cutoff 23 for τ=0.4), which is what lets
    the differential pin against the exact all-pairs oracle hold there.
    Selectivity is threshold-driven: at the production near-dup regime
    (τ≥0.9) the cutoff tightens to ~13/32 and the prefilter rejects ~90%
    of random pairs before any float math.
    """
    import math

    p = math.acos(threshold) / math.pi
    return min(bits, math.ceil(bits * p + 4.0 * math.sqrt(bits * p * (1.0 - p))))




def embedding_cosine_dups_prefiltered(emb: DataFrame) -> DataFrame:
    """D5b: cosine near-dup with a popcount Hamming prefilter — the
    registry default / 100 TB path for D5.

    r09 engine: the pair loop runs through the vectorized block-pair
    kernel (``functions/blockpair`` — the same topology as the S16
    graph build): nodes hash into bounded blocks, candidates enumerate
    as balanced block-pair groups over an equi-join shuffle, and each
    group's popcount prefilter + survivor cosine folds run in one
    Arrow-batched numpy task. vs the previous single
    BroadcastNestedLoopJoin this removes the corpus broadcast (the BNLJ
    ships one ENTIRE side to every executor — a driver/executor memory
    wall long before 100 TB), bounds per-task memory by the block size,
    and replaces per-pair Catalyst folds with vectorized batches
    (measured 2.4× same-run at the 10× embeddings tier for the graph
    twin of this loop, BENCH_SCALE_PROBE.json ann10).

    Semantics are unchanged and still differentially checked against
    the ALL-PAIRS oracle (ORACLE_COSINE_DUPS — a different plan must
    produce identical rows): the kernel reproduces ``_DOT``'s strict
    left fold bit-for-bit, applies the same r6 snap, and the SAME
    :func:`hamming_cutoff` (binomial mean + 4σ, per-pair drop
    probability ~3e-5 — probabilistic) rejects pairs before any float
    fold. The sketch column still persists at ~1.5 % of the float
    footprint, so candidate enumeration reads almost nothing.
    """
    from ..functions.blockpair import pair_edges_blocked

    # vec_id IS NOT NULL mirrors the SQL form's semantics exactly: a
    # NULL id could never satisfy `a.vec_id < b.vec_id`, so it never
    # reached the output there either — here it must not reach the
    # kernel's int64 id arrays
    with scoped_temp_view(
        emb.where("embedding IS NOT NULL AND vec_id IS NOT NULL"),
        "_dedup_emb",
    ) as ev:
        nodes = emb.sparkSession.sql(
            """
SELECT vec_id,
       transform(embedding, x -> CASE WHEN {norm} = 0 THEN CAST(0.0 AS DOUBLE)
                                 ELSE CAST(x AS DOUBLE) / {norm} END) AS nv,
       {sketch} AS sketch
FROM {src}
""".format(
                norm=_NORM.format(v="embedding"),
                sketch=_dedup_sketch_expr("embedding"),
                src=ev,
            )
        )
    return (
        pair_edges_blocked(
            nodes,
            COSINE_DUP_THRESHOLD,
            hamming_cutoff(COSINE_DUP_THRESHOLD),
            mirror=False,
        )
        .selectExpr("src_id AS vec_a", "dst_id AS vec_b", "cosine")
        .orderBy("vec_a", "vec_b")
    )


# ==========================================================================
# D6 — repeated-passage coverage (exact substring duplication)
# ==========================================================================
#: rolling-window length in tokens. Exact-substring dedup à la "Deduplicating
#: Training Data Makes Language Models Better" (Lee et al., 2022) detects
#: verbatim passages that survive document-level near-dup filters (boilerplate,
#: licenses, quoted chunks). Production uses ~50-token windows over a suffix
#: array; the Spark-native equivalent is rolling k-token window hashes — same
#: signal, expressed as one explode + one uniform-key shuffle.
PASSAGE_K = 5


# Rolling PASSAGE_K-token window per position (DuckDB oracle spelling:
# posexplode + (k-1) LEADs — the no-UDF k-gram builder, kept window-based
# on the oracle side as the differential twin of the Spark slice fold).
_PASSAGE_CONCAT_DUCK = "tok || " + " || ".join(
    f"' ' || lead(tok, {i}) OVER w" for i in range(1, PASSAGE_K)
)

# Spark: shuffle-free, same slice-fold trick as _SHINGLES_SPARK but
# KEEPING positions (coverage counts every complete window occurrence);
# the DuckDB twin below keeps the window-lead form as differential proof.
_PASSAGE_WINS_SPARK = f"""
SELECT doc_id, pos, phash FROM (
  SELECT doc_id,
         posexplode(
           CASE WHEN size(toks) >= {PASSAGE_K}
                THEN transform(sequence(1, size(toks) - {PASSAGE_K} + 1),
                               i -> md5(concat_ws(' ', slice(toks, i, {PASSAGE_K}))))
                ELSE CAST(array() AS ARRAY<STRING>)
           END) AS (pos, phash)
  FROM (SELECT doc_id, {_TOKENS_SPARK} AS toks FROM {{src}})
)
"""

_PASSAGE_WINS_DUCK = f"""
SELECT doc_id, pos, md5({_PASSAGE_CONCAT_DUCK}) AS phash FROM (
  SELECT doc_id,
         generate_subscripts({_TOKENS_DUCK}, 1) AS pos,
         unnest({_TOKENS_DUCK}) AS tok
  FROM {{src}}
)
WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
"""

# Shared tail: windows → duplicated-hash set → per-doc coverage. NULL
# window hashes (incomplete tail windows / short docs) are dropped the
# same way in both engines because md5(NULL) IS NULL.
_PASSAGE_TAIL = """
dup_hashes AS (
  SELECT phash FROM wins
  WHERE phash IS NOT NULL
  GROUP BY phash
  HAVING COUNT(DISTINCT doc_id) >= 2
),
per_doc AS (
  SELECT w.doc_id,
         COUNT(*) AS n_windows,
         COUNT(d.phash) AS n_dup_windows
  FROM wins w LEFT JOIN dup_hashes d ON d.phash = w.phash
  WHERE w.phash IS NOT NULL
  GROUP BY w.doc_id
)
SELECT doc_id, n_windows, n_dup_windows,
       FLOOR((CAST(n_dup_windows AS DOUBLE) / CAST(n_windows AS DOUBLE))
             * 10000.0 + 0.5) / CAST(10000.0 AS DOUBLE) AS dup_window_frac
FROM per_doc
ORDER BY doc_id
"""


def repeated_passage_coverage(docs: DataFrame) -> DataFrame:
    """D6: per-document fraction of rolling {k}-token windows whose exact
    content also appears in at least one OTHER document — the
    passage-level duplication signal used to cut verbatim boilerplate
    that document-level near-dup (D2-D4) cannot see.

    Scale shape: one posexplode pass builds position-keyed window hashes
    (persisted — the relation feeds both the duplicated-hash set and the
    coverage join, and Spark would otherwise inline-recompute it); the
    only wide exchanges are keyed on md5 hashes (uniform by construction,
    unskewable) and doc_id. Window text never shuffles — only 32-hex
    hashes. At 100 TB the dup-hash set is the small side and broadcasts.
    """.format(k=PASSAGE_K)
    spark = docs.sparkSession
    wins = materialized_passage_wins_df(docs)
    with scoped_temp_view(wins, "_dedup_passage_wins") as wv:
        return spark.sql(
            f"WITH wins AS (SELECT doc_id, pos, phash FROM {wv}),\n"
            + _PASSAGE_TAIL
        )


ORACLE_REPEATED_PASSAGES = (
    "WITH wins AS ("
    + _PASSAGE_WINS_DUCK.format(src="documents")
    + "),\n"
    + _PASSAGE_TAIL
)


# ==========================================================================
# D7 — cross-document duplicate-passage index
# ==========================================================================
#: The INDEX view of D6: one row per exact passage duplicated ACROSS
#: documents (doc count, occurrence count, the first two carrying docs) —
#: the actionable artifact for span-level scrubbing (Lee et al. 2022
#: remove the duplicated spans themselves, not whole documents).
_PASSAGE_INDEX_TAIL = """
dup AS (
  SELECT phash,
         COUNT(DISTINCT doc_id) AS n_docs,
         COUNT(*) AS n_occurrences,
         MIN(doc_id) AS first_doc
  FROM wins WHERE phash IS NOT NULL
  GROUP BY phash
  HAVING COUNT(DISTINCT doc_id) >= 2
),
second AS (
  SELECT w.phash, MIN(w.doc_id) AS second_doc
  FROM wins w JOIN dup d ON w.phash = d.phash AND w.doc_id > d.first_doc
  GROUP BY w.phash
)
SELECT d.phash, d.n_docs, d.n_occurrences, d.first_doc, s.second_doc
FROM dup d JOIN second s ON d.phash = s.phash
ORDER BY d.phash
"""


def duplicate_passage_index(docs: DataFrame) -> DataFrame:
    """D7: the cross-document duplicate-passage index — every exact
    {k}-token window appearing in ≥2 documents, with its document and
    occurrence counts plus the first two carrying doc_ids (the span a
    scrubbing pass would cut, and where to look first).

    Scale shape: rides D6's persisted position-keyed window-hash
    relation; both aggregations key on the md5 hash (uniform,
    unskewable) and only 32-hex hashes + ids move — passage text never
    shuffles.""".format(k=PASSAGE_K)
    spark = docs.sparkSession
    wins = materialized_passage_wins_df(docs)
    with scoped_temp_view(wins, "_dedup_passage_wins") as wv:
        return spark.sql(
            f"WITH wins AS (SELECT doc_id, pos, phash FROM {wv}),\n"
            + _PASSAGE_INDEX_TAIL
        )


ORACLE_PASSAGE_INDEX = (
    "WITH wins AS ("
    + _PASSAGE_WINS_DUCK.format(src="documents")
    + "),\n"
    + _PASSAGE_INDEX_TAIL
)


ORACLE_SQL_DEDUP = {
    "dedup_exact": ORACLE_DEDUP_EXACT,
    "dedup_ngram_jaccard": ORACLE_NGRAM_JACCARD,
    "dedup_ngram_jaccard_capped": ORACLE_NGRAM_JACCARD_CAPPED,
    "dedup_containment": ORACLE_CONTAINMENT,
    "dedup_threshold_sweep": ORACLE_THRESHOLD_SWEEP,
    "dedup_minhash_lsh": ORACLE_MINHASH,
    "dedup_minhash_eval": ORACLE_MINHASH_EVAL,
    "dedup_simhash": ORACLE_SIMHASH,
    "dedup_embedding_cosine": ORACLE_COSINE_DUPS,
    # the prefiltered scale path must reproduce the ALL-PAIRS result —
    # deliberately the same oracle, so the differential check proves the
    # prefilter loses nothing on the tested fixtures (the cutoff's 4σ
    # margin holds there), not merely self-consistent
    "dedup_embedding_cosine_prefiltered": ORACLE_COSINE_DUPS,
    "dedup_repeated_passages": ORACLE_REPEATED_PASSAGES,
    "dedup_passage_index": ORACLE_PASSAGE_INDEX,
}
