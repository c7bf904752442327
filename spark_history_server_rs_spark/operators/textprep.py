"""Text-analysis operators over the ``documents`` table — the text half of
the large-scale training-data pipeline surface (language ID, quality
scoring, token counting, winnowing fingerprints).

These go beyond the reference (which has no text ops); they are first-class
catalog entries with DuckDB oracle twins, designed Spark-first:

- tokenization/statistics are single-projection, whole-stage-codegen
  expressions over the scan — zero shuffles;
- fingerprinting is explode → window(lead/min) → re-aggregate, one shuffle
  on ``doc_id`` (the natural partitioning key for a 100 TB corpus);
- no Python UDFs anywhere — everything is built-in higher-order functions
  (``filter``/``transform``/``aggregate`` lambdas run JVM-side).

Shared-semantics rule: every constant (stopword lists, weights, window
sizes) lives here once and is formatted into both the Spark plan and the
DuckDB oracle SQL, so the two engines cannot drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.views import scoped_temp_view

# --- shared constants (single source of truth for Spark AND oracle) -------
#: language marker vocabularies for the n-gram/stopword language-ID
#: heuristic. Real-world stopword lists; precedence en>es>de>fr>zh on ties.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "is", "in", "it"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es"),
    "de": ("der", "die", "und", "ist", "das", "ein", "zu", "den"),
    "fr": ("le", "la", "de", "et", "un", "est", "les", "des"),
    "zh": ("de", "shi", "le", "zai", "you", "wo", "ta", "men"),
}
LANG_ORDER = ("en", "es", "de", "fr", "zh")

#: English stopwords for the quality score's stopword-ratio component.
QUALITY_STOPWORDS = ("the", "a", "of", "and", "to", "is", "in", "it", "for", "on")

#: BPE-ish token pattern: alpha runs, digit runs, single other symbols.
BPEISH_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"

#: winnowing parameters: k-word shingles, window of w consecutive hashes.
FP_SHINGLE_K = 3
FP_WINDOW = 4

# --- engine-shared SQL fragments ------------------------------------------
_TOKENS_SPARK = "filter(split(text, ' '), x -> x <> '')"
_TOKENS_DUCK = "list_filter(string_split(text, ' '), x -> x <> '')"


def _in_list(words: tuple[str, ...]) -> str:
    return ", ".join(f"'{w}'" for w in words)


# ==========================================================================
# T1 — token statistics
# ==========================================================================
def token_stats(docs: DataFrame) -> DataFrame:
    """T1: per-document token counts — whitespace tokens, distinct tokens,
    BPE-ish regex tokens, exact average token length. Pure projection
    (no shuffle; scales linearly with corpus size)."""
    return docs.selectExpr(
        "doc_id",
        "length(text) AS n_chars_measured",
        f"size({_TOKENS_SPARK}) AS n_tokens",
        f"size(array_distinct({_TOKENS_SPARK})) AS n_distinct_tokens",
        f"size(regexp_extract_all(text, '{BPEISH_PATTERN}', 0)) AS n_bpeish_tokens",
        # NULLIF: an empty document has no tokens — avg length is NULL,
        # not a divide-by-zero (ANSI mode errors on 0-division)
        f"""FLOOR((CAST(aggregate(transform({_TOKENS_SPARK}, x -> length(x)), 0,
            (a, x) -> a + x) AS DOUBLE) / NULLIF(size({_TOKENS_SPARK}), 0)) * 10000.0 + 0.5)
         / CAST(10000.0 AS DOUBLE) AS avg_token_len""",
    ).orderBy("doc_id")


ORACLE_TOKEN_STATS = f"""
SELECT doc_id,
       length(text) AS n_chars_measured,
       len({_TOKENS_DUCK}) AS n_tokens,
       len(list_distinct({_TOKENS_DUCK})) AS n_distinct_tokens,
       len(regexp_extract_all(text, '{BPEISH_PATTERN}')) AS n_bpeish_tokens,
       FLOOR((CAST(COALESCE(list_sum(list_transform({_TOKENS_DUCK}, x -> length(x))), 0) AS DOUBLE)
              / NULLIF(len({_TOKENS_DUCK}), 0)) * 10000.0 + 0.5) / CAST(10000.0 AS DOUBLE) AS avg_token_len
FROM documents
ORDER BY doc_id
"""


# ==========================================================================
# T2 — language identification (marker-vocabulary heuristic)
# ==========================================================================
def language_id(docs: DataFrame) -> DataFrame:
    """T2: stopword/marker-hit language ID. One hit-count per language
    (JVM-side lambda filters — no explode, no shuffle), argmax with the
    fixed precedence ``LANG_ORDER``; 'und' when nothing matches."""
    hit_cols = [
        f"size(filter({_TOKENS_SPARK}, x -> x IN ({_in_list(ws)}))) AS {lang}_hits"
        for lang, ws in LANG_MARKERS.items()
    ]
    pred = _argmax_case("Spark")
    return (
        docs.selectExpr("doc_id", "lang AS actual_lang", *hit_cols)
        .selectExpr(
            "doc_id",
            "actual_lang",
            *[f"{lang}_hits" for lang in LANG_MARKERS],
            f"{pred} AS predicted_lang",
        )
        .selectExpr(
            "*",
            "(predicted_lang = actual_lang) AS is_correct",
        )
        .orderBy("doc_id")
    )


def _argmax_case(_engine: str) -> str:
    """CASE ladder picking the max-hit language with LANG_ORDER precedence
    (identical SQL text in both engines)."""
    branches = []
    for lang in LANG_ORDER:
        others = [o for o in LANG_ORDER if o != lang]
        cond = " AND ".join(f"{lang}_hits >= {o}_hits" for o in others)
        branches.append(f"WHEN {lang}_hits > 0 AND {cond} THEN '{lang}'")
    return "CASE " + " ".join(branches) + " ELSE 'und' END"


def _oracle_language_id() -> str:
    hit_cols = ",\n       ".join(
        f"len(list_filter({_TOKENS_DUCK}, x -> x IN ({_in_list(ws)}))) AS {lang}_hits"
        for lang, ws in LANG_MARKERS.items()
    )
    return f"""
WITH hits AS (
  SELECT doc_id, lang AS actual_lang,
       {hit_cols}
  FROM documents
)
SELECT doc_id, actual_lang, {", ".join(f"{lang}_hits" for lang in LANG_MARKERS)},
       {_argmax_case("duck")} AS predicted_lang,
       ({_argmax_case("duck")} = actual_lang) AS is_correct
FROM hits
ORDER BY doc_id
"""


ORACLE_LANGUAGE_ID = _oracle_language_id()


# ==========================================================================
# T3 — quality scoring
# ==========================================================================
#: score = 0.35*len_score + 0.35*diversity + 0.15*(1-punct) + 0.15*stop5.
#: Every division goes through CAST(.. AS DOUBLE): DuckDB would otherwise
#: run int/decimal arithmetic in exact DECIMAL (Spark uses doubles) and the
#: two engines disagree in the 4th decimal at rounding boundaries.
#: zero-token docs score diversity 0 (no tokens, no lexical variety) —
#: guarded because Spark's ANSI mode throws DIVIDE_BY_ZERO on the raw
#: division (adversarial property corpora hit this; sf tables don't).
_QUALITY_EXPR = """
FLOOR((0.35 * LEAST(CAST(1.0 AS DOUBLE), CAST(n_tokens AS DOUBLE) / 60.0)
     + 0.35 * (CASE WHEN n_tokens = 0 THEN CAST(0.0 AS DOUBLE)
               ELSE CAST(n_distinct_tokens AS DOUBLE) / n_tokens END)
     + 0.15 * (1.0 - punct_ratio)
     + 0.15 * LEAST(CAST(1.0 AS DOUBLE), stop_ratio * 5.0)) * 10000.0 + 0.5) / CAST(10000.0 AS DOUBLE)
"""


def text_quality(docs: DataFrame) -> DataFrame:
    """T3: composite quality score from length, lexical diversity,
    punctuation ratio, and stopword ratio; High/Medium/Low bucket computed
    on the rounded score so both engines branch identically."""
    stop = _in_list(QUALITY_STOPWORDS)
    base = docs.selectExpr(
        "doc_id",
        "length(text) AS n_chars_measured",
        f"size({_TOKENS_SPARK}) AS n_tokens",
        f"size(array_distinct({_TOKENS_SPARK})) AS n_distinct_tokens",
        f"size(filter({_TOKENS_SPARK}, x -> x IN ({stop}))) AS stop_hits",
        "CASE WHEN length(text) = 0 THEN CAST(0.0 AS DOUBLE) ELSE "
        "FLOOR((CAST(length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '')) AS DOUBLE)"
        " / length(text)) * 10000.0 + 0.5) / CAST(10000.0 AS DOUBLE) END AS punct_ratio",
    ).selectExpr(
        "*",
        "CASE WHEN n_tokens = 0 THEN CAST(0.0 AS DOUBLE) ELSE "
        "FLOOR((CAST(stop_hits AS DOUBLE) / n_tokens) * 10000.0 + 0.5) / CAST(10000.0 AS DOUBLE) END AS stop_ratio",
    )
    return (
        base.selectExpr("*", f"{_QUALITY_EXPR} AS quality_score")
        .selectExpr(
            "*",
            "CASE WHEN quality_score >= 0.7 THEN 'High' "
            "WHEN quality_score >= 0.5 THEN 'Medium' ELSE 'Low' END AS quality_bucket",
        )
        .orderBy("doc_id")
    )


def _oracle_text_quality() -> str:
    stop = _in_list(QUALITY_STOPWORDS)
    return f"""
WITH base AS (
  SELECT doc_id,
         length(text) AS n_chars_measured,
         len({_TOKENS_DUCK}) AS n_tokens,
         len(list_distinct({_TOKENS_DUCK})) AS n_distinct_tokens,
         len(list_filter({_TOKENS_DUCK}, x -> x IN ({stop}))) AS stop_hits,
         CASE WHEN length(text) = 0 THEN CAST(0.0 AS DOUBLE) ELSE
         FLOOR((CAST(length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g')) AS DOUBLE)
                / length(text)) * 10000.0 + 0.5) / CAST(10000.0 AS DOUBLE) END AS punct_ratio
  FROM documents
),
ratio AS (
  SELECT *, CASE WHEN n_tokens = 0 THEN CAST(0.0 AS DOUBLE) ELSE
            FLOOR((CAST(stop_hits AS DOUBLE) / n_tokens) * 10000.0 + 0.5) / CAST(10000.0 AS DOUBLE) END AS stop_ratio
  FROM base
),
scored AS (
  SELECT *, {_QUALITY_EXPR} AS quality_score FROM ratio
)
SELECT *,
       CASE WHEN quality_score >= 0.7 THEN 'High'
            WHEN quality_score >= 0.5 THEN 'Medium' ELSE 'Low' END AS quality_bucket
FROM scored
ORDER BY doc_id
"""


ORACLE_TEXT_QUALITY = _oracle_text_quality()


# ==========================================================================
# T4 — winnowing document fingerprints
# ==========================================================================
def doc_fingerprints(docs: DataFrame) -> DataFrame:
    """T4: winnowing fingerprints — k-word shingles, md5-prefix hashes,
    minimum over each sliding window of ``FP_WINDOW`` hashes, distinct
    minima per document (the classic winnowing selection).

    Plan shape: the per-doc hash sequence AND the rolling-window minima
    are array folds inside one projection (slice() clamps at the tail,
    reproducing the truncated trailing windows of a ROWS BETWEEN frame),
    so the ONLY exchange is the final doc_id aggregation — the
    posexplode → window formulation (kept on the DuckDB oracle side as
    the differential twin) needed a per-doc ordering shuffle first.
    """
    with scoped_temp_view(docs, "_text_docs") as dv:
        return docs.sparkSession.sql(f"""
WITH hs AS (
  SELECT doc_id,
         CASE WHEN size(toks) >= {FP_SHINGLE_K}
              THEN transform(sequence(1, size(toks) - {FP_SHINGLE_K} + 1),
                             i -> substr(md5(concat_ws(' ',
                                    slice(toks, i, {FP_SHINGLE_K}))), 1, 8))
              ELSE CAST(array() AS ARRAY<STRING>) END AS hs
  FROM (SELECT doc_id, {_TOKENS_SPARK} AS toks FROM {dv})
),
fp AS (
  SELECT doc_id,
         explode(transform(sequence(1, size(hs)),
                           i -> array_min(slice(hs, i, {FP_WINDOW})))) AS fp
  FROM hs WHERE size(hs) > 0
)
SELECT doc_id,
       COUNT(*) AS n_windows,
       COUNT(DISTINCT fp) AS n_fingerprints,
       to_json(sort_array(collect_set(fp))) AS fingerprints
FROM fp GROUP BY doc_id ORDER BY doc_id
""")


ORACLE_DOC_FINGERPRINTS = f"""
WITH tok AS (
  SELECT doc_id,
         generate_subscripts({_TOKENS_DUCK}, 1) AS pos,
         unnest({_TOKENS_DUCK}) AS tok
  FROM documents
),
sh AS (
  SELECT doc_id, pos,
         tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w AS shingle
  FROM tok
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
hashed AS (
  SELECT doc_id, pos, substr(md5(shingle), 1, 8) AS h
  FROM sh WHERE shingle IS NOT NULL
),
fp AS (
  SELECT doc_id,
         MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND {FP_WINDOW - 1} FOLLOWING) AS fp
  FROM hashed
)
SELECT doc_id,
       COUNT(*) AS n_windows,
       COUNT(DISTINCT fp) AS n_fingerprints,
       to_json(list_sort(list(DISTINCT fp))) AS fingerprints
FROM fp
GROUP BY doc_id
ORDER BY doc_id
"""


# ==========================================================================
# T5 — repetition signals (Gopher-style quality filters)
# ==========================================================================
#: round-to-4-decimals snap applied to every fraction (both engines branch
#: and hash on the snapped value, so float noise cannot flip a bucket).
_R4 = "FLOOR(({x}) * 10000.0 + 0.5) / CAST(10000.0 AS DOUBLE)"


def repetition_signals(docs: DataFrame) -> DataFrame:
    """T5: per-document repetition signals — duplicate-token fraction,
    duplicate-bigram fraction, and top-bigram coverage (the strongest of
    the Gopher repetition filters for catching boilerplate/spam).

    Pure projection: bigrams and their mode are computed with JVM
    higher-order lambdas inside one whole-stage-codegen projection — no
    explode, no shuffle, linear in corpus size. The per-doc mode scan is
    O(distinct·total) on arrays bounded by document length, which is the
    right trade at 100 TB: it keeps the operator shuffle-free where an
    explode+groupBy would shuffle every bigram occurrence.
    """
    toks = _TOKENS_SPARK
    # adjacent-pair bigrams via two slices zipped; guarded so 0/1-token
    # documents yield an empty array (slice length must be >= 0)
    bigrams = (
        f"CASE WHEN size({toks}) >= 2 THEN "
        f"zip_with(slice({toks}, 1, size({toks}) - 1), "
        f"slice({toks}, 2, size({toks}) - 1), (a, b) -> concat(a, ' ', b)) "
        "ELSE array() END"
    )
    top_count = (
        "COALESCE(array_max(transform(array_distinct(bgs), "
        "b -> size(filter(bgs, x -> x = b)))), 0)"
    )
    return (
        docs.selectExpr("doc_id", f"{toks} AS toks", f"{bigrams} AS bgs")
        .selectExpr(
            "doc_id",
            "size(toks) AS n_tokens",
            "size(array_distinct(toks)) AS n_distinct_tokens",
            "size(bgs) AS n_bigrams",
            "size(array_distinct(bgs)) AS n_distinct_bigrams",
            f"{top_count} AS top_bigram_count",
        )
        .selectExpr(
            "doc_id",
            "n_tokens",
            "n_distinct_tokens",
            "CASE WHEN n_tokens = 0 THEN CAST(0.0 AS DOUBLE) ELSE "
            + _R4.format(x="1.0 - CAST(n_distinct_tokens AS DOUBLE) / n_tokens")
            + " END AS dup_token_frac",
            "n_bigrams",
            "n_distinct_bigrams",
            "CASE WHEN n_bigrams = 0 THEN CAST(0.0 AS DOUBLE) ELSE "
            + _R4.format(x="1.0 - CAST(n_distinct_bigrams AS DOUBLE) / n_bigrams")
            + " END AS dup_bigram_frac",
            "top_bigram_count",
            "CASE WHEN n_bigrams = 0 THEN CAST(0.0 AS DOUBLE) ELSE "
            + _R4.format(x="CAST(top_bigram_count AS DOUBLE) / n_bigrams")
            + " END AS top_bigram_frac",
        )
        .orderBy("doc_id")
    )


def _oracle_repetition_signals() -> str:
    toks = _TOKENS_DUCK
    bigrams = (
        f"CASE WHEN len({toks}) >= 2 THEN "
        f"list_transform(range(2, len({toks}) + 1), "
        f"i -> {toks}[i - 1] || ' ' || {toks}[i]) "
        "ELSE [] END"
    )
    top_count = (
        "COALESCE(list_max(list_transform(list_distinct(bgs), "
        "b -> len(list_filter(bgs, x -> x = b)))), 0)"
    )
    return f"""
WITH arr AS (
  SELECT doc_id, {toks} AS toks, {bigrams} AS bgs FROM documents
),
counted AS (
  SELECT doc_id,
         len(toks) AS n_tokens,
         len(list_distinct(toks)) AS n_distinct_tokens,
         len(bgs) AS n_bigrams,
         len(list_distinct(bgs)) AS n_distinct_bigrams,
         {top_count} AS top_bigram_count
  FROM arr
)
SELECT doc_id, n_tokens, n_distinct_tokens,
       CASE WHEN n_tokens = 0 THEN CAST(0.0 AS DOUBLE) ELSE
         {_R4.format(x="1.0 - CAST(n_distinct_tokens AS DOUBLE) / n_tokens")}
       END AS dup_token_frac,
       n_bigrams, n_distinct_bigrams,
       CASE WHEN n_bigrams = 0 THEN CAST(0.0 AS DOUBLE) ELSE
         {_R4.format(x="1.0 - CAST(n_distinct_bigrams AS DOUBLE) / n_bigrams")}
       END AS dup_bigram_frac,
       top_bigram_count,
       CASE WHEN n_bigrams = 0 THEN CAST(0.0 AS DOUBLE) ELSE
         {_R4.format(x="CAST(top_bigram_count AS DOUBLE) / n_bigrams")}
       END AS top_bigram_frac
FROM counted
ORDER BY doc_id
"""


ORACLE_REPETITION_SIGNALS = _oracle_repetition_signals()


# ==========================================================================
# T6 — quality classifier (linear model scoring, fastText-style)
# ==========================================================================
#: Fixed logistic-regression weights over the T3 feature set — the
#: "quality classifier at scale" pattern (CCNet / Gopher / fastText
#: keep-drop filters): a linear model whose features are cheap column
#: expressions, scored corpus-wide with zero shuffles. Weights live here
#: once and are formatted into BOTH engines' SQL.
QC_BIAS = -1.5
QC_W_LEN = 2.0  # saturating length score
QC_W_DIVERSITY = 2.5  # lexical diversity
QC_W_PUNCT = -6.0  # punctuation density penalty
QC_W_STOP = 1.2  # stopword-presence (English-likeness)
QC_KEEP_THRESHOLD = 0.5

_R6 = "FLOOR(({x}) * 1000000.0 + 0.5) / CAST(1000000.0 AS DOUBLE)"

#: logit over r4-snapped features; the logit itself is r6-snapped BEFORE
#: the sigmoid so both engines exponentiate bit-identical inputs.
_QC_LOGIT = _R6.format(
    x=f"CAST({QC_BIAS} AS DOUBLE) + {QC_W_LEN} * len_score"
    f" + {QC_W_DIVERSITY} * diversity + {QC_W_PUNCT} * punct_ratio"
    f" + {QC_W_STOP} * stop5"
)

def _qc_scored_ctes(extra: str = "") -> str:
    """feats → scored CTEs over a ``base`` relation; ``extra`` passes
    additional base columns (e.g. ``source,``) through to ``scored``."""
    return f"""
feats AS (
  SELECT {extra} doc_id, n_tokens,
         {_R4.format(x="LEAST(CAST(1.0 AS DOUBLE), CAST(n_tokens AS DOUBLE) / 60.0)")} AS len_score,
         CASE WHEN n_tokens = 0 THEN CAST(0.0 AS DOUBLE)
              ELSE {_R4.format(x="CAST(n_distinct_tokens AS DOUBLE) / n_tokens")} END AS diversity,
         punct_ratio,
         CASE WHEN n_tokens = 0 THEN CAST(0.0 AS DOUBLE)
              ELSE {_R4.format(x="LEAST(CAST(1.0 AS DOUBLE), (CAST(stop_hits AS DOUBLE) / n_tokens) * 5.0)")} END AS stop5
  FROM base
),
scored AS (
  SELECT *, {_QC_LOGIT} AS logit FROM feats
)"""


_QC_TAIL = _qc_scored_ctes() + f"""
SELECT doc_id, n_tokens, len_score, diversity, punct_ratio, stop5, logit,
       {_R6.format(x="1.0 / (1.0 + exp(-logit))")} AS keep_prob,
       ({_R6.format(x="1.0 / (1.0 + exp(-logit))")} >= {QC_KEEP_THRESHOLD}) AS keep
FROM scored
ORDER BY doc_id
"""


def quality_classifier(docs: DataFrame) -> DataFrame:
    """T6: logistic-regression quality filter — fixed public-style weights
    over the T3 feature set (saturating length, lexical diversity,
    punctuation density, stopword presence), sigmoid score, keep flag at
    p >= {thr}. The fastText/CCNet-style keep-drop classifier, expressed
    as pure column arithmetic.

    Scale shape: a single projection over the scan — no shuffle, no
    Python worker, whole-stage codegen end to end; model scoring cost is
    O(corpus) map work, embarrassingly parallel. Snapped-feature logits
    keep the sigmoid branch decisions identical across engines.""".format(
        thr=QC_KEEP_THRESHOLD
    )
    with scoped_temp_view(docs, "_text_docs") as dv:
        return docs.sparkSession.sql(
            "WITH " + _qc_base_spark(dv) + "," + _QC_TAIL
        )


def _qc_base_spark(src: str, extra: str = "") -> str:
    stop = _in_list(QUALITY_STOPWORDS)
    return f"""
base AS (
  SELECT {extra} doc_id,
         size({_TOKENS_SPARK}) AS n_tokens,
         size(array_distinct({_TOKENS_SPARK})) AS n_distinct_tokens,
         size(filter({_TOKENS_SPARK}, x -> x IN ({stop}))) AS stop_hits,
         CASE WHEN length(text) = 0 THEN CAST(0.0 AS DOUBLE)
              ELSE {_R4.format(x=("CAST(length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '')) AS DOUBLE)"
                        " / length(text)"))} END AS punct_ratio
  FROM {src}
)"""


def _qc_base_duck(extra: str = "") -> str:
    stop = _in_list(QUALITY_STOPWORDS)
    return f"""
base AS (
  SELECT {extra} doc_id,
         len({_TOKENS_DUCK}) AS n_tokens,
         len(list_distinct({_TOKENS_DUCK})) AS n_distinct_tokens,
         len(list_filter({_TOKENS_DUCK}, x -> x IN ({stop}))) AS stop_hits,
         CASE WHEN length(text) = 0 THEN CAST(0.0 AS DOUBLE)
              ELSE {_R4.format(x=("CAST(length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g')) AS DOUBLE)"
                        " / length(text)"))} END AS punct_ratio
  FROM documents
)"""


ORACLE_QUALITY_CLASSIFIER = "WITH " + _qc_base_duck() + "," + _QC_TAIL


# ==========================================================================
# T8b — per-source quality pruning (top-q% selection by model score)
# ==========================================================================
#: The FineWeb/DCLM-style selection step: after scoring, each SOURCE
#: keeps its top fraction of documents by classifier probability — a
#: per-domain quota (unlike T6's global threshold) so a clean domain
#: cannot crowd a noisy-but-needed one out of the mix entirely. Exact
#: per-source ranking (deterministic, oracle-twinned); the 100 TB
#: variant that avoids the per-source sort computes an approximate
#: score threshold per source (percentile sketch) and filters — same
#: selection, two scans, no window.
PRUNE_KEEP_FRAC = 0.5

_PRUNE_TAIL = f"""
prob AS (
  SELECT doc_id, source,
         {_R6.format(x="1.0 / (1.0 + exp(-logit))")} AS keep_prob
  FROM scored
),
counts AS (SELECT source, COUNT(*) AS n_src FROM prob GROUP BY source),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                               ORDER BY keep_prob DESC, doc_id) AS src_rank
  FROM prob
)
SELECT r.doc_id, r.source, r.keep_prob,
       CAST(r.src_rank AS BIGINT) AS src_rank,
       CAST(c.n_src AS BIGINT) AS n_source_docs,
       (r.src_rank <= FLOOR(c.n_src * {PRUNE_KEEP_FRAC} + 0.5)) AS keep
FROM ranked r JOIN counts c ON r.source IS NOT DISTINCT FROM c.source
ORDER BY r.doc_id
"""


def quality_prune(docs: DataFrame) -> DataFrame:
    """T8b: per-source top-{q}% selection by T6's classifier score —
    every doc ranked within its source by keep probability (ties break
    on doc_id), keep = rank within the source's quota.

    Scale shape: one scoring projection (zero-shuffle), a per-source
    count, and a rank window PARTITIONED by source (never global). A
    NULL source is a real group (IS NOT DISTINCT FROM join).""".format(
        q=int(PRUNE_KEEP_FRAC * 100)
    )
    with scoped_temp_view(docs, "_text_docs") as v:
        return docs.sparkSession.sql(
            "WITH "
            + _qc_base_spark(v, extra="source,")
            + ","
            + _qc_scored_ctes(extra="source,")
            + ","
            + _PRUNE_TAIL
        )


ORACLE_QUALITY_PRUNE = (
    "WITH "
    + _qc_base_duck(extra="source,")
    + ","
    + _qc_scored_ctes(extra="source,")
    + ","
    + _PRUNE_TAIL
)


# ==========================================================================
# T7 — Gopher quality rules (rule-based document filter report)
# ==========================================================================
#: Public Gopher thresholds (Rae et al. 2021, arXiv:2112.11446, A1.1):
#: word-count bounds, mean-word-length band, symbol-to-word ratio cap,
#: bullet/ellipsis line caps, alphabetic-word floor, stopword floor,
#: duplicate-line cap. MIN_WORDS lowered from Gopher's 50 to fit the
#: synthetic corpus scale (the constant is the knob, the rule shape is
#: the operator).
GOPHER_MIN_WORDS = 20
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MAX_BULLET_FRAC = 0.9
GOPHER_MAX_ELLIPSIS_FRAC = 0.3
GOPHER_MIN_ALPHA_FRAC = 0.8
GOPHER_REQUIRED_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")
GOPHER_MIN_STOP_HITS = 2
GOPHER_MAX_DUP_LINE_FRAC = 0.3

#: engine-shared line split (docs are LF-delimited; a no-newline doc is
#: one line; blank lines dropped).
_LINES_SPARK = "filter(transform(split(text, '\\n'), l -> trim(l)), l -> l <> '')"
_LINES_DUCK = (
    "list_filter(list_transform(string_split(text, chr(10)), l -> trim(l)),"
    " l -> l <> '')"
)


def _gopher_tail(
    sz: str,
    sum_word_lens: str,
    n_alpha_words: str,
    stop_hits: str,
    n_bullet_lines: str,
    n_ellipsis_lines: str,
    n_distinct_lines: str,
) -> str:
    """Engine-shared Gopher-rule SQL over an ``arr`` CTE carrying
    (doc_id, text, toks, lines). The per-engine lambda spellings arrive
    as complete expressions; thresholds come from the module constants,
    so both engines branch on identical snapped values."""
    return f"""
feats AS (
  SELECT doc_id,
         {sz}(toks) AS n_words,
         CASE WHEN {sz}(toks) = 0 THEN CAST(0.0 AS DOUBLE)
              ELSE {_R4.format(x=f"CAST({sum_word_lens} AS DOUBLE) / {sz}(toks)")}
         END AS mean_word_len,
         CASE WHEN {sz}(toks) = 0 THEN CAST(0.0 AS DOUBLE)
              ELSE {_R4.format(x=(
                  "CAST((length(text) - length(replace(text, '#', '')))"
                  " + (length(text) - length(replace(text, '...', ''))) / 3"
                  f" AS DOUBLE) / {sz}(toks)"))}
         END AS symbol_word_ratio,
         CASE WHEN {sz}(toks) = 0 THEN CAST(0.0 AS DOUBLE)
              ELSE {_R4.format(x=f"CAST({n_alpha_words} AS DOUBLE) / {sz}(toks)")}
         END AS alpha_word_frac,
         {stop_hits} AS stop_hits,
         CASE WHEN {sz}(lines) = 0 THEN CAST(0.0 AS DOUBLE)
              ELSE {_R4.format(x=f"CAST({n_bullet_lines} AS DOUBLE) / {sz}(lines)")}
         END AS bullet_line_frac,
         CASE WHEN {sz}(lines) = 0 THEN CAST(0.0 AS DOUBLE)
              ELSE {_R4.format(x=f"CAST({n_ellipsis_lines} AS DOUBLE) / {sz}(lines)")}
         END AS ellipsis_line_frac,
         CASE WHEN {sz}(lines) = 0 THEN CAST(0.0 AS DOUBLE)
              ELSE {_R4.format(x=f"1.0 - CAST({n_distinct_lines} AS DOUBLE) / {sz}(lines)")}
         END AS dup_line_frac
  FROM arr
)
SELECT doc_id, n_words, mean_word_len, symbol_word_ratio, alpha_word_frac,
       stop_hits, bullet_line_frac, ellipsis_line_frac, dup_line_frac,
       (n_words >= {GOPHER_MIN_WORDS} AND n_words <= {GOPHER_MAX_WORDS}
        AND mean_word_len >= {GOPHER_MIN_MEAN_WORD_LEN}
        AND mean_word_len <= {GOPHER_MAX_MEAN_WORD_LEN}
        AND symbol_word_ratio <= {GOPHER_MAX_SYMBOL_RATIO}
        AND alpha_word_frac >= {GOPHER_MIN_ALPHA_FRAC}
        AND stop_hits >= {GOPHER_MIN_STOP_HITS}
        AND bullet_line_frac <= {GOPHER_MAX_BULLET_FRAC}
        AND ellipsis_line_frac <= {GOPHER_MAX_ELLIPSIS_FRAC}
        AND dup_line_frac <= {GOPHER_MAX_DUP_LINE_FRAC}) AS keep
FROM feats
ORDER BY doc_id
"""


#: bullet glyphs (Gopher: lines starting with a bullet) — kept ASCII plus
#: the unicode bullet, shared verbatim by both engines.
_BULLETS = "('-', '*', '•')"


def gopher_spark_sql(view: str, ordered: bool = True) -> str:
    """The Spark-side Gopher SQL over ``view`` — shared by the batch
    operator and the streaming ingest gate (which must drop the ORDER BY:
    sorting is illegal in a streaming projection, and pointless there)."""
    stops = _in_list(GOPHER_REQUIRED_STOPS)
    tail = _gopher_tail(
        sz="size",
        sum_word_lens="aggregate(toks, 0, (a, t) -> a + length(t))",
        n_alpha_words="size(filter(toks, x -> x rlike '[a-z]'))",
        stop_hits=f"size(filter(array({stops}), w -> array_contains(toks, w)))",
        n_bullet_lines=f"size(filter(lines, l -> left(l, 1) IN {_BULLETS}))",
        n_ellipsis_lines=(
            "size(filter(lines, l -> right(l, 3) = '...'"
            " OR right(l, 1) = '…'))"
        ),
        n_distinct_lines="size(array_distinct(lines))",
    )
    if not ordered:
        tail = tail.replace("ORDER BY doc_id", "")
    return (
        "WITH arr AS (SELECT doc_id, text, "
        f"{_TOKENS_SPARK} AS toks, {_LINES_SPARK} AS lines FROM {view}),"
        + tail
    )


def gopher_rules(docs: DataFrame) -> DataFrame:
    """T7: the Gopher rule-based document filter (Rae et al. 2021,
    arXiv:2112.11446 A1.1) — word-count band, mean word length band,
    symbol-to-word ratio, alphabetic-word floor, required-stopword
    floor, bullet/ellipsis line caps, duplicate-line cap, and the
    AND-fold keep flag.

    Scale shape: one whole-stage-codegen projection over the scan — all
    features are higher-order-function lambdas over the token/line
    arrays, zero shuffles, zero Python. The canonical pre-filter a
    100 TB crawl pipeline runs before any pairwise dedup.

    Served concurrently by the REST layer (/api/v1/corpus/quality):
    per-call scoped view, no fixed catalog names."""
    with scoped_temp_view(docs, "_text_docs") as v:
        return docs.sparkSession.sql(gopher_spark_sql(v))


def _oracle_gopher_rules() -> str:
    stops = _in_list(GOPHER_REQUIRED_STOPS)
    tail = _gopher_tail(
        sz="len",
        sum_word_lens="list_sum(list_transform(toks, t -> length(t)))",
        n_alpha_words="len(list_filter(toks, x -> regexp_matches(x, '[a-z]')))",
        stop_hits=f"len(list_filter([{stops}], w -> list_contains(toks, w)))",
        n_bullet_lines=f"len(list_filter(lines, l -> left(l, 1) IN {_BULLETS}))",
        n_ellipsis_lines=(
            "len(list_filter(lines, l -> right(l, 3) = '...'"
            " OR right(l, 1) = '…'))"
        ),
        n_distinct_lines="len(list_distinct(lines))",
    )
    return (
        "WITH arr AS (SELECT doc_id, text, "
        f"{_TOKENS_DUCK} AS toks, {_LINES_DUCK} AS lines FROM documents),"
        + tail
    )


ORACLE_GOPHER_RULES = _oracle_gopher_rules()


# ==========================================================================
# T8 — C4 line-level filters (Raffel et al. 2020, arXiv:1910.10683 §2.2)
# ==========================================================================
#: Public C4 heuristics: keep lines that end in terminal punctuation and
#: carry at least C4_MIN_LINE_WORDS words; drop pages with fewer than
#: C4_MIN_KEPT_LINES such lines, or containing "lorem ipsum" or a curly
#: brace (code). Word/line minimums lowered from C4's 5/3 to fit the
#: synthetic corpus scale — constants are the knob, rules are the shape.
C4_MIN_LINE_WORDS = 3
C4_MIN_KEPT_LINES = 1
C4_TERMINAL = "('.', '!', '?', '\"')"


def _c4_tail(sz: str, flt: str) -> str:
    """Engine-shared C4 SQL over an ``arr`` CTE carrying (doc_id, text,
    lines). ``sz``/``flt`` are the engine's list-size/filter spellings
    (lambda syntax is identical; only the function names differ)."""
    kept = (
        f"{flt}(lines, l -> right(l, 1) IN {C4_TERMINAL}"
        f" AND {sz}({flt}(split(l, ' '), w -> w <> '')) >= {C4_MIN_LINE_WORDS})"
    )
    return f"""
feats AS (
  SELECT doc_id,
         {sz}(lines) AS n_lines,
         {sz}({flt}(lines, l -> right(l, 1) IN {C4_TERMINAL})) AS n_terminal_lines,
         {sz}({kept}) AS n_kept_lines,
         contains(lower(text), 'lorem ipsum') AS has_lorem,
         contains(text, chr(123)) AS has_brace
  FROM arr
)
SELECT doc_id, n_lines, n_terminal_lines, n_kept_lines,
       CASE WHEN n_lines = 0 THEN CAST(0.0 AS DOUBLE)
            ELSE {_R4.format(x="CAST(n_kept_lines AS DOUBLE) / n_lines")}
       END AS kept_line_frac,
       has_lorem, has_brace,
       (n_kept_lines >= {C4_MIN_KEPT_LINES}
        AND NOT has_lorem AND NOT has_brace) AS keep
FROM feats
ORDER BY doc_id
"""


def c4_filters(docs: DataFrame) -> DataFrame:
    """T8: the C4 cleaning heuristics (Raffel et al. 2020,
    arXiv:1910.10683 §2.2) as a per-document report — line counts,
    terminal-punctuation line counts, kept-line count/fraction under the
    min-words rule, lorem-ipsum and curly-brace detectors, and the fold
    into C4's page-level keep decision.

    Scale shape: like T7 — one shuffle-free whole-stage-codegen
    projection; line logic is nested higher-order lambdas over the split
    arrays (JVM-side, no Python, no explode)."""
    tail = _c4_tail(sz="size", flt="filter")
    with scoped_temp_view(docs, "_text_docs") as dv:
        return docs.sparkSession.sql(
            "WITH arr AS (SELECT doc_id, text, "
            f"{_LINES_SPARK} AS lines FROM {dv}),"
            + tail
        )


def _oracle_c4_filters() -> str:
    tail = _c4_tail(sz="len", flt="list_filter").replace(
        "split(l, ' ')", "string_split(l, ' ')"
    )
    return (
        "WITH arr AS (SELECT doc_id, text, "
        f"{_LINES_DUCK} AS lines FROM documents),"
        + tail
    )


ORACLE_C4_FILTERS = _oracle_c4_filters()



# ==========================================================================
# T9 — cross-document line boilerplate (CCNet paragraph dedup signal)
# ==========================================================================
#: CCNet (Wenzek et al. 2020, arXiv:1911.00359 §3.1) deduplicates at
#: the PARAGRAPH level: a line whose hash appears in ≥2 distinct
#: documents is boilerplate (navigation chrome, license headers, cookie
#: banners) — the pre-filter that removes most crawl noise before any
#: document-level dedup. Per doc: line counts, boilerplate-line
#: fraction, and the keep flag at the fraction cap.
BOILER_MIN_DOCS = 2  # line shared by this many distinct docs = boilerplate
BOILER_MAX_FRAC = 0.3  # docs above this boilerplate fraction are dropped

_BOILER_TAIL = """
lhash AS (SELECT doc_id, md5(line) AS lh FROM ({lines})),
dfreq AS (
  SELECT lh, COUNT(DISTINCT doc_id) AS df FROM lhash GROUP BY lh
),
per_doc AS (
  SELECT l.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_lines,
         CAST(COALESCE(SUM(CASE WHEN f.df >= {mindocs} THEN 1 ELSE 0 END), 0)
              AS BIGINT) AS n_boiler_lines
  FROM lhash l JOIN dfreq f ON l.lh = f.lh
  GROUP BY l.doc_id
)
SELECT d.doc_id,
       COALESCE(p.n_lines, 0) AS n_lines,
       COALESCE(p.n_boiler_lines, 0) AS n_boiler_lines,
       CASE WHEN COALESCE(p.n_lines, 0) = 0 THEN CAST(0.0 AS DOUBLE)
            ELSE FLOOR((CAST(p.n_boiler_lines AS DOUBLE) / p.n_lines)
                       * 10000.0 + 0.5) / CAST(10000.0 AS DOUBLE)
       END AS boiler_frac,
       (CASE WHEN COALESCE(p.n_lines, 0) = 0 THEN CAST(0.0 AS DOUBLE)
             ELSE FLOOR((CAST(p.n_boiler_lines AS DOUBLE) / p.n_lines)
                        * 10000.0 + 0.5) / CAST(10000.0 AS DOUBLE)
        END <= {maxfrac}) AS keep
FROM {docsrc} d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
ORDER BY d.doc_id
"""


def line_boilerplate(docs: DataFrame) -> DataFrame:
    """T9: cross-document line-boilerplate report — every trimmed
    non-empty line hashed; lines shared by ≥{m} distinct docs flagged;
    per-doc boilerplate fraction and keep flag at ≤{f}.

    Scale shape: one line explode (projection), one md5-keyed distinct
    aggregate (uniform by construction), one hash join back — the same
    hash-keyed-only discipline as the passage index; document text
    never shuffles. Docs with no lines (empty/NULL text) keep with
    fraction 0.0 — line filtering is not an emptiness filter.""".format(
        m=BOILER_MIN_DOCS, f=BOILER_MAX_FRAC
    )
    with scoped_temp_view(docs, "_text_docs") as v:
        lines = (
            f"SELECT doc_id, explode({_LINES_SPARK}) AS line FROM {v}"
        )
        return docs.sparkSession.sql(
            "WITH "
            + _BOILER_TAIL.format(
                lines=lines,
                docsrc=v,
                mindocs=BOILER_MIN_DOCS,
                maxfrac=BOILER_MAX_FRAC,
            )
        )


ORACLE_LINE_BOILERPLATE = "WITH " + _BOILER_TAIL.format(
    lines=f"SELECT doc_id, unnest({_LINES_DUCK}) AS line FROM documents",
    docsrc="documents",
    mindocs=BOILER_MIN_DOCS,
    maxfrac=BOILER_MAX_FRAC,
)


# ==========================================================================
# T10 — encoding-artifact audit (per-source mojibake / control-char rates)
# ==========================================================================
#: Classic UTF-8-read-as-Latin-1/cp1252 double-encode markers. Heuristic
#: by design (a bare 'Ã' is rare in clean text because the legit letters
#: are precomposed); the audit reports rates, it does not drop docs.
ENC_MOJIBAKE_MARKERS = ("Ã", "â€", "Â")
#: Invisible chars that survive scraping and silently inflate token
#: counts: ZWSP, ZWNJ, ZWJ, BOM-as-ZWNBSP.
ENC_ZERO_WIDTH = ("​", "‌", "‍", "﻿")
#: C0 control codes except tab/newline/CR, plus DEL — decode-failure and
#: binary-contamination tells. chr(n) agrees across engines for n < 128.
ENC_CONTROL_CODES = tuple(
    c for c in range(32) if c not in (9, 10, 13)
) + (127,)


def _any_instr(needles: tuple[str, ...]) -> str:
    return " OR ".join(f"instr(text, '{n}') > 0" for n in needles)


_ENC_TAIL = """
flags AS (
  SELECT source,
         text IS NOT NULL AS has_text,
         ({repl}) AS f_repl,
         ({ctl}) AS f_ctl,
         ({moj}) AS f_moj,
         ({zw}) AS f_zw,
         CAST({octets} - length(text) AS BIGINT) AS mb_excess,
         CAST(length(text) AS BIGINT) AS n_chars_m
  FROM {src}
),
agg AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(CASE WHEN has_text THEN 1 ELSE 0 END) AS BIGINT)
           AS n_docs_text,
         CAST(SUM(CASE WHEN f_repl THEN 1 ELSE 0 END) AS BIGINT)
           AS n_replacement,
         CAST(SUM(CASE WHEN f_ctl THEN 1 ELSE 0 END) AS BIGINT)
           AS n_control,
         CAST(SUM(CASE WHEN f_moj THEN 1 ELSE 0 END) AS BIGINT)
           AS n_mojibake,
         CAST(SUM(CASE WHEN f_zw THEN 1 ELSE 0 END) AS BIGINT)
           AS n_zero_width,
         CAST(SUM(CASE WHEN f_repl OR f_ctl OR f_moj OR f_zw
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_any_artifact,
         CAST(COALESCE(SUM(mb_excess), 0) AS BIGINT) AS multibyte_excess,
         CAST(COALESCE(SUM(n_chars_m), 0) AS BIGINT) AS n_chars_total
  FROM flags GROUP BY source
)
SELECT source, n_docs, n_docs_text, n_replacement, n_control, n_mojibake,
       n_zero_width, n_any_artifact,
       CASE WHEN n_docs_text = 0 THEN CAST(0.0 AS DOUBLE)
            ELSE FLOOR(CAST(n_any_artifact AS DOUBLE) * 1000000.0
                       / n_docs_text + 0.5) / CAST(1000000.0 AS DOUBLE)
       END AS artifact_rate,
       multibyte_excess,
       CASE WHEN n_chars_total = 0 THEN CAST(0.0 AS DOUBLE)
            ELSE FLOOR(CAST(multibyte_excess AS DOUBLE) * 1000000.0
                       / n_chars_total + 0.5) / CAST(1000000.0 AS DOUBLE)
       END AS multibyte_ratio
FROM agg
ORDER BY source
"""


def _enc_probes() -> dict[str, str]:
    return {
        "repl": _any_instr(("�",)),
        "ctl": " OR ".join(
            f"instr(text, chr({c})) > 0" for c in ENC_CONTROL_CODES
        ),
        "moj": _any_instr(ENC_MOJIBAKE_MARKERS),
        "zw": _any_instr(ENC_ZERO_WIDTH),
    }


def _enc_tail(src: str, octets: str) -> str:
    return _ENC_TAIL.format(src=src, octets=octets, **_enc_probes())


def encoding_flags_spark_sql(view: str) -> str:
    """Per-document artifact flags as a pure projection (the T10 `flags`
    probes with doc_id kept) — the streaming-legal form consumed by
    :func:`..streaming.ingest.stream_encoding_monitor`; the batch
    aggregate and the stream share these expression strings verbatim."""
    p = _enc_probes()
    return (
        f"SELECT doc_id, source, text IS NOT NULL AS has_text,"
        f" ({p['repl']}) AS f_repl, ({p['ctl']}) AS f_ctl,"
        f" ({p['moj']}) AS f_moj, ({p['zw']}) AS f_zw,"
        f" CAST(octet_length(text) - length(text) AS BIGINT) AS mb_excess"
        f" FROM {view}"
    )


def encoding_artifacts(docs: DataFrame) -> DataFrame:
    """T10: per-source encoding-hygiene audit — document rates of U+FFFD
    replacement chars, stray C0/DEL control codes, cp1252-mojibake
    markers, zero-width chars, plus the multibyte-excess ratio
    (bytes − chars per char; a double-encoded source inflates it). The
    report that decides which crawl sources need re-decoding before
    they poison a tokenizer's vocabulary.

    Scale shape: one projection of fixed-string ``instr`` probes (no
    regex — engine and codegen friendly) folded by one source-keyed
    aggregate; output is #sources rows. NULL source is a real group
    (kept by GROUP BY in both engines); NULL-text docs count in
    ``n_docs`` but never in artifact numerators or denominators."""
    with scoped_temp_view(docs, "_text_docs") as v:
        return docs.sparkSession.sql(
            "WITH " + _enc_tail(src=v, octets="octet_length(text)")
        )


# ==========================================================================
# T11 — filter-agreement calibration (rule filter × classifier filter)
# ==========================================================================
_AGREE_TAIL = f"""
agree AS (
  SELECT s.doc_id,
         g.keep AS rule_keep,
         ({_R6.format(x="1.0 / (1.0 + exp(-logit))")} >= {QC_KEEP_THRESHOLD})
           AS clf_keep
  FROM scored s JOIN gq g ON s.doc_id = g.doc_id
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM agree)
SELECT rule_keep, clf_keep,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       FLOOR(COUNT(*) * 10000.0 / t.n + 0.5) / CAST(10000.0 AS DOUBLE)
         AS frac
FROM agree JOIN tot t ON 1 = 1
GROUP BY rule_keep, clf_keep, t.n
ORDER BY rule_keep, clf_keep
"""


def filter_agreement(docs: DataFrame) -> DataFrame:
    """T11: confusion table between the cheap rule filter (T7 Gopher
    keep) and the model filter (T6 classifier keep) — ≤4 cells with
    counts and corpus fractions. The calibration read a pipeline does
    before swapping rules for a model (or before trusting either): the
    disagreement cells are exactly the documents to audit, and a large
    rule-keep × model-drop cell is the classic sign of a
    threshold/feature drift.

    Scale shape: both inputs are shuffle-free projections over the same
    scan; the only exchanges are the doc_id equi-join of two per-doc
    flag relations and the final ≤4-cell fold. Output size is constant
    at any corpus scale."""
    with scoped_temp_view(docs, "_text_docs") as dv:
        return docs.sparkSession.sql(
            "WITH "
            + _qc_base_spark(dv)
            + ","
            + _qc_scored_ctes()
            + f", gq AS ({gopher_spark_sql(dv, ordered=False)}),"
            + _AGREE_TAIL
        )


ORACLE_FILTER_AGREEMENT = (
    "WITH "
    + _qc_base_duck()
    + ","
    + _qc_scored_ctes()
    + f", gq AS ({_oracle_gopher_rules()}),"
    + _AGREE_TAIL
)


ORACLE_ENCODING_ARTIFACTS = "WITH " + _enc_tail(
    src="documents", octets="octet_length(encode(text))"
)


ORACLE_SQL_TEXT = {
    "text_token_stats": ORACLE_TOKEN_STATS,
    "text_language_id": ORACLE_LANGUAGE_ID,
    "text_quality": ORACLE_TEXT_QUALITY,
    "text_fingerprints": ORACLE_DOC_FINGERPRINTS,
    "text_repetition": ORACLE_REPETITION_SIGNALS,
    "text_quality_classifier": ORACLE_QUALITY_CLASSIFIER,
    "text_gopher_rules": ORACLE_GOPHER_RULES,
    "text_c4_filters": ORACLE_C4_FILTERS,
    "text_line_boilerplate": ORACLE_LINE_BOILERPLATE,
    "text_quality_prune": ORACLE_QUALITY_PRUNE,
    "text_encoding_artifacts": ORACLE_ENCODING_ARTIFACTS,
    "text_filter_agreement": ORACLE_FILTER_AGREEMENT,
}
