"""Property-based differential testing (hypothesis): random event tables →
run the same queries on Spark and DuckDB → exact multiset equality.

This goes beyond the reference's test strategy (SURVEY.md §5 notes it has
no property-based/differential testing) and beyond the fixed seed-42
tables: hypothesis explores degenerate shapes — empty tables, single rows,
all-one-app, duplicate timestamps, boundary metric values — where
cross-engine semantics (NULL aggregation, rounding, tie-breaks) most
often diverge."""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from spark_history_server_rs_spark.operators import catalog
from spark_history_server_rs_spark.sources.generic import load_events
from spark_history_server_rs_spark.testing import compare, open_oracle

EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]

# one shared tmp dir per test run; each example overwrites the parquet
_DIRS: dict = {}


@st.composite
def event_rows(draw):
    n = draw(st.integers(min_value=0, max_value=60))
    rows = []
    for i in range(n):
        rows.append(
            {
                "event_id": i,
                # microsecond timestamps across a few days incl. duplicates
                "ts": 1704067200_000_000
                + draw(st.integers(0, 3 * 86400)) * 1_000_000,
                "user_id": draw(st.integers(0, 5)),
                "event_type": draw(st.sampled_from(EVENT_TYPES)),
                "value": draw(
                    st.floats(
                        min_value=0.0,
                        max_value=1000.0,
                        allow_nan=False,
                        allow_infinity=False,
                    )
                ),
                # k is integer-valued per the testdata determinism contract
                # (sources/generic.py): derived metrics like gc_ms = k*10
                # stay integer-valued doubles, so cross-row SUMs are exact
                # and aggregation order can't flip bits in either engine
                "props": json.dumps({"k": float(draw(st.integers(0, 100)))}),
            }
        )
    return rows


def _write_events(tmpdir: str, rows: list[dict]) -> None:
    table = pa.table(
        {
            "event_id": pa.array([r["event_id"] for r in rows], pa.int64()),
            "ts": pa.array([r["ts"] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r["user_id"] for r in rows], pa.int64()),
            "event_type": pa.array([r["event_type"] for r in rows], pa.string()),
            "value": pa.array([r["value"] for r in rows], pa.float64()),
            "props": pa.array([r["props"] for r in rows], pa.string()),
        }
    )
    pq.write_table(table, f"{tmpdir}/events.parquet")


CHECKED_QUERIES = [
    catalog.applications,
    catalog.cross_app_summary,
    catalog.task_distribution,
    catalog.performance_trends,
]


@pytest.fixture(scope="module")
def prop_dir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("prop-events"))


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=event_rows())
def test_random_events_match_oracle(rows, spark, prop_dir):
    import duckdb

    _write_events(prop_dir, rows)
    ev = load_events(spark, prop_dir)
    con = duckdb.connect()
    con.execute(
        f"CREATE OR REPLACE VIEW events AS "
        f"SELECT * FROM read_parquet('{prop_dir}/events.parquet')"
    )
    import __spark_entry__ as entrymod

    oracles = entrymod.oracle_sql()
    for fn, name in [
        (catalog.applications, "applications"),
        (catalog.cross_app_summary, "cross_app_summary"),
        (catalog.task_distribution, "task_distribution"),
        (catalog.performance_trends, "performance_trends"),
        (catalog.job_metrics, "job_metrics"),
        (catalog.gc_time_trends, "gc_time_trends"),
        (catalog.executor_summary, "executor_summary"),
        (catalog.resource_usage_summary, "resource_usage_summary"),
        (catalog.efficiency_analysis, "efficiency_analysis"),
        (catalog.top_resource_consumers, "top_resource_consumers"),
        (catalog.capacity_trends, "capacity_trends"),
    ]:
        ok, report = compare(fn(ev), con, oracles[name])
        assert ok, f"{name} on {len(rows)} random rows: {report}"

    # round-6 events-SQL shapes: empty tables (empty funnels/calendars),
    # single-user streams, duplicate timestamps (transition/LAG
    # tie-breaks), and all-in-one-week cohorts are the adversarial cases
    from spark_history_server_rs_spark.operators import relational

    for name in sorted(relational.EVENTS_TAILS):
        ok, report = compare(
            relational.run_events_tail(ev, name), con, oracles[name]
        )
        assert ok, f"{name} on {len(rows)} random rows: {report}"
    con.close()


# ---------------------------------------------------------------------------
# documents-table properties: text/llmprep operators on adversarial corpora
# ---------------------------------------------------------------------------
_ASCII_TOKEN = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789.,;!?'\"-_()",
    min_size=0,
    max_size=8,
)

# non-ASCII shapes where byte-level vs codepoint-level engine semantics
# could diverge: multibyte UTF-8 (umlauts, CJK, emoji), combining marks
_UNICODE_TOKEN = st.text(
    alphabet="äöüßéñ日本語中文🙂✓Ωπ́abc",
    min_size=1,
    max_size=6,
)


@st.composite
def document_rows(draw):
    n = draw(st.integers(min_value=0, max_value=25))
    rows = []
    # with probability ~1/4 the whole corpus is ONE repeated document —
    # the all-identical shape where every pair is a dup and tie-breaks
    # decide everything
    identical = n > 0 and draw(st.integers(0, 3)) == 0
    token = st.one_of(_ASCII_TOKEN, _UNICODE_TOKEN)
    for i in range(n):
        # degenerate shapes on purpose: empty text, runs of spaces,
        # duplicate docs, single-token docs, punctuation-only tokens
        if identical and rows:
            text = rows[0]["text"]
        else:
            n_toks = draw(st.integers(0, 12))
            toks = [draw(token) for _ in range(n_toks)]
            # newline separators exercise the line-level rules (Gopher
            # bullet/ellipsis/dup-line fractions, C4 terminal-punct
            # lines) that the no-newline sf tables never touch
            sep = draw(st.sampled_from([" ", "  ", "   ", "\n", "\n\n"]))
            text = sep.join(toks)
        # NULLs appear in every real corpus (failed fetches, missing
        # metadata) and in none of the sf tables — the NULL-vs-empty
        # distinction is where engine semantics (size(NULL), NULL
        # comparisons in CASE ladders) diverge first
        if draw(st.integers(0, 9)) == 0:
            text = None
        rows.append(
            {
                "doc_id": i,
                "text": text,
                "lang": draw(
                    st.sampled_from(["en", "de", "zh", None])
                ),
                "source": draw(
                    st.sampled_from(["web", "books", "code", None])
                ),
                "n_chars": len(text) if text is not None else 0,
            }
        )
    return rows


def _write_documents(tmpdir: str, rows: list[dict]) -> None:
    table = pa.table(
        {
            "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
            "text": pa.array([r["text"] for r in rows], pa.string()),
            "lang": pa.array([r["lang"] for r in rows], pa.string()),
            "source": pa.array([r["source"] for r in rows], pa.string()),
            "n_chars": pa.array([r["n_chars"] for r in rows], pa.int64()),
        }
    )
    pq.write_table(table, f"{tmpdir}/documents.parquet")


@pytest.fixture(scope="module")
def prop_docs_dir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("prop-docs"))


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=document_rows())
def test_random_documents_match_oracle(rows, spark, prop_docs_dir):
    import duckdb

    from spark_history_server_rs_spark.operators import corpus, dedup, llmprep, textprep

    _write_documents(prop_docs_dir, rows)
    docs = spark.read.parquet(f"{prop_docs_dir}/documents.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE OR REPLACE VIEW documents AS "
        f"SELECT * FROM read_parquet('{prop_docs_dir}/documents.parquet')"
    )
    import __spark_entry__ as entrymod

    oracles = entrymod.oracle_sql()
    # the shingle/band caches key on the input PLAN hash; each example
    # rewrites the same path, so they must be dropped between examples
    dedup.clear_materialized_caches()
    for fn, name in [
        (dedup.dedup_exact, "dedup_exact"),
        (llmprep.stem_normalize, "text_stem_normalize"),
        (llmprep.length_histogram, "corpus_length_histogram"),
        (llmprep.pack_sequences, "corpus_pack_sequences"),
        (llmprep.stratified_sample, "corpus_stratified_sample"),
        (llmprep.bigram_counts, "corpus_bigram_counts"),
        (textprep.token_stats, "text_token_stats"),
        # fold-vs-window equivalence under adversarial corpora (empty
        # docs, space runs, dup docs, <k-token docs): the Spark side
        # builds k-grams/fingerprints by slice fold, the oracle by
        # explode + window — exactly where the two could diverge
        (dedup.simhash_pairs, "dedup_simhash"),
        (textprep.doc_fingerprints, "text_fingerprints"),
        (dedup.repeated_passage_coverage, "dedup_repeated_passages"),
        (dedup.ngram_jaccard_pairs, "dedup_ngram_jaccard"),
        (dedup.minhash_lsh_pairs, "dedup_minhash_lsh"),
        # round-6 corpus ops: empty corpora, zero-token docs, absent
        # target language (DSIR's t_tot = 0), and all-tied perplexity
        # metrics (tertile boundaries resolve purely by doc_id) are
        # exactly the shapes random generation hits
        (corpus.dsir_select, "corpus_dsir_select"),
        (corpus.perplexity_buckets, "corpus_perplexity_buckets"),
        (corpus.split_leakage, "corpus_split_leakage"),
        # C7b: iterative label propagation + quality rank + per-source
        # fold vs the oracle's recursive-CTE fixpoint — duplicate docs
        # across different sources are the interesting corner (the
        # cluster keeps one; the OTHER source loses the tokens)
        (corpus.dedup_survivorship, "dedup_survivorship"),
        # T11: both keep flags + the 4-cell fold under empty/NULL-text
        # docs (NULL flags are a real confusion cell in both engines)
        (textprep.filter_agreement, "text_filter_agreement"),
        # C16: bucket arithmetic + first-seen fold under empty corpora,
        # all-<k-token docs (no shingles at all) and duplicated docs
        (corpus.novelty_curve, "corpus_novelty_curve"),
    ]:
        ok, report = compare(fn(docs), con, oracles[name])
        assert ok, f"{name} on {len(rows)} random docs: {report}"
    con.close()


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=document_rows())
def test_random_documents_rank_vocab_manifest_match_oracle(
    rows, spark, prop_docs_dir
):
    """Round-5 extension: the hand-built integer-arithmetic surface —
    two-level bucket ranks, micro-nat LM sums, sqrt-weight temperature
    rates, the end-to-end keep/drop manifest — under adversarial corpora
    (empty, one-token, ALL-identical, unicode). This is where a wrong
    answer would hide: the fixed sf tables never produce an empty
    vocabulary, a zero-weight source, or a corpus where every doc ties."""
    import duckdb

    from spark_history_server_rs_spark.operators import (
        corpus,
        dedup,
        llmprep,
        textprep,
    )

    _write_documents(prop_docs_dir, rows)
    docs = spark.read.parquet(f"{prop_docs_dir}/documents.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE OR REPLACE VIEW documents AS "
        f"SELECT * FROM read_parquet('{prop_docs_dir}/documents.parquet')"
    )
    import __spark_entry__ as entrymod

    oracles = entrymod.oracle_sql()
    dedup.clear_materialized_caches()
    for fn, name in [
        (corpus.vocabulary, "corpus_vocabulary"),
        (corpus.tfidf_top_terms, "corpus_tfidf_top_terms"),
        (corpus.oov_rate, "corpus_oov_rate"),
        (corpus.unigram_logprob, "corpus_unigram_logprob"),
        (corpus.hash_split, "corpus_hash_split"),
        (llmprep.temperature_sample, "corpus_temperature_sample"),
        (llmprep.training_manifest, "corpus_training_manifest"),
        (textprep.text_quality, "text_quality"),
        # round-7 batch: line-level rules see newline-bearing docs only
        # here; zipf/chunking see empty and one-token corpora
        (textprep.gopher_rules, "text_gopher_rules"),
        (textprep.c4_filters, "text_c4_filters"),
        # newline-separated duplicate docs are exactly the shared-line
        # shape the boilerplate op keys on
        (textprep.line_boilerplate, "text_line_boilerplate"),
        # NULL sources + all-tied scores: the per-source quota rank must
        # agree purely on doc_id tie-breaks
        (textprep.quality_prune, "text_quality_prune"),
        # a source whose every doc has zero tokens exercises the DoReMi
        # per-source division guards; single-source corpora pin the
        # one-row weight/plan arithmetic
        (corpus.doremi_reweight, "corpus_doremi_reweight"),
        (corpus.mix_plan, "corpus_mix_plan"),
        (corpus.dedup_cluster_stats, "dedup_cluster_stats"),
        (corpus.zipf_fit, "corpus_zipf_fit"),
        (corpus.source_overlap, "corpus_source_overlap"),
        (llmprep.chunk_documents, "corpus_chunk_documents"),
        # all-identical corpora produce maximal self-overlapping runs
        # ("a a a a") — exactly where the two engines' replace()
        # left-to-right non-overlap semantics must agree
        (llmprep.bpe_merge_step, "corpus_bpe_merge_step"),
    ]:
        ok, report = compare(fn(docs), con, oracles[name])
        assert ok, f"{name} on {len(rows)} random docs: {report}"
    con.close()


# tokens built to attack the BPE string pipeline: regex metacharacters
# (the char split is regexp_replace '(.)' — they must stay literal),
# the chr(31) joiner and the '</w>' marker as SOURCE tokens (the
# documented corpus-assumption collisions — both engines must conflate
# identically), and 1-char tokens whose symbol sequence is just the
# marker pair
_BPE_ATTACK_TOKEN = st.one_of(
    st.text(alphabet="ab.*+?()[]{}|\\^$-", min_size=1, max_size=4),
    # \r / \n INSIDE tokens (tokens split on ' ' only): Java's regex dot
    # excludes \r, RE2's excludes \n — the (?s) flag on the char split
    # is what keeps the two engines' symbol tables identical here
    st.sampled_from(
        ["a", "b", "aa", "</w>", "<", ">", "/w", chr(31), "a\rb", "a\nb", "\r"]
    ),
)


@st.composite
def bpe_adversarial_rows(draw):
    """Targeted corpora for L2b/L2c/C12: self-pair runs ('x x x x' —
    left-to-right non-overlapping replace must agree), single-token
    docs (no pairs), metachar tokens, single-source corpora (C12's
    pair join has no pairs) and all-shared-text corpora (every shingle
    in every source)."""
    n = draw(st.integers(min_value=0, max_value=10))
    single_source = draw(st.booleans())
    all_same = n > 0 and draw(st.integers(0, 2)) == 0
    rows = []
    for i in range(n):
        if all_same and rows:
            text = rows[0]["text"]
        elif draw(st.integers(0, 9)) == 0:
            text = None
        else:
            shape = draw(st.integers(0, 3))
            if shape == 0:  # self-pair run
                t = draw(_BPE_ATTACK_TOKEN)
                text = " ".join([t] * draw(st.integers(1, 6)))
            elif shape == 1:  # single-token doc — no adjacent pairs
                text = draw(_BPE_ATTACK_TOKEN)
            else:
                text = " ".join(
                    draw(_BPE_ATTACK_TOKEN)
                    for _ in range(draw(st.integers(0, 8)))
                )
        rows.append(
            {
                "doc_id": i,
                "text": text,
                "lang": "en",
                "source": "web"
                if single_source
                else draw(st.sampled_from(["web", "books"])),
                "n_chars": len(text) if text is not None else 0,
            }
        )
    return rows


@pytest.fixture(scope="module")
def prop_bpe_dir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("prop-bpe"))


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=bpe_adversarial_rows())
def test_bpe_and_source_overlap_adversarial_match_oracle(
    rows, spark, prop_bpe_dir
):
    """Round-6 extension (VERDICT #6): the two newest hand-built
    string/integer pipelines under corpora built to break them — the
    BPE merge arithmetic (metachar tokens, marker collisions, repeated
    self-pairs) and the source-overlap matrix (single-source and
    all-shared-shingle corpora)."""
    import duckdb

    from spark_history_server_rs_spark.operators import corpus, dedup, llmprep

    _write_documents(prop_bpe_dir, rows)
    docs = spark.read.parquet(f"{prop_bpe_dir}/documents.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE OR REPLACE VIEW documents AS "
        f"SELECT * FROM read_parquet('{prop_bpe_dir}/documents.parquet')"
    )
    import __spark_entry__ as entrymod

    oracles = entrymod.oracle_sql()
    dedup.clear_materialized_caches()
    for fn, name in [
        (llmprep.bpe_merge_step, "corpus_bpe_merge_step"),
        (llmprep.bpe_train, "corpus_bpe_train"),
        (llmprep.bpe_fertility, "corpus_bpe_fertility"),
        (llmprep.bpe_encode, "corpus_bpe_encode"),
        (dedup.containment_pairs, "dedup_containment"),
        (corpus.source_overlap, "corpus_source_overlap"),
        (corpus.span_leakage, "corpus_span_leakage"),
    ]:
        ok, report = compare(fn(docs), con, oracles[name])
        assert ok, f"{name} on {len(rows)} adversarial docs: {report}"
    con.close()


# ---------------------------------------------------------------------------
# embeddings-table properties: vector operators on adversarial inputs
# ---------------------------------------------------------------------------
@st.composite
def embedding_rows(draw):
    dim = 16  # constant per corpus (vector ops require rectangular input)
    n = draw(st.integers(min_value=0, max_value=20))
    # with probability ~1/4 every vector is IDENTICAL (zero variance in
    # every dimension and every centroid distance — stats must not NaN)
    identical = n > 0 and draw(st.integers(0, 3)) == 0
    rows = []
    for i in range(n):
        if draw(st.integers(0, 9)) == 0:
            # NULL embedding (failed encode): dropped at the operator
            # source in BOTH engines — defined contract, not luck
            vec = None
        elif identical and rows:
            vec = rows[0]["embedding"]
        else:
            vec = [
                draw(
                    st.floats(
                        min_value=-1.0,
                        max_value=1.0,
                        allow_nan=False,
                        allow_infinity=False,
                        width=32,
                    )
                )
                for _ in range(dim)
            ]
        rows.append(
            {
                "vec_id": i,
                "embedding": vec,
                "label": draw(st.integers(0, 3)),
            }
        )
    return rows


def _write_embeddings(tmpdir: str, rows: list[dict]) -> None:
    table = pa.table(
        {
            "vec_id": pa.array([r["vec_id"] for r in rows], pa.int64()),
            "embedding": pa.array(
                [r["embedding"] for r in rows], pa.list_(pa.float32())
            ),
            "label": pa.array([r["label"] for r in rows], pa.int32()),
        }
    )
    pq.write_table(table, f"{tmpdir}/embeddings.parquet")


@pytest.fixture(scope="module")
def prop_emb_dir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("prop-emb"))


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=embedding_rows())
def test_random_embeddings_match_oracle(rows, spark, prop_emb_dir):
    """Vector-op differential under adversarial embeddings: empty table,
    single vector, ALL-identical vectors (zero variance everywhere),
    few-vector corpora where the deterministic seed sets (centroids
    vec_id<8, codebook vec_id<16) are partially or fully absent."""
    import duckdb

    from spark_history_server_rs_spark.operators import llmprep, similarity

    _write_embeddings(prop_emb_dir, rows)
    emb = spark.read.parquet(f"{prop_emb_dir}/embeddings.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE OR REPLACE VIEW embeddings AS "
        f"SELECT * FROM read_parquet('{prop_emb_dir}/embeddings.parquet')"
    )
    import __spark_entry__ as entrymod

    oracles = entrymod.oracle_sql()
    for fn, name in [
        (llmprep.embedding_dim_stats, "embedding_dim_stats"),
        # zero-range dims / an all-zero corpus hit the gmax=0 / dmax=0
        # quantize-to-zero guards in both engines
        (llmprep.embedding_int8_audit, "embedding_int8_audit"),
        (llmprep.embedding_outliers, "embedding_outliers"),
        # the one-row identity audits under empty/single/identical
        # corpora (n_unit<2 sentinel, all-equal vectors -> cos 1.0;
        # ABTT: all-equal vectors center to all-zero, n_unit=0 sentinel)
        (llmprep.embedding_anisotropy, "embedding_anisotropy"),
        (llmprep.embedding_abtt_audit, "embedding_abtt_audit"),
        # ann_graph_expand is NOT here for the same reason as
        # ann_lsh_bucketed / ann_knn_graph: the hyperplane/sketch
        # constants are 64-dim and this suite generates 16-dim corpora
        # (DuckDB's list_dot_product rejects the mismatch); its
        # degenerate coverage lives in the 64-dim zero-norm sweep
        (similarity.ann_pq_codes, "ann_pq_codes"),
        # dim=16 < TRUNC_DIM: both engines' slice clamps, recall pins
        # to 1.0 — the degenerate-agreement case worth pinning
        (similarity.ann_truncated_recall, "ann_truncated_recall"),
        # L8b: the 3-step Lloyd loop under absent/partial seed sets,
        # identical vectors (ties resolve by cid) and empty clusters
        # (centroid carried, no row emitted) — loop vs unrolled chain
        (llmprep.embedding_kmeans_train, "embedding_kmeans_train"),
        (similarity.ann_nprobe_recall, "ann_nprobe_recall"),
    ]:
        ok, report = compare(fn(emb), con, oracles[name])
        assert ok, f"{name} on {len(rows)} random vectors: {report}"
    con.close()


# ---------------------------------------------------------------------------
# ingest fuzzing: the permissive event-log parser must never crash
# ---------------------------------------------------------------------------
_JSONISH_LINE = st.one_of(
    st.text(max_size=60),  # arbitrary garbage incl. empty lines
    st.text(alphabet='{}[]":,abcdef0123456789 \t', max_size=60),  # JSON-ish
    st.builds(
        lambda ev, ts, extra: json.dumps(
            {"Event": ev, "Timestamp": ts, **extra}
        ),
        ev=st.sampled_from(
            [
                "SparkListenerApplicationStart",
                "SparkListenerTaskEnd",
                "SparkListenerExecutorAdded",
                "NotARealEvent",
                "",
            ]
        ),
        ts=st.one_of(
            st.integers(-(2**40), 2**40), st.none(), st.text(max_size=8)
        ),
        extra=st.dictionaries(
            st.sampled_from(["App ID", "Stage ID", "Task Info", "junk"]),
            st.one_of(st.none(), st.integers(-5, 5), st.text(max_size=10)),
            max_size=3,
        ),
    ),
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(lines=st.lists(_JSONISH_LINE, max_size=30))
def test_event_log_parser_never_crashes(lines, spark, tmp_path_factory):
    """S6 hardening: the permissive reader must survive ANY byte salad —
    truncated JSON, wrong types in known fields, null timestamps, alien
    events — producing rows + reject counts, never an exception; and
    the whole catalog must still run over whatever was parsed."""
    from spark_history_server_rs_spark.sources.event_logs import (
        read_event_logs,
    )

    d = tmp_path_factory.mktemp("fuzz-logs")
    appdir = d / "application_fuzz"
    appdir.mkdir()
    with open(appdir / "events_1", "w") as f:
        for line in lines:
            f.write(line.replace("\n", " ") + "\n")
    events, rejects = read_event_logs(
        spark, str(d) + "/*/*", with_rejects=True
    )
    n_events, n_rejects = events.count(), rejects.count()
    assert n_events >= 0 and n_rejects >= 0
    # catalog queries run on whatever survived (possibly zero rows)
    assert catalog.applications(events).count() >= 0
    assert catalog.cross_app_summary(events).count() == 1


def test_zero_norm_vectors_survive_every_cosine_op(spark, tmp_path_factory):
    """A single zero-norm embedding (failed encode — guaranteed to exist
    somewhere in a 100 TB corpus) used to throw DIVIDE_BY_ZERO in
    Spark's ANSI mode and kill the whole query across the entire
    cosine-family surface. Semantics are now defined: zero-norm vectors
    normalize to the zero vector and cosine with anything is 0.0 — in
    BOTH engines, pinned differentially here over a corpus containing a
    zero vector and an exact duplicate pair."""
    import random

    import duckdb

    from spark_history_server_rs_spark.operators import (
        dedup,
        llmprep,
        similarity,
    )

    rng = random.Random(7)
    rows = []
    for i in range(12):
        if i == 1:
            vec = [0.0] * 64
        elif i == 5:
            vec = rows[0]["embedding"][:]
        else:
            vec = [round(rng.uniform(-1, 1), 3) for _ in range(64)]
        rows.append({"vec_id": i, "embedding": vec, "label": i % 3})
    d = str(tmp_path_factory.mktemp("zero-emb"))
    _write_embeddings(d, rows)
    emb = spark.read.parquet(f"{d}/embeddings.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE OR REPLACE VIEW embeddings AS "
        f"SELECT * FROM read_parquet('{d}/embeddings.parquet')"
    )
    import __spark_entry__ as entrymod

    oracles = entrymod.oracle_sql()
    for fn, name in [
        (similarity.ann_cosine_topk, "ann_cosine_topk"),
        (similarity.ann_lsh_bucketed, "ann_lsh_bucketed"),
        (similarity.ann_hamming_rerank, "ann_hamming_rerank"),
        (similarity.ann_ivf, "ann_ivf"),
        (similarity.ann_knn_graph, "ann_knn_graph"),
        (similarity.ann_ivf_pq, "ann_ivf_pq"),
        (similarity.ann_ivf_pq_residual, "ann_ivf_pq_residual"),
        (similarity.ann_graph_expand, "ann_graph_expand"),
        (similarity.ann_graph_expand2, "ann_graph_expand2"),
        (similarity.ann_crossencoder_rerank, "ann_crossencoder_rerank"),
        (llmprep.embedding_anisotropy, "embedding_anisotropy"),
        (llmprep.embedding_abtt_audit, "embedding_abtt_audit"),
        (dedup.embedding_cosine_dups, "dedup_embedding_cosine"),
        (
            dedup.embedding_cosine_dups_prefiltered,
            "dedup_embedding_cosine_prefiltered",
        ),
        (llmprep.kmeans_step, "embedding_kmeans_step"),
        (llmprep.semantic_dedup, "embedding_semantic_dedup"),
    ]:
        ok, report = compare(fn(emb), con, oracles[name])
        assert ok, f"{name} with a zero-norm vector: {report}"
    con.close()


def test_encoding_artifacts_planted_corpus(spark, tmp_path_factory):
    """T10 on a corpus with every artifact class planted (the sf tables
    are clean ASCII, so without this the detection branches never run):
    U+FFFD, a NUL and a BEL control char, cp1252 mojibake, a zero-width
    space, plus NULL text and NULL source — differentially vs DuckDB,
    then the flag counts pinned exactly."""
    import duckdb

    from spark_history_server_rs_spark.operators import textprep

    rows = [
        {"doc_id": 0, "text": "clean ascii text", "lang": "en",
         "source": "web"},
        {"doc_id": 1, "text": "bad � decode", "lang": "en",
         "source": "web"},
        {"doc_id": 2, "text": "nul\x00byte and bel\x07", "lang": "en",
         "source": "web"},
        {"doc_id": 3, "text": "double encoded nÃ£o and â€œquotesâ€\x9d",
         "lang": "pt", "source": "crawl"},
        {"doc_id": 4, "text": "zero​width", "lang": "en",
         "source": "crawl"},
        {"doc_id": 5, "text": None, "lang": None, "source": "crawl"},
        {"doc_id": 6, "text": "naturally multibyte: héllo wörld",
         "lang": "de", "source": None},
    ]
    for r in rows:
        r["n_chars"] = len(r["text"]) if r["text"] else 0
    d = str(tmp_path_factory.mktemp("enc-art"))
    _write_documents(d, rows)
    docs = spark.read.parquet(f"{d}/documents.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE OR REPLACE VIEW documents AS "
        f"SELECT * FROM read_parquet('{d}/documents.parquet')"
    )
    try:
        ok, report = compare(
            textprep.encoding_artifacts(docs),
            con,
            textprep.ORACLE_SQL_TEXT["text_encoding_artifacts"],
        )
        assert ok, report
        by_src = {
            r.source: r for r in textprep.encoding_artifacts(docs).collect()
        }
        web, crawl = by_src["web"], by_src["crawl"]
        assert (web.n_replacement, web.n_control, web.n_any_artifact) == (
            1, 1, 2,
        )
        assert (crawl.n_mojibake, crawl.n_zero_width) == (1, 1)
        # NULL-text doc: in n_docs, out of every artifact denominator
        assert (crawl.n_docs, crawl.n_docs_text) == (3, 2)
        assert crawl.artifact_rate == 1.0  # both text-bearing docs flagged
        # NULL source is a real group; clean multibyte text is not an
        # artifact but does show up in the multibyte-excess ratio
        null_grp = by_src[None]
        assert null_grp.n_any_artifact == 0
        assert null_grp.multibyte_excess == 2 and null_grp.multibyte_ratio > 0
    finally:
        con.close()


def test_int8_audit_all_zero_corpus(spark, tmp_path_factory):
    """L7b on a corpus where EVERY element is 0: gmax = dmax = 0, the
    quantize-to-zero guards fire in every row, and the audit reports
    zero error under both schemes — deterministically pinned because
    the hypothesis corpus only rarely draws this corner."""
    import duckdb

    from spark_history_server_rs_spark.operators import llmprep

    rows = [
        {"vec_id": i, "embedding": [0.0] * 16, "label": 0} for i in range(5)
    ]
    d = str(tmp_path_factory.mktemp("zero-i8"))
    _write_embeddings(d, rows)
    emb = spark.read.parquet(f"{d}/embeddings.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE OR REPLACE VIEW embeddings AS "
        f"SELECT * FROM read_parquet('{d}/embeddings.parquet')"
    )
    try:
        ok, report = compare(
            llmprep.embedding_int8_audit(emb),
            con,
            llmprep.ORACLE_SQL_LLMPREP["embedding_int8_audit"],
        )
        assert ok, report
        out = llmprep.embedding_int8_audit(emb).collect()
        assert len(out) == 16
        assert all(
            r.mse_tensor_scale == 0.0
            and r.mse_channel_scale == 0.0
            and r.range_use_pct == 0.0
            for r in out
        )
    finally:
        con.close()


def test_residual_pq_reduces_quantization_error():
    """X8b's reason to exist: quantizing residuals r = x - q1(x) must
    spend the same PQ_M x PQ_K code budget on a smaller-variance
    distribution than raw vectors. Pinned as a strict inequality on the
    fixed seed-42 corpus at every generated scale.

    Measured on the DuckDB twins (legitimate: the Spark operator is
    hash-equal to the oracle by test_query_matches_oracle, so the twin
    IS the operator's arithmetic; DuckDB-side lets this scan three
    scales without three Spark jobs)."""
    import duckdb

    from spark_history_server_rs_spark.operators import similarity as S

    raw_sql = "WITH " + S._PQ_CODE_CTES.format(
        scale=S._PQ_SCALE, subdim=S.PQ_SUBDIM, pqk=S.PQ_K,
        unnested=S._PQ_UNNEST_DUCK,
    ) + " SELECT CAST(SUM(d) AS BIGINT) FROM assigned"
    res_sql_full = S.ORACLE_ANN_IVF_PQ_RESIDUAL
    head = res_sql_full[: res_sql_full.index(",\nprobes AS")]
    res_sql = head + " SELECT CAST(SUM(d) AS BIGINT) FROM rassigned"
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW embeddings AS "
            f"SELECT * FROM '/root/testdata/{sf}/embeddings.parquet'"
        )
        try:
            raw = con.execute(raw_sql).fetchone()[0]
            res = con.execute(res_sql).fetchone()[0]
            assert res < raw, (sf, res, raw)
        finally:
            con.close()


def test_anisotropy_identity_matches_brute_force():
    """L7b computes avg pairwise cosine WITHOUT a pair join via
    ||sum(unit)||^2 = n + sum_{i!=j} cos — pin the identity against the
    O(n^2) brute force (1225 pairs at sf0.001). Tolerance covers the
    micro/milli snapping, not the identity (which is exact)."""
    import duckdb

    from spark_history_server_rs_spark.operators import llmprep as L

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS "
        "SELECT * FROM '/root/testdata/sf0.001/embeddings.parquet'"
    )
    try:
        ident = con.execute(
            L.ORACLE_EMBEDDING_ANISOTROPY
        ).fetchdf().avg_pairwise_cos[0]
        brute = con.execute("""
WITH nz AS (SELECT vec_id, embedding FROM embeddings
            WHERE embedding IS NOT NULL
              AND list_dot_product(CAST(embedding AS DOUBLE[]),
                                   CAST(embedding AS DOUBLE[])) > 0)
SELECT AVG(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                            CAST(b.embedding AS DOUBLE[]))
  / sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                          CAST(a.embedding AS DOUBLE[])))
  / sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]),
                          CAST(b.embedding AS DOUBLE[]))))
FROM nz a JOIN nz b ON a.vec_id <> b.vec_id""").fetchone()[0]
        assert abs(ident - brute) < 5e-4, (ident, brute)
    finally:
        con.close()
