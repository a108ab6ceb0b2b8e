"""Driver contract for the spark-graft builder (PySpark target).

Every implemented operator from SURVEY.md §2 is exposed here twice:

- ``queries()[name]`` — the Spark implementation (a callable
  ``(spark, sf_dir) -> DataFrame``), and
- ``oracle_sql()[name]`` — an equivalent DuckDB SQL string over the
  pre-registered views (region nation customer supplier part orders
  lineitem events documents embeddings).

Both sides alias computed columns identically and round floating-point
outputs to 6 decimals so the driver's order-insensitive value hash
matches. Entries are declared adjacently in ``_REGISTRY`` so the two
key sets cannot drift apart.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from same_same_spark.bm25 import duckdb_bm25_sql, score_queries
from same_same_spark.operators.filters import compile_filters, matches_metadata
from same_same_spark.operators.hybrid import HybridWeight, advanced_search
from same_same_spark.operators.temporal import (
    DECAY_LAMBDAS,
    apply_decay_col,
)
from same_same_spark.operators.vector import search_by_embedding
from same_same_spark.stats import (
    corpus_stats,
    doc_term_freqs,
    prune_vocabulary,
    term_doc_freqs,
    tokenized,
)
from same_same_spark.text.tokenizer import duckdb_tokens_sql

# ---------------------------------------------------------------------------
# shared fixtures
# ---------------------------------------------------------------------------

# Reference query set (FIXTURES.md §5): covers multi-term, single-term,
# skew-term, and all-stopword (zero-token ⇒ zero-row) queries.
REF_QUERIES: list[tuple[int, str]] = [
    (1, "table query join"),
    (2, "fast scan row filter"),
    (3, "window agg stream batch"),
    (4, "the a an"),  # all stopwords → no tokens → no results
    (5, "vector"),
]
REF_K = 10

_REF_TIME = "2024-03-01 00:00:00"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The parquet `ts` is TIMESTAMP_NTZ; pin the session to UTC and cast so
    # Spark's instant math agrees with DuckDB's naive-epoch interpretation.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )


def _round6(df: DataFrame, *cols: str) -> DataFrame:
    for c in cols:
        df = df.withColumn(c, F.round(F.col(c), 6))
    return df


# ---------------------------------------------------------------------------
# query implementations — (spark_fn, oracle_sql_or_None) pairs
# ---------------------------------------------------------------------------


def _q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: exact BM25 top-k for the reference query set (SURVEY §3.1)."""
    out = score_queries(
        _docs(spark, sf_dir), REF_QUERIES, k=REF_K,
        id_col="doc_id", text_col="text",
    )
    return _round6(out, "score").withColumn("rank", F.col("rank").cast("int"))


_SQL_BM25_TOPK = (
    "SELECT query_id, doc_id, score, rank::INTEGER AS rank FROM ("
    + duckdb_bm25_sql("documents", "doc_id", "text", REF_QUERIES, k=REF_K)
    + ")"
)


def _q_term_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 — per-term document frequency, top-100 under (df DESC, term ASC)."""
    tok = tokenized(_docs(spark, sf_dir), id_col="doc_id", text_col="text")
    return (
        term_doc_freqs(tok)
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(100)
    )


_SQL_TERM_DF = f"""
WITH toks AS (
  SELECT doc_id, {duckdb_tokens_sql('text')} AS tokens FROM documents
),
terms AS (
  SELECT doc_id, unnest(list_distinct(tokens)) AS term FROM toks
)
SELECT term, count(*) AS df FROM terms GROUP BY term
ORDER BY df DESC, term ASC LIMIT 100
"""


def _q_vocab_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 — vocabulary pruning (min_df / max_df ratio / max_features)."""
    docs = _docs(spark, sf_dir)
    tok = tokenized(docs, id_col="doc_id", text_col="text")
    n = tok.count()
    return prune_vocabulary(
        term_doc_freqs(tok), n, min_df=2, max_df_ratio=0.5, max_features=50
    ).orderBy(F.desc("df"), F.asc("term"))


_SQL_VOCAB_PRUNE = f"""
WITH toks AS (
  SELECT doc_id, {duckdb_tokens_sql('text')} AS tokens FROM documents
),
n AS (SELECT count(*) AS n_docs FROM toks),
dfs AS (
  SELECT term, count(*) AS df FROM (
    SELECT doc_id, unnest(list_distinct(tokens)) AS term FROM toks
  ) GROUP BY term
)
SELECT d.term, d.df FROM dfs d, n
WHERE d.df >= 2 AND d.df / n.n_docs <= 0.5
ORDER BY d.df DESC, d.term ASC LIMIT 50
"""


def _q_corpus_overview(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3/A5 — corpus statistics (N, avgdl, vocab size, posting count)."""
    tok = tokenized(_docs(spark, sf_dir), id_col="doc_id", text_col="text")
    cs = corpus_stats(tok)
    n_terms = term_doc_freqs(tok).count()
    n_postings = doc_term_freqs(tok).count()
    return spark.createDataFrame(
        [(cs.n_docs, round(cs.avgdl, 6), n_terms, n_postings)],
        "n_docs BIGINT, avgdl DOUBLE, n_terms BIGINT, n_postings BIGINT",
    )


_SQL_CORPUS_OVERVIEW = f"""
WITH toks AS (
  SELECT doc_id, {duckdb_tokens_sql('text')} AS tokens FROM documents
),
pairs AS (
  SELECT DISTINCT doc_id, unnest(tokens) AS term FROM toks
)
SELECT
  (SELECT count(*) FROM toks)::BIGINT AS n_docs,
  (SELECT round(avg(len(tokens)), 6) FROM toks) AS avgdl,
  (SELECT count(DISTINCT term) FROM pairs)::BIGINT AS n_terms,
  (SELECT count(*) FROM pairs)::BIGINT AS n_postings
"""


def _q_doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1/X2 substrate — per-document token length + distinct terms."""
    tok = tokenized(_docs(spark, sf_dir), id_col="doc_id", text_col="text")
    return tok.select(
        "doc_id",
        F.col("dl").cast("bigint").alias("dl"),
        F.size(F.array_distinct("tokens")).cast("bigint").alias("n_distinct"),
    )


_SQL_DOC_TOKEN_STATS = f"""
SELECT doc_id,
       len(tokens)::BIGINT AS dl,
       len(list_distinct(tokens))::BIGINT AS n_distinct
FROM (SELECT doc_id, {duckdb_tokens_sql('text')} AS tokens FROM documents)
"""


def _q_filter_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 — FilterExpr compiler over plain columns (eq/between/in/contains)."""
    docs = _docs(spark, sf_dir)
    pred = compile_filters(
        {
            "lang": {"eq": "en"},
            "n_chars": {"between": [150, 400]},
            "source": {"in": ["src1", "src2", "src3", "src4"]},
            "text": {"contains": "JOIN"},
        },
        metadata_col=None,
        df=docs,
    )
    return docs.filter(pred).select("doc_id", "lang", "source", "n_chars")


_SQL_FILTER_EXPR = """
SELECT doc_id, lang, source, n_chars FROM documents
WHERE lang = 'en'
  AND n_chars BETWEEN 150 AND 400
  AND source IN ('src1','src2','src3','src4')
  AND contains(lower(text), lower('JOIN'))
"""


def _q_filter_metadata_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 over MAP<STRING,STRING> metadata — exists / neq / numeric-string
    dual compare (the reference's stringly-typed hot path, filter.go:135-170).
    """
    docs = _docs(spark, sf_dir).withColumn(
        "metadata",
        F.create_map(
            F.lit("lang"), F.col("lang"),
            F.lit("source"), F.col("source"),
            F.lit("n_chars"), F.col("n_chars").cast("string"),
        ),
    )
    pred = compile_filters(
        {
            "lang": {"neq": "en"},
            "missing_field": {"exists": False},
            "source": {"contains": "SRC1"},
            "n_chars": {"gt": 150, "lte": 400},
        },
        metadata_col="metadata",
    )
    return docs.filter(pred).select("doc_id", "lang", "source", "n_chars")


_SQL_FILTER_METADATA_MAP = """
SELECT doc_id, lang, source, n_chars FROM documents
WHERE lang <> 'en'
  AND contains(lower(source), 'src1')
  AND n_chars > 150 AND n_chars <= 400
"""


def _q_legacy_metadata_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 — legacy exact-equality metadata match (search/search.go:46-53)."""
    docs = _docs(spark, sf_dir).withColumn(
        "metadata",
        F.create_map(
            F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")
        ),
    )
    return docs.filter(
        matches_metadata({"lang": "fr", "source": "src2"})
    ).select("doc_id", "n_chars")


_SQL_LEGACY_METADATA_EQ = """
SELECT doc_id, n_chars FROM documents WHERE lang = 'fr' AND source = 'src2'
"""


def _q_temporal_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7 — temporal decay (medium λ=0.1) applied to event values."""
    ev = _events(spark, sf_dir)
    ref = F.to_timestamp(F.lit(_REF_TIME))
    out = ev.select(
        "event_id",
        apply_decay_col(
            F.col("value"), F.col("ts"), ref, DECAY_LAMBDAS["medium"]
        ).alias("decayed"),
    )
    return _round6(out, "decayed")


_SQL_TEMPORAL_DECAY = f"""
SELECT event_id,
       round(value * exp(-0.1 * greatest(0.0,
         (epoch(TIMESTAMP '{_REF_TIME}') - epoch(ts)) / 31557600.0)), 6)
       AS decayed
FROM events
"""


def _q_temporal_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7 + T1 — strong decay then global top-20 (score DESC, id ASC)."""
    ev = _events(spark, sf_dir)
    ref = F.to_timestamp(F.lit(_REF_TIME))
    out = (
        ev.select(
            "event_id",
            apply_decay_col(
                F.col("value"), F.col("ts"), ref, DECAY_LAMBDAS["strong"]
            ).alias("decayed"),
        )
        .orderBy(F.desc(F.round(F.col("decayed"), 9)), F.asc("event_id"))
        .limit(20)
    )
    return _round6(out, "decayed")


_SQL_TEMPORAL_TOPK = f"""
SELECT event_id, round(decayed, 6) AS decayed FROM (
  SELECT event_id,
         value * exp(-0.5 * greatest(0.0,
           (epoch(TIMESTAMP '{_REF_TIME}') - epoch(ts)) / 31557600.0))
         AS decayed
  FROM events
) ORDER BY round(decayed, 9) DESC, event_id ASC LIMIT 20
"""


def _q_vector_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 + T1 — brute-force cosine top-10 against vec_id=0's embedding."""
    emb = _emb(spark, sf_dir).withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    out = search_by_embedding(emb, list(qvec), k=10, method="builtin")
    return _round6(out, "score")


_SQL_VECTOR_TOPK = """
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
SELECT vec_id, round(score, 6) AS score FROM (
  SELECT e.vec_id,
         list_cosine_similarity(e.embedding::DOUBLE[], q.qv) AS score
  FROM embeddings e, q
  WHERE len(e.embedding) = len(q.qv)
) ORDER BY round(score, 9) DESC, vec_id ASC LIMIT 10
"""


def _q_vector_dim_mismatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 — dimension-mismatch queries return zero rows (memory_test.go:56-71)."""
    emb = _emb(spark, sf_dir).withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    out = search_by_embedding(emb, [1.0, 0.0, 0.0], k=10, method="builtin")
    return _round6(out, "score")


_SQL_VECTOR_DIM_MISMATCH = """
SELECT vec_id, score FROM (
  SELECT vec_id, 0.0 AS score FROM embeddings WHERE len(embedding) = 3
)
"""


def _q_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 — filter → BM25 → hybrid blend (0.7 vector + 0.3 metadata) → top-k."""
    docs = _docs(spark, sf_dir)
    out = advanced_search(
        docs,
        "table query join",
        k=10,
        filters={"lang": {"eq": "en"}},
        hybrid=HybridWeight(vector=0.7, metadata=0.3),
        id_col="doc_id",
        text_col="text",
        metadata_col=None,
    )
    return _round6(out, "score").withColumn("rank", F.col("rank").cast("int"))


_SQL_HYBRID_SEARCH = (
    """
WITH base AS (
"""
    + duckdb_bm25_sql(
        "(SELECT * FROM documents WHERE lang = 'en')",
        "doc_id",
        "text",
        [(0, "table query join")],
        k=10,
        round_score=None,
    )
    + """
)
SELECT doc_id, round(0.7 * score + 0.3, 6) AS score,
       row_number() OVER (
         ORDER BY round(0.7 * score + 0.3, 9) DESC, doc_id ASC
       )::INTEGER AS rank
FROM base
"""
)


def _q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-shaped tumbling-window aggregation, computed in batch:
    1-hour windows × event_type → count + avg(value). The Structured
    Streaming path in ``same_same_spark.streaming`` produces the same
    frame incrementally."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("window_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
    )


_SQL_EVENTS_HOURLY = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n, round(avg(value), 6) AS avg_value
FROM events GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

_REGISTRY: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    "bm25_topk": (_q_bm25_topk, _SQL_BM25_TOPK),
    "term_df_top100": (_q_term_df, _SQL_TERM_DF),
    "vocab_prune": (_q_vocab_prune, _SQL_VOCAB_PRUNE),
    "corpus_overview": (_q_corpus_overview, _SQL_CORPUS_OVERVIEW),
    "doc_token_stats": (_q_doc_token_stats, _SQL_DOC_TOKEN_STATS),
    "filter_expr": (_q_filter_expr, _SQL_FILTER_EXPR),
    "filter_metadata_map": (_q_filter_metadata_map, _SQL_FILTER_METADATA_MAP),
    "legacy_metadata_eq": (_q_legacy_metadata_eq, _SQL_LEGACY_METADATA_EQ),
    "temporal_decay": (_q_temporal_decay, _SQL_TEMPORAL_DECAY),
    "temporal_topk": (_q_temporal_topk, _SQL_TEMPORAL_TOPK),
    "vector_topk": (_q_vector_topk, _SQL_VECTOR_TOPK),
    "vector_dim_mismatch": (_q_vector_dim_mismatch, _SQL_VECTOR_DIM_MISMATCH),
    "hybrid_search": (_q_hybrid_search, _SQL_HYBRID_SEARCH),
    "events_hourly": (_q_events_hourly, _SQL_EVENTS_HOURLY),
}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: BM25 top-k over the
    reference query set (SURVEY §3.1 re-expressed)."""
    return _q_bm25_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: sql for name, (_, sql) in _REGISTRY.items() if sql is not None
    }
