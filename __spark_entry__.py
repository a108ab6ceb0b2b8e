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
from same_same_spark.pipeline import ann as ann_ops
from same_same_spark.pipeline import decontam as decontam_ops
from same_same_spark.pipeline import dedup as dedup_ops
from same_same_spark.pipeline import multimodal as mm_ops
from same_same_spark.pipeline import sampling as sampling_ops
from same_same_spark.pipeline import textqc as textqc_ops
from same_same_spark.pipeline.dedup import hash60_sql, word_shingles_sql
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


def _q_list_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7/F8 — the REST listing projection (id + text length) through
    the API façade (api.list, memory.go:70-90 List parity)."""
    from same_same_spark.api import SameSameSpark

    api = SameSameSpark(
        _docs(spark, sf_dir).select("doc_id", "text"),
        id_col="doc_id", text_col="text",
    )
    return api.list()


_SQL_LIST_PROJECTION = """
SELECT doc_id, length(text) AS text_length FROM documents
"""


def _q_metadata_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 — per-doc metadata match score (1.0 iff every filter matches,
    advanced_search.go:80-91) over the MAP<STRING,STRING> shape."""
    from same_same_spark.operators.hybrid import metadata_score_col

    docs = _docs(spark, sf_dir).withColumn(
        "metadata",
        F.create_map(
            F.lit("lang"), F.col("lang"),
            F.lit("n_chars"), F.col("n_chars").cast("string"),
        ),
    )
    score = metadata_score_col(
        {"lang": {"eq": "en"}, "n_chars": {"gte": 200}},
        metadata_col="metadata",
    )
    return docs.select("doc_id", score.alias("metadata_score"))


_SQL_METADATA_SCORE = """
SELECT doc_id,
       CASE WHEN lang = 'en' AND n_chars >= 200
            THEN 1.0 ELSE 0.0 END AS metadata_score
FROM documents
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


def _q_search_by_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§3.1 SearchByText: F1 exact-equality metadata pre-filter + BM25
    with the handler's k=5 default (handlers/vector.go:224-226)."""
    docs = _docs(spark, sf_dir).filter(F.col("lang") == "fr")
    out = score_queries(
        docs, [(0, "vector table")], k=5, id_col="doc_id", text_col="text"
    ).drop("query_id")
    return _round6(out, "score").withColumn("rank", F.col("rank").cast("int"))


_SQL_SEARCH_BY_TEXT = (
    "SELECT doc_id, score, rank::INTEGER AS rank FROM ("
    + duckdb_bm25_sql(
        "(SELECT * FROM documents WHERE lang = 'fr')",
        "doc_id", "text", [(0, "vector table")], k=5,
    )
    + ")"
)


def _q_temporal_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 temporal search: BM25 top-40 → strong decay vs ref time →
    re-ranked top-10 with base/decay breakdown (TemporalSearchResult
    shape, models/temporal.go:141-148). created_at synthesized
    deterministically from doc_id. The BM25 base rides the compressed
    INDEX path (rank- and score-identical to the naive scorer); the
    re-rank is TakeOrderedAndProject + a ≤k-row rank window — no
    unpartitioned-window stage anywhere."""
    from same_same_spark.index.query import search_batch
    from same_same_spark.operators.hybrid import rank_topk
    from same_same_spark.operators.temporal import decay_factor_col

    docs = _docs(spark, sf_dir).withColumn(
        "created_at",
        F.to_timestamp(F.lit("2020-01-01 00:00:00"))
        + F.make_interval(days=F.col("doc_id") % 1000),
    )
    base = search_batch(
        spark, _entry_index_dir(spark, sf_dir),
        [(0, "table query join")], k=40,
    ).drop("query_id", "rank")
    ref = F.to_timestamp(F.lit(_REF_TIME))
    joined = base.withColumnRenamed("score", "base_score").join(
        docs.select("doc_id", "created_at"), "doc_id"
    )
    lam = DECAY_LAMBDAS["strong"]
    scored = joined.withColumn(
        "decay_factor", decay_factor_col(F.col("created_at"), ref, lam)
    ).withColumn("score", F.col("base_score") * F.col("decay_factor"))
    out = rank_topk(scored, 10).select(
        "doc_id", "score", "base_score", "decay_factor", "rank"
    )
    return _round6(out, "score", "base_score", "decay_factor").withColumn(
        "rank", F.col("rank").cast("int")
    )


_SQL_TEMPORAL_SEARCH = (
    """
WITH base AS (
"""
    + duckdb_bm25_sql(
        "documents", "doc_id", "text", [(0, "table query join")], k=40,
        round_score=None,
    )
    + f"""
),
ts AS (
  SELECT b.doc_id, b.score AS base_score,
         TIMESTAMP '2020-01-01 00:00:00'
           + to_days((b.doc_id % 1000)::INTEGER) AS created_at
  FROM base b
),
dec AS (
  SELECT doc_id, base_score,
         exp(-0.5 * greatest(0.0,
           (epoch(TIMESTAMP '{_REF_TIME}') - epoch(created_at))
           / 31557600.0)) AS decay_factor
  FROM ts
),
ranked AS (
  SELECT doc_id, base_score * decay_factor AS score, base_score,
         decay_factor,
         row_number() OVER (
           ORDER BY round(base_score * decay_factor, 9) DESC, doc_id ASC
         ) AS rank
  FROM dec
)
SELECT doc_id, round(score, 6) AS score, round(base_score, 6) AS base_score,
       round(decay_factor, 6) AS decay_factor, rank::INTEGER AS rank
FROM ranked WHERE rank <= 10
"""
)


def _entry_index_dir(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per content fingerprint) the compressed index for
    the sf_dir's documents; shared by every index-path entry."""
    import hashlib
    import os
    import tempfile

    from same_same_spark.index.build import (
        LAYOUT_VERSION,
        TOKENIZER_VERSION,
        build_index,
    )

    # content fingerprint: regenerated parquet at the same sf_dir must
    # not be served a stale cached index
    fp_parts = []
    doc_dir = os.path.join(sf_dir, "documents.parquet")
    for p in sorted(
        os.listdir(doc_dir) if os.path.isdir(doc_dir) else [doc_dir]
    ):
        full = os.path.join(doc_dir, p) if os.path.isdir(doc_dir) else doc_dir
        st = os.stat(full)
        fp_parts.append(f"{p}:{st.st_size}:{st.st_mtime_ns}")
    tag = hashlib.md5(
        f"{sf_dir}|{LAYOUT_VERSION}|{TOKENIZER_VERSION}|{';'.join(fp_parts)}"
        .encode()
    ).hexdigest()[:10]
    idx_dir = f"{tempfile.gettempdir()}/ss_entry_idx_{tag}"
    build_index(
        _docs(spark, sf_dir), idx_dir, id_col="doc_id", text_col="text",
        num_buckets=8, log=lambda *_: None,
    )
    return idx_dir


def _q_search_by_text_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§3.1 SearchByText routed through the API's attached index
    (unfiltered → compressed-index path; rank/score-identical to the
    naive scorer, so the oracle is plain full-corpus BM25)."""
    from same_same_spark.api import SameSameSpark

    api = SameSameSpark(
        _docs(spark, sf_dir), id_col="doc_id", text_col="text",
        index_dir=_entry_index_dir(spark, sf_dir),
    )
    out = api.search_by_text("vector table", k=5)
    return _round6(out, "score").withColumn("rank", F.col("rank").cast("int"))


_SQL_SEARCH_BY_TEXT_INDEXED = (
    "SELECT doc_id, score, rank::INTEGER AS rank FROM ("
    + duckdb_bm25_sql(
        "documents", "doc_id", "text", [(0, "vector table")], k=5,
    )
    + ")"
)


def _q_hybrid_search_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 hybrid blend over the API's index path (no filters → every
    doc's metadata score is 1.0; blend re-ranks the index's top-4k BM25
    candidates — exact under the monotone affine blend)."""
    from same_same_spark.api import SameSameSpark

    api = SameSameSpark(
        _docs(spark, sf_dir), id_col="doc_id", text_col="text",
        index_dir=_entry_index_dir(spark, sf_dir),
    )
    out = api.advanced_search(
        "table query join", k=10, hybrid=HybridWeight(vector=0.7, metadata=0.3)
    )
    return _round6(out, "score").withColumn("rank", F.col("rank").cast("int"))


_SQL_HYBRID_SEARCH_INDEXED = (
    """
WITH base AS (
"""
    + duckdb_bm25_sql(
        "documents", "doc_id", "text", [(0, "table query join")],
        k=40, round_score=None,
    )
    + """
),
blended AS (
  SELECT doc_id, 0.7 * score + 0.3 AS score FROM base
),
r AS (
  SELECT doc_id, score,
         row_number() OVER (
           ORDER BY round(score, 9) DESC, doc_id ASC
         )::INTEGER AS rank
  FROM blended
)
SELECT doc_id, round(score, 6) AS score, rank FROM r WHERE rank <= 10
"""
)


_DELETE_MOD, _DELETE_RESIDUE = 101, 7  # fixed deterministic victim set


def _entry_deleted_index_dir(spark: SparkSession, sf_dir: str) -> str:
    """A COPY of the entry index with the fixed victim set
    (doc_id % 101 == 7) tombstoned via ``mutate.delete_docs`` — deletes
    are shared state, so the other index entries must never see them.
    Cached per content fingerprint like :func:`_entry_index_dir`."""
    import os
    import shutil

    from same_same_spark.index.build import IndexManifest
    from same_same_spark.index.mutate import delete_docs

    src = _entry_index_dir(spark, sf_dir)
    dst = src + "_del"
    manifest_path = os.path.join(dst, "manifest.json")
    if os.path.exists(manifest_path) and IndexManifest.load(
        dst
    ).has_tombstones:
        return dst
    shutil.rmtree(dst, ignore_errors=True)
    shutil.copytree(src, dst)
    victims = [
        int(r["doc_id"])
        for r in _docs(spark, sf_dir)
        .filter(F.col("doc_id") % _DELETE_MOD == _DELETE_RESIDUE)
        .select("doc_id")
        .collect()  # bounded by delete volume (~1% of the corpus)
    ]
    delete_docs(spark, dst, victims, log=lambda *_: None)
    return dst


def _q_index_bm25_after_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VERDICT r2 #6 — the MUTATION path oracle-checked end to end:
    tombstoned deletes (``mutate.delete_docs``) + the tombstone-adjusted
    query path must equal DuckDB BM25 over the corpus minus the victims
    (stats re-derived: N, avgdl, per-term df all shift)."""
    from same_same_spark.index.query import search_batch

    out = search_batch(
        spark, _entry_deleted_index_dir(spark, sf_dir), REF_QUERIES, k=REF_K
    )
    return _round6(out, "score").withColumn("rank", F.col("rank").cast("int"))


_SQL_INDEX_BM25_AFTER_DELETE = (
    "SELECT query_id, doc_id, score, rank::INTEGER AS rank FROM ("
    + duckdb_bm25_sql(
        f"(SELECT * FROM documents "
        f"WHERE doc_id % {_DELETE_MOD} <> {_DELETE_RESIDUE})",
        "doc_id", "text", REF_QUERIES, k=REF_K,
    )
    + ")"
)


def _q_filter_search_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VERDICT r2 #1 — FILTERED search riding the index (opt-in
    ``global_stats=True``): top-k with over-fetch + compiled-filter
    post-filter, widening until k survivors. Scores use GLOBAL corpus
    stats, so the oracle is full-corpus BM25 filtered afterwards. The
    filter shape mirrors the reference's combined FilterExpr truth
    tables (filter_test.go:185-204)."""
    from same_same_spark.api import SameSameSpark

    api = SameSameSpark(
        _docs(spark, sf_dir), id_col="doc_id", text_col="text",
        index_dir=_entry_index_dir(spark, sf_dir),
    )
    out = api.advanced_search(
        "table query join", k=10,
        filters={"lang": {"in": ["fr", "de"]}, "n_chars": {"gte": 200}},
        global_stats=True,
    )
    return _round6(out, "score").withColumn("rank", F.col("rank").cast("int"))


_SQL_FILTER_SEARCH_INDEXED = (
    """
WITH base AS (
"""
    + duckdb_bm25_sql(
        "documents", "doc_id", "text", [(0, "table query join")],
        k=1_000_000_000, round_score=None,
    )
    + """
),
survivors AS (
  SELECT b.doc_id, b.score
  FROM base b JOIN documents d ON b.doc_id = d.doc_id
  WHERE d.lang IN ('fr', 'de') AND d.n_chars >= 200
),
r AS (
  SELECT doc_id, score,
         row_number() OVER (
           ORDER BY round(score, 9) DESC, doc_id ASC
         )::INTEGER AS rank
  FROM survivors
)
SELECT doc_id, round(score, 6) AS score, rank FROM r WHERE rank <= 10
"""
)


def _q_index_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production read path: compressed-index BM25 with block-max
    pruning — rank- and score-identical to the naive scorer, so it
    shares bm25_topk's oracle."""
    from same_same_spark.index.query import search_batch

    out = search_batch(
        spark, _entry_index_dir(spark, sf_dir), REF_QUERIES, k=REF_K
    )
    return _round6(out, "score").withColumn("rank", F.col("rank").cast("int"))


def _q_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 — the reference's actual quote-search scoring model (TF-IDF
    embed + cosine over the whole store, tfidf.go:85-235 /
    search.go:16-42), sparse re-expression."""
    from same_same_spark.operators.tfidf import tfidf_topk

    out = tfidf_topk(
        _docs(spark, sf_dir), REF_QUERIES, k=REF_K,
        id_col="doc_id", text_col="text",
    )
    return _round6(out, "score").withColumn("rank", F.col("rank").cast("int"))


def _sql_tfidf_topk() -> str:
    from same_same_spark.operators.tfidf import duckdb_tfidf_sql

    return (
        "SELECT query_id, doc_id, score, rank::INTEGER AS rank FROM ("
        + duckdb_tfidf_sql("documents", "doc_id", "text", REF_QUERIES, k=REF_K)
        + ")"
    )


_SQL_TFIDF_TOPK = _sql_tfidf_topk()


def _q_tfidf_topk_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VERDICT r2 #4 — the reference's TF-IDF scoring model served from
    the posting INDEX (pushed term reads + per-doc aux table + bucket-
    local top-k; no corpus re-tokenization). Rank- and score-identical
    to the naive sparse path, so it shares tfidf_topk's oracle."""
    from same_same_spark.index.tfidf import tfidf_search_batch

    out = tfidf_search_batch(
        spark, _entry_index_dir(spark, sf_dir), REF_QUERIES, k=REF_K,
        log=lambda *_: None,
    )
    return _round6(out, "score").withColumn("rank", F.col("rank").cast("int"))


_CLIP_QUERY = "fast vector search index"
_CLIP_DIM = 32  # oracle needs dim <= 128 (chr() stays single-byte)


def _q_clip_text_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X11 — SimpleCLIP hash embedder (text path) + cosine top-k over the
    ASCII document subset (simple.go:75-106). doc_id % 5 == 0 bounds the
    oracle's md5 volume; the Spark path itself has no such limit."""
    from same_same_spark.pipeline.clip import ascii_filter_col, clip_text_topk

    docs = _docs(spark, sf_dir)
    docs = docs.filter(
        (F.col("doc_id") % 5 == 0) & ascii_filter_col(F.col("text"))
    )
    out = clip_text_topk(
        docs, _CLIP_QUERY, k=REF_K, dim=_CLIP_DIM,
        id_col="doc_id", text_col="text",
    )
    return _round6(out, "score").withColumn("rank", F.col("rank").cast("int"))


def _sql_clip_text_topk() -> str:
    from same_same_spark.pipeline.clip import duckdb_clip_sql

    return duckdb_clip_sql(
        "documents", "doc_id", "text", _CLIP_QUERY,
        k=REF_K, dim=_CLIP_DIM, where="doc_id % 5 = 0",
    )


_SQL_CLIP_TEXT_TOPK = _sql_clip_text_topk()


def _q_clip_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2/X11 image path — SimpleCLIP visual features (color histogram /
    texture edges with Go uint32-wraparound semantics / spatial grid,
    simple.go:107-259) over deterministic hex-keyed stand-in pixels (the
    real byte decode stays PIL-gated). Emits the first 16 spatial dims
    post-L2-normalisation; the norm folds in every nonzero histogram and
    texture entry, so all three sections are value-checked."""
    from same_same_spark.pipeline.clip import (
        clip_image_features,
        fake_decode_rgb_hex,
    )

    docs = (
        _docs(spark, sf_dir)
        .filter(F.col("doc_id") % 5 == 0)
        .select("doc_id")
        .withColumn("content", F.col("doc_id").cast("string").cast("binary"))
    )
    feats = clip_image_features(
        docs, decoder=lambda p: fake_decode_rgb_hex(p.decode(), 32)
    )
    out = feats.select(
        "doc_id",
        F.posexplode(F.slice("clip_emb", 385, 16)).alias("pos", "val"),
    )
    return out.select(
        "doc_id",
        (F.col("pos") + 384).cast("int").alias("i"),
        F.round("val", 6).alias("val"),
    )


def _sql_clip_image_features() -> str:
    from same_same_spark.pipeline.clip import duckdb_clip_image_sql

    return duckdb_clip_image_sql(
        "documents", "doc_id", size=32, where="doc_id % 5 = 0", out_dims=16
    )


_SQL_CLIP_IMAGE = _sql_clip_image_features()


def _q_tags_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X10 — comma-split + trim + drop-empties over a synthesized tags
    column (lang,source, with reference-style messy spacing)."""
    from same_same_spark.operators.tags import split_tags_col

    docs = _docs(spark, sf_dir).withColumn(
        "tags",
        F.concat(
            F.lit(" "), F.col("lang"), F.lit(" , "), F.col("source"),
            F.lit(", ,"),
        ),
    )
    return docs.select(
        "doc_id", F.explode(split_tags_col("tags")).alias("tag")
    )


def _q_event_age_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X9 — human-readable age buckets for events vs the fixed ref time."""
    from same_same_spark.operators.temporal import age_col

    ev = _events(spark, sf_dir)
    ref = F.to_timestamp(F.lit(_REF_TIME))
    return ev.select(
        "event_id", age_col(F.col("ts"), ref).alias("age")
    )


_SQL_EVENT_AGE_BUCKETS = f"""
WITH h AS (
  SELECT event_id,
         (epoch(TIMESTAMP '{_REF_TIME}') - epoch(ts)) / 3600.0 AS hours
  FROM events
),
b AS (
  SELECT event_id,
         floor(hours / (24 * 365.25))::BIGINT AS years,
         floor(hours / (24 * 30.44))::BIGINT AS months,
         floor(hours / 24.0)::BIGINT AS days,
         floor(hours)::BIGINT AS hrs
  FROM h
)
SELECT event_id,
  CASE
    WHEN years > 0 THEN CASE WHEN years = 1 THEN '1 year ago'
      ELSE years::VARCHAR || ' years ago' END
    WHEN months > 0 THEN CASE WHEN months = 1 THEN '1 month ago'
      ELSE months::VARCHAR || ' months ago' END
    WHEN days > 0 THEN CASE WHEN days = 1 THEN '1 day ago'
      ELSE days::VARCHAR || ' days ago' END
    WHEN hrs > 0 THEN CASE WHEN hrs = 1 THEN '1 hour ago'
      ELSE hrs::VARCHAR || ' hours ago' END
    ELSE 'just now'
  END AS age
FROM b
"""


# ---------------------------------------------------------------------------
# training-pipeline operators (dedup / ANN / text analysis / multimodal)
# ---------------------------------------------------------------------------


def _dup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ copies of every 5th doc (ids +100000) — deterministic
    duplicates so dedup operators have real work at sf0.01."""
    d = _docs(spark, sf_dir).select("doc_id", "text")
    extra = d.filter(F.col("doc_id") % 5 == 0).withColumn(
        "doc_id", F.col("doc_id") + 100000
    )
    return d.unionByName(extra)


_SQL_DUP_DOCS = (
    "SELECT doc_id, text FROM documents "
    "UNION ALL "
    "SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 5 = 0"
)


def _q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup groups over the duplicate-augmented corpus."""
    return dedup_ops.exact_dedup_groups(_dup_docs(spark, sf_dir))


def _q_shared_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level duplication (MOSS-style winnowing diagonals,
    pipeline/dedup.shared_span_pairs): doc pairs sharing ≥ 3 aligned
    fingerprints at one offset, with the span extent in chars —
    catches copied SUBSTRINGS whole-doc Jaccard structurally misses."""
    return dedup_ops.shared_span_pairs(
        _dup_docs(spark, sf_dir), min_fps=3, max_fp_df=30
    )


_SQL_SHARED_SPANS = dedup_ops.shared_span_sql(
    f"({_SQL_DUP_DOCS})", min_fps=3, max_fp_df=30
)


_SPAN_HDR = (
    "// Copyright Example Corp. All rights reserved.\\n"
    "// Licensed under the Apache License, Version 2.0\\n"
)


def _hdr_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents with a deterministic license header planted on every
    3rd doc — shared-span removal has real boilerplate to strip."""
    hdr = _SPAN_HDR.replace("\\n", "\n")
    d = _docs(spark, sf_dir).select("doc_id", "text")
    return d.withColumn(
        "text",
        F.when(F.col("doc_id") % 3 == 0, F.concat(F.lit(hdr), "text"))
        .otherwise(F.col("text")),
    )


_SQL_HDR_DOCS = (
    "SELECT doc_id, CASE WHEN doc_id % 3 = 0 THEN "
    f"replace('{_SPAN_HDR}', '\\n', chr(10)) || text "
    "ELSE text END AS text FROM documents"
)


def _q_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level dedup ACTION (pipeline/spans.remove_shared_spans):
    byte-identical shared spans (the planted license headers) stripped
    from every doc except each span group's min-id canonical keeper —
    remainders byte-exact. The df-based run-signature formulation, NOT
    the pairwise diagonals: linear in corpus size regardless of how
    many docs share a span."""
    from same_same_spark.pipeline.spans import remove_shared_spans

    out = remove_shared_spans(
        _hdr_docs(spark, sf_dir), min_df=3, min_span_chars=20,
        with_stats=True,
    )
    return out.select(
        "doc_id",
        F.length("text").alias("clean_len"),
        dedup_ops.hash60_col(F.col("text")).alias("clean_h60"),
        "n_spans_removed",
        "removed_chars",
    )


def _sql_span_dedup() -> str:
    from same_same_spark.pipeline.spans import remove_shared_spans_sql

    return f"""
WITH {remove_shared_spans_sql(f"({_SQL_HDR_DOCS})", "doc_id", "text",
                              min_df=3, min_span_chars=20)}
SELECT doc_id, length(text) AS clean_len,
       {dedup_ops.hash60_sql("text")} AS clean_h60,
       n_spans_removed, removed_chars
FROM clean
"""


_SQL_DEDUP_EXACT = f"""
WITH base AS ({_SQL_DUP_DOCS})
SELECT sha256(text) AS content_sha, min(doc_id) AS keep_id,
       count(*) AS n_copies
FROM base GROUP BY sha256(text)
"""


def _jaccard_pairs_ctes(shingle_n: int = 3, base: str = "base") -> str:
    """CTE chain computing exact shingle-Jaccard for all pairs of docs
    in ``base`` (columns doc_id, text) sharing ≥ 1 shingle; ends with
    CTE ``j`` = (id_a, id_b, jaccard DOUBLE). The single definition of
    the oracle-side shingle/candidate/Jaccard semantics — shared by the
    dedup_* entries and the training_mix pipeline so they cannot
    silently diverge. Claims the CTE names toks/sh/ex/sizes/cand/j."""
    return f"""toks AS (
  SELECT doc_id, {duckdb_tokens_sql('text')} AS toks FROM {base}
),
sh AS (
  SELECT doc_id, {word_shingles_sql('toks', shingle_n)} AS shingles FROM toks
),
ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
sizes AS (SELECT doc_id, len(shingles) AS n_sh FROM sh),
cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
j AS (
  SELECT id_a, id_b,
         n_inter / (sa.n_sh + sb.n_sh - n_inter)::DOUBLE AS jaccard
  FROM cand
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
)"""


def _exact_jaccard_sql(threshold: float, shingle_n: int = 3) -> str:
    """Exact shingle-Jaccard pairs ≥ threshold (DuckDB), over dup docs."""
    return f"""
WITH base AS ({_SQL_DUP_DOCS}),
{_jaccard_pairs_ctes(shingle_n)}
SELECT id_a, id_b, round(jaccard, 6) AS jaccard
FROM j WHERE jaccard >= {threshold}
"""


def _q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidates verified at Jaccard ≥ 0.9.

    Oracle note: the fixture contains NATURAL near-dup pairs with
    0.9 ≤ J < 1 (39 of 139 at sf0.01). The entry runs 8 bands × 2 rows:
    P(candidate | J) = 1 - (1 - J²)^8, ≈ 1 - 1.7e-6 at J = 0.9 — and the
    recall is *empirically pinned* to exactly 1 on this corpus at
    sf0.001/0.01 (test_dedup) and verified at sf0.1. rows=1 banding
    (bands=16) would make recall analytic (P(miss) ≤ 0.1^16) but floods
    verification: 259k candidate pairs at sf0.1 vs 3.1k for 8×2 — an 83×
    difference that grows with corpus size. For *deterministic* recall
    with bounded candidates see the dedup_prefix entry (prefix
    filtering). Verification stays exact-Jaccard-on-candidates.
    """
    out = dedup_ops.minhash_dedup_pairs(
        _dup_docs(spark, sf_dir), threshold=0.9, n_hashes=16, bands=8
    )
    return _round6(out, "jaccard")


def _q_lcs_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact longest-common-substring per near-dup candidate pair
    (suffix automaton, pipeline/lcs.py). Pairs come from the same
    recall-pinned 8×2 minhash banding as dedup_minhash, whose output
    equals the oracle's exact-Jaccard-≥0.9 pair set on this corpus."""
    from same_same_spark.pipeline.lcs import lcs_pairs

    docs = _dup_docs(spark, sf_dir)
    pairs = dedup_ops.minhash_dedup_pairs(
        docs, threshold=0.9, n_hashes=16, bands=8
    ).select("id_a", "id_b")
    return lcs_pairs(docs, pairs)


def _sql_lcs_pairs() -> str:
    from same_same_spark.pipeline.lcs import lcs_sql_tail

    return f"""
WITH base AS ({_SQL_DUP_DOCS}),
{_jaccard_pairs_ctes(3)},
pairs AS (SELECT id_a, id_b FROM j WHERE jaccard >= 0.9),
{lcs_sql_tail(docs="base", pairs="pairs")}
"""


def _q_chunk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size overlapping windows per doc (pure-column chunking,
    operators/chunk.py) — the passage-retrieval foundation."""
    from same_same_spark.operators.chunk import chunk_documents

    return chunk_documents(
        _docs(spark, sf_dir).select("doc_id", "text"), size=120, overlap=30
    )


def _sql_chunk_docs() -> str:
    from same_same_spark.operators.chunk import chunk_sql

    return chunk_sql("documents", size=120, overlap=30)


def _q_passage_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k passages for the reference query set: chunk windows score
    through the verified BM25 path (chunk-level stats), cuids decode
    back to (doc_id, chunk_id)."""
    from same_same_spark.operators.chunk import passage_topk

    out = passage_topk(
        _docs(spark, sf_dir), REF_QUERIES, k=REF_K, size=120, overlap=30
    )
    return _round6(out, "score").withColumn("rank", F.col("rank").cast("int"))


def _sql_passage_topk() -> str:
    from same_same_spark.operators.chunk import passage_topk_sql

    return (
        "SELECT query_id, doc_id, chunk_id, score, rank::INTEGER AS rank "
        "FROM ("
        + passage_topk_sql(
            "documents", REF_QUERIES, k=REF_K, size=120, overlap=30
        )
        + ")"
    )


def _q_lcs_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LCS-based overlap removal: each near-dup pair's measured shared
    substring stripped from the larger-id doc (union per doc,
    byte-exact remainder). Same pair generator as lcs_pairs."""
    from same_same_spark.pipeline.lcs import lcs_strip

    docs = _dup_docs(spark, sf_dir)
    pairs = dedup_ops.minhash_dedup_pairs(
        docs, threshold=0.9, n_hashes=16, bands=8
    ).select("id_a", "id_b")
    return lcs_strip(docs, pairs, min_chars=20, with_stats=True)


def _sql_lcs_strip() -> str:
    from same_same_spark.pipeline.lcs import lcs_strip_sql_ctes

    return f"""
WITH base AS ({_SQL_DUP_DOCS}),
{_jaccard_pairs_ctes(3)},
pairs AS (SELECT id_a, id_b FROM j WHERE jaccard >= 0.9),
{lcs_strip_sql_ctes(docs="base", min_chars=20)}
SELECT doc_id, text, n_spans_removed, removed_chars FROM clean
"""


def _q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive duplicate clusters: minhash pairs (same parameters as
    the dedup_minhash entry, whose recall vs exact Jaccard is pinned at
    1 on this corpus) → connected components → per-doc cluster
    assignment with sizes. ``cluster_id == doc_id`` marks survivors."""
    docs = _dup_docs(spark, sf_dir)
    pairs = dedup_ops.minhash_dedup_pairs(
        docs, threshold=0.9, n_hashes=16, bands=8
    )
    return dedup_ops.dedup_clusters(docs, pairs)


# Oracle: exact-Jaccard pairs (≡ the minhash pairs at pinned recall 1),
# closed transitively with a recursive CTE, min-id label per component.
_SQL_DEDUP_CLUSTERS = f"""
WITH RECURSIVE
pairs AS ({_exact_jaccard_sql(0.9)}),
e AS (SELECT id_a AS u, id_b AS v FROM pairs
      UNION SELECT id_b, id_a FROM pairs),
r(u, l) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM e) t
  UNION
  SELECT e.u, r.l FROM e JOIN r ON e.v = r.u
),
cc AS (SELECT u AS doc_id, min(l) AS cluster_id FROM r GROUP BY u),
base AS ({_SQL_DUP_DOCS}),
asg AS (
  SELECT b.doc_id, coalesce(cc.cluster_id, b.doc_id) AS cluster_id
  FROM base b LEFT JOIN cc ON b.doc_id = cc.doc_id
)
SELECT doc_id, cluster_id,
       count(*) OVER (PARTITION BY cluster_id) AS cluster_size
FROM asg
"""


def _q_dedup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram-Jaccard near-dup pairs ≥ 0.8."""
    out = dedup_ops.ngram_jaccard_pairs(_dup_docs(spark, sf_dir), threshold=0.8)
    return _round6(out, "jaccard")


def _q_dedup_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-filtered near-dup pairs at Jaccard ≥ 0.9 (AllPairs/SSJoin
    prefix lemma): candidates join only on each doc's rarest
    ``|S| - ceil(0.9|S|) + 1`` shingles under the (df ASC, shingle ASC)
    global order, so recall is DETERMINISTIC (no banding probability)
    and skewed frequent shingles never reach the join. Same exact-Jaccard
    oracle as dedup_minhash."""
    out = dedup_ops.prefix_jaccard_pairs(
        _dup_docs(spark, sf_dir), threshold=0.9
    )
    return _round6(out, "jaccard")


def _q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit tf-weighted SimHash per document."""
    return dedup_ops.simhash(_docs(spark, sf_dir))


_SQL_SIMHASH = f"""
WITH toks AS (
  SELECT doc_id, {duckdb_tokens_sql('text')} AS toks FROM documents
),
tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(toks) AS term FROM toks) GROUP BY 1, 2
),
th AS (SELECT doc_id, tf, {hash60_sql('term')} AS h FROM tf),
bits AS (
  SELECT doc_id, bit, sum(tf * (((h >> bit) & 1) * 2 - 1)) AS s
  FROM th, unnest(range(0, {dedup_ops.SIMHASH_BITS})) AS u(bit)
  GROUP BY 1, 2
)
SELECT doc_id,
       sum(CASE WHEN s > 0 THEN (1::BIGINT << bit) ELSE 0 END)::BIGINT
         AS simhash
FROM bits GROUP BY doc_id
"""


def _q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (brute, cosine ≥ 0.5)."""
    out = dedup_ops.embedding_near_dup_pairs(
        _emb(spark, sf_dir), threshold=0.5, method="brute"
    )
    return _round6(out, "cosine")


_SQL_DEDUP_EMBEDDING = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(a.emb, b.emb), 6) AS cosine
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.emb, b.emb) >= 0.5
"""


def _ann_queries(spark: SparkSession, sf_dir: str) -> list[tuple[int, list[float]]]:
    emb = _emb(spark, sf_dir)
    rows = (
        emb.filter(F.col("vec_id").isin(0, 1, 2))
        .select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
        .collect()
    )
    by_id = {int(r["vec_id"]): list(r["e"]) for r in rows}
    return [(i, by_id[i]) for i in sorted(by_id)]


def _q_ann_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for three query vectors."""
    out = ann_ops.brute_topk(
        _emb(spark, sf_dir), _ann_queries(spark, sf_dir), k=5
    )
    return _round6(out, "score")


_SQL_ANN_BRUTE = """
WITH q AS (
  SELECT vec_id::INTEGER AS query_id, embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id IN (0, 1, 2)
),
s AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(e.embedding::DOUBLE[], q.qv) AS score
  FROM embeddings e, q
  WHERE len(e.embedding) = len(q.qv)
),
r AS (
  SELECT query_id, vec_id, score,
         row_number() OVER (
           PARTITION BY query_id ORDER BY round(score, 9) DESC, vec_id ASC
         ) AS rank
  FROM s
)
SELECT query_id, vec_id, round(score, 6) AS score, rank::INTEGER AS rank
FROM r WHERE rank <= 5
"""


def _q_ann_hnsw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HNSW graph ANN top-5 for three query vectors. Candidates from 4
    hash-partitioned graphs (ef_search=128) are exact-cosine re-ranked,
    and at this scale they cover the true top-k, so the result is
    rank- and score-identical to brute force — the oracle IS the brute
    SQL (recall pinned in tests/test_hnsw.py, same contract as
    dedup_minhash)."""
    from same_same_spark.pipeline.hnsw import hnsw_topk

    out = hnsw_topk(
        _emb(spark, sf_dir), _ann_queries(spark, sf_dir), k=5,
        m=8, ef_construction=64, ef_search=128, n_graphs=4,
    )
    return _round6(out, "score")


def _q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-5, nprobe=3, centroids = per-label means."""
    emb = _emb(spark, sf_dir)
    cents = ann_ops.centroids_by_label(emb)
    out = ann_ops.ivf_topk(
        emb, _ann_queries(spark, sf_dir), cents, k=5, nprobe=3
    )
    return _round6(out, "score")


# Label-mean centroids + cosine-argmax assignment — the ONE SQL
# definition of `ann.centroids_by_label` + `ann.assign_centroids`,
# shared by the IVF and SemDeDup oracles so the twins cannot drift.
_IVF_ASSIGN_CTES = """e AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS emb FROM embeddings
),
long AS (
  SELECT vec_id, label, pos, emb[pos] AS v
  FROM e, unnest(range(1, len(emb) + 1)) AS u(pos)
),
cent AS (
  SELECT label::INTEGER AS centroid_id, pos, avg(v) AS m
  FROM long GROUP BY 1, 2
),
cnorm AS (SELECT centroid_id, sqrt(sum(m * m)) AS nc FROM cent GROUP BY 1),
vnorm AS (SELECT vec_id, sqrt(sum(v * v)) AS nv FROM long GROUP BY 1),
vc AS (  -- cosine(vector, centroid)
  SELECT l.vec_id, c.centroid_id,
         sum(l.v * c.m) / (any_value(vn.nv) * any_value(cn.nc)) AS csim
  FROM long l
  JOIN cent c ON c.pos = l.pos
  JOIN vnorm vn ON vn.vec_id = l.vec_id
  JOIN cnorm cn ON cn.centroid_id = c.centroid_id
  GROUP BY 1, 2
),
assign AS (
  SELECT vec_id, centroid_id FROM (
    SELECT vec_id, centroid_id,
           row_number() OVER (
             PARTITION BY vec_id ORDER BY round(csim, 9) DESC, centroid_id ASC
           ) AS rn
    FROM vc
  ) WHERE rn = 1
)"""

_SQL_ANN_IVF = "WITH " + _IVF_ASSIGN_CTES + """,
q AS (
  SELECT vec_id::INTEGER AS query_id, emb AS qv FROM e WHERE vec_id IN (0, 1, 2)
),
qc AS (  -- cosine(query, centroid), probe top-3
  SELECT query_id, centroid_id FROM (
    SELECT q.query_id, vc.centroid_id,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY round(vc.csim, 9) DESC, vc.centroid_id ASC
           ) AS rn
    FROM q JOIN vc ON vc.vec_id = q.query_id
  ) WHERE rn <= 3
),
cand AS (
  SELECT qc.query_id, a.vec_id
  FROM qc JOIN assign a ON a.centroid_id = qc.centroid_id
),
s AS (
  SELECT c.query_id, c.vec_id,
         list_cosine_similarity(e.emb, q.qv) AS score
  FROM cand c
  JOIN e ON e.vec_id = c.vec_id
  JOIN q ON q.query_id = c.query_id
  WHERE len(e.emb) = len(q.qv)
),
r AS (
  SELECT query_id, vec_id, score,
         row_number() OVER (
           PARTITION BY query_id ORDER BY round(score, 9) DESC, vec_id ASC
         ) AS rank
  FROM s
)
SELECT query_id, vec_id, round(score, 6) AS score, rank::INTEGER AS rank
FROM r WHERE rank <= 5
"""


def _q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH (8 hyperplanes, hamming ≤ 1) top-5 with exact re-rank."""
    out = ann_ops.lsh_topk(
        _emb(spark, sf_dir),
        _ann_queries(spark, sf_dir),
        k=5,
        n_planes=8,
        max_hamming=1,
    )
    return _round6(out, "score")


_PLANE_SQL = (
    "((" + hash60_sql("'p' || p::VARCHAR || '_' || d::VARCHAR")
    + " % 1048576) / 1048576.0) * 2 - 1"
)

_SQL_ANN_LSH = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
planes AS (
  SELECT p, d, {_PLANE_SQL} AS w
  FROM unnest(range(0, 8)) tp(p), unnest(range(0, 64)) td(d)
),
dots AS (
  SELECT e.vec_id, pl.p, sum(e.emb[pl.d + 1] * pl.w) AS dot
  FROM e, planes pl GROUP BY 1, 2
),
sig AS (
  SELECT vec_id,
         sum(CASE WHEN dot >= 0 THEN (1::BIGINT << p) ELSE 0 END)::BIGINT
           AS sig
  FROM dots GROUP BY 1
),
q AS (
  SELECT e.vec_id::INTEGER AS query_id, e.emb AS qv, s.sig AS qsig
  FROM e JOIN sig s ON s.vec_id = e.vec_id
  WHERE e.vec_id IN (0, 1, 2)
),
cand AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(e.emb, q.qv) AS score
  FROM e
  JOIN sig s ON s.vec_id = e.vec_id
  CROSS JOIN q
  WHERE len(e.emb) = len(q.qv)
    AND bit_count(xor(s.sig, q.qsig)) <= 1
),
r AS (
  SELECT query_id, vec_id, score,
         row_number() OVER (
           PARTITION BY query_id ORDER BY round(score, 9) DESC, vec_id ASC
         ) AS rank
  FROM cand
)
SELECT query_id, vec_id, round(score, 6) AS score, rank::INTEGER AS rank
FROM r WHERE rank <= 5
"""


def _ann_store_dir(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per content fingerprint) the persisted ANN store for
    the sf_dir's embeddings, with deterministic label-mean centroids so
    the DuckDB oracles reproduce them exactly."""
    import hashlib
    import os
    import tempfile

    from same_same_spark.pipeline import ann_store

    src = os.path.join(sf_dir, "embeddings.parquet")
    st = os.stat(src)
    tag = hashlib.md5(
        # v2 = batch-partitioned layout with manifest-gated liveness
        f"{src}|{st.st_size}|{st.st_mtime_ns}|v2".encode()
    ).hexdigest()[:10]
    out = f"{tempfile.gettempdir()}/ss_entry_ann_{tag}"
    if not os.path.exists(os.path.join(out, "manifest.json")):
        emb = _emb(spark, sf_dir)
        ann_store.build_ann_index(
            emb, out, n_planes=8, centroids=ann_ops.centroids_by_label(emb)
        )
    return out


def _hnsw_store_dir(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per content fingerprint) the persisted HNSW graph
    store for the sf_dir's embeddings — entry params match
    ann_hnsw_topk so persisted results are identical."""
    import hashlib
    import os
    import tempfile

    from same_same_spark.pipeline.hnsw import build_hnsw_store

    src = os.path.join(sf_dir, "embeddings.parquet")
    st = os.stat(src)
    tag = hashlib.md5(
        # bump the version suffix whenever HnswGraph construction
        # changes — the graphs are part of the content identity
        f"{src}|{st.st_size}|{st.st_mtime_ns}|hnsw-v2".encode()
    ).hexdigest()[:10]
    out = f"{tempfile.gettempdir()}/ss_entry_hnsw_{tag}"
    if not os.path.exists(os.path.join(out, "manifest.json")):
        build_hnsw_store(
            _emb(spark, sf_dir), out, m=8, ef_construction=64, n_graphs=4
        )
    return out


def _q_ann_hnsw_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HNSW probe against the PERSISTED graph store (adjacency reloaded,
    construction skipped) — result-identical to ann_hnsw_topk (build
    determinism), so it shares the brute oracle."""
    from same_same_spark.pipeline.hnsw import hnsw_topk_persisted

    out = hnsw_topk_persisted(
        spark,
        _hnsw_store_dir(spark, sf_dir),
        _ann_queries(spark, sf_dir),
        k=5,
        ef_search=128,
    )
    return _round6(out, "score")


_HNSW_REPAIR_DEAD = (0, 7, 21)


def _hnsw_repaired_store_dir(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per content fingerprint) an HNSW store that went
    through the full delete-heavy maintenance lifecycle: build →
    tombstone ids → edge-repair (tombstones compacted out of the
    adjacency). The end state is deterministic given the sequence, so
    it caches like the other scratch stores; completion = manifest
    present with the tombstones gone and a repair generation committed
    (a crash mid-sequence fails that predicate and rebuilds)."""
    import hashlib
    import json
    import os
    import tempfile

    from same_same_spark.pipeline.hnsw import (
        build_hnsw_store,
        delete_from_hnsw_store,
        repair_hnsw_store,
    )

    src = os.path.join(sf_dir, "embeddings.parquet")
    st = os.stat(src)
    tag = hashlib.md5(
        # the dead-id set and build params are part of the content
        # identity — changing _HNSW_REPAIR_DEAD or the build call must
        # invalidate the cached store, AND the oracle SQL's NOT IN
        # list must be kept in sync by hand
        f"{src}|{st.st_size}|{st.st_mtime_ns}|hnsw-repair-v2"
        f"|dead={_HNSW_REPAIR_DEAD}|m=8|efc=64|g=4".encode()
    ).hexdigest()[:10]
    out = f"{tempfile.gettempdir()}/ss_entry_hnswrep_{tag}"
    mf = os.path.join(out, "manifest.json")
    done = False
    if os.path.exists(mf):
        with open(mf) as f:
            m = json.load(f)
        done = "tomb_gen" not in m and int(m.get("gen", 0)) >= 1
    if not done:
        build_hnsw_store(
            _emb(spark, sf_dir), out, m=8, ef_construction=64, n_graphs=4
        )
        delete_from_hnsw_store(spark, out, list(_HNSW_REPAIR_DEAD))
        repair_hnsw_store(spark, out, mode="repair")
    return out


def _q_ann_hnsw_after_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HNSW probe after delete + EDGE REPAIR (pipeline/hnsw.py
    repair_hnsw_store): dead nodes are compacted out of the persisted
    adjacency — survivor neighborhoods bridge through the deleted
    nodes, orphans re-link, tombstones disappear so probes run at the
    plain beam width again. Candidates cover the true top-k (pinned in
    tests/test_hnsw.py), so the oracle is brute-force cosine over the
    SURVIVING vectors."""
    from same_same_spark.pipeline.hnsw import hnsw_topk_persisted

    out = hnsw_topk_persisted(
        spark,
        _hnsw_repaired_store_dir(spark, sf_dir),
        _ann_queries(spark, sf_dir),
        k=5,
        ef_search=128,
    )
    return _round6(out, "score")


_SQL_ANN_BRUTE_AFTER_REPAIR = """
WITH q AS (
  SELECT vec_id::INTEGER AS query_id, embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id IN (0, 1, 2)
),
s AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(e.embedding::DOUBLE[], q.qv) AS score
  FROM embeddings e, q
  WHERE len(e.embedding) = len(q.qv)
    AND e.vec_id NOT IN (0, 7, 21)  -- the deleted-then-repaired ids
),
r AS (
  SELECT query_id, vec_id, score,
         row_number() OVER (
           PARTITION BY query_id ORDER BY round(score, 9) DESC, vec_id ASC
         ) AS rank
  FROM s
)
SELECT query_id, vec_id, round(score, 6) AS score, rank::INTEGER AS rank
FROM r WHERE rank <= 5
"""


def _q_ann_lsh_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH probe against the PERSISTED store (partition-pruned read) —
    result-identical to the query-time path, so it shares its oracle."""
    from same_same_spark.pipeline import ann_store

    out = ann_store.lsh_topk_persisted(
        spark,
        _ann_store_dir(spark, sf_dir),
        _ann_queries(spark, sf_dir),
        k=5,
        max_hamming=1,
    )
    return _round6(out, "score")


def _q_ann_ivf_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF probe against the PERSISTED store (partition-pruned read) —
    result-identical to the query-time path, so it shares its oracle."""
    from same_same_spark.pipeline import ann_store

    out = ann_store.ivf_topk_persisted(
        spark,
        _ann_store_dir(spark, sf_dir),
        _ann_queries(spark, sf_dir),
        k=5,
        nprobe=3,
    )
    return _round6(out, "score")


def _q_euclidean_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6 — euclidean nearest-5 for three query vectors (distance ASC,
    vec_id ASC tie-break; dim-mismatched vectors dropped pre-score like
    the reference scan)."""
    from same_same_spark.operators.vector import euclidean_col

    e = _emb(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    qdf = spark.createDataFrame(
        [(qid, vec) for qid, vec in _ann_queries(spark, sf_dir)],
        "query_id INT, qvec ARRAY<DOUBLE>",
    )
    scored = (
        e.crossJoin(F.broadcast(qdf))
        .filter(F.size("emb") == F.size("qvec"))
        .select(
            "query_id",
            "vec_id",
            euclidean_col(F.col("emb"), F.col("qvec")).alias("dist"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc(F.round(F.col("dist"), 9)), F.asc("vec_id")
    )
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("query_id", "vec_id", "dist", "rank")
    )
    return _round6(out, "dist").withColumn("rank", F.col("rank").cast("int"))


_SQL_EUCLIDEAN_TOPK = """
WITH q AS (
  SELECT vec_id::INTEGER AS query_id, embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id IN (0, 1, 2)
),
s AS (
  SELECT q.query_id, e.vec_id,
         list_distance(e.embedding::DOUBLE[], q.qv) AS dist
  FROM embeddings e, q
  WHERE len(e.embedding) = len(q.qv)
),
r AS (
  SELECT query_id, vec_id, dist,
         row_number() OVER (
           PARTITION BY query_id ORDER BY round(dist, 9) ASC, vec_id ASC
         ) AS rank
  FROM s
)
SELECT query_id, vec_id, round(dist, 6) AS dist, rank::INTEGER AS rank
FROM r WHERE rank <= 5
"""


def _q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (hamming ≤ 3) over the dup-augmented
    corpus. Pigeonhole blocking (4 blocks over 60 bits) is exhaustive
    for distance ≤ 3, so the blocked result equals the all-pairs filter
    the oracle computes."""
    return dedup_ops.simhash_near_dup_pairs(
        _dup_docs(spark, sf_dir), max_hamming=3, n_blocks=4
    )


_SQL_SIMHASH_PAIRS = f"""
WITH base AS ({_SQL_DUP_DOCS}),
toks AS (
  SELECT doc_id, {duckdb_tokens_sql('text')} AS toks FROM base
),
tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(toks) AS term FROM toks) GROUP BY 1, 2
),
th AS (SELECT doc_id, tf, {hash60_sql('term')} AS h FROM tf),
bits AS (
  SELECT doc_id, bit, sum(tf * (((h >> bit) & 1) * 2 - 1)) AS s
  FROM th, unnest(range(0, {dedup_ops.SIMHASH_BITS})) AS u(bit)
  GROUP BY 1, 2
),
sh AS (
  SELECT doc_id,
         sum(CASE WHEN s > 0 THEN (1::BIGINT << bit) ELSE 0 END)::BIGINT
           AS simhash
  FROM bits GROUP BY doc_id
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       bit_count(xor(a.simhash, b.simhash))::INTEGER AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""


# ---------------------------------------------------------------------------
# source-parsing entries (S1-S3 + offline S4) over deterministic fixtures
# ---------------------------------------------------------------------------


def _write_fixture(name: str, content: str) -> str:
    import os
    import tempfile

    path = os.path.join(tempfile.gettempdir(), f"ss_entry_fix_{name}")
    with open(path + ".tmp", "w") as f:
        f.write(content)
    os.replace(path + ".tmp", path)
    return path


def _q_source_quotes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 — quotes parsing: separator/trim/malformed-skip semantics.
    The oracle derives id/metadata independently from the documented
    rules (builtin.go:70-89)."""
    from same_same_spark.sources import read_quotes_source

    path = _write_fixture(
        "quotes.txt",
        "To be or not to be — Shakespeare\n"
        "malformed line without separator\n"
        "one — two — three\n"
        "  Trimmed quote   —   Trimmed Author  \n"
        "left —  \n"
        " — right\n",
    )
    return read_quotes_source(spark, path).select(
        "id", "text", F.to_json("metadata").alias("metadata_json")
    )


_SQL_SOURCE_QUOTES = """
WITH v(text, author) AS (VALUES
  ('To be or not to be', 'Shakespeare'),
  ('Trimmed quote', 'Trimmed Author'))
SELECT 'quote_' || substr(sha256(text || '|' || author), 1, 16) AS id,
       text,
       '{"author":"' || author || '","namespace":"quotes"}' AS metadata_json
FROM v
"""


def _q_source_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 — CSV parsing: header→metadata, quoted commas, F5 empty-text
    skip, F9 namespace."""
    from same_same_spark.sources import read_csv_source

    path = _write_fixture(
        "src.csv",
        "doc,text,lang\n"
        "r1,hello world,en\n"
        'r2,"comma, quoted value",fr\n'
        "r3,,de\n"
        "r4,last row,es\n",
    )
    return read_csv_source(spark, path).select(
        "id", "text", F.to_json("metadata").alias("metadata_json")
    )


_SQL_SOURCE_CSV = """
WITH v(doc, text, lang) AS (VALUES
  ('r1', 'hello world', 'en'),
  ('r2', 'comma, quoted value', 'fr'),
  ('r4', 'last row', 'es')),
m AS (
  SELECT doc, text,
         '{"doc":"' || doc || '","lang":"' || lang ||
         '","namespace":"general"}' AS metadata_json
  FROM v
)
SELECT 'vec_' || substr(sha256(text || '|' || metadata_json), 1, 16) AS id,
       text, metadata_json
FROM m
"""


def _q_source_jsonl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 — JSONL parsing: text-field fallback chain, scalar-only
    metadata, malformed-line skip (file.go:145-209). Metadata key order
    is the inferred schema's alphabetical order, namespace last."""
    from same_same_spark.sources import read_jsonl_source

    path = _write_fixture(
        "src.jsonl",
        '{"text":"alpha bravo","lang":"en","year":2001}\n'
        '{"content":"charlie delta","lang":"fr"}\n'
        '{"quote":"golf hotel","flag":true}\n'
        "not json\n"
        '{"lang":"de"}\n',
    )
    return read_jsonl_source(spark, path).select(
        "id", "text", F.to_json("metadata").alias("metadata_json")
    )


_SQL_SOURCE_JSONL = """
WITH v(text, flag, lang, year) AS (VALUES
  ('alpha bravo', '', 'en', '2001'),
  ('charlie delta', '', 'fr', ''),
  ('golf hotel', 'true', '', '')),
m AS (
  SELECT text,
         '{"flag":"' || flag || '","lang":"' || lang || '","year":"' ||
         year || '","namespace":"general"}' AS metadata_json
  FROM v
)
SELECT 'vec_' || substr(sha256(text || '|' || metadata_json), 1, 16) AS id,
       text, metadata_json
FROM m
"""


def _q_source_hf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 (offline) — HF-export JSONL record mapping
    (huggingface.go:156-202): scalar metadata + injected
    source/dataset/namespace, records without the text field skipped."""
    from same_same_spark.sources import read_hf_export_source

    path = _write_fixture(
        "hf.jsonl",
        '{"text":"india juliet","label":1,"lang":"en"}\n'
        '{"text":"kilo lima","label":0,"lang":"fr"}\n'
        '{"label":2}\n',
    )
    return read_hf_export_source(
        spark, path, dataset="demo", namespace="hfns"
    ).select("id", "text", F.to_json("metadata").alias("metadata_json"))


_SQL_SOURCE_HF = """
WITH v(text, label, lang) AS (VALUES
  ('india juliet', '1', 'en'),
  ('kilo lima', '0', 'fr')),
m AS (
  SELECT text,
         '{"label":"' || label || '","lang":"' || lang ||
         '","source":"huggingface","dataset":"demo","namespace":"hfns"}'
           AS metadata_json
  FROM v
)
SELECT 'vec_' || substr(sha256(text || '|' || metadata_json), 1, 16) AS id,
       text, metadata_json
FROM m
"""


def _q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID per document."""
    return _docs(spark, sf_dir).select(
        "doc_id", textqc_ops.lang_id_col("text").alias("lang_guess")
    )


_SQL_LANG_ID = (
    f"SELECT doc_id, {textqc_ops.lang_id_sql('text')} AS lang_guess "
    "FROM documents"
)


def _q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality features + composite score per document."""
    cols = textqc_ops.quality_cols("text")
    out = _docs(spark, sf_dir).select(
        "doc_id", *[v.alias(k) for k, v in cols.items()]
    )
    return _round6(
        out, "stopword_ratio", "punct_ratio", "mean_token_len", "quality_score"
    )


def _sql_quality() -> str:
    qs = textqc_ops.quality_sql("text")
    return (
        "SELECT doc_id, "
        + ", ".join(
            f"{expr} AS {name}"
            if name in ("n_chars", "ws_tokens")
            else f"round({expr}, 6) AS {name}"
            for name, expr in qs.items()
        )
        + " FROM documents"
    )


def _q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish token counts per document."""
    return _docs(spark, sf_dir).select(
        "doc_id",
        textqc_ops.ws_token_count_col("text").cast("bigint").alias("ws_tokens"),
        textqc_ops.bpe_token_count_col("text").cast("bigint").alias("bpe_tokens"),
    )


def _sql_token_counts() -> str:
    tc = textqc_ops.token_count_sql("text")
    return (
        f"SELECT doc_id, ({tc['ws_tokens']})::BIGINT AS ws_tokens, "
        f"({tc['bpe_tokens']})::BIGINT AS bpe_tokens FROM documents"
    )


def _q_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style quality scoring: a bigram LM (add-0.5 smoothing)
    trained on the doc_id%10==0 reference slice scores every document
    with its mean bigram log-prob (pipeline/lm.py). The oracle pins
    (n_bigrams, avg_logp); perplexity = exp(-avg_logp) is derived and
    last-ulp-amplifying, so it stays out of the hash."""
    from same_same_spark.pipeline import lm as lm_ops

    docs = _docs(spark, sf_dir)
    model = lm_ops.train_bigram_lm(
        docs.filter(F.col("doc_id") % 10 == 0), alpha=0.5
    )
    return lm_ops.lm_perplexity(docs, model).select(
        "doc_id", "n_bigrams", "avg_logp"
    )


def _sql_lm_perplexity() -> str:
    from same_same_spark.pipeline import lm as lm_ops

    return lm_ops.lm_perplexity_sql(alpha=0.5)


def _q_kn_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram scoring (pipeline/lm.py,
    train_kn_lm — the smoothing KenLM/CCNet actually use): absolute
    discounting with continuation-count backoff, UNK-floored so OOV
    events stay finite. Same reference slice and output contract as
    lm_perplexity; the oracle re-derives the marginals, fan-outs,
    continuation counts and the interpolated probability."""
    from same_same_spark.pipeline import lm as lm_ops

    docs = _docs(spark, sf_dir)
    model = lm_ops.train_kn_lm(docs.filter(F.col("doc_id") % 10 == 0))
    return lm_ops.lm_perplexity(docs, model).select(
        "doc_id", "n_bigrams", "avg_logp"
    )


def _sql_kn_perplexity() -> str:
    from same_same_spark.pipeline import lm as lm_ops

    return lm_ops.kn_perplexity_sql()


def _q_lm_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail buckets per lang stratum: exact
    interpolated tercile cuts of avg_logp (Spark percentile ≡ DuckDB
    quantile_cont, the corpus_profile contract), head = the
    least-perplexed third; no-evidence docs get a NULL bucket."""
    from same_same_spark.pipeline import lm as lm_ops

    docs = _docs(spark, sf_dir)
    model = lm_ops.train_bigram_lm(
        docs.filter(F.col("doc_id") % 10 == 0), alpha=0.5
    )
    return lm_ops.lm_buckets(docs, model, strata_col="lang")


def _sql_lm_buckets() -> str:
    from same_same_spark.pipeline import lm as lm_ops

    return lm_ops.lm_buckets_sql(alpha=0.5, strata_expr="lang")


def _q_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (k=8, w=4) per document."""
    return textqc_ops.winnow_fingerprints(
        _docs(spark, sf_dir), id_col="doc_id", text_col="text", k=8, w=4
    )


def _q_training_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-corpus preparation (pipeline/mix.py): quality
    gate ≥ 0.72 → exact dedup → fuzzy dedup (minhash pairs at the
    pinned-recall parameters → connected components → min-id survivor)
    → per-language mix sampling → train/val/test assignment. One lazy
    plan; the oracle composes the same six stages in SQL."""
    from same_same_spark.pipeline.mix import MixConfig, prepare_training_corpus

    d = _docs(spark, sf_dir).select("doc_id", "text", "lang")
    extra = d.filter(F.col("doc_id") % 5 == 0).withColumn(
        "doc_id", F.col("doc_id") + 100000
    )
    base = d.unionByName(extra)
    cfg = MixConfig(
        min_quality=0.72,
        exact=True,
        fuzzy_threshold=0.9,
        fractions=_MIX_FRACTIONS,
        default_fraction=0.35,
        test_frac=0.1,
        val_frac=0.1,
        seed="mix1",
    )
    return prepare_training_corpus(base, cfg).select("doc_id", "lang", "split")


def _sql_training_mix() -> str:
    score = textqc_ops.quality_sql("text")["quality_score"]
    sample_where = sampling_ops.sample_stratified_sql(
        "lang", "doc_id", _MIX_FRACTIONS, seed="mix1", default_fraction=0.35
    )
    split_expr = sampling_ops.assign_splits_sql(
        "doc_id", 0.1, 0.1, seed="mix1:split"
    )
    return f"""
WITH RECURSIVE
base AS (
  SELECT doc_id, text, lang FROM documents
  UNION ALL
  SELECT doc_id + 100000, text, lang FROM documents WHERE doc_id % 5 = 0
),
q AS (SELECT * FROM base WHERE ({score}) >= 0.72),
exd AS (
  SELECT q.* FROM q
  JOIN (SELECT min(doc_id) AS doc_id FROM q GROUP BY sha256(text)) k
  USING (doc_id)
),
{_jaccard_pairs_ctes(3, base='exd')},
pairs AS (SELECT id_a, id_b FROM j WHERE jaccard >= 0.9),
e AS (SELECT id_a AS u, id_b AS v FROM pairs
      UNION SELECT id_b, id_a FROM pairs),
r(u, l) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM e) t
  UNION
  SELECT e.u, r.l FROM e JOIN r ON e.v = r.u
),
cc AS (SELECT u AS doc_id, min(l) AS cluster_id FROM r GROUP BY u),
surv AS (
  SELECT exd.* FROM exd LEFT JOIN cc USING (doc_id)
  WHERE coalesce(cc.cluster_id, exd.doc_id) = exd.doc_id
),
samp AS (SELECT * FROM surv WHERE {sample_where})
SELECT doc_id, lang, {split_expr} AS split FROM samp
"""


def _q_sample_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budget-capped sampling (pipeline/sampling.sample_quota): cap en
    at ~120 docs and de at ~60, keep other strata whole — one tiny
    totals pass + the zero-shuffle hash filter."""
    out = sampling_ops.sample_quota(
        _docs(spark, sf_dir).select("doc_id", "lang"),
        {"en": 120, "de": 60},
        strata_col="lang",
        seed="quota1",
    )
    return out.select("doc_id", "lang")


_SQL_SAMPLE_QUOTA = f"""
SELECT doc_id, lang FROM (
{sampling_ops.sample_quota_sql(
    "(SELECT doc_id, lang FROM documents)",
    {"en": 120, "de": 60},
    strata_col="lang",
    seed="quota1",
)}
)
"""


def _q_corpus_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card statistics per language (pipeline/profile.py): doc
    counts, token totals/means, EXACT interpolated p50/p90 token
    quantiles, mean quality, distinct-content counts and dup rate —
    one groupBy(lang) pass."""
    from same_same_spark.pipeline.profile import corpus_profile

    out = corpus_profile(_docs(spark, sf_dir), strata_col="lang")
    return _round6(
        out, "mean_tokens", "p50_tokens", "p90_tokens", "mean_quality",
        "dup_rate",
    )


def _sql_corpus_profile() -> str:
    from same_same_spark.pipeline.profile import corpus_profile_sql

    return f"""
SELECT stratum, n_docs, total_tokens,
       round(mean_tokens, 6) AS mean_tokens,
       round(p50_tokens, 6) AS p50_tokens,
       round(p90_tokens, 6) AS p90_tokens,
       round(mean_quality, 6) AS mean_quality,
       n_distinct_texts,
       round(dup_rate, 6) AS dup_rate
FROM ({corpus_profile_sql('documents')})
"""


def _q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence packing (pipeline/pack.py): each doc's
    deterministic (shard, pack_id, pack_offset) in the GPT-style
    concat-and-split token stream — per-shard cumulative sums, no
    global window. The oracle recomputes the identical arithmetic in
    DuckDB (same md5-60bit shard/order hash, same whitespace token
    count), so a green hash pins the full packing layout."""
    from same_same_spark.pipeline.pack import pack_sequences

    return pack_sequences(
        _docs(spark, sf_dir).select("doc_id", "text"),
        seq_len=512, n_shards=8,
    )


def _sql_pack_sequences() -> str:
    from same_same_spark.pipeline.pack import pack_sequences_sql

    return pack_sequences_sql("documents", seq_len=512, n_shards=8)


def _q_profile_index_fed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-fed dataset card (pipeline/profile_index.py, VERDICT r3
    #6): token-length stats decoded from the tombstoned entry index's
    OWN doclen tables — one sync folds the committed groups and the
    tombstone adjustment; the card never re-tokenizes the corpus. The
    oracle recomputes the same stats from scratch (DuckDB tokenizer
    twin over the surviving docs), so a green hash proves the index's
    view of the corpus equals a full recomputation — including the
    delete adjustment and the exact percentile interpolation."""
    import atexit
    import shutil
    import tempfile

    from same_same_spark.pipeline.profile_index import (
        index_profile_card,
        index_profile_init,
        index_profile_sync,
    )

    idx = _entry_deleted_index_dir(spark, sf_dir)
    store = tempfile.mkdtemp(prefix="ss_entry_pidx_")
    shutil.rmtree(store)
    atexit.register(shutil.rmtree, store, True)
    index_profile_init(spark, store, idx)
    index_profile_sync(spark, store, log=lambda *_: None)
    return _round6(
        index_profile_card(spark, store), "mean_dl", "p50_dl", "p90_dl"
    )


def _sql_profile_index_fed() -> str:
    return f"""
WITH dl AS (
  SELECT coalesce(len({duckdb_tokens_sql('text')}), 0)::BIGINT AS dl
  FROM documents WHERE doc_id % {_DELETE_MOD} <> {_DELETE_RESIDUE}
)
SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS total_dl,
       round(avg(dl), 6) AS mean_dl,
       round(quantile_cont(dl, 0.5), 6) AS p50_dl,
       round(quantile_cont(dl, 0.9), 6) AS p90_dl
FROM dl
"""


def _q_profile_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained dataset card (pipeline/profile.py
    store): two appends + one delete folded into persisted mergeable
    state (scalar sums, an exact token-length histogram, content-hash
    counts); the card is then derived from state alone — no corpus
    rescan. The oracle recomputes the same card from scratch over the
    surviving documents, so a green hash proves the incremental path
    is value-identical to a full batch profile."""
    import shutil
    import tempfile

    from same_same_spark.pipeline.profile import (
        profile_store_card,
        profile_store_init,
        profile_store_update,
    )

    docs = _docs(spark, sf_dir)
    # unique scratch dir per call (a fixed shared path would let
    # concurrent runs clobber each other's store mid-update), removed
    # at process exit — AFTER the returned lazy DataFrame has been
    # collected by whoever evaluates it
    import atexit

    store = tempfile.mkdtemp(prefix="ss_entry_pstore_")
    shutil.rmtree(store)  # init re-creates; mkdtemp only claimed a name
    atexit.register(shutil.rmtree, store, True)
    profile_store_init(spark, store)
    profile_store_update(
        spark, store, docs.filter(F.col("doc_id") % 2 == 0),
        log=lambda *_: None,
    )
    profile_store_update(
        spark, store, docs.filter(F.col("doc_id") % 2 == 1),
        log=lambda *_: None,
    )
    profile_store_update(
        spark, store, docs.filter(F.col("doc_id") % 7 == 0),
        delete=True, log=lambda *_: None,
    )
    out = profile_store_card(spark, store)
    return _round6(
        out, "mean_tokens", "p50_tokens", "p90_tokens", "mean_quality",
        "dup_rate",
    )


def _sql_profile_incremental() -> str:
    from same_same_spark.pipeline.profile import corpus_profile_sql

    surviving = "(SELECT * FROM documents WHERE doc_id % 7 <> 0)"
    return f"""
SELECT stratum, n_docs, total_tokens,
       round(mean_tokens, 6) AS mean_tokens,
       round(p50_tokens, 6) AS p50_tokens,
       round(p90_tokens, 6) AS p90_tokens,
       round(mean_quality, 6) AS mean_quality,
       n_distinct_texts,
       round(dup_rate, 6) AS dup_rate
FROM ({corpus_profile_sql(surviving)})
"""


def _q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (pipeline/decontam.py): flag every
    train doc sharing an 8-gram shingle with the derived eval set
    (docs with doc_id % 89 = 0 — members are trivially contaminated
    with themselves; everyone else is judged on natural overlap). Eval
    shingles are 60-bit-hashed and broadcast; one shuffle keyed by
    doc_id."""
    d = _docs(spark, sf_dir).select("doc_id", "text")
    ev = d.filter(F.col("doc_id") % 89 == 0)
    out = decontam_ops.contamination_flags(d, ev, n=8)
    return _round6(out, "hit_frac")


# round hit_frac to 6dp to match the Spark side's _round6
_SQL_CONTAMINATION = f"""
SELECT doc_id, n_shingles, n_hit_shingles,
       round(hit_frac, 6) AS hit_frac, contaminated
FROM ({decontam_ops.contamination_sql(
    "documents",
    "(SELECT doc_id, text FROM documents WHERE doc_id % 89 = 0)",
    n=8,
)})
"""


# The synthetic corpus has no punctuation, so the C4 entry runs on a
# handcrafted fixture that exercises every rule: kept/dropped lines,
# sentence minimum, both blocklist terms, quotes, and the empty doc.
_C4_FIXTURE = [
    (1, "This is a proper sentence with words.\nshort line\n"
        "Another good sentence follows right here!\nno punct here at all"),
    (2, "Lorem Ipsum dolor sit amet. This has three words? Yes it does. "
        "And more!"),
    (3, "function f() { return 1; }"),
    (4, ""),
    (5, 'He said "quoted line ends with a quote."\n'
        "Five words ending right now."),
    (6, "One good sentence right here. Two good sentences right here! "
        "Three good sentences right here?"),
]


def _q_c4_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 cleaning heuristics (Raffel et al. 2020 §2.2): line filter
    (terminal punctuation + ≥5 words) and doc flags (≥3 sentences,
    blocklist) over a fixture covering every rule."""
    df = spark.createDataFrame(_C4_FIXTURE, "doc_id LONG, text STRING")
    flags = textqc_ops.c4_doc_flags("text")
    return df.select(
        "doc_id",
        textqc_ops.c4_line_filter("text").alias("kept_lines"),
        *[v.alias(k) for k, v in flags.items()],
    )


def _sql_c4_filter() -> str:
    def esc(t: str) -> str:
        return t.replace("\\", "\\\\").replace("'", "''").replace("\n", "\\n")

    values = ", ".join(f"({i}, E'{esc(t)}')" for i, t in _C4_FIXTURE)
    fs = textqc_ops.c4_doc_flags_sql("text")
    return (
        f"WITH d(doc_id, text) AS (VALUES {values}) SELECT doc_id, "
        + textqc_ops.c4_line_filter_sql("text")
        + " AS kept_lines, "
        + ", ".join(f"{e} AS {k}" for k, e in fs.items())
        + " FROM d"
    )


# PII entry fixture: the synthetic corpus carries no PII, so the entry
# exercises the patterns on handcrafted rows (multi-hit, boundary
# cases, clean, empty) — both engines see literally the same rows.
_PII_FIXTURE = [
    (1, "contact bob.smith+x@example.co.uk or 10.0.0.1 and "
        "alice@test.org done"),
    (2, "two mails x@y.io z@w.ai one ip 8.8.8.8 and a version 1.2.3"),
    (3, "ip-ish 999.1.2.3 still matches the mechanical ipv4 pattern"),
    (4, "nothing sensitive at all"),
    (5, ""),
]


def _q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (pipeline/textqc.redact_pii): chained
    regexp_replace with per-type counts — pure column math that runs
    at any scale; patterns restricted to Java-regex/RE2-identical
    syntax so the twin is exact."""
    df = spark.createDataFrame(_PII_FIXTURE, "doc_id LONG, text STRING")
    flags = textqc_ops.redact_pii("text")
    return df.select("doc_id", *[v.alias(k) for k, v in flags.items()])


def _sql_pii_redact() -> str:
    values = ", ".join(
        "({}, '{}')".format(i, t.replace("'", "''"))
        for i, t in _PII_FIXTURE
    )
    fs = textqc_ops.redact_pii_sql("text")
    return (
        f"WITH d(doc_id, text) AS (VALUES {values}) SELECT doc_id, "
        + ", ".join(f"{e} AS {k}" for k, e in fs.items())
        + " FROM d"
    )


def _q_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE trainer statistics (pipeline/bpe.py): adjacent-symbol pair
    frequencies over the word-frequency table — the SQL-expressible
    foundation the iterative merge loop selects its argmax from.
    Word counting is the only corpus-proportional pass; pairs explode
    over the vocabulary-sized word table."""
    from same_same_spark.pipeline import bpe as bpe_ops

    return bpe_ops.initial_pair_counts(_docs(spark, sf_dir), top=100)


def _sql_bpe_pair_counts() -> str:
    from same_same_spark.pipeline import bpe as bpe_ops

    return bpe_ops.initial_pair_counts_sql("documents", "text", 100)


def _q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE train + encode end to end (pipeline/bpe.py): learn 40
    merges over the corpus (deterministic: argmax by count DESC, pair
    ASC), then encode every document with them. The merge loop is
    iterative (not SQL-expressible — no oracle_sql entry; the driver
    records the rows-only check); merge determinism, local==
    distributed trainer identity, and encoder==trainer symbol tables
    are pinned in tests/test_bpe.py."""
    from same_same_spark.pipeline import bpe as bpe_ops

    docs = _docs(spark, sf_dir)
    model = bpe_ops.train_bpe(docs, n_merges=40, mode="local")
    enc = bpe_ops.bpe_encode(docs, model)
    return enc.select(
        "doc_id",
        "n_subwords",
        F.array_join(F.slice("bpe_tokens", 1, 8), " ").alias("head_subwords"),
    ).orderBy("doc_id")


# Audio fixture: deterministic int16 mono clips (no RNG) covering a
# square wave, a modular ramp, an alternating-sign series, a single
# sample and silence. The Spark side ENCODES each to WAV bytes, decodes
# with the stdlib codec and computes features; the oracle recomputes
# the features straight from the same literal sample arrays — pinning
# encode→decode round-trip AND feature math cross-engine.
def _audio_fixture() -> list[tuple[int, int, list[int]]]:
    sq = [12000 if (i % 8) < 4 else -12000 for i in range(64)]
    ramp = [(i * 997) % 24001 - 12000 for i in range(80)]
    alt = [(-1) ** i * (100 + 7 * i) for i in range(33)]
    return [
        (1, 8000, sq),
        (2, 16000, ramp),
        (3, 11025, alt),
        (4, 22050, [4242]),
        (5, 8000, [0] * 16),
    ]


def _q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio pipeline end to end (pipeline/audiocodec + multimodal):
    int16 samples → PCM16 WAV bytes → stdlib decode → per-clip scalar
    features (duration, RMS, peak, zero-crossing rate) through the
    mapInPandas Arrow path. The oracle recomputes the features from
    the same literal samples — a mismatch anywhere in the header
    writer, chunk parser, normalization or feature math fails the
    hash."""
    import numpy as np

    from same_same_spark.pipeline import audiocodec
    from same_same_spark.pipeline.multimodal import decode_audio_features
    from pyspark.sql.types import BinaryType

    df = spark.createDataFrame(
        _audio_fixture(), "doc_id LONG, sr INT, samples ARRAY<INT>"
    )
    enc = F.udf(
        lambda sr, s: audiocodec.encode_wav(
            np.array(s, dtype="<i2"), sr
        ),
        BinaryType(),
    )
    wav = df.select("doc_id", enc("sr", "samples").alias("content"))
    return decode_audio_features(wav).orderBy("doc_id")


# FLAC twins of the SAME audio fixture, produced once by the
# spec-derived encoder in tests/test_flaccodec.py (the product ships
# decode only, by design) and embedded as constants: clip 1 = FIXED
# order-2 subframe with 5 wasted bits (±12000 = 375<<5), clip 2 = LPC
# order 2 with 4 Rice partitions, clip 3 = VERBATIM, clips 4/5 =
# CONSTANT; all carry header CRC-8, frame CRC-16 and the STREAMINFO
# MD5, which decode_flac verifies. The oracle recomputes the features
# from the literal samples — one shared feature contract for WAV and
# FLAC, so this entry is sole evidence for the FLAC bitstream decoder
# (pipeline/flaccodec.py) end to end.
_FLAC_BLOBS: dict[int, str] = {
    1: (
        "664c6143800000220040004000000000000001f400f000000040b5910aed02ab"
        "20436d63f0233a289309fff86008003f061509772ee04c01001ed9ee401001ee"
        "1edc01001ed9ee401001ee1edc01001ed9ee401001ee1edc01001ed9ee401001"
        "ee1edc01001ed9ee401001ee1edc01001ed9ee401001ee1edc01001ed9ee4010"
        "01ee1edc01001ed9ee4010005654"
    ),
    2: (
        "664c6143800000220050005000000000000003e800f0000000506307c52d2dd2"
        "149ae5ff526ec3a8991efff86008004f5142d120d505943ff8004a665a4af5aa"
        "d4beeb6cf05187081430c81c410208d04e82b000d91800d96413608b03d81ac0"
        "b604b01f80bc03e00f0008044043203102081440ba06d03e823413a0ac003646"
        "00365904d822c0f606b02f813c07e02f00fc803c00201101080b407a04d02e81"
        "b40fa08d04e82b000d91800d96413608f03f81bc0bc05321"
    ),
    3: (
        "664c6143800000220021002100000000000002b110f0000000212870b05b5a23"
        "b94a24e5bf8ddf45c8c7fff8600800205b020064ff950072ff870080ff79008e"
        "ff6b009cff5d00aaff4f00b8ff4100c6ff3300d4ff2500e2ff1700f0ff0900fe"
        "fefb010cfeed011afedf0128fed10136fec3014480c8"
    ),
    4: (
        "664c61438000002200010001000000000000056220f000000001951da941a924"
        "f156dd15a49237f69089fff860080000bb0010922b4e"
    ),
    5: (
        "664c6143800000220010001000000000000001f400f00000001070bc8f4b72a8"
        "6921468bf8e8441dce51fff86008000f96000000ae85"
    ),
}


def _q_flac_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAC pipeline end to end (pipeline/flaccodec + audiocodec
    dispatch + multimodal.decode_audio_features): embedded FLAC
    bitstreams → sniff → full spec decode (Rice residuals, fixed + LPC
    predictors, wasted bits, CRC-8/CRC-16/MD5 checks) → per-clip
    features. The oracle recomputes the features from the same literal
    samples the blobs encode — any decode defect fails the hash."""
    rows = [(i, bytearray(bytes.fromhex(h))) for i, h in _FLAC_BLOBS.items()]
    from same_same_spark.pipeline.multimodal import decode_audio_features

    df = spark.createDataFrame(rows, "doc_id LONG, content BINARY")
    return decode_audio_features(df).orderBy("doc_id")


def _sql_audio_features() -> str:
    values = ", ".join(
        f"({i}, {sr}, {list(s)})" for i, sr, s in _audio_fixture()
    )
    return f"""
WITH d(doc_id, sr, samples) AS (VALUES {values})
SELECT doc_id,
  sr::INTEGER AS sample_rate,
  1::INTEGER AS n_channels,
  len(samples)::BIGINT AS n_frames,
  round(len(samples) / sr::DOUBLE, 6) AS duration_sec,
  round(sqrt(list_sum(list_transform(samples,
        x -> (x/32768.0)*(x/32768.0))) / len(samples)), 6) AS rms,
  round(list_max(list_transform(samples, x -> abs(x)/32768.0)), 6) AS peak,
  round(CASE WHEN len(samples) > 1 THEN
      len(list_filter(range(2, len(samples)+1),
          i -> samples[i-1]*samples[i] < 0)) / (len(samples)-1)::DOUBLE
    ELSE 0.0 END, 6) AS zcr
FROM d
"""


# Video fixture: (doc_id, frame_count) clips whose frame pixels follow
# a shared modular formula — the Spark side BUILDS real AVI bytes
# (uncompressed DIB), container-parses + frame-samples + decodes them,
# and the oracle recomputes the sampled frames' mean-RGB straight from
# the formula. A mismatch anywhere in the RIFF writer, parser, DIB
# row/stride/orientation math or the mid-bucket sampler fails the hash.
_VIDEO_CLIPS = [(1, 5), (2, 9), (3, 2)]
_VID_H, _VID_W, _VID_FPS, _VID_N = 6, 8, 4, 2


def _q_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video pipeline end to end (pipeline/videocodec + multimodal):
    formula frames → AVI (DIB) bytes → parse → deterministic
    mid-bucket frame sampling → decode → per-frame mean-RGB features
    through the mapInPandas Arrow path."""
    import numpy as np

    from same_same_spark.pipeline.multimodal import decode_video_frames
    from same_same_spark.pipeline.videocodec import dib_frame, encode_avi

    def frame(t: int) -> np.ndarray:
        yy, xx = np.mgrid[0 : _VID_H, 0 : _VID_W]
        r = (17 * t + 3 * xx + 5 * yy) % 256
        g = (29 * t + 7 * xx + 2 * yy) % 256
        b = (11 * t + xx + yy) % 256
        return np.stack([r, g, b], axis=-1).astype(np.uint8)

    rows = [
        (
            doc_id,
            encode_avi(
                [dib_frame(frame(t)) for t in range(total)],
                _VID_W,
                _VID_H,
                fps=_VID_FPS,
            ),
        )
        for doc_id, total in _VIDEO_CLIPS
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, content BINARY")
    out = decode_video_frames(df, n_frames=_VID_N)
    return out.select(
        "doc_id",
        "frame_idx",
        "time_sec",
        "height",
        "width",
        F.round(F.element_at("features", 1), 6).alias("r_mean"),
        F.round(F.element_at("features", 2), 6).alias("g_mean"),
        F.round(F.element_at("features", 3), 6).alias("b_mean"),
    )


def _sql_video_frames() -> str:
    values = ", ".join(f"({i}, {t})" for i, t in _VIDEO_CLIPS)
    return f"""
WITH clips(doc_id, total) AS (VALUES {values}),
sel AS (
  SELECT doc_id,
         unnest([floor(total * 0.25)::INT,
                 floor(total * 0.75)::INT]) AS frame_idx
  FROM clips
),
pix AS (
  SELECT x.range::INT AS x, y.range::INT AS y
  FROM range(0, {_VID_W}) x, range(0, {_VID_H}) y
)
SELECT doc_id,
  frame_idx,
  frame_idx / {_VID_FPS}.0 AS time_sec,
  {_VID_H}::INTEGER AS height,
  {_VID_W}::INTEGER AS width,
  round(avg(((17*frame_idx + 3*x + 5*y) % 256) / 255.0), 6) AS r_mean,
  round(avg(((29*frame_idx + 7*x + 2*y) % 256) / 255.0), 6) AS g_mean,
  round(avg(((11*frame_idx + x + y) % 256) / 255.0), 6) AS b_mean
FROM sel, pix
GROUP BY doc_id, frame_idx
"""


# Intra-doc line-dedup fixture: the synthetic corpus is single-line
# text, so the entry exercises the removal rules on handcrafted rows
# covering every edge (trimmed-form repeats, blank-line preservation,
# trailing newline, cross-paragraph repeats) — both engines see
# literally the same rows.
_LINE_DEDUP_FIXTURE = [
    (1, "MIT License\nCopyright (c) 2020\nMIT License\nreal content"),
    (2, "  indented repeat  \nindented repeat\nunique line"),
    (3, "para one\n\npara one\n\npara two\n\n\npara two"),
    (4, "a\n\n\na\n\nb"),
    (5, "no dups here\nat all"),
    (6, "trail\ntrail\n"),
    (7, ""),
    (8, "single"),
]


def _q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repeated-line removal
    (pipeline/textqc.dedup_lines_cols) — the ACTION companion to the
    Gopher repetition metrics: first occurrence kept (trimmed-form
    comparison), blank lines preserved. Pure column math per row, no
    shuffle — runs at any corpus size."""
    df = spark.createDataFrame(_LINE_DEDUP_FIXTURE, "doc_id LONG, text STRING")
    cols = textqc_ops.dedup_lines_cols("text")
    return df.select("doc_id", *[v.alias(k) for k, v in cols.items()])


def _sql_line_dedup() -> str:
    def esc(t: str) -> str:
        return t.replace("\\", "\\\\").replace("'", "''").replace("\n", "\\n")

    values = ", ".join(
        f"({i}, E'{esc(t)}')" for i, t in _LINE_DEDUP_FIXTURE
    )
    fs = textqc_ops.dedup_lines_sql("text")
    return (
        f"WITH d(doc_id, text) AS (VALUES {values}) SELECT doc_id, "
        + ", ".join(f"{e} AS {k}" for k, e in fs.items())
        + " FROM d"
    )


_MIX_FRACTIONS = {"en": 0.5, "de": 0.25, "fr": 0.75, "es": 0.1}


def _q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-mix sampling: per-language keep rates via
    hash thresholding — zero-shuffle, bit-identical in both engines
    (unlisted langs, e.g. zh, fall to the 0.0 default and drop)."""
    return sampling_ops.sample_stratified(
        _docs(spark, sf_dir),
        _MIX_FRACTIONS,
        strata_col="lang",
        id_col="doc_id",
        seed="mix1",
    ).select("doc_id", "lang")


_SQL_SAMPLE_STRATIFIED = (
    "SELECT doc_id, lang FROM documents WHERE "
    + sampling_ops.sample_stratified_sql(
        "lang", "doc_id", _MIX_FRACTIONS, seed="mix1"
    )
)


def _q_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test assignment (10%/10%) + per-(lang, split) counts —
    membership is a pure function of (seed, doc_id), so docs never
    migrate between splits as the corpus grows."""
    return (
        sampling_ops.assign_splits(
            _docs(spark, sf_dir), id_col="doc_id",
            test_frac=0.1, val_frac=0.1, seed="split",
        )
        .groupBy("lang", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


_SQL_SPLIT_ASSIGN = (
    "SELECT lang, "
    + sampling_ops.assign_splits_sql("doc_id", 0.1, 0.1, seed="split")
    + " AS split, count(*) AS n_docs FROM documents GROUP BY lang, split"
)


def _q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition metrics. The corpus has no newlines, so
    the entry first builds a deterministic multi-line page per document
    (lines of 2 words, paragraphs of 4 lines) with the *same* array
    construction in both engines, then measures line/paragraph
    duplication — exercising the operator end-to-end on real data."""
    words = F.split(textqc_ops.ws_trim(F.col("text")), r"[\t\n\f\r ]+")
    n_lines = F.ceil(F.size(words) / F.lit(2.0)).cast("int")
    lines = F.transform(
        F.sequence(F.lit(0), n_lines - F.lit(1)),
        lambda i: F.array_join(F.slice(words, i * 2 + 1, 2), " "),
    )
    n_paras = F.ceil(F.size(lines) / F.lit(4.0)).cast("int")
    paras = F.transform(
        F.sequence(F.lit(0), n_paras - F.lit(1)),
        lambda j: F.array_join(F.slice(lines, j * 4 + 1, 4), "\n"),
    )
    page = F.array_join(paras, "\n\n")
    cols = textqc_ops.repetition_cols(page)
    out = _docs(spark, sf_dir).select(
        "doc_id", *[v.alias(k) for k, v in cols.items()]
    )
    return _round6(
        out,
        "dup_line_frac",
        "dup_line_char_frac",
        "dup_para_frac",
        "dup_para_char_frac",
    )


def _sql_repetition() -> str:
    rs = textqc_ops.repetition_sql("page")
    fields = ", ".join(
        f"{expr} AS {name}"
        if name in ("n_lines", "n_paras")
        else f"round({expr}, 6) AS {name}"
        for name, expr in rs.items()
    )
    return f"""
WITH w AS (
  SELECT doc_id,
         string_split_regex(trim(text, E' \\t\\n\\f\\r'), '[\\t\\n\\f\\r ]+')
           AS words
  FROM documents
),
l AS (
  SELECT doc_id,
         list_transform(range(0, cast(ceil(len(words) / 2.0) AS BIGINT)),
                        i -> array_to_string(words[i*2+1 : i*2+2], ' '))
           AS lines
  FROM w
),
p AS (
  SELECT doc_id,
         list_transform(range(0, cast(ceil(len(lines) / 4.0) AS BIGINT)),
                        j -> array_to_string(lines[j*4+1 : j*4+4], chr(10)))
           AS paras
  FROM l
),
pg AS (
  SELECT doc_id, array_to_string(paras, chr(10) || chr(10)) AS page FROM p
)
SELECT doc_id, {fields} FROM pg
"""


def _q_top_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top word-3-gram coverage + duplicate-3-gram char fraction."""
    out = textqc_ops.top_ngram_stats(
        _docs(spark, sf_dir), id_col="doc_id", text_col="text", n=3
    )
    return _round6(out, "top_ngram_char_frac", "dup_ngram_char_frac")


def _sql_top_ngram() -> str:
    inner = textqc_ops.top_ngram_sql("doc_id", "text", "documents", n=3)
    return (
        f"SELECT doc_id, top_gram, top_count, "
        f"round(top_ngram_char_frac, 6) AS top_ngram_char_frac, "
        f"round(dup_ngram_char_frac, 6) AS dup_ngram_char_frac "
        f"FROM ({inner}) s"
    )


def _q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batch feature extraction over BINARY content (decode
    stubbed with deterministic md5 features; plumbing is the contract).
    Long format so the value compare is exact per component."""
    docs = _docs(spark, sf_dir).select(
        "doc_id", F.col("text").cast("binary").alias("content")
    )
    feats = mm_ops.fake_features(docs, content_col="content", id_col="doc_id")
    return feats.select(
        "doc_id", F.posexplode("features").alias("dim", "value")
    ).withColumn("value", F.round("value", 6))


_SQL_MULTIMODAL = f"""
WITH f AS ({mm_ops.fake_features_sql('doc_id', 'text', 'documents')})
SELECT doc_id, d AS dim, round(features[d + 1], 6) AS value
FROM f, unnest(range(0, {mm_ops.FEATURE_DIM})) AS u(d)
"""


def _q_ingest_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/F5 — per-source ingest statistics: row counts, empty-text
    skips, total whitespace tokens."""
    d = _docs(spark, sf_dir)
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.when(F.length(textqc_ops.ws_trim(F.col("text"))) == 0, 1).otherwise(0)
        ).alias("n_empty"),
        F.sum(textqc_ops.ws_token_count_col("text")).alias("total_ws_tokens"),
    )


def _sql_ingest_stats() -> str:
    tc = textqc_ops.token_count_sql("text")
    return f"""
SELECT source, count(*) AS n_docs,
       sum(CASE WHEN length(trim(text, E' \\t\\n\\f\\r')) = 0 THEN 1 ELSE 0 END)::BIGINT
         AS n_empty,
       sum({tc['ws_tokens']})::BIGINT AS total_ws_tokens
FROM documents GROUP BY source
"""


def _q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (pipeline/dedup.semdedup_keep): assign every embedding
    to its nearest label-mean centroid (the proven IVF coarse
    quantizer), then drop vectors with cosine >= 0.3 to a lower-id
    member of the SAME cluster (min-id keep). The 0.3 threshold is
    fixture-tuned — the synthetic embeddings are near-orthogonal, so a
    real-corpus 0.95 would drop nothing; production callers feed
    seeded MLlib KMeans centroids (test_dedup pins that composition).
    Oracle reuses the shared _IVF_ASSIGN_CTES assignment fragment."""
    emb = _emb(spark, sf_dir)
    cents = ann_ops.centroids_by_label(emb)
    return dedup_ops.semdedup_keep(emb, cents, threshold=0.3)


_SQL_SEMDEDUP = "WITH " + _IVF_ASSIGN_CTES + """,
drops AS (
  SELECT DISTINCT ab.vec_id
  FROM assign aa
  JOIN assign ab
    ON aa.centroid_id = ab.centroid_id AND aa.vec_id < ab.vec_id
  JOIN e ea ON ea.vec_id = aa.vec_id
  JOIN e eb ON eb.vec_id = ab.vec_id
  WHERE list_cosine_similarity(ea.emb, eb.emb) >= 0.3
)
SELECT a.vec_id, a.centroid_id, (d.vec_id IS NULL) AS keep
FROM assign a LEFT JOIN drops d ON d.vec_id = a.vec_id
"""


def _q_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ADC top-5 (pipeline/pq.py): codebooks =
    label-mean centroids sliced into 8 subspaces (slice-of-mean ==
    mean-of-slice, so the oracle derives the identical codebooks in
    SQL), encode = per-subspace round-9 argmin, score = LUT sums.
    The seeded-KMeans production trainer is pinned in tests/test_pq."""
    from same_same_spark.pipeline import pq as pq_ops

    emb = _emb(spark, sf_dir)
    books = pq_ops.slice_codebooks(ann_ops.centroids_by_label(emb), m=8)
    codes = pq_ops.pq_encode(emb, books)
    out = pq_ops.pq_adc_topk(
        codes, books, _ann_queries(spark, sf_dir), k=5
    )
    return _round6(out, "dist")


_SQL_PQ_ADC_TOPK = """
WITH e AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS emb FROM embeddings
),
long AS (
  SELECT vec_id, label, pos, emb[pos] AS v
  FROM e, unnest(range(1, len(emb) + 1)) AS u(pos)
),
cent AS (
  SELECT label::INTEGER AS centroid_id, pos, avg(v) AS m
  FROM long GROUP BY 1, 2
),
sub AS (SELECT vec_id, ((pos - 1) // 8)::INT AS s, pos, v FROM long),
csub AS (
  SELECT centroid_id AS c, ((pos - 1) // 8)::INT AS s, pos, m FROM cent
),
d AS (  -- squared distance per (vector, subspace, code)
  SELECT sub.vec_id, sub.s, csub.c,
         sum((sub.v - csub.m) * (sub.v - csub.m)) AS dist
  FROM sub JOIN csub ON csub.pos = sub.pos AND csub.s = sub.s
  GROUP BY 1, 2, 3
),
enc AS (  -- per-subspace argmin code (round-9, smaller code id wins)
  SELECT vec_id, s, c FROM (
    SELECT vec_id, s, c,
           row_number() OVER (
             PARTITION BY vec_id, s ORDER BY round(dist, 9), c
           ) AS rn
    FROM d
  ) WHERE rn = 1
),
q AS (
  SELECT vec_id::INTEGER AS query_id, emb FROM e WHERE vec_id IN (0, 1, 2)
),
qlut AS (  -- ADC lookup table: query subvector -> each code
  SELECT q.query_id, csub.s, csub.c,
         sum((q.emb[csub.pos] - csub.m) * (q.emb[csub.pos] - csub.m)) AS d
  FROM q CROSS JOIN csub
  GROUP BY 1, 2, 3
),
score AS (
  SELECT qlut.query_id, enc.vec_id, sum(qlut.d) AS dist
  FROM enc JOIN qlut ON qlut.s = enc.s AND qlut.c = enc.c
  GROUP BY 1, 2
),
r AS (
  SELECT query_id, vec_id, dist,
         row_number() OVER (
           PARTITION BY query_id ORDER BY round(dist, 9), vec_id
         ) AS rank
  FROM score
)
SELECT query_id, vec_id, round(dist, 6) AS dist, rank::INTEGER AS rank
FROM r WHERE rank <= 5
"""


def _opq_params() -> tuple[list[list[float]], list[list[list[float]]]]:
    """Fixture-trained OPQ parameters (pipeline/opq.train_opq over a
    deterministic anisotropic sample, the bounded-sample protocol the
    module documents). Training runs ONCE at import in this process,
    so the Spark entry and the SQL twin share literally the same
    R/codebook doubles — the oracle pins the rotate → encode → ADC →
    rank math, while training determinism/quality is pinned in
    tests/test_opq.py (SQL cannot re-derive an SVD)."""
    import numpy as np

    from same_same_spark.pipeline.opq import train_opq

    rng = np.random.RandomState(7)
    latent = rng.randn(192, 4)
    mix = rng.randn(4, 16)
    sample = latent @ mix + 0.05 * rng.randn(192, 16)
    return train_opq(sample, m=4, n_codes=8, n_iter=5, seed=11)


_OPQ_R, _OPQ_BOOKS = _opq_params()


def _q_opq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPQ ADC top-5 (pipeline/opq.py): one learned orthogonal
    rotation ahead of product quantization — rotate is literal column
    math (left-to-right sums), then pq_encode's round-9 argmin and LUT
    scoring in the rotated space, over the embeddings' first 16 dims
    (d²=256 literals keeps both engines' expressions comfortable; the
    64-dim corpus path dispatches to the bit-equal Arrow rotation,
    pinned in test_opq)."""
    from same_same_spark.pipeline import opq as opq_ops

    emb16 = _emb(spark, sf_dir).select(
        "vec_id",
        F.slice(F.col("embedding").cast("array<double>"), 1, 16).alias(
            "emb"
        ),
    )
    codes = opq_ops.opq_encode(
        emb16, _OPQ_R, _OPQ_BOOKS, embedding_col="emb"
    )
    queries = [(qid, qv[:16]) for qid, qv in _ann_queries(spark, sf_dir)]
    out = opq_ops.opq_adc_topk(codes, _OPQ_R, _OPQ_BOOKS, queries, k=5)
    return _round6(out, "dist")


def _sql_opq_adc_topk() -> str:
    d = len(_OPQ_R)
    w = d // len(_OPQ_BOOKS)
    rvals = ", ".join(
        f"({i + 1}, {j + 1}, {_OPQ_R[i][j]!r})"
        for i in range(d)
        for j in range(d)
    )
    cbvals = ", ".join(
        f"({s}, {c}, {s * w + p + 1}, {code[p]!r})"
        for s, cb in enumerate(_OPQ_BOOKS)
        for c, code in enumerate(cb)
        for p in range(w)
    )
    return f"""
WITH e AS (
  SELECT vec_id, (embedding::DOUBLE[])[1:{d}] AS emb FROM embeddings
),
rmat(i, j, rv) AS (VALUES {rvals}),
cb(s, c, pos, m) AS (VALUES {cbvals}),
long AS (
  SELECT vec_id, pos, emb[pos] AS v
  FROM e, unnest(range(1, {d} + 1)) AS u(pos)
),
rot AS (  -- y = R x (sum-order noise absorbed by the round-9/6 gates)
  SELECT long.vec_id, rmat.i AS pos, sum(rmat.rv * long.v) AS v
  FROM long JOIN rmat ON rmat.j = long.pos GROUP BY 1, 2
),
dists AS (
  SELECT rot.vec_id, cb.s, cb.c,
         sum((rot.v - cb.m) * (rot.v - cb.m)) AS dist
  FROM rot JOIN cb ON cb.pos = rot.pos GROUP BY 1, 2, 3
),
enc AS (  -- per-subspace argmin code (round-9, smaller code id wins)
  SELECT vec_id, s, c FROM (
    SELECT vec_id, s, c,
           row_number() OVER (
             PARTITION BY vec_id, s ORDER BY round(dist, 9), c
           ) AS rn
    FROM dists
  ) WHERE rn = 1
),
q AS (
  SELECT vec_id::INTEGER AS query_id, emb FROM e WHERE vec_id IN (0, 1, 2)
),
qlong AS (
  SELECT query_id, pos, emb[pos] AS v
  FROM q, unnest(range(1, {d} + 1)) AS u(pos)
),
qrot AS (
  SELECT qlong.query_id, rmat.i AS pos, sum(rmat.rv * qlong.v) AS v
  FROM qlong JOIN rmat ON rmat.j = qlong.pos GROUP BY 1, 2
),
qlut AS (
  SELECT qrot.query_id, cb.s, cb.c,
         sum((qrot.v - cb.m) * (qrot.v - cb.m)) AS d
  FROM qrot JOIN cb ON cb.pos = qrot.pos GROUP BY 1, 2, 3
),
score AS (
  SELECT qlut.query_id, enc.vec_id, sum(qlut.d) AS dist
  FROM enc JOIN qlut ON qlut.s = enc.s AND qlut.c = enc.c
  GROUP BY 1, 2
),
r AS (
  SELECT query_id, vec_id, dist,
         row_number() OVER (
           PARTITION BY query_id ORDER BY round(dist, 9), vec_id
         ) AS rank
  FROM score
)
SELECT query_id, vec_id, round(dist, 6) AS dist, rank::INTEGER AS rank
FROM r WHERE rank <= 5
"""


_URL_FIXTURE = [
    (1, "HTTP://WWW.Example.COM:80/Path/?utm_source=x"),
    (2, "http://example.com/Path"),  # dup of 1 after canonicalization
    (3, "https://example.com:443/a/?x=1&utm_medium=m&y=2#frag"),
    (4, "https://example.com/a?x=1&y=2"),  # dup of 3
    (5, "https://example.com/?utm_a=1&utm_b=2&keep=3"),
    (6, "https://example.com/?keep=3"),  # dup of 5
    (7, "http://example.com:8080/x"),  # real port survives
    (8, "example.com/path/"),
    (9, "ftp://Files.Example.com/A"),
    (10, None),  # NULL url: never deduped
    (11, None),
]


def _q_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + URL-keyed dedup (pipeline/urls.py —
    RefinedWeb's pre-content dedup): lowercased scheme+authority,
    fragments / default ports / www. / tracking params / trailing
    slashes stripped by ONE ordered RE2-safe rule table rendered for
    both engines; min-id keep per canonical URL, NULLs never drop."""
    from same_same_spark.pipeline.urls import dedup_by_url

    df = spark.createDataFrame(_URL_FIXTURE, "doc_id LONG, url STRING")
    return dedup_by_url(df).select("doc_id", "url_canonical")


def _sql_url_dedup() -> str:
    from same_same_spark.pipeline.urls import canonicalize_url_sql

    values = ", ".join(
        f"({i}, " + ("NULL" if u is None else "'" + u + "'") + ")"
        for i, u in _URL_FIXTURE
    )
    return f"""
WITH d(doc_id, url) AS (VALUES {values}),
c AS (SELECT doc_id, {canonicalize_url_sql('url')} AS url_canonical FROM d),
k AS (
  SELECT doc_id, url_canonical FROM (
    SELECT doc_id, url_canonical,
           row_number() OVER (
             PARTITION BY url_canonical ORDER BY doc_id
           ) AS rn
    FROM c WHERE url_canonical IS NOT NULL
  ) WHERE rn = 1
)
SELECT doc_id, url_canonical FROM k
UNION ALL
SELECT doc_id, url_canonical FROM c WHERE url_canonical IS NULL
"""


_DSIR_KW = dict(n=2, n_buckets=1024, alpha=0.5)


def _q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance log-weights (pipeline/dsir.py, Xie et al. 2023):
    hashed-bigram add-alpha estimates of a target slice (every 10th
    doc) vs the raw rest; per-doc log_w = Σ count·(ln p̂_t − ln p̂_r).
    Buckets = shared 60-bit shingle hashes mod 1024, so the oracle
    re-derives both distributions and every weight from the same
    parquet."""
    from same_same_spark.pipeline.dsir import dsir_log_weights

    docs = _docs(spark, sf_dir)
    raw = docs.filter(F.col("doc_id") % 10 != 0)
    tgt = docs.filter(F.col("doc_id") % 10 == 0)
    out = dsir_log_weights(raw, tgt, **_DSIR_KW)
    return _round6(out, "log_w")


def _sql_dsir_weights() -> str:
    from same_same_spark.pipeline.dsir import dsir_sql_ctes

    ctes = dsir_sql_ctes(
        "documents", target_where="doc_id % 10 = 0",
        raw_where="doc_id % 10 <> 0", **_DSIR_KW,
    )
    return (
        f"WITH {ctes} SELECT doc_id, n_grams, round(log_w, 6) AS log_w "
        f"FROM dsir"
    )


def _q_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gumbel top-k DSIR selection (dsir_topk): rank log_w/T + g with
    deterministic per-doc Gumbel noise from the package's hash
    uniform; top-50 through the bounded tournament. Returns the
    perturbed objective itself (the weight plan runs exactly once)."""
    from same_same_spark.pipeline.dsir import dsir_topk

    docs = _docs(spark, sf_dir)
    out = dsir_topk(
        docs.filter(F.col("doc_id") % 10 != 0),
        docs.filter(F.col("doc_id") % 10 == 0),
        k=50, seed="dsir-entry", temperature=2.0, **_DSIR_KW,
    )
    return _round6(out, "score")


def _sql_dsir_select() -> str:
    from same_same_spark.pipeline.dsir import dsir_sql_ctes
    from same_same_spark.pipeline.sampling import hash_uniform_sql

    ctes = dsir_sql_ctes(
        "documents", target_where="doc_id % 10 = 0",
        raw_where="doc_id % 10 <> 0", **_DSIR_KW,
    )
    u = hash_uniform_sql("doc_id", seed="dsir-entry")
    return f"""
WITH {ctes},
scored AS (
  SELECT doc_id, log_w / 2.0 + (-ln(-ln({u}))) AS score
  FROM dsir
),
r AS (
  SELECT doc_id, score,
         row_number() OVER (
           ORDER BY round(score, 9) DESC, doc_id ASC
         ) AS rank
  FROM scored
)
SELECT doc_id, round(score, 6) AS score, rank::INTEGER AS rank
FROM r WHERE rank <= 50
"""


def _q_corpus_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus drift diagnostic (dsir.corpus_divergence): KL both ways
    + Jensen-Shannon between the doc_id%10 slice and the rest, over
    the same smoothed hashed-bigram distributions dsir_weights
    verifies; the two bucket passes are the only distributed work,
    the reduce folds driver-side with the all-empty-bucket remainder
    in closed form."""
    from same_same_spark.pipeline.dsir import corpus_divergence

    docs = _docs(spark, sf_dir)
    d = corpus_divergence(
        docs.filter(F.col("doc_id") % 10 == 0),
        docs.filter(F.col("doc_id") % 10 != 0),
        **_DSIR_KW,
    )
    return spark.createDataFrame(
        [(round(d["kl_ab"], 6), round(d["kl_ba"], 6), round(d["js"], 6))],
        "kl_ab DOUBLE, kl_ba DOUBLE, js DOUBLE",
    )


def _sql_corpus_divergence() -> str:
    from same_same_spark.pipeline.dsir import corpus_divergence_sql

    return corpus_divergence_sql(
        "documents", a_where="doc_id % 10 = 0",
        b_where="doc_id % 10 <> 0", **_DSIR_KW,
    )


# Deterministic synthetic URLs over documents for the per-domain cap:
# one giant host (every doc_id % 3 == 0), a 37-host long tail, scheme/
# www./tracking noise exercising canonicalization, NULL urls (% 41)
# exercising the unknown-host pass-through. Both engines build the
# SAME string from doc_id, so the oracle is a full twin.
def _host_cap_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = F.col("doc_id")
    url = F.when(d % 41 == 0, F.lit(None).cast("string")).otherwise(
        F.concat(
            F.when(d % 2 == 0, F.lit("HTTPS://WWW.")).otherwise(
                F.lit("https://")
            ),
            F.when(d % 3 == 0, F.lit("hub.example.com")).otherwise(
                F.concat(
                    F.lit("site"),
                    (d % 37).cast("string"),
                    F.lit(".example.org"),
                )
            ),
            F.lit("/p/"),
            d.cast("string"),
            F.when(d % 5 == 0, F.lit("?utm_source=x")).otherwise(F.lit("")),
        )
    )
    return _docs(spark, sf_dir).select("doc_id", "n_chars").withColumn(
        "url", url
    )


_HOST_CAP_URL_SQL = """
CASE WHEN doc_id % 41 = 0 THEN NULL ELSE
  (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://WWW.' ELSE 'https://' END)
  || (CASE WHEN doc_id % 3 = 0 THEN 'hub.example.com'
      ELSE 'site' || (doc_id % 37)::VARCHAR || '.example.org' END)
  || '/p/' || doc_id::VARCHAR
  || (CASE WHEN doc_id % 5 = 0 THEN '?utm_source=x' ELSE '' END)
END
"""


def _q_host_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform per-domain token budget (pipeline/sampling.
    sample_host_cap over pipeline/urls.url_host_col): every canonical
    host capped at 5000 chars of weight — the RefinedWeb "no domain
    dominates the mix" policy. The giant hub host gets rate
    cap/total < 1, the long-tail hosts keep everything, NULL-url rows
    pass through unattributed."""
    from same_same_spark.pipeline.sampling import sample_host_cap

    out = sample_host_cap(
        _host_cap_docs(spark, sf_dir), 5000.0,
        weight_col="n_chars", seed="hostcap",
    )
    return out.select("doc_id", "url_host")


def _sql_host_cap() -> str:
    from same_same_spark.pipeline.sampling import sample_host_cap_sql

    rel = (
        f"(SELECT doc_id, n_chars, {_HOST_CAP_URL_SQL} AS url "
        f"FROM documents)"
    )
    inner = sample_host_cap_sql(
        rel, 5000.0, weight_expr="n_chars", seed="hostcap"
    )
    return f"SELECT doc_id, url_host FROM ({inner})"


def _q_rrf_fuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (operators/hybrid.rrf_fuse) of the two
    verified lexical rankings — BM25 and the reference's TF-IDF model —
    over the reference query set: fused score = sum 1/(60 + rank),
    docs ranked by one list only still compete. Rank-only fusion, so
    the oracle composes the two entries' own SQL as CTEs."""
    from same_same_spark.operators.hybrid import rrf_fuse
    from same_same_spark.operators.tfidf import tfidf_topk

    docs = _docs(spark, sf_dir)
    a = score_queries(
        docs, REF_QUERIES, k=REF_K, id_col="doc_id", text_col="text"
    )
    b = tfidf_topk(
        docs, REF_QUERIES, k=REF_K, id_col="doc_id", text_col="text"
    )
    out = rrf_fuse(
        [a.select("query_id", "doc_id", "rank"),
         b.select("query_id", "doc_id", "rank")],
        k=REF_K,
    )
    return _round6(out, "score").withColumn(
        "rank", F.col("rank").cast("int")
    )


def _sql_rrf_fuse() -> str:
    return f"""
WITH bm AS ({duckdb_bm25_sql("documents", "doc_id", "text", REF_QUERIES, k=REF_K)}),
tf AS ({_SQL_TFIDF_TOPK}),
u AS (
  SELECT query_id, doc_id, 1.0 / (60 + rank) AS contrib FROM bm
  UNION ALL
  SELECT query_id, doc_id, 1.0 / (60 + rank) AS contrib FROM tf
),
s AS (
  SELECT query_id, doc_id, sum(contrib) AS score FROM u GROUP BY 1, 2
),
r AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (
           PARTITION BY query_id ORDER BY round(score, 9) DESC, doc_id ASC
         ) AS rank
  FROM s
)
SELECT query_id, doc_id, round(score, 6) AS score, rank::INTEGER AS rank
FROM r WHERE rank <= {REF_K}
"""


def _pq_store_dir(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per content fingerprint) the persisted IVF-PQ store
    the pq_ivf_topk entry probes: label-mean coarse centroids + m=8
    label-mean-slice codebooks, so the oracle can re-derive every
    stored artifact from the embeddings view alone. Completion =
    pq_manifest.json present (written atomically last)."""
    import hashlib
    import os
    import tempfile

    from same_same_spark.pipeline import pq as pq_ops

    src = os.path.join(sf_dir, "embeddings.parquet")
    st = os.stat(src)
    tag = hashlib.md5(
        f"{src}|{st.st_size}|{st.st_mtime_ns}|pqstore-v1|m=8".encode()
    ).hexdigest()[:10]
    out = f"{tempfile.gettempdir()}/ss_entry_pqstore_{tag}"
    if not os.path.exists(os.path.join(out, "pq_manifest.json")):
        emb = _emb(spark, sf_dir)
        cents = ann_ops.centroids_by_label(emb)
        pq_ops.build_pq_store(
            emb, out, codebooks=pq_ops.slice_codebooks(cents, m=8),
            centroids=cents,
        )
    return out


def _cell_store_dir(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per content fingerprint) a mutable ANN store whose
    IVF cells carry in-cell PQ codes (ann_store.build_ann_index
    pq_codebooks=): the SAME label-mean centroids + m=8 slice
    codebooks as the pq/mirror fixtures, so the shared oracle
    re-derives everything from the embeddings view. Completion =
    manifest.json present (build writes it atomically last)."""
    import hashlib
    import os
    import tempfile

    from same_same_spark.pipeline import ann_store
    from same_same_spark.pipeline import pq as pq_ops

    src = os.path.join(sf_dir, "embeddings.parquet")
    st = os.stat(src)
    tag = hashlib.md5(
        f"{src}|{st.st_size}|{st.st_mtime_ns}|cellstore-v1|m=8".encode()
    ).hexdigest()[:10]
    out = f"{tempfile.gettempdir()}/ss_entry_cellstore_{tag}"
    if not os.path.exists(os.path.join(out, "manifest.json")):
        emb = _emb(spark, sf_dir)
        cents = ann_ops.centroids_by_label(emb)
        ann_store.build_ann_index(
            emb, out, centroids=cents,
            pq_codebooks=pq_ops.slice_codebooks(cents, m=8),
        )
    return out


def _q_pq_cell_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-cell PQ probe (ann_store.pq_cell_topk): ADC over the mutable
    store's OWN codes column — no separate PQ store or mirror, no sync
    staleness; mutations maintain the codes (matrix pinned in
    tests/test_pq). Same centroids/codebooks/probe rule as pq_ivf_topk
    and pq_mirror_topk, so the shared oracle pins in-cell ADC ==
    mirror == dedicated store."""
    from same_same_spark.pipeline import ann_store

    out = ann_store.pq_cell_topk(
        spark,
        _cell_store_dir(spark, sf_dir),
        _ann_queries(spark, sf_dir),
        k=5,
        nprobe=3,
    )
    return _round6(out, "dist")


def _q_pq_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted IVF-PQ probe (pq.pq_topk_persisted): nprobe=3 coarse
    cells by query→centroid cosine (the ann_ivf probe rule), then ADC
    over the probed cells' codes only — partition-pruned scan,
    plan-asserted in tests/test_pq."""
    from same_same_spark.pipeline import pq as pq_ops

    out = pq_ops.pq_topk_persisted(
        spark,
        _pq_store_dir(spark, sf_dir),
        _ann_queries(spark, sf_dir),
        k=5,
        nprobe=3,
    )
    return _round6(out, "dist")


_SQL_PQ_IVF_TOPK = "WITH " + _IVF_ASSIGN_CTES + """,
q AS (
  SELECT vec_id::INTEGER AS query_id, emb FROM e WHERE vec_id IN (0, 1, 2)
),
qc AS (  -- probe top-3 centroids per query (cosine, the IVF rule)
  SELECT query_id, centroid_id FROM (
    SELECT q.query_id, vc.centroid_id,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY round(vc.csim, 9) DESC, vc.centroid_id ASC
           ) AS rn
    FROM q JOIN vc ON vc.vec_id = q.query_id
  ) WHERE rn <= 3
),
sub AS (SELECT vec_id, ((pos - 1) // 8)::INT AS s, pos, v FROM long),
csub AS (
  SELECT centroid_id AS c, ((pos - 1) // 8)::INT AS s, pos, m FROM cent
),
d AS (
  SELECT sub.vec_id, sub.s, csub.c,
         sum((sub.v - csub.m) * (sub.v - csub.m)) AS dist
  FROM sub JOIN csub ON csub.pos = sub.pos AND csub.s = sub.s
  GROUP BY 1, 2, 3
),
enc AS (
  SELECT vec_id, s, c FROM (
    SELECT vec_id, s, c,
           row_number() OVER (
             PARTITION BY vec_id, s ORDER BY round(dist, 9), c
           ) AS rn
    FROM d
  ) WHERE rn = 1
),
qlut AS (
  SELECT q.query_id, csub.s, csub.c,
         sum((q.emb[csub.pos] - csub.m) * (q.emb[csub.pos] - csub.m)) AS d
  FROM q CROSS JOIN csub
  GROUP BY 1, 2, 3
),
cand AS (  -- vectors inside each query's probed cells only
  SELECT qc.query_id, a.vec_id
  FROM qc JOIN assign a ON a.centroid_id = qc.centroid_id
),
score AS (
  SELECT c.query_id, c.vec_id, sum(qlut.d) AS dist
  FROM cand c
  JOIN enc ON enc.vec_id = c.vec_id
  JOIN qlut ON qlut.query_id = c.query_id
           AND qlut.s = enc.s AND qlut.c = enc.c
  GROUP BY 1, 2
),
r AS (
  SELECT query_id, vec_id, dist,
         row_number() OVER (
           PARTITION BY query_id ORDER BY round(dist, 9), vec_id
         ) AS rank
  FROM score
)
SELECT query_id, vec_id, round(dist, 6) AS dist, rank::INTEGER AS rank
FROM r WHERE rank <= 5
"""


def _pq_mirror_dir(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Entry scratch: a mutable ANN store over the embeddings (label
    centroids — the _IVF_ASSIGN_CTES assignment) plus a synced PQ
    mirror with slice codebooks, content-tagged like the other entry
    stores."""
    import hashlib
    import os
    import shutil
    import tempfile

    from same_same_spark.pipeline import ann_store
    from same_same_spark.pipeline import pq as pq_ops
    from same_same_spark.pipeline import pq_mirror as pqm

    src = os.path.join(sf_dir, "embeddings.parquet")
    st = os.stat(src)
    tag = hashlib.md5(
        f"{src}|{st.st_size}|{st.st_mtime_ns}|pqmirror-v1|m=8".encode()
    ).hexdigest()[:10]
    ann = f"{tempfile.gettempdir()}/ss_entry_pqmirror_ann_{tag}"
    pq = f"{tempfile.gettempdir()}/ss_entry_pqmirror_pq_{tag}"
    # Gate the cache on SYNC completion, not just the manifest:
    # init_pq_mirror writes pq_mirror.json before sync_pq_mirror runs,
    # so a crash between the two would otherwise leave a cached dir
    # whose codes parquet never exists (every later run then fails
    # until the source mtime changes the tag).
    done = os.path.join(pq, "_entry_synced")
    if not os.path.exists(done):
        shutil.rmtree(ann, ignore_errors=True)
        shutil.rmtree(pq, ignore_errors=True)
        emb = _emb(spark, sf_dir)
        cents = ann_ops.centroids_by_label(emb)
        ann_store.build_ann_index(emb, ann, centroids=cents)
        pqm.init_pq_mirror(
            spark, ann, pq, codebooks=pq_ops.slice_codebooks(cents, m=8)
        )
        pqm.sync_pq_mirror(spark, ann, pq, log=lambda *_: None)
        with open(done, "w") as fh:
            fh.write("ok\n")
    return ann, pq


def _q_pq_mirror_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental PQ mirror probe (pipeline/pq_mirror.py): the codes
    were landed by init→sync against the mutable store's manifest, and
    the probe prunes to nprobe=3 cells of committed batches with the
    source's tombstones honored at read time. Same centroids/codebooks
    /probe rule as pq_ivf_topk, so the shared oracle re-derives every
    artifact from the embeddings view; the mirror's mutation matrix
    (append folds, probe-time deletes, rebuild-on-compact, crash
    windows) is pinned in tests/test_pq_mirror.py."""
    from same_same_spark.pipeline import pq_mirror as pqm

    ann, pq = _pq_mirror_dir(spark, sf_dir)
    out = pqm.pq_mirror_topk(
        spark, ann, pq, _ann_queries(spark, sf_dir), k=5, nprobe=3
    )
    return _round6(out, "dist")


def _q_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session_window aggregation (streaming/sessions.py) over
    the same 6h gap as events_sessionize — the incremental/streaming
    twin of the lag/sum sessionizer (session cuts proven identical in
    tests/test_sessions.py; this entry pins the native operator's
    values against the same SQL recurrence)."""
    from same_same_spark.streaming.sessions import session_window_agg

    ev = _events(spark, sf_dir)
    out = session_window_agg(
        ev, "user_id", "ts", 21600, value_col="value", watermark=None
    )
    return out.withColumn("sum_value", F.round("sum_value", 6))


_SQL_SESSION_WINDOWS = """
WITH m AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                   OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 21600000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT *, sum(is_new) OVER (
    PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING
  ) AS session_idx FROM m
)
SELECT user_id, min(ts) AS session_start,
       max(ts) + INTERVAL 21600 SECOND AS session_end,
       max(ts) AS last_event_ts, count(*) AS n_events,
       round(sum(value), 6) AS sum_value
FROM s GROUP BY user_id, session_idx
"""


_GLOBAL_LINE_FIXTURE = [
    (1, "MIT License\nCopyright (c) 2020\n\nalpha body text"),
    (2, "MIT License\nCopyright (c) 2020\n\nbeta body text"),
    (3, "  MIT License \ngamma body text\nalpha body text"),
    (4, "alpha body text"),  # fully emptied: its only line is doc 1's
    (5, "delta café line\ndelta café line\n\n"),  # intra-doc repeat
    (6, ""),
    (7, "epsilon\n}\n}\nepsilon"),
]


def _q_global_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS-document line dedup (textqc.dedup_lines_global): each
    distinct trimmed line keeps only its corpus-wide first occurrence
    in (doc_id, pos) order; blank lines always survive; emptied docs
    keep their row. Spark groups candidates by the 60-bit line hash;
    the oracle partitions by the trimmed line itself — identical
    modulo hash collisions (none on this fixture, 2^-60 at scale)."""
    df = spark.createDataFrame(
        _GLOBAL_LINE_FIXTURE, "doc_id LONG, text STRING"
    )
    return textqc_ops.dedup_lines_global(df)


def _sql_global_line_dedup() -> str:
    def esc(t: str) -> str:
        return t.replace("\\", "\\\\").replace("'", "''").replace("\n", "\\n")

    values = ", ".join(
        f"({i}, E'{esc(t)}')" for i, t in _GLOBAL_LINE_FIXTURE
    )
    return f"""
WITH d(doc_id, text) AS (VALUES {values}),
ls AS (
  SELECT doc_id, pos, string_split(text, chr(10))[pos] AS line,
         trim(string_split(text, chr(10))[pos], E' \\t\\n\\f\\r') AS tr
  FROM d, unnest(range(1, len(string_split(text, chr(10))) + 1)) AS u(pos)
),
cand AS (
  SELECT doc_id, pos, line,
         row_number() OVER (PARTITION BY tr ORDER BY doc_id, pos) AS rn
  FROM ls WHERE length(tr) > 0
),
kept AS (
  SELECT doc_id, pos, line FROM cand WHERE rn = 1
  UNION ALL
  SELECT doc_id, pos, line FROM ls WHERE length(tr) = 0
),
reb AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS txt,
         count(*) AS kept_n
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id, coalesce(reb.txt, '') AS text_global_deduped,
       (len(string_split(d.text, chr(10))) - coalesce(reb.kept_n, 0))::BIGINT
         AS n_lines_removed
FROM d LEFT JOIN reb ON reb.doc_id = d.doc_id
"""


def _q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time as-of join (operators/events.asof_join): every click
    event picks up the most recent purchase of the same user at or
    before its timestamp (left-outer; unmatched clicks keep NULLs).
    The right side is pre-deduped to one row per (user, ts) so the
    no-tiebreak semantics are well-defined in both engines. Plan: one
    union + ONE per-key shuffle + a running last() — no join node."""
    from same_same_spark.operators.events import asof_join

    ev = _events(spark, sf_dir)
    left = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    right = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(
            F.max("event_id").alias("rid"),
            F.max("value").alias("rvalue"),
        )
    )
    out = asof_join(
        left, right, on="user_id", left_ts="ts", right_ts="ts",
        right_cols=["rid", "rvalue"],
    )
    return out.select(
        "event_id", "user_id", "matched_ts", "matched_rid",
        F.round("matched_rvalue", 6).alias("matched_rvalue"),
    )


_SQL_ASOF_JOIN = """
WITH l AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
),
r AS (
  SELECT user_id, ts, max(event_id) AS rid, max(value) AS rvalue
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
)
SELECT l.event_id, l.user_id, r.ts AS matched_ts, r.rid AS matched_rid,
       round(r.rvalue, 6) AS matched_rvalue
FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
"""


def _q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time interval join (operators/events.interval_join): all
    (click, purchase) pairs of the same user with the purchase in the
    6h window before the click, bounds inclusive. The same operator
    runs watermarked stream-stream (test_events pins streaming ==
    batch); asof_join is this join's max-right_ts row per left."""
    from same_same_spark.operators.events import interval_join

    ev = _events(spark, sf_dir)
    left = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    right = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("rid"), F.col("user_id"), F.col("ts"),
        F.col("value"),
    )
    out = interval_join(
        left, right, on="user_id", lookback_seconds=21600,
        right_cols=["rid", "value"],
    )
    return out.select(
        "event_id", "user_id", "r_ts", "r_rid",
        F.round("r_value", 6).alias("r_value"),
    )


_SQL_INTERVAL_JOIN = """
SELECT l.event_id, l.user_id, r.ts AS r_ts, r.event_id AS r_rid,
       round(r.value, 6) AS r_value
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') l
JOIN (SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'purchase') r
  ON l.user_id = r.user_id
 AND r.ts >= l.ts - INTERVAL 21600 SECOND
 AND r.ts <= l.ts
"""


def _q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (operators/events.sessionize): a new
    session after a >6h silence per user; ties broken by event_id.
    Per-session summary keeps the output bounded. Gap math is integer
    microseconds, so both engines cut sessions identically."""
    from same_same_spark.operators.events import sessionize

    ev = _events(spark, sf_dir)
    s = sessionize(
        ev, "user_id", "ts", gap_seconds=21600, order_cols=["event_id"]
    )
    return s.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    )


_SQL_EVENTS_SESSIONIZE = """
WITH m AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                   OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 21600000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT *, sum(is_new) OVER (
    PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING
  ) AS session_idx FROM m
)
SELECT user_id, session_idx::BIGINT AS session_idx,
       count(*) AS n_events, min(ts) AS session_start,
       max(ts) AS session_end, round(sum(value), 6) AS sum_value
FROM s GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# round-5 fulltext extras: phrase search, snippets, spell suggestion
# ---------------------------------------------------------------------------

# Covers multi-term, trigram, repeated-term (overlap counting),
# all-stopword (zero tokens ⇒ zero rows) and a long rare phrase.
PHRASE_QUERIES: list[tuple[int, str]] = [
    (1, "table query"),
    (2, "fast scan row"),
    (3, "table table"),
    (4, "the a an"),
    (5, "window agg stream batch"),
]


def _q_phrase_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacency-verified phrase search, BM25-ranked
    (operators/phrase.phrase_search). Sole evidence for the phrase
    operator; the oracle re-derives adjacency with a brute-force
    list-slice scan, so the Spark candidate prefilter is part of what
    the differential checks."""
    from same_same_spark.operators.phrase import phrase_search

    out = phrase_search(
        _docs(spark, sf_dir), PHRASE_QUERIES, k=REF_K,
        id_col="doc_id", text_col="text",
    )
    return _round6(out, "score")


def _sql_phrase_topk() -> str:
    from same_same_spark.operators.phrase import duckdb_phrase_sql

    return duckdb_phrase_sql(
        "documents", "doc_id", "text", PHRASE_QUERIES, k=REF_K
    )


def _q_snippet_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-5 for the reference query set, each hit decorated with
    the best-window snippet + <em>-tagged highlight
    (operators/snippet.with_snippets; window=8 tokens, score = distinct
    query terms in window, ties → smallest start). Sole evidence for
    the snippet/highlight operator."""
    from same_same_spark.operators.snippet import with_snippets

    docs = _docs(spark, sf_dir)
    top = score_queries(
        docs, REF_QUERIES, k=5, id_col="doc_id", text_col="text"
    )
    out = with_snippets(
        top, docs, dict(REF_QUERIES), window=8,
        id_col="doc_id", text_col="text",
    )
    return _round6(out, "score").withColumn(
        "rank", F.col("rank").cast("int")
    )


def _sql_snippet_topk() -> str:
    from same_same_spark.operators.snippet import duckdb_snippet_exprs
    from same_same_spark.text.tokenizer import tokenize_py

    inner = duckdb_bm25_sql("documents", "doc_id", "text", REF_QUERIES, k=5)
    snip_cases, hit_cases, hl_cases = [], [], []
    for qid, text in REF_QUERIES:
        terms = tokenize_py(text)
        if not terms:
            # zero-token query produces zero BM25 rows; no branch needed
            continue
        s, h, hl = duckdb_snippet_exprs("d.tokens", terms, 8)
        snip_cases.append(f"WHEN t.query_id = {qid} THEN {s}")
        hit_cases.append(f"WHEN t.query_id = {qid} THEN {h}")
        hl_cases.append(f"WHEN t.query_id = {qid} THEN {hl}")
    from same_same_spark.text.tokenizer import duckdb_tokens_sql

    return f"""
WITH top AS ({inner}),
d AS (SELECT doc_id, {duckdb_tokens_sql('text')} AS tokens FROM documents)
SELECT t.query_id, t.doc_id, t.score, t.rank::INTEGER AS rank,
       CASE {' '.join(snip_cases)} END AS snippet,
       CASE {' '.join(hit_cases)} END AS n_hit_terms,
       CASE {' '.join(hl_cases)} END AS highlight
FROM top t JOIN d ON t.doc_id = d.doc_id
"""


# Source docs for more-like-this (present at every sf: ids are dense).
MLT_SOURCE_IDS: list[int] = [0, 7]


def _q_more_like_this(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-as-query retrieval (operators/mlt.more_like_this):
    top-10 tf-idf-salient terms of each source doc run as a BM25 query,
    source excluded. Sole evidence for the MLT operator."""
    from same_same_spark.operators.mlt import more_like_this

    out = more_like_this(
        _docs(spark, sf_dir), MLT_SOURCE_IDS, k=REF_K, max_terms=10,
        id_col="doc_id", text_col="text",
    )
    return _round6(out, "score")


def _sql_more_like_this() -> str:
    from same_same_spark.operators.mlt import duckdb_mlt_sql

    return duckdb_mlt_sql(
        "documents", "doc_id", "text", MLT_SOURCE_IDS, k=REF_K,
        max_terms=10,
    )


# (query_id, must, should, must_not) — covers must+should scoring,
# conjunctive-only, exclusion, stopword-must fallback to should mode,
# and a no-positive-clause query (zero rows by pinned semantics).
BOOL_QUERIES: list[tuple[int, str, str, str]] = [
    (1, "table query", "join merge", "vector"),
    (2, "", "fast scan row", "window"),
    (3, "spark", "", ""),
    (4, "the a an", "batch stream", ""),
    (5, "", "", "table"),
]


def _q_boolean_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean must/should/must_not search over BM25
    (operators/boolquery.boolean_search). Sole evidence for the
    boolean-clause operator."""
    from same_same_spark.operators.boolquery import boolean_search

    out = boolean_search(
        _docs(spark, sf_dir), BOOL_QUERIES, k=REF_K,
        id_col="doc_id", text_col="text",
    )
    return _round6(out, "score")


def _sql_boolean_search() -> str:
    from same_same_spark.operators.boolquery import duckdb_bool_sql

    return duckdb_bool_sql(
        "documents", "doc_id", "text", BOOL_QUERIES, k=REF_K
    )


# Typos of corpus vocabulary at distances 0/1/2 + a no-match probe.
SPELL_TERMS: list[str] = [
    "tabel", "quer", "windwo", "vektor", "stream", "zzzqqq",
]


def _q_spell_suggest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SymSpell deletion-neighborhood spell suggestions
    (operators/spell.suggest_terms) over the corpus vocabulary. The
    oracle brute-forces the vocab × query cross join, so the
    deletion-key recall theorem is exactly what this differential
    verifies."""
    from same_same_spark.operators.spell import (
        suggest_terms,
        vocab_from_docs,
    )

    vocab = vocab_from_docs(
        _docs(spark, sf_dir), id_col="doc_id", text_col="text"
    )
    return suggest_terms(vocab, SPELL_TERMS, max_edits=2, topn=3)


def _sql_spell_suggest() -> str:
    from same_same_spark.operators.spell import duckdb_suggest_sql

    return duckdb_suggest_sql(
        "documents", "doc_id", "text", SPELL_TERMS, max_edits=2, topn=3
    )


# Pattern sets: prefix, single-char ?, leading *, wildcard-free exact,
# a no-match probe, and a broad prefix whose expansion cap actually
# bites at sf0.01 (determinism of the cap is part of the differential).
WILDCARD_QUERIES: list[tuple[int, str]] = [
    (1, "tab* quer*"),
    (2, "s?an filter*"),
    (3, "*dow"),
    (4, "vector"),
    (5, "zzz*"),
    (6, "f*"),
]


def _q_wildcard_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wildcard/prefix term queries (operators/wildcard.wildcard_search):
    pattern expansion against the corpus vocabulary capped
    deterministically, OR-mode BM25 over the union. Sole evidence for
    the wildcard operator; the oracle re-ranks the expansion with a
    window function over a regexp join (vs the bounded RLIKE
    tournament), so cap determinism is what the differential checks."""
    from same_same_spark.operators.wildcard import wildcard_search

    out = wildcard_search(
        _docs(spark, sf_dir), WILDCARD_QUERIES, k=REF_K,
        max_expansions=20, id_col="doc_id", text_col="text",
    )
    return _round6(out, "score")


def _sql_wildcard_topk() -> str:
    from same_same_spark.operators.wildcard import duckdb_wildcard_sql

    return duckdb_wildcard_sql(
        "documents", "doc_id", "text", WILDCARD_QUERIES, k=REF_K,
        max_expansions=20,
    )


# Typos at distances 1/2, an exact vocabulary term (self at d=0 plus
# its neighborhood), and a no-match probe.
FUZZY_QUERIES: list[tuple[int, str]] = [
    (1, "tabel"),
    (2, "quary scn"),
    (3, "window"),
    (4, "zzzqqq"),
]


def _q_fuzzy_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy term queries (operators/fuzzy.fuzzy_search): SymSpell
    deletion-key expansion within levenshtein <= 2, similarity-weighted
    BM25. Sole evidence for the fuzzy operator; the oracle brute-forces
    the vocab cross join, so the deletion-key recall theorem is
    verified at the retrieval level."""
    from same_same_spark.operators.fuzzy import fuzzy_search

    out = fuzzy_search(
        _docs(spark, sf_dir), FUZZY_QUERIES, k=REF_K, max_edits=2,
        max_expansions=8, id_col="doc_id", text_col="text",
    )
    return _round6(out, "score")


def _q_collapse_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Field collapsing (operators/collapse.collapse_topk): one best
    doc per `source` value under the pinned order, top-k groups —
    constant aggregation state per group (min(struct), never a
    buffer). Sole evidence for the collapse operator."""
    from same_same_spark.bm25 import scored_matches
    from same_same_spark.operators.collapse import collapse_topk

    docs = _docs(spark, sf_dir)
    scored = scored_matches(
        docs, REF_QUERIES, id_col="doc_id", text_col="text"
    )
    return _round6(
        collapse_topk(scored, docs, "source", k=REF_K), "score"
    )


def _sql_collapse_by_source() -> str:
    from same_same_spark.bm25 import duckdb_scored_sql
    from same_same_spark.operators.collapse import duckdb_collapse_sql

    return duckdb_collapse_sql(
        duckdb_scored_sql("documents", "doc_id", "text", REF_QUERIES),
        "documents", "doc_id", "source", REF_K,
    )


def _q_range_facets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range aggregation (operators/facets.range_facets): half-open
    [lo, hi) doc-count buckets of `n_chars` over each query's full
    match set, zero buckets included. Sole evidence; the oracle
    assigns buckets with an independent closed form (count of edges
    <= v) vs Spark's chained CASE."""
    from same_same_spark.operators.facets import range_facets

    return range_facets(
        _docs(spark, sf_dir), REF_QUERIES, "n_chars",
        [100.0, 200.0, 400.0], id_col="doc_id", text_col="text",
    )


def _sql_range_facets() -> str:
    from same_same_spark.operators.facets import duckdb_range_facets_sql

    return duckdb_range_facets_sql(
        "documents", "doc_id", "text", REF_QUERIES, "n_chars",
        [100.0, 200.0, 400.0],
    )


def _q_wildcard_topk_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wildcard search through the posting index's term dictionary
    (operators/wildcard.wildcard_search_indexed) — rank-identical to
    the naive wildcard path, so it shares wildcard_topk's oracle
    (twin tail; the identity is also pinned with deletes in
    tests/test_multiterm.py)."""
    from same_same_spark.operators.wildcard import wildcard_search_indexed

    out = wildcard_search_indexed(
        spark, _entry_index_dir(spark, sf_dir), WILDCARD_QUERIES,
        k=REF_K, max_expansions=20,
    )
    return _round6(out, "score").withColumn(
        "rank", F.col("rank").cast("int")
    )


def _sql_fuzzy_topk() -> str:
    from same_same_spark.operators.fuzzy import duckdb_fuzzy_sql

    return duckdb_fuzzy_sql(
        "documents", "doc_id", "text", FUZZY_QUERIES, k=REF_K,
        max_edits=2, max_expansions=8,
    )


def _q_proximity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proximity search (operators/proximity.proximity_search): all
    distinct query terms within a |terms|+slop token window, any order;
    BM25 rank restricted to matches. Sole evidence for the proximity
    operator; the oracle scans every doc's window set brute-force, so
    the Spark candidate prefilter is part of the differential."""
    from same_same_spark.operators.proximity import proximity_search

    out = proximity_search(
        _docs(spark, sf_dir), REF_QUERIES, slop=2, k=REF_K,
        id_col="doc_id", text_col="text",
    )
    return _round6(out, "score")


def _sql_proximity_topk() -> str:
    from same_same_spark.operators.proximity import duckdb_proximity_sql

    return duckdb_proximity_sql(
        "documents", "doc_id", "text", REF_QUERIES, slop=2, k=REF_K
    )


def _q_search_facets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Faceted search (operators/facets.search_facets): terms-aggregation
    doc counts over each query's FULL match set, NULL values excluded,
    top-n per (query, facet) under (doc_count DESC, value ASC). Sole
    evidence for the facet operator."""
    from same_same_spark.operators.facets import search_facets

    return search_facets(
        _docs(spark, sf_dir), REF_QUERIES, ["lang", "source"], topn=5,
        id_col="doc_id", text_col="text",
    )


def _sql_search_facets() -> str:
    from same_same_spark.operators.facets import duckdb_facets_sql

    return duckdb_facets_sql(
        "documents", "doc_id", "text", REF_QUERIES, ["lang", "source"],
        topn=5,
    )


def _q_search_after_page2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset pagination (operators/topk.search_after): page 2 of the
    reference BM25 query set via the page-1 cursor — never an OFFSET
    re-rank. The oracle derives the same page from offset ranks
    k+1..2k of a full window re-rank, so the cursor==offset identity
    under the pinned total order is exactly what the differential
    checks (including short match sets: a query with <= k matches has
    no cursor and no page-2 rows)."""
    from same_same_spark.bm25 import scored_matches
    from same_same_spark.operators.topk import search_after, topk_per_query

    scored = scored_matches(
        _docs(spark, sf_dir), REF_QUERIES, id_col="doc_id", text_col="text"
    )
    page1 = topk_per_query(scored, REF_K)
    cursor = page1.filter(F.col("rank") == REF_K).select(
        "query_id",
        F.col("score").alias("after_score"),
        F.col("doc_id").alias("after_doc_id"),
    )
    return _round6(search_after(scored, cursor, REF_K), "score")


def _sql_search_after_page2() -> str:
    inner = duckdb_bm25_sql(
        "documents", "doc_id", "text", REF_QUERIES, k=2 * REF_K
    )
    return f"""
SELECT query_id, doc_id, score, (rank - {REF_K})::INTEGER AS rank
FROM ({inner}) WHERE rank > {REF_K}
"""


def _q_significant_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Significant-terms aggregation (operators/sigterms.significant_terms):
    JLH-scored terms over-represented in each query's match set vs the
    corpus, query terms excluded, fg >= 2. Sole evidence for the
    significant-terms operator; the oracle re-derives both frequency
    tables and the JLH expression independently."""
    from same_same_spark.operators.sigterms import significant_terms

    out = significant_terms(
        _docs(spark, sf_dir), REF_QUERIES, topn=10, min_doc_count=2,
        id_col="doc_id", text_col="text",
    )
    return _round6(out, "score")


def _sql_significant_terms() -> str:
    from same_same_spark.operators.sigterms import duckdb_sigterms_sql

    return duckdb_sigterms_sql(
        "documents", "doc_id", "text", REF_QUERIES, topn=10,
        min_doc_count=2,
    )


def _q_facet_top_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-hits aggregation (operators/facets.facet_top_hits): best 3
    BM25 docs inside each query's top-3 `source` buckets. Sole
    evidence for the bucket-scoped hit ranking (two chained bounded
    tournaments vs the oracle's two window functions)."""
    from same_same_spark.operators.facets import facet_top_hits

    out = facet_top_hits(
        _docs(spark, sf_dir), REF_QUERIES, "source", topn=3, k_hits=3,
        id_col="doc_id", text_col="text",
    )
    return _round6(out, "score")


def _sql_facet_top_hits() -> str:
    from same_same_spark.bm25 import duckdb_scored_sql
    from same_same_spark.operators.facets import duckdb_top_hits_sql

    return duckdb_top_hits_sql(
        duckdb_scored_sql("documents", "doc_id", "text", REF_QUERIES),
        "documents", "doc_id", "source", topn=3, k_hits=3,
    )


# term^boost syntax: re-weighting, duplicate-term boost summing
# (fast + fast^2 = 3.0), a zero boost dropping its term, boosted
# stopwords (no tokens), and a boost-free control query.
BOOSTED_QUERIES: list[tuple[int, str]] = [
    (1, "table^3 query join^0.5"),
    (2, "fast fast^2 scan"),
    (3, "window^0 agg stream^1.5"),
    (4, "the^5 a an"),
    (5, "vector"),
]


def _q_boosted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-time term boosting (operators/boost.boosted_search):
    Lucene's term^boost syntax, duplicate boosts summed, zero boosts
    dropped. Sole evidence for the boosted scorer (the parse is shared
    driver-side code; the weighted scoring + ranking is the
    differential)."""
    from same_same_spark.operators.boost import boosted_search

    out = boosted_search(
        _docs(spark, sf_dir), BOOSTED_QUERIES, k=REF_K,
        id_col="doc_id", text_col="text",
    )
    return _round6(out, "score")


def _sql_boosted_topk() -> str:
    from same_same_spark.operators.boost import duckdb_boosted_sql

    return duckdb_boosted_sql(
        "documents", "doc_id", "text", BOOSTED_QUERIES, k=REF_K
    )


# groups over corpus vocabulary (+ out-of-vocab members, which must
# contribute nothing); "row" appears in two groups.
SYNONYM_GROUPS: list[list[str]] = [
    ["table", "row"],
    ["row", "record", "tuple"],
    ["fast", "quick", "rapid"],
    ["window", "frame"],
]


def _q_synonym_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synonym-expanded search (operators/synonyms.synonym_search):
    query terms expand through an engine-side synonym-group table
    (two broadcast joins + distinct union — the expansion itself is
    under the differential), BM25 over the expanded set. Sole evidence
    for the synonym operator."""
    from same_same_spark.operators.synonyms import synonym_search

    out = synonym_search(
        _docs(spark, sf_dir), REF_QUERIES, SYNONYM_GROUPS, k=REF_K,
        id_col="doc_id", text_col="text",
    )
    return _round6(out, "score")


def _sql_synonym_topk() -> str:
    from same_same_spark.operators.synonyms import duckdb_synonym_sql

    return duckdb_synonym_sql(
        "documents", "doc_id", "text", REF_QUERIES, SYNONYM_GROUPS,
        k=REF_K,
    )


# minimum_should_match=2 over: pure-should 2-of-3, must + 2-of-3
# should with exclusion, a should set SMALLER than the requirement
# (matches nothing, no clamping), and a must-only query (msm ignored
# without should clauses).
BOOL_MSM_QUERIES: list[tuple[int, str, str, str]] = [
    (1, "", "table join merge", ""),
    (2, "spark", "fast scan row", "vector"),
    (3, "", "window", ""),
    (4, "query", "", ""),
]


def _q_boolean_msm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean search with minimum_should_match=2
    (operators/boolquery.boolean_search): Elasticsearch's n-of-m
    should gating layered on the must/should/must_not candidate
    algebra. Sole evidence for the msm gate."""
    from same_same_spark.operators.boolquery import boolean_search

    out = boolean_search(
        _docs(spark, sf_dir), BOOL_MSM_QUERIES, k=REF_K,
        id_col="doc_id", text_col="text", minimum_should_match=2,
    )
    return _round6(out, "score")


def _sql_boolean_msm() -> str:
    from same_same_spark.operators.boolquery import duckdb_bool_sql

    return duckdb_bool_sql(
        "documents", "doc_id", "text", BOOL_MSM_QUERIES, k=REF_K,
        minimum_should_match=2,
    )


# One validated term regex per query: alternation, dot, bounded
# quantifier, class+star (cap pressure), and a no-match probe.
REGEXP_QUERIES: list[tuple[int, str]] = [
    (1, "s(can|ort|low)"),
    (2, "ta.le"),
    (3, "quer(y|ies)"),
    (4, "(fa|va)[a-z]{2,3}"),
    (5, "[a-c][a-z]*"),
    (6, "zz+"),
]


def _q_regexp_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp term queries (operators/wildcard.regexp_search): one
    whole-term regex per query from the cross-engine-safe subset
    (validate_term_regex), expanded against the corpus vocabulary under
    the same deterministic (df DESC, term ASC) cap as the glob mode,
    OR-mode BM25 over the union. Sole evidence for the regexp operator;
    the oracle runs the USER pattern through RE2 vs Spark's Java regex,
    so the differential additionally pins Java-vs-RE2 agreement on
    every pinned pattern."""
    from same_same_spark.operators.wildcard import regexp_search

    out = regexp_search(
        _docs(spark, sf_dir), REGEXP_QUERIES, k=REF_K,
        max_expansions=20, id_col="doc_id", text_col="text",
    )
    return _round6(out, "score")


def _sql_regexp_topk() -> str:
    from same_same_spark.operators.wildcard import duckdb_regexp_sql

    return duckdb_regexp_sql(
        "documents", "doc_id", "text", REGEXP_QUERIES, k=REF_K,
        max_expansions=20,
    )


STATS_AGG_QUERIES: list[tuple[int, str]] = [
    (1, "fast merge"),
    (2, "vector window"),
    (3, "customer order join"),
    (4, "zzz"),
]


def _q_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended-stats metric aggregation over the match set
    (operators/facets.stats_facets): per-query count/min/max/sum/avg +
    sum_of_squares/variance/std_deviation of documents.n_chars —
    Elasticsearch's extended_stats. n_chars is BIGINT, so the sums
    aggregate exactly in the integer domain and every derived double
    is bit-identical across engines (no 6dp rounding needed). Sole
    evidence for the metric-aggregation operator."""
    from same_same_spark.operators.facets import stats_facets

    return stats_facets(
        _docs(spark, sf_dir), STATS_AGG_QUERIES, "n_chars",
        extended=True, id_col="doc_id", text_col="text",
    )


def _sql_stats_agg() -> str:
    from same_same_spark.operators.facets import duckdb_stats_facets_sql

    return duckdb_stats_facets_sql(
        "documents", "doc_id", "text", STATS_AGG_QUERIES, "n_chars",
        extended=True, integer_field=True,
    )


def _q_histogram_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram aggregation over the match set
    (operators/facets.histogram_facets): fixed-interval buckets keyed
    floor(v/interval)*interval over documents.n_chars, every bucket
    between each query's data bounds emitted (min_doc_count=0). Sole
    evidence; the oracle zero-fills with generate_series vs Spark's
    sequence explode, so the fixed-shape contract is what the
    differential checks."""
    from same_same_spark.operators.facets import histogram_facets

    return histogram_facets(
        _docs(spark, sf_dir), STATS_AGG_QUERIES, "n_chars", 50.0,
        id_col="doc_id", text_col="text",
    )


def _sql_histogram_agg() -> str:
    from same_same_spark.operators.facets import duckdb_histogram_sql

    return duckdb_histogram_sql(
        "documents", "doc_id", "text", STATS_AGG_QUERIES, "n_chars", 50.0,
    )


def _q_percentiles_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles aggregation over the match set
    (operators/facets.percentiles_facets) at ES's default percents:
    Spark percentile vs DuckDB quantile_cont — the same exact
    linear-interpolation identity corpus_profile pins, here per
    match set. Sole evidence."""
    from same_same_spark.operators.facets import percentiles_facets

    out = percentiles_facets(
        _docs(spark, sf_dir), STATS_AGG_QUERIES, "n_chars",
        id_col="doc_id", text_col="text",
    )
    return _round6(out, "value")


def _sql_percentiles_agg() -> str:
    from same_same_spark.operators.facets import duckdb_percentiles_sql

    return duckdb_percentiles_sql(
        "documents", "doc_id", "text", STATS_AGG_QUERIES, "n_chars",
    )


def _q_cardinality_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """value_count + exact cardinality + missing counts over the match
    set (operators/facets.cardinality_facets) on documents.source.
    Sole evidence; all-integer outputs, compared exactly."""
    from same_same_spark.operators.facets import cardinality_facets

    return cardinality_facets(
        _docs(spark, sf_dir), STATS_AGG_QUERIES, "source",
        id_col="doc_id", text_col="text",
    )


def _sql_cardinality_agg() -> str:
    from same_same_spark.operators.facets import duckdb_cardinality_sql

    return duckdb_cardinality_sql(
        "documents", "doc_id", "text", STATS_AGG_QUERIES, "source",
    )


def _q_rescore_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 → exact-phrase rescore → top-k (operators/rescore.py):
    ES's rescore block with score_mode=total; the phrase scores
    Lucene PhraseQuery-style (tf = adjacency count, idf = Σ term
    idfs) on the bounded top-window only. Sole evidence; the oracle
    re-derives the window with a window function over the full scored
    set and counts phrases with unprefiltered list-slice scans."""
    from same_same_spark.operators.rescore import rescore_topk

    out = rescore_topk(
        _docs(spark, sf_dir), PHRASE_QUERIES, k=REF_K, window_size=30,
        rescore_weight=2.0, id_col="doc_id", text_col="text",
    )
    return _round6(out, "score", "primary_score", "rescore_score")


def _sql_rescore_topk() -> str:
    from same_same_spark.operators.rescore import duckdb_rescore_sql

    return duckdb_rescore_sql(
        "documents", "doc_id", "text", PHRASE_QUERIES, k=REF_K,
        window_size=30, rescore_weight=2.0,
    )


# Query 1 pages from the start; query 2 resumes from a mid-space
# after-key (both the pruned path and the page-1 path under one
# differential); query 4 matches nothing.
COMPOSITE_AFTER: dict[int, tuple] = {2: ("en", "src12")}


def _q_composite_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite aggregation (operators/facets.composite_facets):
    key-ordered (lang, source) buckets over the match set with an
    after-key cursor — ES's paginated bucket agg. Sole evidence; the
    oracle paginates with a window function over the FULL bucket list
    vs Spark's filter-then-bounded-tournament, so after-key pruning
    correctness is what the differential checks."""
    from same_same_spark.operators.facets import composite_facets

    return composite_facets(
        _docs(spark, sf_dir), STATS_AGG_QUERIES, ["lang", "source"],
        size=5, after=COMPOSITE_AFTER, id_col="doc_id", text_col="text",
    )


def _sql_composite_agg() -> str:
    from same_same_spark.operators.facets import duckdb_composite_sql

    return duckdb_composite_sql(
        "documents", "doc_id", "text", STATS_AGG_QUERIES,
        ["lang", "source"], size=5, after=COMPOSITE_AFTER,
    )


def _q_decay_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Function-score decay (operators/decay.decay_score): BM25 ×
    gauss decay over documents.n_chars (origin 300, scale 150,
    offset 25, decay 0.5) — ES's function_score family with the shape
    constant computed driver-side and embedded in both engines. Sole
    evidence for the decay family (X7 temporal decay is its
    age-specialized cousin)."""
    from same_same_spark.operators.decay import decay_score

    out = decay_score(
        _docs(spark, sf_dir), STATS_AGG_QUERIES, "n_chars",
        origin=300.0, scale=150.0, offset=25.0, decay=0.5, fn="gauss",
        k=REF_K, id_col="doc_id", text_col="text",
    )
    return _round6(out, "score", "bm25", "multiplier")


def _sql_decay_score() -> str:
    from same_same_spark.operators.decay import duckdb_decay_sql

    return duckdb_decay_sql(
        "documents", "doc_id", "text", STATS_AGG_QUERIES, "n_chars",
        origin=300.0, scale=150.0, offset=25.0, decay=0.5, fn="gauss",
        k=REF_K,
    )


# Alert-table shape: overlapping rules, a strict multi-term rule,
# a never-matching rule, a stopword-only rule (never matches).
PERCOLATE_RULES: list[tuple[int, str]] = [
    (1, "fast merge"),
    (2, "vector"),
    (3, "customer order join group"),
    (4, "zzzqqq"),
    (5, "the a"),
]


def _q_percolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percolation (operators/percolate.py): the registered-query
    relation — every (rule, doc) pair where the doc contains ALL of
    the rule's terms, BM25-scored. Reverse search / rule-based
    document routing. Sole evidence; the oracle re-derives the
    coverage gate with HAVING count(DISTINCT term) = m."""
    from same_same_spark.operators.percolate import percolate

    out = percolate(
        _docs(spark, sf_dir), PERCOLATE_RULES,
        id_col="doc_id", text_col="text",
    )
    return _round6(out, "score")


def _sql_percolate() -> str:
    from same_same_spark.operators.percolate import duckdb_percolate_sql

    return duckdb_percolate_sql(
        "documents", "doc_id", "text", PERCOLATE_RULES
    )


ADJACENCY_FILTERS: list[tuple[str, str]] = [
    ("fastish", "fast slow"),
    ("joins", "join merge"),
    ("vectors", "vector"),
    ("nothing", "zzzqqq"),
]


def _q_adjacency_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacency-matrix aggregation
    (operators/facets.adjacency_matrix_facets): named-filter overlap
    counts (singles + 'a&b' pair intersections). Sole evidence; the
    oracle re-derives pairs with a doc-keyed self-join vs Spark's
    per-doc array expansion."""
    from same_same_spark.operators.facets import adjacency_matrix_facets

    return adjacency_matrix_facets(
        _docs(spark, sf_dir), ADJACENCY_FILTERS,
        id_col="doc_id", text_col="text",
    )


def _sql_adjacency_matrix() -> str:
    from same_same_spark.operators.facets import (
        duckdb_adjacency_matrix_sql,
    )

    return duckdb_adjacency_matrix_sql(
        "documents", "doc_id", "text", ADJACENCY_FILTERS
    )


def _q_terms_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Terms aggregation with a nested metric sub-aggregation
    (operators/facets.terms_metrics_facets): top source buckets per
    query by match count, each carrying count/min/max/sum/avg of
    n_chars — the ES terms{stats} nesting in ONE map-side-combined
    pass. Sole evidence; integer-domain sums make the derived doubles
    bit-identical cross-engine."""
    from same_same_spark.operators.facets import terms_metrics_facets

    return terms_metrics_facets(
        _docs(spark, sf_dir), STATS_AGG_QUERIES, "source", "n_chars",
        topn=5, id_col="doc_id", text_col="text",
    )


def _sql_terms_metrics() -> str:
    from same_same_spark.operators.facets import duckdb_terms_metrics_sql

    return duckdb_terms_metrics_sql(
        "documents", "doc_id", "text", STATS_AGG_QUERIES, "source",
        "n_chars", topn=5, integer_field=True,
    )


def _q_date_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-filled calendar date histogram over events
    (operators/events.date_histogram): per event_type × day bucket
    counts, every day between each type's first and last event emitted
    (min_doc_count=0) — ES's date_histogram; events_hourly is the
    sparse tumbling cousin. Sole evidence; the oracle zero-fills with
    generate_series + INTERVAL stepping vs Spark's sequence explode."""
    from same_same_spark.operators.events import date_histogram

    return date_histogram(
        _events(spark, sf_dir), "day", group_col="event_type"
    )


def _sql_date_histogram() -> str:
    from same_same_spark.operators.events import duckdb_date_histogram_sql

    return duckdb_date_histogram_sql(
        "events", "day", group_col="event_type"
    )


def _q_term_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term vectors (operators/termvectors.py): per requested doc the
    analyzer's terms with tf + 1-based positions and CORPUS-wide
    df/ttf — ES _termvectors with term_statistics. Sole evidence; the
    oracle re-derives positions with generate_subscripts vs Spark's
    posexplode."""
    from same_same_spark.operators.termvectors import term_vectors

    return term_vectors(
        _docs(spark, sf_dir), [3, 17, 42, 999_999_999],
        id_col="doc_id", text_col="text",
    )


def _sql_term_vectors() -> str:
    from same_same_spark.operators.termvectors import (
        duckdb_term_vectors_sql,
    )

    return duckdb_term_vectors_sql(
        "documents", "doc_id", "text", [3, 17, 42, 999_999_999]
    )


# In-order with gaps (slop=1), an adjacent pair (phrase-equivalent at
# slop=0 semantics exercised in tests), a duplicate-term sequence, and
# a no-match probe.
SPAN_QUERIES: list[tuple[int, str]] = [
    (1, "fast sort"),
    (2, "table query"),
    (3, "table table"),
    (4, "zzz qq"),
]


def _q_span_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered span-near (operators/spannear.py): the query token
    sequence embeds in order within a slop budget; n_spans counts
    valid greedy starts; BM25 rank restricted to matches. Completes
    the positional family (phrase = slop 0 ordered, proximity =
    unordered window). Sole evidence; the oracle UNROLLS the greedy
    chain per query into nested list_min/list_filter expressions vs
    Spark's generic fold."""
    from same_same_spark.operators.spannear import span_near_search

    out = span_near_search(
        _docs(spark, sf_dir), SPAN_QUERIES, slop=1, k=REF_K,
        id_col="doc_id", text_col="text",
    )
    return _round6(out, "score")


def _sql_span_near() -> str:
    from same_same_spark.operators.spannear import duckdb_span_near_sql

    return duckdb_span_near_sql(
        "documents", "doc_id", "text", SPAN_QUERIES, slop=1, k=REF_K
    )


EXPLAIN_PAIRS: list[tuple[int, int]] = [
    (1, 3), (1, 17), (1, 42), (2, 3), (2, 99), (3, 5), (4, 7),
    (1, 999_999_999),
]


def _q_explain_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score explanation (operators/explain.py): per-(query, doc, term)
    BM25 breakdown with exact inputs (tf/dl/df/idf/weight) — ES's
    _explain; per-term weights sum to the engine's score by
    construction (pinned in tests). Sole evidence."""
    from same_same_spark.operators.explain import explain_scores

    out = explain_scores(
        _docs(spark, sf_dir), STATS_AGG_QUERIES, EXPLAIN_PAIRS,
        id_col="doc_id", text_col="text",
    )
    return _round6(out, "idf", "weight")


def _sql_explain_score() -> str:
    from same_same_spark.operators.explain import duckdb_explain_sql

    return duckdb_explain_sql(
        "documents", "doc_id", "text", STATS_AGG_QUERIES, EXPLAIN_PAIRS
    )


def _q_ann_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered k-NN (pipeline/ann.brute_topk_filtered): exact cosine
    top-5 among vectors passing a metadata predicate (label % 2 = 0)
    — the pre-filter vector-store shape; a post-filtered unfiltered
    top-k would under-return, which is why this is its own operator.
    Sole evidence; the IVF-filtered path is pinned rank-identical in
    tests/test_ann_filtered."""
    from same_same_spark.pipeline import ann as ann_ops

    out = ann_ops.brute_topk_filtered(
        _emb(spark, sf_dir), _ann_queries(spark, sf_dir),
        "label % 2 = 0", k=5,
    )
    return _round6(out, "score")


_SQL_ANN_FILTERED = """
WITH q AS (
  SELECT vec_id::INTEGER AS query_id, embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id IN (0, 1, 2)
),
s AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(e.embedding::DOUBLE[], q.qv) AS score
  FROM embeddings e, q
  WHERE len(e.embedding) = len(q.qv) AND e.label % 2 = 0
),
r AS (
  SELECT query_id, vec_id, score,
         row_number() OVER (
           PARTITION BY query_id ORDER BY round(score, 9) DESC, vec_id ASC
         ) AS rank
  FROM s
)
SELECT query_id, vec_id, round(score, 6) AS score, rank::INTEGER AS rank
FROM r WHERE rank <= 5
"""


# BM25F derived-field rule (pinned, both engines): the corpus has one
# text blob, so the entry derives head = first 6 X1 tokens rejoined
# with spaces, body = the rest — re-tokenizing a rejoined token list is
# the identity under X1, so the field split is exact cross-engine.
_BM25F_HEAD_LEN = 6
_BM25F_FIELDS = {"head": (3.0, 0.5), "body": (1.0, 0.75)}


def _q_bm25f_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25F cross-field ranking (operators/bm25f.py): per-field
    weighted, per-field length-normalized tf folded into one
    saturation (Robertson et al. 2004) — head^3 over the first 6
    tokens vs body. Sole evidence; the oracle re-derives the math with
    per-field CTEs instead of the union fold."""
    from same_same_spark.operators.bm25f import bm25f_search
    from same_same_spark.text.tokenizer import tokens_col

    tok = tokens_col("text")
    docs_f = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat_ws(" ", F.slice(tok, 1, _BM25F_HEAD_LEN)).alias("head"),
        F.concat_ws(
            " ", F.slice(tok, _BM25F_HEAD_LEN + 1, 1 << 30)
        ).alias("body"),
    )
    out = bm25f_search(
        docs_f, REF_QUERIES, _BM25F_FIELDS, k=REF_K, id_col="doc_id"
    )
    return _round6(out, "score")


def _sql_bm25f_topk() -> str:
    from same_same_spark.operators.bm25f import duckdb_bm25f_sql
    from same_same_spark.text.tokenizer import duckdb_tokens_sql

    toks = duckdb_tokens_sql("text")
    prelude = f"""docs_f AS (
  SELECT doc_id,
         array_to_string(list_slice({toks}, 1, {_BM25F_HEAD_LEN}), ' ')
           AS head,
         array_to_string(
           list_slice({toks}, {_BM25F_HEAD_LEN} + 1, 1 << 30), ' ')
           AS body
  FROM documents
), """
    return duckdb_bm25f_sql(
        "docs_f", "doc_id", REF_QUERIES, _BM25F_FIELDS, k=REF_K,
        prelude_ctes=prelude,
    )


SUGGEST_PREFIXES: list[tuple[int, str]] = [
    (1, "sc"), (2, "win"), (3, "ba"), (4, "zzzz")
]


def _q_suggest_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Completion suggester (operators/suggest.py): prefix
    autocompletion from the corpus vocabulary, rank 1..5 per prefix
    under (df DESC, term ASC). Twin-tail composition: candidates come
    from wildcard_topk's verified expand_patterns engine (prefix ≡
    glob '<p>*'); the oracle re-derives via a LIKE join + window."""
    from same_same_spark.operators.suggest import suggest_completions

    return suggest_completions(
        _docs(spark, sf_dir), SUGGEST_PREFIXES, topn=5,
        id_col="doc_id", text_col="text",
    )


def _sql_suggest_topk() -> str:
    from same_same_spark.operators.suggest import (
        duckdb_suggest_completions_sql,
    )

    return duckdb_suggest_completions_sql(
        "documents", "doc_id", "text", SUGGEST_PREFIXES, topn=5
    )


def _q_pipeline_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline aggregations (events.pipeline_aggs): ES's
    cumulative_sum / derivative / moving_fn(avg, 7) over the
    zero-filled per-event_type daily date histogram — windows
    PARTITIONED by event_type (the sessionize per-key pattern), each
    partition bounded by the histogram breaker. Sole evidence; the
    oracle re-derives all three with DuckDB window functions."""
    from same_same_spark.operators.events import date_histogram, pipeline_aggs

    series = date_histogram(
        _events(spark, sf_dir), "day", group_col="event_type"
    )
    out = pipeline_aggs(series, group_cols=["event_type"], window=7)
    return _round6(out, "moving_avg")


def _sql_pipeline_aggs() -> str:
    from same_same_spark.operators.events import (
        duckdb_date_histogram_sql,
        duckdb_pipeline_aggs_sql,
    )

    inner = duckdb_pipeline_aggs_sql(
        duckdb_date_histogram_sql("events", "day", group_col="event_type"),
        group_cols=["event_type"],
        window=7,
    )
    return f"""
SELECT event_type, bucket, doc_count, cumulative_sum, derivative,
       round(moving_avg, 6) AS moving_avg
FROM ({inner})
"""


def _q_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 scalar quantization (pipeline/sq.py): per-dim exact-bounds
    int8 codes (faiss QT_8bit shape, the cheap tier before PQ),
    asymmetric L2² top-5. Sole evidence; the oracle re-derives the
    ENTIRE train→encode→rank chain in SQL (exact per-dim min/max, the
    pinned floor(v+0.5) encode — codes are integers, so the encode
    differential is exact, distance compares at round-6)."""
    from same_same_spark.pipeline.sq import (
        sq_encode,
        sq_topk,
        train_sq_params,
    )

    emb = _emb(spark, sf_dir)
    mins, steps = train_sq_params(emb)
    coded = sq_encode(emb.select("vec_id", "embedding"), mins, steps)
    out = sq_topk(
        coded, mins, steps, _ann_queries(spark, sf_dir), k=5
    )
    return _round6(out, "dist")


def _sql_sq8_topk() -> str:
    from same_same_spark.pipeline.sq import duckdb_sq_topk_sql

    return duckdb_sq_topk_sql(
        "embeddings", "vec_id", "embedding", None, None, None,
        k=5, dim=64, query_ids=[0, 1, 2],
    )


def _q_dirichlet_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LM Dirichlet similarity (operators/similarity.py): query
    likelihood with Dirichlet smoothing (Zhai & Lafferty 2001;
    Lucene's LMDirichletSimilarity, per-term clamp at 0) — the
    engine's second relevance model next to BM25. Sole evidence; the
    oracle re-derives ttf from the full token stream vs Spark's
    matched-set derivation."""
    from same_same_spark.operators.similarity import dirichlet_search

    out = dirichlet_search(
        _docs(spark, sf_dir), REF_QUERIES, k=REF_K,
        id_col="doc_id", text_col="text",
    )
    return _round6(out, "score")


def _sql_dirichlet_topk() -> str:
    from same_same_spark.operators.similarity import duckdb_dirichlet_sql

    return duckdb_dirichlet_sql(
        "documents", "doc_id", "text", REF_QUERIES, k=REF_K
    )


def _q_jm_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LM Jelinek-Mercer similarity (operators/similarity.py): query
    likelihood with linear collection-model interpolation (Zhai &
    Lafferty 2001; Lucene's LMJelinekMercerSimilarity) — the engine's
    third relevance model. Saturation-overflow entry: the top-50 is
    fully spent on never-verified sole evidence, so this sits at 51+
    with the machine-checked exemption (_SATURATION_OVERFLOW)."""
    from same_same_spark.operators.similarity import jm_search

    out = jm_search(
        _docs(spark, sf_dir), REF_QUERIES, k=REF_K,
        id_col="doc_id", text_col="text",
    )
    return _round6(out, "score")


def _sql_jm_topk() -> str:
    from same_same_spark.operators.similarity import duckdb_jm_sql

    return duckdb_jm_sql(
        "documents", "doc_id", "text", REF_QUERIES, k=REF_K
    )


def _q_bq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary quantization (pipeline/bq.py): per-dim exact midrange
    sign bits packed 32/word (faiss IndexBinaryFlat shape, the 32×
    shortlist tier below SQ8/PQ), Hamming top-5. The oracle re-derives
    the ENTIRE train→encode→rank chain in SQL and every compared value
    is an INTEGER — the differential is exact end to end.
    Saturation-overflow entry (see _SATURATION_OVERFLOW)."""
    from same_same_spark.pipeline.bq import (
        bq_encode,
        bq_topk,
        train_bq_thresholds,
    )

    emb = _emb(spark, sf_dir)
    thr = train_bq_thresholds(emb)
    coded = bq_encode(emb.select("vec_id", "embedding"), thr)
    return bq_topk(coded, thr, _ann_queries(spark, sf_dir), k=5)


def _sql_bq_topk() -> str:
    from same_same_spark.pipeline.bq import duckdb_bq_topk_sql

    return duckdb_bq_topk_sql(
        "embeddings", "vec_id", "embedding", None, None,
        k=5, dim=64, query_ids=[0, 1, 2],
    )


# Clause lists for dis_max: query 1 mixes a strong and a weak clause,
# query 2 has three clauses (sum-vs-max separation needs >= 2 matched),
# query 3's first clause is stopword-only (contributes nothing).
DISMAX_QUERIES: list[tuple[int, list[str]]] = [
    (1, ["table query join", "fast scan"]),
    (2, ["window agg", "stream batch", "vector search"]),
    (3, ["the a an", "filter sort"]),
]


def _q_dismax_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunction-max query (operators/dismax.dismax_search):
    best-clause BM25 + tie_breaker times the rest (Lucene dis_max /
    multi_match best_fields semantics). Clauses ride ONE composite-id
    scored_matches pass — zero extra shuffles. Sole evidence; the
    oracle re-derives the combine over the pinned per-clause scored
    fragment. Saturation-overflow entry (see _SATURATION_OVERFLOW)."""
    from same_same_spark.operators.dismax import dismax_search

    out = dismax_search(
        _docs(spark, sf_dir), DISMAX_QUERIES, tie_breaker=0.3, k=REF_K,
        id_col="doc_id", text_col="text",
    )
    return _round6(out, "score")


def _sql_dismax_topk() -> str:
    from same_same_spark.operators.dismax import duckdb_dismax_sql

    return duckdb_dismax_sql(
        "documents", "doc_id", "text", DISMAX_QUERIES,
        tie_breaker=0.3, k=REF_K,
    )


# Named-filter buckets over top-level doc columns (metadata_col=None
# binding): eq on a string, numeric gte, and an AND of case-insensitive
# contains + numeric lt; 'SRC1' is deliberately uppercase (the compile
# lowers both sides). REF_QUERIES includes the zero-token query 4 —
# its buckets must still emit with doc_count 0.
FILTER_BUCKETS: dict[str, dict] = {
    "english": {"lang": {"eq": "en"}},
    "long": {"n_chars": {"gte": 400}},
    "src1x_short": {"source": {"contains": "SRC1"}, "n_chars": {"lt": 400}},
}

# The SQL predicates are hand-derived from the FilterExpr semantics
# (filters.py's truth tables), NOT generated — the differential covers
# the compiled Column tree against this independent reading.
_FILTER_BUCKET_PREDS: list[tuple[str, str]] = [
    ("english", "(lang IS NOT NULL AND lang = 'en')"),
    ("long", "(n_chars IS NOT NULL AND CAST(n_chars AS DOUBLE) >= 400.0)"),
    (
        "src1x_short",
        "(source IS NOT NULL AND contains(lower(source), lower('SRC1')))"
        " AND (n_chars IS NOT NULL AND CAST(n_chars AS DOUBLE) < 400.0)",
    ),
]


def _q_filters_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filters aggregation (operators/facets.filters_facets): named
    FilterExpr buckets over the BM25 match set — the F2/F3 predicate
    algebra driving aggregation, ES filters-agg shape with
    other_bucket. Fixed output shape (zero-match queries and empty
    buckets emit doc_count 0). Sole evidence; the oracle's predicates
    are hand-derived from the FilterExpr truth tables.
    Saturation-overflow entry (see _SATURATION_OVERFLOW)."""
    from same_same_spark.operators.facets import filters_facets

    out = filters_facets(
        _docs(spark, sf_dir), REF_QUERIES, FILTER_BUCKETS,
        other_bucket=True, metadata_col=None,
        id_col="doc_id", text_col="text",
    )
    return _round6(out, "avg_score")


def _sql_filters_agg() -> str:
    from same_same_spark.operators.facets import duckdb_filters_facets_sql

    return duckdb_filters_facets_sql(
        "documents", "doc_id", "text", REF_QUERIES,
        _FILTER_BUCKET_PREDS, meta_cols=["lang", "source", "n_chars"],
        other_bucket=True,
    )


def _q_mmr_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversification (operators/mmr.mmr_topk): exact cosine
    top-20 pool per query, greedy maximal-marginal-relevance selection
    of 5 (lam=0.7) in one bounded Arrow group per query. Sole evidence;
    the oracle UNROLLS the greedy steps as chained CTEs (penalty
    re-derived as max-sim-to-selected via plain aggregates), so the two
    engines share no selection code. Saturation-overflow entry (see
    _SATURATION_OVERFLOW)."""
    from same_same_spark.operators.mmr import mmr_topk

    out = mmr_topk(
        _emb(spark, sf_dir), _ann_queries(spark, sf_dir),
        k=5, pool=20, lam=0.7,
    )
    return _round6(out, "score")


def _sql_mmr_topk() -> str:
    from same_same_spark.operators.mmr import duckdb_mmr_sql

    return duckdb_mmr_sql(
        "embeddings", query_ids=[0, 1, 2], k=5, pool=20, lam=0.7,
    )


# multi_match fields: the SAME head/body token-slice derivation the
# bm25f entry pins (head = first 6 X1 tokens), so the two multi-field
# families (per-field stats vs blended stats) are compared over
# identical fields. head^2 best_fields with tie_breaker 0.25.
_MM_FIELDS = {"head": 2.0, "body": 1.0}


def _q_multi_match_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """multi_match best_fields (operators/multimatch.py): one query
    string against several fields, each with its OWN corpus stats
    (Lucene per-field semantics), dis-max combine with tie_breaker.
    Sole evidence for the per-field-stats family; the oracle
    instantiates the pinned scored fragment per field and re-derives
    the combine. Saturation-overflow entry (see
    _SATURATION_OVERFLOW)."""
    from same_same_spark.operators.multimatch import multi_match_search
    from same_same_spark.text.tokenizer import tokens_col

    tok = tokens_col("text")
    docs_f = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat_ws(" ", F.slice(tok, 1, _BM25F_HEAD_LEN)).alias("head"),
        F.concat_ws(
            " ", F.slice(tok, _BM25F_HEAD_LEN + 1, 1 << 30)
        ).alias("body"),
    )
    out = multi_match_search(
        docs_f, REF_QUERIES, _MM_FIELDS, mode="best_fields",
        tie_breaker=0.25, k=REF_K, id_col="doc_id",
    )
    return _round6(out, "score")


def _sql_multi_match_topk() -> str:
    from same_same_spark.operators.multimatch import duckdb_multi_match_sql
    from same_same_spark.text.tokenizer import duckdb_tokens_sql

    toks = duckdb_tokens_sql("text")
    prelude = f"""docs_f AS (
  SELECT doc_id,
         array_to_string(list_slice({toks}, 1, {_BM25F_HEAD_LEN}), ' ')
           AS head,
         array_to_string(
           list_slice({toks}, {_BM25F_HEAD_LEN} + 1, 1 << 30), ' ')
           AS body
  FROM documents
), """
    return duckdb_multi_match_sql(
        "docs_f", "doc_id", REF_QUERIES, _MM_FIELDS, mode="best_fields",
        tie_breaker=0.25, k=REF_K, prelude_ctes=prelude,
    )


def _q_matrix_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """matrix_stats aggregation (operators/facets.matrix_stats_facets):
    complete-case sample covariance + Pearson correlation between
    n_chars and the X1 token count over each query's match set — ONE
    aggregate row per query computing every pair's moments, exploded.
    Sole evidence; the oracle re-derives both moments with DuckDB's
    own covar_samp/corr over an independently-built match set.
    Saturation-overflow entry (see _SATURATION_OVERFLOW)."""
    from same_same_spark.operators.facets import matrix_stats_facets
    from same_same_spark.text.tokenizer import tokens_col

    docs_m = _docs(spark, sf_dir).select(
        "doc_id", "text", "n_chars",
        F.size(tokens_col("text")).cast("long").alias("dl"),
    )
    out = matrix_stats_facets(
        docs_m, REF_QUERIES, ["n_chars", "dl"],
        id_col="doc_id", text_col="text",
    )
    return _round6(out, "covariance", "correlation")


def _sql_matrix_stats_agg() -> str:
    from same_same_spark.operators.facets import duckdb_matrix_stats_sql
    from same_same_spark.text.tokenizer import duckdb_tokens_sql

    toks = duckdb_tokens_sql("text")
    prelude = f"""docs_m AS (
  SELECT doc_id, text, n_chars, len({toks})::BIGINT AS dl
  FROM documents
), """
    return duckdb_matrix_stats_sql(
        "docs_m", "doc_id", "text", REF_QUERIES, ["n_chars", "dl"],
        prelude_ctes=prelude,
    )


def _q_rare_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rare_terms aggregation (operators/facets.rare_terms_facets):
    long-tail facet values of `n_chars` over each query's match set
    (doc_count <= 2, rarest first) — the complement of search_facets'
    terms agg; the rarity filter lands on aggregated counts and
    ranking is the bounded tournament. Sole evidence; the oracle
    re-derives with a row_number window. Saturation-overflow entry
    (see _SATURATION_OVERFLOW)."""
    from same_same_spark.operators.facets import rare_terms_facets

    return rare_terms_facets(
        _docs(spark, sf_dir), REF_QUERIES, "n_chars",
        max_doc_count=2, topn=10, id_col="doc_id", text_col="text",
    )


def _sql_rare_terms() -> str:
    from same_same_spark.operators.facets import duckdb_rare_terms_sql

    return duckdb_rare_terms_sql(
        "documents", "doc_id", "text", REF_QUERIES, "n_chars",
        max_doc_count=2, topn=10,
    )


def _q_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """weighted_avg aggregation (operators/facets.weighted_avg_facets):
    n_chars weighted by the X1 token count over each query's match set
    — sum(v*w)/sum(w) with ES's skip-on-missing semantics, NULL on a
    zero weight sum (try_divide, never an ANSI throw). Sole evidence;
    the oracle re-derives with nullif division over an
    independently-built match set. Saturation-overflow entry (see
    _SATURATION_OVERFLOW)."""
    from same_same_spark.operators.facets import weighted_avg_facets
    from same_same_spark.text.tokenizer import tokens_col

    docs_m = _docs(spark, sf_dir).select(
        "doc_id", "text", "n_chars",
        F.size(tokens_col("text")).cast("long").alias("dl"),
    )
    out = weighted_avg_facets(
        docs_m, REF_QUERIES, "n_chars", "dl",
        id_col="doc_id", text_col="text",
    )
    return _round6(out, "weighted_avg")


def _sql_weighted_avg() -> str:
    from same_same_spark.operators.facets import duckdb_weighted_avg_sql
    from same_same_spark.text.tokenizer import duckdb_tokens_sql

    toks = duckdb_tokens_sql("text")
    prelude = f"""docs_m AS (
  SELECT doc_id, text, n_chars, len({toks})::BIGINT AS dl
  FROM documents
), """
    return duckdb_weighted_avg_sql(
        "docs_m", "doc_id", "text", REF_QUERIES, "n_chars", "dl",
        prelude_ctes=prelude,
    )


def _q_bucket_sort_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bucket_selector + bucket_sort pipeline aggs (operators/events):
    over the per-event_type zero-filled daily histogram, keep buckets
    with >= 1 event (the selector's comparison-script family) and
    emit each type's top-3 busiest days ((count DESC, day ASC),
    absolute bucket_rank) via the bounded tournament — never a rank
    window on data rows. Sole evidence; the oracle re-derives with a
    row_number window over the shared histogram twin.
    Saturation-overflow entry (see _SATURATION_OVERFLOW)."""
    from same_same_spark.operators.events import (
        bucket_selector,
        bucket_sort,
        date_histogram,
    )

    series = date_histogram(
        _events(spark, sf_dir), "day", group_col="event_type"
    )
    kept = bucket_selector(series, min_value=1)
    return bucket_sort(
        kept, size=3, sort_col="doc_count", order_col="bucket",
        group_cols=["event_type"],
    )


def _sql_bucket_sort_days() -> str:
    from same_same_spark.operators.events import duckdb_date_histogram_sql

    hist = duckdb_date_histogram_sql("events", "day", group_col="event_type")
    return f"""
WITH series AS ({hist}),
kept AS (SELECT * FROM series WHERE doc_count >= 1.0),
ranked AS (
  SELECT event_type, bucket, doc_count, row_number() OVER (
    PARTITION BY event_type
    ORDER BY round(doc_count, 9) DESC, bucket ASC
  ) AS bucket_rank
  FROM kept
)
SELECT event_type, bucket, doc_count, bucket_rank::INTEGER AS bucket_rank
FROM ranked WHERE bucket_rank <= 3
"""


def _q_cascade_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tiered quantized retrieval (pipeline/cascade.cascade_topk):
    BQ Hamming shortlist (40) → SQ8 asymmetric refine (15) → exact L2
    top-5 — the faiss binary+refine serving shape; stage boundaries
    strict subsets, every stage the bounded tournament. Sole evidence;
    the oracle re-derives BOTH trainers, BOTH encodes and all three
    stages in SQL. Saturation-overflow entry (see
    _SATURATION_OVERFLOW)."""
    from same_same_spark.pipeline.cascade import cascade_topk

    out = cascade_topk(
        _emb(spark, sf_dir), _ann_queries(spark, sf_dir),
        k=5, shortlist=40, refine=15,
    )
    return _round6(out, "dist")


def _sql_cascade_topk() -> str:
    from same_same_spark.pipeline.cascade import duckdb_cascade_sql

    return duckdb_cascade_sql(
        "embeddings", "vec_id", "embedding", dim=64,
        query_ids=[0, 1, 2], k=5, shortlist=40, refine=15,
    )


def _q_rank_feature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank_feature query (operators/feature.rank_feature_topk):
    BM25 + boost * saturation(n_chars, pivot=300) — a positive static
    signal tilting text relevance (ES's bool-should rank_feature
    shape); NULL/non-positive features contribute 0. Sole evidence;
    the oracle re-derives the saturation fold over the pinned scored
    fragment. Saturation-overflow entry (see _SATURATION_OVERFLOW)."""
    from same_same_spark.operators.feature import rank_feature_topk

    out = rank_feature_topk(
        _docs(spark, sf_dir), REF_QUERIES, "n_chars",
        function="saturation", pivot=300.0, boost=0.5, k=REF_K,
        id_col="doc_id", text_col="text",
    )
    return _round6(out, "score")


def _sql_rank_feature() -> str:
    from same_same_spark.operators.feature import duckdb_rank_feature_sql

    return duckdb_rank_feature_sql(
        "documents", "doc_id", "text", REF_QUERIES, "n_chars",
        function="saturation", pivot=300.0, boost=0.5, k=REF_K,
    )


def _q_distance_feature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """distance_feature query (operators/feature.
    distance_feature_topk): BM25 + boost * pivot/(pivot + |n_chars -
    300|) — proximity of a numeric field to an origin (ES's recency/
    nearness boost). Sole evidence; independent SQL re-derivation.
    Saturation-overflow entry (see _SATURATION_OVERFLOW)."""
    from same_same_spark.operators.feature import distance_feature_topk

    out = distance_feature_topk(
        _docs(spark, sf_dir), REF_QUERIES, "n_chars",
        origin=300.0, pivot=50.0, boost=1.0, k=REF_K,
        id_col="doc_id", text_col="text",
    )
    return _round6(out, "score")


def _sql_distance_feature() -> str:
    from same_same_spark.operators.feature import (
        duckdb_distance_feature_sql,
    )

    return duckdb_distance_feature_sql(
        "documents", "doc_id", "text", REF_QUERIES, "n_chars",
        origin=300.0, pivot=50.0, boost=1.0, k=REF_K,
    )


def _q_terms_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """terms_set query (operators/boolquery.terms_set_search): the
    minimum_should_match comes FROM the document (required = 1 +
    doc_id % 3, the tags-matching workhorse), clamped by the query's
    term count and floored at 1; matches BM25-scored. Sole evidence;
    the oracle re-derives the gate + clamp independently.
    Saturation-overflow entry (see _SATURATION_OVERFLOW)."""
    from same_same_spark.operators.boolquery import terms_set_search

    docs_m = _docs(spark, sf_dir).withColumn(
        "required_matches", (F.lit(1) + F.col("doc_id") % 3).cast("int")
    )
    out = terms_set_search(
        docs_m, REF_QUERIES, "required_matches", k=REF_K,
        id_col="doc_id", text_col="text",
    )
    return _round6(out, "score")


def _sql_terms_set() -> str:
    from same_same_spark.operators.boolquery import duckdb_terms_set_sql

    prelude = (
        "docs_ts AS (SELECT *, (1 + doc_id % 3)::INTEGER AS "
        "required_matches FROM documents), "
    )
    return duckdb_terms_set_sql(
        "docs_ts", "doc_id", "text", REF_QUERIES,
        "required_matches", k=REF_K, prelude_ctes=prelude,
    )


# search-as-you-type fixtures: short fixed+prefix pairs, a pure-prefix
# query (no fixed tokens), a punctuation-only last chunk (empty
# normalized prefix -> no rows), and a never-completing prefix (empty
# expansion -> no rows).
MPP_QUERIES: list[tuple[int, str]] = [
    (1, "fast mer"),
    (2, "table que"),
    (3, "windo"),
    (4, "fast !!!"),
    (5, "fast zzzzqq"),
]


def _q_match_phrase_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """match_phrase_prefix (operators/phrase.
    match_phrase_prefix_search): search-as-you-type — fixed tokens
    followed immediately by a prefix completion from the corpus
    vocabulary (capped (df DESC, term ASC), the engine's one expansion
    rule), synonym-union BM25 over matches. Sole evidence; the oracle
    expands via starts_with + a window and brute-forces adjacency.
    Saturation-overflow entry (see _SATURATION_OVERFLOW)."""
    from same_same_spark.operators.phrase import match_phrase_prefix_search

    out = match_phrase_prefix_search(
        _docs(spark, sf_dir), MPP_QUERIES, k=REF_K, max_expansions=10,
        id_col="doc_id", text_col="text",
    )
    return _round6(out, "score")


def _sql_match_phrase_prefix() -> str:
    from same_same_spark.operators.phrase import (
        duckdb_match_phrase_prefix_sql,
    )

    return duckdb_match_phrase_prefix_sql(
        "documents", "doc_id", "text", MPP_QUERIES, k=REF_K,
        max_expansions=10,
    )


# Deterministic pointwise LTR label over (doc_id, n_chars) — both
# engines derive it identically; it exists to make the normal
# equations well-posed, not to be a good relevance signal.
_LTR_LABEL = "((doc_id % 7) + (n_chars % 13)) / 10.0"


def _ltr_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from same_same_spark.bm25 import scored_matches

    docs = _docs(spark, sf_dir)
    base = scored_matches(
        docs, REF_QUERIES, id_col="doc_id", text_col="text"
    )
    meta = docs.select("doc_id", "n_chars")
    return base.join(meta, "doc_id").select(
        "query_id",
        "doc_id",
        F.col("score").alias("f_bm25"),
        (F.col("n_chars") / F.lit(100.0)).alias("f_len"),
        F.lit(1.0).alias("f_bias"),
        F.expr(_LTR_LABEL).alias("y"),
    )


def _q_ltr_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form linear LTR (operators/ltr.py): ridge normal
    equations over (bm25, scaled length, bias) features — training is
    ONE distributed aggregate (n²+n sums) + a driver-side 3×3 solve;
    the oracle re-derives the SAME weights via CRAMER'S RULE in SQL
    (no linear algebra library), then scores and ranks. Sole evidence
    for the whole train→score→rank chain. Saturation-overflow entry
    (see _SATURATION_OVERFLOW)."""
    from same_same_spark.operators.ltr import (
        ltr_score_topk,
        train_linear_ranker,
    )

    feats = _ltr_features(spark, sf_dir)
    w = train_linear_ranker(
        feats, ["f_bm25", "f_len", "f_bias"], "y", l2=0.1
    )
    out = ltr_score_topk(feats, ["f_bm25", "f_len", "f_bias"], w, k=REF_K)
    return _round6(out, "score")


def _sql_ltr_topk() -> str:
    from same_same_spark.bm25 import duckdb_scored_sql
    from same_same_spark.operators.ltr import duckdb_ltr_sql

    inner = duckdb_scored_sql("documents", "doc_id", "text", REF_QUERIES)
    features_sql = f"""
SELECT s.query_id, s.doc_id, s.score AS f_bm25,
       d.n_chars / 100.0 AS f_len, 1.0 AS f_bias, d.n_chars
FROM ({inner}) s JOIN documents d ON s.doc_id = d.doc_id
"""
    return duckdb_ltr_sql(
        features_sql, ["f_bm25", "f_len", "f_bias"], _LTR_LABEL,
        l2=0.1, k=REF_K,
    )


def _q_boxplot_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """boxplot aggregation (operators/facets.boxplot_facets): exact
    interpolated quartiles + Tukey whiskers (nearest data values
    inside the 1.5-IQR fences) of n_chars over each query's match set
    — ES's boxplot agg without the TDigest. Integer-domain values, so
    quartiles and fences are bit-identical cross-engine. Sole
    evidence. Saturation-overflow entry (see _SATURATION_OVERFLOW)."""
    from same_same_spark.operators.facets import boxplot_facets

    out = boxplot_facets(
        _docs(spark, sf_dir), STATS_AGG_QUERIES, "n_chars",
        id_col="doc_id", text_col="text",
    )
    return _round6(
        out, "q1", "q2", "q3", "lower_whisker", "upper_whisker"
    )


def _sql_boxplot_agg() -> str:
    from same_same_spark.operators.facets import duckdb_boxplot_sql

    inner = duckdb_boxplot_sql(
        "documents", "doc_id", "text", STATS_AGG_QUERIES, "n_chars"
    )
    return f"""
SELECT query_id, count_vals, min_val, max_val,
       round(q1, 6) AS q1, round(q2, 6) AS q2, round(q3, 6) AS q3,
       round(lower_whisker, 6) AS lower_whisker,
       round(upper_whisker, 6) AS upper_whisker
FROM ({inner})
"""


def _q_mad_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """median_absolute_deviation aggregation (operators/facets.
    mad_facets): exact median(|v - median(v)|) of n_chars over the
    match set — the robust-dispersion twin of stats_agg's variance.
    Two-pass + broadcast median table. Sole evidence.
    Saturation-overflow entry (see _SATURATION_OVERFLOW)."""
    from same_same_spark.operators.facets import mad_facets

    out = mad_facets(
        _docs(spark, sf_dir), STATS_AGG_QUERIES, "n_chars",
        id_col="doc_id", text_col="text",
    )
    return _round6(out, "median_val", "mad")


def _sql_mad_agg() -> str:
    from same_same_spark.operators.facets import duckdb_mad_sql

    inner = duckdb_mad_sql(
        "documents", "doc_id", "text", STATS_AGG_QUERIES, "n_chars"
    )
    return f"""
SELECT query_id, round(median_val, 6) AS median_val,
       round(mad, 6) AS mad
FROM ({inner})
"""


def _q_string_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """string_stats aggregation (operators/facets.string_stats_facets):
    count / code-point min/max/avg length / Shannon character entropy
    of the text field over each query's match set — ES's string_stats
    with show_distribution's exact entropy. Sole evidence.
    Saturation-overflow entry (see _SATURATION_OVERFLOW)."""
    from same_same_spark.operators.facets import string_stats_facets

    out = string_stats_facets(
        _docs(spark, sf_dir), STATS_AGG_QUERIES, "text",
        id_col="doc_id", text_col="text",
    )
    return _round6(out, "avg_length", "entropy")


def _sql_string_stats_agg() -> str:
    from same_same_spark.operators.facets import duckdb_string_stats_sql

    inner = duckdb_string_stats_sql(
        "documents", "doc_id", "text", STATS_AGG_QUERIES, "text"
    )
    return f"""
SELECT query_id, count_vals, min_length, max_length,
       round(avg_length, 6) AS avg_length,
       round(entropy, 6) AS entropy
FROM ({inner})
"""


def _q_top_metrics_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """top_metrics aggregation (operators/facets.top_metrics_facets):
    per query the (lang, source) metrics of the 3 matching docs with
    the largest n_chars — ES's top_metrics sort:desc. Rides the
    bounded tournament (no WindowExec). Sole evidence.
    Saturation-overflow entry (see _SATURATION_OVERFLOW)."""
    from same_same_spark.operators.facets import top_metrics_facets

    return top_metrics_facets(
        _docs(spark, sf_dir), STATS_AGG_QUERIES, "n_chars",
        ["lang", "source"], size=3, id_col="doc_id", text_col="text",
    )


def _sql_top_metrics_agg() -> str:
    from same_same_spark.operators.facets import duckdb_top_metrics_sql

    return duckdb_top_metrics_sql(
        "documents", "doc_id", "text", STATS_AGG_QUERIES, "n_chars",
        ["lang", "source"], size=3,
    )


PHRASE_SUGGEST_QUERIES: list[tuple[int, str]] = [
    (1, "fasst merge"),
    (2, "tabel scan"),
    (3, "window agg"),
    (4, "the a"),  # no tokens -> no rows
]


def _q_phrase_suggest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phrase suggester (operators/phrasesuggest.phrase_suggest):
    whole-phrase spelling correction — SymSpell per-term candidates
    (original always kept) cross-multiplied and ranked by the pinned
    add-alpha bigram LM over the corpus. The oracle re-derives
    EVERYTHING brute-force: candidates via the vocab levenshtein scan
    (verifying SymSpell recall, the spell_suggest strategy), LM counts
    relationally (the lm_perplexity CTE chain), phrases as a join of
    the two candidate sets. Sole evidence. Saturation-overflow entry
    (see _SATURATION_OVERFLOW)."""
    from same_same_spark.operators.phrasesuggest import phrase_suggest

    out = phrase_suggest(
        _docs(spark, sf_dir), PHRASE_SUGGEST_QUERIES, topn=3,
        max_edits=1, max_term_candidates=3,
        id_col="doc_id", text_col="text",
    )
    return _round6(out, "score")


def _sql_phrase_suggest() -> str:
    from same_same_spark.operators.phrasesuggest import (
        duckdb_phrase_suggest_sql,
    )

    return duckdb_phrase_suggest_sql(
        "documents", "doc_id", "text",
        [q for q in PHRASE_SUGGEST_QUERIES if q[0] != 4],
        topn=3, max_edits=1, max_term_candidates=3,
    )


def _q_boosting_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boosting query (operators/boost.boosting_search): positive BM25
    with negative-match demotion — docs matching the negative query
    keep their rank slot but score x0.4 (never excluded; ES's
    boosting semantics). One extra broadcast term join over the
    scored-matches plan. Sole evidence. Saturation-overflow entry
    (see _SATURATION_OVERFLOW)."""
    from same_same_spark.operators.boost import boosting_search

    out = boosting_search(
        _docs(spark, sf_dir),
        [
            (1, "table query join", "slow error"),
            (2, "fast scan row filter", "customer"),
            (3, "vector", "the a"),  # no neg tokens -> plain BM25
        ],
        k=REF_K,
        negative_boost=0.4,
        id_col="doc_id",
        text_col="text",
    )
    return _round6(out, "score")


def _sql_boosting_topk() -> str:
    from same_same_spark.operators.boost import duckdb_boosting_sql

    return duckdb_boosting_sql(
        "documents", "doc_id", "text",
        [
            (1, "table query join", "slow error"),
            (2, "fast scan row filter", "customer"),
            (3, "vector", "the a"),
        ],
        k=REF_K,
        negative_boost=0.4,
    )


_INTERVALS_RULE: dict = {"all_of": {
    "ordered": True,
    "max_gaps": 4,
    "intervals": [
        {"match": {"query": "fast merge"}},
        {"any_of": {"intervals": [
            {"match": {"query": "sort"}},
            {"match": {"query": "join"}},
        ]}},
    ],
}}


def _q_intervals_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intervals query (operators/intervals.intervals_search): nested
    positional rule — the 'fast merge' phrase followed (ordered,
    envelope slack <= 4) by one of sort/join; candidates prefilter on
    the required terms column-side, the interval engine verifies in
    Arrow batches, BM25 scores over the rule's distinct terms. The
    oracle HAND-TRANSLATES the fixed rule into nested-lambda
    positional SQL (never the engine). Sole evidence.
    Saturation-overflow entry (see _SATURATION_OVERFLOW)."""
    from same_same_spark.operators.intervals import intervals_search

    out = intervals_search(
        _docs(spark, sf_dir), [(1, _INTERVALS_RULE)], k=REF_K,
        id_col="doc_id", text_col="text",
    )
    return _round6(out, "score")


def _sql_intervals_topk() -> str:
    from same_same_spark.bm25 import duckdb_scored_sql
    from same_same_spark.text.tokenizer import duckdb_tokens_sql

    # hand-derived: phrase at i (1-based, adjacent), follower at
    # j >= i + 2 (ordered, envelope-disjoint), slack
    # (j - i + 1) - 3 <= 4  =>  j <= i + 6  =>  j in range(i+2, i+7)
    scores = duckdb_scored_sql(
        "documents", "doc_id", "text", [(1, "fast join merge sort")]
    )
    return f"""
WITH toks AS (
  SELECT doc_id, {duckdb_tokens_sql("text")} AS t FROM documents
),
matched AS (
  SELECT 1 AS query_id, doc_id FROM toks
  WHERE len(list_filter(range(1, len(t)), i ->
          t[i] = 'fast' AND t[i + 1] = 'merge'
          AND len(list_filter(range(i + 2, i + 7), j ->
                t[j] IN ('sort', 'join'))) > 0
        )) > 0
),
sc AS ({scores}),
scored AS (
  SELECT m.query_id, m.doc_id, coalesce(s.score, 0.0) AS score
  FROM matched m
  LEFT JOIN sc s ON m.query_id = s.query_id AND m.doc_id = s.doc_id
),
ranked AS (
  SELECT query_id, doc_id, score, row_number() OVER (
    PARTITION BY query_id
    ORDER BY round(score, 9) DESC, doc_id ASC
  ) AS rank
  FROM scored
)
SELECT query_id, doc_id, round(score, 6) AS score,
       rank::INTEGER AS rank
FROM ranked WHERE rank <= {REF_K}
"""


_QS_QUERIES: list[tuple[int, str]] = [
    (1, "fast AND (merge OR sort) -slow"),
    (2, '"fast merge" OR batch'),
    (3, "lang:en AND vector"),
    (4, "the a an"),  # analyzer eats every clause -> no rows
]


def _q_query_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """query_string language (operators/querystring.
    query_string_search): Lucene-style AND/OR/NOT/parens, quoted
    phrases, -prohibited clauses and field:value filters parsed
    driver-side and compiled to ONE corpus scan of column logic;
    score = Σ BM25 weight over a query's distinct positive terms,
    filter-only matches score 0. The oracle HAND-TRANSLATES each
    query string's semantics into SQL predicates (never the parser —
    the differential covers parsing, compilation and scoring). Sole
    evidence. Saturation-overflow entry (see _SATURATION_OVERFLOW)."""
    from same_same_spark.operators.querystring import query_string_search

    out = query_string_search(
        _docs(spark, sf_dir), _QS_QUERIES, k=REF_K,
        id_col="doc_id", text_col="text",
    )
    return _round6(out, "score")


def _sql_query_string() -> str:
    from same_same_spark.bm25 import duckdb_scored_sql
    from same_same_spark.text.tokenizer import duckdb_tokens_sql

    # positive term sets, hand-derived: q1 {fast, merge, sort},
    # q2 {fast, merge, batch}, q3 {vector}. Tokenization is the ONE
    # bit-frozen X1 definition (shared by design); the hand-derived
    # part is each query string's boolean/phrase/filter semantics.
    scores = duckdb_scored_sql(
        "documents", "doc_id", "text",
        [(1, "fast merge sort"), (2, "fast merge batch"), (3, "vector")],
    )
    phrase = (
        "EXISTS (SELECT 1 FROM unnest(range(1, len(t.tokens))) u(i) "
        "WHERE t.tokens[i] = 'fast' AND t.tokens[i + 1] = 'merge')"
    )
    return f"""
WITH toks AS (
  SELECT d.doc_id, d.lang, {duckdb_tokens_sql("d.text")} AS tokens
  FROM documents d
),
matched AS (
  SELECT 1 AS query_id, doc_id FROM toks t
  WHERE list_contains(t.tokens, 'fast')
    AND (list_contains(t.tokens, 'merge')
         OR list_contains(t.tokens, 'sort'))
    AND NOT list_contains(t.tokens, 'slow')
  UNION ALL
  SELECT 2, doc_id FROM toks t
  WHERE {phrase} OR list_contains(t.tokens, 'batch')
  UNION ALL
  SELECT 3, doc_id FROM toks t
  WHERE t.lang = 'en' AND list_contains(t.tokens, 'vector')
),
sc AS ({scores}),
scored AS (
  SELECT m.query_id, m.doc_id, coalesce(s.score, 0.0) AS score
  FROM matched m
  LEFT JOIN sc s
    ON m.query_id = s.query_id AND m.doc_id = s.doc_id
),
ranked AS (
  SELECT query_id, doc_id, score, row_number() OVER (
    PARTITION BY query_id
    ORDER BY round(score, 9) DESC, doc_id ASC
  ) AS rank
  FROM scored
)
SELECT query_id, doc_id, round(score, 6) AS score,
       rank::INTEGER AS rank
FROM ranked WHERE rank <= {REF_K}
"""


def _q_pinned_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pinned query (operators/pinned.pinned_search): editorial ids
    rank 1..p in list order (missing ids close up, non-matching docs
    still pin, score NULL), organic BM25 follows anti-joined and
    rank-shifted. Existence check streams the corpus against the
    broadcast pin list. Sole evidence. Saturation-overflow entry (see
    _SATURATION_OVERFLOW)."""
    from same_same_spark.operators.pinned import pinned_search

    out = pinned_search(
        _docs(spark, sf_dir), _PINNED_QUERIES, k=REF_K,
        id_col="doc_id", text_col="text",
    )
    return _round6(out, "score")


_PINNED_QUERIES: list[tuple[int, str, list]] = [
    (1, "table query join", [42, 10**9, 7]),   # one missing id
    (2, "fast scan row filter", [3, 3, 11]),   # duplicate pin
    (3, "the a", [5, 1]),                      # pins only, no organic
]


def _sql_pinned_topk() -> str:
    from same_same_spark.operators.pinned import duckdb_pinned_sql

    return duckdb_pinned_sql(
        "documents", "doc_id", "text", _PINNED_QUERIES, k=REF_K
    )


def _q_vector_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector range (radius) search (pipeline/ann.range_search): every
    embedding with cosine >= 0.2 of the three query vectors, membership
    cut at rank precision, capped at 20 under the pinned order (the
    cap bites — ~30 qualify per query at sf0.01). Sole evidence.
    Saturation-overflow entry (see _SATURATION_OVERFLOW)."""
    from same_same_spark.pipeline.ann import range_search

    out = range_search(
        _emb(spark, sf_dir), _ann_queries(spark, sf_dir),
        min_score=0.2, max_results=20,
    )
    return _round6(out, "score")


def _sql_vector_range() -> str:
    return _SQL_ANN_BRUTE.replace(
        "FROM s", "FROM s WHERE round(score, 9) >= round(0.2, 9)"
    ).replace("rank <= 5", "rank <= 20")


_FUNC_SCORE_FNS: list[dict] = [
    {"field_value_factor": {
        "field": "n_chars", "factor": 0.01, "modifier": "log1p",
        "missing": 1.0,
    }},
    {"random_score": {"seed": 13}},
    {"weight": 1.5, "filter": {"lang": {"eq": "en"}}},
]


def _q_function_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """function_score query (operators/funcscore.
    function_score_search): BM25 x sum(log1p popularity, seeded
    deterministic random, filtered weight) — the ES function_score
    families without scripts; random rides the engine's ONE pinned
    md5-60-bit hash scheme so both engines draw the SAME 'random'
    numbers. The oracle re-derives every function value, the fold and
    the boost combine. Sole evidence. Saturation-overflow entry (see
    _SATURATION_OVERFLOW)."""
    from same_same_spark.operators.funcscore import function_score_search

    out = function_score_search(
        _docs(spark, sf_dir), REF_QUERIES, _FUNC_SCORE_FNS, k=REF_K,
        score_mode="sum", boost_mode="multiply",
        id_col="doc_id", text_col="text",
    )
    return _round6(out, "score")


def _sql_function_score() -> str:
    from same_same_spark.operators.funcscore import (
        duckdb_function_score_sql,
    )

    return duckdb_function_score_sql(
        "documents", "doc_id", "text", REF_QUERIES, _FUNC_SCORE_FNS,
        [None, None, "d.lang = 'en'"], k=REF_K,
        score_mode="sum", boost_mode="multiply",
    )


def _q_t_test_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t_test aggregation (operators/facets.t_test_facets): Welch's t
    between en-docs and non-en docs' n_chars over each query's match
    set — arms are FilterExpr dicts (the F2/F3 algebra), the oracle
    derives the predicates independently (neq-on-missing => false).
    The pinned surface is (t_stat, df) — ES's p-value is a pure
    driver function of those (needs the t CDF, not SQL-expressible).
    Sole evidence. Saturation-overflow entry (see
    _SATURATION_OVERFLOW)."""
    from same_same_spark.operators.facets import t_test_facets

    out = t_test_facets(
        _docs(spark, sf_dir), STATS_AGG_QUERIES, "n_chars",
        {"lang": {"eq": "en"}}, {"lang": {"neq": "en"}},
        ttype="heteroscedastic", id_col="doc_id", text_col="text",
    )
    return _round6(out, "mean_a", "mean_b", "t_stat", "df")


def _sql_t_test_agg() -> str:
    from same_same_spark.operators.facets import duckdb_t_test_sql

    inner = duckdb_t_test_sql(
        "documents", "doc_id", "text", STATS_AGG_QUERIES, "n_chars",
        "d.lang = 'en'",
        "d.lang IS NOT NULL AND d.lang <> 'en'",
        ttype="heteroscedastic",
    )
    return f"""
SELECT query_id, n_a, n_b,
       round(mean_a, 6) AS mean_a, round(mean_b, 6) AS mean_b,
       round(t_stat, 6) AS t_stat, round(df, 6) AS df
FROM ({inner})
"""


def _q_rate_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rate aggregation (events.rate_buckets): per-event_type daily
    buckets rescaled to events-per-hour, plus the value-field sum
    variant's rate on the same shape — fixed-width units only (the
    pinned ES calendar restriction). Sole evidence.
    Saturation-overflow entry (see _SATURATION_OVERFLOW)."""
    from same_same_spark.operators.events import rate_buckets

    out = rate_buckets(
        _events(spark, sf_dir), "day", "hour", value_col="value",
        group_col="event_type",
    )
    return _round6(out, "value", "rate")


def _sql_rate_agg() -> str:
    from same_same_spark.operators.events import duckdb_rate_sql

    inner = duckdb_rate_sql(
        "events", "day", "hour", value_col="value",
        group_col="event_type",
    )
    return f"""
SELECT event_type, bucket, doc_count,
       round(value, 6) AS value, round(rate, 6) AS rate
FROM ({inner})
"""


def _q_moving_fn_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """moving_fn pipeline aggregation (events.moving_fn): ES-faithful
    PRIOR-window max over the per-event_type daily histogram (current
    bucket excluded, the default shift=0; pipeline_aggs' moving_avg
    pins the inclusive variant). Sole evidence for the exclusive
    frame + min/max/sum family. Saturation-overflow entry (see
    _SATURATION_OVERFLOW)."""
    from same_same_spark.operators.events import date_histogram, moving_fn

    series = date_histogram(
        _events(spark, sf_dir), "day", group_col="event_type"
    )
    return moving_fn(
        series, "max", window=7, group_cols=["event_type"]
    )


def _sql_moving_fn_agg() -> str:
    from same_same_spark.operators.events import (
        duckdb_date_histogram_sql,
        duckdb_moving_fn_sql,
    )

    return duckdb_moving_fn_sql(
        duckdb_date_histogram_sql("events", "day", group_col="event_type"),
        "max", window=7, group_cols=["event_type"],
    )


def _q_auto_date_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """auto_date_histogram (events.auto_date_histogram): the finest
    ladder unit whose zero-filled bucket count fits target=1000 —
    sf0.01's 30-day span chooses hourly (720 <= 1000, minutes 43k
    don't) — applied per event_type. The oracle re-derives the unit
    choice INSIDE SQL from the same exact integer bucket-count
    formulas, then filters six unioned unit histograms to it. Sole
    evidence. Saturation-overflow entry (see _SATURATION_OVERFLOW)."""
    from same_same_spark.operators.events import auto_date_histogram

    return auto_date_histogram(
        _events(spark, sf_dir), 1000, group_col="event_type"
    )


def _sql_auto_date_histogram() -> str:
    from same_same_spark.operators.events import (
        duckdb_auto_date_histogram_sql,
    )

    return duckdb_auto_date_histogram_sql(
        "events", 1000, group_col="event_type"
    )


def _q_serial_diff_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """serial_diff pipeline aggregation (events.serial_diff): lag-7
    seasonal differencing over the zero-filled per-event_type daily
    histogram — completes the pipeline family (cumulative_sum /
    derivative / moving_avg / serial_diff). Windows partitioned by
    event_type. Sole evidence. Saturation-overflow entry (see
    _SATURATION_OVERFLOW)."""
    from same_same_spark.operators.events import date_histogram, serial_diff

    series = date_histogram(
        _events(spark, sf_dir), "day", group_col="event_type"
    )
    return serial_diff(
        series, lag=7, group_cols=["event_type"]
    )


def _sql_serial_diff_agg() -> str:
    from same_same_spark.operators.events import (
        duckdb_date_histogram_sql,
        duckdb_serial_diff_sql,
    )

    return duckdb_serial_diff_sql(
        duckdb_date_histogram_sql("events", "day", group_col="event_type"),
        lag=7,
        group_cols=["event_type"],
    )


def _q_normalize_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """normalize pipeline aggregation (events.normalize_buckets):
    z-score rescaling of each event_type's daily bucket counts by the
    whole-series mean/stddev — ES's normalize agg, one whole-partition
    window, no second pass. Sole evidence for the normalize family
    (the other three methods differ only in the window statistic;
    test_events pins all four). Saturation-overflow entry (see
    _SATURATION_OVERFLOW)."""
    from same_same_spark.operators.events import (
        date_histogram,
        normalize_buckets,
    )

    series = date_histogram(
        _events(spark, sf_dir), "day", group_col="event_type"
    )
    out = normalize_buckets(series, "zscore", group_cols=["event_type"])
    return _round6(out, "normalized")


def _sql_normalize_agg() -> str:
    from same_same_spark.operators.events import (
        duckdb_date_histogram_sql,
        duckdb_normalize_sql,
    )

    inner = duckdb_normalize_sql(
        duckdb_date_histogram_sql("events", "day", group_col="event_type"),
        "zscore",
        group_cols=["event_type"],
    )
    return f"""
SELECT event_type, bucket, doc_count,
       round(normalized, 6) AS normalized
FROM ({inner})
"""


def _q_cumulative_cardinality(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """cumulative_cardinality pipeline aggregation (events.
    cumulative_cardinality): exact distinct-users-to-date per daily
    bucket — the key appears once in the distinct reduction (groupBy
    user → first bucket), cardinality folds to counts BEFORE the
    bounded running-sum window. Sole evidence. Saturation-overflow
    entry (see _SATURATION_OVERFLOW)."""
    from same_same_spark.operators.events import cumulative_cardinality

    return cumulative_cardinality(
        _events(spark, sf_dir), "day", "user_id"
    )


def _sql_cumulative_cardinality() -> str:
    from same_same_spark.operators.events import (
        duckdb_cumulative_cardinality_sql,
    )

    return duckdb_cumulative_cardinality_sql("events", "day", "user_id")


def _q_bucket_script_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bucket_script + bucket_selector (events.bucket_script /
    bucket_selector): per-day click-through rate (clicks ÷ total
    events, the canonical two-sibling-metric script), then the
    selector keeps days with ctr >= 0.15 — the ES pipeline pair on
    one fixed-shape daily series. NULL-safe division pinned (a
    zero-event day would emit NULL and never match the selector).
    Sole evidence for bucket_script; bucket_selector's range filter
    re-verifies on a derived metric (bucket_sort_days pinned it on
    doc_count). Saturation-overflow entry (see _SATURATION_OVERFLOW).
    """
    from same_same_spark.operators.events import (
        bucket_script,
        bucket_selector,
    )

    ev = _events(spark, sf_dir)
    daily = (
        ev.filter(F.col("ts").isNotNull())
        .groupBy(F.date_trunc("day", "ts").alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("total"),
            F.count_if(F.col("event_type") == "click")
            .cast("long")
            .alias("clicks"),
        )
    )
    scripted = bucket_script(daily, "clicks", "/", "total", "ctr")
    out = bucket_selector(scripted, min_value=0.15, value_col="ctr")
    return _round6(out, "ctr")


def _sql_bucket_script_agg() -> str:
    return """
SELECT bucket, total, clicks, round(ctr, 6) AS ctr
FROM (
  SELECT date_trunc('day', ts) AS bucket,
         count(*)::BIGINT AS total,
         count(*) FILTER (event_type = 'click')::BIGINT AS clicks,
         count(*) FILTER (event_type = 'click')::DOUBLE
           / nullif(count(*), 0)::DOUBLE AS ctr
  FROM events
  WHERE ts IS NOT NULL
  GROUP BY 1
)
WHERE ctr IS NOT NULL AND ctr >= 0.15
"""


def _q_stream_vector_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous kNN alerts (streaming/topk.stream_vector_topk):
    per-query running cosine top-3 maintained by
    applyInPandasWithState across TWO real micro-batches (embeddings
    split by vec_id parity, maxFilesPerTrigger=1) — the final state is
    pinned rank/score-identical to batch brute force over the union,
    which IS the oracle (the stream ≡ batch contract, the
    events_sessionize precedent). Sole evidence for the streaming
    operator. Saturation-overflow entry (see _SATURATION_OVERFLOW)."""
    import atexit
    import shutil
    import tempfile

    from same_same_spark.streaming.topk import (
        latest_topk,
        stream_vector_topk,
    )

    emb = _emb(spark, sf_dir).select("vec_id", "embedding")
    scratch = tempfile.mkdtemp(prefix="ss_entry_stream_topk_")
    atexit.register(shutil.rmtree, scratch, True)
    src = f"{scratch}/src"
    # parquet (not json): the stream source must round-trip the float
    # embeddings bit-exactly for the stream ≡ batch oracle identity
    for i, cond in enumerate(("vec_id % 2 = 0", "vec_id % 2 = 1")):
        emb.filter(cond).coalesce(1).write.mode("overwrite").parquet(
            f"{src}/b{i}"
        )
    stream = (
        spark.readStream.schema("vec_id LONG, embedding ARRAY<FLOAT>")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/b*")
    )
    out = stream_vector_topk(stream, _ann_queries(spark, sf_dir), k=3)
    name = f"ss_stream_topk_{abs(hash(scratch)) % 10**8}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", f"{scratch}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "stream_vector_topk entry: availableNow drain exceeded "
            "300s — refusing to compare a partially-drained stream"
        )
    final = latest_topk(spark.table(name))
    return _round6(final, "score").select(
        "query_id", "vec_id", F.col("score"), "rank"
    )


def _sql_stream_vector_topk() -> str:
    # the oracle IS the batch brute-force twin at k=3: final streaming
    # state must equal it exactly (stream ≡ batch)
    return _SQL_ANN_BRUTE.replace("rank <= 5", "rank <= 3")


def _q_percentile_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_ranks aggregation (operators/facets.
    percentile_ranks_facets): the inverse of the percentiles agg —
    exact pct of matched docs with n_chars <= each probe (no TDigest;
    the engine's one-shuffle exactness). Sole evidence; independent
    SQL re-derivation. Saturation-overflow entry (see
    _SATURATION_OVERFLOW)."""
    from same_same_spark.operators.facets import percentile_ranks_facets

    out = percentile_ranks_facets(
        _docs(spark, sf_dir), REF_QUERIES, "n_chars",
        [100.0, 300.0, 500.0], id_col="doc_id", text_col="text",
    )
    return _round6(out, "pct")


def _sql_percentile_ranks() -> str:
    from same_same_spark.operators.facets import duckdb_percentile_ranks_sql

    return duckdb_percentile_ranks_sql(
        "documents", "doc_id", "text", REF_QUERIES, "n_chars",
        [100.0, 300.0, 500.0],
    )


def _q_missing_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """missing aggregation (operators/facets.missing_facets): matched
    docs with a NULL facet — the bucket every other agg drops; fixed
    shape (zero-token queries emit 0). The NULLable field derives as
    nullif(lang, 'en') identically in both engines. Sole evidence.
    Saturation-overflow entry (see _SATURATION_OVERFLOW)."""
    from same_same_spark.operators.facets import missing_facets

    docs_m = _docs(spark, sf_dir).withColumn(
        "lang_non_en", F.expr("nullif(lang, 'en')")
    )
    return missing_facets(
        docs_m, REF_QUERIES, "lang_non_en",
        id_col="doc_id", text_col="text",
    )


def _sql_missing_agg() -> str:
    from same_same_spark.operators.facets import duckdb_missing_sql

    prelude = (
        "docs_mm AS (SELECT *, nullif(lang, 'en') AS lang_non_en "
        "FROM documents), "
    )
    return duckdb_missing_sql(
        "docs_mm", "doc_id", "text", REF_QUERIES, "lang_non_en",
        prelude_ctes=prelude,
    )


def _q_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality evaluation (operators/releval.retrieval_eval):
    recall@5 / MRR / nDCG of the LSH path against the exact brute
    scorer — the operator a user runs to tune nprobe/ef/shortlist at
    scale. Sole evidence for the eval math; the oracle composes the
    two verified ANN chains and re-derives recall/mrr/ndcg in SQL.
    Saturation-overflow entry (see _SATURATION_OVERFLOW)."""
    from same_same_spark.operators.releval import retrieval_eval

    emb = _emb(spark, sf_dir)
    q = _ann_queries(spark, sf_dir)
    res = ann_ops.lsh_topk(emb, q, k=5, n_planes=8, max_hamming=1)
    tru = ann_ops.brute_topk(emb, q, k=5)
    out = retrieval_eval(res, tru, id_col="vec_id")
    return _round6(out, "recall", "mrr", "ndcg")


def _sql_ann_recall_eval() -> str:
    from same_same_spark.operators.releval import duckdb_retrieval_eval_sql

    return duckdb_retrieval_eval_sql(
        _SQL_ANN_LSH, _SQL_ANN_BRUTE, id_col="vec_id"
    )


def _q_span_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """span_first query (operators/spannear.span_first_search): any
    query term within the first 8 token positions (span_or under ES's
    end boundary), matches BM25-ranked with first_pos reported —
    completes the positional family (phrase / proximity / span_near /
    span_first). Sole evidence; the oracle probes positions via
    unnest(range) + min vs Spark's bounded-prefix filter.
    Saturation-overflow entry (see _SATURATION_OVERFLOW)."""
    from same_same_spark.operators.spannear import span_first_search

    out = span_first_search(
        _docs(spark, sf_dir), REF_QUERIES, end=8, k=REF_K,
        id_col="doc_id", text_col="text",
    )
    return _round6(out, "score")


def _sql_span_first() -> str:
    from same_same_spark.operators.spannear import duckdb_span_first_sql

    return duckdb_span_first_sql(
        "documents", "doc_id", "text", REF_QUERIES, end=8, k=REF_K
    )


def _q_sampler_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sampler > terms aggregation (operators/facets.
    sampler_terms_facets): facet counts over each query's top-25
    highest-scoring matches only (deterministic global sample through
    the bounded tournament — the one-shuffle strengthening of ES's
    per-shard sampler). Sole evidence; the oracle re-derives sample +
    counts + rank with windows. Saturation-overflow entry (see
    _SATURATION_OVERFLOW)."""
    from same_same_spark.operators.facets import sampler_terms_facets

    return sampler_terms_facets(
        _docs(spark, sf_dir), REF_QUERIES, "lang",
        shard_size=25, topn=5, id_col="doc_id", text_col="text",
    )


def _sql_sampler_terms() -> str:
    from same_same_spark.operators.facets import duckdb_sampler_terms_sql

    return duckdb_sampler_terms_sql(
        "documents", "doc_id", "text", REF_QUERIES, "lang",
        shard_size=25, topn=5,
    )


# --- geo distance_feature (ninth round-5 session) ---------------------------


def _q_geo_distance_feature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES distance_feature with a GEO-POINT origin
    (geo.geo_distance_feature_topk): BM25 + boost * pivot /
    (pivot + haversine_km to Paris) — the numeric rank_feature shape
    with the pinned haversine as the distance; NULL coordinates
    contribute 0. Sole evidence for the geo×relevance composition.
    Saturation-overflow entry (see _SATURATION_OVERFLOW)."""
    from same_same_spark.operators.geo import (
        geo_distance_feature_topk,
        synth_point_cols,
    )

    docs = _docs(spark, sf_dir)
    lat, lon = synth_point_cols(F.col("doc_id"))
    docs_geo = docs.withColumn("lat", lat).withColumn("lon", lon)
    out = geo_distance_feature_topk(
        docs_geo, REF_QUERIES, *_GEO_ORIGIN, pivot_km=2000.0, boost=0.5,
        k=REF_K, id_col="doc_id", text_col="text",
    )
    return _round6(out, "score")


def _sql_geo_distance_feature() -> str:
    from same_same_spark.operators.geo import (
        duckdb_geo_distance_feature_sql,
        synth_point_sql,
    )

    lat, lon = synth_point_sql("doc_id")
    inner = duckdb_geo_distance_feature_sql(
        "dgeo", REF_QUERIES, *_GEO_ORIGIN, pivot_km=2000.0, boost=0.5,
        k=REF_K, id_col="doc_id", text_col="text",
    )
    assert inner.lstrip().startswith("WITH ")
    body = inner.lstrip()[len("WITH "):]
    return (
        f"WITH dgeo AS (SELECT *, {lat} AS lat, {lon} AS lon"
        f" FROM documents),\n{body}"
    )


# --- late-interaction MaxSim (ninth round-5 session) ------------------------


def _q_maxsim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ColBERT-style MaxSim (operators/multivector.maxsim_topk):
    documents = bags of 4 consecutive embeddings (vec_id // 4), two
    2-vector queries; score = Σ_q max_d dot — max-then-sum grouped
    folds, tournament rank. Sole evidence for the late-interaction
    family. Saturation-overflow entry (see _SATURATION_OVERFLOW)."""
    from same_same_spark.operators.multivector import maxsim_topk

    emb = _emb(spark, sf_dir)
    dv = emb.select(
        (F.col("vec_id") / 4).cast("long").alias("doc_id"), "embedding"
    )
    qvecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id").isin([0, 1, 2, 3])).collect()
    }
    queries = [(0, [qvecs[0], qvecs[1]]), (1, [qvecs[2], qvecs[3]])]
    out = maxsim_topk(dv, queries, k=REF_K)
    return _round6(out, "score")


def _sql_maxsim_topk() -> str:
    # literal-free twin: the query bag re-derives in SQL from the SAME
    # relation (vec_id 0..3) rather than duckdb_maxsim_sql's VALUES
    # shape, so no doubles leak from the Spark side
    return f"""
WITH q AS (
  SELECT (vec_id // 2)::INTEGER AS query_id, vec_id AS q_idx,
         embedding::DOUBLE[] AS qvec
  FROM embeddings WHERE vec_id IN (0, 1, 2, 3)
),
d AS (
  SELECT (vec_id // 4) AS doc_id, embedding::DOUBLE[] AS dv
  FROM embeddings
),
pairs AS (
  SELECT q.query_id, d.doc_id, q.q_idx,
         CASE WHEN len(q.qvec) != len(d.dv) THEN 0.0
              ELSE list_dot_product(q.qvec, d.dv) END AS sim
  FROM d CROSS JOIN q
),
folded AS (
  SELECT query_id, doc_id, sum(best) AS score FROM (
    SELECT query_id, doc_id, q_idx, max(sim) AS best
    FROM pairs GROUP BY 1, 2, 3
  ) GROUP BY 1, 2
),
ranked AS (
  SELECT query_id, doc_id, score, row_number() OVER (
    PARTITION BY query_id ORDER BY round(score, 9) DESC, doc_id ASC
  ) AS rank
  FROM folded
)
SELECT query_id, doc_id, round(score, 6) AS score, rank::INTEGER AS rank
FROM ranked WHERE rank <= {REF_K}
"""


# --- parent/child join queries (ninth round-5 session) ----------------------


def _q_has_child(spark: SparkSession, sf_dir: str) -> DataFrame:
    """has_child query (operators/joinfield.has_child_topk): parents
    ranked by their matching chunk children — chunk-level BM25, child
    scores folded per parent under score_mode='sum', min_children=2
    (ES join-field semantics over the deterministic chunk relation).
    Sole evidence. Saturation-overflow entry (see
    _SATURATION_OVERFLOW)."""
    from same_same_spark.operators.joinfield import has_child_topk

    out = has_child_topk(
        _docs(spark, sf_dir), REF_QUERIES, k=REF_K, score_mode="sum",
        min_children=2, id_col="doc_id", text_col="text",
        size=120, overlap=30,
    )
    return _round6(out, "score")


def _sql_has_child() -> str:
    from same_same_spark.operators.joinfield import duckdb_has_child_sql

    return duckdb_has_child_sql(
        "documents", REF_QUERIES, k=REF_K, score_mode="sum",
        min_children=2, id_expr="doc_id", text_expr="text",
        size=120, overlap=30,
    )


def _q_has_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """has_parent query (operators/joinfield.has_parent_topk): chunk
    children of matching parents, each carrying the parent's
    document-level BM25 score, ranked (round9 DESC, cuid ASC). Sole
    evidence. Saturation-overflow entry (see _SATURATION_OVERFLOW)."""
    from same_same_spark.operators.joinfield import has_parent_topk

    out = has_parent_topk(
        _docs(spark, sf_dir), REF_QUERIES, k=REF_K,
        id_col="doc_id", text_col="text", size=120, overlap=30,
    )
    return _round6(out, "score")


def _sql_has_parent() -> str:
    from same_same_spark.operators.joinfield import duckdb_has_parent_sql

    return duckdb_has_parent_sql(
        "documents", REF_QUERIES, k=REF_K, id_expr="doc_id",
        text_expr="text", size=120, overlap=30,
    )


# --- residual quantization (ninth round-5 session) --------------------------


def _rq_books() -> list[list[list[float]]]:
    """Fixture-trained RQ codebooks (pipeline/rq.train_rq_codebooks
    over the same deterministic anisotropic sample protocol as
    _opq_params). Training runs ONCE at import so the Spark entry and
    the SQL twin share literally the same codebook doubles — the
    oracle pins encode → ADC → rank; training determinism/quality is
    pinned in tests/test_rq.py (SQL cannot re-derive k-means)."""
    import numpy as np

    from same_same_spark.pipeline.rq import train_rq_codebooks

    rng = np.random.RandomState(7)
    latent = rng.randn(192, 4)
    mix = rng.randn(4, 16)
    sample = latent @ mix + 0.05 * rng.randn(192, 16)
    return train_rq_codebooks(sample, levels=3, n_codes=8, seed=11)


_RQ_BOOKS = _rq_books()


def _q_rq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Residual-quantization ADC top-k (pipeline/rq.py): 3-level
    additive codebooks over a 16-dim embedding slice — sequential
    argmin encode with per-row recon_norm2, LUT-only asymmetric
    distances (q² − 2Σ<q,C_l[c_l]> + ‖recon‖²), bounded tournament
    rank. The oracle re-derives the residual chain RELATIONALLY (one
    dists→argmin→residual CTE pair per level). Sole evidence —
    completes the quantization family (SQ8/BQ/PQ/OPQ/IVF-PQ + RQ).
    Saturation-overflow entry (see _SATURATION_OVERFLOW)."""
    from same_same_spark.pipeline.rq import rq_adc_topk, rq_encode

    emb16 = _emb(spark, sf_dir).select(
        "vec_id",
        F.slice(F.col("embedding").cast("array<double>"), 1, 16).alias(
            "emb"
        ),
    )
    codes_df = rq_encode(
        emb16, _RQ_BOOKS, id_col="vec_id", embedding_col="emb"
    )
    qrows = {
        r["vec_id"]: list(map(float, r["emb"]))
        for r in emb16.filter(F.col("vec_id").isin([0, 1, 2])).collect()
    }
    queries = [(int(i), qrows[i]) for i in sorted(qrows)]
    out = rq_adc_topk(
        codes_df, _RQ_BOOKS, queries, k=5, id_col="vec_id"
    )
    return _round6(out, "dist")


def _sql_rq_adc_topk() -> str:
    from same_same_spark.pipeline.rq import duckdb_rq_sql

    return duckdb_rq_sql("embeddings", _RQ_BOOKS, [0, 1, 2], k=5)


# --- federated multi-index search (ninth round-5 session) -------------------


def _entry_federated_dirs(spark: SparkSession, sf_dir: str) -> list[str]:
    """Build (once per content fingerprint) TWO half-corpus indexes
    (doc_id parity split) for the federated-search entry; cached like
    :func:`_entry_index_dir`."""
    import hashlib
    import os
    import tempfile

    from same_same_spark.index.build import (
        LAYOUT_VERSION,
        TOKENIZER_VERSION,
        build_index,
    )

    fp_parts = []
    doc_dir = os.path.join(sf_dir, "documents.parquet")
    for p in sorted(
        os.listdir(doc_dir) if os.path.isdir(doc_dir) else [doc_dir]
    ):
        full = os.path.join(doc_dir, p) if os.path.isdir(doc_dir) else doc_dir
        st = os.stat(full)
        fp_parts.append(f"{p}:{st.st_size}:{st.st_mtime_ns}")
    tag = hashlib.md5(
        f"fed|{sf_dir}|{LAYOUT_VERSION}|{TOKENIZER_VERSION}|"
        f"{';'.join(fp_parts)}".encode()
    ).hexdigest()[:10]
    base = f"{tempfile.gettempdir()}/ss_entry_fed_{tag}"
    docs = _docs(spark, sf_dir)
    dirs = []
    for name, part in (
        ("even", docs.filter(F.col("doc_id") % 2 == 0)),
        ("odd", docs.filter(F.col("doc_id") % 2 == 1)),
    ):
        d = f"{base}/{name}"
        build_index(
            part, d, id_col="doc_id", text_col="text",
            num_buckets=4, log=lambda *_: None,
        )
        dirs.append(d)
    return dirs


def _q_index_federated_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Federated multi-index BM25 (index/query.search_federated): two
    half-corpus indexes searched as one family with EXACT combined
    global statistics (N/avgdl/df summed before scoring — ES
    dfs_query_then_fetch strengthened to exact), so the oracle is the
    plain WHOLE-CORPUS BM25 SQL: federated must equal monolithic rank-
    and score-identically. Sole evidence for the rollover/sharded read
    path. Saturation-overflow entry (see _SATURATION_OVERFLOW)."""
    from same_same_spark.index.query import search_federated

    out = search_federated(
        spark, _entry_federated_dirs(spark, sf_dir), REF_QUERIES, k=REF_K
    )
    return _round6(out, "score").withColumn("rank", F.col("rank").cast("int"))


# --- language-mixture sampling (ninth round-5 session) ----------------------


def _q_temperature_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mC4/XLM-R temperature (alpha) sampling
    (sampling.sample_language_mix, allocator='temperature'): per-lang
    rates min(1, U * c^a / Z / c) with Z folded SEQUENTIALLY over the
    pinned stratum order (the oracle re-folds via an ordered
    list_aggregate), kept docs via the zero-state md5-60bit hash
    filter. Budget 250 docs at alpha 0.3 — the cap bites on en. Sole
    evidence. Saturation-overflow entry (see _SATURATION_OVERFLOW)."""
    from same_same_spark.pipeline.sampling import sample_language_mix

    out = sample_language_mix(
        _docs(spark, sf_dir), 250.0, allocator="temperature", alpha=0.3,
        strata_col="lang", id_col="doc_id", seed="tmix",
    )
    return out.select("doc_id", "lang")


def _sql_temperature_select() -> str:
    from same_same_spark.pipeline.sampling import sample_language_mix_sql

    inner = sample_language_mix_sql(
        "documents", 250.0, allocator="temperature", alpha=0.3,
        strata_col="lang", id_col="doc_id", seed="tmix",
    )
    return f"SELECT doc_id, lang FROM ({inner})"


def _q_unimax_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax waterfilling sampling (sampling.sample_language_mix,
    allocator='unimax'): ascending-total waterfill under a TOKEN
    budget (weight = n_chars) — small languages keep everything, the
    threshold caps the big ones; integer-valued weights make every
    rate EXACT. The oracle re-derives the threshold from sorted
    prefix sums. Sole evidence. Saturation-overflow entry (see
    _SATURATION_OVERFLOW)."""
    from same_same_spark.pipeline.sampling import sample_language_mix

    out = sample_language_mix(
        _docs(spark, sf_dir), 100000.0, allocator="unimax",
        strata_col="lang", id_col="doc_id", seed="umix",
        weight_col="n_chars",
    )
    return out.select("doc_id", "lang")


def _sql_unimax_select() -> str:
    from same_same_spark.pipeline.sampling import sample_language_mix_sql

    inner = sample_language_mix_sql(
        "documents", 100000.0, allocator="unimax",
        strata_col="lang", id_col="doc_id", seed="umix",
        weight_expr="n_chars",
    )
    return f"SELECT doc_id, lang FROM ({inner})"


# --- agg stragglers (ninth round-5 session) ---------------------------------


def _q_multi_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """multi_terms agg (facets.multi_terms_facets): buckets keyed by
    the (lang, source) tuple over the match set — docs missing either
    field excluded, key rendered "lang|source", top-5 per query under
    (count DESC, key ASC) via the bounded tournament. Sole evidence.
    Saturation-overflow entry (see _SATURATION_OVERFLOW)."""
    from same_same_spark.operators.facets import multi_terms_facets

    return multi_terms_facets(
        _docs(spark, sf_dir), REF_QUERIES, ["lang", "source"],
        topn=5, id_col="doc_id", text_col="text",
    )


def _sql_multi_terms() -> str:
    from same_same_spark.operators.facets import duckdb_multi_terms_sql

    return duckdb_multi_terms_sql(
        "documents", "doc_id", "text", REF_QUERIES, ["lang", "source"],
        topn=5,
    )


def _q_diversified_sampler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """diversified_sampler > terms agg
    (facets.diversified_sampler_terms_facets): at most 2 docs per
    source survive the pinned-order dedup (NULL sources bypass), the
    50 best survivors form the sample, lang counts inside it. Sole
    evidence for the dedup-cap path (sampler_terms pins the uncapped
    sampler). Saturation-overflow entry (see _SATURATION_OVERFLOW)."""
    from same_same_spark.operators.facets import (
        diversified_sampler_terms_facets,
    )

    return diversified_sampler_terms_facets(
        _docs(spark, sf_dir), REF_QUERIES, "lang", "source",
        max_docs_per_value=2, shard_size=50, topn=5,
        id_col="doc_id", text_col="text",
    )


def _sql_diversified_sampler() -> str:
    from same_same_spark.operators.facets import (
        duckdb_diversified_sampler_sql,
    )

    return duckdb_diversified_sampler_sql(
        "documents", "doc_id", "text", REF_QUERIES, "lang", "source",
        max_docs_per_value=2, shard_size=50, topn=5,
    )


_DATE_RANGE_EDGES = [
    "2024-01-15 00:00:00", "2024-02-01 00:00:00", "2024-03-01 00:00:00",
]


def _q_date_range_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_range agg (events.date_range_buckets): fixed-shape
    half-open time buckets with unbounded ends, zero counts included,
    edge timestamps land in their upper bucket; the oracle re-derives
    bucket assignment with the independent closed form (count of
    edges <= t). Sole evidence. Saturation-overflow entry (see
    _SATURATION_OVERFLOW)."""
    from same_same_spark.operators.events import date_range_buckets

    return date_range_buckets(_events(spark, sf_dir), _DATE_RANGE_EDGES)


def _sql_date_range_agg() -> str:
    from same_same_spark.operators.events import duckdb_date_range_sql

    return duckdb_date_range_sql("events", _DATE_RANGE_EDGES)


def _q_change_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """change_point agg (events.change_point): the exact two-mean SSE
    split over each event_type's zero-filled daily histogram —
    deterministic re-expression of ES's p-value agg (module pin);
    argmax via one min(struct) per group at (round(gain,9) DESC,
    change_at ASC). Sole evidence. Saturation-overflow entry (see
    _SATURATION_OVERFLOW)."""
    from same_same_spark.operators.events import change_point, date_histogram

    series = date_histogram(
        _events(spark, sf_dir), "day", group_col="event_type"
    )
    out = change_point(series, group_cols=["event_type"])
    return _round6(out, "before_mean", "after_mean", "gain")


def _sql_change_point() -> str:
    from same_same_spark.operators.events import (
        duckdb_change_point_sql,
        duckdb_date_histogram_sql,
    )

    hist = duckdb_date_histogram_sql("events", "day", group_col="event_type")
    inner = duckdb_change_point_sql(hist, group_cols=["event_type"])
    return f"""
WITH cp AS ({inner})
SELECT event_type, change_at, round(before_mean, 6) AS before_mean,
       round(after_mean, 6) AS after_mean, round(gain, 6) AS gain
FROM cp
"""


def _q_frequent_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """frequent_item_sets (operators/itemsets.frequent_pairs): exact
    A-Priori frequent token PAIRS at 12% support — pass-1 frequent
    items broadcast-prune the doc-keyed pair join (no cross-document
    pair explosion), top-50 under (count DESC, pair ASC). Sole
    evidence. Saturation-overflow entry (see _SATURATION_OVERFLOW)."""
    from same_same_spark.operators.itemsets import frequent_pairs

    out = frequent_pairs(
        _docs(spark, sf_dir), 0.12, top_n=50,
        id_col="doc_id", text_col="text",
    )
    return _round6(out, "support")


def _sql_frequent_pairs() -> str:
    from same_same_spark.operators.itemsets import duckdb_frequent_pairs_sql

    inner = duckdb_frequent_pairs_sql(
        "documents", 0.12, top_n=50, id_col="doc_id", text_col="text"
    )
    return f"""
WITH fp AS ({inner})
SELECT item_a, item_b, doc_count, round(support, 6) AS support FROM fp
"""


# --- geo family (operators/geo.py) -----------------------------------------

_GEO_ORIGIN = (48.8566, 2.3522)


def _geo_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic (id, lat, lon) fixture over events (see
    geo.synth_point_cols — exact md5-60bit scale-shift, bit-identical
    cross-engine)."""
    from same_same_spark.operators.geo import synth_point_cols

    ev = _events(spark, sf_dir)
    lat, lon = synth_point_cols(F.col("event_id"))
    return ev.select(
        F.col("event_id").alias("id"), lat.alias("lat"), lon.alias("lon")
    )


def _geo_points_cte() -> str:
    from same_same_spark.operators.geo import synth_point_sql

    lat, lon = synth_point_sql("event_id")
    return (
        f"p AS (SELECT event_id AS id, {lat} AS lat, {lon} AS lon"
        f" FROM events)"
    )


def _q_geo_distance_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """geo_distance nearest-k (operators/geo.geo_distance_topk): the 50
    points closest to Paris under (round(d,9) ASC, id ASC), haversine
    with the pinned expression order, ranked through the bounded
    tournament (score = -d). Sole evidence for the geo query family.
    Saturation-overflow entry (see _SATURATION_OVERFLOW)."""
    from same_same_spark.operators.geo import geo_distance_topk

    out = geo_distance_topk(
        _geo_points(spark, sf_dir), *_GEO_ORIGIN, 50
    )
    return _round6(out, "distance_km")


def _sql_geo_distance_topk() -> str:
    from same_same_spark.operators.geo import haversine_km_sql

    d = haversine_km_sql(
        repr(_GEO_ORIGIN[0]), repr(_GEO_ORIGIN[1]), "lat", "lon"
    )
    return f"""
WITH {_geo_points_cte()},
d AS (
  SELECT id, {d} AS dist FROM p
  WHERE lat IS NOT NULL AND lon IS NOT NULL
),
ranked AS (
  SELECT id, dist, row_number() OVER (
    ORDER BY round(dist, 9) ASC, id ASC
  )::INTEGER AS rank
  FROM d
)
SELECT id, round(dist, 6) AS distance_km, rank
FROM ranked WHERE rank <= 50
"""


def _q_geotile_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """geotile_grid agg (operators/geo.geotile_grid): Web-Mercator
    slippy-tile buckets at zoom 5, top 40 under (count DESC, cell ASC);
    lat clamped to the ES Mercator limit, x wraps. Sole evidence.
    Saturation-overflow entry (see _SATURATION_OVERFLOW)."""
    from same_same_spark.operators.geo import geotile_grid

    return geotile_grid(_geo_points(spark, sf_dir), 5, 40)


def _sql_geotile_grid() -> str:
    from same_same_spark.operators.geo import (
        duckdb_geo_grid_sql,
        geotile_cell_sql,
    )

    grid = duckdb_geo_grid_sql("p", geotile_cell_sql("lat", "lon", 5), 40)
    body = grid.lstrip()[len("WITH "):]
    return f"WITH {_geo_points_cte()},\n{body}"


def _q_geohash_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """geohash_grid agg (operators/geo.geohash_grid): EXACT integer
    bit-math geohash cells (quantize → interleave → base32 — no
    transcendentals; bisection-encoder differential in test_geo) at
    precision 2, top 40. Sole evidence. Saturation-overflow entry
    (see _SATURATION_OVERFLOW)."""
    from same_same_spark.operators.geo import geohash_grid

    return geohash_grid(_geo_points(spark, sf_dir), 2, 40)


def _sql_geohash_grid() -> str:
    from same_same_spark.operators.geo import (
        duckdb_geo_grid_sql,
        geohash_cell_sql,
    )

    grid = duckdb_geo_grid_sql("p", geohash_cell_sql("lat", "lon", 2), 40)
    body = grid.lstrip()[len("WITH "):]
    return f"WITH {_geo_points_cte()},\n{body}"


def _q_geo_rings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """geo_distance rings agg (operators/geo.geo_distance_rings):
    fixed-shape half-open distance rings around Paris, zero counts
    included; the oracle re-derives bucket assignment with the
    independent closed form (count of edges <= d). Sole evidence.
    Saturation-overflow entry (see _SATURATION_OVERFLOW)."""
    from same_same_spark.operators.geo import geo_distance_rings

    return geo_distance_rings(
        _geo_points(spark, sf_dir), *_GEO_ORIGIN,
        [2000.0, 5000.0, 9000.0, 13000.0],
    )


def _sql_geo_rings() -> str:
    from same_same_spark.operators.geo import duckdb_geo_rings_sql

    rings = duckdb_geo_rings_sql(
        "p", *_GEO_ORIGIN, [2000.0, 5000.0, 9000.0, 13000.0]
    )
    # splice the point CTE into the rings query's WITH chain
    assert rings.lstrip().startswith("WITH ")
    body = rings.lstrip()[len("WITH "):]
    return f"WITH {_geo_points_cte()},\n{body}"


def _q_geo_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """geo_bounding_box ∘ geo_bounds+centroid (operators/geo): points
    inside an ANTIMERIDIAN-CROSSING box (left 150 > right -150) folded
    to the one-row extent + arithmetic centroid agg. Exact comparisons
    + round-6 floats. Sole evidence. Saturation-overflow entry
    (see _SATURATION_OVERFLOW)."""
    from same_same_spark.operators.geo import (
        geo_bounding_box,
        geo_bounds_centroid,
    )

    boxed = geo_bounding_box(
        _geo_points(spark, sf_dir),
        top=45.0, left=150.0, bottom=-45.0, right=-150.0,
    )
    return _round6(
        geo_bounds_centroid(boxed),
        "top", "bottom", "left", "right", "centroid_lat", "centroid_lon",
    )


def _sql_geo_bounds() -> str:
    from same_same_spark.operators.geo import (
        duckdb_geo_bounds_sql,
        geo_bounding_box_sql,
    )

    pred = geo_bounding_box_sql(
        top=45.0, left=150.0, bottom=-45.0, right=-150.0,
        lat_sql="lat", lon_sql="lon",
    )
    bounds = duckdb_geo_bounds_sql("p", where_sql=pred, round6=True)
    assert bounds.lstrip().startswith("WITH ")
    body = bounds.lstrip()[len("WITH "):]
    return f"WITH {_geo_points_cte()},\n{body}"


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

_REGISTRY: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    # ------------------------------------------------------------------
    # DEFINITIONS ONLY — since round 5 the driver verification order
    # lives in _ORDER below (the driver checks the first 50 names that
    # queries()/oracle_sql() yield).  The per-entry comments in this
    # dict record each entry's evidence history; the rotation contract
    # itself (never-verified sole evidence must sit <= 50, twin-tail
    # entries must name an in-registry witness) is machine-checked by
    # tests/test_entry.py::test_registry_rotation_contract against
    # _ORDER + _TWIN_WITNESS + the CORRECTNESS_r*.json history.
    # ------------------------------------------------------------------
    "training_mix": (_q_training_mix, _sql_training_mix()),
    "contamination": (_q_contamination, _SQL_CONTAMINATION),
    "corpus_profile": (_q_corpus_profile, _sql_corpus_profile()),
    "profile_incremental": (
        _q_profile_incremental, _sql_profile_incremental(),
    ),
    "c4_filter": (_q_c4_filter, _sql_c4_filter()),
    "pii_redact": (_q_pii_redact, _sql_pii_redact()),
    "sample_quota": (_q_sample_quota, _SQL_SAMPLE_QUOTA),
    "sample_stratified": (_q_sample_stratified, _SQL_SAMPLE_STRATIFIED),
    "split_assign": (_q_split_assign, _SQL_SPLIT_ASSIGN),
    "repetition_metrics": (_q_repetition, _sql_repetition()),
    "top_ngram": (_q_top_ngram, _sql_top_ngram()),
    "token_counts": (_q_token_counts, _sql_token_counts()),
    "fingerprints": (
        _q_fingerprints,
        textqc_ops.winnow_sql("doc_id", "text", "documents", k=8, w=4),
    ),
    "multimodal_features": (_q_multimodal_features, _SQL_MULTIMODAL),
    "ingest_stats": (_q_ingest_stats, _sql_ingest_stats()),
    # --- new round-4 entries -------------------------------------------
    "span_dedup": (_q_span_dedup, _sql_span_dedup()),
    "profile_index_fed": (_q_profile_index_fed, _sql_profile_index_fed()),
    "pack_sequences": (_q_pack_sequences, _sql_pack_sequences()),
    "ann_hnsw_topk": (_q_ann_hnsw, _SQL_ANN_BRUTE),
    "lcs_pairs": (_q_lcs_pairs, _sql_lcs_pairs()),
    "chunk_docs": (_q_chunk_docs, _sql_chunk_docs()),
    # sole evidence for the delete-heavy HNSW maintenance path
    # (HnswGraph.repair + repair_hnsw_store); its insertion pushed
    # r3-green dedup_exact past 50 into the rotation overflow.
    "ann_hnsw_after_repair": (
        _q_ann_hnsw_after_repair, _SQL_ANN_BRUTE_AFTER_REPAIR,
    ),
    # sole evidence for bigram-LM perplexity scoring (pipeline/lm.py)
    "lm_perplexity": (_q_lm_perplexity, _sql_lm_perplexity()),
    # sole evidence for CCNet head/middle/tail bucketing (exact
    # per-stratum tercile cuts). Net effect of this round's three
    # top-50 insertions (ann_hnsw_after_repair, lm_perplexity,
    # lm_buckets) + the bm25_topk twin rotation: the top-50 now ends
    # at source_hf and r3-green euclidean_topk sits FIRST IN OVERFLOW
    # (position 51, no r4 row) — every remaining top-50 row is sole
    # evidence, so new never-verified logic outranks a third
    # re-verification of a one-expression operator. Rotate
    # euclidean_topk back up next round.
    "lm_buckets": (_q_lm_buckets, _sql_lm_buckets()),
    # sole evidence for intra-doc repeated-line removal
    # (textqc.dedup_lines_cols + MixConfig.dedup_lines). Its insertion
    # pushed r2+r3-green source_hf to the head of the overflow block
    # (S4's offline-adapter semantics stay pinned locally by
    # tests/test_sources + test_entry; rotate it back when top-50
    # pressure eases).
    "line_dedup": (_q_line_dedup, _sql_line_dedup()),
    # sole evidence for BPE tokenizer training (pipeline/bpe.py):
    # bpe_pair_counts pins the trainer's statistics cross-engine;
    # bpe_encode runs the full train+encode path (iterative — no SQL
    # twin possible; rows-only driver check by design, local==
    # distributed trainer identity pinned in tests/test_bpe.py).
    # Their insertion pushed r3-green source_csv + source_jsonl to the
    # overflow head alongside source_hf (S2/S3 semantics stay pinned
    # locally by tests/test_sources + test_entry).
    "bpe_pair_counts": (_q_bpe_pair_counts, _sql_bpe_pair_counts()),
    "bpe_encode": (_q_bpe_encode, None),
    # sole evidence for the REAL audio decode path (audiocodec WAV/PCM
    # + multimodal.decode_audio_features): encode→decode→features vs
    # an oracle recomputing from the same literal samples. Its
    # insertion rotated r3-green clip_image_features to the overflow
    # head — X11/U2's SURVEY rows keep in-top-50 evidence via
    # clip_text_topk + multimodal_features.
    "audio_features": (_q_audio_features, _sql_audio_features()),
    # sole evidence for the FLAC decoder (pipeline/flaccodec.py):
    # embedded spec-encoder blobs of the SAME fixture → decode →
    # features vs the shared literal-sample oracle. Its r5 insertion
    # rotated filter_metadata_map past 50 (twin-witnessed by
    # filter_expr).
    "flac_features": (_q_flac_features, _sql_audio_features()),
    # sole evidence for the REAL video decode path (videocodec AVI
    # parse + DIB decode + mid-bucket frame sampling +
    # multimodal.decode_video_frames); rotated source_csv to overflow.
    "video_frames": (_q_video_frames, _sql_video_frames()),
    # sole evidence for the event-time layer (operators/events.py):
    # asof_join against DuckDB's native ASOF LEFT JOIN, sessionize
    # against an identical window recurrence. Their insertion rotated
    # r2+r3-green one-expression temporal_topk (X7 keeps r3-green
    # temporal_decay + temporal_search twins in overflow) and
    # tags_split (X10, trivial split) to the overflow head.
    "asof_join": (_q_asof_join, _SQL_ASOF_JOIN),
    "events_sessionize": (_q_events_sessionize, _SQL_EVENTS_SESSIONIZE),
    # sole evidence for cross-document line dedup
    # (textqc.dedup_lines_global + MixConfig.dedup_lines_global); its
    # insertion rotated r2+r3-green one-expression vector_dim_mismatch
    # (F4) to the overflow head — F4's dim-mismatch contract stays
    # pinned locally by tests/test_operators + test_entry.
    "global_line_dedup": (_q_global_line_dedup, _sql_global_line_dedup()),
    # sole evidence for SemDeDup (dedup.semdedup_keep — cluster-bounded
    # semantic dedup); its insertion rotated r2+r3-green one-expression
    # legacy_metadata_eq (F1/F6) to the overflow head — the filter
    # family keeps in-top-50 evidence via filter_expr (F2/F3 subsumes
    # the equality semantics) and test_filters' truth tables.
    "semdedup": (_q_semdedup, _SQL_SEMDEDUP),
    # sole evidence for product quantization (pipeline/pq.py — encode
    # argmin + ADC LUT scoring; the 100-TB embedding-compression path).
    # Its insertion rotated r2+r3-green metadata_score (A6) to the
    # overflow head — A6's scoring stays exercised end-to-end inside
    # in-top-50 hybrid_search_indexed (A7 advanced_search combines the
    # metadata score) and pinned by tests/test_operators.
    "pq_adc_topk": (_q_pq_adc_topk, _SQL_PQ_ADC_TOPK),
    # sole evidence for reciprocal-rank fusion (hybrid.rrf_fuse); its
    # insertion rotated r2+r3-green doc_token_stats (X2) to the
    # overflow head — TF's arithmetic stays exercised inside every
    # in-top-50 BM25/TF-IDF entry (their scores are TF functions) and
    # pinned by tests/test_bm25 + the rotated entry's local gate.
    "rrf_fuse": (_q_rrf_fuse, _sql_rrf_fuse()),
    # sole evidence for URL canonicalization + URL-keyed dedup
    # (pipeline/urls.py); its insertion rotated r2+r3-green
    # one-expression event_age_buckets (X9) to the overflow head —
    # X9's bucket math stays pinned by tests/test_operators + the
    # rotated entry's local gate.
    "url_dedup": (_q_url_dedup, _sql_url_dedup()),
    # sole evidence for the event-time interval join
    # (operators/events.interval_join — the batch face of the
    # watermarked stream-stream join; streaming==batch pinned in
    # tests/test_events.py). Its insertion rotated r2+r3-green
    # events_hourly to the overflow head — §2.7's joins/windows
    # evidence stays in-top-50 via asof_join + events_sessionize +
    # this entry, and events_hourly's window-agg semantics stay
    # pinned locally by tests/test_entry.
    "interval_join": (_q_interval_join, _SQL_INTERVAL_JOIN),
    # sole evidence for the uniform per-domain budget
    # (sampling.sample_host_cap + MixConfig.host_cap). Its insertion
    # rotated r3-green vocab_prune (A2) to the overflow head — A2's
    # prune rule stays exercised inside in-top-50 tfidf_topk (its
    # scoring runs stats.prune_vocabulary) and pinned by tests/
    # test_stats + the rotated entry's local gate.
    "host_cap": (_q_host_cap, _sql_host_cap()),
    # sole evidence for OPQ (pipeline/opq.py — learned orthogonal
    # rotation ahead of PQ). Its insertion rotated r3-green
    # search_by_text_indexed to the overflow head — §2.9 keeps
    # hybrid_search_indexed + filter_search_indexed in-top-50, the
    # indexed BM25 read path keeps index_bm25_topk, and the rotated
    # entry stays pinned by tests/test_api + test_entry.
    "opq_adc_topk": (_q_opq_adc_topk, _sql_opq_adc_topk()),
    # sole evidence for DSIR data selection (pipeline/dsir.py, Xie et
    # al. 2023). Its insertion rotated r2+r3-green one-expression
    # vector_topk (X5) to the overflow head — cosine stays value-
    # compared cross-engine inside in-top-50 semdedup's oracle and
    # pinned by tests/test_operators + the rotated entry's local gate.
    "dsir_weights": (_q_dsir_weights, _sql_dsir_weights()),
    # sole evidence for Kneser-Ney smoothing (lm.train_kn_lm). Its
    # insertion rotated r3-green list_projection (F7/F8) to the
    # overflow head — projection semantics are exercised by every
    # entry's select list and stay pinned by tests/test_api + the
    # rotated entry's local gate.
    "kn_perplexity": (_q_kn_perplexity, _sql_kn_perplexity()),
    # --- r3-green entries (CORRECTNESS_r03 all-green) -----------------
    # (bm25_topk moved to the twin tail this round: it shares
    # _SQL_BM25_TOPK with in-top-50 index_bm25_topk and the two are
    # rank-identical by construction — the codified twin exception —
    # which keeps sole-evidence euclidean_topk inside the top-50 after
    # the two new round-4 insertions above.)
    "term_df_top100": (_q_term_df, _SQL_TERM_DF),
    "corpus_overview": (_q_corpus_overview, _SQL_CORPUS_OVERVIEW),
    "filter_expr": (_q_filter_expr, _SQL_FILTER_EXPR),
    "index_bm25_topk": (_q_index_bm25_topk, _SQL_BM25_TOPK),
    "index_bm25_topk_after_delete": (
        _q_index_bm25_after_delete,
        _SQL_INDEX_BM25_AFTER_DELETE,
    ),
    "tfidf_topk": (_q_tfidf_topk, _SQL_TFIDF_TOPK),
    "clip_text_topk": (_q_clip_text_topk, _SQL_CLIP_TEXT_TOPK),
    "hybrid_search_indexed": (
        _q_hybrid_search_indexed,
        _SQL_HYBRID_SEARCH_INDEXED,
    ),
    "filter_search_indexed": (
        _q_filter_search_indexed,
        _SQL_FILTER_SEARCH_INDEXED,
    ),
    # --- rotation overflow starts here (position 51) ---------------
    # events_hourly rotated here when interval_join landed (r2+r3
    # green window agg; §2.7 keeps three event-time entries in-top-50).
    "events_hourly": (_q_events_hourly, _SQL_EVENTS_HOURLY),
    # vocab_prune rotated here when host_cap landed (see that entry's
    # comment; A2 keeps in-top-50 evidence via tfidf_topk).
    "vocab_prune": (_q_vocab_prune, _SQL_VOCAB_PRUNE),
    # search_by_text_indexed rotated here when opq_adc_topk landed
    # (see that entry's comment).
    "search_by_text_indexed": (
        _q_search_by_text_indexed,
        _SQL_SEARCH_BY_TEXT_INDEXED,
    ),
    # vector_topk rotated here when dsir_weights landed (see that
    # entry's comment).
    "vector_topk": (_q_vector_topk, _SQL_VECTOR_TOPK),
    # list_projection rotated here when kn_perplexity landed (see that
    # entry's comment).
    "list_projection": (_q_list_projection, _SQL_LIST_PROJECTION),
    "event_age_buckets": (_q_event_age_buckets, _SQL_EVENT_AGE_BUCKETS),
    # temporal_topk + tags_split rotated here this session (r2+r3
    # green one-expression ops) to make room for asof_join +
    # events_sessionize above; X7 keeps temporal_decay/temporal_search
    # twins in this block, X10's split semantics stay pinned by
    # tests/test_operators + test_entry.
    "temporal_topk": (_q_temporal_topk, _SQL_TEMPORAL_TOPK),
    "vector_dim_mismatch": (_q_vector_dim_mismatch, _SQL_VECTOR_DIM_MISMATCH),
    "legacy_metadata_eq": (_q_legacy_metadata_eq, _SQL_LEGACY_METADATA_EQ),
    "metadata_score": (_q_metadata_score, _SQL_METADATA_SCORE),
    "doc_token_stats": (_q_doc_token_stats, _SQL_DOC_TOKEN_STATS),
    "tags_split": (
        _q_tags_split,
        # synthesize the same messy tags string in SQL, then split
        "SELECT doc_id, unnest("
        "list_filter(list_transform(string_split("
        "' ' || lang || ' , ' || source || ', ,', ','), t -> trim(t)), "
        "t -> length(t) > 0)) AS tag FROM documents",
    ),
    # The five new sole-evidence round-4 entries (line_dedup,
    # bpe_pair_counts, bpe_encode, audio_features, video_frames)
    # pushed clip_image_features + all four sources past 50. All are
    # r2+r3 green one-expression scans whose semantics stay pinned
    # locally by tests (test_clip/test_sources) + test_entry, and
    # X11/U2's SURVEY rows keep in-top-50 twins (clip_text_topk,
    # multimodal_features). Rotate them back as the never-verified
    # block shrinks next round.
    "source_quotes": (_q_source_quotes, _SQL_SOURCE_QUOTES),
    "clip_image_features": (_q_clip_image_features, _SQL_CLIP_IMAGE),
    "source_csv": (_q_source_csv, _SQL_SOURCE_CSV),
    "source_jsonl": (_q_source_jsonl, _SQL_SOURCE_JSONL),
    "source_hf": (_q_source_hf, _SQL_SOURCE_HF),
    "euclidean_topk": (_q_euclidean_topk, _SQL_EUCLIDEAN_TOPK),
    # training-pipeline operators
    "dedup_exact": (_q_dedup_exact, _SQL_DEDUP_EXACT),
    "shared_spans": (_q_shared_spans, _SQL_SHARED_SPANS),
    "dedup_minhash": (_q_dedup_minhash, _exact_jaccard_sql(0.9)),
    "dedup_clusters": (_q_dedup_clusters, _SQL_DEDUP_CLUSTERS),
    "simhash_docs": (_q_simhash, _SQL_SIMHASH),
    "dedup_embedding": (_q_dedup_embedding, _SQL_DEDUP_EMBEDDING),
    "ann_brute_topk": (_q_ann_brute, _SQL_ANN_BRUTE),
    "ann_ivf_topk": (_q_ann_ivf, _SQL_ANN_IVF),
    "ann_lsh_topk": (_q_ann_lsh, _SQL_ANN_LSH),
    "simhash_pairs": (_q_simhash_pairs, _SQL_SIMHASH_PAIRS),
    "lang_id": (_q_lang_id, _SQL_LANG_ID),
    "quality_scores": (_q_quality, _sql_quality()),
    "temporal_decay": (_q_temporal_decay, _SQL_TEMPORAL_DECAY),
    "temporal_search": (_q_temporal_search, _SQL_TEMPORAL_SEARCH),
    # --- redundant-SQL twins: same oracle as an entry above, different
    # Spark implementation.  Kept last so a hard driver cap of 50 drops
    # these first (their oracle identity is still covered by the twin;
    # their Spark-side divergence is pinned by tests/test_entry.py).
    # ann_hnsw_persisted (round 4) is here BY DESIGN, not overflow
    # accident: it is result-identical to in-top-50 ann_hnsw_topk
    # (build determinism, pinned in test_hnsw) and shares its brute
    # oracle, exactly this block's contract.
    # search_by_text + hybrid_search + filter_metadata_map rotated here
    # round 4 (r3-green): their SURVEY rows keep in-top-50 evidence
    # (§2.9: search_by_text_indexed, hybrid_search_indexed,
    # filter_search_indexed; A7: hybrid_search_indexed; F2/F3:
    # filter_expr); the rotated paths' Spark-vs-oracle identity stays
    # pinned by tests/test_entry.
    # bm25_topk (rotated round 4): the naive differential baseline —
    # same oracle SQL and rank-identical results as in-top-50
    # index_bm25_topk (pinned in test_index + test_entry).
    "bm25_topk": (_q_bm25_topk, _SQL_BM25_TOPK),
    "search_by_text": (_q_search_by_text, _SQL_SEARCH_BY_TEXT),
    "hybrid_search": (_q_hybrid_search, _SQL_HYBRID_SEARCH),
    "filter_metadata_map": (_q_filter_metadata_map, _SQL_FILTER_METADATA_MAP),
    # passage_topk (round 4) = chunk_documents ∘ score_queries — both
    # pieces top-50-verified (chunk_docs, bm25_topk); codified twin-
    # tail exception, full-value SQL twin in tests/test_entry.py.
    "passage_topk": (_q_passage_topk, _sql_passage_topk()),
    "dedup_prefix": (_q_dedup_prefix, _exact_jaccard_sql(0.9)),
    "dedup_ngram_jaccard": (_q_dedup_ngram, _exact_jaccard_sql(0.8)),
    "ann_lsh_persisted": (_q_ann_lsh_persisted, _SQL_ANN_LSH),
    "ann_ivf_persisted": (_q_ann_ivf_persisted, _SQL_ANN_IVF),
    "ann_hnsw_persisted": (_q_ann_hnsw_persisted, _SQL_ANN_BRUTE),
    # lcs_strip (round 4) sits in the tail because the top-50 is full
    # of sole-evidence rows: its composition (lcs_pairs measurement ∘
    # strip_char_ranges stitcher) is covered in-top-50 by lcs_pairs +
    # span_dedup, and its own SQL twin is full-value-compared in
    # tests/test_lcs.py + tests/test_entry.py.
    "lcs_strip": (_q_lcs_strip, _sql_lcs_strip()),
    "tfidf_topk_indexed": (_q_tfidf_topk_indexed, _SQL_TFIDF_TOPK),
    # session_windows = the native F.session_window operator over the
    # SAME 6h-gap sessions as in-top-50 events_sessionize (cuts proven
    # identical in tests/test_sessions.py, values full-compared by
    # test_entry) — the codified twin-tail contract.
    "session_windows": (_q_session_windows, _SQL_SESSION_WINDOWS),
    # pq_ivf_topk = persisted IVF-PQ probe: the composition of the
    # in-top-50-verified pieces (pq_adc_topk's encode/ADC math +
    # ann_ivf_topk's probe rule) over a store whose artifacts the
    # oracle re-derives from the embeddings view; twin-tail per the
    # codified exception, full-value-compared in tests/test_entry.py,
    # pruning plan-asserted in tests/test_pq.py.
    "pq_ivf_topk": (_q_pq_ivf_topk, _SQL_PQ_IVF_TOPK),
    # pq_cell_topk (round 5): in-cell PQ codes on the MUTABLE store —
    # sole evidence for ann_store.build_ann_index(pq_codebooks=) /
    # attach_pq_codes / pq_cell_topk; in the top-50 via _ORDER.
    "pq_cell_topk": (_q_pq_cell_topk, _SQL_PQ_IVF_TOPK),
    # round-5 fulltext extras (sole evidence, in the top-50 via _ORDER)
    "phrase_topk": (_q_phrase_topk, _sql_phrase_topk()),
    "snippet_topk": (_q_snippet_topk, _sql_snippet_topk()),
    "spell_suggest": (_q_spell_suggest, _sql_spell_suggest()),
    "more_like_this": (_q_more_like_this, _sql_more_like_this()),
    "boolean_search": (_q_boolean_search, _sql_boolean_search()),
    # multi-term query rewrites (third round-5 session): wildcard/prefix
    # patterns, edit-distance fuzzy matching, bounded-window proximity —
    # each sole evidence with an independently-derived oracle (window-fn
    # expansion ranking / brute-force cross join / brute-force window
    # scan respectively).
    "wildcard_topk": (_q_wildcard_topk, _sql_wildcard_topk()),
    "fuzzy_topk": (_q_fuzzy_topk, _sql_fuzzy_topk()),
    "proximity_topk": (_q_proximity_topk, _sql_proximity_topk()),
    # facet aggregations over the full match set + keyset pagination
    # (cursor==offset identity under the pinned total order) — both
    # sole evidence.
    "search_facets": (_q_search_facets, _sql_search_facets()),
    "search_after_page2": (
        _q_search_after_page2, _sql_search_after_page2(),
    ),
    # result shaping: field collapsing + range aggregation (both sole
    # evidence with independently-derived oracles)
    "collapse_by_source": (
        _q_collapse_by_source, _sql_collapse_by_source(),
    ),
    "range_facets": (_q_range_facets, _sql_range_facets()),
    # relevance & aggregation wave (fourth round-5 session, all sole
    # evidence): JLH significant terms, bucket-scoped top hits,
    # term^boost weighting, engine-side synonym expansion, and the
    # minimum_should_match gate on the boolean algebra.
    "significant_terms": (
        _q_significant_terms, _sql_significant_terms(),
    ),
    "facet_top_hits": (_q_facet_top_hits, _sql_facet_top_hits()),
    "boosted_topk": (_q_boosted_topk, _sql_boosted_topk()),
    "synonym_topk": (_q_synonym_topk, _sql_synonym_topk()),
    "boolean_msm": (_q_boolean_msm, _sql_boolean_msm()),
    # regexp query mode + extended-stats metric aggregation (fifth
    # round-5 session, both sole evidence): the regexp oracle pins
    # Java-vs-RE2 agreement on the validated subset; the stats oracle
    # compares bit-identical doubles derived from exact integer sums.
    "regexp_topk": (_q_regexp_topk, _sql_regexp_topk()),
    "stats_agg": (_q_stats_agg, _sql_stats_agg()),
    # the rest of the ES metric/bucket aggregation family (sole
    # evidence): zero-filled fixed-interval histogram, exact
    # percentiles (the corpus_profile quantile identity per match
    # set), and value_count/cardinality/missing in one pass.
    "histogram_agg": (_q_histogram_agg, _sql_histogram_agg()),
    "percentiles_agg": (_q_percentiles_agg, _sql_percentiles_agg()),
    "cardinality_agg": (_q_cardinality_agg, _sql_cardinality_agg()),
    # ES rescore block: phrase re-rank of the bounded BM25 top-window
    # (sole evidence; window selection + phrase counts independently
    # re-derived in the oracle).
    "rescore_topk": (_q_rescore_topk, _sql_rescore_topk()),
    # ES composite agg (paginated key-ordered buckets) + function_score
    # decay family (both sole evidence).
    "composite_agg": (_q_composite_agg, _sql_composite_agg()),
    "decay_score": (_q_decay_score, _sql_decay_score()),
    # terms{stats} nesting + zero-filled calendar date histogram
    # (both sole evidence).
    "terms_metrics": (_q_terms_metrics, _sql_terms_metrics()),
    "date_histogram": (_q_date_histogram, _sql_date_histogram()),
    # reverse search (percolation) + named-filter overlap matrix
    # (both sole evidence).
    "percolate": (_q_percolate, _sql_percolate()),
    "adjacency_matrix": (_q_adjacency_matrix, _sql_adjacency_matrix()),
    # per-doc term vectors + ordered span-near (both sole evidence).
    "term_vectors": (_q_term_vectors, _sql_term_vectors()),
    "span_near": (_q_span_near, _sql_span_near()),
    # metadata-filtered k-NN (sole evidence for the pre-filter shape).
    "ann_filtered_topk": (_q_ann_filtered, _SQL_ANN_FILTERED),
    # per-hit BM25 score breakdown (sole evidence).
    "explain_score": (_q_explain_score, _sql_explain_score()),
    "bm25f_topk": (_q_bm25f_topk, _sql_bm25f_topk()),
    "pipeline_aggs": (_q_pipeline_aggs, _sql_pipeline_aggs()),
    "suggest_topk": (_q_suggest_topk, _sql_suggest_topk()),
    "sq8_topk": (_q_sq8_topk, _sql_sq8_topk()),
    "dirichlet_topk": (_q_dirichlet_topk, _sql_dirichlet_topk()),
    # saturation-overflow entries (see _SATURATION_OVERFLOW below)
    "jm_topk": (_q_jm_topk, _sql_jm_topk()),
    "bq_topk": (_q_bq_topk, _sql_bq_topk()),
    "dismax_topk": (_q_dismax_topk, _sql_dismax_topk()),
    "filters_agg": (_q_filters_agg, _sql_filters_agg()),
    "mmr_topk": (_q_mmr_topk, _sql_mmr_topk()),
    "multi_match_topk": (_q_multi_match_topk, _sql_multi_match_topk()),
    "matrix_stats_agg": (_q_matrix_stats_agg, _sql_matrix_stats_agg()),
    "rare_terms": (_q_rare_terms, _sql_rare_terms()),
    "weighted_avg": (_q_weighted_avg, _sql_weighted_avg()),
    "bucket_sort_days": (_q_bucket_sort_days, _sql_bucket_sort_days()),
    "span_first": (_q_span_first, _sql_span_first()),
    "sampler_terms": (_q_sampler_terms, _sql_sampler_terms()),
    "cascade_topk": (_q_cascade_topk, _sql_cascade_topk()),
    "rank_feature_topk": (_q_rank_feature, _sql_rank_feature()),
    "distance_feature_topk": (_q_distance_feature, _sql_distance_feature()),
    "terms_set_topk": (_q_terms_set, _sql_terms_set()),
    "percentile_ranks": (_q_percentile_ranks, _sql_percentile_ranks()),
    "missing_agg": (_q_missing_agg, _sql_missing_agg()),
    "ann_recall_eval": (_q_ann_recall_eval, _sql_ann_recall_eval()),
    "match_phrase_prefix": (
        _q_match_phrase_prefix, _sql_match_phrase_prefix(),
    ),
    "ltr_topk": (_q_ltr_topk, _sql_ltr_topk()),
    "stream_vector_topk": (
        _q_stream_vector_topk, _sql_stream_vector_topk(),
    ),
    "boxplot_agg": (_q_boxplot_agg, _sql_boxplot_agg()),
    "mad_agg": (_q_mad_agg, _sql_mad_agg()),
    "string_stats_agg": (
        _q_string_stats_agg, _sql_string_stats_agg(),
    ),
    "top_metrics_agg": (_q_top_metrics_agg, _sql_top_metrics_agg()),
    "phrase_suggest": (_q_phrase_suggest, _sql_phrase_suggest()),
    "boosting_topk": (_q_boosting_topk, _sql_boosting_topk()),
    "auto_date_histogram": (
        _q_auto_date_histogram, _sql_auto_date_histogram(),
    ),
    "t_test_agg": (_q_t_test_agg, _sql_t_test_agg()),
    "rate_agg": (_q_rate_agg, _sql_rate_agg()),
    "moving_fn_agg": (_q_moving_fn_agg, _sql_moving_fn_agg()),
    "function_score": (_q_function_score, _sql_function_score()),
    "intervals_topk": (_q_intervals_topk, _sql_intervals_topk()),
    "query_string": (_q_query_string, _sql_query_string()),
    "pinned_topk": (_q_pinned_topk, _sql_pinned_topk()),
    "vector_range": (_q_vector_range, _sql_vector_range()),
    "serial_diff_agg": (_q_serial_diff_agg, _sql_serial_diff_agg()),
    "normalize_agg": (_q_normalize_agg, _sql_normalize_agg()),
    "cumulative_cardinality": (
        _q_cumulative_cardinality, _sql_cumulative_cardinality(),
    ),
    "bucket_script_agg": (
        _q_bucket_script_agg, _sql_bucket_script_agg(),
    ),
    # --- geo distance_feature (ninth round-5 session) ------------------
    "geo_distance_feature": (
        _q_geo_distance_feature, _sql_geo_distance_feature(),
    ),
    # --- late-interaction MaxSim (ninth round-5 session) ---------------
    "maxsim_topk": (_q_maxsim_topk, _sql_maxsim_topk()),
    # --- parent/child join queries (ninth round-5 session) -------------
    "has_child_topk": (_q_has_child, _sql_has_child()),
    "has_parent_topk": (_q_has_parent, _sql_has_parent()),
    # --- residual quantization (ninth round-5 session) -----------------
    "rq_adc_topk": (_q_rq_adc_topk, _sql_rq_adc_topk()),
    # --- federated multi-index search (ninth round-5 session) ----------
    # oracle = the whole-corpus _SQL_BM25_TOPK: the federated family
    # must match the monolithic corpus exactly (global-stats identity)
    "index_federated_topk": (_q_index_federated_topk, _SQL_BM25_TOPK),
    # --- language-mixture sampling (ninth round-5 session) -------------
    "temperature_select": (
        _q_temperature_select, _sql_temperature_select(),
    ),
    "unimax_select": (_q_unimax_select, _sql_unimax_select()),
    # --- agg stragglers (ninth round-5 session) ------------------------
    "multi_terms": (_q_multi_terms, _sql_multi_terms()),
    "diversified_sampler": (
        _q_diversified_sampler, _sql_diversified_sampler(),
    ),
    "date_range_agg": (_q_date_range_agg, _sql_date_range_agg()),
    "change_point": (_q_change_point, _sql_change_point()),
    "frequent_pairs": (_q_frequent_pairs, _sql_frequent_pairs()),
    # --- geo family (ninth round-5 session) ----------------------------
    "geo_distance_topk": (_q_geo_distance_topk, _sql_geo_distance_topk()),
    "geotile_grid": (_q_geotile_grid, _sql_geotile_grid()),
    "geohash_grid": (_q_geohash_grid, _sql_geohash_grid()),
    "geo_rings": (_q_geo_rings, _sql_geo_rings()),
    "geo_bounds": (_q_geo_bounds, _sql_geo_bounds()),
    # index-dictionary wildcard: rank-identical twin of wildcard_topk
    # (shared oracle; twin-tail placement per the witness contract)
    "wildcard_topk_indexed": (
        _q_wildcard_topk_indexed, _sql_wildcard_topk(),
    ),
    # pq_mirror_topk = the incremental mirror's init→sync→probe path
    # over the SAME centroids/codebooks/probe rule as pq_ivf_topk —
    # shared oracle, twin-tail per the codified exception; the mirror's
    # own mutation matrix is pinned in tests/test_pq_mirror.py.
    "pq_mirror_topk": (_q_pq_mirror_topk, _SQL_PQ_IVF_TOPK),
    # dsir_select = the Gumbel top-k over in-top-50 dsir_weights' exact
    # log_w values, noise from the verified hash uniform, ranking via
    # the tournament every top-k entry exercises — the codified
    # composition exception; its full-value oracle (the whole WITH
    # chain + the Gumbel expression) is compared by tests/test_entry.
    "dsir_select": (_q_dsir_select, _sql_dsir_select()),
    # corpus_divergence = a driver-side closed-form reduce over the
    # SAME smoothed bucket distributions in-top-50 dsir_weights
    # verifies per-document; tail placement per the composition
    # exception, full-value oracle compared by tests/test_entry +
    # hand-property tests in test_dsir.
    "corpus_divergence": (_q_corpus_divergence, _sql_corpus_divergence()),
}

# ---------------------------------------------------------------------------
# Driver verification order (round 5 rotation).  The driver consumes the
# first 50 names.  Blocks:
#   1-11   never driver-verified: the two r4 hash-reds (corpus_profile,
#          profile_incremental — fixed this round) + the eight twin-tail
#          entries that never got a driver row + bpe_encode (rows-only
#          by design; re-recorded each round it sits <= 50).
#   then   new round-5 entries, inserted here as they land (each insert
#          bumps the lowest rotate-back below into the r4-green tail).
#   then   rotate-backs: every entry whose last green row is r2/r3,
#          euclidean_topk first (VERDICT_r4 #4 / the registry contract),
#          minus witness-backed twins that stay in the tail.
#   51+    the 47 entries green in CORRECTNESS_r04 (freshest evidence,
#          safe to skip a round) + witness-backed twins last.
# ---------------------------------------------------------------------------
_ORDER: list[str] = [
    # --- never driver-verified (11) -----------------------------------
    "corpus_profile",
    "profile_incremental",
    "passage_topk",
    "ann_hnsw_persisted",
    "lcs_strip",
    "session_windows",
    "pq_ivf_topk",
    "pq_mirror_topk",
    "dsir_select",
    "corpus_divergence",
    "bpe_encode",
    # --- new round-5 entries land here --------------------------------
    # in-cell PQ codes on the mutable ann_store (sole evidence); its
    # insertion bumped witness-backed search_by_text to the tail
    "pq_cell_topk",
    # FLAC bitstream decoder end to end (sole evidence); bumped
    # filter_metadata_map past 50 (twin-witnessed by filter_expr)
    "flac_features",
    # fulltext extras (sole evidence): adjacency-verified phrase
    # search, best-window snippets, SymSpell spell suggestion,
    # more-like-this. Their insertion bumped dedup_ngram_jaccard /
    # ann_lsh_persisted / ann_ivf_persisted / tfidf_topk_indexed past
    # 50 (each twin-witnessed below).
    "phrase_topk",
    "snippet_topk",
    "spell_suggest",
    "more_like_this",
    "boolean_search",
    # multi-term rewrites (sole evidence): wildcard, fuzzy, proximity.
    # Their insertion bumped r2/r3-green quality_scores / temporal_decay
    # / temporal_search past 50 (each has green driver history; X7
    # additionally keeps temporal_search's semantics exercised by the
    # r3-green temporal_topk family).
    "wildcard_topk",
    "fuzzy_topk",
    "proximity_topk",
    # facets + keyset pagination (sole evidence); bumped r2/r3-green
    # simhash_pairs / lang_id past 50 (both have green driver history;
    # simhash stays exercised via in-top-50 training_mix's dedup chain,
    # lang_id inside the r4-green c4_filter/textqc family).
    "search_facets",
    "search_after_page2",
    # field collapsing + range aggregation (sole evidence); bumped
    # r2/r3-green ann_lsh_topk / ann_ivf_topk past 50 (both keep green
    # driver history; the LSH/IVF probe rules stay exercised by
    # in-top-50 semdedup's shared-CTE oracle and the persisted-store
    # twins in the tail).
    "collapse_by_source",
    "range_facets",
    # relevance & aggregation wave (fourth round-5 session, sole
    # evidence); their insertion pushed r2/r3-green dedup_minhash /
    # dedup_clusters / simhash_docs / dedup_embedding / ann_brute_topk
    # past 50 — each has green driver history (r2/r3 rows), which the
    # rotation contract accepts for displaced rotate-backs.
    "significant_terms",
    "facet_top_hits",
    "boosted_topk",
    "synonym_topk",
    "boolean_msm",
    # regexp query mode + extended-stats aggregation (sole evidence);
    # their insertion pushed r2/r3-green dedup_exact / shared_spans
    # past 50 — both have green driver history, and their semantics
    # stay exercised in-top-50 (exact dedup inside training_mix's
    # dedup chain; the winnowing fingerprint family via span_dedup's
    # r4-green row).
    "regexp_topk",
    "stats_agg",
    # histogram/percentiles/cardinality aggregations (sole evidence);
    # their insertion pushed r2/r3-green source_jsonl / source_hf /
    # list_projection past 50 — green driver history, and S3/S4/F7
    # semantics stay exercised locally (test_sources, test_api).
    "histogram_agg",
    "percentiles_agg",
    "cardinality_agg",
    # ES rescore (sole evidence); its insertion pushed r2/r3-green
    # source_csv past 50 (green driver history; S2 semantics stay
    # exercised locally in test_sources).
    "rescore_topk",
    # composite agg + decay function score (sole evidence); their
    # insertion pushed r2/r3-green source_quotes / clip_image_features
    # past 50 (green driver history; S1 stays exercised in
    # test_sources, X11 keeps its in-top-50 clip_text_topk twin).
    "composite_agg",
    "decay_score",
    # terms{stats} nesting + date_histogram (sole evidence); their
    # insertion pushed r2/r3-green metadata_score / doc_token_stats
    # past 50 (green driver history; A6 stays exercised via in-top-50
    # hybrid_search_indexed's combine, X2 via every BM25 entry's tf
    # derivation).
    "terms_metrics",
    "date_histogram",
    # percolation + adjacency matrix (sole evidence); their insertion
    # pushed r2/r3-green tags_split / legacy_metadata_eq past 50
    # (green driver history; X10 stays exercised locally in
    # test_operators, F1/F6 via in-top-50 filter_expr's truth tables).
    "percolate",
    "adjacency_matrix",
    # term vectors + ordered span-near (sole evidence); their insertion
    # pushed r2/r3-green temporal_topk / vector_dim_mismatch past 50
    # (green driver history; X7 stays exercised via the r3-green
    # temporal family + decay_score's generalization, F4 locally in
    # test_operators).
    "term_vectors",
    "span_near",
    # filtered k-NN (sole evidence); its insertion pushed r2/r3-green
    # event_age_buckets past 50 (green driver history; X9 stays
    # exercised locally in test_operators).
    "ann_filtered_topk",
    # _explain score breakdown (sole evidence); its insertion pushed
    # r2/r3-green vector_topk past 50 (green driver history; X5 stays
    # exercised via semdedup's shared-CTE oracle + every ANN entry).
    "explain_score",
    # BM25F cross-field ranking (sole evidence, fifth round-5 session);
    # its insertion pushed r2/r3-green euclidean_topk past 50 (green
    # driver history; X6 stays exercised locally in test_operators).
    "bm25f_topk",
    # ES pipeline aggregations over the date histogram (sole evidence);
    # its insertion pushed r2/r3-green events_hourly past 50 (green
    # driver history; §2.7's windowed agg stays exercised by the
    # in-top-50 date_histogram + this entry's composed series).
    "pipeline_aggs",
    # SQ8 scalar quantization (sole evidence): the whole
    # train→encode→rank chain under the differential; its insertion
    # pushed r2/r3-green vocab_prune past 50 (green driver history; A2
    # stays exercised via in-top-50 tfidf_topk's prune_vocabulary).
    "sq8_topk",
    # LM Dirichlet similarity (sole evidence) — the 50th sole-evidence
    # slot; its insertion pushed r2/r3-green search_by_text_indexed
    # past 50 (green driver history; the §2.9 flagship read path stays
    # exercised by in-top-50 index_bm25_topk + filter_search_indexed).
    "dirichlet_topk",
    # --- saturation overflow (sole evidence, positions 51-52) ----------
    # The 50 slots above are ALL never-driver-verified sole evidence,
    # so rotation cannot make room without burying other sole evidence;
    # these queue here for round-6 verification under the
    # machine-checked _SATURATION_OVERFLOW exemption (test_entry).
    "jm_topk",
    "bq_topk",
    "dismax_topk",
    "filters_agg",
    "mmr_topk",
    "multi_match_topk",
    "matrix_stats_agg",
    "rare_terms",
    "weighted_avg",
    "bucket_sort_days",
    "span_first",
    "sampler_terms",
    "cascade_topk",
    "rank_feature_topk",
    "distance_feature_topk",
    "terms_set_topk",
    "percentile_ranks",
    "missing_agg",
    "ann_recall_eval",
    "match_phrase_prefix",
    "ltr_topk",
    "stream_vector_topk",
    "boxplot_agg",
    "mad_agg",
    "string_stats_agg",
    "top_metrics_agg",
    "serial_diff_agg",
    "normalize_agg",
    "cumulative_cardinality",
    "bucket_script_agg",
    "phrase_suggest",
    "boosting_topk",
    "auto_date_histogram",
    "t_test_agg",
    "rate_agg",
    "moving_fn_agg",
    "function_score",
    "intervals_topk",
    "query_string",
    "pinned_topk",
    "vector_range",
    "geo_distance_topk",
    "geotile_grid",
    "geohash_grid",
    "geo_rings",
    "geo_bounds",
    "multi_terms",
    "diversified_sampler",
    "date_range_agg",
    "change_point",
    "frequent_pairs",
    "temperature_select",
    "unimax_select",
    "index_federated_topk",
    "rq_adc_topk",
    "has_child_topk",
    "has_parent_topk",
    "maxsim_topk",
    "geo_distance_feature",
    # --- rotate-backs (last green r2/r3) -------------------------------
    "euclidean_topk",
    "events_hourly",
    "vocab_prune",
    "search_by_text_indexed",
    "vector_topk",
    "event_age_buckets",
    "temporal_topk",
    "vector_dim_mismatch",
    "tags_split",
    "legacy_metadata_eq",
    "metadata_score",
    "doc_token_stats",
    "source_quotes",
    "clip_image_features",
    "source_csv",
    "source_jsonl",
    "source_hf",
    "list_projection",
    "dedup_exact",
    "shared_spans",
    "dedup_minhash",
    "dedup_clusters",
    "simhash_docs",
    "dedup_embedding",
    "ann_brute_topk",
    "ann_ivf_topk",
    "ann_lsh_topk",
    "simhash_pairs",
    "lang_id",
    "quality_scores",
    "temporal_decay",
    "temporal_search",
    "dedup_prefix",
    "dedup_ngram_jaccard",
    "ann_lsh_persisted",
    "ann_ivf_persisted",
    "tfidf_topk_indexed",
    "filter_metadata_map",
    # --- position 51+: green in CORRECTNESS_r04 ------------------------
    "training_mix",
    "contamination",
    "c4_filter",
    "pii_redact",
    "sample_quota",
    "sample_stratified",
    "split_assign",
    "repetition_metrics",
    "top_ngram",
    "token_counts",
    "fingerprints",
    "multimodal_features",
    "ingest_stats",
    "span_dedup",
    "profile_index_fed",
    "pack_sequences",
    "ann_hnsw_topk",
    "lcs_pairs",
    "chunk_docs",
    "ann_hnsw_after_repair",
    "lm_perplexity",
    "lm_buckets",
    "line_dedup",
    "bpe_pair_counts",
    "audio_features",
    "video_frames",
    "asof_join",
    "events_sessionize",
    "global_line_dedup",
    "semdedup",
    "pq_adc_topk",
    "rrf_fuse",
    "url_dedup",
    "interval_join",
    "host_cap",
    "opq_adc_topk",
    "dsir_weights",
    "kn_perplexity",
    "term_df_top100",
    "corpus_overview",
    "filter_expr",
    "index_bm25_topk",
    "index_bm25_topk_after_delete",
    "tfidf_topk",
    "clip_text_topk",
    "hybrid_search_indexed",
    "filter_search_indexed",
    # --- witness-backed twins (r3-green, lowest rotation priority) -----
    "search_by_text",
    "bm25_topk",
    "hybrid_search",
    "wildcard_topk_indexed",
    "suggest_topk",
]

# Twin-tail witness map (the codified exception, machine-checkable):
# an entry may sit past position 50 while never driver-verified ONLY if
# its witness chain reaches an entry that is driver-green or <= 50.
# Each value names the in-registry entry whose green row covers the
# key's oracle identity (result-identical twin or a pure composition of
# verified pieces); the Spark-vs-oracle identity of every key is still
# full-value-compared by tests/test_entry.py.
_TWIN_WITNESS: dict[str, str] = {
    "bm25_topk": "index_bm25_topk",          # shared _SQL_BM25_TOPK, rank-identical
    "search_by_text": "search_by_text_indexed",
    "hybrid_search": "hybrid_search_indexed",
    "filter_metadata_map": "filter_expr",    # F2/F3 subsumes the equality semantics
    "tfidf_topk_indexed": "tfidf_topk",      # shared _SQL_TFIDF_TOPK
    "passage_topk": "chunk_docs",            # chunk_documents ∘ score_queries
    "lcs_strip": "lcs_pairs",                # measured pairs ∘ strip_char_ranges
    "session_windows": "events_sessionize",  # identical 6h-gap cuts (test_sessions)
    "pq_ivf_topk": "pq_adc_topk",            # encode/ADC math + ann_ivf probe rule
    "pq_mirror_topk": "pq_ivf_topk",         # same centroids/codebooks/probe rule
    "dsir_select": "dsir_weights",           # Gumbel top-k over verified log_w
    "corpus_divergence": "dsir_weights",     # closed-form over the same buckets
    "ann_hnsw_persisted": "ann_hnsw_topk",   # build determinism (test_hnsw)
    "ann_lsh_persisted": "ann_lsh_topk",
    "ann_ivf_persisted": "ann_ivf_topk",
    "dedup_prefix": "dedup_minhash",         # shared exact-Jaccard oracle (0.9)
    "dedup_ngram_jaccard": "dedup_minhash",  # same oracle family at 0.8
    "wildcard_topk_indexed": "wildcard_topk",  # shared oracle, rank-identical
    "suggest_topk": "wildcard_topk",  # expand_patterns ∘ posexplode rank glue
}

# Saturation overflow (the second codified exception): a sole-evidence
# entry may sit past position 50 ONLY while every one of positions
# 1..50 is itself never-driver-verified sole evidence (rotation could
# not free a slot without burying other sole evidence). The exemption
# is machine-checked in tests/test_entry.py — the moment any top-50
# slot turns driver-green, these entries must rotate in.
_SATURATION_OVERFLOW: set[str] = {
    "jm_topk",
    "bq_topk",
    "dismax_topk",
    "filters_agg",
    "mmr_topk",
    "multi_match_topk",
    "matrix_stats_agg",
    "rare_terms",
    "weighted_avg",
    "bucket_sort_days",
    "span_first",
    "sampler_terms",
    "cascade_topk",
    "rank_feature_topk",
    "distance_feature_topk",
    "terms_set_topk",
    "percentile_ranks",
    "missing_agg",
    "ann_recall_eval",
    "match_phrase_prefix",
    "ltr_topk",
    "stream_vector_topk",
    "boxplot_agg",
    "mad_agg",
    "string_stats_agg",
    "top_metrics_agg",
    "serial_diff_agg",
    "normalize_agg",
    "cumulative_cardinality",
    "bucket_script_agg",
    "phrase_suggest",
    "boosting_topk",
    "auto_date_histogram",
    "t_test_agg",
    "rate_agg",
    "moving_fn_agg",
    "function_score",
    "intervals_topk",
    "query_string",
    "pinned_topk",
    "vector_range",
    "geo_distance_topk",
    "geotile_grid",
    "geohash_grid",
    "geo_rings",
    "geo_bounds",
    "multi_terms",
    "diversified_sampler",
    "date_range_agg",
    "change_point",
    "frequent_pairs",
    "temperature_select",
    "unimax_select",
    "index_federated_topk",
    "rq_adc_topk",
    "has_child_topk",
    "has_parent_topk",
    "maxsim_topk",
    "geo_distance_feature",
}

assert len(_ORDER) == len(set(_ORDER)), "duplicate names in _ORDER"
assert set(_ORDER) == set(_REGISTRY), (
    "_ORDER and _REGISTRY disagree: "
    f"missing={set(_REGISTRY) - set(_ORDER)} extra={set(_ORDER) - set(_REGISTRY)}"
)
assert set(_TWIN_WITNESS) <= set(_REGISTRY)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: BM25 top-k over the
    reference query set (SURVEY §3.1 re-expressed)."""
    return _q_bm25_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _REGISTRY[name][0] for name in _ORDER}


def oracle_sql() -> dict[str, str]:
    return {
        name: _REGISTRY[name][1]
        for name in _ORDER
        if _REGISTRY[name][1] is not None
    }
