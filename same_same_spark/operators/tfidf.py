"""X4 — the reference's TF-IDF embedder + cosine search, re-expressed
sparse (``internal/embedders/quotes/local/tfidf/tfidf.go:85-235``,
``internal/storage/search/search.go:16-42``).

The reference materialises a dense ``float64[vocab]`` vector per
document and linearly scans cosine(query, doc) over every stored vector.
Dense vectors at 100 TB are pure waste — almost every slot is zero — so
this module keeps the *identical math* in sparse form:

- vocabulary: terms with ``df >= min_df`` and ``df/N <= max_df_ratio``,
  ranked ``(df DESC, term ASC)`` (the pinned form of the reference's
  unstable df-descending sort, tfidf.go:112-120), truncated to
  ``max_features``;
- ``idf = ln(N/df) + 1`` (tfidf.go:127-132);
- per-doc weights: ``tf/maxtf * idf`` over vocab terms only, where
  ``maxtf`` is the max term count over *all* tokens of the doc
  (tfidf.go:190-205 — normalisation happens before vocab filtering);
- L2-normalise; a doc (or query) with **no vocab-matched terms** becomes
  the uniform ``1/sqrt(V)`` vector (tfidf.go:227-233);
- score = cosine = dot of the two unit vectors
  (``models/vector.go:37-54``); with sparse unit vectors this is
  ``sum over shared terms`` plus closed-form corrections for the uniform
  fallback:

  * uniform doc  × sparse query → ``sum(q_hat) / sqrt(V)``,
  * sparse doc   × uniform query → ``sum(d_hat) / sqrt(V)``,
  * uniform doc  × uniform query → ``1.0``.

Frozen-corpus note: the reference's ``Embed`` *mutates* the corpus
(every query is appended and the vocabulary rebuilt every 50 calls,
tfidf.go:175-183). As with BM25 (SURVEY §3.1) we freeze statistics at
corpus-build time; queries never shift scores.

Plan shape (scale notes): one explode+groupBy over the corpus, two
windows partitioned by ``doc_id`` (key cardinality = N, no skew), a
broadcast join against the ≤``max_features`` vocabulary, a broadcast
join against the tiny query-weight set, and a per-query top-k. Like the
naive BM25 scorer this is the exact/differential path — the reference
itself is an O(n) scan per query (USAGE.md:49).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from same_same_spark.stats import prune_vocabulary, term_doc_freqs, tokenized
from same_same_spark.text.tokenizer import tokenize_py

MIN_DF_DEFAULT = 1          # tfidf.go:31
MAX_DF_RATIO_DEFAULT = 0.95  # tfidf.go:32
MAX_FEATURES_DEFAULT = 5000  # tfidf.go:33


def idf_plus_one_col(df_count, n_docs: int):
    """``ln(N/df) + 1`` (tfidf.go:127-132) — always >= 1 for df <= N."""
    return F.log(F.lit(float(n_docs)) / df_count) + F.lit(1.0)


def build_vocab(
    tok_df: DataFrame,
    n_docs: int,
    min_df: int = MIN_DF_DEFAULT,
    max_df_ratio: float = MAX_DF_RATIO_DEFAULT,
    max_features: int | None = MAX_FEATURES_DEFAULT,
) -> DataFrame:
    """(term, df, idf) — pruned vocabulary with reference idf."""
    vocab = prune_vocabulary(
        term_doc_freqs(tok_df), n_docs,
        min_df=min_df, max_df_ratio=max_df_ratio, max_features=max_features,
    )
    return vocab.withColumn("idf", idf_plus_one_col(F.col("df"), n_docs))


def doc_unit_weights(tok_df: DataFrame, vocab: DataFrame) -> DataFrame:
    """(doc_id, term, d_hat) — L2-normalised sparse doc vectors.

    Docs with zero vocab-matched terms produce no rows here; they are the
    uniform-fallback population (tfidf.go:227-233) and are handled
    closed-form by :func:`tfidf_topk`.
    """
    postings = (
        tok_df.select("doc_id", F.explode("tokens").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    by_doc = Window.partitionBy("doc_id")
    # maxtf over ALL tokens of the doc (pre-vocab), tfidf.go:196-205.
    postings = postings.withColumn("maxtf", F.max("tf").over(by_doc))
    w = (
        postings.join(F.broadcast(vocab.select("term", "idf")), "term")
        .withColumn("w", F.col("tf") / F.col("maxtf") * F.col("idf"))
    )
    w = w.withColumn(
        "norm", F.sqrt(F.sum(F.col("w") * F.col("w")).over(by_doc))
    )
    return w.select(
        "doc_id", "term", (F.col("w") / F.col("norm")).alias("d_hat")
    )


def query_unit_weights(
    text: str, vocab_idf: dict[str, float]
) -> dict[str, float]:
    """Driver-side query embedding under a collected (term -> idf) map
    restricted to the query's own terms (bounded by query length).

    Returns {} when no vocab term matches — the uniform-fallback query.
    """
    counts: dict[str, int] = {}
    for t in tokenize_py(text):
        counts[t] = counts.get(t, 0) + 1
    if not counts:
        return {}
    maxtf = max(counts.values())
    w = {
        t: (c / maxtf) * vocab_idf[t]
        for t, c in counts.items()
        if t in vocab_idf
    }
    norm = math.sqrt(sum(v * v for v in w.values()))
    if norm == 0.0:
        return {}
    return {t: v / norm for t, v in sorted(w.items())}


def tfidf_topk(
    docs_df: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "content",
    min_df: int = MIN_DF_DEFAULT,
    max_df_ratio: float = MAX_DF_RATIO_DEFAULT,
    max_features: int | None = MAX_FEATURES_DEFAULT,
) -> DataFrame:
    """Reference quote search: TF-IDF embed + cosine, exact top-k.

    Returns (query_id INT, doc_id, score DOUBLE, rank INT), rank 1..k per
    query under the pinned ``(round(score, 9) DESC, doc_id ASC)`` order.
    Every document receives a score (the reference scores its whole
    store, search.go:16-42); uniform-fallback docs/queries use the
    closed-form dot products derived in the module docstring.

    Executes EAGERLY (the k x Q result is bounded and returned as a
    literal DataFrame) so the per-call persisted token/weight tables can
    be released deterministically before returning.
    """
    spark = docs_df.sparkSession
    empty = spark.createDataFrame(
        [], "query_id INT, doc_id LONG, score DOUBLE, rank INT"
    )
    if not queries:
        return empty
    # The algorithm is genuinely multi-pass over the token table (count,
    # vocab, weights, sums, grid) and Spark recomputes common subtrees —
    # persist tok/docw for the call, materialise the bounded k x Q
    # result eagerly, and release both before returning.
    tok = tokenized(docs_df, id_col=id_col, text_col=text_col).persist()
    try:
        n_docs = tok.count()
        if n_docs == 0:
            return empty
        # The vocabulary is <= max_features rows by construction —
        # collect it once and re-broadcast as a literal relation.
        vocab_rows = build_vocab(
            tok, n_docs, min_df=min_df, max_df_ratio=max_df_ratio,
            max_features=max_features,
        ).collect()
        v_size = len(vocab_rows)
        all_docs = docs_df.select(F.col(id_col).alias("doc_id"))
        if v_size == 0:
            # Degenerate corpus (every term pruned): the reference
            # embeds everything as a ZERO-LENGTH vector, whose cosine
            # is 0 against anything (vector.go:49-51) — all docs tie
            # at 0 under doc_id.
            from same_same_spark.operators.topk import topk_per_query

            qids = spark.createDataFrame(
                [(qid,) for qid, _ in queries], "query_id INT"
            )
            return _eager(
                spark,
                topk_per_query(
                    all_docs.crossJoin(F.broadcast(qids)).withColumn(
                        "score", F.lit(0.0)
                    ),
                    k,
                ),
            )
        vocab = spark.createDataFrame(vocab_rows)
        docw = doc_unit_weights(tok, vocab).persist()

        # Driver-side query embedding over the collected vocab idf.
        vocab_idf = {r["term"]: float(r["idf"]) for r in vocab_rows}
        sqrt_v = math.sqrt(float(v_size))

        # Per-doc unit-weight sums power both fallback directions.
        doc_sums = docw.groupBy("doc_id").agg(F.sum("d_hat").alias("d_sum"))
        fallback_docs = all_docs.join(doc_sums, "doc_id", "left_anti")
        return _score_and_rank(
            spark, queries, vocab_idf, sqrt_v, docw, doc_sums,
            fallback_docs, k,
        )
    finally:
        tok.unpersist()


def _eager(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Materialise a bounded result into a literal DataFrame so cached
    inputs can be released before returning."""
    return spark.createDataFrame(df.collect(), schema=df.schema)


def _score_and_rank(
    spark: SparkSession,
    queries: list[tuple[int, str]],
    vocab_idf: dict[str, float],
    sqrt_v: float,
    docw: DataFrame,
    doc_sums: DataFrame,
    fallback_docs: DataFrame,
    k: int,
) -> DataFrame:

    qw_rows, qconst_rows, uniform_qids = [], [], []
    for qid, text in queries:
        qhat = query_unit_weights(text, vocab_idf)
        if not qhat:
            uniform_qids.append(qid)
        else:
            qw_rows.extend((qid, t, w) for t, w in qhat.items())
            qconst_rows.append((qid, sum(qhat.values()) / sqrt_v))

    parts: list[DataFrame] = []
    if qw_rows:
        qw = spark.createDataFrame(
            qw_rows, "query_id INT, term STRING, q_hat DOUBLE"
        )
        matched = (
            docw.join(F.broadcast(qw), "term")
            .groupBy("query_id", "doc_id")
            .agg(F.sum(F.col("q_hat") * F.col("d_hat")).alias("score"))
        )
        # The reference scores its ENTIRE store (search.go:16-42): sparse
        # docs sharing no term with the query still appear, at cosine 0.
        # Fill the (query x sparse-doc) grid — Q is tiny, so this is the
        # same O(N) per query the reference pays.
        qids = spark.createDataFrame(
            [(qid,) for qid, _ in qconst_rows], "query_id INT"
        )
        parts.append(
            doc_sums.select("doc_id")
            .crossJoin(F.broadcast(qids))
            .join(matched, ["query_id", "doc_id"], "left")
            .select(
                "query_id",
                "doc_id",
                F.coalesce(F.col("score"), F.lit(0.0)).alias("score"),
            )
        )
        qconst = spark.createDataFrame(
            qconst_rows, "query_id INT, fscore DOUBLE"
        )
        parts.append(
            fallback_docs.crossJoin(F.broadcast(qconst)).select(
                "query_id", "doc_id", F.col("fscore").alias("score")
            )
        )
    for qid in uniform_qids:
        parts.append(
            doc_sums.select(
                F.lit(qid).alias("query_id"),
                "doc_id",
                (F.col("d_sum") / F.lit(sqrt_v)).alias("score"),
            )
        )
        parts.append(
            fallback_docs.select(
                F.lit(qid).alias("query_id"),
                "doc_id",
                F.lit(1.0).alias("score"),
            )
        )

    from same_same_spark.operators.topk import topk_per_query

    scored = parts[0]
    for p in parts[1:]:
        scored = scored.unionByName(p)
    try:
        return _eager(spark, topk_per_query(scored, k))
    finally:
        docw.unpersist()


def duckdb_tfidf_sql(
    table: str,
    id_col: str,
    text_col: str,
    queries: list[tuple[int, str]],
    k: int = 10,
    min_df: int = MIN_DF_DEFAULT,
    max_df_ratio: float = MAX_DF_RATIO_DEFAULT,
    max_features: int | None = MAX_FEATURES_DEFAULT,
    round_score: int | None = 6,
) -> str:
    """DuckDB SQL computing the same result as :func:`tfidf_topk`
    (modulo float rounding — callers compare ``round(score, 6)``).

    Query term counts are pre-tokenised in Python (exact integers); all
    idf/normalisation math happens inside DuckDB so both engines derive
    weights from their own (identical) corpus statistics.
    """
    from same_same_spark.text.tokenizer import duckdb_tokens_sql

    qrows = []
    for qid, text in queries:
        counts: dict[str, int] = {}
        for t in tokenize_py(text):
            counts[t] = counts.get(t, 0) + 1
        if counts:
            for t, c in sorted(counts.items()):
                qrows.append(f"({qid}, '{t}', {c})")
        else:
            qrows.append(f"({qid}, NULL, 0)")  # uniform-fallback query
    qvalues = ", ".join(qrows) if qrows else "(NULL, NULL, 0) LIMIT 0"
    max_feat = "NULL" if max_features is None else str(max_features)
    sel_score = (
        f"round(score, {round_score}) AS score" if round_score is not None
        else "score"
    )
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id,
         {duckdb_tokens_sql(text_col)} AS tokens
  FROM {table}
),
corpus AS ( SELECT count(*) AS n FROM toks ),
dfs AS (
  SELECT term, count(*) AS df FROM (
    SELECT doc_id, unnest(list_distinct(tokens)) AS term FROM toks
  ) GROUP BY term
),
vocab AS (
  SELECT d.term, d.df, ln(c.n::DOUBLE / d.df) + 1.0 AS idf
  FROM dfs d, corpus c
  WHERE d.df >= {min_df} AND d.df::DOUBLE / c.n <= {max_df_ratio}
  ORDER BY d.df DESC, d.term ASC
  LIMIT coalesce({max_feat}, (SELECT count(*) FROM dfs))
),
vsize AS ( SELECT count(*)::DOUBLE AS v, sqrt(count(*)::DOUBLE) AS sv
           FROM vocab ),
tfc AS (
  SELECT doc_id, term, count(*) AS tf
  FROM ( SELECT doc_id, unnest(tokens) AS term FROM toks )
  GROUP BY doc_id, term
),
maxtf AS ( SELECT doc_id, max(tf)::DOUBLE AS maxtf FROM tfc GROUP BY doc_id ),
docw_raw AS (
  SELECT t.doc_id, t.term, (t.tf / m.maxtf) * v.idf AS w
  FROM tfc t
  JOIN maxtf m ON t.doc_id = m.doc_id
  JOIN vocab v ON t.term = v.term
),
docnorm AS (
  SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM docw_raw GROUP BY doc_id
),
docw AS (
  SELECT r.doc_id, r.term, r.w / n.nrm AS d_hat
  FROM docw_raw r JOIN docnorm n ON r.doc_id = n.doc_id
),
doc_sums AS ( SELECT doc_id, sum(d_hat) AS d_sum FROM docw GROUP BY doc_id ),
fallback_docs AS (
  SELECT doc_id FROM toks
  EXCEPT SELECT doc_id FROM doc_sums
),
qt AS ( SELECT * FROM (VALUES {qvalues}) AS v(query_id, term, tf) ),
qw_raw AS (
  SELECT q.query_id, q.term,
         (q.tf::DOUBLE / max(q.tf) OVER (PARTITION BY q.query_id)) * v.idf
           AS w
  FROM qt q JOIN vocab v ON q.term = v.term
),
qnorm AS (
  SELECT query_id, sqrt(sum(w * w)) AS nrm FROM qw_raw GROUP BY query_id
),
qw AS (
  SELECT r.query_id, r.term, r.w / n.nrm AS q_hat
  FROM qw_raw r JOIN qnorm n ON r.query_id = n.query_id
),
q_sums AS ( SELECT query_id, sum(q_hat) AS q_sum FROM qw GROUP BY query_id ),
uniform_q AS (
  SELECT query_id FROM qt
  EXCEPT SELECT query_id FROM q_sums
),
matched AS (
  SELECT q.query_id, d.doc_id, sum(q.q_hat * d.d_hat) AS score
  FROM qw q JOIN docw d ON q.term = d.term
  GROUP BY q.query_id, d.doc_id
),
scored AS (
  -- sparse query x sparse doc (zero-overlap pairs score 0 — the
  -- reference scores its entire store, search.go:16-42)
  SELECT g.query_id, g.doc_id, coalesce(m.score, 0.0) AS score
  FROM (SELECT s.query_id, d.doc_id
        FROM q_sums s CROSS JOIN doc_sums d) g
  LEFT JOIN matched m
    ON g.query_id = m.query_id AND g.doc_id = m.doc_id
  UNION ALL
  -- sparse query x uniform doc
  SELECT s.query_id, f.doc_id, s.q_sum / vz.sv AS score
  FROM q_sums s CROSS JOIN fallback_docs f CROSS JOIN vsize vz
  UNION ALL
  -- uniform query x sparse doc
  SELECT u.query_id, d.doc_id, d.d_sum / vz.sv AS score
  FROM uniform_q u CROSS JOIN doc_sums d CROSS JOIN vsize vz
  UNION ALL
  -- uniform query x uniform doc (cosine 1 — unless the vocabulary is
  -- empty, where embeddings are zero-length and cosine is 0)
  SELECT u.query_id, f.doc_id,
         CASE WHEN vz.v = 0 THEN 0.0 ELSE 1.0 END AS score
  FROM uniform_q u CROSS JOIN fallback_docs f CROSS JOIN vsize vz
),
ranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (
           PARTITION BY query_id
           ORDER BY round(score, 9) DESC, doc_id ASC
         ) AS rank
  FROM scored
)
SELECT query_id, doc_id, {sel_score}, rank
FROM ranked WHERE rank <= {k}
"""
