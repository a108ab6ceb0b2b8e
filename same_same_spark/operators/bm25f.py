"""BM25F — cross-field ranking with per-field weights and length norms.

A beyond-reference fulltext feature: the reference scores one text blob
(``internal/storage/search/search.go:16-42``); real engines rank over
several fields at once (title^3 + body), and simply concatenating the
fields loses both the per-field boost and the per-field length
normalization. BM25F (Robertson, Zaragoza & Taylor, CIKM 2004 — the
"simple BM25F" variant every production engine ships) fixes that by
normalizing tf inside each field, mixing the fields with weights, and
saturating ONCE:

- per field f with weight ``w_f`` and norm ``b_f``::

      tfn_f(t, d) = w_f * tf_f(t, d) / (1 - b_f + b_f * dl_f(d) / avgdl_f)

  where ``dl_f`` is the field's X1 token count and ``avgdl_f`` averages
  over ALL docs (missing/empty field counts as 0). A field whose
  ``avgdl_f`` is 0 (empty everywhere) contributes nothing.
- the document-level pseudo-frequency is ``tfn(t, d) = Σ_f tfn_f``;
- ``df(t)`` counts docs where t appears in ANY field; ``idf`` is the
  engine's pinned BM25 idf over ``n_docs`` = total docs;
- ``score(q, d) = Σ_{t ∈ q} idf(t) * tfn * (k1 + 1) / (k1 + tfn)``
  (the saturation mirrors the engine's single-field weight with b
  already absorbed into tfn); top-k under the pinned
  ``(round(score, 9) DESC, doc_id ASC)`` order.

With one field at ``(w=1, b=0.75)`` this reduces EXACTLY to the
engine's single-field BM25 (pinned in tests/test_relevance_extras.py).

Scale shape: per field, one tokenize+explode immediately semi-joined
against the tiny broadcast query-term set (non-query terms never reach
a shuffle), then a map-side-combined groupBy(doc, term). Field branches
union and fold with ONE groupBy(doc, term) — fields multiply mapper
work, not shuffle rounds. df derives from the folded match set (every
doc containing a query term is present, so counts are true global df),
rides back on a broadcast join, and ranking goes through the bounded
tournament ``topk_per_query`` — no windows, no per-query skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from same_same_spark.bm25 import K1_DEFAULT, idf_col, query_terms_df
from same_same_spark.operators.topk import topk_per_query
from same_same_spark.text.tokenizer import duckdb_tokens_sql, tokenize_py


def bm25f_search(
    docs_df: DataFrame,
    queries: list[tuple[int, str]],
    fields: dict[str, tuple[float, float]],
    k: int = 10,
    id_col: str = "doc_id",
    k1: float = K1_DEFAULT,
) -> DataFrame:
    """BM25F top-k over ``fields`` = {column: (weight, b)}.

    Returns (query_id INT, doc_id, score DOUBLE, rank INT).
    """
    if not fields:
        raise ValueError("bm25f_search needs at least one field")
    for f_name, (w, b) in fields.items():
        if w < 0:
            raise ValueError(f"negative weight for field {f_name!r}")
        if not (0.0 <= b <= 1.0):
            raise ValueError(f"field {f_name!r} b={b} outside [0, 1]")

    spark = docs_df.sparkSession
    from same_same_spark.stats import tokenized

    qterms = query_terms_df(spark, queries)
    qterm_set = F.broadcast(qterms.select("term").distinct())

    n_docs = docs_df.count()
    if n_docs == 0:
        return spark.createDataFrame(
            [], "query_id INT, doc_id LONG, score DOUBLE, rank INT"
        )

    # One pass per field: dl + avgdl from the tokenized projection,
    # then matched (doc, term, tf) folded into the field's tfn.
    branches: list[DataFrame] = []
    for f_name, (weight, b) in fields.items():
        tok = tokenized(docs_df, id_col=id_col, text_col=f_name)
        # avgdl over ALL docs; a NULL/empty field tokenizes to [] → dl 0.
        avgdl = (
            tok.select(F.avg(F.size("tokens")).alias("a")).first()["a"]
            or 0.0
        )
        if avgdl == 0.0 or weight == 0.0:
            continue
        exploded = tok.select(
            "doc_id",
            F.size("tokens").alias("dl"),
            F.explode("tokens").alias("term"),
        ).join(qterm_set, "term", "inner")
        per_field = exploded.groupBy("doc_id", "term").agg(
            F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl")
        )
        branches.append(
            per_field.select(
                "doc_id",
                "term",
                (
                    F.lit(float(weight))
                    * F.col("tf")
                    / (
                        F.lit(1.0 - b)
                        + F.lit(b) * F.col("dl") / F.lit(float(avgdl))
                    )
                ).alias("tfn"),
            )
        )

    if not branches:
        return spark.createDataFrame(
            [], "query_id INT, doc_id LONG, score DOUBLE, rank INT"
        )

    folded = branches[0]
    for br in branches[1:]:
        folded = folded.unionByName(br)
    folded = folded.groupBy("doc_id", "term").agg(
        F.sum("tfn").alias("tfn")
    )

    dfs = folded.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        folded.join(F.broadcast(dfs), "term")
        .withColumn("idf", idf_col(F.col("df"), float(n_docs)))
        .withColumn(
            "w",
            F.col("idf")
            * F.col("tfn")
            * F.lit(k1 + 1.0)
            / (F.lit(float(k1)) + F.col("tfn")),
        )
        .join(F.broadcast(qterms), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.sum("w").alias("score"))
    )
    return topk_per_query(scored, k)


def duckdb_bm25f_sql(
    table: str,
    id_col: str,
    queries: list[tuple[int, str]],
    fields: dict[str, tuple[float, float]],
    k: int = 10,
    k1: float = K1_DEFAULT,
    prelude_ctes: str = "",
) -> str:
    """DuckDB twin of :func:`bm25f_search` (same pinned math,
    independently re-derived: per-field CTEs instead of a union fold).
    ``prelude_ctes`` (e.g. ``"docs_f AS (...), "``) lets callers feed a
    derived-fields table. Callers compare ``round(score, 6)``."""
    qrows = []
    for qid, text in queries:
        for term in sorted(set(tokenize_py(text))):
            qrows.append(f"({qid}, '{term}')")
    qvalues = ", ".join(qrows) if qrows else "(NULL, NULL) LIMIT 0"

    field_ctes = []
    tfn_selects = []
    for i, (f_name, (weight, b)) in enumerate(sorted(fields.items())):
        field_ctes.append(
            f"""toks{i} AS (
  SELECT {id_col} AS doc_id,
         {duckdb_tokens_sql(f"coalesce({f_name}, '')")} AS tokens
  FROM {table}
),
stat{i} AS (
  SELECT avg(len(tokens)) AS avgdl FROM toks{i}
),
tf{i} AS (
  SELECT t.doc_id, u.term, count(*) AS tf, any_value(len(t.tokens)) AS dl
  FROM toks{i} t, unnest(t.tokens) AS u(term)
  WHERE u.term IN (SELECT term FROM qt)
  GROUP BY t.doc_id, u.term
)"""
        )
        tfn_selects.append(
            f"""SELECT doc_id, term,
       {weight} * tf / (1.0 - {b} + {b} * dl / (SELECT avgdl FROM stat{i}))
         AS tfn
FROM tf{i}
WHERE (SELECT avgdl FROM stat{i}) > 0 AND {weight} > 0"""
        )

    ctes = ",\n".join(field_ctes)
    tfn_union = "\nUNION ALL\n".join(tfn_selects)
    return f"""
WITH {prelude_ctes}qt AS (
  SELECT * FROM (VALUES {qvalues}) AS v(query_id, term)
),
{ctes},
corpus AS (
  SELECT count(*) AS n FROM {table}
),
folded AS (
  SELECT doc_id, term, sum(tfn) AS tfn
  FROM ({tfn_union})
  GROUP BY doc_id, term
),
dfs AS (
  SELECT term, count(*) AS df FROM folded GROUP BY term
),
weights AS (
  SELECT f.doc_id, f.term,
         ln(1.0 + ((SELECT n FROM corpus) - d.df + 0.5) / (d.df + 0.5))
           * f.tfn * ({k1} + 1.0) / ({k1} + f.tfn) AS w
  FROM folded f JOIN dfs d ON f.term = d.term
),
scored AS (
  SELECT q.query_id, w.doc_id, sum(w.w) AS score
  FROM weights w JOIN qt q ON w.term = q.term
  GROUP BY q.query_id, w.doc_id
),
ranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (
           PARTITION BY query_id
           ORDER BY round(score, 9) DESC, doc_id ASC
         ) AS rank
  FROM scored
)
SELECT query_id, doc_id, round(score, 6) AS score, rank::INTEGER AS rank
FROM ranked WHERE rank <= {k}
"""
