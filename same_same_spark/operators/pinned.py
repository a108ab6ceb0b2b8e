"""Pinned query — curated results promoted above organic relevance
(Elasticsearch's ``pinned`` query).

A beyond-reference fulltext feature: search teams pin editorial picks
("ids": [...]) over the organic ranking. Pinned semantics
(cross-engine, re-derived in :func:`duckdb_pinned_sql`):

- per query, the pinned ids rank 1..p IN THE ORDER GIVEN, provided
  the doc EXISTS in the corpus (missing ids are skipped, later pins
  move up — ES behavior); a pinned doc appears whether or not it
  matches the organic query, with score NULL (its position is
  editorial, not a relevance measurement — ES fakes a huge constant
  score instead; NULL is the honest pin);
- duplicate pinned ids keep their FIRST position; ids pinned by the
  query never reappear in the organic tail;
- organic results are the engine's pinned BM25 top-k over the match
  set minus the pinned ids, ranks continuing at p+1, truncated so
  pinned + organic <= k.

Scale shape: the pinned list is a tiny driver-built frame — existence
check and the organic anti-join are broadcast hash joins; the
per-query pin count (<= p rows) broadcasts onto the organic ranks for
the shift. Everything else is the one scored-matches plan + bounded
tournament.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from same_same_spark.bm25 import B_DEFAULT, K1_DEFAULT, scored_matches
from same_same_spark.operators.topk import topk_per_query

__all__ = ["pinned_search", "duckdb_pinned_sql"]


def pinned_search(
    docs_df: DataFrame,
    queries: list[tuple[int, str, list]],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "content",
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
) -> DataFrame:
    """Top-k pinned query for (query_id, organic_text, pinned_ids)
    rows (see module docstring). Returns (query_id INT, doc_id,
    score DOUBLE — NULL on pinned rows, rank INT)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    spark = docs_df.sparkSession
    id_type = dict(docs_df.dtypes)[id_col]
    prows = []
    for qid, _, ids in queries:
        seen = set()
        for pos, i in enumerate(ids):
            if i in seen:
                continue  # first position wins
            seen.add(i)
            prows.append((qid, i, pos))
    pinned = spark.createDataFrame(
        prows, f"query_id INT, doc_id {id_type}, pos INT"
    )
    # existence check streams the CORPUS against the broadcast pin
    # list (never the reverse — the corpus id set is not broadcastable)
    existing = (
        docs_df.select(F.col(id_col).alias("doc_id"))
        .distinct()
        .join(F.broadcast(pinned), "doc_id")
        .select("query_id", "doc_id", "pos")
        if prows
        else pinned
    )
    # re-rank surviving pins densely per query (missing ids close up)
    pranked = (
        existing.groupBy("query_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "doc_id"))
            ).alias("ps")
        )
        .select("query_id", F.posexplode("ps").alias("i", "s"))
        .select(
            "query_id",
            F.col("s.doc_id").alias("doc_id"),
            F.lit(None).cast("double").alias("score"),
            (F.col("i") + 1).cast("int").alias("rank"),
        )
        .filter(F.col("rank") <= k)
    )
    counts = pranked.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_pinned")
    )
    organic = scored_matches(
        docs_df,
        [(qid, text) for qid, text, _ in queries],
        id_col=id_col,
        text_col=text_col,
        k1=k1,
        b=b,
    ).join(
        F.broadcast(existing.select("query_id", "doc_id")),
        ["query_id", "doc_id"],
        "left_anti",
    )
    otop = (
        topk_per_query(organic, k)
        .join(F.broadcast(counts), "query_id", "left")
        .select(
            "query_id",
            "doc_id",
            "score",
            (
                F.col("rank") + F.coalesce(F.col("n_pinned"), F.lit(0))
            ).cast("int").alias("rank"),
        )
        .filter(F.col("rank") <= k)
    )
    return pranked.unionByName(otop)


def duckdb_pinned_sql(
    table: str,
    id_col: str,
    text_col: str,
    queries: list[tuple[int, str, list]],
    k: int = 10,
    round_score: int = 6,
) -> str:
    """DuckDB twin of :func:`pinned_search` (string pinned ids must be
    SQL-literal-safe)."""
    from same_same_spark.bm25 import duckdb_scored_sql

    def lit(v):
        return f"'{v}'" if isinstance(v, str) else str(int(v))

    prows = []
    for qid, _, ids in queries:
        seen = set()
        for pos, i in enumerate(ids):
            if i in seen:
                continue
            seen.add(i)
            prows.append(f"({int(qid)}, {lit(i)}, {pos})")
    pvalues = ", ".join(prows) if prows else "(NULL, NULL, NULL) LIMIT 0"
    inner = duckdb_scored_sql(
        table, id_col, text_col, [(qid, t) for qid, t, _ in queries]
    )
    return f"""
WITH organic AS ({inner}),
pins AS (SELECT * FROM (VALUES {pvalues}) AS v(query_id, doc_id, pos)),
existing AS (
  SELECT p.* FROM pins p
  WHERE p.doc_id IN (SELECT {id_col} FROM {table})
),
pranked AS (
  SELECT query_id, doc_id, CAST(NULL AS DOUBLE) AS score,
         row_number() OVER (
           PARTITION BY query_id ORDER BY pos ASC
         ) AS rank
  FROM existing
),
counts AS (
  SELECT query_id, count(*) AS n_pinned FROM pranked GROUP BY 1
),
otop AS (
  SELECT o.query_id, o.doc_id, o.score,
         row_number() OVER (
           PARTITION BY o.query_id
           ORDER BY round(o.score, 9) DESC, o.doc_id ASC
         ) + coalesce(c.n_pinned, 0) AS rank
  FROM organic o
  LEFT JOIN counts c ON o.query_id = c.query_id
  WHERE NOT EXISTS (
    SELECT 1 FROM existing e
    WHERE e.query_id = o.query_id AND e.doc_id = o.doc_id
  )
)
SELECT query_id, doc_id, round(score, {round_score}) AS score,
       rank::INTEGER AS rank
FROM (
  SELECT * FROM pranked WHERE rank <= {int(k)}
  UNION ALL
  SELECT * FROM otop WHERE rank <= {int(k)}
)
"""
