"""A7 — hybrid scoring + the AdvancedSearch flow (filter → score → blend
→ top-k), re-expressed over BM25.

Reference: ``internal/storage/memory/advanced_search.go:25-71`` and
weight validation at ``internal/models/filter.go:40-48``.

Reference quirk preserved: the scan *filters out* docs that fail the
FilterExpr before scoring, and ``calculateMetadataScore`` then returns
1.0 for every survivor (advanced_search.go:80-91) — so with filters the
blend is effectively ``wv·text + wm``. We compute the metadata score as
an expression (``when(filter, 1.0).otherwise(0.0)``) which reproduces
exactly that once the pre-filter has run.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from same_same_spark.bm25 import score_queries
from same_same_spark.operators.filters import compile_filters


@dataclass(frozen=True)
class HybridWeight:
    vector: float = 1.0
    metadata: float = 0.0

    def validate(self) -> "HybridWeight":
        # filter.go:40-48
        if not (0.0 <= self.vector <= 1.0 and 0.0 <= self.metadata <= 1.0):
            raise ValueError("hybrid weights must be between 0 and 1")
        if self.vector + self.metadata != 1.0:
            raise ValueError("hybrid weights must sum to 1.0")
        return self


def metadata_score_col(
    filters: dict | None, metadata_col: str | None, df: DataFrame | None = None
) -> Column:
    """1.0 if all filters match else 0.0 (advanced_search.go:80-91)."""
    return F.when(
        compile_filters(filters, metadata_col=metadata_col, df=df), F.lit(1.0)
    ).otherwise(F.lit(0.0))


def advanced_search(
    docs_df: DataFrame,
    query: str,
    k: int = 10,
    filters: dict | None = None,
    hybrid: HybridWeight | None = None,
    id_col: str = "doc_id",
    text_col: str = "content",
    metadata_col: str | None = None,
) -> DataFrame:
    """Filter → BM25 → optional hybrid blend → top-k.

    Returns (doc_id, score DOUBLE, rank INT). ``top_k<=0`` callers should
    pass the validated default (10 — models/filter.go:35-37).

    The pre-filter is a Catalyst predicate, so it pushes into the scan —
    and corpus statistics (N, avgdl, df) are computed over the *filtered*
    corpus, mirroring the reference where non-matching vectors never
    reach the scorer.
    """
    if not query:
        raise ValueError("query cannot be empty")  # filter.go:32-34
    if hybrid is not None:
        hybrid.validate()

    pred = compile_filters(filters, metadata_col=metadata_col, df=docs_df)
    survivors = docs_df.filter(pred)
    scored = score_queries(
        survivors, [(0, query)], k=k, id_col=id_col, text_col=text_col
    ).drop("query_id")

    if hybrid is not None and (hybrid.vector, hybrid.metadata) != (1.0, 0.0):
        # post-filter survivors all have metadata score 1.0
        scored = scored.withColumn(
            "score",
            F.lit(hybrid.vector) * F.col("score") + F.lit(hybrid.metadata),
        )
        scored = rank_topk(scored.drop("rank"), k)
    return scored.select(F.col("doc_id"), "score", "rank")


def rank_topk(scored: DataFrame, k: int, id_col: str = "doc_id") -> DataFrame:
    """Global top-k + rank under the pinned order, shuffle-light.

    ``orderBy().limit(k)`` compiles to ``TakeOrderedAndProject`` (each
    partition keeps a local k-heap, the driver merges k×partitions rows)
    — never the all-rows-to-one-task shape of an unpartitioned window.
    Rank is then assigned to the ≤k survivors by packing them into ONE
    sorted array (``collect_list``/``sort_array``/``posexplode`` over
    the sortable key ``(0.0 - round(score, 9), id)``) — bounded at k
    rows, all JVM built-ins, and no ``WindowExec`` at all: the old
    rank window executed with an empty partition spec (Catalyst folds a
    ``partitionBy(lit(0))`` away) and logged ``No Partition Defined``
    on every query.
    """
    from same_same_spark.operators.topk import neg_rounded_score

    order = [F.desc(F.round(F.col("score"), 9)), F.asc(id_col)]
    entry = F.struct(
        neg_rounded_score(F.col("score")).alias("nk"),
        F.col(id_col).alias("ik"),
        F.struct(*[F.col(c) for c in scored.columns]).alias("row"),
    )
    top = scored.orderBy(*order).limit(k).select(entry.alias("s"))
    return (
        top.agg(F.sort_array(F.collect_list("s")).alias("arr"))
        .select(F.posexplode("arr").alias("pos", "s"))
        .select("s.row.*", (F.col("pos") + 1).cast("int").alias("rank"))
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 10,
    rrf_k: int = 60,
    weights: list[float] | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of per-query
    rankings — the standard score-free way to combine retrieval
    systems (BM25 + TF-IDF, lexical + ANN, ...).

    Each input frame carries ``(query_id, id_col, rank)``; a document's
    fused score is ``sum_i weight_i / (rrf_k + rank_i)`` over the lists
    that ranked it (absent lists contribute nothing — no rank
    imputation). Output ``(query_id, id_col, score, rank)``, rank 1..k
    under the pinned ``(round(score, 9) DESC, id ASC)`` order.

    Scale: inputs are ALREADY bounded top-k lists (k·queries·lists
    rows), so the union + groupBy is a shuffle over kilobytes no
    matter the corpus size; ranking rides the bounded tournament.
    """
    if not rankings:
        raise ValueError("rankings must be non-empty")
    if weights is None:
        weights = [1.0] * len(rankings)
    if len(weights) != len(rankings):
        raise ValueError("one weight per ranking")
    u = None
    for r, w in zip(rankings, weights):
        part = r.select(
            "query_id",
            F.col(id_col),
            (F.lit(float(w)) / (F.lit(rrf_k) + F.col("rank")))
            .alias("contrib"),
        )
        u = part if u is None else u.unionByName(part)
    scored = u.groupBy("query_id", id_col).agg(
        F.sum("contrib").alias("score")
    )
    from same_same_spark.operators.topk import topk_per_query

    ranked = topk_per_query(
        scored.select(
            "query_id", F.col(id_col).alias("doc_id"), "score"
        ),
        k,
    )
    if id_col == "doc_id":
        return ranked
    return ranked.select(
        "query_id", F.col("doc_id").alias(id_col), "score", "rank"
    )
