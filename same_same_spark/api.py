"""``SameSameSpark`` — the engine's public façade, mirroring the
reference's ``Storage`` interface semantics
(``internal/storage/storage.go:9-18``: Store/Get/List/Delete/Count/
Search/AdvancedSearch/TemporalSearch) over immutable DataFrames.

Mutations are functional (they return a new façade over the updated
frame) — the Spark-correct reading of the reference's mutex-guarded
in-place map (``memory/memory.go:25-49``). Retrieval is BM25 (the
frozen-corpus re-expression of the TF-IDF+cosine scan; see
``same_same_spark.bm25``) with the reference's filter algebra, temporal
decay, and hybrid weighting applied as column operations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from same_same_spark.bm25 import score_queries
from same_same_spark.operators.filters import compile_filters, matches_metadata
from same_same_spark.operators.hybrid import HybridWeight, advanced_search
from same_same_spark.operators.temporal import (
    DECAY_LAMBDAS,
    apply_decay_col,
    decay_factor_col,
    resolve_doc_time,
)

DEFAULT_TOP_K = 10  # models/search.go:29-31
SEARCH_BY_TEXT_DEFAULT_K = 5  # handlers/vector.go:224-226


class SameSameSpark:
    """Document store + retrieval engine over a docs DataFrame.

    Expected columns: ``id`` (string-able), ``text``, optional
    ``metadata MAP<STRING,STRING>``, optional ``created_at`` /
    ``updated_at`` timestamps.
    """

    def __init__(self, docs: DataFrame, id_col: str = "id", text_col: str = "text"):
        self.docs = docs
        self.id_col = id_col
        self.text_col = text_col

    # ---- CRUD-ish -----------------------------------------------------

    def count(self) -> int:
        """A3 — corpus size (``memory/memory.go:93-98``)."""
        return self.docs.count()

    def get(self, doc_id) -> DataFrame:
        """Key lookup (``memory/memory.go:51-67``) — a pushed-down
        point filter, the broadcast-hash-join equivalent."""
        return self.docs.filter(F.col(self.id_col) == F.lit(doc_id))

    def list(self) -> DataFrame:
        """F8 — metadata-only listing: id, text length, metadata."""
        cols = [F.col(self.id_col), F.length(self.text_col).alias("text_length")]
        if "metadata" in self.docs.columns:
            cols.append(F.col("metadata"))
        return self.docs.select(*cols)

    def store(self, new_docs: DataFrame) -> "SameSameSpark":
        """K1 upsert semantics: incoming ids replace existing rows."""
        merged = self.docs.join(
            new_docs.select(self.id_col), self.id_col, "left_anti"
        ).unionByName(new_docs, allowMissingColumns=True)
        return SameSameSpark(merged, self.id_col, self.text_col)

    def delete(self, doc_id) -> "SameSameSpark":
        return SameSameSpark(
            self.docs.filter(F.col(self.id_col) != F.lit(doc_id)),
            self.id_col,
            self.text_col,
        )

    # ---- retrieval ----------------------------------------------------

    def search_by_text(
        self,
        text: str,
        k: int = SEARCH_BY_TEXT_DEFAULT_K,
        metadata_eq: dict[str, str] | None = None,
    ) -> DataFrame:
        """The flagship read path (SURVEY §3.1): BM25 top-k with the
        legacy F1 exact-equality metadata pre-filter."""
        base = self.docs
        if metadata_eq:
            base = base.filter(matches_metadata(metadata_eq))
        k = k if k > 0 else SEARCH_BY_TEXT_DEFAULT_K
        return (
            score_queries(
                base, [(0, text)], k=k, id_col=self.id_col,
                text_col=self.text_col,
            )
            .drop("query_id")
            .withColumnRenamed("doc_id", self.id_col)
        )

    def advanced_search(
        self,
        query: str,
        k: int = DEFAULT_TOP_K,
        filters: dict | None = None,
        hybrid: HybridWeight | None = None,
    ) -> DataFrame:
        """F3 FilterExpr + BM25 + A7 hybrid blend (SURVEY §3.2)."""
        k = k if k > 0 else DEFAULT_TOP_K
        meta = "metadata" if "metadata" in self.docs.columns else None
        return advanced_search(
            self.docs,
            query,
            k=k,
            filters=filters,
            hybrid=hybrid,
            id_col=self.id_col,
            text_col=self.text_col,
            metadata_col=meta,
        ).withColumnRenamed("doc_id", self.id_col)

    def temporal_search(
        self,
        text: str,
        k: int = DEFAULT_TOP_K,
        decay: str = "medium",
        ref_time: str | None = None,
        time_field: str = "created_at",
    ) -> DataFrame:
        """X7/X8 — BM25 then exponential time decay re-rank
        (``memory/temporal_search.go:13-81``). Returns
        (id, score, base_score, decay_factor, doc_time)."""
        from pyspark.sql import Window

        lam = DECAY_LAMBDAS[decay]
        k = k if k > 0 else DEFAULT_TOP_K
        base = (
            score_queries(
                self.docs, [(0, text)], k=max(k * 4, k), id_col=self.id_col,
                text_col=self.text_col,
            )
            .drop("query_id", "rank")
            .withColumnRenamed("doc_id", self.id_col)
        )
        meta = "metadata" if "metadata" in self.docs.columns else None
        created = "created_at" if "created_at" in self.docs.columns else None
        updated = "updated_at" if "updated_at" in self.docs.columns else None
        doc_time = resolve_doc_time(
            metadata_col=meta, time_field=time_field,
            created_at=created, updated_at=updated,
        )
        ref = (
            F.to_timestamp(F.lit(ref_time))
            if ref_time is not None
            else F.current_timestamp()
        )
        joined = self.docs.join(
            base.withColumnRenamed("score", "base_score"),
            base[self.id_col] == self.docs[self.id_col],
        ).select(
            self.docs[self.id_col],
            F.col("base_score"),
            doc_time.alias("doc_time"),
        )
        scored = joined.withColumn(
            "decay_factor", decay_factor_col(F.col("doc_time"), ref, lam)
        ).withColumn(
            "score",
            apply_decay_col(F.col("base_score"), F.col("doc_time"), ref, lam),
        )
        w = Window.orderBy(
            F.desc(F.round(F.col("score"), 9)), F.asc(self.id_col)
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(
                self.id_col, "score", "base_score", "decay_factor",
                "doc_time", "rank",
            )
        )

    # ---- K3: collection export / import -------------------------------

    def export_collection(self, path: str) -> None:
        """K3 — whole collection → JSON (``local/storage.go:461-500``)."""
        self.docs.write.mode("overwrite").json(path)

    @staticmethod
    def import_collection(
        spark, path: str, id_col: str = "id", text_col: str = "text"
    ) -> "SameSameSpark":
        return SameSameSpark(spark.read.json(path), id_col, text_col)

    # ---- stats --------------------------------------------------------

    def embedder_stats(self) -> dict:
        """A5 — vocabulary size + document count
        (``tfidf.go:239-250``)."""
        from same_same_spark.stats import term_doc_freqs, tokenized

        tok = tokenized(self.docs, id_col=self.id_col, text_col=self.text_col)
        return {
            "document_count": self.docs.count(),
            "vocabulary_size": term_doc_freqs(tok).count(),
        }
