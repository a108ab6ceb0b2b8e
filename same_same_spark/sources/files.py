"""S2/S3 — CSV and JSONL file sources.

Reference: ``internal/ingestion/file.go``.

- CSV (``file.go:102-143``): header row → column names; a configurable
  text column (default ``"text"``, setter ``file.go:58-60``); every
  other column becomes a string metadata entry; namespace injected
  (``file.go:135-137``).
- JSONL (``file.go:145-209``): per-line JSON; text-field fallback
  ``text → content → body → message → quote`` (``file.go:170``);
  scalar fields (string/number/bool) become string metadata, nested
  values are skipped; invalid JSON lines are skipped (corrupt-record
  handling), mirroring the reference's silent line skip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TEXT_FALLBACK_FIELDS = ("text", "content", "body", "message", "quote")  # file.go:170


def _record(df: DataFrame, text_col, meta_pairs: list, namespace: str) -> DataFrame:
    meta_pairs = meta_pairs + [F.lit("namespace"), F.lit(namespace)]
    return (
        df.select(
            text_col.alias("text"), F.create_map(*meta_pairs).alias("metadata")
        )
        .filter(F.length(F.trim(F.col("text"))) > 0)  # F5, ingestor.go:103-106
        .withColumn(
            "id",
            F.concat(
                F.lit("vec_"),
                F.sha2(
                    F.concat_ws("|", F.col("text"), F.to_json("metadata")), 256
                ).substr(1, 16),
            ),
        )
        .select("id", "text", "metadata")
    )


def read_csv_source(
    spark: SparkSession,
    path: str,
    text_column: str = "text",
    namespace: str = "general",
) -> DataFrame:
    """CSV with header → ingestion records; non-text columns → metadata."""
    raw = spark.read.option("header", True).csv(path)
    if text_column not in raw.columns:
        raise ValueError(
            f"text column {text_column!r} not in CSV header {raw.columns}"
        )
    meta_pairs: list = []
    for c in raw.columns:
        if c == text_column:
            continue
        meta_pairs += [F.lit(c), F.coalesce(F.col(c).cast("string"), F.lit(""))]
    return _record(raw, F.col(text_column), meta_pairs, namespace)


def read_jsonl_source(
    spark: SparkSession,
    path: str,
    namespace: str = "general",
) -> DataFrame:
    """NDJSON → ingestion records with the reference's text fallback.

    Schema is inferred; rows where no fallback field yields a non-empty
    string are dropped (file.go:167-176). Scalar top-level fields become
    string metadata; arrays/objects are skipped (file.go:186-199).
    """
    raw = spark.read.option("mode", "DROPMALFORMED").json(path)
    scalar_types = (
        T.StringType, T.LongType, T.IntegerType, T.DoubleType,
        T.FloatType, T.BooleanType, T.DecimalType,
    )
    present = [f for f in TEXT_FALLBACK_FIELDS if f in raw.columns]
    if not present:
        raise ValueError(
            f"no text field among {TEXT_FALLBACK_FIELDS} in {raw.columns}"
        )
    text = F.coalesce(
        *[F.col(f).cast("string") for f in present], F.lit("")
    )
    meta_pairs: list = []
    for field in raw.schema.fields:
        if field.name in TEXT_FALLBACK_FIELDS:
            continue
        if isinstance(field.dataType, scalar_types):
            meta_pairs += [
                F.lit(field.name),
                F.coalesce(F.col(field.name).cast("string"), F.lit("")),
            ]
    return _record(raw, text, meta_pairs, namespace)
