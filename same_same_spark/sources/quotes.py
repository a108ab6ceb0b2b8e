"""S1 — builtin quotes source: ``"text — author"`` lines.

Reference: ``internal/ingestion/builtin.go:53-92`` — reads ``*.txt``
files of quote lines, splits on the em-dash separator ``" — "``, skips
blank and malformed lines, stores author + namespace in metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEPARATOR = " — "  # builtin.go:70 (em-dash with spaces)


def parse_quotes_lines(lines: DataFrame, namespace: str = "quotes") -> DataFrame:
    """Parse a single-column ``value STRING`` frame of quote lines.

    Keeps only well-formed ``text — author`` lines (exactly one
    separator, both sides non-empty after trim) — malformed lines are
    skipped, not errors (builtin.go:73-78).
    """
    parts = F.split(F.col("value"), SEPARATOR)
    parsed = (
        lines.withColumn("parts", parts)
        .filter(F.size("parts") == 2)
        .select(
            F.trim(F.element_at("parts", 1)).alias("text"),
            F.trim(F.element_at("parts", 2)).alias("author"),
        )
        .filter((F.length("text") > 0) & (F.length("author") > 0))
    )
    return parsed.select(
        F.concat(
            F.lit("quote_"), F.sha2(F.concat_ws("|", "text", "author"), 256).substr(1, 16)
        ).alias("id"),
        "text",
        F.create_map(
            F.lit("author"), F.col("author"),
            F.lit("namespace"), F.lit(namespace),  # builtin.go:87-89
        ).alias("metadata"),
    )


def read_quotes_source(
    spark: SparkSession, path: str, namespace: str = "quotes"
) -> DataFrame:
    """Read ``*.txt`` quote files → ingestion records."""
    return parse_quotes_lines(spark.read.text(path), namespace=namespace)
