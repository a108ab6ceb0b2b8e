"""Corpus-table reader — the engine's primary input
(BASELINE.json:input_hint: an Iceberg table with columns
``repo, path, commit, lang, content``).

Iceberg access is a *format string* in Spark: the same DataFrame code
runs against an Iceberg catalog table or plain parquet. This container
ships no Iceberg runtime jar, so the Iceberg branch is import-gated;
the parquet branch is the tested path and the bench/testdata input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORPUS_COLUMNS = ["repo", "path", "commit", "lang", "content"]

# Session config for a real Iceberg deployment (documented, not applied
# here — requires the iceberg-spark-runtime jar on the cluster):
ICEBERG_CONF = {
    "spark.sql.extensions": (
        "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
    ),
    "spark.sql.catalog.lake": "org.apache.iceberg.spark.SparkCatalog",
    "spark.sql.catalog.lake.type": "hadoop",
    # "spark.sql.catalog.lake.warehouse": "<warehouse path>",
}


def read_corpus(
    spark: SparkSession,
    source: str,
    fmt: str = "parquet",
    langs: list[str] | None = None,
) -> DataFrame:
    """Read the corpus table and validate its shape.

    ``fmt='iceberg'`` treats ``source`` as a catalog table name
    (``spark.table``), anything else as a path for ``spark.read``.
    ``langs`` compiles to a partition-prunable / pushed-down filter.
    """
    if fmt == "iceberg":
        try:
            df = spark.table(source)
        except Exception as e:  # pragma: no cover - no iceberg jar here
            raise RuntimeError(
                "Iceberg catalog read failed — is iceberg-spark-runtime on "
                "the classpath and the catalog configured? See ICEBERG_CONF."
            ) from e
    else:
        df = spark.read.format(fmt).load(source)

    missing = [c for c in CORPUS_COLUMNS if c not in df.columns]
    if missing:
        raise ValueError(f"corpus table missing columns: {missing}")
    out = df.select(*CORPUS_COLUMNS)
    if langs:
        out = out.filter(F.col("lang").isin(langs))
    return out
