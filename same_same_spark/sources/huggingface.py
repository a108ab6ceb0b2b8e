"""S4 — offline HuggingFace-export source.

The reference's HuggingFace source shells out to ``datasets.load_dataset``
and dumps the split as JSONL, then re-reads that file line by line
(``internal/ingestion/huggingface.go:56-146``). The network/download
half is out of scope here (no egress); this adapter accepts the SAME
JSONL record shape the reference's generated script writes
(``huggingface.go:131-146``: one ``json.dumps(item)`` per line) and
applies the same record mapping (``huggingface.go:156-202``):

- the configurable ``text_field`` (default ``"text"``) must be a
  string; records where it is missing/non-string are skipped,
- every OTHER scalar field (string/number/bool) becomes string
  metadata; nested values are dropped,
- ``source="huggingface"``, ``dataset=<name>`` are injected, plus
  ``namespace`` when configured.

Divergence note: the reference stringifies numbers with Go ``%v``
(``3.0`` → ``"3"``); we use Spark's string cast (``3.0`` → ``"3.0"``)
— documented, not silently different.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SCALAR_TYPES = (
    T.StringType, T.LongType, T.IntegerType, T.DoubleType,
    T.FloatType, T.BooleanType, T.DecimalType,
)


def read_hf_export_source(
    spark: SparkSession,
    path: str,
    dataset: str,
    text_field: str = "text",
    namespace: str = "",
) -> DataFrame:
    """HF-export JSONL → ingestion records (id, text, metadata)."""
    raw = spark.read.option("mode", "DROPMALFORMED").json(path)
    if text_field not in raw.columns:
        raise ValueError(
            f"text field {text_field!r} not in export columns {raw.columns}"
        )
    field_type = dict((f.name, f.dataType) for f in raw.schema.fields)
    if not isinstance(field_type[text_field], T.StringType):
        raise ValueError(f"text field {text_field!r} is not a string column")

    meta_pairs: list = []
    for f in raw.schema.fields:
        if f.name == text_field:
            continue
        if isinstance(f.dataType, _SCALAR_TYPES):
            meta_pairs += [
                F.lit(f.name),
                F.coalesce(F.col(f.name).cast("string"), F.lit("")),
            ]
    meta_pairs += [F.lit("source"), F.lit("huggingface")]
    meta_pairs += [F.lit("dataset"), F.lit(dataset)]
    if namespace:
        meta_pairs += [F.lit("namespace"), F.lit(namespace)]

    return (
        raw.filter(F.col(text_field).isNotNull())
        .select(
            F.col(text_field).alias("text"),
            F.create_map(*meta_pairs).alias("metadata"),
        )
        .filter(F.length(F.trim(F.col("text"))) > 0)
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
