"""Ingestion sources (SURVEY.md §2.1) — the reference's ``Source``
implementations re-expressed as ``spark.read`` pipelines.

Every source yields the ingestion-record shape
``(id STRING, text STRING, metadata MAP<STRING,STRING>)`` that the
reference's ``Ingestor`` consumes (``internal/ingestion/source.go:8-12``),
plus the F5 empty-text skip and F9 namespace tagging applied exactly
where the reference applies them.
"""

from same_same_spark.sources.files import read_csv_source, read_jsonl_source  # noqa: F401
from same_same_spark.sources.huggingface import read_hf_export_source  # noqa: F401
from same_same_spark.sources.quotes import parse_quotes_lines, read_quotes_source  # noqa: F401
