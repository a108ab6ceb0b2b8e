"""same_same_spark — a PySpark-native lexical retrieval engine.

A from-scratch rebuild of the *capabilities* of ``tahcohcat/same-same``
(reference at /root/reference, read-only) on idiomatic Spark:

- tokenize → corpus stats → BM25 top-k (the reference's TF-IDF+cosine
  scan, re-expressed as a frozen-corpus BM25 engine per BASELINE.json),
- a sharded, compressed inverted index (delta+varint posting blocks with
  block-max metadata) built with explicit bucket-salted shuffles and
  per-partition lineage records for checkpoint/resume,
- the reference's filter algebra (FilterExpr), temporal decay, hybrid
  scoring, ingestion sources, and vector-search semantics,
- training-data-pipeline operators: dedup (exact / MinHash-LSH / SimHash /
  n-gram Jaccard), ANN similarity search, text quality analysis,
  multimodal column plumbing.

Everything is DataFrame-first: Catalyst handles pushdown/pruning/join
strategy; Python appears only inside Arrow-vectorized pandas UDFs.
"""

__version__ = "0.1.0"

from same_same_spark.session import get_spark  # noqa: F401
