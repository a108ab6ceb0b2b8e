"""Training-data-pipeline operators over document / embedding tables.

Beyond the reference's own surface (SURVEY.md §2), these are the
operations a large-scale training-data pipeline needs, built
DataFrame-first:

- :mod:`~same_same_spark.pipeline.dedup` — exact, MinHash+LSH, n-gram
  Jaccard, SimHash, embedding-cosine near-dup,
- :mod:`~same_same_spark.pipeline.ann` — similarity search
  (brute-force cosine top-k baseline, LSH / IVF query-time paths),
- :mod:`~same_same_spark.pipeline.ann_store` — the persisted scale
  path: sig/centroid assignments precomputed at ingest into
  partitioned parquet, probes are partition-pruned reads; MLlib
  KMeans centroids,
- :mod:`~same_same_spark.pipeline.textqc` — language id, quality
  scoring, token counting, winnowing fingerprints, intra-doc line
  dedup,
- :mod:`~same_same_spark.pipeline.bpe` — BPE tokenizer training
  (local / distributed merge loops over one word-count pass) and
  subword encoding,
- :mod:`~same_same_spark.pipeline.multimodal` — binary-column
  plumbing for image/audio/video payloads (decode stubbed; schema,
  partitioning and Arrow batch shape real).

Every deterministic operator has a DuckDB-oracle twin in
``__spark_entry__`` — hashing uses the md5-60bit scheme from
:func:`~same_same_spark.pipeline.dedup.hash60_col`, which both engines
compute identically.
"""
