"""Training-sequence packing: assign every document a deterministic
position in fixed-length training windows (GPT-style concat-and-split
pretraining batches).

A pretraining pipeline's last step before tokenized shards: documents
are concatenated in a deterministic order and cut into ``seq_len``-token
windows. This operator computes, per document, WHERE it lands —
``(shard, pack_id, pack_offset)`` — without materializing token streams:
pure column math over token counts, so the actual tokenization/writing
stage can be embarrassingly parallel afterwards.

Scale shape: a single global concatenation order would need one
worldwide cumulative sum (a one-task window — the unpartitioned-window
anti-pattern this repo bans). Instead documents are hash-sharded
(``hash60(seed|id) % n_shards``) and each shard packs independently —
per-shard windows distribute, shard sizes are uniform by construction
(md5-based hash), and ``n_shards`` is the sizing lever (pick it so a
shard's doc count fits one task comfortably; shards ≫ executors keeps
stragglers bounded). Real pipelines pack per output shard anyway — a
global order buys nothing.

Determinism: the order within a shard is ``(hash60(seed|id), id)`` —
reproducible across runs, engines (the md5-60bit scheme is the repo's
cross-engine hash), and cluster sizes; adding documents moves only the
packs at/after the insertion points of the affected shards.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from same_same_spark.pipeline.dedup import hash60_col, hash60_sql
from same_same_spark.pipeline.textqc import token_count_sql, ws_token_count_col

__all__ = ["pack_sequences", "pack_sequences_sql"]


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 256,
    seed: str = "pack",
    token_count: Column | None = None,
) -> DataFrame:
    """``(id, n_tokens, shard, pack_id, pack_offset, crosses_boundary)``
    — each doc's position in its shard's concat-and-split token stream:
    ``pack_id`` = which ``seq_len`` window its first token lands in
    (0-based within the shard), ``pack_offset`` = token offset inside
    that window, ``crosses_boundary`` = the doc spills into the next
    window(s). Zero-token docs occupy a position but no tokens; NULL
    text counts as zero tokens.

    ``token_count`` overrides the token-count expression (default:
    whitespace tokens — swap in ``bpe_token_count_col`` or a real
    tokenizer's count column)."""
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    toks = (
        token_count if token_count is not None
        else ws_token_count_col(text_col)
    )
    h = hash60_col(
        F.concat(F.lit(seed + "|"), F.col(id_col).cast("string"))
    )
    rows = df.select(
        F.col(id_col),
        F.coalesce(toks.cast("long"), F.lit(0).cast("long")).alias(
            "n_tokens"
        ),
        h.alias("_h"),
    ).withColumn("shard", F.pmod(F.col("_h"), F.lit(n_shards)).cast("int"))
    w = (
        Window.partitionBy("shard")
        .orderBy("_h", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("long"))
    out = rows.withColumn("_cum", cum)
    return out.select(
        id_col,
        "n_tokens",
        "shard",
        F.expr(f"_cum DIV {seq_len}").alias("pack_id"),
        F.pmod("_cum", F.lit(seq_len)).cast("long").alias("pack_offset"),
        (
            F.pmod("_cum", F.lit(seq_len)) + F.col("n_tokens")
            > F.lit(seq_len)
        ).alias("crosses_boundary"),
    )


def pack_sequences_sql(
    table: str,
    seq_len: int,
    id_expr: str = "doc_id",
    col_expr: str = "text",
    n_shards: int = 256,
    seed: str = "pack",
) -> str:
    """DuckDB twin of :func:`pack_sequences` (whitespace token count)."""
    ws = token_count_sql(col_expr)["ws_tokens"]
    h = hash60_sql(f"'{seed}|' || ({id_expr})::VARCHAR")
    return f"""
WITH rows_ AS (
  SELECT {id_expr} AS doc_id,
         coalesce(({ws})::BIGINT, 0) AS n_tokens,
         {h} AS _h
  FROM {table}
),
sh AS (SELECT *, (_h % {n_shards})::INT AS shard FROM rows_),
c AS (
  SELECT *,
         coalesce(sum(n_tokens) OVER (
           PARTITION BY shard ORDER BY _h, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS _cum
  FROM sh
)
SELECT doc_id, n_tokens, shard,
       (_cum // {seq_len})::BIGINT AS pack_id,
       (_cum % {seq_len})::BIGINT AS pack_offset,
       (_cum % {seq_len}) + n_tokens > {seq_len} AS crosses_boundary
FROM c
"""
