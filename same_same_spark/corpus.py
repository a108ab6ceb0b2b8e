"""Deterministic synthetic source-code corpus (BASELINE.json:input_hint).

Schema: ``repo STRING, path STRING, commit STRING, lang STRING,
content STRING`` — the Iceberg-shaped table the engine indexes. At real
scale this would be ``spark.read.table("iceberg.code.files")``; here we
synthesize it deterministically (seeded, no external data) with *pure
column expressions* over ``spark.range(n)`` so generation itself is
distributed and works at any row count: no driver-side loops, no Python
UDFs, no RNG state — every cell is a hash of (row id, seed, position).

Content is code-like: guaranteed skew terms (``import``, ``func``,
``return`` appear in almost every document — the hot posting lists the
north rule calls out), a zipf-ish identifier pool, and comment lines with
quote-like English so the reference tokenizer's stopword/short-token
behavior is exercised.

The per-row invariant column ``sha256(content)`` is computed at read time
(``with_sha`` / ``verify_sha``), never stored stale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# Identifier pool: deterministic, ~180 distinct; earlier entries are picked
# more often (index chosen as min of two hashes → zipf-ish head skew).
_LANG_KEYWORDS = {
    "go": ["func", "package", "import", "return", "defer", "chan", "range"],
    "py": ["def", "import", "return", "class", "yield", "lambda", "raise"],
    "java": ["public", "class", "import", "return", "static", "void", "final"],
    "rs": ["fn", "use", "return", "impl", "match", "trait", "enum"],
}
_EXTS = ["go", "py", "java", "rs"]

_IDENT_POOL = [
    f"{stem}{suffix}"
    for stem in (
        "handler config parser buffer client server worker query index "
        "shard token score batch merge filter stream record field value "
        "table column reader writer codec block cache engine router "
        "session context manager builder runner loader encoder decoder"
    ).split()
    for suffix in ["", "impl", "util", "base", "core"]
]

_COMMENT_WORDS = (
    "imagination more important than knowledge life what happens when busy "
    "making other plans only thing know nothing success failure courage "
    "continue counts wisdom learning education truth justice freedom peace "
    "change progress simple scale fast slow data build query merge"
).split()


def _pick(pool: list[str], *seed_cols: Column) -> Column:
    """Deterministically pick one string from ``pool`` per row (JVM-side)."""
    arr = F.array(*[F.lit(w) for w in pool])
    idx = F.pmod(F.xxhash64(*seed_cols), F.lit(len(pool)))
    return F.element_at(arr, (idx + 1).cast("int"))


def _pick_skewed(pool: list[str], *seed_cols: Column) -> Column:
    """Zipf-ish pick: min of two independent uniform indexes biases small
    indexes → head-of-pool terms become the skewed hot tokens."""
    arr = F.array(*[F.lit(w) for w in pool])
    h1 = F.pmod(F.xxhash64(F.lit("a"), *seed_cols), F.lit(len(pool)))
    h2 = F.pmod(F.xxhash64(F.lit("b"), *seed_cols), F.lit(len(pool)))
    idx = F.least(h1, h2)
    return F.element_at(arr, (idx + 1).cast("int"))


def generate_corpus(
    spark: SparkSession, n_docs: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Build the synthetic corpus as a lazily-evaluated DataFrame.

    Deterministic in (n_docs, seed); scales linearly — ``spark.range``
    splits the id space across executors and every column is a pure
    expression, so a 10^12-row corpus is the same code with bigger n.
    """
    if partitions is None:
        partitions = max(spark.sparkContext.defaultParallelism, 8)
    df = spark.range(0, n_docs, 1, partitions)
    sid = F.lit(seed)
    i = F.col("id")

    lang_idx = F.pmod(F.xxhash64(i, sid, F.lit("lang")), F.lit(4)).cast("int")
    ext = F.element_at(F.array(*[F.lit(e) for e in _EXTS]), lang_idx + 1)

    repo = F.concat(
        F.lit("org"), F.pmod(F.xxhash64(i, sid, F.lit("org")), F.lit(7)),
        F.lit("/repo"), F.pmod(F.xxhash64(i, sid, F.lit("repo")), F.lit(23)),
    )
    path = F.concat(
        F.lit("src/pkg"), F.pmod(F.xxhash64(i, sid, F.lit("pkg")), F.lit(13)),
        F.lit("/file_"), i, F.lit("."), ext,
    )
    commit = F.sha2(F.concat_ws("|", repo, path, sid.cast("string")), 256)

    # Content: 3..10 "statement" lines + 1..3 comment lines, all chosen
    # via per-(doc, line, slot) hashes. Each statement line leads with a
    # language keyword (guaranteeing the hot terms) followed by 3 idents.
    n_stmt = (F.pmod(F.xxhash64(i, sid, F.lit("ns")), F.lit(8)) + 3).cast("int")
    n_cmnt = (F.pmod(F.xxhash64(i, sid, F.lit("nc")), F.lit(3)) + 1).cast("int")

    def stmt_line(line_no: Column) -> Column:
        kw_pool = [kw for kws in _LANG_KEYWORDS.values() for kw in kws]
        kw = _pick(kw_pool, i, sid, line_no, F.lit("kw"))
        parts = [kw] + [
            _pick_skewed(_IDENT_POOL, i, sid, line_no, F.lit(f"id{s}"))
            for s in range(3)
        ]
        return F.concat_ws(" ", *parts, F.lit("()"))

    def comment_line(line_no: Column) -> Column:
        words = [
            _pick_skewed(_COMMENT_WORDS, i, sid, line_no, F.lit(f"cw{s}"))
            for s in range(6)
        ]
        return F.concat_ws(" ", F.lit("//"), *words)

    stmts = F.transform(F.sequence(F.lit(1), n_stmt), stmt_line)
    cmnts = F.transform(F.sequence(F.lit(101), F.lit(100) + n_cmnt), comment_line)
    content = F.array_join(F.concat(cmnts, stmts), "\n")

    return df.select(
        repo.alias("repo"),
        path.alias("path"),
        commit.alias("commit"),
        ext.alias("lang"),
        content.alias("content"),
    )


def doc_id_col(df: DataFrame | None = None) -> Column:
    """Stable 64-bit document id: ``xxhash64(repo, path, commit)``.

    Deterministic across runs/resumes (reference generates wall-clock ids,
    ``ingestor.go:148-152`` — reproducibility wins at scale)."""
    return F.xxhash64(F.col("repo"), F.col("path"), F.col("commit")).alias("doc_id")


def with_sha(df: DataFrame, text_col: str = "content") -> DataFrame:
    """Attach the per-row integrity column (input_hint invariant)."""
    return df.withColumn("content_sha256", F.sha2(F.col(text_col), 256))


def verify_sha(df: DataFrame, text_col: str = "content") -> int:
    """Count rows whose stored sha no longer matches the content.

    Returns the number of violations (0 == invariant holds). Run after
    every pipeline stage that carries content."""
    return (
        df.filter(F.sha2(F.col(text_col), 256) != F.col("content_sha256")).count()
    )
