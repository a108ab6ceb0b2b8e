"""Text analysis for training-data pipelines: language ID, quality
scoring, token counting, winnowing fingerprints.

All operators are pure JVM column expressions (no Python in the hot
path) and each has a DuckDB-oracle twin in ``__spark_entry__`` — the
two engines share RE2-style regex semantics and the md5-60bit hash.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from same_same_spark.pipeline.dedup import hash60_col, hash60_sql
from same_same_spark.text.tokenizer import STOPWORDS, tokens_col

# ---------------------------------------------------------------------------
# token counting
# ---------------------------------------------------------------------------

# BPE-ish pretokenizer: word runs OR single non-space symbols — the
# standard  \w+|[^\w\s]  shape used by byte-pair pre-tokenization.
BPE_PATTERN = r"[A-Za-z0-9_]+|[^A-Za-z0-9_\t\n\f\r ]"

# The whitespace class every operator here splits/trims on. Spark's
# one-arg trim() strips ASCII space ONLY, while the DuckDB oracle twins
# trim the full class — use ws_trim() so both engines agree on
# whitespace-only / tab-padded text.
WS_CHARS = " \t\n\f\r"


def ws_trim(c: Column) -> Column:
    """Trim the full ``[\\t\\n\\f\\r ]`` class (not just spaces)."""
    return F.trim(c, F.lit(WS_CHARS))


def ws_token_count_col(text: Column | str) -> Column:
    """Whitespace token count (``strings.Fields`` semantics: runs of
    whitespace separate, leading/trailing ignored)."""
    c = F.col(text) if isinstance(text, str) else text
    trimmed = ws_trim(c)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"[\t\n\f\r ]+"))
    )


def bpe_token_count_col(text: Column | str) -> Column:
    """Count of BPE-ish pretokens (word runs + individual symbols) — a
    cheap, deterministic proxy for subword token counts."""
    c = F.col(text) if isinstance(text, str) else text
    return F.coalesce(F.regexp_count(c, F.lit(BPE_PATTERN)), F.lit(0))


def token_count_sql(col_expr: str) -> dict[str, str]:
    """DuckDB twins: {ws_tokens, bpe_tokens} expressions."""
    return {
        "ws_tokens": (
            f"CASE WHEN length(trim({col_expr}, E' \\t\\n\\f\\r')) = 0 THEN 0 "
            f"ELSE len(string_split_regex(trim({col_expr}, E' \\t\\n\\f\\r'), "
            f"'[\\t\\n\\f\\r ]+')) END"
        ),
        "bpe_tokens": (
            f"len(regexp_extract_all({col_expr}, '{BPE_PATTERN}'))"
        ),
    }


# ---------------------------------------------------------------------------
# quality scoring
# ---------------------------------------------------------------------------


def quality_cols(text: Column | str) -> dict[str, Column]:
    """Quality features + a composite score in [0, 1].

    Features (all ratios in [0,1]):
    - ``stopword_ratio``  — stopwords / whitespace tokens (natural prose
      has ~0.3-0.6; word salads and code have ≈0),
    - ``punct_ratio``     — non-alphanumeric-non-space chars / chars,
    - ``mean_token_len``  — chars per whitespace token,
    - ``score`` — 0.4·min(ws_tokens/20, 1) + 0.3·(1 − punct_ratio) +
      0.3·min(stopword_ratio/0.4, 1): length, cleanliness, prose-ness.
    """
    c = F.col(text) if isinstance(text, str) else text
    n_chars = F.length(c)
    ws = ws_token_count_col(c).cast("double")
    lower_words = F.split(ws_trim(F.lower(c)), r"[\t\n\f\r ]+")
    n_stop = F.size(F.filter(lower_words, lambda w: w.isin(*sorted(STOPWORDS))))
    n_punct = F.coalesce(
        F.regexp_count(c, F.lit(r"[^A-Za-z0-9\t\n\f\r ]")), F.lit(0)
    )
    stopword_ratio = F.when(ws > 0, n_stop / ws).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars.cast("double")).otherwise(
        F.lit(0.0)
    )
    mean_token_len = F.when(ws > 0, n_chars.cast("double") / ws).otherwise(
        F.lit(0.0)
    )
    score = (
        F.lit(0.4) * F.least(ws / F.lit(20.0), F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - punct_ratio)
        + F.lit(0.3) * F.least(stopword_ratio / F.lit(0.4), F.lit(1.0))
    )
    return {
        "n_chars": n_chars.cast("bigint"),
        "ws_tokens": ws.cast("bigint"),
        "stopword_ratio": stopword_ratio,
        "punct_ratio": punct_ratio,
        "mean_token_len": mean_token_len,
        "quality_score": score,
    }


def quality_sql(col_expr: str) -> dict[str, str]:
    """DuckDB twins of :func:`quality_cols` (same names, same math)."""
    stop_list = ", ".join(f"'{w}'" for w in sorted(STOPWORDS))
    tc = token_count_sql(col_expr)
    ws = f"({tc['ws_tokens']})::DOUBLE"
    lower_words = (
        f"string_split_regex(trim(lower({col_expr}), E' \\t\\n\\f\\r'), "
        f"'[\\t\\n\\f\\r ]+')"
    )
    n_stop = f"len(list_filter({lower_words}, w -> w IN ({stop_list})))"
    n_punct = f"len(regexp_extract_all({col_expr}, '[^A-Za-z0-9\\t\\n\\f\\r ]'))"
    stopword_ratio = f"CASE WHEN {ws} > 0 THEN {n_stop} / {ws} ELSE 0.0 END"
    punct_ratio = (
        f"CASE WHEN length({col_expr}) > 0 "
        f"THEN {n_punct} / length({col_expr})::DOUBLE ELSE 0.0 END"
    )
    mean_tl = (
        f"CASE WHEN {ws} > 0 THEN length({col_expr})::DOUBLE / {ws} "
        f"ELSE 0.0 END"
    )
    score = (
        f"0.4 * least({ws} / 20.0, 1.0) + 0.3 * (1.0 - ({punct_ratio})) "
        f"+ 0.3 * least(({stopword_ratio}) / 0.4, 1.0)"
    )
    return {
        "n_chars": f"length({col_expr})::BIGINT",
        "ws_tokens": f"({tc['ws_tokens']})::BIGINT",
        "stopword_ratio": stopword_ratio,
        "punct_ratio": punct_ratio,
        "mean_token_len": mean_tl,
        "quality_score": score,
    }


# ---------------------------------------------------------------------------
# language ID
# ---------------------------------------------------------------------------

# Marker stopword sets per language (n-gram-heuristic class of language
# ID: score = marker hits / tokens; argmax with deterministic
# tie-break by language code, 'und' when nothing scores > 0).
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "von"],
    "en": ["the", "and", "is", "of", "to", "in", "that", "for", "with", "not"],
    "es": ["el", "la", "los", "las", "es", "y", "de", "que", "en", "por", "con", "una"],
    "fr": ["le", "la", "les", "est", "et", "de", "que", "en", "pour", "avec", "une", "dans"],
}


def lang_id_col(text: Column | str) -> Column:
    """Heuristic language guess over lowercase whitespace words."""
    c = F.col(text) if isinstance(text, str) else text
    words = F.split(ws_trim(F.lower(c)), r"[\t\n\f\r ]+")
    n = F.greatest(F.size(words), F.lit(1)).cast("double")
    scores = {
        lang: F.size(F.filter(words, lambda w: w.isin(*markers))) / n
        for lang, markers in sorted(LANG_MARKERS.items())
    }
    best = F.lit("und")
    best_score = F.lit(0.0)
    # iterate in reverse-alphabetical order so ties resolve to the
    # alphabetically-first language (strict > comparison)
    for lang in sorted(scores, reverse=True):
        s = scores[lang]
        cond = s > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, s).otherwise(best_score)
    return best


def lang_id_sql(col_expr: str) -> str:
    """DuckDB twin of :func:`lang_id_col` (same tie-break)."""
    words = (
        f"string_split_regex(trim(lower({col_expr}), E' \\t\\n\\f\\r'), "
        f"'[\\t\\n\\f\\r ]+')"
    )
    n = f"greatest(len({words}), 1)::DOUBLE"
    score = {
        lang: (
            f"(len(list_filter({words}, w -> w IN ("
            + ", ".join(f"'{m}'" for m in markers)
            + f"))) / {n})"
        )
        for lang, markers in sorted(LANG_MARKERS.items())
    }
    expr = "'und'"
    best = "0.0"
    for lang in sorted(score, reverse=True):
        s = score[lang]
        expr = f"CASE WHEN {s} > {best} THEN '{lang}' ELSE {expr} END"
        best = f"CASE WHEN {s} > {best} THEN {s} ELSE {best} END"
    return expr


# ---------------------------------------------------------------------------
# winnowing fingerprints
# ---------------------------------------------------------------------------


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al. 2003 scheme):
    hash all char ``k``-grams of the normalized text, slide a window of
    ``w`` hashes, keep each window's minimum, dedup.

    Returns ``(id, fp LONG)`` — typically ~2/(w+1) of the k-gram hashes
    per doc. Normalization = lowercase + collapse whitespace runs to
    one space (so formatting doesn't change fingerprints).
    Implementation: explode k-gram positions → rolling ``min`` window →
    distinct; all JVM-side.
    """
    c = F.regexp_replace(
        F.lower(F.col(text_col)), r"[\t\n\f\r ]+", " "
    )
    n_grams = F.length(c) - F.lit(k - 1)
    # NB: Spark sequence(1, 0) yields [1, 0] (auto-descending) — guard
    # short texts explicitly so they produce zero grams, like the oracle.
    gram_hashes = F.when(
        n_grams <= 0, F.array().cast("array<long>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.greatest(n_grams, F.lit(1))),
            lambda i: hash60_col(c.substr(i, F.lit(k))),
        )
    )
    grams = df.select(
        F.col(id_col), F.posexplode(gram_hashes).alias("pos", "h")
    )
    win = Window.partitionBy(id_col).orderBy("pos").rowsBetween(0, w - 1)
    return (
        grams.withColumn("fp", F.min("h").over(win))
        .select(id_col, "fp")
        .distinct()
    )


def winnow_sql(id_expr: str, col_expr: str, table: str, k: int = 8, w: int = 4) -> str:
    """DuckDB twin of :func:`winnow_fingerprints`."""
    norm = f"regexp_replace(lower({col_expr}), '[\\t\\n\\f\\r ]+', ' ', 'g')"
    return f"""
WITH norm AS (
  SELECT {id_expr} AS doc_id, {norm} AS t FROM {table}
),
grams AS (
  SELECT doc_id, i AS pos,
         {hash60_sql(f"substr(t, i, {k})")} AS h
  FROM norm, unnest(range(1, greatest(length(t) - {k - 1}, 0) + 1)) AS u(i)
),
wins AS (
  SELECT doc_id,
         min(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS fp
  FROM grams
)
SELECT DISTINCT doc_id, fp FROM wins
"""
