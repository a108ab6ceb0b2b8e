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
# repetition metrics (Gopher-style quality filters)
# ---------------------------------------------------------------------------

# Rae et al. 2021 ("Scaling Language Models: ... Gopher", table A1)
# repetition filters: fraction of duplicate lines / paragraphs, fraction
# of characters inside duplicate lines / paragraphs, and character
# coverage of the most-frequent word n-gram. The reference engine has no
# equivalent (it stores clean snippets) — these are the standard
# training-data filters a 100-TB pipeline runs before indexing.


def _dup_metrics(arr: Column) -> tuple[Column, Column, Column]:
    """(count, dup_frac, dup_char_frac) for an array of text units.

    ``dup_frac`` = units beyond their first occurrence / units;
    ``dup_char_frac`` = chars of those repeat occurrences / total chars
    (the standard implementation: total − distinct, order-free).
    All pure JVM column math — no explode, no shuffle.
    """
    n = F.size(arr)
    nd = F.size(F.array_distinct(arr))
    tot = F.aggregate(arr, F.lit(0).cast("long"), lambda a, x: a + F.length(x))
    dist = F.aggregate(
        F.array_distinct(arr), F.lit(0).cast("long"), lambda a, x: a + F.length(x)
    )
    dup_frac = F.when(n > 0, (n - nd) / n).otherwise(F.lit(0.0))
    dup_char_frac = F.when(tot > 0, (tot - dist) / tot).otherwise(F.lit(0.0))
    return n, dup_frac, dup_char_frac


def repetition_cols(text: Column | str) -> dict[str, Column]:
    """Per-document repetition metrics over lines and paragraphs.

    Lines split on ``\\n``, paragraphs on runs of 2+ newlines; both are
    whitespace-trimmed and empties dropped before counting, so blank
    lines and paragraph gaps never count as duplicates of each other.
    """
    c = F.col(text) if isinstance(text, str) else text
    lines = F.filter(
        F.transform(F.split(c, r"\n"), ws_trim), lambda l: F.length(l) > 0
    )
    paras = F.filter(
        F.transform(F.split(c, r"\n{2,}"), ws_trim), lambda p: F.length(p) > 0
    )
    n_lines, dlf, dlcf = _dup_metrics(lines)
    n_paras, dpf, dpcf = _dup_metrics(paras)
    return {
        "n_lines": n_lines.cast("bigint"),
        "dup_line_frac": dlf,
        "dup_line_char_frac": dlcf,
        "n_paras": n_paras.cast("bigint"),
        "dup_para_frac": dpf,
        "dup_para_char_frac": dpcf,
    }


def _dup_metrics_sql(arr: str) -> tuple[str, str, str]:
    """DuckDB twin of :func:`_dup_metrics` over a list expression."""
    n = f"len({arr})"
    nd = f"len(list_distinct({arr}))"
    tot = f"coalesce(list_sum(list_transform({arr}, x -> length(x))), 0)"
    dist = (
        f"coalesce(list_sum(list_transform(list_distinct({arr}), "
        f"x -> length(x))), 0)"
    )
    dup = f"CASE WHEN {n} > 0 THEN ({n} - {nd}) / {n}::DOUBLE ELSE 0.0 END"
    dupc = (
        f"CASE WHEN {tot} > 0 THEN ({tot} - ({dist})) / ({tot})::DOUBLE "
        f"ELSE 0.0 END"
    )
    return n, dup, dupc


def repetition_sql(col_expr: str) -> dict[str, str]:
    """DuckDB twins of :func:`repetition_cols` (same names, same math)."""
    trim_ws = "E' \\t\\n\\f\\r'"
    lines = (
        f"list_filter(list_transform(string_split({col_expr}, chr(10)), "
        f"l -> trim(l, {trim_ws})), l -> length(l) > 0)"
    )
    paras = (
        f"list_filter(list_transform(string_split_regex({col_expr}, "
        f"'\\n{{2,}}'), p -> trim(p, {trim_ws})), p -> length(p) > 0)"
    )
    nl, dlf, dlcf = _dup_metrics_sql(lines)
    np_, dpf, dpcf = _dup_metrics_sql(paras)
    return {
        "n_lines": f"({nl})::BIGINT",
        "dup_line_frac": dlf,
        "dup_line_char_frac": dlcf,
        "n_paras": f"({np_})::BIGINT",
        "dup_para_frac": dpf,
        "dup_para_char_frac": dpcf,
    }


def dedup_lines_cols(text: Column | str) -> dict[str, Column]:
    """Intra-document repeated-line REMOVAL — the action companion to
    :func:`repetition_cols` (which only measures). Keeps the FIRST
    occurrence of each line, comparing lines by their
    whitespace-trimmed form (`` foo `` is a repeat of ``foo``); blank /
    whitespace-only lines always survive so paragraph structure is
    preserved. Lines rejoin with ``\\n``.

    Pure JVM column math per row — no explode, no shuffle, runs inside
    whole-stage codegen at any corpus size. The per-row cost is
    O(lines²) via ``array_position`` first-occurrence lookups, bounded
    by document line counts (never corpus-proportional).

    Returns ``{"text_line_deduped", "n_lines_removed"}``.
    """
    c = F.col(text) if isinstance(text, str) else text
    raw = F.split(c, r"\n")
    trimmed = F.transform(raw, ws_trim)
    kept = F.filter(
        raw,
        lambda x, i: (F.length(ws_trim(x)) == 0)
        | (F.array_position(trimmed, ws_trim(x)) == i + 1),
    )
    return {
        "text_line_deduped": F.array_join(kept, "\n"),
        "n_lines_removed": (F.size(raw) - F.size(kept)).cast("bigint"),
    }


def dedup_lines_sql(col_expr: str) -> dict[str, str]:
    """DuckDB twins of :func:`dedup_lines_cols` (same names, same
    semantics; DuckDB list lambdas index 1-based where Spark's are
    0-based — both compare against their engine's first-occurrence
    position)."""
    trim_ws = "E' \\t\\n\\f\\r'"
    lines = f"string_split({col_expr}, chr(10))"
    trimmed = f"list_transform({lines}, y -> trim(y, {trim_ws}))"
    kept = (
        f"list_filter({lines}, (x, i) -> "
        f"length(trim(x, {trim_ws})) = 0 OR "
        f"list_position({trimmed}, trim(x, {trim_ws})) = i)"
    )
    return {
        "text_line_deduped": f"array_to_string({kept}, chr(10))",
        "n_lines_removed": f"(len({lines}) - len({kept}))::BIGINT",
    }


def dedup_lines_global(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    min_line_chars: int = 0,
    out_col: str = "text_global_deduped",
) -> DataFrame:
    """CROSS-document repeated-line removal (C4's global dedup rule at
    line granularity): across the whole corpus, each distinct line —
    compared by its whitespace-trimmed form — keeps only its FIRST
    occurrence in ``(id, line_position)`` order; every later copy in
    any document is dropped. Blank / whitespace-only lines always
    survive (paragraph structure), as do lines with fewer than
    ``min_line_chars`` trimmed characters (``}``-style code braces and
    other short tokens are structure, not boilerplate).

    This is the corpus-level companion to :func:`dedup_lines_cols`
    (intra-document) and the line-granularity sibling of the span
    stripper (`pipeline/spans.py`, which needs ``min_df`` repetition
    evidence and keeps one copy per *span run*); the global rule here
    is what kills corpus-wide boilerplate (license lines, nav chrome)
    that appears once per document.

    Returns ``(id_col, out_col, n_lines_removed)`` with one row per
    input document (documents whose every line was a later duplicate
    come back with empty text, not dropped rows).

    Scale: candidate lines (non-blank, long enough) shuffle once keyed
    by a 60-bit line hash (`hash60` — the repo's cross-engine scheme;
    a 2^-60 collision merges two line groups, the same accepted risk
    as every other hash60 consumer) for the first-occurrence groupBy,
    whose exchange Catalyst reuses for the keep join; reassembly is
    one groupBy on the doc id. Exempt lines NEVER enter the hash join
    — blank lines all share one hash value and would be the classic
    hot key. Nothing driver-side, nothing corpus-quadratic.
    """
    from same_same_spark.pipeline.dedup import hash60_col

    base = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), r"\n")).alias("pos", "line"),
    ).withColumn("t", ws_trim(F.col("line")))
    exempt = (F.length("t") == 0) | (F.length("t") < min_line_chars)
    cand = base.filter(~exempt).withColumn("h", hash60_col(F.col("t")))
    firsts = cand.groupBy("h").agg(
        F.min(F.struct(F.col(id_col), F.col("pos"))).alias("first")
    )
    # Keep = semi-join on the FULL (h, id, pos) composite, not on h
    # alone: a corpus-frequent boilerplate line ("MIT License" a
    # billion times) would make h a hot join key with every copy in
    # one partition; keyed by the composite, the copies spread across
    # partitions and the non-first rows simply find no match. The
    # groupBy side stays cheap on the hot key via partial aggregation.
    kept_cand = cand.join(
        firsts.select(
            "h",
            F.col(f"first.{id_col}").alias(id_col),
            F.col("first.pos").alias("pos"),
        ),
        ["h", id_col, "pos"],
        "left_semi",
    ).select(id_col, "pos", "line")
    kept = kept_cand.unionByName(
        base.filter(exempt).select(id_col, "pos", "line")
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias(out_col),
        F.count(F.lit(1)).alias("__kept"),
    )
    totals = df.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), r"\n")).alias("__total"),
    )
    return (
        totals.join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col(out_col), F.lit("")).alias(out_col),
            (F.col("__total") - F.coalesce(F.col("__kept"), F.lit(0)))
            .cast("bigint")
            .alias("n_lines_removed"),
        )
    )


def top_ngram_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Most-frequent word ``n``-gram per document + duplicate-n-gram
    character fraction (Gopher's top-n-gram / dup-n-gram filters).

    Words = lowercase whitespace tokens. Returns ``(id, top_gram,
    top_count, top_ngram_char_frac, dup_ngram_char_frac)``:

    - ``top_ngram_char_frac`` — chars covered by occurrences of the
      most frequent n-gram / total word chars (separators excluded);
      ties broken by (count DESC, gram ASC) so both engines agree.
    - ``dup_ngram_char_frac`` — char mass of n-gram occurrences whose
      gram appears >1× / char mass of all n-gram occurrences
      (overlaps counted per occurrence — the standard approximation).

    Docs with fewer than ``n`` words produce no row (no grams exist).
    Scale: one shuffle keyed by (doc, gram) then by doc — uniformly
    distributed, no corpus-wide hot key; partial aggregation applies.
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    c = F.lower(F.col(text_col))
    words = F.filter(
        F.split(ws_trim(c), r"[\t\n\f\r ]+"), lambda w: F.length(w) > 0
    )
    wchars = F.aggregate(
        words, F.lit(0).cast("long"), lambda a, w: a + F.length(w)
    )
    grams_arr = F.when(
        F.size(words) < n, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(
                F.lit(1), F.greatest(F.size(words) - F.lit(n - 1), F.lit(1))
            ),
            lambda i: F.array_join(F.slice(words, i, n), " "),
        )
    )
    g = df.select(
        F.col(id_col), wchars.alias("wchars"), F.explode(grams_arr).alias("gram")
    )
    counts = g.groupBy(id_col, "gram").agg(
        F.count(F.lit(1)).alias("cnt"), F.first("wchars").alias("wchars")
    )
    # gram char length net of the n-1 separator spaces we joined with
    gram_chars = F.length(F.col("gram")) - F.lit(n - 1)
    occ_chars = F.col("cnt") * gram_chars
    agg = counts.groupBy(id_col).agg(
        F.min_by(
            F.struct(F.col("gram"), F.col("cnt")),
            F.struct((-F.col("cnt")).alias("nc"), F.col("gram").alias("g")),
        ).alias("top"),
        F.first("wchars").alias("wchars"),
        (
            F.sum(F.when(F.col("cnt") > 1, occ_chars).otherwise(F.lit(0)))
            / F.sum(occ_chars)
        ).alias("dup_ngram_char_frac"),
    )
    return agg.select(
        F.col(id_col),
        F.col("top.gram").alias("top_gram"),
        F.col("top.cnt").alias("top_count"),
        (
            F.col("top.cnt")
            * (F.length("top.gram") - F.lit(n - 1))
            / F.col("wchars")
        ).alias("top_ngram_char_frac"),
        "dup_ngram_char_frac",
    )


def top_ngram_sql(
    id_expr: str, col_expr: str, table: str, n: int = 3
) -> str:
    """DuckDB twin of :func:`top_ngram_stats` (same tie-break)."""
    words = (
        f"list_filter(string_split_regex(trim(lower({col_expr}), "
        f"E' \\t\\n\\f\\r'), '[\\t\\n\\f\\r ]+'), w -> length(w) > 0)"
    )
    return f"""
WITH w AS (
  SELECT {id_expr} AS doc_id, {words} AS words FROM {table}
),
wc AS (
  SELECT doc_id, words,
         coalesce(list_sum(list_transform(words, x -> length(x))), 0) AS wchars
  FROM w
),
g AS (
  SELECT doc_id, wchars, array_to_string(words[i : i + {n - 1}], ' ') AS gram
  FROM wc, unnest(range(1, greatest(len(words) - {n - 1}, 0) + 1)) AS u(i)
),
c AS (
  SELECT doc_id, gram, any_value(wchars) AS wchars, count(*) AS cnt
  FROM g GROUP BY doc_id, gram
),
a AS (
  SELECT doc_id, any_value(wchars) AS wchars,
         sum(CASE WHEN cnt > 1 THEN cnt * (length(gram) - {n - 1})
             ELSE 0 END)::DOUBLE
           / sum(cnt * (length(gram) - {n - 1})) AS dup_ngram_char_frac
  FROM c GROUP BY doc_id
),
t AS (
  SELECT doc_id, gram, cnt FROM c
  QUALIFY row_number() OVER (PARTITION BY doc_id
                             ORDER BY cnt DESC, gram ASC) = 1
)
SELECT t.doc_id, t.gram AS top_gram, t.cnt AS top_count,
       t.cnt * (length(t.gram) - {n - 1}) / a.wchars::DOUBLE
         AS top_ngram_char_frac,
       a.dup_ngram_char_frac
FROM t JOIN a USING (doc_id)
"""


# ---------------------------------------------------------------------------
# winnowing fingerprints
# ---------------------------------------------------------------------------


def winnow_fingerprints_pos(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    w: int = 4,
) -> DataFrame:
    """Positional winnowing fingerprints (Schleimer et al. 2003
    scheme): hash all char ``k``-grams of the normalized text, slide a
    window of ``w`` hashes, keep each window's minimum.

    Returns ``(id, pos, fp LONG)`` — one row per distinct (id, fp)
    with ``pos`` = the smallest window-start position (0-based, in the
    NORMALIZED text) whose window selected ``fp``. The single
    definition of the winnowing scheme: the non-positional
    :func:`winnow_fingerprints` and the span detector in
    ``pipeline/dedup`` both derive from it. Normalization = lowercase
    + collapse whitespace runs to one space (so formatting doesn't
    change fingerprints).
    """
    c = F.regexp_replace(
        F.lower(F.col(text_col)), r"[\t\n\f\r ]+", " "
    )
    n_grams = F.length(c) - F.lit(k - 1)
    # NB: Spark sequence(1, 0) yields [1, 0] (auto-descending) — guard
    # short texts explicitly so they produce zero grams, like the
    # oracle; NULL text must ALSO take the empty branch (a NULL
    # condition falls through to otherwise, which would emit one
    # NULL-hash gram the SQL twin doesn't).
    gram_hashes = F.when(
        c.isNull() | (n_grams <= 0), F.array().cast("array<long>")
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
        .groupBy(id_col, "fp")
        .agg(F.min("pos").alias("pos"))
        .select(id_col, "pos", "fp")
    )


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints ``(id, fp LONG)`` — typically
    ~2/(w+1) of the k-gram hashes per doc; the positionless projection
    of :func:`winnow_fingerprints_pos` (one row per distinct (id, fp)
    either way)."""
    return winnow_fingerprints_pos(
        df, id_col=id_col, text_col=text_col, k=k, w=w
    ).select(id_col, "fp")


def winnow_ctes(id_expr: str, col_expr: str, table: str, k: int = 8, w: int = 4) -> str:
    """Shared DuckDB CTE prefix of the winnowing scheme — ends with
    CTE ``wins`` = (doc_id, pos, fp). Single SQL-side definition,
    used by :func:`winnow_sql` and ``dedup.shared_span_sql``."""
    norm = f"regexp_replace(lower({col_expr}), '[\\t\\n\\f\\r ]+', ' ', 'g')"
    return f"""norm AS (
  SELECT {id_expr} AS doc_id, {norm} AS t FROM {table}
),
grams AS (
  SELECT doc_id, i AS pos,
         {hash60_sql(f"substr(t, i, {k})")} AS h
  FROM norm, unnest(range(1, greatest(length(t) - {k - 1}, 0) + 1)) AS u(i)
),
wins AS (
  SELECT doc_id, pos,
         min(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS fp
  FROM grams
)"""


def winnow_sql(id_expr: str, col_expr: str, table: str, k: int = 8, w: int = 4) -> str:
    """DuckDB twin of :func:`winnow_fingerprints`."""
    return f"""
WITH {winnow_ctes(id_expr, col_expr, table, k, w)}
SELECT DISTINCT doc_id, fp FROM wins
"""


# ---------------------------------------------------------------------------
# C4-style heuristic filters
# ---------------------------------------------------------------------------

# Raffel et al. 2020 (T5 / C4, §2.2) cleaning heuristics, re-expressed
# as pure column math. Line rules keep lines that (a) end in terminal
# punctuation and (b) have >= min_line_words words; doc rules flag docs
# with fewer than min_sentences sentences or containing any blocklisted
# substring (C4 used "lorem ipsum", "{" and a badword list; the list
# here is a parameter, not a policy).

C4_TERMINAL_PUNCT = (".", "!", "?", '"')
C4_DEFAULT_BLOCKLIST = ("lorem ipsum", "{")


def c4_line_filter(
    text: Column | str, min_line_words: int = 5
) -> Column:
    """Rebuild the text from the lines C4 keeps (terminal punctuation +
    word minimum), joined with ``\\n``. Docs with no surviving line
    become the empty string. Pure array math — no shuffle."""
    c = F.col(text) if isinstance(text, str) else text
    lines = F.transform(F.split(c, r"\n"), ws_trim)
    ends_ok = lambda l: F.substring(l, -1, 1).isin(*C4_TERMINAL_PUNCT)  # noqa: E731
    long_enough = lambda l: ws_token_count_col(l) >= min_line_words  # noqa: E731
    kept = F.filter(lines, lambda l: ends_ok(l) & long_enough(l))
    return F.array_join(kept, "\n")


def c4_doc_flags(
    text: Column | str,
    min_sentences: int = 3,
    blocklist: tuple[str, ...] = C4_DEFAULT_BLOCKLIST,
) -> dict[str, Column]:
    """Document-level C4 flags: sentence count (terminal-punctuation
    runs), blocklist hit, and the combined keep decision."""
    c = F.col(text) if isinstance(text, str) else text
    n_sentences = F.coalesce(
        F.regexp_count(c, F.lit(r"[.!?]+")), F.lit(0)
    )
    lower = F.lower(c)
    blocked = F.lit(False)
    for term in blocklist:
        blocked = blocked | lower.contains(term.lower())
    return {
        "n_sentences": n_sentences.cast("bigint"),
        "blocklisted": blocked,
        "c4_keep": (n_sentences >= min_sentences) & ~blocked,
    }


def c4_line_filter_sql(col_expr: str, min_line_words: int = 5) -> str:
    """DuckDB twin of :func:`c4_line_filter`."""
    punct_list = ", ".join(f"'{p}'" for p in C4_TERMINAL_PUNCT)
    tc = token_count_sql("l")["ws_tokens"]
    # coalesce: DuckDB's array_to_string([]) is NULL, Spark's is ''
    return (
        f"coalesce(array_to_string(list_filter(list_transform("
        f"string_split({col_expr}, chr(10)), "
        f"x -> trim(x, E' \\t\\n\\f\\r')), "
        f"l -> substr(l, length(l), 1) IN ({punct_list}) "
        f"AND ({tc}) >= {min_line_words}), chr(10)), '')"
    )


def c4_doc_flags_sql(
    col_expr: str,
    min_sentences: int = 3,
    blocklist: tuple[str, ...] = C4_DEFAULT_BLOCKLIST,
) -> dict[str, str]:
    """DuckDB twins of :func:`c4_doc_flags` (same names, same logic)."""
    n_sent = f"len(regexp_extract_all({col_expr}, '[.!?]+'))"
    blocked = " OR ".join(
        "contains(lower({}), '{}')".format(
            col_expr, t.lower().replace("'", "''")
        )
        for t in blocklist
    ) or "false"
    return {
        "n_sentences": f"({n_sent})::BIGINT",
        "blocklisted": f"({blocked})",
        "c4_keep": f"(({n_sent}) >= {min_sentences} AND NOT ({blocked}))",
    }


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# Patterns restricted to syntax Java regex (Spark) and RE2 (DuckDB)
# interpret identically: no backrefs, no lookaround. Policy lives with
# the caller — these are the mechanical defaults a release pipeline
# starts from (emails, bare IPv4s), not a compliance guarantee.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
)


def redact_pii(text: Column | str) -> dict[str, Column]:
    """``redacted`` text plus per-type match counts — pure column math.

    Counting and replacement CHAIN in declaration order: each pattern
    is counted on (and removed from) the text as redacted by the
    earlier rules, so text matched by an earlier rule is consumed
    exactly once — ``1.2.3.4@x.co`` counts as one email, zero IPs —
    and the SQL twin chains identically. NULL text yields 0 counts in
    both engines (and a NULL ``redacted``).
    """
    c = F.col(text) if isinstance(text, str) else text
    out: dict[str, Column] = {}
    red = c
    for name, pat, token in PII_PATTERNS:
        out[f"n_{name}"] = F.coalesce(
            F.regexp_count(red, F.lit(pat)), F.lit(0)
        ).cast("bigint")
        red = F.regexp_replace(red, pat, token)
    out["redacted"] = red
    return out


def redact_pii_sql(col_expr: str) -> dict[str, str]:
    """DuckDB twin of :func:`redact_pii` (same names, same chaining)."""
    out: dict[str, str] = {}
    red = col_expr
    for name, pat, token in PII_PATTERNS:
        # DuckDB single-quoted literals are escape-free: pass the
        # pattern verbatim, only double embedded quotes
        esc = pat.replace("'", "''")
        # coalesce: NULL text must count 0 like the Spark side
        out[f"n_{name}"] = (
            f"coalesce(len(regexp_extract_all({red}, '{esc}')), 0)::BIGINT"
        )
        red = f"regexp_replace({red}, '{esc}', '{token}', 'g')"
    out["redacted"] = red
    return out
