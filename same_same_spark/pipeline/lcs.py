"""Exact longest-common-substring (LCS) over candidate duplicate
pairs, via a suffix automaton — the round-5 "substring dedup" measure.

:func:`~same_same_spark.pipeline.dedup.shared_span_pairs` (winnowed
fingerprints) and :func:`minhash_dedup_pairs` (shingle Jaccard) both
DETECT that two docs share content but only bound how much.
:func:`lcs_pairs` answers the exact question — the length and position
of the single longest contiguous run of shared text — for each
candidate pair: build the suffix automaton of ``a`` (Blumer et al.
1985; the standard online O(|a|) construction), stream ``b`` through
it keeping the longest current match, done. O(|a| + |b|) per pair vs
the O(|a|·|b|) dynamic-programming table.

Pinned output contract (deterministic, engine-independent):

- ``lcs_len`` — exact maximal shared-substring length;
- ``b_start`` — the LEFTMOST maximal occurrence in ``b`` (the first
  stream position to reach the maximum is the earliest end, and equal
  lengths make earliest-end ⇔ earliest-start);
- ``a_start`` — the leftmost occurrence in ``a`` of that exact
  substring (``str.find``; re-derived, not automaton state, so clone
  bookkeeping can never skew it);
- no shared character → ``lcs_len = 0`` with NULL starts.

Spark shape: candidate pairs join their two texts (two hash joins on
the id — at scale these co-partition with the dedup shuffle that
produced the pairs), then ONE Arrow-batched ``mapInPandas`` runs the
automaton per pair. LCS is genuinely inexpressible in built-in
columns; per-pair linear-time Python on Arrow batches is the honest
fast path, and cost is linear in total candidate text (the pair list
is the output of a sub-linear candidate generator, never the n²
corpus). The DuckDB twin (:func:`lcs_sql_tail`) re-derives the same
answer relationally: per-pair character-match positions, runs along
``i − j`` diagonals (gaps-and-islands), max run with the pinned
tie-break — O(|a|·|b| / alphabet) rows, fine at oracle scale and
exactly equal by construction.

Reference parity: the reference has no substring measure (retrieval
only); this extends the training-pipeline dedup family
(SURVEY §8 LLM-pipeline table).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "lcs_of",
    "lcs_pairs",
    "lcs_strip",
    "lcs_strip_sql_ctes",
    "lcs_sql_ctes",
    "lcs_sql_tail",
]


class _SAM:
    """Suffix automaton of one string (online construction)."""

    __slots__ = ("nxt", "link", "ln", "last")

    def __init__(self, s: str):
        self.nxt: list[dict[str, int]] = [{}]
        self.link: list[int] = [-1]
        self.ln: list[int] = [0]
        self.last = 0
        for ch in s:
            self._extend(ch)

    def _extend(self, ch: str) -> None:
        nxt, link, ln = self.nxt, self.link, self.ln
        cur = len(ln)
        nxt.append({})
        link.append(-1)
        ln.append(ln[self.last] + 1)
        p = self.last
        while p != -1 and ch not in nxt[p]:
            nxt[p][ch] = cur
            p = link[p]
        if p == -1:
            link[cur] = 0
        else:
            q = nxt[p][ch]
            if ln[p] + 1 == ln[q]:
                link[cur] = q
            else:
                clone = len(ln)
                nxt.append(dict(nxt[q]))
                link.append(link[q])
                ln.append(ln[p] + 1)
                while p != -1 and nxt[p].get(ch) == q:
                    nxt[p][ch] = clone
                    p = link[p]
                link[q] = clone
                link[cur] = clone
        self.last = cur


def lcs_of(a: str | None, b: str | None) -> tuple[int, int | None, int | None]:
    """``(lcs_len, a_start, b_start)`` under the module contract.
    None/empty inputs are empty strings (lcs 0, NULL starts)."""
    a = a or ""
    b = b or ""
    if not a or not b:
        return 0, None, None
    sam = _SAM(a)
    nxt, link, ln = sam.nxt, sam.link, sam.ln
    v, cur = 0, 0
    best, best_end = 0, -1
    for j, ch in enumerate(b):
        while v and ch not in nxt[v]:
            v = link[v]
            cur = ln[v]
        if ch in nxt[v]:
            v = nxt[v][ch]
            cur += 1
        else:
            v, cur = 0, 0
        if cur > best:  # strict → FIRST stream position reaching max
            best, best_end = cur, j
    if best == 0:
        return 0, None, None
    b_start = best_end - best + 1
    return best, a.find(b[b_start : b_start + best]), b_start


def lcs_pairs(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(id_a, id_b, lcs_len, a_start, b_start)`` for every row of
    ``pairs`` (columns ``id_a``, ``id_b``) whose BOTH ids exist in
    ``df`` — inner joins, mirroring the candidate generators that only
    ever emit live ids."""
    t = df.select(F.col(id_col), F.col(text_col))
    joined = (
        pairs.select("id_a", "id_b")
        .join(
            t.select(
                F.col(id_col).alias("id_a"), F.col(text_col).alias("_ta")
            ),
            "id_a",
        )
        .join(
            t.select(
                F.col(id_col).alias("id_b"), F.col(text_col).alias("_tb")
            ),
            "id_b",
        )
        .select("id_a", "id_b", "_ta", "_tb")
    )

    # id columns keep the corpus id type (string ids are first-class —
    # api.SameSameSpark serves them); only the measures are LONG
    id_dt = df.schema[id_col].dataType.simpleString()
    schema = (
        f"id_a {id_dt}, id_b {id_dt}, "
        "lcs_len LONG, a_start LONG, b_start LONG"
    )

    def _run(batches):
        for pdf in batches:
            out = [lcs_of(a, b) for a, b in zip(pdf["_ta"], pdf["_tb"])]
            yield pd.DataFrame(
                {
                    "id_a": pdf["id_a"].to_numpy(),
                    "id_b": pdf["id_b"].to_numpy(),
                    "lcs_len": pd.array([o[0] for o in out], dtype="Int64"),
                    "a_start": pd.array([o[1] for o in out], dtype="Int64"),
                    "b_start": pd.array([o[2] for o in out], dtype="Int64"),
                }
            )

    return joined.mapInPandas(_run, schema)


def lcs_strip(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_chars: int = 20,
    with_stats: bool = False,
) -> DataFrame:
    """Strip the MEASURED pairwise overlap: for each candidate pair
    whose exact LCS is ≥ ``min_chars``, the min-id doc keeps its text
    and the other loses its occurrence of the shared substring (the
    leftmost maximal one the measurement pinned). A doc that is the
    larger id in several pairs strips the UNION of its ranges exactly
    once (the shared :func:`strip_char_ranges` stitcher). Compared to
    :func:`remove_shared_spans` this removes overlap that is NOT
    hash-identical as a whole span across ≥ min_df docs — e.g. a long
    quote two docs share with different surroundings."""
    from same_same_spark.pipeline.spans import strip_char_ranges

    measured = lcs_pairs(df, pairs, id_col=id_col, text_col=text_col).filter(
        F.col("lcs_len") >= min_chars
    )
    a_is_canon = F.col("id_a") < F.col("id_b")
    ranges = measured.select(
        F.when(a_is_canon, F.col("id_b")).otherwise(F.col("id_a")).alias(id_col),
        F.when(a_is_canon, F.col("b_start"))
        .otherwise(F.col("a_start"))
        .alias("start"),
        F.col("lcs_len").alias("span_len"),
    )
    return strip_char_ranges(
        df, ranges, id_col=id_col, text_col=text_col, with_stats=with_stats
    )


def lcs_strip_sql_ctes(
    docs: str = "dup", pairs: str = "pairs", min_chars: int = 20
) -> str:
    """DuckDB twin of :func:`lcs_strip` as a CTE fragment ending in
    ``clean`` = ``(doc_id, text, n_spans_removed, removed_chars)``."""
    from same_same_spark.pipeline.spans import strip_ranges_sql_ctes

    return f"""{lcs_sql_ctes(docs=docs, pairs=pairs)},
lcs_docs AS (SELECT doc_id, text FROM {docs}),
strips AS (
  SELECT CASE WHEN id_a < id_b THEN id_b ELSE id_a END AS doc_id,
         CASE WHEN id_a < id_b THEN b_start ELSE a_start END AS start,
         lcs_len AS span_len
  FROM lcs_out
  WHERE lcs_len >= {min_chars}
),
{strip_ranges_sql_ctes(docs="lcs_docs", strips="strips")}"""


def lcs_sql_tail(docs: str = "dup", pairs: str = "pairs") -> str:
    """DuckDB twin, as a CTE tail: given ``<docs>(doc_id, text)`` and
    ``<pairs>(id_a, id_b)`` CTEs, yields the final
    ``SELECT id_a, id_b, lcs_len, a_start, b_start``. Diagonal
    gaps-and-islands over character matches; tie-break
    (len DESC, b_start ASC) == the automaton's first-max rule;
    ``a_start`` via strpos == leftmost, exactly :func:`lcs_of`."""
    return f"""{lcs_sql_ctes(docs=docs, pairs=pairs)}
SELECT id_a, id_b, lcs_len, a_start, b_start FROM lcs_out
"""


def lcs_sql_ctes(docs: str = "dup", pairs: str = "pairs") -> str:
    """The CTE chain behind :func:`lcs_sql_tail`, ending at CTE
    ``lcs_out`` so composers (``lcs_strip_sql_ctes``) can keep
    building. Claims the ``lcs_*`` CTE names."""
    return f"""
lcs_pt AS (
  SELECT p.id_a, p.id_b,
         coalesce(a.text, '') AS ta, coalesce(b.text, '') AS tb
  FROM {pairs} p
  JOIN {docs} a ON a.doc_id = p.id_a
  JOIN {docs} b ON b.doc_id = p.id_b
),
lcs_ca AS (
  SELECT id_a, id_b, i, substr(ta, i::INTEGER, 1) AS ch
  FROM lcs_pt, unnest(range(1, len(ta) + 1)) AS u(i)
),
lcs_cb AS (
  SELECT id_a, id_b, j, substr(tb, j::INTEGER, 1) AS ch
  FROM lcs_pt, unnest(range(1, len(tb) + 1)) AS u(j)
),
lcs_m AS (
  SELECT a.id_a, a.id_b, a.i, b.j
  FROM lcs_ca a
  JOIN lcs_cb b
    ON b.id_a = a.id_a AND b.id_b = a.id_b AND b.ch = a.ch
),
lcs_runs AS (
  SELECT id_a, id_b, i - j AS diag, j,
         j - row_number() OVER (
           PARTITION BY id_a, id_b, i - j ORDER BY j
         ) AS isl
  FROM lcs_m
),
lcs_r AS (
  SELECT id_a, id_b, min(j) AS j1, count(*) AS rl
  FROM lcs_runs GROUP BY id_a, id_b, diag, isl
),
lcs_best AS (
  SELECT id_a, id_b, rl, j1,
         row_number() OVER (
           PARTITION BY id_a, id_b ORDER BY rl DESC, j1 ASC
         ) AS rn
  FROM lcs_r
),
lcs_out AS (
  SELECT pt.id_a, pt.id_b,
         coalesce(s.rl, 0) AS lcs_len,
         CASE WHEN s.rl IS NULL THEN NULL
              ELSE strpos(pt.ta, substr(pt.tb, s.j1::INTEGER, s.rl::INTEGER)) - 1
         END AS a_start,
         CASE WHEN s.rl IS NULL THEN NULL ELSE s.j1 - 1 END AS b_start
  FROM lcs_pt pt
  LEFT JOIN (SELECT * FROM lcs_best WHERE rn = 1) s
    ON s.id_a = pt.id_a AND s.id_b = pt.id_b
)"""
