"""URL canonicalization + URL-keyed dedup (RefinedWeb/CCNet-style).

Web-scale corpora dedup by URL before ever touching content: the same
page is crawled many times behind tracking parameters, fragments,
default ports, ``www.`` aliases and trailing slashes. This module
canonicalizes URLs with ONE ordered regex pipeline declared as data
(`_RULES`) and rendered twice — Java-regex Column chain for Spark,
RE2-flavoured SQL chain for DuckDB oracles — exactly the dual-syntax
discipline ``textqc.redact_pii`` established (no lookarounds, no
engine-specific escapes; replacement backrefs are ``$1`` in Java and
``\\1`` in DuckDB, handled per side).

This is a pragmatic normalizer, not an RFC 3986 parser: it lowercases
the scheme+authority, strips fragments / default ports / ``www.`` /
the common tracking parameters / trailing slashes, and is idempotent
(property-tested). Everything is per-row column math — no shuffle,
pushes into the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "canonicalize_url_col",
    "canonicalize_url_sql",
    "dedup_by_url",
    "url_host_col",
    "url_host_sql",
]

_TRACK = "utm_[a-zA-Z0-9_]*|fbclid|gclid|msclkid|mc_eid"
_AUTH = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*"

# Ordered rewrite rules applied AFTER the scheme+authority lowercasing
# step: (pattern, java_replacement, duckdb_replacement). Patterns stay
# inside the Java-regex ∩ RE2 common subset (no lookarounds); Spark's
# regexp_replace is always global, so the SQL twin passes 'g'
# everywhere (harmless on the ^/$-anchored single-match rules).
_RULES: list[tuple[str, str, str]] = [
    # fragment
    (r"#.*$", "", ""),
    # www. alias ('://' occurs once, so global replace is safe)
    (r"://www\.", "://", "://"),
    # default ports (explicit capture, no lookahead — RE2-safe)
    (r"^(http://[^/?#]*):80([/?#].*)?$", "$1$2", r"\1\2"),
    (r"^(https://[^/?#]*):443([/?#].*)?$", "$1$2", r"\1\2"),
    # tracking params: (a) non-leading, all occurrences
    (rf"&({_TRACK})=[^&#]*", "", ""),
    # (b) leading with a successor -> successor becomes leading
    (rf"\?({_TRACK})=[^&#]*&", "?", "?"),
    # (c) leading and alone
    (rf"\?({_TRACK})=[^&#]*$", "", ""),
    # leftover dangling separators, then trailing slash
    (r"[?&]$", "", ""),
    (r"/$", "", ""),
]


def canonicalize_url_col(url: Column | str) -> Column:
    """Canonical form of ``url`` as a Column (NULL stays NULL)."""
    c = F.col(url) if isinstance(url, str) else url
    c = F.trim(c)
    auth = F.regexp_extract(c, _AUTH, 0)
    c = F.concat(F.lower(auth), F.regexp_replace(c, _AUTH, ""))
    for pat, java_rep, _duck_rep in _RULES:
        c = F.regexp_replace(c, pat, java_rep)
    return c


def canonicalize_url_sql(col_expr: str) -> str:
    """DuckDB twin of :func:`canonicalize_url_col` (same rule table).

    DuckDB single-quoted literals are escape-free — patterns and
    ``\\1``-style replacements pass verbatim, only embedded quotes
    double (the redact_pii_sql discipline)."""
    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    c = f"trim({col_expr})"
    c = (
        f"(lower(regexp_extract({c}, {q(_AUTH)}, 0)) || "
        f"regexp_replace({c}, {q(_AUTH)}, ''))"
    )
    for pat, _java_rep, duck_rep in _RULES:
        c = f"regexp_replace({c}, {q(pat)}, {q(duck_rep)}, 'g')"
    return c


def dedup_by_url(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep one row per canonical URL (min id; NULL urls always kept).

    One shuffle keyed by the 60-bit canonical-URL hash, first-occurrence
    keep via the same skew-proof composite-key semi-join as the global
    line dedup (a hot URL's copies spread across partitions). Returns
    the surviving rows with an added ``url_canonical`` column.
    """
    from same_same_spark.pipeline.dedup import hash60_col

    base = df.withColumn("url_canonical", canonicalize_url_col(url_col))
    cand = base.filter(F.col("url_canonical").isNotNull()).withColumn(
        "__h", hash60_col(F.col("url_canonical"))
    )
    firsts = cand.groupBy("__h").agg(F.min(F.col(id_col)).alias(id_col))
    kept = cand.join(
        firsts, ["__h", id_col], "left_semi"
    ).drop("__h")
    return kept.unionByName(base.filter(F.col("url_canonical").isNull()))


def url_host_col(url: Column | str, *, canonical: bool = False) -> Column:
    """Registrable host of ``url`` ('' when no authority): canonicalize
    first (unless the input already is canonical), then take the
    authority's host part, dropping userinfo and port. Feed this as
    ``strata_col`` to ``sampling.sample_quota`` /
    ``sample_stratified`` for per-domain crawl budgets — the
    RefinedWeb/C4 companion policy to URL dedup."""
    c = F.col(url) if isinstance(url, str) else url
    if not canonical:
        c = canonicalize_url_col(c)
    auth = F.regexp_extract(c, r"^[a-z][a-z0-9+.\-]*://([^/?#]*)", 1)
    no_user = F.regexp_replace(auth, r"^[^@]*@", "")
    return F.regexp_replace(no_user, r":[0-9]+$", "")


def url_host_sql(col_expr: str, *, canonical: bool = False) -> str:
    """DuckDB twin of :func:`url_host_col` (same three patterns; all
    RE2 ∩ Java-regex safe, so both engines extract the same host)."""
    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    c = col_expr if canonical else canonicalize_url_sql(col_expr)
    auth_pat = q(r"^[a-z][a-z0-9+.\-]*://([^/?#]*)")
    auth = f"regexp_extract({c}, {auth_pat}, 1)"
    no_user = f"regexp_replace({auth}, {q('^[^@]*@')}, '', 'g')"
    return f"regexp_replace({no_user}, {q(':[0-9]+$')}, '', 'g')"
