"""Driver-contract checks: every ``__spark_entry__.queries()`` entry must
match its ``oracle_sql()`` twin on sf0.01 (row count + schema + values,
order-insensitive) — a local replica of the driver's CORRECTNESS gate."""

from __future__ import annotations

import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return c


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
    return (
        pdf.sort_values(by=list(pdf.columns))
        .reset_index(drop=True)
    )


def _assert_match(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame):
    """Mirror the driver's CORRECTNESS hash: dtype-exact, 6dp-rounded.

    The driver hashes canonicalized values exactly, so int64 vs float64
    drift (e.g. an uncast DuckDB HUGEINT sum) must FAIL here even though
    the numeric values agree — no isclose escape hatch.
    """
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} != oracle {len(oracle_pdf)}"
    )
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: columns {sorted(spark_pdf.columns)} != "
        f"{sorted(oracle_pdf.columns)}"
    )
    a, b = _canon(spark_pdf), _canon(oracle_pdf)
    for col in a.columns:
        av, bv = a[col], b[col]
        assert av.dtype.kind == bv.dtype.kind, (
            f"{name}.{col}: dtype kind {av.dtype} (spark) != "
            f"{bv.dtype} (oracle) — the driver hashes these differently"
        )
        if av.dtype.kind == "f":
            for i, (x, y) in enumerate(zip(av, bv)):
                if pd.isna(x) and pd.isna(y):
                    continue
                assert round(float(x), 6) == round(float(y), 6), (
                    f"{name}.{col}[{i}]: {x!r} != {y!r} at 6dp"
                )
        else:
            mism = (av.astype(str) != bv.astype(str))
            assert not mism.any(), (
                f"{name}.{col}: first mismatch at row "
                f"{mism.idxmax()}: {av[mism.idxmax()]!r} != {bv[mism.idxmax()]!r}"
            )


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert {"query_id", "doc_id", "score", "rank"} <= set(df.columns)


def test_oracle_keys_subset_of_queries():
    q, o = entrymod.queries(), entrymod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) > 0


def test_registry_rotation_contract():
    """Machine-check the registry contract (CLAUDE.md): an entry with no
    green driver CORRECTNESS row may sit past position 50 ONLY if its
    _TWIN_WITNESS chain reaches an entry that is driver-green or itself
    inside the top-50 — a future insert can no longer silently bury
    sole evidence in the tail."""
    import glob
    import json

    order = entrymod._ORDER
    witness = entrymod._TWIN_WITNESS
    assert len(order) == len(set(order))
    assert set(order) == set(entrymod._REGISTRY)
    assert list(entrymod.queries()) == order

    green: set[str] = set()
    for path in glob.glob("/root/repo/CORRECTNESS_r*.json"):
        for name, row in json.load(open(path)).items():
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                green.add(name)
    assert green, "no driver CORRECTNESS history found"

    pos = {name: i + 1 for i, name in enumerate(order)}

    top50_saturated = all(n not in green for n in order[:50])
    overflow = entrymod._SATURATION_OVERFLOW

    def covered(name: str, seen: frozenset[str] = frozenset()) -> bool:
        if name in green or pos[name] <= 50:
            return True
        if name in overflow:
            # second codified exception: legal ONLY while every top-50
            # slot is itself never-driver-verified sole evidence, and
            # only in the block immediately after the top-50 (so they
            # are first in line when a slot frees up)
            assert top50_saturated, (
                f"{name}: _SATURATION_OVERFLOW but a top-50 slot is "
                "driver-green — rotate this entry in"
            )
            assert pos[name] <= 50 + len(overflow), (
                f"{name}: saturation-overflow entries must sit "
                "immediately after position 50"
            )
            return True
        w = witness.get(name)
        if w is None or w == name or w in seen:
            return False
        assert w in pos, f"{name}: witness {w} not in registry"
        return covered(w, seen | {name})

    buried = [
        f"{n} (pos {pos[n]})" for n in order if not covered(n)
    ]
    assert not buried, (
        "never-driver-verified entries without a witness sit past 50: "
        + ", ".join(buried)
    )


def test_no_hugeint_oracle_columns(con):
    """DuckDB sum() over integers yields HUGEINT, which pandas turns into
    float64 while Spark returns int64 — the driver's exact hash then
    diverges even when values match (r4: corpus_profile). Reject the type
    class at the SQL boundary so the failure is impossible to reship."""
    banned = {"HUGEINT", "UHUGEINT"}
    offenders = []
    for name, sql in sorted(entrymod.oracle_sql().items()):
        desc = con.sql(f"DESCRIBE ({sql})").df()
        for _, row in desc.iterrows():
            if row["column_type"].upper() in banned:
                offenders.append(f"{name}.{row['column_name']}")
    assert not offenders, (
        "oracle columns with HUGEINT output (cast to ::BIGINT): "
        + ", ".join(offenders)
    )


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_matches_oracle(name, spark, con):
    fn = entrymod.queries()[name]
    spark_pdf = fn(spark, SF_DIR).toPandas()
    sql = entrymod.oracle_sql().get(name)
    if sql is None:
        assert len(spark_pdf) >= 0  # weaker rows-only check
        return
    oracle_pdf = con.sql(sql).df()
    _assert_match(name, spark_pdf, oracle_pdf)
