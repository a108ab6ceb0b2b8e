"""Driver-contract checks: every ``__spark_entry__.queries()`` entry must
match its ``oracle_sql()`` twin on sf0.01 (row count + schema + values,
order-insensitive) — a local replica of the driver's CORRECTNESS gate."""

from __future__ import annotations

import math
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
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            for i, (x, y) in enumerate(zip(av, bv)):
                ok = (pd.isna(x) and pd.isna(y)) or math.isclose(
                    float(x), float(y), rel_tol=0, abs_tol=1.5e-6
                )
                assert ok, f"{name}.{col}[{i}]: {x} != {y}"
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
