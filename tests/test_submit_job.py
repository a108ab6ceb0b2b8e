"""End-to-end spark-submit --py-files smoke: the deployment shape the
north star mandates, exercised for real (fresh JVM, zipped package)."""

from __future__ import annotations

import json
import os
import shutil
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(
    shutil.which("spark-submit") is None, reason="spark-submit not on PATH"
)
def test_spark_submit_build_job(spark, tmp_path):
    from same_same_spark.corpus import generate_corpus
    from same_same_spark.session import package_zip

    corpus_path = str(tmp_path / "corpus")
    generate_corpus(spark, 300).write.parquet(corpus_path)
    out = str(tmp_path / "idx")

    proc = subprocess.run(
        [
            "spark-submit",
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", package_zip(),
            os.path.join(REPO, "scripts", "build_job.py"),
            "--input", corpus_path,
            "--out", out,
            "--buckets", "4",
        ],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    result = json.loads(
        [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    )
    assert result["n_docs"] == 300
    assert result["n_postings"] > 0
    assert os.path.exists(os.path.join(out, "manifest.json"))

    # the index a fresh-JVM spark-submit built is queryable from here
    from same_same_spark.index.query import search_batch

    rows = search_batch(spark, out, [(0, "import handler config")], k=5).collect()
    assert len(rows) == 5


@pytest.mark.skipif(
    shutil.which("spark-submit") is None, reason="spark-submit not on PATH"
)
def test_spark_submit_merge_job(spark, tmp_path):
    """Parallel build strategy end to end under the deployment shape:
    two partition builds (in-process) merged by a fresh-JVM
    spark-submit merge_job, result rank-identical to a union build."""
    from pyspark.sql import functions as F

    from same_same_spark.corpus import doc_id_col, generate_corpus
    from same_same_spark.index.build import build_index
    from same_same_spark.index.query import search_batch
    from same_same_spark.session import package_zip

    docs = generate_corpus(spark, 300).withColumn("doc_id", doc_id_col())
    da, db = str(tmp_path / "a"), str(tmp_path / "b")
    for d, part in ((da, 0), (db, 1)):
        build_index(
            docs.filter(F.pmod(F.col("doc_id"), F.lit(2)) == part), d,
            id_col="doc_id", text_col="content", num_buckets=4,
            log=lambda *_: None,
        )

    proc = subprocess.run(
        [
            "spark-submit",
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", package_zip(),
            os.path.join(REPO, "scripts", "merge_job.py"),
            "--dest", da,
            "--src", db,
        ],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    result = json.loads(
        [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    )
    assert result["n_docs"] == 300

    fresh = str(tmp_path / "fresh")
    build_index(docs, fresh, id_col="doc_id", text_col="content",
                num_buckets=4, log=lambda *_: None)
    q = [(0, "import handler config")]

    def canon(rows):
        return [
            (r["rank"], r["doc_id"], round(r["score"], 9)) for r in rows
        ]

    got = canon(search_batch(spark, da, q, k=10).collect())
    want = canon(search_batch(spark, fresh, q, k=10).collect())
    assert got == want
