"""Ingestion sources S1-S3 (quotes / CSV / JSONL)."""

from __future__ import annotations

import json

from same_same_spark.sources import (
    read_csv_source,
    read_jsonl_source,
    read_quotes_source,
)


def test_quotes_source(spark, tmp_path):
    p = tmp_path / "quotes.txt"
    p.write_text(
        "Imagination is more important than knowledge. — Albert Einstein\n"
        "\n"
        "malformed line without separator\n"
        "Two — separators — here\n"
        "   — author only\n"
        "Stay hungry, stay foolish. — Steve Jobs\n"
    )
    df = read_quotes_source(spark, str(p))
    rows = df.collect()
    # 2 well-formed; the 2-separator line has 3 parts → skipped;
    # author-only has empty text → skipped
    assert len(rows) == 2
    by_author = {r["metadata"]["author"]: r for r in rows}
    assert set(by_author) == {"Albert Einstein", "Steve Jobs"}
    r = by_author["Steve Jobs"]
    assert r["text"] == "Stay hungry, stay foolish."
    assert r["metadata"]["namespace"] == "quotes"
    assert r["id"].startswith("quote_")


def test_csv_source(spark, tmp_path):
    p = tmp_path / "data.csv"
    p.write_text(
        "text,author,year\n"
        "hello world,alice,1999\n"
        ",bob,2000\n"  # empty text → skipped (F5)
        "second row,carol,2001\n"
    )
    df = read_csv_source(spark, str(p))
    rows = df.collect()
    assert len(rows) == 2
    by_text = {r["text"]: r["metadata"] for r in rows}
    assert by_text["hello world"]["author"] == "alice"
    assert by_text["hello world"]["year"] == "1999"  # stringly-typed
    assert by_text["second row"]["namespace"] == "general"


def test_csv_source_custom_text_column(spark, tmp_path):
    p = tmp_path / "d.csv"
    p.write_text("quote,who\nto be or not,shakespeare\n")
    df = read_csv_source(spark, str(p), text_column="quote")
    [r] = df.collect()
    assert r["text"] == "to be or not"
    assert r["metadata"]["who"] == "shakespeare"
    import pytest

    with pytest.raises(ValueError):
        read_csv_source(spark, str(p), text_column="nope")


def test_jsonl_source_fallback_and_skips(spark, tmp_path):
    p = tmp_path / "d.jsonl"
    lines = [
        {"text": "primary field", "author": "a", "year": 1999},
        {"content": "fallback content", "flag": True},
        {"body": "fallback body", "nested": {"x": 1}, "arr": [1, 2]},
        {"author": "no text at all"},
    ]
    p.write_text("\n".join(json.dumps(x) for x in lines) + "\nnot json at all\n")
    df = read_jsonl_source(spark, str(p))
    rows = df.collect()
    texts = {r["text"] for r in rows}
    assert texts == {"primary field", "fallback content", "fallback body"}
    by_text = {r["text"]: r["metadata"] for r in rows}
    assert by_text["primary field"]["author"] == "a"
    assert by_text["primary field"]["year"] == "1999"  # scalar → string
    assert by_text["fallback content"]["flag"] in ("true", "True")
    assert "nested" not in by_text["fallback body"]  # non-scalar skipped
    assert "arr" not in by_text["fallback body"]


def test_hf_export_source(spark, tmp_path):
    """S4 offline adapter over the JSONL shape the reference's generated
    script dumps (huggingface.go:121-146) with its record mapping
    (huggingface.go:156-202)."""
    from same_same_spark.sources import read_hf_export_source

    p = tmp_path / "hf.jsonl"
    lines = [
        {"text": "alpha bravo", "label": 1, "lang": "en"},
        {"text": "charlie delta", "label": 0, "lang": "fr", "deep": {"x": 1}},
        {"label": 2},            # text missing → skipped
        {"text": "", "label": 3},  # empty text → skipped (F5)
    ]
    p.write_text("\n".join(json.dumps(x) for x in lines) + "\nbroken{\n")
    df = read_hf_export_source(
        spark, str(p), dataset="imdb", namespace="hf-ns"
    )
    rows = df.collect()
    assert {r["text"] for r in rows} == {"alpha bravo", "charlie delta"}
    meta = {r["text"]: r["metadata"] for r in rows}
    assert meta["alpha bravo"]["label"] == "1"
    assert meta["alpha bravo"]["source"] == "huggingface"
    assert meta["alpha bravo"]["dataset"] == "imdb"
    assert meta["alpha bravo"]["namespace"] == "hf-ns"
    assert "deep" not in meta["charlie delta"]  # nested skipped
    assert all(r["id"].startswith("vec_") and len(r["id"]) == 20 for r in rows)
    # missing text field name → hard error (huggingface.go text assertion)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        read_hf_export_source(spark, str(p), dataset="x", text_field="nope")
