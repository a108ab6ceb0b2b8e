"""U3 analyzer registry."""

from __future__ import annotations

import pytest

from same_same_spark.text.registry import Analyzer, get_analyzer, register


def test_default_and_fallback(monkeypatch):
    monkeypatch.delenv("SAME_SAME_ANALYZER", raising=False)
    assert get_analyzer().name == "local"
    assert get_analyzer("nope-unknown").name == "local"  # server.go:87-90
    monkeypatch.setenv("SAME_SAME_ANALYZER", "local")
    assert get_analyzer().name == "local"


def test_local_analyzer_tokenizes():
    a = get_analyzer("local")
    assert a.tokenize_py("Hello, Wonderful World!") == ["hello", "wonderful", "world"]
    assert a.version == "x1-v1"


def test_unavailable_stubs_raise():
    for name in ("gemini", "huggingface", "clip"):
        a = get_analyzer(name)
        assert a.version == "unavailable"
        with pytest.raises(NotImplementedError, match=name):
            a.tokenize_py("x")


def test_register_custom():
    a = Analyzer(
        name="upper",
        tokens_col=lambda c: c,
        tokenize_py=lambda s: (s or "").upper().split(),
        duckdb_sql=lambda e: e,
        version="test",
    )
    register(a)
    assert get_analyzer("upper").tokenize_py("a b") == ["A", "B"]
