"""U3 — pluggable analyzer registry.

Re-expresses the reference's embedder factory
(``internal/server/server.go:73-91``, ``cmd/.../ingest.go:200-247``):
implementations are selected by name / ``SAME_SAME_ANALYZER`` env var,
unknown names fall back to the deterministic local analyzer, and the
network-backed implementations (gemini / huggingface HTTP, CLIP
subprocess) are registered as explicit unavailable stubs — only the
deterministic local analyzer participates in goldens (SURVEY §2.8 U3).

An analyzer bundles the three equivalent tokenizer forms the engine
uses (JVM Column, pure-Python, DuckDB SQL fragment) so every execution
path stays bit-identical.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column

from same_same_spark.text import tokenizer as _t

ENV_VAR = "SAME_SAME_ANALYZER"  # reference: EMBEDDER_TYPE (server.go:74)


@dataclass(frozen=True)
class Analyzer:
    name: str
    tokens_col: Callable[[Column | str], Column]
    tokenize_py: Callable[[str | None], list[str]]
    duckdb_sql: Callable[[str], str]
    version: str


def _unavailable(name: str, why: str) -> "Analyzer":
    def _raise(*_a, **_k):
        raise NotImplementedError(
            f"analyzer {name!r} is not available in this environment: {why}"
        )

    return Analyzer(
        name=name, tokens_col=_raise, tokenize_py=_raise, duckdb_sql=_raise,
        version="unavailable",
    )


LOCAL = Analyzer(
    name="local",
    tokens_col=_t.tokens_col,
    tokenize_py=_t.tokenize_py,
    duckdb_sql=_t.duckdb_tokens_sql,
    version="x1-v1",
)

_REGISTRY: dict[str, Analyzer] = {
    "local": LOCAL,
    # network/subprocess embedders from the reference — declared so a
    # user of the reference finds their names, but non-deterministic
    # and unavailable offline (gemini.go:44-105, huggingface.go:30-38,
    # clip/clip.go:32-47):
    "gemini": _unavailable("gemini", "requires the Gemini HTTP API"),
    "huggingface": _unavailable(
        "huggingface", "requires the HuggingFace inference API"
    ),
    "clip": _unavailable("clip", "requires a Python CLIP subprocess"),
}


def register(analyzer: Analyzer) -> None:
    _REGISTRY[analyzer.name] = analyzer


def get_analyzer(name: str | None = None) -> Analyzer:
    """Resolve by explicit name → env var → default; unknown names fall
    back to local, mirroring the reference factory's default branch
    (server.go:87-90)."""
    name = name or os.environ.get(ENV_VAR) or "local"
    return _REGISTRY.get(name, LOCAL)
