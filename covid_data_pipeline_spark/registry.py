"""Query registry — the single source of truth behind ``__spark_entry__``.

Each operator from SURVEY.md §2 registers here exactly once, pairing the
Spark implementation with its DuckDB oracle SQL (or ``None`` for
rows-only ops: approx sketches, filesystem side effects, true streaming).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, "QuerySpec"] = {}

# queries/ modules, in SURVEY §2 order; imported lazily by load_all().
_QUERY_MODULES = (
    "scans",
    "filters",
    "joins",
    "aggregates",
    "windows",
    "sorts",
    "setops",
    "scalars",
    "streaming_batch",
    "pipeline",
    "llm_dedup",
    "llm_similarity",
    "llm_text",
    "llm_multimodal",
    "udfs",
    "corpus",
    "training",
)


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    doc: str


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a (spark, sf_dir) -> DataFrame query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query id {name!r}")
        REGISTRY[name] = QuerySpec(name, fn, oracle, (fn.__doc__ or "").strip())
        return fn

    return deco


_loaded = False


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (idempotent) and return the registry."""
    global _loaded
    if not _loaded:
        for mod in _QUERY_MODULES:
            try:
                importlib.import_module(f"{__package__}.queries.{mod}")
            except ModuleNotFoundError as e:
                # tolerate not-yet-written modules during incremental build
                if f"queries.{mod}" not in str(e):
                    raise
        _loaded = True
    return REGISTRY
