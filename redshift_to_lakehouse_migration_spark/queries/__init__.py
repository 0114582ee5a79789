"""Query registry — the engine's user-facing query set.

Every module in this package contributes:
  - ``QUERIES``: dict[name, Callable[(SparkSession, sf_dir), DataFrame]]
  - ``ORACLES``: dict[name, str] — DuckDB-runnable ANSI SQL twin; keys absent
    here are non-SQL-expressible ops checked rows-only by the driver.

Each query re-expresses one operator family from SURVEY.md §2 over the
driver's TPC-H-ish tables (role mapping in FIXTURES.md §6), or one of the
LLM-pipeline extensions (dedup / similarity / text analysis / multimodal).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import (
    analytics,
    corpus,
    curation,
    dims,
    events,
    facts,
    governance,
    llm_dedup,
    llm_similarity,
    llm_text,
    multimodal,
    sampling,
    staging,
    tpch,
    windows,
)

_MODULES = (
    staging, facts, dims, analytics, tpch, windows, events, governance,
    llm_text, llm_dedup, llm_similarity, multimodal, sampling, curation,
    corpus,
)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

for _m in _MODULES:
    _q = getattr(_m, "QUERIES", {})
    _o = getattr(_m, "ORACLES", {})
    dup = set(_q) & set(QUERIES)
    if dup:
        raise ValueError(f"duplicate query names: {dup}")
    unknown = set(_o) - set(_q)
    if unknown:
        raise ValueError(f"oracles without queries: {unknown}")
    QUERIES.update(_q)
    ORACLES.update(_o)
