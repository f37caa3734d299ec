"""Query registry: the single source of truth behind __spark_entry__.py.

Each query is a named callable ``(spark, sf_dir) -> DataFrame`` with an
optional DuckDB oracle SQL string. Registering both together keeps the
column-name/alias contract (driver hashes columns by name) in one place.

Usage:
    @query("q1_pricing_summary", oracle=\"\"\"SELECT ...\"\"\")
    def q1(spark, sf_dir): ...
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return dict(_ORACLES)


_loaded = False


def _ensure_loaded() -> None:
    """Import every query module exactly once (registration side effect)."""
    global _loaded
    if _loaded:
        return
    from . import relational  # noqa: F401
    from . import relational_ext  # noqa: F401
    from . import relational_ext2  # noqa: F401
    from . import relational_ext3  # noqa: F401
    from . import events  # noqa: F401
    from . import textops  # noqa: F401
    from . import similarity  # noqa: F401
    from . import pipeline_queries  # noqa: F401

    _loaded = True


def run(spark: SparkSession, name: str, sf_dir: str) -> DataFrame:
    _ensure_loaded()
    return _QUERIES[name](spark, sf_dir)


def summary() -> dict[str, Any]:
    _ensure_loaded()
    return {
        "n_queries": len(_QUERIES),
        "n_with_oracle": len(_ORACLES),
        "rows_only": sorted(set(_QUERIES) - set(_ORACLES)),
    }
