"""Central registry mapping operator names → (Spark callable, oracle SQL).

Every operator claimed done in SURVEY.md §2 appears here; the driver runs
both sides at sf0.01 and hash-compares. Non-SQL-expressible operators
register with ``oracle=None`` (driver falls back to a rows-only check).

Column-name discipline: the driver sorts columns by name before hashing, so
the Spark DataFrame and the oracle SQL must produce identical column names —
every computed column is aliased on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Entry:
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check


_REGISTRY: dict[str, Entry] = {}


def register(name: str, fn: QueryFn, oracle: str | None) -> None:
    if name in _REGISTRY:
        raise ValueError(f"duplicate query name {name!r}")
    _REGISTRY[name] = Entry(fn, oracle)


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    if _REGISTRY:
        return
    from . import suite_registration  # noqa: F401  (side-effect imports)


def queries() -> dict[str, QueryFn]:
    _load_all()
    return {name: e.fn for name, e in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {name: e.oracle for name, e in _REGISTRY.items() if e.oracle is not None}
