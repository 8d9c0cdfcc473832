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
    # 'scale_safe'  — the plan's fan-out is bounded (capped/banded/
    #                 blocked); safe to run as-is at 100 TB.
    # 'exact_measure' — computes the textbook unbounded measure; at
    #                 scale run the scale_twin instead.
    scale_profile: str = "scale_safe"
    scale_twin: str | None = None  # the name to run at 100 TB, if not self


_REGISTRY: dict[str, Entry] = {}


def register(
    name: str,
    fn: QueryFn,
    oracle: str | None,
    *,
    scale_profile: str = "scale_safe",
    scale_twin: str | None = None,
) -> None:
    if name in _REGISTRY:
        raise ValueError(f"duplicate query name {name!r}")
    if scale_profile not in ("scale_safe", "exact_measure"):
        raise ValueError(f"unknown scale_profile {scale_profile!r}")
    _REGISTRY[name] = Entry(fn, oracle, scale_profile, scale_twin)


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


def scale_profiles() -> dict[str, dict[str, str | None]]:
    """Per-entry scale metadata: which registry name to run at 100 TB.

    Most entries are 'scale_safe' (bounded fan-out as registered). The
    'exact_measure' entries compute a textbook unbounded-fan-out measure
    kept for measure-definition parity; their ``scale_twin`` names the
    oracle-checked capped/valved plan a 100 TB user should run instead
    (r4 verdict directive #5 — the scale-safe plan must be discoverable
    from the registry, not a docstring footnote)."""
    _load_all()
    return {
        name: {"scale_profile": e.scale_profile, "scale_twin": e.scale_twin}
        for name, e in _REGISTRY.items()
    }
