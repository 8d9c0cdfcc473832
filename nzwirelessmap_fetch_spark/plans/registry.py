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
    # Optional SEQUENCED gate oracle: a list of SQL statements (temp-table
    # setup steps + a final SELECT) semantically equal to ``oracle`` but
    # with one heavy pipeline per statement, so DuckDB's peak spill is one
    # pipeline's, not their sum (r7 sf1 gate: the one-shot
    # dedup_lsh_quality_eval oracle filled the disk while each half alone
    # fit). Used only by tools/check_queries.py under
    # SPARK_GRAFT_ORACLE_SEQ=1; the driver always runs ``oracle``.
    oracle_steps: tuple[str, ...] | None = None


_REGISTRY: dict[str, Entry] = {}


def register(
    name: str,
    fn: QueryFn,
    oracle: str | None,
    *,
    scale_profile: str = "scale_safe",
    scale_twin: str | None = None,
    oracle_steps: list[str] | tuple[str, ...] | None = None,
) -> None:
    if name in _REGISTRY:
        raise ValueError(f"duplicate query name {name!r}")
    if scale_profile not in ("scale_safe", "exact_measure"):
        raise ValueError(f"unknown scale_profile {scale_profile!r}")
    if oracle_steps is not None and oracle is None:
        raise ValueError("oracle_steps requires a one-shot oracle to mirror")
    _REGISTRY[name] = Entry(
        fn,
        oracle,
        scale_profile,
        scale_twin,
        tuple(oracle_steps) if oracle_steps is not None else None,
    )


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


def oracle_gate_steps() -> dict[str, tuple[str, ...]]:
    """Sequenced gate oracles (see Entry.oracle_steps): statement lists
    for the large-SF gate harness. Empty for almost every entry — only
    oracles whose one-shot form runs multiple disk-spilling pipelines
    concurrently register one."""
    _load_all()
    return {
        name: e.oracle_steps
        for name, e in _REGISTRY.items()
        if e.oracle_steps is not None
    }


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
