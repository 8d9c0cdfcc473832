"""Boundary pins for the day-bucketed gaps-and-islands helper
(events_analytics._error_islands, r4): the partitioned numbering must
equal the single-window formulation EXACTLY, including incidents that
cross midnight and days whose first event continues the previous day's
incident — the code paths the fixture only exercises incidentally.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from nzwirelessmap_fetch_spark.operators.events_analytics import (
    INCIDENT_GAP_US,
    _error_islands,
)


def _frame(spark, ts_list):
    pdf = pd.DataFrame(
        {
            "event_id": range(len(ts_list)),
            "ts": pd.to_datetime(ts_list, utc=True, format="ISO8601").tz_localize(
                None
            ),
        }
    )
    return spark.createDataFrame(pdf)


def _single_window_islands(df):
    """The reference formulation: one unpartitioned window."""
    us = F.unix_micros(F.col("ts"))
    w = Window.orderBy("ts", "event_id")
    gap = us - F.lag(us).over(w)
    return df.withColumn(
        "inc_id_ref",
        F.sum(
            F.when(gap.isNull() | (gap > INCIDENT_GAP_US), 1).otherwise(0)
        ).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )


CASES = {
    "midnight_crossing_incident": [
        # one incident straddling the day boundary (gaps < 30 min)
        "2024-03-01 23:40:00",
        "2024-03-01 23:55:00",
        "2024-03-02 00:10:00",
        "2024-03-02 00:20:00",
        # then a fresh incident later that day
        "2024-03-02 09:00:00",
    ],
    "first_event_of_day_starts_new": [
        "2024-03-01 10:00:00",
        "2024-03-01 10:10:00",
        # next day's first event is > 30 min after — NEW incident
        "2024-03-02 10:00:00",
    ],
    "empty_day_between": [
        # previous NON-EMPTY day is 2 days back; still merges iff gap small
        "2024-03-01 23:50:00",
        "2024-03-03 00:05:00",  # > 30 min → new incident
        "2024-03-03 00:15:00",
    ],
    "exact_gap_boundary": [
        # gap EXACTLY 30 min: > is strict, so same incident
        "2024-03-01 12:00:00",
        "2024-03-01 12:30:00",
        # 30 min + 1 µs later: new incident
        "2024-03-01 13:00:00.000001",
    ],
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_partitioned_islands_match_single_window(spark, name):
    df = _frame(spark, CASES[name])
    got = {
        r.event_id: r.inc_id for r in _error_islands(df).collect()
    }
    ref = {
        r.event_id: r.inc_id_ref
        for r in _single_window_islands(df).collect()
    }
    assert got == ref, (name, got, ref)


def test_islands_parallel_window_is_day_partitioned(spark):
    """The scale claim: the per-event windows are PARTITIONED (hash
    exchange on day); the only single-partition window runs on the
    |days|-sized summary, never the event grain."""
    df = _frame(spark, CASES["midnight_crossing_incident"])
    plan = (
        _error_islands(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "hashpartitioning(day#" in plan  # event-grain windows: parallel
