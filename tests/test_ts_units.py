"""Both events.ts parquet-unit read paths (catalog.parquet_ts_unit).

The driver regenerates /root/testdata between rounds and has shipped
events.ts as TIMESTAMP(NANOS) (round 1) and TIMESTAMP(MICROS) (round 2).
The fixture set only ever exercises ONE branch, so the other would rot
unobserved — this test builds a tiny synthetic events dir per unit and
pins that both read paths agree on the truncated-to-micros value.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from nzwirelessmap_fetch_spark.catalog import Catalog, parquet_ts_unit

_BASE_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in micros
_SUB_US_NANOS = 789  # sub-microsecond tail, truncated by the ns read path


def _write_events(tmp_path, unit: str) -> str:
    ts_us = [_BASE_US + i for i in range(4)]
    if unit == "ns":
        ts = pa.array([t * 1000 + _SUB_US_NANOS for t in ts_us], pa.timestamp("ns"))
    else:
        ts = pa.array(ts_us, pa.timestamp("us"))
    table = pa.table(
        {
            "event_id": pa.array(range(4), pa.int64()),
            "ts": ts,
            "user_id": pa.array([1, 1, 2, 2], pa.int64()),
            "event_type": pa.array(["a", "b", "a", "b"]),
            "value": pa.array([1.0, 2.0, 3.0, 4.0], pa.float64()),
            "props": pa.array(["{}"] * 4),
        }
    )
    d = tmp_path / f"events_{unit}"
    d.mkdir()
    pq.write_table(table, d / "events.parquet")
    return str(d)


@pytest.mark.parametrize("unit", ["ns", "us"])
def test_events_read_truncates_to_identical_micros(tmp_path, spark, unit):
    sf_dir = _write_events(tmp_path, unit)
    assert parquet_ts_unit(f"{sf_dir}/events.parquet", "ts") == unit
    # compare epoch micros: collect() renders TimestampType through the
    # PYTHON process's local timezone, so naive-datetime comparison would
    # break on a non-UTC host even though both read paths are correct.
    rows = (
        Catalog(spark, sf_dir)
        .table("events")
        .orderBy("event_id")
        .selectExpr("unix_micros(ts) AS us")
        .collect()
    )
    assert [r.us for r in rows] == [_BASE_US + i for i in range(4)]
