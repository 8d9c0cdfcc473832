"""Round-6 tests: ADVICE fixes (version immutability, MERGE unique-key
contract, foreachBatch retry idempotence) plus round-6 operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_artifact_version_immutability(spark, tmp_path):
    """mode('append') must refuse to clobber an existing version object
    (the store's version-immutability contract); mode('overwrite') opts
    into replacement explicitly."""
    from nzwirelessmap_fetch_spark.sources.artifact_source import (
        VersionedArtifactDataSource,
    )

    spark.dataSource.register(VersionedArtifactDataSource)
    root = str(tmp_path / "store")

    def write(df, mode):
        (
            df.write.format("versioned_artifacts")
            .option("root", root)
            .option("artifact", "prism.json")
            .option("version", "2024-03-01T00:00:00Z")
            .mode(mode)
            .save()
        )

    write(spark.range(3), "append")
    with pytest.raises(Exception, match="already exists"):
        write(spark.range(5), "append")
    # the failed append must not have touched the stored object
    import os

    vpath = os.path.join(root, "prism.json", "2024-03-01T00:00:00Z")
    assert len(open(vpath).readlines()) == 3
    write(spark.range(5), "overwrite")
    assert len(open(vpath).readlines()) == 5


def test_merge_into_rejects_duplicate_source_keys(spark, tmp_path):
    """Real MERGE INTO raises when one target row matches multiple source
    rows; merge_into enforces the same unique-source-key contract instead
    of silently writing duplicate keys into the snapshot."""
    from nzwirelessmap_fetch_spark.sinks.writers import SnapshotParquetTable

    sink = SnapshotParquetTable(tmp_path / "snap")
    sink.write_version(
        spark.createDataFrame([(1, "a")], "k long, v string"), "t", "1"
    )
    dup_changes = spark.createDataFrame(
        [(2, "x"), (2, "y")], "k long, v string"
    )
    with pytest.raises(ValueError, match="duplicate"):
        sink.merge_into(spark, "t", dup_changes, "k", "2")
    assert sink.resolve("t") == "1"  # failed merge left the pointer alone


def test_foreach_batch_merge_retry_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-delivering a micro-batch must be
    a no-op (the committed version name is the idempotence token), and a
    LATER batch must still apply."""
    from nzwirelessmap_fetch_spark.sinks.writers import SnapshotParquetTable
    from nzwirelessmap_fetch_spark.streaming.events_stream import (
        merge_user_stats_batch,
    )

    sink = SnapshotParquetTable(tmp_path / "snap")
    schema = "user_id long, n bigint, total_cents bigint"
    sink.write_version(spark.createDataFrame([], schema), "user_stats", "0")

    batch0 = spark.createDataFrame(
        [(7, 1.50), (7, 0.25), (9, 2.00)], "user_id long, value double"
    )
    merge_user_stats_batch(sink, batch0, 0)
    state = {r.user_id: (r.n, r.total_cents) for r in
             sink.read_version(spark, "user_stats").collect()}
    assert state == {7: (2, 175), 9: (1, 200)}

    # retry of the SAME batch: must not double-count
    merge_user_stats_batch(sink, batch0, 0)
    assert sink.resolve("user_stats") == "1"
    state2 = {r.user_id: (r.n, r.total_cents) for r in
              sink.read_version(spark, "user_stats").collect()}
    assert state2 == state

    # a later batch still applies on top
    batch1 = spark.createDataFrame([(7, 1.00)], "user_id long, value double")
    merge_user_stats_batch(sink, batch1, 1)
    state3 = {r.user_id: (r.n, r.total_cents) for r in
              sink.read_version(spark, "user_stats").collect()}
    assert state3 == {7: (3, 275), 9: (1, 200)}
