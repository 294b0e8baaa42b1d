"""Manifest-versioned tables: time travel, targeted delete, upsert."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from openeo_processes_dask_spark.sources.manifest import (
    append_table,
    create_table,
    delete_rows,
    read_manifest,
    read_table,
    upsert_rows,
)


@pytest.fixture()
def table(spark, tmp_path):
    d = os.path.join(str(tmp_path), "tbl")
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 10).alias("grp"),
        (F.col("id") * 2.0).alias("v"),
    )
    v = create_table(df.repartition(8), d)
    assert v == 1
    return d


def test_create_and_read(spark, table):
    df = read_table(spark, table)
    assert df.count() == 100
    assert read_manifest(spark, table)["version"] == 1


def test_append_then_time_travel(spark, table):
    extra = spark.range(100, 120).select(
        F.col("id"), (F.col("id") % 10).alias("grp"),
        (F.col("id") * 2.0).alias("v"),
    )
    v2 = append_table(extra, table)
    assert v2 == 2
    assert read_table(spark, table, version=1).count() == 100
    assert read_table(spark, table).count() == 120


def test_targeted_delete_rewrites_only_affected_files(spark, table):
    m1 = read_manifest(spark, table)
    # delete one specific id: it lives in exactly one of the 8 files
    v2 = delete_rows(spark, table, F.col("id") == 7)
    m2 = read_manifest(spark, table)
    assert v2 == 2
    survivors = set(m1["files"]) & set(m2["files"])
    assert len(survivors) == len(m1["files"]) - 1, (
        "exactly one file should be rewritten"
    )
    df = read_table(spark, table)
    assert df.count() == 99
    assert df.where(F.col("id") == 7).count() == 0
    # time travel still sees the deleted row
    assert read_table(spark, table, version=1).where(
        F.col("id") == 7
    ).count() == 1


def test_delete_no_match_is_metadata_only(spark, table):
    m1 = read_manifest(spark, table)
    v2 = delete_rows(spark, table, F.col("id") == 10_000)
    m2 = read_manifest(spark, table)
    assert v2 == 2 and m2["files"] == m1["files"]


def test_upsert_replaces_and_inserts(spark, table):
    updates = spark.createDataFrame(
        [(5, 5, 999.0), (200, 0, 111.0)], ["id", "grp", "v"]
    ).select("id", "grp", F.col("v").cast("double"))
    v2 = upsert_rows(spark, table, updates, ["id"])
    assert v2 == 2
    df = read_table(spark, table)
    assert df.count() == 101
    assert df.where(F.col("id") == 5).first()["v"] == 999.0
    assert df.where(F.col("id") == 200).first()["v"] == 111.0
    # old version untouched
    assert read_table(spark, table, version=1).where(
        F.col("id") == 5
    ).first()["v"] == 10.0


def test_vacuum_reclaims_old_files(spark, table):
    from openeo_processes_dask_spark.sources.manifest import vacuum

    delete_rows(spark, table, F.col("grp") == 3)
    deleted = vacuum(spark, table, keep_versions=1)
    # v1's rewritten files are gone; v2 still reads fine
    assert deleted, "old files should be reclaimed"
    assert read_table(spark, table).count() == 90
    with pytest.raises((FileNotFoundError, ValueError)):
        read_table(spark, table, version=1)


def test_vacuum_noop_when_all_kept(spark, table):
    from openeo_processes_dask_spark.sources.manifest import vacuum

    assert vacuum(spark, table, keep_versions=5) == []
    assert read_table(spark, table).count() == 100


def test_compact_table_commits_new_version(spark, table):
    from openeo_processes_dask_spark.sources.manifest import compact_table

    m1 = read_manifest(spark, table)
    assert len(m1["files"]) == 8
    v2 = compact_table(spark, table, target_file_bytes=64 << 20)
    assert v2 == 2
    m2 = read_manifest(spark, table)
    assert len(m2["files"]) < len(m1["files"])
    assert read_table(spark, table).count() == 100
    # time travel to the pre-compaction layout still works
    assert read_table(spark, table, version=1).count() == 100


def test_streaming_upsert_into_manifest(spark, tmp_path):
    """foreachBatch -> manifest upsert: two micro-batches become two
    manifest commits; later batches replace matching keys, snapshots of
    earlier versions stay readable."""
    from pyspark.sql import functions as F

    from openeo_processes_dask_spark.streaming.events import (
        run_stream_upsert_manifest,
    )

    src = os.path.join(str(tmp_path), "src")
    tbl = os.path.join(str(tmp_path), "tbl")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    # two files -> two micro-batches (maxFilesPerTrigger=1). File order =
    # lexicographic mod-time order; write them separately to pin it.
    b1 = spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], ["k", "v"]
    )
    b2 = spark.createDataFrame(
        [(2, 99.0), (3, 30.0)], ["k", "v"]
    )
    b1.coalesce(1).write.parquet(src)
    import time as _t

    _t.sleep(1.1)  # distinct mod-times => deterministic batch order
    b2.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("k long, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = run_stream_upsert_manifest(stream, tbl, ["k"], ckpt)
    q.awaitTermination(120)
    final = {r["k"]: r["v"] for r in read_table(spark, tbl).collect()}
    assert final == {1: 10.0, 2: 99.0, 3: 30.0}
    m = read_manifest(spark, tbl)
    assert m["version"] == 2
    v1 = {r["k"]: r["v"] for r in read_table(spark, tbl, version=1).collect()}
    assert v1 == {1: 10.0, 2: 20.0}
    # re-draining the same source appends nothing (checkpoint idempotence)
    q2 = run_stream_upsert_manifest(
        spark.readStream.schema("k long, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        tbl,
        ["k"],
        ckpt,
    )
    q2.awaitTermination(120)
    assert read_manifest(spark, tbl)["version"] == 2


def test_delete_rows_keeps_null_predicate_rows(spark, tmp_path):
    """Tri-state regression: rows where the delete predicate evaluates
    to NULL must survive (only the IS TRUE set is deleted)."""
    d = os.path.join(str(tmp_path), "nulltbl")
    df = spark.createDataFrame(
        [(1, "de"), (2, None), (3, "en")], ["id", "lang"]
    )
    create_table(df.coalesce(1), d)
    delete_rows(spark, d, F.col("lang") == "de")
    left = sorted(r["id"] for r in read_table(spark, d).collect())
    assert left == [2, 3]


def test_streaming_upsert_picks_whole_rows(spark, tmp_path):
    """Row-mix regression: within-batch key reduction must pick ONE real
    row, never combine per-column maxima from different rows."""
    from openeo_processes_dask_spark.streaming.events import (
        run_stream_upsert_manifest,
    )

    src = os.path.join(str(tmp_path), "rowsrc")
    tbl = os.path.join(str(tmp_path), "rowtbl")
    ckpt = os.path.join(str(tmp_path), "rowckpt")
    spark.createDataFrame(
        [(1, 1, 5.0, "stale"), (1, 2, 3.0, "zzz-new")],
        ["k", "__seq", "v", "status"],
    ).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(
        "k long, __seq long, v double, status string"
    ).parquet(src)
    q = run_stream_upsert_manifest(stream, tbl, ["k"], ckpt)
    q.awaitTermination(120)
    row = read_table(spark, tbl).collect()[0]
    # latest-by-__seq: the (3.0, 'zzz-new') row wins as a WHOLE
    assert (row["v"], row["status"]) == (3.0, "zzz-new")


def test_upsert_rejects_null_keys(spark, table):
    updates = spark.createDataFrame(
        [(None, 0, 1.0)], "id long, grp long, v double"
    )
    with pytest.raises(ValueError, match="NULL in key"):
        upsert_rows(spark, table, updates, ["id"])


def test_commit_conflict_raises(spark, table):
    """Optimistic concurrency: a racing commit to the same version loses
    with CommitConflict instead of overwriting the winner."""
    from openeo_processes_dask_spark.sources.manifest import (
        CommitConflict,
        _commit,
        read_manifest,
    )

    m = read_manifest(spark, table)
    _commit(spark, table, m["files"], m["version"])  # v2: first writer wins
    with pytest.raises(CommitConflict):
        _commit(spark, table, m["files"], m["version"])  # racing v2
    assert read_manifest(spark, table)["version"] == 2


def test_manifest_stats_prune_files(spark, tmp_path):
    """collect_file_stats + read_table_pruned: a narrow range reads only
    the files whose manifest [min, max] intersects it — no footer probes,
    the decision is driver-side from the manifest JSON."""
    import os

    from openeo_processes_dask_spark.sources.manifest import (
        collect_file_stats,
        read_table_pruned,
    )

    d = os.path.join(str(tmp_path), "stats_tbl")
    # 8 range-partitioned files over id 0..799 -> disjoint id intervals
    df = spark.range(800).select(
        F.col("id"), (F.col("id") * 1.5).alias("v")
    )
    create_table(df.repartitionByRange(8, "id"), d)
    v2 = collect_file_stats(spark, d, ["id"])
    assert v2 == 2
    m = read_manifest(spark, d)
    assert len(m["stats"]) == len(m["files"])
    narrow = read_table_pruned(spark, d, {"id": (100, 150)})
    assert len(narrow.inputFiles()) < len(m["files"])
    # pruning is I/O-only: rows outside the bound from boundary files
    # remain until the caller filters
    assert narrow.where(
        (F.col("id") >= 100) & (F.col("id") <= 150)
    ).count() == 51
    # unbounded read sees everything; empty selection keeps the schema
    assert read_table_pruned(spark, d, {}).count() == 800
    empty = read_table_pruned(spark, d, {"id": (10_000, 20_000)})
    assert empty.count() == 0 and "v" in empty.columns


def test_stats_survive_targeted_mutations(spark, tmp_path):
    """Stats carry forward through delete/append: untouched files keep
    theirs (pruning still works), rewritten/new files are conservatively
    unstated until the next collect_file_stats."""
    import os

    from openeo_processes_dask_spark.sources.manifest import (
        collect_file_stats,
        read_table_pruned,
    )

    d = os.path.join(str(tmp_path), "stats_mut")
    df = spark.range(800).select(F.col("id"), (F.col("id") * 2.0).alias("v"))
    create_table(df.repartitionByRange(8, "id"), d)
    collect_file_stats(spark, d, ["id"])
    delete_rows(spark, d, F.col("id") == 700)  # rewrites one file
    m = read_manifest(spark, d)
    assert m["version"] == 3 and "stats" in m
    # 7 surviving originals keep stats; the rewritten batch has none
    assert len(m["stats"]) == 7
    narrow = read_table_pruned(spark, d, {"id": (100, 150)})
    # pruned: files excluded by stats are gone, but the stat-less new
    # file is conservatively included
    assert len(narrow.inputFiles()) < len(m["files"])
    assert narrow.where((F.col("id") >= 100) & (F.col("id") <= 150)).count() == 51
