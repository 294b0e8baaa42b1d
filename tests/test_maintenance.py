"""Table maintenance (ANALYZE stats, small-file compaction) and the
contamination-ratio / vocabulary corpus ops."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


def test_analyze_table_stats(spark):
    from openeo_processes_dask_spark.sources.maintenance import analyze_table

    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", None), (3, "a", 30.0), (4, None, 5.0)],
        ["id", "cat", "v"],
    )
    out = {r["column"]: r for r in analyze_table(df).collect()}
    assert out["id"]["n_rows"] == 4
    assert out["id"]["n_distinct"] == 4
    assert out["cat"]["n_nonnull"] == 3
    assert out["cat"]["n_distinct"] == 2
    assert out["cat"]["min_value"] == "a" and out["cat"]["max_value"] == "b"
    assert out["v"]["n_nonnull"] == 3
    assert out["v"]["min_value"] == "5.0"


def test_analyze_table_approx_mode_runs(spark):
    from openeo_processes_dask_spark.sources.maintenance import analyze_table

    df = spark.range(100).withColumn("k", F.col("id") % 10)
    out = {r["column"]: r for r in analyze_table(df, exact=False).collect()}
    # HLL is approximate; for 10 distinct values it is exact in practice
    assert out["k"]["n_distinct"] == 10


def test_compact_parquet_reduces_files_losslessly(spark, tmp_path):
    from openeo_processes_dask_spark.sources.maintenance import (
        _fs_file_sizes,
        compact_parquet,
    )

    src = os.path.join(str(tmp_path), "src")
    dst = os.path.join(str(tmp_path), "dst")
    df = spark.range(10_000).withColumn("v", F.col("id") * 2)
    df.repartition(40).write.parquet(src)
    assert len(_fs_file_sizes(spark, src)) == 40
    n_out = compact_parquet(spark, src, dst, target_file_bytes=64 << 20)
    assert n_out < 40
    back = spark.read.parquet(dst)
    assert back.count() == 10_000
    assert back.agg(F.sum("v")).first()[0] == df.agg(F.sum("v")).first()[0]


def test_compact_parquet_sorted_files(spark, tmp_path):
    from openeo_processes_dask_spark.sources.maintenance import compact_parquet

    src = os.path.join(str(tmp_path), "s2")
    dst = os.path.join(str(tmp_path), "d2")
    spark.range(1000).repartition(10).write.parquet(src)
    compact_parquet(spark, src, dst, target_file_bytes=64 << 20,
                    sort_by=["id"])
    back = spark.read.parquet(dst).collect()
    assert sorted(r["id"] for r in back) == list(range(1000))


def test_contamination_ratio(spark):
    from openeo_processes_dask_spark.training.dedup import contamination_ratio

    corpus = spark.createDataFrame(
        [
            (1, "one two three four five unique tail a b"),
            (2, "totally different words nothing shared at all here"),
            (3, "short"),
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(100, "one two three four five something else")], ["doc_id", "text"]
    )
    out = {
        r["id"]: r
        for r in contamination_ratio(
            corpus, bench, "doc_id", "text", n=5, threshold_ppm=100_000
        ).collect()
    }
    # doc 1: 5 distinct 5-grams, 1 shared -> 200000 ppm, contaminated
    assert out[1]["n_shingles"] == 5 and out[1]["n_shared"] == 1
    assert out[1]["ratio_ppm"] == 200_000 and out[1]["contaminated"]
    assert out[2]["n_shared"] == 0 and not out[2]["contaminated"]
    assert 3 not in out  # < n tokens: no shingles, absent


def test_vocabulary_topk(spark):
    from openeo_processes_dask_spark.training.textanalysis import vocabulary

    df = spark.createDataFrame(
        [(1, "a a b c"), (2, "a b d"), (3, "b")], ["doc_id", "text"]
    )
    out = vocabulary(df, "text", k=3, id_col="doc_id").collect()
    got = [(r["rank"], r["term"], r["n_total"], r["n_docs"]) for r in out]
    assert got == [(1, "a", 3, 2), (2, "b", 3, 3), (3, "c", 1, 1)]


def _scan_partition_counts(df):
    """Execute df and return numPartitions per FileSourceScan node."""
    df.collect()
    plan = df._jdf.queryExecution().executedPlan()

    def walk(node):
        out = []
        if "FileSourceScan" in node.getClass().getSimpleName():
            m, it = {}, node.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                m[kv._1()] = kv._2().value()
            out.append(m.get("numPartitions"))
        ch = node.children().iterator()
        while ch.hasNext():
            out += walk(ch.next())
        return out

    return walk(plan)


def test_time_partitioned_pruning(spark, tmp_path):
    """save_cube_time_partitioned + ranged load: the calendar range must
    prune at DIRECTORY level (2 of 30 day-partitions scanned), and the
    roundtrip must be row-exact against the unpartitioned filter."""
    import os

    from pyspark.sql import functions as F

    from openeo_processes_dask_spark.sources.load import (
        events_cube,
        load_time_partitioned_cube,
        save_cube_time_partitioned,
    )

    cube = events_cube(spark, "/root/testdata/sf0.001")
    d = os.path.join(str(tmp_path), "tp")
    save_cube_time_partitioned(cube, d, granularity="day")
    back = load_time_partitioned_cube(
        spark, d, dims=cube.dims, start="2024-01-10", end="2024-01-12"
    )
    exp = cube.df.where(
        (F.col("t") >= "2024-01-10") & (F.col("t") < "2024-01-12")
    ).count()
    assert back.df.count() == exp and exp > 0
    # end is midnight-aligned: its truncated day partition is read (the
    # inclusive truncated bound) and row-filtered to zero -> 3 of 30
    counts = _scan_partition_counts(back.df)
    assert counts and counts[0] == 3, counts
    # a mid-day end bound needs its boundary partition's rows: 2 of 30
    back2 = load_time_partitioned_cube(
        spark, d, dims=cube.dims,
        start="2024-01-10", end="2024-01-11 12:00:00",
    )
    counts2 = _scan_partition_counts(back2.df)
    assert counts2 and counts2[0] == 2, counts2
    exp2 = cube.df.where(
        (F.col("t") >= "2024-01-10") & (F.col("t") < "2024-01-11 12:00:00")
    ).count()
    assert back2.df.count() == exp2 and exp2 > 0
    plan = back.df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(__part" in plan


def test_time_partitioned_rejects_bad_granularity(spark, tmp_path):
    import pytest as _pytest

    from openeo_processes_dask_spark.sources.load import (
        events_cube,
        save_cube_time_partitioned,
    )

    cube = events_cube(spark, "/root/testdata/sf0.001")
    with _pytest.raises(ValueError):
        save_cube_time_partitioned(cube, str(tmp_path), granularity="week")


def test_bm25_topk_matches_reference_formula(spark):
    import math

    from pyspark.sql import functions as F

    from openeo_processes_dask_spark.training.textanalysis import bm25_topk

    corpus = {
        1: "the cat sat on the mat",
        2: "the dog chased the cat and the cat ran",
        3: "dogs and cats living together",
        4: "nothing relevant here at all whatsoever",
    }
    df = spark.createDataFrame(list(corpus.items()), ["doc_id", "text"])
    got = bm25_topk(df, ["cat", "dog"], k=3)
    rows = [(r["rank"], r["id"], r["score"]) for r in got.collect()]

    # independent python BM25
    toks = {i: t.split() for i, t in corpus.items()}
    n = len(corpus)
    avgdl = sum(len(v) for v in toks.values()) / n
    def score(doc, terms, k1=1.2, b=0.75):
        s = 0.0
        for t in terms:
            dfreq = sum(1 for v in toks.values() if t in v)
            idf = math.log(1 + (n - dfreq + 0.5) / (dfreq + 0.5))
            tf = toks[doc].count(t)
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(toks[doc]) / avgdl))
        return round(s, 6)
    exp = sorted(
        ((score(i, ["cat", "dog"]), i) for i in corpus),
        key=lambda p: (-p[0], p[1]),
    )
    exp = [(r + 1, i, s) for r, (s, i) in enumerate(exp) if s > 0][:3]
    assert rows == exp
    # plan: global top-k must be TakeOrderedAndProject, no explode join
    from openeo_processes_dask_spark.diagnostics import plan_report

    r = plan_report(bm25_topk(df, ["cat"], k=2))
    assert "TakeOrderedAndProject" in r.text and r.python_free


def test_time_zordered_composes_both_prunes(spark, tmp_path):
    """Calendar partitions + Morton files: a month+bbox query must prune
    directories (numPartitions) AND skip files via x/y footer stats
    (numFiles below the per-period file count)."""
    import os

    from pyspark.sql import functions as F

    from openeo_processes_dask_spark.cube import DataCube
    from openeo_processes_dask_spark.sources.load import (
        save_cube_time_zordered,
    )

    n = 64
    df = (
        spark.range(n * n)
        .select(
            (F.col("id") % n).cast("double").alias("x"),
            (F.col("id") / n).cast("long").cast("double").alias("y"),
        )
        .crossJoin(
            spark.range(3).select(
                F.make_timestamp(
                    F.lit(2024), F.col("id") + 1, F.lit(15),
                    F.lit(12), F.lit(0), F.lit(0)
                ).alias("t")
            )
        )
        .select("x", "y", "t", F.lit("b").alias("band"),
                (F.col("x") + F.col("y")).alias("value"))
    )
    cube = DataCube(df, dims=("x", "y", "t", "band"))
    d = os.path.join(str(tmp_path), "tz")
    save_cube_time_zordered(cube, d, granularity="month",
                            files_per_period=8)
    q = (
        spark.read.parquet(d)
        .where(F.col("__part") == "2024-02")
        .where((F.col("x") < 8) & (F.col("y") < 8))
    )
    counts = _scan_partition_counts(q.select("x", "y", "value"))
    assert counts and counts[0] == 1  # one month directory listed
    q2 = spark.read.parquet(d).where(F.col("__part") == "2024-02").where(
        (F.col("x") < 8) & (F.col("y") < 8)
    ).select("x", "y", "value")
    q2.collect()
    node = q2._jdf.queryExecution().executedPlan()

    def files_read(nd):
        out = []
        if "FileSourceScan" in nd.getClass().getSimpleName():
            it = nd.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                if kv._1() == "numFiles":
                    out.append(kv._2().value())
        ch = nd.children().iterator()
        while ch.hasNext():
            out += files_read(ch.next())
        return out

    nf = files_read(node)
    assert nf and nf[0] < 8, nf  # bbox skipped files inside the month
    # correctness: the pruned read returns exactly the filtered rows
    assert q2.count() == 8 * 8


def test_semdedup_keeps_canonical_per_semantic_group(spark):
    """SemDeDup: near-identical embeddings collapse to the min-id member;
    distinct directions all survive."""
    from pyspark.sql import functions as F

    from openeo_processes_dask_spark.training.similarity import semdedup

    import math

    def unit(angle):
        return [math.cos(angle), math.sin(angle), 0.0]

    rows = (
        [(i, unit(0.001 * i)) for i in range(5)]        # one tight group
        + [(10 + i, unit(1.5 + 0.001 * i)) for i in range(3)]  # another
        + [(100, unit(0.7)), (101, unit(2.6))]          # loners
    )
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {r["id"]: r["keep"] for r in semdedup(
        df, k=4, threshold=0.999).collect()}
    assert out[0] and not any(out[i] for i in range(1, 5))
    assert out[10] and not out[11] and not out[12]
    assert out[100] and out[101]
    # star-capped variant keeps the same survivors
    out2 = {r["id"]: r["keep"] for r in semdedup(
        df, k=4, threshold=0.999, max_cluster_pairs_per_vector=2).collect()}
    assert out == out2


# --- range_partition_bounds ---------------------------------------------

def test_range_bounds_known_distribution(spark):
    from openeo_processes_dask_spark.sources.maintenance import (
        range_partition_bounds,
    )

    # 100 rows over values 0..9 (10 each); quartile targets 25/50/75
    df = spark.createDataFrame([(i % 10,) for i in range(100)], "x int")
    got = sorted(
        (r["bucket"], r["upper"], r["rows_below"])
        for r in range_partition_bounds(df, "x", 4).collect()
    )
    assert got == [(1, 2, 30), (2, 4, 50), (3, 7, 80)]


def test_range_bounds_skew_and_nulls(spark):
    from openeo_processes_dask_spark.sources.maintenance import (
        range_partition_bounds,
    )

    # one dominant value swallows several targets; NULLs excluded
    rows = [(5,)] * 90 + [(1,)] * 5 + [(9,)] * 5 + [(None,)] * 10
    df = spark.createDataFrame(rows, "x int").repartition(7)
    got = {
        r["bucket"]: (r["upper"], r["rows_below"])
        for r in range_partition_bounds(df, "x", 4).collect()
    }
    # n=100 (non-null); targets 25, 50, 75 -> all land on the hot value 5
    assert got == {1: (5, 95), 2: (5, 95), 3: (5, 95)}


def test_range_bounds_validates(spark):
    import pytest

    from openeo_processes_dask_spark.sources.maintenance import (
        range_partition_bounds,
    )

    df = spark.createDataFrame([(1,)], "x int")
    with pytest.raises(ValueError):
        range_partition_bounds(df, "x", 1)


def test_percentile_rank_known_and_nulls(spark):
    from openeo_processes_dask_spark.sources.maintenance import (
        percentile_rank,
    )

    df = spark.createDataFrame(
        [(i % 4,) for i in range(8)] + [(None,)], "x int"
    )
    rows = percentile_rank(df, "x").collect()
    got = {}
    for r in rows:
        got.setdefault(r["x"], r["pct"])
    assert got == {0: 0.25, 1: 0.5, 2: 0.75, 3: 1.0, None: None}
    assert len(rows) == 9  # NULL row kept, pct NULL


def test_range_bounds_drive_a_pruned_layout(spark, tmp_path):
    """End-to-end: write a dataset partitioned by the EXACT range
    buckets, then show a value predicate only reads its bucket's files —
    the layout the bounds exist to produce."""
    from pyspark.sql import functions as F

    from openeo_processes_dask_spark.sources.maintenance import (
        range_partition_bounds,
    )

    df = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 97).cast("int").alias("v")
    )
    bounds = range_partition_bounds(df, "v", 4).collect()
    uppers = sorted(r["upper"] for r in bounds)
    bucket = F.lit(len(uppers))
    for i, u in reversed(list(enumerate(uppers))):
        bucket = F.when(F.col("v") <= u, F.lit(i)).otherwise(bucket)
    d = str(tmp_path / "ranged")
    df.withColumn("bucket", bucket).write.partitionBy("bucket").parquet(d)
    back = spark.read.parquet(d)
    # querying one bucket's value range must prune to <= 1 partition dir
    target = uppers[0]  # values <= first bound live in bucket 0 only
    q = back.where(F.col("bucket") == 0).where(F.col("v") <= target)
    scan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(bucket" in scan or "bucket#" in scan
    # correctness: bucket 0 holds exactly the rows <= first bound
    n_b0 = back.where("bucket = 0").count()
    assert n_b0 == df.where(F.col("v") <= target).count()
    # all rows land in some bucket and none are lost
    assert back.count() == 1000


def test_cosine_pairs_bruteforce_exact(spark):
    from openeo_processes_dask_spark.training.similarity import (
        cosine_pairs_bruteforce,
    )

    rows = [
        (1, [1.0, 0.0]), (2, [1.0, 0.0]),      # identical: cos 1
        (3, [0.0, 1.0]),                       # orthogonal to 1/2
        (4, [1.0, 1.0]),                       # cos ~0.7071 to all
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    got = {
        (r["id1"], r["id2"]): r["cosine"]
        for r in cosine_pairs_bruteforce(df, threshold=0.7).collect()
    }
    assert set(got) == {(1, 2), (1, 4), (2, 4), (3, 4)}
    assert got[(1, 2)] == 1.0


def test_semdedup_pairs_identical_vectors_recall_one(spark):
    """Identical vectors always share a cluster (distance 0 to the same
    centroid), so semdedup_pairs finds every exact-duplicate pair that
    brute force does — recall 1 on the pure-duplicate workload."""
    from openeo_processes_dask_spark.training.dedup import dedup_pair_recall
    from openeo_processes_dask_spark.training.similarity import (
        cosine_pairs_bruteforce,
        semdedup_pairs,
    )

    base = [[float(i == j) for j in range(8)] for i in range(8)]
    rows = []
    vid = 0
    for fam in range(8):
        for _ in range(3):          # 3 identical members per family
            rows.append((vid, base[fam]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    exact = cosine_pairs_bruteforce(df, threshold=0.99)
    approx = semdedup_pairs(df, k=4, threshold=0.99, iterations=2)
    row = dedup_pair_recall(exact, approx).collect()[0]
    assert row["true_pairs"] == 8 * 3  # C(3,2)=3 pairs per family
    assert row["recall"] == 1.0 and row["precision"] == 1.0


def test_semdedup_matches_pairs_composition(spark):
    """The refactored semdedup (keep flags) must equal connected
    components over semdedup_pairs — the refactor is behavior-neutral."""
    from openeo_processes_dask_spark.training.dedup import (
        connected_components,
    )
    from openeo_processes_dask_spark.training.similarity import (
        semdedup,
        semdedup_pairs,
    )

    rows = [
        (i, [float(((i * 13 + j * 7) % 11) - 5) for j in range(6)])
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    keep = {
        r["id"]: r["keep"]
        for r in semdedup(df, k=4, threshold=0.6, iterations=2).collect()
    }
    comp = {
        r["id"]: r["comp"]
        for r in connected_components(
            semdedup_pairs(df, k=4, threshold=0.6, iterations=2)
        ).collect()
    }
    expect = {i: (i not in comp or comp[i] == i) for i in range(40)}
    assert keep == expect


def test_semdedup_incremental_matches_batch_on_union(spark):
    """VERDICT r11 #6 pin: for a new batch of exact archive copies plus
    fresh vectors (no new x new dups — those belong to a within-batch
    semdedup pass by the composition contract), the incremental keep
    set over the batch equals batch semdedup over archive UNION batch
    restricted to the batch; and the documented membership-update
    recipe appends exactly the kept rows."""
    import math

    from openeo_processes_dask_spark.training.clustering import (
        kmeans_fit,
    )
    from openeo_processes_dask_spark.training.similarity import (
        _tag_members,
        semdedup,
        semdedup_incremental,
    )

    def unit(angle):
        return [math.cos(angle), math.sin(angle), 0.0]

    archive_rows = [(i, unit(0.35 * i)) for i in range(8)]
    # copies of archive vectors 1 and 4 (ids above every archive id —
    # the arrival-order canonical rule), plus two genuinely new ones
    new_rows = [
        (101, unit(0.35)), (104, unit(0.35 * 4)),
        (200, unit(2.9)), (201, unit(-1.3)),
    ]
    archive = spark.createDataFrame(archive_rows, ["vec_id", "embedding"])
    new = spark.createDataFrame(new_rows, ["vec_id", "embedding"])

    cents = kmeans_fit(archive, k=3, iterations=2)
    members = _tag_members(archive, cents, "vec_id", "embedding")
    inc = {
        r["id"]: r["keep"]
        for r in semdedup_incremental(
            new, members, cents, threshold=0.999
        ).collect()
    }
    assert inc == {101: False, 104: False, 200: True, 201: True}

    batch = {
        r["id"]: r["keep"]
        for r in semdedup(
            archive.unionByName(new), k=3, threshold=0.999, iterations=2
        ).collect()
    }
    assert {i: batch[i] for i in inc} == inc

    # membership update recipe: archive grows by exactly the kept rows
    kept = (
        semdedup_incremental(new, members, cents, threshold=0.999)
        .where("keep")
        .select("id")
        .join(_tag_members(new, cents, "vec_id", "embedding"), "id")
    )
    updated = members.unionByName(kept)
    assert updated.count() == 8 + 2
    assert updated.select("id").distinct().count() == 10


def test_stream_semdedup_incremental_matches_batch(spark, tmp_path):
    """r12: the stateless streaming ingest screen (semi/anti
    stream-static joins) emits, across two micro-batches, exactly the
    batch semdedup_incremental verdicts for the same rows."""
    import math

    from openeo_processes_dask_spark.training.clustering import (
        kmeans_fit,
    )
    from openeo_processes_dask_spark.training.similarity import (
        _tag_members,
        semdedup_incremental,
        stream_semdedup_incremental,
    )

    def unit(angle):
        return [math.cos(angle), math.sin(angle), 0.0]

    archive_rows = [(i, unit(0.35 * i)) for i in range(8)]
    new_rows = [
        (101, unit(0.35)), (104, unit(0.35 * 4)),
        (200, unit(2.9)), (201, unit(-1.3)),
    ]
    schema = "vec_id long, embedding array<double>"
    archive = spark.createDataFrame(archive_rows, schema)
    new = spark.createDataFrame(new_rows, schema)
    cents = kmeans_fit(archive, k=3, iterations=2)
    members = _tag_members(archive, cents, "vec_id", "embedding")

    d = str(tmp_path / "emb_stream")
    new.where("vec_id < 150").coalesce(1).write.mode(
        "overwrite"
    ).parquet(d)
    new.where("vec_id >= 150").coalesce(1).write.mode("append").parquet(d)
    stream = (
        spark.readStream.option("maxFilesPerTrigger", 1)
        .schema(schema)
        .parquet(d)
    )
    out = stream_semdedup_incremental(stream, members, cents, 0.999)
    q = (
        out.writeStream.format("memory")
        .queryName("ssdi_pin")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        r["id"]: (r["cluster"], r["keep"])
        for r in spark.table("ssdi_pin").collect()
    }
    exp = {
        r["id"]: (r["cluster"], r["keep"])
        for r in semdedup_incremental(
            new, members, cents, threshold=0.999
        ).collect()
    }
    assert got == exp and len(got) == 4
    assert not got[101][1] and not got[104][1]
    assert got[200][1] and got[201][1]
