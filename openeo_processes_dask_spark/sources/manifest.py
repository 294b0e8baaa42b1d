"""Manifest-versioned parquet tables: snapshot isolation, time travel,
and TARGETED mutation (delete/upsert) for append-mostly 100 TB datasets —
the Iceberg/Delta core idea reduced to its load-bearing minimum.

Why a manifest: plain ``overwrite`` semantics force a full rewrite for
any mutation. With a manifest, version N+1 lists the files it contains;
a delete rewrites ONLY the files that actually hold matching rows and
re-references every untouched file. A GDPR erasure of one user from a
100 TB corpus touches a handful of files instead of all of them, and
every previous version stays readable (time travel) until explicitly
vacuumed.

Layout::

    table_dir/
      data/batch-<n>/part-*.parquet     (immutable once written)
      _manifest/v<n>.json               {"version", "files": [...], "parent"}

All filesystem access goes through the Hadoop FileSystem API, so
``table_dir`` may be file://, hdfs://, s3a://, ... Concurrency: commits
are atomic create-exclusive on the manifest file (HDFS/local); a losing
racer gets :class:`CommitConflict` and retries against the new head. On
stores without atomic create (plain S3), front with a lock service —
the same caveat Delta/Iceberg carry.
"""

from __future__ import annotations

import json
import posixpath

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MANIFEST_DIR = "_manifest"
_DATA_DIR = "data"


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath, jvm


def _write_text(
    spark: SparkSession, path: str, text: str, overwrite: bool = True
) -> None:
    """``overwrite=False`` is the optimistic-concurrency primitive:
    Hadoop ``create(path, overwrite=false)`` is atomic create-exclusive
    on HDFS and local filesystems, so two committers racing to the same
    version number cannot both succeed. (On S3-family stores without
    atomic create, deploy a lock service or a commit coordinator — the
    same caveat Delta/Iceberg carry.)"""
    fs, hpath, _ = _fs(spark, path)
    out = fs.create(hpath, overwrite)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def _read_text(spark: SparkSession, path: str) -> str:
    fs, hpath, jvm = _fs(spark, path)
    stream = fs.open(hpath)
    try:
        return bytes(
            jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        ).decode("utf-8")
    finally:
        stream.close()


def _list_parquet(spark: SparkSession, path: str) -> list[str]:
    fs, hpath, _ = _fs(spark, path)
    it = fs.listFiles(hpath, True)
    files = []
    while it.hasNext():
        status = it.next()
        name = status.getPath().getName()
        if name.endswith(".parquet") and not name.startswith(("_", ".")):
            files.append(status.getPath().toString())
    return sorted(files)


def _rel(table_dir: str, full: str) -> str:
    """Store paths relative to the table root so the table can move."""
    marker = f"/{_DATA_DIR}/"
    i = full.rindex(marker)
    return full[i + 1 :]


def _versions(spark: SparkSession, table_dir: str) -> list[int]:
    fs, hpath, _ = _fs(spark, posixpath.join(table_dir, _MANIFEST_DIR))
    if not fs.exists(hpath):
        return []
    out = []
    for status in fs.listStatus(hpath):
        name = status.getPath().getName()
        if name.startswith("v") and name.endswith(".json"):
            out.append(int(name[1:-5]))
    return sorted(out)


def read_manifest(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> dict:
    versions = _versions(spark, table_dir)
    if not versions:
        raise FileNotFoundError(f"no manifest under {table_dir}")
    v = version if version is not None else versions[-1]
    if v not in versions:
        raise ValueError(f"version {v} not in {versions}")
    path = posixpath.join(table_dir, _MANIFEST_DIR, f"v{v:05d}.json")
    return json.loads(_read_text(spark, path))


class CommitConflict(RuntimeError):
    """Another writer committed this version first — re-read the latest
    manifest and retry the mutation against it."""


def _commit(
    spark: SparkSession,
    table_dir: str,
    files: list[str],
    parent: int,
    stats: dict | None = None,
) -> int:
    """``stats``: per-file statistics carried into the new version.
    Mutating commits pass the parent's stats restricted to surviving
    files, so collect_file_stats' work outlives the next delete/upsert —
    new files simply lack stats and are read conservatively until the
    next stats collection."""
    v = parent + 1
    manifest = {"version": v, "parent": parent, "files": sorted(files)}
    if stats:
        kept = {f: st for f, st in stats.items() if f in set(files)}
        if kept:
            manifest["stats"] = kept
    path = posixpath.join(table_dir, _MANIFEST_DIR, f"v{v:05d}.json")
    try:
        # create-exclusive: losing a commit race raises instead of
        # silently overwriting the winner's manifest
        _write_text(spark, path, json.dumps(manifest, indent=1),
                    overwrite=False)
    except Exception as exc:  # Hadoop raises FileAlreadyExistsException
        msg = str(exc)
        if "FileAlreadyExistsException" in msg or "already exists" in msg.lower():
            raise CommitConflict(
                f"version {v} of {table_dir} was committed concurrently — "
                "re-read the manifest and retry"
            ) from exc
        raise
    return v


def _write_batch(
    df: DataFrame, table_dir: str, batch_tag: str
) -> list[str]:
    """Batch directories get a UNIQUE suffix: the manifest CAS is the
    only race arbiter. Without it, two writers racing from the same
    parent would collide on the shared data/batch-<v+1> dir (an
    AnalysisException, not the documented CommitConflict), and a writer
    that crashed between batch write and commit would wedge every future
    mutation at that version. Orphaned never-referenced batches are
    garbage a future vacuum extension can sweep (they are never listed
    in any manifest, so readers never see them)."""
    import uuid

    dest = posixpath.join(
        table_dir, _DATA_DIR, f"batch-{batch_tag}-{uuid.uuid4().hex[:8]}"
    )
    df.write.mode("error").parquet(dest)
    return [
        _rel(table_dir, f) for f in _list_parquet(df.sparkSession, dest)
    ]


def create_table(df: DataFrame, table_dir: str) -> int:
    """Write ``df`` as version 1 of a new manifest table."""
    spark = df.sparkSession
    if _versions(spark, table_dir):
        raise FileExistsError(f"{table_dir} already has a manifest")
    files = _write_batch(df, table_dir, "00001")
    return _commit(spark, table_dir, files, parent=0)


def read_table(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Snapshot read: exactly the files the chosen manifest lists —
    concurrent later commits never change what this scan sees."""
    m = read_manifest(spark, table_dir, version)
    if not m["files"]:
        raise ValueError(f"version {m['version']} of {table_dir} is empty")
    full = [posixpath.join(table_dir, f) for f in m["files"]]
    return spark.read.parquet(*full)


def append_table(df: DataFrame, table_dir: str) -> int:
    """Append-only commit: new files added, no existing file touched."""
    spark = df.sparkSession
    m = read_manifest(spark, table_dir)
    tag = f"{m['version'] + 1:05d}"
    files = _write_batch(df, table_dir, tag)
    return _commit(
        spark, table_dir, m["files"] + files, m["version"],
        stats=m.get("stats"),
    )


def delete_rows(
    spark: SparkSession,
    table_dir: str,
    predicate,
) -> int:
    """Targeted delete: commit a version without the rows matching
    ``predicate`` (a Column), rewriting ONLY the files that contain at
    least one matching row.

    Plan: one scan evaluates the predicate alongside
    ``_metadata.file_path`` and aggregates the distinct AFFECTED file
    set (file-count-sized — safe to collect). Untouched files are
    re-referenced as-is in the new manifest; affected files are re-read,
    anti-filtered, and written as a new batch. At 100 TB with a
    selective predicate this is I/O proportional to the affected files,
    not the table, and parquet min/max pruning on the predicate columns
    cuts the discovery scan too.
    """
    m = read_manifest(spark, table_dir)
    full = {f: posixpath.join(table_dir, f) for f in m["files"]}
    scan = spark.read.parquet(*full.values()).select(
        F.col("_metadata.file_path").alias("__f")
    ).where(predicate)
    affected_full = {r["__f"] for r in scan.distinct().collect()}
    # Hadoop may render the URI differently (file:/ vs file:///) — match
    # on the stable table-relative suffix
    affected = {
        f for f, fl in full.items()
        if any(af.endswith(f) for af in affected_full)
    }
    if not affected:
        return _commit(
            spark, table_dir, m["files"], m["version"], stats=m.get("stats")
        )
    # tri-state guard: a row where the predicate evaluates to NULL must
    # be KEPT (a bare ~predicate drops it — NULL is not TRUE, but ~NULL
    # is NULL, which where() also drops). Delete exactly the IS TRUE set.
    kept_rows = spark.read.parquet(*[full[f] for f in affected]).where(
        ~predicate.eqNullSafe(F.lit(True))
    )
    tag = f"{m['version'] + 1:05d}"
    new_files = _write_batch(kept_rows, table_dir, tag)
    survivors = [f for f in m["files"] if f not in affected]
    return _commit(
        spark, table_dir, survivors + new_files, m["version"],
        stats=m.get("stats"),
    )


def upsert_rows(
    spark: SparkSession,
    table_dir: str,
    updates: DataFrame,
    key_cols: list[str],
) -> int:
    """Merge-into: rows whose key matches an update are replaced, new
    keys are inserted — as ONE commit. The delete half is targeted (only
    files containing a matching key are rewritten); the insert half is a
    plain append batch. The update key set is evaluated via a semi-join
    (broadcast when small), never collected.

    Update rows with a NULL in any key column are rejected: the
    semi/anti joins use SQL equality, under which a NULL key matches
    nothing — the row would silently INSERT next to the row it was meant
    to replace."""
    null_key = None
    for c in key_cols:
        term = F.col(c).isNull()
        null_key = term if null_key is None else (null_key | term)
    if updates.where(null_key).limit(1).count():
        raise ValueError(
            f"upsert_rows: updates contain NULL in key column(s) "
            f"{key_cols} — NULL keys match nothing under SQL equality"
        )
    m = read_manifest(spark, table_dir)
    full = {f: posixpath.join(table_dir, f) for f in m["files"]}
    keys = updates.select(*key_cols).distinct()
    scan = (
        spark.read.parquet(*full.values())
        .select(*key_cols, F.col("_metadata.file_path").alias("__f"))
        .join(keys, key_cols, "left_semi")
    )
    affected_full = {r["__f"] for r in scan.select("__f").distinct().collect()}
    affected = {
        f for f, fl in full.items()
        if any(af.endswith(f) for af in affected_full)
    }
    tag = f"{m['version'] + 1:05d}"
    if affected:
        kept = spark.read.parquet(*[full[f] for f in affected]).join(
            keys, key_cols, "left_anti"
        )
        batch = kept.unionByName(updates)
    else:
        batch = updates
    new_files = _write_batch(batch, table_dir, tag)
    survivors = [f for f in m["files"] if f not in affected]
    return _commit(
        spark, table_dir, survivors + new_files, m["version"],
        stats=m.get("stats"),
    )


def vacuum(
    spark: SparkSession,
    table_dir: str,
    keep_versions: int = 1,
) -> list[str]:
    """Delete data files referenced ONLY by manifests older than the
    newest ``keep_versions`` versions, then drop those manifests. Returns
    the deleted file list (table-relative). Time travel keeps working for
    the retained versions; this is the storage-reclaim half of the
    targeted-mutation story (rewritten files stay on disk until
    vacuumed)."""
    versions = _versions(spark, table_dir)
    if len(versions) <= keep_versions:
        return []
    keep, drop = versions[-keep_versions:], versions[:-keep_versions]
    referenced: set[str] = set()
    for v in keep:
        referenced.update(read_manifest(spark, table_dir, v)["files"])
    doomed: set[str] = set()
    for v in drop:
        doomed.update(
            f
            for f in read_manifest(spark, table_dir, v)["files"]
            if f not in referenced
        )
    jvm = spark._jvm
    for f in sorted(doomed):
        fs, hpath, _ = _fs(spark, posixpath.join(table_dir, f))
        fs.delete(hpath, False)
    for v in drop:
        path = posixpath.join(table_dir, _MANIFEST_DIR, f"v{v:05d}.json")
        fs, hpath, _ = _fs(spark, path)
        fs.delete(hpath, False)
    return sorted(doomed)


def compact_table(
    spark: SparkSession,
    table_dir: str,
    target_file_bytes: int = 128 << 20,
    small_file_bytes: int | None = None,
) -> int:
    """Compaction as a manifest commit: coalesce the CURRENT version's
    small files into target-sized ones and commit the result as a new
    version — old versions stay readable, large files are re-referenced
    untouched. ``small_file_bytes`` (default: half the target) is the
    threshold below which a file is considered compaction-worthy."""
    import math

    small = small_file_bytes or target_file_bytes // 2
    m = read_manifest(spark, table_dir)
    sized = []
    for f in m["files"]:
        fs, hpath, _ = _fs(spark, posixpath.join(table_dir, f))
        sized.append((f, fs.getFileStatus(hpath).getLen()))
    smalls = [f for f, sz in sized if sz < small]
    bigs = [f for f, sz in sized if sz >= small]
    if len(smalls) <= 1:
        return m["version"]
    total = sum(sz for f, sz in sized if f in set(smalls))
    n = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(
        *[posixpath.join(table_dir, f) for f in smalls]
    ).repartition(n)
    tag = f"{m['version'] + 1:05d}"
    new_files = _write_batch(df, table_dir, tag)
    return _commit(
        spark, table_dir, bigs + new_files, m["version"],
        stats=m.get("stats"),
    )


def collect_file_stats(
    spark: SparkSession,
    table_dir: str,
    columns: list[str],
) -> int:
    """Attach per-file min/max/rowcount statistics for ``columns`` to the
    CURRENT manifest (committed as a new version) — the Iceberg move that
    lets readers skip files from the MANIFEST alone, without listing or
    opening a single parquet footer. On an object store at 100 TB,
    footer-probing a million files costs more than many queries; a
    manifest with stats answers "which files can hold x BETWEEN a AND b"
    driver-side.

    One distributed job: scan the current files, group by
    ``_metadata.file_path``, min/max per column. Stats are stored under
    ``stats[<relpath>][<col>] = [min, max]`` (JSON-serialized scalars).
    """
    m = read_manifest(spark, table_dir)
    full = {f: posixpath.join(table_dir, f) for f in m["files"]}
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in columns:
        aggs += [F.min(c).alias(f"__mn_{c}"), F.max(c).alias(f"__mx_{c}")]
    rows = (
        spark.read.parquet(*full.values())
        .groupBy(F.col("_metadata.file_path").alias("__f"))
        .agg(*aggs)
        .collect()
    )

    def _scalar(v):
        return v.isoformat() if hasattr(v, "isoformat") else v

    stats = {}
    for r in rows:
        rel = next((f for f in m["files"] if r["__f"].endswith(f)), None)
        if rel is None:
            continue
        stats[rel] = {
            c: [_scalar(r[f"__mn_{c}"]), _scalar(r[f"__mx_{c}"])]
            for c in columns
        }
        stats[rel]["__rows"] = r["__n"]
    return _commit(spark, table_dir, m["files"], m["version"], stats=stats)


def read_table_pruned(
    spark: SparkSession,
    table_dir: str,
    bounds: dict,
    version: int | None = None,
) -> DataFrame:
    """Snapshot read that skips files from MANIFEST statistics alone:
    ``bounds`` maps column -> (lo, hi) (inclusive; None = unbounded), and
    a file is read only if its [min, max] interval intersects every
    bound. Falls back to reading a file when it has no stats for a
    bounded column (never silently wrong). The residual row-level
    predicate is the CALLER's to apply — this prunes I/O, it does not
    filter rows."""
    m = read_manifest(spark, table_dir, version)
    if not m["files"]:
        raise ValueError(f"version {m['version']} of {table_dir} is empty")
    stats = m.get("stats", {})
    keep = []
    for f in m["files"]:
        fstats = stats.get(f)
        ok = True
        if fstats:
            for col, (lo, hi) in bounds.items():
                if col not in fstats:
                    continue
                mn, mx = fstats[col]
                if lo is not None and mx is not None and mx < lo:
                    ok = False
                    break
                if hi is not None and mn is not None and mn > hi:
                    ok = False
                    break
        if ok:
            keep.append(f)
    if not keep:
        # empty selection: preserve schema via an always-false filter on
        # one file
        one = posixpath.join(table_dir, m["files"][0])
        return spark.read.parquet(one).where(F.lit(False))
    return spark.read.parquet(
        *[posixpath.join(table_dir, f) for f in keep]
    )
