"""IO + process-graph gate queries (save/load, load_url, STAC catalog, process_graph).

Sliced verbatim from the round-2 ``__spark_entry__.py`` (round 3 split);
query/oracle semantics unchanged. See gates/__init__.py for registry order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from .common import (
    _CELLS_CTE,
    _GRID_CTE,
    _events_cube,
    _grid_cube,
    _li_cells,
    _round6,
    _setup,
    _table,
)

def q_save_load_roundtrip(spark, sf_dir):
    """save_result (band-partitioned parquet sink) -> load_parquet_cube:
    the write/read cycle must be lossless (reference has no in-repo sink —
    SURVEY.md §2.1; partitioning by band makes per-band reads prune)."""
    _setup(spark)
    import os
    import tempfile

    from openeo_processes_dask_spark.sources.load import (
        load_parquet_cube,
        save_result,
    )

    out_dir = os.path.join(
        tempfile.gettempdir(),
        f"save_gate_{os.path.basename(sf_dir)}",
    )
    save_result(_grid_cube(spark, sf_dir), out_dir)
    back = load_parquet_cube(spark, out_dir, dims=("x", "y", "band"))
    return _round6(back.df.select("x", "y", "band", "value"), "value")


def q_zorder_roundtrip(spark, sf_dir):
    """save_cube_zordered (Morton-curve range-partitioned parquet, tight
    per-file x/y stats for bbox pruning — sources/load.py) -> plain read:
    the layout is a layout, values must roundtrip exactly."""
    _setup(spark)
    import os
    import tempfile

    from openeo_processes_dask_spark.sources.load import (
        load_parquet_cube,
        save_cube_zordered,
    )

    out_dir = os.path.join(
        tempfile.gettempdir(), f"zorder_gate_{os.path.basename(sf_dir)}"
    )
    save_cube_zordered(_grid_cube(spark, sf_dir), out_dir, n_files=8)
    back = load_parquet_cube(spark, out_dir, dims=("x", "y", "band"))
    return _round6(back.df.select("x", "y", "band", "value"), "value")


def q_time_partitioned_roundtrip(spark, sf_dir):
    """Time-partitioned layout (sources/load.py
    save_cube_time_partitioned): the events cube Hive-partitioned by day,
    re-read with a [Jan 5, Jan 12) range — the range must compile to
    directory-level PartitionFilters (metric-asserted in
    tests/test_maintenance.py) AND return exactly the rows a plain
    range-filtered scan returns. Daily per-band aggregate of the pruned
    read."""
    _setup(spark)
    import os
    import shutil
    import tempfile

    from openeo_processes_dask_spark.sources.load import (
        load_time_partitioned_cube,
        save_cube_time_partitioned,
    )

    d = os.path.join(
        tempfile.gettempdir(), f"timepart_gate_{os.path.basename(sf_dir)}"
    )
    shutil.rmtree(d, ignore_errors=True)
    save_cube_time_partitioned(
        _events_cube(spark, sf_dir), d, granularity="day"
    )
    back = load_time_partitioned_cube(
        spark,
        d,
        dims=("user_id", "t", "band"),
        start="2024-01-05",
        end="2024-01-12",
    )
    daily = back.df.groupBy(
        F.date_trunc("day", F.col("t")).alias("day"), "band"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 6).alias("total"),
    )
    return daily


def q_stat_pruned_read(spark, sf_dir):
    """Manifest file statistics + stat-pruned scan (sources/manifest.py
    collect_file_stats / read_table_pruned): documents range-partitioned
    so per-file doc_id intervals are disjoint, stats committed to the
    manifest, then a narrow doc_id range read via MANIFEST stats alone
    (no footer probes — file-skip assertions in tests/test_manifest.py).
    The residual row predicate is applied as documented, so the result
    must equal a plain filtered scan."""
    _setup(spark)
    import os
    import shutil
    import tempfile

    from openeo_processes_dask_spark.sources.manifest import (
        collect_file_stats,
        create_table,
        read_table_pruned,
    )

    d = os.path.join(
        tempfile.gettempdir(), f"statprune_gate_{os.path.basename(sf_dir)}"
    )
    shutil.rmtree(d, ignore_errors=True)
    docs = _table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    create_table(docs.repartitionByRange(8, "doc_id"), d)
    collect_file_stats(spark, d, ["doc_id"])
    lo, hi = 120, 260
    pruned = read_table_pruned(spark, d, {"doc_id": (lo, hi)}).where(
        F.col("doc_id").between(lo, hi)
    )
    return pruned.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )


class _SyntheticRasterSrc:
    """Deterministic RasterSource for the load_raster gate: 48x40 raster,
    value = 100*row + col, 0.5-unit pixels anchored at (10, 50) north-up.
    Module-level so Spark workers unpickle it by import (gates/ is on
    PYTHONPATH); the driver gate thereby executes the full distributed
    tile-decode path with no codec dependency."""

    width = 48
    height = 40
    transform = (0.5, 0.0, 10.0, 0.0, -0.5, 50.0)

    @staticmethod
    def read_window(band, col_off, row_off, w, h):
        import numpy as np

        rows, cols = np.mgrid[row_off : row_off + h, col_off : col_off + w]
        return (100.0 * rows + cols) * band


def q_load_raster_tiles(spark, sf_dir):
    """Distributed raster decode (sources/raster.py load_raster): tile
    planning + mapInPandas windowed read + affine pixel centers, executed
    for real through a deterministic synthetic RasterSource (the codec
    adapter seam — rasterio/zarr plug into the same protocol). Oracle
    regenerates the raster arithmetically in SQL."""
    _setup(spark)
    from openeo_processes_dask_spark.sources.raster import load_raster

    cube = load_raster(
        spark,
        "synthetic://gate.tif",
        band="b1",
        tile=16,
        opener=lambda href: _SyntheticRasterSrc(),
    )
    return _round6(cube.df.select("x", "y", "band", "value"), "value")


class _SentinelRasterSrc:
    """Two-band 32x24 synthetic raster with STAC-style per-band metadata
    (VERDICT r04 #2): raw = band*1000 + 100*row + col, EXCEPT pixels where
    (row+col) % 11 == band carry the band's nodata sentinel.  Per-band
    scale/offset: value = raw*scale + offset, sentinel -> NULL."""

    width = 32
    height = 24
    count = 2
    transform = (1.0, 0.0, 0.0, 0.0, -1.0, 24.0)
    nodatavals = (-1.0, -2.0)
    scales = (0.5, 1.0)
    offsets = (2.0, 0.0)

    @staticmethod
    def read_window(band, col_off, row_off, w, h):
        import numpy as np

        rows, cols = np.mgrid[row_off : row_off + h, col_off : col_off + w]
        raw = band * 1000.0 + 100.0 * rows + cols
        return np.where((rows + cols) % 11 == band, -float(band), raw)


def q_load_raster_nodata(spark, sf_dir):
    """Raster decode with nodata/scale/offset metadata applied at load
    (VERDICT r04 #2; reference cubes/load.py:185-215): multiband read
    (ADVICE r04 — band_index=None stacks ALL bands), per-band sentinel ->
    NULL masked on raw values, value = raw*scale + offset.  Oracle
    regenerates both bands arithmetically and masks the same sentinel."""
    _setup(spark)
    from openeo_processes_dask_spark.sources.raster import load_raster

    cube = load_raster(
        spark,
        "synthetic://nodata.tif",
        band="s",
        tile=16,
        opener=lambda href: _SentinelRasterSrc(),
    )
    return _round6(cube.df.select("x", "y", "band", "value"), "value")


def q_load_url_geojson(spark, sf_dir):
    """load_url over a file:// GeoJSON written from nation rows
    (reference: cubes/load.py:325-401): URL scheme handling + GeoJSON
    parsing verified by parsing coordinates back out of the loaded rows."""
    _setup(spark)
    import json
    import os
    import tempfile

    from openeo_processes_dask_spark.operators.vector import load_url

    n = _table(spark, sf_dir, "nation").collect()
    fc = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "geometry": {
                    "type": "Point",
                    "coordinates": [
                        float(r["n_nationkey"]),
                        float(r["n_regionkey"]),
                    ],
                },
                "properties": {"name": r["n_name"]},
            }
            for r in n
        ],
    }
    path = os.path.join(tempfile.gettempdir(), "load_url_gate.geojson")
    with open(path, "w") as fh:
        json.dump(fc, fh)
    vc = load_url(f"file://{path}", format="GeoJSON")
    pt = F.from_json(
        F.col("geometry"), "struct<type:string, coordinates:array<double>>"
    )["coordinates"]
    return vc.select(
        "feature_id",
        "name",
        F.round(pt[0], 6).alias("px"),
        F.round(pt[1], 6).alias("py"),
    )


def q_reduce_any(spark, sf_dir):
    """any/all Kleene reducers over a boolean cube."""
    _setup(spark)
    from openeo_processes_dask_spark.cube import DataCube
    from openeo_processes_dask_spark.operators.reduce import reduce_dimension

    ev = _table(spark, sf_dir, "events")
    cube = DataCube(
        ev.select(
            F.col("user_id"),
            F.col("ts").alias("t"),
            F.col("event_type").alias("band"),
            (F.col("value") > 100).alias("value"),
        ),
        dims=("user_id", "t", "band"),
    )
    return reduce_dimension(cube, "any", "t").df


def q_reduce_count_condition(spark, sf_dir):
    """count reducer with a condition callback (reference: arrays.py:587)."""
    _setup(spark)
    from openeo_processes_dask_spark.cube import DataCube
    from openeo_processes_dask_spark.operators.reduce import reduce_dimension

    cells = _li_cells(spark, sf_dir, dist="x")
    cube = DataCube(
        cells.select("x", "pos", F.col("sq").alias("value")), dims=("x", "pos")
    )
    return reduce_dimension(
        cube, "count", "pos", condition=F.col("value") > 30
    ).df


def q_process_graph(spark, sf_dir):
    """The flagship pipeline expressed as OpenEO process-graph JSON and run
    through plans/graph.py — the executor itself under the oracle gate."""
    _setup(spark)
    from openeo_processes_dask_spark.plans import execute_process_graph

    pg = {
        "process_graph": {
            "ft": {
                "process_id": "filter_temporal",
                "arguments": {
                    "data": {"from_parameter": "data"},
                    "extent": ["2024-01-01", "2024-02-01"],
                },
            },
            "agg": {
                "process_id": "aggregate_temporal_period",
                "arguments": {
                    "data": {"from_node": "ft"},
                    "period": "day",
                    "reducer": "mean",
                },
            },
            # Snap the inner aggregate to integer micro-units (see _flagship
            # — exact outer sum) — expressed IN the graph as an apply
            # callback chaining multiply→round, so the gate also exercises
            # the callback→Column compiler with nested nodes and a literal
            # extra argument. Engine round == bround (half-even) ⇔ oracle
            # round_even().
            "rnd": {
                "process_id": "apply",
                "arguments": {
                    "data": {"from_node": "agg"},
                    "process": {
                        "process_graph": {
                            "m": {
                                "process_id": "multiply",
                                "arguments": {
                                    "x": {"from_parameter": "x"},
                                    "y": 1000000.0,
                                },
                            },
                            "r": {
                                "process_id": "round",
                                "arguments": {
                                    "x": {"from_node": "m"},
                                    "p": 0,
                                },
                                "result": True,
                            },
                        }
                    },
                },
            },
            "red": {
                "process_id": "reduce_dimension",
                "arguments": {
                    "data": {"from_node": "rnd"},
                    "reducer": "mean",
                    "dimension": "user_id",
                },
                "result": True,
            },
        }
    }
    out = execute_process_graph(pg, {"data": _events_cube(spark, sf_dir)})
    return out.df.withColumn("value", F.round(F.col("value") / 1e6, 6))


def q_load_stac_search(spark, sf_dir):
    """Live STAC API item-search end-to-end (sources/load.py
    ``_stac_api_search``; the reference drives this protocol through
    pystac_client, cubes/load.py:119-156): an in-process HTTP API serves
    a landing page advertising item-search plus a paged ``/search``
    endpoint over three items built from the nation table — page size 2
    exercises the rel="next" hop, and the temporal extent prunes the
    March item SERVER-side before any asset is touched. Each item's
    parquet asset holds the nation grid scaled by (item_index + 1); the
    oracle reconstructs the two kept slices with the same arithmetic."""
    _setup(spark)
    import http.server
    import json
    import os
    import tempfile
    import threading
    from urllib.parse import parse_qs, urlsplit

    import pandas as pd

    from openeo_processes_dask_spark.sources.load import load_stac

    rows = (
        _table(spark, sf_dir, "nation")
        .select("n_nationkey", "n_regionkey")
        .orderBy("n_nationkey")
        .collect()
    )
    root = os.path.join(tempfile.gettempdir(), "spark_graft_stac_api_gate")
    os.makedirs(root, exist_ok=True)
    days = ["2024-01-01", "2024-01-15", "2024-03-01"]
    asset_paths = []
    for i, day in enumerate(days):
        pdf = pd.DataFrame(
            {
                "x": [float(r["n_nationkey"]) for r in rows],
                "y": [float(r["n_regionkey"]) for r in rows],
                "t": pd.to_datetime([day] * len(rows)),
                "value": [float(r["n_nationkey"] * (i + 1)) for r in rows],
            }
        )
        p = os.path.join(root, f"asset_{i}.parquet")
        pdf.to_parquet(p)
        asset_paths.append(p)

    def make_items():
        return [
            {
                "type": "Feature",
                "stac_version": "1.0.0",
                "id": f"api-{i}",
                "bbox": [0.0, 0.0, 30.0, 10.0],
                "geometry": None,
                "properties": {"datetime": f"{day}T00:00:00Z"},
                # absolute file hrefs: the SEARCH goes over http, the
                # asset read does not need to
                "assets": {"b1": {"href": asset_paths[i]}},
                "links": [],
            }
            for i, day in enumerate(days)
        ]

    class Api(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a, **kw):  # noqa: D401
            pass

        def _json(self, doc):
            body = json.dumps(doc).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            parts = urlsplit(self.path)
            host = f"http://127.0.0.1:{self.server.server_port}"
            if parts.path == "/api":
                return self._json(
                    {
                        "type": "Catalog",
                        "stac_version": "1.0.0",
                        "id": "gate-api",
                        "description": "item-search gate",
                        "conformsTo": [
                            "https://api.stacspec.org/v1.0.0/item-search"
                        ],
                        "links": [
                            {
                                "rel": "search",
                                "href": f"{host}/api/search",
                                "method": "GET",
                            }
                        ],
                    }
                )
            if parts.path == "/api/search":
                q = parse_qs(parts.query)
                feats = make_items()
                if "datetime" in q:
                    lo, hi = q["datetime"][0].split("/")

                    def ts(f):
                        return pd.to_datetime(
                            f["properties"]["datetime"]
                        ).tz_localize(None)

                    if lo != "..":
                        lo_t = pd.to_datetime(lo).tz_localize(None)
                        feats = [f for f in feats if ts(f) >= lo_t]
                    if hi != "..":
                        hi_t = pd.to_datetime(hi).tz_localize(None)
                        feats = [f for f in feats if ts(f) <= hi_t]
                page = int(q.get("page", ["1"])[0])
                chunk = feats[(page - 1) * 2: page * 2]
                links = []
                if page * 2 < len(feats):
                    base_q = "&".join(
                        kv
                        for kv in parts.query.split("&")
                        if not kv.startswith("page=")
                    )
                    links.append(
                        {
                            "rel": "next",
                            "method": "GET",
                            "href": (
                                f"{host}/api/search?{base_q}&page={page + 1}"
                            ),
                        }
                    )
                return self._json(
                    {
                        "type": "FeatureCollection",
                        "features": chunk,
                        "links": links,
                    }
                )
            self.send_error(404)

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Api)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        cube = load_stac(
            f"http://127.0.0.1:{srv.server_port}/api",
            temporal_extent=["2024-01-01", "2024-02-01"],
        )
        return cube.df.select(
            "x", "y", "t", "band", F.round("value", 6).alias("value")
        )
    finally:
        srv.shutdown()


def q_load_stac_catalog(spark, sf_dir):
    """load_stac over a two-item local catalog (VERDICT r01 #9): parquet
    assets derived from lineitem's grid, bbox SEARCH prunes item 1 before
    any read, row-level bbox re-filter per reference load.py:306-310. The
    oracle replays the derivation + predicate directly on lineitem."""
    _setup(spark)
    import json
    import os
    import tempfile

    from openeo_processes_dask_spark.sources.load import load_stac

    base = os.path.join(
        tempfile.gettempdir(), "spark_graft_stac_gate"
    )
    os.makedirs(base, exist_ok=True)
    grid = _grid_cube(spark, sf_dir)
    flat = (
        grid.df.groupBy("x", "y")
        .agg(F.sum("value").alias("value"))
        .withColumn("t", F.lit("2024-01-15 00:00:00").cast("timestamp"))
    )
    paths = {}
    for name, pred, bbox in (
        ("left", "x < 15", [0, 0, 14, 9]),
        ("right", "x >= 15", [15, 0, 29, 9]),
    ):
        p = os.path.join(base, f"{name}.parquet")
        flat.where(pred).coalesce(1).write.mode("overwrite").parquet(p)
        item = {
            "type": "Feature",
            "stac_version": "1.0.0",
            "id": name,
            "bbox": bbox,
            "properties": {"datetime": "2024-01-15T00:00:00Z"},
            "assets": {"data": {"href": p, "type": "parquet"}},
        }
        ip = os.path.join(base, f"{name}.json")
        with open(ip, "w") as fh:
            json.dump(item, fh)
        paths[name] = ip
    catalog = {
        "type": "Catalog",
        "stac_version": "1.0.0",
        "id": "gate",
        "links": [
            {"rel": "item", "href": paths["left"]},
            {"rel": "item", "href": paths["right"]},
        ],
    }
    cat = os.path.join(base, "catalog.json")
    with open(cat, "w") as fh:
        json.dump(catalog, fh)
    cube = load_stac(
        cat,
        spatial_extent={
            "west": -0.5, "east": 14.5, "south": -0.5, "north": 9.5,
        },
        spark=spark,
    )
    return _round6(
        cube.df.select("x", "y", "band", "t", "value"), "value"
    )


def _stac_props_catalog(spark, sf_dir) -> str:
    """Write (once per tmpdir) the three-item property-tagged catalog the
    STAC property/resolution gates share; returns the catalog path."""
    import json
    import os
    import tempfile

    base = os.path.join(
        tempfile.gettempdir(), "spark_graft_stac_props_gate"
    )
    os.makedirs(base, exist_ok=True)
    grid = _grid_cube(spark, sf_dir)
    flat = (
        grid.df.groupBy("x", "y")
        .agg(F.sum("value").alias("value"))
        .withColumn("t", F.lit("2024-01-15 00:00:00").cast("timestamp"))
    )
    links = []
    for name, pred, cloud, platform in (
        ("a", "x < 10", 5, "sentinel-2a"),
        ("b", "x >= 10 AND x < 20", 20, "sentinel-2b"),
        ("c", "x >= 20", 80, "landsat-8"),
    ):
        p = os.path.join(base, f"{name}.parquet")
        flat.where(pred).coalesce(1).write.mode("overwrite").parquet(p)
        item = {
            "type": "Feature",
            "stac_version": "1.0.0",
            "id": name,
            "bbox": [0, 0, 29, 9],
            "properties": {
                "datetime": "2024-01-15T00:00:00Z",
                "eo:cloud_cover": cloud,
                "platform": platform,
            },
            "assets": {"data": {"href": p, "type": "parquet"}},
        }
        ip = os.path.join(base, f"{name}.json")
        with open(ip, "w") as fh:
            json.dump(item, fh)
        links.append({"rel": "item", "href": ip})
    catalog = {
        "type": "Catalog",
        "stac_version": "1.0.0",
        "id": "props-gate",
        "links": links,
    }
    cat = os.path.join(base, "catalog.json")
    with open(cat, "w") as fh:
        json.dump(catalog, fh)
    return cat


def q_load_stac_properties(spark, sf_dir):
    """load_stac catalog search with STAC Query-extension OPERATOR
    property filters (VERDICT r04 #1 — the one silent-divergence defect):
    a three-item catalog tagged with eo:cloud_cover 5/20/80 and platform
    names; ``{"eo:cloud_cover": {"lt": 25}, "platform": {"startsWith":
    "sentinel"}}`` must keep exactly the first two items (reference
    forwards these dicts verbatim to catalog.search(query=…),
    cubes/load.py:153-156). Oracle replays the derivation with the same
    x-range the surviving items carry."""
    _setup(spark)
    from openeo_processes_dask_spark.sources.load import load_stac

    cat = _stac_props_catalog(spark, sf_dir)
    cube = load_stac(
        cat,
        properties={
            "eo:cloud_cover": {"lt": 25},
            "platform": {"startsWith": "sentinel"},
        },
        spark=spark,
    )
    return _round6(
        cube.df.select("x", "y", "band", "t", "value"), "value"
    )


def q_load_stac_resampled(spark, sf_dir):
    """load_stac with resolution/resampling kwargs (VERDICT r04 #4;
    reference signature cubes/load.py:94-118 resamples at load): the two
    kept items regrid to a 4-unit mean grid inside the load — the oracle
    replays load + snap + mean, i.e. the explicit load→resample_spatial
    twin."""
    _setup(spark)
    from openeo_processes_dask_spark.sources.load import load_stac

    cat = _stac_props_catalog(spark, sf_dir)
    cube = load_stac(
        cat,
        properties={"eo:cloud_cover": {"lt": 25}},
        resolution=4.0,
        resampling="mean",
        spark=spark,
    )
    return _round6(
        cube.df.select("x", "y", "band", "t", "value"), "value"
    )


def q_column_stats(spark, sf_dir):
    """ANALYZE-style per-column profile (sources/maintenance.py
    analyze_table): count / non-null / exact distinct / min / max for
    four documents columns in ONE aggregate pass, stacked to long format
    by a literal struct-array explode (no second scan)."""
    _setup(spark)
    from openeo_processes_dask_spark.sources.maintenance import analyze_table

    docs = _table(spark, sf_dir, "documents")
    return analyze_table(docs, ["doc_id", "lang", "source", "n_chars"])


def q_compact_roundtrip(spark, sf_dir):
    """Small-file compaction (sources/maintenance.py compact_parquet):
    the documents table scattered over 64 tiny files is rewritten near a
    byte target (Hadoop FS sizes, not row guesses), then re-read and
    aggregated — compaction must be value-lossless. File-count assertions
    live in pytest; the gate checks the data."""
    _setup(spark)
    import os
    import tempfile

    from openeo_processes_dask_spark.sources.maintenance import (
        compact_parquet,
    )

    base = os.path.join(
        tempfile.gettempdir(), f"compact_gate_{os.path.basename(sf_dir)}"
    )
    src, dst = base + "_src", base + "_dst"
    if not os.path.isdir(src):
        _table(spark, sf_dir, "documents").repartition(64).write.mode(
            "overwrite"
        ).parquet(src)
    compact_parquet(spark, src, dst, target_file_bytes=4 << 20)
    back = spark.read.parquet(dst)
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )


def q_manifest_timetravel(spark, sf_dir):
    """Manifest-versioned table (sources/manifest.py): documents as v1,
    a TARGETED delete of lang='de' (only files holding German rows are
    rewritten; the rest are re-referenced) as v2, an upsert batch as v3.
    The gate reads all three versions — time travel must see each
    snapshot exactly; the untouched-file assertions live in
    tests/test_manifest.py."""
    _setup(spark)
    import os
    import shutil
    import tempfile

    from openeo_processes_dask_spark.sources.manifest import (
        create_table,
        delete_rows,
        read_table,
        upsert_rows,
    )

    d = os.path.join(
        tempfile.gettempdir(), f"manifest_gate_{os.path.basename(sf_dir)}"
    )
    shutil.rmtree(d, ignore_errors=True)
    docs = _table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    create_table(docs.repartition(8), d)
    delete_rows(spark, d, F.col("lang") == "de")
    ups = docs.where(F.col("doc_id") % 100 == 0).withColumn(
        "n_chars", F.lit(-1).cast("long")
    )
    upsert_rows(spark, d, ups, ["doc_id"])
    out = None
    for v in (1, 2, 3):
        snap = (
            read_table(spark, d, version=v)
            .groupBy("lang")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_chars").alias("total_chars"),
            )
            .withColumn("version", F.lit(v))
        )
        out = snap if out is None else out.unionByName(snap)
    return out.select("version", "lang", "n_docs", "total_chars")


def q_range_bounds(spark, sf_dir):
    """Exact equi-depth range-partition bounds
    (sources/maintenance.py range_partition_bounds) over
    lineitem.l_extendedprice, 16 buckets: the distinct-value running
    count picks the smallest value reaching each exact ceil(b*n/16)
    target — deterministic where repartitionByRange samples. Integer
    targets + on-data bounds => zero-tolerance oracle."""
    _setup(spark)
    from openeo_processes_dask_spark.sources.maintenance import (
        range_partition_bounds,
    )

    li = _table(spark, sf_dir, "lineitem")
    return range_partition_bounds(li, "l_extendedprice", 16)


def q_jsonl_roundtrip(spark, sf_dir):
    """JSONL sink + source roundtrip (sources/jsonl.py write_jsonl /
    read_jsonl): documents serialized to sharded JSON-lines, re-read
    with an explicit schema, aggregated — proves the full interchange
    loop (escaping incl. embedded newlines, types, sharding) against the
    direct-aggregate oracle."""
    _setup(spark)
    import os
    import tempfile

    from openeo_processes_dask_spark.sources.jsonl import (
        read_jsonl,
        write_jsonl,
    )

    d = os.path.join(
        tempfile.gettempdir(), f"jsonl_gate_{os.path.basename(sf_dir)}"
    )
    docs = _table(spark, sf_dir, "documents")
    write_jsonl(docs, d, target_file_bytes=1 << 20)
    back = read_jsonl(
        spark, d,
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    )
    return back.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.sum(F.length("text")).cast("long").alias("text_chars"),
    )


def q_percentile_rank(spark, sf_dir):
    """Empirical-CDF percentile normalization (sources/maintenance.py
    percentile_rank) of documents.n_chars: distinct-value running count
    + lookup join — never a global sort of the rows. Rational cum/n
    rounded 6 => zero-tolerance oracle."""
    _setup(spark)
    from openeo_processes_dask_spark.sources.maintenance import (
        percentile_rank,
    )

    docs = _table(spark, sf_dir, "documents")
    return percentile_rank(docs, "n_chars").select("doc_id", "n_chars", "pct")


def q_json_extract(spark, sf_dir):
    """Embedded-JSON ingestion (sources/jsonl.py parse_json_column): the
    events.props column holds JSON blobs; from_json projects the typed
    field JVM-side (no Python, no schema-inference scan) and the gate
    aggregates per k-bucket. Oracle extracts with DuckDB's ->> operator —
    an independent JSON parser."""
    _setup(spark)
    from openeo_processes_dask_spark.sources.jsonl import parse_json_column

    ev = _table(spark, sf_dir, "events")
    p = parse_json_column(ev, "props", "k INT")
    return p.groupBy((F.col("props_parsed.k") % 10).alias("k_bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("props_parsed.k").cast("long")).alias("k_sum"),
        F.round(F.sum("value"), 6).alias("value_sum"),
    )


QUERIES = {
    "save_load_roundtrip": q_save_load_roundtrip,
    "zorder_roundtrip": q_zorder_roundtrip,
    "column_stats": q_column_stats,
    "compact_roundtrip": q_compact_roundtrip,
    "manifest_timetravel": q_manifest_timetravel,
    "load_raster_tiles": q_load_raster_tiles,
    "load_raster_nodata": q_load_raster_nodata,
    "load_url_geojson": q_load_url_geojson,
    "reduce_any": q_reduce_any,
    "reduce_count_condition": q_reduce_count_condition,
    "process_graph": q_process_graph,
    "load_stac_catalog": q_load_stac_catalog,
    "load_stac_search": q_load_stac_search,
    "load_stac_properties": q_load_stac_properties,
    "load_stac_resampled": q_load_stac_resampled,
    "time_partitioned_roundtrip": q_time_partitioned_roundtrip,
    "stat_pruned_read": q_stat_pruned_read,
    "json_extract": q_json_extract,
    "range_bounds": q_range_bounds,
    "percentile_rank": q_percentile_rank,
    "jsonl_roundtrip": q_jsonl_roundtrip,
}

ORACLES = {
    "jsonl_roundtrip": """
            SELECT lang, source,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS total_chars,
                   CAST(sum(length(text)) AS BIGINT) AS text_chars
            FROM documents GROUP BY 1, 2
        """,
    "percentile_rank": """
            WITH v AS (
              SELECT n_chars AS vv, count(*) AS c FROM documents
              WHERE n_chars IS NOT NULL GROUP BY 1),
            cum AS (
              SELECT vv, CAST(sum(c) OVER (ORDER BY vv) AS BIGINT) AS cum
              FROM v),
            t AS (SELECT CAST(max(cum) AS BIGINT) AS n FROM cum)
            SELECT d.doc_id, d.n_chars,
                   round(CAST(cum AS DOUBLE) / n, 6) AS pct
            FROM documents d
            JOIN cum ON cum.vv = d.n_chars
            CROSS JOIN t
        """,
    "range_bounds": """
            WITH v AS (
              SELECT l_extendedprice AS v, count(*) AS c
              FROM lineitem WHERE l_extendedprice IS NOT NULL
              GROUP BY 1),
            cum AS (
              SELECT v, CAST(sum(c) OVER (ORDER BY v) AS BIGINT) AS cum
              FROM v),
            t AS (SELECT CAST(max(cum) AS BIGINT) AS n FROM cum),
            b AS (SELECT unnest(generate_series(1, 15)) AS bucket),
            tg AS (
              SELECT bucket,
                     CAST((bucket * n + 15) // 16 AS BIGINT) AS target
              FROM b, t)
            SELECT bucket, min(cum.v) AS upper,
                   CAST(min(cum.cum) AS BIGINT) AS rows_below
            FROM tg JOIN cum ON cum.cum >= tg.target
            GROUP BY bucket
        """,
    "json_extract": """
            SELECT CAST(props::JSON->>'k' AS INTEGER) % 10 AS k_bucket,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CAST(props::JSON->>'k' AS INTEGER)) AS BIGINT)
                     AS k_sum,
                   round(sum(value), 6) AS value_sum
            FROM events GROUP BY 1
        """,
    "time_partitioned_roundtrip": """
            SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                   event_type AS band, count(*) AS n,
                   round(sum(value), 6) AS total
            FROM events
            WHERE ts >= TIMESTAMP '2024-01-05'
              AND ts < TIMESTAMP '2024-01-12'
            GROUP BY ALL
        """,
    "stat_pruned_read": """
            SELECT lang, source, count(*) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS total_chars,
                   min(doc_id) AS min_id, max(doc_id) AS max_id
            FROM documents WHERE doc_id BETWEEN 120 AND 260
            GROUP BY lang, source
        """,
    "manifest_timetravel": """
            WITH v1 AS (
              SELECT 1 AS version, lang, count(*) AS n_docs,
                     CAST(sum(n_chars) AS BIGINT) AS total_chars
              FROM documents GROUP BY lang),
            v2 AS (
              SELECT 2, lang, count(*),
                     CAST(sum(n_chars) AS BIGINT)
              FROM documents WHERE lang != 'de' GROUP BY lang),
            v3 AS (
              SELECT 3, lang, count(*),
                     CAST(sum(CASE WHEN doc_id % 100 = 0 THEN -1
                              ELSE n_chars END) AS BIGINT)
              FROM documents WHERE lang != 'de' OR doc_id % 100 = 0
              GROUP BY lang)
            SELECT * FROM v1 UNION ALL SELECT * FROM v2
            UNION ALL SELECT * FROM v3
        """,
    "column_stats": """
            SELECT 'doc_id' AS "column", count(*) AS n_rows,
                   count(doc_id) AS n_nonnull,
                   count(DISTINCT doc_id) AS n_distinct,
                   CAST(min(doc_id) AS VARCHAR) AS min_value,
                   CAST(max(doc_id) AS VARCHAR) AS max_value
            FROM documents
            UNION ALL
            SELECT 'lang', count(*), count(lang), count(DISTINCT lang),
                   min(lang), max(lang) FROM documents
            UNION ALL
            SELECT 'source', count(*), count(source),
                   count(DISTINCT source), min(source), max(source)
            FROM documents
            UNION ALL
            SELECT 'n_chars', count(*), count(n_chars),
                   count(DISTINCT n_chars), CAST(min(n_chars) AS VARCHAR),
                   CAST(max(n_chars) AS VARCHAR)
            FROM documents
        """,
    "compact_roundtrip": """
            SELECT lang, count(*) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS total_chars,
                   min(doc_id) AS min_id, max(doc_id) AS max_id
            FROM documents GROUP BY 1
        """,
    "save_load_roundtrip": f"""
            WITH {_GRID_CTE}
            SELECT x, y, band, round(value, 6) AS value FROM grid
        """,
    "zorder_roundtrip": f"""
            WITH {_GRID_CTE}
            SELECT x, y, band, round(value, 6) AS value FROM grid
        """,
    "load_raster_tiles": """
            SELECT 0.5 * (c + 0.5) + 10.0 AS x,
                   -0.5 * (r + 0.5) + 50.0 AS y,
                   'b1' AS band,
                   round(CAST(100 * r + c AS DOUBLE), 6) AS value
            FROM (SELECT unnest(generate_series(0, 39)) AS r),
                 (SELECT unnest(generate_series(0, 47)) AS c)
        """,
    "load_raster_nodata": """
            WITH px AS (
              SELECT r, c, b,
                     b * 1000.0 + 100.0 * r + c AS raw,
                     (r + c) % 11 = b AS is_nodata
              FROM (SELECT unnest(generate_series(0, 23)) AS r),
                   (SELECT unnest(generate_series(0, 31)) AS c),
                   (SELECT unnest([1, 2]) AS b)
            )
            SELECT c + 0.5 AS x,
                   24.0 - (r + 0.5) AS y,
                   's_b' || b AS band,
                   CASE WHEN is_nodata THEN NULL
                        WHEN b = 1 THEN round(raw * 0.5 + 2.0, 6)
                        ELSE round(raw, 6) END AS value
            FROM px
        """,
    "load_url_geojson": """
            SELECT CAST(n_nationkey AS VARCHAR) AS feature_id,
                   n_name AS name,
                   round(CAST(n_nationkey AS DOUBLE), 6) AS px,
                   round(CAST(n_regionkey AS DOUBLE), 6) AS py
            FROM nation
        """,
    "load_stac_search": """
            SELECT CAST(n_nationkey AS DOUBLE) AS x,
                   CAST(n_regionkey AS DOUBLE) AS y,
                   TIMESTAMP '2024-01-01 00:00:00' AS t,
                   'b1' AS band,
                   round(CAST(n_nationkey AS DOUBLE) * 1, 6) AS value
            FROM nation
            UNION ALL
            SELECT CAST(n_nationkey AS DOUBLE),
                   CAST(n_regionkey AS DOUBLE),
                   TIMESTAMP '2024-01-15 00:00:00', 'b1',
                   round(CAST(n_nationkey AS DOUBLE) * 2, 6)
            FROM nation
        """,
    "reduce_any": """
            SELECT user_id, event_type AS band, bool_or(value > 100) AS value
            FROM events GROUP BY ALL
        """,
    "reduce_count_condition": f"""
            WITH {_CELLS_CTE}
            SELECT x, count(CASE WHEN sq > 30 THEN 1 END) AS value
            FROM cells GROUP BY x
        """,
    "process_graph": """
            SELECT t, band, round(avg(value_u) / 1e6, 6) AS value FROM (
              SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS t,
                     event_type AS band,
                     round_even(avg(value) * 1e6, 0) AS value_u
              FROM events
              WHERE ts >= '2024-01-01' AND ts < '2024-02-01'
              GROUP BY ALL) GROUP BY ALL
        """,
    "load_stac_catalog": f"""
            WITH {_GRID_CTE}
            SELECT x, y, 'data' AS band,
                   TIMESTAMP '2024-01-15 00:00:00' AS t,
                   round(sum(value), 6) AS value
            FROM grid WHERE x < 15 GROUP BY x, y
        """,
    "load_stac_properties": f"""
            WITH {_GRID_CTE}
            SELECT x, y, 'data' AS band,
                   TIMESTAMP '2024-01-15 00:00:00' AS t,
                   round(sum(value), 6) AS value
            FROM grid WHERE x < 20 GROUP BY x, y
        """,
    "load_stac_resampled": f"""
            WITH {_GRID_CTE},
            loaded AS (
              SELECT x, y, sum(value) AS value
              FROM grid WHERE x < 20 GROUP BY x, y
            )
            SELECT round(x / 4) * 4 AS x,
                   round(y / 4) * 4 AS y,
                   'data' AS band,
                   TIMESTAMP '2024-01-15 00:00:00' AS t,
                   round(avg(value), 6) AS value
            FROM loaded GROUP BY 1, 2
        """,
}
