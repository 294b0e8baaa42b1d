from openeo_processes_dask_spark.sources import load  # noqa: F401
