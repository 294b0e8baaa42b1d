from openeo_processes_dask_spark.plans.graph import (  # noqa: F401
    OpenEOProcessGraph,
    execute_process_graph,
)
