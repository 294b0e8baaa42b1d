from openeo_processes_dask_spark.operators import (  # noqa: F401
    aggregate,
    apply,
    filters,
    general,
    mask,
    merge,
    reduce,
    windows,
)
