from openeo_processes_dask_spark.streaming.events import (  # noqa: F401
    stream_aggregate_temporal_period,
    stream_events,
)
