"""Large-scale training-data pipeline operators (driver-mandated extras):
deduplication, similarity search, text analysis, multimodal plumbing.

These are not in the reference (it is an EO operator library); they follow
the same registry pattern and the same Spark-first rules: built-in
expressions in the hot path, Arrow-batched pandas only where unavoidable,
shuffle-minimal join topologies.
"""

from openeo_processes_dask_spark.training import (  # noqa: F401
    dedup,
    multimodal,
    similarity,
    textanalysis,
)
