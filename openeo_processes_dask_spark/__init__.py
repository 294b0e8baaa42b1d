"""openeo_processes_dask_spark — a PySpark-native re-implementation of the
Open-EO/openeo-processes-dask operator library (SURVEY.md).

Data model: ``DataCube`` = long-format Spark DataFrame + ``CubeMeta``
(cube.py). Every OpenEO process is a function ``DataCube -> DataCube``
registered in ``core.REGISTRY``; scalar processes are Spark Column builders
(functions/) so callbacks compile into Catalyst expressions.
"""

from openeo_processes_dask_spark.core import (  # noqa: F401
    REGISTRY,
    ParameterReference,
    get_process,
    process,
)
from openeo_processes_dask_spark.cube import CubeMeta, DataCube  # noqa: F401

# importing registers every process
from openeo_processes_dask_spark import functions, ml, operators, sources, streaming, training  # noqa: F401,E402

__version__ = "0.1.0"
