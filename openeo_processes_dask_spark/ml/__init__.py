from openeo_processes_dask_spark.ml import curve_fitting, random_forest  # noqa: F401
