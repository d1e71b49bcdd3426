from gdal_spark.text import analysis, dedup  # noqa: F401
