from gdal_spark.functions.st import register_st_functions  # noqa: F401
