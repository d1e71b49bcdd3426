from gdal_spark.operators.spatial_join import point_in_polygon_join, assign_tiles  # noqa: F401
from gdal_spark.operators.knn import knn_join  # noqa: F401
from gdal_spark.operators.ogr_compat import first_match_join, summary_aggregates, distinct_list  # noqa: F401
