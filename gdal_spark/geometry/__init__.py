from gdal_spark.geometry.wkb import (  # noqa: F401
    point_wkb,
    points_wkb_np,
    polygon_wkb,
    parse_wkb,
    parse_point_wkb_np,
)
from gdal_spark.geometry.kernels import (  # noqa: F401
    points_in_ring_np,
    points_in_polygon_np,
    ring_area,
    polygon_area,
    envelope,
)
from gdal_spark.geometry.index import PolygonSet  # noqa: F401
