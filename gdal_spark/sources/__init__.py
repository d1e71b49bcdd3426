from gdal_spark.sources.geojson import (  # noqa: F401
    read_geojson,
    geojson_geometry_to_wkb,
    wkb_to_geojson_geometry,
    write_geojson_strings,
)
