from gdal_spark.streaming.pipeline import (  # noqa: F401
    streaming_pages_from_rate,
    streaming_tile_counts,
    streaming_url_dedup,
)
