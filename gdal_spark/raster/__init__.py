from gdal_spark.raster.model import RasterMeta, tiles_from_array, tiles_to_array, synth_raster, byte_fixture  # noqa: F401
from gdal_spark.raster.checksum import checksum_np, checksum_df  # noqa: F401
