"""Polygonize vs the reference golden (autotest/alg/polygonize.py:45-58):
data/polygonize_in.grd (5×7, nodata 132) → 13 regions with DN values
[107,123,115,115,140,148,123,140,100,101,102,156,103]."""
import numpy as np

from gdal_spark.raster.model import RasterMeta, tiles_from_array
from gdal_spark.raster.polygonize import polygonize_regions

GRD = np.array(
    [
        [107, 123, 132, 115, 132],
        [115, 132, 132, 123, 123],
        [115, 132, 140, 132, 123],
        [148, 132, 123, 123, 123],
        [156, 156, 156, 140, 132],
        [156, 100, 156, 101, 102],
        [156, 156, 156, 103, 103],
    ],
    dtype=np.uint8,
)
EXPECT = sorted([107, 123, 115, 115, 140, 148, 123, 140, 100, 101, 102, 156, 103])


def test_polygonize_golden_single_block(spark):
    meta = RasterMeta(width=5, height=7, dtype="uint8", block_w=5, block_h=7)
    regions = polygonize_regions(tiles_from_array(spark, GRD, meta), meta).collect()
    vals = sorted(int(r.value) for r in regions if r.value != 132)
    assert vals == EXPECT


def test_polygonize_golden_multiblock(spark):
    """Same golden with 2×3-pixel blocks: the 156-region and the 123-region
    cross multiple tile boundaries — exercises the cross-tile label merge."""
    meta = RasterMeta(width=5, height=7, dtype="uint8", block_w=2, block_h=3)
    regions = polygonize_regions(tiles_from_array(spark, GRD, meta), meta).collect()
    vals = sorted(int(r.value) for r in regions if r.value != 132)
    assert vals == EXPECT
    # the reference also checks the 156 polygon's shape: an 8-pixel ring
    # around the 1-pixel hole (the 100 pixel) — verify count + bbox
    r156 = [r for r in regions if r.value == 156]
    assert len(r156) == 1 and r156[0].n_pixels == 8
    assert (r156[0].min_x, r156[0].min_y, r156[0].max_x, r156[0].max_y) == (0, 4, 2, 6)
