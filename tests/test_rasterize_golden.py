"""Rasterize vs the reference's golden checksum:
test_gdal_rasterize_lib.py::test_gdal_rasterize_lib_1 — 100×100 grid,
GT (1000,1,0,1100,0,-1), one polygon + one linestring burned 220 →
band checksum 6452."""
import numpy as np
import pytest

from gdal_spark.geometry import wkt
from gdal_spark.raster.checksum import checksum_np
from gdal_spark.raster.model import RasterMeta, tiles_to_array
from gdal_spark.raster.rasterize import rasterize

POLY = "POLYGON ((1020 1030,1020 1045,1050 1045,1050 1030,1020 1030))"
LINE = "LINESTRING (1000 1000,1100 1050)"


def _meta(block=100):
    return RasterMeta(width=100, height=100, dtype="float64", block_w=block,
                      block_h=block, gt=(1000.0, 1.0, 0.0, 1100.0, 0.0, -1.0))


def test_rasterize_lib_1_golden_distributed(spark):
    meta = _meta()
    feats = spark.createDataFrame(
        [
            (0, bytearray(wkt.wkt_to_wkb(POLY)), 220.0),
            (1, bytearray(wkt.wkt_to_wkb(LINE)), 220.0),
        ],
        "fid INT, geometry BINARY, burn DOUBLE",
    )
    img = tiles_to_array(rasterize(feats, meta, fid_col="fid"), meta)
    assert checksum_np(img) == 6452


def test_rasterize_lib_1_golden_multiblock(spark):
    """Same golden with the raster split into 16 blocks — the Bresenham
    walk must produce identical pixels across block boundaries."""
    meta = _meta(block=25)
    feats = spark.createDataFrame(
        [
            (0, bytearray(wkt.wkt_to_wkb(POLY)), 220.0),
            (1, bytearray(wkt.wkt_to_wkb(LINE)), 220.0),
        ],
        "fid INT, geometry BINARY, burn DOUBLE",
    )
    img = tiles_to_array(rasterize(feats, meta, fid_col="fid"), meta)
    assert checksum_np(img) == 6452


SELF_CROSS = "LINESTRING (1010 1090,1090 1010,1090 1090,1010 1010)"
SHARED_MLS = ("MULTILINESTRING ((1010 1050,1090 1050),"
              "(1050 1010,1050 1090),(1010 1050,1090 1050))")


def _burn_image(spark, wkt_str, meta, **kw):
    feats = spark.createDataFrame(
        [(0, bytearray(wkt.wkt_to_wkb(wkt_str)), 7.0)],
        "fid INT, geometry BINARY, burn DOUBLE",
    )
    return tiles_to_array(rasterize(feats, meta, fid_col="fid", **kw), meta)


@pytest.mark.parametrize("all_touched", [False, True])
@pytest.mark.parametrize("line_wkt", [SELF_CROSS, SHARED_MLS])
def test_merge_add_lines_burn_once_per_feature(spark, all_touched, line_wkt):
    """ADVICE r4 / gdalrasterize.cpp:694-698: under MERGE_ALG=ADD one
    visited set per FEATURE spans all line parts — self-crossing lines
    and pixels shared between MultiLineString parts burn exactly once,
    so ADD and REPLACE touch identical pixels at identical values for a
    single feature."""
    meta = _meta(block=25)
    add = _burn_image(spark, line_wkt, meta, merge_alg="ADD",
                      all_touched=all_touched)
    rep = _burn_image(spark, line_wkt, meta, merge_alg="REPLACE",
                      all_touched=all_touched)
    assert np.array_equal(add, rep)
    assert add.max() == 7.0  # no pixel double-added
